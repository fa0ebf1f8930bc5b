package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-corpus n-gram language-model scoring — the MODEL-BASED
  * quality modality (public recipe: CCNet, Wenzek et al. 2020 — score
  * web text by the perplexity of a KenLM-style n-gram model trained on
  * a high-quality reference corpus; the low-log-prob tail is gibberish,
  * boilerplate and SEO spam that rule-based gates miss). No external
  * model binaries: the model IS a DataFrame of (ctx, w, cnt, ctx_cnt)
  * counts, trained in-engine and persistable like any frame.
  *
  * Scale shape (100 TB): training is one (ctx, w) reference-corpus
  * shuffle plus a ctx-level re-aggregate — model-sized output. Scoring
  * shuffles the candidate corpus's grams once on (id, ctx, w) for
  * multiplicities, left-joins the model twice ((ctx, w) for cnt, ctx
  * for ctx_cnt; sort-merge at model scale, broadcast beneath the AQE
  * threshold), and folds once per doc — O(corpus tokens), the honest
  * cost every LM filter pays. No driver-side state, no UDFs;
  * everything is column arithmetic inside codegen.
  *
  * Determinism: every integer statistic (counts, hit multiplicities)
  * is exact and oracle-checked cross-engine. The log-probability uses
  * the engine's ln (Spark's Log evaluates StrictMath.log) and follows
  * the repo's logIdf precedent — spec-pinned against a driver-side
  * StrictMath reference, with the ordered-fold discipline making the
  * in-engine sum bit-deterministic; threshold DECISIONS are ulp-robust
  * and oracle-checked (a 1-ulp-per-term ln difference cannot flip a
  * non-degenerate compare).
  */
object NgramLm {

  /** LM tokenization: whitespace runs, empties dropped — every token
    * counts (no minTermLen: an LM models function words too). Mirrored
    * by [[toksSql]]. */
  private[llm] def toks(text: Column): Column =
    filter(split(text, "\\s+", -1), t => t =!= "")

  private[graft] def toksSql(text: String): String =
    s"list_filter(regexp_split_to_array($text, '\\s+'), t -> t <> '')"

  /** The (ctx, w) gram stream of one token array: ctx is the n−1
    * preceding tokens joined by ' ' (empty string for n = 1). */
  private def gramsOf(t: Column, n: Int): Column =
    transform(sequence(lit(1), size(t) - (n - 1)),
      i => struct(concat_ws(" ", slice(t, i, lit(n - 1))).as("ctx"),
        element_at(t, (i + lit(n - 1)).cast("int")).as("w")))

  /** TRAIN: order-n counts over the reference corpus —
    * (ctx, w, cnt, ctx_cnt) with cnt = occurrences of the n-gram and
    * ctx_cnt = Σ cnt over the context (the denominator of the MLE
    * conditional). Docs shorter than n tokens contribute nothing. */
  def train(ref: DataFrame, textCol: String, n: Int = 2): DataFrame = {
    require(n >= 1, s"ngram order must be >= 1, got $n")
    val base = ref.select(toks(col(textCol)).as("__t__"))
      .filter(size(col("__t__")) >= n)
    val grams = base
      .select(explode(gramsOf(col("__t__"), n)).as("g"))
      .select(col("g.ctx").as("ctx"), col("g.w").as("w"))
    val cnts = grams.groupBy("ctx", "w").agg(count(lit(1)).as("cnt"))
    val ctxc = cnts.groupBy("ctx").agg(sum("cnt").as("ctx_cnt"))
    cnts.join(ctxc, "ctx").select("ctx", "w", "cnt", "ctx_cnt")
  }

  /** SCORE: per-doc LM statistics plus the smoothed mean log-prob.
    *
    * For each doc gram g with multiplicity k_g:
    * p_g = (cnt + α) / (ctx_cnt + α·V), V = |{w}| of the model
    * (Laplace/add-α smoothing; an unseen context degrades to the
    * uniform 1/V). logprob = (Σ k_g · ln p_g) / n_grams, folded in
    * sorted (ctx, w) order; ppl = e^(−logprob).
    *
    * Returns one row per input doc:
    * (idCol, n_grams, n_hit, n_ctx_hit, sum_cnt, sum_ctx, logprob,
    * ppl) — n_hit/n_ctx_hit count gram OCCURRENCES whose (ctx, w)/ctx
    * the model knows; sum_cnt/sum_ctx are the multiplicity-weighted
    * count masses (exact integers, the oracle surface). Docs with
    * fewer than n tokens are unscorable: n_grams = 0, NULL
    * logprob/ppl (the filter owns the policy; an ANSI divide-by-zero
    * must never kill a 100 TB pass). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            model: DataFrame, n: Int = 2,
            alpha: Double = 1.0): DataFrame =
    scoreImpl(docs, idCol, textCol, model.select("ctx", "w", "cnt"),
      model.select("ctx", "ctx_cnt").distinct(), n, alpha)

  private def scoreImpl(docs: DataFrame, idCol: String, textCol: String,
                        cnts: DataFrame, ctxc: DataFrame, n: Int,
                        alpha: Double): DataFrame = {
    require(n >= 1, s"ngram order must be >= 1, got $n")
    require(alpha > 0, s"smoothing alpha must be > 0, got $alpha")
    // an empty model gives V = 0 and every denominator 0 — that would
    // surface as an ANSI DIVIDE_BY_ZERO deep inside codegen; refuse
    // loudly instead (one bounded limit-probe, the qCap discipline)
    require(!cnts.isEmpty,
      "empty LM model — train on a non-empty reference corpus first")
    val vrow = cnts.agg(countDistinct(col("w")).as("__v__"))
    val base = docs.select(col(idCol), toks(col(textCol)).as("__t__"))
    val ks = base.filter(size(col("__t__")) >= n)
      .select(col(idCol), explode(gramsOf(col("__t__"), n)).as("g"))
      .select(col(idCol), col("g.ctx").as("ctx"), col("g.w").as("w"))
      .groupBy(col(idCol), col("ctx"), col("w"))
      .agg(count(lit(1)).as("k"))
    val joined = ks
      .join(cnts, Seq("ctx", "w"), "left")
      .join(ctxc, Seq("ctx"), "left")
      .withColumn("cnt0", coalesce(col("cnt"), lit(0L)))
      .withColumn("ctxc0", coalesce(col("ctx_cnt"), lit(0L)))
    val folded = joined.groupBy(col(idCol))
      .agg(
        collect_list(struct(col("ctx"), col("w"), col("k"), col("cnt0"),
          col("ctxc0"))).as("__xs__"),
        sum(col("k")).as("n_grams"),
        sum(when(col("cnt").isNotNull, col("k")).otherwise(lit(0L)))
          .as("n_hit"),
        sum(when(col("ctx_cnt").isNotNull, col("k")).otherwise(lit(0L)))
          .as("n_ctx_hit"),
        sum(col("k") * col("cnt0")).as("sum_cnt"),
        sum(col("k") * col("ctxc0")).as("sum_ctx"))
      .crossJoin(broadcast(vrow))
      .withColumn("logprob",
        aggregate(array_sort(col("__xs__")), lit(0.0), (acc, x) =>
          acc + x.getField("k").cast("double") *
            log((x.getField("cnt0").cast("double") + lit(alpha)) /
              (x.getField("ctxc0").cast("double") +
                lit(alpha) * col("__v__").cast("double"))))
          / col("n_grams").cast("double"))
      .withColumn("ppl", exp(-col("logprob")))
      .drop("__xs__", "__v__")
    base.select(col(idCol))
      .join(folded, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        coalesce(col("n_ctx_hit"), lit(0L)).as("n_ctx_hit"),
        coalesce(col("sum_cnt"), lit(0L)).as("sum_cnt"),
        coalesce(col("sum_ctx"), lit(0L)).as("sum_ctx"),
        col("logprob"), col("ppl"))
  }

  /** FILTER: keep docs whose mean log-prob clears `minLogprob` (the
    * CCNet gate — drop the high-perplexity tail). Unscorable docs
    * (< n tokens, NULL logprob) keep by default: they carry no LM
    * evidence either way, and the rule gates already own short docs.
    * All caller columns survive (semi-join on the kept ids). */
  def filterByLm(docs: DataFrame, idCol: String, textCol: String,
                 model: DataFrame, minLogprob: Double, n: Int = 2,
                 alpha: Double = 1.0,
                 keepUnscorable: Boolean = true): DataFrame = {
    val s = score(docs, idCol, textCol, model, n, alpha)
    val keep = s.filter(
      if (keepUnscorable) col("logprob").isNull || col("logprob") >= minLogprob
      else col("logprob") >= minLogprob)
    docs.join(keep.select(col(idCol)), Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------------------
  // Persisted LM — the family's production form: ONE bucketed table
  // `<name>_lm` (ctx, w, cnt) bucketed on `ctx`. ctx_cnt and V are
  // deliberately NOT stored: both re-derive from the live table at
  // every serve (the doclens-stats discipline — no stats sidecar that
  // could drift), and the ctx totals aggregate WITHOUT an exchange
  // because the grouping key IS the bucketing key (plan-asserted).
  //
  // Lifecycle posture (differs from the six index families, on
  // purpose): counts are AGGREGATES over the reference corpus, so
  // per-doc append/retraction is structurally absent — the public
  // n-gram-LM practice (KenLM/CCNet) retrains wholesale from the
  // reference source of record, and [[writeLm]] IS that retrain (an
  // overwrite-mode bucketed write resets the compaction generation
  // chain like every rebuild). A takedown that must remove one doc's
  // contribution re-runs writeLm on the corrected reference.

  private def lmMetaFile(path: String) = s"$path/_graft_lm_meta.json"

  private def stampLmMeta(spark: SparkSession, path: String, n: Int,
                          buckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(lmMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(s"""{"n":$n,"buckets":$buckets}\n""".getBytes("UTF-8"))
    finally os.close()
  }

  /** (n, buckets) from the stamp — a stampless directory is a crashed
    * or foreign build and refuses loudly (serving would score with an
    * unknown gram order/tokenizer geometry). */
  private[llm] def readLmMeta(spark: SparkSession, path: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(lmMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no LM stamp at ${lmMetaFile(path)} — build with writeLm first")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def field(nm: String): Int =
      (s""""$nm"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(txt) match {
        case Some(m) => m.group(1).toInt
        case None => throw new IllegalStateException(
          s"malformed LM stamp at ${lmMetaFile(path)}: $txt")
      }
    (field("n"), field("buckets"))
  }

  /** Build (or wholesale RETRAIN — the family's one maintenance
    * action) the persisted LM. The stamp lands LAST, so a crashed
    * build refuses to serve. */
  def writeLm(ref: DataFrame, textCol: String, name: String,
              path: String, n: Int = 2, buckets: Int = 8): Unit = {
    val spark = ref.sparkSession
    graft.api.GraftFrame(train(ref, textCol, n).select("ctx", "w", "cnt"))
      .toBucketedTable(s"${name}_lm", s"$path/lm", buckets, Seq("ctx"))
    stampLmMeta(spark, path, n, buckets)
  }

  /** Serve [[score]] from the persisted LM — bit-identical to the
    * one-shot form over the same reference (oracle-pinned): ctx totals
    * and V re-derive from the live table (the ctx aggregate is
    * exchange-free — grouping key == bucketing key). */
  def scoreIndexed(spark: SparkSession, name: String, path: String,
                   docs: DataFrame, idCol: String, textCol: String,
                   alpha: Double = 1.0): DataFrame = {
    val (n, _) = readLmMeta(spark, path)
    val cnts = spark.table(s"${name}_lm")
    val ctxc = cnts.groupBy("ctx").agg(sum("cnt").as("ctx_cnt"))
    scoreImpl(docs, idCol, textCol, cnts, ctxc, n, alpha)
  }

  /** Maintenance observable: rows + parquet file count (file opens
    * grow with rebuild frequency only — the table never appends — but
    * a small-executor build can still fragment). */
  def lmReport(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_lm")
      .select(input_file_name().as("__f__"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("__f__")).as("files"))
      .select(lit(s"${name}_lm").as("table"), col("rows"), col("files"))

  /** Compact to one file per bucket — online-safe generation flip
    * ([[graft.api.GraftFrame.compactBucketedTable]] contract). */
  def compactLm(spark: SparkSession, name: String): Unit =
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_lm")

  /** OOV drift of a fresh reference slice against the stored model:
    * the fraction of the slice's gram OCCURRENCES whose (ctx, w) the
    * model has never seen — a pure integer ratio (one division), so
    * the observable is engine-deterministic. A growing OOV rate means
    * the reference distribution moved and scores are decaying
    * silently; the action is [[writeLm]] on the current reference. */
  def lmOovRate(spark: SparkSession, name: String, path: String,
                freshRef: DataFrame, textCol: String): Double = {
    val (n, _) = readLmMeta(spark, path)
    val base = freshRef.select(toks(col(textCol)).as("__t__"))
      .filter(size(col("__t__")) >= n)
      .select(explode(gramsOf(col("__t__"), n)).as("g"))
      .select(col("g.ctx").as("ctx"), col("g.w").as("w"))
    val row = base.join(spark.table(s"${name}_lm").select("ctx", "w")
          .withColumn("__hit__", lit(true)),
        Seq("ctx", "w"), "left")
      .agg(count(lit(1)).as("total"),
        sum(when(col("__hit__").isNull, 1L).otherwise(0L)).as("oov"))
      .head()
    if (row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }
}
