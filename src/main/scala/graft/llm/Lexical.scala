package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Lexical (keyword) retrieval: BM25 ranked search over the documents
  * corpus, the persisted inverted ("postings") index that serves it at
  * scale, and reciprocal-rank fusion for hybrid lexical+vector search —
  * the retrieval modality the similarity family (brute/LSH/IVF/int8/PQ)
  * did not cover. A training-data pipeline reaches for it constantly:
  * decontamination lookups by benchmark phrasing, quality mining
  * ("find docs about X"), targeted retraction ("everything mentioning
  * Y"), and the lexical leg of hybrid retrieval-augmented dedup review.
  *
  * Scoring is the BM25 family (Robertson/Spärck Jones probabilistic
  * relevance; the Lucene `BM25Similarity` shape): per matched term
  *
  *   idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  *
  * with ONE deliberate deviation, following this repo's documented
  * cross-engine precedent ([[TextStats.tfIdfTopTerms]]): the default
  * idf is the LOG-FREE odds ratio (N − df + 0.5)/(df + 0.5) rather than
  * its logarithm. Every arithmetic step of that form — integer→double
  * conversions, one multiply, one divide per factor — is IEEE
  * correctly-rounded and therefore bit-identical on any engine, so the
  * DuckDB oracle hash-checks scores exactly. An ln()-based idf is NOT
  * reproducible across libm implementations: measured here, JVM
  * `Math.log` vs DuckDB `ln` differ in the last ulp on 7 of the 5,550
  * inputs of the exhaustive (N ≤ 5000, df ≤ N) gate domain (and Spark's
  * own Log expression evaluates `StrictMath.log`, a third rounding). The
  * standard logarithmic idf ln(1 + odds) remains available via
  * `logIdf = true` (monotone in the same odds ratio, so single-term
  * rankings agree; multi-term sums can reorder) and is spec-checked
  * in-engine against a driver-side reference instead of oracled.
  *
  * Determinism of the per-(query, doc) SUM over matched terms uses the
  * ordered-fold discipline (the PQ ADC precedent): Spark folds an
  * array_sort'ed (term, score) list left-to-right; the oracle mirrors
  * with DuckDB `list_sum(list(s ORDER BY term))`. Ties in the final
  * ranking break by doc id, so row_number is total on both engines.
  *
  * Scale shape (the 100 TB contract): tokenization, dl and per-term
  * scores are blockwise column arithmetic (no UDFs — everything stays
  * inside WholeStageCodegen); the corpus side shuffles once on `term`
  * for tf/df; the query side is |Q|-sized and joins after the corpus
  * postings are pruned to the query's terms (semi-join one-shot,
  * partition pruning on the persisted index), so per-(q, d) state is
  * bounded by query length, never corpus size.
  */
object Lexical {

  /** One filtered-token array definition shared by every path: split on
    * whitespace runs, drop empties and terms shorter than minTermLen.
    * Mirrored exactly by [[tokensSql]]. */
  private[llm] def tokensOf(text: Column, minTermLen: Int): Column =
    filter(split(text, "\\s+", -1),
      t => t =!= "" && length(t) >= minTermLen)

  private[graft] def tokensSql(text: String, minTermLen: Int): String =
    s"list_filter(regexp_split_to_array($text, '\\s+'), " +
      s"t -> t <> '' AND length(t) >= $minTermLen)"

  /** Postings rows (doc, term, tf, dl) in ONE pass over the corpus:
    * dl (the doc's kept-token count — the [[tokensOf]] filter defines
    * both the terms and the length, so the index stays self-consistent)
    * rides the explode, and the (doc, term) aggregate is the single
    * corpus-sized shuffle. Zero-token docs carry no postings row; their
    * corpus-stats contribution comes from [[docLengths]]. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               minTermLen: Int = 2): DataFrame = {
    val toks = tokensOf(col(textCol), minTermLen)
    // r16 optimization: tokenize ONCE PER ROW through a projected
    // attribute. Inlining `toks` into both size() and explode() let the
    // generate re-evaluate the split+filter expression per EXPLODED row
    // (~tokens-per-doc times the tokenization cost — measured 4.5 s vs
    // 0.25 s on the bench corpus); the two-step projection pins one
    // evaluation, the Dedup banding precedent. CollapseProject keeps the
    // split because the alias is referenced twice and non-cheap.
    // Spread: regex tokenization is still the expensive per-byte stage —
    // widen sub-parallelism inputs (no-op at real file counts).
    Spread(docs, target = 256L << 10)
      .select(col(idCol).as("doc_id"), toks.as("__toks__"))
      .select(col("doc_id"),
        coalesce(size(col("__toks__")), lit(0)).as("dl"),
        explode(col("__toks__")).as("term"))
      .groupBy(col("doc_id"), col("term"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select("doc_id", "term", "tf", "dl")
  }

  /** (doc_id, dl) for EVERY doc, including zero-token ones — the frame
    * corpus stats aggregate over (and the id/replay boundary of the
    * persisted index, where the per-doc dl makes retraction's stats
    * rewrite exact). */
  def docLengths(docs: DataFrame, idCol: String, textCol: String,
                 minTermLen: Int = 2): DataFrame =
    Spread(docs, target = 256L << 10).select(col(idCol).as("doc_id"),
      coalesce(size(tokensOf(col(textCol), minTermLen)), lit(0)).as("dl"))

  /** Round-trip-exact double literal for oracle SQL: Scala's
    * Double.toString is shortest-round-trip, and VARCHAR→DOUBLE is
    * correctly rounded in DuckDB (the QHelp.dbl precedent) — a bare SQL
    * decimal literal would parse as DECIMAL and double-round. */
  private def dlit(x: Double): String = s"CAST('${x.toString}' AS DOUBLE)"

  /** The per-term BM25 score — THE single Scala definition.
    * `nDocs`/`df`/`tf`/`dl` are integral columns; `avgdl` a double.
    * Constants are pre-combined in Scala ((k1+1), k1(1−b), k1·b — one
    * IEEE op each) and injected into the SQL mirror via [[dlit]], so
    * both engines run the identical operation tree. */
  private[llm] def termScore(tf: Column, df: Column, dl: Column,
                             nDocs: Column, avgdl: Column,
                             k1: Double, b: Double,
                             logIdf: Boolean): Column = {
    val odds = (nDocs.cast("double") - df.cast("double") + lit(0.5)) /
      (df.cast("double") + lit(0.5))
    val idf = if (logIdf) log(lit(1.0) + odds) else odds
    val tfp = (tf.cast("double") * lit(k1 + 1.0)) /
      (tf.cast("double") + lit(k1 * (1.0 - b)) +
        lit(k1 * b) * (dl.cast("double") / avgdl))
    idf * tfp
  }

  /** DuckDB mirror of [[termScore]] (log-free form only — the ln form
    * is deliberately not oracle-expressible, see the object scaladoc). */
  private[graft] def termScoreSql(tf: String, df: String, dl: String,
                                  nDocs: String, avgdl: String,
                                  k1: Double = 1.2,
                                  b: Double = 0.75): String =
    s"(((CAST($nDocs AS DOUBLE) - CAST($df AS DOUBLE) + 0.5) / " +
      s"(CAST($df AS DOUBLE) + 0.5)) * " +
      s"((CAST($tf AS DOUBLE) * ${dlit(k1 + 1.0)}) / " +
      s"(CAST($tf AS DOUBLE) + ${dlit(k1 * (1.0 - b))} + " +
      s"${dlit(k1 * b)} * (CAST($dl AS DOUBLE) / $avgdl))))"

  /** Distinct (query_id, term) rows from a query frame — BM25's query
    * side is a term SET (query-side tf weighting adds little for short
    * queries and is omitted, the common Lucene practice). */
  private def queryTerms(queries: DataFrame, qIdCol: String,
                         qTextCol: String, minTermLen: Int): DataFrame =
    queries.select(col(qIdCol).as("query_id"),
        explode(tokensOf(col(qTextCol), minTermLen)).as("term"))
      .distinct()

  /** Shared scoring tail: postings ALREADY restricted to the query's
    * terms (semi-join or partition pruning upstream — df over the
    * restriction equals corpus df for those terms, because a term's
    * postings are never split by the restriction), one-row stats frame
    * (n_docs, total_len), distinct query terms. Per-(query, doc) scores
    * fold in term order; rank is row_number(score DESC, doc ASC). */
  private def scoreAndRank(restricted: DataFrame, stats: DataFrame,
                           qterms: DataFrame, k: Int, k1: Double,
                           b: Double, logIdf: Boolean): DataFrame = {
    val df_ = restricted.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = restricted.join(df_, "term")
      .join(qterms, "term")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl",
        col("total_len").cast("double") / col("n_docs").cast("double"))
      .withColumn("s", termScore(col("tf"), col("df"), col("dl"),
        col("n_docs"), col("avgdl"), k1, b, logIdf))
    val folded = scored.groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("term"), col("s"))).as("xs"),
        count(lit(1)).as("n_terms"))
      .withColumn("score", aggregate(array_sort(col("xs")), lit(0.0),
        (acc, x) => acc + x.getField("s")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id").asc)
    folded.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "n_terms", "score", "rank")
  }

  /** One-shot BM25 top-k: build postings in-plan and rank `queries`
    * against them. The corpus pays one (doc, term) shuffle; postings
    * are then pruned to the query's terms with a broadcast semi-join
    * BEFORE df/scoring, so everything downstream is sized by matched
    * postings, not the corpus. For a standing corpus, build the
    * persisted index once ([[writeLexicalIndex]]) and serve with
    * [[bm25TopKIndexed]] — this form re-tokenizes the corpus per call.
    *
    * Returns (query_id, doc_id, n_terms, score, rank), rank 1..k per
    * query, deterministic (ties break by doc_id). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queries: DataFrame, qIdCol: String, qTextCol: String,
               k: Int, k1: Double = 1.2, b: Double = 0.75,
               minTermLen: Int = 2, logIdf: Boolean = false): DataFrame = {
    require(k >= 1, "bm25TopK needs k >= 1")
    val p = postings(docs, idCol, textCol, minTermLen)
    // r16 optimization — ONE tokenization pass, not two: corpus stats
    // used to come from a separate docLengths scan that re-tokenized
    // the whole corpus just to sum dl (measured: the two branches were
    // the query's two ~4 s jobs). total_len now folds from the postings
    // pass (per-doc dl rides every postings row; zero-token docs add 0
    // either way — the coalesce covers the all-zero-token corpus, where
    // the old sum over dl=0 rows was 0, not NULL), and n_docs is a
    // column-pruned count over the raw docs — no tokenizer in sight.
    // The postings subtree feeds both consumers through one exchange
    // (AQE stage reuse), so the scan+tokenize runs once.
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val lenSum = p.groupBy(col("doc_id")).agg(max(col("dl")).as("dl"))
      .agg(coalesce(sum(col("dl")), lit(0L)).as("total_len"))
    val stats = nDocs.crossJoin(lenSum)
    val qt = queryTerms(queries, qIdCol, qTextCol, minTermLen)
    val restricted = p.join(
      broadcast(qt.select("term").distinct()), Seq("term"), "left_semi")
    scoreAndRank(restricted, stats, qt, k, k1, b, logIdf)
  }

  // ------------------------------------------------------------------
  // Persisted inverted index — the lexical family's production form.
  //
  // Two bucketed tables: `<name>_postings` (doc_id, term, tf, dl)
  // bucketed on `term` (a query's IN-literal restriction bucket-prunes
  // the scan — the corpus read is proportional to the query's terms,
  // never corpus size) and `<name>_doclens` (doc_id, dl) bucketed on
  // `doc_id` (the id/replay boundary AND the corpus-stats source — a
  // two-long column scan per serve keeps n_docs/avgdl exact through
  // appends, retractions and compactions with no stats sidecar to
  // drift). Tokenization geometry (minTermLen) is stamped beside the
  // tables; serving reads the stamp, so a caller can never score with a
  // tokenizer the index wasn't built with.

  private def metaFile(path: String) = s"$path/_graft_lexical_meta.json"

  private def stampMeta(spark: SparkSession, path: String,
                        minTermLen: Int, buckets: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(metaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(
      s"""{"minTermLen":$minTermLen,"buckets":$buckets}\n""".getBytes("UTF-8"))
    finally os.close()
  }

  /** (minTermLen, buckets) from the stamp — a stampless directory is a
    * crashed or foreign build and refuses loudly (serving it would score
    * with an unknown tokenizer; appending would guess a bucket count). */
  private[llm] def readMeta(spark: SparkSession, path: String): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(metaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no lexical index stamp at ${metaFile(path)} — build with " +
        "writeLexicalIndex first")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def field(n: String): Int =
      (s""""$n"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(txt) match {
        case Some(m) => m.group(1).toInt
        case None => throw new IllegalStateException(
          s"malformed lexical index stamp at ${metaFile(path)}: $txt")
      }
    (field("minTermLen"), field("buckets"))
  }

  /** Build (or wholesale REBUILD) the persisted index. Overwrite-mode
    * bucketed writes reset each table's compaction generation chain; the
    * stamp lands LAST so a crashed build leaves no stamp and serving
    * refuses it. A rebuild re-populates an existing id-Bloom sidecar in
    * lockstep (a stale-behind sidecar would answer "definitely new" for
    * ids the new index DOES contain — the silent double-insert
    * direction). */
  def writeLexicalIndex(docs: DataFrame, idCol: String, textCol: String,
                        name: String, path: String, buckets: Int = 8,
                        minTermLen: Int = 2): Unit = {
    val spark = docs.sparkSession
    graft.api.GraftFrame(postings(docs, idCol, textCol, minTermLen))
      .toBucketedTable(s"${name}_postings", s"$path/postings", buckets,
        Seq("term"))
    graft.api.GraftFrame(docLengths(docs, idCol, textCol, minTermLen))
      .toBucketedTable(s"${name}_doclens", s"$path/doclens", buckets,
        Seq("doc_id"))
    stampMeta(spark, path, minTermLen, buckets)
    if (KeyBlooms.exists(spark, path, "idblooms"))
      KeyBlooms.rebuild(spark.table(s"${name}_doclens")
        .select(col("doc_id").as("key")), path, "idblooms")
  }

  /** Opt-in id-Bloom sidecar over the doclens boundary — with it, a
    * steady-state append's replay guard reads NO corpus id column
    * ([[KeyBlooms.presentIds]] auto-routes when the sidecar exists). */
  def buildLexicalIdBlooms(spark: SparkSession, name: String, path: String,
                           nBlooms: Int = 32, fpp: Double = 0.01): Unit =
    KeyBlooms.buildFrom(spark.table(s"${name}_doclens")
      .select(col("doc_id").as("key")), path, "idblooms", nBlooms, fpp)

  /** Replay-safe incremental append: fold a day's shard into the index.
    * Already-present ids drop (resubmitting a shard is a no-op), and the
    * write ORDER makes every crash window recoverable by replaying the
    * same shard:
    *
    *  1. id-Bloom sidecar (when present) — stale-AHEAD positives only
    *     route to the exact boundary check, never a missed duplicate;
    *  2. `doclens` — the boundary commits BEFORE content, so a crash
    *     here can never let a replay double-append postings (duplicate
    *     postings rows would silently double df and tf-fold terms);
    *  3. `postings` — a crash between 2 and 3 leaves present docs with
    *     dl > 0 and no postings rows; the ORPHAN RECOVERY below
    *     re-derives exactly those docs' postings from the replayed
    *     shard's text (bounded by the present set — a steady-state day
    *     has zero present ids and never probes).
    *
    * Single-appender contract per index (the [[KeyBlooms]] precedent):
    * concurrent appends of DISTINCT shards are file-additive and safe;
    * the same doc id racing through two appenders can double-land —
    * serialize shard submissions per index. Returns the number of docs
    * actually landed. */
  def appendToLexicalIndex(newDocs: DataFrame, idCol: String,
                           textCol: String, name: String, path: String,
                           presentCap: Int = 10000): Long = {
    val spark = newDocs.sparkSession
    val (minTermLen, buckets) = readMeta(spark, path)
    val shardIds = newDocs.select(col(idCol).as("doc_id")).distinct()
    // pinned ONCE before any append mutates the boundary it reads
    val present = KeyBlooms.presentIds(shardIds, "doc_id",
      spark.table(s"${name}_doclens").select("doc_id"), path)
      .localCheckpoint(true)
    val presentRows = present.take(presentCap + 1)

    // ORPHAN RECOVERY (crashed-append replay): present docs whose
    // doclens row says dl > 0 but that have no postings rows. The
    // postings probe is doc_id over a term-bucketed table — an honest
    // column-pruned scan, paid only when the present set is non-empty
    // (i.e. on a replay), IN-literal-pushed under the cap.
    val recovered: Option[DataFrame] =
      if (presentRows.isEmpty) None
      else {
        val withDl = spark.table(s"${name}_doclens")
          .join(broadcast(present), Seq("doc_id"))
          .filter(col("dl") > 0)
        val postingsT = spark.table(s"${name}_postings")
        val have =
          (if (presentRows.length <= presentCap)
            postingsT.filter(col("doc_id")
              .isInCollection(presentRows.map(_.get(0)).toSeq))
          else
            postingsT.join(broadcast(present), Seq("doc_id"), "left_semi"))
            .select("doc_id").distinct()
        val orphans = withDl.select("doc_id")
          .join(have, Seq("doc_id"), "left_anti")
        val orphanDocs = newDocs.join(
          broadcast(orphans.withColumnRenamed("doc_id", idCol))
            .select(idCol), Seq(idCol), "left_semi")
        val p = postings(orphanDocs, idCol, textCol, minTermLen)
          .localCheckpoint(true)
        if (p.isEmpty) None else Some(p)
      }

    // lineage-free BEFORE the appends: the fresh plan reads the doclens
    // table this function is about to append to, and saveAsTable's
    // refresh re-runs dependent cached plans against the GROWN boundary
    // (the appendShardToIndex lesson)
    val fresh = newDocs.join(
      broadcast(present.withColumnRenamed("doc_id", idCol)).select(idCol),
      Seq(idCol), "left_anti").localCheckpoint(true)
    val freshP = postings(fresh, idCol, textCol, minTermLen)
      .localCheckpoint(true)
    val freshD = docLengths(fresh, idCol, textCol, minTermLen)
      .localCheckpoint(true)

    if (KeyBlooms.exists(spark, path, "idblooms"))
      KeyBlooms.append(freshD.select(col("doc_id").as("key")), path,
        "idblooms")
    graft.api.GraftFrame(freshD).toBucketedTable(s"${name}_doclens",
      s"$path/doclens", buckets, Seq("doc_id"), mode = "append")
    val allP = recovered.fold(freshP)(r => freshP.unionByName(r))
    graft.api.GraftFrame(allP).toBucketedTable(s"${name}_postings",
      s"$path/postings", buckets, Seq("term"), mode = "append")
    freshD.count()
  }

  /** Serve BM25 from the persisted index — hash-identical to the
    * one-shot [[bm25TopK]] over the same corpus (spec- and
    * oracle-pinned): the postings restriction keeps every row of each
    * query term, so df over it equals corpus df, and the stats
    * aggregate reads the full doclens boundary. Under `termCap` the
    * restriction inlines the query's terms as an InSet literal, which
    * BUCKET-PRUNES the postings scan (plan-asserted); past the cap it
    * falls back to the plain semi-join — identical output, whole-scan
    * cost stated honestly. */
  def bm25TopKIndexed(spark: SparkSession, name: String, path: String,
                      queries: DataFrame, qIdCol: String, qTextCol: String,
                      k: Int, k1: Double = 1.2, b: Double = 0.75,
                      logIdf: Boolean = false,
                      termCap: Int = 10000): DataFrame = {
    require(k >= 1, "bm25TopKIndexed needs k >= 1")
    val (minTermLen, _) = readMeta(spark, path)
    val qt = queryTerms(queries, qIdCol, qTextCol, minTermLen)
      .localCheckpoint(true) // evaluated once: the term probe + scoring join
    val termRows = qt.select("term").distinct().take(termCap + 1)
    val postingsT = spark.table(s"${name}_postings")
    val restricted =
      if (termRows.isEmpty) postingsT.limit(0)
      else if (termRows.length <= termCap)
        postingsT.filter(col("term")
          .isInCollection(termRows.map(_.getString(0)).toSeq))
      else
        postingsT.join(broadcast(qt.select("term").distinct()),
          Seq("term"), "left_semi")
    val stats = spark.table(s"${name}_doclens")
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_len"))
    scoreAndRank(restricted, stats, qt, k, k1, b, logIdf)
  }

  /** Maintenance observable: per table, row count and parquet file
    * count (file opens grow O(append days)) — schedules
    * [[compactLexicalIndex]]; the [[Dedup.indexReport]] sibling. */
  def lexicalIndexReport(spark: SparkSession, name: String): DataFrame =
    Seq("postings", "doclens").map(s => s"${name}_$s").map { t =>
      spark.table(t)
        .select(input_file_name().as("__f__"))
        .agg(count(lit(1)).as("rows"),
          countDistinct(col("__f__")).as("files"))
        .select(lit(t).as("table"), col("rows"), col("files"))
    }.reduce(_ unionByName _)

  /** Compact both tables back to one file per bucket — online-safe vs
    * readers, writer-exclusive ([[graft.api.GraftFrame.compactBucketedTable]]
    * contract: generation flip via `ALTER TABLE SET LOCATION`). */
  def compactLexicalIndex(spark: SparkSession, name: String): Unit = {
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_postings")
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_doclens")
  }

  /** RETRACT documents by id — the lexical leg of a takedown batch:
    * both tables rewrite their survivors into a new generation
    * (a retraction IS a compaction with an anti-join transform,
    * [[Dedup.retractFromTextIndex]] posture; O(index), so batch
    * requests). `postings` rewrites FIRST: the safe crash direction is
    * "unfindable but still in the boundary" (stale stats, re-run the
    * batch) — boundary-first would let a same-id resubmission re-append
    * postings beside the crashed retraction's surviving rows, silently
    * doubling df. A retracted id leaves the Bloom sidecar as a stale
    * POSITIVE (routes to the exact check — correct); the id can land
    * again afterwards, which is the point of a takedown. Returns
    * per-table (rows before, rows after). */
  def retractFromLexicalIndex(spark: SparkSession, name: String,
                              ids: DataFrame, idCol: String)
      : Map[String, (Long, Long)] =
    Dedup.withStagedIds(spark, ids, idCol) { idsPath =>
      Seq("postings", "doclens").map(s => s"${name}_$s").map { t =>
        t -> graft.api.GraftFrame.rewriteBucketedTable(spark, t,
          raw => raw.join(
            broadcast(raw.sparkSession.read.parquet(idsPath)
              .withColumnRenamed(idCol, "doc_id")),
            Seq("doc_id"), "left_anti"),
          "retractFromLexicalIndex")
      }.toMap
    }

  /** INDEX-ROUTED retroactive decontamination — the "new benchmark
    * arrives, sweep the standing corpus" shape. The full-scan form
    * ([[Dedup.contaminationReport]]) re-shingles the ENTIRE corpus per
    * benchmark; at 100 TB that is the most expensive query a takedown
    * team runs. This form routes through the postings index instead:
    *
    *  1. each benchmark k-shingle elects a CHAMPION term — its
    *     rarest indexable word by corpus df (the classic rare-term
    *     pre-filter from search; df read from the index's own postings,
    *     restricted to the benchmark's term set first, so the df pass
    *     is benchmark-sized). A champion absent from the corpus
    *     (df = 0) proves no doc contains that shingle — it prunes to
    *     nothing, exactly.
    *  2. candidates = docs holding ANY champion term (Σ df(champion)
    *     rows — small for distinctive benchmark phrasing by
    *     construction: the champion is the rarest word of the phrase).
    *     Under `termCap` distinct benchmark terms, the postings
    *     restriction inlines them as an InSet literal and BUCKET-PRUNES
    *     the scan (the [[bm25TopKIndexed]] discipline); past the cap it
    *     falls back to a broadcast semi-join — identical output, a
    *     whole-postings (never corpus-text) scan, stated honestly;
    *  3. the EXACT shingle-overlap verify
    *     ([[Dedup.contaminationReport]]) runs on the candidate docs
    *     only — the corpus text store is read through a semi-join on
    *     the candidate ids, never scanned in full.
    *
    * SOUND: a doc sharing a shingle contains every word of that
    * contiguous run; every indexable word of the run (≥ minTermLen, no
    * internal whitespace — a `split(" ")` token without internal
    * whitespace is a maximal `\s+` run, so it IS an index term of the
    * doc) is in the doc's postings, the champion included. Docs the
    * full-scan report lists only through a 2³¹-hash COLLISION (no true
    * word overlap) may be absent here — the indexed path reports true
    * shingle sharing. A benchmark shingle with ZERO indexable terms
    * cannot bound its candidates: the call refuses loudly naming the
    * full-scan fallback rather than silently under-reporting. */
  def contaminationReportIndexed(train: DataFrame, bench: DataFrame,
                                 idCol: String, textCol: String,
                                 name: String, path: String,
                                 k: Int = 5,
                                 termCap: Int = 10000): DataFrame = {
    val spark = train.sparkSession
    val (minTermLen, _) = readMeta(spark, path)
    val words = split(col(textCol), " ", -1) // the shingle tokenization
    // r16 optimization: split once per row through a projected attribute
    // — inlining `words` into the transform lambda re-evaluated the
    // split per shingle position (the postings lesson)
    val sh = bench.filter(size(words) >= k)
      .select(words.as("__wd__"))
      .select(explode(transform(sequence(lit(0), size(col("__wd__")) - k),
        i => slice(col("__wd__"), i + lit(1), lit(k)))).as("sh"))
      .distinct()
    // benchmark-sized, referenced by the refusal probe, the df join and
    // the champion election — evaluated once
    val shTerms = sh.select(col("sh"),
      explode(array_distinct(filter(col("sh"),
        t => length(t) >= minTermLen && !t.rlike("\\s")))).as("term"))
      .localCheckpoint(true)
    val bad = sh.join(shTerms.select("sh").distinct(), Seq("sh"),
      "left_anti")
    require(bad.isEmpty,
      s"a benchmark $k-shingle has no indexable term (every word " +
        s"shorter than minTermLen=$minTermLen or whitespace-bearing) — " +
        "the index cannot bound its candidates; run " +
        "Dedup.contaminationReport (full corpus scan) for this benchmark")
    val postingsT = spark.table(s"${name}_postings")
    val termRows = shTerms.select("term").distinct().take(termCap + 1)
    val restricted =
      if (termRows.isEmpty) postingsT.limit(0)
      else if (termRows.length <= termCap)
        postingsT.filter(col("term")
          .isInCollection(termRows.map(_.getString(0)).toSeq))
      else
        postingsT.join(broadcast(shTerms.select("term").distinct()),
          Seq("term"), "left_semi")
    val dfs = restricted.groupBy("term").agg(count(lit(1)).as("df"))
    val champions = shTerms.join(dfs, Seq("term"), "left")
      .withColumn("df", coalesce(col("df"), lit(0L)))
      .groupBy("sh").agg(min(struct(col("df"), col("term"))).as("c"))
      .select(col("c").getField("term").as("term")).distinct()
    val candidates = restricted.join(broadcast(champions), Seq("term"),
        "left_semi")
      .select(col("doc_id").as(idCol)).distinct()
    Dedup.contaminationReport(
      train.join(candidates, Seq(idCol), "left_semi"), bench, idCol,
      textCol, k)
  }

  /** Drop the indexed report's docs — [[Dedup.decontaminate]] through
    * the index route. */
  def decontaminateIndexed(train: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           name: String, path: String,
                           k: Int = 5): DataFrame =
    train.join(
      contaminationReportIndexed(train, bench, idCol, textCol, name,
        path, k).select(idCol),
      Seq(idCol), "left_anti")

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher 2009): fuse named
    * rank lists — e.g. a BM25 run and an ANN run over the same doc-id
    * domain — by score(d) = Σ_runs 1/(k0 + rank_run(d)). Pure integer
    * inputs and one correctly-rounded division per contribution, summed
    * with the ordered-fold discipline (run tag order), so the fusion is
    * oracle-exact. Each run must rank a doc at most once (a ranking, by
    * definition); a doc absent from a run simply contributes nothing.
    * Returns (query_id, doc_id, n_runs, rrf_score, rank) top-k. */
  def rrfFuse(runs: Seq[(String, DataFrame)], qIdCol: String,
              docIdCol: String, rankCol: String, k: Int,
              k0: Int = 60): DataFrame = {
    require(runs.nonEmpty, "rrfFuse needs at least one run")
    require(runs.map(_._1).distinct.size == runs.size,
      "rrfFuse run tags must be unique — the fold orders by tag")
    val tagged = runs.map { case (tag, r) =>
      r.select(col(qIdCol).cast("long").as("query_id"),
        col(docIdCol).cast("long").as("doc_id"),
        lit(tag).as("run"),
        (lit(1.0) / (lit(k0).cast("double") + col(rankCol).cast("double")))
          .as("s"))
    }.reduce(_.unionByName(_))
    val folded = tagged.groupBy("query_id", "doc_id")
      .agg(collect_list(struct(col("run"), col("s"))).as("xs"),
        count(lit(1)).as("n_runs"))
      .withColumn("rrf_score", aggregate(array_sort(col("xs")), lit(0.0),
        (acc, x) => acc + x.getField("s")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
    folded.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "n_runs", "rrf_score", "rank")
  }
}
