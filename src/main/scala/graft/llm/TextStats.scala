package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text quality / analysis columns for training-data curation.
  * All pure Column arithmetic (codegen'd, blockwise, zero shuffle):
  * at 100 TB these fuse into the parquet scan stage.
  */
object TextStats {

  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count: alpha runs ≈ 1 token / 4 chars (ceil),
    * digits and symbols 1 token each — the standard quick estimator when
    * the real tokenizer is out of process. */
  def tokenCountBpeIsh(text: Column): Column = {
    val alphaChars = length(regexp_replace(text, "[^A-Za-z]", ""))
    val digits = length(regexp_replace(text, "[^0-9]", ""))
    val symbols = length(regexp_replace(text, "[A-Za-z0-9 ]", ""))
    ceil(alphaChars.cast("double") / 4.0).cast("long") + digits + symbols
  }

  def charCount(text: Column): Column = length(text)

  def avgTokenLen(text: Column): Column = {
    val t = split(text, " ")
    aggregate(transform(t, w => length(w).cast("long")), lit(0L), _ + _)
      .cast("double") / size(t)
  }

  /** distinct-token ratio — low values flag boilerplate/spam. */
  def typeTokenRatio(text: Column): Column = {
    val t = split(text, " ")
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** ANSI-safe: an empty string yields null, not a DIVIDE_BY_ZERO that
    * kills the job (Spark 4 ANSI throws on x/0 — one empty doc in a
    * 100 TB corpus must not fail the pipeline). */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(null)).otherwise(
      (length(text) - length(regexp_replace(text, "[.,!?;:]", "")))
        .cast("double") / length(text))

  def stopwordCount(text: Column, stopwords: Seq[String]): Column =
    size(filter(split(text, " "), w => w.isInCollection(stopwords)))

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = split(text, " ")
    size(filter(t, w => w.isInCollection(stopwords))).cast("double") / size(t)
  }

  /** Marker-token language scorer (n-gram-heuristic shape: count hits
    * against per-language marker lists, argmax with deterministic
    * tie-break by language code). Swap marker lists for real per-language
    * n-grams in production. */
  def langScores(text: Column, markers: Map[String, Seq[String]]): Seq[(String, Column)] =
    markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> stopwordCount(text, words)
    }

  def langPredict(text: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = langScores(text, markers)
    // argmax by (score, then reverse-alphabetical wins ties deterministically)
    scored.map { case (lang, s) => struct(s.as("s"), lit(lang).as("l")) }
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
      .getField("l")
  }

  /** The Gopher-style keep predicate as ONE boolean Column — every
    * signal (token shape, dup-line fraction, top-2-gram concentration)
    * is a per-row expression since TopGramFrac went native, so the
    * whole gate FUSES into whatever scan feeds it: no explode, no
    * shuffle, no join. Codegen CSE shares the repeated struct
    * sub-expressions. */
  def qualityKeep(t: Column, minTokens: Int = 3, maxTokens: Int = 100000,
                  maxDupLineFrac: Double = 0.3,
                  maxTop2GramFrac: Double = 0.2): Column = {
    val ts = graft.functions.TextHashExprs.tokenStats(t, Seq.empty)
    val gf = graft.functions.TextHashExprs.topGramFrac(t, 2)
    val lines = split(t, "\n")
    val fracDup =
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines)
    val fracTop = when(gf.getField("total_count") > 0,
        gf.getField("top_count").cast("double") / gf.getField("total_count"))
      .otherwise(lit(0.0))
    ts.getField("n_tokens") >= minTokens &&
      ts.getField("n_tokens") <= maxTokens &&
      fracDup < maxDupLineFrac && fracTop < maxTop2GramFrac
  }

  /** The eight stop words of the published Gopher rule (Rae et al.
    * 2021, A1.1): a document must contain at least `minStopHits`
    * DISTINCT members or it is judged non-linguistic. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The COMPLETE published Gopher rule set (Rae et al. 2021, Appendix
    * A1.1) as one row of named metrics — the rules [[qualityKeep]]'s
    * token-shape/repetition trio doesn't cover: mean word length in
    * [3, 10]; symbol-to-word ratio (# and ellipsis, ASCII '...' or
    * '…') ≤ 0.1; ≤ 90% of lines starting with a bullet ('-', '*',
    * '•'); ≤ 30% of lines ending in an ellipsis; ≥ 80% of words
    * carrying at least one alphabetic character; and ≥ 2 distinct
    * members of the eight-stop-word set present.
    *
    * All pure per-row Column arithmetic over the whitespace/newline
    * structure — no explode, no shuffle, no join: the whole report
    * fuses into the input's scan (the higher-order filters evaluate
    * per row; move them into a native TokenStats-style pass if a
    * profile ever shows them hot). Ratios are exact-integer divisions
    * evaluated once as doubles, so the DuckDB oracle hash-checks every
    * metric bit-for-bit; empty-token docs yield 0-ratios rather than
    * an ANSI divide-by-zero kill. */
  def gopherStats(t: Column,
                  stopwords: Seq[String] = GopherStopWords): Column = {
    val toks = split(t, " ")
    val lines = split(t, "\n")
    val nTok = size(toks).cast("long")
    val nLine = size(lines).cast("long")
    val safeTok = when(nTok === 0, lit(1L)).otherwise(nTok)
    val meanWordLen = when(nTok === 0, lit(0.0)).otherwise(
      aggregate(transform(toks, w => length(w).cast("long")), lit(0L),
        _ + _).cast("double") / nTok)
    val nHash = (length(t) - length(regexp_replace(t, "#", "")))
      .cast("long")
    val nEllipsis =
      ((length(t) - length(regexp_replace(t, "\\.\\.\\.", ""))) / 3 +
        (length(t) - length(regexp_replace(t, "…", "")))).cast("long")
    val symbolRatio = (nHash + nEllipsis).cast("double") / safeTok
    val bulletFrac = size(filter(lines, l =>
      substring(ltrim(l), 1, 1).isin("-", "*", "•")))
      .cast("double") / nLine
    val ellipsisFrac = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
      .cast("double") / nLine
    val alphaFrac = when(nTok === 0, lit(0.0)).otherwise(
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nTok)
    val stopHits = size(array_intersect(array_distinct(toks),
      array(stopwords.map(lit): _*))).cast("long")
    struct(
      nTok.as("n_words"),
      meanWordLen.as("mean_word_len"),
      symbolRatio.as("symbol_ratio"),
      bulletFrac.as("bullet_line_frac"),
      ellipsisFrac.as("ellipsis_line_frac"),
      alphaFrac.as("alpha_word_frac"),
      stopHits.as("stop_hits"))
  }

  /** The Gopher keep predicate over [[gopherStats]] with the PUBLISHED
    * thresholds as defaults — one boolean Column that fuses into the
    * scan, composable with [[qualityKeep]] (which carries the
    * repetition rules this set doesn't). */
  def gopherKeep(t: Column,
                 minWords: Long = 50L, maxWords: Long = 100000L,
                 minMeanWordLen: Double = 3.0,
                 maxMeanWordLen: Double = 10.0,
                 maxSymbolRatio: Double = 0.1,
                 maxBulletLineFrac: Double = 0.9,
                 maxEllipsisLineFrac: Double = 0.3,
                 minAlphaWordFrac: Double = 0.8,
                 minStopHits: Long = 2L,
                 stopwords: Seq[String] = GopherStopWords): Column = {
    val g = gopherStats(t, stopwords)
    g.getField("n_words") >= minWords &&
      g.getField("n_words") <= maxWords &&
      g.getField("mean_word_len") >= minMeanWordLen &&
      g.getField("mean_word_len") <= maxMeanWordLen &&
      g.getField("symbol_ratio") <= maxSymbolRatio &&
      g.getField("bullet_line_frac") <= maxBulletLineFrac &&
      g.getField("ellipsis_line_frac") <= maxEllipsisLineFrac &&
      g.getField("alpha_word_frac") >= minAlphaWordFrac &&
      g.getField("stop_hits") >= minStopHits
  }

  /** Report form: every Gopher metric plus the keep verdict per doc —
    * the audit a curation run reads before committing to thresholds. */
  def gopherReport(docs: DataFrame, idCol: String, textCol: String,
                   minWords: Long = 50L, maxWords: Long = 100000L,
                   minMeanWordLen: Double = 3.0,
                   maxMeanWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1,
                   maxBulletLineFrac: Double = 0.9,
                   maxEllipsisLineFrac: Double = 0.3,
                   minAlphaWordFrac: Double = 0.8,
                   minStopHits: Long = 2L,
                   stopwords: Seq[String] = GopherStopWords): DataFrame =
    docs
      .withColumn("__g__", gopherStats(col(textCol), stopwords))
      .withColumn("__keep__", gopherKeep(col(textCol), minWords, maxWords,
        minMeanWordLen, maxMeanWordLen, maxSymbolRatio, maxBulletLineFrac,
        maxEllipsisLineFrac, minAlphaWordFrac, minStopHits, stopwords))
      .select(col(idCol), col("__g__.n_words"), col("__g__.mean_word_len"),
        col("__g__.symbol_ratio"), col("__g__.bullet_line_frac"),
        col("__g__.ellipsis_line_frac"), col("__g__.alpha_word_frac"),
        col("__g__.stop_hits"), col("__keep__").as("keep"))

  /** Filter form of [[qualityRules]]: keep passing docs, drop the rest,
    * zero added passes — the predicate rides the input's own scan. */
  def qualityFilter(docs: DataFrame, textCol: String,
                    minTokens: Int = 3, maxTokens: Int = 100000,
                    maxDupLineFrac: Double = 0.3,
                    maxTop2GramFrac: Double = 0.2): DataFrame =
    docs.filter(qualityKeep(col(textCol), minTokens, maxTokens,
      maxDupLineFrac, maxTop2GramFrac))

  def qualityRules(docs: DataFrame, idCol: String, textCol: String,
                   minTokens: Int = 3, maxTokens: Int = 100000,
                   maxDupLineFrac: Double = 0.3,
                   maxTop2GramFrac: Double = 0.2): DataFrame = {
    val t = col(textCol)
    val lines = split(t, "\n")
    // ONE blockwise pass: token stats and the top-2-gram concentration
    // are both native per-row expressions (TopGramFrac replaced the old
    // (doc, gram) explode + double aggregation + join-back — the whole
    // quality gate now fuses into the scan). Gram counts are exact
    // string-keyed counts, so frac_top_2gram is bit-identical to the
    // grouped form the oracle still computes.
    docs
      .withColumn("__ts__",
        graft.functions.TextHashExprs.tokenStats(t, Seq.empty))
      .withColumn("__gf__",
        graft.functions.TextHashExprs.topGramFrac(t, 2))
      .select(col(idCol),
        col("__ts__.n_tokens").as("n_tokens"),
        (col("__ts__.sum_token_len").cast("double") / col("__ts__.n_tokens"))
          .as("mean_word_len"),
        (lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
          .as("frac_dup_lines"),
        when(col("__gf__.total_count") > 0,
            col("__gf__.top_count").cast("double") / col("__gf__.total_count"))
          .otherwise(lit(0.0)).as("frac_top_2gram"))
      .withColumn("keep",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("frac_dup_lines") < maxDupLineFrac &&
          col("frac_top_2gram") < maxTop2GramFrac)
  }

  /** Corpus vocabulary: top-k whitespace tokens by total occurrence
    * count — the tokenizer-vocab / stopword-discovery pass. One explode + one
    * hash-aggregated count (partial map-side combine, so the shuffle
    * carries distinct-token partials, not token instances) + a
    * TakeOrdered top-k (per-partition heads, no global sort). Tie-break
    * on the token string keeps the cut deterministic on any engine. */
  def vocabulary(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    docs.select(explode(split(col(textCol), "\\s+", -1)).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)

  /** Per-document salient terms by tf·(N/df) — the log-free tf-idf
    * variant, chosen because every arithmetic step (integer products
    * below 2^53, one IEEE double division) is correctly rounded and
    * therefore bit-identical on any engine; a ln()-based idf would hash
    * differently across libm implementations. Scale shape: the term
    * explode shuffles (doc, term) once; document frequency reuses the
    * tf frame (already one row per (doc, term)) so no second distinct
    * pass; the corpus size N rides in as a broadcast single-row frame
    * (BroadcastNestedLoopJoin, not a CartesianProduct); per-doc top-k
    * is a window over the doc's own distinct terms — state bounded by
    * vocabulary-per-document, never corpus-wide. Tokenization mirrors
    * [[vocabulary]] (whitespace split, empties dropped). */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int, minTermLen: Int = 2): DataFrame = {
    require(k >= 1, "tfIdfTopTerms needs k >= 1")
    val terms = docs.select(col(idCol),
        explode(split(col(textCol), "\\s+", -1)).as("term"))
      .filter(col("term") =!= "" && length(col("term")) >= minTermLen)
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("__n__"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("term").asc)
    tf.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        (col("tf") * col("__n__")).cast("double") / col("df"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Within-document repeated-line removal (the C4/Dolma paragraph-dedup
    * family, complementing the corpus-level Dedup ops): keep each line's
    * FIRST occurrence, preserve original order, rejoin. Line explode is
    * blockwise; the two aggregations shuffle on (doc, line) then doc —
    * per-doc state is bounded by document size, the same contract as any
    * per-document op. Reassembly sorts by first-occurrence position
    * (unique per doc), so collect_list's arrival order never matters. */
  def dropRepeatedLines(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos__", "__line__")))
    lines.groupBy(col(idCol), col("__line__"))
      .agg(min(col("__pos__")).as("__first__"))
      .groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__first__"), col("__line__")))),
          x => x.getField("__line__")),
        "\n").as(textCol))
  }

  /** CORPUS-level boilerplate line removal (the RefinedWeb/Dolma
    * complement of [[dropRepeatedLines]]'s within-doc pass): drop every
    * line occurring in more than `maxDocFreq` DISTINCT documents —
    * headers, nav bars, cookie banners — keeping per-doc line order.
    * Scale shape: the line explode is blockwise; document frequency is
    * a two-level aggregate keyed on md5(line) (distinct (key, doc) then
    * count), so the wide shuffle carries a 32-char key + id, never line
    * text twice; the verdict rejoins by the same key (plain equi-join,
    * no broadcast — the frequency table is corpus-sized); reassembly
    * sorts by position within each doc. Docs whose every line is
    * boilerplate survive with empty text (left join back) so downstream
    * stages can flag rather than silently lose rows. md5 keying matches
    * [[Dedup.exact]]'s engine-portable discipline: the oracle groups on
    * the line text itself, equivalent because md5 equality is string
    * equality. */
  def dropBoilerplateLines(docs: DataFrame, idCol: String, textCol: String,
                           maxDocFreq: Int): DataFrame = {
    require(maxDocFreq >= 1, "dropBoilerplateLines needs maxDocFreq >= 1")
    val lines = docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("__pos__", "__line__")))
      .withColumn("__lh__", md5(col("__line__")))
    val freq = lines.select(col("__lh__"), col(idCol)).distinct()
      .groupBy("__lh__").agg(count(lit(1)).as("__df__"))
    val kept = lines
      .join(freq.filter(col("__df__") <= maxDocFreq).drop("__df__"), Seq("__lh__"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos__"), col("__line__")))),
          x => x.getField("__line__")),
        "\n").as(textCol))
    docs.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col(textCol), lit("")))
  }

  /** Deterministic sequence packing: assign each document to a
    * fixed-token-capacity shard — the "pack to N-token training
    * sequences" step of a pretraining pipeline. A document lands in the
    * shard where its span STARTS under a global cumulative token count in
    * `orderCol` order: shard = floor(exclusive_cumsum / capacity). Rides
    * WindowOps.globalCumSum's scale-safe two-pass plan (range-partitioned
    * local cumsums + an npartitions-row offset frame), so no global
    * single-task window touches the data. The shard id is
    * exact integer floor division ([[graft.QHelp.floorDiv]]) — long
    * arithmetic end to end, identical on any engine at any corpus
    * size (no double-rounding bound to argue about). */
  def packIntoShards(docs: DataFrame, idCol: String, tokenCol: String,
                     orderCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "packIntoShards needs a positive capacity")
    graft.operators.WindowOps.globalCumSum(docs, orderCol, tokenCol, "__cum__")
      .withColumn("shard",
        graft.QHelp.floorDiv(col("__cum__") - col(tokenCol), capacity))
      .drop("__cum__")
  }

  /** Split each document's whitespace tokens into fixed-size chunks of
    * at most `maxTokens` tokens, consecutive chunks sharing `overlap`
    * tokens — the context-window chunking an embedding or long-document
    * pipeline runs before a fixed-window model. Chunk i covers tokens
    * [i·stride, i·stride + maxTokens) with stride = maxTokens − overlap;
    * chunking stops at the first chunk whose window reaches the document
    * end, so no tail chunk is fully contained in its predecessor, and a
    * doc of ≤ maxTokens tokens yields exactly one chunk. NULL-text rows
    * are dropped (no tokens to chunk — the eligibility convention of the
    * dedup family).
    *
    * Scale shape: one split + a per-row sequence explode — blockwise, no
    * shuffle, no UDF, output rows ∝ input tokens / stride. The slice is
    * re-evaluated per chunk from the projected token array (O(tokens ×
    * chunks-per-doc) worst case — a straggler on book-length docs,
    * never a wrong answer), so docs beyond `maxDocTokens` tokens FAIL
    * LOUDLY naming [[chunkByTokensGrouped]], the linear one-shuffle
    * restructure (r12 verdict #6 — the qCap discipline applied to the
    * one remaining per-row quadratic). Raise the guard deliberately
    * when a modest overrun is cheaper than the grouped shuffle.
    *
    * Output: (idCol, chunk_id, chunk_text, n_tokens). */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int, overlap: Int = 0,
                    maxDocTokens: Int = 1 << 20): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap of $maxTokens")
    require(maxDocTokens >= maxTokens,
      s"maxDocTokens=$maxDocTokens must be at least maxTokens=$maxTokens")
    val stride = maxTokens - overlap
    val n = size(col("__t__"))
    val nChunks = when(n > maxDocTokens,
        raise_error(format_string(
          s"chunkByTokens: document %s holds %s tokens, beyond " +
            s"maxDocTokens=$maxDocTokens — its per-chunk re-slice " +
            "would straggle the task (O(tokens x chunks)); chunk it " +
            "with chunkByTokensGrouped (linear, one shuffle) or raise " +
            "maxDocTokens deliberately",
          col(idCol).cast("string"), n.cast("string"))).cast("int"))
      .when(n <= maxTokens, lit(1))
      .otherwise(lit(1) +
        ceil((n - maxTokens).cast("double") / stride).cast("int"))
    val chunkToks = slice(col("__t__"),
      col("chunk_id") * stride + lit(1), lit(maxTokens))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), split(col(textCol), " ").as("__t__"))
      .select(col(idCol), col("__t__"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col(idCol), col("chunk_id"),
        array_join(chunkToks, " ").as("chunk_text"),
        size(chunkToks).as("n_tokens"))
  }

  /** [[chunkByTokens]] restructured LINEAR for book-scale documents:
    * each token explodes once with its position, joins the (bounded ≤
    * ceil(maxTokens/stride)) chunk ids whose window covers it, and the
    * chunks group back in position order — O(tokens × chunks-per-TOKEN)
    * work per doc instead of the blockwise form's O(tokens ×
    * chunks-per-DOC) re-slice, at the price of ONE shuffle keyed on
    * (doc, chunk). Same output contract as [[chunkByTokens]]
    * bit-for-bit (parity spec + its own oracle); prefer the blockwise
    * form whenever docs fit its guard — no shuffle beats linear. */
  def chunkByTokensGrouped(docs: DataFrame, idCol: String,
                           textCol: String, maxTokens: Int,
                           overlap: Int = 0): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    require(overlap >= 0 && overlap < maxTokens,
      s"overlap must be in [0, maxTokens), got $overlap of $maxTokens")
    val stride = maxTokens - overlap
    val toks = split(col(textCol), " ")
    val n = col("__n__")
    val nChunks = when(n <= maxTokens, lit(1))
      .otherwise(lit(1) +
        ceil((n - maxTokens).cast("double") / stride).cast("int"))
    // chunk c covers tokens [c*stride, c*stride + maxTokens): token p
    // belongs to chunks ceil((p-maxTokens+1)/stride) .. floor(p/stride),
    // clamped to the doc's existing chunks — a non-empty range for every
    // p < n (the last chunk reaches the doc end by the stopping rule)
    val cmin = greatest(
      graft.QHelp.ceilDiv((col("__p__") - maxTokens + 1).cast("long"),
        stride).cast("int"), lit(0))
    val cmax = least(
      graft.QHelp.floorDiv(col("__p__").cast("long"), stride).cast("int"),
      nChunks - 1)
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), size(toks).as("__n__"),
        posexplode(toks).as(Seq("__p__", "__tok__")))
      .withColumn("chunk_id", explode(sequence(cmin, cmax)))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__p__"), col("__tok__")))),
          s => s.getField("__tok__")), " ").as("chunk_text"),
        count(lit(1)).cast("int").as("n_tokens"))
  }

  /** Concat-and-chop token-window spans — the GPT-style pretraining
    * layout: conceptually concatenate every document's tokens in the
    * deterministic shuffle order ([[graft.api.GraftFrame.shuffleIndex]]'s
    * Knuth-hash permutation, `seed`-rotated) and cut the stream into
    * fixed `windowSize`-token training windows. Each document gets its
    * global token offset and the RANGE of window ids it lands in —
    * boundary-straddling docs span several windows (unlike
    * [[packIntoShards]], which assigns a whole doc to the shard where
    * its span starts). Zero-token docs span their start window only.
    *
    * Scale shape: rides [[graft.operators.WindowOps.globalCumSum]]'s
    * two-pass range-partitioned plan — no single-task global window.
    * Window ids are exact integer floor division
    * ([[graft.QHelp.floorDiv]]): identical on any engine at any
    * corpus size — no double-rounding bound to argue about (a 100 TB
    * corpus is ~10^14). Keys must be numeric and distinct mod 2^31
    * (the shuffleIndex contract).
    *
    * Output: every input column + token_start (exclusive-cumsum global
    * offset), window_first, window_last, n_windows. */
  def tokenWindows(docs: DataFrame, idCol: String, tokenCol: String,
                   windowSize: Long, seed: Long = 0L,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    val kt = docs.schema(idCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tokenWindows: key column '$idCol' must be numeric (got " +
        s"${kt.simpleString}); factorize or hash string keys first")
    val withH = docs.withColumn("__sh__", graft.QHelp.keyHash31(
      pmod(col(idCol), lit(2147483648L)) + lit(seed % 2147483648L)))
    graft.operators.WindowOps
      // hashed form (r16): __sh__ is keyHash31-uniform in [0, 2^32) —
      // deterministic buckets replace sampled range boundaries, saving
      // the sampling pass that re-ran the (encode-bearing) child;
      // groupCols restarts the stream per group (the split-fused
      // landing), bit-identical to running each group separately
      .globalCumSumHashed(withH, "__sh__", tokenCol, "__cum__", 1L << 32,
        groupCols)
      .withColumn("token_start", col("__cum__") - col(tokenCol))
      .withColumn("window_first",
        graft.QHelp.floorDiv(col("token_start"), windowSize))
      .withColumn("window_last",
        when(col(tokenCol) > 0,
          graft.QHelp.floorDiv(col("__cum__") - 1, windowSize))
          .otherwise(col("window_first")))
      .withColumn("n_windows", col("window_last") - col("window_first") + 1)
      .drop("__sh__", "__cum__")
  }

  /** Explode [[tokenWindows]] spans into the (window, doc) assembly
    * list a shard builder actually consumes: one row per (window_id,
    * doc), carrying the DOC-LOCAL token sub-range [tok_from, tok_to)
    * that lands in that window and the window-local write offset
    * `window_pos`. A window's content is exactly the concatenation of
    * its rows' slices ordered by window_pos; slices of one doc tile the
    * doc across its windows with no gap or overlap (spec-pinned).
    * Zero-token docs emit one degenerate (0, 0) slice in their start
    * window — they keep an addressable position without contributing
    * tokens.
    *
    * Scale shape: the [[tokenWindows]] two-pass cumsum plus one explode
    * bounded by each doc's window span (≤ tokens/windowSize + 2 rows
    * per doc — output ∝ corpus tokens / windowSize + docs). */
  def tokenWindowMembers(docs: DataFrame, idCol: String, tokenCol: String,
                         windowSize: Long, seed: Long = 0L,
                         groupCols: Seq[String] = Nil): DataFrame =
    tokenWindows(docs, idCol, tokenCol, windowSize, seed, groupCols)
      .withColumn("window_id",
        explode(sequence(col("window_first"), col("window_last"))))
      .withColumn("tok_from",
        greatest(col("window_id") * windowSize - col("token_start"),
          lit(0L)))
      .withColumn("tok_to",
        least((col("window_id") + 1) * windowSize - col("token_start"),
          col(tokenCol).cast("long")))
      .withColumn("window_pos",
        greatest(col("token_start") - col("window_id") * windowSize,
          lit(0L)))
      .drop("window_first", "window_last", "n_windows")

  /** Materialize the training windows themselves — the end of the
    * concat-and-chop chain: every document's token slices
    * ([[tokenWindowMembers]] over the REAL whitespace token counts)
    * join in window order into (window_id, window_text, n_tokens).
    * Every window holds exactly `windowSize` tokens except the stream
    * tail (callers typically keep only full windows for training).
    * NULL-text docs drop (the chunking convention); zero-token members
    * contribute nothing and vanish from the assembly.
    *
    * Scale shape: the members explode plus ONE shuffle keyed on
    * window_id (each window's slices meet exactly once); within-window
    * order is the deterministic write offset, so the assembled text is
    * engine- and partitioning-independent. Window text is ~windowSize
    * tokens — size `windowSize` so a single assembled row stays far
    * under spark's row limits (a 8k-token window of ~6-byte tokens is
    * ~50 KB). */
  def assembleWindows(docs: DataFrame, idCol: String, textCol: String,
                      windowSize: Long, seed: Long = 0L,
                      groupCols: Seq[String] = Nil): DataFrame = {
    val toks = split(col(textCol), " ")
    val withN = docs.filter(col(textCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(col(idCol), toks.as("__toks__"),
        size(toks).cast("long").as("__n__")): _*)
    tokenWindowMembers(withN, idCol, "__n__", windowSize, seed, groupCols)
      .filter(col("tok_to") > col("tok_from"))
      .select(groupCols.map(col) ++ Seq(col("window_id"), col("window_pos"),
        slice(col("__toks__"), (col("tok_from") + 1).cast("int"),
          (col("tok_to") - col("tok_from")).cast("int")).as("__slice__")): _*)
      .groupBy(groupCols.map(col) :+ col("window_id"): _*)
      .agg(
        array_join(flatten(transform(
          array_sort(collect_list(struct(col("window_pos"),
            col("__slice__")))),
          s => s.getField("__slice__"))), " ").as("window_text"),
        sum(size(col("__slice__")).cast("long")).as("n_tokens"))
  }

  /** NEXT-FIT PACKED piece membership — the doc-aware alternative to
    * [[tokenWindowMembers]]'s concat-and-chop: documents are never
    * split across windows (the "fewer truncations" layout of Ding et
    * al. 2024; the packed-batch construction of Krell et al. 2021)
    * unless they exceed `windowSize`, in which case they pre-split
    * into windowSize-sized pieces so token conservation stays exact —
    * nothing is truncated away. Pieces travel in the SAME deterministic
    * Knuth-hash permutation as the chop layout, grouped into bounded
    * SEGMENTS of `segmentDocs` consecutive pieces; packing runs
    * next-fit within each segment (windows never cross segments — the
    * bounded waste this costs at segment tails is the price of a
    * partitioning-independent, engine-reproducible layout; size
    * segments so segmentDocs·avgDocTokens ≫ windowSize and the tail
    * waste amortizes to noise).
    *
    * Scale shape: the [[graft.operators.WindowOps.globalCumSum]]
    * two-pass rank, one segment-keyed shuffle whose rows are
    * segment-sized (≤ segmentDocs structs of four scalars — NO token
    * data rides the segment row), the O(segment) native
    * [[graft.functions.TextHashExprs.packNextFit]] recurrence per
    * segment (a placement depends on the running fill — exactly what a
    * prefix sum cannot express), and a second tiny cumsum over
    * per-segment window counts for DENSE global window ids. Content
    * assembly joins back to the corpus by id downstream — the one
    * corpus-sized exchange, same as the chop layout's window shuffle.
    *
    * Output: one row per piece — `window_id` (global, dense), `__mid__`
    * (the doc key cast long), `__piece__`, `__plen__`, `__off__` (token
    * offset inside the window), `tok_from`/`tok_to` (doc-local token
    * sub-range [from, to) of this piece). Zero-token docs vanish (the
    * [[assembleWindows]] convention). Keys must be numeric and distinct
    * mod 2^31 (the shuffleIndex contract). */
  def packedPieceMembers(docs: DataFrame, idCol: String, tokenCol: String,
                         windowSize: Long, seed: Long = 0L,
                         segmentDocs: Int = 512,
                         groupCols: Seq[String] = Nil): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    require(segmentDocs > 0, s"segmentDocs must be positive, got $segmentDocs")
    val kt = docs.schema(idCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packedPieceMembers: key column '$idCol' must be numeric (got " +
        s"${kt.simpleString}); factorize or hash string keys first")
    val gc = groupCols.map(col)
    val pieces = docs.filter(col(tokenCol) > 0)
      .select(gc ++ Seq(col(idCol).cast("long").as("__mid__"),
        col(tokenCol).cast("long").as("__n__"),
        graft.QHelp.keyHash31(
          pmod(col(idCol), lit(2147483648L)) + lit(seed % 2147483648L))
          .as("__sh__")): _*)
      .withColumn("__piece__", explode(sequence(lit(0L),
        graft.QHelp.floorDiv(col("__n__") - 1, windowSize))))
      .withColumn("__plen__",
        least(lit(windowSize), col("__n__") - col("__piece__") * windowSize))
      // single-column total order == (hash, piece) lexicographic: hash
      // < 2^32 and piece < 2^31, so hash·2^31 + piece < 2^63 — exact
      // in a long, and the Knuth hash is injective on ids mod 2^31
      // (odd multiplier mod 2^32), so the order is collision-free
      .withColumn("__ord__",
        col("__sh__") * lit(2147483648L) + col("__piece__"))
      .withColumn("__one__", lit(1L))
    val ranked = graft.operators.WindowOps
      // hashed form (r16): __ord__ = sh·2^31 + piece with sh uniform in
      // [0, 2^32), so the key space is uniform in [0, 2^63)
      .globalCumSumHashed(pieces, "__ord__", "__one__", "__rank__",
        Long.MaxValue, groupCols)
      .withColumn("__seg__",
        graft.QHelp.floorDiv(col("__rank__") - 1, segmentDocs.toLong))
      .withColumn("__spos__",
        pmod(col("__rank__") - 1, lit(segmentDocs.toLong)))
    val segRows = ranked.groupBy(gc :+ col("__seg__"): _*)
      // __segord__ = the segment's smallest piece order key: segments
      // are rank-contiguous, so min(__ord__) is strictly increasing in
      // __seg__ within a group — ordering by it IS ordering by __seg__
      // — and it inherits __ord__'s hash-uniformity over [0, 2^63), so
      // the window-id cumsum below can take the HASHED (deterministic
      // equal-width bucket) form. r17 optimization: the sampled
      // repartitionByRange form evaluated this aggregate's whole child
      // (first cumsum + collect_list + packNextFit) once more for its
      // boundary-sampling pass before the real pass ran it again.
      // Result order and values are bit-identical (same total order,
      // same prefix sums).
      .agg(min(col("__ord__")).as("__segord__"),
        array_sort(collect_list(struct(col("__spos__"), col("__mid__"),
          col("__piece__"), col("__plen__")))).as("__items__"))
      .withColumn("__packed__", graft.functions.TextHashExprs.packNextFit(
        transform(col("__items__"), it => it.getField("__plen__")),
        windowSize))
      .withColumn("__nwins__",
        element_at(col("__packed__"), -1).getField("win").cast("long") + 1L)
    graft.operators.WindowOps
      .globalCumSumHashed(segRows, "__segord__", "__nwins__", "__wcum__",
        Long.MaxValue, groupCols)
      .withColumn("__woff__", col("__wcum__") - col("__nwins__"))
      .select(gc ++ Seq(col("__woff__"), explode(zip_with(col("__items__"),
        col("__packed__"), (it, pk) => struct(
          it.getField("__mid__").as("__mid__"),
          it.getField("__piece__").as("__piece__"),
          it.getField("__plen__").as("__plen__"),
          pk.getField("win").cast("long").as("__win__"),
          pk.getField("off").as("__off__")))).as("__m__")): _*)
      .select(gc ++ Seq(
        (col("__woff__") + col("__m__.__win__")).as("window_id"),
        col("__m__.__mid__").as("__mid__"),
        col("__m__.__piece__").as("__piece__"),
        col("__m__.__plen__").as("__plen__"),
        col("__m__.__off__").as("__off__"),
        (col("__m__.__piece__") * windowSize).as("tok_from"),
        (col("__m__.__piece__") * windowSize + col("__m__.__plen__"))
          .as("tok_to")): _*)
  }

  /** Materialize PACKED training windows over whitespace tokens — the
    * doc-aware counterpart of [[assembleWindows]]: same deterministic
    * permutation, but a document ≤ windowSize tokens lands WHOLE in
    * exactly one window (no mid-document chops feeding truncated
    * contexts to the trainer); only oversized docs split, into
    * windowSize-sized pieces. Windows carry up to `windowSize` tokens
    * (underfull windows are the packing waste — callers pad at load
    * time or train with variable lengths; the id-space form
    * [[graft.llm.Bpe.assembleWindowsIdsPacked]] pads natively).
    * Conservation holds exactly: Σ n_tokens == Σ per-doc token counts.
    *
    * Scale shape: [[packedPieceMembers]] (two tiny cumsums + one
    * segment shuffle of scalar structs) plus ONE corpus-sized join back
    * to the token arrays by id and ONE shuffle keyed on window_id —
    * the same corpus exchange count as [[assembleWindows]]. */
  def assembleWindowsPacked(docs: DataFrame, idCol: String,
                            textCol: String, windowSize: Long,
                            seed: Long = 0L, segmentDocs: Int = 512,
                            withDocSpans: Boolean = false): DataFrame = {
    val toks = split(col(textCol), " ")
    val withN = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks__"),
        size(toks).cast("long").as("__n__"))
    val members = packedPieceMembers(
      withN.select(col(idCol), col("__n__")), idCol, "__n__",
      windowSize, seed, segmentDocs)
    val joined = members.join(
      withN.select(col(idCol).cast("long").as("__mid__"), col("__toks__")),
      Seq("__mid__"))
      .select(col("window_id"), col("__off__"), col("__mid__"),
        col("__plen__"),
        slice(col("__toks__"), (col("tok_from") + 1).cast("int"),
          col("__plen__").cast("int")).as("__slice__"))
    val sorted = array_sort(collect_list(struct(col("__off__"),
      col("__slice__"), col("__mid__"), col("__plen__"))))
    val aggs = Seq(
      array_join(flatten(transform(sorted, s => s.getField("__slice__"))),
        " ").as("window_text"),
      sum(col("__plen__")).as("n_tokens")) ++
      (if (withDocSpans) Seq(
        transform(sorted, s => struct(
          s.getField("__mid__").as("id"),
          s.getField("__off__").as("pos"),
          s.getField("__plen__").as("len"))).as("doc_spans"))
       else Nil)
    joined.groupBy("window_id").agg(aggs.head, aggs.tail: _*)
  }

  /** PII redaction: emails, IPv4 addresses, then phone-like digit runs
    * are replaced with typed placeholder tokens — in that order, so an
    * address's digits can't be re-matched as a phone number. Pure
    * `regexp_replace` chains: codegen'd, blockwise, fuses into the scan.
    * Patterns stay within the RE2-compatible subset of Java regex
    * (character classes, bounded repeats, ASCII `\b`) so the DuckDB
    * oracle applies the byte-identical expressions (verified both
    * engines produce identical output on email/phone/IP/no-PII rows). */
  def redactPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]")
    regexp_replace(ip, "\\+?\\d[\\d \\-()]{7,}\\d", "[PHONE]")
  }

  /** One-pass quality frame: every token- AND char-class-derived stat
    * comes from the single native TokenStats pass (bit-identical to the
    * declarative forms above — asserted in WindowLlmSpec). The
    * declarative regexp_replace char-class forms each allocated a
    * rewritten copy of the document per class (4 extra string passes per
    * row); only the md5 canonicalization still runs a regex. */
  def qualityFrame(docs: DataFrame, idCol: String, textCol: String,
                   stopwords: Seq[String]): DataFrame = {
    val t = col(textCol)
    docs
      .withColumn("__ts__",
        graft.functions.TextHashExprs.tokenStats(t, stopwords))
      .select(col(idCol),
        col("__ts__.n_tokens").as("n_tokens"),
        (ceil(col("__ts__.n_alpha").cast("double") / 4.0).cast("long")
          + col("__ts__.n_digit") + col("__ts__.n_symbol")).as("n_tokens_bpe"),
        col("__ts__.n_chars").as("n_chars"),
        (col("__ts__.sum_token_len").cast("double") / col("__ts__.n_tokens"))
          .as("avg_token_len"),
        (col("__ts__.n_distinct").cast("double") / col("__ts__.n_tokens"))
          .as("type_token_ratio"),
        when(col("__ts__.n_chars") === 0, lit(null)).otherwise(
          col("__ts__.n_punct").cast("double") / col("__ts__.n_chars"))
          .as("punct_ratio"),
        (col("__ts__.n_stopwords").cast("double") / col("__ts__.n_tokens"))
          .as("stopword_ratio"),
        col("__ts__.fingerprint").as("fingerprint"),
        md5(regexp_replace(lower(trim(t)), "\\s+", " ")).as("content_md5"))
  }

  /** DATASET CARD — the one-pass corpus summary a curation run
    * publishes next to its landing (the "datasheet" numbers): doc /
    * token / char masses, mean doc length, the rule-gate pass rates
    * ([[qualityKeep]] trio and the published [[gopherKeep]] set) and
    * the email-PII incidence — globally AND per section (one row per
    * value of each `groupCols` column: language, source, …).
    *
    * ONE aggregation pass: per-row indicator columns fuse into the
    * scan, and the global + per-section rows come out of a single
    * GROUPING SETS aggregate — adding a section adds a grouping set,
    * never a job. Rates are exact-count divisions evaluated once as
    * doubles (oracle hash-checks them); a section value of NULL prints
    * as '<null>'; NULL-text docs count in n_docs but in no rate
    * denominator. */
  def datasetCard(docs: DataFrame, textCol: String,
                  groupCols: Seq[String],
                  minStopHits: Long = 2L): DataFrame = {
    require(groupCols.nonEmpty, "datasetCard needs at least one section " +
      "column (language, source, …) — for a global-only card pass a " +
      "constant column")
    val t = col(textCol)
    val nn = when(t.isNotNull, 1L).otherwise(0L)
    val base = docs
      .withColumn("__tok__",
        when(t.isNotNull, size(split(t, " ")).cast("long")).otherwise(0L))
      .withColumn("__ch__",
        when(t.isNotNull, length(t).cast("long")).otherwise(0L))
      .withColumn("__nn__", nn)
      .withColumn("__q__",
        when(t.isNotNull && qualityKeep(t), 1L).otherwise(0L))
      .withColumn("__g__",
        when(t.isNotNull && gopherKeep(t, minStopHits = minStopHits), 1L)
          .otherwise(0L))
      .withColumn("__pii__",
        when(t.isNotNull &&
          t.rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), 1L)
          .otherwise(0L))
    val sets = Seq(Seq.empty[Column]) ++ groupCols.map(c => Seq(col(c)))
    // grouping() resolves only INSIDE the aggregate, so section/key
    // are aggregate output expressions, not a downstream projection
    val section = groupCols.foldLeft(lit("corpus")) { (acc, c) =>
      when(grouping(col(c)) === 0, lit(c)).otherwise(acc) }
    val key = groupCols.foldLeft(lit("_all_")) { (acc, c) =>
      when(grouping(col(c)) === 0,
        coalesce(col(c).cast("string"), lit("<null>"))).otherwise(acc) }
    val grouped = base.groupingSets(sets, groupCols.map(col): _*)
      .agg(section.as("section"), key.as("key"),
        count(lit(1)).as("n_docs"),
        sum(col("__tok__")).as("n_tokens"),
        sum(col("__ch__")).as("n_chars"),
        sum(col("__nn__")).as("__snn__"),
        sum(col("__q__")).as("__sq__"),
        sum(col("__g__")).as("__sg__"),
        sum(col("__pii__")).as("__spii__"))
    def rate(c: String) = when(col("__snn__") === 0L, lit(null))
      .otherwise(col(c).cast("double") / col("__snn__"))
    grouped.select(col("section"), col("key"),
      col("n_docs"), col("n_tokens"), col("n_chars"),
      rate("n_tokens").as("mean_doc_tokens"),
      rate("__sq__").as("quality_keep_rate"),
      rate("__sg__").as("gopher_keep_rate"),
      rate("__spii__").as("pii_email_rate"))
  }

  /** Corpus DRIFT report between two corpus versions — the monitoring
    * pass a daily-ingested corpus runs before promoting a new snapshot:
    * per group (source/domain) and per text statistic, the old and new
    * means and their delta, so a crawl whose token-length or stopword
    * distribution shifted shows up as numbers instead of being
    * discovered post-training. Metrics ride the same native
    * [[graft.functions.TextHashExprs.tokenStats]] pass as
    * [[qualityFrame]]: doc count plus mean tokens / chars / stopwords /
    * distinct tokens per doc.
    *
    * Scale shape: ONE blockwise stats pass + map-side-combined
    * aggregation per side (group-cardinality-sized results), a
    * full-outer join of the two tiny aggregates (appearing and
    * disappearing domains survive with NULL means on their absent
    * side), and a `stack` unpivot — no data-sized shuffle beyond the
    * two group-by exchanges. Means are computed as exact integer sums
    * divided as doubles — deterministic across engines while sums stay
    * below 2^53 (beyond that they are still correct to double
    * precision). */
  def driftReport(oldDocs: DataFrame, newDocs: DataFrame,
                  textCol: String, groupCol: String,
                  stopwords: Seq[String]): DataFrame = {
    def side(d: DataFrame, tag: String): DataFrame =
      d.withColumn("__ts__",
          graft.functions.TextHashExprs.tokenStats(col(textCol), stopwords))
        .groupBy(col(groupCol).as("__grp__"))
        .agg(count(lit(1)).as(s"${tag}_n"),
          sum(col("__ts__.n_tokens").cast("long")).as(s"${tag}_tokens"),
          sum(col("__ts__.n_chars").cast("long")).as(s"${tag}_chars"),
          sum(col("__ts__.n_stopwords").cast("long")).as(s"${tag}_stop"),
          sum(col("__ts__.n_distinct").cast("long")).as(s"${tag}_distinct"))
    val j = side(oldDocs, "old")
      .join(side(newDocs, "new"), Seq("__grp__"), "full_outer")
    val stacked = j.select(col("__grp__"), col("old_n"), col("new_n"),
      expr("""stack(4,
        'tokens',   old_tokens,   new_tokens,
        'chars',    old_chars,    new_chars,
        'stopwords', old_stop,    new_stop,
        'distinct', old_distinct, new_distinct) AS (metric, old_sum, new_sum)"""))
    stacked.select(
        col("__grp__").as(groupCol), col("metric"),
        col("old_n"), col("new_n"),
        (col("old_sum").cast("double") / col("old_n").cast("double"))
          .as("old_mean"),
        (col("new_sum").cast("double") / col("new_n").cast("double"))
          .as("new_mean"))
      .withColumn("delta", col("new_mean") - col("old_mean"))
  }
}
