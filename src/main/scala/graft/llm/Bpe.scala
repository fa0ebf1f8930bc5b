package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{BpeEncode, TextHashExprs}

/** Byte-pair-encoding TOKENIZER TRAINING over a Spark corpus, plus the
  * distributed encode — the step a pretraining pipeline runs between
  * "clean corpus" and "token budget accounting" when the whitespace /
  * regex token counts ([[TextStats]]) are not the unit the model will
  * actually train on.
  *
  * Scale posture (the standard one — Sennrich et al. 2016; the same
  * split every production subword trainer uses): the CORPUS-sized pass
  * is one distributed word-count shuffle with map-side combine; the
  * merge loop then runs on the word-TYPE frequency table, which Zipf
  * keeps orders of magnitude smaller than the corpus (bounded here by
  * `maxTypes` with a loud refusal — the qCap discipline — because the
  * loop is driver-side BY DESIGN: 10^5-10^6 types fit one machine even
  * when the corpus is 100 TB, and a per-merge Spark job ×32k merges
  * would be strictly worse). Encode is fully distributed: the learned
  * merge table (numMerges-bounded) rides into a native expression
  * ([[graft.functions.BpeEncode]]) that fuses into the scan.
  *
  * Determinism contract (the oracle surface): pair occurrences are
  * counted over ALL adjacent symbol pairs (overlaps included); the
  * chosen merge maximizes count with ties broken by CODE-POINT order of
  * (left, right) — the binary collation both Spark and DuckDB sort
  * strings by; merge application is greedy left-to-right. Every step is
  * exact string/integer arithmetic, so DuckDB replays whole training
  * iterations (q_bpe_train unrolls them as CTEs) and the encode
  * (q_bpe_tokens) bit-for-bit.
  */
object Bpe {

  /** The GPT-2-shaped pre-tokenizer pattern, restricted to the
    * RE2-compatible subset (no lookahead — both engines must extract
    * identically): letter runs, digit runs and punctuation runs, each
    * optionally carrying ONE leading space INTO the token (the
    * defining GPT-2 feature: ' world' and 'world' are different
    * tokens, so detokenization is concatenation). Whitespace beyond
    * one space per token is dropped — the same information loss as
    * whitespace splitting. */
  val Gpt2WordPattern: String =
    " ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"

  /** Word stream of a text column: whitespace split (the default), or
    * regex pre-tokenization via `wordPattern` (ordered matches —
    * Spark regexp_extract_all and DuckDB regexp_extract_all agree on
    * the RE2-compatible subset). */
  private[llm] def wordsOf(textCol: String,
                           wordPattern: Option[String]): org.apache.spark.sql.Column =
    wordsOfCol(col(textCol), wordPattern)

  /** [[wordsOf]] over an arbitrary text COLUMN (a nested struct field,
    * a computed expression) — the conversation assembler's form.
    * Normalization happens UPSTREAM ([[Normalize.frame]] / the serve's
    * prepText) — one normalization point, applied exactly once. */
  private[llm] def wordsOfCol(text: org.apache.spark.sql.Column,
                              wordPattern: Option[String]): org.apache.spark.sql.Column =
    wordPattern match {
      case None => split(text, " ", -1)
      case Some(p) => regexp_extract_all(text, lit(p), lit(0))
    }

  /** Distributed word-type counts: one explode + one map-side-combined
    * aggregation — the only corpus-sized pass in training. Empty
    * tokens from repeated separators drop (they carry no symbols). */
  def wordCounts(corpus: DataFrame, textCol: String,
                 wordPattern: Option[String] = None): DataFrame =
    corpus.select(explode(wordsOf(textCol, wordPattern)).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Distributed adjacent-pair counts over the CURRENT symbolization
    * (iteration 0: code points) — the statistic each training iteration
    * maximizes, exposed as its own operator so the driver gate can
    * value-check it and so callers can inspect merge candidates without
    * training. Weighted by word frequency; every adjacent occurrence
    * counts (overlaps included). Built from `substring`/`length`, which
    * count CODE POINTS on both engines. */
  def pairCounts(corpus: DataFrame, textCol: String): DataFrame = {
    val wc = wordCounts(corpus, textCol).filter(length(col("word")) >= 2)
    wc.select(col("cnt"),
        explode(transform(sequence(lit(1), length(col("word")) - 1), i =>
          struct(substring(col("word"), i, lit(1)).as("left"),
            substring(col("word"), i + 1, lit(1)).as("right")))).as("pr"))
      .groupBy(col("pr.left").as("left"), col("pr.right").as("right"))
      .agg(sum(col("cnt")).as("pair_count"))
  }

  /** Code-point-order string comparison (= the binary UTF-8 collation
    * Spark and DuckDB sort by; Java's compareTo is UTF-16 order, which
    * disagrees above U+FFFF). */
  private[llm] def cpLess(a: String, b: String): Boolean = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return ca < cb
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    a.length - i < b.length - j
  }

  val mergesSchema: StructType = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  /** The shared trainer front door: distributed word counts, the
    * `minWordCount` frequency cutoff, the O(maxTypes) bounded probe
    * with the loud refusal naming both knobs, then ONE driver collect
    * of the type table — [[train]] and [[WordPiece.train]] both start
    * here so the crawl-scale posture cannot drift between families. */
  private[llm] def collectTypeTable(corpus: DataFrame, textCol: String,
                                    wordPattern: Option[String],
                                    minWordCount: Long, maxTypes: Int,
                                    who: String): Array[(String, Long)] = {
    val wc0 = wordCounts(corpus, textCol, wordPattern)
    val wc =
      if (minWordCount <= 1L) wc0
      else wc0.filter(col("cnt") >= minWordCount)
    // bounded probe, not a full count: the refusal must cost O(maxTypes)
    val probe = wc.limit(maxTypes + 1).count()
    require(probe <= maxTypes,
      s"$who: corpus has more than $maxTypes distinct word types " +
        s"at minWordCount=$minWordCount; raise maxTypes (the merge loop " +
        "is driver-side over the TYPE table — size the bound to driver " +
        "memory, ~100 bytes/type) or raise minWordCount (drop rare " +
        "types before the bound — the standard frequency-cutoff " +
        "approximation; Zipf's tail carries ~no pair mass)")
    wc.collect().map(r => (r.getString(0), r.getLong(1)))
  }

  /** Train a BPE merge table: distributed word counts, then `numMerges`
    * iterations over the type table — each picks the most frequent
    * adjacent symbol pair (ties: code-point order) and merges it
    * greedily left-to-right in every type. Stops early when the best
    * pair's count falls below `minPairCount` (merging noise memorizes
    * the corpus, it doesn't compress it). Refuses loudly when the type
    * table exceeds `maxTypes` — the driver-side loop is the designed
    * posture (see the object scaladoc), and the refusal names the knobs
    * instead of silently OOMing.
    *
    * `minWordCount` is the crawl-scale relief valve: word types seen
    * fewer than this many times drop from the TYPE table before the
    * bound probe — a 100 TB multilingual crawl's distinct types blow
    * past any driver-sized bound, and Zipf's tail (hapax junk, random
    * ids, binary spill) contributes ~nothing to pair counts above
    * minPairCount. This is the STANDARD approximation every production
    * subword trainer offers, and it IS approximate: pair counts
    * aggregate across types, so mass from dropped rare types no longer
    * reaches pairs that frequent types also contain — a pair near a
    * count tie can flip. cutoff = 1 keeps every type (bit-identical to
    * the unfiltered train; spec-pinned). Returns (rank, left, right,
    * merged, pair_count) with rank 0 applied first. */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L,
            maxTypes: Int = 2000000,
            byteLevel: Boolean = false,
            wordPattern: Option[String] = None,
            minWordCount: Long = 1L): DataFrame = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(minPairCount >= 1, "minPairCount must be >= 1")
    require(minWordCount >= 1, "minWordCount must be >= 1")
    val spark = corpus.sparkSession
    var types: Array[(Array[String], Long)] =
      collectTypeTable(corpus, textCol, wordPattern, minWordCount,
        maxTypes, "Bpe.train")
        .map { case (w, c) => (BpeEncode.symbols(w, byteLevel), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val counts = new java.util.HashMap[(String, String), Long]()
      types.foreach { case (syms, cnt) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.merge(k, cnt, (x, y) => x + y)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestCnt = 0L
      counts.forEach { (k, v) =>
        if (v > bestCnt || (v == bestCnt && best != null &&
            (cpLess(k._1, best._1) ||
              (k._1 == best._1 && cpLess(k._2, best._2))))) {
          best = k; bestCnt = v
        }
      }
      if (best == null || bestCnt < minPairCount) continue = false
      else {
        merges += Row(rank, best._1, best._2, best._1 + best._2, bestCnt)
        types = types.map { case (syms, cnt) =>
          (if (syms.length >= 2) BpeEncode.mergePair(syms, best._1, best._2)
           else syms, cnt)
        }
        rank += 1
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(merges.toSeq).asJava),
      mergesSchema)
  }

  /** Collect a merges frame (numMerges-bounded by construction) into
    * the rank-ordered pair list the encode expression embeds. */
  def mergeList(merges: DataFrame): Seq[(String, String)] =
    merges.select("rank", "left", "right").collect()
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Distributed encode: whitespace words → BPE tokens under the
    * learned merges, exploded as (id, word_pos, tok_pos, token) — the
    * layout downstream consumers want (token counting, vocab joins,
    * window assembly), with no array columns to reassemble. One fused
    * scan: split + two Generate nodes + the native per-word expression
    * (memoized — Zipf makes the cache hit rate the common case). */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(String, String)],
                   byteLevel: Boolean = false,
                   wordPattern: Option[String] = None): DataFrame =
    docs.select(col(idCol),
        posexplode(wordsOf(textCol, wordPattern)).as(Seq("word_pos", "__w__")))
      .filter(length(col("__w__")) >= 1)
      .select(col(idCol), col("word_pos"),
        posexplode(TextHashExprs.bpeEncode(col("__w__"), merges, byteLevel))
          .as(Seq("tok_pos", "token")))

  /** Per-doc BPE token counts — the token-budget unit for the mixing /
    * window families once a real subword vocab exists (whitespace
    * counts over-weight long words, under-weight morphology). */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)],
                  byteLevel: Boolean = false,
                  wordPattern: Option[String] = None): DataFrame =
    docs.select(col(idCol),
        explode(wordsOf(textCol, wordPattern)).as("__w__"))
      .filter(length(col("__w__")) >= 1)
      .select(col(idCol),
        size(TextHashExprs.bpeEncode(col("__w__"), merges, byteLevel))
          .as("__n__"))
      .groupBy(col(idCol)).agg(sum(col("__n__")).as("n_tokens"))

  /** Deterministic vocabulary with stable ids: base symbols (the
    * corpus's distinct code points, encoded with ZERO merges) get ids
    * 0..B-1 in code-point order, merged symbols get B + rank — the
    * standard id assignment, and SQL-recomputable given the merges.
    * The ordering window runs over the VOCAB-sized distinct set, not
    * the corpus (the no-global-window discipline holds: the input to
    * row_number is an aggregate output, bounded by |alphabet|). */
  def vocabFrame(corpus: DataFrame, textCol: String,
                 merges: DataFrame,
                 byteLevel: Boolean = false,
                 wordPattern: Option[String] = None): DataFrame = {
    // byte level: the base alphabet is ALL 256 bytes (ids 0..255 in
    // byte order — the GPT-2 construction), NOT the corpus-seen set:
    // any future text's bytes are in-vocab by construction, so a
    // byte-level model never emits -1 and bpeOovRate is structurally 0
    val base =
      if (byteLevel)
        corpus.sparkSession.range(256)
          .select(format_string("%02X", col("id")).as("token"),
            col("id").as("token_id"))
      else corpus
        .select(explode(wordsOf(textCol, wordPattern)).as("__w__"))
        .filter(length(col("__w__")) >= 1)
        .select(explode(
            TextHashExprs.bpeEncode(col("__w__"), Seq.empty, byteLevel))
          .as("token"))
        .distinct()
        .withColumn("token_id",
          row_number().over(org.apache.spark.sql.expressions.Window
            .orderBy(col("token"))).cast("long") - 1)
    val nBase = base.select(count(lit(1)).as("__b__"))
    val mergedIds = merges.crossJoin(broadcast(nBase))
      .select(col("merged").as("token"),
        (col("rank").cast("long") + col("__b__")).as("token_id"))
    // two distinct merge ranks CAN concatenate to the same surface
    // ((a,bc) and (ab,c) both yield 'abc'); keep the min id per token
    // so encodeIds' vocab join can never fan out rows. Base tokens are
    // single code points and merged tokens ≥ 2, so the dedup can only
    // collapse merged-merged collisions — base ids are untouched.
    base.unionByName(mergedIds)
      .groupBy("token").agg(min(col("token_id")).as("token_id"))
  }

  /** Encode + vocab join: (id, word_pos, tok_pos, token_id) — the
    * integer token stream. Tokens outside the vocab (new text whose
    * characters the training corpus never saw) carry id -1 so the
    * caller can count OOV mass instead of losing rows. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)],
                vocab: DataFrame,
                byteLevel: Boolean = false,
                wordPattern: Option[String] = None): DataFrame =
    encodeTokens(docs, idCol, textCol, merges, byteLevel, wordPattern)
      .join(broadcast(vocab), Seq("token"), "left")
      .select(col(idCol), col("word_pos"), col("tok_pos"),
        coalesce(col("token_id"), lit(-1L)).as("token_id"))

  // ------------------------------------------------------------------
  // Persisted BPE model — the TENTH maintained family: two bucketed
  // tables, `<name>_bpe` (the merge table) and `<name>_bpe_vocab` (the
  // id assignment), one stamp landing LAST (a crashed build refuses to
  // serve). Lifecycle posture = the LM/classifier one: the model is an
  // AGGREGATE over the training corpus — per-doc retraction is
  // structurally absent, and the one corrective action is a wholesale
  // retrain ([[writeBpeModel]] IS it). Drift observable: the OOV rate
  // of the population being ENCODED — a vocabulary the corpus outgrew
  // degrades ever more tokens to -1 singletons.

  private def bpeMetaFile(path: String) = s"$path/_graft_bpe_meta.json"

  /** The shared stamp-string escaper: backslash and quote escape; a
    * control character (newline, tab, …) REFUSES — the regex-based
    * stamp readers do not un-escape \n-style sequences, so escaping
    * one would silently break the round trip, and a control char in
    * a contPrefix/unkPiece/wordPattern is pathological anyway (a
    * regex wanting a newline writes the two-char `\n` sequence). */
  private[llm] def jsonEscStamp(s: String, what: String): String = {
    require(!s.exists(_.isControl),
      s"$what contains a control character — stamps are single-line " +
        "JSON and the readers do not un-escape control sequences; use " +
        "a two-char regex escape (\\n) or drop the character")
    s.replace("\\", "\\\\").replace("\"", "\\\"")
  }

  /** The persisted model's stamp, as a typed record: training geometry
    * (replayed verbatim by a drift-fired retrain), symbolization level
    * and pre-tokenizer (they decide the encode/detokenize contract),
    * the frequency cutoff, and whether the model was IMPORTED from a
    * published merges/vocab pair ([[importBpeModel]]) — imported models
    * have no training corpus to replay, so maintenance can indicate
    * drift but never fire a retrain. */
  final case class BpeMeta(numMerges: Int, minPairCount: Long,
                           maxTypes: Int, byteLevel: Boolean,
                           wordPattern: Option[String],
                           minWordCount: Long = 1L,
                           imported: Boolean = false,
                           specialIds: Seq[Long] = Nil,
                           normalize: String = "none")

  private def stampBpeMeta(spark: SparkSession, path: String,
                           meta: BpeMeta): Unit = {
    val p = new org.apache.hadoop.fs.Path(bpeMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    // the pattern carries regex backslashes — JSON-escape them
    val wp = meta.wordPattern.fold("")(pat =>
      s""","word_pattern":"${jsonEscStamp(pat, "stampBpeMeta: wordPattern")}\"""")
    val sp =
      if (meta.specialIds.isEmpty) ""
      else s""","special_ids":[${meta.specialIds.mkString(",")}]"""
    try os.write(
      s"""{"num_merges":${meta.numMerges},"min_pair_count":${meta.minPairCount},"max_types":${meta.maxTypes},"byte_level":${meta.byteLevel},"min_word_count":${meta.minWordCount},"imported":${meta.imported},"normalize":"${meta.normalize}"$sp$wp}\n"""
        .getBytes("UTF-8"))
    finally os.close()
  }

  /** The stamp, read back — a stampless directory is a crashed or
    * foreign build and refuses loudly. The full training geometry
    * rides in the stamp so a drift-fired retrain
    * ([[graft.llm.Maintain.maintainBpe]]) replays the bounds the model
    * was originally built under — a model built with a raised bound
    * over a large type space must not refuse at the default on
    * retrain. Stamps from builds predating a field read back its
    * default (maxTypes 2000000, minWordCount 1, imported false). */
  private[llm] def readBpeMeta(spark: SparkSession,
                               path: String): BpeMeta = {
    val p = new org.apache.hadoop.fs.Path(bpeMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no BPE stamp at ${bpeMetaFile(path)} — build with writeBpeModel " +
        "(train) or importBpeModel (published pair) first")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val m = """"num_merges"\s*:\s*(\d+).*"min_pair_count"\s*:\s*(\d+)""".r
      .findFirstMatchIn(txt)
    val mt = """"max_types"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toInt).getOrElse(2000000)
    val bl = """"byte_level"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
      .exists(_.group(1) == "true") // pre-r14 stamps: code-point level
    val mwc = """"min_word_count"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
      .map(_.group(1).toLong).getOrElse(1L)
    val imp = """"imported"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
      .exists(_.group(1) == "true")
    val sp = """"special_ids"\s*:\s*\[([0-9,\s-]*)\]""".r
      .findFirstMatchIn(txt)
      .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSeq)
      .getOrElse(Nil)
    val wp = """"word_pattern"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(txt)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    val nz = """"normalize"\s*:\s*"([a-z_]+)"""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("none") // pre-r16 stamps: unnormalized
    m match {
      case Some(g) => BpeMeta(g.group(1).toInt, g.group(2).toLong, mt, bl,
        wp, mwc, imp, sp, nz)
      case None => throw new IllegalStateException(
        s"malformed BPE stamp at ${bpeMetaFile(path)}: $txt")
    }
  }

  /** Build (or wholesale RETRAIN — the family's one maintenance
    * action) the persisted model: train, land merges + vocab, stamp
    * last. The training geometry rides in the stamp so a drift-fired
    * retrain reproduces it without the caller re-specifying. */
  def writeBpeModel(corpus: DataFrame, textCol: String, name: String,
                    path: String, numMerges: Int,
                    minPairCount: Long = 2L,
                    maxTypes: Int = 2000000,
                    byteLevel: Boolean = false,
                    wordPattern: Option[String] = None,
                    minWordCount: Long = 1L,
                    normalize: String = "none"): Unit = {
    Normalize.validate(normalize, "writeBpeModel")
    val spark = corpus.sparkSession
    val nc = Normalize.frame(corpus, textCol, normalize)
    val merges = train(nc, textCol, numMerges, minPairCount,
      maxTypes, byteLevel, wordPattern, minWordCount)
    graft.api.GraftFrame(merges)
      .toBucketedTable(s"${name}_bpe", s"$path/bpe", 1, Seq("merged"))
    graft.api.GraftFrame(
        vocabFrame(nc, textCol, merges, byteLevel, wordPattern))
      .toBucketedTable(s"${name}_bpe_vocab", s"$path/vocab", 1,
        Seq("token"))
    stampBpeMeta(spark, path, BpeMeta(numMerges, minPairCount, maxTypes,
      byteLevel, wordPattern, minWordCount, normalize = normalize))
  }

  /** The published GPT-2 byte↔printable alias table (the
    * `bytes_to_unicode` construction from the public GPT-2 release,
    * Radford et al. 2019): bytes that are "printable" (0x21-0x7E,
    * 0xA1-0xAC, 0xAE-0xFF) alias to their own code point; the rest
    * alias to 256+n in ascending byte order — so every byte has a
    * visible one-char stand-in and the published merges.txt/vocab.json
    * are plain text (e.g. space → U+0120 'Ġ', newline → U+010A 'Ċ').
    * This is the map [[importBpeModel]] inverts to read a published
    * pair back into this engine's hex-pair byte symbolization. */
  private lazy val gpt2ByteForAlias: Map[Char, Int] = {
    val printable = ((0x21 to 0x7E) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF))
    val direct = printable.map(b => b.toChar -> b)
    val printSet = printable.toSet
    val rest = (0 until 256).filterNot(printSet).zipWithIndex
      .map { case (b, n) => (256 + n).toChar -> b }
    (direct ++ rest).toMap
  }

  /** The forward direction of the same table (byte → its one-char
    * printable alias) — exposed so callers can synthesize
    * published-style surface forms (fixtures, round-trip checks)
    * without re-deriving the construction. */
  lazy val gpt2AliasForByte: IndexedSeq[String] = {
    val inv = gpt2ByteForAlias.map { case (c, b) => b -> c.toString }
    (0 until 256).map(inv)
  }

  /** A published GPT-2-alias token surface → this engine's hex-pair
    * byte symbols ("Ġab" → "20" "61" "62" → "206162"). Refuses on a
    * char outside the 256-entry alias alphabet — such a token cannot
    * come from a real GPT-2-format file. */
  def gpt2AliasToHex(token: String): String = {
    val sb = new java.lang.StringBuilder(token.length * 2)
    var i = 0
    while (i < token.length) {
      val c = token.charAt(i)
      gpt2ByteForAlias.get(c) match {
        case Some(b) => sb.append(f"$b%02X")
        case None => throw new IllegalArgumentException(
          f"gpt2AliasToHex: char U+${c.toInt}%04X in token '$token' " +
            "is not in the GPT-2 byte-alias alphabet — not a " +
            "GPT-2-format surface form")
      }
      i += 1
    }
    sb.toString
  }

  private[llm] def readSmallTextFile(spark: SparkSession, path: String,
                                     maxBytes: Long): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"no file at $path")
    val len = fs.getFileStatus(p).getLen
    require(len <= maxBytes,
      s"$path is $len bytes — a published tokenizer file is model-sized " +
        s"(<= $maxBytes); this is probably not one")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  /** Read a published `merges.txt` into the (rank, left, right) frame
    * [[importBpeModel]] takes: each non-comment line is "left right"
    * with rank = line order (`#`-prefixed header lines and blank lines
    * skip, the published-file convention). Driver-side through the
    * session's Hadoop FS — the file is model-sized by contract
    * (size-guarded). Surfaces stay in the published alias form; pass
    * the frame to importBpeModel with `gpt2Alias = true`. */
  def readGpt2Merges(spark: SparkSession, path: String,
                     maxBytes: Long = 64L << 20): DataFrame = {
    val lines = readSmallTextFile(spark, path, maxBytes)
      .split("\n", -1).iterator
      .map(_.stripSuffix("\r"))
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toIndexedSeq
    val rows = lines.zipWithIndex.map { case (l, i) =>
      val sp = l.split(" ", -1)
      require(sp.length == 2,
        s"readGpt2Merges: line ${i + 1} ('$l') is not 'left right'")
      Row(i, sp(0), sp(1))
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(StructField("rank", IntegerType, nullable = false),
        StructField("left", StringType, nullable = false),
        StructField("right", StringType, nullable = false))))
  }

  /** Read a published `vocab.json` — ONE flat `{"token": id}` object —
    * into the (token, token_id) frame. The file is a flat string→int
    * map, so a small escape-aware scanner (strings, `\uXXXX` and the
    * standard short escapes, integer values) covers it exactly; no
    * JSON library, no schema inference (Spark's JSON reader would see
    * one row with 50k columns). Driver-side, size-guarded. */
  def readGpt2Vocab(spark: SparkSession, path: String,
                    maxBytes: Long = 64L << 20): DataFrame = {
    val txt = readSmallTextFile(spark, path, maxBytes)
    def fail(i: Int, what: String): Nothing =
      throw new IllegalArgumentException(
        s"readGpt2Vocab: $path is not a flat {\"token\": id} object " +
          s"($what at offset $i)")
    var i = 0
    val n = txt.length
    def skipWs(): Unit = while (i < n && txt.charAt(i).isWhitespace) i += 1
    def readString(): String = {
      if (txt.charAt(i) != '"') fail(i, "expected '\"'")
      i += 1
      val sb = new java.lang.StringBuilder
      while (i < n && txt.charAt(i) != '"') {
        val c = txt.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) fail(i, "dangling escape")
          txt.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' =>
              if (i + 6 > n) fail(i, "truncated \\u escape")
              sb.append(Integer.parseInt(txt.substring(i + 2, i + 6), 16)
                .toChar)
              i += 6
            case other => fail(i, s"unknown escape '\\$other'")
          }
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) fail(i, "unterminated string")
      i += 1 // closing quote
      sb.toString
    }
    skipWs()
    if (i >= n || txt.charAt(i) != '{') fail(i, "expected '{'")
    i += 1
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    skipWs()
    if (i < n && txt.charAt(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        skipWs()
        val tok = readString()
        skipWs()
        if (i >= n || txt.charAt(i) != ':') fail(i, "expected ':'")
        i += 1
        skipWs()
        val start = i
        if (i < n && txt.charAt(i) == '-') i += 1
        while (i < n && txt.charAt(i).isDigit) i += 1
        if (i == start) fail(i, "expected an integer id")
        rows += Row(tok, txt.substring(start, i).toLong)
        skipWs()
        if (i < n && txt.charAt(i) == ',') { i += 1 }
        else if (i < n && txt.charAt(i) == '}') { i += 1; more = false }
        else fail(i, "expected ',' or '}'")
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toSeq).asJava),
      StructType(Seq(StructField("token", StringType, nullable = false),
        StructField("token_id", LongType, nullable = false))))
  }

  /** IMPORT a PRETRAINED tokenizer — the production-common case (most
    * teams train with a published tokenizer, not their own): construct
    * the persisted stamped model from caller-provided merge and vocab
    * frames in the published GPT-2 `merges.txt`/`vocab.json` shape,
    * instead of training. Every serving path — [[encodeIdsIndexed]],
    * the windows landings ([[graft.llm.Pipeline.BpeWindows]]),
    * [[detokenizeIndexed]], [[fertilityReport]], maintenance — reads
    * the stamp and the two tables, so an imported model is a drop-in:
    * the engine then produces ids under the EXACT tokenizer the team
    * trains with.
    *
    * `merges`: (rank, left, right) — rank 0 applied first, the
    * merges.txt line order; `vocab`: (token, token_id) — the
    * vocab.json map. With `gpt2Alias = true` (requires `byteLevel`)
    * the surfaces are read as published GPT-2 alias text ('Ġ' = space)
    * and converted to this engine's hex-pair byte symbols; otherwise
    * they must already BE in engine symbolization (hex pairs when
    * byteLevel, code points otherwise).
    *
    * Validation is loud and total (model-sized, driver-side — the
    * frames are ≤ `maxImport` rows by contract, probed before
    * collect): distinct ranks; merged surfaces consistent; every
    * merged surface AND (when byteLevel) all 256 base byte symbols
    * present in vocab (a missing one would silently degrade encode to
    * -1 — the import exists to prevent exactly that); unique tokens
    * and ids; no id collides with the -1 OOV sentinel.
    *
    * Lifecycle: the stamp carries `imported = true` — there is no
    * training corpus to replay, so [[graft.llm.Maintain.maintainBpe]]
    * can indicate OOV drift but never auto-fire a retrain; the
    * corrective is a re-import of a refreshed published pair. */
  /** `specialTokens` declares the published pair's DEDICATED control
    * tokens (the GPT-2 `<|endoftext|>` shape): surface forms that live
    * IN the vocab but that the merge chain can never emit — their ids
    * record in the stamp, and the stamped serving paths (the windows
    * landings' [[graft.llm.Pipeline.BpeWindows]] resolution, the
    * [[Sft]] indexed assemblers) then accept exactly these ids as
    * `eodId`/`sepId`/`padId` instead of refusing them as vocab
    * collisions — the refusal exists to catch ACCIDENTAL collisions
    * with content tokens, and a declared special is not an accident.
    * Detokenization still renders them (the full vocab map), while
    * encode never produces them (the special surface is not a merge
    * result, and pre-tokenization splits any literal occurrence). */
  def importBpeModel(spark: SparkSession, merges: DataFrame,
                     vocab: DataFrame, name: String, path: String,
                     byteLevel: Boolean = true,
                     wordPattern: Option[String] = Some(Gpt2WordPattern),
                     gpt2Alias: Boolean = false,
                     maxImport: Int = 1000000,
                     specialTokens: Seq[String] = Nil,
                     normalize: String = "none"): Unit = {
    Normalize.validate(normalize, "importBpeModel")
    require(!gpt2Alias || byteLevel,
      "importBpeModel: gpt2Alias decodes the published BYTE-alias " +
        "surface forms — it requires byteLevel = true")
    def bounded(df: DataFrame, what: String): Unit =
      require(df.limit(maxImport + 1).count() <= maxImport,
        s"importBpeModel: $what exceeds $maxImport rows — published " +
          "tokenizers are model-sized; raise maxImport only if this " +
          "is really a tokenizer")
    bounded(merges, "merges frame"); bounded(vocab, "vocab frame")
    val conv: String => String =
      if (gpt2Alias) gpt2AliasToHex else identity
    val mergeRows = merges.select(col("rank").cast("int"),
        col("left").cast("string"), col("right").cast("string"))
      .collect()
      .map(r => (r.getInt(0), conv(r.getString(1)), conv(r.getString(2))))
      .sortBy(_._1)
    require(mergeRows.map(_._1).distinct.length == mergeRows.length,
      "importBpeModel: duplicate merge ranks — the merge order would " +
        "be ambiguous")
    val vocabRows = vocab.select(col("token").cast("string"),
        col("token_id").cast("long")).collect()
      .map(r => (conv(r.getString(0)), r.getLong(1)))
    require(vocabRows.map(_._1).distinct.length == vocabRows.length,
      "importBpeModel: duplicate vocab tokens — the encode's vocab " +
        "join would fan out")
    require(vocabRows.map(_._2).distinct.length == vocabRows.length,
      "importBpeModel: duplicate vocab ids — two tokens sharing an id " +
        "make detokenization ambiguous")
    require(vocabRows.forall(_._2 != -1L),
      "importBpeModel: a vocab id collides with the -1 OOV sentinel")
    val vocabSet = vocabRows.map(_._1).toSet
    val missingMerged = mergeRows
      .map { case (_, l, r) => l + r }.filterNot(vocabSet.contains)
    require(missingMerged.isEmpty,
      s"importBpeModel: ${missingMerged.length} merged surface(s) " +
        s"missing from vocab (first: '${missingMerged.headOption.getOrElse("")}') — " +
        "their tokens would encode to -1, defeating the import")
    if (byteLevel) {
      val missingBase = (0 until 256).map(b => f"$b%02X")
        .filterNot(vocabSet.contains)
      require(missingBase.isEmpty,
        s"importBpeModel: ${missingBase.length} of the 256 base byte " +
          s"symbols missing from vocab (first: '${missingBase.headOption.getOrElse("")}') — " +
          "a byte-level model must cover every byte or OOV is no " +
          "longer structurally zero")
    }
    val mergeFrame = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          mergeRows.toSeq.map { case (rk, l, r) =>
            // pair_count 0: the published pair publishes no counts —
            // nothing downstream reads the column for serving
            Row(rk, l, r, l + r, 0L)
          }).asJava), mergesSchema)
    val vocabFrame = spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(
          vocabRows.toSeq.map { case (t, id) => Row(t, id) }).asJava),
      StructType(Seq(StructField("token", StringType, nullable = false),
        StructField("token_id", LongType, nullable = false))))
    val vocabByToken = vocabRows.toMap
    val specialIds = specialTokens.map { t =>
      val surf = conv(t)
      vocabByToken.getOrElse(surf, throw new IllegalArgumentException(
        s"importBpeModel: special token '$t' is not in the vocab — a " +
          "declared control token must carry a published id"))
    }
    graft.api.GraftFrame(mergeFrame)
      .toBucketedTable(s"${name}_bpe", s"$path/bpe", 1, Seq("merged"))
    graft.api.GraftFrame(vocabFrame)
      .toBucketedTable(s"${name}_bpe_vocab", s"$path/vocab", 1,
        Seq("token"))
    stampBpeMeta(spark, path, BpeMeta(mergeRows.length,
      minPairCount = 1L, maxTypes = maxImport, byteLevel = byteLevel,
      wordPattern = wordPattern, imported = true,
      specialIds = specialIds, normalize = normalize))
  }

  /** The vocab map SERVING paths embed for encode and structural-id
    * validation: the full persisted vocab minus the stamp's declared
    * special ids — encode can never emit a special (its surface is not
    * a merge result), so subtracting it changes nothing the encoder
    * does while letting a landing legitimately use the special as its
    * eodId/sepId/padId (the collision refusal guards against CONTENT
    * tokens). Detokenization keeps the full map — it must render
    * specials. */
  def servingVocabMap(spark: SparkSession, name: String,
                      path: String): Map[String, Long] = {
    val specials = readBpeMeta(spark, path).specialIds.toSet
    vocabMap(spark.table(s"${name}_bpe_vocab"))
      .filterNot { case (_, id) => specials.contains(id) }
  }

  /** Serve [[encodeTokens]] from the persisted model — bit-identical
    * to the one-shot form over the same corpus (oracle-pinned). */
  def encodeIndexed(spark: SparkSession, name: String, path: String,
                    docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val meta = readBpeMeta(spark, path)
    encodeTokens(Normalize.frame(docs, textCol, meta.normalize), idCol,
      textCol, mergeList(spark.table(s"${name}_bpe")), meta.byteLevel,
      meta.wordPattern)
  }

  /** Serve [[encodeIds]] from the persisted model (merges + vocab). */
  def encodeIdsIndexed(spark: SparkSession, name: String, path: String,
                       docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val meta = readBpeMeta(spark, path)
    encodeIds(Normalize.frame(docs, textCol, meta.normalize), idCol,
      textCol, mergeList(spark.table(s"${name}_bpe")),
      spark.table(s"${name}_bpe_vocab"), meta.byteLevel, meta.wordPattern)
  }

  /** Collect a vocab frame into the bounded map [[BpeEncodeIds]]
    * embeds — MODEL-sized (|alphabet| + numMerges), never
    * corpus-sized; the same object [[encodeIds]] broadcasts. */
  def vocabMap(vocab: DataFrame): Map[String, Long] =
    vocab.select("token", "token_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** GPT-style concat-and-chop training windows in BPE TOKEN-ID space —
    * the artifact a trainer actually loads: `windowSize` counts BPE
    * tokens (not whitespace words) and each window lands as
    * `window_ids: array<long>` under the learned vocab (OOV → -1, the
    * [[encodeIds]] convention). Same chop semantics as
    * [[graft.llm.TextStats.assembleWindows]] — deterministic Knuth-hash
    * doc permutation, exclusive-cumsum offsets, boundary-straddling
    * docs tiled across windows with no gap or overlap — with the token
    * unit swapped: conservation holds in ID space (sum of window
    * n_tokens = sum of per-doc BPE token counts).
    *
    * Scale shape: the id sequence materializes INSIDE the scan (one
    * fused [[graft.functions.BpeEncodeIds]] per word — no vocab join,
    * no per-doc regroup shuffle), then the [[graft.llm.TextStats
    * .tokenWindowMembers]] two-pass cumsum and ONE shuffle keyed on
    * window_id. Docs with zero BPE tokens contribute nothing and
    * vanish from the assembly (the [[graft.llm.TextStats
    * .assembleWindows]] convention for zero-token members). A
    * windowSize-id row is ~8·windowSize bytes — an 8k-token window is
    * ~64 KB, far under row limits. */
  def assembleWindowsIds(docs: DataFrame, idCol: String, textCol: String,
                         windowSize: Long, seed: Long,
                         merges: Seq[(String, String)],
                         vocab: Map[String, Long],
                         eodId: Option[Long] = None,
                         withDocSpans: Boolean = false,
                         byteLevel: Boolean = false,
                         wordPattern: Option[String] = None,
                         groupCols: Seq[String] = Nil): DataFrame = {
    eodId.foreach(e => require(e != -1L && !vocab.valuesIterator.contains(e),
      s"assembleWindowsIds: eodId $e collides with a vocab id (or the " +
        "-1 OOV sentinel) — reserve an id outside the vocabulary, e.g. " +
        "max(token_id) + 1"))
    assembleWindowsIdsFrom(docs, idCol, textCol, windowSize, seed,
      w => TextHashExprs.bpeEncodeIds(w, merges, vocab, byteLevel),
      eodId, withDocSpans, wordPattern, groupCols)
  }

  /** Tokenizer-generic body of [[assembleWindowsIds]]: the per-word
    * encode expression is the ONLY model-specific part of the chop
    * landing, so [[graft.llm.Unigram]] shares every membership/
    * conservation/shuffle decision with the BPE form by construction
    * (a second copy could silently drift from the oracle-pinned
    * semantics). Callers validate eodId against THEIR vocabulary. */
  private[llm] def assembleWindowsIdsFrom(
      docs: DataFrame, idCol: String, textCol: String,
      windowSize: Long, seed: Long,
      encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      eodId: Option[Long],
      withDocSpans: Boolean,
      wordPattern: Option[String],
      groupCols: Seq[String] = Nil): DataFrame = {
    val gc = groupCols.map(col)
    val words = filter(wordsOf(textCol, wordPattern),
      w => length(w) >= 1)
    val bare = flatten(transform(words, encode))
    // EOD insertion (the GPT concat convention): every document
    // contributes exactly one trailing end-of-document id, so token
    // accounting everywhere downstream is docTokens + 1 per doc
    val idsArr = eodId.fold(bare)(e => concat(bare, array(lit(e))))
    val withN = docs.filter(col(textCol).isNotNull)
      .select(gc ++ Seq(col(idCol), idsArr.as("__ids__")): _*)
      .select(gc ++ Seq(col(idCol), col("__ids__"),
        size(col("__ids__")).cast("long").as("__n__")): _*)
    val members = TextStats
      .tokenWindowMembers(withN, idCol, "__n__", windowSize, seed,
        groupCols)
      .filter(col("tok_to") > col("tok_from"))
      .select(gc ++ Seq(col("window_id"), col("window_pos"),
        col(idCol).cast("long").as("__mid__"),
        slice(col("__ids__"), (col("tok_from") + 1).cast("int"),
          (col("tok_to") - col("tok_from")).cast("int")).as("__slice__")): _*)
    val sorted = array_sort(collect_list(struct(col("window_pos"),
      col("__slice__"), col("__mid__"))))
    val aggs = Seq(
      flatten(transform(sorted, s => s.getField("__slice__")))
        .as("window_ids"),
      sum(size(col("__slice__")).cast("long")).as("n_tokens")) ++
      // doc-boundary metadata (the attention-masking contract: a
      // trainer that masks cross-document attention needs each
      // window's (doc, offset, length) tiling — Llama-3-style). Same
      // collect, zero extra exchange; spans tile the window exactly
      // (Σ len == n_tokens, offsets contiguous — spec-pinned).
      (if (withDocSpans) Seq(
        transform(sorted, s => struct(
          s.getField("__mid__").as("id"),
          s.getField("window_pos").as("pos"),
          size(s.getField("__slice__")).cast("long").as("len")))
          .as("doc_spans"))
       else Nil)
    members.groupBy(gc :+ col("window_id"): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** SLIDING-window variant of [[assembleWindowsIds]] — the EVAL
    * layout (perplexity with overlapping context): window `w` covers
    * the global token span [w·stride, w·stride + windowSize) over the
    * same concatenated permutation stream, so consecutive windows
    * overlap by windowSize − stride tokens (stride == windowSize
    * degenerates to the disjoint training form; stride > windowSize
    * SUBSAMPLES the stream — the gaps simply produce no window ids).
    * Output (window_id, window_ids, n_tokens): every window holds
    * exactly windowSize ids except those clipped by the stream tail.
    *
    * Scale shape: the same two-pass cumsum, then a bounded member
    * explode and ONE shuffle keyed on window_id — but the materialized
    * id mass is corpus_tokens × windowSize/stride (each token lands in
    * up to ⌈windowSize/stride⌉ windows): the honest sliding-window
    * blow-up, priced by the caller's stride. Zero-token docs
    * contribute nothing (no degenerate membership — the eval layout
    * has no per-doc addressing to preserve). */
  def assembleWindowsIdsStrided(docs: DataFrame, idCol: String,
                                textCol: String, windowSize: Long,
                                stride: Long, seed: Long,
                                merges: Seq[(String, String)],
                                vocab: Map[String, Long],
                                eodId: Option[Long] = None,
                                byteLevel: Boolean = false,
                                wordPattern: Option[String] = None,
                                groupCols: Seq[String] = Nil): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    require(stride > 0, s"stride must be positive, got $stride")
    eodId.foreach(e => require(e != -1L && !vocab.valuesIterator.contains(e),
      s"assembleWindowsIdsStrided: eodId $e collides with a vocab id " +
        "(or the -1 OOV sentinel)"))
    assembleWindowsIdsStridedFrom(docs, idCol, textCol, windowSize,
      stride, seed,
      w => TextHashExprs.bpeEncodeIds(w, merges, vocab, byteLevel),
      eodId, wordPattern, groupCols)
  }

  /** Tokenizer-generic body of [[assembleWindowsIdsStrided]] (see
    * [[assembleWindowsIdsFrom]] for why the encode is a parameter). */
  private[llm] def assembleWindowsIdsStridedFrom(
      docs: DataFrame, idCol: String, textCol: String,
      windowSize: Long, stride: Long, seed: Long,
      encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      eodId: Option[Long],
      wordPattern: Option[String],
      groupCols: Seq[String] = Nil): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    require(stride > 0, s"stride must be positive, got $stride")
    val gc = groupCols.map(col)
    val words = filter(wordsOf(textCol, wordPattern), w => length(w) >= 1)
    val bare = flatten(transform(words, encode))
    val idsArr = eodId.fold(bare)(e => concat(bare, array(lit(e))))
    val withN = docs.filter(col(textCol).isNotNull)
      .select(gc ++ Seq(col(idCol), idsArr.as("__ids__")): _*)
      .select(gc ++ Seq(col(idCol), col("__ids__"),
        size(col("__ids__")).cast("long").as("__n__")): _*)
    val withH = withN.withColumn("__sh__", graft.QHelp.keyHash31(
      pmod(col(idCol), lit(2147483648L)) + lit(seed % 2147483648L)))
    val cum = graft.operators.WindowOps
      // hashed form (r16): deterministic buckets over the keyHash31
      // order key — no boundary-sampling pass re-running the encode
      .globalCumSumHashed(withH, "__sh__", "__n__", "__cum__", 1L << 32,
        groupCols)
      .withColumn("token_start", col("__cum__") - col("__n__"))
    // doc [s, e) meets window w iff w·stride < e AND w·stride+size > s:
    // wf = max(0, floor((s − size)/stride) + 1), wl = floor((e−1)/stride)
    val members = cum.filter(col("__n__") > 0)
      .withColumn("window_first", greatest(lit(0L),
        graft.QHelp.floorDiv(col("token_start") - windowSize, stride) +
          lit(1L)))
      .withColumn("window_last",
        graft.QHelp.floorDiv(col("__cum__") - 1, stride))
      .withColumn("window_id",
        explode(sequence(col("window_first"), col("window_last"))))
      .withColumn("tok_from",
        greatest(col("window_id") * stride - col("token_start"), lit(0L)))
      .withColumn("tok_to",
        least(col("window_id") * stride + windowSize - col("token_start"),
          col("__n__")))
      .withColumn("window_pos",
        greatest(col("token_start") - col("window_id") * stride, lit(0L)))
      .filter(col("tok_to") > col("tok_from"))
    members
      .select(gc ++ Seq(col("window_id"), col("window_pos"),
        slice(col("__ids__"), (col("tok_from") + 1).cast("int"),
          (col("tok_to") - col("tok_from")).cast("int")).as("__slice__")): _*)
      .groupBy(gc :+ col("window_id"): _*)
      .agg(
        flatten(transform(
          array_sort(collect_list(struct(col("window_pos"),
            col("__slice__")))),
          s => s.getField("__slice__"))).as("window_ids"),
        sum(size(col("__slice__")).cast("long")).as("n_tokens"))
  }

  /** PACKED training windows in BPE TOKEN-ID space — the doc-aware
    * layout ([[graft.llm.TextStats.assembleWindowsPacked]] semantics in
    * the id unit): a document whose encode (+ its one EOD id, when
    * `eodId` is set) fits in `windowSize` lands WHOLE in exactly one
    * window; longer docs pre-split into windowSize-sized pieces, so
    * conservation is exact in id space — no truncation loss, unlike the
    * published truncate-to-fit packers. `padId` (reserved outside the
    * vocab, like `eodId`) right-pads every window to exactly
    * `windowSize` ids — the fixed-shape tensor a trainer loads —
    * while `n_tokens` keeps the REAL count, so the loss/attention mask
    * is `position < n_tokens` and token accounting (conservation fsck,
    * mixing budgets) never sees pad ids. `doc_spans` carry the same
    * (id, pos, len) tiling as [[assembleWindowsIds]] — spans tile
    * n_tokens, not the padded length.
    *
    * Scale shape: the fused per-word encode inside the scan, then
    * [[TextStats.packedPieceMembers]] (two tiny cumsums + one
    * segment-keyed shuffle of scalar structs — token ids do NOT ride
    * the segment row), one corpus-sized join back to the id arrays,
    * one window-keyed shuffle. */
  def assembleWindowsIdsPacked(docs: DataFrame, idCol: String,
                               textCol: String, windowSize: Long,
                               seed: Long,
                               merges: Seq[(String, String)],
                               vocab: Map[String, Long],
                               eodId: Option[Long] = None,
                               padId: Option[Long] = None,
                               withDocSpans: Boolean = false,
                               byteLevel: Boolean = false,
                               wordPattern: Option[String] = None,
                               segmentDocs: Int = 512,
                               persisted: Option[scala.collection.mutable.Buffer[DataFrame]] = None,
                               groupCols: Seq[String] = Nil): DataFrame = {
    eodId.foreach(e => require(e != -1L && !vocab.valuesIterator.contains(e),
      s"assembleWindowsIdsPacked: eodId $e collides with a vocab id (or " +
        "the -1 OOV sentinel) — reserve an id outside the vocabulary"))
    padId.foreach(p => require(p != -1L && !vocab.valuesIterator.contains(p)
        && !eodId.contains(p),
      s"assembleWindowsIdsPacked: padId $p collides with a vocab id, the " +
        "-1 OOV sentinel, or the eodId — reserve a distinct id outside " +
        "the vocabulary"))
    assembleWindowsIdsPackedFrom(docs, idCol, textCol, windowSize, seed,
      w => TextHashExprs.bpeEncodeIds(w, merges, vocab, byteLevel),
      eodId, padId, withDocSpans, wordPattern, segmentDocs, persisted,
      groupCols)
  }

  /** Tokenizer-generic body of [[assembleWindowsIdsPacked]] (see
    * [[assembleWindowsIdsFrom]] for why the encode is a parameter). */
  private[llm] def assembleWindowsIdsPackedFrom(
      docs: DataFrame, idCol: String, textCol: String,
      windowSize: Long, seed: Long,
      encode: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      eodId: Option[Long],
      padId: Option[Long],
      withDocSpans: Boolean,
      wordPattern: Option[String],
      segmentDocs: Int,
      persisted: Option[scala.collection.mutable.Buffer[DataFrame]] = None,
      groupCols: Seq[String] = Nil): DataFrame = {
    val gc = groupCols.map(col)
    val words = filter(wordsOf(textCol, wordPattern), w => length(w) >= 1)
    val bare = flatten(transform(words, encode))
    val idsArr = eodId.fold(bare)(e => concat(bare, array(lit(e))))
    val withN0 = docs.filter(col(textCol).isNotNull)
      .select(gc ++ Seq(col(idCol), idsArr.as("__ids__")): _*)
      .select(gc ++ Seq(col(idCol), col("__ids__"),
        size(col("__ids__")).cast("long").as("__n__")): _*)
    // r16 optimization: the encoded frame feeds TWO branches — the
    // scalar piece/membership machinery (only (id, n)) and the id-array
    // join-back — so an unmaterialized plan runs the corpus encode
    // twice. When the caller owns a cache lifecycle (the landing's
    // handles buffer), persist the boundary MEMORY_AND_DISK — the
    // chain's stage-boundary posture, same data magnitude; a lazy
    // caller (persisted = None) keeps the old no-cache shape.
    val withN = persisted.fold(withN0) { b =>
      val p = withN0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      b += p
      p
    }
    val members = TextStats.packedPieceMembers(
      withN.select(gc ++ Seq(col(idCol), col("__n__")): _*), idCol, "__n__",
      windowSize, seed, segmentDocs, groupCols)
    val joined = members.join(
      withN.select(col(idCol).cast("long").as("__mid__"), col("__ids__")),
      Seq("__mid__"))
      .select(gc ++ Seq(col("window_id"), col("__off__"), col("__mid__"),
        col("__plen__"),
        slice(col("__ids__"), (col("tok_from") + 1).cast("int"),
          col("__plen__").cast("int")).as("__slice__")): _*)
    val sorted = array_sort(collect_list(struct(col("__off__"),
      col("__slice__"), col("__mid__"), col("__plen__"))))
    val rawIds = flatten(transform(sorted, s => s.getField("__slice__")))
    val nTok = sum(col("__plen__")).as("n_tokens")
    val idsOut = padId.fold(rawIds)(p => concat(rawIds,
      array_repeat(lit(p),
        (lit(windowSize) - size(rawIds)).cast("int")))).as("window_ids")
    val aggs = Seq(idsOut, nTok) ++
      (if (withDocSpans) Seq(
        transform(sorted, s => struct(
          s.getField("__mid__").as("id"),
          s.getField("__off__").as("pos"),
          s.getField("__plen__").as("len"))).as("doc_spans"))
       else Nil)
    joined.groupBy(gc :+ col("window_id"): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** DETOKENIZE an id-array column back to its surface string through
    * the persisted model — the reader-side inverse of the id-space
    * window landings: a trainer (or an operator debugging a window)
    * reads `window_ids` back as text with one expression. With a
    * GPT-2-pretokenized byte-level model this reproduces the original
    * text exactly (leading spaces ride inside tokens); whitespace-split
    * models lose word boundaries by construction, and the model's
    * STAMP decides which contract applies — the caller never
    * re-specifies. OOV (-1) ids render as U+FFFD. */
  def detokenizeIndexed(spark: SparkSession, name: String, path: String,
                        ids: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    TextHashExprs.bpeDecodeIds(ids,
      vocabMap(spark.table(s"${name}_bpe_vocab")),
      readBpeMeta(spark, path).byteLevel)
  }

  /** TOKENIZER FERTILITY report — the per-language tokenizer-QC metric
    * (tokens emitted per word; the number multilingual tokenizer work
    * tunes, e.g. the XLM-R/BLOOM analyses): for each `groupCol` value,
    * total words, total encoded tokens, `fertility` = tokens/words,
    * and the OOV share of emitted tokens. A language whose fertility
    * is far above the corpus mean is being shredded into characters
    * (the vocab under-serves it); growing OOV means unseen scripts.
    * Served from the persisted model — symbolization level and
    * pre-tokenizer ride the stamp.
    *
    * Scale shape: ONE pass — per-row word extraction + the fused
    * memoized encode expression + a map-side-combined groupBy on the
    * group column; output is group-cardinality-sized. Exact integer
    * masses divided once as doubles (oracle hash-checks them). A group
    * whose docs are all word-less still surfaces (n_words 0, fertility
    * null) — absence would hide a broken-extraction language. */
  def fertilityReport(spark: SparkSession, name: String, path: String,
                      docs: DataFrame, textCol: String,
                      groupCol: String): DataFrame = {
    val meta = readBpeMeta(spark, path)
    val merges = mergeList(spark.table(s"${name}_bpe"))
    val vocab = vocabMap(spark.table(s"${name}_bpe_vocab"))
    val words = filter(wordsOf(textCol, meta.wordPattern),
      w => length(w) >= 1)
    val ids = flatten(transform(col("__wd__"),
      w => TextHashExprs.bpeEncodeIds(w, merges, vocab, meta.byteLevel)))
    // words/ids projected once (r16): three sibling columns referenced
    // the same word-extraction and encode expressions, so the optimizer
    // inlined and re-evaluated them per column — 2x the per-row encode
    // at any corpus size (the postings lesson)
    Normalize.frame(docs, textCol, meta.normalize)
      .filter(col(textCol).isNotNull)
      .select(col(groupCol), words.as("__wd__"))
      .select(col(groupCol), col("__wd__"), ids.as("__ids__"))
      .select(col(groupCol),
        size(col("__wd__")).cast("long").as("__w__"),
        size(col("__ids__")).cast("long").as("__t__"),
        size(filter(col("__ids__"), i => i < 0L)).cast("long").as("__o__"))
      .groupBy(col(groupCol))
      .agg(sum(col("__w__")).as("n_words"),
        sum(col("__t__")).as("n_tokens"),
        sum(col("__o__")).as("n_oov"))
      .select(col(groupCol),
        col("n_words"), col("n_tokens"), col("n_oov"),
        when(col("n_words") === 0L, lit(null))
          .otherwise(col("n_tokens").cast("double") / col("n_words"))
          .as("fertility"),
        when(col("n_tokens") === 0L, lit(null))
          .otherwise(col("n_oov").cast("double") / col("n_tokens"))
          .as("oov_rate"))
  }

  /** OOV drift of a fresh corpus slice against the stored vocab: the
    * fraction of encoded token occurrences with no vocab id — a pure
    * integer ratio, engine-deterministic. Growing OOV means the corpus
    * outgrew the vocabulary (new scripts, new markup) and every such
    * token degrades to an untrainable -1; the action is
    * [[writeBpeModel]] on a refreshed corpus. */
  def bpeOovRate(spark: SparkSession, name: String, path: String,
                 fresh: DataFrame, textCol: String): Double = {
    val ids = encodeIdsIndexed(spark, name, path,
      fresh.select(lit(0L).as("__id__"), col(textCol)), "__id__", textCol)
    val row = ids.agg(count(lit(1)).as("total"),
      sum(when(col("token_id") < 0, 1L).otherwise(0L)).as("oov")).head()
    if (row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  /** Maintenance observable: rows + parquet file count per table. */
  def bpeReport(spark: SparkSession, name: String): DataFrame = {
    def one(table: String) =
      spark.table(table)
        .select(input_file_name().as("__f__"))
        .agg(count(lit(1)).as("rows"),
          countDistinct(col("__f__")).as("files"))
        .select(lit(table).as("table"), col("rows"), col("files"))
    one(s"${name}_bpe").unionByName(one(s"${name}_bpe_vocab"))
  }

  /** FILL-IN-THE-MIDDLE transformation (Bavarian et al. 2022 — the
    * code-model pretraining op): a deterministic per-key fraction of
    * id sequences is rearranged so the model learns to infill —
    * two uniform cut points split the sequence into (prefix, middle,
    * suffix) and the row re-lands with sentinel ids as
    *
    *  - `psm`: `[pre] prefix [suf] suffix [mid] middle`
    *  - `spm`: `[suf] suffix [pre] prefix [mid] middle`
    *
    * (the middle always LAST — the trainer's loss target; removing the
    * three sentinels and undoing the rotation reconstructs the
    * original, spec-pinned). Everything is hash-deterministic — a
    * Knuth-style gate decides application and two DECORRELATED draws
    * pick the cuts: each draw runs a two-round xorshift-multiply mix
    * (integer ops only, so the whole thing replays in SQL) over the
    * key with the draw index folded in multiplicatively BEFORE the
    * avalanche rounds. A single affine hash with an additive offset
    * would make the second draw a constant shift of the first and the
    * (prefix, middle, suffix) geometry nearly constant across the
    * corpus — the cut-point PAIR must be jointly spread, not just
    * each cut marginally uniform. The op is reproducible anywhere,
    * replayable in SQL, and stable under repartitioning. Sentinel ids must be reserved outside the
    * vocabulary by the caller (the eodId/padId contract); they must be
    * mutually distinct and not -1. Blockwise — fuses into the scan, no
    * shuffle; rows gain `fim_applied` and transformed rows grow by
    * exactly 3 ids. Tokenizer-agnostic: any id array (a landed window,
    * a per-doc encode) transforms the same way. */
  /** The [[fimTransform]] parameter record — the form the loader path
    * ([[Pipeline.loadWindows]]) takes, so the transform rides the load
    * stream with its parameters recorded in one place. */
  final case class FimSpec(rate: Double, seed: Long,
                           preId: Long, sufId: Long, midId: Long,
                           mode: String = "psm")

  /** THE single definition of the deterministic per-(key, draw-index)
    * hash every hash-seeded data transform draws from ([[fimTransform]]
    * gates/cuts, [[Denoise.spanCorrupt]] span offsets): two
    * xorshift-multiply avalanche rounds over (key mod 2^31) with
    * (seed + idx·1779033703) folded in BEFORE the rounds, so draws at
    * different indices are mutually decorrelated per key (an affine
    * hash's draws differ by a CONSTANT mod 2^32 — the r15-ADVICE
    * corpus-wide-constant-gap defect). Integer ops only (pmod, xor,
    * shiftright), so oracles replay it verbatim in SQL; a second copy
    * of the formula could silently diverge from those mirrors — keep
    * this the only one (the [[graft.QHelp.keyHash31]] discipline). */
  private[llm] def drawHash(key: Column, idx: Column, seed: Long): Column = {
    val s0 = pmod(
      pmod(key.cast("long"), lit(2147483648L)) +
        pmod(lit(seed) + idx * lit(1779033703L), lit(2147483648L)),
      lit(2147483648L))
    val r1 = pmod(
      s0.bitwiseXOR(shiftright(s0, 15)) * lit(2654435761L),
      lit(4294967296L))
    val r2 = pmod(r1, lit(2147483648L))
    pmod(r2.bitwiseXOR(shiftright(r2, 13)) * lit(2246822519L),
      lit(4294967296L))
  }

  def fimTransform(frame: DataFrame, keyCol: String, idsCol: String,
                   rate: Double, seed: Long,
                   preId: Long, sufId: Long, midId: Long,
                   mode: String = "psm"): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    // a non-integral key would hash through a NULL cast and silently
    // no-op every row (fim_applied NULL) — refuse loudly, the
    // shuffleIndex/bucketByLength key contract
    frame.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"fimTransform: key column '$keyCol' must be an integral type " +
          s"(the deterministic gate hashes it as long — factorize or " +
          s"hash string keys to an id first), got ${other.simpleString}")
    }
    require(mode == "psm" || mode == "spm",
      s"fimTransform: unknown mode '$mode' — \"psm\" or \"spm\"")
    val ids = Seq(preId, sufId, midId)
    require(ids.distinct.length == 3 && !ids.contains(-1L),
      s"fimTransform: sentinel ids $preId/$sufId/$midId must be mutually " +
        "distinct and not the -1 OOV sentinel — reserve ids outside the " +
        "vocabulary (the eodId/padId contract)")
    val threshold = (rate * 4294967296L).toLong
    def h(off: Long) = drawHash(col(keyCol), lit(off), seed)
    val n = size(col(idsCol)).cast("long")
    val u1 = pmod(h(1L), n + lit(1L))
    val u2 = pmod(h(2L), n + lit(1L))
    val c1 = least(u1, u2)
    val c2 = greatest(u1, u2)
    val prefix = slice(col(idsCol), lit(1), c1.cast("int"))
    val middle = slice(col(idsCol), (c1 + lit(1L)).cast("int"),
      (c2 - c1).cast("int"))
    val suffix = slice(col(idsCol), (c2 + lit(1L)).cast("int"),
      (n - c2).cast("int"))
    val rearranged = mode match {
      case "psm" => concat(array(lit(preId)), prefix,
        array(lit(sufId)), suffix, array(lit(midId)), middle)
      case "spm" => concat(array(lit(sufId)), suffix,
        array(lit(preId)), prefix, array(lit(midId)), middle)
    }
    val applied = h(0L) < lit(threshold)
    val others = frame.columns.filter(_ != idsCol).map(col).toIndexedSeq
    frame.select(others ++ Seq(
      when(applied, rearranged).otherwise(col(idsCol)).as(idsCol),
      applied.as("fim_applied")): _*)
  }

  /** Compact both tables to one file per bucket — online-safe flip. */
  def compactBpe(spark: SparkSession, name: String): Unit = {
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_bpe")
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_bpe_vocab")
  }
}
