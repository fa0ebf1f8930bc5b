package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHashExprs

/** WORDPIECE subword tokenizer (Devlin et al. 2019 — the BERT family's
  * tokenizer; the published `WordpieceTokenizer` of the public BERT
  * release): a vocabulary of pieces where continuation pieces carry a
  * `##`-style prefix, served by GREEDY LONGEST-MATCH-FIRST — from the
  * cursor take the longest matching piece; if any cursor has no match,
  * or the word exceeds `maxInputChars` code points, the WHOLE word is
  * the unknown token (all-or-nothing UNK, unlike the BPE/unigram
  * per-code-point fallback). The third tokenizer family beside [[Bpe]]
  * (bottom-up merges) and [[Unigram]] (EM-pruned Viterbi) — a
  * BERT/DistilBERT/ELECTRA-class corpus team tokenizes under exactly
  * this algorithm and vocabulary.
  *
  * IMPORT-ONLY by design: every published WordPiece model ships its
  * `vocab.txt` (one piece per line, id = line number — [[readBertVocab]]
  * reads it directly), and the production requirement is tokenizing
  * under the EXACT released vocabulary. Training a new subword
  * vocabulary from a corpus is served by the [[Bpe]] and [[Unigram]]
  * families; a WordPiece model accordingly has no training corpus to
  * replay, so maintenance ([[Maintain.maintainWordPiece]]) indicates
  * drift but never auto-fires — the corrective is a re-import of a
  * refreshed published vocabulary, a human decision by construction.
  *
  * Scale posture — the family's serving objects are MODEL-sized
  * (|vocab| pieces, bounded by the published release): encode embeds
  * the vocabulary in a native expression
  * ([[graft.functions.WordPieceEncodeIds]] — no vocab join, no regroup
  * shuffle; a document's id stream materializes inside the scan), and
  * the windows assemblers share the [[Bpe]] bodies, so every landing
  * layout (chop / strided / packed) carries the same one-shuffle
  * plans and conservation laws with only the id unit changed.
  * Determinism: matching is exact-string and greedy — engine-exact,
  * replayable in SQL as a precomputed longest-match table plus a
  * deterministic recursive walk (no float anywhere). */
object WordPiece {

  /** Model-table schema: (piece_id, piece). Published vocabularies are
    * id-dense in file order; explicit ids are preserved verbatim. */
  val vocabSchema: StructType = StructType(Seq(
    StructField("piece_id", LongType, nullable = false),
    StructField("piece", StringType, nullable = false)))

  private def wpMetaFile(path: String) = s"$path/_graft_wp_meta.json"

  /** The persisted model's stamp: the serving contract
    * ([[encodeIdsIndexed]] replays exactly these — the [[Bpe.BpeMeta]]
    * posture) plus, for a TRAINED model ([[writeWordPieceModel]],
    * `imported = false`), the full training geometry a drift-fired
    * retrain replays. An imported model keeps `imported = true` and is
    * retrain-ineligible (no corpus to replay). */
  final case class WpMeta(unkId: Long, contPrefix: String,
                          maxInputChars: Int,
                          wordPattern: Option[String],
                          imported: Boolean = true,
                          numMerges: Int = 0,
                          minPairCount: Long = 2L,
                          maxTypes: Int = 2000000,
                          minWordCount: Long = 1L,
                          unkPiece: String = "[UNK]",
                          normalize: String = "none",
                          specialIds: Seq[Long] = Nil)

  private def stampWpMeta(spark: SparkSession, path: String,
                          meta: WpMeta): Unit = {
    val p = new org.apache.hadoop.fs.Path(wpMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def esc(s: String) = Bpe.jsonEscStamp(s, "stampWpMeta: stamped string")
    val wp = meta.wordPattern.fold("")(pat =>
      s""","word_pattern":"${esc(pat)}"""")
    val sp =
      if (meta.specialIds.isEmpty) ""
      else s""","special_ids":[${meta.specialIds.mkString(",")}]"""
    val os = fs.create(p, true)
    try os.write(
      s"""{"unk_id":${meta.unkId},"cont_prefix":"${esc(meta.contPrefix)}","max_input_chars":${meta.maxInputChars},"imported":${meta.imported},"num_merges":${meta.numMerges},"min_pair_count":${meta.minPairCount},"max_types":${meta.maxTypes},"min_word_count":${meta.minWordCount},"unk_piece":"${esc(meta.unkPiece)}","normalize":"${meta.normalize}"$sp$wp}\n"""
        .getBytes("UTF-8"))
    finally os.close()
  }

  private[graft] def readWpMeta(spark: SparkSession,
                                path: String): WpMeta = {
    val p = new org.apache.hadoop.fs.Path(wpMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no wordpiece stamp at ${wpMetaFile(path)} — build with " +
        "importWordPieceModel first")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def str(k: String): Option[String] =
      (s""""$k"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(txt)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    def long(k: String): Option[Long] =
      (s""""$k"\\s*:\\s*(-?\\d+)""").r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
    val imp = """"imported"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
      .forall(_.group(1) == "true")
    (long("unk_id"), str("cont_prefix"), long("max_input_chars")) match {
      case (Some(u), Some(c), Some(m)) =>
        WpMeta(u, c, m.toInt, str("word_pattern"), imp,
          long("num_merges").getOrElse(0L).toInt,
          long("min_pair_count").getOrElse(2L),
          long("max_types").getOrElse(2000000L).toInt,
          long("min_word_count").getOrElse(1L),
          str("unk_piece").getOrElse("[UNK]"),
          str("normalize").getOrElse("none"), // pre-r16: unnormalized
          """"special_ids"\s*:\s*\[([0-9,\s-]*)\]""".r
            .findFirstMatchIn(txt)
            .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
              .map(_.toLong).toSeq)
            .getOrElse(Nil))
      case _ => throw new IllegalStateException(
        s"malformed wordpiece stamp at ${wpMetaFile(path)}: $txt")
    }
  }

  /** WordPiece symbolization of one word: the first code point plain,
    * every later code point carrying the continuation prefix — the
    * initial state of the training merge loop (surrogate-safe). */
  private[llm] def wpSymbols(word: String, contPrefix: String): Array[String] = {
    val offs = graft.functions.UnigramKernel.cpOffsets(word)
    val out = new Array[String](offs.length - 1)
    var i = 0
    while (i < offs.length - 1) {
      val cp = word.substring(offs(i), offs(i + 1))
      out(i) = if (i == 0) cp else contPrefix + cp
      i += 1
    }
    out
  }

  /** Merges-table schema: (rank, left, right, merged, pair_count,
    * left_count, right_count) — the score inputs ride the row so the
    * driver gate can value-check the LIKELIHOOD argmax, not just the
    * chosen pair. */
  val mergesSchema: StructType = StructType(Seq(
    StructField("rank", IntegerType, nullable = false),
    StructField("left", StringType, nullable = false),
    StructField("right", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false),
    StructField("left_count", LongType, nullable = false),
    StructField("right_count", LongType, nullable = false)))

  /** TRAIN a WordPiece vocabulary — the published algorithm (Schuster
    * & Nakajima 2012; the likelihood-scored variant of the public
    * BERT/HuggingFace trainers): the [[Bpe.train]] merge loop with the
    * objective changed from raw pair frequency to the LIKELIHOOD gain
    * `score(a,b) = count(ab) / (count(a) · count(b))` — a rare pair of
    * rare symbols beats a frequent pair of ubiquitous ones, which is
    * exactly where WordPiece and BPE vocabularies diverge. The argmax
    * compares scores by EXACT integer cross-multiplication (BigInt —
    * no float ratio anywhere, so the choice is engine-exact and the
    * oracle replays it in SQL as a HUGEINT comparison); ties break on
    * (left, right) code-point order, the [[Bpe.train]] contract.
    * Symbols carry the continuation prefix from symbolization on, so a
    * merged symbol is `left + stripPrefix(right)` and prefix status is
    * preserved by construction.
    *
    * Scale posture = [[Bpe.train]]'s, stated not hidden: one
    * distributed word-count shuffle, then a driver-side loop over the
    * TYPE table (maxTypes-bounded probe with the loud refusal naming
    * `minWordCount`, the standard crawl-scale frequency cutoff). */
  def train(corpus: DataFrame, textCol: String, numMerges: Int,
            minPairCount: Long = 2L,
            maxTypes: Int = 2000000,
            contPrefix: String = "##",
            wordPattern: Option[String] = None,
            minWordCount: Long = 1L): DataFrame = {
    require(numMerges >= 0, "numMerges must be >= 0")
    require(minPairCount >= 1, "minPairCount must be >= 1")
    require(minWordCount >= 1, "minWordCount must be >= 1")
    require(contPrefix.nonEmpty, "empty continuation prefix")
    val spark = corpus.sparkSession
    var types: Array[(Array[String], Long)] =
      Bpe.collectTypeTable(corpus, textCol, wordPattern, minWordCount,
        maxTypes, "WordPiece.train")
        .map { case (w, c) => (wpSymbols(w, contPrefix), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      val pairCnt = new java.util.HashMap[(String, String), Long]()
      val symCnt = new java.util.HashMap[String, Long]()
      types.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length) {
          symCnt.merge(syms(i), cnt, (x, y) => x + y)
          if (i + 1 < syms.length)
            pairCnt.merge((syms(i), syms(i + 1)), cnt, (x, y) => x + y)
          i += 1
        }
      }
      // exact rational argmax: p_a/(l_a·r_a) vs p_b/(l_b·r_b) compared
      // as p_a·l_b·r_b vs p_b·l_a·r_a in BigInt (counts can make the
      // three-way product exceed Long)
      var best: (String, String) = null
      var bestP = 0L; var bestD = BigInt(0)
      pairCnt.forEach { (k, p) =>
        if (p >= minPairCount) {
          val d = BigInt(symCnt.get(k._1)) * BigInt(symCnt.get(k._2))
          val better =
            if (best == null) true
            else {
              val cmp = (BigInt(p) * bestD).compare(BigInt(bestP) * d)
              cmp > 0 || (cmp == 0 &&
                (Bpe.cpLess(k._1, best._1) ||
                  (k._1 == best._1 && Bpe.cpLess(k._2, best._2))))
            }
          if (better) { best = k; bestP = p; bestD = d }
        }
      }
      if (best == null) continue = false
      else {
        val mergedSym = best._1 +
          (if (best._2.startsWith(contPrefix))
            best._2.substring(contPrefix.length) else best._2)
        merges += Row(rank, best._1, best._2, mergedSym, bestP,
          symCnt.get(best._1), symCnt.get(best._2))
        types = types.map { case (syms, cnt) =>
          (if (syms.length >= 2)
            graft.functions.BpeEncode.mergePairInto(syms, best._1,
              best._2, mergedSym)
          else syms, cnt)
        }
        rank += 1
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      new java.util.ArrayList[Row](merges.toSeq.asJava), mergesSchema)
  }

  /** The trained vocabulary: the unknown piece at id 0, the ALPHABET
    * (every symbol of the initial symbolization — first code points
    * plain, later ones prefixed) in code-point order, then the merged
    * surfaces in rank order; a merged surface that duplicates an
    * earlier entry keeps the earlier id (two merge paths can
    * concatenate to the same string — the [[Bpe]] vocabFrame lesson). */
  def trainedVocab(corpus: DataFrame, textCol: String, merges: DataFrame,
                   contPrefix: String = "##",
                   unkPiece: String = "[UNK]",
                   wordPattern: Option[String] = None,
                   minWordCount: Long = 1L,
                   maxTypes: Int = 2000000): DataFrame = {
    val spark = corpus.sparkSession
    // the alphabet is the distinct symbol set of [[wpSymbols]] — derived
    // with the SAME driver-side symbolizer the trainer used, over the
    // SAME bounded front door ([[Bpe.collectTypeTable]] — the O(maxTypes)
    // probe with the loud refusal), so the standalone call refuses on a
    // crawl-scale corpus instead of silently collecting every word type
    // to the driver; not a second SQL re-implementation that could drift
    val alpha = Bpe.collectTypeTable(corpus, textCol, wordPattern,
        minWordCount, maxTypes, "WordPiece.trainedVocab")
      .flatMap(t => wpSymbols(t._1, contPrefix))
      .distinct.sortWith(Bpe.cpLess)
    val mergedSurfaces = merges.select("rank", "merged").collect()
      .sortBy(_.getInt(0)).map(_.getString(1))
    // a merged surface equal to the bare prefix (a corpus containing
    // the literal '##' word merges '#'+'###' -> '##') cannot join a
    // greedy vocabulary — its raw form matches the empty string, and
    // importWordPieceModel refuses exactly this surface. Same refusal
    // here so a trained vocab always round-trips through export/import.
    mergedSurfaces.find(_ == contPrefix).foreach(_ =>
      throw new IllegalArgumentException(
        s"trainedVocab: a merge produced a piece equal to the " +
          s"continuation prefix '$contPrefix' (the corpus contains the " +
          "literal prefix as a word) — pre-normalize the text or choose " +
          "a different contPrefix"))
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    seen += unkPiece
    alpha.foreach(seen += _)
    mergedSurfaces.foreach(seen += _)
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      seen.toSeq.zipWithIndex
        .map { case (p, i) => Row(i.toLong, p) }.asJava, vocabSchema)
  }

  /** Read a published `vocab.txt` — ONE PIECE PER LINE, id = line
    * number (the BERT release shape) — into the (piece, piece_id)
    * frame [[importWordPieceModel]] takes. Driver-side and
    * size-guarded ([[Bpe.readSmallTextFile]]): a published vocabulary
    * is model-sized by construction. Lines are pieces VERBATIM (no
    * trimming beyond the line terminator — a leading/trailing space
    * in a piece is meaningful); an empty line refuses at import. */
  def readBertVocab(spark: SparkSession, path: String,
                    maxBytes: Long = 64L << 20): DataFrame = {
    val lines = Bpe.readSmallTextFile(spark, path, maxBytes)
      .split("\n", -1).iterator.map(_.stripSuffix("\r")).toIndexedSeq
    // the file's final newline yields one trailing empty entry — drop
    // exactly that (interior empties stay, and refuse at import)
    val trimmed =
      if (lines.nonEmpty && lines.last.isEmpty) lines.dropRight(1) else lines
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      trimmed.zipWithIndex
        .map { case (p, i) => Row(i.toLong, p) }.asJava,
      vocabSchema)
  }

  /** Import a PRETRAINED WordPiece vocabulary — `vocab` carries
    * (piece: string) and optionally an explicit `piece_id` column (the
    * published id assignment — line order in a vocab.txt; absent, ids
    * are assigned in code-point order of the surface, the [[Unigram
    * .importUnigramModel]] posture). Validation is total and loud:
    * non-empty, unique surfaces, unique ids, the unknown piece
    * present, no empty piece, and no piece equal to the continuation
    * prefix (its raw surface would match the empty string). Lands ONE
    * bucketed table `<name>_wp` plus the stamp LAST (a crashed build
    * refuses to serve). */
  def importWordPieceModel(spark: SparkSession, vocab: DataFrame,
                           name: String, path: String,
                           unkPiece: String = "[UNK]",
                           contPrefix: String = "##",
                           maxInputChars: Int = 200,
                           wordPattern: Option[String] = None,
                           normalize: String = "none",
                           specialPieces: Seq[String] = Nil): Unit = {
    Normalize.validate(normalize, "importWordPieceModel")
    require(contPrefix.nonEmpty,
      "importWordPieceModel: empty continuation prefix")
    require(maxInputChars >= 1,
      s"importWordPieceModel: maxInputChars must be >= 1, got $maxInputChars")
    val hasIds = vocab.columns.contains("piece_id")
    val rows = (if (hasIds)
        vocab.select(col("piece"), col("piece_id").cast("long"))
      else vocab.select(col("piece"), lit(null).cast("long"))).collect()
    require(rows.nonEmpty, "importWordPieceModel: empty vocabulary")
    rows.foreach { r =>
      require(!r.isNullAt(0) && r.getString(0).nonEmpty,
        "importWordPieceModel: null/empty piece surface")
      // a null piece_id would read back as 0 (getLong on null) and
      // silently alias onto id 0 — refuse like the null-surface check
      require(!hasIds || !r.isNullAt(1),
        s"importWordPieceModel: null piece_id for piece " +
          s"'${r.getString(0)}' — a piece_id column must be fully " +
          "populated (drop the column for dense code-point-order ids)")
      require(r.getString(0) != contPrefix,
        s"importWordPieceModel: piece equal to the continuation prefix " +
          s"'$contPrefix' would match the empty string — malformed vocabulary")
    }
    val surfaces = rows.map(_.getString(0))
    require(surfaces.distinct.length == surfaces.length,
      "importWordPieceModel: duplicate piece surfaces")
    val withIds: Seq[(String, Long)] =
      if (hasIds) {
        val ids = rows.map(_.getLong(1))
        require(ids.distinct.length == ids.length,
          "importWordPieceModel: duplicate piece_id values")
        rows.map(r => (r.getString(0), r.getLong(1))).toSeq
      } else
        surfaces.sortWith(Bpe.cpLess).zipWithIndex
          .map { case (p, i) => (p, i.toLong) }.toSeq
    val unkId = withIds.collectFirst { case (p, id) if p == unkPiece => id }
      .getOrElse(throw new IllegalArgumentException(
        s"importWordPieceModel: unknown piece '$unkPiece' is not in the " +
          "vocabulary — the published contract requires it (every " +
          "unmatched word serves as this token)"))
    // DECLARED CONTROL PIECES (the published BERT shape — [PAD]/[CLS]/
    // [SEP]/[MASK] are real vocab.txt rows): their ids ride the stamp
    // as STRUCTURAL ids, so (a) they never enter the greedy matching
    // table — a literal "[SEP]" in text encodes per character/UNK, the
    // published behavior once the basic tokenizer splits brackets —
    // and (b) landings/SFT assembly accept them as eodId/sepId/padId
    // instead of refusing them as vocab collisions ([[Bpe
    // .importBpeModel]]'s specialTokens contract, [[Unigram
    // .importUnigramModel]]'s mirror). [[detokenizeIndexed]] still
    // renders their surfaces. Declaring the unknown piece special is
    // allowed — the kernel emits unkId directly, not via the table.
    val byPiece = withIds.toMap
    val specialIds = specialPieces.distinct.map(sp =>
      byPiece.getOrElse(sp, throw new IllegalArgumentException(
        s"importWordPieceModel: special piece '$sp' is not in the " +
          "vocabulary — a declared control piece must carry a " +
          "published id")))
    require(specialIds.size < withIds.size,
      "importWordPieceModel: every piece is declared special — no " +
        "content vocabulary remains to serve")
    import scala.jdk.CollectionConverters._
    val model = spark.createDataFrame(
      withIds.sortBy(_._2).map { case (p, id) => Row(id, p) }.asJava,
      vocabSchema)
    graft.api.GraftFrame(model)
      .toBucketedTable(s"${name}_wp", s"$path/wp", 1, Seq("piece"))
    stampWpMeta(spark, path, WpMeta(unkId, contPrefix, maxInputChars,
      wordPattern, unkPiece = unkPiece, normalize = normalize,
      specialIds = specialIds))
  }

  /** Build (or wholesale retrain) the persisted model FROM A CORPUS:
    * [[train]] the likelihood merges, derive [[trainedVocab]], land
    * the table, stamp LAST with the full training geometry — a
    * drift-fired retrain ([[Maintain.maintainWordPiece]]) replays
    * exactly it. The import path remains the production default for
    * published models; this is for teams training their own
    * BERT-class vocabulary in-engine. */
  def writeWordPieceModel(corpus: DataFrame, textCol: String,
                          name: String, path: String, numMerges: Int,
                          minPairCount: Long = 2L,
                          maxTypes: Int = 2000000,
                          contPrefix: String = "##",
                          maxInputChars: Int = 200,
                          unkPiece: String = "[UNK]",
                          wordPattern: Option[String] = None,
                          minWordCount: Long = 1L,
                          normalize: String = "none"): Unit = {
    Normalize.validate(normalize, "writeWordPieceModel")
    val spark = corpus.sparkSession
    val nc = Normalize.frame(corpus, textCol, normalize)
    val merges = train(nc, textCol, numMerges, minPairCount,
      maxTypes, contPrefix, wordPattern, minWordCount)
    val vocab = trainedVocab(nc, textCol, merges, contPrefix,
      unkPiece, wordPattern, minWordCount, maxTypes)
    graft.api.GraftFrame(vocab)
      .toBucketedTable(s"${name}_wp", s"$path/wp", 1, Seq("piece"))
    stampWpMeta(spark, path, WpMeta(0L, contPrefix, maxInputChars,
      wordPattern, imported = false, numMerges, minPairCount, maxTypes,
      minWordCount, unkPiece, normalize))
  }

  /** The greedy serving object: (piece, id) — MODEL-sized, embedded
    * in the encode expression. */
  def vocabServing(model: DataFrame): Seq[(String, Long)] =
    model.select("piece", "piece_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Stamp-guarded serving table: stamped special ids partitioned OUT
    * of the greedy matching vocabulary — a literal "[SEP]" in text
    * never matches the control piece (the published semantics); the
    * ids stay structural (landings/SFT accept them) and
    * [[detokenizeIndexed]] keeps the FULL table so they render. */
  private[llm] def vocabServingStamped(spark: SparkSession, name: String,
                                       meta: WpMeta): Seq[(String, Long)] = {
    val sp = meta.specialIds.toSet
    val all = vocabServing(spark.table(s"${name}_wp"))
    if (sp.isEmpty) all else all.filterNot(p => sp.contains(p._2))
  }

  /** Greedy encode: (id, word_pos, tok_pos, token_id) — the
    * [[Bpe.encodeIds]] / [[Unigram.encodeIds]] shape. Unmatched or
    * over-length words emit the single `unkId`. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                vocab: Seq[(String, Long)], unkId: Long,
                contPrefix: String = "##", maxInputChars: Int = 200,
                wordPattern: Option[String] = None): DataFrame =
    docs.select(col(idCol),
        posexplode(Bpe.wordsOf(textCol, wordPattern))
          .as(Seq("word_pos", "__w__")))
      .filter(length(col("__w__")) >= 1)
      .select(col(idCol), col("word_pos"),
        posexplode(TextHashExprs.wordPieceEncodeIds(col("__w__"), vocab,
          unkId, contPrefix, maxInputChars))
          .as(Seq("tok_pos", "token_id")))

  /** Serve [[encodeIds]] from the persisted model (stamp-guarded). */
  def encodeIdsIndexed(spark: SparkSession, name: String, path: String,
                       docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val meta = readWpMeta(spark, path)
    encodeIds(Normalize.frame(docs, textCol, meta.normalize), idCol,
      textCol, vocabServingStamped(spark, name, meta), meta.unkId,
      meta.contPrefix, meta.maxInputChars, meta.wordPattern)
  }

  /** Landed ids back to readable text — the published
    * convert-tokens-to-string convention: pieces join with a space,
    * then the continuation prefix re-attaches (" ##" removed), so a
    * word's pieces concatenate and words separate by ONE space.
    * Inherently lossy (original whitespace is not recorded; UNK words
    * render as the unknown piece) — stated, not hidden. Implemented by
    * re-surfacing each id through a transformed map (initial piece →
    * " "+piece, continuation → raw) on the shared
    * [[graft.functions.BpeDecodeIds]] concat kernel, then trimming the
    * leading space. */
  def detokenizeIndexed(spark: SparkSession, name: String, path: String,
                        ids: Column): Column = {
    val meta = readWpMeta(spark, path)
    // keyed BY ID: keying by the transformed surface collides when a
    // continuation's raw surface starts with a space ('## x' strips to
    // ' x' — initial piece 'x''s key) and silently drops an id
    val inverse: Map[Long, String] =
      vocabServing(spark.table(s"${name}_wp")).map {
        case (p, id) if p.startsWith(meta.contPrefix) =>
          id -> p.substring(meta.contPrefix.length)
        case (p, id) => id -> (" " + p)
      }.toMap
    ltrim(TextHashExprs.subwordDecodeIds(ids, inverse, Map.empty))
  }

  /** Tokenizer fertility / UNK report under an explicit vocabulary —
    * per group: word mass, token mass, UNK-WORD mass (whole words
    * serving as the unknown token — this family's OOV unit), fertility
    * and unk share. One scan-fused pass, group-cardinality output. */
  def fertilityReportWith(docs: DataFrame, textCol: String,
                          groupCol: String, vocab: Seq[(String, Long)],
                          unkId: Long, contPrefix: String = "##",
                          maxInputChars: Int = 200,
                          wordPattern: Option[String] = None): DataFrame = {
    val words = filter(Bpe.wordsOf(textCol, wordPattern),
      w => length(w) >= 1)
    val enc = transform(col("__wd__"), w =>
      TextHashExprs.wordPieceEncodeIds(w, vocab, unkId, contPrefix,
        maxInputChars))
    // words/enc projected once (r16): sibling columns referencing the
    // same extraction/encode expressions re-evaluated them per column
    docs.filter(col(textCol).isNotNull)
      .select(col(groupCol), words.as("__wd__"))
      .select(col(groupCol), col("__wd__"), enc.as("__enc__"))
      .select(col(groupCol),
        size(col("__wd__")).cast("long").as("__w__"),
        size(flatten(col("__enc__"))).cast("long").as("__t__"),
        size(filter(col("__enc__"), a =>
          size(a) === 1 && a.getItem(0) === unkId))
          .cast("long").as("__u__"))
      .groupBy(col(groupCol))
      .agg(sum(col("__w__")).as("n_words"),
        sum(col("__t__")).as("n_tokens"),
        sum(col("__u__")).as("n_unk_words"))
      .select(col(groupCol),
        col("n_words"), col("n_tokens"), col("n_unk_words"),
        when(col("n_words") === 0L, lit(null))
          .otherwise(col("n_tokens").cast("double") / col("n_words"))
          .as("fertility"),
        when(col("n_words") === 0L, lit(null))
          .otherwise(col("n_unk_words").cast("double") / col("n_words"))
          .as("unk_rate"))
  }

  /** [[fertilityReportWith]] from the persisted model. */
  def fertilityReport(spark: SparkSession, name: String, path: String,
                      docs: DataFrame, textCol: String,
                      groupCol: String): DataFrame = {
    val meta = readWpMeta(spark, path)
    fertilityReportWith(Normalize.frame(docs, textCol, meta.normalize),
      textCol, groupCol,
      vocabServingStamped(spark, name, meta), meta.unkId,
      meta.contPrefix, meta.maxInputChars, meta.wordPattern)
  }

  /** UNK-word drift of a fresh corpus slice against the stored
    * vocabulary — the [[Bpe.bpeOovRate]] observable for this family
    * (share of WORDS serving as the unknown token: the vocabulary is
    * closed, so a corpus drifting toward unseen scripts or new
    * morphology surfaces here first). */
  def wpUnkRate(spark: SparkSession, name: String, path: String,
                fresh: DataFrame, textCol: String): Double = {
    val meta = readWpMeta(spark, path)
    val row = fertilityReportWith(
        Normalize.frame(fresh.select(lit(0L).as("__g__"), col(textCol)),
          textCol, meta.normalize), textCol, "__g__",
        vocabServingStamped(spark, name, meta), meta.unkId,
        meta.contPrefix, meta.maxInputChars, meta.wordPattern)
      .agg(sum(col("n_words")).as("w"), sum(col("n_unk_words")).as("u"))
      .head()
    if (row.isNullAt(0) || row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  private def checkReserved(vocab: Seq[(String, Long)], unkId: Long,
                            eodId: Option[Long], padId: Option[Long],
                            what: String): Unit = {
    eodId.foreach(e => require(!vocab.exists(_._2 == e),
      s"$what: eodId $e collides with a vocabulary id (the unknown id " +
        s"$unkId included) — reserve an id outside the vocabulary"))
    padId.foreach { p =>
      require(!vocab.exists(_._2 == p) && !eodId.contains(p),
        s"$what: padId $p collides with a vocabulary id or the eodId — " +
          "reserve a distinct id outside the vocabulary")
    }
  }

  /** GPT-style concat-and-chop training windows in WordPiece TOKEN-ID
    * space — the shared [[Bpe.assembleWindowsIdsFrom]] body with the
    * greedy encode expression: the id stream materializes inside the
    * scan, then the two-pass cumsum + ONE window-keyed shuffle. */
  def assembleWindowsIds(docs: DataFrame, idCol: String, textCol: String,
                         windowSize: Long, seed: Long,
                         vocab: Seq[(String, Long)], unkId: Long,
                         contPrefix: String = "##",
                         maxInputChars: Int = 200,
                         eodId: Option[Long] = None,
                         withDocSpans: Boolean = false,
                         wordPattern: Option[String] = None,
                         groupCols: Seq[String] = Nil): DataFrame = {
    checkReserved(vocab, unkId, eodId, None, "assembleWindowsIds")
    Bpe.assembleWindowsIdsFrom(docs, idCol, textCol, windowSize, seed,
      w => TextHashExprs.wordPieceEncodeIds(w, vocab, unkId, contPrefix,
        maxInputChars),
      eodId, withDocSpans, wordPattern, groupCols)
  }

  /** SLIDING-window (eval-layout) variant. */
  def assembleWindowsIdsStrided(docs: DataFrame, idCol: String,
                                textCol: String, windowSize: Long,
                                stride: Long, seed: Long,
                                vocab: Seq[(String, Long)], unkId: Long,
                                contPrefix: String = "##",
                                maxInputChars: Int = 200,
                                eodId: Option[Long] = None,
                                wordPattern: Option[String] = None,
                                groupCols: Seq[String] = Nil): DataFrame = {
    checkReserved(vocab, unkId, eodId, None, "assembleWindowsIdsStrided")
    Bpe.assembleWindowsIdsStridedFrom(docs, idCol, textCol, windowSize,
      stride, seed,
      w => TextHashExprs.wordPieceEncodeIds(w, vocab, unkId, contPrefix,
        maxInputChars),
      eodId, wordPattern, groupCols)
  }

  /** Doc-aware PACKED variant. */
  def assembleWindowsIdsPacked(docs: DataFrame, idCol: String,
                               textCol: String, windowSize: Long,
                               seed: Long,
                               vocab: Seq[(String, Long)], unkId: Long,
                               contPrefix: String = "##",
                               maxInputChars: Int = 200,
                               eodId: Option[Long] = None,
                               padId: Option[Long] = None,
                               withDocSpans: Boolean = false,
                               wordPattern: Option[String] = None,
                               segmentDocs: Int = 512,
                               persisted: Option[scala.collection.mutable.Buffer[DataFrame]] = None,
                               groupCols: Seq[String] = Nil): DataFrame = {
    checkReserved(vocab, unkId, eodId, padId, "assembleWindowsIdsPacked")
    Bpe.assembleWindowsIdsPackedFrom(docs, idCol, textCol, windowSize,
      seed, w => TextHashExprs.wordPieceEncodeIds(w, vocab, unkId,
        contPrefix, maxInputChars),
      eodId, padId, withDocSpans, wordPattern, segmentDocs, persisted,
      groupCols)
  }

  /** Rewrite the vocabulary table to one file per bucket. */
  def compactWordPiece(spark: SparkSession, name: String): Unit =
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_wp")

  /** Maintenance observable: rows + parquet file count. */
  def wpReport(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_wp")
      .select(input_file_name().as("__f__"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("__f__")).as("files"))
      .select(lit(s"${name}_wp").as("table"), col("rows"), col("files"))
}
