package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHashExprs

/** UNIGRAM-LM subword tokenizer (Kudo 2018 — the SentencePiece unigram
  * algorithm; the tokenizer family of T5/ALBERT/XLNet-class models and
  * the `model_type=unigram` default of the public SentencePiece
  * release): a vocabulary of PIECES with log-probabilities, trained by
  * EM over the segmentation lattice and pruned top-down from a large
  * seed — the second tokenizer family beside [[Bpe]] (bottom-up
  * merges). A production corpus team picks per model family; the
  * engine must serve both.
  *
  * Scale posture — strictly STRONGER than BPE's: training never
  * collects the corpus-dependent type table. The corpus-sized work is
  * ONE word-count shuffle ([[Bpe.wordCounts]], map-side combined);
  * every EM iteration is then a distributed pass over the word-TYPE
  * table (a native lattice expression per row — no joins, no extra
  * exchanges) whose only driver-side product is the PIECE table,
  * bounded by `seedSize` by construction. BPE's driver-side merge loop
  * needs the full type table on one machine ([[Bpe.train]]'s maxTypes
  * refusal); unigram EM needs only |pieces| driver memory at any
  * corpus size. Seed selection is a TakeOrderedAndProject (per-
  * partition top-K, K = seedSize — bounded driver merge, no global
  * sort).
  *
  * Determinism contract: the persisted model carries `logp_micro =
  * round(logp · 1e6)` as a BIGINT, and Viterbi segmentation runs on
  * those integers ([[graft.functions.UnigramKernel]]) — the argmax is
  * an exact integer comparison, bit-reproducible on any engine and
  * replayable in DuckDB by path enumeration with zero float tolerance
  * (ties: fewer pieces, then piece-length sequence lexicographically
  * largest). EM expected counts aggregate through DECIMAL (order-
  * independent sums), so training itself is run-deterministic.
  * Serving OOV: a code point with no vocabulary cover emits id -1
  * (the [[Bpe.encodeIds]] convention) at [[graft.functions
  * .UnigramKernel.OovMicro]] per code point.
  */
object Unigram {

  /** Model-table schema: (piece_id, piece, prob, logp, logp_micro).
    * Ids are assigned in code-point order of the piece surface —
    * SQL-recomputable, stable under retrains of identical data. */
  val piecesSchema: StructType = StructType(Seq(
    StructField("piece_id", LongType, nullable = false),
    StructField("piece", StringType, nullable = false),
    StructField("prob", DoubleType, nullable = false),
    StructField("logp", DoubleType, nullable = false),
    StructField("logp_micro", LongType, nullable = false)))

  /** Distributed SEED-candidate counts: every substring (1 ..
    * maxPieceLen code points) of every word type, weighted by type
    * frequency — the statistic seed selection ranks. Exposed as its
    * own operator so the driver gate can value-check it (exact string
    * + integer arithmetic, engine-portable). */
  def seedCandidates(corpus: DataFrame, textCol: String,
                     maxPieceLen: Int,
                     wordPattern: Option[String] = None,
                     minWordCount: Long = 1L): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    val types = Bpe.wordCounts(corpus, textCol, wordPattern)
      .filter(col("cnt") >= minWordCount)
    types.select(col("cnt"), explode(flatten(
        transform(sequence(lit(1), length(col("word"))), i =>
          transform(sequence(lit(1),
              least(lit(maxPieceLen), length(col("word")) - i + 1)), l =>
            substring(col("word"), i, l))))).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("seed_count"))
  }

  /** The EM E-step as a frame — per (word, piece): the lattice
    * occupancy NUMERATOR and the word's total segmentation weight `z`
    * (posterior = numer / z), under an explicit (piece, id, prob)
    * model. The division stays out so the oracle can compare exact
    * dyadic numerators (q_unigram_em fixes a dyadic-prob model, under
    * which every double here is exact and the DuckDB path-enumeration
    * replay matches bit-for-bit). One native lattice pass per word;
    * words the vocabulary cannot cover (z = 0) surface with an empty
    * parts array rather than vanishing. */
  def eStepFrame(words: DataFrame, wordCol: String,
                 pieces: Seq[(String, Long, Double)]): DataFrame =
    words.select(col(wordCol).as("word"),
        TextHashExprs.unigramExpected(col(wordCol), pieces).as("__ex__"))
      .select(col("word"), col("__ex__.z").as("z"),
        col("__ex__.parts").as("parts"))

  /** One EM iteration over the word-type table: expected piece counts
    * (posterior-weighted, frequency-scaled) aggregated through
    * DECIMAL(38,15) — order-independent, so training is
    * run-deterministic — then the M-step renormalization. Returns the
    * re-estimated (piece, prob) alongside each piece's expected count
    * (the prune statistic). Pieces with zero lattice occupancy keep a
    * floor probability if single-code-point (alphabet coverage must
    * never drop) and are listed with exp 0 otherwise. */
  private def emStep(types: DataFrame,
                     pieces: IndexedSeq[(String, Double)])
    : IndexedSeq[(String, Double, java.math.BigDecimal)] = {
    val modeled = pieces.zipWithIndex
      .map { case ((p, pr), i) => (p, i.toLong, pr) }
    val rows = types.select(col("cnt"),
        TextHashExprs.unigramExpected(col("word"), modeled).as("ex"))
      .filter(col("ex.z") > 0.0)
      .select(col("cnt"), col("ex.z").as("z"),
        explode(col("ex.parts")).as("pt"))
      .select(col("pt.pid").as("pid"),
        (col("pt.numer") / col("z") * col("cnt"))
          .cast(DecimalType(38, 15)).as("e"))
      .groupBy("pid").agg(sum(col("e")).as("e"))
      .collect()
    val exp = new Array[java.math.BigDecimal](pieces.length)
    java.util.Arrays.fill(exp.asInstanceOf[Array[AnyRef]],
      java.math.BigDecimal.ZERO)
    rows.foreach { r =>
      exp(r.getLong(0).toInt) = r.getDecimal(1)
    }
    val total = exp.foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    val totalD = total.doubleValue()
    require(totalD > 0.0,
      "unigram emStep: zero total lattice mass — the piece set covers " +
        "no word in the type table")
    pieces.indices.map { i =>
      val e = exp(i)
      val p = e.doubleValue() / totalD
      // alphabet floor: a single-code-point piece must stay encodable
      // even if EM starves it (coverage is structural, not statistical)
      val floored =
        if (p == 0.0 && pieces(i)._1.codePointCount(0, pieces(i)._1.length) == 1)
          1e-12
        else p
      (pieces(i)._1, floored, e)
    }
  }

  /** Train a unigram-LM piece table. `vocabSize` counts ALL pieces
    * (single code points included); `seedSize` bounds the initial
    * candidate set (default 8× vocabSize) — every single-code-point
    * substring is always seeded and never pruned (total coverage of
    * the training alphabet), multi-code-point candidates enter by
    * frequency rank. Each round runs `emIters` EM sweeps then prunes
    * the lowest-expected-count multi-piece tail to
    * max(vocabSize, shrinkFactor · size); after the size reaches
    * vocabSize a final `emIters` polish re-estimates probabilities.
    * Pruning by expected count is the standard approximation of the
    * published loss-delta prune (the alternative-segmentation term is
    * dropped); documented, not hidden.
    *
    * Returns [[piecesSchema]]: ids in code-point order, probs
    * renormalized, logp_micro the fixed-point Viterbi surface. */
  def train(corpus: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 4,
            seedSize: Int = 0,
            emIters: Int = 2,
            shrinkFactor: Double = 0.75,
            wordPattern: Option[String] = None,
            minWordCount: Long = 1L): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    require(emIters >= 1, "emIters must be >= 1")
    require(shrinkFactor > 0.0 && shrinkFactor < 1.0,
      s"shrinkFactor must be in (0,1), got $shrinkFactor")
    val spark = corpus.sparkSession
    val seedK = if (seedSize > 0) seedSize else 8 * vocabSize
    val types = Bpe.wordCounts(corpus, textCol, wordPattern)
      .filter(col("cnt") >= minWordCount)
      .cache()
    try {
      val cands = seedCandidates(corpus, textCol, maxPieceLen,
        wordPattern, minWordCount)
      // singles: the complete training alphabet (bounded by the
      // corpus's distinct code points); multis: frequency-ranked
      val singles = cands.filter(length(col("piece")) === 1)
        .select("piece", "seed_count").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      val nMulti = math.max(0, seedK - singles.length)
      val multis = cands.filter(length(col("piece")) > 1)
        .orderBy(col("seed_count").desc, col("piece").asc)
        .limit(nMulti)
        .select("piece", "seed_count").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      require(singles.nonEmpty,
        "unigram train: empty corpus (no word types survive " +
          s"minWordCount=$minWordCount)")
      val seedTotal = (singles.iterator ++ multis.iterator)
        .map(_._2).sum.toDouble
      var pieces: IndexedSeq[(String, Double)] =
        (singles ++ multis).toIndexedSeq
          .map { case (p, c) => (p, c.toDouble / seedTotal) }

      var done = pieces.length <= vocabSize
      var rounds = 0
      while (!done) {
        rounds += 1
        require(rounds <= 1000,
          "unigram train: 1000 prune rounds without reaching " +
            s"vocabSize=$vocabSize — shrinkFactor=$shrinkFactor cannot " +
            "make progress (multi-piece candidates exhausted?)")
        var est: IndexedSeq[(String, Double, java.math.BigDecimal)] = null
        var it = 0
        while (it < emIters) {
          est = emStep(types, pieces)
          pieces = est.map(e => (e._1, e._2))
          it += 1
        }
        val target = math.max(vocabSize,
          (pieces.length * shrinkFactor).toInt)
        val (sgl, mul) = est.partition(
          e => e._1.codePointCount(0, e._1.length) == 1)
        if (pieces.length <= vocabSize || mul.isEmpty) done = true
        else {
          // prune the lowest-expected-count multis (ties: code-point-
          // LARGER surface drops first — deterministic)
          val keepMulti = math.max(0, target - sgl.length)
          val kept = mul.sortWith { (a, b) =>
            val c = a._3.compareTo(b._3)
            if (c != 0) c > 0 else Bpe.cpLess(a._1, b._1)
          }.take(keepMulti)
          pieces = (sgl ++ kept).map(e => (e._1, e._2))
          if (pieces.length <= vocabSize) done = true
        }
      }
      // final polish at the landed size
      var it = 0
      while (it < emIters) {
        pieces = emStep(types, pieces).map(e => (e._1, e._2))
        it += 1
      }
      val norm = pieces.map(_._2).sum
      val ordered = pieces.sortWith((a, b) => Bpe.cpLess(a._1, b._1))
      import scala.jdk.CollectionConverters._
      val out = ordered.zipWithIndex.map { case ((p, pr), i) =>
        val prob = pr / norm
        val logp = math.log(prob)
        org.apache.spark.sql.Row(
          i.toLong, p, prob, logp, math.round(logp * 1e6))
      }
      spark.createDataFrame(out.asJava, piecesSchema)
    } finally types.unpersist()
  }

  // ------------------------------------------------------------------
  // Persisted unigram model — one bucketed table `<name>_uni` plus a
  // stamp landing LAST (the [[Bpe]] lifecycle posture: the model is an
  // aggregate of the training corpus; the one corrective action is a
  // wholesale retrain, and the stamp carries the full training
  // geometry so a drift-fired retrain replays it).

  private def uniMetaFile(path: String) = s"$path/_graft_uni_meta.json"

  /** The persisted model's stamp. `wordPattern` decides the
    * encode/detokenize contract exactly as in [[Bpe.BpeMeta]]. */
  final case class UniMeta(vocabSize: Int, maxPieceLen: Int,
                           seedSize: Int, emIters: Int,
                           shrinkFactor: Double,
                           wordPattern: Option[String],
                           minWordCount: Long = 1L,
                           imported: Boolean = false,
                           byteFallback: Boolean = false,
                           normalize: String = "none",
                           metaspace: Boolean = false,
                           specialIds: Seq[Long] = Nil)

  /** The METASPACE pre-tokenization of the published SentencePiece
    * family (the T5/LLaMA-class convention): every space becomes
    * U+2581 `▁` and one `▁` is prepended, then words are the
    * `▁`-initiated runs — so each word CARRIES its leading-space
    * marker and published `▁`-prefixed piece surfaces match verbatim
    * (the GPT-2 leading-space idea, with a visible character instead
    * of the byte alias). Runs of spaces yield lone-`▁` words, exactly
    * the published behavior. Stamped (`metaspace = true`) so every
    * serve re-applies the transform; composes AFTER the stamped
    * normalizer, like the published pipeline order. */
  val MetaspacePattern: String = "▁[^▁]*"

  /** The metaspace text transform as a column map — shared by frame
    * wraps and the windows-landing/report column paths. EMPTY text
    * stays empty (SentencePiece encodes "" to [] — the prefix marker
    * belongs to content, so an empty prompt must contribute ZERO ids
    * to an SFT assembly, not a lone ▁). */
  private[llm] def metaspaceCol(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(length(text) === 0, text)
      .otherwise(concat(lit("▁"), regexp_replace(text, " ", "▁")))

  private[llm] def metaspaceFrame(docs: DataFrame,
                                  textCol: String): DataFrame =
    docs.withColumn(textCol, metaspaceCol(col(textCol)))

  /** The serving-side (docs, wordPattern) prep under a stamp: the
    * normalizer wrap, then metaspace when stamped (which also fixes
    * the word pattern — the two travel together). */
  private def prepServe(docs: DataFrame, textCol: String,
                        meta: UniMeta): (DataFrame, Option[String]) = {
    val n = Normalize.frame(docs, textCol, meta.normalize)
    if (meta.metaspace) (metaspaceFrame(n, textCol), Some(MetaspacePattern))
    else (n, meta.wordPattern)
  }

  /** The 256 reserved byte-piece surfaces of the published
    * SentencePiece `byte_fallback` convention: `<0x00>`..`<0xFF>`.
    * These are STRUCTURAL pieces — they never enter the Viterbi
    * lattice (a literal "<0x41>" in text must not match one) and carry
    * the uncovered code points' raw UTF-8 bytes instead, making the id
    * stream lossless on any script (the LLaMA-class tokenizer shape). */
  val ByteFallbackSurfaces: IndexedSeq[String] =
    (0 until 256).map(b => f"<0x$b%02X>")

  private val byteSurfaceSet = ByteFallbackSurfaces.toSet
  private def isByteSurface(s: String): Boolean = byteSurfaceSet.contains(s)

  private def stampUniMeta(spark: SparkSession, path: String,
                           meta: UniMeta): Unit = {
    val p = new org.apache.hadoop.fs.Path(uniMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    val wp = meta.wordPattern.fold("")(pat =>
      s""","word_pattern":"${Bpe.jsonEscStamp(pat, "stampUniMeta: wordPattern")}\"""")
    val sp =
      if (meta.specialIds.isEmpty) ""
      else s""","special_ids":[${meta.specialIds.mkString(",")}]"""
    try os.write(
      s"""{"vocab_size":${meta.vocabSize},"max_piece_len":${meta.maxPieceLen},"seed_size":${meta.seedSize},"em_iters":${meta.emIters},"shrink_factor":${meta.shrinkFactor},"min_word_count":${meta.minWordCount},"imported":${meta.imported},"byte_fallback":${meta.byteFallback},"normalize":"${meta.normalize}","metaspace":${meta.metaspace}$sp$wp}\n"""
        .getBytes("UTF-8"))
    finally os.close()
  }

  private[graft] def readUniMeta(spark: SparkSession,
                                 path: String): UniMeta = {
    val p = new org.apache.hadoop.fs.Path(uniMetaFile(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no unigram stamp at ${uniMetaFile(path)} — build with " +
        "writeUnigramModel first")
    val in = fs.open(p)
    val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    def long(k: String): Option[Long] =
      (s""""$k"\\s*:\\s*(\\d+)""").r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
    val sf = """"shrink_factor"\s*:\s*([0-9.eE+-]+)""".r
      .findFirstMatchIn(txt).map(_.group(1).toDouble)
    val wp = """"word_pattern"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(txt)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    val imp = """"imported"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
      .exists(_.group(1) == "true")
    val bf = """"byte_fallback"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
      .exists(_.group(1) == "true")
    (long("vocab_size"), long("max_piece_len"), long("seed_size"),
      long("em_iters"), sf) match {
      case (Some(v), Some(m), Some(s), Some(e), Some(f)) =>
        UniMeta(v.toInt, m.toInt, s.toInt, e.toInt, f, wp,
          long("min_word_count").getOrElse(1L), imp, bf,
          """"normalize"\s*:\s*"([a-z_]+)"""".r.findFirstMatchIn(txt)
            .map(_.group(1)).getOrElse("none"), // pre-r16: unnormalized
          """"metaspace"\s*:\s*(true|false)""".r.findFirstMatchIn(txt)
            .exists(_.group(1) == "true"),
          """"special_ids"\s*:\s*\[([0-9,\s-]*)\]""".r
            .findFirstMatchIn(txt)
            .map(_.group(1).split(",").map(_.trim).filter(_.nonEmpty)
              .map(_.toLong).toSeq)
            .getOrElse(Nil))
      case _ => throw new IllegalStateException(
        s"malformed unigram stamp at ${uniMetaFile(path)}: $txt")
    }
  }

  /** Build (or wholesale retrain) the persisted model: train, land
    * the piece table, stamp last. `byteFallback = true` appends the
    * 256 reserved [[ByteFallbackSurfaces]] AFTER the trained pieces
    * (ids vocabSize'..vocabSize'+255 in byte order, floor probability
    * — they never enter the lattice, so content segmentation is
    * unchanged) and stamps the mode; every serve then emits uncovered
    * code points as their UTF-8 byte ids instead of -1. */
  def writeUnigramModel(corpus: DataFrame, textCol: String, name: String,
                        path: String, vocabSize: Int,
                        maxPieceLen: Int = 4,
                        seedSize: Int = 0,
                        emIters: Int = 2,
                        shrinkFactor: Double = 0.75,
                        wordPattern: Option[String] = None,
                        minWordCount: Long = 1L,
                        byteFallback: Boolean = false,
                        normalize: String = "none",
                        metaspace: Boolean = false): Unit = {
    Normalize.validate(normalize, "writeUnigramModel")
    require(!(metaspace && wordPattern.isDefined),
      "writeUnigramModel: metaspace fixes the word pattern to the " +
        s"'$MetaspacePattern' runs — an explicit wordPattern cannot " +
        "compose with it")
    val spark = corpus.sparkSession
    val nc0 = Normalize.frame(corpus, textCol, normalize)
    val nc = if (metaspace) metaspaceFrame(nc0, textCol) else nc0
    val wpEff = if (metaspace) Some(MetaspacePattern) else wordPattern
    val trained = train(nc,
      textCol, vocabSize, maxPieceLen, seedSize,
      emIters, shrinkFactor, wpEff, minWordCount)
    val model = if (!byteFallback) trained else {
      val rows = trained.collect()
      rows.foreach(r => require(!isByteSurface(r.getString(1)),
        s"writeUnigramModel: trained piece '${r.getString(1)}' collides " +
          "with a reserved byte-fallback surface — lower maxPieceLen or " +
          "pre-normalize the text"))
      val base = rows.length.toLong
      val lp = math.log(1e-12)
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(
        (rows.toSeq ++ ByteFallbackSurfaces.zipWithIndex.map { case (s, b) =>
          org.apache.spark.sql.Row(base + b, s, 1e-12, lp,
            math.round(lp * 1e6))
        }).asJava, piecesSchema)
    }
    graft.api.GraftFrame(model)
      .toBucketedTable(s"${name}_uni", s"$path/uni", 1, Seq("piece"))
    stampUniMeta(spark, path, UniMeta(vocabSize, maxPieceLen,
      if (seedSize > 0) seedSize else 8 * vocabSize, emIters,
      shrinkFactor, wordPattern, minWordCount,
      byteFallback = byteFallback, normalize = normalize,
      metaspace = metaspace))
  }

  /** Import a PRETRAINED unigram model from a published (piece,
    * log-prob) pair — the SentencePiece model shape every
    * T5/ALBERT-class release ships — instead of training: the most
    * common production case (teams tokenize under the EXACT tokenizer
    * their model was trained with). `pieces` carries (piece: string,
    * logp: double) and optionally an explicit `piece_id` column (the
    * published id assignment — row order in a SentencePiece file);
    * absent, ids are assigned in code-point order. Validation is total
    * and loud: non-empty, unique surfaces, unique ids, finite
    * non-positive logp, and every fixed-point logp_micro above the OOV
    * floor (an in-vocab piece must never lose to the fallback).
    *
    * Imported models are RETRAIN-INELIGIBLE: there is no training
    * corpus to replay, so maintenance may indicate OOV drift but never
    * auto-fire ([[graft.llm.Maintain]] — the importBpeModel posture).
    * The piece table is bounded (model-sized); the one collect here is
    * the same bounded read every serve performs. */
  def importUnigramModel(spark: SparkSession, pieces: DataFrame,
                         name: String, path: String,
                         wordPattern: Option[String] = None,
                         normalize: String = "none",
                         metaspace: Boolean = false,
                         specialPieces: Seq[String] = Nil): Unit = {
    Normalize.validate(normalize, "importUnigramModel")
    require(!(metaspace && wordPattern.isDefined),
      "importUnigramModel: metaspace fixes the word pattern to the " +
        s"'$MetaspacePattern' runs — an explicit wordPattern cannot " +
        "compose with it")
    val hasIds = pieces.columns.contains("piece_id")
    val rows = (if (hasIds)
        pieces.select(col("piece"), col("logp").cast("double"),
          col("piece_id").cast("long"))
      else pieces.select(col("piece"), col("logp").cast("double"),
        lit(null).cast("long"))).collect()
    require(rows.nonEmpty, "importUnigramModel: empty piece table")
    rows.foreach { r =>
      require(!r.isNullAt(0) && r.getString(0).nonEmpty,
        "importUnigramModel: null/empty piece surface")
      val lp = r.getDouble(1)
      require(!lp.isNaN && !lp.isInfinite && lp <= 0.0,
        s"importUnigramModel: piece '${r.getString(0)}' has invalid " +
          s"logp $lp — published unigram scores are finite log-probs <= 0")
      require(math.round(lp * 1e6) > graft.functions.UnigramKernel.OovMicro,
        s"importUnigramModel: piece '${r.getString(0)}' logp $lp is at " +
          "or below the OOV floor (-100 nats) — it could lose to the " +
          "fallback; such a piece cannot come from a real model")
    }
    val surfaces = rows.map(_.getString(0))
    require(surfaces.distinct.length == surfaces.length,
      "importUnigramModel: duplicate piece surfaces")
    val withIds: Seq[(String, Double, Long)] =
      if (hasIds) {
        val ids = rows.map(_.getLong(2))
        require(ids.distinct.length == ids.length,
          "importUnigramModel: duplicate piece_id values")
        rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
      } else {
        rows.map(r => (r.getString(0), r.getDouble(1)))
          .sortWith((a, b) => Bpe.cpLess(a._1, b._1))
          .zipWithIndex.map { case ((p, lp), i) => (p, lp, i.toLong) }.toSeq
      }
    // DECLARED CONTROL PIECES (the published SentencePiece shape —
    // <pad>/</s>/<unk> carry real ids, often logp 0): their ids ride
    // the stamp as STRUCTURAL ids, so (a) they never enter the Viterbi
    // lattice — a literal "<pad>" in text encodes per character, the
    // published semantics — and (b) landings/SFT assembly accept them
    // as eodId/sepId/padId instead of refusing them as vocab
    // collisions ([[Bpe.importBpeModel]]'s specialTokens contract).
    // Detokenization still renders their surfaces.
    val byPiece = withIds.map(p => p._1 -> p._3).toMap
    val specialIds = specialPieces.distinct.map(sp =>
      byPiece.getOrElse(sp, throw new IllegalArgumentException(
        s"importUnigramModel: special piece '$sp' is not in the piece " +
          "table — a declared control piece must carry a published id")))
    val specialSet = specialIds.toSet
    require(specialSet.size < withIds.size,
      "importUnigramModel: every piece is declared special — no " +
        "content vocabulary remains to serve")
    val maxLen = withIds.iterator
      .filterNot(p => specialSet.contains(p._3))
      .map(p => p._1.codePointCount(0, p._1.length)).max
    import scala.jdk.CollectionConverters._
    val model = spark.createDataFrame(
      withIds.sortBy(_._3).map { case (p, lp, id) =>
        org.apache.spark.sql.Row(id, p, math.exp(lp), lp,
          math.round(lp * 1e6))
      }.asJava, piecesSchema)
    graft.api.GraftFrame(model)
      .toBucketedTable(s"${name}_uni", s"$path/uni", 1, Seq("piece"))
    // a published pair shipping ALL 256 reserved byte surfaces IS a
    // byte_fallback model (the LLaMA-class shape) — detect and stamp,
    // so serving routes uncovered code points to the byte ids
    val bf = ByteFallbackSurfaces.forall(s => surfaces.contains(s))
    stampUniMeta(spark, path, UniMeta(withIds.length, maxLen,
      seedSize = 0, emIters = 0, shrinkFactor = 0.5, wordPattern,
      minWordCount = 1L, imported = true, byteFallback = bf,
      normalize = normalize, metaspace = metaspace,
      specialIds = specialIds))
  }

  /** Read a published SentencePiece VOCABULARY TSV — the
    * `spm_export_vocab` exchange shape every SentencePiece release can
    * emit: one `piece<TAB>logp` line per piece, id = line number —
    * into the (piece, logp, piece_id) frame [[importUnigramModel]]
    * takes. Driver-side and size-guarded ([[Bpe.readSmallTextFile]]:
    * a published vocabulary is model-sized). Pieces are taken
    * VERBATIM up to the LAST tab on the line (a tab inside a piece
    * surface cannot round-trip this format and refuses loudly). */
  def readSentencePieceTsv(spark: SparkSession, path: String,
                           maxBytes: Long = 64L << 20): DataFrame = {
    val lines = Bpe.readSmallTextFile(spark, path, maxBytes)
      .split("\n", -1).iterator.map(_.stripSuffix("\r")).toIndexedSeq
    val trimmed =
      if (lines.nonEmpty && lines.last.isEmpty) lines.dropRight(1) else lines
    val rows = trimmed.zipWithIndex.map { case (l, i) =>
      val cut = l.lastIndexOf('\t')
      require(cut > 0,
        s"readSentencePieceTsv: line ${i + 1} ('$l') is not 'piece<TAB>logp'")
      val piece = l.substring(0, cut)
      require(piece.indexOf('\t') < 0,
        s"readSentencePieceTsv: line ${i + 1} piece contains a TAB — " +
          "this surface cannot round-trip the TSV format")
      val lp = try l.substring(cut + 1).toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"readSentencePieceTsv: line ${i + 1} score " +
            s"'${l.substring(cut + 1)}' is not a number")
      }
      org.apache.spark.sql.Row(piece, lp, i.toLong)
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("logp", DoubleType, nullable = false),
      StructField("piece_id", LongType, nullable = false))))
  }

  /** The Viterbi serving objects: (piece, id, logp_micro) — MODEL-
    * sized, embedded in the encode expressions. */
  def piecesViterbi(model: DataFrame): Seq[(String, Long, Long)] =
    model.select("piece", "piece_id", "logp_micro").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** The stamp-aware serving pair: the CONTENT pieces that enter the
    * lattice, plus (for a byte_fallback model) the 256 byte-piece ids
    * in byte order — the reserved surfaces are structural and must
    * never match literal text, so they are partitioned out here, once,
    * for every serve. */
  def servingViterbi(spark: SparkSession, name: String, path: String)
    : (Seq[(String, Long, Long)], Option[IndexedSeq[Long]]) =
    servingViterbiWith(spark, name, path, readUniMeta(spark, path))

  /** [[servingViterbi]] under an already-read stamp — every indexed
    * serve reads the stamp exactly once and passes it here. */
  private[llm] def servingViterbiWith(spark: SparkSession, name: String,
                                      path: String, meta: UniMeta)
    : (Seq[(String, Long, Long)], Option[IndexedSeq[Long]]) = {
    // stamped special ids are STRUCTURAL — they never enter the
    // lattice (a literal "<pad>" in text encodes per character, the
    // published semantics); detokenization keeps the full table
    val specials = meta.specialIds.toSet
    val all = piecesViterbi(spark.table(s"${name}_uni"))
      .filterNot(p => specials.contains(p._2))
    if (!meta.byteFallback) (all, None)
    else {
      val (bytes, content) = all.partition(p => isByteSurface(p._1))
      val m = bytes.map(p => p._1 -> p._2).toMap
      val arr = ByteFallbackSurfaces.map(s => m.getOrElse(s,
        throw new IllegalStateException(
          s"byte_fallback stamp at $path but byte piece '$s' is missing " +
            s"from ${name}_uni — corrupted model table")))
      (content, Some(arr))
    }
  }

  /** id → piece map for detokenization (the [[Bpe.vocabMap]] shape —
    * [[graft.functions.BpeDecodeIds]] consumes it directly: unigram
    * pieces are code-point surfaces, so decode is concatenation). */
  def pieceMap(model: DataFrame): Map[String, Long] =
    model.select("piece", "piece_id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  /** Viterbi encode: (id, word_pos, tok_pos, token_id) — the integer
    * token stream, the [[Bpe.encodeIds]] shape. OOV code points carry
    * id -1. */
  def encodeIds(docs: DataFrame, idCol: String, textCol: String,
                pieces: Seq[(String, Long, Long)],
                wordPattern: Option[String] = None,
                byteFallback: Option[IndexedSeq[Long]] = None): DataFrame =
    docs.select(col(idCol),
        posexplode(Bpe.wordsOf(textCol, wordPattern))
          .as(Seq("word_pos", "__w__")))
      .filter(length(col("__w__")) >= 1)
      .select(col(idCol), col("word_pos"),
        posexplode(TextHashExprs.unigramEncodeIds(col("__w__"), pieces,
          byteFallback))
          .as(Seq("tok_pos", "token_id")))

  /** Per-WORD segmentation report: (id, word_pos, word, ids,
    * score_micro, n_pieces) — the oracle surface (integer-exact; the
    * DuckDB replay enumerates paths and must reproduce score and ids
    * bit-for-bit). */
  def segments(docs: DataFrame, idCol: String, textCol: String,
               pieces: Seq[(String, Long, Long)],
               wordPattern: Option[String] = None): DataFrame =
    docs.select(col(idCol),
        posexplode(Bpe.wordsOf(textCol, wordPattern))
          .as(Seq("word_pos", "word")))
      .filter(length(col("word")) >= 1)
      .withColumn("__s__",
        TextHashExprs.unigramSegment(col("word"), pieces))
      .select(col(idCol), col("word_pos"), col("word"),
        col("__s__.ids").as("ids"),
        col("__s__.score_micro").as("score_micro"),
        col("__s__.n_pieces").as("n_pieces"))

  /** Serve [[encodeIds]] from the persisted model. */
  def encodeIdsIndexed(spark: SparkSession, name: String, path: String,
                       docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val meta = readUniMeta(spark, path)
    val (pieces, bytes) = servingViterbiWith(spark, name, path, meta)
    val (prepped, wp) = prepServe(docs, textCol, meta)
    encodeIds(prepped, idCol, textCol, pieces, wp, bytes)
  }

  /** Landed ids back to the surface string (pieces concatenate; OOV
    * renders U+FFFD — the [[graft.functions.BpeDecodeIds]] contract).
    * Under a byte_fallback stamp, byte ids reassemble as raw UTF-8
    * ([[graft.functions.SubwordDecodeIds]]) so even text the
    * vocabulary never covered reads back EXACTLY. With a
    * GPT-2-pretokenized stamp the result IS the original text. */
  def detokenizeIndexed(spark: SparkSession, name: String, path: String,
                        ids: org.apache.spark.sql.Column)
    : org.apache.spark.sql.Column = {
    val meta = readUniMeta(spark, path)
    val decoded =
      if (!meta.byteFallback)
        TextHashExprs.bpeDecodeIds(ids,
          pieceMap(spark.table(s"${name}_uni")), byteLevel = false)
      else {
        // surfaces from the FULL table (stamped specials must render),
        // byte pieces partitioned out to the byte map
        val all = piecesViterbi(spark.table(s"${name}_uni"))
        val (bytePieces, textPieces) = all.partition(p => isByteSurface(p._1))
        TextHashExprs.subwordDecodeIds(ids,
          textPieces.map(p => p._2 -> p._1).toMap,
          bytePieces.map(p => // "<0xAB>" → 0xAB
            p._2 -> Integer.parseInt(p._1.substring(3, 5), 16)).toMap)
      }
    // under metaspace the pieces carry their leading-space markers —
    // invert the published transform EXACTLY: strip the one prepended
    // ▁, then every remaining ▁ is a space (leading spaces in the
    // original survive as further ▁s, so this is a true inverse on
    // covered text — not an ltrim that would eat them)
    if (meta.metaspace)
      regexp_replace(regexp_replace(decoded, "^▁", ""), "▁", " ")
    else decoded
  }

  /** Tokenizer fertility / OOV report under the unigram model — the
    * same per-group metric as [[Bpe.fertilityReport]] (tokens per
    * word, OOV share), one corpus pass, group-cardinality output. */
  def fertilityReport(spark: SparkSession, name: String, path: String,
                      docs: DataFrame, textCol: String,
                      groupCol: String): DataFrame = {
    val meta = readUniMeta(spark, path)
    val (pieces, bytes) = servingViterbiWith(spark, name, path, meta)
    val (prepped, wp) = prepServe(docs, textCol, meta)
    fertilityReportWith(prepped, textCol, groupCol, pieces, wp, bytes)
  }

  /** [[fertilityReport]] under an EXPLICIT serving-object model (the
    * [[piecesViterbi]] shape) — the oracle surface: the driver gate
    * value-checks the metric under a literal micro-nat model by
    * enumerating every segmentation path in SQL, with no training
    * replay in the way. The indexed form above delegates here. */
  def fertilityReportWith(docs: DataFrame, textCol: String,
                          groupCol: String,
                          pieces: Seq[(String, Long, Long)],
                          wordPattern: Option[String] = None,
                          byteFallback: Option[IndexedSeq[Long]] = None): DataFrame = {
    val words = filter(Bpe.wordsOf(textCol, wordPattern),
      w => length(w) >= 1)
    // under byte fallback -1 is structurally absent: n_oov counts the
    // byte-fallback tokens instead (the mode's own OOV currency —
    // fertility then prices the byte blow-up of uncovered scripts)
    val ids = flatten(transform(col("__wd__"),
      w => TextHashExprs.unigramEncodeIds(w, pieces, byteFallback)))
    // words/ids projected once (r16): sibling columns referencing the
    // same extraction/encode expressions re-evaluated them per column
    docs.filter(col(textCol).isNotNull)
      .select(col(groupCol), words.as("__wd__"))
      .select(col(groupCol), col("__wd__"), ids.as("__ids__"))
      .select(col(groupCol),
        size(col("__wd__")).cast("long").as("__w__"),
        size(col("__ids__")).cast("long").as("__t__"),
        size(filter(col("__ids__"), i => byteFallback match {
          case None => i < 0L
          case Some(b) => i.isInCollection(b)
        })).cast("long").as("__o__"))
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

  /** GPT-style concat-and-chop training windows in unigram TOKEN-ID
    * space — [[Bpe.assembleWindowsIds]] with the encode expression
    * swapped: the id stream materializes inside the scan (one fused
    * [[graft.functions.UnigramEncodeIds]] per word), then the same
    * two-pass cumsum + ONE window-keyed shuffle. Conservation holds in
    * id space; zero-token docs vanish (the assembleWindows
    * convention). */
  def assembleWindowsIds(docs: DataFrame, idCol: String, textCol: String,
                         windowSize: Long, seed: Long,
                         pieces: Seq[(String, Long, Long)],
                         eodId: Option[Long] = None,
                         withDocSpans: Boolean = false,
                         wordPattern: Option[String] = None,
                         byteFallback: Option[IndexedSeq[Long]] = None,
                         groupCols: Seq[String] = Nil): DataFrame = {
    eodId.foreach(e => require(e != -1L && !pieces.exists(_._2 == e) &&
        !byteFallback.exists(_.contains(e)),
      s"assembleWindowsIds: eodId $e collides with a piece id, a " +
        "byte-fallback id, or the -1 OOV sentinel — reserve an id " +
        "outside the vocabulary"))
    Bpe.assembleWindowsIdsFrom(docs, idCol, textCol, windowSize, seed,
      w => TextHashExprs.unigramEncodeIds(w, pieces, byteFallback),
      eodId, withDocSpans, wordPattern, groupCols)
  }

  /** SLIDING-window (eval-layout) variant — [[Bpe
    * .assembleWindowsIdsStrided]] semantics with the Viterbi encode. */
  def assembleWindowsIdsStrided(docs: DataFrame, idCol: String,
                                textCol: String, windowSize: Long,
                                stride: Long, seed: Long,
                                pieces: Seq[(String, Long, Long)],
                                eodId: Option[Long] = None,
                                wordPattern: Option[String] = None,
                                byteFallback: Option[IndexedSeq[Long]] = None,
                                groupCols: Seq[String] = Nil): DataFrame = {
    eodId.foreach(e => require(e != -1L && !pieces.exists(_._2 == e) &&
        !byteFallback.exists(_.contains(e)),
      s"assembleWindowsIdsStrided: eodId $e collides with a piece id, " +
        "a byte-fallback id, or the -1 OOV sentinel"))
    Bpe.assembleWindowsIdsStridedFrom(docs, idCol, textCol, windowSize,
      stride, seed,
      w => TextHashExprs.unigramEncodeIds(w, pieces, byteFallback),
      eodId, wordPattern, groupCols)
  }

  /** Doc-aware PACKED variant — [[Bpe.assembleWindowsIdsPacked]]
    * semantics with the Viterbi encode. */
  def assembleWindowsIdsPacked(docs: DataFrame, idCol: String,
                               textCol: String, windowSize: Long,
                               seed: Long,
                               pieces: Seq[(String, Long, Long)],
                               eodId: Option[Long] = None,
                               padId: Option[Long] = None,
                               withDocSpans: Boolean = false,
                               wordPattern: Option[String] = None,
                               segmentDocs: Int = 512,
                               byteFallback: Option[IndexedSeq[Long]] = None,
                               persisted: Option[scala.collection.mutable.Buffer[DataFrame]] = None,
                               groupCols: Seq[String] = Nil): DataFrame = {
    eodId.foreach(e => require(e != -1L && !pieces.exists(_._2 == e) &&
        !byteFallback.exists(_.contains(e)),
      s"assembleWindowsIdsPacked: eodId $e collides with a piece id, a " +
        "byte-fallback id, or the -1 OOV sentinel — reserve an id " +
        "outside the vocabulary"))
    padId.foreach(p => require(p != -1L && !pieces.exists(_._2 == p)
        && !eodId.contains(p) && !byteFallback.exists(_.contains(p)),
      s"assembleWindowsIdsPacked: padId $p collides with a piece id, a " +
        "byte-fallback id, the -1 OOV sentinel, or the eodId — reserve " +
        "a distinct id outside the vocabulary"))
    Bpe.assembleWindowsIdsPackedFrom(docs, idCol, textCol, windowSize,
      seed, w => TextHashExprs.unigramEncodeIds(w, pieces, byteFallback),
      eodId, padId, withDocSpans, wordPattern, segmentDocs, persisted,
      groupCols)
  }

  /** Rewrite the piece table to one file per bucket — the
    * fragmentation corrective ([[Bpe.compactBpe]] posture; serving is
    * unchanged, spec-pinned). */
  def compactUnigram(spark: SparkSession, name: String): Unit =
    graft.api.GraftFrame.compactBucketedTable(spark, s"${name}_uni")

  /** Maintenance observable: rows + parquet file count. */
  def uniReport(spark: SparkSession, name: String): DataFrame =
    spark.table(s"${name}_uni")
      .select(input_file_name().as("__f__"))
      .agg(count(lit(1)).as("rows"),
        countDistinct(col("__f__")).as("files"))
      .select(lit(s"${name}_uni").as("table"), col("rows"), col("files"))

  /** OOV drift of a fresh corpus slice against the stored pieces —
    * the [[Bpe.bpeOovRate]] drift observable for this family. Under a
    * byte_fallback stamp -1 is structurally absent, so the observable
    * becomes the BYTE-FALLBACK share of tokens — the same signal (the
    * vocabulary no longer covers what arrives) in the mode's own
    * currency. */
  def uniOovRate(spark: SparkSession, name: String, path: String,
                 fresh: DataFrame, textCol: String): Double = {
    val meta = readUniMeta(spark, path)
    val (pieces, bytes) = servingViterbiWith(spark, name, path, meta)
    val (prepped, wp) = prepServe(
      fresh.select(lit(0L).as("__id__"), col(textCol)), textCol, meta)
    val ids = encodeIds(prepped, "__id__", textCol, pieces, wp, bytes)
    val isOov = bytes match {
      case None => col("token_id") < 0
      case Some(b) => col("token_id").isInCollection(b)
    }
    val row = ids.agg(count(lit(1)).as("total"),
      sum(when(isOov, 1L).otherwise(0L)).as("oov")).head()
    if (row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }
}
