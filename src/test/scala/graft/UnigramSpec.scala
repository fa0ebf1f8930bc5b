package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{TextHashExprs, UnigramKernel}
import graft.llm.{Bpe, Unigram}

/** Unigram-LM tokenizer (Kudo 2018): Viterbi on integer micro-nat
  * log-probs (engine-exact — the driver gate's q_unigram_encode
  * replays it by path enumeration), the EM E-step lattice sums
  * (hand-computed dyadic fixtures — exact doubles, so equality is
  * bitwise not approximate), training determinism and prune behavior,
  * the persisted-model lifecycle, and the token-ID windows landing. */
class UnigramSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // micro-nat model: a -1.0, b -1.5, c -2.5, ab -2.0, bc -2.2, abc -3.2
  private val vit: Seq[(String, Long, Long)] = Seq(
    ("a", 0L, -1000000L), ("ab", 1L, -2000000L), ("abc", 2L, -3200000L),
    ("b", 3L, -1500000L), ("bc", 4L, -2200000L), ("c", 5L, -2500000L))

  private def seg(word: String) = {
    val out = spark.range(1)
      .select(TextHashExprs.unigramSegment(lit(word), vit).as("s"))
      .select(col("s.ids"), col("s.score_micro"), col("s.n_pieces"))
      .head()
    (out.getSeq[Long](0), out.getLong(1), out.getInt(2))
  }

  test("viterbi: score argmax, fewer-pieces tie-break") {
    // abc: [abc] = -3.2 (n=1) ties [a][bc] = -3.2 (n=2) → fewer pieces
    assert(seg("abc") === ((Seq(2L), -3200000L, 1)))
    // ab: [ab] = -2.0 beats [a][b] = -2.5
    assert(seg("ab") === ((Seq(1L), -2000000L, 1)))
    // ba: no multi piece covers → [b][a]
    assert(seg("ba") === ((Seq(3L, 0L), -2500000L, 2)))
    // abcab: [abc][ab] = -5.2 beats [ab][c][ab] = -6.5, [a][bc][ab] -5.4
    assert(seg("abcab") === ((Seq(2L, 1L), -5200000L, 2)))
  }

  test("viterbi: longest-earlier-piece tie-break at equal score and count") {
    // q -2, qq -3, qqq -4: "qqqq" at n=2 → [qqq][q], [qq][qq], [q][qqq]
    // all -6.0; length sequence lex-desc picks [3,1]
    val m = Seq(("q", 0L, -2000000L), ("qq", 1L, -3000000L),
      ("qqq", 2L, -4000000L))
    val out = spark.range(1)
      .select(TextHashExprs.unigramSegment(lit("qqqq"), m).as("s"))
      .select(col("s.ids"), col("s.score_micro")).head()
    assert(out.getSeq[Long](0) === Seq(2L, 0L))
    assert(out.getLong(1) === -6000000L)
  }

  test("viterbi: OOV code points emit -1 at the OOV floor; vocab beats fallback on ties") {
    val m = Seq(("a", 0L, -1000000L), ("b", 1L, -1500000L))
    val out = spark.range(1)
      .select(TextHashExprs.unigramSegment(lit("axb"), m).as("s"))
      .select(col("s.ids"), col("s.score_micro")).head()
    assert(out.getSeq[Long](0) === Seq(0L, -1L, 1L))
    assert(out.getLong(1) ===
      -1000000L + UnigramKernel.OovMicro + -1500000L)
    // a piece at the floor itself is refused loudly (vocab must always
    // beat the fallback)
    val bad = intercept[Exception] {
      spark.range(1).select(TextHashExprs.unigramSegment(lit("a"),
        Seq(("a", 0L, UnigramKernel.OovMicro)))).collect()
    }
    assert(bad.getMessage.contains("OOV floor"))
  }

  test("viterbi: surrogate-safe — non-BMP chars are single code points") {
    val m = Seq(("😀", 7L, -1000000L)) // 😀
    val out = spark.range(1)
      .select(TextHashExprs.unigramSegment(lit("😀😀"), m).as("s"))
      .select(col("s.ids")).head()
    assert(out.getSeq[Long](0) === Seq(7L, 7L))
  }

  test("E-step lattice sums: hand-computed dyadic fixture is exact") {
    // a 0.25, b 0.125, ab 0.5 — all dyadic: every double is exact
    val m = Seq(("a", 0L, 0.25), ("b", 1L, 0.125), ("ab", 2L, 0.5))
    val words = df(StructType(Seq(StructField("w", StringType))),
      Row("ab"), Row("aab"), Row("zz"))
    val out = Unigram.eStepFrame(words, "w", m)
      .select(col("word"), col("z"),
        expr("aggregate(parts, cast(0.0 as double), (s, p) -> s + p.numer)").as("m"),
        size(col("parts")).as("np"))
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getInt(3)))).toMap
    // "ab": paths [a][b] = 0.03125, [ab] = 0.5 → z = 0.53125;
    // numerators a = 0.03125, b = 0.03125, ab = 0.5 (sum 0.5625)
    assert(out("ab") === ((0.53125, 0.5625, 3)))
    // "aab": z = 0.1328125 (hand: f-b above); numer a = 0.140625,
    // b = 0.0078125, ab = 0.125
    assert(out("aab") === ((0.1328125, 0.140625 + 0.0078125 + 0.125, 3)))
    // "zz": vocabulary cannot cover → z = 0, empty parts
    assert(out("zz") === ((0.0, 0.0, 0)))
  }

  test("E-step per-piece numerators match the path-enumeration identity") {
    val m = Seq(("a", 0L, 0.25), ("b", 1L, 0.125), ("ab", 2L, 0.5))
    val words = df(StructType(Seq(StructField("w", StringType))), Row("aab"))
    val parts = Unigram.eStepFrame(words, "w", m)
      .select(explode(col("parts")).as("p"))
      .select(col("p.pid"), col("p.numer"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // paths: [a][a][b] w=0.0078125 (a×2, b×1); [a][ab] w=0.125 (a×1, ab×1)
    assert(parts(0L) === 2 * 0.0078125 + 1 * 0.125) // a
    assert(parts(1L) === 0.0078125)                 // b
    assert(parts(2L) === 0.125)                     // ab
  }

  private def classic = df(docSchema,
    Row(1L, "the cat sat"), Row(2L, "the cat"), Row(3L, "that cat"),
    Row(4L, "the hat"))

  test("train: singles always survive, probs normalize, deterministic under repartition") {
    val m1 = Unigram.train(classic, "text", vocabSize = 20,
      maxPieceLen = 3, seedSize = 40, emIters = 2)
    val m2 = Unigram.train(classic.repartition(7), "text", vocabSize = 20,
      maxPieceLen = 3, seedSize = 40, emIters = 2)
    val rows1 = m1.orderBy("piece_id").collect()
    val rows2 = m2.orderBy("piece_id").collect()
    assert(rows1.toSeq === rows2.toSeq)
    assert(rows1.length <= 20)
    val singles = classic.select(explode(split(col("text"), " ", -1)).as("w"))
      .select(explode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    val pieces = rows1.map(_.getString(1)).toSet
    assert(singles.subsetOf(pieces), s"missing singles: ${singles -- pieces}")
    val probSum = rows1.map(_.getDouble(2)).sum
    assert(math.abs(probSum - 1.0) < 1e-9)
    // ids are code-point-ordered and dense
    assert(rows1.map(_.getString(1)).toSeq ===
      rows1.map(_.getString(1)).toSeq.sorted)
    assert(rows1.map(_.getLong(0)).toSeq === rows1.indices.map(_.toLong))
    // logp_micro is the fixed-point of logp
    rows1.foreach(r =>
      assert(r.getLong(4) === math.round(r.getDouble(3) * 1e6)))
  }

  test("train: prune keeps the highest-occupancy multi pieces") {
    // 'th'/'at'/'ca' style corpus: with vocabSize just above the
    // alphabet, the surviving multis are the high-mass ones
    val singles = classic.select(explode(split(col("text"), " ", -1)).as("w"))
      .select(explode(expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")).as("c"))
      .distinct().count().toInt
    val model = Unigram.train(classic, "text", vocabSize = singles + 2,
      maxPieceLen = 3, seedSize = 60, emIters = 2)
    val multis = model.filter(length(col("piece")) > 1)
      .select("piece").collect().map(_.getString(0)).toSet
    assert(multis.size <= 2 && multis.nonEmpty)
    // the corpus's dominant fragments all involve at/th/ca/ha mass —
    // whatever survives must appear ≥ 3 times as a substring
    val subCounts = Unigram.seedCandidates(classic, "text", 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    multis.foreach(p => assert(subCounts(p) >= 2L,
      s"low-mass piece $p survived prune"))
  }

  test("persisted model: encodeIdsIndexed == one-shot, stamp replayed, stampless refuses") {
    val path = tmp("graft_uni_idx")
    Unigram.writeUnigramModel(classic, "text", "unit", path,
      vocabSize = 25, maxPieceLen = 3, seedSize = 50, emIters = 2)
    val meta = spark.table("unit_uni")
    val oneShot = Unigram.encodeIds(classic, "doc_id", "text",
      Unigram.piecesViterbi(meta))
    val served = Unigram.encodeIdsIndexed(spark, "unit", path,
      classic, "doc_id", "text")
    assert(collectSorted(served, "doc_id", "word_pos", "tok_pos") ===
      collectSorted(oneShot, "doc_id", "word_pos", "tok_pos"))
    val e = intercept[IllegalArgumentException] {
      Unigram.encodeIdsIndexed(spark, "unit", tmp("graft_uni_nostamp"),
        classic, "doc_id", "text")
    }
    assert(e.getMessage.contains("stamp"))
  }

  test("GPT-2 pre-tokenized model: detokenizeIndexed inverts encode on covered text") {
    val path = tmp("graft_uni_gpt2")
    Unigram.writeUnigramModel(classic, "text", "unig", path,
      vocabSize = 30, maxPieceLen = 4, seedSize = 60, emIters = 2,
      wordPattern = Some(Bpe.Gpt2WordPattern))
    val enc = Unigram.encodeIdsIndexed(spark, "unig", path,
      classic, "doc_id", "text")
    assert(enc.filter(col("token_id") < 0).count() === 0L)
    val back = classic.select(col("doc_id"), col("text"))
      .join(
        enc.orderBy("doc_id", "word_pos", "tok_pos")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(struct(col("word_pos"),
            col("tok_pos"), col("token_id")))).as("s"))
          .select(col("doc_id"),
            Unigram.detokenizeIndexed(spark, "unig", path,
              expr("transform(s, x -> x.token_id)")).as("rt")),
        Seq("doc_id"))
    assert(back.filter(col("rt") =!= col("text")).count() === 0L)
  }

  test("windows: conservation in id space, EOD accounting, doc spans tile") {
    val model = Unigram.train(classic, "text", vocabSize = 25,
      maxPieceLen = 3, seedSize = 50, emIters = 2)
    val pieces = Unigram.piecesViterbi(model)
    val eod = pieces.map(_._2).max + 1
    val w = Unigram.assembleWindowsIds(classic, "doc_id", "text",
      windowSize = 5L, seed = 3L, pieces, eodId = Some(eod),
      withDocSpans = true)
    val enc = Unigram.encodeIds(classic, "doc_id", "text", pieces)
    val totalIds = enc.count() + classic.count() // one EOD per doc
    assert(w.agg(sum("n_tokens")).head().getLong(0) === totalIds)
    assert(w.filter(size(col("window_ids")) =!= col("n_tokens")).count() === 0L)
    // spans tile each window exactly
    val badSpan = w.select(col("n_tokens"),
        expr("aggregate(doc_spans, cast(0 as bigint), (s, d) -> s + d.len)").as("m"))
      .filter(col("m") =!= col("n_tokens"))
    assert(badSpan.count() === 0L)
    // eodId colliding with a live piece id refuses
    val bad = intercept[IllegalArgumentException] {
      Unigram.assembleWindowsIds(classic, "doc_id", "text", 5L, 3L,
        pieces, eodId = Some(pieces.head._2))
    }
    assert(bad.getMessage.contains("collides"))
  }

  test("tokenizer switch: unigram id-space landing — conservation in the Viterbi unit, fsck, O(1) replay") {
    import graft.llm.{Dedup, Pipeline}
    def tmpd(p: String) = tmp(p)
    val idx = tmpd("graft_uwin_idx")
    val mdl = tmpd("graft_uwin_uni")
    val out = tmpd("graft_uwin_out")
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Unigram.writeUnigramModel(docs.filter(col("doc_id") < 300), "text",
        "uwin_uni", mdl, vocabSize = 40, maxPieceLen = 3, seedSize = 80,
        emIters = 1)
      val bw = Pipeline.BpeWindows("uwin_uni", mdl, tokenizer = "unigram")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "uwin_t", idx)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      val s2 = docs.filter(col("doc_id") >= 240 && col("doc_id") < 280)
      val c1 = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "uwin_t", idx, out, 64L, "u01", redactPii = false,
        bpeWindows = Some(bw))
      Pipeline.ingestWindowsShard(s2, df(docSchema), "doc_id", "text",
        "uwin_t", idx, out, 64L, "u02", redactPii = false,
        bpeWindows = Some(bw))
      val win = spark.read.parquet(out)
      assert(win.columns.sorted.sameElements(Array("n_tokens",
        "shard_label", "split", "window_id", "window_ids")))
      assert(win.filter(size(col("window_ids")) =!= col("n_tokens"))
        .count() === 0L)
      // conservation in the UNIGRAM id unit: window mass == the landed
      // docs' Viterbi token counts (whitespace words would not match)
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
      val landed = docs.join(sidecar.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val uniMass = Unigram.encodeIdsIndexed(spark, "uwin_uni", mdl,
        landed, "doc_id", "text").count()
      val winMass = win.agg(sum("n_tokens")).head().getLong(0)
      assert(winMass === uniMass)
      val wsMass = landed.agg(sum(size(split(col("text"), " "))))
        .head().getLong(0)
      assert(winMass !== wsMass,
        "unigram mass must differ from whitespace mass or the unit check is vacuous")
      // the fsck counts in the landing's unit: green with the model,
      // flagged without it
      val rep = Pipeline.windowsReport(spark, out, Some(docs),
        bpeWindows = Some(bw)).collect()
      assert(rep.forall(_.getAs[Boolean]("tokens_match")), rep.mkString(";"))
      val repWs = Pipeline.windowsReport(spark, out, Some(docs)).collect()
      assert(repWs.forall(!_.getAs[Boolean]("tokens_match")))
      // O(1) replay returns the recorded manifest
      val c1b = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "uwin_t", idx, out, 64L, "u01", redactPii = false,
        bpeWindows = Some(bw))
      assert(c1b === c1)
      // a BPE-stamped resolve against the unigram path refuses loudly
      val e = intercept[IllegalArgumentException] {
        Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(Pipeline.BpeWindows("uwin_uni", mdl)))
      }
      assert(e.getMessage.contains("BPE stamp"))
      // a wordpiece resolve against the unigram path refuses at ITS
      // stamp guard (the family is known; the model here is not its)
      val e2 = intercept[IllegalArgumentException] {
        Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(Pipeline.BpeWindows("uwin_uni", mdl,
            tokenizer = "wordpiece")))
      }
      assert(e2.getMessage.contains("wordpiece stamp"))
      val e3 = intercept[IllegalArgumentException] {
        Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(Pipeline.BpeWindows("uwin_uni", mdl,
            tokenizer = "sentencepiece")))
      }
      assert(e3.getMessage.contains("unknown tokenizer"))
    } finally {
      Seq("bands", "shingles", "keys").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS uwin_t_$s"))
    }
  }

  test("metaspace: the published ▁ convention — stamped transform, lone-▁ space runs, exact detok inverse, refusals, retrain keeps the stamp") {
    val msSchema = StructType(Seq(StructField("piece", StringType),
      StructField("logp", DoubleType), StructField("piece_id", LongType)))
    val msModel = Seq(("▁", -2.0, 0L), ("▁ab", -2.5, 1L),
      ("▁c", -2.6, 2L), ("a", -2.4, 3L), ("b", -2.45, 4L),
      ("c", -2.55, 5L))
    val path = tmp("graft_uni_ms")
    Unigram.importUnigramModel(spark,
      df(msSchema, msModel.map(m => Row(m._1, m._2, m._3)): _*),
      "unims", path, metaspace = true)
    try {
      val meta = Unigram.readUniMeta(spark, path)
      assert(meta.metaspace && meta.imported)
      def enc(text: String): Seq[Long] =
        Unigram.encodeIdsIndexed(spark, "unims", path,
            df(docSchema, Row(1L, text)), "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      // "ab c ab" → ▁ab ▁c ▁ab — the ▁-prefixed pieces match verbatim
      assert(enc("ab c ab") === Seq(1L, 2L, 1L))
      // leading + double spaces become lone-▁ words (published behavior)
      assert(enc(" ab  c") === Seq(0L, 1L, 0L, 2L))
      // detok is the EXACT inverse on covered text — leading and
      // repeated spaces survive (strip one prepended ▁, ▁ → space)
      def detok(ids: Seq[Long]): String =
        df(StructType(Seq(StructField("ids", ArrayType(LongType)))),
            Row(ids))
          .select(Unigram.detokenizeIndexed(spark, "unims", path,
            col("ids"))).head().getString(0)
      assert(detok(Seq(1L, 2L, 1L)) === "ab c ab")
      assert(detok(Seq(0L, 1L, 0L, 2L)) === " ab  c")
      // refusal: an explicit wordPattern cannot compose with metaspace
      assert(intercept[IllegalArgumentException] {
        Unigram.importUnigramModel(spark,
          df(msSchema, Row("▁", -2.0, 0L)), "unims2", tmp("graft_ums2"),
          wordPattern = Some("[a-z]+"), metaspace = true)
      }.getMessage.contains("metaspace"))
    } finally spark.sql("DROP TABLE IF EXISTS unims_uni")
    // trained family: metaspace shapes TRAINING (the ▁-run word unit)
    // and survives a drift-fired retrain via the stamp
    val corpus = df(docSchema,
      (1L to 30L).map(i => Row(i, "ab ab c ab")): _*)
    val tpath = tmp("graft_uni_mstr")
    try {
      Unigram.writeUnigramModel(corpus, "text", "unimtr", tpath,
        vocabSize = 12, maxPieceLen = 4, seedSize = 30, emIters = 1,
        metaspace = true)
      val m1 = Unigram.readUniMeta(spark, tpath)
      assert(m1.metaspace && !m1.imported)
      // the trained pieces live in ▁ space
      val pieces = spark.table("unimtr_uni").collect()
        .map(_.getString(1)).toSet
      assert(pieces.exists(_.startsWith("▁")), pieces.toString)
      val drifted = df(docSchema, Row(77L, "øø øø øø"), Row(78L, "øø"))
      graft.llm.Maintain.maintainUnigram(spark, "unimtr", tpath,
        freshSample = Some(drifted),
        freshCorpus = Some(corpus.unionByName(drifted))).collect()
      assert(Unigram.readUniMeta(spark, tpath).metaspace,
        "the drift-fired retrain must replay the stamped metaspace")
    } finally spark.sql("DROP TABLE IF EXISTS unimtr_uni")
  }

  test("metaspace windows landing: the stamped transform rides the assembly AND the fsck recompute — conservation in the ▁ unit") {
    import graft.llm.{Dedup, Pipeline}
    val idx = tmp("graft_umsw_idx")
    val mdl = tmp("graft_umsw_uni")
    val out = tmp("graft_umsw_out")
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Unigram.writeUnigramModel(docs.filter(col("doc_id") < 300), "text",
        "umsw_uni", mdl, vocabSize = 40, maxPieceLen = 4, seedSize = 80,
        emIters = 1, metaspace = true)
      assert(Unigram.readUniMeta(spark, mdl).metaspace)
      val bw = Pipeline.BpeWindows("umsw_uni", mdl, tokenizer = "unigram")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "umsw_t", idx)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 240),
        df(docSchema), "doc_id", "text", "umsw_t", idx, out, 64L, "m01",
        redactPii = false, bpeWindows = Some(bw))
      // the landed mass is in the METASPACE unit (▁-run words) — the
      // report's independent recompute must agree exactly, proving the
      // stamp rides both the assembly and the fsck column paths
      val rep = Pipeline.windowsReport(spark, out, Some(docs),
        bpeWindows = Some(bw)).collect()
      assert(rep.nonEmpty && rep.forall(_.getAs[Boolean]("tokens_match")),
        rep.mkString(";"))
      // and it differs from what the UNSTAMPED recompute would claim:
      // a whitespace fsck against this landing must flag
      val repWs = Pipeline.windowsReport(spark, out, Some(docs)).collect()
      assert(repWs.forall(!_.getAs[Boolean]("tokens_match")),
        "whitespace fsck against a metaspace landing must flag")
    } finally {
      Seq("umsw_uni", "umsw_t_bands", "umsw_t_shingles").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(idx, mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("declared special pieces: out of the lattice, usable as structural ids, rendered by detok — the published control-token contract") {
    val sch = StructType(Seq(StructField("piece", StringType),
      StructField("logp", DoubleType), StructField("piece_id", LongType)))
    // the published T5-style head: <pad>=0, </s>=1 at logp 0, then
    // content pieces — including ones whose characters could spell a
    // control surface ('<', 'p', 'a', 'd', '>')
    val pieces = Seq(("<pad>", 0.0, 0L), ("</s>", 0.0, 1L),
      ("a", -2.4, 2L), ("b", -2.45, 3L), ("ab", -2.0, 4L),
      ("<", -3.0, 5L), (">", -3.1, 6L), ("p", -3.2, 7L), ("d", -3.3, 8L))
    val path = tmp("graft_uni_sp")
    Unigram.importUnigramModel(spark,
      df(sch, pieces.map(p => Row(p._1, p._2, p._3)): _*),
      "unisp", path, specialPieces = Seq("<pad>", "</s>"))
    try {
      val meta = Unigram.readUniMeta(spark, path)
      assert(meta.specialIds === Seq(0L, 1L))
      def enc(text: String): Seq[Long] =
        Unigram.encodeIdsIndexed(spark, "unisp", path,
            df(docSchema, Row(1L, text)), "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      // literal control text NEVER matches the special piece — it
      // encodes per character (the published semantics); id 0/1 absent
      val lit = enc("<pad>")
      assert(!lit.contains(0L) && !lit.contains(1L), lit.toString)
      assert(lit === Seq(5L, 7L, 2L, 8L, 6L)) // < p a d >
      assert(enc("ab") === Seq(4L))
      // structural use: the stamped special id serves as the SFT eod
      // without a collision refusal, and detok renders its surface
      val got = graft.llm.Sft.assembleExamplesIndexed(spark, "unisp",
          path, df(StructType(Seq(StructField("id", LongType),
            StructField("p", StringType), StructField("r", StringType))),
            Row(1L, "ab", "b a")),
          "id", "p", "r", sepId = Some(0L), eodId = Some(1L),
          tokenizer = "unigram")
        .head().getSeq[Long](1)
      assert(got === Seq(4L, 0L, 3L, 2L, 1L))
      val back = df(StructType(Seq(
          StructField("ids", ArrayType(LongType)))), Row(got))
        .select(Unigram.detokenizeIndexed(spark, "unisp", path,
          col("ids"))).head().getString(0)
      assert(back === "ab<pad>ba</s>")
      // an undeclared surface refuses; declaring every piece refuses
      assert(intercept[IllegalArgumentException] {
        Unigram.importUnigramModel(spark,
          df(sch, Row("a", -2.0, 0L)), "unisp2", tmp("graft_usp2"),
          specialPieces = Seq("<unk>"))
      }.getMessage.contains("not in the piece table"))
      assert(intercept[IllegalArgumentException] {
        Unigram.importUnigramModel(spark,
          df(sch, Row("a", -2.0, 0L)), "unisp3", tmp("graft_usp3"),
          specialPieces = Seq("a"))
      }.getMessage.contains("no content vocabulary"))
    } finally spark.sql("DROP TABLE IF EXISTS unisp_uni")
  }

  test("importUnigramModel: published (piece, logp, piece_id) serves known ids; total validation") {
    import org.apache.spark.sql.Row
    val path = tmp("graft_uni_imp")
    val pieceSchema = StructType(Seq(
      StructField("piece", StringType), StructField("logp", DoubleType),
      StructField("piece_id", LongType)))
    // published-style ids deliberately NOT in code-point order
    val published = df(pieceSchema,
      Row("at", -2.0, 7L), Row("c", -3.0, 2L), Row("a", -2.5, 0L),
      Row("t", -2.75, 1L), Row("cat", -3.5, 9L))
    Unigram.importUnigramModel(spark, published, "unimp", path)
    val meta = spark.table("unimp_uni").orderBy("piece_id").collect()
    assert(meta.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((0L, "a"), (1L, "t"), (2L, "c"), (7L, "at"), (9L, "cat")))
    // "cat": [cat] = -3.5 beats [c][at] = -5.0, [c][a][t] = -8.25
    // "tat": [t][at] = -4.75 beats [t][a][t] = -8.0
    val docs = df(docSchema, Row(1L, "cat tat catx"))
    val got = Unigram.encodeIdsIndexed(spark, "unimp", path, docs,
        "doc_id", "text")
      .orderBy("word_pos", "tok_pos")
      .select("token_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(9L, 1L, 7L, 9L, -1L))
    // imported stamp rides back
    val stamp = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "_graft_uni_meta.json")), "UTF-8")
    assert(stamp.contains("\"imported\":true"))
    // validation refusals
    def bad(rows: Row*): Exception = intercept[Exception] {
      Unigram.importUnigramModel(spark, df(pieceSchema, rows: _*),
        "unibad", tmp("graft_uni_impbad"))
    }
    assert(bad().getMessage.contains("empty"))
    assert(bad(Row("a", -1.0, 0L), Row("a", -2.0, 1L)).getMessage
      .contains("duplicate piece surfaces"))
    assert(bad(Row("a", -1.0, 0L), Row("b", -2.0, 0L)).getMessage
      .contains("duplicate piece_id"))
    assert(bad(Row("a", 0.5, 0L)).getMessage.contains("invalid"))
    assert(bad(Row("a", -200.0, 0L)).getMessage.contains("OOV floor"))
  }

  test("byte fallback: lattice unchanged on covered text, UTF-8 byte expansion on OOV, collision refusals") {
    val byteIds: IndexedSeq[Long] = (0 until 256).map(b => 100L + b)
    def encBf(word: String) = spark.range(1)
      .select(TextHashExprs.unigramSegment(lit(word), vit, Some(byteIds))
        .as("s"))
      .select(col("s.ids"), col("s.score_micro"), col("s.n_pieces"))
      .head()
    // covered word: identical ids and score with or without fallback
    val plain = seg("abc")
    val bf = encBf("abc")
    assert(bf.getSeq[Long](0) === plain._1 && bf.getLong(1) === plain._2)
    // OOV 'z' (0x7A) -> byte id 100+122; score still one OovMicro edge
    val z = encBf("z")
    assert(z.getSeq[Long](0) === Seq(100L + 0x7A))
    assert(z.getLong(1) === UnigramKernel.OovMicro)
    // multibyte: é = C3 A9 (2 ids), 𝄞 = F0 9D 84 9E (4 ids, non-BMP
    // counted as ONE code point / one OovMicro edge)
    assert(encBf("é").getSeq[Long](0) === Seq(100L + 0xC3, 100L + 0xA9))
    val g = encBf("𝄞")
    assert(g.getSeq[Long](0) ===
      Seq(100L + 0xF0, 100L + 0x9D, 100L + 0x84, 100L + 0x9E))
    assert(g.getLong(1) === UnigramKernel.OovMicro)
    assert(g.getInt(2) === 4) // n_pieces counts EMITTED ids
    // a byte id colliding with a piece id refuses
    val e = intercept[IllegalArgumentException] {
      spark.range(1).select(TextHashExprs.unigramSegment(lit("a"), vit,
        Some((0 until 256).map(_.toLong)))).head()
    }
    assert(e.getMessage.contains("collides"))
  }

  test("byte fallback: persisted lifecycle — lossless round trip on unseen scripts, drift in byte currency, landing conservation") {
    val path = tmp("graft_uni_bf")
    Unigram.writeUnigramModel(classic, "text", "unibf", path,
      vocabSize = 25, maxPieceLen = 3, seedSize = 50, emIters = 2,
      byteFallback = true)
    assert(Unigram.readUniMeta(spark, path).byteFallback)
    // the table carries the 256 reserved surfaces after the content ids
    val m = spark.table("unibf_uni")
    assert(m.filter(col("piece").startsWith("<0x")).count() === 256L)
    // no -1 anywhere, even on a never-seen script
    val docs = df(docSchema, Row(1L, "the cat"), Row(2L, "日本語 χξζ"))
    val enc = Unigram.encodeIdsIndexed(spark, "unibf", path, docs,
      "doc_id", "text")
    assert(enc.filter(col("token_id") < 0).count() === 0L)
    // detokenize reads the unseen script back EXACTLY
    val back = docs.join(
      enc.groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("word_pos"),
          col("tok_pos"), col("token_id")))).as("s"))
        .select(col("doc_id"),
          Unigram.detokenizeIndexed(spark, "unibf", path,
            expr("transform(s, x -> x.token_id)")).as("rt")),
      Seq("doc_id"))
    // whitespace pre-tokenizer drops the spaces; per-word surfaces
    // must reassemble exactly, including the multibyte script
    val rt2 = back.filter(col("doc_id") === 2L).head().getAs[String]("rt")
    assert(rt2 === "日本語χξζ")
    // drift observable speaks the byte currency
    assert(Unigram.uniOovRate(spark, "unibf", path,
      df(docSchema, Row(9L, "ЖЖЖ")), "text") === 1.0)
    assert(Unigram.uniOovRate(spark, "unibf", path,
      df(docSchema, Row(9L, "the cat")), "text") === 0.0)
    // windows land in the EXPANDED unit and conserve
    val (pieces, bytes) = Unigram.servingViterbi(spark, "unibf", path)
    val win = Unigram.assembleWindowsIds(docs, "doc_id", "text", 8L, 3L,
      pieces, eodId = Some(5000L), wordPattern = None,
      byteFallback = bytes)
    val mass = win.agg(sum("n_tokens")).head().getLong(0)
    assert(mass === enc.count() + 2L) // +1 EOD per doc
    // an eodId colliding with a byte id refuses
    val e = intercept[IllegalArgumentException] {
      Unigram.assembleWindowsIds(docs, "doc_id", "text", 8L, 3L,
        pieces, eodId = Some(bytes.get.head), byteFallback = bytes)
    }
    assert(e.getMessage.contains("byte-fallback"))
    // a drift-fired retrain REPLAYS the byte-fallback mode (the stamp
    // is the geometry — losing the mode would silently re-introduce -1)
    val drifted = df(docSchema, Row(7L, "ŴŴ ŵŵ"), Row(8L, "ŵŵ"))
    graft.llm.Maintain.maintainUnigram(spark, "unibf", path,
      freshSample = Some(drifted),
      freshCorpus = Some(classic.unionByName(drifted)))
    assert(Unigram.readUniMeta(spark, path).byteFallback)
    assert(spark.table("unibf_uni")
      .filter(col("piece").startsWith("<0x")).count() === 256L)
  }

  test("byte fallback: import auto-detects the published 256-surface shape") {
    val path = tmp("graft_uni_bfimp")
    val rows = Seq(("▁the", -1.0), ("t", -2.25)) ++
      Unigram.ByteFallbackSurfaces.map(s => (s, -12.0))
    val pieceSchema = StructType(Seq(
      StructField("piece", StringType), StructField("logp", DoubleType)))
    Unigram.importUnigramModel(spark,
      df(pieceSchema, rows.map(p => Row(p._1, p._2)): _*), "unibfi", path)
    val meta = Unigram.readUniMeta(spark, path)
    assert(meta.imported && meta.byteFallback)
    // a literal "<0x41>" in TEXT does not match the structural piece —
    // it decomposes per character (byte ids for '<','0','x','4','1','>')
    val enc = Unigram.encodeIdsIndexed(spark, "unibfi", path,
      df(docSchema, Row(1L, "<0x41>")), "doc_id", "text")
    val (_, bytes) = Unigram.servingViterbi(spark, "unibfi", path)
    val got = enc.orderBy("tok_pos").collect().map(_.getLong(3)).toSeq
    assert(got === "<0x41>".getBytes("UTF-8").toSeq.map(b =>
      bytes.get(b & 0xFF)))
    // without all 256 surfaces, NOT a byte-fallback model
    val p2 = tmp("graft_uni_bfimp2")
    Unigram.importUnigramModel(spark,
      df(pieceSchema, Row("▁the", -1.0), Row("<0x41>", -12.0)),
      "unibfi2", p2)
    assert(!Unigram.readUniMeta(spark, p2).byteFallback)
  }

  test("readSentencePieceTsv: piece<TAB>logp lines, id = line number, loud refusals") {
    val f = java.nio.file.Files.createTempFile("graft_uni_tsv", ".tsv")
    java.nio.file.Files.write(f,
      "▁the\t-1.0\n▁a\t-1.5\nt\t-2.25\n".getBytes("UTF-8"))
    val v = Unigram.readSentencePieceTsv(spark, f.toString)
    assert(v.orderBy("piece_id").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq ===
      Seq(("▁the", -1.0, 0L), ("▁a", -1.5, 1L), ("t", -2.25, 2L)))
    // the frame feeds the import directly
    val path = tmp("graft_uni_tsvimp")
    Unigram.importUnigramModel(spark, v, "unitsv", path)
    assert(Unigram.readUniMeta(spark, path).imported)
    def badFile(content: String): Exception = {
      val g = java.nio.file.Files.createTempFile("graft_uni_tsvbad", ".tsv")
      java.nio.file.Files.write(g, content.getBytes("UTF-8"))
      intercept[Exception] { Unigram.readSentencePieceTsv(spark, g.toString) }
    }
    assert(badFile("nologp\n").getMessage.contains("piece<TAB>logp"))
    assert(badFile("a\tb\t-1.0\n").getMessage.contains("TAB"))
    assert(badFile("a\tnotanumber\n").getMessage.contains("not a number"))
  }

  test("maintenance: OOV drift fires a stamp-replayed retrain; imported is indicated-unfireable; compaction preserves serving") {
    import graft.llm.Maintain
    val path = tmp("graft_uni_maint")
    Unigram.writeUnigramModel(classic, "text", "unim", path,
      vocabSize = 25, maxPieceLen = 3, seedSize = 50, emIters = 2)
    val drifted = df(docSchema, Row(7L, "øø ææ øø"), Row(8L, "ææ øø"))
    // drift indicated but unfireable without a refresh corpus
    val rep1 = Maintain.maintainAll(spark,
      Seq("uni" -> Maintain.UnigramTarget("unim", path,
        freshSample = Some(drifted))))
      .collect().map(r => (r.getString(1), r.getBoolean(4), r.getString(5)))
    assert(rep1.exists(r => r._1 == "oov_drift" && !r._2 &&
      r._3.contains("freshCorpus")))
    assert(rep1.exists(r => r._1 == "retraction" &&
      r._3.contains("structurally absent")))
    // with a refresh corpus the retrain fires and replays the stamp
    val refreshed = classic.unionByName(drifted)
    val rep2 = Maintain.maintainUnigram(spark, "unim", path,
      freshSample = Some(drifted), freshCorpus = Some(refreshed))
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getString(4)))
    assert(rep2.find(_._1 == "oov_drift").get._2)
    assert(Unigram.uniOovRate(spark, "unim", path, drifted, "text") == 0.0)
    val meta = Unigram.readUniMeta(spark, path)
    assert(meta.vocabSize == 25 && meta.maxPieceLen == 3 &&
      meta.seedSize == 50)
    // a second sweep on the same inputs is quiescent
    val rep3 = Maintain.maintainUnigram(spark, "unim", path,
      freshSample = Some(drifted), freshCorpus = Some(refreshed))
      .collect().map(r => (r.getString(0), r.getBoolean(3)))
    assert(!rep3.find(_._1 == "oov_drift").get._2)
    // compaction preserves serving bit-for-bit
    val before = collectSorted(
      Unigram.encodeIdsIndexed(spark, "unim", path, classic,
        "doc_id", "text"), "doc_id", "word_pos", "tok_pos")
    Unigram.compactUnigram(spark, "unim")
    val after = collectSorted(
      Unigram.encodeIdsIndexed(spark, "unim", path, classic,
        "doc_id", "text"), "doc_id", "word_pos", "tok_pos")
    assert(after === before)
    // imported model: drift indicated, NEVER auto-fired even with a corpus
    val ipath = tmp("graft_uni_maint_imp")
    Unigram.importUnigramModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("logp", DoubleType))),
        Row("a", -1.0), Row("b", -1.5), Row("ab", -2.0)),
      "unimi", ipath)
    val rep4 = Maintain.maintainUnigram(spark, "unimi", ipath,
      freshSample = Some(drifted), freshCorpus = Some(refreshed))
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getString(4)))
    val d4 = rep4.find(_._1 == "oov_drift").get
    assert(!d4._2 && d4._3.contains("retrain-ineligible"))
  }

  test("streaming encode picks up a mid-stream wholesale retrain") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = tmp("graft_uni_srv")
    val path = s"$base/model"
    Unigram.writeUnigramModel(classic, "text", "unis", path,
      vocabSize = 25, maxPieceLen = 3, seedSize = 50, emIters = 2)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.uniEncodeStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "unis", path, outPath = s"$base/out",
      checkpoint = s"$base/ckpt").start()
    try {
      in.addData(1L -> "øø cat")
      q.processAllAvailable()
      // mid-stream wholesale retrain on a corpus that covers 'ø'
      Unigram.writeUnigramModel(
        classic.unionByName(df(docSchema, Row(9L, "øø øø"))),
        "text", "unis", path, vocabSize = 27, maxPieceLen = 3,
        seedSize = 54, emIters = 2)
      in.addData(2L -> "øø cat")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // batch 1: 'ø' unseen -> OOV ids; batch 2: the retrain covers it
    assert(got.filter(_._1 == 1L).exists(_._2 == -1L))
    assert(!got.filter(_._1 == 2L).exists(_._2 == -1L))
    assert(got.filter(_._1 == 2L).nonEmpty)
  }

  test("fertility and OOV drift observables") {
    val path = tmp("graft_uni_fert")
    val docs = df(
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("lang", StringType))),
      Row(1L, "the cat sat", "en"), Row(2L, "the hat", "en"),
      Row(3L, "zq zq", "xx"))
    Unigram.writeUnigramModel(docs.filter(col("lang") === "en"), "text",
      "unif", path, vocabSize = 25, maxPieceLen = 3, seedSize = 50)
    val rep = Unigram.fertilityReport(spark, "unif", path, docs,
      "text", "lang")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep("en").getAs[Long]("n_oov") === 0L)
    assert(rep("xx").getAs[Long]("n_oov") > 0L) // z, q unseen chars? q seen? zq: z unseen
    assert(rep("en").getAs[Double]("fertility") >= 1.0)
    val drift = Unigram.uniOovRate(spark, "unif", path,
      docs.filter(col("lang") === "xx"), "text")
    assert(drift > 0.0)
    assert(Unigram.uniOovRate(spark, "unif", path,
      docs.filter(col("lang") === "en"), "text") === 0.0)
  }
}
