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
