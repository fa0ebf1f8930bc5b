package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Bpe, Pipeline, Sft}

/** SFT example assembly + whole-example packing (r15). The driver gate
  * value-checks the assembly over corpus-derived pairs
  * (q_sft_examples); these specs pin the row policies, the loss-mask
  * arithmetic, the structural-id refusals, and the packed layout's
  * mask-alignment guarantees. */
class SftSpec extends SparkTestBase {

  private val pairSchema = StructType(Seq(
    StructField("id", LongType), StructField("p", StringType),
    StructField("r", StringType)))

  // classic fixture: merges learned from it give multi-id words
  private def corpus = df(StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType))),
    Row(1L, "low low low low low"),
    Row(2L, "lower lower"),
    Row(3L, "newest newest newest newest newest newest"),
    Row(4L, "widest widest widest"))

  test("assembleExamples: layout, loss boundary, row policies, refusals") {
    val mergesDf = Bpe.train(corpus, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", mergesDf))
    val mx = vocab.values.max
    val (sep, eod) = (mx + 1L, mx + 2L)
    val pairs = df(pairSchema,
      Row(1L, "low lower", "newest widest"),
      Row(2L, null, "low"),          // null prompt = empty prompt
      Row(3L, "low", null),          // null response drops
      Row(4L, "low", "  "))          // zero-token response drops
    val got = Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        sepId = Some(sep), eodId = Some(eod))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "rows 3 and 4 must drop")
    // example 1: enc("low")=[low], enc("lower")=[low,e,r] → prompt 4
    // ids; response enc("newest")=[newest], enc("widest")=[w,i,dest]
    val ex1 = got(0)
    assert(ex1._2 == Seq(vocab("low"), vocab("low"), vocab("e"),
      vocab("r"), sep, vocab("newest"), vocab("w"), vocab("i"),
      vocab("dest"), eod), s"${ex1._2}")
    assert(ex1._3 == 10L && ex1._4 == 5L,
      "loss_from must point at the first response id (after the sep)")
    // loss positions [loss_from, n_tokens) are exactly response + eod
    assert(ex1._2.slice(ex1._4.toInt, ex1._3.toInt) ==
      Seq(vocab("newest"), vocab("w"), vocab("i"), vocab("dest"), eod))
    // null prompt: ids = [sep] ++ response ++ [eod], loss_from = 1
    val ex2 = got(1)
    assert(ex2._2 == Seq(sep, vocab("low"), eod) && ex2._4 == 1L)
    // no structural ids: plain concat, loss_from = |prompt ids|
    val bare = Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab)
      .filter(col("id") === 1L).head()
    assert(bare.getSeq[Long](1).length == 8 && bare.getLong(3) == 4L)
    // maxLen drops the overlong example
    assert(Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
      sepId = Some(sep), eodId = Some(eod), maxLen = Some(3L))
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // refusals: in-vocab structural id; sep == eod
    intercept[IllegalArgumentException] {
      Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        sepId = Some(vocab("low")))
    }
    intercept[IllegalArgumentException] {
      Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        sepId = Some(sep), eodId = Some(sep))
    }
    // indexed form serves bit-identically to the explicit form
    val path = java.nio.file.Files
      .createTempDirectory("graft_sft_idx").toString
    try {
      Bpe.writeBpeModel(corpus, "text", "sfti", path, numMerges = 8)
      val a = Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        Some(sep), Some(eod)).orderBy("id").collect().toSeq
      val b = Sft.assembleExamplesIndexed(spark, "sfti", path, pairs,
        "id", "p", "r", Some(sep), Some(eod)).orderBy("id")
        .collect().toSeq
      assert(a == b)
    } finally {
      Seq("sfti_bpe", "sfti_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path))
    }
  }

  test("prompt-left truncation: keep-end prompt, response never cut, overlong-response drop, sep survives, empty-prompt edge, refusals") {
    val mergesDf = Bpe.train(corpus, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", mergesDf))
    val mx = vocab.values.max
    val (sep, eod) = (mx + 1L, mx + 2L)
    val (lo, e, r_, ne, w, i, de) = (vocab("low"), vocab("e"),
      vocab("r"), vocab("newest"), vocab("w"), vocab("i"), vocab("dest"))
    val pairs = df(pairSchema,
      Row(1L, "low lower low lower", "newest"), // truncates: ov=5
      Row(2L, "low", "newest widest"),          // prompt down to [sep]
      Row(3L, "low", "newest widest newest widest"), // rfull=9>6: drops
      Row(4L, "low", "newest"))                 // fits untouched
    val got = Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        sepId = Some(sep), eodId = Some(eod), maxLen = Some(6L),
        truncation = "prompt_left")
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getSeq[Long](1), x.getLong(2),
        x.getLong(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L),
      "the response-alone-overlong example must drop")
    // pfull = [low,low,e,r,low,low,e,r,sep] (9); budget 6, rfull 2 →
    // ov=5: the KEPT END is [low,e,r,sep]
    assert(got(0)._2 == Seq(lo, e, r_, sep, ne, eod) &&
      got(0)._3 == 6L && got(0)._4 == 4L, s"${got(0)}")
    // pfull=[low,sep], rfull=[ne,w,i,de,eod] → ov=1: prompt id gone,
    // the sep at its tail survives
    assert(got(1)._2 == Seq(sep, ne, w, i, de, eod) &&
      got(1)._4 == 1L, s"${got(1)}")
    // within budget: bit-identical to the untruncated layout
    assert(got(2)._2 == Seq(lo, sep, ne, eod) && got(2)._4 == 2L)
    // loss window is exactly response ++ eod in every surviving row
    got.foreach { case (_, ids, n, lf) =>
      assert(ids.slice(lf.toInt, n.toInt).last == eod)
    }
    // empty prompt + overflow: even the sep truncates away, loss_from=0
    val edge = Sft.assembleExamples(
        df(pairSchema, Row(5L, null, "newest widest")), "id", "p", "r",
        merges, vocab, sepId = Some(sep), eodId = Some(eod),
        maxLen = Some(5L), truncation = "prompt_left")
      .head()
    assert(edge.getSeq[Long](1) == Seq(ne, w, i, de, eod) &&
      edge.getLong(3) == 0L)
    // refusals: unknown mode; prompt_left without a budget
    assert(intercept[IllegalArgumentException] {
      Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        maxLen = Some(6L), truncation = "right")
    }.getMessage.contains("unknown truncation"))
    assert(intercept[IllegalArgumentException] {
      Sft.assembleExamples(pairs, "id", "p", "r", merges, vocab,
        truncation = "prompt_left")
    }.getMessage.contains("nothing to truncate"))
  }

  test("assembleBinaryPreference: the unpaired KTO shape — label rides through, null labels drop, ids equal assembleExamples, refusals") {
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("p", StringType), StructField("r", StringType),
      StructField("good", BooleanType)))
    val rows = df(sch,
      Row(1L, "low lower", "newest widest", true),
      Row(2L, null, "low", false),
      Row(3L, "low", "newest", null)) // unlabeled: drops
    val path = java.nio.file.Files
      .createTempDirectory("graft_kto").toString
    try {
      Bpe.writeBpeModel(corpus, "text", "kto", path, numMerges = 8)
      val vocab = Bpe.vocabMap(spark.table("kto_bpe_vocab"))
      val mx = vocab.values.max
      val got = Sft.assembleBinaryPreference(spark, "kto", path, rows,
          "id", "p", "r", "good",
          sepId = Some(mx + 1L), eodId = Some(mx + 2L))
        .orderBy("id").collect()
      assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      assert(got.map(_.getAs[Boolean]("desirable")).toSeq ===
        Seq(true, false))
      // ids/loss boundary are exactly the example assembler's
      val plain = Sft.assembleExamplesIndexed(spark, "kto", path,
          rows.select("id", "p", "r"), "id", "p", "r",
          sepId = Some(mx + 1L), eodId = Some(mx + 2L))
        .orderBy("id").collect()
      assert(got.map(x => (x.getSeq[Long](1), x.getLong(3))).toSeq ===
        plain.filter(_.getLong(0) <= 2L)
          .map(x => (x.getSeq[Long](1), x.getLong(3))).toSeq)
      // refusals: non-boolean label; output-name collision
      assert(intercept[IllegalArgumentException] {
        Sft.assembleBinaryPreference(spark, "kto", path,
          rows.withColumn("g2", lit(1L)), "id", "p", "r", "g2")
      }.getMessage.contains("must be boolean"))
      assert(intercept[IllegalArgumentException] {
        Sft.assembleBinaryPreference(spark, "kto", path,
          rows.withColumn("n_tokens", lit(true)), "id", "p", "r",
          "n_tokens")
      }.getMessage.contains("collides"))
    } finally {
      Seq("kto_bpe", "kto_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path))
    }
  }

  test("bestOfN: top-k per prompt, deterministic tie-break on cand id, null-score and sub-floor drop, refusals") {
    val sch = StructType(Seq(StructField("pid", LongType),
      StructField("cid", LongType), StructField("score", DoubleType),
      StructField("resp", StringType)))
    val cands = df(sch,
      Row(1L, 10L, 0.7, "a"), Row(1L, 11L, 0.9, "b"),
      Row(1L, 12L, 0.9, "c"),          // tie with cid 11 — 11 wins
      Row(1L, 13L, null, "d"),         // unscored: drops
      Row(1L, 9L, Double.NaN, "g"),    // NaN sorts ABOVE every score
      Row(2L, 20L, 0.2, "e"),          // below floor with minScore
      Row(2L, 21L, 0.5, "f"))          //   — unranked like null: drops
    def sel(k: Int, floor: Option[Double]) =
      Sft.bestOfN(cands, "pid", "cid", "score", k, floor)
        .select("pid", "cid", "cand_rank").orderBy("pid", "cand_rank")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
    // k=1: the argmax; the 0.9 tie breaks on the SMALLER cand id
    assert(sel(1, None) === Seq((1L, 11L, 0L), (2L, 21L, 0L)))
    // k=2: ranks are dense per prompt; prompt 2 yields both its rows
    assert(sel(2, None) === Seq((1L, 11L, 0L), (1L, 12L, 1L),
      (2L, 21L, 0L), (2L, 20L, 1L)))
    // rejection floor: prompt 2's 0.2 is inadmissible even at k=2
    assert(sel(2, Some(0.4)) === Seq((1L, 11L, 0L), (1L, 12L, 1L),
      (2L, 21L, 0L)))
    // a prompt whose every candidate is rejected vanishes
    assert(sel(1, Some(0.95)) === Seq.empty)
    // winners keep their payload columns for downstream assembly
    assert(Sft.bestOfN(cands, "pid", "cid", "score", 1, None)
      .filter(col("pid") === 1L).head().getAs[String]("resp") === "b")
    assert(intercept[IllegalArgumentException] {
      Sft.bestOfN(cands, "pid", "cid", "score", 0, None)
    }.getMessage.contains("k must be >= 1"))
    assert(intercept[IllegalArgumentException] {
      Sft.bestOfN(cands, "pid", "cid", "resp", 1, None)
    }.getMessage.contains("must be numeric"))
  }

  test("assembleConversation: template layout, per-turn loss spans, eod joins the last assistant span, role refusal, weights") {
    val mergesDf = Bpe.train(corpus, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", mergesDf))
    val mx = vocab.values.max
    val (u, a, end, eod) = (mx + 1L, mx + 2L, mx + 3L, mx + 4L)
    val template = Sft.chatTemplate(
      Map("user" -> u, "assistant" -> a), end)
    val turnsType = ArrayType(StructType(Seq(
      StructField("role", StringType), StructField("content", StringType))))
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("turns", turnsType)))
    def turn(role: String, content: String) = Row(role, content)
    val convs = df(sch,
      Row(1L, Seq(turn("user", "low"), turn("assistant", "lower"),
        turn("user", "newest"), turn("assistant", "widest"))),
      Row(2L, Seq(turn("user", "low"), turn("user", "newest"))), // no loss: drops
      Row(3L, Seq(turn("user", "low"), turn("assistant", null))), // empty turn
      Row(4L, null))                                              // drops
    val got = Sft.assembleConversation(convs, "id", "turns", merges,
        vocab, template, eodId = Some(eod))
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val c1 = got(0)
    // enc: low=[low], lower=[low,e,r], newest=[newest], widest=[w,i,dest]
    val (lo, e_, r_, ne, w_, i_, de) = (vocab("low"), vocab("e"),
      vocab("r"), vocab("newest"), vocab("w"), vocab("i"), vocab("dest"))
    assert(c1.getSeq[Long](1) === Seq(
      u, lo, end, a, lo, e_, r_, end, u, ne, end, a, w_, i_, de, end, eod))
    assert(c1.getLong(2) === 17L && c1.getLong(4) === 4L &&
      c1.getLong(5) === 4L) // n_tokens, loss_from, n_turns
    val spans1 = c1.getSeq[Row](3)
      .map(s => (s.getLong(0), s.getLong(1), s.getDouble(2)))
    // assistant spans: (4, |lower ids|+end = 4), (12, |widest|+end+eod = 5)
    assert(spans1 === Seq((4L, 4L, 1.0), (12L, 5L, 1.0)))
    // loss positions decode to exactly content ++ end (++ eod at doc end)
    assert(spans1.flatMap { case (p, l, _) =>
      c1.getSeq[Long](1).slice(p.toInt, (p + l).toInt) } ===
      Seq(lo, e_, r_, end, w_, i_, de, end, eod))
    // null content: assistant turn trains on its terminator alone
    val c3 = got(1)
    assert(c3.getSeq[Long](1) === Seq(u, lo, end, a, end, eod))
    assert(c3.getSeq[Row](3).map(s => (s.getLong(0), s.getLong(1))) ===
      Seq((4L, 2L))) // end + eod
    // per-turn weights ride the spans
    val weighted = template.updated("assistant",
      Sft.TurnTemplate(Seq(a), Seq(end), loss = true, weight = 0.25))
    val ws = Sft.assembleConversation(convs, "id", "turns", merges,
        vocab, weighted, eodId = Some(eod))
      .filter(col("id") === 1L).head().getSeq[Row](3)
    assert(ws.forall(_.getDouble(2) === 0.25))
    // unknown role refuses loudly at execution
    val bad = df(sch, Row(9L, Seq(turn("system", "low"))))
    val err = intercept[Exception] {
      Sft.assembleConversation(bad, "id", "turns", merges, vocab,
        template, eodId = Some(eod)).collect()
    }
    assert(err.getMessage.contains("not in the template"))
    // structural-id collision refusal
    assert(intercept[IllegalArgumentException] {
      Sft.assembleConversation(convs, "id", "turns", merges, vocab,
        Sft.chatTemplate(Map("user" -> vocab("low"), "assistant" -> a),
          end))
    }.getMessage.contains("collides"))
    // EMPTY FINAL LOSS TURN under an empty-suffix template: the eod
    // must NOT extend the earlier assistant's span (that would label
    // the later user role-header a loss position and leave the eod
    // unmasked) — it gets its own len-1 span at the document end
    val bare = Map(
      "user" -> Sft.TurnTemplate(Seq(u), Nil, loss = false),
      "assistant" -> Sft.TurnTemplate(Seq(a), Nil, loss = true))
    val edge = Sft.assembleConversation(
        df(sch, Row(7L, Seq(turn("user", "low"),
          turn("assistant", "lower"), turn("user", "newest"),
          turn("assistant", null)))),
        "id", "turns", merges, vocab, bare, eodId = Some(eod))
      .head()
    assert(edge.getSeq[Long](1) ===
      Seq(u, lo, a, lo, e_, r_, u, ne, a, eod))
    assert(edge.getSeq[Row](3).map(s => (s.getLong(0), s.getLong(1))) ===
      Seq((3L, 3L), (9L, 1L)),
      "earlier span untouched; the eod trains under its own span")
  }

  test("assembleConversation: degenerate two-turn template reproduces assembleExamples bit-exactly; output packs") {
    val mergesDf = Bpe.train(corpus, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", mergesDf))
    val mx = vocab.values.max
    val (sep, eod) = (mx + 1L, mx + 2L)
    val pairs = df(pairSchema,
      Row(1L, "low lower", "newest widest"),
      Row(2L, null, "low"),
      Row(3L, "newest", "low low lower"))
    val viaPairs = Sft.assembleExamples(pairs, "id", "p", "r", merges,
        vocab, sepId = Some(sep), eodId = Some(eod))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2),
        r.getLong(3)))
    val degenerate = Map(
      "user" -> Sft.TurnTemplate(Nil, Seq(sep), loss = false),
      "assistant" -> Sft.TurnTemplate(Nil, Seq(eod), loss = true))
    val convs = pairs.select(col("id"), array(
      struct(lit("user").as("role"), col("p").as("content")),
      struct(lit("assistant").as("role"), col("r").as("content")))
      .as("turns"))
    val viaConv = Sft.assembleConversation(convs, "id", "turns", merges,
        vocab, degenerate, eodId = None)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2),
        r.getLong(4)))
    // same ids, same token counts, same mask boundary — bit-exact
    assert(viaConv.toSeq === viaPairs.toSeq)
    // and the output feeds packExamples unchanged
    val packed = Sft.packExamples(
      Sft.assembleConversation(convs, "id", "turns", merges, vocab,
        degenerate), "id", "input_ids", windowSize = 64,
      padId = Some(mx + 9L))
    assert(packed.count() >= 1L)
  }

  test("assemblePreferencePairs: shared prompt prefix, one boundary, both-sides row policy") {
    val mergesDf = Bpe.train(corpus, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", mergesDf))
    val mx = vocab.values.max
    val (sep, eod) = (mx + 1L, mx + 2L)
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("p", StringType), StructField("c", StringType),
      StructField("r", StringType)))
    val pairs = df(sch,
      Row(1L, "low lower", "newest", "widest"),
      Row(2L, "low", null, "widest"),   // missing chosen drops
      Row(3L, "low", "newest", " "))    // zero-token rejected drops
    val got = Sft.assemblePreferencePairs(pairs, "id", "p", "c", "r",
        merges, vocab, Some(sep), Some(eod))
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    val row = got.head
    val chosen = row.getSeq[Long](1)
    val rejected = row.getSeq[Long](2)
    val lossFrom = row.getLong(5)
    // both sequences share the prompt prefix bit-identically
    assert(chosen.take(lossFrom.toInt) == rejected.take(lossFrom.toInt))
    assert(chosen.take(lossFrom.toInt) ==
      Seq(vocab("low"), vocab("low"), vocab("e"), vocab("r"), sep))
    assert(chosen.drop(lossFrom.toInt) == Seq(vocab("newest"), eod))
    assert(rejected.drop(lossFrom.toInt) ==
      Seq(vocab("w"), vocab("i"), vocab("dest"), eod))
    assert(row.getLong(3) == chosen.length &&
      row.getLong(4) == rejected.length)
    // maxLen applies to EITHER side: rejected (9 ids) over an 8 bound
    assert(Sft.assemblePreferencePairs(pairs, "id", "p", "c", "r",
      merges, vocab, Some(sep), Some(eod), maxLen = Some(8L))
      .count() == 0)
    intercept[IllegalArgumentException] {
      Sft.assemblePreferencePairs(pairs, "id", "p", "c", "r", merges,
        vocab, sepId = Some(vocab("low")))
    }
  }

  test("tokenizer switch: SFT assembly under wordpiece and metaspace-unigram stamps — ids equal the families' own indexed encodes; refusals") {
    import graft.llm.{Unigram, WordPiece}
    val docSch = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    // --- wordpiece stamp ---
    val wpPath = java.nio.file.Files
      .createTempDirectory("graft_sftwp").toString
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        Row("[UNK]", 0L), Row("low", 1L), Row("##er", 2L),
        Row("new", 3L), Row("##est", 4L), Row("wide", 5L)),
      "sftwp", wpPath)
    // --- metaspace unigram stamp ---
    val uniPath = java.nio.file.Files
      .createTempDirectory("graft_sftuni").toString
    Unigram.importUnigramModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("logp", DoubleType), StructField("piece_id", LongType))),
        Row("▁", -2.0, 0L), Row("▁low", -2.5, 1L), Row("▁new", -2.6, 2L),
        Row("l", -2.4, 3L), Row("o", -2.45, 4L), Row("w", -2.55, 5L),
        Row("e", -2.35, 6L), Row("r", -2.65, 7L)),
      "sftuni", uniPath, metaspace = true)
    try {
      val pairs = df(pairSchema,
        Row(1L, "low lower", "newest wide"),
        Row(2L, null, "low"))
      def familyIds(enc: DataFrame => DataFrame, text: String): Seq[Long] =
        if (text == null) Seq.empty
        else enc(df(docSch, Row(0L, text)))
          .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      // wordpiece: the assembled ids must BE the family's indexed
      // encode of each side, joined by the structural ids
      val wpEnc = (d: DataFrame) =>
        WordPiece.encodeIdsIndexed(spark, "sftwp", wpPath, d,
          "doc_id", "text")
      val wpGot = graft.llm.Sft.assembleExamplesIndexed(spark, "sftwp",
          wpPath, pairs, "id", "p", "r", sepId = Some(900L),
          eodId = Some(901L), tokenizer = "wordpiece")
        .orderBy("id").collect()
      assert(wpGot.map(_.getLong(0)).toSeq === Seq(1L, 2L))
      Seq((wpGot(0), "low lower", "newest wide"),
        (wpGot(1), null, "low")).foreach { case (row, p, r) =>
        val exp = familyIds(wpEnc, p) ++ Seq(900L) ++
          familyIds(wpEnc, r) ++ Seq(901L)
        assert(row.getSeq[Long](1) === exp, s"prompt '$p'")
        assert(row.getLong(3) === familyIds(wpEnc, p).length + 1L)
      }
      // unigram + metaspace: the stamped ▁ transform rides the SFT
      // assembly exactly like the family's own serve
      val uniEnc = (d: DataFrame) =>
        Unigram.encodeIdsIndexed(spark, "sftuni", uniPath, d,
          "doc_id", "text")
      val uniGot = graft.llm.Sft.assembleExamplesIndexed(spark, "sftuni",
          uniPath, pairs, "id", "p", "r", sepId = Some(900L),
          eodId = Some(901L), tokenizer = "unigram")
        .orderBy("id").collect()
      Seq((uniGot(0), "low lower", "newest wide"),
        (uniGot(1), null, "low")).foreach { case (row, p, r) =>
        val exp = familyIds(uniEnc, p) ++ Seq(900L) ++
          familyIds(uniEnc, r) ++ Seq(901L)
        assert(row.getSeq[Long](1) === exp, s"prompt '$p'")
      }
      // '▁low' (1) must appear — the metaspace pieces, not char salad
      assert(uniGot(0).getSeq[Long](1).contains(1L))
      // collision refusal checks the FAMILY's id space
      assert(intercept[IllegalArgumentException] {
        graft.llm.Sft.assembleExamplesIndexed(spark, "sftwp", wpPath,
          pairs, "id", "p", "r", sepId = Some(2L),
          tokenizer = "wordpiece")
      }.getMessage.contains("collides"))
      // unknown switch refuses
      assert(intercept[IllegalArgumentException] {
        graft.llm.Sft.assembleExamplesIndexed(spark, "sftwp", wpPath,
          pairs, "id", "p", "r", tokenizer = "sentencepiece")
      }.getMessage.contains("unknown tokenizer"))
      // conversations ride the same switch (degenerate template ≡
      // examples, here under the wordpiece stamp)
      val convs = pairs.select(col("id"), array(
        struct(lit("user").as("role"), col("p").as("content")),
        struct(lit("assistant").as("role"), col("r").as("content")))
        .as("turns"))
      val viaConv = graft.llm.Sft.assembleConversationIndexed(spark,
          "sftwp", wpPath, convs, "id", "turns",
          Map("user" -> graft.llm.Sft.TurnTemplate(Nil, Seq(900L), false),
            "assistant" -> graft.llm.Sft.TurnTemplate(Nil, Seq(901L), true)),
          tokenizer = "wordpiece")
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(4)))
      assert(viaConv.toSeq === wpGot.map(r =>
        (r.getLong(0), r.getSeq[Long](1), r.getLong(3))).toSeq)
    } finally {
      Seq("sftwp_wp", "sftuni_uni").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("writeConversationWindows: conversations land with a loss-SPANS sidecar; fsck, O(1) replay, mask reconstruction") {
    val mdl = java.nio.file.Files
      .createTempDirectory("graft_cvw_mdl").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_cvw_out").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "cvw", mdl, numMerges = 6)
      val mx = Bpe.vocabMap(spark.table("cvw_bpe_vocab")).values.max
      val (u, a, end, eod, pad) = (mx + 1L, mx + 2L, mx + 3L, mx + 4L,
        mx + 5L)
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val convs = docs.filter(col("doc_id") < 120)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"), array(
          struct(lit("user").as("role"),
            array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
              .as("content")),
          struct(lit("assistant").as("role"),
            array_join(slice(col("__ws__"), col("__np__") + 1,
              size(col("__ws__")) - col("__np__")), " ").as("content")))
          .as("turns"))
      val template = Sft.chatTemplate(
        Map("user" -> u, "assistant" -> a), end)
      val c1 = Sft.writeConversationWindows(spark, convs, "doc_id",
        "turns", template, "cvw", mdl, out, windowSize = 256L,
        eodId = Some(eod), padId = Some(pad))
      assert(c1("input") > 0 && c1("examples") > 0, s"$c1")
      // windows-landing schema; sidecar carries the spans AND the
      // single-boundary compatibility field
      val win = spark.read.parquet(out)
      assert(win.columns.sorted.sameElements(Array("doc_spans",
        "n_tokens", "split", "window_id", "window_ids")))
      val side = spark.read.parquet(s"$out/_losssidecar")
      assert(side.columns.sorted.sameElements(Array("doc_id",
        "loss_from", "loss_spans", "n_tokens", "split")))
      // conservation: landed span mass equals the sidecar example mass
      val spanMass = win
        .select(explode(col("doc_spans")).as("sp"))
        .groupBy(col("sp.id").as("doc_id"))
        .agg(sum("sp.len").as("m"))
      val both = spanMass.join(side, Seq("doc_id"))
      assert(both.count() == side.count() &&
        both.filter(col("m") =!= col("n_tokens")).count() == 0)
      // fsck green; report reads the conversation landing unchanged
      val rep = Sft.sftWindowsReport(spark, out, 256L).collect()
      assert(rep.nonEmpty && rep.forall(r =>
        r.getAs[Boolean]("tokens_match") && r.getAs[Boolean]("manifest")),
        rep.mkString(";"))
      // mask reconstruction: for one landed example, composing its
      // doc_span offset with its loss spans lands inside the window and
      // the first loss position decodes the example's loss_from
      val ex = side.filter(col("split") === "train").head()
      val exId = ex.getLong(ex.fieldIndex("doc_id"))
      val sp = win.select(col("window_ids"),
          explode(col("doc_spans")).as("sp"))
        .filter(col("sp.id") === exId).head()
      val pos0 = sp.getStruct(1).getLong(1)
      val firstLoss = ex.getSeq[org.apache.spark.sql.Row](
        ex.fieldIndex("loss_spans")).head.getLong(0)
      assert(ex.getLong(ex.fieldIndex("loss_from")) === firstLoss)
      // the first loss position of this example inside the window is
      // the assistant role id's successor — i.e. a REAL id position
      assert(pos0 + firstLoss < sp.getSeq[Long](0).length)
      // O(1) replay
      assert(Sft.writeConversationWindows(spark, convs.limit(1),
        "doc_id", "turns", template, "cvw", mdl, out, 256L) == c1)
    } finally {
      Seq("cvw_bpe", "cvw_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("writeSftWindows: landed splits, sidecar masks, O(1) replay, fsck, screen compatibility") {
    val mdl = java.nio.file.Files
      .createTempDirectory("graft_sftw_mdl").toString
    val out = java.nio.file.Files
      .createTempDirectory("graft_sftw_out").toString
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "sftw", mdl, numMerges = 6)
      val vocab = Bpe.vocabMap(spark.table("sftw_bpe_vocab"))
      val mx = vocab.values.max
      val (sep, eod, pad) = (mx + 1L, mx + 2L, mx + 3L)
      val words = filter(split(col("text"), " ", -1), w => length(w) >= 1)
      val pairs = docs.filter(col("doc_id") < 120)
        .withColumn("__ws__", words)
        .filter(size(col("__ws__")) >= 2)
        .withColumn("__np__", (size(col("__ws__")) / 2).cast("int"))
        .select(col("doc_id"),
          array_join(slice(col("__ws__"), lit(1), col("__np__")), " ")
            .as("prompt"),
          array_join(slice(col("__ws__"), col("__np__") + 1,
            size(col("__ws__")) - col("__np__")), " ").as("response"))
      val c1 = Sft.writeSftWindows(spark, pairs, "doc_id", "prompt",
        "response", "sftw", mdl, out, windowSize = 256L,
        sepId = Some(sep), eodId = Some(eod), padId = Some(pad))
      assert(c1("input") > 0 && c1("examples") > 0, s"$c1")
      assert(c1.keys.exists(_.endsWith("_windows")), s"$c1")
      // truncation=prompt_left at a TIGHT budget: the overlong-drop
      // count goes to zero — every example whose response fits lands
      // (prompt truncated to the window), vs the default landing
      // which drops them whole
      val outT = java.nio.file.Files
        .createTempDirectory("graft_sftw_outt").toString
      val outD = java.nio.file.Files
        .createTempDirectory("graft_sftw_outd").toString
      try {
        // a planted long-prompt/short-response pair: always truncates
        // IN under prompt_left, always drops under the default
        val planted = pairs.unionByName(df(
          StructType(Seq(StructField("doc_id", LongType),
            StructField("prompt", StringType),
            StructField("response", StringType))),
          Row(100000L, Seq.fill(200)("low").mkString(" "), "low")))
        val cT = Sft.writeSftWindows(spark, planted, "doc_id", "prompt",
          "response", "sftw", mdl, outT, windowSize = 48L,
          sepId = Some(sep), eodId = Some(eod), padId = Some(pad),
          truncation = "prompt_left")
        val cD = Sft.writeSftWindows(spark, planted, "doc_id", "prompt",
          "response", "sftw", mdl, outD, windowSize = 48L,
          sepId = Some(sep), eodId = Some(eod), padId = Some(pad))
        assert(cD("dropped_overlong") > 0,
          s"the 48-id budget must make the drop population live: $cD")
        // prompt_left never drops at the landing: everything whose
        // response fits was truncated to the budget at assembly
        assert(cT("dropped_overlong") === 0L, s"$cT")
        val landedT = cT("examples") - cT("dropped_overlong")
        val landedD = cD("examples") - cD("dropped_overlong")
        assert(landedT > landedD,
          s"the planted pair must land truncated ($landedT vs $landedD)")
      } finally Seq(outT, outD).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(d)))
      // landed schema is the windows-landing schema (+ spans)
      val win = spark.read.parquet(out)
      assert(win.columns.sorted.sameElements(Array("doc_spans",
        "n_tokens", "split", "window_id", "window_ids")))
      // padId fixes the shape; n_tokens counts real ids only
      assert(win.filter(size(col("window_ids")) =!= 256).count() == 0)
      // sidecar completes the masks: every landed example has exactly
      // one boundary row, and the span masses agree with it
      val side = spark.read.parquet(s"$out/_losssidecar")
      val spanMass = win
        .select(explode(col("doc_spans")).as("sp"))
        .groupBy(col("sp.id").as("doc_id"))
        .agg(sum("sp.len").as("m"))
      val both = spanMass.join(side, Seq("doc_id"))
      assert(both.count() == side.count())
      assert(both.filter(col("m") =!= col("n_tokens")).count() == 0,
        "sidecar token mass must equal the landed span mass per example")
      // fsck green; O(1) replay returns the manifest
      val rep = Sft.sftWindowsReport(spark, out, 256L).collect()
      assert(rep.nonEmpty && rep.forall(r =>
        r.getAs[Boolean]("tokens_match") && r.getAs[Boolean]("manifest")),
        rep.mkString(";"))
      assert(rep.forall(r => r.getAs[Double]("fill_rate") > 0.3),
        rep.mkString(";"))
      assert(Sft.writeSftWindows(spark, pairs.limit(1), "doc_id",
        "prompt", "response", "sftw", mdl, out, 256L) == c1,
        "manifest must O(1)-replay regardless of the new input")
      // the landed shape feeds the id-space contamination screen
      // unchanged: a benchmark made of one landed response must hit,
      // and resolve to its example id (packed=true rides along only to
      // satisfy the padId spec contract — the screen reads model +
      // structural ids from it)
      val benchRow = pairs.filter(col("doc_id") === 2L)
        .select(col("response").as("text"))
      val screen = Pipeline.windowsContaminationScreen(spark, out,
        benchRow, "text",
        Pipeline.BpeWindows("sftw", mdl, eodId = Some(eod),
          packed = true, padId = Some(pad)), k = 5).collect()
      assert(screen.nonEmpty, "the planted response must be found")
      assert(screen.flatMap(_.getSeq[Long](
        screen.head.fieldIndex("doc_ids"))).contains(2L), screen.mkString(";"))
      // the fleet eye: healthy landing = all-none via maintainAll; a
      // deleted manifest is indicated (observe-only — never fired)
      val sweep = graft.llm.Maintain.maintainAll(spark, Seq(
        "sftw" -> graft.llm.Maintain.SftWindowsTarget(out, 256L)))
      val checks = sweep.collect().map(r =>
        r.getString(1) -> (r.getBoolean(4), r.getString(5))).toMap
      assert(checks("manifest")._2 == "none" &&
        checks("token_conservation")._2 == "none", checks.toString)
      assert(sweep.filter(col("fired")).count() == 0,
        "the SFT sink is observe-and-indicate only")
      new java.io.File(out, "_graft_sft_manifest.json").delete()
      val sweep2 = graft.llm.Maintain.maintainSftWindows(spark, out, 256L)
        .collect().map(r => r.getString(0) -> r.getString(4)).toMap
      assert(sweep2("manifest").contains("replay writeSftWindows"),
        sweep2.toString)
    } finally {
      Seq("sftw_bpe", "sftw_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("packExamples: whole-example packing, pad shape, span-based mask reconstruction, refusals") {
    val mergesDf = Bpe.train(corpus, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", mergesDf))
    val mx = vocab.values.max
    val (sep, eod, pad) = (mx + 1L, mx + 2L, mx + 3L)
    val pairs = df(pairSchema, (1L to 12L).map(i =>
      Row(i, "low lower", "newest widest")): _*)
    val examples = Sft.assembleExamples(pairs, "id", "p", "r", merges,
      vocab, Some(sep), Some(eod)) // 10 ids each
    val packed = Sft.packExamples(examples, "id", "input_ids", 32L,
      seed = 3L, padId = Some(pad))
    val rows = packed.orderBy("window_id").collect()
    // 12 examples x 10 ids into 32-slots: 3 per window, 4 windows
    assert(rows.length == 4, s"${rows.length}")
    rows.foreach { r =>
      val ids = r.getSeq[Long](1)
      assert(ids.length == 32, "padId must fix the shape")
      val n = r.getLong(2)
      assert(n == 30L && ids.drop(30).forall(_ == pad))
      // spans tile the real ids exactly
      val spans = r.getSeq[Row](3)
      assert(spans.map(_.getLong(2)).sum == n)
      assert(spans.map(_.getLong(1)).toSeq ==
        spans.scanLeft(0L)((acc, sp) => acc + sp.getLong(2)).init)
      // mask reconstruction: position p of span (id, pos, len) is a
      // loss position iff p - pos >= loss_from(id); with uniform
      // loss_from = 5, each span contributes 5 loss positions
      val lossFrom = examples.select("id", "loss_from").collect()
        .map(r2 => r2.getLong(0) -> r2.getLong(1)).toMap
      val lossPositions = (0L until n).count { p =>
        val sp = spans.find(s =>
          p >= s.getLong(1) && p < s.getLong(1) + s.getLong(2)).get
        p - sp.getLong(1) >= lossFrom(sp.getLong(0))
      }
      assert(lossPositions == spans.length * 5,
        "each packed example must contribute its response+eod mass")
    }
    // every example lands exactly once, whole
    val allSpans = rows.flatMap(_.getSeq[Row](3))
    assert(allSpans.map(_.getLong(0)).sorted.toSeq == (1L to 12L).toSeq)
    // deterministic under repartition
    val again = Sft.packExamples(
        examples.repartition(7), "id", "input_ids", 32L,
        seed = 3L, padId = Some(pad))
      .orderBy("window_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(again == rows.map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq)
    // an example over windowSize refuses (mask alignment would break)
    val ex = intercept[IllegalArgumentException] {
      Sft.packExamples(examples, "id", "input_ids", 8L)
    }
    assert(ex.getMessage.contains("loss-mask"), ex.getMessage)
  }

  test("bucketByLength: capacity assignment, dense batches, determinism, dropIncomplete, refusals") {
    val exSchema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    val ex = df(exSchema, Row(1L, 3L), Row(2L, 5L), Row(3L, 8L),
      Row(4L, 9L), Row(5L, 16L), Row(6L, 2L), Row(7L, 17L), Row(8L, 4L))
    val got = Sft.bucketByLength(ex, "id", "n", Seq(8L, 16L, 32L),
      batchSize = 2, seed = 0L)
    val rows = got.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("bucket_cap"), r.getAs[Long]("batch_id"),
        r.getAs[Long]("pos_in_batch"), r.getAs[Long]("pad"))).toMap
    // capacity = smallest boundary holding n
    assert(rows(1L)._1 === 8L && rows(4L)._1 === 16L && rows(7L)._1 === 32L)
    assert(rows(1L)._4 === 5L && rows(5L)._4 === 0L)
    // bucket 8 holds {1,2,3,6,8} -> 3 batches (ids 0..2), bucket 16
    // holds {4,5} -> batch 3, bucket 32 holds {7} -> batch 4: DENSE
    val byBucket = got.collect().groupBy(_.getAs[Long]("bucket_cap"))
    assert(byBucket(8L).map(_.getAs[Long]("batch_id")).toSet === Set(0L, 1L, 2L))
    assert(byBucket(16L).map(_.getAs[Long]("batch_id")).toSet === Set(3L))
    assert(byBucket(32L).map(_.getAs[Long]("batch_id")).toSet === Set(4L))
    // every batch holds <= batchSize with positions 0..size-1
    got.collect().groupBy(_.getAs[Long]("batch_id")).foreach { case (_, b) =>
      assert(b.length <= 2)
      assert(b.map(_.getAs[Long]("pos_in_batch")).sorted.toSeq ===
        (0 until b.length).map(_.toLong))
    }
    // deterministic under repartitioning
    val again = Sft.bucketByLength(ex.repartition(7), "id", "n",
      Seq(8L, 16L, 32L), batchSize = 2, seed = 0L)
    assert(collectSorted(again, "id") === collectSorted(got, "id"))
    // dropIncomplete keeps only full batches: bucket 8 keeps 2 of 3
    // batches (4 rows), buckets 16 keeps its full pair, 32 drops
    val full = Sft.bucketByLength(ex, "id", "n", Seq(8L, 16L, 32L),
      batchSize = 2, seed = 0L, dropIncomplete = true)
    val fb = full.collect().groupBy(_.getAs[Long]("bucket_cap"))
    assert(fb(8L).length === 4 && fb(16L).length === 2 && !fb.contains(32L))
    assert(fb.values.flatten.map(_.getAs[Long]("batch_id")).toSet ===
      Set(0L, 1L, 2L))
    // the report prices padding incl. partial-batch empty slots
    val rep = Sft.bucketReport(got, "n", 2).collect()
      .map(r => r.getAs[Long]("bucket_cap") -> r).toMap
    assert(rep(8L).getAs[Long]("n_examples") === 5L)
    assert(rep(8L).getAs[Long]("n_batches") === 3L)
    assert(rep(8L).getAs[Long]("n_tokens") === 22L) // 3+5+8+2+4
    // pad counts ALL empty slots: 3 batches x 2 x 8 = 48 slots, 22
    // real tokens -> 26 (the partial batch's missing example included)
    assert(rep(8L).getAs[Long]("n_pad") === 26L)
    assert(rep(8L).getAs[Long]("n_tokens") + rep(8L).getAs[Long]("n_pad")
      === 3L * 2L * 8L)
    assert(rep(8L).getAs[Double]("fill_rate") === 22.0 / (3 * 2 * 8))
    // an over-boundary example refuses loudly at execution
    val e = intercept[Exception] {
      Sft.bucketByLength(df(exSchema, Row(1L, 40L)), "id", "n",
        Seq(8L, 16L, 32L), batchSize = 2, seed = 0L).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("largest boundary") ||
        e.getCause != null &&
          e.getCause.getMessage.contains("largest boundary")))
    // structural refusals
    assert(intercept[IllegalArgumentException] {
      Sft.bucketByLength(ex, "id", "n", Seq(16L, 8L), 2, 0L)
    }.getMessage.contains("ascending"))
    assert(intercept[IllegalArgumentException] {
      Sft.bucketByLength(ex.withColumn("id", col("id").cast("double")),
        "id", "n", Seq(8L), 2, 0L)
    }.getMessage.contains("integral"))
  }
}
