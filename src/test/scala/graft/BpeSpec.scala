package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.BpeEncode
import graft.llm.Bpe

/** BPE tokenizer training + distributed encode (r13). The driver gate
  * value-checks the distributed surfaces (pair counts, the unrolled
  * training replay, the encode, the vocab) in DuckDB; these specs pin
  * the parts SQL can't reach plus the classic hand-computed example. */
class BpeSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** The Sennrich-paper-style fixture (code-point symbols, no
    * end-of-word marker — this library's documented variant). */
  private def classic = df(docSchema,
    Row(1L, "low low low low low"),
    Row(2L, "lower lower"),
    Row(3L, "newest newest newest newest newest newest"),
    Row(4L, "widest widest widest"))

  test("train reproduces the hand-computed classic merge sequence") {
    val merges = Bpe.train(classic, "text", numMerges = 8)
      .orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    val expected = Seq(
      (0, "e", "s", "es", 9L), (1, "es", "t", "est", 9L),
      (2, "l", "o", "lo", 7L), (3, "lo", "w", "low", 7L),
      (4, "e", "w", "ew", 6L), (5, "ew", "est", "ewest", 6L),
      (6, "n", "ewest", "newest", 6L), (7, "d", "est", "dest", 3L))
    assert(merges.toSeq == expected)
  }

  test("encode segments the classic fixture as trained; lossless round trip") {
    val merges = Bpe.mergeList(Bpe.train(classic, "text", 8))
    assert(BpeEncode.encodeWord("low", merges).toSeq == Seq("low"))
    assert(BpeEncode.encodeWord("lower", merges).toSeq == Seq("low", "e", "r"))
    assert(BpeEncode.encodeWord("newest", merges).toSeq == Seq("newest"))
    assert(BpeEncode.encodeWord("widest", merges).toSeq == Seq("w", "i", "dest"))
    // lossless: concatenating tokens reproduces any word, including ones
    // training never saw (OOV chars degrade to singletons, never error)
    Seq("lowest", "slower", "zzz!", "𝄞clef", "").foreach { w =>
      assert(BpeEncode.encodeWord(w, merges).mkString == w)
    }
  }

  test("greedy left-to-right merge on overlapping runs (aaa) and rank order") {
    // merge (a,a) over "aaaa" greedily: (aa)(aa); over "aaa": (aa)a
    assert(BpeEncode.encodeWord("aaa", Seq(("a", "a"))).toSeq == Seq("aa", "a"))
    assert(BpeEncode.encodeWord("aaaa", Seq(("a", "a"))).toSeq == Seq("aa", "aa"))
    // rank order matters: (a,a) then (aa,a) consumes the leftover;
    // the reverse order can't (no (aa,a) pair exists pre-merge)
    assert(BpeEncode.encodeWord("aaa", Seq(("a", "a"), ("aa", "a"))).toSeq
      == Seq("aaa"))
    assert(BpeEncode.encodeWord("aaa", Seq(("aa", "a"), ("a", "a"))).toSeq
      == Seq("aa", "a"))
  }

  test("stop-early below minPairCount; numMerges 0 yields code points") {
    val merges = Bpe.train(classic, "text", numMerges = 50, minPairCount = 4L)
    // counts from the classic sequence: ranks with pair_count >= 4 only
    assert(merges.count() == 7) // the 8th merge (d,est) has count 3
    assert(merges.agg(min(col("pair_count"))).collect()(0).getLong(0) >= 4L)
    val none = Bpe.train(classic, "text", numMerges = 0)
    assert(none.count() == 0)
    assert(BpeEncode.encodeWord("low", Seq.empty).toSeq == Seq("l", "o", "w"))
  }

  test("maxTypes refuses loudly on an over-bound type table") {
    val ex = intercept[IllegalArgumentException] {
      Bpe.train(classic, "text", 4, maxTypes = 2)
    }
    assert(ex.getMessage.contains("maxTypes"))
  }

  test("minWordCount: cutoff=1 is bit-identical; rare types drop before the bound; stamped and replayed on retrain") {
    // cutoff = 1 keeps every type: bit-identical to the unfiltered train
    val a = Bpe.train(classic, "text", 8).orderBy("rank").collect().toSeq
    val b = Bpe.train(classic, "text", 8, minWordCount = 1L)
      .orderBy("rank").collect().toSeq
    assert(a == b)
    // 50 hapax types + 2 frequent ones: over a maxTypes=10 bound the
    // train refuses (and the refusal names the relief knob); under
    // cutoff=5 only the frequent types survive and training proceeds
    val docs = df(docSchema,
      Row(1L, (1 to 50).map(i => s"unique$i").mkString(" ")),
      Row(2L, Array.fill(5)("low lower").mkString(" ")))
    val ex = intercept[IllegalArgumentException] {
      Bpe.train(docs, "text", 2, maxTypes = 10)
    }
    assert(ex.getMessage.contains("minWordCount"), ex.getMessage)
    val m = Bpe.train(docs, "text", 2, maxTypes = 10, minWordCount = 5L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    // types low(5) lower(5): (l,o) 10 wins the (o,w) tie by code
    // point, then (lo,w) 10
    assert(m.toSeq == Seq(("l", "o", 10L), ("lo", "w", 10L)))
    // the cutoff rides the stamp: a drift-fired retrain over an
    // over-bound fresh corpus must replay it, not refuse at cutoff 1
    val path = tmp("graft_bpe_mwc")
    try {
      Bpe.writeBpeModel(docs, "text", "mwc", path, numMerges = 2,
        maxTypes = 10, minWordCount = 5L)
      val fresh = df(docSchema,
        Row(1L, (1 to 50).map(i => s"fresh$i").mkString(" ")),
        Row(2L, Array.fill(6)("mid midst").mkString(" ")))
      val rep = graft.llm.Maintain.maintainBpe(spark, "mwc", path,
        freshSample = Some(df(docSchema, Row(9L, "ZZZ QQQ"))),
        freshCorpus = Some(fresh))
      val drift = rep.filter(col("check") === "oov_drift").head()
      assert(drift.getBoolean(3), "all-OOV sample must fire the retrain")
      // the retrain landed the FRESH corpus's merges (proves the
      // replayed cutoff let the over-bound type table through)
      assert(spark.table("mwc_bpe").count() == 2L)
      assert(spark.table("mwc_bpe").filter(col("merged") === "mid")
        .count() == 1L)
    } finally {
      Seq("mwc_bpe", "mwc_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path))
    }
  }

  test("train is deterministic under repartition") {
    val a = Bpe.train(classic.repartition(7), "text", 8)
      .orderBy("rank").collect().toSeq
    val b = Bpe.train(classic.coalesce(1), "text", 8)
      .orderBy("rank").collect().toSeq
    assert(a == b)
  }

  test("code-point tie-break and surrogate-safe symbols") {
    // two pairs with equal count: the code-point-smaller (left, right)
    // wins. U+FFFD < U+1D11E in code-point order (what Spark/DuckDB
    // binary collation sorts by), but a Java UTF-16 compareTo would
    // order 𝄞 FIRST (its lead surrogate 0xD834 < 0xFFFD) — this pins
    // the cpLess tie-break against that divergence.
    val docs = df(docSchema, Row(1L, "�q �q 𝄞q 𝄞q"))
    val m = Bpe.train(docs, "text", 1).collect()(0)
    assert((m.getString(1), m.getString(2)) == ("�", "q"))
    // supplementary chars stay whole symbols
    assert(BpeEncode.encodeWord("𝄞q", Seq(("𝄞", "q"))).toSeq == Seq("𝄞q"))
  }

  test("encodeTokens / tokenCounts / vocab / encodeIds over the fixture") {
    val mergesDf = Bpe.train(classic, "text", 8)
    val merges = Bpe.mergeList(mergesDf)
    val toks = Bpe.encodeTokens(classic, "doc_id", "text", merges)
    // doc 2: "lower lower" -> (low, e, r) x2 = 6 tokens
    assert(toks.filter(col("doc_id") === 2L).count() == 6)
    val counts = Bpe.tokenCounts(classic, "doc_id", "text", merges)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(counts.toSeq == Seq((1L, 5L), (2L, 6L), (3L, 6L), (4L, 9L)))
    val vocab = Bpe.vocabFrame(classic, "text", mergesDf)
    val vmap = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // base alphabet {d,e,i,l,n,o,r,s,t,w} ids 0..9 in code-point order
    assert(vmap("d") == 0L && vmap("w") == 9L)
    // merged ids = base size + rank
    assert(vmap("es") == 10L && vmap("dest") == 17L)
    val ids = Bpe.encodeIds(classic, "doc_id", "text", merges, vocab)
    assert(ids.filter(col("token_id") < 0).count() == 0)
    // OOV text: unseen chars carry -1, known ones resolve
    val oov = Bpe.encodeIds(
      df(docSchema, Row(9L, "low!")), "doc_id", "text", merges, vocab)
      .orderBy("tok_pos").collect().map(_.getLong(3))
    assert(oov.last == -1L && oov.head == vmap("low"))
  }

  // ---- the persisted model (the tenth maintained family) ----

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("persisted model round trip: encodeIndexed == one-shot; stampless refuses") {
    val path = tmp("graft_bpe_idx")
    Bpe.writeBpeModel(classic, "text", "bpet", path, numMerges = 8)
    val oneShot = Bpe.encodeTokens(classic, "doc_id", "text",
        Bpe.mergeList(Bpe.train(classic, "text", 8)))
      .orderBy("doc_id", "word_pos", "tok_pos").collect().toSeq
    val served = Bpe.encodeIndexed(spark, "bpet", path, classic,
        "doc_id", "text")
      .orderBy("doc_id", "word_pos", "tok_pos").collect().toSeq
    assert(served == oneShot)
    val ids = Bpe.encodeIdsIndexed(spark, "bpet", path, classic,
      "doc_id", "text")
    assert(ids.filter(col("token_id") < 0).count() == 0)
    val ex = intercept[IllegalArgumentException] {
      Bpe.encodeIndexed(spark, "bpet", tmp("graft_bpe_nostamp"),
        classic, "doc_id", "text")
    }
    assert(ex.getMessage.contains("stamp"))
  }

  test("bpeOovRate sees exactly the unseen-character mass") {
    val path = tmp("graft_bpe_oov")
    Bpe.writeBpeModel(classic, "text", "bpeo", path, numMerges = 8)
    // known text: zero OOV
    assert(Bpe.bpeOovRate(spark, "bpeo", path,
      df(docSchema, Row(1L, "low newest")), "text") == 0.0)
    // "zz!" -> tokens z, z, ! (3 OOV); "low" -> 1 token in-vocab
    val r = Bpe.bpeOovRate(spark, "bpeo", path,
      df(docSchema, Row(1L, "low zz!")), "text")
    assert(r == 3.0 / 4.0)
  }

  test("maintainBpe: drift fires the stamped retrain only with a fresh corpus") {
    val path = tmp("graft_bpe_m")
    Bpe.writeBpeModel(classic, "text", "bpem", path, numMerges = 8)
    val drifted = df(docSchema,
      Row(1L, "zzzz qqqq zzzz qqqq"), Row(2L, "zzzz qqqq zzzz qqqq"))
    val pol = graft.llm.Maintain.Policy(maxDriftDelta = 0.5)
    // indicated but unfireable: no fresh corpus
    val rep1 = graft.llm.Maintain.maintainBpe(spark, "bpem", path, pol,
        freshSample = Some(drifted))
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getString(4)))
    val d1 = rep1.find(_._1 == "oov_drift").get
    assert(!d1._2 && d1._3.contains("indicated"))
    // with the corpus: fires at the STAMPED geometry and the new vocab
    // absorbs the drifted chars
    val rep2 = graft.llm.Maintain.maintainBpe(spark, "bpem", path, pol,
        freshSample = Some(drifted),
        freshCorpus = Some(classic.unionByName(drifted)))
      .collect().map(r => (r.getString(0), r.getBoolean(3)))
    assert(rep2.find(_._1 == "oov_drift").get._2)
    assert(Bpe.bpeOovRate(spark, "bpem", path, drifted, "text") == 0.0)
    // the retrained model kept numMerges=8 (stamp-driven)
    assert(spark.table("bpem_bpe").count() == 8)
  }

  test("compaction preserves serving; fleet sweep reaches BpeTarget") {
    val path = tmp("graft_bpe_c")
    Bpe.writeBpeModel(classic, "text", "bpec", path, numMerges = 4)
    val before = Bpe.encodeIndexed(spark, "bpec", path, classic,
        "doc_id", "text")
      .orderBy("doc_id", "word_pos", "tok_pos").collect().toSeq
    Bpe.compactBpe(spark, "bpec")
    val after = Bpe.encodeIndexed(spark, "bpec", path, classic,
        "doc_id", "text")
      .orderBy("doc_id", "word_pos", "tok_pos").collect().toSeq
    assert(after == before)
    val sweep = graft.llm.Maintain.maintainAll(spark,
      Seq("bpe" -> graft.llm.Maintain.BpeTarget("bpec", path)))
      .collect()
    assert(sweep.map(_.getString(0)).toSet == Set("bpe"))
    assert(sweep.exists(r => r.getString(1) == "retraction" &&
      r.getString(5).contains("structurally absent")))
  }

  test("streaming encode picks up a mid-stream wholesale retrain") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = tmp("graft_bpe_srv")
    val path = s"$base/model"
    Bpe.writeBpeModel(classic, "text", "bpes", path, numMerges = 2)
    // merges after 2 ranks: (e,s), (es,t) -> "newest" = n,e,w,est
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.bpeEncodeStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "bpes_bpe", outPath = s"$base/out",
      checkpoint = s"$base/ckpt").start()
    try {
      in.addData(1L -> "newest")
      q.processAllAvailable()
      Bpe.writeBpeModel(classic, "text", "bpes", path, numMerges = 8)
      in.addData(2L -> "newest")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .orderBy("doc_id", "tok_pos").collect()
      .map(r => (r.getLong(0), r.getString(3)))
    assert(got.filter(_._1 == 1L).map(_._2).toSeq
      == Seq("n", "e", "w", "est"))
    assert(got.filter(_._1 == 2L).map(_._2).toSeq == Seq("newest"))
  }

  test("the expression memo cache returns consistent results across rows") {
    val merges = Bpe.mergeList(Bpe.train(classic, "text", 8))
    val many = df(docSchema,
      (1L to 200L).map(i => Row(i, "newest lower widest")): _*)
    val distinctSegs = Bpe.encodeTokens(many, "doc_id", "text", merges)
      .groupBy("doc_id")
      .agg(concat_ws("|", array_sort(collect_list(
        concat_ws(":", col("word_pos"), col("tok_pos"), col("token")))))
        .as("seg"))
      .select("seg").distinct().count()
    assert(distinctSegs == 1L)
  }

  test("byte-level mode: hex-pair symbols, lossless round trip through bytes, stamped level served end to end") {
    // byte symbolization splits multibyte characters: é = C3 A9,
    // 𝄞 (non-BMP) = F0 9D 84 9E — where code-point mode keeps them atomic
    assert(BpeEncode.byteSymbolsHex("hé").toSeq == Seq("68", "C3", "A9"))
    assert(BpeEncode.byteSymbolsHex("𝄞").toSeq ==
      Seq("F0", "9D", "84", "9E"))
    assert(BpeEncode.codePointSymbols("𝄞").toSeq == Seq("𝄞"))
    // training over bytes learns multibyte re-joins from data
    val corpus = df(docSchema,
      Row(1L, "héé héé héé héé"),
      Row(2L, "hé hé zz"))
    val merges = Bpe.mergeList(Bpe.train(corpus, "text", 4,
      byteLevel = true))
    // (C3,A9) dominates: 2/word in héé ×4 + 1/word in hé ×2 = 10
    assert(merges.head == (("C3", "A9")))
    // lossless round trip THROUGH BYTES for any input, training-seen
    // or not: un-hexing the concatenated tokens reproduces the word
    Seq("héé", "hé", "h", "中中", "𝄞clef", "zz", "").foreach { w =>
      val toks = BpeEncode.encodeWord(w, merges, byteLevel = true)
      val hexCat = toks.mkString
      val bytes = hexCat.grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray
      assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
        == w, s"byte round trip broke on '$w': $hexCat")
    }
    // the persisted family stamps the level and serves at it
    val base = java.nio.file.Files.createTempDirectory("graft_bpeb")
      .toString
    try {
      Bpe.writeBpeModel(corpus, "text", "bpeb", base, numMerges = 4,
        byteLevel = true)
      val docs = df(docSchema, Row(10L, "héé zz"))
      val want = Bpe.encodeTokens(docs, "doc_id", "text", merges,
          byteLevel = true)
        .orderBy("word_pos", "tok_pos").collect()
        .map(_.getString(3)).toSeq
      val got = Bpe.encodeIndexed(spark, "bpeb", base, docs, "doc_id",
          "text")
        .orderBy("word_pos", "tok_pos").collect()
        .map(_.getString(3)).toSeq
      assert(got == want, s"$got != $want")
      assert(got.forall(_.matches("[0-9A-F]+")),
        "served tokens must be hex strings — the stamped byte level")
      // vocab ids: base alphabet is the corpus's distinct BYTES (hex
      // order == byte order), and the id-space windows ride the
      // stamped level through BpeWindows resolution
      val vocab = Bpe.vocabMap(spark.table("bpeb_bpe_vocab"))
      assert(vocab.keys.filter(_.length == 2)
        .forall(_.matches("[0-9A-F]{2}")))
      val win = Bpe.assembleWindowsIds(docs, "doc_id", "text", 3L, 0L,
        merges, vocab, byteLevel = true)
      val mass = win.agg(sum("n_tokens")).head().getLong(0)
      val wantMass = Bpe.tokenCounts(docs, "doc_id", "text", merges,
        byteLevel = true).agg(sum("n_tokens")).head().getLong(0)
      assert(mass == wantMass)
      // drift observable serves at the stamped level too: byte-level
      // models NEVER see OOV ids from new scripts (the GPT-2 property)
      assert(Bpe.bpeOovRate(spark, "bpeb", base,
        df(docSchema, Row(99L, "中中 𝄞 entirely new")), "text") == 0.0)
    } finally {
      Seq("bpeb_bpe", "bpeb_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }

  test("GPT-2 pre-tokenization: leading spaces ride into tokens, detokenization is concatenation, stamped pattern served") {
    val pat = Bpe.Gpt2WordPattern
    val corpus = df(docSchema,
      Row(1L, "the cat, the cat! 42 cats"),
      Row(2L, "héé the cat 42"))
    // words carry ONE leading space; concatenating ALL words of a doc
    // reproduces the text up to multi-space runs — for single-spaced
    // text, exactly
    val words = Bpe.wordCounts(corpus, "text", Some(pat))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(words.contains(" cat") && words.contains("the"))
    assert(words(" cat") == 3L) // two in doc 1, one in doc 2 (' cats' is its own word)
    assert(words.contains(",") && words.contains("!"))
    assert(words.contains(" 42"))
    // detokenization-by-concatenation: encode then concat bytes == text
    val merges = Bpe.mergeList(Bpe.train(corpus, "text", 6,
      byteLevel = true, wordPattern = Some(pat)))
    val toks = Bpe.encodeTokens(corpus.filter(col("doc_id") === 1L),
        "doc_id", "text", merges, byteLevel = true,
        wordPattern = Some(pat))
      .orderBy("word_pos", "tok_pos").collect().map(_.getString(3))
    val bytes = toks.mkString.grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray
    assert(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      == "the cat, the cat! 42 cats",
      "GPT-2 tokens must concatenate back to the original text")
    // the persisted family stamps the pattern (with its regex
    // backslashes JSON-escaped) and serves it
    val base = java.nio.file.Files.createTempDirectory("graft_bpeg")
      .toString
    try {
      Bpe.writeBpeModel(corpus, "text", "bpeg", base, numMerges = 6,
        byteLevel = true, wordPattern = Some(pat))
      val want = Bpe.encodeTokens(corpus, "doc_id", "text", merges,
          byteLevel = true, wordPattern = Some(pat))
        .orderBy("doc_id", "word_pos", "tok_pos").collect()
        .map(_.getString(3)).toSeq
      val got = Bpe.encodeIndexed(spark, "bpeg", base, corpus,
          "doc_id", "text")
        .orderBy("doc_id", "word_pos", "tok_pos").collect()
        .map(_.getString(3)).toSeq
      assert(got == want,
        "the indexed serve must replay the stamped pattern + level")
    } finally {
      Seq("bpeg_bpe", "bpeg_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }

  test("detokenizeIndexed: landed id windows read back as the original text under a GPT-2 model") {
    val pat = Bpe.Gpt2WordPattern
    val corpus = df(docSchema,
      Row(1L, "the cat sat, the cat sat again! 42"),
      Row(2L, "héé sat on the mat while the cat watched"),
      Row(3L, "a dog barked at the cat and the cat sat"))
    val base = java.nio.file.Files.createTempDirectory("graft_detok")
      .toString
    try {
      Bpe.writeBpeModel(corpus, "text", "dtk", base, numMerges = 6,
        byteLevel = true, wordPattern = Some(pat))
      // per-doc round trip: encode to ids, detokenize back — exact
      val merges = Bpe.mergeList(spark.table("dtk_bpe"))
      val vocab = Bpe.vocabMap(spark.table("dtk_bpe_vocab"))
      val perDoc = corpus.select(col("doc_id"), col("text"),
        Bpe.detokenizeIndexed(spark, "dtk", base,
          flatten(transform(
            filter(regexp_extract_all(col("text"), lit(pat), lit(0)),
              w => length(w) >= 1),
            w => graft.functions.TextHashExprs
              .bpeEncodeIds(w, merges, vocab, byteLevel = true))))
          .as("rt"))
        .collect()
      perDoc.foreach(r => assert(r.getString(2) == r.getString(1),
        s"doc ${r.getLong(0)}: '${r.getString(2)}' != '${r.getString(1)}'"))
      // window round trip: flatten the id windows in order, detokenize
      // the whole stream — equals the docs' texts concatenated in the
      // permutation order (GPT-2: single-spaced text reproduces byte
      // for byte; doc boundaries butt together without a separator)
      val win = Bpe.assembleWindowsIds(corpus, "doc_id", "text", 7L, 0L,
          merges, vocab, byteLevel = true, wordPattern = Some(pat))
        .orderBy("window_id")
      val streamTxt = win
        .agg(Bpe.detokenizeIndexed(spark, "dtk", base,
          flatten(transform(
            array_sort(collect_list(struct(col("window_id"),
              col("window_ids")))),
            s => s.getField("window_ids")))).as("t"))
        .head().getString(0)
      def h(id: Long): Long = {
        val m = 2147483648L
        (((id % m) + m) % m * 2654435761L) % 4294967296L
      }
      val want = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy { case (i, _) => (h(i), i) }.map(_._2).mkString
      assert(streamTxt == want, s"'$streamTxt' != '$want'")
      // OOV ids render as the replacement character, never throw
      import spark.implicits._
      val bad = Seq(Seq(-1L, 0L)).toDF("ids")
        .select(Bpe.detokenizeIndexed(spark, "dtk", base, col("ids")))
        .head().getString(0)
      assert(bad.startsWith("\ufffd"), bad)
    } finally {
      Seq("dtk_bpe", "dtk_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }

  // ---- imported pretrained tokenizer (r15) ----

  /** The public GPT-2 bytes→alias construction, rebuilt independently
    * in the spec so the engine's inverse table is pinned against the
    * published algorithm, not against itself. */
  private def gpt2AliasAlphabet: Seq[(String, Long)] = {
    val printable = (0x21 to 0x7E) ++ (0xA1 to 0xAC) ++ (0xAE to 0xFF)
    val direct = printable.map(b => (b.toChar.toString, b.toLong))
    val printSet = printable.toSet
    val rest = (0 until 256).filterNot(printSet).zipWithIndex
      .map { case (b, n) => ((256 + n).toChar.toString, b.toLong) }
    direct ++ rest
  }

  test("importBpeModel: published GPT-2-style pair reproduces known ids bit-exactly, round-trips, and lands windows") {
    import spark.implicits._
    // the alias decode itself: space aliases to Ġ (U+0120), printable
    // ASCII to itself; out-of-alphabet chars refuse
    assert(Bpe.gpt2AliasToHex("Ġ") == "20")
    assert(Bpe.gpt2AliasToHex("the") == "746865")
    assert(Bpe.gpt2AliasToHex("Ġcat") == "20636174")
    intercept[IllegalArgumentException] { Bpe.gpt2AliasToHex("中") }
    val path = tmp("graft_bpe_imp")
    try {
      // hand-constructed published-style pair: merges.txt line order,
      // vocab.json token→id map over the full 256-byte base alphabet
      // plus every merged surface
      val merges = Seq((0, "t", "h"), (1, "th", "e"), (2, "a", "t"),
        (3, "Ġ", "c"), (4, "Ġc", "at"))
        .toDF("rank", "left", "right")
      val vocab = (gpt2AliasAlphabet ++ Seq(("th", 256L), ("the", 257L),
        ("at", 258L), ("Ġc", 259L), ("Ġcat", 260L)))
        .toDF("token", "token_id")
      Bpe.importBpeModel(spark, merges, vocab, "impg", path,
        gpt2Alias = true)
      // KNOWN ids, bit-exact: "the cat" → [the][Ġcat] = [257, 260]
      val got = Bpe.encodeIdsIndexed(spark, "impg", path,
          Seq((1L, "the cat")).toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      assert(got == Seq(257L, 260L), s"$got")
      // un-merged text falls back to base byte ids (= byte values here)
      val hat = Bpe.encodeIdsIndexed(spark, "impg", path,
          Seq((1L, "ha")).toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("tok_pos").collect().map(_.getLong(3)).toSeq
      assert(hat == Seq(0x68L, 0x61L), s"$hat")
      // detokenize inverse through the stamped model
      val rt = Seq(Seq(257L, 260L)).toDF("ids")
        .select(Bpe.detokenizeIndexed(spark, "impg", path, col("ids")))
        .head().getString(0)
      assert(rt == "the cat")
      // the imported model FEEDS the composed windows landing: land,
      // then check id-space token conservation against the chain's own
      // survivor set encoded under the same model
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") < 60).select("doc_id", "text")
      val out = tmp("graft_bpe_imp_out")
      try {
        val counts = graft.llm.Pipeline.buildAndWriteWindows(docs,
          df(docSchema), "doc_id", "text", out, windowSize = 32L,
          bpeWindows = Some(graft.llm.Pipeline.BpeWindows("impg", path)))
        assert(counts.filter(_._1.endsWith("_windows")).values.sum > 0,
          s"$counts")
        val landed = spark.read.parquet(out)
        assert(landed.columns.contains("window_ids"))
        val winTok = landed.agg(sum("n_tokens")).head().getLong(0)
        val surv = graft.llm.Pipeline.pretrainCorpus(docs, df(docSchema),
            "doc_id", "text", persistStages = false)
          .select("doc_id")
        val docTok = Bpe.encodeIdsIndexed(spark, "impg", path,
          docs.join(surv, Seq("doc_id"), "left_semi"),
          "doc_id", "text").count()
        assert(winTok == docTok,
          s"landed id mass must conserve the survivors': $winTok != $docTok")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(out))
    } finally {
      Seq("impg_bpe", "impg_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path))
    }
  }

  test("readGpt2Merges/readGpt2Vocab: published files to frames, import end to end") {
    import spark.implicits._
    val dir = tmp("graft_bpe_files")
    val path = tmp("graft_bpe_filem")
    try {
      // merges.txt: the published shape — version header, "left right"
      // lines in rank order, raw UTF-8 alias chars
      val mergesTxt = "#version: 0.2\nt h\nth e\na t\nĠ c\nĠc at\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "merges.txt"),
        mergesTxt.getBytes("UTF-8"))
      // vocab.json: one flat object; exercise raw alias chars AND
      // \uXXXX / short escapes (the published file mixes them)
      val vocabJson = new java.lang.StringBuilder("{")
      gpt2AliasAlphabet.zipWithIndex.foreach { case ((tok, id), ix) =>
        if (ix > 0) vocabJson.append(", ")
        val esc = tok.flatMap {
          case '"' => "\\\""
          case '\\' => "\\\\"
          case c if c > 0x7E => f"\\u${c.toInt}%04x"
          case c => c.toString
        }
        vocabJson.append(s""""$esc": $id""")
      }
      vocabJson.append(""", "th": 256, "the": 257, "at": 258""")
      vocabJson.append(""", "Ġc": 259, "Ġcat": 260}""")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "vocab.json"),
        vocabJson.toString.getBytes("UTF-8"))
      val merges = Bpe.readGpt2Merges(spark, s"$dir/merges.txt")
      assert(merges.count() == 5)
      assert(merges.orderBy("rank").collect().map(_.getString(1)).toSeq
        == Seq("t", "th", "a", "Ġ", "Ġc"))
      val vocab = Bpe.readGpt2Vocab(spark, s"$dir/vocab.json")
      assert(vocab.count() == 261)
      Bpe.importBpeModel(spark, merges, vocab, "impf", path,
        gpt2Alias = true)
      val got = Bpe.encodeIdsIndexed(spark, "impf", path,
          Seq((1L, "the cat")).toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      assert(got == Seq(257L, 260L), s"$got")
      // malformed inputs refuse with position context
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "bad.json"),
        """{"a": 1, "b"}""".getBytes("UTF-8"))
      val e = intercept[IllegalArgumentException] {
        Bpe.readGpt2Vocab(spark, s"$dir/bad.json")
      }
      assert(e.getMessage.contains("expected ':'"), e.getMessage)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "bad.txt"),
        "t h x\n".getBytes("UTF-8"))
      intercept[IllegalArgumentException] {
        Bpe.readGpt2Merges(spark, s"$dir/bad.txt")
      }
    } finally {
      Seq("impf_bpe", "impf_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(dir, path).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("importBpeModel: declared special tokens serve as structural ids; content tokens still refuse") {
    import spark.implicits._
    val path = tmp("graft_bpe_spc")
    val out = tmp("graft_bpe_spc_out")
    try {
      // published-style pair WITH the GPT-2 control token: it lives in
      // the vocab at its published id, like the real <|endoftext|>
      val merges = Seq((0, "t", "h"), (1, "th", "e"))
        .toDF("rank", "left", "right")
      val eot = "<|endoftext|>"
      val vocab = (gpt2AliasAlphabet ++ Seq(("th", 256L), ("the", 257L),
        (eot, 300L))).toDF("token", "token_id")
      Bpe.importBpeModel(spark, merges, vocab, "spcg", path,
        gpt2Alias = true, specialTokens = Seq(eot))
      // an undeclared special refuses at import
      intercept[IllegalArgumentException] {
        Bpe.importBpeModel(spark, merges, vocab, "spcg2", tmp("spc2"),
          gpt2Alias = true, specialTokens = Seq("<|missing|>"))
      }
      // the landing accepts the DECLARED special as its eodId (the
      // refusal is for content-token collisions, and 300 is stamped
      // special) — and the landed stream carries it per doc
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(col("doc_id") < 40).select("doc_id", "text")
      val p = new org.apache.hadoop.fs.Path(out)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(p, true)
      graft.llm.Pipeline.buildAndWriteWindows(docs,
        df(docSchema), "doc_id", "text", out, windowSize = 64L,
        bpeWindows = Some(graft.llm.Pipeline.BpeWindows("spcg", path,
          eodId = Some(300L))))
      val win = spark.read.parquet(out)
      val eods = win
        .agg(sum(size(filter(col("window_ids"), x => x === 300L))))
        .head().getLong(0)
      val sidecarDocs = graft.llm.Pipeline.pretrainCorpus(docs,
        df(docSchema), "doc_id", "text", persistStages = false).count()
      assert(eods == sidecarDocs,
        s"one stamped-special EOD per landed doc: $eods != $sidecarDocs")
      // a CONTENT token's id still refuses — the guard lost nothing
      val contentId = Bpe.vocabMap(spark.table("spcg_bpe_vocab"))("746865")
      intercept[IllegalArgumentException] {
        graft.llm.Pipeline.buildAndWriteWindows(docs,
          df(docSchema), "doc_id", "text", tmp("spc_bad"), 64L,
          bpeWindows = Some(graft.llm.Pipeline.BpeWindows("spcg", path,
            eodId = Some(contentId))))
      }
      // the SFT indexed assemblers accept the special too, and
      // detokenization renders its published surface
      val ex = graft.llm.Sft.assembleExamplesIndexed(spark, "spcg",
          path, Seq((1L, "the", "the")).toDF("id", "p", "r"),
          "id", "p", "r", eodId = Some(300L))
        .head().getSeq[Long](1)
      assert(ex == Seq(257L, 257L, 300L), s"$ex")
      val rendered = Seq(Seq(257L, 300L)).toDF("ids")
        .select(Bpe.detokenizeIndexed(spark, "spcg", path, col("ids")))
        .head().getString(0)
      assert(rendered == "the" + eot, rendered)
    } finally {
      Seq("spcg_bpe", "spcg_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(path, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("importBpeModel: validation refusals and retrain-ineligible maintenance") {
    import spark.implicits._
    val path = tmp("graft_bpe_impv")
    try {
      val okMerges = Seq((0, "a", "b")).toDF("rank", "left", "right")
      // merged surface missing from vocab → the import exists to make
      // encode serve the published ids; a silent -1 defeats it
      val noMerged = (gpt2AliasAlphabet).toDF("token", "token_id")
      val e1 = intercept[IllegalArgumentException] {
        Bpe.importBpeModel(spark, okMerges, noMerged, "impv", path,
          gpt2Alias = true)
      }
      assert(e1.getMessage.contains("merged surface"), e1.getMessage)
      // byte-level without full byte coverage → OOV no longer
      // structurally zero
      val partial = Seq(("a", 0L), ("b", 1L), ("ab", 2L))
        .toDF("token", "token_id")
      val e2 = intercept[IllegalArgumentException] {
        Bpe.importBpeModel(spark, okMerges, partial, "impv", path,
          gpt2Alias = true)
      }
      assert(e2.getMessage.contains("base byte"), e2.getMessage)
      // duplicate ids → ambiguous detokenization
      val dupIds = (gpt2AliasAlphabet ++ Seq(("ab", 0L)))
        .toDF("token", "token_id")
      val e3 = intercept[IllegalArgumentException] {
        Bpe.importBpeModel(spark, okMerges, dupIds, "impv", path,
          gpt2Alias = true)
      }
      assert(e3.getMessage.contains("duplicate vocab ids"), e3.getMessage)
      // gpt2Alias without byteLevel is a contract violation
      intercept[IllegalArgumentException] {
        Bpe.importBpeModel(spark, okMerges, partial, "impv", path,
          byteLevel = false, gpt2Alias = true)
      }
      // a CODE-POINT-level import (no alias): legal, and its drift is
      // indicated-unfireable — no training corpus to replay
      Bpe.importBpeModel(spark, okMerges, partial, "impv", path,
        byteLevel = false, wordPattern = None, gpt2Alias = false)
      val rep = graft.llm.Maintain.maintainBpe(spark, "impv", path,
        freshSample = Some(df(docSchema, Row(9L, "zzz qqq"))),
        freshCorpus = Some(df(docSchema, Row(1L, "ab ab ab"))))
      val drift = rep.filter(col("check") === "oov_drift").head()
      assert(!drift.getBoolean(3),
        "imported model must never auto-fire a retrain")
      assert(drift.getString(4).contains("retrain-ineligible"),
        drift.getString(4))
      // the model still serves after the (non-)maintenance pass
      val ids = Bpe.encodeIdsIndexed(spark, "impv", path,
          Seq((1L, "ab zb")).toDF("doc_id", "text"), "doc_id", "text")
        .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      assert(ids == Seq(2L, -1L, 1L), s"$ids")
    } finally {
      Seq("impv_bpe", "impv_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(path))
    }
  }

  test("fimTransform: reassembly invariant, rate extremes, determinism, both layouts, refusals") {
    import spark.implicits._
    val ex = (1L to 60L).map(i =>
      (i, (0L until 5L + i % 7).toArray.toSeq)).toDF("id", "ids")
    val (pre, suf, mid) = (9001L, 9002L, 9003L)
    def run(rate: Double, mode: String = "psm") =
      Bpe.fimTransform(ex, "id", "ids", rate, seed = 3L, pre, suf, mid, mode)
    // rate 0: identity; rate 1: every row transformed, +3 ids each
    assert(run(0.0).filter(col("fim_applied")).count() === 0L)
    val all = run(1.0).collect()
    assert(all.forall(_.getAs[Boolean]("fim_applied")))
    val orig = ex.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    all.foreach { r =>
      assert(r.getSeq[Long](1).length === orig(r.getLong(0)).length + 3)
    }
    // reassembly: strip sentinels, undo the rotation -> the original
    def reassemble(ids: Seq[Long], mode: String): Seq[Long] = {
      if (mode == "psm") {
        assert(ids.head === pre)
        val (p, rest) = ids.tail.span(_ != suf)
        val (sfx, m) = rest.tail.span(_ != mid)
        p ++ m.tail ++ sfx
      } else {
        assert(ids.head === suf)
        val (sfx, rest) = ids.tail.span(_ != pre)
        val (p, m) = rest.tail.span(_ != mid)
        p ++ m.tail ++ sfx
      }
    }
    all.foreach { r =>
      assert(reassemble(r.getSeq[Long](1), "psm") === orig(r.getLong(0)))
    }
    run(1.0, "spm").collect().foreach { r =>
      assert(reassemble(r.getSeq[Long](1), "spm") === orig(r.getLong(0)))
    }
    // partial rate: both populations present, applied set deterministic
    // under repartitioning
    val half = run(0.5).collect()
    assert(half.exists(_.getAs[Boolean]("fim_applied")) &&
      half.exists(!_.getAs[Boolean]("fim_applied")))
    val again = Bpe.fimTransform(ex.repartition(7), "id", "ids", 0.5,
      3L, pre, suf, mid).collect()
    assert(again.map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getBoolean(2))).toMap ===
      half.map(r => r.getLong(0) ->
        (r.getSeq[Long](1), r.getBoolean(2))).toMap)
    // a different seed picks different cuts on applied rows
    val other = Bpe.fimTransform(ex, "id", "ids", 1.0, 4L, pre, suf, mid)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(all.exists(r => other(r.getLong(0)) !== r.getSeq[Long](1)))
    // the two draws are DECORRELATED: across many same-length
    // sequences the middle length (c2 - c1) must spread, not sit on
    // one or two values (the affine-hash failure mode: h(2) - h(1)
    // constant mod 2^32 makes the split geometry corpus-wide constant)
    val fixedLen = (1L to 512L).map(i => (i, (0L until 40L).toSeq))
      .toDF("id", "ids")
    val gapCounts = Bpe
      .fimTransform(fixedLen, "id", "ids", 1.0, 7L, pre, suf, mid)
      .collect()
      .map { r =>
        val ids = r.getSeq[Long](1)
        val sufPos = ids.indexOf(suf)
        ids.length - 3 - (sufPos - 1) - (ids.indexOf(mid) - sufPos - 1)
      } // middle length = n - prefix - suffix
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(gapCounts.size >= 15,
      s"middle lengths collapsed onto ${gapCounts.size} values: $gapCounts")
    // refusals
    assert(intercept[IllegalArgumentException] {
      Bpe.fimTransform(ex, "id", "ids", 0.5, 3L, 1L, 1L, 2L)
    }.getMessage.contains("distinct"))
    assert(intercept[IllegalArgumentException] {
      Bpe.fimTransform(ex, "id", "ids", 0.5, 3L, pre, suf, mid, "xyz")
    }.getMessage.contains("unknown mode"))
  }
}
