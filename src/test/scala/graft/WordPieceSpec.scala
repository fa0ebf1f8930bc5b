package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextHashExprs
import graft.llm.WordPiece

/** WordPiece tokenizer (Devlin et al. 2019 — the BERT family): greedy
  * longest-match-first with `##` continuation pieces and all-or-nothing
  * per-word UNK, hand-computed against the published algorithm; the
  * persisted import-only model lifecycle; vocab.txt reading; windows
  * landings through the tokenizer switch; maintenance and streaming. */
class WordPieceSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val fullVocab: Seq[(String, Long)] = Seq(
    ("[UNK]", 0L), ("un", 1L), ("##aff", 2L), ("##able", 3L),
    ("una", 4L), ("##ffable", 5L), ("runn", 6L), ("##ing", 7L),
    ("the", 8L), ("t", 9L), ("##h", 10L), ("##e", 11L),
    ("hug", 12L), ("##s", 13L))

  private def enc(word: String, vocab: Seq[(String, Long)] = fullVocab,
                  maxChars: Int = 200): Seq[Long] =
    spark.range(1)
      .select(TextHashExprs.wordPieceEncodeIds(lit(word), vocab, 0L,
        "##", maxChars).as("ids"))
      .head().getSeq[Long](0)

  test("greedy longest-match-first: longest piece wins at every cursor") {
    // with 'una'/'##ffable' present, greedy takes the LONGER start
    assert(enc("unaffable") === Seq(4L, 5L))
    // without them, the classic BERT segmentation
    val noUna = fullVocab.filterNot(p => p._1 == "una" || p._1 == "##ffable")
    assert(enc("unaffable", noUna) === Seq(1L, 2L, 3L))
    assert(enc("the") === Seq(8L))
    assert(enc("thee") === Seq(8L, 11L))
    assert(enc("hugs") === Seq(12L, 13L))
    assert(enc("running") === Seq(6L, 7L))
  }

  test("all-or-nothing UNK: stalled cursor, over-length word, prefix-at-start") {
    // no init piece covers 'runs' -> the WHOLE word is UNK (no partial)
    assert(enc("runs") === Seq(0L))
    // a word longer than maxInputChars is UNK without scanning
    assert(enc("unaffable", maxChars = 5) === Seq(0L))
    assert(enc("unaffable", maxChars = 9) === Seq(4L, 5L))
    // continuation pieces never match at the word start: a literal
    // '##s' word finds no init piece and is UNK
    assert(enc("##s") === Seq(0L))
    // empty word encodes to nothing (filtered upstream anyway)
    assert(enc("") === Seq.empty)
  }

  test("surrogate-safe: non-BMP chars are single code points") {
    val v = fullVocab ++ Seq(("𝄞", 20L), ("##𝄞", 21L))
    assert(enc("𝄞", v) === Seq(20L))
    assert(enc("t𝄞", v) === Seq(9L, 21L))
    // maxInputChars counts code points, not UTF-16 units
    assert(enc("t𝄞", v, maxChars = 2) === Seq(9L, 21L))
  }

  test("expression validation: unk in vocab, prefix piece refused") {
    val e1 = intercept[IllegalArgumentException] {
      enc("x", Seq(("a", 1L)), 200) // unkId 0 not a vocab id
    }
    assert(e1.getMessage.contains("unkId"))
    val e2 = intercept[IllegalArgumentException] {
      enc("x", Seq(("[UNK]", 0L), ("##", 1L)), 200)
    }
    assert(e2.getMessage.contains("continuation prefix"))
  }

  test("import + indexed serve == one-shot; stamp replayed; stampless refuses; validation total") {
    val path = tmp("graft_wp_idx")
    val vocabDf = df(
      StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
      fullVocab.map(p => Row(p._1, p._2)): _*)
    WordPiece.importWordPieceModel(spark, vocabDf, "wpt", path,
      maxInputChars = 50)
    val docs = df(docSchema, Row(1L, "the unaffable hugs"),
      Row(2L, "running runs thee"))
    val oneShot = WordPiece.encodeIds(docs, "doc_id", "text", fullVocab,
      0L, "##", 50)
    val served = WordPiece.encodeIdsIndexed(spark, "wpt", path, docs,
      "doc_id", "text")
    assert(collectSorted(served, "doc_id", "word_pos", "tok_pos") ===
      collectSorted(oneShot, "doc_id", "word_pos", "tok_pos"))
    val meta = WordPiece.readWpMeta(spark, path)
    assert(meta.unkId === 0L && meta.contPrefix === "##" &&
      meta.maxInputChars === 50 && meta.imported)
    val e = intercept[IllegalArgumentException] {
      WordPiece.encodeIdsIndexed(spark, "wpt", tmp("graft_wp_nostamp"),
        docs, "doc_id", "text")
    }
    assert(e.getMessage.contains("stamp"))
    // total validation
    def bad(rows: Row*): Exception = intercept[Exception] {
      WordPiece.importWordPieceModel(spark,
        df(StructType(Seq(StructField("piece", StringType),
          StructField("piece_id", LongType))), rows: _*),
        "wpbad", tmp("graft_wp_bad"))
    }
    assert(bad(Row("a", 0L), Row("a", 1L)).getMessage
      .contains("duplicate piece surfaces"))
    assert(bad(Row("[UNK]", 0L), Row("a", 0L)).getMessage
      .contains("duplicate piece_id"))
    assert(bad(Row("a", 0L), Row("b", 1L)).getMessage
      .contains("not in the vocabulary"))
    assert(bad(Row("[UNK]", 0L), Row("##", 1L)).getMessage
      .contains("continuation prefix"))
    assert(bad(Row("[UNK]", 0L), Row("", 1L)).getMessage
      .contains("empty piece"))
  }

  test("readBertVocab: one piece per line, id = line number") {
    val f = java.nio.file.Files.createTempFile("graft_wp_vocab", ".txt")
    java.nio.file.Files.write(f,
      "[UNK]\nthe\n##s\nun\n##aff\n##able\n".getBytes("UTF-8"))
    val v = WordPiece.readBertVocab(spark, f.toString)
    val rows = v.orderBy("piece_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((0L, "[UNK]"), (1L, "the"), (2L, "##s"),
      (3L, "un"), (4L, "##aff"), (5L, "##able")))
    val path = tmp("graft_wp_fromtxt")
    WordPiece.importWordPieceModel(spark, v, "wptxt", path)
    val ids = WordPiece.encodeIdsIndexed(spark, "wptxt", path,
        df(docSchema, Row(1L, "unaffable the runs")), "doc_id", "text")
      .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3))
    assert(ids.toSeq === Seq(3L, 4L, 5L, 1L, 0L))
  }

  test("detokenize: pieces re-join, continuations re-attach, UNK renders as the unknown piece") {
    val path = tmp("graft_wp_detok")
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        fullVocab.map(p => Row(p._1, p._2)): _*),
      "wpd", path)
    val docs = df(docSchema, Row(1L, "the unaffable runs"))
    val back = WordPiece.encodeIdsIndexed(spark, "wpd", path, docs,
        "doc_id", "text")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("word_pos"),
        col("tok_pos"), col("token_id")))).as("s"))
      .select(WordPiece.detokenizeIndexed(spark, "wpd", path,
        expr("transform(s, x -> x.token_id)")).as("rt"))
      .head().getString(0)
    assert(back === "the unaffable [UNK]")
  }

  test("detokenize map is id-keyed: a continuation whose raw surface starts with a space cannot shadow an initial piece") {
    val path = tmp("graft_wp_spc")
    // '## x' strips to ' x' — exactly initial piece 'x''s transformed
    // key; a surface-keyed decode map drops one of the two ids
    val vocab = Seq(("[UNK]", 0L), ("x", 1L), ("## x", 2L), ("y", 3L))
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        vocab.map(p => Row(p._1, p._2)): _*),
      "wpsc", path)
    try {
      val out = df(StructType(Seq(
          StructField("ids", ArrayType(LongType)))),
          Row(Seq(1L, 2L)), Row(Seq(3L, 1L)))
        .select(WordPiece.detokenizeIndexed(spark, "wpsc", path,
          col("ids")).as("rt"))
        .collect().map(_.getString(0)).toSeq
      // id 1 -> ' x' (initial), id 2 -> ' x' (continuation strips to
      // its raw tail), id 3 -> ' y'; neither id renders U+FFFD
      assert(out === Seq("x x", "y x"))
      assert(!out.exists(_.contains("�")))
    } finally spark.sql("DROP TABLE IF EXISTS wpsc_wp")
  }

  test("declared special pieces: out of the greedy table, usable as structural ids, rendered by detok — the published [CLS]/[SEP] contract") {
    val sch = StructType(Seq(StructField("piece", StringType),
      StructField("piece_id", LongType)))
    // the published BERT head: [PAD]/[CLS]/[SEP] are real vocab.txt
    // rows with real ids, then content pieces
    val pieces = Seq(("[PAD]", 0L), ("[UNK]", 1L), ("[CLS]", 2L),
      ("[SEP]", 3L), ("ab", 4L), ("a", 5L), ("##b", 6L), ("b", 7L))
    val path = tmp("graft_wp_sp")
    WordPiece.importWordPieceModel(spark,
      df(sch, pieces.map(p => Row(p._1, p._2)): _*), "wpsp", path,
      unkPiece = "[UNK]",
      specialPieces = Seq("[PAD]", "[CLS]", "[SEP]"))
    try {
      val meta = WordPiece.readWpMeta(spark, path)
      assert(meta.specialIds === Seq(0L, 2L, 3L))
      def enc(text: String): Seq[Long] =
        WordPiece.encodeIdsIndexed(spark, "wpsp", path,
            df(docSchema, Row(1L, text)), "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      // literal control text NEVER matches the special piece — greedy
      // stalls on '[' and the word serves as UNK (all-or-nothing)
      assert(enc("[SEP]") === Seq(1L))
      assert(enc("ab") === Seq(4L))
      // structural use: stamped special ids serve as SFT sep/eod
      // without a collision refusal, and detok renders their surfaces
      val got = graft.llm.Sft.assembleExamplesIndexed(spark, "wpsp",
          path, df(StructType(Seq(StructField("id", LongType),
            StructField("p", StringType), StructField("r", StringType))),
            Row(1L, "ab", "b a")),
          "id", "p", "r", sepId = Some(3L), eodId = Some(2L),
          tokenizer = "wordpiece")
        .head().getSeq[Long](1)
      assert(got === Seq(4L, 3L, 7L, 5L, 2L))
      val back = df(StructType(Seq(
          StructField("ids", ArrayType(LongType)))), Row(got))
        .select(WordPiece.detokenizeIndexed(spark, "wpsp", path,
          col("ids"))).head().getString(0)
      assert(back === "ab [SEP] b a [CLS]")
      // an undeclared surface refuses; declaring every piece refuses
      assert(intercept[IllegalArgumentException] {
        WordPiece.importWordPieceModel(spark,
          df(sch, Row("[UNK]", 0L), Row("a", 1L)), "wpsp2",
          tmp("graft_wsp2"), specialPieces = Seq("<s>"))
      }.getMessage.contains("not in the vocabulary"))
      assert(intercept[IllegalArgumentException] {
        WordPiece.importWordPieceModel(spark,
          df(sch, Row("[UNK]", 0L), Row("a", 1L)), "wpsp3",
          tmp("graft_wsp3"), specialPieces = Seq("[UNK]", "a"))
      }.getMessage.contains("no content vocabulary"))
    } finally spark.sql("DROP TABLE IF EXISTS wpsp_wp")
  }

  test("import refuses a null piece_id; stamps refuse control characters; trainedVocab is maxTypes-bounded") {
    val e1 = intercept[IllegalArgumentException] {
      WordPiece.importWordPieceModel(spark,
        df(StructType(Seq(StructField("piece", StringType),
          StructField("piece_id", LongType))),
          Row("[UNK]", 0L), Row("ab", null)),
        "wpnull", tmp("graft_wp_null"))
    }
    assert(e1.getMessage.contains("null piece_id"))
    val e2 = intercept[IllegalArgumentException] {
      try WordPiece.importWordPieceModel(spark,
        df(StructType(Seq(StructField("piece", StringType))),
          Row("[U\nNK]"), Row("ab")),
        "wpctl", tmp("graft_wp_ctl"), unkPiece = "[U\nNK]")
      finally spark.sql("DROP TABLE IF EXISTS wpctl_wp")
    }
    assert(e2.getMessage.contains("control character"))
    val corpus = df(docSchema,
      (1L to 40L).map(i => Row(i, s"w$i x$i y$i")): _*)
    val merges = WordPiece.train(corpus, "text", numMerges = 0)
    val e3 = intercept[IllegalArgumentException] {
      WordPiece.trainedVocab(corpus, "text", merges, maxTypes = 10)
    }
    assert(e3.getMessage.contains("distinct word types") &&
      e3.getMessage.contains("trainedVocab"))
  }

  test("stamped normalizer: BERT-uncased import reproduces ids on mixed-case text; the unnormalized twin mis-tokenizes; drift retrain keeps the stamp") {
    val uncased = Seq(("[UNK]", 0L), ("un", 1L), ("##aff", 2L),
      ("##able", 3L), ("cafe", 4L), ("resume", 5L), ("the", 6L),
      ("uber", 7L))
    def importAs(name: String, normalize: String): String = {
      val p = tmp(s"graft_wp_$name")
      WordPiece.importWordPieceModel(spark,
        df(StructType(Seq(StructField("piece", StringType),
          StructField("piece_id", LongType))),
          uncased.map(v => Row(v._1, v._2)): _*),
        name, p, normalize = normalize)
      p
    }
    val pN = importAs("wpnz", "lowercase_strip_accents")
    val p0 = importAs("wpnz0", "none")
    try {
      assert(WordPiece.readWpMeta(spark, pN).normalize ===
        "lowercase_strip_accents")
      val mixed = df(docSchema, Row(1L, "The Café RÉSUMÉ Über unAFFable"))
      def ids(name: String, p: String) =
        WordPiece.encodeIdsIndexed(spark, name, p, mixed,
            "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      // the published-uncased contract: mixed-case text reproduces the
      // lowercase vocabulary's ids
      assert(ids("wpnz", pN) === Seq(6L, 4L, 5L, 7L, 1L, 2L, 3L))
      // the SAME vocabulary without the stamp mis-tokenizes — the gap
      // the stamped normalizer closes ('The'/'Café'/... are all UNK)
      assert(ids("wpnz0", p0) === Seq(0L, 0L, 0L, 0L, 0L))
      // detokenization is normalization-lossy by construction
      val back = df(StructType(Seq(
          StructField("ids", ArrayType(LongType)))), Row(Seq(6L, 4L)))
        .select(WordPiece.detokenizeIndexed(spark, "wpnz", pN,
          col("ids"))).head().getString(0)
      assert(back === "the cafe")
    } finally Seq("wpnz_wp", "wpnz0_wp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    // trained family: the mode shapes TRAINING (case-folded counts)
    // and survives a drift-fired retrain via the stamp
    val corpus = df(docSchema,
      Row(1L, Array.fill(60)("Aa").mkString(" ")),
      Row(2L, Array.fill(50)("AA aa").mkString(" ")))
    val path = tmp("graft_wp_nztr")
    try {
      WordPiece.writeWordPieceModel(corpus, "text", "wpnztr", path,
        numMerges = 1, normalize = "lowercase")
      // lowercase folds Aa/AA/aa into 160 'aa' — one (a,##a) merge;
      // unnormalized, 'Aa' and 'AA' would keep A in the alphabet
      val vocab = spark.table("wpnztr_wp").collect()
        .map(r => r.getString(1)).toSet
      assert(vocab === Set("[UNK]", "a", "##a", "aa"))
      assert(WordPiece.readWpMeta(spark, path).normalize === "lowercase")
      val drifted = df(docSchema, Row(7L, "ØØ ØØ"), Row(8L, "ØØ"))
      graft.llm.Maintain.maintainWordPiece(spark, "wpnztr", path,
        freshSample = Some(drifted),
        freshCorpus = Some(corpus.unionByName(drifted))).collect()
      val meta2 = WordPiece.readWpMeta(spark, path)
      assert(meta2.normalize === "lowercase",
        "the drift-fired retrain must replay the stamped normalizer")
      // the retrained model serves normalized: 'øø' (lowercased) in vocab
      assert(WordPiece.wpUnkRate(spark, "wpnztr", path,
        df(docSchema, Row(9L, "ØØ")), "text") === 0.0)
    } finally spark.sql("DROP TABLE IF EXISTS wpnztr_wp")
  }

  test("fertility report and UNK drift observable") {
    val rep = WordPiece.fertilityReportWith(
        df(StructType(Seq(StructField("lang", StringType),
          StructField("text", StringType))),
          Row("en", "the unaffable thee"), Row("en", "hugs"),
          Row("xx", "zz qq runs"), Row("zz", "")),
        "text", "lang", fullVocab, 0L)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rep("en").getAs[Long]("n_words") === 4L)
    assert(rep("en").getAs[Long]("n_unk_words") === 0L)
    assert(rep("en").getAs[Long]("n_tokens") === 7L) // 1+2+2 + 2
    assert(rep("xx").getAs[Long]("n_unk_words") === 3L)
    assert(rep("zz").getAs[Long]("n_words") === 0L)
    assert(rep("zz").isNullAt(rep("zz").fieldIndex("fertility")))
    val path = tmp("graft_wp_drift")
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        fullVocab.map(p => Row(p._1, p._2)): _*),
      "wpu", path)
    assert(WordPiece.wpUnkRate(spark, "wpu", path,
      df(docSchema, Row(1L, "the thee hugs")), "text") === 0.0)
    assert(WordPiece.wpUnkRate(spark, "wpu", path,
      df(docSchema, Row(1L, "zz qq the")), "text") > 0.5)
  }

  test("training: likelihood argmax beats raw frequency; exact-tie code-point break; early stop; score inputs ride the rows") {
    // 'aa'x100, 'bb'x100, 'cd'x3: BPE's frequency argmax would merge
    // (a,##a) first (count 100); WordPiece's likelihood picks (c,##d):
    // 3/(3*3) = 0.333 >> 100/(100*100) = 0.01
    val corpus = df(docSchema,
      Row(1L, Array.fill(100)("aa").mkString(" ")),
      Row(2L, Array.fill(100)("bb").mkString(" ")),
      Row(3L, "cd cd cd"))
    val m = WordPiece.train(corpus, "text", numMerges = 5,
        minPairCount = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(m(0) === (("c", "##d", "cd", 3L, 3L, 3L)))
    // then (a,##a) vs (b,##b): scores exactly equal -> left cp-order
    assert(m(1) === (("a", "##a", "aa", 100L, 100L, 100L)))
    assert(m(2) === (("b", "##b", "bb", 100L, 100L, 100L)))
    // no pair >= minPairCount remains: early stop at 3 of 5
    assert(m.length === 3)
    // determinism under repartition
    val m2 = WordPiece.train(corpus.repartition(7), "text", 5, 2L)
      .orderBy("rank").collect()
    assert(m2.map(_.toSeq).toSeq ===
      WordPiece.train(corpus, "text", 5, 2L)
        .orderBy("rank").collect().map(_.toSeq).toSeq)
  }

  test("trained model: vocab contract, serve, stamp-replayed drift retrain; continuation merges keep the prefix") {
    val corpus = df(docSchema,
      Row(1L, Array.fill(100)("aa").mkString(" ")),
      Row(2L, Array.fill(100)("bb").mkString(" ")),
      Row(3L, "cd cd cd"))
    val path = tmp("graft_wp_train")
    WordPiece.writeWordPieceModel(corpus, "text", "wptr", path,
      numMerges = 5, minPairCount = 2L, maxInputChars = 20)
    val meta = WordPiece.readWpMeta(spark, path)
    assert(!meta.imported && meta.unkId === 0L && meta.numMerges === 5)
    // vocab: [UNK]=0, alphabet cp-ordered ('##a' < 'a'), merges by rank
    val vocab = spark.table("wptr_wp").orderBy("piece_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(vocab.toSeq === Seq((0L, "[UNK]"), (1L, "##a"), (2L, "##b"),
      (3L, "##d"), (4L, "a"), (5L, "b"), (6L, "c"), (7L, "cd"),
      (8L, "aa"), (9L, "bb")))
    val enc = WordPiece.encodeIdsIndexed(spark, "wptr", path,
        df(docSchema, Row(1L, "aa cd x ca")), "doc_id", "text")
      .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3))
    // 'ca' = c + ##a (greedy over the trained vocab); 'x' is UNK
    assert(enc.toSeq === Seq(8L, 7L, 0L, 6L, 1L))
    // drift on an unseen script fires a retrain replaying the stamp
    val drifted = df(docSchema, Row(7L, "øø øø"), Row(8L, "øø"))
    val rep = graft.llm.Maintain.maintainWordPiece(spark, "wptr", path,
      freshSample = Some(drifted),
      freshCorpus = Some(corpus.unionByName(drifted)))
      .collect().map(r => (r.getString(0), r.getBoolean(3), r.getString(4)))
    assert(rep.find(_._1 == "unk_drift").get._2)
    assert(WordPiece.wpUnkRate(spark, "wptr", path, drifted, "text") === 0.0)
    val meta2 = WordPiece.readWpMeta(spark, path)
    assert(!meta2.imported && meta2.numMerges === 5 &&
      meta2.minPairCount === 2L)
    // a 3+-symbol chain keeps continuation prefixes through merges:
    // 'xyz'x50 -> (x,##y)->'xy' or (##y,##z)->'##yz' — either way the
    // merged CONTINUATION carries ## and the word re-encodes whole
    val chain = df(docSchema, Row(1L, Array.fill(50)("xyz").mkString(" ")))
    val cm = WordPiece.train(chain, "text", 2, 2L).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3)))
    assert(cm.length === 2)
    // scores: (x,##y): 50/(50*50), (##y,##z): 50/(50*50) — exact tie,
    // '##y' < 'x' in code-point order
    assert(cm(0) === (("##y", "##z", "##yz")))
    assert(cm(1) === (("x", "##yz", "xyz")))
  }

  test("maintenance: import-only family — drift indicated, NEVER fired; compaction preserves serving") {
    import graft.llm.Maintain
    val path = tmp("graft_wp_maint")
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        fullVocab.map(p => Row(p._1, p._2)): _*),
      "wpm", path)
    val drifted = df(docSchema, Row(7L, "zz qq xx"), Row(8L, "qq zz"))
    val rep = Maintain.maintainAll(spark,
      Seq("wp" -> Maintain.WordPieceTarget("wpm", path,
        freshSample = Some(drifted))))
      .collect().map(r => (r.getString(1), r.getBoolean(4), r.getString(5)))
    val d = rep.find(_._1 == "unk_drift").get
    assert(!d._2 && d._3.contains("retrain-ineligible"))
    assert(rep.exists(r => r._1 == "retraction" &&
      r._3.contains("re-import/retrain")))
    val before = collectSorted(
      WordPiece.encodeIdsIndexed(spark, "wpm", path,
        df(docSchema, Row(1L, "the unaffable hugs")), "doc_id", "text"),
      "doc_id", "word_pos", "tok_pos")
    WordPiece.compactWordPiece(spark, "wpm")
    val after = collectSorted(
      WordPiece.encodeIdsIndexed(spark, "wpm", path,
        df(docSchema, Row(1L, "the unaffable hugs")), "doc_id", "text"),
      "doc_id", "word_pos", "tok_pos")
    assert(after === before)
  }

  test("streaming encode picks up a mid-stream re-import") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = tmp("graft_wp_srv")
    val path = s"$base/model"
    val noRuns = fullVocab // 'runs' is UNK under the full vocab
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        noRuns.map(p => Row(p._1, p._2)): _*),
      "wps", path)
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.Streams.wpEncodeStream(
      in.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "wps", path, outPath = s"$base/out",
      checkpoint = s"$base/ckpt").start()
    try {
      in.addData(1L -> "runs")
      q.processAllAvailable()
      // mid-stream re-import of a refreshed vocabulary covering 'runs'
      WordPiece.importWordPieceModel(spark,
        df(StructType(Seq(StructField("piece", StringType),
          StructField("piece_id", LongType))),
          (fullVocab ++ Seq(("runs", 20L))).map(p => Row(p._1, p._2)): _*),
        "wps", path)
      in.addData(2L -> "runs")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(got.filter(_._1 == 1L).map(_._2).toSeq === Seq(0L))
    assert(got.filter(_._1 == 2L).map(_._2).toSeq === Seq(20L))
  }

  test("tokenizer switch: wordpiece id-space landing — conservation in the greedy unit, fsck, O(1) replay") {
    import graft.llm.{Dedup, Pipeline}
    val idx = tmp("graft_wwin_idx")
    val mdl = tmp("graft_wwin_wp")
    val out = tmp("graft_wwin_out")
    try {
      val docs = spark.read
        .parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      // letters as init+cont pieces: alpha words tokenize per char,
      // anything else is whole-word UNK — the greedy unit differs
      // from both the whitespace and the other families' units
      val pieces = Seq(("[UNK]", 0L)) ++
        ('a' to 'z').zipWithIndex.map { case (c, i) =>
          (c.toString, (i + 1).toLong) } ++
        ('a' to 'z').zipWithIndex.map { case (c, i) =>
          (s"##$c", (i + 27).toLong) }
      WordPiece.importWordPieceModel(spark,
        df(StructType(Seq(StructField("piece", StringType),
          StructField("piece_id", LongType))),
          pieces.map(p => Row(p._1, p._2)): _*),
        "wwin_wp", mdl)
      val bw = Pipeline.BpeWindows("wwin_wp", mdl, tokenizer = "wordpiece")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "wwin_t", idx)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      val c1 = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "wwin_t", idx, out, 64L, "w01", redactPii = false,
        bpeWindows = Some(bw))
      val win = spark.read.parquet(out)
      assert(win.filter(size(col("window_ids")) =!= col("n_tokens"))
        .count() === 0L)
      // conservation in the WORDPIECE id unit
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
      val landed = docs.join(sidecar.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val wpMass = WordPiece.encodeIdsIndexed(spark, "wwin_wp", mdl,
        landed, "doc_id", "text").count()
      assert(win.agg(sum("n_tokens")).head().getLong(0) === wpMass)
      val wsMass = landed.agg(sum(size(split(col("text"), " "))))
        .head().getLong(0)
      assert(wpMass !== wsMass)
      // fsck in the landing's unit; O(1) replay
      val rep = Pipeline.windowsReport(spark, out, Some(docs),
        bpeWindows = Some(bw)).collect()
      assert(rep.forall(_.getAs[Boolean]("tokens_match")), rep.mkString(";"))
      val c1b = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "wwin_t", idx, out, 64L, "w01", redactPii = false,
        bpeWindows = Some(bw))
      assert(c1b === c1)
    } finally {
      Seq("bands", "shingles", "keys").foreach(s =>
        spark.sql(s"DROP TABLE IF EXISTS wwin_t_$s"))
    }
  }
}
