package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Bpe, TokenizerJson, Unigram, WordPiece}

/** The modern single-file tokenizer exchange format: the escape-aware
  * parser, the normalizer/pre-tokenizer mapping, and the dispatcher —
  * each family's tokenizer.json import must serve BIT-IDENTICALLY to
  * its classic-format sibling (merges.txt/vocab.json, vocab.txt,
  * SentencePiece TSV). */
class TokenizerJsonSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def writeTmp(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft_tokjson", ".json")
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("parser: escapes, nesting, numbers, refusals") {
    import TokenizerJson._
    val j = parse("""{"a": "q\"\\\nA", "b": [1, -2.5e1, true, null]}""")
      .asInstanceOf[JObj]
    assert(j.fields("a") === JStr("q\"\\\nA"))
    assert(j.fields("b") === JArr(Vector(JNum(1), JNum(-25.0),
      JBool(true), JNull)))
    assert(intercept[IllegalArgumentException] {
      parse("""{"a": 1} trailing""")
    }.getMessage.contains("trailing"))
    assert(intercept[IllegalArgumentException] {
      parse("""{"a": }""")
    }.getMessage.contains("offset"))
  }

  test("normalizer mapping: direct types, BertNormalizer semantics, Sequence folding, refusals") {
    import TokenizerJson._
    def m(s: String) = normalizeMode(parse(s))
    assert(m("null") === "none")
    assert(m("""{"type": "NFC"}""") === "nfc")
    assert(m("""{"type": "NFKC"}""") === "nfkc")
    assert(m("""{"type": "Lowercase"}""") === "lowercase")
    assert(m("""{"type": "BertNormalizer", "lowercase": true}""") ===
      "lowercase_strip_accents") // strip_accents null follows lowercase
    assert(m("""{"type": "BertNormalizer", "lowercase": true, "strip_accents": false}""") ===
      "lowercase")
    assert(m("""{"type": "BertNormalizer", "lowercase": false}""") === "none")
    assert(m("""{"type": "Sequence", "normalizers": [{"type": "NFC"}]}""") ===
      "nfc")
    assert(intercept[IllegalArgumentException] {
      m("""{"type": "BertNormalizer", "lowercase": false, "strip_accents": true}""")
    }.getMessage.contains("no stamped normalize mode"))
    assert(intercept[IllegalArgumentException] {
      m("""{"type": "Sequence", "normalizers": [{"type": "NFC"}, {"type": "Lowercase"}]}""")
    }.getMessage.contains("composite"))
    assert(intercept[IllegalArgumentException] {
      m("""{"type": "Strip"}""")
    }.getMessage.contains("unsupported normalizer"))
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.preTokenizer(parse("""{"type": "Digits"}"""))
    }.getMessage.contains("unsupported pre_tokenizer"))
  }

  test("BPE dispatch: ByteLevel tokenizer.json serves bit-identically to the classic merges/vocab import; specials and stamp carried") {
    // alias-form vocab: all 256 byte aliases + merged surfaces + one
    // declared special — the GPT-2 release shape
    val aliasVocab = (0 until 256).map(b =>
      (Bpe.gpt2AliasForByte(b), b.toLong)) ++
      Seq(("th", 256L), ("the", 257L), ("<|endoftext|>", 258L))
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"
      case c => c.toString
    }
    val vocabJson = aliasVocab
      .map { case (t, id) => s""""${esc(t)}": $id""" }.mkString(", ")
    val json = s"""{
      "version": "1.0",
      "normalizer": null,
      "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false},
      "model": {"type": "BPE", "vocab": {$vocabJson},
                "merges": ["t h", "th e"]},
      "added_tokens": [{"id": 258, "content": "<|endoftext|>", "special": true}]
    }"""
    val pJson = tmpDir("graft_tj_bpe")
    val fam = TokenizerJson.importTokenizerJson(spark, writeTmp(json),
      "tjbpe", pJson)
    assert(fam === "bpe")
    // classic sibling: same pair through importBpeModel directly
    val pClassic = tmpDir("graft_tj_bpec")
    val mergesDf = df(StructType(Seq(StructField("rank", IntegerType),
      StructField("left", StringType), StructField("right", StringType))),
      Row(0, "t", "h"), Row(1, "th", "e"))
    val vocabDf = df(StructType(Seq(StructField("token", StringType),
      StructField("token_id", LongType))),
      aliasVocab.map(v => Row(v._1, v._2)): _*)
    Bpe.importBpeModel(spark, mergesDf, vocabDf, "tjbpec", pClassic,
      gpt2Alias = true, specialTokens = Seq("<|endoftext|>"))
    try {
      val docs = df(docSchema, Row(1L, "the theft th 中"))
      def ids(name: String, p: String) =
        Bpe.encodeIdsIndexed(spark, name, p, docs, "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq
      val a = ids("tjbpe", pJson)
      assert(a === ids("tjbpec", pClassic) && a.contains(257L))
      assert(Bpe.servingVocabMap(spark, "tjbpe", pJson) ===
        Bpe.servingVocabMap(spark, "tjbpec", pClassic))
    } finally Seq("tjbpe_bpe", "tjbpe_bpe_vocab", "tjbpec_bpe",
      "tjbpec_bpe_vocab").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("export: each family round-trips through its own tokenizer.json — ids, stamp, specials; unexportable shapes refuse") {
    val wpSch = StructType(Seq(StructField("piece", StringType),
      StructField("piece_id", LongType)))
    val uniSch = StructType(Seq(StructField("piece", StringType),
      StructField("logp", DoubleType), StructField("piece_id", LongType)))
    val docs = df(docSchema, Row(1L, "The thé ab ba"), Row(2L, "a b"))
    // --- BPE: byte-level alias surfaces + a declared special
    val aliasVocab = (0 until 256).map(b =>
      (Bpe.gpt2AliasForByte(b), b.toLong)) ++
      Seq(("th", 256L), ("the", 257L), ("<|endoftext|>", 258L))
    val mergesDf = df(StructType(Seq(StructField("rank", IntegerType),
      StructField("left", StringType), StructField("right", StringType))),
      Row(0, "t", "h"), Row(1, "th", "e"))
    val vocabDf = df(StructType(Seq(StructField("token", StringType),
      StructField("token_id", LongType))),
      aliasVocab.map(v => Row(v._1, v._2)): _*)
    val pB = tmpDir("graft_exp_b")
    Bpe.importBpeModel(spark, mergesDf, vocabDf, "expb", pB,
      gpt2Alias = true, specialTokens = Seq("<|endoftext|>"))
    // --- WordPiece: normalizer + specials
    val wpVocab = Seq(("[PAD]", 0L), ("[UNK]", 1L), ("[SEP]", 2L),
      ("the", 3L), ("a", 4L), ("##b", 5L), ("b", 6L))
    val pW = tmpDir("graft_exp_w")
    WordPiece.importWordPieceModel(spark,
      df(wpSch, wpVocab.map(v => Row(v._1, v._2)): _*), "expw", pW,
      maxInputChars = 64, normalize = "lowercase_strip_accents",
      specialPieces = Seq("[PAD]", "[SEP]"))
    // --- Unigram: metaspace + a declared special
    val uniPieces = Seq(("<pad>", 0.0, 0L), ("▁the", -1.5, 1L),
      ("▁a", -2.0, 2L), ("▁b", -2.1, 3L), ("a", -3.0, 4L),
      ("b", -3.1, 5L), ("▁", -3.5, 6L), ("t", -4.0, 7L),
      ("h", -4.1, 8L), ("e", -4.2, 9L), ("é", -4.3, 10L),
      ("T", -4.4, 11L))
    val pU = tmpDir("graft_exp_u")
    Unigram.importUnigramModel(spark,
      df(uniSch, uniPieces.map(p => Row(p._1, p._2, p._3)): _*),
      "expu", pU, metaspace = true, specialPieces = Seq("<pad>"))
    try {
      def roundTrip(fam: String, name: String, p: String,
                    enc: (String, String) => Seq[Long]): String = {
        val jsonPath = writeTmp("placeholder")
        TokenizerJson.exportTokenizerJson(spark, name, p, jsonPath, fam)
        val p2 = tmpDir(s"graft_exp_${fam}2")
        assert(TokenizerJson.importTokenizerJson(spark, jsonPath,
          s"${name}2", p2) === fam)
        assert(enc(name, p) === enc(s"${name}2", p2),
          s"$fam export/import must serve bit-identically")
        p2
      }
      val pB2 = roundTrip("bpe", "expb", pB, (n, p) =>
        Bpe.encodeIdsIndexed(spark, n, p, docs, "doc_id", "text")
          .orderBy("doc_id", "word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq)
      val pW2 = roundTrip("wordpiece", "expw", pW, (n, p) =>
        WordPiece.encodeIdsIndexed(spark, n, p, docs, "doc_id", "text")
          .orderBy("doc_id", "word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq)
      val pU2 = roundTrip("unigram", "expu", pU, (n, p) =>
        Unigram.encodeIdsIndexed(spark, n, p, docs, "doc_id", "text")
          .orderBy("doc_id", "word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq)
      // the re-imported stamps carry the CONFIG, not just the ids
      assert(Bpe.servingVocabMap(spark, "expb2", pB2) ===
        Bpe.servingVocabMap(spark, "expb", pB))
      val w2 = WordPiece.readWpMeta(spark, pW2)
      assert(w2.normalize === "lowercase_strip_accents" &&
        w2.specialIds === Seq(0L, 2L) && w2.maxInputChars === 64 &&
        w2.unkPiece === "[UNK]" && w2.unkId === 1L)
      val u2 = Unigram.readUniMeta(spark, pU2)
      assert(u2.metaspace && u2.specialIds === Seq(0L))
      // unexportable shapes refuse LOUDLY instead of writing a file
      // that re-imports with different behavior
      val pX = tmpDir("graft_exp_x")
      WordPiece.importWordPieceModel(spark,
        df(wpSch, Row("[UNK]", 0L), Row("a", 1L)), "expx", pX,
        wordPattern = Some("[a-z]+"))
      assert(intercept[IllegalArgumentException] {
        TokenizerJson.exportTokenizerJson(spark, "expx", pX,
          writeTmp("x"), "wordpiece")
      }.getMessage.contains("no published pre_tokenizer type"))
      val pS = tmpDir("graft_exp_s")
      Unigram.importUnigramModel(spark,
        df(uniSch, Row("a", -1.0, 0L), Row("b", -1.1, 2L)), "exps", pS)
      assert(intercept[IllegalArgumentException] {
        TokenizerJson.exportTokenizerJson(spark, "exps", pS,
          writeTmp("x"), "unigram")
      }.getMessage.contains("DENSE ids"))
      assert(intercept[IllegalArgumentException] {
        TokenizerJson.exportTokenizerJson(spark, "expb", pB,
          writeTmp("x"), "sentencepiece")
      }.getMessage.contains("unknown family"))
    } finally Seq("expb_bpe", "expb_bpe_vocab", "expb2_bpe",
      "expx_wp", "exps_uni",
      "expb2_bpe_vocab", "expw_wp", "expw2_wp", "expu_uni", "expu2_uni")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("WordPiece dispatch: BertNormalizer config rides the stamp — mixed-case text reproduces the uncased sibling") {
    val vocab = Seq(("[UNK]", 0L), ("the", 1L), ("un", 2L),
      ("##aff", 3L), ("##able", 4L), ("cafe", 5L),
      ("[PAD]", 6L), ("[SEP]", 7L))
    val vocabJson = vocab
      .map { case (p, id) => s""""$p": $id""" }.mkString(", ")
    val json = s"""{
      "normalizer": {"type": "BertNormalizer", "lowercase": true},
      "pre_tokenizer": {"type": "WhitespaceSplit"},
      "added_tokens": [
        {"id": 6, "content": "[PAD]", "special": true},
        {"id": 7, "content": "[SEP]", "special": true},
        {"id": 99, "content": "<oov>", "special": true}],
      "model": {"type": "WordPiece", "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 100,
                "vocab": {$vocabJson}}
    }"""
    val pJson = tmpDir("graft_tj_wp")
    assert(TokenizerJson.importTokenizerJson(spark, writeTmp(json),
      "tjwp", pJson) === "wordpiece")
    val pClassic = tmpDir("graft_tj_wpc")
    WordPiece.importWordPieceModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("piece_id", LongType))),
        vocab.map(v => Row(v._1, v._2)): _*),
      "tjwpc", pClassic, maxInputChars = 100,
      normalize = "lowercase_strip_accents",
      specialPieces = Seq("[PAD]", "[SEP]"))
    try {
      val metaJson = WordPiece.readWpMeta(spark, pJson)
      assert(metaJson.normalize === "lowercase_strip_accents")
      // added_tokens(special) in the vocab ride the stamp; the one
      // outside the vocab ("<oov>") is skipped — no id to declare
      assert(metaJson.specialIds === Seq(6L, 7L))
      val docs = df(docSchema, Row(1L, "The Café unAFFable zz"))
      def ids(name: String, p: String) =
        WordPiece.encodeIdsIndexed(spark, name, p, docs, "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq
      val a = ids("tjwp", pJson)
      assert(a === ids("tjwpc", pClassic))
      assert(a === Seq(1L, 5L, 2L, 3L, 4L, 0L))
    } finally Seq("tjwp_wp", "tjwpc_wp").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("Unigram dispatch: [piece, logp] vocab serves bit-identically to the TSV-shaped import") {
    val pieces = Seq(("a", -1.2, 0L), ("b", -2.3, 1L), ("ab", -1.0, 2L),
      ("ba", -2.0, 3L))
    val vocabJson = pieces
      .map { case (p, lp, _) => s"""["$p", $lp]""" }.mkString(", ")
    val json = s"""{
      "normalizer": {"type": "NFC"},
      "pre_tokenizer": {"type": "WhitespaceSplit"},
      "model": {"type": "Unigram", "vocab": [$vocabJson]}
    }"""
    val pJson = tmpDir("graft_tj_uni")
    assert(TokenizerJson.importTokenizerJson(spark, writeTmp(json),
      "tjuni", pJson) === "unigram")
    val pClassic = tmpDir("graft_tj_unic")
    Unigram.importUnigramModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("logp", DoubleType), StructField("piece_id", LongType))),
        pieces.map(p => Row(p._1, p._2, p._3)): _*),
      "tjunic", pClassic, normalize = "nfc")
    try {
      assert(Unigram.readUniMeta(spark, pJson).normalize === "nfc")
      val docs = df(docSchema, Row(1L, "abab ba x"))
      def ids(name: String, p: String) =
        Unigram.encodeIdsIndexed(spark, name, p, docs, "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq
      val a = ids("tjuni", pJson)
      assert(a === ids("tjunic", pClassic))
    } finally Seq("tjuni_uni", "tjunic_uni").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("hardening: ByteLevel refuses off-BPE and exotic options; unk_id declares the unk piece structural") {
    // a ByteLevel stage on a non-BPE model would be silently dropped
    // (byte-aliasing is the BPE import's) — refuse instead
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.importTokenizerJson(spark, writeTmp(
        """{"pre_tokenizer": {"type": "ByteLevel"},
           "model": {"type": "Unigram", "vocab": [["a", -1.0]]}}"""),
        "tjblu", tmpDir("graft_tj_blu"))
    }.getMessage.contains("ByteLevel pre_tokenizer on model.type"))
    // options the serve cannot honor refuse like Metaspace's
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.importTokenizerJson(spark, writeTmp(
        """{"pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": true},
           "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""),
        "tjblp", tmpDir("graft_tj_blp"))
    }.getMessage.contains("add_prefix_space"))
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.importTokenizerJson(spark, writeTmp(
        """{"pre_tokenizer": {"type": "ByteLevel", "use_regex": false},
           "model": {"type": "BPE", "vocab": {"a": 0}, "merges": []}}"""),
        "tjblr", tmpDir("graft_tj_blr"))
    }.getMessage.contains("use_regex"))
    // the Whitespace mapping carries the published UNICODE \w
    // semantics: superscript ² (No) is NOT a word char, undertie ‿
    // (Pc) IS, ZWJ (Join_Control) IS
    val wpat = TokenizerJson.WhitespacePattern.r
    val probe = "x² a‿b c\u200Dd" // superscript-two, undertie, ZWJ
    assert(wpat.findAllIn(probe).toList ===
      List("x", "²", "a‿b", "c\u200Dd"))
    // unk_id: null is the published no-unk serialization — imports
    assert(TokenizerJson.importTokenizerJson(spark, writeTmp(
      """{"model": {"type": "Unigram", "unk_id": null, "vocab":
           [["a", -1.0], ["b", -1.2]]}}"""),
      "tjnul", tmpDir("graft_tj_nul")) === "unigram")
    spark.sql("DROP TABLE IF EXISTS tjnul_uni")
    // model.unk_id names a control piece (published files carry it at
    // logp 0 — left in the lattice it would DOMINATE Viterbi): it
    // stamps structural and never matches literal text
    val pU = tmpDir("graft_tj_unk")
    assert(TokenizerJson.importTokenizerJson(spark, writeTmp(
      """{"model": {"type": "Unigram", "unk_id": 0, "vocab":
           [["<unk>", 0.0], ["a", -1.0], ["b", -1.2], ["<", -2.0],
            ["u", -2.1], ["n", -2.2], ["k", -2.3], [">", -2.4]]}}"""),
      "tjunk", pU) === "unigram")
    try {
      assert(Unigram.readUniMeta(spark, pU).specialIds === Seq(0L))
      val enc = Unigram.encodeIdsIndexed(spark, "tjunk", pU,
          df(docSchema, Row(1L, "<unk>")), "doc_id", "text")
        .orderBy("word_pos", "tok_pos").collect().map(_.getLong(3)).toSeq
      assert(enc === Seq(3L, 4L, 5L, 6L, 7L), enc.toString)
      // out-of-range unk_id refuses
      assert(intercept[IllegalArgumentException] {
        TokenizerJson.importTokenizerJson(spark, writeTmp(
          """{"model": {"type": "Unigram", "unk_id": 9, "vocab":
               [["a", -1.0]]}}"""),
          "tjunk2", tmpDir("graft_tj_unk2"))
      }.getMessage.contains("outside the vocab array"))
    } finally spark.sql("DROP TABLE IF EXISTS tjunk_uni")
  }

  test("Metaspace pre-tokenizer: the T5/LLaMA-class tokenizer.json serves identically to the stamped metaspace import; non-Unigram and exotic configs refuse") {
    val json = s"""{
      "normalizer": null,
      "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                        "add_prefix_space": true},
      "model": {"type": "Unigram", "vocab":
        [["▁", -2.0], ["▁ab", -2.5], ["▁c", -2.6], ["a", -2.4],
         ["b", -2.45], ["c", -2.55]]}
    }"""
    val pJson = tmpDir("graft_tj_ms")
    assert(TokenizerJson.importTokenizerJson(spark, writeTmp(json),
      "tjms", pJson) === "unigram")
    val pClassic = tmpDir("graft_tj_msc")
    Unigram.importUnigramModel(spark,
      df(StructType(Seq(StructField("piece", StringType),
        StructField("logp", DoubleType), StructField("piece_id", LongType))),
        Row("▁", -2.0, 0L), Row("▁ab", -2.5, 1L), Row("▁c", -2.6, 2L),
        Row("a", -2.4, 3L), Row("b", -2.45, 4L), Row("c", -2.55, 5L)),
      "tjmsc", pClassic, metaspace = true)
    try {
      assert(Unigram.readUniMeta(spark, pJson).metaspace)
      val docs = df(docSchema, Row(1L, " ab  c ab"))
      def ids(name: String, p: String) =
        Unigram.encodeIdsIndexed(spark, name, p, docs, "doc_id", "text")
          .orderBy("word_pos", "tok_pos").collect()
          .map(_.getLong(3)).toSeq
      // " ab  c ab" → ▁, ▁ab, ▁, ▁c, ▁ab
      val a = ids("tjms", pJson)
      assert(a === ids("tjmsc", pClassic) &&
        a === Seq(0L, 1L, 0L, 2L, 1L))
    } finally Seq("tjms_uni", "tjmsc_uni").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
    // Metaspace is the SentencePiece family's convention
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.importTokenizerJson(spark, writeTmp(s"""{
        "pre_tokenizer": {"type": "Metaspace"},
        "model": {"type": "WordPiece", "unk_token": "[UNK]",
                  "vocab": {"[UNK]": 0}}}"""),
        "tjmsw", tmpDir("graft_tj_msw"))
    }.getMessage.contains("Unigram"))
    // a non-▁ replacement or a suppressed prefix space has no engine form
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.preTokenizer(TokenizerJson.parse(
        """{"type": "Metaspace", "replacement": "_"}"""))
    }.getMessage.contains("U+2581"))
    assert(intercept[IllegalArgumentException] {
      TokenizerJson.preTokenizer(TokenizerJson.parse(
        """{"type": "Metaspace", "add_prefix_space": false}"""))
    }.getMessage.contains("prefix space"))
  }
}
