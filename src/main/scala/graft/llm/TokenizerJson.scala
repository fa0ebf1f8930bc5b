package graft.llm

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** Import of the MODERN single-file tokenizer exchange format — the
  * `tokenizer.json` every current model release ships (the HF
  * tokenizers on-disk schema; public format, e.g. GPT-2/BERT/T5
  * releases). One escape-aware reader parses the file driver-side
  * (size-guarded, model-sized by construction) and DISPATCHES on
  * `model.type` onto the three existing import paths:
  *
  *  - `"BPE"`   → [[Bpe.importBpeModel]] (vocab object + merges list;
  *    a ByteLevel pre-tokenizer selects the GPT-2 byte-alias decode
  *    and regex pattern — the classic merges.txt/vocab.json semantics)
  *  - `"WordPiece"` → [[WordPiece.importWordPieceModel]]
  *    (`continuing_subword_prefix`, `unk_token`,
  *    `max_input_chars_per_word` all carried)
  *  - `"Unigram"` → [[Unigram.importUnigramModel]] (the [piece, logp]
  *    vocab array; `unk_id` declares its piece a structural special —
  *    OOV is structural here, and an unk piece at the published
  *    logp 0 left in the lattice would dominate Viterbi)
  *
  * The file's `normalizer` block — the config the classic formats
  * could never carry — maps onto the stamped [[Normalize]] modes
  * (NFC/NFKC/Lowercase/BertNormalizer/Sequence-of-those) and rides the
  * model stamp, so a `tokenizer.json` import serves bit-identically to
  * the published pipeline without the caller restating anything.
  * Unknown normalizer or pre-tokenizer types REFUSE LOUDLY — silently
  * dropping a stage would mis-tokenize every document downstream.
  * BertNormalizer's `clean_text`/`handle_chinese_chars` sub-steps are
  * NOT applied (stated: they affect control chars and CJK spacing
  * only); its case/accent config maps exactly.
  *
  * `added_tokens` marked `special: true` that exist in a BPE vocab are
  * declared as special ids (the [[Bpe.importBpeModel]] specialTokens
  * contract — usable as structural eod/sep/pad ids downstream).
  *
  * Scale posture: everything here is driver-side over a MODEL-sized
  * file ([[Bpe.readSmallTextFile]]'s bound); nothing touches the
  * corpus. */
object TokenizerJson {

  // ---- minimal JSON AST + recursive-descent parser (driver-side) ----
  sealed trait J
  final case class JObj(fields: Map[String, J]) extends J
  final case class JArr(items: Vector[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(n: Double) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  /** Parse a complete JSON document — escape-aware (`\uXXXX`, the
    * two-char escapes), refuses trailing garbage. Recursion depth is
    * bounded by the document, which is size-guarded upstream. */
  private[graft] def parse(txt: String): J = {
    var i = 0
    val n = txt.length
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"tokenizer.json: $what at offset $i")
    def ws(): Unit =
      while (i < n && (txt.charAt(i) == ' ' || txt.charAt(i) == '\n' ||
        txt.charAt(i) == '\r' || txt.charAt(i) == '\t')) i += 1
    def expect(c: Char): Unit = {
      if (i >= n || txt.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def str(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder()
      while (i < n && txt.charAt(i) != '"') {
        val c = txt.charAt(i)
        if (c == '\\') {
          if (i + 1 >= n) fail("dangling escape")
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
              if (i + 6 > n) fail("truncated \\u escape")
              sb.append(Integer.parseInt(
                txt.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case other => fail(s"unknown escape '\\$other'")
          }
        } else { sb.append(c); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def value(): J = {
      ws()
      if (i >= n) fail("unexpected end")
      txt.charAt(i) match {
        case '"' => JStr(str())
        case '{' =>
          i += 1; ws()
          val fields = scala.collection.mutable.LinkedHashMap.empty[String, J]
          if (i < n && txt.charAt(i) == '}') { i += 1 }
          else {
            var more = true
            while (more) {
              ws(); val k = str(); ws(); expect(':')
              fields(k) = value(); ws()
              if (i < n && txt.charAt(i) == ',') { i += 1 }
              else { expect('}'); more = false }
            }
          }
          JObj(fields.toMap)
        case '[' =>
          i += 1; ws()
          val items = Vector.newBuilder[J]
          if (i < n && txt.charAt(i) == ']') { i += 1 }
          else {
            var more = true
            while (more) {
              items += value(); ws()
              if (i < n && txt.charAt(i) == ',') { i += 1 }
              else { expect(']'); more = false }
            }
          }
          JArr(items.result())
        case 't' =>
          if (!txt.startsWith("true", i)) fail("bad literal")
          i += 4; JBool(true)
        case 'f' =>
          if (!txt.startsWith("false", i)) fail("bad literal")
          i += 5; JBool(false)
        case 'n' =>
          if (!txt.startsWith("null", i)) fail("bad literal")
          i += 4; JNull
        case _ =>
          val start = i
          while (i < n && "+-0123456789.eE".indexOf(txt.charAt(i)) >= 0) i += 1
          if (i == start) fail("unexpected character")
          JNum(txt.substring(start, i).toDouble)
      }
    }
    val v = value(); ws()
    if (i != n) fail("trailing content")
    v
  }

  private def obj(j: J, what: String): Map[String, J] = j match {
    case JObj(f) => f
    case _ => throw new IllegalArgumentException(
      s"tokenizer.json: $what must be an object")
  }
  private def jstr(j: J, what: String): String = j match {
    case JStr(s) => s
    case _ => throw new IllegalArgumentException(
      s"tokenizer.json: $what must be a string")
  }
  private def jlong(j: J, what: String): Long = j match {
    case JNum(d) if d == math.rint(d) => d.toLong
    case _ => throw new IllegalArgumentException(
      s"tokenizer.json: $what must be an integer")
  }

  /** `added_tokens` marked `special: true` whose content is a real
    * vocabulary surface — forwarded as declared control pieces to the
    * family import (an added token OUTSIDE the vocab carries no landed
    * id to declare, so it is skipped). */
  private def addedSpecials(root: Map[String, J],
                            inVocab: String => Boolean): Seq[String] =
    root.getOrElse("added_tokens", JNull) match {
      case JArr(items) => items.collect {
        case JObj(t) if t.get("special").contains(JBool(true)) &&
            inVocab(jstr(t.getOrElse("content", JNull),
              "added_token.content")) =>
          jstr(t("content"), "added_token.content")
      }
      case _ => Vector.empty
    }

  /** The `normalizer` block → a stamped [[Normalize]] mode. `null` and
    * absent are `none`; `Sequence` must compose to one supported mode. */
  private[graft] def normalizeMode(norm: J): String = norm match {
    case JNull => "none"
    case JObj(f) => jstr(f.getOrElse("type", JNull), "normalizer.type") match {
      case "NFC" => "nfc"
      case "NFKC" => "nfkc"
      case "Lowercase" => "lowercase"
      case "BertNormalizer" =>
        val lower = f.get("lowercase").forall {
          case JBool(b) => b; case JNull => true; case _ => true
        }
        // published semantics: strip_accents null follows `lowercase`
        val strip = f.get("strip_accents") match {
          case Some(JBool(b)) => b
          case _ => lower
        }
        (lower, strip) match {
          case (true, true) => "lowercase_strip_accents"
          case (true, false) => "lowercase"
          case (false, false) => "none"
          case (false, true) => throw new IllegalArgumentException(
            "tokenizer.json: BertNormalizer strip_accents without " +
              "lowercase has no stamped normalize mode — import the " +
              "classic format and pre-normalize, or extend Normalize")
        }
      case "Sequence" =>
        val parts = f.get("normalizers") match {
          case Some(JArr(items)) => items.map(normalizeMode)
          case _ => throw new IllegalArgumentException(
            "tokenizer.json: Sequence normalizer without a normalizers array")
        }
        val folded = parts.filterNot(_ == "none")
        folded match {
          case Seq() => "none"
          case Seq(one) => one
          case Seq("nfc", "lowercase") | Seq("lowercase", "nfc") =>
            // NFC then lowercase ≈ lowercase on NFC text; we cannot
            // stamp two stages — refuse rather than approximate
            throw new IllegalArgumentException(
              "tokenizer.json: composite normalizer sequence " +
                s"(${parts.mkString(" → ")}) exceeds the stamped " +
                "single-mode normalizer — extend Normalize or " +
                "pre-normalize the corpus")
          case _ => throw new IllegalArgumentException(
            "tokenizer.json: composite normalizer sequence " +
              s"(${parts.mkString(" → ")}) exceeds the stamped " +
              "single-mode normalizer")
        }
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: unsupported normalizer type '$other' — " +
          "NFC, NFKC, Lowercase, BertNormalizer, Sequence")
    }
    case _ => throw new IllegalArgumentException(
      "tokenizer.json: normalizer must be an object or null")
  }

  /** The published `Whitespace` pre-tokenizer regex, `\w+|[^\w\s]+`
    * with the RUST engine's UNICODE `\w` = [Alphabetic, M, Nd, Pc,
    * Join_Control] — spelled as explicit property classes so Java
    * (ASCII `\w` by default) and the SQL replays agree with the
    * published splitting: L+Nl approximates Alphabetic (the published
    * class adds a few Other_Alphabetic marks, which \p{M} covers),
    * \p{Nd} NOT \p{N} (superscript ² is a non-word char there),
    * \p{Pc} NOT bare _ (U+203F undertie is a word char there), and
    * the two literal Join_Control points (ZWNJ/ZWJ). */
  private[graft] val WhitespacePattern: String = {
    val w = "\\p{L}\\p{Nl}\\p{M}\\p{Nd}\\p{Pc}\u200C\u200D"
    s"[$w]+|[^$w\\s]+"
  }

  /** The BERT basic-tokenizer split: words vs punctuation, where the
    * published `is_punctuation` is Unicode P* PLUS the ASCII symbol
    * characters ($ + < = > ^ ` | ~ — classified Sm/Sk/Sc, not P*, by
    * Unicode but split by BERT); each punctuation char isolates. */
  private[graft] val BertPrePattern: String =
    """[^\s\p{P}$+<=>^`|~]+|[\p{P}$+<=>^`|~]"""

  /** A parsed `pre_tokenizer` block: the GPT-2 byte level, a word
    * regex, or the SentencePiece metaspace convention (Unigram-only —
    * the dispatch refuses it elsewhere). */
  private[graft] final case class PreTok(byteLevel: Boolean,
                                         wordPattern: Option[String],
                                         metaspace: Boolean = false)

  /** The `pre_tokenizer` block → [[PreTok]]. ByteLevel is the GPT-2
    * contract; Whitespace[Split] and BertPreTokenizer map to the
    * engine's whitespace/regex splits; Metaspace (the T5/LLaMA-class
    * `▁` convention) maps to the Unigram family's stamped transform —
    * a non-`▁` replacement or `add_prefix_space: false` has no engine
    * form and refuses. */
  private[graft] def preTokenizer(pre: J): PreTok = pre match {
    case JNull => PreTok(byteLevel = false, None)
    case JObj(f) => jstr(f.getOrElse("type", JNull), "pre_tokenizer.type") match {
      case "ByteLevel" =>
        // the GPT-2 convention this engine serves: no injected prefix
        // space, regex pre-split — a config that turns either off
        // would silently shift word-initial ids on every document
        require(!f.get("add_prefix_space").exists {
            case JBool(b) => b; case _ => false
          },
          "tokenizer.json: ByteLevel add_prefix_space: true has no " +
            "engine form — the serve never injects a leading space")
        require(!f.get("use_regex").exists {
            case JBool(b) => !b; case _ => false
          },
          "tokenizer.json: ByteLevel use_regex: false has no engine " +
            "form — the serve always pre-splits on the GPT-2 regex")
        PreTok(byteLevel = true, Some(Bpe.Gpt2WordPattern))
      case "WhitespaceSplit" => PreTok(byteLevel = false, None)
      case "Whitespace" =>
        // the published Whitespace pre-tokenizer: Unicode \w runs vs
        // non-word runs, so punctuation splits off words
        PreTok(byteLevel = false, Some(WhitespacePattern))
      case "BertPreTokenizer" =>
        // whitespace split + punctuation isolation (the BERT basic
        // tokenizer's split step)
        PreTok(byteLevel = false, Some(BertPrePattern))
      case "Metaspace" =>
        f.get("replacement").foreach { r =>
          require(jstr(r, "replacement") == "▁",
            s"tokenizer.json: Metaspace replacement " +
              s"'${jstr(r, "replacement")}' is not '▁' — the engine " +
              "serves the published U+2581 convention only")
        }
        val prefixOk = f.get("add_prefix_space").forall {
          case JBool(b) => b; case _ => true
        } && !f.get("prepend_scheme").exists {
          case JStr(s) => s == "never"; case _ => false
        }
        require(prefixOk,
          "tokenizer.json: Metaspace without the prefix space " +
            "(add_prefix_space: false / prepend_scheme: never) has no " +
            "engine form — the stamped transform always prepends ▁")
        PreTok(byteLevel = false, None, metaspace = true)
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: unsupported pre_tokenizer type '$other' — " +
          "ByteLevel, Whitespace, WhitespaceSplit, BertPreTokenizer, " +
          "Metaspace")
    }
    case _ => throw new IllegalArgumentException(
      "tokenizer.json: pre_tokenizer must be an object or null")
  }

  /** Read + dispatch. `name`/`path` follow the family import they
    * resolve to; returns the family imported ("bpe" | "wordpiece" |
    * "unigram") so callers wire the right serve. */
  def importTokenizerJson(spark: SparkSession, jsonPath: String,
                          name: String, path: String,
                          maxBytes: Long = 64L << 20,
                          maxImport: Int = 1000000): String = {
    val root = obj(parse(Bpe.readSmallTextFile(spark, jsonPath, maxBytes)),
      "root")
    val model = obj(root.getOrElse("model", JNull), "model")
    val mtype = jstr(model.getOrElse("type", JNull), "model.type")
    val normalize = normalizeMode(root.getOrElse("normalizer", JNull))
    val pt = preTokenizer(root.getOrElse("pre_tokenizer", JNull))
    require(!pt.byteLevel || mtype == "BPE",
      s"tokenizer.json: a ByteLevel pre_tokenizer on model.type " +
        s"'$mtype' has no engine form — byte-aliasing is the BPE " +
        "family's import; dropping the stage would mis-tokenize " +
        "every document")
    require(!pt.metaspace || mtype == "Unigram",
      s"tokenizer.json: the Metaspace pre-tokenizer is the " +
        s"SentencePiece family's convention — only the Unigram path " +
        s"serves it (model.type is '$mtype')")
    val (byteLevel, wordPattern) = (pt.byteLevel, pt.wordPattern)
    import scala.jdk.CollectionConverters._
    mtype match {
      case "BPE" =>
        val vocab = obj(model.getOrElse("vocab", JNull), "model.vocab")
          .map { case (tok, id) => (tok, jlong(id, s"vocab['$tok']")) }
        val merges = model.getOrElse("merges", JNull) match {
          case JArr(items) => items.zipWithIndex.map {
            case (JStr(s), rank) => // classic "left right" form
              val sp = s.indexOf(' ')
              require(sp > 0 && s.indexOf(' ', sp + 1) < 0,
                s"tokenizer.json: merge '$s' is not 'left right'")
              (rank, s.substring(0, sp), s.substring(sp + 1))
            case (JArr(Vector(JStr(l), JStr(r))), rank) => (rank, l, r)
            case (_, rank) => throw new IllegalArgumentException(
              s"tokenizer.json: merge #$rank is neither 'left right' " +
                "nor [left, right]")
          }
          case _ => throw new IllegalArgumentException(
            "tokenizer.json: BPE model without a merges array")
        }
        val specials = addedSpecials(root, vocab.contains)
        val mergesDf = spark.createDataFrame(
          merges.map { case (rank, l, r) => Row(rank, l, r) }.asJava,
          StructType(Seq(StructField("rank", IntegerType),
            StructField("left", StringType),
            StructField("right", StringType))))
        val vocabDf = spark.createDataFrame(
          vocab.toSeq.map { case (t, id) => Row(t, id) }.asJava,
          StructType(Seq(StructField("token", StringType),
            StructField("token_id", LongType))))
        Bpe.importBpeModel(spark, mergesDf, vocabDf, name, path,
          byteLevel = byteLevel, wordPattern = wordPattern,
          gpt2Alias = byteLevel, maxImport = maxImport,
          specialTokens = specials, normalize = normalize)
        "bpe"
      case "WordPiece" =>
        val contPrefix = model.get("continuing_subword_prefix")
          .map(jstr(_, "continuing_subword_prefix")).getOrElse("##")
        val unkPiece = model.get("unk_token")
          .map(jstr(_, "unk_token")).getOrElse("[UNK]")
        val maxChars = model.get("max_input_chars_per_word")
          .map(jlong(_, "max_input_chars_per_word").toInt).getOrElse(200)
        val vocab = obj(model.getOrElse("vocab", JNull), "model.vocab")
          .map { case (p, id) => (p, jlong(id, s"vocab['$p']")) }
        val vocabDf = spark.createDataFrame(
          vocab.toSeq.map { case (p, id) => Row(p, id) }.asJava,
          StructType(Seq(StructField("piece", StringType),
            StructField("piece_id", LongType))))
        // [PAD]/[CLS]/[SEP]/[MASK]-style added tokens in the vocab
        // become stamped structural ids — out of the greedy matching
        // table, usable as eod/sep/pad downstream
        WordPiece.importWordPieceModel(spark, vocabDf, name, path,
          unkPiece = unkPiece, contPrefix = contPrefix,
          maxInputChars = maxChars, wordPattern = wordPattern,
          normalize = normalize,
          specialPieces = addedSpecials(root, vocab.contains))
        "wordpiece"
      case "Unigram" =>
        val pieces = model.getOrElse("vocab", JNull) match {
          case JArr(items) => items.zipWithIndex.map {
            case (JArr(Vector(JStr(p), JNum(lp))), id) => (p, lp, id.toLong)
            case (_, id) => throw new IllegalArgumentException(
              s"tokenizer.json: Unigram vocab entry #$id is not " +
                "[piece, logp]")
          }
          case _ => throw new IllegalArgumentException(
            "tokenizer.json: Unigram model without a vocab array")
        }
        val piecesDf = spark.createDataFrame(
          pieces.map { case (p, lp, id) => Row(p, lp, id) }.asJava,
          StructType(Seq(StructField("piece", StringType),
            StructField("logp", DoubleType),
            StructField("piece_id", LongType))))
        // added control pieces (<pad>/</s>-style) in the vocab become
        // stamped structural ids — out of the lattice, usable as
        // eod/sep/pad downstream (the BPE specialTokens contract).
        // model.unk_id names a control piece too (published files
        // carry it, often at logp 0 — left in the lattice it would
        // DOMINATE Viterbi): fold it into the declared specials.
        val pieceSet = pieces.map(_._1).toSet
        // unk_id: null is the published no-unk serialization — absent
        val unkSpecial = model.get("unk_id").filterNot(_ == JNull)
          .toSeq.map { j =>
          val u = jlong(j, "model.unk_id")
          require(u >= 0 && u < pieces.length,
            s"tokenizer.json: unk_id $u is outside the vocab array")
          pieces(u.toInt)._1
        }
        val specials =
          (addedSpecials(root, pieceSet.contains) ++ unkSpecial).distinct
        Unigram.importUnigramModel(spark, piecesDf, name, path,
          wordPattern = wordPattern, normalize = normalize,
          metaspace = pt.metaspace, specialPieces = specials)
        "unigram"
      case other => throw new IllegalArgumentException(
        s"tokenizer.json: unsupported model.type '$other' — " +
          "BPE, WordPiece, Unigram")
    }
  }

  /** JSON string escaping for the export writer — quote, backslash,
    * and every control character (as `\\uXXXX`); everything else
    * rides as UTF-8. The inverse of [[parse]]'s `str()`. */
  private def jesc(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  /** The stamped normalize mode → its `normalizer` block (None =
    * omit). The exact inverse of [[normalizeMode]]'s mapping, so an
    * export→import round trip reproduces the stamp. */
  private def normalizerJson(mode: String): Option[String] = mode match {
    case "none" => None
    case "nfc" => Some("""{"type":"NFC"}""")
    case "nfkc" => Some("""{"type":"NFKC"}""")
    case "lowercase" => Some("""{"type":"Lowercase"}""")
    case "lowercase_strip_accents" =>
      // clean_text/handle_chinese_chars false: this engine never
      // applies those sub-steps — the export states what it serves
      Some("""{"type":"BertNormalizer","clean_text":false,"handle_chinese_chars":false,"strip_accents":true,"lowercase":true}""")
    case other => throw new IllegalArgumentException(
      s"exportTokenizerJson: stamped normalize mode '$other' has no " +
        "normalizer block")
  }

  /** The stamped pre-tokenizer geometry → its `pre_tokenizer` block.
    * Only the published shapes [[preTokenizer]] can read back are
    * writable — an exotic word pattern REFUSES rather than exporting a
    * file that would silently re-import with different splitting. */
  private def preTokJson(byteLevel: Boolean, wordPattern: Option[String],
                         metaspace: Boolean): Option[String] =
    if (byteLevel) {
      require(wordPattern.contains(Bpe.Gpt2WordPattern),
        "exportTokenizerJson: a byte-level model whose word pattern is " +
          "not the GPT-2 regex has no ByteLevel pre_tokenizer form — " +
          "re-importing would silently change the split")
      Some("""{"type":"ByteLevel","add_prefix_space":false,"trim_offsets":true,"use_regex":true}""")
    } else if (metaspace)
      Some("""{"type":"Metaspace","replacement":"▁","add_prefix_space":true}""")
    else wordPattern match {
      case None => Some("""{"type":"WhitespaceSplit"}""")
      case Some(WhitespacePattern) => Some("""{"type":"Whitespace"}""")
      case Some(BertPrePattern) =>
        Some("""{"type":"BertPreTokenizer"}""")
      // stamps written by the first r16 Whitespace/BertPreTokenizer
      // mapping (ASCII \w, bare \p{P}) — exporting them as the
      // published blocks would re-import with DIFFERENT splitting;
      // name the migration instead of the generic refusal
      case Some("""[\w]+|[^\w\s]+""") |
           Some("""[^\s\p{P}]+|[\p{P}]""") =>
        throw new IllegalArgumentException(
          "exportTokenizerJson: this stamp carries a superseded r16 " +
            "pre-release pre-tokenizer pattern (ASCII word classes) — " +
            "re-import the source tokenizer.json to pick up the " +
            "published Unicode mapping, then export")
      case Some(p) => throw new IllegalArgumentException(
        s"exportTokenizerJson: word pattern '$p' has no published " +
          "pre_tokenizer type — serve via the classic format")
    }

  /** Stamped special ids + the full surface table → the
    * `added_tokens` fragment ("" when none). */
  private def addedJson(specialIds: Seq[Long],
                        surface: Map[Long, String]): String =
    if (specialIds.isEmpty) ""
    else {
      val items = specialIds.map { id =>
        val s = surface.getOrElse(id, throw new IllegalStateException(
          s"exportTokenizerJson: stamped special id $id is not in the " +
            "model table — corrupted model directory"))
        s"""{"id":$id,"content":"${jesc(s)}","special":true}"""
      }
      s""""added_tokens":[${items.mkString(",")}],"""
    }

  private def writeText(spark: SparkSession, path: String,
                        text: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write(text.getBytes("UTF-8"))
    finally os.close()
  }

  /** EXPORT a persisted model as a `tokenizer.json` — the reverse
    * direction of [[importTokenizerJson]], so a tokenizer TRAINED
    * IN-ENGINE ([[Bpe.writeBpeModel]] / [[WordPiece
    * .writeWordPieceModel]] / [[Unigram.writeUnigramModel]]) serves
    * every downstream consumer of the published schema. The contract
    * is the ROUND TRIP: importing the exported file reproduces the
    * model bit-exactly in this engine (stamp, ids, specials) — which
    * is also exactly what a schema-conformant external reader sees.
    * Byte-level BPE surfaces re-alias from the engine's hex-pair
    * symbols to the published GPT-2 alias alphabet; stamped specials
    * become `added_tokens(special: true)`; the stamped normalizer and
    * pre-tokenizer write their published blocks (exotic word patterns
    * refuse — a file that re-imports with different splitting must
    * never exist). */
  def exportTokenizerJson(spark: SparkSession, name: String,
                          path: String, jsonPath: String,
                          family: String): Unit = family match {
    case "bpe" =>
      val meta = Bpe.readBpeMeta(spark, path)
      def surf(s: String): String =
        if (!meta.byteLevel) s
        else s.grouped(2).map(h =>
          Bpe.gpt2AliasForByte(Integer.parseInt(h, 16))).mkString
      val vocab = spark.table(s"${name}_bpe_vocab")
        .select("token", "token_id").collect()
        .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2)
      val merges = Bpe.mergeList(spark.table(s"${name}_bpe"))
      val vocabJson = vocab
        .map { case (t, id) => s""""${jesc(surf(t))}":$id""" }
        .mkString(",")
      val mergesJson = merges // array form: a space inside a symbol
        .map { case (l, r) =>  // can never corrupt the file
          s"""["${jesc(surf(l))}","${jesc(surf(r))}"]""" }
        .mkString(",")
      writeText(spark, jsonPath, s"""{"version":"1.0",${
          normalizerJson(meta.normalize).fold("")(n => s""""normalizer":$n,""")
        }${
          preTokJson(meta.byteLevel, meta.wordPattern, metaspace = false)
            .fold("")(p => s""""pre_tokenizer":$p,""")
        }${ // external readers re-byte the alias alphabet on decode
          if (meta.byteLevel) """"decoder":{"type":"ByteLevel"},"""
          else ""
        }${
          addedJson(meta.specialIds,
            vocab.map { case (t, id) => id -> surf(t) }.toMap)
        }"model":{"type":"BPE","vocab":{$vocabJson},"merges":[$mergesJson]}}""")
    case "wordpiece" =>
      val meta = WordPiece.readWpMeta(spark, path)
      val vocab = WordPiece.vocabServing(spark.table(s"${name}_wp"))
        .sortBy(_._2)
      val vocabJson = vocab
        .map { case (p, id) => s""""${jesc(p)}":$id""" }.mkString(",")
      writeText(spark, jsonPath, s"""{"version":"1.0",${
          normalizerJson(meta.normalize).fold("")(n => s""""normalizer":$n,""")
        }${
          preTokJson(byteLevel = false, meta.wordPattern,
            metaspace = false).fold("")(p => s""""pre_tokenizer":$p,""")
        }"decoder":{"type":"WordPiece","prefix":"${jesc(meta.contPrefix)}","cleanup":false},${
          addedJson(meta.specialIds,
            vocab.map { case (p, id) => id -> p }.toMap)
        }"model":{"type":"WordPiece","unk_token":"${jesc(meta.unkPiece)}","continuing_subword_prefix":"${jesc(meta.contPrefix)}","max_input_chars_per_word":${meta.maxInputChars},"vocab":{$vocabJson}}}""")
    case "unigram" =>
      val meta = Unigram.readUniMeta(spark, path)
      val rows = spark.table(s"${name}_uni")
        .select("piece", "logp", "piece_id").collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .sortBy(_._3)
      // the format assigns ids by ARRAY INDEX — a sparse id space
      // would silently renumber on re-import
      rows.iterator.zipWithIndex.foreach { case ((p, _, id), i) =>
        require(id == i.toLong,
          s"exportTokenizerJson: unigram piece '$p' has id $id at " +
            s"position $i — the Unigram vocab array requires DENSE ids " +
            "0..n-1 (re-import would renumber)")
      }
      val vocabJson = rows
        .map { case (p, lp, _) => s"""["${jesc(p)}",$lp]""" }
        .mkString(",")
      writeText(spark, jsonPath, s"""{"version":"1.0",${
          normalizerJson(meta.normalize).fold("")(n => s""""normalizer":$n,""")
        }${
          preTokJson(byteLevel = false,
            if (meta.metaspace) None else meta.wordPattern,
            meta.metaspace).fold("")(p => s""""pre_tokenizer":$p,""")
        }${ // the ▁→space inverse for external readers
          if (meta.metaspace)
            """"decoder":{"type":"Metaspace","replacement":"▁","add_prefix_space":true},"""
          else ""
        }${
          addedJson(meta.specialIds,
            rows.map { case (p, _, id) => id -> p }.toMap)
        }"model":{"type":"Unigram","byte_fallback":${meta.byteFallback},"vocab":[$vocabJson]}}""")
    case other => throw new IllegalArgumentException(
      s"exportTokenizerJson: unknown family '$other' — \"bpe\", " +
        "\"unigram\" or \"wordpiece\"")
  }
}
