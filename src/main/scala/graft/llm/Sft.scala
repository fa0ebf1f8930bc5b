package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs

/** SUPERVISED-FINE-TUNING example assembly — the step between "curated
  * (prompt, response) pairs" and "training tensors" that every
  * post-training pipeline runs: each pair encodes under the SAME
  * persisted tokenizer the base model was trained with, lands as one id
  * array, and carries the LOSS-MASK boundary (`loss_from`) that makes
  * the example trainable — the trainer computes loss only on positions
  * `[loss_from, n_tokens)`, i.e. the response (and the end-of-document
  * id, the standard convention), never on the prompt.
  *
  * Layout contract: `input_ids = enc(prompt) ++ [sepId?] ++
  * enc(response) ++ [eodId?]`, `loss_from = |enc(prompt)| + (sepId ? 1
  * : 0)`. The separator is the template hook — a chat template's
  * role-delimiter id (reserved outside the vocabulary, like every
  * structural id here); richer templates are string-side concerns the
  * caller applies to the prompt/response columns BEFORE assembly, so
  * the engine never hard-codes one vendor's chat format.
  *
  * Row policy (all documented, none silent-surprising): a NULL response
  * drops (nothing to train on), a NULL prompt is the empty prompt (a
  * continuation example), a response that encodes to ZERO ids drops
  * (loss over nothing), and `maxLen` drops examples whose id mass
  * exceeds it — the published drop-overlong guard; truncating a
  * response mid-thought teaches the model to stop mid-thought.
  *
  * Scale shape: one blockwise pass — the fused memoized per-word encode
  * inside the scan, no shuffle, no join; output is pair-cardinality.
  */
object Sft {

  /** A RESOLVED serving tokenizer for the indexed assemblers — the
    * family switch the windows landings run ([[Pipeline.BpeWindows]]'
    * `tokenizer` field), here for post-training assembly: post-training
    * data MUST tokenize exactly like the pretraining windows, whichever
    * family the base model stamped. `encode` is the family's fused
    * per-word expression, `prepText` the stamped normalizer (+ the
    * unigram metaspace transform), `ids` the vocabulary id set the
    * structural-id refusals check against. */
  private final case class Tok(encode: Column => Column,
                               prepText: Column => Column,
                               wordPattern: Option[String],
                               ids: Set[Long]) {
    def enc(text: Column): Column =
      flatten(transform(
        filter(Bpe.wordsOfCol(prepText(text), wordPattern),
          w => length(w) >= 1),
        w => encode(w)))
  }

  private def resolveTok(spark: SparkSession, name: String, path: String,
                         tokenizer: String): Tok = tokenizer match {
    case "bpe" =>
      val meta = Bpe.readBpeMeta(spark, path)
      val merges = Bpe.mergeList(spark.table(s"${name}_bpe"))
      // serving vocab: stamped specials subtracted, so a published
      // model's control tokens are usable as structural ids here
      val vocab = Bpe.servingVocabMap(spark, name, path)
      Tok(w => TextHashExprs.bpeEncodeIds(w, merges, vocab, meta.byteLevel),
        t => Normalize.colOf(t, meta.normalize),
        meta.wordPattern, vocab.values.toSet)
    case "wordpiece" =>
      val meta = WordPiece.readWpMeta(spark, path)
      // stamped specials subtracted — a published model's control
      // tokens ([SEP]/[PAD]) are usable as structural ids here
      val pairs = WordPiece.vocabServingStamped(spark, name, meta)
      Tok(w => TextHashExprs.wordPieceEncodeIds(w, pairs, meta.unkId,
          meta.contPrefix, meta.maxInputChars),
        t => Normalize.colOf(t, meta.normalize),
        meta.wordPattern, pairs.map(_._2).toSet)
    case "unigram" =>
      val meta = Unigram.readUniMeta(spark, path)
      val (pieces, bytes) = Unigram.servingViterbiWith(spark, name,
        path, meta)
      Tok(w => TextHashExprs.unigramEncodeIds(w, pieces, bytes),
        t => {
          val n = Normalize.colOf(t, meta.normalize)
          if (meta.metaspace) Unigram.metaspaceCol(n) else n
        },
        if (meta.metaspace) Some(Unigram.MetaspacePattern)
        else meta.wordPattern,
        pieces.map(_._2).toSet ++ bytes.map(_.toSet).getOrElse(Set.empty))
    case other => throw new IllegalArgumentException(
      s"unknown tokenizer '$other' — \"bpe\", \"unigram\" or " +
        "\"wordpiece\" (the BpeWindows switch)")
  }

  /** Assemble (idCol, input_ids, n_tokens, loss_from) from (prompt,
    * response) pairs under an explicit merge list + vocab map. */
  def assembleExamples(pairs: DataFrame, idCol: String, promptCol: String,
                       responseCol: String,
                       merges: Seq[(String, String)],
                       vocab: Map[String, Long],
                       sepId: Option[Long] = None,
                       eodId: Option[Long] = None,
                       maxLen: Option[Long] = None,
                       byteLevel: Boolean = false,
                       wordPattern: Option[String] = None,
                       truncation: String = "drop"): DataFrame =
    assembleExamplesWith(pairs, idCol, promptCol, responseCol,
      Tok(w => TextHashExprs.bpeEncodeIds(w, merges, vocab, byteLevel),
        identity, wordPattern, vocab.values.toSet),
      sepId, eodId, maxLen, truncation)

  private def assembleExamplesWith(pairs: DataFrame, idCol: String,
                                   promptCol: String, responseCol: String,
                                   tok: Tok,
                                   sepId: Option[Long],
                                   eodId: Option[Long],
                                   maxLen: Option[Long],
                                   truncation: String = "drop",
                                   passthrough: Seq[String] = Nil): DataFrame = {
    Seq("sepId" -> sepId, "eodId" -> eodId).foreach { case (name, id) =>
      id.foreach(v => require(v != -1L && !tok.ids.contains(v),
        s"assembleExamples: $name $v collides with a vocab id (or the " +
          "-1 OOV sentinel) — reserve an id outside the vocabulary"))
    }
    require(sepId.isEmpty || sepId != eodId,
      "assembleExamples: sepId and eodId must differ — a trainer " +
        "cannot tell the template boundary from the document end")
    maxLen.foreach(l => require(l > 0, s"maxLen must be positive, got $l"))
    require(truncation == "drop" || truncation == "prompt_left",
      s"assembleExamples: unknown truncation '$truncation' — \"drop\" " +
        "(discard overlong examples) or \"prompt_left\" (keep the " +
        "END of the prompt so the response always fits)")
    require(truncation == "drop" || maxLen.isDefined,
      "assembleExamples: truncation=prompt_left without maxLen has " +
        "nothing to truncate to — pass the length budget")
    val base = pairs.filter(col(responseCol).isNotNull)
      .withColumn("__sft_p__", coalesce(col(promptCol), lit("")))
    val pIds = tok.enc(col("__sft_p__"))
    val rIds = tok.enc(col(responseCol))
    val pFull = sepId.fold(pIds)(s => concat(pIds, array(lit(s))))
    val rFull = eodId.fold(rIds)(e => concat(rIds, array(lit(e))))
    val thru = passthrough.map(col)
    val staged = base
      .select(col(idCol) +: pFull.as("__pi__") +: rIds.as("__rr__") +:
        rFull.as("__ri__") +: thru: _*)
      .filter(size(col("__rr__")) >= 1) // loss over nothing: drop
    val out = truncation match {
      case "drop" =>
        staged.select(col(idCol) +:
          concat(col("__pi__"), col("__ri__")).as("input_ids") +:
          size(col("__pi__")).cast("long").as("loss_from") +: thru: _*)
      case "prompt_left" =>
        // the published keep-end convention: drop ids from the FRONT
        // of the prompt side (the sep marker at its tail survives)
        // until prompt+response fit the budget; the response and its
        // loss mask are NEVER cut — an example whose response side
        // alone exceeds maxLen drops (a truncated loss target would
        // train on half an answer)
        val l = maxLen.get
        staged
          .filter(size(col("__ri__")) <= l)
          .withColumn("__over__", greatest(lit(0),
            size(col("__pi__")) + size(col("__ri__")) - lit(l.toInt)))
          .select(col(idCol) +:
            concat(slice(col("__pi__"), col("__over__") + 1,
                size(col("__pi__")) - col("__over__")),
              col("__ri__")).as("input_ids") +:
            (size(col("__pi__")) - col("__over__")).cast("long")
              .as("loss_from") +: thru: _*)
    }
    val shaped = out
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
      .select(col(idCol) +: col("input_ids") +: col("n_tokens") +:
        col("loss_from") +: thru: _*)
    if (truncation == "prompt_left") shaped
    else maxLen.fold(shaped)(l => shaped.filter(col("n_tokens") <= l))
  }

  /** [[assembleExamples]] served from a persisted BPE model
    * ([[Bpe.writeBpeModel]] / [[Bpe.importBpeModel]]) — symbolization
    * level and pre-tokenizer ride the stamp, so SFT examples are
    * guaranteed to tokenize EXACTLY like the pretraining windows the
    * base model saw. */
  def assembleExamplesIndexed(spark: SparkSession, name: String,
                              path: String, pairs: DataFrame,
                              idCol: String, promptCol: String,
                              responseCol: String,
                              sepId: Option[Long] = None,
                              eodId: Option[Long] = None,
                              maxLen: Option[Long] = None,
                              tokenizer: String = "bpe",
                              truncation: String = "drop"): DataFrame =
    assembleExamplesWith(pairs, idCol, promptCol, responseCol,
      resolveTok(spark, name, path, tokenizer), sepId, eodId, maxLen,
      truncation)

  /** One role's slot in a chat template: literal id arrays around the
    * encoded turn content, whether the trainer computes loss on the
    * turn, and an optional per-turn loss weight. All ids are
    * STRUCTURAL — reserved outside the vocabulary (or stamped
    * specials), the eodId/padId contract. */
  final case class TurnTemplate(prefix: Seq[Long], suffix: Seq[Long],
                                loss: Boolean, weight: Double = 1.0)

  /** The standard chat-template shape from stamped special ids: each
    * role opens with its role id and closes with one shared end-of-turn
    * id (the <|im_start|>/<|im_end|> geometry); loss lands on
    * `lossRoles` (assistant turns, conventionally). */
  def chatTemplate(roleIds: Map[String, Long], endId: Long,
                   lossRoles: Set[String] = Set("assistant"))
    : Map[String, TurnTemplate] =
    roleIds.map { case (role, id) =>
      role -> TurnTemplate(Seq(id), Seq(endId), lossRoles.contains(role))
    }

  /** MULTI-TURN CONVERSATION assembly — the modern SFT corpus shape
    * (virtually all post-training data is conversations, not single
    * (prompt, response) pairs): each row carries a `turnsCol` array of
    * `struct<role: string, content: string>` and lands as ONE id
    * sequence under the chat template, with PER-TURN loss masks.
    *
    * Layout: `input_ids = ⊕_turns (prefix(role) ++ enc(content) ++
    * suffix(role)) ++ [eodId?]`. A turn whose role has `loss = true`
    * contributes the loss span `(pos = start of enc(content), len =
    * |enc(content)| + |suffix|)` — the role header is GIVEN (prompt
    * side), the content and the turn terminator are PREDICTED, exactly
    * the [[assembleExamples]] convention where the response's eod id
    * trains; `eodId` joins the LAST span when the final turn is a loss
    * turn (the document end is predicted after an assistant turn, not
    * after a user turn). Spans carry the role's `weight` — per-turn
    * loss weighting rides the same struct.
    *
    * Output: idCol, `input_ids`, `n_tokens`, `loss_spans:
    * array<struct<pos, len, weight>>` (position-ordered, zero-length
    * spans dropped), `loss_from` (= first loss position — the
    * [[assembleExamples]] compatibility field), `n_turns`. A
    * DEGENERATE two-turn template (user: no prefix + sep suffix, no
    * loss; assistant: no prefix + eod suffix, loss) reproduces
    * [[assembleExamples]] bit-exactly (spec-pinned).
    *
    * Row policy: a null/empty turns array drops; a turn with a role
    * not in the template REFUSES LOUDLY at execution (silently
    * dropping a turn corrupts the conversation); null content is the
    * empty turn (encodes to zero ids — the null-prompt convention); a
    * conversation with ZERO loss positions drops (nothing to train
    * on); `maxLen` drops overlong conversations whole (truncating
    * mid-conversation teaches truncated conversations).
    *
    * Feeds [[packExamples]] / [[bucketByLength]] unchanged (they
    * consume (id, input_ids) only); `doc_spans` + `loss_spans` give a
    * trainer the per-position mask: position p of packed span
    * (id, pos0, _) is a loss position with weight w iff some loss span
    * (ps, ln, w) of id has ps ≤ p − pos0 < ps + ln.
    *
    * Scale shape: ONE blockwise pass — the fused memoized per-word
    * encode inside the scan, the span scan as a bounded per-row
    * `aggregate` over the turns array; no shuffle, no join; output is
    * conversation-cardinality. */
  def assembleConversation(convs: DataFrame, idCol: String,
                           turnsCol: String,
                           merges: Seq[(String, String)],
                           vocab: Map[String, Long],
                           template: Map[String, TurnTemplate],
                           eodId: Option[Long] = None,
                           maxLen: Option[Long] = None,
                           byteLevel: Boolean = false,
                           wordPattern: Option[String] = None): DataFrame =
    assembleConversationWith(convs, idCol, turnsCol,
      Tok(w => TextHashExprs.bpeEncodeIds(w, merges, vocab, byteLevel),
        identity, wordPattern, vocab.values.toSet),
      template, eodId, maxLen)

  private def assembleConversationWith(convs: DataFrame, idCol: String,
                                       turnsCol: String, tok: Tok,
                                       template: Map[String, TurnTemplate],
                                       eodId: Option[Long],
                                       maxLen: Option[Long]): DataFrame = {
    require(template.nonEmpty, "assembleConversation: empty template")
    val structural = template.valuesIterator
      .flatMap(t => t.prefix ++ t.suffix).toSeq ++ eodId.toSeq
    structural.foreach(v =>
      require(v != -1L && !tok.ids.contains(v),
        s"assembleConversation: structural id $v collides with a vocab " +
          "id (or the -1 OOV sentinel) — reserve ids outside the " +
          "vocabulary (stamped specials qualify)"))
    template.foreach { case (role, t) =>
      require(t.weight > 0.0,
        s"assembleConversation: role '$role' has non-positive loss " +
          s"weight ${t.weight} — a zero-weight turn is a loss=false turn")
    }
    maxLen.foreach(l => require(l > 0, s"maxLen must be positive, got $l"))
    val roles = template.keys.toSeq.sorted
    def idsLit(ids: Seq[Long]): Column =
      if (ids.isEmpty) array().cast("array<bigint>")
      else array(ids.map(lit(_).cast("long")): _*)
    // per-turn pieces: (prefix ids, enc ids, suffix ids, loss, weight)
    val pieces = transform(col(turnsCol), t => struct(
      roles.foldLeft(raise_error(
          concat(lit("assembleConversation: turn role '"),
            t.getField("role"),
            lit(s"' is not in the template (${roles.mkString(", ")})")))
          .cast("array<bigint>")) { (acc, r) =>
        when(t.getField("role") === lit(r),
          idsLit(template(r).prefix)).otherwise(acc)
      }.as("pre"),
      tok.enc(coalesce(t.getField("content"), lit(""))).as("enc"),
      roles.foldLeft(array().cast("array<bigint>")) { (acc, r) =>
        when(t.getField("role") === lit(r),
          idsLit(template(r).suffix)).otherwise(acc)
      }.as("suf"),
      roles.foldLeft(lit(false)) { (acc, r) =>
        when(t.getField("role") === lit(r),
          lit(template(r).loss)).otherwise(acc)
      }.as("loss"),
      roles.foldLeft(lit(1.0)) { (acc, r) =>
        when(t.getField("role") === lit(r),
          lit(template(r).weight)).otherwise(acc)
      }.as("weight")))
    val spanType = "array<struct<pos: bigint, len: bigint, weight: double>>"
    val base = convs
      .filter(col(turnsCol).isNotNull && size(col(turnsCol)) >= 1)
      .withColumn("__pieces__", pieces)
    val ids0 = flatten(transform(col("__pieces__"),
      p => concat(p.getField("pre"), p.getField("enc"),
        p.getField("suf"))))
    val idsOut = eodId.fold(ids0)(e => concat(ids0, array(lit(e))))
    // one bounded scan over the turns: running offset + loss spans
    val scanned = aggregate(col("__pieces__"),
      struct(lit(0L).as("pos"),
        expr(s"CAST(array() AS $spanType)").as("spans")),
      (acc, p) => {
        val preLen = size(p.getField("pre")).cast("long")
        val encLen = size(p.getField("enc")).cast("long")
        val sufLen = size(p.getField("suf")).cast("long")
        val total = preLen + encLen + sufLen
        val span = struct(
          (acc.getField("pos") + preLen).as("pos"),
          (encLen + sufLen).as("len"),
          p.getField("weight").as("weight"))
        struct(
          (acc.getField("pos") + total).as("pos"),
          when(p.getField("loss") && (encLen + sufLen) > 0L,
            concat(acc.getField("spans"), array(span)))
            .otherwise(acc.getField("spans")).as("spans"))
      })
    val lastPiece = element_at(col("__pieces__"), -1)
    val lastLoss = lastPiece.getField("loss")
    // whether the FINAL turn contributed a span: only then is the last
    // span element the final turn's — extending it otherwise would
    // mislabel an intervening position (a later turn's role header) as
    // a loss position and leave the eod itself unmasked
    val lastContrib = (size(lastPiece.getField("enc")) +
      size(lastPiece.getField("suf"))) > 0
    val out = base
      .withColumn("input_ids", idsOut)
      .withColumn("__spans0__", scanned.getField("spans"))
      .withColumn("n_tokens", size(col("input_ids")).cast("long"))
      // eod joins the last span when the FINAL turn is a loss turn
      // that contributed it; an EMPTY final loss turn gets a fresh
      // len-1 span on the eod (the model still trains to end there)
      .withColumn("loss_spans",
        if (eodId.isEmpty) col("__spans0__")
        else when(lastLoss && lastContrib && size(col("__spans0__")) >= 1,
          transform(col("__spans0__"), (s, i) =>
            when(i === size(col("__spans0__")) - 1,
              struct(s.getField("pos").as("pos"),
                (s.getField("len") + 1L).as("len"),
                s.getField("weight").as("weight")))
              .otherwise(s)))
          .when(lastLoss && !lastContrib,
            concat(col("__spans0__"), array(struct(
              (col("n_tokens") - 1L).as("pos"), lit(1L).as("len"),
              lastPiece.getField("weight").as("weight")))))
          .otherwise(col("__spans0__")))
      .filter(size(col("loss_spans")) >= 1) // nothing to train on: drop
      .withColumn("loss_from",
        element_at(col("loss_spans"), 1).getField("pos"))
      .withColumn("n_turns", size(col(turnsCol)).cast("long"))
      .select(col(idCol), col("input_ids"), col("n_tokens"),
        col("loss_spans"), col("loss_from"), col("n_turns"))
    maxLen.fold(out)(l => out.filter(col("n_tokens") <= l))
  }

  /** [[assembleConversation]] served from the persisted BPE model —
    * tokenizer geometry, stamped normalizer, and declared special ids
    * all ride the stamp ([[assembleExamplesIndexed]]'s contract). */
  def assembleConversationIndexed(spark: SparkSession, name: String,
                                  path: String, convs: DataFrame,
                                  idCol: String, turnsCol: String,
                                  template: Map[String, TurnTemplate],
                                  eodId: Option[Long] = None,
                                  maxLen: Option[Long] = None,
                                  tokenizer: String = "bpe"): DataFrame =
    assembleConversationWith(convs, idCol, turnsCol,
      resolveTok(spark, name, path, tokenizer), template, eodId, maxLen)

  /** PREFERENCE-PAIR assembly — the DPO / reward-model data layout
    * (one prompt, two responses, a preference): each row encodes the
    * SHARED prompt once and both responses against it, so
    * `chosen_ids` and `rejected_ids` each follow the
    * [[assembleExamples]] layout (prompt ++ sep? ++ response ++ eod?)
    * and SHARE `loss_from` — the prompt prefix is bit-identical by
    * construction, which is exactly what a DPO loss needs (the
    * per-pair logprob difference is computed over the response
    * positions of two sequences with a common prefix).
    *
    * Row policy mirrors [[assembleExamples]], applied to BOTH sides: a
    * null or zero-token chosen OR rejected drops the row (a
    * preference needs both sides), a null prompt is the empty prompt,
    * and `maxLen` drops rows where EITHER side's id mass exceeds it.
    *
    * Scale shape: one blockwise pass, no shuffle; output is
    * pair-cardinality. */
  def assemblePreferencePairs(pairs: DataFrame, idCol: String,
                              promptCol: String, chosenCol: String,
                              rejectedCol: String,
                              merges: Seq[(String, String)],
                              vocab: Map[String, Long],
                              sepId: Option[Long] = None,
                              eodId: Option[Long] = None,
                              maxLen: Option[Long] = None,
                              byteLevel: Boolean = false,
                              wordPattern: Option[String] = None): DataFrame =
    assemblePreferencePairsWith(pairs, idCol, promptCol, chosenCol,
      rejectedCol,
      Tok(w => TextHashExprs.bpeEncodeIds(w, merges, vocab, byteLevel),
        identity, wordPattern, vocab.values.toSet),
      sepId, eodId, maxLen)

  private def assemblePreferencePairsWith(pairs: DataFrame, idCol: String,
                                          promptCol: String,
                                          chosenCol: String,
                                          rejectedCol: String, tok: Tok,
                                          sepId: Option[Long],
                                          eodId: Option[Long],
                                          maxLen: Option[Long]): DataFrame = {
    Seq("sepId" -> sepId, "eodId" -> eodId).foreach { case (name, id) =>
      id.foreach(v => require(v != -1L && !tok.ids.contains(v),
        s"assemblePreferencePairs: $name $v collides with a vocab id " +
          "(or the -1 OOV sentinel) — reserve an id outside the " +
          "vocabulary"))
    }
    require(sepId.isEmpty || sepId != eodId,
      "assemblePreferencePairs: sepId and eodId must differ")
    maxLen.foreach(l => require(l > 0, s"maxLen must be positive, got $l"))
    val base = pairs
      .filter(col(chosenCol).isNotNull && col(rejectedCol).isNotNull)
      .withColumn("__sft_p__", coalesce(col(promptCol), lit("")))
    val pIds = tok.enc(col("__sft_p__"))
    val cIds = tok.enc(col(chosenCol))
    val rIds = tok.enc(col(rejectedCol))
    val pFull = sepId.fold(pIds)(s => concat(pIds, array(lit(s))))
    def full(ids: org.apache.spark.sql.Column) =
      eodId.fold(ids)(e => concat(ids, array(lit(e))))
    val out = base
      .select(col(idCol), pFull.as("__pi__"),
        cIds.as("__cc__"), rIds.as("__rr__"))
      .filter(size(col("__cc__")) >= 1 && size(col("__rr__")) >= 1)
      .select(col(idCol),
        concat(col("__pi__"), full(col("__cc__"))).as("chosen_ids"),
        concat(col("__pi__"), full(col("__rr__"))).as("rejected_ids"),
        size(col("__pi__")).cast("long").as("loss_from"))
      .withColumn("n_chosen", size(col("chosen_ids")).cast("long"))
      .withColumn("n_rejected", size(col("rejected_ids")).cast("long"))
      .select(col(idCol), col("chosen_ids"), col("rejected_ids"),
        col("n_chosen"), col("n_rejected"), col("loss_from"))
    maxLen.fold(out)(l =>
      out.filter(col("n_chosen") <= l && col("n_rejected") <= l))
  }

  /** [[assemblePreferencePairs]] served from the persisted model —
    * the [[assembleExamplesIndexed]] contract for preference data. */
  def assemblePreferencePairsIndexed(spark: SparkSession, name: String,
                                     path: String, pairs: DataFrame,
                                     idCol: String, promptCol: String,
                                     chosenCol: String,
                                     rejectedCol: String,
                                     sepId: Option[Long] = None,
                                     eodId: Option[Long] = None,
                                     maxLen: Option[Long] = None,
                                     tokenizer: String = "bpe"): DataFrame =
    assemblePreferencePairsWith(pairs, idCol, promptCol, chosenCol,
      rejectedCol, resolveTok(spark, name, path, tokenizer),
      sepId, eodId, maxLen)

  /** BINARY-LABELED preference assembly — the KTO data shape
    * (Ethayarajh et al. 2024): UNPAIRED (prompt, completion,
    * desirable) feedback rows (thumbs up/down — no chosen/rejected
    * pairing exists) assemble exactly like [[assembleExamplesIndexed]]
    * (ids = enc(prompt) ++ [sep] ++ enc(completion) ++ [eod],
    * `loss_from` at the completion boundary) with the BOOLEAN label
    * carried through as `desirable`. Null labels drop — an unlabeled
    * row trains neither direction. Blockwise; the label rides the
    * select chain, no join-back shuffle. */
  def assembleBinaryPreference(spark: SparkSession, name: String,
                               path: String, rows: DataFrame,
                               idCol: String, promptCol: String,
                               completionCol: String, labelCol: String,
                               sepId: Option[Long] = None,
                               eodId: Option[Long] = None,
                               maxLen: Option[Long] = None,
                               tokenizer: String = "bpe",
                               truncation: String = "drop"): DataFrame = {
    rows.schema(labelCol).dataType match {
      case org.apache.spark.sql.types.BooleanType => ()
      case other => throw new IllegalArgumentException(
        s"assembleBinaryPreference: label column '$labelCol' must be " +
          s"boolean (the desirable/undesirable bit), got ${other.simpleString}")
    }
    require(!Set(idCol, "input_ids", "n_tokens", "loss_from")
        .contains(labelCol),
      s"assembleBinaryPreference: label column '$labelCol' collides " +
        "with an output column name")
    assembleExamplesWith(
        rows.filter(col(labelCol).isNotNull), idCol, promptCol,
        completionCol, resolveTok(spark, name, path, tokenizer),
        sepId, eodId, maxLen, truncation, passthrough = Seq(labelCol))
      .withColumnRenamed(labelCol, "desirable")
  }

  /** BEST-OF-N / REJECTION-SAMPLING selection — the RFT data shape
    * (Zelikman et al. 2022 STaR; Dong et al. 2023 RAFT): a sampler
    * emitted N candidate responses per prompt with a reward/verifier
    * score; keep the top `k` per prompt (optionally only those at or
    * above `minScore` — plain rejection sampling), ranked
    * DETERMINISTICALLY: score descending, then the candidate id
    * ascending, so ties can never flap between runs. Null scores are
    * unranked (an unscored candidate cannot be compared) and drop.
    *
    * Output: the input columns + `cand_rank` (0-based within the
    * prompt). Winners feed [[assembleExamplesIndexed]] unchanged; the
    * (rank 0, rank N−1) extremes feed [[assemblePreferencePairsIndexed]]
    * as (chosen, rejected).
    *
    * Scale shape: ONE hash shuffle on the prompt key + a running
    * row_number within each group — group size is N (the sampler's
    * fan-out, a constant), so no skew and no per-group memory
    * concern even at 100 TB of candidates. */
  def bestOfN(cands: DataFrame, promptCol: String, candCol: String,
              scoreCol: String, k: Int = 1,
              minScore: Option[Double] = None): DataFrame = {
    require(k >= 1, s"bestOfN: k must be >= 1, got $k")
    val floating = cands.schema(scoreCol).dataType match {
      case org.apache.spark.sql.types.FloatType |
           org.apache.spark.sql.types.DoubleType => true
      case _: org.apache.spark.sql.types.NumericType => false
      case other => throw new IllegalArgumentException(
        s"bestOfN: score column '$scoreCol' must be numeric, got " +
          other.simpleString)
    }
    val admitted = cands
      .filter(col(scoreCol).isNotNull)
      // NaN is unranked like null — Spark orders NaN ABOVE every
      // value, so letting it through would crown an unscored
      // candidate the best-of-N winner
      .filter(if (floating) !isnan(col(scoreCol)) else lit(true))
      .filter(minScore.fold(lit(true))(m => col(scoreCol) >= lit(m)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(promptCol))
      .orderBy(col(scoreCol).desc, col(candCol).asc)
    admitted
      .withColumn("cand_rank",
        (row_number().over(w) - 1).cast("long"))
      .filter(col("cand_rank") < k)
  }

  private val SFT_MANIFEST = "_graft_sft_manifest.json"

  /** LAND packed SFT windows — the post-training analog of
    * [[Pipeline.buildAndWriteWindows]], end to end: pairs assemble
    * under the persisted model ([[assembleExamplesIndexed]] — the
    * stamp decides the tokenizer), split deterministically by the
    * example-id hash ([[graft.api.GraftFrame.splitByHash]] — an
    * example can never migrate between train and val), pack per split
    * ([[packExamples]], split isolation; the per-split seed folds the
    * split label so the two permutations never coincide by accident),
    * and land as parquet partitioned by `split` in the windows-landing
    * schema (window_id, window_ids, n_tokens, doc_spans) — so the
    * id-space contamination screen and every doc_spans-aware tool read
    * this landing unchanged. A `_losssidecar/` parquet (example id,
    * split, loss_from, n_tokens) completes the loss masks (spans name
    * the example; the sidecar gives its boundary) and doubles as the
    * landed-example lineage.
    *
    * Overlong examples (id mass > windowSize) DROP — the
    * [[assembleExamples]] maxLen guard applied automatically, priced
    * in the returned counts ("dropped_overlong") — and empty/null
    * responses drop as always ("input" vs "examples" shows both).
    *
    * CRASH-REPLAY CONTRACT (the family discipline): the manifest
    * writes LAST — a replay returns the recorded counts in O(1); a
    * crash before it replays as a full rebuild that overwrites in
    * place, never duplicates. */
  def writeSftWindows(spark: SparkSession, pairs: DataFrame,
                      idCol: String, promptCol: String,
                      responseCol: String, name: String, path: String,
                      outPath: String, windowSize: Long,
                      sepId: Option[Long] = None,
                      eodId: Option[Long] = None,
                      padId: Option[Long] = None,
                      trainFrac: Double = 0.9, valFrac: Double = 0.1,
                      seed: Long = 0L,
                      segmentDocs: Int = 512,
                      tokenizer: String = "bpe",
                      truncation: String = "drop"): Map[String, Long] = {
    Pipeline.readJsonManifest(spark, outPath, SFT_MANIFEST) match {
      case Some(counts) => return counts // fully landed — O(1) replay
      case None => ()
    }
    val input = pairs.count()
    // truncation=prompt_left turns the landing's overlong-DROP into a
    // keep-the-response truncation at the window budget — nothing
    // whose response fits is lost from the training set
    val assembled = assembleExamplesIndexed(spark, name, path, pairs,
        idCol, promptCol, responseCol, sepId, eodId,
        maxLen = if (truncation == "prompt_left") Some(windowSize)
                 else None,
        tokenizer = tokenizer, truncation = truncation)
    landExamples(spark, assembled, idCol, Seq("loss_from"), outPath,
      windowSize, padId, trainFrac, valFrac, seed, segmentDocs, input)
  }

  /** [[writeSftWindows]] for MULTI-TURN conversations: rows assemble
    * under [[assembleConversationIndexed]] (the chat template + stamp)
    * and land in the same windows-landing schema; the `_losssidecar`
    * carries the PER-TURN `loss_spans` (plus `loss_from` for
    * single-boundary consumers) — the trainer reconstructs the full
    * per-position mask by composing `doc_spans` with `loss_spans`
    * (position p of packed span (id, pos0, _) trains with weight w iff
    * some loss span (ps, ln, w) of id has ps ≤ p − pos0 < ps + ln).
    * Same manifest/O(1)-replay/fsck discipline; [[sftWindowsReport]]
    * reads this landing unchanged. */
  def writeConversationWindows(spark: SparkSession, convs: DataFrame,
                               idCol: String, turnsCol: String,
                               template: Map[String, TurnTemplate],
                               name: String, path: String,
                               outPath: String, windowSize: Long,
                               eodId: Option[Long] = None,
                               padId: Option[Long] = None,
                               trainFrac: Double = 0.9,
                               valFrac: Double = 0.1,
                               seed: Long = 0L,
                               segmentDocs: Int = 512,
                               tokenizer: String = "bpe"): Map[String, Long] = {
    Pipeline.readJsonManifest(spark, outPath, SFT_MANIFEST) match {
      case Some(counts) => return counts // fully landed — O(1) replay
      case None => ()
    }
    val input = convs.count()
    val assembled = assembleConversationIndexed(spark, name, path,
      convs, idCol, turnsCol, template, eodId, tokenizer = tokenizer)
    landExamples(spark, assembled, idCol, Seq("loss_spans", "loss_from"),
      outPath, windowSize, padId, trainFrac, valFrac, seed, segmentDocs,
      input)
  }

  /** The shared landing body of [[writeSftWindows]] /
    * [[writeConversationWindows]]: hash split (an example can never
    * migrate between train and val), overlong drop, per-split next-fit
    * pack under a split-folded seed, windows-landing parquet, the loss
    * sidecar (`sidecarCols` beside id/split/n_tokens), manifest LAST. */
  private def landExamples(spark: SparkSession, assembled0: DataFrame,
                           idCol: String, sidecarCols: Seq[String],
                           outPath: String, windowSize: Long,
                           padId: Option[Long], trainFrac: Double,
                           valFrac: Double, seed: Long,
                           segmentDocs: Int,
                           input: Long): Map[String, Long] = {
    val assembled = assembled0
      .localCheckpoint(true) // read once per split + once for sizing
    val nAssembled = assembled.count()
    val kept = graft.api.GraftFrame(assembled)
      .splitByHash(idCol, trainFrac, valFrac).df
      .filter(col("n_tokens") <= windowSize)
      .localCheckpoint(true)
    val nKept = kept.count()
    val win = Seq("train", "val", "test").map { sp =>
      val part = kept.filter(col("split") === sp)
      val spSeed = seed ^
        scala.util.hashing.MurmurHash3.stringHash(sp).toLong
      packExamples(part, idCol, "input_ids", windowSize, spSeed, padId,
          segmentDocs)
        .select(lit(sp).as("split"), col("window_id"),
          col("window_ids"), col("n_tokens"), col("doc_spans"))
    }.reduce(_.unionByName(_))
    // windows FIRST: their overwrite truncates outPath, so the sidecar
    // (an outPath subdirectory) must land after them; the manifest
    // still lands last, so a crash anywhere replays as a full rebuild
    win.write.mode("overwrite").partitionBy("split").parquet(outPath)
    kept.select(Seq(col(idCol), col("split")) ++
        sidecarCols.map(col) ++ Seq(col("n_tokens")): _*)
      .write.mode("overwrite").parquet(s"$outPath/_losssidecar")
    val perSplit = spark.read.parquet(outPath)
      .groupBy("split")
      .agg(count(lit(1)).as("__w__"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("__t__"))
      .collect()
      .flatMap(r => Seq(s"${r.getString(0)}_windows" -> r.getLong(1),
        s"${r.getString(0)}_tokens" -> r.getLong(2)))
      .toMap
    val counts = Map("input" -> input, "examples" -> nAssembled,
      "dropped_overlong" -> (nAssembled - nKept)) ++ perSplit
    Pipeline.writeJsonManifest(spark, counts, outPath, SFT_MANIFEST)
    counts
  }

  /** Maintenance observable for a [[writeSftWindows]] landing — the
    * windowsReport sibling: per split, window/token/example counts,
    * whether the manifest committed, the fill rate (real ids per
    * windowSize slot — the packing-waste eye), and `tokens_match`:
    * the landed window mass against the sidecar's example mass, a
    * conservation fsck that needs NO re-encode (the sidecar recorded
    * each example's id mass at landing time). */
  def sftWindowsReport(spark: SparkSession, outPath: String,
                       windowSize: Long): DataFrame = {
    val win = spark.read.parquet(outPath)
      .groupBy("split")
      .agg(count(lit(1)).as("windows"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("tokens"))
    val side = spark.read.parquet(s"$outPath/_losssidecar")
      .groupBy("split")
      .agg(count(lit(1)).as("examples"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("example_tokens"))
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = fs.exists(
      new org.apache.hadoop.fs.Path(outPath, SFT_MANIFEST))
    win.join(side, Seq("split"), "full_outer")
      .select(col("split"),
        coalesce(col("windows"), lit(0L)).as("windows"),
        coalesce(col("tokens"), lit(0L)).as("tokens"),
        coalesce(col("examples"), lit(0L)).as("examples"),
        (coalesce(col("tokens"), lit(0L)) ===
          coalesce(col("example_tokens"), lit(0L))).as("tokens_match"),
        (coalesce(col("tokens"), lit(0L)).cast("double") /
          (coalesce(col("windows"), lit(0L)) * windowSize))
          .as("fill_rate"),
        lit(manifest).as("manifest"))
      .orderBy("split")
  }

  /** PACK assembled examples into fixed-shape windows — the SFT batch
    * layout (multiple short examples per `windowSize` slot, the same
    * waste-control move as the pretraining packed landing): examples
    * travel the deterministic permutation, next-fit packs them within
    * bounded segments ([[TextStats.packedPieceMembers]] — the
    * oracle-pinned kernel the pretraining layout runs on), `padId`
    * right-pads to exactly `windowSize`, and every window carries
    * `doc_spans` (example id, offset, length) so the trainer
    * reconstructs per-example loss masks by joining `loss_from`:
    * position p of span (id, pos, len) is a LOSS position iff
    * p − pos >= loss_from(id). The span column shares the pretraining
    * landings' name and shape, so downstream tooling (the id-space
    * contamination screen's doc resolution, the fsck conventions)
    * reads both.
    *
    * Examples must fit WHOLE (`n_tokens <= windowSize`, loud refusal):
    * splitting an example across windows would break the loss-mask
    * alignment — [[assembleExamples]]' `maxLen` is the upstream guard.
    * `padId` is the caller's reserved id (outside the vocabulary and
    * distinct from sep/eod — the structural-id contract).
    *
    * Scale shape: two tiny cumsums + one segment shuffle of scalar
    * structs + one join back to the id arrays + one window shuffle —
    * identical to the pretraining packed landing. */
  def packExamples(examples: DataFrame, idCol: String, idsCol: String,
                   windowSize: Long, seed: Long = 0L,
                   padId: Option[Long] = None,
                   segmentDocs: Int = 512): DataFrame = {
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    padId.foreach(p => require(p != -1L,
      "packExamples: padId collides with the -1 OOV sentinel"))
    val sized = examples.select(col(idCol), col(idsCol),
      size(col(idsCol)).cast("long").as("__n__"))
    val over = sized.filter(col("__n__") > windowSize).limit(1).count()
    require(over == 0L,
      s"packExamples: an example exceeds windowSize=$windowSize ids — " +
        "splitting would break the loss-mask alignment; drop or " +
        "re-assemble with maxLen <= windowSize first")
    val members = TextStats.packedPieceMembers(
      sized.select(col(idCol), col("__n__")), idCol, "__n__",
      windowSize, seed, segmentDocs)
    val joined = members.join(
      sized.select(col(idCol).cast("long").as("__mid__"),
        col(idsCol).as("__ids__")),
      Seq("__mid__"))
      .select(col("window_id"), col("__off__"), col("__mid__"),
        col("__plen__"), col("__ids__"))
    val sorted = array_sort(collect_list(struct(col("__off__"),
      col("__ids__"), col("__mid__"), col("__plen__"))))
    val rawIds = flatten(transform(sorted, s => s.getField("__ids__")))
    val idsOut = padId.fold(rawIds)(p => concat(rawIds,
      array_repeat(lit(p),
        (lit(windowSize) - size(rawIds)).cast("int")))).as("window_ids")
    joined.groupBy("window_id").agg(idsOut,
      sum(col("__plen__")).as("n_tokens"),
      transform(sorted, s => struct(
        s.getField("__mid__").as("id"),
        s.getField("__off__").as("pos"),
        s.getField("__plen__").as("len"))).as("doc_spans"))
  }

  /** LENGTH-BUCKETED batch assembly — the dynamic-batching alternative
    * to [[packExamples]] for loss shapes that cannot pack (pairwise DPO
    * batches, pipeline stages with fixed shapes): each example lands in
    * the smallest capacity bucket holding it, buckets shuffle
    * deterministically (Knuth hash over (key, seed) — the shard-
    * permutation reasoning: batches mix the corpus, re-runs reproduce),
    * and examples group into `batchSize`-sized batches padded to the
    * bucket capacity. The padding waste this trades against
    * [[packExamples]]' cross-example attention complexity is exactly
    * what [[bucketReport]] prices.
    *
    * Output: the input columns + `bucket_cap` (the padded length),
    * `batch_id` (DENSE across buckets — a trainer iterates 0..B−1),
    * `pos_in_batch` (0..batchSize−1; the last batch of a bucket may be
    * partial unless `dropIncomplete`), `pad` (= cap − length). An
    * example longer than the largest boundary refuses LOUDLY at
    * execution (truncation belongs to assembly, not batching).
    *
    * Scale shape: one bounded |boundaries|-group count aggregate (the
    * [[graft.api.GraftFrame]] two-pass posture — persist upstream if
    * it is expensive), then ONE range-partitioned cumsum in (cap,
    * hash, key) order assigns global ranks with no single-task sort;
    * bucket and batch offsets inline as literal when-chains. The key
    * column must be integral and distinct (the selectByBudget
    * determinism contract). */
  def bucketByLength(examples: DataFrame, idCol: String, nCol: String,
                     boundaries: Seq[Long], batchSize: Int, seed: Long,
                     dropIncomplete: Boolean = false): DataFrame = {
    require(boundaries.nonEmpty, "bucketByLength: empty boundaries")
    require(boundaries.head > 0 &&
        boundaries.sliding(2).forall(s => s.length < 2 || s(0) < s(1)),
      s"bucketByLength: boundaries must be positive and strictly " +
        s"ascending, got ${boundaries.mkString(",")}")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    examples.schema(idCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"bucketByLength: key column '$idCol' must be an integral type " +
          s"(the deterministic order casts it to long), got ${other.simpleString}")
    }
    val maxB = boundaries.last
    val n = col(nCol).cast("long")
    val capChain = boundaries.init.reverse
      .foldLeft(when(n > lit(maxB),
          raise_error(concat(lit("bucketByLength: example length "),
            n.cast("string"),
            lit(s" exceeds the largest boundary $maxB — drop or " +
              "re-assemble with maxLen first"))).cast("long"))
        .otherwise(lit(maxB))) { (acc, b) =>
        when(n <= lit(b), lit(b)).otherwise(acc)
      }
    val hash = graft.QHelp.keyHash31(
      pmod(col(idCol).cast("long"), lit(2147483648L)) +
        lit(seed % 2147483648L))
    val withCap = examples
      .withColumn("__cap__", capChain)
      .withColumn("__ord__", struct(col("__cap__").as("c"),
        hash.as("h"), col(idCol).cast("long").as("k")))
      .withColumn("__one__", lit(1L))
    // bounded: one row per non-empty bucket
    val counts = withCap.groupBy("__cap__").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val bucketOff = counts.scanLeft(0L)(_ + _._2).init
      .zip(counts).map { case (off, (cap, _)) => (cap, off) }
    val nFull = counts.map { case (cap, c) => (cap, c / batchSize) }.toMap
    val nBatches = counts.map { case (cap, c) =>
      (cap, if (dropIncomplete) c / batchSize
            else (c + batchSize - 1) / batchSize)
    }
    val batchOff = nBatches.scanLeft(0L)(_ + _._2).init
      .zip(nBatches).map { case (off, (cap, _)) => (cap, off) }
    def chain(pairs: Seq[(Long, Long)]): org.apache.spark.sql.Column =
      pairs.foldLeft(lit(0L)) { case (acc, (cap, v)) =>
        when(col("__cap__") === lit(cap), lit(v)).otherwise(acc) }
    val ranked = graft.operators.WindowOps
      .globalCumSum(withCap, "__ord__", "__one__", "__rk__")
      .withColumn("__rib__",
        col("__rk__") - lit(1L) - chain(bucketOff.toSeq))
      .withColumn("__bo__", expr(s"__rib__ div ${batchSize.toLong}"))
    val kept =
      if (dropIncomplete)
        ranked.filter(col("__bo__") <
          chain(nFull.toSeq.map { case (c, f) => (c, f) }))
      else ranked
    val cols = examples.columns.map(col).toIndexedSeq
    kept.select(cols ++ Seq(
      col("__cap__").as("bucket_cap"),
      (chain(batchOff.toSeq) + col("__bo__")).as("batch_id"),
      pmod(col("__rib__"), lit(batchSize.toLong)).as("pos_in_batch"),
      (col("__cap__") - n).as("pad")): _*)
  }

  /** Per-bucket padding economics over a [[bucketByLength]] assignment:
    * examples, batches, real-token mass, pad mass (empty slots of
    * partial batches included — they cost accelerator time too) and
    * the fill rate a trainer compares against [[packExamples]]' ~1.0.
    * Bucket-cardinality output. */
  def bucketReport(assigned: DataFrame, nCol: String,
                   batchSize: Int): DataFrame =
    assigned.groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_examples"),
        countDistinct(col("batch_id")).as("n_batches"),
        sum(col(nCol).cast("long")).as("n_tokens"))
      .select(col("bucket_cap"), col("n_examples"), col("n_batches"),
        col("n_tokens"),
        // total slots minus real tokens: the missing examples of a
        // partial final batch cost accelerator time exactly like
        // per-example padding, so they count (n_tokens + n_pad always
        // equals n_batches · batchSize · cap)
        (col("n_batches") * batchSize * col("bucket_cap") -
          col("n_tokens")).as("n_pad"),
        (col("n_tokens").cast("double") /
          (col("n_batches") * batchSize * col("bucket_cap")).cast("double"))
          .as("fill_rate"))
}
