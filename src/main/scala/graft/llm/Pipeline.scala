package graft.llm

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The full pretraining-corpus build, composed as ONE lazy plan — the
  * showcase that a reference user's whole pipeline runs here end-to-end:
  *
  *   quality filter → exact dedup → near dedup (MinHash LSH) →
  *   benchmark decontamination → deterministic split → corpus shuffle
  *
  * Every stage is the library's own scale-shaped operator (bucketed
  * candidate generation, log₂ label propagation, broadcast benchmark
  * set, hash-stable split, two-pass global shuffle index) — composing
  * them adds NO new shuffles beyond the stages' own. The whole chain is
  * value-checked as one oracle (q_pipeline_e2e): DuckDB recomputes all
  * six stages and the final (doc_id, split, shuffle_pos) rows must
  * hash-match bit-for-bit.
  */
object Pipeline {

  /** Spec for the optional SEMANTIC dedup stage: an embedding table
    * keyed like the docs (`embIdCol` joins the doc id), cosine
    * `threshold` above which two docs count as paraphrase duplicates.
    * Candidate route: LSH hyperplane buckets by default; pass
    * `centroids` ([[graft.llm.Ivf.train]]'s frame — the search index
    * and the dedup can share one clustering) to run the published
    * SemDeDup cluster-scoped route instead
    * ([[graft.llm.Dedup.semDeDupPairs]] — density-following cells,
    * `maxCellSize` caps degenerate ones); `dim` only drives the LSH
    * route. */
  final case class EmbeddingDedup(embeddings: DataFrame, embIdCol: String,
                                  vecCol: String, dim: Int,
                                  threshold: Double,
                                  centroids: Option[DataFrame] = None,
                                  maxCellSize: Int = 10000)

  /** Spec for the optional TEMPERATURE-MIXING stage (r11 verdict #3):
    * the last content-selection step of the standard pretraining recipe
    * (quality → dedup → decontam → MIX → split → shuffle), run INSIDE
    * the one-plan composition so its keep decisions ride the same
    * execution and its kept-row count lands in the observed metrics.
    * `weightCol = None` sizes domains by document count
    * ([[graft.api.GraftFrame.sampleByTemperature]]); `Some(w)` by the
    * integer weight column (token counts, bytes —
    * sampleByTemperatureWeighted). Mixing runs AFTER dedup/decontam by
    * design: duplicates must not inflate a domain's budget, and
    * contaminated docs must not consume it.
    *
    * `up = true` (r13) runs the stage in the UP-sampling direction —
    * the Pile/LLaMA curated-set recipe: no row of any domain drops;
    * small domains REPEAT with deterministic epoch copies
    * ([[graft.api.GraftFrame.upsampleByTemperature]], factors capped at
    * `maxRepeat`). The output then carries an `epoch` column, the split
    * assignment keys on the DOCUMENT id (every copy of a doc lands in
    * the same split — copies straddling train/val would be leakage by
    * construction), and the shuffle position keys on the composite
    * id·(maxRepeat+1)+epoch so each copy gets its own deterministic
    * position (requires ids distinct mod 2^31/(maxRepeat+1) — the
    * shuffleIndex contract scaled by the copy arity). `maxRepeat` is
    * ignored when `up = false`. */
  final case class TemperatureMix(domainCol: String, alpha: Double,
                                  weightCol: Option[String] = None,
                                  up: Boolean = false,
                                  maxRepeat: Int = 10)

  /** Optional EXPLICIT-RECIPE mixing stage — the mixture-proportion
    * TABLE form ([[graft.api.GraftFrame.sampleByBudget]]): per-domain
    * TARGET masses in `weightCol` units, each domain independently
    * down- or up-sampled (epoch copies) to hit its budget in
    * expectation; absent domains drop. Slots where [[TemperatureMix]]
    * does (after decontamination — budgets act on CLEAN survivors);
    * one mixing stage per build. The output always carries `epoch`, so
    * the shuffle position keys on the composite id·(maxRepeat+1)+epoch
    * and the split on the document id (the up-mix discipline). */
  final case class BudgetMix(domainCol: String, weightCol: String,
                             budgets: Map[String, Long],
                             maxRepeat: Int = 10)

  /** Optional PER-ROW importance mixing stage — the DSIR-shaped axis
    * ([[graft.api.GraftFrame.sampleBySystematic]]): select exactly `n`
    * copies from the CLEAN survivors with inclusion probability ∝ the
    * integer `weightCol` (a classifier log-likelihood ratio mapped to
    * a non-negative integer, a token count, any per-document quality
    * mass), via deterministic systematic resampling — no RNG, no
    * transcendental noise, engine-replayable. Slots where the domain
    * mixers do (after decontamination — contaminated docs must not
    * consume the budget); one mixing stage per build. Output carries
    * `epoch` (heavy rows earn multiple copies), the split keys on the
    * DOCUMENT id, and the shuffle position keys on the composite
    * id·(n+1)+epoch (requires ids distinct mod 2^31/(n+1) for the
    * total order — the up-mix contract scaled by the output size). */
  final case class ImportanceMix(weightCol: String, n: Long,
                                 seed: Long = 0L)

  /** Optional MODEL-BASED quality stage (the CCNet recipe, Wenzek et
    * al. 2020): drop docs whose mean n-gram log-probability under a
    * reference-corpus LM ([[NgramLm.train]]) falls below `minLogprob` —
    * the high-perplexity tail (gibberish, boilerplate, SEO spam) that
    * rule-based gates miss. Runs between the rule-quality gate and
    * exact dedup: scoring only quality survivors, and dedup/decontam
    * never paying for docs the LM would drop anyway. `keepUnscorable`
    * keeps docs with fewer than n tokens (no LM evidence either way —
    * the rule gate owns short docs). */
  /** CCNet-style LANGUAGE gate — stage 1a, between the rule-quality
    * gate and the model-quality gates: keep docs whose predicted
    * language (multiclass NB lang-ID, [[Classifier.predictMulti]])
    * is in `keep`. Runs AFTER the cheap per-row rule gate (the
    * lang-ID token shuffle should not be paid for garbage) and BEFORE
    * the LM/classifier gates (whose reference corpora are
    * language-specific — scoring out-of-language text against an
    * in-language LM measures only noise). Token-less docs follow
    * `keepUnpredicted`. */
  final case class LangFilter(model: DataFrame, keep: Set[String],
                              alpha: Double = 1.0,
                              keepUnpredicted: Boolean = false)

  final case class LmFilter(model: DataFrame, minLogprob: Double,
                            n: Int = 2, alpha: Double = 1.0,
                            keepUnscorable: Boolean = true)

  /** Optional DISCRIMINATIVE quality stage ([[Classifier]] — the GPT-3
    * curated-vs-crawl gate): a trained Naive-Bayes token model scores
    * every doc's mean log-likelihood ratio; docs below `minLlrMean`
    * drop. Runs right after the (optional) LM gate and before exact
    * dedup, so the two model gates compose — the LM catches gibberish
    * (generatively implausible), the classifier catches fluent-but-
    * crawl-like text the LM reads as fine. `model` is
    * [[Classifier.train]] output (or the live `<name>_nbc` table). */
  final case class ClassifierFilter(model: DataFrame, minLlrMean: Double,
                                    alpha: Double = 1.0,
                                    keepUnscorable: Boolean = true)

  /** Optional SPAN-level exact-substring scrub stage
    * ([[Dedup.scrubDuplicateSpans]] — the Lee et al. 2021 ExactSubstr
    * pass): corpus-duplicated k-gram regions are cut from EVERY doc
    * before any row-level stage, so the quality gate judges the
    * post-scrub text (a doc the scrub EMPTIES is a whole-doc duplicate
    * and drops at minTokens), and exact/near dedup see scrubbed
    * content. Batch builds only — the spans are a CORPUS-global
    * aggregate; the daily-shard analog is [[GramScrub]], which serves
    * the same decision from the persisted gram ledger. */
  final case class SpanScrub(k: Int = 8, minCount: Long = 2,
                             minSpanTokens: Int = 0)

  /** The daily-shard ExactSubstr pass ([[SpanScrub]]'s incremental
    * form): an arriving shard scrubs its duplicated spans against the
    * persisted gram LEDGER ([[Dedup.writeGramIndex]]) before the gate
    * runs, and the landed text's grams append to the ledger under the
    * shard's label so the NEXT shard sees this one's mass. Keep-first
    * semantics: the landed corpus keeps its copies, arrivals are cut.
    * The serve excludes the shard's own label, so a crash replay (gram
    * append committed, landing not) scrubs identically instead of
    * flagging the shard against itself. */
  final case class GramScrub(name: String, path: String,
                             minCount: Long = 2, minSpanTokens: Int = 0)

  /** Chop training windows in BPE TOKEN-ID space (r14 — the landed
    * artifact becomes the one a trainer actually loads): `name`/`path`
    * address a persisted BPE model ([[Bpe.writeBpeModel]] — the tenth
    * maintained family); `windowSize` then counts BPE tokens and
    * windows land as `window_ids: array<long>` (OOV → -1) instead of
    * `window_text`. Token accounting everywhere downstream (manifest
    * masses, conservation fsck) is in the SAME id unit. The model is
    * resolved ONCE per landing (merge list + vocab map — both
    * model-sized, the bounded objects the encode expression embeds);
    * a stampless path refuses loudly ([[Bpe.readBpeMeta]]). */
  /** `packed = true` switches the landing from GPT-style concat-and-chop
    * to the DOC-AWARE packed layout ([[Bpe.assembleWindowsIdsPacked]] —
    * docs never split unless they exceed windowSize; next-fit within
    * `segmentDocs`-piece permutation segments), and `padId` (reserved
    * outside the vocab, like eodId) then right-pads every window to
    * exactly windowSize ids — the fixed-shape tensor a trainer loads —
    * while n_tokens and ALL token accounting (manifest masses, the
    * conservation fsck, mixing budgets) keep counting REAL ids only, so
    * conservation laws are identical across both layouts. Incompatible
    * with fullWindowsOnly (packing makes underfull REAL counts the
    * norm; the shape guarantee comes from padId) — refused loudly. */
  /** `stride = Some(s)` switches the landing to the SLIDING EVAL
    * layout ([[Bpe.assembleWindowsIdsStrided]] — window w covers token
    * span [w·s, w·s + windowSize) of the split's permutation stream,
    * consecutive windows overlapping by windowSize − s): the held-out
    * perplexity windows a trainer evaluates with, landed beside the
    * training windows with the same manifest/replay/fsck/loader
    * discipline and the same split isolation. Land eval windows under
    * their OWN outPath — the layouts carry different conservation laws
    * (the strided id mass is ~windowSize/s × the doc mass, priced by
    * the caller's stride; [[windowsReport]] verifies it from the
    * closed form when given the windowSize). Incompatible with
    * `packed`/`padId` (the eval layout is chop-shaped by construction)
    * and with `docSpans` (overlapping windows have no disjoint doc
    * tiling) — both refused loudly. */
  /** `tokenizer` selects the model FAMILY the landing encodes under:
    * "bpe" (default — `name`/`path` address a [[Bpe.writeBpeModel]] /
    * [[Bpe.importBpeModel]] model), "unigram" (`name`/`path` address
    * a [[Unigram.writeUnigramModel]] / [[Unigram.importUnigramModel]]
    * model — the SentencePiece-unigram family) or "wordpiece"
    * (`name`/`path` address a [[WordPiece.importWordPieceModel]]
    * model — the BERT-class greedy family; the stamped unknown id is
    * a REAL vocabulary id, so eodId/padId must avoid it like any
    * other). Every landing layout (chop / packed / strided), the
    * manifest/replay/fsck discipline and the loaders are
    * tokenizer-agnostic: the id unit changes, the conservation laws
    * don't. */
  final case class BpeWindows(name: String, path: String,
                              eodId: Option[Long] = None,
                              docSpans: Boolean = false,
                              packed: Boolean = false,
                              padId: Option[Long] = None,
                              segmentDocs: Int = 512,
                              stride: Option[Long] = None,
                              tokenizer: String = "bpe")

  /** A [[BpeWindows]] spec resolved to the objects the encode
    * expression embeds (one driver-side read of the model-sized
    * tables, stamp-guarded) plus the landing options it carries.
    * `uniPieces` is the unigram family's serving object; when set,
    * `merges`/`vocab`/`byteLevel` are unused by encode (the unigram
    * piece ids live in `uniPieces`) and [[encode]]/the assembler
    * dispatch route to the Viterbi forms. */
  private final case class ResolvedBpe(merges: Seq[(String, String)],
                                       vocab: Map[String, Long],
                                       eodId: Option[Long],
                                       docSpans: Boolean,
                                       byteLevel: Boolean,
                                       wordPattern: Option[String],
                                       packed: Boolean = false,
                                       padId: Option[Long] = None,
                                       segmentDocs: Int = 512,
                                       stride: Option[Long] = None,
                                       uniPieces: Option[Seq[(String, Long, Long)]] = None,
                                       wp: Option[WordPiece.WpMeta] = None,
                                       wpVocab: Seq[(String, Long)] = Nil,
                                       uniBytes: Option[IndexedSeq[Long]] = None,
                                       normalize: String = "none",
                                       uniMetaspace: Boolean = false) {
    /** The stamped text prep as a column map: normalizer, then the
      * SentencePiece metaspace transform when stamped (whose word
      * pattern already rides `wordPattern` from resolveBpe). */
    def prepText(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val n = Normalize.colOf(text, normalize)
      if (uniMetaspace) Unigram.metaspaceCol(n) else n
    }
    private def prepFrame(docs: DataFrame, textCol: String): DataFrame =
      if (normalize == "none" && !uniMetaspace) docs
      else docs.withColumn(textCol, prepText(col(textCol)))
    /** One word → its token ids, under whichever family is stamped.
      * For the wordpiece family the id-ordered (piece, id) pairs ride
      * `wpVocab` and the greedy contract rides `wp`. */
    def encode(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (uniPieces, wp) match {
        case (Some(ps), _) => graft.functions.TextHashExprs
          .unigramEncodeIds(w, ps, uniBytes)
        case (_, Some(m)) => graft.functions.TextHashExprs
          .wordPieceEncodeIds(w, wpVocab, m.unkId, m.contPrefix,
            m.maxInputChars)
        case _ => graft.functions.TextHashExprs
          .bpeEncodeIds(w, merges, vocab, byteLevel)
      }
    def asmChop(docs0: DataFrame, idCol: String, textCol: String,
                windowSize: Long, seed: Long,
                groupCols: Seq[String] = Nil): DataFrame = {
      val docs = prepFrame(docs0, textCol)
      (uniPieces, wp) match {
      case (Some(ps), _) => Unigram.assembleWindowsIds(docs, idCol, textCol,
        windowSize, seed, ps, eodId, docSpans, wordPattern, uniBytes,
        groupCols)
      case (_, Some(m)) => WordPiece.assembleWindowsIds(docs, idCol,
        textCol, windowSize, seed, wpVocab, m.unkId, m.contPrefix,
        m.maxInputChars, eodId, docSpans, wordPattern, groupCols)
      case _ => Bpe.assembleWindowsIds(docs, idCol, textCol,
        windowSize, seed, merges, vocab, eodId, docSpans, byteLevel,
        wordPattern, groupCols)
    } }
    def asmStrided(docs0: DataFrame, idCol: String, textCol: String,
                   windowSize: Long, st: Long, seed: Long,
                   groupCols: Seq[String] = Nil): DataFrame = {
      val docs = prepFrame(docs0, textCol)
      (uniPieces, wp) match {
        case (Some(ps), _) => Unigram.assembleWindowsIdsStrided(docs, idCol,
          textCol, windowSize, st, seed, ps, eodId, wordPattern, uniBytes,
          groupCols)
        case (_, Some(m)) => WordPiece.assembleWindowsIdsStrided(docs,
          idCol, textCol, windowSize, st, seed, wpVocab, m.unkId,
          m.contPrefix, m.maxInputChars, eodId, wordPattern, groupCols)
        case _ => Bpe.assembleWindowsIdsStrided(docs, idCol, textCol,
          windowSize, st, seed, merges, vocab, eodId, byteLevel,
          wordPattern, groupCols)
      } }
    def asmPacked(docs0: DataFrame, idCol: String, textCol: String,
                  windowSize: Long, seed: Long,
                  persisted: Option[scala.collection.mutable.Buffer[DataFrame]] = None,
                  groupCols: Seq[String] = Nil): DataFrame = {
      val docs = prepFrame(docs0, textCol)
      (uniPieces, wp) match {
      case (Some(ps), _) => Unigram.assembleWindowsIdsPacked(docs, idCol,
        textCol, windowSize, seed, ps, eodId, padId, docSpans,
        wordPattern, segmentDocs, uniBytes, persisted, groupCols)
      case (_, Some(m)) => WordPiece.assembleWindowsIdsPacked(docs,
        idCol, textCol, windowSize, seed, wpVocab, m.unkId,
        m.contPrefix, m.maxInputChars, eodId, padId, docSpans,
        wordPattern, segmentDocs, persisted, groupCols)
      case _ => Bpe.assembleWindowsIdsPacked(docs, idCol, textCol,
        windowSize, seed, merges, vocab, eodId, padId, docSpans,
        byteLevel, wordPattern, segmentDocs, persisted, groupCols)
    } }
  }

  private def resolveBpe(spark: org.apache.spark.sql.SparkSession,
                         bw: BpeWindows): ResolvedBpe = {
    require(bw.padId.isEmpty || bw.packed,
      "BpeWindows: padId only applies to the packed layout (the chop " +
        "layout's windows are full by construction) — set packed = true")
    bw.stride.foreach { s =>
      require(s > 0, s"BpeWindows: stride must be positive, got $s")
      require(!bw.packed,
        "BpeWindows: stride selects the SLIDING eval layout, which is " +
          "chop-shaped by construction — packed and stride are " +
          "mutually exclusive")
      require(!bw.docSpans,
        "BpeWindows: overlapping strided windows have no disjoint doc " +
          "tiling — docSpans and stride are mutually exclusive")
    }
    require(bw.tokenizer == "bpe" || bw.tokenizer == "unigram" ||
        bw.tokenizer == "wordpiece",
      s"BpeWindows: unknown tokenizer '${bw.tokenizer}' — " +
        "\"bpe\", \"unigram\" or \"wordpiece\"")
    if (bw.tokenizer == "wordpiece") {
      // the wordpiece family: ONE vocabulary table, serving contract
      // (unk id, prefix, length bound, pre-tokenizer) from its stamp;
      // a stampless path refuses in readWpMeta. The vocab map is
      // carried for id-collision bookkeeping; encode embeds the
      // id-ordered pairs directly.
      val meta = WordPiece.readWpMeta(spark, bw.path)
      // stamped specials subtracted from the matching table — their
      // ids stay structural, so bw.eodId/padId may name them
      val pairs = WordPiece.vocabServingStamped(spark, bw.name, meta)
      ResolvedBpe(Nil, pairs.toMap, bw.eodId, bw.docSpans,
        byteLevel = false, meta.wordPattern, bw.packed, bw.padId,
        bw.segmentDocs, bw.stride, None, Some(meta), pairs,
        normalize = meta.normalize)
    } else if (bw.tokenizer == "unigram") {
      // the unigram family: ONE piece table, pre-tokenizer from its
      // stamp; a stampless path refuses in readUniMeta. The vocab map
      // (piece → id) is carried only for id-collision bookkeeping —
      // encode embeds uniPieces directly.
      val meta = Unigram.readUniMeta(spark, bw.path)
      val (pieces, bytes) = Unigram.servingViterbiWith(spark, bw.name,
        bw.path, meta)
      ResolvedBpe(Nil, pieces.map(p => p._1 -> p._2).toMap,
        bw.eodId, bw.docSpans, byteLevel = false,
        if (meta.metaspace) Some(Unigram.MetaspacePattern)
        else meta.wordPattern,
        bw.packed, bw.padId, bw.segmentDocs, bw.stride, Some(pieces),
        uniBytes = bytes, normalize = meta.normalize,
        uniMetaspace = meta.metaspace)
    } else {
      // a crashed/foreign build refuses here; the SYMBOLIZATION LEVEL
      // and pre-tokenizer ride the stamp — the landing serves exactly
      // the geometry the model was trained under
      val meta = Bpe.readBpeMeta(spark, bw.path)
      // the SERVING vocab: stamped special ids subtracted, so an
      // imported model's dedicated control tokens (<|endoftext|>-style)
      // are usable as the landing's eodId/padId instead of refused as
      // vocab collisions — encode is unaffected (a special surface is
      // never a merge result)
      ResolvedBpe(Bpe.mergeList(spark.table(s"${bw.name}_bpe")),
        Bpe.servingVocabMap(spark, bw.name, bw.path),
        bw.eodId, bw.docSpans, meta.byteLevel, meta.wordPattern,
        bw.packed, bw.padId, bw.segmentDocs, bw.stride,
        normalize = meta.normalize)
    }
  }

  /** @param docs     training-candidate documents (idCol, textCol, …)
    * @param bench    benchmark/eval documents to decontaminate against
    * @param persistStages  persist (MEMORY_AND_DISK) the two stage
    *         boundaries the plan reuses — `near` (read twice by
    *         decontamination: anti-join left side + its own shingle
    *         report) and the decontaminated survivors (read twice by
    *         shuffle-index's two-pass cumsum). Without it those reuses
    *         MULTIPLY: the composed plan re-scans the input corpus 14×
    *         (measured, PlanAudit sf0.001); with it, ~4×. Disable only
    *         when the deduped corpus dwarfs cluster memory+disk — then
    *         land intermediate parquet between stages instead. The
    *         caches live for the session (the lazy return gives the
    *         caller no handle to them): in a long-lived session that
    *         rebuilds repeatedly, prefer [[pretrainCorpusManaged]]
    *         (returns the handles to unpersist), [[buildAndWrite]]
    *         (which releases them after landing), persistStages=false,
    *         or spark.catalog.clearCache().
    * @return one row per surviving doc: every input column plus
    *         `split` ('train'/'val'/'test') and `shuffle_pos` (global
    *         deterministic shuffle order for sharding) */
  def pretrainCorpus(docs: DataFrame, bench: DataFrame,
                     idCol: String, textCol: String,
                     minTokens: Int = 3,
                     nearDupThreshold: Double = 0.5,
                     decontamK: Int = 5,
                     trainFrac: Double = 0.8,
                     valFrac: Double = 0.1,
                     shuffleSeed: Long = 0L,
                     persistStages: Boolean = true,
                     boilerplateMaxDocFreq: Option[Int] = None,
                     embeddingDedup: Option[EmbeddingDedup] = None,
                     temperatureMix: Option[TemperatureMix] = None,
                     lmFilter: Option[LmFilter] = None,
                     budgetMix: Option[BudgetMix] = None,
                     classifierFilter: Option[ClassifierFilter] = None,
                     spanScrub: Option[SpanScrub] = None,
                     importanceMix: Option[ImportanceMix] = None,
                     langFilter: Option[LangFilter] = None): DataFrame =
    chain(docs, bench, idCol, textCol, minTokens, nearDupThreshold,
      decontamK, trainFrac, valFrac, shuffleSeed, (_, d) => d,
      persistStages, boilerplateMaxDocFreq, embeddingDedup,
      temperatureMix = temperatureMix, lmFilter = lmFilter,
      budgetMix = budgetMix, classifierFilter = classifierFilter,
      spanScrub = spanScrub, importanceMix = importanceMix,
      langFilter = langFilter)

  /** [[pretrainCorpus]] with per-stage kept-row counts riding the same
    * execution via CollectMetrics (`df.observe`) — the 100 TB answer to
    * "how much did each stage drop": counts accumulate inside the one
    * pass the pipeline already makes, instead of a count() re-scan per
    * stage. Catalyst treats CollectMetrics as an optimization barrier
    * (filters are not pushed through it), so each count is exactly the
    * rows crossing that stage boundary. Read counts AFTER an action on
    * the returned frame: `metrics(stage).get("rows")`. The early-stage
    * observations may complete during near-dedup's internal label-
    * propagation jobs (those jobs execute the same upstream plan) —
    * same counts, just available sooner. The last tap ("output") sits at
    * the plan ROOT, above shuffle-index's two-pass cumsum join — that
    * join references its input subtree twice (main rows + the offsets
    * aggregate), so an observe BELOW it would double-count; output rows
    * equal decontamination survivors anyway (split/shuffle only add
    * columns). CAVEAT: CollectMetrics does not surface through every
    * execution shape (cache materializations and file-write commands
    * don't report it), so which stages resolve depends on which
    * internal job first executed each observe: "near_dedup", "decontam"
    * (attached only when persistStages=true — its boundary is multiply
    * referenced, and only the cache materializes the observe exactly
    * once; near_dedup → decontam → temperature_mix then attribute each
    * stage's own drop) and "output" are reliable after any query action
    * on the result;
    * "input"/"quality"/"exact_dedup" resolve when near-dedup's label
    * propagation executed the upstream — i.e. whenever candidate pairs
    * exist, the overwhelmingly common case on real corpora. Check
    * `o.getAsJava.isEmpty` before reading a count that must be
    * optional-safe. */
  def pretrainCorpusObserved(docs: DataFrame, bench: DataFrame,
                             idCol: String, textCol: String,
                             minTokens: Int = 3,
                             nearDupThreshold: Double = 0.5,
                             decontamK: Int = 5,
                             trainFrac: Double = 0.8,
                             valFrac: Double = 0.1,
                             shuffleSeed: Long = 0L,
                             persistStages: Boolean = true,
                             boilerplateMaxDocFreq: Option[Int] = None,
                             embeddingDedup: Option[EmbeddingDedup] = None,
                             temperatureMix: Option[TemperatureMix] = None,
                             lmFilter: Option[LmFilter] = None,
                             budgetMix: Option[BudgetMix] = None,
                             classifierFilter: Option[ClassifierFilter] = None,
                             spanScrub: Option[SpanScrub] = None,
                             importanceMix: Option[ImportanceMix] = None,
                             langFilter: Option[LangFilter] = None)
      : (DataFrame, Map[String, Observation]) = {
    // "temperature_mix" only joins the map when the stage is ACTIVE: an
    // Observation that never attaches would block a caller's get() forever.
    // "decontam" (r12 ADVICE: without it the mix stage's drop was only
    // attributable when decontamination dropped nothing) joins only when
    // the stage boundaries persist: the decontam output is multiply
    // referenced downstream (the mixer's domain-size aggregate + its row
    // side, or shuffle-index's two-pass cumsum), so without the persist
    // the observe node would execute per reference and double-count (the
    // r8 lesson); WITH it the cache materializes the node once.
    // "quality" gates on persistStages while the LM stage is on: the LM
    // stage references the quality output twice, and only the persist
    // makes its observe materialize once (same reasoning as "decontam").
    val stages =
      (if (spanScrub.isEmpty || persistStages) Seq("input") else Nil) ++
      (if ((langFilter.isEmpty && lmFilter.isEmpty &&
          classifierFilter.isEmpty) || persistStages)
        Seq("quality") else Nil) ++
      (if (langFilter.isDefined &&
          ((lmFilter.isEmpty && classifierFilter.isEmpty) || persistStages))
        Seq("lang") else Nil) ++
      (if (lmFilter.isDefined &&
          (classifierFilter.isEmpty || persistStages))
        Seq("lm_quality") else Nil) ++
      (if (classifierFilter.isDefined) Seq("clf_quality") else Nil) ++
      Seq("exact_dedup", "near_dedup") ++
      (if (persistStages) Seq("decontam") else Nil) ++
      (if (temperatureMix.isDefined) Seq("temperature_mix") else Nil) ++
      (if (budgetMix.isDefined) Seq("budget_mix") else Nil) ++
      (if (importanceMix.isDefined) Seq("importance_mix") else Nil) ++
      Seq("output")
    val obs = stages.map(s => s -> Observation()).toMap
    val out = chain(docs, bench, idCol, textCol, minTokens,
      nearDupThreshold, decontamK, trainFrac, valFrac, shuffleSeed,
      (stage, d) => obs.get(stage)
        .fold(d)(o => d.observe(o, count(lit(1)).as("rows"))),
      persistStages, boilerplateMaxDocFreq, embeddingDedup,
      temperatureMix = temperatureMix, lmFilter = lmFilter,
      budgetMix = budgetMix, classifierFilter = classifierFilter,
      spanScrub = spanScrub, importanceMix = importanceMix,
      langFilter = langFilter)
    (out, obs)
  }

  /** [[pretrainCorpus]] plus the persisted stage-boundary handles, for
    * long-lived sessions that rebuild repeatedly: the plain overload
    * persists 3–4 boundaries MEMORY_AND_DISK and returns no way to
    * release them (each call leaks cached blocks for the session — r8
    * ADVICE). Here the caller owns the lifecycle: after the result has
    * been consumed, `handles.foreach(_.unpersist())`. [[buildAndWrite]]
    * does exactly this internally around its landing write. */
  def pretrainCorpusManaged(docs: DataFrame, bench: DataFrame,
                            idCol: String, textCol: String,
                            minTokens: Int = 3,
                            nearDupThreshold: Double = 0.5,
                            decontamK: Int = 5,
                            trainFrac: Double = 0.8,
                            valFrac: Double = 0.1,
                            shuffleSeed: Long = 0L,
                            boilerplateMaxDocFreq: Option[Int] = None,
                            embeddingDedup: Option[EmbeddingDedup] = None,
                            temperatureMix: Option[TemperatureMix] = None,
                            lmFilter: Option[LmFilter] = None,
                            budgetMix: Option[BudgetMix] = None,
                            classifierFilter: Option[ClassifierFilter] = None,
                            spanScrub: Option[SpanScrub] = None,
                            importanceMix: Option[ImportanceMix] = None,
                            langFilter: Option[LangFilter] = None)
      : (DataFrame, Seq[DataFrame]) = {
    val handles = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = chain(docs, bench, idCol, textCol, minTokens,
      nearDupThreshold, decontamK, trainFrac, valFrac, shuffleSeed,
      (_, d) => d, persistStages = true,
      boilerplateMaxDocFreq = boilerplateMaxDocFreq,
      embeddingDedup = embeddingDedup, persisted = handles,
      temperatureMix = temperatureMix, lmFilter = lmFilter,
      budgetMix = budgetMix, classifierFilter = classifierFilter,
      spanScrub = spanScrub, importanceMix = importanceMix,
      langFilter = langFilter)
    (out, handles.toSeq)
  }

  /** Run the pipeline and LAND it: parquet partitioned by `split` (so
    * train/val/test are separate directory trees — readers
    * partition-prune to their split) plus a `_graft_manifest.json`
    * recording the split sizes. The split counts come from the WRITTEN
    * files' parquet footers — metadata reads, no second data pass.
    * (Per-stage drop counts are deliberately not in the manifest:
    * CollectMetrics resolution depends on which internal action fires
    * first and does not surface through file-write command executions —
    * use [[pretrainCorpusObserved]] with a query action when stage
    * attribution matters.) Returns the per-split row counts. The
    * manifest goes through Hadoop's FileSystem so any Spark-visible
    * target (local, HDFS, object store) works. */
  def buildAndWrite(docs: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String, outPath: String,
                    minTokens: Int = 3,
                    nearDupThreshold: Double = 0.5,
                    decontamK: Int = 5,
                    trainFrac: Double = 0.8,
                    valFrac: Double = 0.1,
                    shuffleSeed: Long = 0L,
                    boilerplateMaxDocFreq: Option[Int] = None,
                    embeddingDedup: Option[EmbeddingDedup] = None,
                    lmFilter: Option[LmFilter] = None,
                    classifierFilter: Option[ClassifierFilter] = None,
                    spanScrub: Option[SpanScrub] = None,
                    langFilter: Option[LangFilter] = None): Map[String, Long] = {
    val handles = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = chain(docs, bench, idCol, textCol, minTokens,
      nearDupThreshold, decontamK, trainFrac, valFrac, shuffleSeed,
      (_, d) => d, persistStages = true,
      boilerplateMaxDocFreq = boilerplateMaxDocFreq,
      embeddingDedup = embeddingDedup, persisted = handles,
      lmFilter = lmFilter, classifierFilter = classifierFilter,
      spanScrub = spanScrub, langFilter = langFilter)
    try out.write.mode("overwrite").partitionBy("split").parquet(outPath)
    finally handles.foreach(_.unpersist())  // landing owns the cache lifecycle
    // split sizes from footer metadata of what was ACTUALLY written; the
    // explicit schema keeps an all-dropped (zero-file) result a valid
    // empty read instead of an UNABLE_TO_INFER_SCHEMA failure
    val counts = docs.sparkSession.read.schema(out.schema).parquet(outPath)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val json = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val conf = docs.sparkSession.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(outPath, "_graft_manifest.json")
    val fs = p.getFileSystem(conf)
    val os = fs.create(p, true)
    try os.write((json + "\n").getBytes("UTF-8")) finally os.close()
    counts
  }

  /** The corpus → TRAINING-FILES last mile, composed (r12 verdict #1):
    * the full pretraining build (quality → exact dedup → near dedup →
    * [semantic dedup] → decontamination → [temperature mix] → split)
    * followed by the GPT-style concat-and-chop — each split's surviving
    * documents conceptually concatenate in the deterministic Knuth-hash
    * shuffle order and cut into fixed `windowSize`-token training
    * windows ([[TextStats.assembleWindows]], seed = shuffleSeed; the
    * SAME permutation [[pretrainCorpus]]'s shuffle_pos ranks, so the
    * window stream IS the shuffled corpus). Windows are chopped PER
    * SPLIT: a train document's tokens can never straddle into a val or
    * test window — chopping the splits together would leak evaluation
    * text into training windows by construction. Within each split,
    * window ids are dense from 0 and the assembled text is engine- and
    * partitioning-independent (the assembleWindows contract).
    *
    * `fullWindowsOnly` drops each split's tail window when it holds
    * fewer than `windowSize` tokens — the usual training discipline
    * (a short tail window would train at a different effective batch
    * shape); keep it for token-accounting audits.
    *
    * Scale shape: the pipeline's own stages plus, per split, one
    * two-pass cumsum and ONE shuffle keyed on window_id — no new
    * corpus-sized exchange beyond assembly's own. shuffle-index is
    * skipped entirely (its cumsum would duplicate the assembly's).
    * Lazy; stage caches live for the session ([[pretrainCorpus]]
    * posture) — [[buildAndWriteWindows]] owns the lifecycle and lands
    * the result.
    *
    * @return one row per training window: (split, window_id,
    *         window_text, n_tokens) */
  def pretrainWindows(docs: DataFrame, bench: DataFrame,
                      idCol: String, textCol: String,
                      windowSize: Long,
                      minTokens: Int = 3,
                      nearDupThreshold: Double = 0.5,
                      decontamK: Int = 5,
                      trainFrac: Double = 0.8,
                      valFrac: Double = 0.1,
                      shuffleSeed: Long = 0L,
                      persistStages: Boolean = true,
                      boilerplateMaxDocFreq: Option[Int] = None,
                      embeddingDedup: Option[EmbeddingDedup] = None,
                      temperatureMix: Option[TemperatureMix] = None,
                      fullWindowsOnly: Boolean = false,
                      lmFilter: Option[LmFilter] = None,
                      budgetMix: Option[BudgetMix] = None,
                      classifierFilter: Option[ClassifierFilter] = None,
                      spanScrub: Option[SpanScrub] = None,
                      importanceMix: Option[ImportanceMix] = None,
                      bpeWindows: Option[BpeWindows] = None,
                      langFilter: Option[LangFilter] = None): DataFrame = {
    val corpus = chain(docs, bench, idCol, textCol, minTokens,
      nearDupThreshold, decontamK, trainFrac, valFrac, shuffleSeed,
      (_, d) => d, persistStages, boilerplateMaxDocFreq, embeddingDedup,
      temperatureMix = temperatureMix, withShuffleIndex = false,
      lmFilter = lmFilter, budgetMix = budgetMix,
      classifierFilter = classifierFilter, spanScrub = spanScrub,
      importanceMix = importanceMix, langFilter = langFilter)
    windowsFrom(corpus, idCol, textCol, windowSize, shuffleSeed,
      fullWindowsOnly,
      temperatureMix.filter(_.up).map(_.maxRepeat + 1L)
        .orElse(budgetMix.map(_.maxRepeat + 1L))
        .orElse(importanceMix.map(_.n + 1L)),
      bpeWindows.map(resolveBpe(docs.sparkSession, _)))
  }

  /** [[pretrainWindows]] plus the LANDING — the composed product a
    * pretraining run actually consumes: windows land as parquet
    * partitioned by `split` (readers partition-prune to their split;
    * each partition's files are ready-to-stream training shards) and a
    * `_graft_windows_manifest.json` records per-split window and token
    * counts from the WRITTEN files (footer-count reads plus one
    * column-pruned n_tokens read — see [[landedSplitCounts]]). Owns the
    * stage-cache lifecycle (handles released after the write).
    *
    * CRASH-REPLAY CONTRACT (the family discipline): the manifest is
    * written LAST, so its existence proves the landing committed — a
    * replay returns the recorded counts in O(1) without touching data;
    * a crash BEFORE the manifest replays as a full rebuild whose
    * overwrite lands in place, never duplicates. Returns
    * Map("<split>_windows" → n, "<split>_tokens" → n). */
  def buildAndWriteWindows(docs: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String, outPath: String,
                           windowSize: Long,
                           minTokens: Int = 3,
                           nearDupThreshold: Double = 0.5,
                           decontamK: Int = 5,
                           trainFrac: Double = 0.8,
                           valFrac: Double = 0.1,
                           shuffleSeed: Long = 0L,
                           boilerplateMaxDocFreq: Option[Int] = None,
                           embeddingDedup: Option[EmbeddingDedup] = None,
                           temperatureMix: Option[TemperatureMix] = None,
                           fullWindowsOnly: Boolean = false,
                           lmFilter: Option[LmFilter] = None,
                           budgetMix: Option[BudgetMix] = None,
                           classifierFilter: Option[ClassifierFilter] = None,
                           spanScrub: Option[SpanScrub] = None,
                           importanceMix: Option[ImportanceMix] = None,
                           bpeWindows: Option[BpeWindows] = None,
                           langFilter: Option[LangFilter] = None): Map[String, Long] = {
    val spark = docs.sparkSession
    readJsonManifest(spark, outPath, WINDOWS_MANIFEST) match {
      case Some(counts) => return counts // fully landed — O(1) replay
      case None => ()
    }
    val handles = scala.collection.mutable.Buffer.empty[DataFrame]
    val corpus = chain(docs, bench, idCol, textCol, minTokens,
      nearDupThreshold, decontamK, trainFrac, valFrac, shuffleSeed,
      (_, d) => d, persistStages = true,
      boilerplateMaxDocFreq = boilerplateMaxDocFreq,
      embeddingDedup = embeddingDedup, persisted = handles,
      temperatureMix = temperatureMix, withShuffleIndex = false,
      lmFilter = lmFilter, budgetMix = budgetMix,
      classifierFilter = classifierFilter, spanScrub = spanScrub,
      importanceMix = importanceMix, langFilter = langFilter)
    val win = windowsFrom(corpus, idCol, textCol, windowSize, shuffleSeed,
      fullWindowsOnly,
      temperatureMix.filter(_.up).map(_.maxRepeat + 1L)
        .orElse(budgetMix.map(_.maxRepeat + 1L))
        .orElse(importanceMix.map(_.n + 1L)),
      bpeWindows.map(resolveBpe(spark, _)),
      // the landing owns a cache lifecycle, so the packed assembler may
      // persist its encoded boundary (released with the other handles)
      persisted = Some(handles))
    try win.write.mode("overwrite").partitionBy("split").parquet(outPath)
    finally handles.foreach(_.unpersist())
    val counts = landedSplitCounts(spark, outPath, win.schema)
    writeJsonManifest(spark, counts, outPath, WINDOWS_MANIFEST)
    counts
  }

  private val WINDOWS_MANIFEST = "_graft_windows_manifest.json"

  /** Per-split (windows, tokens) counts from the files ACTUALLY
    * written — shared by the batch and incremental windows landings so
    * their manifests can never drift in shape; the explicit schema
    * keeps an all-dropped landing a valid empty read. The window count
    * is footer metadata; the token mass is one COLUMN-PRUNED read of
    * n_tokens back from the landed files (not a free footer read, but
    * never a full-data second pass). */
  private def landedSplitCounts(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                schema: org.apache.spark.sql.types.StructType): Map[String, Long] =
    spark.read.schema(schema).parquet(path)
      .groupBy("split")
      .agg(count(lit(1)).as("__w__"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("__t__"))
      .collect()
      .flatMap(r => Seq(s"${r.getString(0)}_windows" -> r.getLong(1),
        s"${r.getString(0)}_tokens" -> r.getLong(2)))
      .toMap

  /** INCREMENTAL training-window landing — the daily-shard analog of
    * [[buildAndWriteWindows]], which rebuilds wholesale: a 100 TB
    * corpus cannot re-chop itself every day, so each arriving shard is
    * gated ([[ingestShardFrame]] — the standing corpus touched ONLY
    * through its pre-bucketed index, O(shard)), split by the SAME
    * stable id-hash as the batch path (a doc id lands the same split on
    * every shard of every day — split ratios hold corpus-wide and a doc
    * can never migrate between train and val), chopped into
    * SHARD-LOCAL windows, and landed under
    * `outPath/shard_label=<label>/split=.../` — the standard
    * shard-local-shuffle layout: window ids are dense per (shard,
    * split) from 0, the in-shard order is the deterministic Knuth-hash
    * permutation (seed folded with the shard label so consecutive days
    * draw different permutations), and the TRAINING-time loader
    * interleaves shard files for the global shuffle (readers of
    * `outPath` see `shard_label` and `split` partition columns for
    * free). A tail window shorter than `windowSize` per (shard, split)
    * is the price of shard-local chopping — `fullWindowsOnly` drops
    * them; the manifest records exact token masses either way.
    *
    * CRASH-REPLAY CONTRACT (the [[ingestShard]] discipline, adapted to
    * a landing that stores TEXT WINDOWS, not ids): windows cannot
    * answer "which docs landed", so each shard also writes an id
    * sidecar (`_docsidecar/shard_label=<label>`: (id, split) —
    * underscore-prefixed, invisible to corpus readers, and doubling as
    * the doc→shard lineage map a retraction batch plans from). The
    * per-shard manifest (`_graft_wshard_<label>.json`) is written LAST:
    * a replay with the same label returns its counts in O(1); a crash
    * after the index append but before the manifest leaves the shard's
    * docs present in the keys boundary, so the gate would re-drop them
    * as exact-vs-corpus — the suspects snapshot (taken BEFORE the gate,
    * Bloom-routed) recovers every suspect absent from OTHER shards'
    * sidecars, re-redacts, and lands them with this shard; the shard's
    * own directories overwrite in place, never duplicate.
    *
    * `admission` (optional): a [[graft.operators.Checks]] expectation
    * set the RAW shard must satisfy before anything is touched — a
    * violating shard (a broken scraper day) refuses loudly rather than
    * polluting the index with its keys and landing a sliver; one extra
    * aggregate over the already-checkpointed input.
    *
    * Returns Map("input" → …, "landed" → … [gated docs], plus
    * "<split>_windows" / "<split>_tokens" per non-empty split). */
  def ingestWindowsShard(shard: DataFrame, bench: DataFrame,
                         idCol: String, textCol: String,
                         indexName: String, indexPath: String,
                         outPath: String, windowSize: Long,
                         shardLabel: String,
                         minTokens: Int = 3,
                         nearDupThreshold: Double = 0.5,
                         decontamK: Int = 5,
                         trainFrac: Double = 0.8,
                         valFrac: Double = 0.1,
                         shuffleSeed: Long = 0L,
                         redactPii: Boolean = true,
                         fullWindowsOnly: Boolean = false,
                         admission: Seq[graft.operators.Checks.Constraint] = Nil,
                         lmFilter: Option[LmFilter] = None,
                         classifierFilter: Option[ClassifierFilter] = None,
                         gramScrub: Option[GramScrub] = None,
                         bpeWindows: Option[BpeWindows] = None,
                         langFilter: Option[LangFilter] = None): Map[String, Long] = {
    val spark = shard.sparkSession
    val manifestName = s"_graft_wshard_$shardLabel.json"
    readJsonManifest(spark, outPath, manifestName) match {
      case Some(counts) => return counts // fully landed — O(1) replay
      case None => ()
    }
    // one scan of the input end-to-end (the ingestShard posture)
    val cp = shard.localCheckpoint(true)
    // admission control BEFORE any state is touched: a shard violating
    // its contract (a broken scraper day) refuses loudly instead of
    // polluting the index with its keys and landing a sliver
    if (admission.nonEmpty) graft.operators.Checks.requireAll(cp, admission)
    // pre-gate suspects snapshot: ids already in the keys boundary are
    // either a crashed run's committed appends (recover) or an older
    // fully-processed submission (skip) — Bloom-routed, O(suspects)
    val keysTable = s"${indexName}_keys"
    val suspects: Option[DataFrame] =
      if (!spark.catalog.tableExists(keysTable)) None
      else Some(KeyBlooms.presentIds(cp.select(col(idCol)), idCol,
          spark.table(keysTable).select(col("id").as(idCol)), indexPath)
        .localCheckpoint(true))
    // optional ExactSubstr scrub against the gram ledger (the
    // ingestShard position and replay reasoning: own label excluded,
    // checkpointed once, gate and recovery both read the scrubbed view)
    val gated = gramScrub.fold(cp)(g =>
      Dedup.scrubSpansAgainstIndex(cp, idCol, textCol, g.name, g.path,
          g.minCount, g.minSpanTokens, excludeLabel = Some(shardLabel))
        .drop("tokens_removed").localCheckpoint(true))
    val survivors = ingestShardFrame(gated, bench, idCol, textCol,
      indexName, indexPath, minTokens, nearDupThreshold, decontamK,
      redactPii, lmFilter = lmFilter, classifierFilter = classifierFilter,
      langFilter = langFilter)
    try {
      val recovered: DataFrame = suspects match {
        case None => cp.limit(0)
        case Some(sus) =>
          if (sus.isEmpty) cp.limit(0)
          else {
            // landed = the id sidecars of OTHER shards (this shard's
            // own landing overwrites in place either way)
            val landedIds =
              try spark.read.parquet(s"$outPath/_docsidecar")
                .filter(col("shard_label").cast("string") =!= shardLabel)
                .select(col(idCol))
              catch { case _: org.apache.spark.sql.AnalysisException =>
                cp.select(col(idCol)).limit(0) }
            val unlanded = sus.join(
              landedIds.join(broadcast(sus), Seq(idCol), "left_semi"),
              Seq(idCol), "left_anti")
            gated.join(unlanded, Seq(idCol), "left_semi")
          }
      }
      // recovered docs passed the gate before the crash — re-apply
      // only the payload transform (redaction), as in ingestShard
      val recoveredRed =
        if (redactPii) recovered.withColumn(textCol,
          TextStats.redactPii(col(textCol)))
        else recovered
      val toAssemble = graft.api.GraftFrame(
          survivors.drop("__ck__").unionByName(recoveredRed))
        .splitByHash(idCol, trainFrac, valFrac).df
        .localCheckpoint(true) // windowsFrom reads it once per split
      // shard-local permutation: fold the label into the seed so two
      // days' shards never share an ordering by accident (deterministic
      // — a replay of the same label re-derives the same permutation)
      val shardSeed = shuffleSeed ^
        scala.util.hashing.MurmurHash3.stringHash(shardLabel).toLong
      val win = windowsFrom(toAssemble, idCol, textCol, windowSize,
        shardSeed, fullWindowsOnly,
        bpe = bpeWindows.map(resolveBpe(spark, _)))
      // sidecar BEFORE windows: a crash between the two leaves the ids
      // visible to the next replay, which overwrites both in place
      // gram-ledger lockstep (opt-in, before the landings — the
      // label-idempotent ledger covers its own replay window): what the
      // windows will hold is the ASSEMBLED gated text, so that is the
      // mass the next shard must see
      gramScrub.foreach(g => Dedup.appendShardGrams(toAssemble, idCol,
        textCol, g.name, g.path, shardLabel))
      toAssemble.select(col(idCol), col("split"))
        .write.mode("overwrite")
        .parquet(s"$outPath/_docsidecar/shard_label=$shardLabel")
      win.write.mode("overwrite").partitionBy("split")
        .parquet(s"$outPath/shard_label=$shardLabel")
      val perSplit = landedSplitCounts(spark,
        s"$outPath/shard_label=$shardLabel", win.schema)
      val counts = Map("input" -> cp.count(),
        "landed" -> toAssemble.count()) ++ perSplit
      writeJsonManifest(spark, counts, outPath, manifestName)
      counts
    } finally survivors.unpersist()
  }

  /** RETRACT documents from an [[ingestWindowsShard]] landing — the
    * windows leg of a takedown batch ([[retractDocuments]] covers the
    * index and the document landing; a training-window corpus is a
    * SINK TOO, and one that concatenates the retracted text into its
    * neighbors' windows). Windows store assembled text, not ids, so
    * retraction REBUILDS — but only the shards that actually hold a
    * retracted doc (the `_docsidecar` lineage map finds them in one
    * bounded pass): each affected shard's surviving docs re-chop under
    * the shard's own re-derived seed (label folded in, exactly as the
    * landing derived it), so the retracted tokens vanish and the
    * shard's window stream closes up; every other shard stays
    * byte-identical and readable throughout. O(affected shards), not
    * O(corpus) — batch requests, the family discipline.
    *
    * `docs` is the source-of-truth text store (the document landing,
    * or the upstream corpus) — windows cannot reconstruct text from
    * themselves; a surviving doc MISSING from `docs` fails loudly
    * (silently re-assembling without it would be an unrequested
    * retraction). `trainFrac`/`valFrac`/`windowSize`/`shuffleSeed`/
    * `fullWindowsOnly` must match the landing's parameters (splits come
    * from the sidecar record, not recomputed — but the chop geometry
    * must agree). Per-shard manifests keep their historical counts
    * (per-ingest records, not live inventory — the
    * [[retractDocuments]] convention).
    *
    * Returns Map("docs" → removed docs, "windows" → removed windows,
    * "shards" → shards rewritten). */
  def retractFromWindows(spark: org.apache.spark.sql.SparkSession,
                         outPath: String, ids: DataFrame, idCol: String,
                         docs: DataFrame, textCol: String,
                         windowSize: Long,
                         shuffleSeed: Long = 0L,
                         fullWindowsOnly: Boolean = false,
                         bpeWindows: Option[BpeWindows] = None): Map[String, Long] = {
    // the chop geometry must match the landing's — including the token
    // unit: a BPE landing rebuilds in id space under the SAME model
    val bpeResolved = bpeWindows.map(resolveBpe(spark, _))
    // cast defends against partition-type inference: a date-like label
    // (shard_label=20260814) discovers as an INT column, and a string
    // read would throw
    val sidecar =
      try spark.read.parquet(s"$outPath/_docsidecar")
        .withColumn("shard_label", col("shard_label").cast("string"))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        return Map("docs" -> 0L, "windows" -> 0L, "shards" -> 0L) }
    val key = broadcast(ids.select(col(idCol)).distinct())
    val affectedLabels = sidecar.join(key, Seq(idCol), "left_semi")
      .select("shard_label").distinct()
      .collect().map(_.getString(0)) // bounded: shards holding retracted ids
    if (affectedLabels.isEmpty)
      return Map("docs" -> 0L, "windows" -> 0L, "shards" -> 0L)
    var removedDocs = 0L
    var removedWindows = 0L
    for (label <- affectedLabels) {
      // survivors carry their RECORDED split (stable id-hash — the
      // sidecar is the authoritative per-shard record); checkpoint
      // eagerly: the rewrite overwrites the very sidecar files read
      val shardDocs = sidecar.filter(col("shard_label") === label)
        .select(col(idCol), col("split")).localCheckpoint(true)
      val survivors = shardDocs.join(key, Seq(idCol), "left_anti")
        .localCheckpoint(true)
      val survCount = survivors.count()
      val withText = survivors
        .join(docs.select(col(idCol), col(textCol)), Seq(idCol), "left")
        .localCheckpoint(true)
      val missing = withText.filter(col(textCol).isNull).count()
      require(missing == 0L,
        s"retractFromWindows: $missing surviving doc(s) of shard " +
          s"'$label' are missing from the provided text store — " +
          "re-assembling without them would silently retract docs " +
          "nobody asked to retract")
      // a duplicate-id text store is equally refused: the left join
      // would multiply the doc's text into the rebuilt windows (silent
      // training-corpus corruption) and which copy is "the" text is
      // ambiguous — the caller must dedupe their store first
      require(withText.count() == survCount,
        s"retractFromWindows: the provided text store holds " +
          s"${withText.count() - survCount} duplicate row(s) for shard " +
          s"'$label' ids — dedupe the store (one text per id) and retry")
      removedDocs += shardDocs.count() - survCount
      val windowsBefore =
        try spark.read.parquet(s"$outPath/shard_label=$label").count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      val shardSeed = shuffleSeed ^
        scala.util.hashing.MurmurHash3.stringHash(label).toLong
      val win = windowsFrom(withText, idCol, textCol, windowSize,
        shardSeed, fullWindowsOnly, bpe = bpeResolved)
        .localCheckpoint(true)
      win.write.mode("overwrite").partitionBy("split")
        .parquet(s"$outPath/shard_label=$label")
      withText.select(col(idCol), col("split"))
        .write.mode("overwrite")
        .parquet(s"$outPath/_docsidecar/shard_label=$label")
      removedWindows += windowsBefore - win.count()
    }
    Map("docs" -> removedDocs, "windows" -> removedWindows,
      "shards" -> affectedLabels.length.toLong)
  }

  /** One dense GLOBAL window-id space per split over an
    * [[ingestWindowsShard]] landing, WITHOUT shuffling a single window
    * row: per-(shard, split) window counts aggregate map-side (a
    * column-pruned count), shard offsets accumulate over the
    * lexicographic label order on that TINY frame, and the windows then
    * pick up `global_id = offset + window_id` through a broadcast join
    * — O(windows) map-side work, exchange-free on the window side at
    * any corpus size. The induced global order is (shard label asc,
    * in-shard position): exactly the shard-interleave a training
    * loader would derive itself; most loaders never need this (they
    * stream shard files directly), but eval tooling addressing "window
    * #N of val" wants one id space. Deterministic for a fixed landing;
    * ids shift when shards are added or retracted — address stable
    * work by (shard_label, split, window_id), which never changes. */
  def globalWindowIds(spark: org.apache.spark.sql.SparkSession,
                      outPath: String): DataFrame = {
    // string cast: date-like labels discover as INT otherwise (and the
    // label order must be the string order at any label shape)
    val win = spark.read.parquet(outPath)
      .withColumn("shard_label", col("shard_label").cast("string"))
    val counts = win.groupBy("shard_label", "split")
      .agg(count(lit(1)).as("__n__"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("split").orderBy("shard_label")
    val offsets = counts
      .withColumn("__off__",
        coalesce(sum(col("__n__")).over(w) - col("__n__"), lit(0L)))
      .select(col("shard_label"), col("split"), col("__off__"))
    // payload columns ride through generically: a text landing carries
    // window_text, a BPE landing window_ids — the id space is the same
    val payload = win.columns
      .filterNot(Set("shard_label", "split", "window_id").contains)
      .map(col)
    win.join(broadcast(offsets), Seq("shard_label", "split"))
      .select(Seq(col("shard_label"), col("split"), col("window_id"),
        (col("__off__") + col("window_id")).as("global_id")) ++ payload: _*)
  }

  /** The READER-SIDE loader contract of a windows landing — the
    * consumer's half of [[ingestWindowsShard]]'s layout, as code
    * instead of convention: given the landing root and a split, the
    * split's windows stream back in the canonical global order
    * (shard_label ascending, in-shard window position) with their
    * [[globalWindowIds]] ids — every reader that starts here sees the
    * SAME deterministic sequence, so "window #N of val" means one
    * thing across eval tooling, resumption bookkeeping, and debugging.
    *
    * Scale shape: partition pruning on `split` (a partition column of
    * the landing), the exchange-free broadcast offset join of
    * [[globalWindowIds]], then ONE range shuffle on global_id with an
    * in-partition sort — O(split windows), no global single-task sort.
    * Rows stream out range-partitioned: partition k holds a contiguous
    * id range entirely before partition k+1's, and is sorted inside,
    * so a sequential reader (toLocalIterator, or per-partition file
    * export) sees strictly increasing global ids. Ids shift when
    * shards are added or retracted — the [[globalWindowIds]] contract;
    * address durable work by (shard_label, split, window_id). */
  def loadWindows(spark: org.apache.spark.sql.SparkSession,
                  outPath: String, split: String,
                  fim: Option[Bpe.FimSpec] = None,
                  denoise: Option[Denoise.SpanSpec] = None): DataFrame = {
    require(fim.isEmpty || denoise.isEmpty,
      "loadWindows: fim and denoise are mutually exclusive — the two " +
        "objectives rearrange the same id stream; run separate epochs")
    val base = globalWindowIds(spark, outPath)
      .filter(col("split") === split)
    // FILL-IN-THE-MIDDLE rides the load stream (Bavarian et al. 2022 —
    // code-model training applies FIM at data-loading time, not at
    // landing time, so one landing serves both plain and FIM epochs):
    // the deterministic per-key gate + cuts key on global_id, so the
    // transformed stream is reproducible across runs and equals
    // fimTransform over the plain load (spec-pinned). Blockwise — it
    // fuses into the scan before the one range shuffle. SPAN
    // CORRUPTION rides the same way (one landing serves causal, FIM
    // and denoising epochs — the objective is a load-time choice).
    def requireIds(what: String): Unit =
      require(base.columns.contains("window_ids"),
        s"loadWindows: $what applies to ID landings (window_ids) — a " +
          "text landing has no id sequence to rearrange")
    val transformed = fim.fold(base) { f =>
      requireIds("fim")
      Bpe.fimTransform(base, "global_id", "window_ids",
        f.rate, f.seed, f.preId, f.sufId, f.midId, f.mode)
    }
    val corrupted = denoise.fold(transformed) { d =>
      requireIds("denoise")
      Denoise.spanCorrupt(transformed, "global_id", "window_ids",
        d.sentinelBase, d.spanLen, d.blockSize, d.seed)
    }
    corrupted
      .repartitionByRange(col("global_id"))
      .sortWithinPartitions("global_id")
  }

  /** [[loadWindows]] with a PER-EPOCH re-shuffle — multi-epoch training
    * over one landing: epoch k streams the SAME window set in a
    * deterministic permutation of its own (epoch and seed fold into a
    * Murmur3 order key over the global id; ties break on the id, so
    * the order is total), without re-landing anything — the landed
    * bytes never move, only the read order changes. Epochs are
    * reproducible across runs and machines for a fixed landing
    * (the same determinism contract as every sampler here — no RNG
    * state, the permutation is a pure function of (id, epoch, seed)).
    *
    * Each row carries `epoch_ord`, the order key the stream is sorted
    * by — resumption bookkeeping can record the last (epoch_ord,
    * global_id) seen and re-enter the stream with a filter, the same
    * move loadWindows supports via global_id alone.
    *
    * Scale shape: identical to [[loadWindows]] — the exchange-free
    * offset join, then ONE range shuffle on (epoch_ord, global_id)
    * with an in-partition sort; no global single-task sort at any
    * size. A non-linear hash (not an additive offset on the id hash)
    * is load-bearing: a linear mix would make every epoch's order a
    * ROTATION of every other's, which is not a re-shuffle. */
  def loadWindowsEpoch(spark: org.apache.spark.sql.SparkSession,
                       outPath: String, split: String, epoch: Long,
                       seed: Long = 0L): DataFrame = {
    require(epoch >= 0L, s"epoch must be >= 0, got $epoch")
    globalWindowIds(spark, outPath)
      .filter(col("split") === split)
      .withColumn("epoch_ord",
        hash(col("global_id"), lit(epoch), lit(seed)))
      .repartitionByRange(col("epoch_ord"), col("global_id"))
      .sortWithinPartitions("epoch_ord", "global_id")
  }

  /** LOAD-TIME MIXING across several landed corpora — training-time
    * domain mixing WITHOUT re-landing anything: given sources
    * (label, landing root, weight), the split's windows from every
    * source stream back as ONE deterministic interleave whose source
    * proportions track the weights in EVERY prefix (not just overall
    * — a curriculum-sensitive trainer must not see one corpus
    * clustered early). The construction is systematic midpoint
    * spacing: within each source, windows take their per-epoch order
    * ([[loadWindowsEpoch]] — fresh permutation per epoch), rank
    * densely via the two-pass cumsum, and land at mix position
    * (rank + 0.5) / weight; the merged stream sorts by that position
    * (ties: label, id). A weight-2 source emits two windows per unit
    * to a weight-1 source's one, so any prefix holds the sources in
    * ~weight proportion, deterministically — no RNG, reproducible
    * across runs and machines.
    *
    * Sources must share a payload layout (all text windows or all id
    * windows — mixing the two would hand the trainer a ragged batch);
    * rows carry `source` (the label) and `mix_ord` (the stream's
    * order key — resumption bookkeeping, the loadWindowsEpoch
    * convention). Weights are RATES, not fractions: only their ratios
    * matter.
    *
    * Scale shape: per source, the loadWindowsEpoch range shuffle plus
    * one dense-rank cumsum; then ONE range shuffle on the merged mix
    * position — O(total windows), no global single-task sort. */
  def loadWindowsMixed(spark: org.apache.spark.sql.SparkSession,
                       sources: Seq[(String, String, Double)],
                       split: String, epoch: Long = 0L,
                       seed: Long = 0L): DataFrame = {
    require(sources.nonEmpty, "loadWindowsMixed: no sources")
    require(sources.forall(_._3 > 0.0),
      "loadWindowsMixed: every weight must be positive")
    require(sources.map(_._1).distinct.length == sources.length,
      "loadWindowsMixed: duplicate source labels — rows would be " +
        "indistinguishable")
    val streams = sources.map { case (label, path, w) =>
      val s = loadWindowsEpoch(spark, path, split, epoch, seed)
        .withColumn("__eord__",
          struct(col("epoch_ord"), col("global_id")))
        .withColumn("__one__", lit(1L))
      val ranked = graft.operators.WindowOps
        .globalCumSum(s, "__eord__", "__one__", "__rk__")
      ranked
        .withColumn("source", lit(label))
        .withColumn("mix_ord",
          (col("__rk__").cast("double") - 0.5) / w)
        .drop("__eord__", "__one__", "__rk__")
    }
    val schemas = streams.map(_.schema.fieldNames.sorted.toSeq).distinct
    require(schemas.length == 1,
      s"loadWindowsMixed: sources disagree on the window layout " +
        s"($schemas) — mix text landings with text landings and id " +
        "landings with id landings")
    streams.reduce(_.unionByName(_))
      .repartitionByRange(col("mix_ord"), col("source"), col("global_id"))
      .sortWithinPartitions("mix_ord", "source", "global_id")
  }

  /** Maintenance observable for an [[ingestWindowsShard]] landing — the
    * family's report sibling ([[Dedup.indexReport]], [[Ivf.indexReport]],
    * [[KeyBlooms.report]]): per shard, the doc count (sidecar), window
    * and token counts (landed parquet), parquet file count (the
    * compaction observable) and whether the shard's manifest committed
    * (`manifest=false` flags a crashed landing the next replay will
    * rebuild). With `docs` — the source-of-truth text store — the
    * report also verifies TOKEN CONSERVATION per shard: `doc_tokens`
    * recomputes the sidecar docs' token mass and `tokens_match` says
    * whether the landed windows hold exactly it (the fsck bit; expect
    * false only on fullWindowsOnly landings, whose dropped tails are
    * priced in the manifest, or after text-store drift — both worth an
    * operator's eyes). One column-pruned scan of the windows plus one
    * of the sidecar (and one of `docs` when auditing); report is
    * O(shards) rows.
    *
    * STRIDED (eval) landings carry a different conservation law: each
    * (shard, split) stream of mass T lands exactly
    * ⌊(T−1)/stride⌋ + 1 windows whose id mass is the closed form
    * Σ_w (min(w·stride + windowSize, T) − w·stride) — pass the
    * landing's `windowSize` (required when the [[BpeWindows]] spec has
    * a stride; the chop law is size-independent, so it is otherwise
    * unused) and `doc_tokens` then reports that EXPECTED window mass,
    * derived per split from the docs' recomputed stream mass, with
    * `tokens_match` comparing it to the landed mass exactly. */
  def windowsReport(spark: org.apache.spark.sql.SparkSession,
                    outPath: String,
                    docs: Option[DataFrame] = None,
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    bpeWindows: Option[BpeWindows] = None,
                    windowSize: Option[Long] = None): DataFrame = {
    // the conservation fsck must count in the LANDING's token unit:
    // whitespace words for text windows, BPE token ids for id windows
    val bpeResolved = bpeWindows.map(resolveBpe(spark, _))
    // string casts defend against partition-type inference on
    // date-like labels (shard_label=20260814 discovers as INT)
    val win = spark.read.parquet(outPath)
      .withColumn("shard_label", col("shard_label").cast("string"))
    val sidecar = spark.read.parquet(s"$outPath/_docsidecar")
      .withColumn("shard_label", col("shard_label").cast("string"))
    val winAgg = win
      .select(col("shard_label"), col("n_tokens"),
        input_file_name().as("__f__"))
      .groupBy("shard_label")
      .agg(count(lit(1)).as("windows"),
        coalesce(sum(col("n_tokens")), lit(0L)).as("tokens"),
        countDistinct(col("__f__")).as("files"))
    val docAgg = docs match {
      case None =>
        sidecar.groupBy("shard_label")
          .agg(count(lit(1)).as("docs"), lit(null).cast("long").as("doc_tokens"))
      case Some(store) =>
        val docTok: org.apache.spark.sql.Column = bpeResolved match {
          case None => size(split(col(textCol), " ")).cast("long")
          case Some(rb) =>
            aggregate(
              transform(
                filter(graft.llm.Bpe.wordsOfCol(
                    rb.prepText(col(textCol)), rb.wordPattern),
                  w => length(w) >= 1),
                w => size(rb.encode(w)).cast("long")),
              // each landed doc carries exactly one EOD id when the
              // landing inserts them — the conservation unit follows
              lit(if (rb.eodId.isDefined) 1L else 0L), (acc, n) => acc + n)
        }
        val joined = sidecar
          .join(store.select(col(idCol), col(textCol)), Seq(idCol), "left")
        bpeResolved.flatMap(_.stride) match {
          case None =>
            joined.groupBy("shard_label")
              .agg(count(lit(1)).as("docs"),
                coalesce(sum(docTok), lit(0L)).as("doc_tokens"))
          case Some(st) =>
            val size = windowSize.getOrElse(throw new IllegalArgumentException(
              "windowsReport: a strided landing's conservation law " +
                "depends on the window size — pass windowSize"))
            // per-(shard, split) stream mass T → the closed-form strided
            // window mass: f full windows of `size` ids plus the clipped
            // tail windows' (T − w·stride) masses; the triangular sum's
            // product is always even, so the halving is exact (shiftright)
            val perSplit = joined.groupBy("shard_label", "split")
              .agg(count(lit(1)).as("__d__"),
                coalesce(sum(docTok), lit(0L)).as("__T__"))
            val bigT = col("__T__")
            val wmax = floor((bigT - 1).cast("double") / st).cast("long")
            val fFull = when(bigT >= size,
              floor((bigT - size).cast("double") / st).cast("long") + 1L)
              .otherwise(lit(0L))
            val mass = when(bigT <= 0L, lit(0L)).otherwise(
              fFull * size + (wmax - fFull + 1) * bigT -
                lit(st) * shiftright((wmax + fFull) * (wmax - fFull + 1), 1))
            perSplit
              .select(col("shard_label"), col("__d__"), mass.as("__m__"))
              .groupBy("shard_label")
              .agg(sum(col("__d__")).as("docs"),
                sum(col("__m__")).as("doc_tokens"))
        }
    }
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifested = docAgg.select("shard_label").collect()
      .map(_.getString(0))
      .map(l => l -> fs.exists(new org.apache.hadoop.fs.Path(outPath,
        s"_graft_wshard_$l.json"))).toMap
    import spark.implicits._
    val manifestDf = manifested.toSeq.toDF("shard_label", "manifest")
    docAgg.join(winAgg, Seq("shard_label"), "full_outer")
      .join(manifestDf, Seq("shard_label"), "left")
      .select(col("shard_label"),
        coalesce(col("docs"), lit(0L)).as("docs"),
        coalesce(col("windows"), lit(0L)).as("windows"),
        coalesce(col("tokens"), lit(0L)).as("tokens"),
        coalesce(col("files"), lit(0L)).as("files"),
        coalesce(col("manifest"), lit(false)).as("manifest"),
        col("doc_tokens"),
        when(col("doc_tokens").isNull, lit(null).cast("boolean"))
          .otherwise(col("doc_tokens") === coalesce(col("tokens"), lit(0L)))
          .as("tokens_match"))
      .orderBy("shard_label")
  }

  /** POST-LANDING benchmark contamination screen in the LANDED unit —
    * the fsck nobody regrets running: the build decontaminated against
    * the benchmarks it knew at landing time, but benchmarks update and
    * landings are long-lived, so the question "do my landed training
    * windows contain eval text?" must be answerable over the
    * `window_ids` arrays themselves, without re-deriving the text
    * corpus. The benchmark encodes under the SAME persisted model the
    * landing used (stamp-resolved — the id spaces are comparable by
    * construction) and every k-consecutive-id gram of every landed
    * window joins against the benchmark's id-gram set.
    *
    * Grams containing the -1 OOV sentinel, the landing's `eodId` or
    * its `padId` are excluded on both sides: -1 conflates distinct
    * unseen tokens (a match would be noise), and eod/pad are landing
    * artifacts no benchmark text contains — a gram crossing a document
    * boundary is not contamination of either document.
    *
    * Returns one row per CONTAMINATED window: the landing's addressing
    * columns (shard_label when present, split, window_id), `n_hits`
    * (the count of gram positions matching the benchmark — not
    * distinct grams: a window repeating an eval sentence twice is
    * twice as contaminated), and, when the landing carries
    * `doc_spans`, `doc_ids` — the documents whose spans overlap a hit
    * position, exactly the batch [[retractFromWindows]] wants.
    *
    * Scale shape: ~linear in landed window ids (each window emits one
    * gram per position, filtered and hashed inside the scan) against
    * the benchmark gram set. The broadcast side is GRAMS, not docs —
    * roughly one per benchmark token — so the bound probes the
    * distinct GRAM mass (`maxBenchGrams`, one bench-sized encode
    * pass): a benchmark under it broadcasts (zero corpus exchange); a
    * larger one refuses loudly, naming `broadcastBench = false`, which
    * switches the hit join to a plain shuffled equi-join — one extra
    * corpus-gram exchange, linear at any benchmark size. One
    * column-pruned read of the landing either way; no corpus re-scan,
    * no all-pairs. */
  def windowsContaminationScreen(spark: org.apache.spark.sql.SparkSession,
                                 outPath: String, bench: DataFrame,
                                 benchTextCol: String,
                                 bpeWindows: BpeWindows,
                                 k: Int = 5,
                                 maxBenchGrams: Long = 2000000L,
                                 broadcastBench: Boolean = true): DataFrame = {
    require(k >= 2, s"windowsContaminationScreen: k must be >= 2, got $k")
    val rb = resolveBpe(spark, bpeWindows)
    // ids a gram must not contain: OOV, and the landing's structural ids
    val banned = Seq(-1L) ++ rb.eodId.toSeq ++ rb.padId.toSeq
    def gramKey(g: org.apache.spark.sql.Column) =
      concat_ws(":", transform(g, x => x.cast("string")))
    def cleanGram(g: org.apache.spark.sql.Column) =
      banned.map(b => !array_contains(g, b)).reduce(_ && _)
    def posGrams(ids: org.apache.spark.sql.Column) =
      when(size(ids) >= k,
        transform(sequence(lit(0), size(ids) - k),
          i => slice(ids, i + 1, lit(k))))
        .otherwise(array())
    val words = filter(Bpe.wordsOfCol(rb.prepText(col(benchTextCol)),
        rb.wordPattern),
      w => length(w) >= 1)
    val benchIds = flatten(transform(words, w => rb.encode(w)))
    // r16 optimization: encode once per row through a projected
    // attribute — posGrams references its argument in the sequence
    // bound and per slice, so an inline benchIds re-ran the full
    // per-document BPE encode per gram (the postings lesson)
    val benchGrams = bench.filter(col(benchTextCol).isNotNull)
      .select(benchIds.as("__bids__"))
      .select(explode(posGrams(col("__bids__"))).as("__g__"))
      .filter(cleanGram(col("__g__")))
      .select(gramKey(col("__g__")).as("__gram__"))
      .distinct()
    if (broadcastBench) {
      // the broadcast rides GRAM mass (~one per benchmark token), so
      // the bound must probe grams, not benchmark rows
      val probe = benchGrams.limit((maxBenchGrams + 1).toInt).count()
      require(probe <= maxBenchGrams,
        s"windowsContaminationScreen: benchmark gram set exceeds " +
          s"$maxBenchGrams distinct grams — too large to broadcast; " +
          "pass broadcastBench = false (one extra corpus-gram " +
          "exchange, linear at any benchmark size) or screen in " +
          "bounded benchmark batches")
    }
    val win0 = spark.read.parquet(outPath)
    val win =
      if (win0.columns.contains("shard_label"))
        win0.withColumn("shard_label", col("shard_label").cast("string"))
      else win0
    val groupCols = Seq("shard_label", "split", "window_id")
      .filter(win.columns.contains)
    val hasSpans = win.columns.contains("doc_spans")
    val corpusGrams = win
      .select(groupCols.map(col) ++
        (if (hasSpans) Seq(col("doc_spans")) else Nil) :+
        posexplode(posGrams(col("window_ids"))).as(Seq("__pos__", "__g__")): _*)
      .filter(cleanGram(col("__g__")))
      .withColumn("__gram__", gramKey(col("__g__")))
    val hits =
      if (broadcastBench) corpusGrams.join(broadcast(benchGrams), Seq("__gram__"))
      else corpusGrams.join(benchGrams, Seq("__gram__"))
    val aggCols = Seq(count(lit(1)).as("n_hits")) ++
      (if (hasSpans) Seq(
        // spans ride the group (constant per window); hit positions
        // resolve to the docs whose [pos, pos+len) tiles they touch
        first(col("doc_spans")).as("__sp__"),
        collect_set(col("__pos__").cast("long")).as("__ps__"))
       else Nil)
    val agg = hits.groupBy(groupCols.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    if (!hasSpans) agg
    else agg.select(groupCols.map(col) ++ Seq(col("n_hits"),
      array_sort(array_distinct(transform(
        filter(col("__sp__"), sp =>
          exists(col("__ps__"), p =>
            p < sp.getField("pos") + sp.getField("len") &&
              p + k > sp.getField("pos"))),
        sp => sp.getField("id")))).as("doc_ids")): _*)
  }

  /** The TEXT-landing sibling of [[windowsContaminationScreen]]: a
    * landing that stores `window_text` screens via WORD k-shingles
    * (the [[Dedup.contaminationReport]] hash machinery — the same
    * engine-agnostic integer shingles every text-decontam path here
    * uses), computed over the landed windows themselves. `n_hits` is
    * the count of DISTINCT window shingles present in the benchmark
    * set (the contaminationReport convention). Text landings carry no
    * doc spans, so hits name WINDOWS; to name retractable documents,
    * screen the doc store with [[Dedup.contaminationReport]] and feed
    * [[retractFromWindows]] — this screen's job is the landed-artifact
    * fsck ("is eval text in what the trainer reads?"), answered
    * without re-deriving the corpus.
    *
    * Scale shape: one column-pruned read of the landing (each window's
    * shingles fuse into the scan) joined to the benchmark's distinct
    * shingle set — `maxBenchShingles`-bounded broadcast (~one shingle
    * per benchmark token; the gram-mass reasoning of the id screen),
    * with `broadcastBench = false` the linear shuffled fallback. */
  def windowsContaminationScreenText(spark: org.apache.spark.sql.SparkSession,
                                     outPath: String, bench: DataFrame,
                                     benchTextCol: String,
                                     k: Int = 5,
                                     maxBenchShingles: Long = 2000000L,
                                     broadcastBench: Boolean = true): DataFrame = {
    require(k >= 2, s"windowsContaminationScreenText: k must be >= 2, got $k")
    val benchH = bench.filter(col(benchTextCol).isNotNull)
      .select(explode(graft.functions.TextHashExprs
        .shingleHashes(col(benchTextCol), k)).as("__h__"))
      .distinct()
    if (broadcastBench) {
      val probe = benchH.limit((maxBenchShingles + 1).toInt).count()
      require(probe <= maxBenchShingles,
        s"windowsContaminationScreenText: benchmark shingle set " +
          s"exceeds $maxBenchShingles — too large to broadcast; pass " +
          "broadcastBench = false (linear shuffled join) or screen in " +
          "bounded benchmark batches")
    }
    val win0 = spark.read.parquet(outPath)
    val win =
      if (win0.columns.contains("shard_label"))
        win0.withColumn("shard_label", col("shard_label").cast("string"))
      else win0
    val groupCols = Seq("shard_label", "split", "window_id")
      .filter(win.columns.contains)
    val winH = win.select(groupCols.map(col) :+
      explode(graft.functions.TextHashExprs
        .shingleHashes(col("window_text"), k)).as("__h__"): _*)
    val hits =
      if (broadcastBench) winH.join(broadcast(benchH), Seq("__h__"))
      else winH.join(benchH, Seq("__h__"))
    hits.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Per-split window assembly shared by the two windows entrypoints:
    * each split chops independently (leakage isolation), the split set
    * is the static three of [[graft.api.GraftFrame.splitByHash]] — an
    * empty split assembles to an empty frame and vanishes from the
    * union. An UP-mixed corpus (epoch copies present) keys the
    * assembly on the composite id·(maxRepeat+1)+epoch — the same key
    * that positions copies in the shuffle order, so each epoch copy of
    * a doc takes its own place in the chopped token stream. */
  private def windowsFrom(corpus: DataFrame, idCol: String,
                          textCol: String, windowSize: Long, seed: Long,
                          fullWindowsOnly: Boolean,
                          epochScale: Option[Long] = None,
                          bpe: Option[ResolvedBpe] = None,
                          persisted: Option[scala.collection.mutable.Buffer[DataFrame]] = None): DataFrame = {
    // r16 optimization — SPLIT-FUSED landing: the assemblers run ONCE
    // with groupCols = Seq("split") (grouped cumsums restart the
    // permutation stream per split), instead of one full per-split plan
    // each. Per-split window ids, membership and conservation laws are
    // bit-identical to the three-plan form — the grouped prefix sums
    // over (split, hash-order) equal each split's own prefix sums — and
    // the corpus-side work (scan of the chain output, the fused encode,
    // the cumsum exchanges) is paid once, not three times.
    // the static split whitelist the pre-fusion per-split loop enforced
    // (r16 advice): splitByHash emits exactly these three values, but a
    // caller-supplied corpus with a custom/null split column must be
    // EXCLUDED from the landing (the grouped-cumsum join would otherwise
    // assemble and land it), not silently change landing contents
    val splits = corpus.filter(col("split").isin("train", "val", "test"))
    val (keyed, key) = epochScale match {
      case None =>
        (splits.select(col("split"), col(idCol), col(textCol)), idCol)
      case Some(scale) =>
        (splits.select(col("split"),
          (col(idCol).cast("long") * scale + col("epoch")).as("__wkey__"),
          col(textCol)), "__wkey__")
    }
    val gc = Seq("split")
    val win = bpe match {
      case None =>
        TextStats.assembleWindows(keyed, key, textCol, windowSize, seed, gc)
          .select(col("split"), col("window_id"),
            col("window_text"), col("n_tokens"))
      case Some(rb) =>
        require(!(rb.packed && fullWindowsOnly),
          "packed windows + fullWindowsOnly: packing makes underfull " +
            "REAL token counts the norm (the shape guarantee is padId) " +
            "— the filter would drop nearly every window")
        val cols = Seq(col("split"), col("window_id"),
          col("window_ids"), col("n_tokens")) ++
          (if (rb.docSpans) Seq(col("doc_spans")) else Nil)
        val asm = (rb.packed, rb.stride) match {
          case (true, _) =>
            rb.asmPacked(keyed, key, textCol, windowSize, seed, persisted,
              gc)
          case (false, Some(st)) =>
            rb.asmStrided(keyed, key, textCol, windowSize, st, seed, gc)
          case (false, None) =>
            rb.asmChop(keyed, key, textCol, windowSize, seed, gc)
        }
        asm.select(cols: _*)
    }
    if (fullWindowsOnly) win.filter(col("n_tokens") === windowSize) else win
  }

  private[llm] def readJsonManifest(spark: org.apache.spark.sql.SparkSession,
                               outPath: String,
                               name: String): Option[Map[String, Long]] = {
    val p = new org.apache.hadoop.fs.Path(outPath, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                finally in.close()
      Some(""""([^"]+)":(-?\d+)""".r.findAllMatchIn(txt)
        .map(m => m.group(1) -> m.group(2).toLong).toMap)
    }
  }

  private[llm] def writeJsonManifest(spark: org.apache.spark.sql.SparkSession,
                                counts: Map[String, Long], outPath: String,
                                name: String): Unit = {
    val json = counts.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val p = new org.apache.hadoop.fs.Path(outPath, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(p, true)
    try os.write((json + "\n").getBytes("UTF-8")) finally os.close()
  }

  /** Incremental DAILY-INGEST pipeline — the batch analog of
    * `Streams.ingestGateStream`, composed end-to-end: the shape a 100 TB
    * corpus owner runs per arriving shard, where the standing corpus is
    * touched ONLY through its pre-bucketed index
    * ([[Dedup.writeNearDupIndex]] — bands, shingles, keys) and is never
    * re-scanned or re-shuffled (plan-asserted in spec):
    *
    *   1. quality gate (same fused Gopher predicate as [[pretrainCorpus]])
    *   2. canonical content key from the PRE-redaction text, then PII
    *      redaction — keying first matches the streaming gate: two docs
    *      differing only in their PII values are different documents
    *   3. in-shard exact dedup (keep smallest id per key)
    *   4. exact dedup vs the corpus boundary
    *      ([[Dedup.dropExactAgainstIndex]]: bucketed keys table, corpus
    *      side zero-exchange)
    *   5. benchmark decontamination — BEFORE the index append, so a
    *      contaminated doc can never enter the index and ghost-dedup
    *      future shards against a doc the corpus doesn't contain
    *   6. near dedup, in-shard then vs the corpus index, and append the
    *      survivors' bands/shingles/keys ([[Dedup.appendShardToIndex]])
    *
    * Only the shard ever shuffles: its size bounds every exchange, so
    * the daily cost is O(|shard|) regardless of corpus size. Returns the
    * surviving docs (CACHED by the append — it feeds the table appends
    * and the caller's sink; `unpersist()` once landed, or use
    * [[ingestShard]] which owns the lifecycle). The `__ck__` key column
    * rides the output for the landing variant to drop. */
  def ingestShardFrame(shard: DataFrame, bench: DataFrame,
                       idCol: String, textCol: String,
                       indexName: String, indexPath: String,
                       minTokens: Int = 3,
                       nearDupThreshold: Double = 0.5,
                       decontamK: Int = 5,
                       redactPii: Boolean = true,
                       shingleK: Int = 3, numHashes: Int = 16,
                       bands: Int = 4, buckets: Int = 8,
                       lmFilter: Option[LmFilter] = None,
                       classifierFilter: Option[ClassifierFilter] = None,
                       langFilter: Option[LangFilter] = None): DataFrame = {
    val ruleQuality = TextStats.qualityFilter(shard, textCol,
      minTokens = minTokens)
    // optional LANGUAGE gate (the chain's 1a slot): after the cheap
    // rule predicate, before the model-quality gates — pre-redaction,
    // deterministic-on-replay like the other gates
    val langQuality = langFilter.fold(ruleQuality)(f =>
      Classifier.filterByLang(ruleQuality, idCol, textCol, f.model,
        f.keep, f.alpha, f.keepUnpredicted))
    // optional model-based quality (the pretrainCorpus LmFilter slot):
    // scored on the PRE-redaction text like the rule gate; the model
    // frame must be the same on a crash replay (deterministic gate —
    // the recovery path never re-gates, so this only matters for the
    // docs that had NOT yet committed, which simply re-gate)
    val lmQuality = lmFilter.fold(langQuality)(f =>
      NgramLm.filterByLm(langQuality, idCol, textCol, f.model,
        f.minLogprob, f.n, f.alpha, f.keepUnscorable))
    // optional discriminative quality (the ClassifierFilter slot) —
    // same pre-redaction, deterministic-on-replay contract
    val quality = classifierFilter.fold(lmQuality)(f =>
      Classifier.filterByClassifier(lmQuality, idCol, textCol, f.model,
        f.minLlrMean, f.alpha, f.keepUnscorable))
    val keyed = quality.withColumn("__ck__",
      Dedup.canonicalKey(col(textCol)))
    val redacted =
      if (redactPii) keyed.withColumn(textCol,
        TextStats.redactPii(col(textCol)))
      else keyed
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ck__")).orderBy(col(idCol).asc)
    val inShardExact = redacted
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1).drop("__rn__")
    // the exact-vs-corpus boundary goes through the Bloom sidecar
    // whenever the index has one (KeyBlooms.build): same output, corpus
    // touch O(suspects) instead of O(corpus keys) — the sidecar then
    // grows in lockstep inside appendShardToIndex
    val fresh =
      if (KeyBlooms.exists(shard.sparkSession, indexPath))
        Dedup.dropExactAgainstIndexBloom(inShardExact, idCol, textCol,
          indexName, indexPath, keyCol = Some("__ck__"))
      else Dedup.dropExactAgainstIndex(inShardExact, idCol, textCol,
        indexName, keyCol = Some("__ck__"))
    val clean = Dedup.decontaminate(fresh, bench, idCol, textCol, decontamK)
    Dedup.appendShardToIndex(clean, idCol, textCol, indexName, indexPath,
      nearDupThreshold, shingleK, numHashes, bands, buckets,
      keyCol = Some("__ck__"))
  }

  /** Per-doc FATE audit of the ingest gate — the same stage chain as
    * [[ingestShardFrame]], but a DRY RUN (the index is only read, never
    * appended) that classifies EVERY input doc instead of returning the
    * survivors: (id, fate) where fate is the FIRST stage that dropped
    * the doc — 'quality', 'lm_quality' (LmFilter active), 'clf_quality'
    * (ClassifierFilter active), 'exact_in_shard', 'exact_vs_corpus',
    * 'contaminated', 'near_in_shard', 'near_vs_corpus' — or 'landed'.
    * This is the drop-attribution report [[ingestShard]]'s manifest
    * deliberately omits (CollectMetrics cannot surface through the
    * landing's file write): run it on a rejected-heavy shard to see
    * WHERE the volume went before re-tuning thresholds. Each stage
    * boundary is eagerly localCheckpointed (shard-sized) so the seven
    * membership joins replay nothing; blocks free on GC. */
  def ingestAudit(shard: DataFrame, bench: DataFrame,
                  idCol: String, textCol: String,
                  indexName: String,
                  minTokens: Int = 3,
                  nearDupThreshold: Double = 0.5,
                  decontamK: Int = 5,
                  redactPii: Boolean = true,
                  shingleK: Int = 3, numHashes: Int = 16,
                  bands: Int = 4,
                  lmFilter: Option[LmFilter] = None,
                  classifierFilter: Option[ClassifierFilter] = None,
                  langFilter: Option[LangFilter] = None): DataFrame = {
    val ruleQ = TextStats.qualityFilter(shard, textCol,
      minTokens = minTokens).localCheckpoint(true)
    val langQ = langFilter.fold(ruleQ)(f =>
        Classifier.filterByLang(ruleQ, idCol, textCol, f.model,
          f.keep, f.alpha, f.keepUnpredicted))
      .localCheckpoint(true)
    val lmQ = lmFilter.fold(langQ)(f =>
        NgramLm.filterByLm(langQ, idCol, textCol, f.model, f.minLogprob,
          f.n, f.alpha, f.keepUnscorable))
      .localCheckpoint(true)
    val quality = classifierFilter.fold(lmQ)(f =>
        Classifier.filterByClassifier(lmQ, idCol, textCol, f.model,
          f.minLlrMean, f.alpha, f.keepUnscorable))
      .withColumn("__ck__", Dedup.canonicalKey(col(textCol)))
      .localCheckpoint(true)
    val redacted =
      if (redactPii) quality.withColumn(textCol,
        TextStats.redactPii(col(textCol)))
      else quality
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__ck__")).orderBy(col(idCol).asc)
    val inShardExact = redacted
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1).drop("__rn__")
      .localCheckpoint(true)
    val fresh = Dedup.dropExactAgainstIndex(inShardExact, idCol, textCol,
      indexName, keyCol = Some("__ck__")).localCheckpoint(true)
    val clean = Dedup.decontaminate(fresh, bench, idCol, textCol, decontamK)
      .localCheckpoint(true)
    val internal = Dedup.dropNearDuplicates(clean, idCol, textCol,
      nearDupThreshold, shingleK = shingleK, numHashes = numHashes,
      bands = bands).localCheckpoint(true)
    val landed = internal.join(
      Dedup.nearDupPairsAgainstIndex(internal, idCol, textCol, indexName,
          nearDupThreshold, shingleK, numHashes, bands)
        .select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti").localCheckpoint(true)
    def flag(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol)).withColumn(name, lit(true))
    shard.select(col(idCol))
      .join(flag(ruleQ, "__f0__"), Seq(idCol), "left")
      .join(flag(langQ, "__f0a__"), Seq(idCol), "left")
      .join(flag(lmQ, "__f0b__"), Seq(idCol), "left")
      .join(flag(quality, "__f1__"), Seq(idCol), "left")
      .join(flag(inShardExact, "__f2__"), Seq(idCol), "left")
      .join(flag(fresh, "__f3__"), Seq(idCol), "left")
      .join(flag(clean, "__f4__"), Seq(idCol), "left")
      .join(flag(internal, "__f5__"), Seq(idCol), "left")
      .join(flag(landed, "__f6__"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__f0__").isNull, "quality")
          .when(col("__f0a__").isNull, "lang")
          .when(col("__f0b__").isNull, "lm_quality")
          .when(col("__f1__").isNull, "clf_quality")
          .when(col("__f2__").isNull, "exact_in_shard")
          .when(col("__f3__").isNull, "exact_vs_corpus")
          .when(col("__f4__").isNull, "contaminated")
          .when(col("__f5__").isNull, "near_in_shard")
          .when(col("__f6__").isNull, "near_vs_corpus")
          .otherwise("landed").as("fate"))
  }

  /** [[ingestShardFrame]] plus the LANDING: the survivors land as
    * parquet in a per-shard `shard_label=<label>` partition directory
    * at `outPath` (readers of the corpus root see a `shard_label`
    * partition column — per-shard lineage for free) and a per-shard
    * `_graft_shard_<label>.json` manifest (underscore-prefixed: corpus
    * readers ignore it) records input and landed row counts. Owns the
    * cache lifecycle ([[buildAndWrite]] posture). `shardLabel` names
    * the manifest AND the landing directory — use the ingest date /
    * batch id, unique per shard. Returns Map("input" → …,
    * "landed" → …); for per-doc drop attribution run [[ingestAudit]] —
    * CollectMetrics cannot surface through the landing's file write,
    * so the manifest stays counts-only.
    *
    * CRASH-REPLAY CONTRACT (the [[ingestEmbeddingShard]] discipline):
    * the manifest is written LAST, so a replay with the same label
    * returns the recorded counts in O(1); the per-shard landing
    * directory overwrites in place, never duplicates; and docs whose
    * index append committed but which never landed (present BY ID in
    * the `<name>_keys` boundary, absent from the landing) are
    * RECOVERED — re-redacted and landed without re-gating (they
    * already passed; a same-content-different-id doc is NOT in the
    * keys table by id, so genuine duplicates still drop). One landing
    * dir per index, as on the embedding side. Pre-keys-table indexes
    * (r8-era) have no id boundary — no recovery there, only the
    * manifest guard. `admission` (optional): a
    * [[graft.operators.Checks]] expectation set the RAW shard must
    * satisfy before anything is touched — a violating shard refuses
    * loudly (nothing appended, nothing landed, no manifest).
    * `lexical` (optional): the (name, path) of a
    * [[Lexical.writeLexicalIndex]] build to grow in lockstep — the
    * landed payload becomes keyword-searchable the same day. */
  def ingestShard(shard: DataFrame, bench: DataFrame,
                  idCol: String, textCol: String,
                  indexName: String, indexPath: String,
                  outPath: String, shardLabel: String,
                  minTokens: Int = 3,
                  nearDupThreshold: Double = 0.5,
                  decontamK: Int = 5,
                  redactPii: Boolean = true,
                  shingleK: Int = 3, numHashes: Int = 16,
                  bands: Int = 4, buckets: Int = 8,
                  admission: Seq[graft.operators.Checks.Constraint] = Nil,
                  lexical: Option[(String, String)] = None,
                  lmFilter: Option[LmFilter] = None,
                  classifierFilter: Option[ClassifierFilter] = None,
                  gramScrub: Option[GramScrub] = None,
                  langFilter: Option[LangFilter] = None): Map[String, Long] = {
    val spark = shard.sparkSession
    readShardManifest(spark, outPath, shardLabel) match {
      case Some(counts) => return counts // fully processed — O(1) replay
      case None => ()
    }
    // Eager checkpoint of the INPUT: one scan of the shard end-to-end
    // (r9 verdict: the manifest's dedicated `shard.count()` was a
    // second action over the input — and the chain's internal actions
    // were each re-scanning the shard parquet anyway). Every stage now
    // reads executor-local blocks, and the input count is a block
    // count, not a rescan. A CollectMetrics tap cannot do this job:
    // the shard subtree is multiply-referenced downstream
    // (decontaminate reads its input twice), so an observe at the
    // entry double-counts (the r8 boilerplate-tap lesson). Shard-sized
    // by definition of the daily batch; blocks free on GC — the
    // ingestAudit posture.
    val cp = shard.localCheckpoint(true)
    // admission control BEFORE any state is touched: a shard violating
    // its contract (a broken scraper day) refuses loudly instead of
    // polluting the index with its keys and landing a sliver
    if (admission.nonEmpty) graft.operators.Checks.requireAll(cp, admission)
    // The suspect snapshot MUST be taken BEFORE the gate runs: the gate
    // itself appends the survivors' keys, so a post-gate read of the
    // boundary would classify every fresh survivor as a crashed append
    // and land it twice. Eager (localCheckpoint) pins the pre-append
    // state. Suspects: shard ids already in the keys boundary — either
    // a crashed run's committed appends (recover) or, if also landed, a
    // fully-processed older submission (skip). Bounded by |shard|; the
    // landing id scan runs only when suspects exist, so a steady-state
    // day pays nothing here.
    val keysTable = s"${indexName}_keys"
    // the shared id-guard (KeyBlooms.presentIds): with an id sidecar
    // (Dedup.buildIdBlooms) a steady-state day never reads the keys
    // table here; only bloom-positive (replayed) ids pay the semi-join
    val suspects: Option[DataFrame] =
      if (!spark.catalog.tableExists(keysTable)) None
      else Some(KeyBlooms.presentIds(cp.select(col(idCol)), idCol,
          spark.table(keysTable).select(col("id").as(idCol)), indexPath)
        .localCheckpoint(true))
    // optional span-level ExactSubstr scrub against the gram ledger,
    // BEFORE the gate so quality/dedup/keys all see the scrubbed text
    // (the batch chain's stage-0c position). Own label excluded — a
    // replay whose gram append committed must scrub identically.
    // Checkpointed: the gate multiply-references its input, and the
    // scrub's ledger join must not re-run per reference.
    val gated = gramScrub.fold(cp)(g =>
      Dedup.scrubSpansAgainstIndex(cp, idCol, textCol, g.name, g.path,
          g.minCount, g.minSpanTokens, excludeLabel = Some(shardLabel))
        .drop("tokens_removed").localCheckpoint(true))
    val survivors = ingestShardFrame(gated, bench, idCol, textCol,
      indexName, indexPath, minTokens, nearDupThreshold, decontamK,
      redactPii, shingleK, numHashes, bands, buckets, lmFilter,
      classifierFilter, langFilter)
    try {
      val recovered: DataFrame = suspects match {
        case None => cp.limit(0)
        case Some(suspects) =>
          if (suspects.isEmpty) cp.limit(0)
          else {
            val landedIds = landedUnderOtherLabels(spark, outPath, idCol,
              shardLabel, cp)
            val unlanded = suspects.join(
              landedIds.join(broadcast(suspects), Seq(idCol), "left_semi"),
              Seq(idCol), "left_anti")
            // recovered payloads come from the SCRUBBED view: their
            // crashed run gated scrubbed text (deterministic on replay
            // — own label excluded), so landing the raw text would
            // resurrect the cut spans
            gated.join(unlanded, Seq(idCol), "left_semi")
          }
        }
      // recovered docs bypassed the gate, so re-apply what the gate
      // would have done to their PAYLOAD (redaction); quality/dedup
      // re-checks are unnecessary — they passed before the crash
      val recoveredRed =
        if (redactPii) recovered.withColumn(textCol,
          TextStats.redactPii(col(textCol)))
        else recovered
      val toLand = survivors.drop("__ck__").unionByName(recoveredRed)
        .localCheckpoint(true)
      // lexical lockstep (opt-in, (name, path) of a writeLexicalIndex
      // build): the landed payload grows the BM25 postings index too.
      // BEFORE the landing write, so both crash directions replay
      // clean: crash after this append → the replay's recovery set
      // re-submits the same docs and appendToLexicalIndex drops them
      // as present; crash before it → the replayed recovery set
      // carries them here. The append's own boundary-first order
      // covers its internal window.
      lexical.foreach { case (ln, lp) =>
        Lexical.appendToLexicalIndex(toLand, idCol, textCol, ln, lp)
      }
      // gram-ledger lockstep (opt-in): the LANDED text's gram mass
      // becomes visible to the next shard's scrub. Same before-landing
      // position and crash reasoning as the lexical append — the
      // label-idempotent ledger covers its own replay window.
      gramScrub.foreach(g => Dedup.appendShardGrams(toLand, idCol,
        textCol, g.name, g.path, shardLabel))
      toLand.write.mode("overwrite")
        .parquet(s"$outPath/shard_label=$shardLabel")
      val landed = toLand.count() // checkpointed — no re-run
      writeShardManifest(shard, cp.count(), landed, outPath, shardLabel)
    } finally survivors.unpersist()
  }

  /** Re-admit an operator-reviewed QUARANTINED micro-batch — the
    * return path of [[graft.streaming.Streams.admissionStream]], which
    * parks a contract-violating batch under
    * `quarantinePath/batch_id=N` and keeps streaming: after review the
    * operator requeues the batch through the BATCH gate
    * ([[ingestShard]]) under a shard label, with the admission
    * contract RE-CHECKED (pass the corrected expectation set, or the
    * original one if the data was fixed upstream and re-parked — an
    * admission failure here refuses loudly and leaves the batch
    * requeueable). On success the batch is marked `_ADMITTED` (audit
    * trail kept, never deleted; the marker records the landing label)
    * and a second requeue of the same batch refuses loudly — a
    * quarantined batch lands at most once. */
  def ingestQuarantined(spark: org.apache.spark.sql.SparkSession,
                        quarantinePath: String, batchId: Long,
                        bench: DataFrame, idCol: String, textCol: String,
                        indexName: String, indexPath: String,
                        outPath: String, shardLabel: String,
                        admission: Seq[graft.operators.Checks.Constraint] = Nil,
                        minTokens: Int = 3,
                        nearDupThreshold: Double = 0.5,
                        decontamK: Int = 5,
                        redactPii: Boolean = true): Map[String, Long] = {
    val dir = s"$quarantinePath/batch_id=$batchId"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/rows")),
      s"no quarantined batch at $dir/rows — nothing to requeue")
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_ADMITTED")
    require(!fs.exists(marker),
      s"batch $batchId was already admitted (see $marker) — a " +
        "quarantined batch lands at most once")
    val batch = spark.read.parquet(s"$dir/rows")
    val counts = ingestShard(batch, bench, idCol, textCol, indexName,
      indexPath, outPath, shardLabel, minTokens, nearDupThreshold,
      decontamK, redactPii, admission = admission)
    val os = fs.create(marker, true)
    try os.write(
      (s"""{"shard_label":"$shardLabel","landed":${counts("landed")}}""" +
        "\n").getBytes("UTF-8"))
    finally os.close()
    counts
  }

  /** Per-vector FATE audit of the embedding ingest gate — the vector
    * analog of [[ingestAudit]] (r10 verdict: a corpus owner tuning the
    * cosine threshold had no per-vector attribution and had to diff
    * landed parquet by hand): the same stage chain as
    * [[ingestEmbeddingShard]], but a DRY RUN — the vecs table, IVF
    * index, int8 copy and landing are only read, never written — that
    * classifies EVERY input vector by the FIRST stage that dropped it:
    * 'already_present' (id already in the vecs boundary),
    * 'near_in_shard' (semantic dup of a smaller-id shard vector),
    * 'near_vs_corpus' (cosine ≥ threshold against an indexed corpus
    * vector) — or 'landed'. Stage boundaries are eagerly
    * localCheckpointed (shard-sized) so the membership joins replay
    * nothing; blocks free on GC. `dim`/`planes` must match the index
    * build (geometry-stamp-validated by the vs-corpus probe). */
  def ingestEmbeddingAudit(shard: DataFrame, idCol: String, vecCol: String,
                           dim: Int, threshold: Double,
                           indexName: String,
                           planes: Int = 8): DataFrame = {
    val spark = shard.sparkSession
    val cp = shard.localCheckpoint(true)
    val present = spark.table(s"${indexName}_vecs").select(col("id"))
      .join(broadcast(cp.select(col(idCol).as("id"))), Seq("id"),
        "left_semi")
      .select(col("id").as(idCol))
    val fresh = cp.join(present, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val internal = Dedup.dropEmbeddingNearDuplicates(fresh, idCol, fresh,
      idCol, vecCol, dim, threshold, planes = planes).localCheckpoint(true)
    val landed = internal.join(
      Dedup.embeddingNearDupPairsAgainstIndex(internal, idCol, vecCol,
          indexName, dim, threshold, planes)
        .select(col("id_b").as(idCol)).distinct(),
      Seq(idCol), "left_anti").localCheckpoint(true)
    def flag(df: DataFrame, name: String): DataFrame =
      df.select(col(idCol)).withColumn(name, lit(true))
    cp.select(col(idCol))
      .join(flag(fresh, "__f1__"), Seq(idCol), "left")
      .join(flag(internal, "__f2__"), Seq(idCol), "left")
      .join(flag(landed, "__f3__"), Seq(idCol), "left")
      .select(col(idCol),
        when(col("__f1__").isNull, "already_present")
          .when(col("__f2__").isNull, "near_in_shard")
          .when(col("__f3__").isNull, "near_vs_corpus")
          .otherwise("landed").as("fate"))
  }

  /** The O(1) full-replay guard both ingest variants share: the
    * per-shard manifest is the LAST sink, so its existence proves every
    * sink committed for this label. */
  /** RETRACT documents EVERYWHERE a text daily ingest put them —
    * takedown requests, post-hoc contamination discoveries,
    * right-to-be-forgotten: the near-dup index tables (bands, shingles,
    * keys — each an online generation-flip rewrite, see
    * [[Dedup.retractFromTextIndex]]) and the landing parquet (only the
    * shard_label partitions that actually hold retracted ids rewrite;
    * the rest of the corpus is untouched and readable throughout).
    * Returns removed-row counts per sink. Boundary semantics: the keys
    * row goes too, so a same-content future submission lands again —
    * the point of a takedown. Per-shard manifests keep their historical
    * counts (they are per-ingest records, not live inventory). The
    * rewrites are O(index)/O(affected partitions) — batch requests
    * rather than retracting one id at a time. */
  def retractDocuments(spark: org.apache.spark.sql.SparkSession,
                       ids: DataFrame, idCol: String,
                       indexName: String, outPath: String,
                       lexical: Option[String] = None): Map[String, Long] = {
    val idx = Dedup.retractFromTextIndex(spark, indexName, ids, idCol)
    val landing = retractFromLanding(spark, outPath, ids, idCol)
    // the lexical index (when the ingest grew one) drops the ids too —
    // a takedown that left a doc findable by keyword search would not
    // be a takedown
    val lex = lexical.fold(Map.empty[String, (Long, Long)])(ln =>
      Lexical.retractFromLexicalIndex(spark, ln, ids, idCol))
    idx.map { case (t, (before, after)) => t -> (before - after) } ++
      lex.map { case (t, (before, after)) => t -> (before - after) } +
      ("landing" -> landing)
  }

  /** RETROACTIVE benchmark sweep — the full takedown loop for the
    * "new benchmark arrives AFTER the corpus landed" event, composed:
    *
    *  1. the standing landed corpus (the `outPath` text store) is
    *     screened through [[Lexical.contaminationReportIndexed]] — the
    *     champion-term route reads corpus TEXT only for candidate docs
    *     (postings-pruned), never scans the landing in full;
    *  2. every hit retracts from every sink via [[retractDocuments]]
    *     (near-dup index tables, affected landing partitions, and the
    *     lexical index itself).
    *
    * The report pins (doc_id, n_overlap) BEFORE the retraction rewrites
    * the landing it was computed from (eager localCheckpoint — a lazy
    * plan would re-read the already-swept store and return nothing).
    * Returns the materialized report plus the per-sink removed counts.
    * A sweep is idempotent: re-running with the same benchmark finds
    * zero hits (they are gone) and rewrites nothing. */
  def sweepBenchmark(spark: org.apache.spark.sql.SparkSession,
                     bench: DataFrame, idCol: String, textCol: String,
                     indexName: String, outPath: String,
                     lexicalName: String, lexicalPath: String,
                     k: Int = 5): (DataFrame, Map[String, Long]) = {
    val landed = spark.read.parquet(outPath)
    val report = Lexical.contaminationReportIndexed(
      landed.select(col(idCol), col(textCol)), bench, idCol, textCol,
      lexicalName, lexicalPath, k).localCheckpoint(true)
    val removed =
      if (report.isEmpty) Map.empty[String, Long]
      else retractDocuments(spark, report.select(idCol), idCol,
        indexName, outPath, lexical = Some(lexicalName))
    (report, removed)
  }

  /** The embedding-side analog of [[retractDocuments]]: the vecs index,
    * the IVF search index, the int8 serving corpus, the PQ serving
    * corpus and the landing all drop the retracted ids (each through
    * its family's online generation-flip rewrite). */
  def retractEmbeddings(spark: org.apache.spark.sql.SparkSession,
                        ids: DataFrame, idCol: String,
                        indexName: String, outPath: String,
                        ivfPath: Option[String] = None,
                        quantizedPath: Option[String] = None,
                        pqPath: Option[String] = None): Map[String, Long] = {
    val (vb, va) = Dedup.retractFromEmbeddingIndex(spark, indexName, ids, idCol)
    val ivf = ivfPath.map { p =>
      val (b, a) = Ivf.retractFromIndex(spark, p, ids, idCol); b - a
    }
    val quant = quantizedPath.map { p =>
      val (b, a) = Similarity.retractFromQuantizedCorpus(spark, p, ids, idCol)
      b - a
    }
    val pq = pqPath.map { p =>
      val (b, a) = Pq.retractFromPqCorpus(spark, p, ids, idCol); b - a
    }
    val landing = retractFromLanding(spark, outPath, ids, idCol)
    Map(s"${indexName}_vecs" -> (vb - va), "landing" -> landing) ++
      ivf.map("ivf" -> _) ++ quant.map("quantized" -> _) ++
      pq.map("pq" -> _)
  }

  /** SEMANTIC benchmark sweep — the embedding-side sibling of
    * [[sweepBenchmark]] for the "benchmark released AFTER the corpus
    * landed" event when the leak is paraphrase-shaped: the LANDED
    * embedding corpus is screened EXACTLY against the benchmark's
    * vectors ([[Dedup.semanticContaminationReport]] — one corpus scan,
    * broadcast bench, no lossy candidate route: a decontamination miss
    * is a silent eval leak), and every hit retracts from EVERY serving
    * sink through [[retractEmbeddings]] (vecs index, IVF, int8, PQ,
    * landing — each via its family's online rewrite). The report pins
    * BEFORE the rewrite (localCheckpoint — a lazy plan would re-read
    * the swept landing and report nothing); a re-sweep of the same
    * benchmark is a no-op. Returns (report, per-sink removed). */
  def sweepBenchmarkSemantic(spark: org.apache.spark.sql.SparkSession,
                             bench: DataFrame, benchIdCol: String,
                             benchVecCol: String,
                             idCol: String, vecCol: String,
                             indexName: String, outPath: String,
                             threshold: Double,
                             ivfPath: Option[String] = None,
                             quantizedPath: Option[String] = None,
                             pqPath: Option[String] = None,
                             maxBench: Int = 200000): (DataFrame, Map[String, Long]) = {
    val landed = spark.read.parquet(outPath)
    val report = Dedup.semanticContaminationReport(
      landed.select(col(idCol), col(vecCol)), idCol, vecCol,
      bench, benchIdCol, benchVecCol, threshold, maxBench)
      .localCheckpoint(true)
    val removed =
      if (report.isEmpty) Map.empty[String, Long]
      else retractEmbeddings(spark, report.select(idCol).distinct(), idCol,
        indexName, outPath, ivfPath, quantizedPath, pqPath)
    (report, removed)
  }

  /** Rewrite only the landing partitions that hold retracted ids: the
    * surviving rows of each affected shard_label partition are eagerly
    * materialized (localCheckpoint — the rewrite overwrites the very
    * files the plan reads) and written back per partition, so the rest
    * of the corpus stays untouched and readable throughout. A
    * pre-partition-era flat landing rewrites wholesale. Returns removed
    * rows. */
  private def retractFromLanding(spark: org.apache.spark.sql.SparkSession,
                                 outPath: String, ids: DataFrame,
                                 idCol: String): Long = {
    val landed =
      try spark.read.parquet(outPath)
      catch { case _: org.apache.spark.sql.AnalysisException => return 0L }
    val key = broadcast(ids.select(col(idCol)).distinct())
    if (!landed.columns.contains("shard_label")) {
      val keep = landed.join(key, Seq(idCol), "left_anti")
        .localCheckpoint(true)
      val removed = landed.count() - keep.count()
      if (removed > 0L)
        keep.write.mode("overwrite").parquet(outPath)
      removed
    } else {
      val affectedLabels = landed.join(key, Seq(idCol), "left_semi")
        .select("shard_label").distinct()
        .collect().map(_.getString(0)) // bounded: shards holding retracted ids
      if (affectedLabels.isEmpty) return 0L
      val affected = landed.filter(col("shard_label").isin(affectedLabels: _*))
      val keep = affected.join(key, Seq(idCol), "left_anti")
        .localCheckpoint(true)
      val removed = affected.count() - keep.count()
      for (l <- affectedLabels)
        keep.filter(col("shard_label") === l).drop("shard_label")
          .write.mode("overwrite").parquet(s"$outPath/shard_label=$l")
      removed
    }
  }

  /** Ids already landed under a DIFFERENT shard label — the suspect-
    * exclusion set of the crash-replay recovery. The CURRENT label's
    * partition must NOT count as landed: a crash in the landing→manifest
    * window leaves this very shard's partition on disk, and since the
    * replay OVERWRITES that partition, anything already in it is about
    * to be deleted — excluding those ids from recovery would turn the
    * replay into silent data loss (the replayed run would overwrite the
    * landed partition with the empty difference and record landed=0 as
    * success). Same-id docs under OTHER labels are genuine older
    * submissions and still skip. Pre-partitioned (flat, pre-r11)
    * landings carry no shard_label column — all their rows are other
    * submissions by construction. */
  private def landedUnderOtherLabels(
      spark: org.apache.spark.sql.SparkSession, outPath: String,
      idCol: String, shardLabel: String,
      empty: DataFrame): DataFrame =
    try {
      val landed = spark.read.parquet(outPath)
      (if (landed.columns.contains("shard_label"))
        landed.filter(col("shard_label") =!= shardLabel)
      else landed).select(col(idCol))
    } catch { case _: org.apache.spark.sql.AnalysisException =>
      empty.select(col(idCol)).limit(0)
    }

  /** Per-shard manifests delegate to the generic JSON pair — ONE
    * reader/writer implementation for every manifest in the family
    * (format drift between two copies was a live risk; r13 review). */
  private def readShardManifest(spark: org.apache.spark.sql.SparkSession,
                                outPath: String,
                                shardLabel: String): Option[Map[String, Long]] =
    readJsonManifest(spark, outPath, s"_graft_shard_$shardLabel.json")

  /** Shared landing manifest for the two ingest variants. `input` is a
    * checkpoint-block count, never a rescan of the shard source. */
  private def writeShardManifest(shard: DataFrame, input: Long,
                                 landed: Long, outPath: String,
                                 shardLabel: String): Map[String, Long] = {
    val counts = Map("input" -> input, "landed" -> landed)
    writeJsonManifest(shard.sparkSession, counts, outPath,
      s"_graft_shard_$shardLabel.json")
    counts
  }

  /** Incremental daily ingest for the EMBEDDING side — the vector
    * analog of [[ingestShard]], composed end-to-end: the shape a corpus
    * owner runs per arriving batch of vectors, where the standing
    * corpus is touched ONLY through its pre-bucketed embedding index
    * ([[Dedup.writeEmbeddingIndex]]) and the IVF search index's saved
    * centroids — never re-scanned or re-shuffled (plan-asserted in
    * spec):
    *
    *   1. in-shard semantic dedup (bucketed cosine candidates,
    *      min-label components, smallest id survives)
    *   2. semantic dedup vs the corpus boundary
    *      ([[Dedup.embeddingNearDupPairsAgainstIndex]]: bucketed vecs
    *      table, corpus side zero-exchange)
    *   3. append the survivors' bucket rows to the embedding index and
    *      the vectors to the IVF search index ([[Ivf.appendToIndex]] —
    *      replay-safe, assigns against the SAVED centroids)
    *   4. land the survivors as parquet + a per-shard JSON manifest
    *
    * Exact duplicates need no separate stage: an identical vector is
    * cosine 1.0 and falls to stage 1/2 at any threshold < 1. Only the
    * shard ever shuffles — the daily cost is O(|shard|) regardless of
    * corpus size. `ivfPath = None` skips the search-index growth (an
    * index-less corpus still dedups). Returns Map("input" → …,
    * "landed" → …); the input is eagerly checkpointed — ONE scan of the
    * shard source end-to-end, the input count a block count
    * ([[ingestShard]] posture).
    *
    * CRASH-REPLAY CONTRACT (r10 advice: the vecs-index append commits
    * first, so a crash before the later sinks used to strand the shard
    * — replayed ids all read as 'present' and the shard went missing
    * from IVF/int8/landing with landed=0 reported as success):
    *
    *  - The per-shard manifest is written LAST, so its existence proves
    *    every sink committed: a replay with the same `shardLabel`
    *    returns the recorded counts in O(1) without touching any sink.
    *  - The landing and the int8 copy write into per-shard
    *    `shard_label=<label>` partition directories with overwrite —
    *    re-landing rewrites in place, never duplicates.
    *  - Ids whose vecs append committed but which never LANDED (the
    *    crashed run's survivors) are detected — present in the vecs
    *    table, absent from the landing — and RECOVERED: they skip the
    *    dedup gate (they already passed it) and flow to the IVF
    *    (boundary-guarded), int8 and landing sinks.
    *
    * One landing dir per index: the recovery check reads THIS
    * `outPath`, so splitting one index's shards across landing dirs
    * would mis-classify older landings as crashed appends. */
  /** The shared MEDIA daily-ingest composition (image / audio / opaque
    * payloads): admission control, the perceptual gate + index append
    * ([[Dedup.appendImageShardToIndex]] family — the codec runs once),
    * the parquet landing under `shard_label=<label>`, and the per-shard
    * manifest written LAST.
    *
    * CRASH-REPLAY CONTRACT (the [[ingestEmbeddingShard]] discipline,
    * simplified by the gate being its own replay guard): a manifest
    * present returns the recorded counts in O(1). Without it, a
    * re-arriving shard whose index append COMMITTED re-matches its own
    * landed signatures at Hamming 0 and drops at the gate — so ids
    * present in the index but absent from the landing are the crashed
    * run's committed-but-unlanded survivors, detected (one id-column
    * scan of the index, suspects bounded by |shard|; the landing is
    * only read when suspects exist) and RECOVERED to the landing.
    * Undecodable arrivals pass the gate unindexed and land (triage owns
    * them; a replay without a manifest re-lands them — the overwrite
    * partition makes that idempotent). One landing dir per index: the
    * recovery check reads THIS `outPath`, and a corpus bootstrapped
    * into the index without landing there reads as crashed-unlanded —
    * land the bootstrap corpus, or accept that a same-id resubmission
    * re-lands once. */
  private def ingestMediaShard(shard: DataFrame, idCol: String,
                               append: DataFrame => DataFrame,
                               indexTable: String, indexPath: String,
                               outPath: String, shardLabel: String,
                               admission: Seq[graft.operators.Checks.Constraint])
      : Map[String, Long] = {
    val spark = shard.sparkSession
    readShardManifest(spark, outPath, shardLabel) match {
      case Some(counts) => return counts // fully processed — O(1) replay
      case None => ()
    }
    val cp = shard.localCheckpoint(true)
    if (admission.nonEmpty) graft.operators.Checks.requireAll(cp, admission)
    // suspects snapshot BEFORE the append (after it, every fresh
    // survivor's id is in the index and would read as crashed). The
    // shared id-guard broadcasts the SHARD ids over the index's id
    // column (never the index over the shard — the index is the
    // 100 TB side), and picks up an `idblooms` sidecar at the index
    // path if one exists so a steady-state day skips the id scan.
    val suspects = KeyBlooms.presentIds(cp.select(col(idCol)), idCol,
        spark.table(indexTable).select(col("id").as(idCol)), indexPath)
      .distinct()
      .localCheckpoint(true)
    val survivors = append(cp)
    val recovered: DataFrame =
      if (suspects.isEmpty) cp.limit(0)
      else {
        val landedIds = landedUnderOtherLabels(spark, outPath, idCol,
          shardLabel, cp)
        val unlanded = suspects.join(
          landedIds.join(broadcast(suspects), Seq(idCol), "left_semi"),
          Seq(idCol), "left_anti")
        cp.join(unlanded, Seq(idCol), "left_semi")
      }
    val toLand = survivors.unionByName(recovered).localCheckpoint(true)
    toLand.write.mode("overwrite")
      .parquet(s"$outPath/shard_label=$shardLabel")
    writeShardManifest(cp, cp.count(), toLand.count(), outPath,
      shardLabel)
  }

  /** Daily IMAGE ingest, composed end-to-end over the persisted dHash
    * index ([[Dedup.writeDhashIndex]]): gate, append, landing,
    * manifest — see [[ingestMediaShard]] for the contract. Returns
    * Map("input" → …, "landed" → …). */
  def ingestImageShard(shard: DataFrame, idCol: String,
                       payloadCol: String, indexName: String,
                       indexPath: String, outPath: String,
                       shardLabel: String, hammingK: Int = 3,
                       buckets: Int = 8,
                       admission: Seq[graft.operators.Checks.Constraint] = Nil)
      : Map[String, Long] =
    ingestMediaShard(shard, idCol,
      Dedup.appendImageShardToIndex(_, idCol, payloadCol, indexName,
        indexPath, hammingK, buckets),
      s"${indexName}_dhash", indexPath, outPath, shardLabel, admission)

  /** [[ingestImageShard]] for the audio envelope index. */
  def ingestAudioShard(shard: DataFrame, idCol: String,
                       payloadCol: String, indexName: String,
                       indexPath: String, outPath: String,
                       shardLabel: String, hammingK: Int = 3,
                       buckets: Int = 8,
                       admission: Seq[graft.operators.Checks.Constraint] = Nil)
      : Map[String, Long] =
    ingestMediaShard(shard, idCol,
      Dedup.appendAudioShardToIndex(_, idCol, payloadCol, indexName,
        indexPath, hammingK, buckets),
      s"${indexName}_ehash", indexPath, outPath, shardLabel, admission)

  /** [[ingestImageShard]] for the opaque-payload byte-envelope index. */
  def ingestPayloadShard(shard: DataFrame, idCol: String,
                         payloadCol: String, indexName: String,
                         indexPath: String, outPath: String,
                         shardLabel: String, hammingK: Int = 3,
                         buckets: Int = 8,
                         admission: Seq[graft.operators.Checks.Constraint] = Nil)
      : Map[String, Long] =
    ingestMediaShard(shard, idCol,
      Dedup.appendPayloadShardToIndex(_, idCol, payloadCol, indexName,
        indexPath, hammingK, buckets),
      s"${indexName}_bhash", indexPath, outPath, shardLabel, admission)

  def ingestEmbeddingShard(shard: DataFrame, idCol: String, vecCol: String,
                           dim: Int, threshold: Double,
                           indexName: String, indexPath: String,
                           outPath: String, shardLabel: String,
                           ivfPath: Option[String] = None,
                           quantizedPath: Option[String] = None,
                           pqPath: Option[String] = None,
                           planes: Int = 8,
                           buckets: Int = 8,
                           admission: Seq[graft.operators.Checks.Constraint] = Nil): Map[String, Long] = {
    val spark = shard.sparkSession
    readShardManifest(spark, outPath, shardLabel) match {
      case Some(counts) => return counts // fully processed — O(1) replay
      case None => ()
    }
    val cp = shard.localCheckpoint(true)
    // admission control BEFORE any state is touched (the ingestShard
    // contract): a malformed embedding feed — wrong dims, NaN vectors —
    // refuses loudly instead of growing five sinks with a sliver
    if (admission.nonEmpty) graft.operators.Checks.requireAll(cp, admission)
    // Partial-replay recovery, snapshot taken BEFORE the gate (the gate
    // appends survivors to the vecs table — a post-gate read would
    // classify every fresh survivor as a crashed append and land it
    // twice): shard ids present in the vecs table (stage-0 drops them
    // from `survivors`) but absent from the landing are the crashed
    // run's committed-but-unlanded survivors. `suspects` is bounded by
    // |shard| (broadcast semi over the bucketed vecs table's id column
    // — no corpus exchange); the landing id scan only runs when
    // suspects exist at all, so the steady-state day pays nothing here.
    // the shared id-guard (KeyBlooms.presentIds): with an id sidecar
    // (Dedup.buildEmbedIdBlooms) a steady-state day skips the vecs
    // id-column scan entirely
    val suspects = KeyBlooms.presentIds(cp.select(col(idCol)), idCol,
        spark.table(s"${indexName}_vecs").select(col("id").as(idCol)),
        indexPath)
      .localCheckpoint(true)
    val survivors = Dedup.appendEmbeddingShardToIndex(cp, idCol,
      vecCol, dim, threshold, indexName, indexPath, planes, buckets,
      // the suspects snapshot IS stage-0's present set — hand it over
      // so the day pays ONE corpus id-column scan, not two
      presentIds = Some(suspects))
    try {
      val recovered: DataFrame =
        if (suspects.isEmpty) cp.limit(0)
        else {
          val landedIds = landedUnderOtherLabels(spark, outPath, idCol,
            shardLabel, cp)
          val unlanded = suspects.join(
            landedIds.join(broadcast(suspects), Seq(idCol), "left_semi"),
            Seq(idCol), "left_anti")
          cp.join(unlanded, Seq(idCol), "left_semi")
        }
      val toLand = survivors.unionByName(recovered).localCheckpoint(true)
      // r17 (guide §2.6): the IVF, int8 and PQ serving copies are
      // mutually independent sinks over the pinned `toLand` checkpoint —
      // each carries its own replay-safe id guard, writes its own
      // directory, and none reads another's output — so they run from a
      // small pool instead of back to back. The landing write stays
      // AFTER the pool joins and the manifest stays last (the
      // crash-replay contract); a crash mid-pool leaves any subset of
      // sinks committed, each of which replays to a no-op exactly as a
      // crash between two sequential sinks always did.
      //  - IVF: appendToIndex keeps cell routing in lockstep
      //  - int8: the survivors append in quantized form WITH their LSH
      //    bucket (same dim/planes as the dedup geometry), so batched
      //    retrieval (annTopKQuantizedIndexedBatch) never lags the daily
      //    growth and never re-reads floats at query time
      //  - PQ: appendToPqCorpus, same id-guarded replay posture
      Concur.runAll(Seq(
        ivfPath.map(p => () => Ivf.appendToIndex(toLand, idCol, vecCol, p)),
        quantizedPath.map(p => () =>
          Similarity.writeQuantizedCorpus(toLand, idCol, vecCol, p,
            bucketDim = Some(dim), planes = planes,
            shardLabel = Some(shardLabel))),
        pqPath.map(p => () => Pq.appendToPqCorpus(toLand, idCol, vecCol, p))
      ).flatten)
      toLand.write.mode("overwrite")
        .parquet(s"$outPath/shard_label=$shardLabel")
      val landed = toLand.count() // checkpointed — no re-run
      writeShardManifest(shard, cp.count(), landed, outPath, shardLabel)
    } finally survivors.unpersist()
  }

  private def chain(docs: DataFrame, bench: DataFrame,
                    idCol: String, textCol: String,
                    minTokens: Int, nearDupThreshold: Double,
                    decontamK: Int, trainFrac: Double, valFrac: Double,
                    shuffleSeed: Long,
                    tap: (String, DataFrame) => DataFrame,
                    persistStages: Boolean = true,
                    boilerplateMaxDocFreq: Option[Int] = None,
                    embeddingDedup: Option[EmbeddingDedup] = None,
                    persisted: scala.collection.mutable.Buffer[DataFrame] =
                      scala.collection.mutable.Buffer.empty,
                    temperatureMix: Option[TemperatureMix] = None,
                    withShuffleIndex: Boolean = true,
                    lmFilter: Option[LmFilter] = None,
                    budgetMix: Option[BudgetMix] = None,
                    classifierFilter: Option[ClassifierFilter] = None,
                    spanScrub: Option[SpanScrub] = None,
                    importanceMix: Option[ImportanceMix] = None,
                    langFilter: Option[LangFilter] = None): DataFrame = {
    require(Seq(temperatureMix, budgetMix, importanceMix)
        .count(_.isDefined) <= 1,
      "one mixing stage per build: TemperatureMix, BudgetMix or " +
        "ImportanceMix, never two")
    def reused(d: DataFrame): DataFrame =
      if (persistStages) { persisted += d; d.persist(StorageLevel.MEMORY_AND_DISK) }
      else d
    // 0. optional corpus-level boilerplate strip (nav bars, cookie
    // banners) BEFORE hashing stages — removing shared lines first keeps
    // boilerplate from gluing unrelated docs into near-dup clusters.
    // The "input" tap lands on whichever frame the rest of the plan
    // consumes exactly ONCE: the boilerplate stage references the raw
    // docs twice (line strip + payload join-back), and a CollectMetrics
    // on a twice-referenced subtree executes twice and double-counts
    // (r8 ADVICE). The stage is row-preserving (empty-text docs survive
    // the left join back), so tapping after the join-back observes the
    // same row count as tapping the raw input.
    val stripped = boilerplateMaxDocFreq match {
      case None => tap("input", docs)
      case Some(maxDf) =>
        tap("input",
          TextStats.dropBoilerplateLines(docs, idCol, textCol, maxDf)
            .join(docs.drop(textCol), Seq(idCol))
            .select(docs.columns.map(col).toSeq: _*))
    }
    // 0c. optional span-level exact-substring scrub ([[SpanScrub]]):
    // row-preserving (its effect surfaces as the quality gate's drop —
    // emptied whole-doc duplicates fail minTokens), so it carries no
    // tap of its own; it references its input twice (gram/occurrence
    // side + the spans join-back), so the input persists while active
    // and the "input" observation gates on persistStages (the LmFilter
    // precedent).
    val scrubbed = spanScrub.fold(stripped) { sp =>
      val s0 = reused(stripped)
      Dedup.scrubDuplicateSpans(s0, idCol, textCol, sp.k, sp.minCount,
        sp.minSpanTokens).drop("tokens_removed")
    }
    // 1. quality gate: the Gopher-style keep predicate is all per-row
    // expressions (TopGramFrac is native), so this is a plain filter
    // fused into the input scan — no explode, no join-back
    val kept = tap("quality",
      TextStats.qualityFilter(scrubbed, textCol, minTokens = minTokens))
    // 1a. optional LANGUAGE gate ([[LangFilter]]): the lang-ID scores
    // read the quality output twice (score side + semi-join back), so
    // it becomes a persisted boundary while the stage is active — the
    // 1b/1c discipline.
    val langed = langFilter.fold(kept) { f =>
      val q = reused(kept)
      tap("lang", Classifier.filterByLang(q, idCol, textCol, f.model,
        f.keep, f.alpha, f.keepUnpredicted))
    }
    // 1b. optional MODEL-BASED quality — the CCNet reference-LM
    // perplexity gate ([[NgramLm.filterByLm]]). The stage reads its
    // input twice (the scoring side and the semi-join's kept side), so
    // the rule-quality output becomes a persisted boundary while the
    // stage is active — which also makes the "quality" tap materialize
    // exactly once (the decontam-tap precedent; pretrainCorpusObserved
    // gates that tap on persistStages when this stage is on).
    val lmed = lmFilter.fold(langed) { f =>
      val q = reused(langed)
      tap("lm_quality", NgramLm.filterByLm(q, idCol, textCol, f.model,
        f.minLogprob, f.n, f.alpha, f.keepUnscorable))
    }
    // 1c. optional DISCRIMINATIVE quality — the GPT-3 curated-vs-crawl
    // classifier gate ([[Classifier.filterByClassifier]]). Same
    // twice-read shape as 1b (scoring side + semi-join kept side), so
    // its input becomes a persisted boundary while the stage is active.
    val classed = classifierFilter.fold(lmed) { f =>
      val q = reused(lmed)
      tap("clf_quality", Classifier.filterByClassifier(q, idCol, textCol,
        f.model, f.minLlrMean, f.alpha, f.keepUnscorable))
    }
    // 2. exact dedup (canonicalized md5, keep smallest id) — also a
    // reused boundary: near-dedup reads it twice (candidate-pair
    // construction and the anti-join's kept side)
    val exact = reused(tap("exact_dedup", Dedup.exact(classed, idCol, textCol)))
    // 3. near dedup: banded MinHash candidates, exact-Jaccard verify,
    //    min-label components, drop non-minimal members
    val near = reused(tap("near_dedup", Dedup.dropNearDuplicates(exact,
      idCol, textCol, nearDupThreshold)))
    // 3b. optional SEMANTIC dedup on embeddings — paraphrases the text
    // shingles can't see; only the surviving docs' vectors are bucketed
    // when active, this output becomes the doubly-read decontamination
    // input (anti-join left + shingle report), so IT is the boundary to
    // persist
    val deduped = embeddingDedup.fold(near)(e =>
      reused(e.centroids match {
        case Some(c) => Dedup.dropSemanticDuplicatesClustered(near, idCol,
          e.embeddings, e.embIdCol, e.vecCol, c, e.threshold,
          maxCellSize = e.maxCellSize)
        case None => Dedup.dropEmbeddingNearDuplicates(near, idCol,
          e.embeddings, e.embIdCol, e.vecCol, e.dim, e.threshold)
      }))
    // 4. decontaminate vs the benchmark shingle set. The tap sits INSIDE
    // the persisted boundary so the observe materializes exactly once
    // with the cache even though the output is read multiply downstream
    // (pretrainCorpusObserved only attaches this stage when
    // persistStages=true — see its scaladoc)
    val clean = reused(tap("decontam",
      Dedup.decontaminate(deduped, bench, idCol, textCol, decontamK)))
    // 4c. optional temperature-weighted domain mixing ([[TemperatureMix]]):
    // thresholds/factors derive from the CLEAN survivors' domain sizes
    // (a tiny domain-cardinality aggregate over the persisted decontam
    // boundary, broadcast back); the row decision is the blockwise
    // Knuth-hash compare (down) or the bounded epoch explode (up) — no
    // data-sized shuffle joins the composition either way
    val tmixed = temperatureMix.fold(clean) { tm =>
      val gf = graft.api.GraftFrame(clean)
      if (!tm.up)
        tm.weightCol.fold(
          gf.sampleByTemperature(idCol, tm.domainCol, tm.alpha))(w =>
          gf.sampleByTemperatureWeighted(idCol, tm.domainCol, w, tm.alpha))
          .df
      else
        tm.weightCol.fold(
          gf.upsampleByTemperature(idCol, tm.domainCol, tm.alpha,
            tm.maxRepeat))(w =>
          gf.upsampleByTemperatureWeighted(idCol, tm.domainCol, w,
            tm.alpha, tm.maxRepeat))
          .df
    }
    // 4d. optional explicit-recipe mixing ([[BudgetMix]]) — the same
    // slot, exclusive with 4c (required above): LAZY factors (the
    // recipe joins as a literal frame against the clean survivors'
    // mass aggregate), the bounded epoch explode, no data-sized shuffle
    val bmixed = budgetMix.fold(tmixed)(bm =>
      graft.api.GraftFrame(clean).sampleByBudget(idCol, bm.domainCol,
        bm.weightCol, bm.budgets, bm.maxRepeat).df)
    // 4e. optional per-row IMPORTANCE mixing ([[ImportanceMix]]) — the
    // same slot, exclusive with 4c/4d: one weight-sum aggregate + the
    // two-pass range cumsum (the shuffleIndex machinery the composition
    // already pays when withShuffleIndex) + a blockwise integer
    // multiplicity; output is exactly n copies with an epoch column
    val mixed = importanceMix.fold(bmixed)(im =>
      graft.api.GraftFrame(clean).sampleBySystematic(idCol, im.weightCol,
        im.n, im.seed).df)
    // 5+6. row-stable split and deterministic global shuffle position.
    // BOTH root taps (mix + output) sit ABOVE shuffle-index's two-pass
    // cumsum join — that join references its input subtree twice, so a
    // tap between the mixer and the shuffle would double-count
    // (measured: 2×). Split/shuffle only add columns, so the root count
    // IS the mixed-survivor count; with the decontam tap (persisted
    // runs) each stage's drop attributes cleanly: near_dedup → decontam
    // is decontamination's drop, decontam → temperature_mix is the
    // mixer's own. The windows landing skips shuffle-index
    // (withShuffleIndex=false): window assembly derives its OWN
    // positions from the identical Knuth-hash permutation, so computing
    // shuffle_pos there would pay the two-pass cumsum twice for a
    // column the chop never reads.
    // Up-mixing emits epoch COPIES: the split keys on the document id
    // (all copies of a doc share a split — no cross-split leakage), but
    // the shuffle position keys on the composite id·(maxRepeat+1)+epoch
    // so every copy holds its own deterministic position (distinct keys
    // are the shuffleIndex total-order contract).
    val split = graft.api.GraftFrame(mixed)
      .splitByHash(idCol, trainFrac, valFrac)
    // any epoch-emitting mix (temperature UP or a budget recipe) keys
    // the position on the composite id·(maxRepeat+1)+epoch
    val upArity: Option[Long] =
      temperatureMix.filter(_.up).map(_.maxRepeat + 1L)
        .orElse(budgetMix.map(_.maxRepeat + 1L))
        .orElse(importanceMix.map(_.n + 1L))
    val root = (upArity, withShuffleIndex) match {
      case (_, false) => split.df
      case (None, true) =>
        split.shuffleIndex(idCol, seed = shuffleSeed).df
      case (Some(arity), true) =>
        graft.api.GraftFrame(split.df.withColumn("__mixkey__",
            col(idCol).cast("long") * arity + col("epoch")))
          .shuffleIndex("__mixkey__", seed = shuffleSeed)
          .df.drop("__mixkey__")
    }
    tap("output",
      if (temperatureMix.isDefined) tap("temperature_mix", root)
      else if (budgetMix.isDefined) tap("budget_mix", root)
      else if (importanceMix.isDefined) tap("importance_mix", root)
      else root)
  }
}
