package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2 plus the LLM-pipeline layer, each with a DuckDB-equivalent
  * `oracleSql` (entries without one get the weaker rows-only check).
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - every oracle query ends in ORDER BY over a unique key set;
  *  - aggregates of doubles go through exact DECIMAL sums (order of
  *    partial aggregation must never change a bit) — see QHelp;
  *  - per-row double arithmetic stays double (IEEE-deterministic);
  *  - all text/embedding hashing is engine-agnostic integer arithmetic
  *    (TextHash), so the oracle recomputes minhash/LSH pipelines exactly.
  */
object SparkEntry {

  private lazy val registry = {
    val r = new QueryRegistry
    QueriesCore.register(r)
    QueriesAgg.register(r)
    QueriesTpch.register(r)
    QueriesJoins.register(r)
    QueriesWindow.register(r)
    QueriesText.register(r)
    QueriesEmbed.register(r)
    r.entries
  }

  /** Flagship query (TPC-H Q1 over the graft API) on sf0.001; the driver
    * smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    QueriesAgg.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.view.mapValues(_._1).toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (k, (_, Some(sql))) => k -> sql }.toMap

  /** Headline subset for the per-round bench (Bench.scala): the heavy
    * operators — scan+agg, join, sort, window, shuffle-heavy dedup/ANN —
    * not the long tail of cheap row-op checks. */
  val benchQueries: Seq[String] = Seq(
    "q_read_parquet", "q_assign_arith", "q_groupby_agg", "q_join_inner",
    "q_join_broadcast", "q_sort_multi", "q_rolling", "q_cumsum",
    "q_resample_agg", "q_asof_join", "q_text_stats", "q_dedup_exact",
    "q_minhash_pairs", "q_near_dedup", "q_embed_dedup", "q_cosine_topk",
    "q_ann_buckets",
    // shuffle-heavy tail tracked round-over-round (r2 advice #10)
    "q_global_cumsum", "q_set_index", "q_groupby_transform", "q_to_parquet",
    // composite TPC-H pipelines (pushdown showcase; join+agg+topk)
    "q_tpch_q6", "q_tpch_q3", "q_tpch_q5", "q_tpch_q4", "q_tpch_q12",
    "q_tpch_q14", "q_tpch_q10", "q_tpch_q18", "q_tpch_q19",
    // round-5 completion of the 22-query suite: the shuffle-heaviest of
    // the new twelve (correlated min; 8-table share ratio; per-order
    // distinct-count waiting test; two-level count distribution)
    "q_tpch_q2", "q_tpch_q8", "q_tpch_q21", "q_tpch_q13",
    // r5 pipeline ops: benchmark decontamination (two shingle passes +
    // hash join) and the pruned correlated-average Q17
    "q_decontaminate", "q_tpch_q17",
    // r6: real ImageIO codec round trip (mapPartitions batch shape) and
    // multi-probe ANN (9-bucket probe union)
    "q_multimodal_features", "q_ann_multiprobe",
    // r8: the production retrieval shape (20-query batch, one bucket
    // join), the by-less as-of (range-partitioned carry), and the
    // end-to-end corpus build (quality -> dedup×2 -> decontam -> split
    // -> shuffle as ONE composed plan)
    "q_ann_batch", "q_asof_global", "q_pipeline_e2e",
    // r10: THE production query shapes — the daily text-shard ingest
    // gate and its embedding-side analog — r11: benched in their
    // STEADY-STATE form (r10 verdict #3: the r10 entries rebuilt the
    // corpus index inside the timed region, so the headline was
    // fixture construction and could not detect a regression in the
    // gate's marginal cost; the steady variants restore a pristine
    // snapshot and time only shard → gate → append → landing)
    "q_ingest_gate_steady", "q_embed_ingest_steady",
    // r10: the int8 corpus-scan ranker (4x scan-bandwidth lever) and
    // its batched composite (LSH candidates + int8 verify — the
    // quantized production retrieval shape, directly comparable to
    // q_ann_batch in the same record)
    "q_ann_quantized", "q_ann_quantized_batch",
    // r11: the SERVING shape — batched retrieval over the persisted
    // bucketed int8 corpus: 4x byte cut on scan AND exchange, no float
    // read at query time (comparable to q_ann_quantized_batch, whose
    // corpus side still scans float32)
    "q_ann_quantized_indexed",
    // r11: the PQ serving shape — probe-cell resolve + partition-pruned
    // ADC over the 32x-compressed (id, codes, norm) layout; the corpus
    // builds once per JVM (benchPrepare), so samples time the search
    "q_ivfpq_topk",
    // r12: SimHash near-dup pairs at the fixed 64-bit/4-band geometry
    // (full documents table — tracks the band self-join at the
    // selective key space) and the context-window chunking layout op
    // (blockwise split + bounded explode)
    "q_simhash_pairs", "q_chunk_tokens",
    // r13: the training-window ASSEMBLY (two-pass cumsum + bounded
    // member explode + ONE shuffle keyed on window_id) — the last hop
    // of the corpus->training-files chain; declared bound ~linear in
    // corpus tokens (the window count scales with token mass, each
    // window's slice list is bounded by windowSize/stride + 2)
    "q_assemble_windows",
    // r13: the one-pass constraint suite — nine expectations compiled
    // into a single aggregate scan; tracks that the "adding a
    // constraint adds an expression, never a job" claim holds as the
    // suite grows (declared bound: one scan, O(constraints) rows out)
    "q_check_constraints",
    // r13: lexical retrieval — the one-shot form tracks the corpus
    // (doc, term) shuffle + restricted scoring; the indexed form
    // (fixture built once per JVM, benchPrepare) tracks the PRODUCTION
    // serving shape: term-InSet resolve + bucket-pruned postings scan
    // + doclens stats fold. Declared bounds ~linear in matched postings
    "q_bm25_topk", "q_bm25_indexed",
    // r13: index-routed retroactive decontamination — champion-term
    // pruned candidate read + exact verify on candidates only; declared
    // bound ~linear in benchmark + matched-candidate mass (the full-scan
    // form is ~linear in corpus tokens — the gap IS the feature)
    "q_decontam_indexed",
    // r13: reference-LM scoring (CCNet shape) — one (id, ctx, w) corpus
    // shuffle + two model joins + a per-doc fold; ~linear in corpus
    // tokens, the honest cost every model-based quality gate pays.
    // The indexed form (fixture once per JVM) times the PRODUCTION
    // serving shape: bucketed model table, exchange-free ctx totals
    "q_lm_stats", "q_lm_indexed",
    // r13: span-level exact-substring scrub (ExactSubstr) — the gram
    // explode + ONE map-side-partial gram aggregate + semi join-back +
    // per-doc interval window + rebuild; declared bound ~linear in
    // corpus tokens (the gram stream IS the token stream, k-shifted)
    "q_span_scrub",
    // r13: NB classifier scoring — one (id, w) corpus shuffle + a
    // model-sized join + per-doc fold; ~linear in corpus tokens, the
    // same honest cost as q_lm_stats with a smaller (unigram) model.
    // The indexed form times the persisted `_nbc` serving shape
    "q_nb_stats", "q_nb_indexed",
    // r13: the gram-ledger serving shape — shard explode + zero-exchange
    // bucketed ledger join + interval merge + rebuild; O(shard), the
    // corpus never re-tokenizes (fixture builds once in benchPrepare)
    "q_span_indexed",
    // r13: multimodal perceptual dedup — real PNG decode + dHash +
    // Hamming banding over the planted-variant fixture; declared bound
    // ~linear in payload count (decode-dominated) + banding candidates
    "q_image_pairs",
    // r13: BPE — the full-table adjacent-pair count (one word shuffle +
    // one pair aggregate, ~linear in corpus chars) and the persisted-
    // model serving encode (fixture once per JVM; samples time the
    // catalog resolve + fused per-word expression encode)
    "q_bpe_pairs", "q_bpe_indexed",
    // r14: the composed corpus->training-files landings — whitespace
    // form (also the sf1 scale-probe target: documents scales as of
    // StressGen v3) and the BPE token-id form, the trainer-loadable
    // artifact (persisted-model resolve + fused per-word id encode +
    // id-space chop + partitioned write). Declared bound ~linear in
    // corpus tokens end-to-end
    "q_pipeline_windows", "q_pipeline_windows_bpe",
    // r14: the language-gated composed chain (multiclass scoring over
    // the quality survivors — one (id, w) shuffle x broadcast label
    // fan-out; ~linear in corpus tokens) and the persisted multiclass
    // serving shape (fixture once per JVM via benchPrepare)
    "q_pipeline_lang", "q_nbm_indexed",
    // r14 cont: the doc-aware PACKED id-window assembly (encode +
    // two tiny cumsums + segment-bounded next-fit + join-back +
    // window shuffle; ~linear in corpus tokens — the packing
    // recurrence is O(segment) per segment row) and the SemDeDup
    // cluster-route pair generation (assign + within-cell join;
    // bound ~ Σ|cell|² at fixed nCells). q_semantic_decontam times
    // the exact broadcast-bench sweep (|corpus|·|bench| blockwise);
    // q_gopher_rules the full scan-fused rule set
    "q_windows_packed_bpe", "q_semdedup", "q_semantic_decontam",
    "q_gopher_rules",
    // r14 cont: the packed layout's COMPOSED landing (chain + encode +
    // EOD + segment next-fit + pad + partitioned write) — also an sf1
    // force-pick, so the doc-aware artifact carries in-record scale
    // evidence like its chop sibling
    "q_pipeline_windows_packed",
    // r15: the EVAL (strided) landing — chain + encode + sliding
    // membership + partitioned write; declared bound ~linear in corpus
    // tokens × windowSize/stride (the honest overlap blow-up, 2.5x at
    // the oracle's 300/120 geometry)
    "q_eval_windows",
    // r15 cont: the post-training assembly surfaces — blockwise
    // fused-encode passes, ~linear in pair tokens (the per-JVM model
    // trains in benchPrepare via q_bpe_indexed's shared fixture)
    "q_sft_examples", "q_dpo_pairs",
    // r15 cont: the two new tokenizer families' serving encodes —
    // unigram integer-Viterbi (fused per-word lattice, ~linear in
    // corpus chars × maxPieceLen) and wordpiece greedy longest-match
    // (persisted-model resolve + fused per-word walk, ~linear in
    // corpus chars) — plus their id-space window assemblies and the
    // length-bucketed batch layout (one bounded count pass + one
    // range-partitioned rank cumsum)
    "q_unigram_encode", "q_unigram_windows", "q_wordpiece_encode",
    "q_wordpiece_windows", "q_sft_buckets",
    // r16: the conversation assembler (blockwise fused encode + one
    // bounded per-row span scan, ~linear in conversation tokens), the
    // normalized wordpiece serve (the stamped-normalizer cost — one
    // extra codegen'd string pass in front of the greedy walk), and
    // the metaspace unigram serve (the ▁ transform + run extraction
    // in front of the fused Viterbi)
    "q_sft_multiturn", "q_wordpiece_encode_norm", "q_unigram_metaspace",
    "q_sft_examples_wp",
    // r16 cont: the RFT selection shape — ONE hash shuffle on the
    // prompt key + a per-group row_number (group size = the sampler
    // fan-out, a constant; no skew at any corpus scale) — and the T5
    // span-corruption objective (blockwise HOF arithmetic fused into
    // the scan; ~linear in corpus tokens)
    "q_rft_best", "q_span_corrupt")

  /** Untimed per-query preparation Bench runs ONCE before the timed
    * passes (r10 verdict #3): the steady-state ingest entries build and
    * snapshot their corpus-index fixtures on first execution, so
    * running each once here leaves pass 1 of the timed loop
    * warm-up-free — every sample measures the daily marginal cost.
    * The queries are self-initializing (FixtureSnapshot), so Verify
    * and ad-hoc callers need no hook. */
  val benchPrepare: Map[String, (SparkSession, String) => Unit] =
    Seq("q_ingest_gate_steady", "q_embed_ingest_steady",
        "q_ann_quantized_indexed",
    // r11: the PQ serving shape — probe-cell resolve + partition-pruned
    // ADC over the 32x-compressed (id, codes, norm) layout; the corpus
    // builds once per JVM (benchPrepare), so samples time the search
    "q_ivfpq_topk",
    // r13: the lexical serving shape — inverted index built once per
    // JVM, samples time the bucket-pruned BM25 serve
    "q_bm25_indexed",
    // r13: the decontam index fixture (train-split lexical index) builds
    // once per JVM — samples time the champion-pruned sweep itself
    "q_decontam_indexed",
    // r13: the persisted-LM fixture builds once per JVM — samples time
    // the indexed scoring serve
    "q_lm_indexed",
    // r13: the persisted-classifier fixture builds once per JVM —
    // samples time the `_nbc` serving shape
    "q_nb_indexed",
    // r13: the gram-ledger fixture (base build + one append) builds
    // once per JVM — samples time the index-routed span scrub
    "q_span_indexed",
    // r13: the persisted-BPE fixture (train + two tables) builds once
    // per JVM — samples time the serving encode
    "q_bpe_indexed",
    // r14: the BPE windows landing rides the same persisted model —
    // one untimed run trains it, so samples time chain + chop + write
    "q_pipeline_windows_bpe",
    // r14: the persisted multiclass fixture builds once per JVM —
    // samples time the `_nbm` serving shape
    "q_nbm_indexed",
    // r14 cont: the packed id-window assembly reuses the per-JVM
    // g_pbpe model — one untimed run trains it, so samples time
    // encode + packing + assembly only
    "q_windows_packed_bpe",
    // r14 cont: the composed packed landing shares the same model
    "q_pipeline_windows_packed",
    // r15: the eval (strided) landing rides the same per-JVM model
    "q_eval_windows",
    // r15 cont: the persisted wordpiece fixture imports once per JVM —
    // samples time the greedy serving encode
    "q_wordpiece_encode").map { n =>
      n -> ((s: SparkSession, dir: String) =>
        queries(n)(s, dir).write.format("noop").mode("overwrite").save())
    }.toMap
}
