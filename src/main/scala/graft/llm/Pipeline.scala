package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** @param docs     training-candidate documents (idCol, textCol, …)
    * @param bench    benchmark/eval documents to decontaminate against
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
                     shuffleSeed: Long = 0L): DataFrame = {
    // 1. quality gate: Gopher-style rule stats, keep only passing docs
    val keepIds = TextStats.qualityRules(docs, idCol, textCol,
        minTokens = minTokens)
      .filter(col("keep")).select(idCol)
    val kept = docs.join(keepIds, Seq(idCol), "left_semi")
    // 2. exact dedup (canonicalized md5, keep smallest id)
    val exact = Dedup.exact(kept, idCol, textCol)
    // 3. near dedup: banded MinHash candidates, exact-Jaccard verify,
    //    min-label components, drop non-minimal members
    val near = Dedup.dropNearDuplicates(exact, idCol, textCol,
      nearDupThreshold)
    // 4. decontaminate vs the benchmark shingle set
    val clean = Dedup.decontaminate(near, bench, idCol, textCol, decontamK)
    // 5+6. row-stable split and deterministic global shuffle position
    graft.api.GraftFrame(clean)
      .splitByHash(idCol, trainFrac, valFrac)
      .shuffleIndex(idCol, seed = shuffleSeed)
      .df
  }
}
