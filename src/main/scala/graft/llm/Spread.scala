package graft.llm

import org.apache.spark.sql.DataFrame

/** Widens sub-parallelism frames before a blockwise (per-row expression)
  * stage so every core participates.
  *
  * Deliberately avoids `df.rdd.getNumPartitions`: materializing the RDD
  * instantiates a second physical plan on the driver purely for a
  * partition count, which doubles driver-side planning in long pipelines.
  * Instead the decision keys off the *input file count* (available from
  * the logical plan, no physical planning): small fixture tables arrive
  * as one or two parquet splits and get spread; a real corpus has ≥
  * `defaultParallelism` files and passes through untouched — the same
  * outcome the old probe produced, without the extra plan.
  */
private[graft] object Spread {
  def apply(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    val files = df.inputFiles.length
    if (files < par) df.repartition(par) else df
  }
}
