package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}

/** Physical-plan audit for the questions that decide 100 TB viability:
  * how many shuffles, what got broadcast, did filters and column pruning
  * reach the scan, is anything a cartesian blowup. This is the
  * user-facing version of the discipline the test suite enforces on
  * every registered query (PlanAccessorsSpec's no-CartesianProduct
  * sweep): inspect BEFORE running at scale, in code rather than by
  * eyeballing `.explain` text.
  */
object PlanReport {

  /** One parquet/file scan: the pruned column set and the filters that
    * reached the reader (empty = nothing pushed — a red flag under a
    * selective query). */
  final case class ScanInfo(readColumns: Seq[String], pushedFilters: String)

  final case class Report(
      shuffleExchanges: Int,
      broadcastExchanges: Int,
      reusedExchanges: Int,
      cartesianProducts: Int,
      codegenSpans: Int,
      scans: Seq[ScanInfo]) {
    /** A plan is scale-safe when no operator pairs rows without a key. */
    def scaleSafe: Boolean = cartesianProducts == 0
  }

  /** The flattened executed plan (AQE roots, query stages and codegen
    * spans entered; ReusedExchange counted but not descended) — for
    * callers that need to assert on node shapes [[Report]] doesn't
    * summarize, e.g. "exactly one RANGE exchange". */
  def nodes(df: DataFrame): Seq[SparkPlan] =
    flatten(df.queryExecution.executedPlan)

  def of(df: DataFrame): Report = {
    val nodes = flatten(df.queryExecution.executedPlan)
    Report(
      shuffleExchanges = nodes.count(_.isInstanceOf[ShuffleExchangeExec]),
      broadcastExchanges = nodes.count(_.isInstanceOf[BroadcastExchangeExec]),
      reusedExchanges = nodes.count(_.isInstanceOf[ReusedExchangeExec]),
      cartesianProducts =
        nodes.count(_.getClass.getSimpleName.startsWith("CartesianProduct")),
      codegenSpans = nodes.count(_.isInstanceOf[WholeStageCodegenExec]),
      scans = nodes.collect { case s: FileSourceScanExec =>
        ScanInfo(s.requiredSchema.fieldNames.toSeq,
          s.metadata.getOrElse("PushedFilters", ""))
      })
  }

  /** Throw before a cartesian blowup ever reaches a cluster: wire this
    * into job submission the way the test suite wires its sweep. */
  def assertScaleSafe(df: DataFrame): Unit = {
    val r = of(df)
    require(r.scaleSafe,
      s"plan contains ${r.cartesianProducts} CartesianProduct node(s) — " +
        "an unbounded pairwise blowup; key the join or broadcast a bounded side")
  }

  /** Pre-order walk that sees through the wrappers `children` misses:
    * AQE roots (current plan), materialized query stages, and codegen
    * spans. A ReusedExchange is counted but NOT entered — its child is
    * the original exchange already present elsewhere in the tree, and
    * descending would double-count that subtree. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other => other.children
    }
    val sub = p.subqueries
    p +: (kids ++ sub).flatMap(flatten)
  }
}
