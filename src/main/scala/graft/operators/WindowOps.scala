package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.{Aggregator, Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered / cumulative computations (reference `_cumulative.py:9-116`,
  * `_expr.py:2175-2315`).
  *
  * The reference computes cumulatives with a per-partition pass plus a
  * *serial* carry chain across partitions (`_cumulative.py:40-76`) — a
  * driver-side O(npartitions) critical path. Spark's window functions do
  * the same work inside one range-partitioned pass with no serial chain;
  * at 1000 executors the carry chain is the difference between minutes and
  * a straggler-bound hour.
  */
object WindowOps {

  def cumWindow(orderCol: String, partitionCols: Seq[String] = Nil): WindowSpec = {
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  def cumsum(c: String, w: WindowSpec): Column = sum(col(c)).over(w)
  def cummax(c: String, w: WindowSpec): Column = max(col(c)).over(w)
  def cummin(c: String, w: WindowSpec): Column = min(col(c)).over(w)
  def cumcount(c: String, w: WindowSpec): Column = count(col(c)).over(w)

  /** Exact cumulative product — Spark has no product aggregate; the
    * log/exp trick loses precision and sign. One small Aggregator
    * (reference cumprod: `_cumulative.py:99-104`). */
  val productAgg: Aggregator[java.lang.Double, Double, java.lang.Double] =
    new Aggregator[java.lang.Double, Double, java.lang.Double] {
      def zero: Double = 1.0
      def reduce(b: Double, a: java.lang.Double): Double =
        if (a == null) b else b * a
      def merge(b1: Double, b2: Double): Double = b1 * b2
      def finish(r: Double): java.lang.Double = r
      def bufferEncoder: Encoder[Double] =
        org.apache.spark.sql.Encoders.scalaDouble
      def outputEncoder: Encoder[java.lang.Double] =
        org.apache.spark.sql.Encoders.DOUBLE
    }
  def product(c: Column): Column = udaf(productAgg).apply(c)
  def cumprod(c: String, w: WindowSpec): Column = udaf(productAgg).apply(col(c)).over(w)

  /** diff(n) (reference `_expr.py:2175-2204`). */
  def diff(c: String, n: Int, w: WindowSpec): Column = col(c) - lag(col(c), n).over(w)
  /** shift(±n) (reference `_expr.py:2255-2315`). */
  def shift(c: String, n: Int, w: WindowSpec): Column =
    if (n >= 0) lag(col(c), n).over(w) else lead(col(c), -n).over(w)

  /** ffill/bfill (reference `_expr.py:2207-2252`): last/first non-null in
    * an ordered frame; `limit` bounds the frame. */
  def ffill(c: String, orderCol: String, partitionCols: Seq[String] = Nil,
            limit: Option[Int] = None): Column = {
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = limit match {
      case Some(n) => w0.rowsBetween(-n, 0)
      case None    => w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    last(col(c), ignoreNulls = true).over(w)
  }
  def bfill(c: String, orderCol: String, partitionCols: Seq[String] = Nil,
            limit: Option[Int] = None): Column = {
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    val w = limit match {
      case Some(n) => w0.rowsBetween(0, n)
      case None    => w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    }
    first(col(c), ignoreNulls = true).over(w)
  }

  /** Monotonicity probe (reference `_reductions.py:1208-1217`). */
  def isMonotonicIncreasing(df: DataFrame, c: String, orderCol: String): DataFrame = {
    val w = Window.orderBy(col(orderCol))
    df.select(col(c), lag(col(c), 1).over(w).as("__prev__"))
      .agg(coalesce(expr(s"bool_and(__prev__ IS NULL OR __prev__ <= $c)"), lit(true))
        .as("is_monotonic"))
  }
}
