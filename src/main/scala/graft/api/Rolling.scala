package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, when, unix_timestamp}

/** pandas rolling over row order (reference `_rolling.py:38-322`).
  *
  * The reference materializes overlapping partitions (`MapOverlap`,
  * reference `_expr.py:595-794`) so each task sees `window-1` rows from its
  * neighbor. Spark window frames express the same computation without
  * duplicating boundary rows: the range shuffle orders once and every frame
  * aggregate is evaluated in a single pass — at 100 TB this avoids the
  * reference's extra materialization of every partition boundary.
  */
final case class Rolling(df: DataFrame, partitionCols: Seq[String],
                         orderCol: String, window: Int, minPeriods: Int = 1,
                         center: Boolean = false) {
  private def base: WindowSpec = {
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(col(orderCol))
      else Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
    if (center) {
      val before = (window - 1) / 2 + (window - 1) % 2
      val after = (window - 1) / 2
      w0.rowsBetween(-before, after)
    } else w0.rowsBetween(-(window - 1), 0)
  }
  private def guarded(c: Column, agg: Column => Column): Column = {
    // min_periods: yield null until enough observations (pandas default
    // min_periods=window for fixed windows; we take it explicitly).
    val cnt = F.count(c).over(base)
    when(cnt >= minPeriods, agg(c).over(base))
  }
  def sum(c: String): Column = guarded(col(c), F.sum)
  def mean(c: String): Column = guarded(col(c), F.avg)
  def min(c: String): Column = guarded(col(c), F.min)
  def max(c: String): Column = guarded(col(c), F.max)
  def count(c: String): Column = F.count(col(c)).over(base)
  def variance(c: String): Column = guarded(col(c), F.var_samp)
  def std(c: String): Column = guarded(col(c), F.stddev_samp)
  def median(c: String): Column = guarded(col(c), F.median)
  def apply(c: String, agg: Column => Column): Column = agg(col(c)).over(base)

  def withColumnRolled(name: String, c: Column): GraftFrame =
    GraftFrame(df.withColumn(name, c))
}

object Rolling {
  /** Time-offset rolling (`rolling("1h")`): range frame over event time
    * (reference `_rolling.py:121-127`). `spanSeconds` is the lookback. */
  def byTime(df: DataFrame, partitionCols: Seq[String], tsCol: String,
             spanSeconds: Long): WindowSpec = {
    val w0 =
      if (partitionCols.isEmpty) Window.orderBy(unix_timestamp(col(tsCol)))
      else Window.partitionBy(partitionCols.map(col): _*)
        .orderBy(unix_timestamp(col(tsCol)))
    w0.rangeBetween(-spanSeconds, 0)
  }
}
