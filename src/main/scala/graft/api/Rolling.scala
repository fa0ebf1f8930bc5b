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
  * duplicating boundary rows: the shuffle orders once and every frame
  * aggregate is evaluated in a single pass.
  *
  * Scale contract: an empty `partitionCols` makes the window single-task
  * (all rows in one partition) — refused unless `allowGlobal=true`, the
  * explicit opt-in for small frames. At 100 TB use grouped rolling
  * (partition by entity key), which is also the reference's
  * groupby-rolling (`_rolling.py:228-322`).
  */
final case class Rolling(df: DataFrame, partitionCols: Seq[String],
                         orderCol: String, window: Int, minPeriods: Int = 1,
                         center: Boolean = false, allowGlobal: Boolean = false) {
  require(partitionCols.nonEmpty || allowGlobal,
    "rolling: empty partitionBy executes single-task at scale; use " +
      "rollingBy(keys, ...) or opt in with allowGlobal=true for small frames")

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
  /** pandas yields null below min_periods for count too. */
  def count(c: String): Column = guarded(col(c), F.count)
  def variance(c: String): Column = guarded(col(c), F.var_samp)
  def std(c: String): Column = guarded(col(c), F.stddev_samp)
  // exact percentile, not median(): Spark rejects median with a window
  // frame (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC); percentile is the
  // frame-compatible exact equivalent
  def median(c: String): Column = guarded(col(c), x => F.percentile(x, F.lit(0.5)))
  def skew(c: String): Column = guarded(col(c), F.skewness)
  def kurt(c: String): Column = guarded(col(c), F.kurtosis)
  /** exact linear-interpolation quantile (pandas rolling quantile is
    * exact; percentile_approx would diverge — r2 advice). Rolling frames
    * are bounded, so the exact sort-based percentile is cheap. */
  def quantile(c: String, q: Double): Column =
    guarded(col(c), x => F.percentile(x, F.lit(q)))
  def cov(c1: String, c2: String): Column = F.covar_samp(col(c1), col(c2)).over(base)
  def corr(c1: String, c2: String): Column = F.corr(col(c1), col(c2)).over(base)
  def apply(c: String, agg: Column => Column): Column = agg(col(c)).over(base)
  /** rolling().apply with an ARBITRARY Scala function over the window's
    * raw values (reference `_rolling.py:220-222`, raw=True): collect_list
    * over the frame, then a typed lambda on the array. Each row carries a
    * `window`-sized array — bounded and fine for rolling frames, never
    * use for unbounded ones. Values arrive in frame (row) order; nulls
    * are skipped (collect_list semantics); below min_periods → null. */
  def applyRows(c: String, f: Seq[Double] => Double): Column = {
    val minP = minPeriods
    val fn = F.udf((xs: Seq[Double]) =>
      if (xs == null || xs.length < minP) None else Some(f(xs)))
    fn(F.collect_list(col(c).cast("double")).over(base))
  }

  def withColumnRolled(name: String, c: Column): GraftFrame =
    GraftFrame(df.withColumn(name, c))

  /** rolling().agg with a dict spec (reference `_rolling.py:220-225`):
    * `Map(col -> Seq(fn))` compiled over the existing members in ONE
    * select — every output shares the same window spec, so Catalyst
    * plans a single WindowExec (one shuffle+sort), not one per entry.
    * Output columns are named `<col>_<fn>` in spec order. */
  def aggSpec(spec: Seq[(String, Seq[String])]): GraftFrame = {
    val rolled = spec.flatMap { case (c, fns) =>
      fns.map { fn =>
        val r: Column = fn match {
          case "sum"    => sum(c)
          case "mean"   => mean(c)
          case "min"    => min(c)
          case "max"    => max(c)
          case "count"  => count(c)
          case "var"    => variance(c)
          case "std"    => std(c)
          case "median" => median(c)
          case "skew"   => skew(c)
          case "kurt"   => kurt(c)
          case other => throw new IllegalArgumentException(
            s"rolling.aggSpec: unsupported function '$other' (use " +
              "sum/mean/min/max/count/var/std/median/skew/kurt)")
        }
        r.as(s"${c}_$fn")
      }
    }
    GraftFrame(df.select(df.columns.map(col).toSeq ++ rolled: _*))
  }
}

object Rolling {
  /** Time-offset rolling (`rolling("1h")`): range frame over event time
    * (reference `_rolling.py:121-127`). `spanSeconds` is the lookback. */
  def byTime(df: DataFrame, partitionCols: Seq[String], tsCol: String,
             spanSeconds: Long): WindowSpec = {
    require(partitionCols.nonEmpty,
      "rolling-by-time: empty partitionBy executes single-task at scale")
    Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(unix_timestamp(col(tsCol)))
      .rangeBetween(-spanSeconds, 0)
  }
}
