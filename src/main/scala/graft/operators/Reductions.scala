package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Global reductions & composites (reference `_reductions.py`).
  *
  * Spark executes every one of these as partial aggregation → single-row
  * exchange → final aggregation, which is the reference's TreeReduce
  * (reference `_reductions.py:257-350`) with fan-in chosen by the engine;
  * no `split_every` knob to tune.
  */
object Reductions {

  /** Deterministic mode: most frequent value, ties broken by smallest
    * value (reference Mode `_reductions.py:994-1025` inherits pandas'
    * sorted-ties behavior). */
  def mode(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c)).agg(count(lit(1)).as("__n__"))
      .orderBy(col("__n__").desc, col(c).asc)
      .limit(1)
      .select(col(c).as(s"mode_$c"))

  /** Key-skew report: the `topK` hottest keys with row counts and
    * corpus share — the diagnostic a pipeline runs BEFORE choosing a
    * salt factor / AQE skew threshold for a join on `keyCol`. One
    * map-side-combined count aggregation (group cardinality = distinct
    * keys, far below row count), a 1-row broadcast total, and a
    * TakeOrdered top-k — no full sort, nothing driver-sized. */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, "keySkewReport needs a positive topK")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t__"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n").cast("double") / col("__t__").cast("double"))
      .drop("__t__")
      .orderBy(col("n").desc, col(keyCol).asc)
      .limit(topK)
  }

  /** Fixed-bin histogram of a numeric column (value_counts superset —
    * pandas exposes this as `Series.value_counts(bins=n)` / `pd.cut`):
    * bin i covers [lo + i·w, lo + (i+1)·w) with the top edge folded into
    * the last bin, w = (hi-lo)/bins. Binning is one per-row floor (all
    * IEEE double ops, identical on any engine) followed by a single
    * partial/final count aggregate over at most `bins` groups — the
    * whole histogram is one map-side-combined pass at any data size. */
  def histogram(df: DataFrame, c: String, lo: Double, hi: Double,
                bins: Int): DataFrame = {
    require(bins > 0, "histogram needs at least one bin")
    require(hi > lo, "histogram needs hi > lo")
    val x = col(c)
    val step = (hi - lo) / bins
    val bin = least(floor((x - lo) / (hi - lo) * bins), lit(bins - 1L)).cast("int")
    df.filter(x >= lo && x <= hi)
      .select(bin.as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * step).as("lo_edge"),
        (lit(lo) + (col("bin") + 1) * step).as("hi_edge"),
        col("n"))
      .orderBy("bin")
  }

  /** value_counts (reference `_reductions.py:1122-1158`) with the pandas
    * options: dropna=false keeps the null group; sort=false orders by
    * value instead of count (pandas keeps encounter order, which has no
    * distributed analog — value order is the deterministic stand-in). */
  def valueCounts(df: DataFrame, c: String, normalize: Boolean = false,
                  ascending: Boolean = false, dropna: Boolean = true,
                  sort: Boolean = true): DataFrame = {
    val base = if (dropna) df.filter(col(c).isNotNull) else df
    val counted = base.groupBy(col(c)).agg(count(lit(1)).as("count"))
    val out =
      if (normalize) {
        // single-row dimension — broadcast, no shuffle of the counted side
        val total = counted.agg(sum("count").as("__t__"))
        counted.crossJoin(broadcast(total))
          .withColumn("proportion", col("count") / col("__t__"))
          .drop("count", "__t__")
      } else counted
    if (!sort) out.orderBy(col(c).asc)
    else {
      val ord = if (ascending) col(out.columns.last).asc else col(out.columns.last).desc
      out.orderBy(ord, col(c).asc)
    }
  }

  /** describe() for numeric columns (reference `_describe.py:16-103`):
    * count/mean/std/min/quartiles/max in ONE aggregation pass — a single
    * scan at any scale. */
  def describeNumeric(df: DataFrame, c: String): DataFrame =
    df.agg(
      count(col(c)).as("count"),
      avg(col(c)).as("mean"),
      stddev_samp(col(c)).as("std"),
      min(col(c)).as("min"),
      percentile(col(c), lit(0.25)).as("p25"),
      percentile(col(c), lit(0.5)).as("p50"),
      percentile(col(c), lit(0.75)).as("p75"),
      max(col(c)).as("max"))

  /** describe() for non-numeric columns (reference DescribeNonNumeric
    * `_describe.py:16-103`): count / unique / top / freq in two
    * aggregation passes (top+freq needs the per-value counts). */
  def describeNonNumeric(df: DataFrame, c: String): DataFrame = {
    val counts = df.filter(col(c).isNotNull)
      .groupBy(col(c)).agg(count(lit(1)).as("__n__"))
    val top = counts.orderBy(col("__n__").desc, col(c).asc).limit(1)
      .select(col(c).as("top"), col("__n__").as("freq"))
    df.agg(count(col(c)).as("count"),
        countDistinct(col(c)).as("unique"))
      .crossJoin(broadcast(top))
  }

  /** Exact quantiles. At 100 TB prefer `approxQuantiles` —
    * Greenwald-Khanna with bounded state, the analog of the reference's
    * t-digest path (reference `_quantile.py:14-133`). */
  def quantiles(df: DataFrame, c: String, qs: Seq[Double]): DataFrame =
    df.agg(percentile(col(c), typedLit(qs)).as("quantiles"))
  def approxQuantiles(df: DataFrame, c: String, qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.agg(percentile_approx(col(c), typedLit(qs), lit(accuracy)).as("quantiles"))

  /** median_approximate (reference `_collection.py` median_approximate):
    * bounded-state GK sketch at phi=0.5 — the scale path where exact
    * `median()` would shuffle whole groups. Delegates to approxQuantiles
    * so the sketch call lives in one place. */
  def medianApprox(df: DataFrame, c: String, accuracy: Int = 10000): DataFrame =
    approxQuantiles(df, c, Seq(0.5), accuracy)
      .select(element_at(col("quantiles"), 1).as("median_approx"))

  /** nunique exact & approximate (HLL, the reference's NuniqueApprox b=16
    * — reference `_reductions.py:1028-1049`). */
  def nunique(df: DataFrame, c: String): DataFrame =
    df.agg(countDistinct(col(c)).as("nunique"))
  def nuniqueApprox(df: DataFrame, c: String, rsd: Double = 0.02): DataFrame =
    df.agg(approx_count_distinct(col(c), rsd).as("nunique_approx"))

  /** memory_usage analog: engine statistics, no data read
    * (reference `_reductions.py:1162-1205`). */
  def sizeInBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** memory_usage_per_partition analog (reference
    * `_collection.py` memory_usage_per_partition): per-partition row
    * counts plus a bytes estimate prorated from the optimizer's size
    * statistic — one narrow pass, nothing collected but the counts. */
  def memoryUsagePerPartition(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val total = sizeInBytes(df).toDouble
    val counts = df.rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; while (it.hasNext) { it.next(); n += 1 }
      Iterator((pid, n))
    }
    val rows = counts.map { case (pid, n) => org.apache.spark.sql.Row(pid, n) }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("partition",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("rows",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val base = spark.createDataFrame(rows, schema)
    val totals = base.agg(sum(col("rows")).as("__total_rows__"))
    // clamp: plans without real stats (joins multiply defaults) can carry
    // an astronomically large sizeInBytes; an unclamped double→long cast
    // past Long.MaxValue throws under ANSI, and an introspection call
    // must never fail
    val estimate = least(lit(Long.MaxValue.toDouble),
      col("rows") / col("__total_rows__") * total)
    base.crossJoin(broadcast(totals))
      .withColumn("est_bytes",
        when(col("__total_rows__") > 0, estimate.cast("long"))
          .otherwise(lit(0L)))
      .drop("__total_rows__")
  }
}
