package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.expressions.{Aggregator, Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Ordered / cumulative computations (reference `_cumulative.py:9-116`,
  * `_expr.py:2175-2315`).
  *
  * Scale contract: a window with an empty `partitionBy` shuffles EVERY row
  * into one task — a guaranteed straggler/OOM at 100 TB. The reference
  * avoids this with per-partition partials plus a serial carry chain
  * (`_cumulative.py:40-76`). Here:
  *  - `cumWindow` REQUIRES partition columns;
  *  - `globalCumSum` implements the scale-safe global variant as two
  *    passes: range-shuffle on the order column, per-range partials, a
  *    tiny (npartitions-row) prefix frame broadcast back — the reference's
  *    carry chain without the serial driver-side critical path;
  *  - `cumWindowGlobalUnsafe` is the explicit single-partition opt-in for
  *    small frames.
  */
object WindowOps {

  def cumWindow(orderCol: String, partitionCols: Seq[String]): WindowSpec = {
    require(partitionCols.nonEmpty,
      "cumWindow: empty partitionBy would execute single-task; use " +
        "globalCumSum (scale-safe) or cumWindowGlobalUnsafe (explicit opt-in)")
    Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** Single-partition global window — only for frames known to be small
    * (post-aggregation results, dimension tables). */
  def cumWindowGlobalUnsafe(orderCol: String): WindowSpec =
    Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

  def cumsum(c: String, w: WindowSpec): Column = sum(col(c)).over(w)
  def cummax(c: String, w: WindowSpec): Column = max(col(c)).over(w)
  def cummin(c: String, w: WindowSpec): Column = min(col(c)).over(w)
  def cumcount(c: String, w: WindowSpec): Column = count(col(c)).over(w)

  /** Globally-ordered cumulative sum without a single-partition window.
    * Plan: range-repartition by `orderCol` (sampled boundaries — the
    * reference's RepartitionQuantiles, `_quantiles.py:18-88`), compute the
    * within-range cumsum with a window PARTITIONED by the range id, then
    * add each range's prefix offset — an (npartitions)-row frame joined by
    * broadcast. Two shuffles of the data total, no serial chain.
    * `orderCol` must be globally unique for a deterministic result (pass a
    * composite via a struct-ranked column otherwise). */
  /** `groupCols` (r16): restart the cumulative sum per group — the
    * grouped form the split-fused window landings use (one pass over
    * the whole corpus instead of one full plan per split). Range
    * partitioning is (groupCols, orderCol) lexicographic, so within a
    * group increasing order keys land in non-decreasing partition ids
    * and the per-(group, pid) offset carry is exact; the offsets frame
    * is (groups × npartitions) rows — same cosmetic-window posture. */
  def globalCumSum(df: DataFrame, orderCol: String, valueCol: String,
                   outCol: String,
                   groupCols: Seq[String] = Nil): DataFrame = {
    // Both consumers below (the windowed frame and the offsets frame)
    // descend from THIS dataframe object — identical logical subplans —
    // so the range exchange is planned once (ReusedExchange) and every
    // branch sees the same sampled boundaries / partition ids.
    val g = groupCols.map(col)
    val ranged = df.repartitionByRange(g :+ col(orderCol): _*)
      .withColumn("__pid__", spark_partition_id())
    val wIn = Window.partitionBy(g :+ col("__pid__"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = ranged.withColumn("__local__", sum(col(valueCol)).over(wIn))
    // Prefix offsets over the npartitions-row per-range sums. This IS an
    // un-partitioned window, deliberately: the frame is npartitions rows
    // by construction (the aggregation's exchange keeps the data-side
    // parallel), so the single task touches ~32-1000 rows at any scale —
    // the WindowExec warning it triggers is cosmetic. Do NOT "fix" it by
    // scanning via .rdd/createDataFrame: that severs the SQL plan, the
    // broadcast branch loses ReusedExchange, and the whole data pipeline
    // executes twice (measured 9.2x at sf0.1).
    val wOff = (if (g.isEmpty) Window.orderBy(col("__pid__"))
                else Window.partitionBy(g: _*).orderBy(col("__pid__")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(g :+ col("__pid__"): _*)
      .agg(sum(col(valueCol)).as("__psum__"))
      .withColumn("__offset__",
        coalesce(sum(col("__psum__")).over(wOff), lit(0)))
      .select(g :+ col("__pid__") :+ col("__offset__"): _*)
    withLocal.join(broadcast(offsets), groupCols :+ "__pid__")
      .withColumn(outCol, col("__local__") + col("__offset__"))
      .drop("__pid__", "__local__", "__offset__")
  }

  /** [[globalCumSum]] for HASH-UNIFORM long order keys in [0, `domain`)
    * — every id-landing order key here is keyHash31-derived, so the key
    * space is uniform by construction and the ordered ranges can be
    * DETERMINISTIC equal-width buckets of the domain instead of sampled
    * boundaries (r16 optimization). That removes repartitionByRange's
    * boundary-sampling pass, which re-evaluated the (often
    * encode-heavy) child subtree once per cumsum before the real map
    * pass ran it again — the landing assemblies paid the corpus encode
    * twice per split. One hash exchange on the bucket id total; the
    * offsets frame aggregates the WINDOWED output so it reuses that
    * exchange (the globalCumSum reuse discipline); the un-partitioned
    * offsets window touches ≤ `spark.graft.cumsum.buckets` (default
    * 1024) rows at any scale — the same cosmetic-warning posture as
    * [[globalCumSum]]. Bucket ids are pure functions of the data, so
    * the result is bit-identical to [[globalCumSum]]'s and fully
    * partition-count independent. */
  def globalCumSumHashed(df: DataFrame, orderCol: String, valueCol: String,
                         outCol: String, domain: Long,
                         groupCols: Seq[String] = Nil): DataFrame = {
    require(domain > 0, s"globalCumSumHashed: domain must be positive, got $domain")
    val buckets = df.sparkSession.conf
      .getOption("spark.graft.cumsum.buckets")
      .map(_.toInt).getOrElse(1024)
    // overflow-safe ceiling division (r17 fix): the additive form
    // `(domain + buckets - 1) / buckets` wraps negative for
    // domain = Long.MaxValue — the packed layout's piece-order domain —
    // collapsing width to 1, i.e. one "bucket" PER DISTINCT KEY: the
    // offsets frame silently grew to one row per key and its
    // un-partitioned carry window became a corpus-sized single task at
    // scale (the exact shape this function exists to avoid). Cumsum
    // VALUES were always correct — bucket geometry only affects physical
    // partitioning — so results are unchanged by the fix.
    val width = math.max(1L,
      domain / buckets + (if (domain % buckets == 0) 0L else 1L))
    val g = groupCols.map(col)
    val withPid = df.withColumn("__pid__",
      graft.QHelp.floorDiv(col(orderCol), width))
    val wIn = Window.partitionBy(g :+ col("__pid__"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withLocal = withPid.withColumn("__local__",
      sum(col(valueCol)).over(wIn))
    val wOff = (if (g.isEmpty) Window.orderBy(col("__pid__"))
                else Window.partitionBy(g: _*).orderBy(col("__pid__")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(g :+ col("__pid__"): _*)
      .agg(sum(col(valueCol)).as("__psum__"))
      .withColumn("__offset__",
        coalesce(sum(col("__psum__")).over(wOff), lit(0)))
      .select(g :+ col("__pid__") :+ col("__offset__"): _*)
    withLocal.join(broadcast(offsets), groupCols :+ "__pid__")
      .withColumn(outCol, col("__local__") + col("__offset__"))
      .drop("__pid__", "__local__", "__offset__")
  }

  /** Globally-ordered forward fill without a single-partition window:
    * range-shuffle, per-range fill (window partitioned by range id),
    * then carry each range's last non-null value forward via a tiny
    * (npartitions-row) ffilled frame joined back by broadcast — the
    * cross-partition carry chain, parallelized. */
  def globalFfill(df: DataFrame, orderCol: String, valueCol: String,
                  outCol: String): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol))
      .withColumn("__pid__", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid__")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn("__lf__",
      last(col(valueCol), ignoreNulls = true).over(wIn))
    // npartitions rows: last non-null per range, ffilled across ranges
    // (exclusive — range i sees the carry from ranges < i). A tiny
    // un-partitioned window on purpose — see globalCumSum: an RDD-boundary
    // scan here would sever the plan and recompute the data pipeline.
    val wP = Window.orderBy(col("__pid__"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = local.groupBy(col("__pid__"))
      .agg(last(col("__lf__"), ignoreNulls = true).as("__last__"))
      .withColumn("__carry__",
        last(col("__last__"), ignoreNulls = true).over(wP))
      .select(col("__pid__"), col("__carry__"))
    local.join(broadcast(carries), "__pid__")
      .withColumn(outCol, coalesce(col("__lf__"), col("__carry__")))
      .drop("__pid__", "__lf__", "__carry__")
  }

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

  /** Globally-ordered rolling sum without a single-partition window:
    * mapOverlap gives each range partition the preceding `window-1` rows
    * (reference MapOverlap `_expr.py:595-794` powering rolling), and the
    * sliding sum runs imperatively per partition — the scale-safe global
    * rolling the un-partitioned SQL window can't provide. */
  def globalRollingSum(df: DataFrame, orderCol: String, valueCol: String,
                       window: Int, outCol: String): DataFrame = {
    val inSchema = df.select(orderCol, valueCol).schema
    val outSchema = org.apache.spark.sql.types.StructType(
      inSchema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.DoubleType))
    Overlap.mapOverlap(df.select(orderCol, valueCol), orderCol,
      before = window - 1, after = 0, outSchema) { it =>
      val buf = new scala.collection.mutable.Queue[Double]()
      it.flatMap { case (owned, row) =>
        buf.enqueue(row.getDouble(1))
        if (buf.size > window) buf.dequeue()
        if (owned)
          Iterator(org.apache.spark.sql.Row(row.get(0), row.getDouble(1), buf.sum))
        else Iterator.empty
      }
    }
  }

  /** diff(n) (reference `_expr.py:2175-2204`). */
  def diff(c: String, n: Int, w: WindowSpec): Column = col(c) - lag(col(c), n).over(w)
  /** shift(±n) (reference `_expr.py:2255-2315`). */
  def shift(c: String, n: Int, w: WindowSpec): Column =
    if (n >= 0) lag(col(c), n).over(w) else lead(col(c), -n).over(w)

  private def orderedWindow(orderCol: String, partitionCols: Seq[String],
                            what: String): WindowSpec = {
    require(partitionCols.nonEmpty,
      s"$what: empty partitionBy executes single-task at scale; partition " +
        "by a key (per-group fill) or pre-bucket the order column")
    Window.partitionBy(partitionCols.map(col): _*).orderBy(col(orderCol))
  }

  /** Ranking / analytic functions — absent from the reference (SURVEY §2.6:
    * no rank/dense_rank/ntile), exposed as a capability superset since
    * Catalyst provides them codegen'd. Same partition-required discipline
    * as every ordered window. row_number/ntile need a total order within
    * the partition (unique orderCol) to be deterministic; rank/dense_rank/
    * percent_rank are deterministic under ties. */
  def rank(orderCol: String, partitionCols: Seq[String]): Column =
    org.apache.spark.sql.functions.rank()
      .over(orderedWindow(orderCol, partitionCols, "rank"))
  def denseRank(orderCol: String, partitionCols: Seq[String]): Column =
    dense_rank().over(orderedWindow(orderCol, partitionCols, "denseRank"))
  def percentRank(orderCol: String, partitionCols: Seq[String]): Column =
    percent_rank().over(orderedWindow(orderCol, partitionCols, "percentRank"))
  def rowNumber(orderCol: String, partitionCols: Seq[String]): Column =
    row_number().over(orderedWindow(orderCol, partitionCols, "rowNumber"))
  def ntileN(n: Int, orderCol: String, partitionCols: Seq[String]): Column =
    ntile(n).over(orderedWindow(orderCol, partitionCols, "ntile"))

  def cumeDist(orderCol: String, partitionCols: Seq[String]): Column =
    cume_dist().over(orderedWindow(orderCol, partitionCols, "cumeDist"))
  /** nth/first/last value over the default growing frame (SQL standard
    * RANGE UNBOUNDED PRECEDING..CURRENT ROW — nth is null until n rows
    * are in frame, lastValue is the current row's value). */
  def nthValue(c: Column, n: Int, orderCol: String,
               partitionCols: Seq[String]): Column =
    nth_value(c, n).over(orderedWindow(orderCol, partitionCols, "nthValue"))
  def firstValue(c: Column, orderCol: String,
                 partitionCols: Seq[String]): Column =
    first(c).over(orderedWindow(orderCol, partitionCols, "firstValue"))

  /** Batch sessionization: per-key session ids where a gap of more than
    * `gapSeconds` between consecutive events opens a new session (the
    * batch complement of streaming/Streams.sessionAgg's session windows;
    * the standard event-pipeline op). Two stacked windows on ONE
    * partitioning — a new-session flag from lag, then its running sum —
    * so the plan is one shuffle on the keys and a single sort. Gap
    * arithmetic is exact integer MICROSECONDS (sub-second timestamps
    * would silently mis-bucket under whole-second truncation);
    * `tieCol` makes the order total when two events share a timestamp,
    * keeping assignments engine-reproducible. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 gapSeconds: Long, tieCol: String,
                 outCol: String = "session_id"): DataFrame = {
    require(keys.nonEmpty,
      "sessionize needs partition keys (a keyless global sessionization " +
        "would single-task the whole corpus)")
    require(gapSeconds > 0, "sessionize needs a positive gap")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    // Gap micros must be timezone-independent: casting an NTZ timestamp
    // to LTZ interprets the wall clock in the SESSION zone, so a gap
    // spanning a DST transition would shift by an hour and mis-bucket
    // sessions. For NTZ inputs compute epoch micros arithmetically from
    // the wall-clock fields (unix_date/hour/minute/second read NTZ
    // directly, no zone in play); LTZ inputs are real instants and
    // unix_micros is already exact.
    val tsc = col(tsCol)
    val us = df.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        (unix_date(to_date(tsc)).cast("long") * 86400L
          + hour(tsc).cast("long") * 3600L
          + minute(tsc).cast("long") * 60L
          + second(tsc).cast("long")) * 1000000L +
          date_format(tsc, "SSSSSS").cast("long")
      case _ => unix_micros(tsc.cast("timestamp"))
    }
    df.withColumn("__ns__",
        when(us - lag(us, 1).over(w) > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn(outCol,
        sum(col("__ns__")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__ns__")
  }

  /** ffill/bfill (reference `_expr.py:2207-2252`): last/first non-null in
    * an ordered frame; `limit` bounds the frame. */
  def ffill(c: String, orderCol: String, partitionCols: Seq[String],
            limit: Option[Int] = None): Column = {
    val w0 = orderedWindow(orderCol, partitionCols, "ffill")
    val w = limit match {
      case Some(n) => w0.rowsBetween(-n, 0)
      case None    => w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    last(col(c), ignoreNulls = true).over(w)
  }
  def bfill(c: String, orderCol: String, partitionCols: Seq[String],
            limit: Option[Int] = None): Column = {
    val w0 = orderedWindow(orderCol, partitionCols, "bfill")
    val w = limit match {
      case Some(n) => w0.rowsBetween(0, n)
      case None    => w0.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    }
    first(col(c), ignoreNulls = true).over(w)
  }

  /** Monotonicity probe (reference `_reductions.py:1208-1217`), scale-safe:
    * range-shuffle on the order column, check each range locally (window
    * partitioned by range id), then verify the npartitions-row boundary
    * frame — no full-data single-partition window. */
  def isMonotonicIncreasing(df: DataFrame, c: String, orderCol: String): DataFrame =
    isMonotonic(df, c, orderCol, increasing = true)
  def isMonotonicDecreasing(df: DataFrame, c: String, orderCol: String): DataFrame =
    isMonotonic(df, c, orderCol, increasing = false)

  private def isMonotonic(df: DataFrame, c: String, orderCol: String,
                          increasing: Boolean): DataFrame = {
    val ranged = df.select(col(c), col(orderCol))
      .repartitionByRange(col(orderCol))
      .withColumn("__pid__", spark_partition_id())
    val wIn = Window.partitionBy(col("__pid__")).orderBy(col(orderCol))
    val cmp = if (increasing) "<=" else ">="
    // __lead__ / __trail__: the boundary values a later range compares
    // against — for increasing, every earlier max <= this min; for
    // decreasing, every earlier min >= this max
    val (leadAgg, trailAgg) =
      if (increasing) (min(col(c)), max(col(c))) else (max(col(c)), min(col(c)))
    val local = ranged
      .withColumn("__prev__", lag(col(c), 1).over(wIn))
      .groupBy(col("__pid__"))
      .agg(
        coalesce(expr(s"bool_and(__prev__ IS NULL OR __prev__ $cmp `$c`)"), lit(true))
          .as("__ok__"),
        leadAgg.as("__lead__"), trailAgg.as("__trail__"))
    // Boundary check across ranges: the last non-null trail value from
    // any earlier range must satisfy `cmp` against this range's lead
    // value. npartitions rows — the un-partitioned window is tiny by
    // construction (see globalCumSum), and the closing GLOBAL aggregate
    // guarantees exactly one row even when the input (and hence the
    // range scan) is empty: bool_and over zero rows is NULL → true,
    // matching the vacuous-truth contract of the reference.
    val wP = Window.orderBy(col("__pid__"))
      .rowsBetween(Window.unboundedPreceding, -1)
    local
      .withColumn("__prev_trail__",
        last(col("__trail__"), ignoreNulls = true).over(wP))
      .agg(coalesce(
        expr("bool_and(__ok__ AND (__prev_trail__ IS NULL OR " +
          s"__lead__ IS NULL OR __prev_trail__ $cmp __lead__))"), lit(true))
        .as("is_monotonic"))
  }
}
