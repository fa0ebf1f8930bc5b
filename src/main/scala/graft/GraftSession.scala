package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session bootstrap with scale-appropriate defaults.
  *
  * Design notes (100 TB target):
  *  - `spark.sql.shuffle.partitions` is sized for the local harness (32);
  *    on a real cluster AQE coalesces / splits post-shuffle partitions from
  *    runtime statistics, so the static value only seeds the initial plan.
  *  - AQE is on: runtime broadcast-join demotion/promotion, skew-join
  *    splitting and partition coalescing are exactly the knobs the reference
  *    implements by hand (split_out tuning, broadcast heuristics —
  *    reference `_merge.py:168-203`, `_groupby.py:142-150`); Spark does them
  *    from observed sizes instead of estimates.
  *  - 128 MiB file-split size matches the reference's parquet blocksize
  *    (reference `io/parquet.py:511-521`).
  */
object GraftSession {
  def builder(master: String = "local[*]", appName: String = "graft")
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Cached plans use AQE too (default false): the pipeline chain
      // persists 3-4 stage boundaries per build, and without this every
      // shuffle BELOW a persisted boundary is frozen at the static
      // shuffle-partition seed — 32 tasks per tiny stage locally, and at
      // cluster scale cached partitions that ignore runtime statistics.
      // AQE right-sizes them from observed bytes in both regimes
      // (measured r16: q_pipeline_e2e 1078→181 tasks, −2.3 s).
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def getOrCreate(): SparkSession = builder().getOrCreate()

  /** Table loader for the driver-provided TPC-H-ish directories.
    *
    * `events.parquet` carries TIMESTAMP(NANOS) which the Spark reader
    * rejects; with `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * Verify/Bench/builder) it arrives as a nanosecond LongType, converted
    * here to TIMESTAMP_NTZ micros — `x div 1000` floor-truncation, the
    * same losless-to-us conversion DuckDB applies, so oracles agree. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      // keyed on the table NAME too: only the driver's events fixture
      // carries TIMESTAMP(NANOS); a user table with a legitimate bigint
      // 'ts' (e.g. epoch millis) must not be reinterpreted (r2 ADVICE)
      if (name == "events" && f.name == "ts" &&
          f.dataType == org.apache.spark.sql.types.LongType)
        d.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000"))
            .cast(org.apache.spark.sql.types.TimestampNTZType))
      else d
    }
  }
}
