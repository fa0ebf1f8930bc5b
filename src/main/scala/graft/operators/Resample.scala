package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-series resample (reference `_resample.py:21-269`).
  *
  * The reference repartitions to resample-bin divisions then runs pandas
  * `.resample()` per partition. Spark's `window()` grouping is the same
  * tumbling-bin aggregation as one hash aggregate — and it is the exact
  * construct that later runs incrementally under Structured Streaming with
  * a watermark (see graft.streaming.Streams), which the reference cannot
  * do at all (SURVEY §2.10).
  */
object Resample {

  def tumble(df: DataFrame, tsCol: String, every: String): DataFrame =
    df.withColumn("__w__", window(col(tsCol), every))
      .withColumn("bucket", col("__w__.start")).drop("__w__")

  def agg(df: DataFrame, tsCol: String, every: String, aggs: Column*): DataFrame =
    tumble(df, tsCol, every)
      .groupBy(col("bucket"))
      .agg(aggs.head, aggs.tail: _*)

  /** OHLC (reference `_resample.py` ohlc): first/max/min/last per bin.
    * open/close need a deterministic within-bin order — `ordCol` must be a
    * totally-ordering expression (e.g. epoch*1e6 + event_id). One
    * aggregation pass via min_by/max_by. */
  def ohlc(df: DataFrame, tsCol: String, every: String, valueCol: String,
           ordCol: Column): DataFrame =
    tumble(df, tsCol, every)
      .groupBy(col("bucket"))
      .agg(
        min_by(col(valueCol), ordCol).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        max_by(col(valueCol), ordCol).as("close"))
}
