package graft

import org.apache.spark.sql.functions._

import graft.operators.{Reductions, Resample}

class ReductionsSpec extends SparkTestBase {

  private def d = kv(
    (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 2.0), (4L, "b", 2.0),
    (5L, "c", 3.0), (6L, "c", 3.0))

  test("mode breaks count ties by smallest value") {
    // 2.0 and 3.0 both appear twice; smallest wins
    val m = Reductions.mode(d, "v").collect().head.getDouble(0)
    assert(m == 2.0)
  }

  test("valueCounts normalize sums to 1 and orders desc") {
    val r = Reductions.valueCounts(d, "k", normalize = true).collect()
    assert(math.abs(r.map(_.getDouble(1)).sum - 1.0) < 1e-12)
    assert(r.map(_.getDouble(1)).toSeq == r.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("describeNumeric and describeNonNumeric shapes and values") {
    val num = Reductions.describeNumeric(d, "v").collect().head
    assert(num.getLong(0) == 6L && num.getDouble(3) == 1.0 && num.getDouble(7) == 3.0)
    val non = Reductions.describeNonNumeric(d, "k").collect().head
    assert(non.getLong(non.fieldIndex("count")) == 6L)
    assert(non.getLong(non.fieldIndex("unique")) == 3L)
    assert(non.getString(non.fieldIndex("top")) == "a") // tie a/b/c all 2 -> smallest
    assert(non.getLong(non.fieldIndex("freq")) == 2L)
  }

  test("nunique exact; approx within rsd ballpark") {
    assert(Reductions.nunique(d, "k").collect().head.getLong(0) == 3L)
    val approx = Reductions.nuniqueApprox(d, "k").collect().head.getLong(0)
    assert(approx >= 2L && approx <= 4L)
  }

  test("quantiles of a known distribution") {
    val q = Reductions.quantiles(d, "v", Seq(0.5)).collect().head.getSeq[Double](0)
    assert(q.head == 2.0)
  }

  test("resample tumbling agg buckets by hour") {
    val e = df(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 10:15:00"), 1.0),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 10:45:00"), 2.0),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 11:05:00"), 5.0))
    val r = Resample.agg(e, "ts", "1 hour", sum("v").as("s"))
      .orderBy("bucket").collect()
    assert(r.length == 2 && r(0).getDouble(1) == 3.0 && r(1).getDouble(1) == 5.0)
  }

  test("resample ohlc picks first/last by order column") {
    val e = df(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("ord", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType))),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), 1L, 10.0),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 10:25:00"), 2L, 30.0),
      org.apache.spark.sql.Row(java.sql.Timestamp.valueOf("2024-01-01 10:55:00"), 3L, 20.0))
    val r = Resample.ohlc(e, "ts", "1 hour", "v", col("ord")).collect().head
    assert(r.getDouble(r.fieldIndex("open")) == 10.0)
    assert(r.getDouble(r.fieldIndex("high")) == 30.0)
    assert(r.getDouble(r.fieldIndex("low")) == 10.0)
    assert(r.getDouble(r.fieldIndex("close")) == 20.0)
  }

  test("sizeInBytes returns positive stat without reading data") {
    assert(Reductions.sizeInBytes(d) > 0)
  }
}
