package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame

class RowOpsSpec extends SparkTestBase {

  private def frame = GraftFrame(kv(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0)))

  test("toParquet refuses to overwrite a path the plan reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ow").toString
    val p = s"$dir/t"
    GraftFrame(kv((1L, "a", 1.0))).toParquet(p)
    val f = GraftFrame(spark.read.parquet(p)).filter(col("v") > 0)
    intercept[IllegalArgumentException] { f.toParquet(p) }
    f.toParquet(s"$dir/t2")                           // different path ok
    GraftFrame(kv((2L, "b", 2.0))).toParquet(p)       // non-reading frame ok
  }

  test("introspection: shape, size, dtypes, ndim, empty") {
    val f = GraftFrame(kv((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(f.shape == (2L, 3))
    assert(f.size == 6L)
    assert(f.ndim == 2)
    assert(f.dtypes == Seq("id" -> "bigint", "k" -> "string", "v" -> "double"))
    assert(!f.empty && GraftFrame(kv()).empty)
    val inf = f.info()
    assert(inf.contains("3 columns") && inf.contains("2 rows") &&
      inf.contains("k  string") && inf.contains("estimated size"))
  }

  test("fromDict builds a typed frame from column-oriented data") {
    val f = GraftFrame.fromDict(spark, Seq(
      "id" -> Seq(1, 2, 3),
      "name" -> Seq("a", null, "c"),
      "score" -> Seq(1.5, 2.5, null),
      "ok" -> Seq(true, false, true)))
    val sch = f.df.schema.map(s => s.name -> s.dataType.simpleString)
    assert(sch == Seq("id" -> "bigint", "name" -> "string",
      "score" -> "double", "ok" -> "boolean"))
    val r = f.df.orderBy("id").collect()
    assert(r.length == 3 && r(1).isNullAt(1) && r(2).isNullAt(2))
    assert(r(0).getLong(0) == 1L && r(0).getString(1) == "a" &&
      r(0).getDouble(2) == 1.5 && r(0).getBoolean(3))
  }

  test("select keeps only named columns") {
    assert(frame.select("id", "v").columns == Seq("id", "v"))
  }

  test("filter keeps matching rows") {
    assert(frame.filter(col("v") > 15.0).df.count() == 3)
  }

  test("query string predicate") {
    assert(frame.query("v >= 20.0 AND k = 'a'").df.count() == 1)
  }

  test("assign adds computed column") {
    val r = collectSorted(frame.assign("double_v", col("v") * 2).df, "id")
    assert(r.map(_.getDouble(3)) == Seq(20.0, 40.0, 60.0, 80.0))
  }

  test("eval string expression") {
    val r = collectSorted(frame.eval("w", "v + id").df, "id")
    assert(r.head.getDouble(3) == 11.0)
  }

  test("drop and rename") {
    val f = frame.drop("k").rename("v" -> "value")
    assert(f.columns == Seq("id", "value"))
  }

  test("addPrefix / addSuffix") {
    assert(frame.addPrefix("p_").columns == Seq("p_id", "p_k", "p_v"))
    assert(frame.addSuffix("_s").columns == Seq("id_s", "k_s", "v_s"))
  }

  test("astype casts") {
    val f = frame.astype("id" -> IntegerType)
    assert(f.schema("id").dataType == IntegerType)
  }

  test("fillna fills only nulls") {
    val withNull = frame.assign("v", when(col("id") === 2, lit(null)).otherwise(col("v")))
    val r = collectSorted(withNull.fillna(-1.0, Seq("v")).df, "id")
    assert(r.map(_.getDouble(2)) == Seq(10.0, -1.0, 30.0, 40.0))
  }

  test("dropna removes null rows") {
    val withNull = frame.assign("v", when(col("id") === 2, lit(null)).otherwise(col("v")))
    assert(withNull.dropna(subset = Seq("v")).df.count() == 3)
  }

  test("replace maps values") {
    val r = collectSorted(frame.replace("k", Map("a" -> "z")).df, "id")
    assert(r.map(_.getString(1)) == Seq("z", "b", "z", "c"))
  }

  test("mask replaces where cond holds, whereKeep keeps where cond holds") {
    val m = collectSorted(frame.mask("v", col("v") > 25.0, lit(0.0)).df, "id")
    assert(m.map(_.getDouble(2)) == Seq(10.0, 20.0, 0.0, 0.0))
    val w = collectSorted(frame.whereKeep("v", col("v") > 25.0, lit(0.0)).df, "id")
    assert(w.map(_.getDouble(2)) == Seq(0.0, 0.0, 30.0, 40.0))
  }

  test("isinFilter") {
    assert(frame.isinFilter("k", Seq("a", "c")).df.count() == 3)
  }

  test("clip bounds values") {
    val r = collectSorted(frame.clip("v", 15.0, 35.0).df, "id")
    assert(r.map(_.getDouble(2)) == Seq(15.0, 20.0, 30.0, 35.0))
  }

  test("seriesMap with default") {
    val r = collectSorted(
      frame.seriesMap("k", "code", Map("a" -> 1, "b" -> 2), Some(-1)).df, "id")
    assert(r.map(_.getInt(3)) == Seq(1, 2, 1, -1))
  }

  test("seriesMap unmapped -> null without default") {
    val r = collectSorted(frame.seriesMap("k", "code", Map("a" -> 1)).df, "id")
    assert(r(3).isNullAt(3))
  }

  test("head and tail") {
    assert(frame.sortValues(Seq("id" -> true)).head(2).df.count() == 2)
    val tl = collectSorted(frame.tail(2, Seq("id" -> true)).df, "id")
    assert(tl.map(_.getLong(0)) == Seq(3L, 4L))
  }

  test("nlargest / nsmallest") {
    assert(frame.nlargest(1, "v").df.collect().head.getDouble(2) == 40.0)
    assert(frame.nsmallest(1, "v").df.collect().head.getDouble(2) == 10.0)
  }

  test("explodeCol with positions") {
    val f = GraftFrame(df(
      StructType(Seq(StructField("id", LongType),
        StructField("arr", ArrayType(StringType)))),
      Row(1L, Seq("x", "y"))))
    val r = collectSorted(f.explodeCol("arr", "pos", "w").df, "id", "pos")
    assert(r.map(row => (row.getInt(1), row.getString(2))) == Seq((0, "x"), (1, "y")))
  }

  test("combineFirst fills holes from other") {
    val base = frame.assign("v", when(col("id") === 1, lit(null)).otherwise(col("v")))
      .select("id", "v")
    val fb = frame.select("id", "v")
    val r = collectSorted(base.combineFirst(fb, Seq("id")).df, "id")
    assert(r.map(_.getDouble(1)) == Seq(10.0, 20.0, 30.0, 40.0))
  }

  test("concat axis0 unions by name") {
    val c = frame.select("id", "v").concat(frame.select("id", "v"))
    assert(c.df.count() == 8)
  }

  test("concatAxis1 aligns on key") {
    val a = frame.select("id", "k")
    val b = frame.select("id", "v")
    val r = a.concatAxis1(b, Seq("id"))
    assert(r.columns.toSet == Set("id", "k", "v") && r.df.count() == 4)
  }

  test("intersect / except") {
    val a = frame.filter(col("v") > 15.0).select("id")
    val b = frame.filter(col("v") < 35.0).select("id")
    assert(a.intersect(b).df.collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(a.except(b).df.collect().map(_.getLong(0)).toSet == Set(4L))
  }

  test("dropDuplicates keeps min-order row per key") {
    val r = frame.dropDuplicates(Seq("k"), col("id")).df
    assert(r.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
  }

  test("applyRows row-wise transform") {
    val out = frame.select("id", "v").applyRows(
      StructType(Seq(StructField("id", LongType), StructField("y", DoubleType))))(
      r => Row(r.getLong(0), r.getDouble(1) + 1.0))
    assert(collectSorted(out.df, "id").map(_.getDouble(1)) == Seq(11.0, 21.0, 31.0, 41.0))
  }

  test("fromLocal round-trips rows and partitions") {
    val f = GraftFrame.fromLocal(spark, kvSchema,
      Seq(Row(1L, "x", 1.0), Row(2L, "y", 2.0)), npartitions = 2)
    assert(f.df.rdd.getNumPartitions == 2 && f.df.count() == 2)
  }

  test("fromDelayed: one partition per thunk, evaluated at scan time not build time") {
    val schema = StructType(Seq(
      StructField("p", IntegerType), StructField("v", IntegerType)))
    RowOpsSpec.delayedRuns.set(0)
    val f = GraftFrame.fromDelayed(spark, schema, (0 until 3).map(p =>
      () => {
        RowOpsSpec.delayedRuns.incrementAndGet()
        (0 until 2).iterator.map(i => Row(p, p * 10 + i))
      }))
    // plan resolution alone must not run any thunk (local mode shares
    // the JVM, so the executor-side increments are visible here)
    assert(f.df.schema.fieldNames.sameElements(Array("p", "v")))
    assert(RowOpsSpec.delayedRuns.get() == 0,
      "thunks must be deferred until an action")
    assert(f.df.rdd.getNumPartitions == 3)
    assert(f.df.count() == 6)
    assert(RowOpsSpec.delayedRuns.get() >= 3,
      "every partition thunk must have run on the executors")
    assert(f.df.select("p").distinct().count() == 3)
  }

  test("fromMap builds partitions from driver-side items") {
    val schema = StructType(Seq(
      StructField("part", IntegerType), StructField("i", IntegerType)))
    val f = GraftFrame.fromMap(spark, Seq(0, 1, 2), schema, npartitions = 3) {
      p => (0 until 2).iterator.map(i => Row(p, i))
    }
    assert(f.df.count() == 6)
    assert(f.df.select("part").distinct().count() == 3)
  }

  test("timeseries generator is deterministic") {
    val a = GraftFrame.timeseries(spark, 1704067200L, 10).df.collect()
    val b = GraftFrame.timeseries(spark, 1704067200L, 10).df.collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 10)
  }
}

object RowOpsSpec {
  /** Executor-visible run counter for the fromDelayed laziness test
    * (static so the task closure serializes without the spec instance;
    * local mode shares the JVM, so the test can read it back). */
  val delayedRuns = new java.util.concurrent.atomic.AtomicInteger(0)
}
