package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame
import graft.operators.Joins

class GroupByJoinSpec extends SparkTestBase {

  private def frame = GraftFrame(kv(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0),
    (5L, "a", 20.0), (6L, "b", 60.0)))

  test("groupby agg sum/count") {
    val r = collectSorted(
      frame.groupby("k").agg(sum("v").as("s"), count(lit(1)).as("n")).df, "k")
    assert(r.map(x => (x.getString(0), x.getDouble(1), x.getLong(2))) ==
      Seq(("a", 60.0, 3L), ("b", 80.0, 2L), ("c", 40.0, 1L)))
  }

  test("aggSpec whitelists and names columns") {
    val r = frame.groupby("k").aggSpec(Map("v" -> Seq("sum", "mean")))
    assert(r.columns.toSet == Set("k", "v_sum", "v_mean"))
    val e = intercept[IllegalArgumentException] {
      frame.groupby("k").aggSpec(Map("v" -> Seq("drop table")))
    }
    assert(e.getMessage.contains("unsupported aggregate"))
  }

  test("aggSpec rejects empty spec") {
    intercept[IllegalArgumentException] { frame.groupby("k").aggSpec(Map()) }
  }

  test("agg rejects empty exprs") {
    intercept[IllegalArgumentException] { frame.groupby("k").agg() }
  }

  test("idxmax/idxmin with deterministic tie-break") {
    // k=a has v=20 twice? no: 10,30,20 distinct; add tie via k=b: 20,60
    val r = frame.groupby("k").idxmax("v", "id").df.collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(r == Map("a" -> 3L, "b" -> 6L, "c" -> 4L))
    val tied = GraftFrame(kv((1L, "a", 5.0), (2L, "a", 5.0)))
    // tie on v: smallest id wins (struct tie-break -id for max)
    assert(tied.groupby("a" :: Nil: _*).df.count() >= 0) // noop guard
    val got = tied.groupby("k").idxmax("v", "id").df.collect().head.getLong(1)
    assert(got == 1L)
  }

  test("headPerGroup / tailPerGroup") {
    val h = frame.groupby("k").headPerGroup(1, col("id")).df
    assert(h.collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    val t = frame.groupby("k").tailPerGroup(1, col("id")).df
    assert(t.collect().map(_.getLong(0)).toSet == Set(5L, 6L, 4L))
  }

  test("getGroup multi-key ANDs predicates") {
    val two = GraftFrame(kv(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 1.0)))
      .assign("k2", when(col("v") === 1.0, "x").otherwise("y"))
    val g = two.groupby("k", "k2").getGroup(Seq("a", "x"))
    assert(g.df.collect().map(_.getLong(0)).toSeq == Seq(1L))
    intercept[IllegalArgumentException] {
      two.groupby("k", "k2").getGroup(Seq("a"))
    }
  }

  test("groupby cov/corr match known values") {
    val d = GraftFrame(kv(
      (1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 3.0)))
      .assign("w", col("v") * 2)
    val c = d.groupby("k").cov("v", "w").df.collect().head.getDouble(1)
    assert(math.abs(c - 2.0) < 1e-12) // cov(x, 2x) = 2*var(x) = 2
    val r = d.groupby("k").corr("v", "w").df.collect().head.getDouble(1)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cube produces grand total row") {
    val c = frame.groupby("k").cube(count(lit(1)).as("n")).df
    val total = c.filter(col("k").isNull).collect()
    assert(total.length == 1 && total.head.getLong(1) == 6L)
  }

  test("groupby ffill carries last non-null within group") {
    val d = GraftFrame(kv(
      (1L, "g", 1.0), (2L, "g", 0.0), (3L, "g", 3.0)))
      .assign("v", when(col("id") === 2, lit(null)).otherwise(col("v")))
    val r = collectSorted(d.groupby("k").ffill("v", col("id")).df, "id")
    assert(r.map(_.getDouble(2)) == Seq(1.0, 1.0, 3.0))
  }

  // ---- joins ----

  test("merge suffixes overlapping columns") {
    val l = kv((1L, "a", 1.0))
    val r = kv((1L, "b", 2.0))
    val m = Joins.merge(l, r, Seq("id"), "inner")
    assert(m.columns.toSet == Set("id", "k_x", "v_x", "k_y", "v_y"))
  }

  test("merge outer keeps both sides") {
    val l = kv((1L, "a", 1.0), (2L, "b", 2.0))
    val r = kv((2L, "c", 3.0), (3L, "d", 4.0))
    assert(Joins.merge(l, r, Seq("id"), "outer").count() == 3)
    assert(Joins.merge(l, r, Seq("id"), "left").count() == 2)
    assert(Joins.merge(l, r, Seq("id"), "inner").count() == 1)
  }

  test("semi and anti joins") {
    val l = kv((1L, "a", 1.0), (2L, "b", 2.0))
    val r = kv((2L, "x", 0.0))
    assert(Joins.semi(l, r, Seq("id")).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(Joins.anti(l, r, Seq("id")).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("mergeIndicator labels provenance and suffixes overlaps") {
    val l = kv((1L, "a", 1.0), (2L, "b", 2.0))
    val r = kv((2L, "x", 0.0), (3L, "y", 9.0))
    val m = Joins.mergeIndicator(l, r, Seq("id"))
    val byId = m.collect().map(x => x.getLong(0) -> x.getString(m.columns.indexOf("_merge"))).toMap
    assert(byId == Map(1L -> "left_only", 2L -> "both", 3L -> "right_only"))
    assert(m.columns.contains("v_x") && m.columns.contains("v_y"))
  }

  test("saltedJoin equals plain join") {
    val big = kv((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
    val small = kv((1L, "q", 0.0), (3L, "r", 0.0)).select("id", "k")
      .withColumnRenamed("k", "k2")
    val plain = big.join(small, Seq("id")).count()
    val salted = Joins.saltedJoin(big, small, "id", 4).count()
    assert(plain == salted)
  }

  test("asofJoin: earlier rows get nulls, duplicates preserved, exact ts matches") {
    val tsSchema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("t", LongType), StructField("lv", DoubleType)))
    val left = df(tsSchema,
      Row(1L, "g", 5L, 1.0),   // before any right row -> null
      Row(2L, "g", 10L, 2.0),  // exact match at t=10
      Row(3L, "g", 10L, 3.0),  // duplicate left ts must survive
      Row(4L, "g", 20L, 4.0),  // latest right <= 20 is t=15
      Row(5L, "h", 50L, 5.0))  // no right rows for group h -> null
    val rightSchema = StructType(Seq(
      StructField("g", StringType), StructField("t", LongType),
      StructField("rv", DoubleType)))
    val right = df(rightSchema,
      Row("g", 10L, 100.0), Row("g", 15L, 150.0))
    val out = Joins.asofJoin(left, right, "t", "t", Seq("g"))
    val got = out.collect().map(r =>
      r.getLong(out.columns.indexOf("id")) ->
        (if (r.isNullAt(out.columns.indexOf("rv"))) None
         else Some(r.getDouble(out.columns.indexOf("rv"))))).toMap
    assert(got == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(150.0), 5L -> None))
    assert(out.count() == 5) // every left row survives
  }

  test("asofJoin forward/nearest/tolerance directions") {
    val tsSchema = StructType(Seq(
      StructField("id", LongType), StructField("g", StringType),
      StructField("t", LongType), StructField("lv", DoubleType)))
    val left = df(tsSchema,
      Row(1L, "g", 5L, 1.0),   // forward -> t=10; backward -> null
      Row(2L, "g", 10L, 2.0),  // exact match both directions
      Row(3L, "g", 12L, 3.0),  // nearest: b=10 (d2) vs f=15 (d3) -> 10
      Row(4L, "g", 13L, 4.0),  // nearest: b=10 (d3) vs f=15 (d2) -> 15
      Row(5L, "g", 30L, 5.0))  // forward -> null; backward -> t=15
    val rightSchema = StructType(Seq(
      StructField("g", StringType), StructField("t", LongType),
      StructField("rv", DoubleType)))
    val right = df(rightSchema, Row("g", 10L, 100.0), Row("g", 15L, 150.0))
    def vals(direction: String, tol: Option[Long] = None): Map[Long, Option[Double]] = {
      val out = Joins.asofJoin(left, right, "t", "t", Seq("g"), direction, tol)
      out.collect().map(r =>
        r.getLong(out.columns.indexOf("id")) ->
          (if (r.isNullAt(out.columns.indexOf("rv"))) None
           else Some(r.getDouble(out.columns.indexOf("rv"))))).toMap
    }
    assert(vals("forward") == Map(
      1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(150.0),
      4L -> Some(150.0), 5L -> None))
    assert(vals("nearest") == Map(
      1L -> Some(100.0), 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(150.0), 5L -> Some(150.0)))
    // mid-point (12 vs b=10,f=15... use a symmetric case): id=3 at t=12
    // is 2 from 10 and 3 from 15 -> backward; tie (equidistant) -> backward
    // tolerance 3 (numeric ts units): backward match farther than 3 nulls
    assert(vals("backward", Some(3L)) == Map(
      1L -> None, 2L -> Some(100.0), 3L -> Some(100.0),
      4L -> Some(100.0), 5L -> None)) // id=5: 30-15=15 > 3 -> null
    // allow_exact_matches=false: the t=10 left rows may no longer take
    // the t=10 right row — strictly-earlier only, so they get null
    val strict = Joins.asofJoin(left, right, "t", "t", Seq("g"),
      allowExactMatches = false)
    val sm = strict.collect().map(r =>
      r.getLong(strict.columns.indexOf("id")) ->
        (if (r.isNullAt(strict.columns.indexOf("rv"))) None
         else Some(r.getDouble(strict.columns.indexOf("rv"))))).toMap
    assert(sm == Map(
      1L -> None, 2L -> None, 3L -> Some(100.0),
      4L -> Some(100.0), 5L -> Some(150.0)))
  }

  test("asofJoinOn joins differently-named by-keys, output keeps left names") {
    val ls = StructType(Seq(StructField("lg", StringType),
      StructField("t", LongType), StructField("lv", DoubleType)))
    val rs = StructType(Seq(StructField("rg", StringType),
      StructField("t", LongType), StructField("rv", DoubleType)))
    val left = df(ls, Row("g", 20L, 1.0))
    val right = df(rs, Row("g", 10L, 100.0))
    val out = Joins.asofJoinOn(left, right, "t", "t", Seq("lg"), Seq("rg"))
    assert(out.columns.contains("lg") && !out.columns.contains("rg"))
    assert(out.collect().head.getAs[Double]("rv") == 100.0)
  }

  test("asofJoin carries the matched row's NULL value, not an older row's") {
    // the r7 struct refactor's exact bug class: the matched right row has
    // a NULL value column; a per-column ignoreNulls fill would borrow the
    // older row's 100.0 — the matched row must carry AS A UNIT
    val rightSchema = StructType(Seq(
      StructField("g", StringType), StructField("t", LongType),
      StructField("rv", DoubleType)))
    val left = df(StructType(Seq(
        StructField("id", LongType), StructField("g", StringType),
        StructField("t", LongType))),
      Row(1L, "g", 25L), Row(2L, "g", 12L))
    val right = df(rightSchema,
      Row("g", 10L, 100.0), Row("g", 20L, null))
    for (direction <- Seq("backward", "nearest")) {
      val out = Joins.asofJoin(left, right, "t", "t", Seq("g"), direction)
      val got = out.collect().map(r =>
        r.getLong(out.columns.indexOf("id")) ->
          (if (r.isNullAt(out.columns.indexOf("rv"))) None
           else Some(r.getDouble(out.columns.indexOf("rv"))))).toMap
      // id=1 matches the t=20 row (null value) in both directions;
      // id=2 still sees t=10's 100.0
      assert(got == Map(1L -> None, 2L -> Some(100.0)), s"direction=$direction")
    }
    // tolerance measures against the MATCHED row's ts (20), not the ts of
    // some non-null value donor (10): distance 5 <= 6 keeps the match
    val tol = Joins.asofJoin(left, right, "t", "t", Seq("g"),
      tolerance = Some(6L))
    val tm = tol.collect().map(r =>
      r.getLong(tol.columns.indexOf("id")) ->
        (if (r.isNullAt(tol.columns.indexOf("rv"))) None
         else Some(r.getDouble(tol.columns.indexOf("rv"))))).toMap
    assert(tm == Map(1L -> None, 2L -> Some(100.0)))
  }

  test("asofJoinGlobal matches constant-by asofJoin across directions") {
    import org.apache.spark.sql.functions._
    // enough rows to span several range partitions (4 shuffle partitions
    // in the test session), interleaved left/right timestamps, plus a
    // planted NULL right value so the struct carry is exercised globally
    val left = spark.range(0, 200).toDF("id")
      .select(col("id"), (col("id") * 7 % 501).as("t"))
    val right = spark.range(0, 50).toDF("rid")
      .select((col("rid") * 11 % 499).as("t"),
        when(col("rid") % 5 =!= 0, col("rid").cast("double")).as("rv"))
    val withBy = (d: org.apache.spark.sql.DataFrame) => d.withColumn("__g__", lit(1))
    for (direction <- Seq("backward", "forward", "nearest")) {
      val global = Joins.asofJoinGlobal(left, right, "t", "t", direction)
        .orderBy("id").collect().map(_.toSeq).toSeq
      val keyed = Joins.asofJoin(withBy(left), right.withColumn("__g__", lit(1)),
          "t", "t", Seq("__g__"), direction)
        .drop("__g__").select("id", "t", "rv")
        .orderBy("id").collect().map(_.toSeq).toSeq
      val g2 = Joins.asofJoinGlobal(left, right, "t", "t", direction)
        .select("id", "t", "rv").orderBy("id").collect().map(_.toSeq).toSeq
      assert(g2 == keyed, s"direction=$direction: global != single-key reference")
      assert(global.size == 200)
    }
    // tolerance + strict parity through the same carry machinery
    val gt = Joins.asofJoinGlobal(left, right, "t", "t",
        tolerance = Some(10L), allowExactMatches = false)
      .select("id", "t", "rv").orderBy("id").collect().map(_.toSeq).toSeq
    val kt = Joins.asofJoin(withBy(left), right.withColumn("__g__", lit(1)),
        "t", "t", Seq("__g__"), tolerance = Some(10L), allowExactMatches = false)
      .select("id", "t", "rv").orderBy("id").collect().map(_.toSeq).toSeq
    assert(gt == kt)
  }

  test("asofJoinGlobal plans ONE range exchange; every other descent reuses") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.catalyst.plans.physical.RangePartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // the r8 plan executed the scan+union+range-shuffle pipeline TWICE
    // (carries branch pruned narrower -> no stage reuse); the ordTail fix
    // makes both branches consume the full exchange output, so the second
    // descent must plan as a ReusedExchange over ONE physical range shuffle
    val left = spark.range(0, 200).toDF("id")
      .select(col("id"), (col("id") * 7 % 501).as("t"))
    val right = spark.range(0, 50).toDF("rid")
      .select((col("rid") * 11 % 499).as("t"),
        when(col("rid") % 5 =!= 0, col("rid").cast("double")).as("rv"))
    for (direction <- Seq("backward", "forward", "nearest")) {
      val out = Joins.asofJoinGlobal(left, right, "t", "t", direction)
      out.collect() // materialize: reuse decisions land in the AQE final plan
      val nodes = graft.plans.PlanReport.nodes(out)
      val rangeEx = nodes.collect {
        case s: ShuffleExchangeExec
            if s.outputPartitioning.isInstanceOf[RangePartitioning] => s
      }
      assert(rangeEx.size == 1,
        s"direction=$direction: ${rangeEx.size} physical range exchanges " +
          s"(union pipeline executed more than once)\n" +
          out.queryExecution.executedPlan.toString)
      val rep = graft.plans.PlanReport.of(out)
      assert(rep.reusedExchanges >= 1,
        s"direction=$direction: no ReusedExchange in final plan")
    }
  }

  test("asofJoinOn refuses missing right by-columns and rename clashes") {
    val ls = StructType(Seq(StructField("lg", StringType),
      StructField("t", LongType), StructField("lv", DoubleType)))
    val rs = StructType(Seq(StructField("rg", StringType),
      StructField("t", LongType), StructField("rv", DoubleType)))
    val left = df(ls, Row("g", 20L, 1.0))
    val right = df(rs, Row("g", 10L, 100.0))
    val e1 = intercept[IllegalArgumentException] {
      Joins.asofJoinOn(left, right, "t", "t", Seq("lg"), Seq("nope"))
    }
    assert(e1.getMessage.contains("missing"))
    // right already has a column named like the left by-key: the rename
    // would silently create a duplicate `lg` — must refuse instead
    val rightClash = right.withColumn("lg", lit("x"))
    val e2 = intercept[IllegalArgumentException] {
      Joins.asofJoinOn(left, rightClash, "t", "t", Seq("lg"), Seq("rg"))
    }
    assert(e2.getMessage.contains("lg"))
  }

  test("streaming parquet sink lands each batch exactly once") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("stream_pq").toString
    val in = MemoryStream[(Long, Double)]
    val q = graft.streaming.Streams.toParquetSink(
        in.toDF().toDF("id", "v"), s"$dir/data", s"$dir/ckpt")
      .start()
    try {
      in.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      in.addData((3L, 3.0))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$dir/data")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == Map(1L -> 1.0, 2L -> 2.0, 3L -> 3.0))
    } finally {
      q.stop()
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("asofJoin refuses empty by-keys (single-task global window)") {
    val s = StructType(Seq(StructField("t", LongType), StructField("v", DoubleType)))
    val l = df(s, Row(1L, 1.0))
    val r = df(s, Row(1L, 2.0))
    val e = intercept[IllegalArgumentException] {
      Joins.asofJoin(l, r, "t", "t", Seq.empty)
    }
    assert(e.getMessage.contains("asofJoin"))
  }

  test("aggSpec nunique_approx is near exact on small groups") {
    val f = GraftFrame(kv(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 2.0), (4L, "b", 5.0)))
    val r = f.groupby("k").aggSpec(Map("v" -> Seq("nunique_approx"))).df
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("a" -> 2L, "b" -> 1L)) // HLL exact at this cardinality
  }

  test("groupby firstBy/lastBy/median/prod/rolling sugar") {
    val f = GraftFrame(kv(
      (1L, "a", 2.0), (2L, "a", 3.0), (3L, "a", 4.0), (4L, "b", 5.0)))
    val first = f.groupby("k").firstBy("v", "id").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(first == Map("a" -> 2.0, "b" -> 5.0))
    val last = f.groupby("k").lastBy("v", "id").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(last == Map("a" -> 4.0, "b" -> 5.0))
    val med = f.groupby("k").median("v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(med == Map("a" -> 3.0, "b" -> 5.0))
    val prod = f.groupby("k").prod("v").df.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prod == Map("a" -> 24.0, "b" -> 5.0))
    val roll = f.groupby("k").rolling("id", 2)
    val sums = roll.withColumnRolled("rs", roll.sum("v")).df.collect()
      .map(r => (r.getLong(0), r.getDouble(3))).toMap
    assert(sums == Map(1L -> 2.0, 2L -> 5.0, 3L -> 7.0, 4L -> 5.0))
  }

  test("align reindexes both frames to the joined key set with fill") {
    import graft.api.GraftFrame
    val a = GraftFrame(kv((1L, "a", 1.0), (2L, "b", 2.0)).select("id", "v"))
    val b = GraftFrame(kv((2L, "b", 20.0), (3L, "c", 30.0)).select("id", "v")
      .withColumnRenamed("v", "w"))
    val (l, r) = a.align(b, Seq("id"), "outer", Some(lit(-1.0)))
    assert(collectSorted(l.df, "id").map(x => (x.getLong(0), x.getDouble(1))) ==
      Seq((1L, 1.0), (2L, 2.0), (3L, -1.0)))
    assert(collectSorted(r.df, "id").map(x => (x.getLong(0), x.getDouble(1))) ==
      Seq((1L, -1.0), (2L, 20.0), (3L, 30.0)))
    val (li, _) = a.align(b, Seq("id"), "inner")
    assert(li.df.count() == 1)
  }
}
