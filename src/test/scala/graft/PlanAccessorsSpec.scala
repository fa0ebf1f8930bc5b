package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame
import graft.api.StrOps._
import graft.api.DtOps._

/** Plan-shape assertions (the optimizer checks SURVEY §5 calls for) +
  * accessor-family value checks. */
class PlanAccessorsSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("filter + projection reach the parquet scan (PushedFilters/ReadSchema)") {
    val d = GraftFrame.readParquet(spark, s"$sf/orders.parquet")
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice").df
    val plan = d.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(o_totalprice"),
      s"predicate not pushed:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("o_orderpriority"),
      "projection not pruned to scan")
  }

  test("locRange filters inclusively, pushes to scan, and refuses no-index") {
    val f = GraftFrame.readParquet(spark, s"$sf/customer.parquet")
      .setIndex("c_custkey")
    val sliced = f.locRange(Some(10L), Some(20L))
    val keys = sliced.df.select("c_custkey").collect().map(_.getLong(0)).sorted
    assert(keys.head == 10L && keys.last == 20L && keys.length == 11)
    val plan = sliced.df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(c_custkey") &&
      plan.contains("LessThanOrEqual(c_custkey"),
      s"label-slice bounds not pushed:\n$plan")
    // open upper bound
    val open = f.locRange(lo = Some(1495L))
    assert(open.df.count() == open.df.filter(col("c_custkey") >= 1495L).count())
    // no index -> refuse
    intercept[IllegalArgumentException] {
      GraftFrame.readParquet(spark, s"$sf/customer.parquet").locRange(Some(1L), None)
    }
  }

  test("rolling aggSpec computes all members in a single WindowExec") {
    val roll = api.Rolling(kv(
      (1L, "g", 1.0), (2L, "g", 2.0), (3L, "g", 4.0), (4L, "h", 8.0)),
      Seq("k"), "id", window = 2)
    val out = roll.aggSpec(Seq("v" -> Seq("sum", "mean", "min", "max", "count")))
    val rows = collectSorted(out.df, "id")
    val iSum = out.df.columns.indexOf("v_sum")
    assert(rows(1).getDouble(iSum) == 3.0)   // 1+2
    assert(rows(2).getDouble(iSum) == 6.0)   // 2+4
    assert(rows(3).getDouble(iSum) == 8.0)   // h group restarts
    val nWindows = out.df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Window ["))
    assert(nWindows == 1, s"expected one WindowExec, saw $nWindows")
    intercept[IllegalArgumentException] { roll.aggSpec(Seq("v" -> Seq("nope"))) }
  }

  test("q_tpch_q19: disjunctive predicate bounds reach both scans") {
    // Catalyst's constraint propagation must derive the per-side
    // implications of the OR-of-conjunctions (quantity windows on
    // lineitem, brand/size on part) and push them into the scans — at
    // 100 TB this is the difference between reading three quantity bands
    // and reading everything.
    // FileScan metadata is truncated at spark.sql.maxMetadataStringLength
    // (default 100): with large expression ids the Brand literal falls
    // past the cutoff, so widen it for the duration of the assertion.
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val plan =
      try SparkEntry.queries("q_tpch_q19")(spark, sf)
        .queryExecution.sparkPlan.toString
      finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    assert("FileScan parquet \\[l_partkey[^\\n]*l_quantity[^\\n]*>=".r
      .findFirstIn(plan).isDefined, "lineitem scan lost its quantity bounds")
    assert("FileScan parquet \\[p_partkey[^\\n]*p_brand[^\\n]*Brand#12".r
      .findFirstIn(plan).isDefined, "part scan lost its brand/size filter")
  }

  test("flagship decimal agg is bit-identical across shuffle partition counts") {
    // The QHelp determinism claim, tested directly: every double output
    // flows through order-independent decimal accumulation, so changing
    // the partition count (and thus partial-aggregation merge order) must
    // not move a single bit. A raw double sum would fail this.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    def run(n: String): Seq[org.apache.spark.sql.Row] = {
      spark.conf.set("spark.sql.shuffle.partitions", n)
      try QueriesAgg.q1Pricing(spark, sf).collect().toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("3") == run("29"))
  }

  test("bucketed tables co-locate the join: no shuffle exchange on either side") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val d = GraftFrame(kv((1L to 200L).map(i => (i, s"k${i % 7}", i.toDouble)): _*))
    d.toBucketedTable("bt1", s"$tmp/t1", 4, Seq("id"), Seq("id"))
    d.toBucketedTable("bt2", s"$tmp/t2", 4, Seq("id"), Seq("id"))
    try {
      val j = spark.table("bt1").join(
        spark.table("bt2").withColumnRenamed("v", "v2").withColumnRenamed("k", "k2"), "id")
      assert(j.count() == 200)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bt1")
      spark.sql("DROP TABLE IF EXISTS bt2")
    }
  }

  test("near-dedup index: corpus side exchange-free, planted cross-shard dups found") {
    import graft.llm.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndi").toString
    try {
      Dedup.writeNearDupIndex(docs, "doc_id", "text", "ndi_t", tmp)
      val shard = docs.filter(col("doc_id") % 11 === 3)
        .withColumn("doc_id", col("doc_id") + 50000)
      val pairs = Dedup.nearDupPairsAgainstIndex(shard, "doc_id", "text",
        "ndi_t", threshold = 0.5)
      // every shard doc is a re-idded corpus copy: its (corpus, shard)
      // pair must surface with jaccard exactly 1.0
      val got = pairs.collect()
      val planted = got.filter(r => r.getLong(1) - 50000 == r.getLong(0))
      assert(planted.nonEmpty && planted.forall(_.getDouble(2) == 1.0))
      assert(planted.size == shard.count())
      // the 100 TB contract: the persisted corpus index is read IN PLACE
      // — both index scans (bands + shingles) sit under NO shuffle
      // exchange; only the new shard's side may exchange
      val sp = pairs.queryExecution.sparkPlan
      def isIdxScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("graft_ndi"))
        case _ => false
      }
      val idxScans = sp.collect { case p if isIdxScan(p) => p }
      assert(idxScans.size == 2, s"expected 2 index scans, got ${idxScans.size}")
      val shuffledIdx = sp.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          ex.collect { case p if isIdxScan(p) => p }
      }.flatten
      assert(shuffledIdx.isEmpty, "index scan rides a shuffle exchange")
    } finally {
      spark.sql("DROP TABLE IF EXISTS ndi_t_bands")
      spark.sql("DROP TABLE IF EXISTS ndi_t_shingles")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("no registered query plans a CartesianProduct") {
    // Every cross join in the library broadcasts a bounded (≤1-row /
    // centroid-count) side, which Spark plans as BroadcastNestedLoopJoin;
    // a CartesianProduct node means an unbounded pairwise blowup — the
    // canonical cluster-scale killer. Sweep EVERY registered query's
    // physical plan so no future query can introduce one unnoticed.
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val plan = fn(spark, sf).queryExecution.sparkPlan.toString
        if (plan.contains("CartesianProduct")) Some(name) else None
      } catch {
        case e: Throwable => Some(s"$name (plan failed: ${String.valueOf(e.getMessage).take(100)})")
      }
    }
    assert(bad.isEmpty, s"cartesian or unplannable queries: $bad")
  }

  test("nlargest plans TakeOrderedAndProject (per-partition top-k, no global sort)") {
    val d = GraftFrame.readParquet(spark, s"$sf/orders.parquet")
      .nlargest(5, "o_totalprice").df
    assert(d.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("broadcast hint produces BroadcastHashJoin") {
    val big = GraftFrame.readParquet(spark, s"$sf/orders.parquet").df
    val small = GraftFrame.readParquet(spark, s"$sf/customer.parquet").df
      .withColumnRenamed("c_custkey", "o_custkey")
    val j = graft.operators.Joins.broadcastMerge(big, small, Seq("o_custkey"))
    assert(j.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
  }

  test("groupBy agg plans partial+final HashAggregate around one exchange") {
    val d = GraftFrame.readParquet(spark, s"$sf/orders.parquet")
      .groupby("o_orderstatus").agg(count(lit(1)).as("n")).df
    val plan = d.queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).length >= 2, "no partial agg")
  }

  test("co-partitioned self-join over cached hash partitioning adds no exchange") {
    val base = GraftFrame.readParquet(spark, s"$sf/customer.parquet")
      .repartitionByKeys(4, "c_custkey").cache()
    base.df.count() // materialize the cache so the join sees its partitioning
    val j = base.df.join(base.df.select(col("c_custkey"), col("c_acctbal").as("b2")), "c_custkey")
    // count real shuffle nodes in the executed tree (the string rendering
    // also shows the exchange INSIDE the cached relation — not a new one)
    val exchanges = j.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.length
    assert(exchanges == 0, s"cached co-partitioned join still shuffles: $exchanges")
    base.df.unpersist()
  }

  test("appendShardToIndex dedups the shard, grows the index, stays bucketed") {
    import graft.llm.Dedup
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 300)
    val tmp = java.nio.file.Files.createTempDirectory("graft_ndapp").toString
    val uniq = "zymurgy quokka paradox lantern gosling fjord velvet marzipan " +
      "obelisk tundra quartz nimbus"
    try {
      Dedup.writeNearDupIndex(docs, "doc_id", "text", "ndapp_t", tmp)
      val corpusText = docs.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val sch = StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType)))
      val shard = df(sch,
        Row(90001L, uniq),                       // survives (cluster min)
        Row(90002L, uniq),                       // internal dup of 90001
        Row(90003L, corpusText),                 // dup of corpus doc 7
        Row(90004L, uniq.reverse.toLowerCase.split(" ").mkString(" ") +
          " axolotl breve cipher dynamo ember")) // unique, survives
      val survivors = Dedup.appendShardToIndex(shard, "doc_id", "text",
        "ndapp_t", tmp, threshold = 0.5)
      assert(survivors.select("doc_id").collect().map(_.getLong(0)).sorted
        .sameElements(Array(90001L, 90004L)))
      // the index GREW: a later shard doc duplicating appended 90001 is
      // caught against the index alone
      val later = df(sch, Row(91000L, uniq))
      val hits = Dedup.nearDupPairsAgainstIndex(later, "doc_id", "text",
        "ndapp_t", threshold = 0.5).collect()
      assert(hits.exists(r => r.getLong(0) == 90001L && r.getLong(1) == 91000L
        && r.getDouble(2) == 1.0), s"appended doc not indexed: ${hits.toSeq}")
      // and the appended files kept the bucket layout: the corpus side of
      // that lookup still reads under no shuffle exchange
      val sp = Dedup.nearDupPairsAgainstIndex(later, "doc_id", "text",
        "ndapp_t", threshold = 0.5).queryExecution.sparkPlan
      val shuffledIdx = sp.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          ex.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.relation.location.rootPaths.exists(_.toString.contains("graft_ndapp")) => s
          }
      }.flatten
      assert(shuffledIdx.isEmpty, "appended index scan rides a shuffle exchange")
      survivors.unpersist()
    } finally {
      spark.sql("DROP TABLE IF EXISTS ndapp_t_bands")
      spark.sql("DROP TABLE IF EXISTS ndapp_t_shingles")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("PlanReport counts exchanges/scans and flags cartesian blowups") {
    import graft.plans.PlanReport
    // broadcast equi-join: one broadcast, no cartesian, scan pruned+pushed
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val part = spark.read.parquet(s"$sf/part.parquet")
    val j = lineitem.filter(col("l_quantity") > 10)
      .select("l_partkey", "l_quantity")
      .join(org.apache.spark.sql.functions.broadcast(
        part.select("p_partkey", "p_name")),
        col("l_partkey") === col("p_partkey"))
    val r = PlanReport.of(j)
    assert(r.scaleSafe && r.cartesianProducts == 0)
    assert(r.broadcastExchanges == 1, s"expected 1 broadcast: $r")
    val liScan = r.scans.find(_.readColumns.contains("l_quantity")).get
    assert(liScan.readColumns.toSet == Set("l_partkey", "l_quantity"),
      s"column pruning did not reach the scan: ${liScan.readColumns}")
    assert(liScan.pushedFilters.contains("GreaterThan"),
      s"filter not pushed: '${liScan.pushedFilters}'")
    PlanReport.assertScaleSafe(j)
    // unkeyed crossJoin of two non-broadcast frames IS the blowup (the
    // hint models big-big: at sf0.001 both sides fit the broadcast
    // threshold and Spark would plan BroadcastNestedLoopJoin instead)
    val big1 = lineitem.select("l_orderkey")
    val big2 = lineitem.select(col("l_partkey")).hint("shuffle_replicate_nl")
    val cart = big1.crossJoin(big2)
    assert(PlanReport.of(cart).cartesianProducts == 1)
    intercept[IllegalArgumentException] { PlanReport.assertScaleSafe(cart) }
  }

  // ---- accessors ----

  private def strings = df(
    StructType(Seq(StructField("id", LongType), StructField("s", StringType))),
    Row(1L, "  Hello World  "), Row(2L, "spark-42-engine"))

  test("str accessor family values") {
    val r = collectSorted(strings.select(col("id"),
      col("s").strStrip.as("t"), col("s").strLower.as("lo"),
      col("s").strLen.as("n"), col("s").strContains("World").as("c"),
      col("s").strReplace("[0-9]+", "#").as("rep"),
      col("s").strSplitGet("-", 1).as("mid"),
      col("s").strZfill(20).as("z"),
      col("s").strExtract("([0-9]+)", 1).as("num"),
      col("s").strFind("World").as("f")), "id")
    val h = r.head
    assert(h.getString(1) == "Hello World")
    assert(h.getString(2) == "  hello world  ")
    assert(h.getInt(3) == 15)
    assert(h.getBoolean(4))
    assert(h.getInt(9) == 8) // 0-based find
    val e = r(1)
    assert(e.getString(5) == "spark-#-engine")
    assert(e.getString(6) == "42")
    assert(e.getString(7).length == 20 && e.getString(7).startsWith("0"))
    assert(e.getString(8) == "42")
  }

  test("str predicates") {
    val r = strings.select(
      lit("abc").strIsalpha.as("a"), lit("123").strIsdigit.as("d"),
      lit("ABC").strIsupper.as("u"), lit("a1").strIsalnum.as("an")).collect().head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3))
  }

  test("str breadth: rsplit, partition, encode/decode, center, swapcase") {
    val d = df(StructType(Seq(StructField("s", StringType))),
      Row("a-b-c-d"))
    val r = d.select(
      col("s").strRsplit("-", 1).as("rs"),
      col("s").strPartition("-").as("p"),
      col("s").strRpartition("-").as("rp"),
      col("s").strDecode("utf-8").as("dec_of_enc_fails_placeholder"),
      col("s").strEncode("utf-8").strDecode("utf-8").as("roundtrip"),
      col("s").strCenter(11, "*").as("ctr"),
      lit("aB c1").strSwapcase.as("sw"),
      col("s").strRemoveprefix("a-").as("rmp"),
      col("s").strRemovesuffix("-d").as("rms"),
      lit("Hello World").strIstitle.as("t1"),
      lit("Hello world").strIstitle.as("t2"),
      lit("HEllo").strIstitle.as("t3"),
      lit("Src0 Abc").strIstitle.as("t4")).collect().head
    assert(r.getSeq[String](0) == Seq("a-b-c", "d"))
    assert(r.getSeq[String](1) == Seq("a", "-", "b-c-d"))
    assert(r.getSeq[String](2) == Seq("a-b-c", "-", "d"))
    assert(r.getString(4) == "a-b-c-d")
    assert(r.getString(5) == "**a-b-c-d**")
    assert(r.getString(6) == "Ab C1")
    assert(r.getString(7) == "b-c-d" && r.getString(8) == "a-b-c")
    assert(r.getBoolean(9) && !r.getBoolean(10) && !r.getBoolean(11) && r.getBoolean(12))
  }

  test("dt breadth: isocalendar, to_period, microsecond, tz_localize, secondsBetween") {
    val d = df(
      StructType(Seq(StructField("ts", TimestampType))),
      // 2021-01-01 is ISO week 53 of ISO-year 2020, a Friday
      Row(java.sql.Timestamp.valueOf("2021-01-01 10:30:00.123456")))
    val r = d.select(
      col("ts").dtIsoYear.as("iy"), col("ts").dtIsoDow.as("idw"),
      col("ts").dtIsoCalendar.as("ic"),
      col("ts").dtToPeriod("M").as("pm"), col("ts").dtToPeriod("Q").as("pq"),
      col("ts").dtToPeriod("W").as("pw"),
      col("ts").dtMicrosecond.as("us"), col("ts").dtNanosecond.as("ns"),
      // UTC session: wall 10:30 in New York (UTC-5 in Jan) = 15:30 UTC
      col("ts").dtTzLocalize("America/New_York").as("tzl"),
      graft.api.DtOps.secondsBetween(col("ts").dtNormalize, col("ts")).as("sod"))
      .collect().head
    assert(r.getInt(0) == 2020 && r.getInt(1) == 5)
    assert(r.getStruct(2).getInt(1) == 53)
    assert(r.getString(3) == "2021-01" && r.getString(4) == "2021Q1")
    assert(r.getString(5) == "2020-W53")
    assert(r.getInt(6) == 123456 && r.getInt(7) == 0)
    assert(r.getTimestamp(8).toString == "2021-01-01 15:30:00.123456")
    assert(math.abs(r.getDouble(9) - (10 * 3600 + 30 * 60 + 0.123456)) < 1e-9)
  }

  test("dt accessor family values") {
    val d = df(
      StructType(Seq(StructField("id", LongType), StructField("ts", TimestampType))),
      Row(1L, java.sql.Timestamp.valueOf("2024-03-15 13:45:30")))
    val r = d.select(
      col("ts").dtYear.as("y"), col("ts").dtMonth.as("m"), col("ts").dtDay.as("d"),
      col("ts").dtHour.as("h"), col("ts").dtQuarter.as("q"),
      col("ts").dtDayofweek.as("dw"),            // 2024-03-15 is a Friday -> 4
      col("ts").dtDaysInMonth.as("dim"),
      col("ts").dtIsMonthStart.as("ms"), col("ts").dtIsMonthEnd.as("me"),
      col("ts").dtFloor("hour").as("fl"),
      col("ts").dtStrftime("yyyy-MM-dd HH").as("fmt"),
      col("ts").dtMonthName.as("mn"), col("ts").dtDayName.as("dn")).collect().head
    assert(r.getInt(0) == 2024 && r.getInt(1) == 3 && r.getInt(2) == 15)
    assert(r.getInt(3) == 13 && r.getInt(4) == 1)
    assert(r.getInt(5) == 4)
    assert(r.getInt(6) == 31)
    assert(!r.getBoolean(7) && !r.getBoolean(8))
    assert(r.getTimestamp(9).toString == "2024-03-15 13:00:00.0")
    assert(r.getString(10) == "2024-03-15 13")
    assert(r.getString(11) == "March" && r.getString(12) == "Friday")
  }

  test("dt ceil/round") {
    val d = df(
      StructType(Seq(StructField("ts", TimestampType))),
      Row(java.sql.Timestamp.valueOf("2024-03-15 13:45:30")),
      Row(java.sql.Timestamp.valueOf("2024-03-15 13:00:00")))
    val r = d.select(col("ts").dtCeil("hour").as("c"),
      col("ts").dtRound("hour").as("r")).collect()
    assert(r(0).getTimestamp(0).toString == "2024-03-15 14:00:00.0")
    assert(r(1).getTimestamp(0).toString == "2024-03-15 13:00:00.0") // on boundary
    assert(r(0).getTimestamp(1).toString == "2024-03-15 14:00:00.0") // 45min rounds up
  }

  test("partitionBy write + filtered read prunes partitions at the scan") {
    val path = "/root/repo/target/qtmp/events_by_type"
    val events = GraftFrame(GraftSession.table(spark, "/root/testdata/sf0.001", "events"))
    events.toParquet(path, partitionOn = Seq("event_type"))
    val read = GraftFrame.readParquet(spark, path)
      .filter(col("event_type") === "click").df
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type#") && plan.contains("click"),
      s"partition filter not pushed:\n${plan.take(800)}")
    val full = events.df.filter(col("event_type") === "click").count()
    assert(read.count() == full)
  }

  test("GraftExtensions registers SQL-callable native functions") {
    // getOrCreate() reuses the suite session and ignores withExtensions;
    // clear the active/default session so a NEW session (same context)
    // is built with the extensions, then restore for other suites.
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]").appName("ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT size(minhash_sig(shingle_hashes('a b c d e', 3), 16)) AS n, " +
          "token_stats('x y x').n_tokens AS t, " +
          "top_gram_frac('go go go go stop').top_count AS g")
        .collect().head
      assert(r.getInt(0) == 16 && r.getInt(1) == 3 && r.getInt(2) == 3)
      // r13 additions: simhash / nfc / vector kernels — each result
      // must equal its Scala Column-helper twin on the same session
      val r2 = s2.sql(
        "SELECT simhash('a b c') AS sh, " +
          "nfc_normalize('é') AS nfc, " +
          "dot_long(quantize_int8q(array(1.0d, 2.0d)), " +
          "         quantize_int8q(array(1.0d, 2.0d))) AS d, " +
          "lsh_bucket(array(1.0d, -2.0d), 2, 4) AS b")
        .collect().head
      import org.apache.spark.sql.functions.{lit, typedLit}
      val twin = s2.range(1).select(
        graft.functions.TextHashExprs.simhash(lit("a b c"), 64).as("sh"),
        graft.functions.TextHashExprs.nfcNormalize(lit("é")).as("nfc"),
        graft.functions.TextHashExprs.dotLong(
          graft.functions.TextHashExprs.quantizeInt8Q(
            typedLit(Seq(1.0, 2.0))),
          graft.functions.TextHashExprs.quantizeInt8Q(
            typedLit(Seq(1.0, 2.0)))).as("d"),
        graft.functions.TextHashExprs.lshBucket(
          typedLit(Seq(1.0, -2.0)), 2, 4).as("b"))
        .collect().head
      assert(r2.getLong(0) == twin.getLong(0))
      assert(r2.getString(1) == twin.getString(1) && r2.getString(1) == "é")
      assert(r2.getLong(2) == twin.getLong(2))
      assert(r2.get(3) == twin.get(3))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(base)
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
    }
  }

  test("streaming windowed agg over a memory stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val streamDf = input.toDF().toDF("ts", "k", "v")
    val agg = graft.streaming.Streams.windowedAgg(
      streamDf, "ts", "10 minutes", "5 minutes", Seq("k"),
      sum($"v").as("s"))
    val q = graft.streaming.Streams.toMemorySink(agg, "win_test",
      org.apache.spark.sql.streaming.OutputMode.Update()).start()
    try {
      input.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "a", 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "a", 2.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:11:00"), "b", 5.0))
      q.processAllAvailable()
      val out = spark.table("win_test").collect()
        .map(r => (r.getAs[String]("k"), r.getAs[Double]("s"))).toSet
      assert(out == Set(("a", 3.0), ("b", 5.0)))
    } finally q.stop()
  }
}
