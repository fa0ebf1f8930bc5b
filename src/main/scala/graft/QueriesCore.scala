package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame
import QHelp._

/** IO + projection/filter/row-selection oracle queries (SURVEY §2.1-2.3). */
object QueriesCore {

  def register(r: QueryRegistry): Unit = {

    // ---- IO / scan (SURVEY §2.1) ----
    r.reg("q_read_parquet",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      // projection + predicate reach the parquet scan (PushedFilters);
      // cutoff sits inside the data range (1995-01-02..2001-11-04) so the
      // scan check is non-vacuous.
      GraftFrame(t(s, dir, "lineitem"))
        .filter(col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .sortValues(Seq("l_orderkey" -> true, "l_linenumber" -> true)).df
    }

    r.reg("q_read_csv",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey") { (s, dir) =>
      // per-JVM root (r16): the literal shared path raced across
      // concurrent verify JVMs (the r15-verdict fixture-isolation class)
      val path = graft.QHelp.qtmpDir("region_csv").getAbsolutePath
      GraftFrame(t(s, dir, "region")).toCsv(path)
      GraftFrame.readCsv(s, path)
        .sortValues(Seq("r_regionkey" -> true)).df
    }

    r.reg("q_to_parquet",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // per-JVM root (r16): the literal shared path raced across
      // concurrent verify JVMs (the r15-verdict fixture-isolation class)
      val path = graft.QHelp.qtmpDir("orders_pq").getAbsolutePath
      GraftFrame(t(s, dir, "orders"))
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_totalprice")
        .toParquet(path)
      GraftFrame.readParquet(s, path).sortValues(Seq("o_orderkey" -> true)).df
    }

    // JSON and ORC round-trips (superset sinks/sources): write from
    // Spark, read back, compare against the parquet truth in DuckDB.
    // JSON rides an explicit schema — inference must not decide dtypes
    // inside a gate — and doubles round-trip exactly (shortest-repr).
    r.reg("q_json_roundtrip",
      """SELECT event_id, user_id, value FROM events
        |WHERE user_id < 20 ORDER BY event_id""".stripMargin) { (s, dir) =>
      // per-JVM root (r16): the literal shared path raced across
      // concurrent verify JVMs (the r15-verdict fixture-isolation class)
      val path = graft.QHelp.qtmpDir("events_json").getAbsolutePath
      GraftFrame(t(s, dir, "events")).filter(col("user_id") < 20)
        .select("event_id", "user_id", "value")
        .toJson(path)
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("user_id", LongType),
        StructField("value", DoubleType)))
      GraftFrame.readJson(s, path, Some(schema))
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_orc_roundtrip",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_totalprice > 200000.0 ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      // per-JVM root (r16): the literal shared path raced across
      // concurrent verify JVMs (the r15-verdict fixture-isolation class)
      val path = graft.QHelp.qtmpDir("orders_orc").getAbsolutePath
      GraftFrame(t(s, dir, "orders")).filter(col("o_totalprice") > 200000.0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .toOrc(path)
      GraftFrame.readOrc(s, path).sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_from_local",
      """SELECT * FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', -2.25),
        |(3, 'gamma', 0.125)) t(id, name, score) ORDER BY id""".stripMargin) { (s, _) =>
      val schema = StructType(Seq(
        StructField("id", IntegerType), StructField("name", StringType),
        StructField("score", DoubleType)))
      GraftFrame.fromLocal(s, schema,
        Seq(Row(1, "alpha", 1.5), Row(2, "beta", -2.25), Row(3, "gamma", 0.125)),
        npartitions = 2)
        .sortValues(Seq("id" -> true)).df
    }

    r.reg("q_from_dict",
      """SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'a', 1.5, true),
        |(CAST(2 AS BIGINT), NULL, 2.5, false),
        |(CAST(3 AS BIGINT), 'c', NULL, true)) t(id, name, score, ok)
        |ORDER BY id""".stripMargin) { (s, _) =>
      GraftFrame.fromDict(s, Seq(
          "id" -> Seq(1, 2, 3),
          "name" -> Seq("a", null, "c"),
          "score" -> Seq(1.5, 2.5, null),
          "ok" -> Seq(true, false, true)),
        npartitions = 2)
        .sortValues(Seq("id" -> true)).df
    }

    // from_delayed analog: four deferred partition thunks, each a pure
    // integer function of its partition index, evaluated on executors —
    // the oracle recomputes the whole frame arithmetically.
    r.reg("q_from_delayed",
      """SELECT range AS id, range * 3 + 1 AS triple
        |FROM range(0, 40) ORDER BY id""".stripMargin) { (s, _) =>
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("triple", LongType)))
      val thunks: Seq[() => Iterator[Row]] = (0 until 4).map(p =>
        () => (p * 10 until (p + 1) * 10).iterator
          .map(i => Row(i.toLong, i * 3L + 1L)))
      GraftFrame.fromDelayed(s, schema, thunks)
        .sortValues(Seq("id" -> true)).df
    }

    r.reg("q_timeseries",
      """SELECT i AS id,
        |  make_timestamp((1704067200 + i) * 1000000) AS ts,
        |  'n' || CAST((i * 2654435761) % 23 AS VARCHAR) AS name,
        |  CAST((i * 48271 + 11) % 1000000 AS DOUBLE) / 500000.0 - 1.0 AS x,
        |  CAST((i * 69621 + 7) % 1000000 AS DOUBLE) / 500000.0 - 1.0 AS y
        |FROM range(0, 100) t(i) ORDER BY id""".stripMargin) { (s, _) =>
      GraftFrame.timeseries(s, 1704067200L, 100).sortValues(Seq("id" -> true)).df
    }

    // ---- projections / filters (SURVEY §2.2) ----
    r.reg("q_projection",
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey") { (s, dir) =>
      GraftFrame(t(s, dir, "customer")).select("c_custkey", "c_name")
        .sortValues(Seq("c_custkey" -> true)).df
    }

    r.reg("q_filter",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
        .select("o_orderkey", "o_totalprice")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_query_string",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 150000.0 AND o_orderstatus = 'F'
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .query("o_totalprice > 150000.0 AND o_orderstatus = 'F'")
        .select("o_orderkey", "o_totalprice")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_eval",
      """SELECT o_orderkey, o_totalprice * 0.1 AS margin FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .eval("margin", "o_totalprice * 0.1")
        .select("o_orderkey", "margin")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_assign_arith",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice * (1.0 - l_discount) AS revenue,
        |  l_quantity + l_tax AS qt, l_extendedprice - l_discount AS pd,
        |  l_extendedprice / l_quantity AS unit_price
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .assign("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .assign("qt", col("l_quantity") + col("l_tax"))
        .assign("pd", col("l_extendedprice") - col("l_discount"))
        .assign("unit_price", col("l_extendedprice") / col("l_quantity"))
        .select("l_orderkey", "l_linenumber", "revenue", "qt", "pd", "unit_price")
        .sortValues(Seq("l_orderkey" -> true, "l_linenumber" -> true)).df
    }

    r.reg("q_head",
      "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10") { (s, dir) =>
      GraftFrame(t(s, dir, "orders")).select("o_orderkey", "o_totalprice")
        .sortValues(Seq("o_orderkey" -> true)).head(10).df
    }

    r.reg("q_tail",
      """SELECT * FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey DESC LIMIT 10
        |) ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders")).select("o_orderkey", "o_totalprice")
        .tail(10, Seq("o_orderkey" -> true)).df
    }

    r.reg("q_drop_rename",
      """SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
        |FROM customer ORDER BY custkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "customer"))
        .drop("c_mktsegment", "c_nationkey")
        .rename("c_custkey" -> "custkey", "c_name" -> "name", "c_acctbal" -> "acctbal")
        .sortValues(Seq("custkey" -> true)).df
    }

    r.reg("q_prefix_suffix",
      """SELECT r_regionkey AS "x_r_regionkey_y", r_name AS "x_r_name_y"
        |FROM region ORDER BY 1""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "region"))
        .addPrefix("x_").addSuffix("_y")
        .sortValues(Seq("x_r_regionkey_y" -> true)).df
    }

    r.reg("q_astype",
      """SELECT CAST(o_orderkey AS INTEGER) AS k32,
        |  CAST(o_custkey AS VARCHAR) AS ck_str,
        |  CAST(o_orderkey AS DOUBLE) AS k_dbl
        |FROM orders ORDER BY k32""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .select("o_orderkey", "o_custkey")
        .astype("o_orderkey" -> IntegerType)
        .assign("ck_str", col("o_custkey").cast(StringType))
        .assign("k_dbl", col("o_orderkey").cast(DoubleType))
        .select("o_orderkey", "ck_str", "k_dbl")
        .rename("o_orderkey" -> "k32")
        .sortValues(Seq("k32" -> true)).df
    }

    r.reg("q_fillna_dropna",
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END, -1.0) AS filled
        |FROM orders
        |WHERE (CASE WHEN o_orderpriority = '1-URGENT' THEN NULL ELSE o_orderpriority END) IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .assign("filled", when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_totalprice")))
        .assign("prio", when(col("o_orderpriority") === "1-URGENT", lit(null)).otherwise(col("o_orderpriority")))
        .dropna(how = "any", subset = Seq("prio"))
        .fillna(-1.0, Seq("filled"))
        .select("o_orderkey", "filled")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_replace",
      """SELECT o_orderkey,
        |  CASE o_orderstatus WHEN 'O' THEN 'OPEN' WHEN 'F' THEN 'FILLED' ELSE o_orderstatus END AS status
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .replace("o_orderstatus", Map("O" -> "OPEN", "F" -> "FILLED"))
        .selectCols(col("o_orderkey"), col("o_orderstatus").as("status"))
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_mask_where",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 200000.0 THEN 0.0 ELSE o_totalprice END AS masked,
        |  CASE WHEN o_orderstatus = 'O' THEN o_totalprice ELSE -1.0 END AS kept
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .assign("masked", col("o_totalprice"))
        .assign("kept", col("o_totalprice"))
        .mask("masked", col("o_totalprice") > 200000.0, lit(0.0))
        .whereKeep("kept", col("o_orderstatus") === "O", lit(-1.0))
        .select("o_orderkey", "masked", "kept")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_isin",
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .isinFilter("o_orderpriority", Seq("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_clip_floor_between",
      """SELECT l_orderkey, l_linenumber,
        |  greatest(least(l_quantity, 40.0), 10.0) AS clipped,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
        |  abs(l_extendedprice - 50000.0) AS dist
        |FROM lineitem WHERE l_quantity BETWEEN 5.0 AND 45.0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .filter(col("l_quantity").between(5.0, 45.0))
        .clip("l_quantity", 10.0, 40.0)
        .selectCols(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("clipped"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("cl"),
          abs(col("l_extendedprice") - 50000.0).as("dist"))
        .sortValues(Seq("l_orderkey" -> true, "l_linenumber" -> true)).df
    }

    r.weak("q_sample") { (s, dir) =>
      // seeded per-engine RNG — not cross-engine comparable; rows-only.
      GraftFrame(t(s, dir, "orders")).sample(0.1, seed = 42L)
        .select("o_orderkey")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_select_dtypes",
      "SELECT c_custkey, c_acctbal FROM customer ORDER BY c_custkey") { (s, dir) =>
      GraftFrame(t(s, dir, "customer"))
        .selectDtypes(dt => dt == LongType || dt == DoubleType)
        .sortValues(Seq("c_custkey" -> true)).df
    }

    r.reg("q_loc_iloc",
      """SELECT c_custkey, c_nationkey FROM customer
        |WHERE c_custkey >= 100 AND c_custkey <= 200 ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val f = GraftFrame(t(s, dir, "customer")).setIndex("c_custkey")
      // loc: label-range filter on the index; iloc: positional columns 0,2
      val ranged = f.filter(col("c_custkey") >= 100 && col("c_custkey") <= 200)
      val positional = ranged.select(Seq(0, 2).map(ranged.columns): _*)
      positional.sortValues(Seq("c_custkey" -> true)).df
    }

    r.reg("q_loc_range",
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_custkey >= 100 AND c_custkey <= 200 ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      // label slice .loc[100:200] on a sorted index (inclusive both ends);
      // the predicate reaches the scan as PushedFilters
      GraftFrame(t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal"))
        .setIndex("c_custkey")
        .locRange(Some(100L), Some(200L))
        .sortValues(Seq("c_custkey" -> true)).df
    }

    r.reg("q_explode",
      """SELECT doc_id, CAST(unnest(range(0, len(t))) AS INTEGER) AS pos, unnest(t) AS word
        |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 5)
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .filter(col("doc_id") < 5)
        .assign("t", split(col("text"), " "))
        .select("doc_id", "t")
        .explodeCol("t", "pos", "word")
        .sortValues(Seq("doc_id" -> true, "pos" -> true)).df
    }

    r.reg("q_concat_axis0",
      """SELECT o_orderkey, o_totalprice FROM (
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 250000.0
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice < 5000.0
        |) ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val hi = GraftFrame(t(s, dir, "orders")).filter(col("o_totalprice") > 250000.0)
        .select("o_orderkey", "o_totalprice")
      val lo = GraftFrame(t(s, dir, "orders")).filter(col("o_totalprice") < 5000.0)
        .select("o_orderkey", "o_totalprice")
      hi.concat(lo).sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_concat_axis1",
      """SELECT a.c_custkey, a.c_name, b.c_acctbal FROM
        |(SELECT c_custkey, c_name FROM customer) a
        |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer) b
        |USING (c_custkey) ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val a = GraftFrame(t(s, dir, "customer")).select("c_custkey", "c_name")
      val b = GraftFrame(t(s, dir, "customer")).select("c_custkey", "c_acctbal")
      a.concatAxis1(b, Seq("c_custkey")).sortValues(Seq("c_custkey" -> true)).df
    }

    // melt/unpivot superset: blockwise Expand, no shuffle
    r.reg("q_melt",
      """SELECT c_custkey, 'c_acctbal' AS variable, c_acctbal AS value
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, 'c_nationkey_d', CAST(c_nationkey AS DOUBLE)
        |FROM customer
        |ORDER BY c_custkey, variable""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "customer")
        .withColumn("c_nationkey_d", col("c_nationkey").cast(DoubleType)))
        .melt(Seq("c_custkey"), Seq("c_acctbal", "c_nationkey_d"))
        .sortValues(Seq("c_custkey" -> true, "variable" -> true)).df
    }

    // round over DECIMAL: HALF_UP on both engines (double round would
    // inherit engine tie policy)
    r.reg("q_round",
      """SELECT event_id,
        |  CAST(round(CAST(value AS DECIMAL(18,6)), 2) AS DOUBLE) AS v2,
        |  CAST(round(CAST(value AS DECIMAL(18,6)), 0) AS DOUBLE) AS v0
        |FROM events WHERE user_id < 50 ORDER BY event_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("event_id"),
          col("value").cast(DecimalType(18, 6)).as("v2"),
          col("value").cast(DecimalType(18, 6)).as("v0")))
        .roundCols(2, Seq("v2"))
        .roundCols(0, Seq("v0"))
        .assign("v2", col("v2").cast(DoubleType))
        .assign("v0", col("v0").cast(DoubleType))
        .sortValues(Seq("event_id" -> true)).df
    }

    // align (reference _collection.py:807): the aligned LEFT frame —
    // reindexed to the union key set, holes filled with 0
    r.reg("q_align",
      """WITH l AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt_even
        |           FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
        |     r AS (SELECT user_id FROM events WHERE event_id % 3 = 0
        |           GROUP BY user_id)
        |SELECT COALESCE(l.user_id, r.user_id) AS user_id,
        |       COALESCE(l.cnt_even, 0) AS cnt_even
        |FROM l FULL OUTER JOIN r ON l.user_id = r.user_id
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val ev = t(s, dir, "events")
      val left = GraftFrame(ev.filter(col("event_id") % 2 === 0)
        .groupBy("user_id").agg(count(lit(1)).as("cnt_even")))
      val right = GraftFrame(ev.filter(col("event_id") % 3 === 0)
        .groupBy("user_id").agg(count(lit(1)).as("cnt_third")))
      val (alignedLeft, _) =
        left.align(right, Seq("user_id"), "outer", Some(lit(0L)))
      alignedLeft.sortValues(Seq("user_id" -> true)).df
    }

    r.reg("q_intersect_except",
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
        |) ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val a = GraftFrame(t(s, dir, "orders")).filter(col("o_orderstatus") === "O").select("o_custkey")
      val b = GraftFrame(t(s, dir, "orders")).filter(col("o_totalprice") > 150000.0).select("o_custkey")
      a.distinct.intersect(b.distinct).sortValues(Seq("o_custkey" -> true)).df
    }

    r.reg("q_except",
      """SELECT o_custkey FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 150000.0
        |) ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val a = GraftFrame(t(s, dir, "orders")).filter(col("o_orderstatus") === "O").select("o_custkey")
      val b = GraftFrame(t(s, dir, "orders")).filter(col("o_totalprice") > 150000.0).select("o_custkey")
      a.distinct.except(b.distinct).sortValues(Seq("o_custkey" -> true)).df
    }

    r.reg("q_combine_first",
      """SELECT o_orderkey,
        |  coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END,
        |           o_totalprice) AS o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val base = GraftFrame(t(s, dir, "orders"))
        .assign("o_totalprice",
          when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_totalprice")))
        .select("o_orderkey", "o_totalprice")
      val fallback = GraftFrame(t(s, dir, "orders")).select("o_orderkey", "o_totalprice")
      base.combineFirst(fallback, Seq("o_orderkey"))
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    r.reg("q_series_map",
      """SELECT event_id,
        |  CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2
        |    WHEN 'purchase' THEN 3 ELSE -1 END AS type_code
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "events"))
        .seriesMap("event_type", "type_code",
          Map("click" -> 1, "view" -> 2, "purchase" -> 3), default = Some(-1))
        .select("event_id", "type_code")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_apply_rows",
      """SELECT event_id, value * 2.0 + 1.0 AS scored FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("scored", DoubleType)))
      GraftFrame(t(s, dir, "events").select("event_id", "value"))
        .applyRows(schema)(row => Row(row.getLong(0), row.getDouble(1) * 2.0 + 1.0))
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_map_partitions",
      """SELECT event_id, value - 1.0 AS shifted FROM events
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("shifted", DoubleType)))
      GraftFrame(t(s, dir, "events").select("event_id", "value"))
        .mapPartitionsRows(schema)(it => it.map(row => Row(row.getLong(0), row.getDouble(1) - 1.0)))
        .sortValues(Seq("event_id" -> true)).df
    }

    // to_numeric(errors='coerce') + to_datetime: junk strings -> null,
    // parseable ones -> exact values (try_cast / strptime on the oracle)
    r.reg("q_conversions",
      """SELECT doc_id,
        |  try_cast(CASE WHEN doc_id % 10 = 0 THEN 'junk'
        |                ELSE regexp_extract(source, '([0-9]+)', 1) END AS DOUBLE) AS num,
        |  strptime('2024-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0'),
        |           '%Y-%m-%d') AS dt
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.api.StrOps._
      GraftFrame(t(s, dir, "documents").filter(col("doc_id") < 100))
        .assign("num", when(col("doc_id") % 10 === 0, lit("junk"))
          .otherwise(col("source").strExtract("([0-9]+)", 1)))
        .assign("dt", concat(lit("2024-01-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")))
        .toNumeric("num")
        .toDatetime("dt", "yyyy-MM-dd")
        .assign("dt", col("dt").cast(TimestampNTZType))
        .select("doc_id", "num", "dt")
        .sortValues(Seq("doc_id" -> true)).df
    }

    r.reg("q_timedelta",
      """SELECT event_id,
        |  ts + to_minutes(user_id % 60) AS shifted,
        |  ts + to_seconds(event_id % 90) AS shifted_s,
        |  strptime('2024-' || lpad(CAST(event_id % 12 + 1 AS VARCHAR), 2, '0') || '-01',
        |           '%Y-%m-%d') AS period_start
        |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin) { (s, dir) =>
      // to_timedelta → DayTimeIntervalType; timestamp + interval is exact
      // integer arithmetic on both engines (no double rounding to guard)
      GraftFrame(t(s, dir, "events").filter(col("event_id") < 500))
        .assign("dm", (col("user_id") % 60).cast("int"))
        .assign("ds", (col("event_id") % 90).cast("int"))
        .toTimedelta("dm", "m")
        .toTimedelta("ds", "s")
        .assign("shifted", col("ts") + col("dm"))
        .assign("shifted_s", col("ts") + col("ds"))
        .assign("period",
          concat(lit("2024-"), lpad((col("event_id") % 12 + 1).cast("string"), 2, "0")))
        .toTimestampPeriod("period")
        .assign("period_start", col("period").cast(TimestampNTZType))
        .select("event_id", "shifted", "shifted_s", "period_start")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_binop_fill",
      """SELECT event_id,
        |  coalesce(v, 0.0) + coalesce(value, 0.0) AS filled_sum
        |FROM (SELECT event_id, value,
        |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "events")
          .withColumn("v",
            when(col("event_type") === "error", lit(null)).otherwise(col("value"))))
        .binopWithFill("filled_sum", col("v"), col("value"), 0.0, _ + _)
        .select("event_id", "filled_sum")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_index_series",
      "SELECT o_custkey FROM orders ORDER BY o_custkey") { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .setIndex("o_custkey")
        .indexSeries
        .sortValues(Seq("o_custkey" -> true)).df
    }

    // explicit-divisions repartition preserves content exactly (the
    // partition-placement contract is asserted in PlanAccessorsSpec)
    r.reg("q_repartition_divisions",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByDivisions("o_orderkey", Seq(10000L, 30000L, 45000L))
        .sortValues(Seq("o_orderkey" -> true)).df
    }
  }
}
