package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.GraftFrame
import graft.operators.Reductions
import QHelp._

/** Reductions + group-by oracle queries (SURVEY §2.5).
  *
  * Decimal discipline (r1 q_groupby_agg failed on exactly this): the
  * source doubles carry ≤2 decimal digits, so casting them to DECIMAL
  * BEFORE any arithmetic is exact on every engine; all products then have
  * ≤6 decimal digits and every sum is order-independent. No
  * double→decimal rounding ever happens after arithmetic.
  */
object QueriesAgg {

  // exact decimal projections of the lineitem pricing columns (shared with
  // QueriesTpch — ONE definition so the composite suite can't drift)
  private def price6 = col("l_extendedprice").cast(DecimalType(18, 6))
  private def oneMinusDisc =
    (lit(1).cast(DecimalType(8, 6)) - col("l_discount").cast(DecimalType(8, 6)))
      .cast(DecimalType(9, 6))
  private def onePlusTax =
    (lit(1).cast(DecimalType(8, 6)) + col("l_tax").cast(DecimalType(8, 6)))
      .cast(DecimalType(9, 6))
  private[graft] def discPrice = (price6 * oneMinusDisc).cast(DecimalType(24, 8))
  private def charge = (discPrice * onePlusTax).cast(DecimalType(24, 8))

  private[graft] val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * " +
      "CAST(CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(9,6)) AS DECIMAL(24,8))"
  private val chargeSql =
    s"CAST($discPriceSql * " +
      "CAST(CAST(1 AS DECIMAL(8,6)) + CAST(l_tax AS DECIMAL(8,6)) AS DECIMAL(9,6)) AS DECIMAL(24,8))"

  /** TPC-H Q1 over the graft API (scan → pushed filter → partial/final
    * agg → sort) — the flagship. */
  def q1Pricing(s: SparkSession, dir: String): DataFrame =
    GraftFrame(t(s, dir, "lineitem"))
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupby("l_returnflag", "l_linestatus")
      .agg(
        dsumD(col("l_quantity")).as("sum_qty"),
        dsumD(col("l_extendedprice")).as("sum_base_price"),
        // discPrice carries ≤4 real decimal digits (2-digit price ×
        // 2-digit discount), charge ≤6 — so the scale reductions below are
        // exact (no rounding). exactDouble raises if a larger SF ever
        // pushes the unscaled sum past 2^53 (charge at scale 6 leaves the
        // exact range near sf≥10) instead of silently double-rounding
        // differently per engine.
        exactDouble(sum(discPrice).cast(DecimalType(38, 4)), 4).as("sum_disc_price"),
        exactDouble(sum(charge).cast(DecimalType(38, 6)), 6).as("sum_charge"),
        dmean(col("l_quantity")).as("avg_qty"),
        dmean(col("l_extendedprice")).as("avg_price"),
        dmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .sortValues(Seq("l_returnflag" -> true, "l_linestatus" -> true))
      .df

  val q1PricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${dsumDSql("l_quantity")} AS sum_qty,
       |  ${dsumDSql("l_extendedprice")} AS sum_base_price,
       |  CAST(CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
       |  CAST(CAST(CAST(sum($chargeSql) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS sum_charge,
       |  ${dmeanSql("l_quantity")} AS avg_qty,
       |  ${dmeanSql("l_extendedprice")} AS avg_price,
       |  ${dmeanSql("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def register(r: QueryRegistry): Unit = {

    r.reg("q_groupby_agg", q1PricingSql)((s, dir) => q1Pricing(s, dir))

    // TPC-H Q6: the pushdown showcase — every predicate reaches the scan,
    // one partial/final agg, zero joins
    r.reg("q_tpch_q6",
      """SELECT CAST(CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(24,8))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice").cast(DecimalType(18, 6))
            * col("l_discount").cast(DecimalType(8, 6))).cast(DecimalType(24, 8)))
          .cast(DecimalType(38, 4)).cast(DoubleType).as("revenue"))
    }

    // TPC-H Q3 (o_orderpriority for the fixture's missing o_shippriority):
    // dim-filtered 3-way join -> grouped revenue -> top-k; the broadcast +
    // partial-agg + TakeOrdered pipeline in one query
    r.reg("q_tpch_q3",
      """SELECT l_orderkey,
        |  CAST(CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
        |    * CAST(CAST(1 AS DECIMAL(8,6)) - CAST(l_discount AS DECIMAL(8,6)) AS DECIMAL(9,6))
        |    AS DECIMAL(24,8))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10""".stripMargin) { (s, dir) =>
      val cut = lit("1997-06-30").cast(TimestampType)
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = t(s, dir, "orders").filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = t(s, dir, "lineitem").filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      // no broadcast hint on customer: the BUILDING segment grows
      // linearly with SF (same posture as q_tpch_q5) — AQE broadcasts it
      // at small scale and shuffle-joins it at 100 TB
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(sum(discPrice).cast(DecimalType(38, 4)).cast(DoubleType).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
        .limit(10)
    }

    // TPC-H Q5: the 6-table join pipeline. Scale posture: only region/
    // nation carry explicit broadcast hints (constant-size dims);
    // supplier and customer are left to Catalyst/AQE — they auto-broadcast
    // at small SF but grow linearly, so at 100 TB they must become
    // shuffle joins, and hardcoding broadcast would OOM the driver.
    r.reg("q_tpch_q5",
      s"""SELECT n_name,
         |  CAST(CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
         |FROM customer, orders, lineitem, supplier, nation, region
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         |  AND r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
      val asia = t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")
      val nat = t(s, dir, "nation")
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-01-01").cast(TimestampType))
        .select("o_orderkey", "o_custkey")
      val li = t(s, dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(sum(discPrice).cast(DecimalType(38, 4)).cast(DoubleType).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }

    // TPC-H Q4 (EXISTS predicate adapted: the fixture lacks
    // l_commitdate/l_receiptdate, so "late lineitem" becomes a
    // discount predicate — the plan shape is identical: filtered fact
    // scan -> LEFT SEMI join -> grouped count). Semi join goes through
    // the library operator (Joins.semi); at 100 TB both sides shuffle
    // on orderkey, no driver materialization.
    r.reg("q_tpch_q4",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount > 0.06)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-10-01").cast(TimestampType))
      val li = t(s, dir, "lineitem").filter(col("l_discount") > 0.06)
        .select(col("l_orderkey").as("o_orderkey"))
      graft.operators.Joins.semi(ord, li, Seq("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }

    // TPC-H Q12 (l_shipmode is absent from the fixture; l_returnflag
    // takes its place as the grouping column): fact-fact join ->
    // conditional counts. The CASE folds into the partial aggregate, so
    // the exchange carries 3 longs per group, not rows.
    r.reg("q_tpch_q12",
      """SELECT l_returnflag,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val ord = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
        .select("l_orderkey", "l_returnflag")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1L).otherwise(0L)).cast(LongType).as("high_line_count"),
          // when(not(high), ...): a NULL priority must fall to 0 exactly
          // like the SQL CASE (NULL NOT IN (...) is NULL -> ELSE 0);
          // when(high, 0).otherwise(1) would count it as a low_line
          sum(when(not(high), 1L).otherwise(0L)).cast(LongType).as("low_line_count"))
        .orderBy("l_returnflag")
    }

    // TPC-H Q14: promo revenue share. Ratio discipline: both sums stay
    // decimal (order-independent), each converts to double once, and the
    // final 100*a/b is a single deterministic IEEE expression — same
    // shape on both engines.
    r.reg("q_tpch_q14",
      s"""SELECT (100.0 * CAST(CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
         |    THEN $discPriceSql ELSE CAST(0 AS DECIMAL(24,8)) END) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
         |  / CAST(CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)) AS promo_revenue
         |FROM lineitem, part
         |WHERE l_partkey = p_partkey
         |  AND l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .select("l_partkey", "l_extendedprice", "l_discount")
      // part grows with SF: no explicit broadcast hint (AQE broadcasts at
      // small scale, shuffle-joins at 100 TB — same posture as Q3/Q5 dims)
      val pt = t(s, dir, "part").select("p_partkey", "p_type")
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            exactDouble(sum(when(col("p_type") === "PROMO", discPrice)
              .otherwise(lit(0).cast(DecimalType(24, 8))))
              .cast(DecimalType(38, 4)), 4) /
            exactDouble(sum(discPrice).cast(DecimalType(38, 4)), 4))
            .as("promo_revenue"))
    }

    // TPC-H Q10: returned-item reporting (fixture lacks address/phone/
    // comment — the join/agg/top-k shape is intact). Only nation carries
    // a broadcast hint (constant-size dim); customer/orders grow with SF
    // and stay with AQE. orderBy+limit plans TakeOrderedAndProject:
    // per-partition top-20, no global sort.
    r.reg("q_tpch_q10",
      s"""SELECT c_custkey, c_name,
         |  CAST(CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue,
         |  c_acctbal, n_name
         |FROM customer, orders, lineitem, nation
         |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, dir) =>
      val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-04-01").cast(TimestampType))
        .select("o_orderkey", "o_custkey")
      val cust = t(s, dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(exactDouble(sum(discPrice).cast(DecimalType(38, 4)), 4).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }

    // TPC-H Q18: large-volume customers. The HAVING subquery is a
    // grouped pre-aggregate of lineitem semi-joined back into orders —
    // at 100 TB both lineitem passes shuffle on l_orderkey, so AQE can
    // reuse the exchange; nothing materializes on the driver. LIMIT
    // tie-breaks on the unique o_orderkey for cross-engine determinism.
    r.reg("q_tpch_q18",
      """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS total_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING sum(CAST(l_quantity AS DECIMAL(18,6))) > 200)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      val qty = col("l_quantity").cast(DecimalType(18, 6))
      val li = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
      val big = li.groupBy("l_orderkey").agg(sum(qty).as("__sumq__"))
        .filter(col("__sumq__") > 200)
        .select(col("l_orderkey").as("o_orderkey"))
      val ord = graft.operators.Joins.semi(
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        big, Seq("o_orderkey"))
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(li, col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(exactDouble(sum(qty).cast(DecimalType(38, 4)), 4).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
          col("o_orderkey").asc)
        .limit(100)
    }

    // TPC-H Q19: disjunctive join predicate (fixture lacks
    // l_shipinstruct/l_shipmode; brand×size×quantity windows keep the
    // OR-of-conjunctions shape). The equi-key join carries the OR as a
    // post-join filter; Catalyst's constraint propagation still pushes
    // the derivable per-side bounds (brand IN, quantity ≤ widest window)
    // to the scans.
    r.reg("q_tpch_q19",
      s"""SELECT CAST(CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
         |FROM lineitem, part
         |WHERE p_partkey = l_partkey AND (
         |     (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
         |  OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin) { (s, dir) =>
      val pt = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
      val li = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      val cond =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#4" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30))
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .filter(cond)
        .agg(exactDouble(sum(discPrice).cast(DecimalType(38, 4)), 4).as("revenue"))
    }

    r.reg("q_groupby_spec",
      """SELECT o_orderstatus,
        |  CAST(sum(o_orderkey) AS BIGINT) AS o_orderkey_sum,
        |  CAST(count(o_orderkey) AS BIGINT) AS o_orderkey_count,
        |  min(o_totalprice) AS o_totalprice_min,
        |  max(o_totalprice) AS o_totalprice_max,
        |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS o_custkey_nunique
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .groupby("o_orderstatus")
        .aggSpec(Map(
          "o_orderkey" -> Seq("sum", "count"),
          "o_totalprice" -> Seq("min", "max"),
          "o_custkey" -> Seq("nunique")))
        .sortValues(Seq("o_orderstatus" -> true)).df
    }

    r.reg("q_groupby_mean_var",
      s"""SELECT l_returnflag,
         |  ${dmeanSql("l_quantity")} AS mean_qty,
         |  ${dvarSql("l_quantity")} AS var_qty,
         |  ${dstdSql("l_quantity")} AS std_qty
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag")
        .agg(dmean(col("l_quantity")).as("mean_qty"),
          dvar(col("l_quantity")).as("var_qty"),
          dstd(col("l_quantity")).as("std_qty"))
        .sortValues(Seq("l_returnflag" -> true)).df
    }

    r.reg("q_groupby_cov_corr",
      s"""SELECT l_returnflag,
         |  ${dcovSql("l_quantity", "l_discount")} AS cov_qd,
         |  ${dcorrSql("l_quantity", "l_discount")} AS corr_qd
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag")
        .agg(dcov(col("l_quantity"), col("l_discount")).as("cov_qd"),
          dcorr(col("l_quantity"), col("l_discount")).as("corr_qd"))
        .sortValues(Seq("l_returnflag" -> true)).df
    }

    r.reg("q_groupby_median",
      """SELECT l_returnflag, median(l_quantity) AS med_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag")
        .agg(median(col("l_quantity")).as("med_qty"))
        .sortValues(Seq("l_returnflag" -> true)).df
    }

    r.reg("q_groupby_idxminmax",
      """SELECT o_orderstatus, mx.o_orderkey AS idxmax_price, mn.o_orderkey AS idxmin_price
        |FROM (
        |  SELECT DISTINCT o_orderstatus FROM orders
        |) s
        |JOIN LATERAL (SELECT o_orderkey FROM orders o WHERE o.o_orderstatus = s.o_orderstatus
        |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) mx ON true
        |JOIN LATERAL (SELECT o_orderkey FROM orders o WHERE o.o_orderstatus = s.o_orderstatus
        |  ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 1) mn ON true
        |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val gb = GraftFrame(t(s, dir, "orders")).groupby("o_orderstatus")
      val mx = gb.idxmax("o_totalprice", "o_orderkey").rename("idxmax_o_totalprice" -> "idxmax_price")
      val mn = gb.idxmin("o_totalprice", "o_orderkey").rename("idxmin_o_totalprice" -> "idxmin_price")
      mx.merge(mn, Seq("o_orderstatus"))
        .sortValues(Seq("o_orderstatus" -> true)).df
    }

    r.reg("q_groupby_head_tail",
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 2 AND o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .filter(col("o_custkey") < 200)
        .groupby("o_custkey")
        .headPerGroup(2, col("o_orderkey"))
        .assign("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))))
        .select("o_custkey", "o_orderkey", "rk")
        .sortValues(Seq("o_custkey" -> true, "o_orderkey" -> true)).df
    }

    r.reg("q_groupby_get_group",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag", "l_linestatus")
        .getGroup(Seq("R", "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .sortValues(Seq("l_orderkey" -> true, "l_linenumber" -> true)).df
    }

    r.reg("q_groupby_valuecounts",
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS count
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .groupby("o_orderstatus")
        .valueCounts("o_orderpriority")
        .sortValues(Seq("o_orderstatus" -> true, "o_orderpriority" -> true)).df
    }

    r.reg("q_pivot",
      """SELECT o_orderstatus,
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT",
        |  CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH",
        |  CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS "3-MEDIUM"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .groupby("o_orderstatus")
        .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"), count(lit(1)))
        .sortValues(Seq("o_orderstatus" -> true)).df
    }

    // Multi-measure pivot: two value columns under one pivot — Spark
    // names the wide columns <pivotval>_<alias>; the oracle spells the
    // same CASE-WHEN aggregates per (pivot value, measure) pair.
    r.reg("q_pivot_multi",
      s"""SELECT o_orderstatus,
         |  ${QHelp.dsumDSql("CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END")} AS "1-URGENT_sum_price",
         |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT_n",
         |  ${QHelp.dsumDSql("CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END")} AS "2-HIGH_sum_price",
         |  CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH_n"
         |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .groupby("o_orderstatus")
        .pivotAgg("o_orderpriority", Seq("1-URGENT", "2-HIGH"),
          QHelp.dsumD(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n"))
        .sortValues(Seq("o_orderstatus" -> true)).df
    }

    r.reg("q_cube",
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag", "l_linestatus")
        .cube(count(lit(1)).as("n"))
        .sortValues(Seq("l_returnflag" -> true, "l_linestatus" -> true), naFirst = true).df
    }

    r.reg("q_rollup",
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag", "l_linestatus")
        .rollup(count(lit(1)).as("n"))
        .sortValues(Seq("l_returnflag" -> true, "l_linestatus" -> true), naFirst = true).df
    }

    // ---- global reductions ----
    r.reg("q_reduce_global",
      s"""SELECT ${dsumDSql("l_quantity")} AS sum_qty,
         |  ${dmeanSql("l_quantity")} AS mean_qty,
         |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
         |  CAST(count(l_quantity) AS BIGINT) AS n,
         |  ${dvarSql("l_quantity")} AS var_qty,
         |  ${dsemSql("l_quantity")} AS sem_qty
         |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").agg(
        dsumD(col("l_quantity")).as("sum_qty"),
        dmean(col("l_quantity")).as("mean_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        count(col("l_quantity")).as("n"),
        dvar(col("l_quantity")).as("var_qty"),
        dsem(col("l_quantity")).as("sem_qty"))
    }

    r.reg("q_idxminmax_global",
      """SELECT
        |  (SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1) AS idxmax_o_totalprice,
        |  (SELECT o_orderkey FROM orders ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 1) AS idxmin_o_totalprice""".stripMargin) { (s, dir) =>
      val f = GraftFrame(t(s, dir, "orders"))
      f.idxmax("o_totalprice", "o_orderkey").df
        .crossJoin(f.idxmin("o_totalprice", "o_orderkey").df)
    }

    r.reg("q_mode",
      """SELECT mode_l_quantity FROM (
        |  SELECT l_quantity AS mode_l_quantity, count(*) AS n FROM lineitem
        |  GROUP BY l_quantity ORDER BY n DESC, l_quantity ASC LIMIT 1)""".stripMargin) { (s, dir) =>
      Reductions.mode(t(s, dir, "lineitem"), "l_quantity")
    }

    // histogram: the SQL mirrors the Scala binning expression exactly
    // (same division-then-multiply order, same folded top edge) so the
    // per-row IEEE floor lands every value in the same bin on both
    // engines; edges use the precomputed step literal.
    r.reg("q_histogram",
      """SELECT bin, 0.0 + bin * 5.0 AS lo_edge, 0.0 + (bin + 1) * 5.0 AS hi_edge,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT CAST(least(floor((l_quantity - 0.0) / (50.0 - 0.0) * 10), 9) AS INTEGER) AS bin
        |      FROM lineitem WHERE l_quantity >= 0.0 AND l_quantity <= 50.0)
        |GROUP BY bin ORDER BY bin""".stripMargin) { (s, dir) =>
      Reductions.histogram(t(s, dir, "lineitem"), "l_quantity", 0.0, 50.0, 10)
    }

    // Key-skew diagnostic: hottest join keys + corpus share — the pass
    // that sizes a salt factor before a skewed join. Count, 1-row
    // broadcast total, TakeOrdered — deterministic via (n desc, key asc).
    r.reg("q_skew_report",
      """WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
        |t AS (SELECT sum(n) AS tot FROM c)
        |SELECT user_id, CAST(n AS BIGINT) AS n,
        |  CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM c, t ORDER BY n DESC, user_id ASC LIMIT 15""".stripMargin) { (s, dir) =>
      Reductions.keySkewReport(t(s, dir, "events"), "user_id", 15)
    }

    r.reg("q_value_counts",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS count
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY count DESC, o_orderpriority ASC""".stripMargin) { (s, dir) =>
      Reductions.valueCounts(t(s, dir, "orders"), "o_orderpriority")
    }

    r.reg("q_value_counts_norm",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM orders) AS proportion
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY proportion DESC, o_orderpriority ASC""".stripMargin) { (s, dir) =>
      Reductions.valueCounts(t(s, dir, "orders"), "o_orderpriority", normalize = true)
    }

    // dropna=false keeps the null group; sort=false orders by value —
    // the two value_counts options r2 flagged as fixed-policy
    r.reg("q_value_counts_nulls",
      """SELECT v, CAST(count(*) AS BIGINT) AS count
        |FROM (SELECT CASE WHEN event_type = 'error' THEN NULL
        |             ELSE event_type END AS v FROM events)
        |GROUP BY v ORDER BY v ASC NULLS FIRST""".stripMargin) { (s, dir) =>
      Reductions.valueCounts(
        t(s, dir, "events")
          .select(when(col("event_type") === "error", lit(null))
            .otherwise(col("event_type")).as("v")),
        "v", dropna = false, sort = false)
    }

    r.reg("q_groupby_dropna",
      """SELECT v, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(user_id AS DECIMAL(28,0))) AS DOUBLE) AS uid_sum
        |FROM (SELECT user_id, CASE WHEN event_type = 'error' THEN NULL
        |             ELSE event_type END AS v FROM events)
        |WHERE v IS NOT NULL GROUP BY v ORDER BY v""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "events")
          .select(col("user_id"),
            when(col("event_type") === "error", lit(null))
              .otherwise(col("event_type")).as("v")))
        .groupbyDropna("v")
        .agg(count(lit(1)).as("n"),
          sum(col("user_id").cast(DecimalType(28, 0))).cast(DoubleType).as("uid_sum"))
        .sortValues(Seq("v" -> true)).df
    }

    r.reg("q_nunique",
      "SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS nunique FROM orders") { (s, dir) =>
      Reductions.nunique(t(s, dir, "orders"), "o_custkey")
    }

    r.weak("q_nunique_approx") { (s, dir) =>
      // HLL estimates are engine-specific; rows-only.
      Reductions.nuniqueApprox(t(s, dir, "orders"), "o_custkey")
    }

    r.reg("q_quantile",
      """SELECT quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75
        |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").agg(
        percentile(col("l_quantity"), lit(0.25)).as("q25"),
        percentile(col("l_quantity"), lit(0.5)).as("q50"),
        percentile(col("l_quantity"), lit(0.75)).as("q75"))
    }

    r.reg("q_describe",
      s"""SELECT CAST(count(l_quantity) AS BIGINT) AS count,
         |  ${dmeanSql("l_quantity")} AS mean, ${dstdSql("l_quantity")} AS std,
         |  min(l_quantity) AS min, max(l_quantity) AS max
         |FROM lineitem""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").agg(
        count(col("l_quantity")).as("count"),
        dmean(col("l_quantity")).as("mean"),
        dstd(col("l_quantity")).as("std"),
        min(col("l_quantity")).as("min"),
        max(col("l_quantity")).as("max"))
    }

    r.reg("q_any_all",
      """SELECT o_orderstatus,
        |  bool_or(o_totalprice > 300000.0) AS any_big,
        |  bool_and(o_totalprice > 1000.0) AS all_nontrivial
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .groupby("o_orderstatus")
        .agg(bool_or(col("o_totalprice") > 300000.0).as("any_big"),
          bool_and(col("o_totalprice") > 1000.0).as("all_nontrivial"))
        .sortValues(Seq("o_orderstatus" -> true)).df
    }

    r.reg("q_groupby_product",
      """SELECT l_orderkey, product(CAST(l_linenumber AS DOUBLE)) AS prod_ln
        |FROM lineitem WHERE l_orderkey < 2000
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      // small exact integers: FP product is associative here, so the
      // custom Aggregator's merge order cannot change the result
      GraftFrame(t(s, dir, "lineitem").filter(col("l_orderkey") < 2000))
        .groupby("l_orderkey")
        .agg(graft.operators.WindowOps.product(
          col("l_linenumber").cast(DoubleType)).as("prod_ln"))
        .sortValues(Seq("l_orderkey" -> true)).df
    }

    // skew/kurt via explicit decimal central moments: the built-ins use
    // engine-specific bias corrections and accumulation orders; the
    // moment form is deterministic and identical in both engines.
    r.reg("q_skew_kurt", {
      def s1 = dsumSql("l_quantity", 6)
      def s2 = "CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS DECIMAL(38,4))"
      def s3 = "CAST(sum(CAST(l_quantity * l_quantity * l_quantity AS DECIMAL(28,2))) AS DECIMAL(38,2))"
      s"""SELECT l_returnflag,
         |  ((CAST(CAST($s3 AS VARCHAR) AS DOUBLE) / count(*)
         |     - 3.0 * (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)) * (CAST(CAST($s2 AS VARCHAR) AS DOUBLE) / count(*))
         |     + 2.0 * (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)) * (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)) * (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)))
         |   / ((CAST(CAST($s2 AS VARCHAR) AS DOUBLE) / count(*) - (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)) * (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)))
         |      * sqrt(CAST(CAST($s2 AS VARCHAR) AS DOUBLE) / count(*) - (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*)) * (CAST(CAST($s1 AS VARCHAR) AS DOUBLE) / count(*))))) AS skew_m
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    }) { (s, dir) =>
      val q = col("l_quantity")
      val n = count(lit(1)).cast(DoubleType)
      val m1 = dsum(q, 6).cast(DoubleType) / n
      val m2raw = sum((q * q).cast(DecimalType(28, 4))).cast(DecimalType(38, 4)).cast(DoubleType) / n
      val m3raw = sum((q * q * q).cast(DecimalType(28, 2))).cast(DecimalType(38, 2)).cast(DoubleType) / n
      GraftFrame(t(s, dir, "lineitem"))
        .groupby("l_returnflag")
        .agg({
          val variance = m2raw - m1 * m1
          ((m3raw - lit(3.0) * m1 * m2raw + lit(2.0) * m1 * m1 * m1)
            / (variance * sqrt(variance))).as("skew_m")
        })
        .sortValues(Seq("l_returnflag" -> true)).df
    }

    r.reg("q_describe_nonnum",
      """SELECT CAST(count(o_orderpriority) AS BIGINT) AS count,
        |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS unique,
        |  t.top, t.freq
        |FROM orders, (
        |  SELECT o_orderpriority AS top, CAST(count(*) AS BIGINT) AS freq
        |  FROM orders WHERE o_orderpriority IS NOT NULL
        |  GROUP BY 1 ORDER BY freq DESC, top ASC LIMIT 1) t
        |GROUP BY t.top, t.freq""".stripMargin) { (s, dir) =>
      Reductions.describeNonNumeric(t(s, dir, "orders"), "o_orderpriority")
    }

    r.reg("q_nlargest",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 15""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders")).select("o_orderkey", "o_totalprice")
        .nlargest(15, "o_totalprice", "o_orderkey").df
    }

    r.reg("q_nsmallest",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice ASC, o_orderkey ASC LIMIT 15""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders")).select("o_orderkey", "o_totalprice")
        .nsmallest(15, "o_totalprice", "o_orderkey").df
    }

    r.reg("q_distinct",
      "SELECT DISTINCT lang, source FROM documents ORDER BY lang, source") { (s, dir) =>
      GraftFrame(t(s, dir, "documents")).select("lang", "source").distinct
        .sortValues(Seq("lang" -> true, "source" -> true)).df
    }

    r.reg("q_drop_duplicates",
      """SELECT doc_id, lang, source FROM (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
        |  FROM documents) WHERE rn = 1 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents")).select("doc_id", "lang", "source")
        .dropDuplicates(Seq("lang", "source"), col("doc_id"))
        .sortValues(Seq("doc_id" -> true)).df
    }

    r.reg("q_cat_reduce",
      """SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(array_join(array_sort(collect_set(col("source"))), ",").as("sources"))
        .orderBy("lang")
    }

    r.reg("q_is_monotonic",
      """WITH x AS (
        |  SELECT o_orderkey, lag(o_orderkey) OVER (ORDER BY o_orderkey) AS prev
        |  FROM orders)
        |SELECT coalesce(bool_and(prev IS NULL OR prev <= o_orderkey), true) AS is_monotonic
        |FROM x""".stripMargin) { (s, dir) =>
      graft.operators.WindowOps.isMonotonicIncreasing(
        t(s, dir, "orders"), "o_orderkey", "o_orderkey")
    }

    // is_monotonic_decreasing: a genuinely decreasing series (negated key,
    // true) and a non-monotonic one (totalprice over key order, false) in
    // one output so both outcomes are value-checked
    r.reg("q_is_monotonic_dec",
      """WITH a AS (
        |  SELECT -o_orderkey AS v, lag(-o_orderkey) OVER (ORDER BY o_orderkey) AS prev
        |  FROM orders),
        |b AS (
        |  SELECT o_totalprice AS v, lag(o_totalprice) OVER (ORDER BY o_orderkey) AS prev
        |  FROM orders)
        |SELECT * FROM (
        |  SELECT 'neg_key' AS label,
        |    coalesce(bool_and(prev IS NULL OR prev >= v), true) AS is_monotonic FROM a
        |  UNION ALL
        |  SELECT 'price' AS label,
        |    coalesce(bool_and(prev IS NULL OR prev >= v), true) AS is_monotonic FROM b)
        |ORDER BY label""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders")
      val negKey = graft.operators.WindowOps.isMonotonicDecreasing(
          o.withColumn("v", -col("o_orderkey")), "v", "o_orderkey")
        .withColumn("label", lit("neg_key"))
      val price = graft.operators.WindowOps.isMonotonicDecreasing(
          o.withColumn("v", col("o_totalprice")), "v", "o_orderkey")
        .withColumn("label", lit("price"))
      negKey.unionByName(price).select("label", "is_monotonic").orderBy("label")
    }
  }
}
