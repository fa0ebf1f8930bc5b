package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Joins
import QHelp._
import QueriesAgg.{discPrice, discPriceSql}

/** The remaining TPC-H composites (Q2 Q7 Q8 Q9 Q11 Q13 Q15 Q16 Q17 Q20 Q21
  * Q22), completing the 22-query suite alongside QueriesAgg's
  * Q1/Q3/Q4/Q5/Q6/Q10/Q12/Q14/Q18/Q19.
  *
  * Fixture adaptations (same policy as Q4/Q12/Q19): the driver's tables
  * carry no `partsupp`, `l_commitdate/receiptdate`, `o_comment`, or
  * `c_phone`, so the affected queries substitute predicates over existing
  * columns while preserving each query's STRUCTURAL shape — the correlated
  * min (Q2), the two-sided nation pair (Q7), the share-of-total ratio (Q8),
  * the HAVING-over-global-scalar (Q11), the left-outer count distribution
  * (Q13), the max-equality view join (Q15), the NOT-IN exclusion (Q16), the
  * correlated average (Q17), the nested semi-join chain (Q20), the
  * EXISTS/NOT-EXISTS waiting-supplier test (Q21), and the anti-join over a
  * global average (Q22). Each substitution is noted inline.
  *
  * Scale posture (100 TB lens), uniform with QueriesAgg: explicit
  * `broadcast()` hints ONLY on constant-size dims (region, nation, 1-row
  * global aggregates); SF-growing sides (supplier, customer, part subsets)
  * are left to Catalyst/AQE, which broadcasts them at small SF and
  * shuffle-joins them at cluster scale. Every grouped aggregate is
  * partial/merge/final; double sums go through exact decimals (QHelp) so
  * results are independent of partition count and merge order.
  */
object QueriesTpch {

  private def qtySumDec(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast(DecimalType(38, 2))

  def register(r: QueryRegistry): Unit = {

    // Q2: minimum-cost supplier. No partsupp: lineitem is the part-supplier
    // bridge and min unit price (extendedprice/quantity, per-row IEEE
    // division — deterministic) stands in for ps_supplycost. The correlated
    // `MIN(cost) per part over EUROPE suppliers` subquery becomes a grouped
    // min joined back on equality — one lineitem shuffle on (part,supp),
    // one on part.
    r.reg("q_tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY 1, 2),
        |eu AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier, nation, region
        |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |pse AS (SELECT ps.partkey, ps.suppkey, ps.cost FROM ps JOIN eu ON ps.suppkey = eu.s_suppkey),
        |mn AS (SELECT partkey, min(cost) AS mincost FROM pse GROUP BY 1)
        |SELECT eu.s_acctbal, eu.s_name, eu.n_name, p.p_partkey, p.p_name, pse.cost AS supply_cost
        |FROM pse
        |JOIN mn ON pse.partkey = mn.partkey AND pse.cost = mn.mincost
        |JOIN part p ON pse.partkey = p.p_partkey AND p.p_size <= 15 AND p.p_type = 'STANDARD'
        |JOIN eu ON pse.suppkey = eu.s_suppkey
        |ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100""".stripMargin) { (s, dir) =>
      val eur = t(s, dir, "region").filter(col("r_name") === "EUROPE")
        .select("r_regionkey")
      val nat = t(s, dir, "nation")
        .join(broadcast(eur), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val eu = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val ps = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") / col("l_quantity")).as("unit"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("unit")).as("cost"))
      val pse = ps.join(eu, col("l_suppkey") === col("s_suppkey"))
      val mn = pse.groupBy(col("l_partkey").as("mkey"))
        .agg(min(col("cost")).as("mincost"))
      val parts = t(s, dir, "part")
        .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
        .select("p_partkey", "p_name")
      pse.join(mn, col("l_partkey") === col("mkey") && col("cost") === col("mincost"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost").as("supply_cost"))
        .orderBy(col("s_acctbal").desc, col("s_name").asc, col("p_partkey").asc)
        .limit(100)
    }

    // Q7: volume shipping between two nations. Both nation aliases are
    // pre-filtered to the pair (2 broadcast rows each); the bidirectional
    // OR stays a post-join filter exactly as in the SQL.
    r.reg("q_tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year,
         |  CAST(CAST(CAST(sum(volume) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS INTEGER) AS l_year, $discPriceSql AS volume
         |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
         |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
         |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
         |    AND c_nationkey = n2.n_nationkey
         |    AND ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
         |      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
         |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00')
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, dir) =>
      val pair = Seq("NATION_12", "NATION_10")
      val n1 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1key"), col("n_name").as("supp_nation"))
      val n2 = t(s, dir, "nation").filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2key"), col("n_name").as("cust_nation"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(n1), col("s_nationkey") === col("n1key"))
        .select("s_suppkey", "supp_nation")
      val cust = t(s, dir, "customer")
        .join(broadcast(n2), col("c_nationkey") === col("n2key"))
        .select("c_custkey", "cust_nation")
      val li = t(s, dir, "lineitem")
        .filter(col("l_shipdate").between(
          lit("1996-01-01").cast(TimestampType), lit("1997-12-31").cast(TimestampType)))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"), discPrice.as("volume"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_12" && col("cust_nation") === "NATION_10") ||
          (col("supp_nation") === "NATION_10" && col("cust_nation") === "NATION_12"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exactDouble(sum(col("volume")).cast(DecimalType(38, 4)), 4).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }

    // Q8: national market share — share-of-total ratio over an 8-table
    // join. Both sums accumulate decimal and convert to double ONCE; the
    // final divide is a single IEEE op (same bits both engines).
    r.reg("q_tpch_q8",
      s"""SELECT o_year,
         |  (CAST(CAST(CAST(sum(CASE WHEN nation = 'NATION_12' THEN volume
         |                 ELSE CAST(0 AS DECIMAL(24,8)) END) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)
         |   / CAST(CAST(CAST(sum(volume) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE)) AS mkt_share
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, $discPriceSql AS volume, n2.n_name AS nation
         |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
         |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey AND l_orderkey = o_orderkey
         |    AND o_custkey = c_custkey AND c_nationkey = n1.n_nationkey
         |    AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         |    AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
         |    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00')
         |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, dir) =>
      val amr = t(s, dir, "region").filter(col("r_name") === "AMERICA")
        .select("r_regionkey")
      val n1 = t(s, dir, "nation")
        .join(broadcast(amr), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("n1key"))
      val n2 = t(s, dir, "nation")
        .select(col("n_nationkey").as("n2key"), col("n_name").as("nation"))
      val cust = t(s, dir, "customer")
        .join(broadcast(n1), col("c_nationkey") === col("n1key"))
        .select("c_custkey")
      val sup = t(s, dir, "supplier")
        .join(broadcast(n2), col("s_nationkey") === col("n2key"))
        .select("s_suppkey", "nation")
      val parts = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val ord = t(s, dir, "orders")
        .filter(col("o_orderdate").between(
          lit("1995-01-01").cast(TimestampType), lit("1996-12-31").cast(TimestampType)))
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).as("o_year"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
          discPrice.as("volume"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_year")
        .agg((exactDouble(sum(when(col("nation") === "NATION_12", col("volume"))
            .otherwise(lit(0).cast(DecimalType(24, 8)))).cast(DecimalType(38, 4)), 4)
          / exactDouble(sum(col("volume")).cast(DecimalType(38, 4)), 4)).as("mkt_share"))
        .orderBy("o_year")
    }

    // Q9: product-type profit. No partsupp, so the profit term loses its
    // ps_supplycost component and reduces to discounted revenue — the
    // LIKE-filtered 5-table join and (nation, year) rollup are intact.
    r.reg("q_tpch_q9",
      s"""SELECT nation, o_year,
         |  CAST(CAST(CAST(sum(amount) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS sum_profit
         |FROM (
         |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year, $discPriceSql AS amount
         |  FROM part, supplier, lineitem, orders, nation
         |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
         |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
         |    AND p_name LIKE '%bolt%')
         |GROUP BY nation, o_year
         |ORDER BY nation, o_year DESC""".stripMargin) { (s, dir) =>
      val nat = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "nation")
      val parts = t(s, dir, "part").filter(col("p_name").contains("bolt"))
        .select("p_partkey")
      val ord = t(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
          discPrice.as("amount"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("nation", "o_year")
        .agg(exactDouble(sum(col("amount")).cast(DecimalType(38, 4)), 4).as("sum_profit"))
        .orderBy(col("nation").asc, col("o_year").desc)
    }

    // Q11: important stock. partsupp value becomes lineitem
    // extendedprice×quantity per part (exact: both factors decimal before
    // the multiply); the HAVING-over-global-fraction compares against a
    // 1-row total joined back by broadcast — no driver collect.
    r.reg("q_tpch_q11",
      """WITH v AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(10,2)) AS DECIMAL(28,4))) AS DECIMAL(38,4)) AS value
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name IN ('NATION_12', 'NATION_20')
        |  GROUP BY l_partkey)
        |SELECT l_partkey AS ps_partkey, CAST(value AS DOUBLE) AS value
        |FROM v, (SELECT CAST(sum(value) AS DECIMAL(38,4)) AS total FROM v) t
        |WHERE CAST(value AS DOUBLE) > CAST(t.total AS DOUBLE) * 0.001
        |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, dir) =>
      val nat = t(s, dir, "nation")
        .filter(col("n_name").isin("NATION_12", "NATION_20"))
        .select("n_nationkey")
      val sup = t(s, dir, "supplier")
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val v = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice").cast(DecimalType(18, 2))
            * col("l_quantity").cast(DecimalType(10, 2))).cast(DecimalType(28, 4)).as("pv"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(col("pv")).cast(DecimalType(38, 4)).as("value"))
      val total = v.agg(sum(col("value")).cast(DecimalType(38, 4)).as("total"))
      v.crossJoin(broadcast(total))
        .filter(col("value").cast(DoubleType) > col("total").cast(DoubleType) * 0.001)
        .select(col("l_partkey").as("ps_partkey"), col("value").cast(DoubleType).as("value"))
        .orderBy(col("value").desc, col("ps_partkey").asc)
    }

    // Q13: customer order-count distribution. The o_comment NOT LIKE
    // becomes an o_orderpriority exclusion INSIDE the left-join condition
    // (so excluded customers still count with c_count = 0), then a second
    // aggregation over the counts — the two-level agg is the point.
    r.reg("q_tpch_q13",
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, dir) =>
      val cust = t(s, dir, "customer").select("c_custkey")
      val ord = t(s, dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
      cust.join(ord,
          col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "1-URGENT",
          "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }

    // Q15: top supplier. The revenue view's max is a 1-row aggregate
    // broadcast back for the equality join (revenue values are identical
    // decimal→double conversions on both sides, so equality is exact).
    // The view body executes twice (the max branch's pruned aggregate
    // doesn't canonicalize to the same exchange) — accepted: each pass is
    // the 3-month pushed-down slice (~2.5% of lineitem), matching how
    // engines run Q15's unmaterialized view.
    r.reg("q_tpch_q15",
      s"""WITH rev AS (
         |  SELECT l_suppkey AS supplier_no,
         |    CAST(CAST(CAST(sum($discPriceSql) AS DECIMAL(38,4)) AS VARCHAR) AS DOUBLE) AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier, rev, (SELECT max(total_revenue) AS mx FROM rev) m
         |WHERE s_suppkey = supplier_no AND total_revenue = m.mx
         |ORDER BY s_suppkey""".stripMargin) { (s, dir) =>
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(exactDouble(sum(discPrice).cast(DecimalType(38, 4)), 4).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("mx"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_revenue") === col("mx"))
        .join(t(s, dir, "supplier").select("s_suppkey", "s_name"),
          col("supplier_no") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    }

    // Q16: parts/supplier relationship. The supplier-complaint NOT IN
    // becomes an anti join against negative-balance suppliers (keys are
    // non-null on both sides, so NOT IN ≡ anti join); distinct
    // (part, supp) pairs from lineitem stand in for partsupp.
    r.reg("q_tpch_q16",
      """SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pslike, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, dir) =>
      val pairs = t(s, dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
      val excl = t(s, dir, "supplier").filter(col("s_acctbal") < 0.0)
        .select(col("s_suppkey").as("l_suppkey"))
      val parts = t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
          col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      Joins.anti(pairs, excl, Seq("l_suppkey"))
        .join(parts, col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand").asc,
          col("p_type").asc, col("p_size").asc)
    }

    // Q17: small-quantity-order revenue. The correlated per-part AVG
    // becomes a grouped exact mean (decimal sum / count, QHelp discipline)
    // joined back on partkey; the 0.2× threshold compare is per-row IEEE.
    // p_container is absent — p_type takes its place beside p_brand.
    r.reg("q_tpch_q17",
      s"""SELECT CAST(CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) / 7.0
         |  AS avg_yearly
         |FROM lineitem, part,
         |  (SELECT l_partkey AS ak, ${dmeanSql("l_quantity")} AS avg_qty FROM lineitem GROUP BY l_partkey) a
         |WHERE p_partkey = l_partkey AND a.ak = l_partkey
         |  AND p_brand = 'Brand#3' AND p_type = 'SMALL'
         |  AND l_quantity < 0.2 * avg_qty""".stripMargin) { (s, dir) =>
      val parts = t(s, dir, "part")
        .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
        .select("p_partkey")
      // Early prune BOTH lineitem passes to the filtered part set: the
      // per-part average is unchanged by dropping other parts' rows (the
      // partkey join prunes groups, not rows within a group), but the
      // aggregate shuffle shrinks from every part to the ~1/150 brand×type
      // slice — the classic Q17 plan at scale. The oracle SQL averages
      // over unpruned lineitem; values for surviving parts are identical.
      val pruned = t(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(parts, col("l_partkey") === col("p_partkey"))
      val avgq = pruned
        .groupBy(col("l_partkey").as("ak"))
        .agg(dmean(col("l_quantity")).as("avg_qty"))
      pruned
        .join(avgq, col("l_partkey") === col("ak"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((exactDouble(sum(col("l_extendedprice").cast(DecimalType(18, 6)))
          .cast(DecimalType(38, 6)), 6) / 7.0).as("avg_yearly"))
    }

    // Q20: potential part promotion. Without ps_availqty the inner
    // correlated quantity test becomes an absolute threshold over the same
    // grouped shipped-quantity aggregate; the nested semi-join chain
    // (supplier ← qualifying suppkeys ← name-matched parts) is intact.
    r.reg("q_tpch_q20",
      """WITH sp AS (
        |  SELECT l_suppkey, l_partkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS qty
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  GROUP BY 1, 2)
        |SELECT s_name, s_acctbal FROM supplier, nation
        |WHERE s_nationkey = n_nationkey AND n_regionkey = 3
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM sp, part
        |    WHERE p_partkey = l_partkey AND p_name LIKE 'small%' AND qty > 40)
        |ORDER BY s_name""".stripMargin) { (s, dir) =>
      val sp = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType))
        .groupBy("l_suppkey", "l_partkey")
        .agg(qtySumDec(col("l_quantity")).as("qty"))
      val smallParts = t(s, dir, "part")
        .filter(col("p_name").startsWith("small")).select("p_partkey")
      val good = sp.join(smallParts, col("l_partkey") === col("p_partkey"))
        .filter(col("qty") > 40)
        .select(col("l_suppkey").as("s_suppkey"))
      val natEu = t(s, dir, "nation").filter(col("n_regionkey") === 3)
        .select("n_nationkey")
      val sup = t(s, dir, "supplier")
        .join(broadcast(natEu), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
      Joins.semi(sup, good, Seq("s_suppkey"))
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    }

    // Q21: suppliers who kept orders waiting. "Late" = l_discount > 0.06
    // (same substitution as Q4; no receipt/commit dates). The
    // EXISTS(other supplier) / NOT EXISTS(other late supplier) pair is
    // equivalent to per-order aggregates: distinct-supplier count ≥ 2 and
    // distinct-LATE-supplier count = 1 (the candidate is itself late, so
    // nlate = 1 ⟺ no OTHER late supplier). Both lineitem passes shuffle
    // on l_orderkey.
    r.reg("q_tpch_q21",
      """WITH po AS (
        |  SELECT l_orderkey,
        |    count(DISTINCT l_suppkey) AS nsupp,
        |    count(DISTINCT CASE WHEN l_discount > 0.06 THEN l_suppkey END) AS nlate
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_discount > 0.06) c
        |JOIN po ON c.l_orderkey = po.l_orderkey AND po.nsupp >= 2 AND po.nlate = 1
        |JOIN orders ON o_orderkey = c.l_orderkey AND o_orderstatus = 'F'
        |JOIN supplier ON s_suppkey = c.l_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin) { (s, dir) =>
      val late = col("l_discount") > 0.06
      val li = t(s, dir, "lineitem")
      val po = li.groupBy(col("l_orderkey").as("pokey"))
        .agg(countDistinct(col("l_suppkey")).as("nsupp"),
          countDistinct(when(late, col("l_suppkey"))).as("nlate"))
      val cands = li.filter(late).select("l_orderkey", "l_suppkey").distinct()
      val fOrders = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey").as("l_orderkey"))
      val sup = t(s, dir, "supplier").select("s_suppkey", "s_name")
      Joins.semi(
          cands.join(po, col("l_orderkey") === col("pokey") &&
            col("nsupp") >= 2 && col("nlate") === 1),
          fOrders, Seq("l_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(100)
    }

    // Q22: global sales opportunity. The phone-prefix country codes become
    // c_nationkey membership; "no orders in 7 years" becomes an anti join
    // against recent orders; the positive-balance average is a 1-row
    // aggregate broadcast into the filter.
    r.reg("q_tpch_q22",
      """WITH pool AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        |ab AS (
        |  SELECT CAST(CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE)
        |    / count(*) AS avg_bal
        |  FROM pool WHERE c_acctbal > 0.0)
        |SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
        |  CAST(CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS VARCHAR) AS DOUBLE) AS totacctbal
        |FROM pool, ab
        |WHERE c_acctbal > ab.avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
      val pool = t(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
        .select("c_custkey", "c_nationkey", "c_acctbal")
      val ab = pool.filter(col("c_acctbal") > 0.0)
        .agg((sum(col("c_acctbal").cast(DecimalType(18, 6))).cast(DecimalType(38, 6))
          .cast(DoubleType) / count(lit(1))).as("avg_bal"))
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1999-01-01").cast(TimestampType))
        .select(col("o_custkey").as("c_custkey"))
      Joins.anti(pool, recent, Seq("c_custkey"))
        .crossJoin(broadcast(ab))
        .filter(col("c_acctbal") > col("avg_bal"))
        .groupBy(col("c_nationkey").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast(DecimalType(18, 6))).cast(DecimalType(38, 6))
            .cast(DoubleType).as("totacctbal"))
        .orderBy("cntrycode")
    }
  }
}
