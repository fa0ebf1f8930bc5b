package graft

import org.apache.spark.sql.functions._

import graft.api.GraftFrame
import graft.operators.Joins
import QHelp._

/** Join-family oracle queries (SURVEY §2.4). */
object QueriesJoins {

  def register(r: QueryRegistry): Unit = {

    r.reg("q_join_inner",
      """SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |WHERE o.o_totalprice > 200000.0
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 200000.0)
      Joins.merge(c, o, Seq("o_custkey"), "inner")
        .select(col("o_custkey").as("c_custkey"), col("c_name"),
          col("o_orderkey"), col("o_totalprice"))
        .orderBy("c_custkey", "o_orderkey")
    }

    r.reg("q_join_left",
      """SELECT o.o_orderkey, o.o_custkey, c.c_name
        |FROM (SELECT * FROM orders WHERE o_orderkey < 3000) o
        |LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 0.0) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 3000)
        .withColumnRenamed("o_custkey", "c_custkey")
      val c = t(s, dir, "customer").filter(col("c_acctbal") > 0.0)
      Joins.merge(o, c, Seq("c_custkey"), "left")
        .select(col("o_orderkey"), col("c_custkey").as("o_custkey"), col("c_name"))
        .orderBy("o_orderkey")
    }

    r.reg("q_join_right",
      """SELECT c.c_custkey, c.c_name, o.o_orderkey
        |FROM (SELECT * FROM orders WHERE o_orderkey < 3000) o
        |RIGHT JOIN (SELECT * FROM customer WHERE c_custkey < 150) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY c.c_custkey, o.o_orderkey NULLS FIRST""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 3000)
        .withColumnRenamed("o_custkey", "c_custkey")
      val c = t(s, dir, "customer").filter(col("c_custkey") < 150)
      Joins.merge(o, c, Seq("c_custkey"), "right")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"))
        .orderBy(col("c_custkey").asc, col("o_orderkey").asc_nulls_first)
    }

    r.reg("q_join_outer",
      """SELECT coalesce(a.k, b.k) AS k, a.av, b.bv FROM
        |(SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS av FROM orders WHERE o_orderstatus = 'O' GROUP BY 1) a
        |FULL OUTER JOIN
        |(SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS bv FROM orders WHERE o_orderstatus = 'F' GROUP BY 1) b
        |USING (k) ORDER BY k""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "orders").filter(col("o_orderstatus") === "O")
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("av"))
      val b = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("bv"))
      Joins.merge(a, b, Seq("k"), "outer").orderBy("k")
    }

    r.reg("q_join_suffixes",
      """SELECT n.n_nationkey, n.n_name AS name_x, r2.n_name AS name_y
        |FROM nation n JOIN (SELECT n_nationkey, n_name FROM nation) r2
        |  ON n.n_nationkey = r2.n_nationkey
        |ORDER BY n.n_nationkey""".stripMargin) { (s, dir) =>
      val n = t(s, dir, "nation")
      val n2 = t(s, dir, "nation").select("n_nationkey", "n_name")
      Joins.merge(n, n2, Seq("n_nationkey"), "inner")
        .select(col("n_nationkey"), col("n_name_x").as("name_x"), col("n_name_y").as("name_y"))
        .orderBy("n_nationkey")
    }

    r.reg("q_join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
      Joins.semi(c, o, Seq("o_custkey"))
        .select(col("o_custkey").as("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }

    // Anti-join against the *filtered* orders set so survivors exist at every
    // fixture SF (every customer has at least one order, so an unfiltered anti
    // join would be vacuously empty and the oracle hash would not discriminate).
    r.reg("q_join_anti",
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 250000.0)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
      Joins.anti(c, o, Seq("o_custkey"))
        .select(col("o_custkey").as("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }

    r.reg("q_join_indicator",
      """SELECT k, av, bv, _merge FROM (
        |  SELECT coalesce(a.k, b.k) AS k, a.av, b.bv,
        |    CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL THEN 'both'
        |         WHEN a.k IS NOT NULL THEN 'left_only' ELSE 'right_only' END AS _merge
        |  FROM (SELECT DISTINCT o_custkey AS k, 1 AS av FROM orders WHERE o_totalprice > 250000.0) a
        |  FULL OUTER JOIN (SELECT c_custkey AS k, 1 AS bv FROM customer WHERE c_custkey < 300) b
        |  USING (k)
        |) ORDER BY k""".stripMargin) { (s, dir) =>
      val a = t(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
        .select(col("o_custkey").as("k")).distinct().withColumn("av", lit(1))
      val b = t(s, dir, "customer").filter(col("c_custkey") < 300)
        .select(col("c_custkey").as("k")).withColumn("bv", lit(1))
      Joins.mergeIndicator(a, b, Seq("k")).orderBy("k")
    }

    r.reg("q_join_broadcast",
      """SELECT n.n_name, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").withColumnRenamed("c_nationkey", "n_nationkey")
      val n = t(s, dir, "nation")
      Joins.broadcastMerge(c, n, Seq("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy("n_name")
    }

    r.reg("q_join_multi",
      """SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS n_cust
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").withColumnRenamed("c_nationkey", "n_nationkey")
      val n = t(s, dir, "nation").withColumnRenamed("n_regionkey", "r_regionkey")
      val joined = Joins.joinMany(Seq(c, n), Seq("n_nationkey"), "inner")
      Joins.merge(joined, t(s, dir, "region"), Seq("r_regionkey"), "inner")
        .groupBy("r_name", "n_name").agg(count(lit(1)).as("n_cust"))
        .orderBy("r_name", "n_name")
    }

    r.reg("q_join_salted",
      """SELECT o.o_orderkey, c.c_name FROM orders o
        |JOIN (SELECT * FROM customer WHERE c_custkey < 100) c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
      val o = t(s, dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
      val c = t(s, dir, "customer").filter(col("c_custkey") < 100)
        .select("c_custkey", "c_name")
      Joins.saltedJoin(o, c, "c_custkey", saltFactor = 8)
        .select("o_orderkey", "c_name")
        .orderBy("o_orderkey")
    }

    r.reg("q_join_on_names",
      """SELECT c.c_custkey, o.o_orderkey FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |WHERE o.o_totalprice > 250000.0
        |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 250000.0)
      Joins.mergeOn(c, o, Seq("c_custkey"), Seq("o_custkey"), "inner")
        .select("c_custkey", "o_orderkey")
        .orderBy("c_custkey", "o_orderkey")
    }

    r.reg("q_asof_join",
      """SELECT c.event_id, c.user_id, c.ts, c.value, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50) c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("value_y").as("purchase_value"))
        .orderBy("event_id")
    }

    // direction='forward': earliest purchase AT/AFTER each click
    // (DuckDB ASOF with the inequality flipped matches the closest
    // qualifying row on the other side).
    r.reg("q_asof_forward",
      """SELECT c.event_id, c.user_id, c.ts, c.value, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50) c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("value_y").as("purchase_value"))
        .orderBy("event_id")
    }

    // direction='nearest': closer of the backward/forward matches, exact
    // tie -> backward (the oracle CASE mirrors the same rule).
    r.reg("q_asof_nearest",
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50),
        |p AS (SELECT * FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT c.event_id, p.ts AS bts, p.value AS bval
        |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
        |f AS (SELECT c.event_id, p.ts AS fts, p.value AS fval
        |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |  CASE WHEN fts IS NULL THEN bval
        |       WHEN bts IS NULL THEN fval
        |       WHEN (c.ts - bts) <= (fts - c.ts) THEN bval ELSE fval
        |  END AS purchase_value
        |FROM c JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("value_y").as("purchase_value"))
        .orderBy("event_id")
    }

    // tolerance: matches farther than 1 hour are nulled, rows kept.
    r.reg("q_asof_tolerance",
      """SELECT c.event_id, c.user_id, c.ts, c.value,
        |  CASE WHEN p.ts IS NOT NULL AND c.ts - p.ts <= INTERVAL 1 HOUR
        |       THEN p.value END AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50) c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          tolerance = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("value_y").as("purchase_value"))
        .orderBy("event_id")
    }

    // allow_exact_matches=False: strictly-earlier purchase only (DuckDB
    // ASOF with the strict inequality).
    r.reg("q_asof_strict",
      """SELECT c.event_id, c.user_id, c.ts, c.value, p.value AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50) c
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON c.user_id = p.user_id AND c.ts > p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select("user_id", "ts", "value")
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          allowExactMatches = false)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("value_y").as("purchase_value"))
        .orderBy("event_id")
    }

    // NULL-carry discipline (r7 struct refactor's discriminating oracle):
    // purchase values are NULLed for event_id % 3 = 0 and the matched
    // row's OWN timestamp rides along as a second value column, so the
    // gate proves the matched row's values move AS A UNIT — a per-column
    // ignoreNulls fill would borrow an OLDER row's value where the
    // matched value is NULL (and its purchase_ts would expose the
    // mismatch). Covers backward+tolerance here, forward and nearest
    // below; DuckDB ASOF carries the matched row verbatim, nulls and all.
    r.reg("q_asof_nulls",
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50),
        |p AS (SELECT user_id, ts,
        |        CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS pval,
        |        ts AS pts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |  CASE WHEN p.pts IS NOT NULL AND c.ts - p.pts <= INTERVAL 1 HOUR
        |       THEN p.pval END AS purchase_value,
        |  CASE WHEN p.pts IS NOT NULL AND c.ts - p.pts <= INTERVAL 1 HOUR
        |       THEN p.pts END AS purchase_ts
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          when(col("event_id") % 3 =!= 0, col("value")).as("pval"),
          col("ts").as("pts"))
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          tolerance = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("pval").as("purchase_value"), col("pts").as("purchase_ts"))
        .orderBy("event_id")
    }

    r.reg("q_asof_nulls_fwd",
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50),
        |p AS (SELECT user_id, ts,
        |        CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS pval,
        |        ts AS pts
        |      FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |  p.pval AS purchase_value, p.pts AS purchase_ts
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          when(col("event_id") % 3 =!= 0, col("value")).as("pval"),
          col("ts").as("pts"))
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          direction = "forward")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("pval").as("purchase_value"), col("pts").as("purchase_ts"))
        .orderBy("event_id")
    }

    r.reg("q_asof_nulls_near",
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50),
        |p AS (SELECT user_id, ts,
        |        CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS pval,
        |        ts AS pts
        |      FROM events WHERE event_type = 'purchase'),
        |b AS (SELECT c.event_id, p.pts AS bts, p.pval AS bval
        |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts),
        |f AS (SELECT c.event_id, p.pts AS fts, p.pval AS fval
        |      FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts)
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |  CASE WHEN fts IS NULL THEN bval
        |       WHEN bts IS NULL THEN fval
        |       WHEN (c.ts - bts) <= (fts - c.ts) THEN bval ELSE fval
        |  END AS purchase_value,
        |  CASE WHEN fts IS NULL THEN bts
        |       WHEN bts IS NULL THEN fts
        |       WHEN (c.ts - bts) <= (fts - c.ts) THEN bts ELSE fts
        |  END AS purchase_ts
        |FROM c JOIN b USING (event_id) JOIN f USING (event_id)
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          when(col("event_id") % 3 =!= 0, col("value")).as("pval"),
          col("ts").as("pts"))
      Joins.asofJoin(clicks, purchases, "ts", "ts", Seq("user_id"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("pval").as("purchase_value"), col("pts").as("purchase_ts"))
        .orderBy("event_id")
    }

    // Global (by-less) merge_asof: latest purchase ANYWHERE at/before
    // each click — asofJoinGlobal's range-partition + broadcast boundary
    // carry, checked against DuckDB's by-less ASOF. The right side is
    // pre-aggregated to one row per ts (max value) so the match is
    // tie-free at any SF.
    r.reg("q_asof_global",
      """WITH c AS (SELECT * FROM events WHERE event_type = 'click' AND user_id < 50),
        |p AS (SELECT ts, max(value) AS pval
        |      FROM events WHERE event_type = 'purchase' GROUP BY ts)
        |SELECT c.event_id, c.user_id, c.ts, c.value, p.pval AS last_purchase
        |FROM c ASOF LEFT JOIN p ON c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin) { (s, dir) =>
      val clicks = t(s, dir, "events")
        .filter(col("event_type") === "click" && col("user_id") < 50)
        .select("event_id", "user_id", "ts", "value")
      val purchases = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("ts").agg(max("value").as("pval"))
      Joins.asofJoinGlobal(clicks, purchases, "ts", "ts")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"),
          col("pval").as("last_purchase"))
        .orderBy("event_id")
    }

    // Bucketed co-located join through the driver gate: both sides are
    // persisted pre-shuffled on the join key (GraftFrame.toBucketedTable),
    // then joined WITHOUT any exchange (asserted in PlanAccessorsSpec) —
    // the durable cross-job co-location AQE can't provide. The oracle
    // computes the same join/agg from the raw tables, so the bucketed
    // round-trip is value-checked, not just planned.
    r.reg("q_bucketed_join",
      s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
         |  ${dsumDSql("o_totalprice")} AS sum_price
         |FROM orders, customer WHERE o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
      // repo-local like the other IO queries (QueriesCore qtmp convention);
      // overwrite mode makes reruns idempotent
      // per-JVM root (r16): the literal shared path raced across
      // concurrent verify JVMs (the r15-verdict fixture-isolation class)
      val base = graft.QHelp.qtmpDir("bucketed").getAbsolutePath
      GraftFrame(t(s, dir, "orders").select("o_custkey", "o_totalprice"))
        .toBucketedTable("g_b_orders", s"$base/orders", 8, Seq("o_custkey"))
      GraftFrame(t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")))
        .toBucketedTable("g_b_customer", s"$base/customer", 8, Seq("o_custkey"))
      s.table("g_b_orders").join(s.table("g_b_customer"), "o_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), dsumD(col("o_totalprice")).as("sum_price"))
        .orderBy("c_mktsegment")
    }
  }
}
