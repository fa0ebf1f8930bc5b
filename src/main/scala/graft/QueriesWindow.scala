package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{GraftFrame, Rolling}
import graft.operators.{Resample, WindowOps}
import QHelp._

/** Window / ordered / resample oracle queries (SURVEY §2.6-2.8).
  *
  * Determinism: window SUMs of doubles go through DECIMAL — engines use
  * different frame-evaluation strategies (per-frame rescan vs segment
  * tree), so double accumulation order differs; decimal accumulation is
  * order-independent. Count/min/max/lag/lead are order-safe as-is.
  */
object QueriesWindow {

  def register(r: QueryRegistry): Unit = {

    // oracle windowed decimal→double conversions go through dbl()
    // (VARCHAR-mediated): DuckDB's direct cast double-rounds once a
    // windowed unscaled sum leaves the 2^53 window — a SILENT hash
    // mismatch at larger SFs (r6 ADVICE; same discipline as QHelp.dsumD)
    r.reg("q_rolling",
      s"""SELECT event_id, user_id,
        |  ${dbl("sum(CAST(value AS DECIMAL(18,6))) OVER w")} AS roll_sum,
        |  CAST(${dbl("sum(CAST(value AS DECIMAL(18,6))) OVER w")} / count(value) OVER w AS DOUBLE) AS roll_mean,
        |  min(value) OVER w AS roll_min,
        |  max(value) OVER w AS roll_max,
        |  CAST(count(value) OVER w AS BIGINT) AS roll_n
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
      val roll = Rolling(base, Seq("user_id"), "event_id", window = 3)
      // decimal accumulation, DOUBLE output: raw DECIMAL result columns
      // don't survive the driver's pyarrow-vs-DuckDB canonicalization (r2)
      roll.withColumnRolled("roll_sum", roll.sum("dv").cast(DoubleType))
        .assign("roll_mean", roll.sum("dv").cast(DoubleType) / roll.count("value"))
        .assign("roll_min", roll.min("value"))
        .assign("roll_max", roll.max("value"))
        .assign("roll_n", roll.count("value"))
        .select("event_id", "user_id", "roll_sum", "roll_mean", "roll_min", "roll_max", "roll_n")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_rolling_spec",
      s"""SELECT event_id, user_id,
        |  min(value) OVER w AS value_min,
        |  max(value) OVER w AS value_max,
        |  CAST(count(value) OVER w AS BIGINT) AS value_count,
        |  ${dbl("sum(CAST(value AS DECIMAL(18,6))) OVER w")} AS dv_sum
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // dict-spec rolling agg (reference _rolling.py:220-225): every
      // member shares one window spec, so Catalyst plans a single
      // WindowExec — one shuffle+sort for the whole spec
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
      Rolling(base, Seq("user_id"), "event_id", window = 4)
        .aggSpec(Seq(
          "value" -> Seq("min", "max", "count"),
          "dv" -> Seq("sum")))
        .assign("dv_sum", col("dv_sum").cast(DoubleType))
        .select("event_id", "user_id", "value_min", "value_max",
          "value_count", "dv_sum")
        .sortValues(Seq("event_id" -> true)).df
    }

    // ranking/analytic superset (SURVEY §2.6: not in the reference; Spark
    // provides them codegen'd). rank/dense_rank/percent_rank ordered on a
    // ties-bearing key are deterministic; row_number/ntile order on the
    // unique event_id.
    r.reg("q_rank",
      """SELECT event_id, user_id,
        |  CAST(rank() OVER wt AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER wt AS BIGINT) AS drnk,
        |  CAST(percent_rank() OVER wt AS DOUBLE) AS prnk,
        |  CAST(row_number() OVER wu AS BIGINT) AS rn,
        |  CAST(ntile(4) OVER wu AS BIGINT) AS qtile
        |FROM (SELECT event_id, user_id, floor(value) AS fv
        |      FROM events WHERE user_id < 30)
        |WINDOW wt AS (PARTITION BY user_id ORDER BY fv),
        |       wu AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("fv", floor(col("value")).cast(DoubleType))
      base
        .withColumn("rnk", WindowOps.rank("fv", Seq("user_id")).cast(LongType))
        .withColumn("drnk", WindowOps.denseRank("fv", Seq("user_id")).cast(LongType))
        .withColumn("prnk", WindowOps.percentRank("fv", Seq("user_id")))
        .withColumn("rn", WindowOps.rowNumber("event_id", Seq("user_id")).cast(LongType))
        .withColumn("qtile", WindowOps.ntileN(4, "event_id", Seq("user_id")).cast(LongType))
        .select("event_id", "user_id", "rnk", "drnk", "prnk", "rn", "qtile")
        .orderBy("event_id")
    }

    r.reg("q_rolling_center",
      """SELECT event_id, user_id,
        |  min(value) OVER w AS cmin,
        |  max(value) OVER w AS cmax,
        |  CAST(count(value) OVER w AS BIGINT) AS cn
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
      val roll = Rolling(base, Seq("user_id"), "event_id", window = 3, center = true)
      roll.withColumnRolled("cmin", roll.min("value"))
        .assign("cmax", roll.max("value"))
        .assign("cn", roll.count("value"))
        .select("event_id", "user_id", "cmin", "cmax", "cn")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_rolling_time",
      s"""SELECT event_id, user_id,
        |  ${dbl("sum(CAST(value AS DECIMAL(18,6))) OVER w")} AS tsum,
        |  CAST(count(*) OVER w AS BIGINT) AS tn
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
      val w = Rolling.byTime(base, Seq("user_id"), "ts", spanSeconds = 3600)
      GraftFrame(base
        .withColumn("tsum", sum(col("dv")).over(w).cast(DoubleType))
        .withColumn("tn", count(lit(1)).over(w)))
        .select("event_id", "user_id", "tsum", "tn")
        .sortValues(Seq("event_id" -> true)).df
    }

    // rolling median / exact quantile / moment-form variance: integer-
    // valued doubles make the interpolation and moment arithmetic exact,
    // so both engines produce identical doubles regardless of their
    // internal algorithm (Welford vs moments would NOT match bitwise)
    r.reg("q_rolling_more",
      s"""SELECT event_id, user_id,
        |  median(fv) OVER w AS rmed,
        |  quantile_cont(fv, 0.25) OVER w AS rq25,
        |  CASE WHEN count(fv) OVER w > 1 THEN
        |    (${wsumSql("fv * fv", 28)}
        |     - ${wsumSql("fv", 18)}
        |       * ${wsumSql("fv", 18)}
        |       / CAST(count(fv) OVER w AS DOUBLE))
        |    / (CAST(count(fv) OVER w AS DOUBLE) - 1.0)
        |  ELSE NULL END AS rvar
        |FROM (SELECT event_id, user_id, floor(value) AS fv
        |      FROM events WHERE user_id < 30)
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("fv", floor(col("value")).cast(DoubleType))
        .withColumn("d1", col("fv").cast(DecimalType(18, 0)))
        .withColumn("d2", (col("fv") * col("fv")).cast(DecimalType(28, 0)))
      val roll = Rolling(base, Seq("user_id"), "event_id", window = 5)
      val s1 = roll.sum("d1").cast(DoubleType)
      val s2 = roll.sum("d2").cast(DoubleType)
      val n = roll.count("fv").cast(DoubleType)
      roll.withColumnRolled("rmed", roll.median("fv"))
        .assign("rq25", roll.quantile("fv", 0.25))
        .assign("rvar", when(n > 1.0, (s2 - s1 * s1 / n) / (n - lit(1.0))))
        .select("event_id", "user_id", "rmed", "rq25", "rvar")
        .sortValues(Seq("event_id" -> true)).df
    }

    // rolling cov/corr via decimal co-moments (same discipline as rvar in
    // q_rolling_more): integer-valued x/y make every window sum exact, so
    // the moment-form cov and corr are bit-identical across engines
    {
      def wsum(e: String, p: Int) = wsumSql(e, p)
      val n = "CAST(count(x) OVER w AS DOUBLE)"
      def mom(a: String, b: String, p: Int) =
        s"(${wsum(s"$a*$b", p)} - ${wsum(a, 18)} * ${wsum(b, 18)} / $n) / ($n - 1.0)"
      val covS = s"CASE WHEN $n > 1 THEN ${mom("x", "y", 28)} ELSE NULL END"
      val varxS = s"CASE WHEN $n > 1 THEN ${mom("x", "x", 28)} ELSE NULL END"
      val varyS = s"CASE WHEN $n > 1 THEN ${mom("y", "y", 28)} ELSE NULL END"
      val corrS = s"CASE WHEN ($varxS) > 0 AND ($varyS) > 0 THEN " +
        s"($covS) / sqrt(($varxS) * ($varyS)) ELSE NULL END"
      r.reg("q_rolling_cov",
        s"""SELECT event_id, user_id, $covS AS rcov, $corrS AS rcorr
           |FROM (SELECT event_id, user_id, floor(value) AS x,
           |             floor(value * 7) AS y
           |      FROM events WHERE user_id < 30)
           |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin) { (s, dir) =>
        val base = t(s, dir, "events").filter(col("user_id") < 30)
          .withColumn("x", floor(col("value")).cast(DoubleType))
          .withColumn("y", floor(col("value") * 7).cast(DoubleType))
          .withColumn("dx", col("x").cast(DecimalType(18, 0)))
          .withColumn("dy", col("y").cast(DecimalType(18, 0)))
          .withColumn("dxy", (col("x") * col("y")).cast(DecimalType(28, 0)))
          .withColumn("dxx", (col("x") * col("x")).cast(DecimalType(28, 0)))
          .withColumn("dyy", (col("y") * col("y")).cast(DecimalType(28, 0)))
        val roll = Rolling(base, Seq("user_id"), "event_id", window = 5)
        val cn = roll.count("x").cast(DoubleType)
        val sx = roll.sum("dx").cast(DoubleType)
        val sy = roll.sum("dy").cast(DoubleType)
        val sxy = roll.sum("dxy").cast(DoubleType)
        val sxx = roll.sum("dxx").cast(DoubleType)
        val syy = roll.sum("dyy").cast(DoubleType)
        val cov = when(cn > 1.0, (sxy - sx * sy / cn) / (cn - lit(1.0)))
        val vx = when(cn > 1.0, (sxx - sx * sx / cn) / (cn - lit(1.0)))
        val vy = when(cn > 1.0, (syy - sy * sy / cn) / (cn - lit(1.0)))
        val corr = when(vx > 0.0 && vy > 0.0, cov / sqrt(vx * vy))
        roll.withColumnRolled("rcov", cov)
          .assign("rcorr", corr)
          .select("event_id", "user_id", "rcov", "rcorr")
          .sortValues(Seq("event_id" -> true)).df
      }
    }

    // rolling skew/kurt in the population moment form (matches the global
    // q_skew_kurt discipline): decimal raw-moment window sums over
    // integer-valued y make m1..m4 bit-identical, and the identical
    // double expression trees then agree everywhere
    {
      def wsum(e: String, p: Int) = wsumSql(e, p)
      val n = "CAST(count(y) OVER w AS DOUBLE)"
      val m1 = s"(${wsum("y", 18)} / $n)"
      val m2 = s"(${wsum("y*y", 28)} / $n)"
      val m3 = s"(${wsum("y*y*y", 28)} / $n)"
      val m4 = s"(${wsum("y*y*y*y", 28)} / $n)"
      val v = s"($m2 - $m1 * $m1)"
      val skewS = s"CASE WHEN $n > 2 AND $v > 0 THEN " +
        s"($m3 - 3.0 * $m1 * $m2 + 2.0 * $m1 * $m1 * $m1) / ($v * sqrt($v)) " +
        "ELSE NULL END"
      val kurtS = s"CASE WHEN $n > 3 AND $v > 0 THEN " +
        s"($m4 - 4.0 * $m1 * $m3 + 6.0 * $m1 * $m1 * $m2 " +
        s"- 3.0 * $m1 * $m1 * $m1 * $m1) / ($v * $v) - 3.0 ELSE NULL END"
      r.reg("q_rolling_skew",
        s"""SELECT event_id, user_id, $skewS AS rskew, $kurtS AS rkurt
           |FROM (SELECT event_id, user_id, floor(value * 7) AS y
           |      FROM events WHERE user_id < 30)
           |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
           |  ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
           |ORDER BY event_id""".stripMargin) { (s, dir) =>
        val base = t(s, dir, "events").filter(col("user_id") < 30)
          .withColumn("y", floor(col("value") * 7).cast(DoubleType))
          .withColumn("d1", col("y").cast(DecimalType(18, 0)))
          .withColumn("d2", (col("y") * col("y")).cast(DecimalType(28, 0)))
          .withColumn("d3",
            (col("y") * col("y") * col("y")).cast(DecimalType(28, 0)))
          .withColumn("d4",
            (col("y") * col("y") * col("y") * col("y")).cast(DecimalType(28, 0)))
        val roll = Rolling(base, Seq("user_id"), "event_id", window = 6)
        val cn = roll.count("y").cast(DoubleType)
        val m1c = roll.sum("d1").cast(DoubleType) / cn
        val m2c = roll.sum("d2").cast(DoubleType) / cn
        val m3c = roll.sum("d3").cast(DoubleType) / cn
        val m4c = roll.sum("d4").cast(DoubleType) / cn
        val vc = m2c - m1c * m1c
        val skew = when(cn > 2.0 && vc > 0.0,
          (m3c - lit(3.0) * m1c * m2c + lit(2.0) * m1c * m1c * m1c)
            / (vc * sqrt(vc)))
        val kurt = when(cn > 3.0 && vc > 0.0,
          (m4c - lit(4.0) * m1c * m3c + lit(6.0) * m1c * m1c * m2c
            - lit(3.0) * m1c * m1c * m1c * m1c) / (vc * vc) - lit(3.0))
        roll.withColumnRolled("rskew", skew)
          .assign("rkurt", kurt)
          .select("event_id", "user_id", "rskew", "rkurt")
          .sortValues(Seq("event_id" -> true)).df
      }
    }

    // integer-valued doubles: sum-of-squares is exact, so the Scala-side
    // lambda (collect_list order) and the engine window sum agree bitwise
    r.reg("q_rolling_apply",
      """SELECT event_id, user_id,
        |  CASE WHEN count(v) OVER w >= 2 THEN sum(v * v) OVER w ELSE NULL END AS ssq
        |FROM (SELECT event_id, user_id, floor(value) AS v
        |      FROM events WHERE user_id < 30)
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id
        |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("v", floor(col("value")).cast(DoubleType))
      val roll = Rolling(base, Seq("user_id"), "event_id", window = 4, minPeriods = 2)
      roll.withColumnRolled("ssq", roll.applyRows("v", xs => xs.map(x => x * x).sum))
        .select("event_id", "user_id", "ssq")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_cumsum",
      s"""SELECT event_id, user_id,
        |  ${dbl("""sum(CAST(value AS DECIMAL(18,6)))
        |    OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")} AS csum,
        |  max(value) OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cmax,
        |  CAST(count(value) OVER (PARTITION BY user_id ORDER BY event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn
        |FROM events WHERE user_id < 30 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
      val w = WindowOps.cumWindow("event_id", Seq("user_id"))
      GraftFrame(base
        .withColumn("csum", WindowOps.cumsum("dv", w).cast(DoubleType))
        .withColumn("cmax", WindowOps.cummax("value", w))
        .withColumn("cn", WindowOps.cumcount("value", w)))
        .select("event_id", "user_id", "csum", "cmax", "cn")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_global_cumsum",
      s"""SELECT event_id,
        |  ${dbl("""sum(CAST(value AS DECIMAL(18,6)))
        |    OVER (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""")} AS gsum
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events")
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
        .select("event_id", "dv")
      GraftFrame(WindowOps.globalCumSum(base, "event_id", "dv", "gsum"))
        .assign("gsum", col("gsum").cast(DoubleType))
        .select("event_id", "gsum")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_cumprod",
      """SELECT l_orderkey, l_linenumber,
        |  product(CAST(l_linenumber AS DOUBLE))
        |    OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cprod
        |FROM lineitem WHERE l_orderkey < 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      // small exact integers: FP product is associative here, so engine
      // accumulation order cannot change the result
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") < 2000)
        .withColumn("ln_d", col("l_linenumber").cast(DoubleType))
      val w = WindowOps.cumWindow("l_linenumber", Seq("l_orderkey"))
      GraftFrame(base.withColumn("cprod", WindowOps.cumprod("ln_d", w)))
        .select("l_orderkey", "l_linenumber", "cprod")
        .sortValues(Seq("l_orderkey" -> true, "l_linenumber" -> true)).df
    }

    r.reg("q_diff_shift",
      """SELECT event_id, user_id,
        |  value - lag(value, 1) OVER w AS d1,
        |  lag(value, 2) OVER w AS s2,
        |  lead(value, 1) OVER w AS sm1
        |FROM events WHERE user_id < 30
        |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      GraftFrame(base
        .withColumn("d1", WindowOps.diff("value", 1, w))
        .withColumn("s2", WindowOps.shift("value", 2, w))
        .withColumn("sm1", WindowOps.shift("value", -1, w)))
        .select("event_id", "user_id", "d1", "s2", "sm1")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_ffill_bfill",
      """SELECT event_id, user_id,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff,
        |  first_value(v IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bf
        |FROM (SELECT event_id, user_id,
        |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |      FROM events WHERE user_id < 30)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
      GraftFrame(base
        .withColumn("ff", WindowOps.ffill("v", "event_id", Seq("user_id")))
        .withColumn("bf", WindowOps.bfill("v", "event_id", Seq("user_id"))))
        .select("event_id", "user_id", "ff", "bf")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_groupby_shift",
      """SELECT event_id, user_id,
        |  lag(value, 1) OVER (PARTITION BY user_id ORDER BY event_id) AS value_shift
        |FROM events WHERE user_id < 30 ORDER BY event_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "events").filter(col("user_id") < 30))
        .groupby("user_id")
        .shift("value", 1, col("event_id"))
        .select("event_id", "user_id", "value_shift")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_resample_agg",
      """SELECT date_trunc('hour', ts) AS bucket,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS vsum,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events")
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
      Resample.agg(base, "ts", "1 hour",
          sum(col("dv")).cast(DoubleType).as("vsum"),
          count(lit(1)).as("n"))
        .orderBy("bucket")
    }

    r.reg("q_resample_ohlc",
      """SELECT date_trunc('hour', ts) AS bucket,
        |  arg_min(value, event_id) AS open,
        |  max(value) AS high, min(value) AS low,
        |  arg_max(value, event_id) AS close
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      // event_id is unique and time-ordered within the fixture, so it is
      // the deterministic within-bin order required by open/close
      Resample.ohlc(t(s, dir, "events"), "ts", "1 hour", "value", col("event_id"))
        .orderBy("bucket")
    }

    // threshold baked as the SAME integer literal both sides: Scala
    // toLong truncates while a SQL CAST(double) rounds — an off-by-one
    // at the hash boundary otherwise
    r.reg("q_sample_hash",
      s"""SELECT o_orderkey FROM orders
         |WHERE (o_orderkey % 2147483648) * 2654435761 % 4294967296 < ${(0.1 * 4294967296L).toLong}
         |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .sampleByHash("o_orderkey", 0.1)
        .select("o_orderkey")
        .sortValues(Seq("o_orderkey" -> true)).df
    }

    // Domain-mixing: per-stratum deterministic rates off the same Knuth
    // hash (src0 upweighted, src1 downweighted, everything else at the
    // default) — the oracle recomputes the exact per-row decision.
    r.reg("q_sample_stratified",
      s"""SELECT doc_id, source FROM documents
         |WHERE (doc_id % 2147483648) * 2654435761 % 4294967296 <
         |  CASE WHEN source = 'src0' THEN ${(0.8 * 4294967296L).toLong}
         |       WHEN source = 'src1' THEN ${(0.05 * 4294967296L).toLong}
         |       ELSE ${(0.25 * 4294967296L).toLong} END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .sampleByHashStratified("doc_id", "source",
          Map("src0" -> 0.8, "src1" -> 0.05), default = 0.25)
        .select("doc_id", "source")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // Temperature-flattened domain mixing (alpha = 0.5): keep rates
    // derived from per-domain counts, p_d = sqrt(cmin / c_d), so the
    // expected sampled mix is proportional to sqrt(c_d). Every
    // arithmetic step is bit-reproducible cross-engine: integer counts,
    // correctly-rounded IEEE division/sqrt/multiply, integer floor,
    // then the same Knuth-hash compare as q_sample_hash — the oracle
    // recomputes the exact per-row decision.
    r.reg("q_temperature_mix",
      s"""WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
         |m AS (SELECT MIN(cnt) AS cmin FROM c),
         |thr AS (
         |  SELECT source,
         |    CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(cnt AS DOUBLE))
         |      * 4294967296) AS BIGINT) AS thr
         |  FROM c, m)
         |SELECT d.doc_id, d.source FROM documents d
         |JOIN thr USING (source)
         |WHERE (d.doc_id % 2147483648) * 2654435761 % 4294967296 < thr
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .sampleByTemperature("doc_id", "source", alpha = 0.5)
        .select("doc_id", "source")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // The equalizing endpoint (alpha = 0): p_d = cmin/c_d — exact
    // integer counts, one correctly-rounded division, integer floor —
    // pins the ratio path (alpha=0.5 pins the sqrt path above).
    r.reg("q_temperature_mix_flat",
      s"""WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
         |m AS (SELECT MIN(cnt) AS cmin FROM c),
         |thr AS (
         |  SELECT source,
         |    CAST(floor((CAST(cmin AS DOUBLE) / CAST(cnt AS DOUBLE))
         |      * 4294967296) AS BIGINT) AS thr
         |  FROM c, m)
         |SELECT d.doc_id, d.source FROM documents d
         |JOIN thr USING (source)
         |WHERE (d.doc_id % 2147483648) * 2654435761 % 4294967296 < thr
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .sampleByTemperature("doc_id", "source", alpha = 0.0)
        .select("doc_id", "source")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // Token-budgeted mixing: domain sizes measured by total chars (the
    // n_chars column — any integer weight), expected sampled mass per
    // domain ∝ W_d^0.5; same exact integer sums → sqrt → floor →
    // Knuth-hash chain, recomputed per row by the oracle.
    r.reg("q_temperature_mix_tokens",
      s"""WITH c AS (SELECT source, SUM(n_chars) AS cnt FROM documents GROUP BY source),
         |m AS (SELECT MIN(cnt) AS cmin FROM c),
         |thr AS (
         |  SELECT source,
         |    CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(cnt AS DOUBLE))
         |      * 4294967296) AS BIGINT) AS thr
         |  FROM c, m)
         |SELECT d.doc_id, d.source FROM documents d
         |JOIN thr USING (source)
         |WHERE (d.doc_id % 2147483648) * 2654435761 % 4294967296 < thr
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .sampleByTemperatureWeighted("doc_id", "source", "n_chars",
          alpha = 0.5)
        .select("doc_id", "source")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // Temperature UP-sampling (r12, alpha = 0.5): repeat factors
    // f_d = min(sqrt(cmax/c_d), maxRepeat) — floor(f) whole epochs plus
    // one fractional epoch kept under the (key, epoch)-salted Knuth
    // hash. The oracle recomputes the factor, the epoch explode, and
    // the exact per-copy keep decision; the largest domain keeps
    // exactly one copy of every row.
    // (The fixture's `source` domains are perfectly balanced — every
    // factor would be 1 and the oracle vacuous — so both engines derive
    // a skewed 60/30/10 domain from doc_id: tail repeats ~sqrt(6)x.)
    r.reg("q_temperature_upsample",
      s"""WITH d AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 10 < 6 THEN 'head'
         |         WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS dom
         |  FROM documents),
         |c AS (SELECT dom, COUNT(*) AS cnt FROM d GROUP BY dom),
         |m AS (SELECT MAX(cnt) AS cmax FROM c),
         |f AS (
         |  SELECT dom,
         |    LEAST(sqrt(CAST(cmax AS DOUBLE) / CAST(cnt AS DOUBLE)), 10.0) AS fac
         |  FROM c, m),
         |t AS (
         |  SELECT dom, CAST(floor(fac) AS BIGINT) AS fullr,
         |    CAST(floor((fac - floor(fac)) * 4294967296) AS BIGINT) AS thr
         |  FROM f),
         |r AS (SELECT unnest(range(0, 11)) AS epoch)
         |SELECT d.doc_id, d.dom, CAST(r.epoch AS BIGINT) AS epoch
         |FROM d JOIN t USING (dom) JOIN r ON r.epoch <= t.fullr
         |WHERE r.epoch < t.fullr
         |   OR ((d.doc_id % 2147483648 + r.epoch * 7919) % 2147483648)
         |      * 2654435761 % 4294967296 < t.thr
         |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 10 < 6, "head")
              .when(col("doc_id") % 10 < 9, "mid")
              .otherwise("tail").as("dom")))
        .upsampleByTemperature("doc_id", "dom", alpha = 0.5)
        .select("doc_id", "dom", "epoch")
        .sortValues(Seq("doc_id" -> true, "epoch" -> true)).df
    }

    // Token-weighted upsampling (r12): repeat factors from total domain
    // MASS (n_chars), f_d = min(sqrt(Wmax/W_d), 10) — same epoch
    // machinery as the doc-count form, recomputed exactly.
    r.reg("q_temperature_upsample_tokens",
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    CASE WHEN doc_id % 10 < 6 THEN 'head'
         |         WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS dom
         |  FROM documents),
         |c AS (SELECT dom, SUM(n_chars) AS cnt FROM d GROUP BY dom),
         |m AS (SELECT MAX(cnt) AS cmax FROM c),
         |f AS (
         |  SELECT dom,
         |    LEAST(sqrt(CAST(cmax AS DOUBLE) / CAST(cnt AS DOUBLE)), 10.0) AS fac
         |  FROM c, m),
         |t AS (
         |  SELECT dom, CAST(floor(fac) AS BIGINT) AS fullr,
         |    CAST(floor((fac - floor(fac)) * 4294967296) AS BIGINT) AS thr
         |  FROM f),
         |r AS (SELECT unnest(range(0, 11)) AS epoch)
         |SELECT d.doc_id, d.dom, CAST(r.epoch AS BIGINT) AS epoch
         |FROM d JOIN t USING (dom) JOIN r ON r.epoch <= t.fullr
         |WHERE r.epoch < t.fullr
         |   OR ((d.doc_id % 2147483648 + r.epoch * 7919) % 2147483648)
         |      * 2654435761 % 4294967296 < t.thr
         |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents")
          .select(col("doc_id"), col("n_chars"),
            when(col("doc_id") % 10 < 6, "head")
              .when(col("doc_id") % 10 < 9, "mid")
              .otherwise("tail").as("dom")))
        .upsampleByTemperatureWeighted("doc_id", "dom", "n_chars",
          alpha = 0.5)
        .select("doc_id", "dom", "epoch")
        .sortValues(Seq("doc_id" -> true, "epoch" -> true)).df
    }

    // EXPLICIT-RECIPE mixing (r13): the mixture-proportion-table form —
    // per-domain target masses, down- AND up-sampling in one call. The
    // budgets derive from the fixture's own masses (floor(0.4·W_head):
    // a literal budget would change meaning across scales), computed
    // identically on both engines; 'tail' is absent from the recipe and
    // must vanish. The oracle recomputes masses, budgets, factors
    // (LEAST(B/W, cap)), the epoch explode and the salted-hash keep
    // decision exactly — the q_temperature_upsample machinery with
    // recipe-driven factors.
    r.reg("q_budget_mix",
      s"""WITH d AS (
         |  SELECT doc_id, n_chars,
         |    CASE WHEN doc_id % 10 < 6 THEN 'head'
         |         WHEN doc_id % 10 < 9 THEN 'mid' ELSE 'tail' END AS dom
         |  FROM documents),
         |c AS (SELECT dom, SUM(n_chars) AS w FROM d GROUP BY dom),
         |b AS (
         |  SELECT dom, w,
         |    CASE dom
         |      WHEN 'head' THEN CAST(floor(CAST('0.4' AS DOUBLE) * CAST(w AS DOUBLE)) AS BIGINT)
         |      WHEN 'mid'  THEN CAST(floor(CAST('2.5' AS DOUBLE) * CAST(w AS DOUBLE)) AS BIGINT)
         |    END AS bud
         |  FROM c WHERE dom IN ('head', 'mid')),
         |f AS (
         |  SELECT dom,
         |    LEAST(CAST(bud AS DOUBLE) / CAST(w AS DOUBLE), 10.0) AS fac
         |  FROM b),
         |t AS (
         |  SELECT dom, CAST(floor(fac) AS BIGINT) AS fullr,
         |    CAST(floor((fac - floor(fac)) * 4294967296) AS BIGINT) AS thr
         |  FROM f),
         |r AS (SELECT unnest(range(0, 11)) AS epoch)
         |SELECT d.doc_id, d.dom, CAST(r.epoch AS BIGINT) AS epoch
         |FROM d JOIN t USING (dom) JOIN r ON r.epoch <= t.fullr
         |WHERE r.epoch < t.fullr
         |   OR ((d.doc_id % 2147483648 + r.epoch * 7919) % 2147483648)
         |      * 2654435761 % 4294967296 < t.thr
         |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          when(col("doc_id") % 10 < 6, "head")
            .when(col("doc_id") % 10 < 9, "mid")
            .otherwise("tail").as("dom"))
      val masses = d.groupBy("dom")
        .agg(sum(col("n_chars").cast("long")).as("w"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val budgets = Map(
        "head" -> math.floor(0.4 * masses("head").toDouble).toLong,
        "mid" -> math.floor(2.5 * masses("mid").toDouble).toLong)
      GraftFrame(d).sampleByBudget("doc_id", "dom", "n_chars", budgets)
        .select("doc_id", "dom", "epoch")
        .sortValues(Seq("doc_id" -> true, "epoch" -> true)).df
    }

    // Deterministic corpus shuffle: global position under the Knuth-hash
    // order (scale-safe two-pass plan) — the "shuffle before sharding"
    // training-data pass; the oracle replays the permutation exactly.
    r.reg("q_shuffle_index",
      """SELECT doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY (doc_id + 7) % 2147483648 * 2654435761 % 4294967296) - 1
        |    AS BIGINT) AS shuffle_pos
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .shuffleIndex("doc_id", seed = 7L)
        .select("doc_id", "shuffle_pos")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // SYSTEMATIC importance resampling (the DSIR-shaped per-ROW axis of
    // the mixing matrix): char mass plays the importance weight, rows
    // traverse in Knuth-hash order, and the oracle replays the exact
    // integer multiplicity floor(cum·n/W) − floor((cum−w)·n/W) for
    // every row — selection, certainty of heavy rows, and the exact-n
    // output size are all value-checked.
    r.reg("q_sample_systematic",
      """WITH w AS (
        |  SELECT doc_id, length(text) AS wgt,
        |    (doc_id + 7) % 2147483648 * 2654435761 % 4294967296 AS h
        |  FROM documents),
        |c AS (SELECT doc_id, wgt, SUM(wgt) OVER (ORDER BY h) AS cum FROM w),
        |tot AS (SELECT SUM(wgt) AS W FROM w),
        |m AS (
        |  SELECT doc_id,
        |    CAST((cum * 437) // W - ((cum - wgt) * 437) // W AS BIGINT) AS mult
        |  FROM c, tot)
        |SELECT doc_id, CAST(unnest(range(0, mult)) AS BIGINT) AS epoch
        |FROM m WHERE mult >= 1
        |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents")
          .withColumn("wgt", length(col("text"))))
        .sampleBySystematic("doc_id", "wgt", n = 437L, seed = 7L)
        .select("doc_id", "epoch")
        .sortValues(Seq("doc_id" -> true, "epoch" -> true)).df
    }

    // Deterministic train/val/test split: cumulative hash thresholds,
    // assignment independent of partitioning and of every other row.
    r.reg("q_split_hash",
      s"""SELECT doc_id,
         |  CASE WHEN (doc_id % 2147483648) * 2654435761 % 4294967296
         |         < ${(0.8 * 4294967296L).toLong} THEN 'train'
         |       WHEN (doc_id % 2147483648) * 2654435761 % 4294967296
         |         < ${((0.8 + 0.1) * 4294967296L).toLong} THEN 'val'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .splitByHash("doc_id", 0.8, 0.1)
        .select("doc_id", "split")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // Quality tiers by EXACT quantile cutpoints (r14 cont — the
    // curriculum / percentile-filter primitive): both engines
    // interpolate a + f·(b−a) at index p·(n−1) (the PercentileBetween
    // discipline), ties at a cutpoint land in the lower tier.
    r.reg("q_quality_tiers",
      """WITH cuts AS (
        |  SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS cs
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((CASE WHEN n_chars > cs[1] THEN 1 ELSE 0 END)
        |     + (CASE WHEN n_chars > cs[2] THEN 1 ELSE 0 END)
        |     + (CASE WHEN n_chars > cs[3] THEN 1 ELSE 0 END) AS INTEGER) AS tier
        |FROM documents, cuts ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "documents"))
        .withQuantileTier("n_chars", nTiers = 4)
        .select("doc_id", "tier")
        .sortValues(Seq("doc_id" -> true)).df
    }

    // Token-budget selection (r14 cont — "take the best B tokens"):
    // rank by (score desc, id asc), cumulate token counts through the
    // two-pass range cumsum, keep the prefix whose running total stays
    // within the budget (derived from the fixture's own mass — a
    // literal budget would change meaning across scales). The oracle
    // recomputes the ordered cumsum and every kept row's running total.
    r.reg("q_select_budget",
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
        |  FROM documents WHERE text IS NOT NULL),
        |b AS (SELECT CAST(floor(0.3 * sum(tok)) AS BIGINT) AS budget FROM d),
        |c AS (SELECT doc_id, tok,
        |       sum(tok) OVER (ORDER BY n_chars DESC, doc_id ASC
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM d)
        |SELECT doc_id, CAST(cum AS BIGINT) AS cum_tokens
        |FROM c, b WHERE cum <= budget ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = t(s, dir, "documents").filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("tok"))
      val budget = math.floor(
        0.3 * d.agg(sum("tok")).head().getLong(0)).toLong
      GraftFrame(d)
        .selectByBudget("n_chars", "tok", budget, "doc_id")
        .select("doc_id", "cum_tokens")
        .sortValues(Seq("doc_id" -> true)).df
    }

    r.reg("q_groupby_transform",
      s"""SELECT event_id, user_id,
        |  CAST(${dbl("sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id)")}
        |    / count(value) OVER (PARTITION BY user_id) AS DOUBLE) AS user_mean
        |FROM events WHERE user_id < 40 ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events").filter(col("user_id") < 40)
        .withColumn("dv", col("value").cast(DecimalType(18, 6)))
      GraftFrame(base)
        .groupby("user_id")
        .transform("dv", c => sum(c), "sum_d")
        .groupby("user_id")
        .transform("value", c => count(c), "cnt")
        .assign("user_mean", col("sum_d").cast(DoubleType) / col("cnt").cast(DoubleType))
        .select("event_id", "user_id", "user_mean")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_resample_more",
      """SELECT date_trunc('hour', ts) AS bucket,
        |  median(CAST(floor(value) AS DOUBLE)) AS med_v,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS users
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events")
        .withColumn("fv", floor(col("value")).cast(DoubleType))
      Resample.agg(base, "ts", "1 hour",
          median(col("fv")).as("med_v"),
          countDistinct(col("user_id")).as("users"))
        .orderBy("bucket")
    }

    // Remaining analytic members: cume_dist over a unique order (ties in
    // cume_dist change values, so the order column is the unique id);
    // nth_value/first over the default growing frame.
    r.reg("q_rank2",
      """SELECT event_id, user_id,
        |  CAST(cume_dist() OVER wu AS DOUBLE) AS cd,
        |  nth_value(value, 3) OVER wu AS nv3,
        |  first_value(value) OVER wu AS fv
        |FROM events WHERE user_id < 30
        |WINDOW wu AS (PARTITION BY user_id ORDER BY event_id)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir, "events").filter(col("user_id") < 30)
        .withColumn("cd", WindowOps.cumeDist("event_id", Seq("user_id")))
        .withColumn("nv3", WindowOps.nthValue(col("value"), 3, "event_id", Seq("user_id")))
        .withColumn("fv", WindowOps.firstValue(col("value"), "event_id", Seq("user_id")))
        .select("event_id", "user_id", "cd", "nv3", "fv")
        .orderBy("event_id")
    }

    // Batch sessionization over the events stream table: 30-minute gap,
    // exact-microsecond arithmetic, event_id tiebreaker — every session
    // assignment value-checked.
    r.reg("q_sessionize",
      """WITH g AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |         THEN 1 ELSE 0 END AS ns
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |FROM g ORDER BY event_id""".stripMargin) { (s, dir) =>
      graft.operators.WindowOps.sessionize(
          t(s, dir, "events"), Seq("user_id"), "ts", 1800L, "event_id")
        .select("event_id", "user_id", "session_id")
        .orderBy("event_id")
    }

    r.reg("q_sort_multi",
      """SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        |ORDER BY o_orderdate DESC NULLS LAST, o_orderkey ASC NULLS LAST""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .sortValues(Seq("o_orderdate" -> false, "o_orderkey" -> true)).df
    }

    r.reg("q_set_index",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      // setIndex = range shuffle + local sort (divisions established);
      // terminal global order only for the deterministic compare
      GraftFrame(t(s, dir, "orders"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .setIndex("o_custkey")
        .sortValues(Seq("o_custkey" -> true, "o_orderkey" -> true)).df
    }

    // rename_axis/reset_index: index-column rename flows through the
    // pipeline (the renamed column feeds a real aggregation)
    r.reg("q_rename_axis",
      """SELECT o_custkey AS cust_id, count(*) AS n FROM orders
        |GROUP BY 1 ORDER BY cust_id LIMIT 100""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .setIndex("o_custkey").renameAxis("cust_id").resetIndex
        .df.groupBy("cust_id").agg(count(lit(1)).as("n"))
        .orderBy("cust_id").limit(100)
    }

    r.reg("q_global_ffill",
      """SELECT event_id,
        |  last_value(v IGNORE NULLS) OVER (ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff
        |FROM (SELECT event_id,
        |        CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        |      FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val base = t(s, dir, "events")
        .withColumn("v", when(col("event_type") === "error", lit(null)).otherwise(col("value")))
        .select("event_id", "v")
      GraftFrame(WindowOps.globalFfill(base, "event_id", "v", "ff"))
        .select("event_id", "ff")
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_global_rolling",
      """SELECT event_id, v,
        |  sum(v) OVER (ORDER BY event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rsum
        |FROM (SELECT event_id, floor(value) AS v FROM events)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      // integer-valued doubles so the imperative sliding sum and the
      // engine's window sum are bit-identical regardless of FP order
      val base = t(s, dir, "events")
        .withColumn("v", floor(col("value")).cast(DoubleType))
        .select("event_id", "v")
      GraftFrame(WindowOps.globalRollingSum(base, "event_id", "v", 5, "rsum"))
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_map_overlap",
      """SELECT event_id, value - lag(value) OVER (ORDER BY event_id) AS d
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      val schema = StructType(Seq(
        StructField("event_id", LongType), StructField("d", DoubleType)))
      GraftFrame(t(s, dir, "events").select("event_id", "value"))
        .mapOverlap("event_id", before = 1, after = 0, schema) { it =>
          var prev: Option[Double] = None
          it.flatMap { case (owned, row) =>
            val v = row.getDouble(1)
            val out =
              if (!owned) None
              else Some(org.apache.spark.sql.Row(row.getLong(0),
                prev.map(p => v - p).orNull))
            prev = Some(v)
            out
          }
        }
        .sortValues(Seq("event_id" -> true)).df
    }

    r.reg("q_groupby_apply",
      """SELECT user_id, max(value) - min(value) AS vrange
        |FROM events WHERE user_id < 40 GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      // flatMapGroups escape hatch: arbitrary per-group logic (here a
      // range, so the oracle can recompute it relationally)
      import s.implicits._
      GraftFrame(t(s, dir, "events").filter(col("user_id") < 40)
        .select("user_id", "value")
        .groupByKey((r: org.apache.spark.sql.Row) => r.getLong(0))
        .flatMapGroups { (k: Long, it: Iterator[org.apache.spark.sql.Row]) =>
          var mn = Double.MaxValue
          var mx = Double.MinValue
          var any = false
          it.foreach { r => val v = r.getDouble(1); any = true
            if (v < mn) mn = v; if (v > mx) mx = v }
          if (any) Iterator((k, mx - mn)) else Iterator.empty
        }.toDF("user_id", "vrange"))
        .sortValues(Seq("user_id" -> true)).df
    }

    r.reg("q_repartition",
      """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n FROM orders
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      GraftFrame(t(s, dir, "orders"))
        .repartitionByKeys(16, "o_custkey")
        .groupby("o_custkey").agg(count(lit(1)).as("n"))
        .sortValues(Seq("o_custkey" -> true)).df
    }
  }
}
