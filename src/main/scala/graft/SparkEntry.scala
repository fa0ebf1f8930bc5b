package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.{GraftFrame, GraftGroupBy, Rolling}
import graft.operators.{Joins, Reductions, Resample, WindowOps}

/** Driver contract — one `queries` entry per implemented operator from
  * SURVEY.md §2, each with a DuckDB-equivalent `oracleSql`.
  *
  * Determinism rules used throughout (the driver hash-compares values):
  *  - every query ends in ORDER BY over a unique key set;
  *  - double-typed AGGREGATES go through exact DECIMAL sums (order of
  *    partial aggregation must not change the result bit-for-bit);
  *    per-row double arithmetic is deterministic and stays double;
  *  - ratios (avg/var/corr) are computed from exact decimal moments with
  *    the final division done in double on both sides — bit-identical
  *    inputs give bit-identical IEEE results.
  */
object SparkEntry {

  // ---------- helpers ----------
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** Exact, order-independent sum of a double expression. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale))
  /** Exact mean: decimal sum / count, final division in double. */
  private def dmean(c: Column): Column =
    dsum(c, 6).cast(DoubleType) / count(c)
  /** Exact sample variance from decimal moments (Chan/Welford is what
    * Spark's var_samp does internally — reference `_reductions.py:900-963`
    * — but its double accumulation is partition-order-dependent; the
    * moment form over exact decimals is reproducible). */
  private def dvar(c: Column): Column = {
    val s1 = dsum(c, 6).cast(DoubleType)
    val s2 = sum((c * c).cast(DecimalType(28, 8))).cast(DecimalType(38, 8)).cast(DoubleType)
    val n = count(c).cast(DoubleType)
    (s2 - s1 * s1 / n) / (n - lit(1.0))
  }
  private val dsumSql = (x: String, scale: Int) =>
    s"CAST(sum(CAST($x AS DECIMAL(18,$scale))) AS DECIMAL(38,$scale))"
  private def dmeanSql(x: String) =
    s"(CAST(${dsumSql(x, 6)} AS DOUBLE) / count($x))"
  private def dvarSql(x: String) =
    s"((CAST(CAST(sum(CAST(($x) * ($x) AS DECIMAL(28,8))) AS DECIMAL(38,8)) AS DOUBLE)" +
      s" - CAST(${dsumSql(x, 6)} AS DOUBLE) * CAST(${dsumSql(x, 6)} AS DOUBLE) / CAST(count($x) AS DOUBLE))" +
      s" / (CAST(count($x) AS DOUBLE) - 1.0))"

  /** Flagship: TPC-H Q1 over the graft API (scan → pushed filter →
    * partial/final agg → sort). Driver smoke-checks rows>0 at sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    q1Pricing(spark, "/root/testdata/sf0.001")

  private def q1Pricing(s: SparkSession, dir: String): DataFrame =
    GraftFrame(t(s, dir, "lineitem"))
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupby("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 8).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 8).as("sum_charge"),
        dmean(col("l_quantity")).as("avg_qty"),
        dmean(col("l_extendedprice")).as("avg_price"),
        dmean(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .sortValues(Seq("l_returnflag" -> true, "l_linestatus" -> true))
      .df

  private val q1PricingSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,8))) AS DECIMAL(38,8)) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,8))) AS DECIMAL(38,8)) AS sum_charge,
      |  (CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / count(l_quantity)) AS avg_qty,
      |  (CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / count(l_extendedprice)) AS avg_price,
      |  (CAST(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS DOUBLE) / count(l_discount)) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // =====================================================================
  // queries + oracles. Registered pairwise to keep names in sync.
  // =====================================================================
  private val registry = scala.collection.mutable.LinkedHashMap[String,
    ((SparkSession, String) => DataFrame, Option[String])]()
  private def reg(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Unit =
    registry(name) = (fn, Option(sql).filter(_.nonEmpty))

  // ---- IO / scan (SURVEY §2.1) ----
  reg("q_read_parquet",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1994-01-01 00:00:00'
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    // projection + predicate reach the parquet scan (PushedFilters)
    GraftFrame(t(s, dir, "lineitem"))
      .filter(col("l_shipdate") < lit("1994-01-01").cast(TimestampType))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .sortValues(Seq("l_orderkey" -> true, "l_linenumber" -> true)).df
  }

  // ---- projections / filters / row ops (SURVEY §2.2) ----
  reg("q_projection",
    "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey") { (s, dir) =>
    GraftFrame(t(s, dir, "customer")).select("c_custkey", "c_name")
      .sortValues(Seq("c_custkey" -> true)).df
  }

  reg("q_filter",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    GraftFrame(t(s, dir, "orders"))
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
      .sortValues(Seq("o_orderkey" -> true)).df
  }

  reg("q_head",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 10") { (s, dir) =>
    GraftFrame(t(s, dir, "orders")).select("o_orderkey", "o_totalprice")
      .sortValues(Seq("o_orderkey" -> true)).head(10).df
  }

  reg("q_assign_arith",
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

  // ---- flagship groupby-agg (SURVEY §2.5, TPC-H Q1) ----
  reg("q_groupby_agg", q1PricingSql)((s, dir) => q1Pricing(s, dir))

  // ---- join (SURVEY §2.4) ----
  reg("q_join_inner",
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

  // ---------- public contract ----------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.view.mapValues(_._1).toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (k, (_, Some(sql))) => k -> sql }.toMap
}
