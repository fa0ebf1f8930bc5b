package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints, verified in ONE aggregate pass.
  *
  * The 100 TB posture: an expectation set over an ingest shard (or the
  * whole corpus) compiles to conditional aggregates inside a single
  * scan — adding a constraint adds a codegen'd expression, never a job.
  * The report is O(constraints) rows, so the gate form ([[requireAll]])
  * costs one bounded collect on top of the scan. Public-provenance
  * concept: declarative unit tests for data, "Automating Large-Scale
  * Data Quality Verification" (Schelter et al., VLDB 2018) / AWS Deequ;
  * the reference's analog is its frame-metadata validation on ingest
  * boundaries (`io/parquet.py` schema enforcement) — this family adds
  * the VALUE-level contract those checks stop short of.
  *
  * Report schema — one row per constraint, in declaration order:
  * `(constraint, column, observed, lo, hi, passed)` where `passed =
  * lo <= observed <= hi` (inclusive both ends). Ratio constraints use
  * `lo = minRatio, hi = 1.0`; interval constraints carry their own
  * ends. All `observed` metrics are engine-deterministic doubles:
  * integer counts cast to double individually and divided once (a
  * single IEEE division of exact inputs), and means go through a
  * decimal sum (order-independent) per the repo's oracle discipline.
  *
  * Empty-denominator convention: a ratio over zero qualifying rows is
  * vacuously 1.0 (an empty shard violates nothing; pair with
  * [[RowCountBetween]] when emptiness itself is the defect).
  *
  * Plan shape (audited): Scan → [Expand] → partial agg → one
  * aggregate-row exchange → final agg → Generate(report). The only
  * caveat to "one scan": each DISTINCT-style constraint ([[Unique]],
  * [[PercentileBetween]]) adds a branch to the map-side Expand, so d
  * such constraints replicate the scanned rows ×(d+1) BEFORE the
  * partial aggregate — still one pass over the files, but budget
  * Unique/percentile constraints on a 100 TB audit accordingly (the
  * counting constraints are free; they fold into one branch).
  */
object Checks {

  sealed trait Constraint

  /** Fraction of rows with `column` non-null must reach `minRatio`. */
  final case class NotNull(column: String, minRatio: Double = 1.0)
    extends Constraint

  /** Distinct non-null tuples over `columns` / total rows must reach
    * `minRatio` (1.0 = a true key). Tuples with ANY null component are
    * excluded from the distinct count (SQL COUNT DISTINCT semantics) —
    * cover null keys with [[NotNull]]. */
  final case class Unique(columns: Seq[String], minRatio: Double = 1.0)
    extends Constraint

  /** Fraction of NON-NULL values inside [lo, hi] (inclusive) must reach
    * `minRatio`. Null presence is [[NotNull]]'s job. */
  final case class Bounds(column: String, lo: Double, hi: Double,
                          minRatio: Double = 1.0) extends Constraint

  /** Fraction of non-null values in `allowed` must reach `minRatio`.
    * Values may be any literal type `isin` accepts (strings, numbers). */
  final case class InSet(column: String, allowed: Seq[Any],
                         minRatio: Double = 1.0) extends Constraint

  /** Fraction of non-null values matching `regex` (Java dialect; keep
    * to the RE2-compatible subset if an external oracle recomputes the
    * report) must reach `minRatio`. */
  final case class Matches(column: String, regex: String,
                           minRatio: Double = 1.0) extends Constraint

  /** Total row count must land in [lo, hi] (inclusive). */
  final case class RowCountBetween(lo: Long, hi: Long) extends Constraint

  /** Fraction of non-null array values with EXACTLY `dim` elements must
    * reach `minRatio` — the embedding-shard admission check: a
    * wrong-dimension vector would fold to the encode sentinel (or fail
    * a zip) deep inside an index append; refuse it at the door. */
  final case class VectorDim(column: String, dim: Int,
                             minRatio: Double = 1.0) extends Constraint

  /** Fraction of non-null array values whose every element is finite
    * (no NaN/±Inf) must reach `minRatio` — NaN cosines rank as null
    * and silently vanish from retrieval; catch the feed at admission. */
  final case class FiniteVector(column: String, minRatio: Double = 1.0)
    extends Constraint

  /** Fraction of rows satisfying an arbitrary SQL predicate must reach
    * `minRatio` — the free-form cross-column contract (`"n_chars =
    * length(text)"`, `"ts_end >= ts_start"`) the typed constraints
    * can't spell. `name` labels the report row (predicates make poor
    * identifiers). A NULL predicate result counts as NOT satisfied
    * (SQL WHERE semantics). Keep the predicate in the shared SQL
    * subset when an external oracle recomputes the report. */
  final case class Satisfies(name: String, predicate: String,
                             minRatio: Double = 1.0) extends Constraint

  /** Mean of non-null `column` values must land in [lo, hi]. The sum
    * rides decimal(38,12) — order-independent, so the report hashes
    * identically at any partitioning. */
  final case class MeanBetween(column: String, lo: Double, hi: Double)
    extends Constraint

  /** EXACT interpolated percentile `p` of non-null `column` values must
    * land in [lo, hi] — the tail-shape check a mean can't see (one
    * giant document moves the mean, the p99 flags a whole drifted
    * tail). Exact, not approximate: `percentile()` sorts per group —
    * fine for the O(shard) admission use; reach for
    * `approx_percentile` manually when auditing a full 100 TB corpus
    * in one pass. Both DuckDB's `quantile_cont` and Spark interpolate
    * `a + f·(b−a)`, so the observed value is oracle-exact. */
  final case class PercentileBetween(column: String, p: Double,
                                     lo: Double, hi: Double)
    extends Constraint

  /** The compiled form: metric expression + report row constants. */
  private final case class Compiled(name: String, colDesc: String,
                                    metric: Column, lo: Double, hi: Double)

  /** A ratio of two count-style longs: each side cast to double, ONE
    * division — deterministic on any engine; vacuously 1.0 on an empty
    * denominator. */
  private def ratio(num: Column, den: Column): Column =
    when(den === 0L, lit(1.0))
      .otherwise(num.cast("double") / den.cast("double"))

  private def compile(c: Constraint): Compiled = c match {
    case NotNull(cn, r) =>
      Compiled("not_null", cn, ratio(count(col(cn)), count(lit(1))), r, 1.0)
    case Unique(cols, r) =>
      Compiled("unique", cols.mkString(","),
        ratio(countDistinct(col(cols.head), cols.tail.map(col): _*),
          count(lit(1))), r, 1.0)
    case Bounds(cn, lo, hi, r) =>
      Compiled("bounds", cn,
        ratio(count(when(col(cn) >= lo && col(cn) <= hi, lit(1))),
          count(col(cn))), r, 1.0)
    case InSet(cn, allowed, r) =>
      Compiled("in_set", cn,
        ratio(count(when(col(cn).isin(allowed: _*), lit(1))),
          count(col(cn))), r, 1.0)
    case Matches(cn, re, r) =>
      Compiled("matches", cn,
        ratio(count(when(col(cn).rlike(re), lit(1))), count(col(cn))),
        r, 1.0)
    case RowCountBetween(lo, hi) =>
      Compiled("row_count", "*", count(lit(1)).cast("double"),
        lo.toDouble, hi.toDouble)
    case MeanBetween(cn, lo, hi) =>
      Compiled("mean", cn,
        when(count(col(cn)) === 0L, lit(Double.NaN))
          .otherwise(sum(col(cn).cast("decimal(38,12)")).cast("double")
            / count(col(cn)).cast("double")), lo, hi)
    case PercentileBetween(cn, p, lo, hi) =>
      Compiled(s"p$p", cn,
        coalesce(expr(s"percentile($cn, $p)").cast("double"),
          lit(Double.NaN)), lo, hi)
    case VectorDim(cn, dim, r) =>
      Compiled("vector_dim", cn,
        ratio(count(when(size(col(cn)) === dim, lit(1))),
          count(col(cn))), r, 1.0)
    case FiniteVector(cn, r) =>
      Compiled("finite_vector", cn,
        ratio(count(when(!exists(col(cn), e =>
            isnan(e.cast("double")) ||
              abs(e.cast("double")) === lit(Double.PositiveInfinity)),
          lit(1))), count(col(cn))), r, 1.0)
    case Satisfies(nm, pred, r) =>
      Compiled("satisfies", nm,
        ratio(count(when(expr(pred), lit(1))), count(lit(1))), r, 1.0)
  }

  /** Evaluate `constraints` against `df` in one aggregate pass; returns
    * the `(constraint, column, observed, lo, hi, passed)` report in
    * declaration order. A NaN observed (empty [[MeanBetween]]) fails —
    * NaN comparisons are false. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check: empty constraint list")
    val compiled = constraints.map(compile)
    val metrics = compiled.zipWithIndex.map { case (cc, i) =>
      cc.metric.as(s"__m$i") }
    val rows = compiled.zipWithIndex.map { case (cc, i) =>
      struct(lit(cc.name).as("constraint"), lit(cc.colDesc).as("column"),
        col(s"__m$i").as("observed"), lit(cc.lo).as("lo"),
        lit(cc.hi).as("hi"),
        (col(s"__m$i") >= cc.lo && col(s"__m$i") <= cc.hi).as("passed")) }
    df.agg(metrics.head, metrics.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.constraint"), col("r.column"), col("r.observed"),
        col("r.lo"), col("r.hi"), col("r.passed"))
  }

  /** Per-GROUP constraint report — the fleet view: one row per (group,
    * constraint), still ONE aggregate pass (a map-side-combined groupBy
    * instead of a global agg — the shuffle carries only
    * |groups| × |constraints| partial aggregates, never rows). The
    * per-source / per-language quality dashboards a 100 TB corpus runs
    * daily are exactly this shape. [[RowCountBetween]] bounds each
    * GROUP's size here; [[Unique]] is within-group distinctness.
    * Output is sorted (group cols, then constraint, column, lo) so the
    * report is deterministic under any partitioning. */
  def checkBy(df: DataFrame, groupCols: Seq[String],
              constraints: Seq[Constraint]): DataFrame = {
    require(groupCols.nonEmpty, "checkBy: empty group column list")
    require(constraints.nonEmpty, "checkBy: empty constraint list")
    val compiled = constraints.map(compile)
    val metrics = compiled.zipWithIndex.map { case (cc, i) =>
      cc.metric.as(s"__m$i") }
    val rows = compiled.zipWithIndex.map { case (cc, i) =>
      struct(lit(cc.name).as("constraint"), lit(cc.colDesc).as("column"),
        col(s"__m$i").as("observed"), lit(cc.lo).as("lo"),
        lit(cc.hi).as("hi"),
        (col(s"__m$i") >= cc.lo && col(s"__m$i") <= cc.hi).as("passed")) }
    df.groupBy(groupCols.map(col): _*)
      .agg(metrics.head, metrics.tail: _*)
      .select(groupCols.map(col) :+ explode(array(rows: _*)).as("r"): _*)
      .select(groupCols.map(col) ++ Seq(col("r.constraint"),
        col("r.column"), col("r.observed"), col("r.lo"), col("r.hi"),
        col("r.passed")): _*)
      .orderBy(groupCols.map(col) ++
        Seq(col("constraint"), col("column"), col("lo")): _*)
  }

  /** The GATE form: evaluate and pass `df` through unchanged when every
    * constraint holds; otherwise throw, naming each failing constraint
    * with its observed value — the loud-refusal discipline every ingest
    * entrypoint in this repo follows. Costs the one aggregate pass plus
    * an O(constraints) collect. */
  def requireAll(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val failed = check(df, constraints).filter(!col("passed")).collect()
    if (failed.nonEmpty) {
      val lines = failed.map(r =>
        s"${r.getString(0)}(${r.getString(1)}): observed ${r.getDouble(2)} " +
          s"outside [${r.getDouble(3)}, ${r.getDouble(4)}]")
      throw new IllegalStateException(
        s"data-quality gate failed ${failed.length} constraint(s):\n  " +
          lines.mkString("\n  "))
    }
    df
  }

  /** The per-group gate: EVERY group must satisfy every constraint —
    * the per-domain contract form ("each language keeps ≥N docs",
    * "every source's null ratio stays 0"). One [[checkBy]] pass; the
    * refusal names each (group, constraint) failure, capped at 20
    * lines so a wholesale-broken frame doesn't dump its whole report
    * into the exception. */
  def requireAllBy(df: DataFrame, groupCols: Seq[String],
                   constraints: Seq[Constraint]): DataFrame = {
    val rep = checkBy(df, groupCols, constraints)
    val failed = rep.filter(!col("passed")).collect()
    if (failed.nonEmpty) {
      val n = groupCols.length
      val lines = failed.take(20).map { r =>
        val grp = (0 until n).map(i => String.valueOf(r.get(i)))
          .mkString(",")
        s"[$grp] ${r.getString(n)}(${r.getString(n + 1)}): observed " +
          s"${r.getDouble(n + 2)} outside " +
          s"[${r.getDouble(n + 3)}, ${r.getDouble(n + 4)}]"
      }
      val more = if (failed.length > 20)
        s"\n  ... and ${failed.length - 20} more" else ""
      throw new IllegalStateException(
        s"per-group data-quality gate failed ${failed.length} " +
          s"(group, constraint) pair(s):\n  " +
          lines.mkString("\n  ") + more)
    }
    df
  }
}
