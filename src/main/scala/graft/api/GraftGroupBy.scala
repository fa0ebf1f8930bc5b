package graft.api

import org.apache.spark.sql.{Column, DataFrame, Encoder, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.functions.{col, lit, struct}

/** Group-by surface (reference `_groupby.py:992-1418`).
  *
  * Every aggregation here compiles to Spark's partial-agg → exchange →
  * final-agg pipeline, which is the reference's ApplyConcatApply /
  * ShuffleReduce machinery (reference `_reductions.py:110-475`) natively:
  * map-side combine happens before the shuffle, so the exchange moves one
  * row per (partition, key), not per input row — the property that makes
  * groupBy survive 100 TB inputs.
  */
final case class GraftGroupBy(df: DataFrame, keys: Seq[String]) {
  private def g = df.groupBy(keys.map(col): _*)

  def agg(exprs: Column*): GraftFrame = {
    require(exprs.nonEmpty, "groupby.agg needs at least one aggregate expression")
    GraftFrame(g.agg(exprs.head, exprs.tail: _*))
  }

  /** Dict-spec multi-agg, the reference's GroupbyAggregation spec compiler
    * (reference `_groupby.py:242-376`): `Map("x" -> Seq("sum","mean"))`.
    * Function names are whitelisted — no raw SQL interpolation. */
  def aggSpec(spec: Map[String, Seq[String]]): GraftFrame = {
    require(spec.nonEmpty && spec.values.forall(_.nonEmpty),
      "groupby.aggSpec needs a non-empty spec")
    val exprs = for {
      (c, fns) <- spec.toSeq
      fn <- fns
    } yield (fn match {
      case "sum"    => F.sum(col(c))
      case "mean"   => F.avg(col(c))
      case "min"    => F.min(col(c))
      case "max"    => F.max(col(c))
      case "count"  => F.count(col(c))
      case "var"    => F.var_samp(col(c))
      case "std"    => F.stddev_samp(col(c))
      case "median" => F.median(col(c))
      case "nunique"=> F.countDistinct(col(c))
      // HLL sketch (reference nunique_approx `_reductions.py:1028-1049`):
      // the scale path — bounded state vs an exact distinct shuffle
      case "nunique_approx" => F.approx_count_distinct(col(c))
      case "first"  => F.first(col(c))
      case "last"   => F.last(col(c))
      case "any"    => F.bool_or(col(c))
      case "all"    => F.bool_and(col(c))
      case "skew"   => F.skewness(col(c))
      case "kurt"   => F.kurtosis(col(c))
      case "sem"    => F.stddev_samp(col(c)) / F.sqrt(F.count(col(c)).cast("double"))
      case "prod"   => graft.operators.WindowOps.product(col(c))
      case "size"   => F.count(F.lit(1))
      case other    => throw new IllegalArgumentException(
        s"aggSpec: unsupported aggregate '$other' for column '$c'")
    }).as(s"${c}_$fn")
    GraftFrame(g.agg(exprs.head, exprs.tail: _*))
  }

  def sum(cols: String*): GraftFrame = GraftFrame(g.sum(cols: _*))
  def mean(cols: String*): GraftFrame = GraftFrame(g.mean(cols: _*))
  def min(cols: String*): GraftFrame = GraftFrame(g.min(cols: _*))
  def max(cols: String*): GraftFrame = GraftFrame(g.max(cols: _*))
  def count(): GraftFrame = GraftFrame(g.count())
  def size(): GraftFrame = GraftFrame(g.agg(F.count(lit(1)).as("size")))
  def nunique(c: String): GraftFrame =
    GraftFrame(g.agg(F.countDistinct(col(c)).as(s"${c}_nunique")))
  def median(c: String): GraftFrame =
    GraftFrame(g.agg(F.median(col(c)).as(s"${c}_median")))
  def prod(c: String): GraftFrame =
    GraftFrame(g.agg(graft.operators.WindowOps.product(col(c)).as(s"${c}_prod")))
  /** Deterministic first/last per group: pandas first/last follow row
    * order, which a distributed engine doesn't have — an explicit order
    * column is required (min_by/max_by, one agg pass). Ties on the order
    * column break on the value itself (same struct pattern as idxmin/
    * idxmax below) so the result never depends on partition order. */
  def firstBy(c: String, orderCol: String): GraftFrame =
    GraftFrame(g.agg(
      F.min_by(col(c), struct(col(orderCol), col(c))).as(s"${c}_first")))
  def lastBy(c: String, orderCol: String): GraftFrame =
    GraftFrame(g.agg(
      F.max_by(col(c), struct(col(orderCol), col(c))).as(s"${c}_last")))

  /** groupby(...).rolling(window) (reference `_rolling.py` groupby-
    * rolling): the partitioned Rolling with the group keys as window
    * partitions — already the scale-safe shape. */
  def rolling(orderCol: String, window: Int, minPeriods: Int = 1): Rolling =
    Rolling(df, keys, orderCol, window, minPeriods)

  /** Two-column covariance/correlation per group
    * (reference `_groupby.py:428-455` chunked co-moment). */
  def cov(c1: String, c2: String): GraftFrame =
    GraftFrame(g.agg(F.covar_samp(col(c1), col(c2)).as(s"cov_${c1}_$c2")))
  def corr(c1: String, c2: String): GraftFrame =
    GraftFrame(g.agg(F.corr(col(c1), col(c2)).as(s"corr_${c1}_$c2")))

  /** idxmin/idxmax (reference `_reductions.py:817-839`): `max_by`/`min_by`
    * with an explicit deterministic tie-break ordering column. */
  def idxmax(valueCol: String, idCol: String): GraftFrame =
    GraftFrame(g.agg(F.max_by(col(idCol), struct(col(valueCol), -col(idCol))).as(s"idxmax_$valueCol")))
  def idxmin(valueCol: String, idCol: String): GraftFrame =
    GraftFrame(g.agg(F.min_by(col(idCol), struct(col(valueCol), col(idCol))).as(s"idxmin_$valueCol")))

  /** group head: first n rows per key by `orderCol` — window row_number,
    * no per-group collection (reference GroupByHead `_groupby.py:622-633`). */
  def headPerGroup(n: Int, orderCol: Column): GraftFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    GraftFrame(df.withColumn("__rn__", F.row_number().over(w)).filter(col("__rn__") <= n).drop("__rn__"))
  }
  def tailPerGroup(n: Int, orderCol: Column): GraftFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol.desc)
    GraftFrame(df.withColumn("__rn__", F.row_number().over(w)).filter(col("__rn__") <= n).drop("__rn__"))
  }

  /** value_counts per group (reference `_reductions.py:1122-1158`). */
  def valueCounts(c: String): GraftFrame =
    GraftFrame(df.groupBy((keys :+ c).map(col): _*).agg(F.count(lit(1)).as("count")))

  def pivot(pivotCol: String, values: Seq[String], aggExpr: Column): GraftFrame =
    GraftFrame(g.pivot(pivotCol, values).agg(aggExpr))

  /** Multi-measure pivot (reference `test_reshape.py` pivot_table with
    * values=[...]: several value columns under one aggfunc — pandas'
    * column MultiIndex flattens here to Spark's `<pivotval>_<alias>`
    * names). Same single wide aggregation as [[pivot]]; alias every
    * aggExpr so the output names are deterministic. */
  def pivotAgg(pivotCol: String, values: Seq[String],
               aggExprs: Column*): GraftFrame = {
    require(aggExprs.nonEmpty, "pivotAgg needs at least one aggregate")
    GraftFrame(g.pivot(pivotCol, values).agg(aggExprs.head, aggExprs.tail: _*))
  }

  /** Grouping-sets supersets (SURVEY §2.5; absent in reference). */
  def cube(aggExprs: Column*): GraftFrame =
    GraftFrame(df.cube(keys.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*))
  def rollup(aggExprs: Column*): GraftFrame =
    GraftFrame(df.rollup(keys.map(col): _*).agg(aggExprs.head, aggExprs.tail: _*))

  /** get_group (reference `_groupby.py:794-809`) — one value per key
    * column, ANDed. */
  def getGroup(values: Seq[Any]): GraftFrame = {
    require(values.length == keys.length,
      s"getGroup: ${keys.length} key(s) ${keys.mkString(",")} but ${values.length} value(s)")
    val pred = keys.zip(values)
      .map { case (k, v) => col(k) === lit(v) }
      .reduce(_ && _)
    GraftFrame(df.filter(pred))
  }

  /** Per-group ordered shift/ffill/bfill (reference `_groupby.py:636-778`);
    * the group keys partition the window, so no single-task bottleneck. */
  def shift(c: String, n: Int, orderCol: Column): GraftFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
    GraftFrame(df.withColumn(s"${c}_shift",
      if (n >= 0) F.lag(col(c), n).over(w) else F.lead(col(c), -n).over(w)))
  }
  def ffill(c: String, orderCol: Column): GraftFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    GraftFrame(df.withColumn(c, F.last(col(c), ignoreNulls = true).over(w)))
  }
  def bfill(c: String, orderCol: Column): GraftFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    GraftFrame(df.withColumn(c, F.first(col(c), ignoreNulls = true).over(w)))
  }

  /** groupby().transform(agg) (reference GroupByTransform
    * `_groupby.py:636-778`): the group aggregate broadcast back onto
    * every row — an unordered window over the group keys, so it stays
    * one hash shuffle with no per-group collection. */
  def transform(c: String, aggFn: Column => Column, out: String): GraftFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    GraftFrame(df.withColumn(out, aggFn(col(c)).over(w)))
  }

  /** groupby().apply() escape hatch (reference `_groupby.py:636-778`):
    * all rows of a group reach one task via Spark's shuffle, then the
    * user function runs per group. */
  def applyGroups[K: Encoder, T: Encoder](keyFn: Row => K)(f: (K, Iterator[Row]) => Iterator[T])
      : org.apache.spark.sql.Dataset[T] =
    df.groupByKey(keyFn).flatMapGroups(f)
}
