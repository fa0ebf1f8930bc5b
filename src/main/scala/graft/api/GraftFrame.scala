package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StringType, StructField, StructType}

/** Pandas-style DataFrame facade over `org.apache.spark.sql.DataFrame`.
  *
  * The reference (rjzamora/dask-expr-rapids) wraps every user call in an
  * `Expr` node and re-implements an optimizer (`_expr.py`, `_core.py`).
  * Here each method is a *declarative* Spark transformation, so Catalyst
  * performs projection pushdown, predicate pushdown, constant folding and
  * join planning that the reference hand-rolls (reference
  * `_expr.py:930-947`, `_merge.py:348-404`).
  *
  * Index convention (reference divisions model, `_expr.py:351-369`):
  * pandas' row index is represented as an ordinary column named by
  * `indexCol`; sortedness is established with range partitioning + local
  * sort (`setIndex`), mirroring known-divisions semantics without exposing
  * partition boundaries — Spark's `outputOrdering`/`outputPartitioning`
  * carry that metadata through the plan.
  */
final case class GraftFrame(df: DataFrame, indexCol: Option[String] = None) {

  private def lift(d: DataFrame): GraftFrame = copy(df = d)

  def spark: SparkSession = df.sparkSession
  def schema = df.schema
  def columns: Seq[String] = df.columns.toSeq

  // pandas introspection sugar (reference `_collection.py` shape/size/
  // dtypes/ndim/empty): dtypes/ndim are metadata-only; shape/size run a
  // count action (the reference's len() — parquet answers from footers);
  // empty is a limit-1 probe, not a full count.
  def dtypes: Seq[(String, String)] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq
  def ndim: Int = 2
  def shape: (Long, Int) = (df.count(), df.columns.length)
  def size: Long = df.count() * df.columns.length
  def empty: Boolean = df.isEmpty
  /** pandas `df.info()` analog (reference `_collection.py` info): a
    * driver-side summary string — columns with dtypes, row count, and
    * the optimizer's size estimate (statistics, no data read beyond the
    * count). */
  def info(): String = {
    val rows = df.count()
    val bytes = graft.operators.Reductions.sizeInBytes(df)
    val cols = df.schema.fields.zipWithIndex
      .map { case (f, i) => s" $i  ${f.name}  ${f.dataType.simpleString}" }
    (s"GraftFrame: ${df.columns.length} columns, $rows rows" +:
      cols :+ s"estimated size: $bytes bytes").mkString("\n")
  }

  // ---- projections / row selection (reference _expr.py:1378-1441) ----
  def select(cols: String*): GraftFrame = {
    val keep = indexCol.filterNot(cols.contains).toSeq ++ cols
    lift(df.select(keep.map(col): _*))
  }
  def selectCols(cols: Column*): GraftFrame = lift(df.select(cols: _*))
  def filter(cond: Column): GraftFrame = lift(df.filter(cond))
  /** `df.query("x > 1")` — string predicate (reference _expr.py:905-913). */
  def query(predicate: String): GraftFrame = lift(df.filter(predicate))
  /** `df.eval("z = x + y")` (reference _expr.py:1355-1363). */
  def eval(name: String, sqlExpr: String): GraftFrame =
    lift(df.withColumn(name, expr(sqlExpr)))
  def assign(name: String, value: Column): GraftFrame =
    lift(df.withColumn(name, value))
  def drop(cols: String*): GraftFrame = lift(df.drop(cols: _*))
  def rename(mapping: (String, String)*): GraftFrame =
    lift(df.withColumnsRenamed(mapping.toMap))
  def addPrefix(p: String): GraftFrame =
    lift(df.toDF(df.columns.map(p + _).toIndexedSeq: _*))
  def addSuffix(s: String): GraftFrame =
    lift(df.toDF(df.columns.map(_ + s).toIndexedSeq: _*))
  def astype(casts: (String, DataType)*): GraftFrame =
    lift(casts.foldLeft(df) { case (d, (c, t)) => d.withColumn(c, col(c).cast(t)) })
  def selectDtypes(pred: DataType => Boolean): GraftFrame =
    lift(df.select(df.schema.fields.filter(f => pred(f.dataType)).map(f => col(f.name)).toIndexedSeq: _*))

  // ---- null handling (reference _expr.py:829-854, 1020-1032) ----
  def fillna(value: Any, cols: Seq[String] = Nil): GraftFrame = {
    val target = if (cols.isEmpty) df.columns.toSeq else cols
    val filled = value match {
      case v: Long    => df.na.fill(v, target)
      case v: Int     => df.na.fill(v.toLong, target)
      case v: Double  => df.na.fill(v, target)
      case v: String  => df.na.fill(v, target)
      case v: Boolean => df.na.fill(v, target)
      case other => throw new IllegalArgumentException(s"fillna: $other")
    }
    lift(filled)
  }
  def dropna(how: String = "any", subset: Seq[String] = Nil): GraftFrame =
    lift(if (subset.isEmpty) df.na.drop(how) else df.na.drop(how, subset))
  def dropnaThresh(thresh: Int, subset: Seq[String]): GraftFrame =
    lift(df.na.drop(thresh, subset))
  def replace[T](colName: String, mapping: Map[T, T]): GraftFrame =
    lift(df.na.replace(colName, mapping))
  /** pandas mask/where (reference _expr.py:1146-1163). */
  def mask(colName: String, cond: Column, other: Column): GraftFrame =
    lift(df.withColumn(colName, when(cond, other).otherwise(col(colName))))
  def whereKeep(colName: String, cond: Column, other: Column): GraftFrame =
    lift(df.withColumn(colName, when(cond, col(colName)).otherwise(other)))

  // ---- ordering / limits (reference _expr.py:1572-1703, _shuffle.py:864-1020) ----
  /** Global sort = sampled range partitioning + per-partition sort; Spark's
    * RangePartitioner reproduces the reference's RepartitionQuantiles
    * machinery (reference `_quantiles.py:18-88`) internally. */
  def sortValues(by: Seq[(String, Boolean)], naFirst: Boolean = false): GraftFrame = {
    val exprs = by.map { case (c, asc) =>
      (asc, naFirst) match {
        case (true, true)   => col(c).asc_nulls_first
        case (true, false)  => col(c).asc_nulls_last
        case (false, true)  => col(c).desc_nulls_first
        case (false, false) => col(c).desc_nulls_last
      }
    }
    lift(df.orderBy(exprs: _*))
  }
  def head(n: Int): GraftFrame = lift(df.limit(n))
  /** Last n rows under an explicit total order (reference Tail
    * `_expr.py:1572-1703` takes them from the final partition; Spark has
    * no partition order, so the order must be named). Plans as
    * TakeOrderedAndProject on the reversed order — per-partition top-k,
    * no global sort. */
  def tail(n: Int, by: Seq[(String, Boolean)]): GraftFrame = {
    val rev = by.map { case (c, asc) => if (asc) col(c).desc else col(c).asc }
    val fwd = by.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    lift(df.orderBy(rev: _*).limit(n).orderBy(fwd: _*))
  }
  /** sort+limit: Catalyst plans TakeOrderedAndProject — per-partition top-k
    * then a driver merge, the reference's NSmallest/NLargest
    * (reference `_reductions.py:1074-1119`) without a global shuffle. */
  def nlargest(n: Int, by: String*): GraftFrame =
    lift(df.orderBy(by.map(col(_).desc): _*).limit(n))
  def nsmallest(n: Int, by: String*): GraftFrame =
    lift(df.orderBy(by.map(col(_).asc): _*).limit(n))
  def sample(fraction: Double, seed: Long, withReplacement: Boolean = false): GraftFrame =
    lift(df.sample(withReplacement, fraction, seed))
  /** Deterministic engine-agnostic sample: keep rows whose Knuth-hashed
    * key falls under `fraction` of the hash space. Unlike `sample` (RNG
    * differs per engine/partitioning) this is reproducible anywhere —
    * the right tool for carving stable eval/holdout splits from a
    * 100 TB corpus. */
  def sampleByHash(keyCol: String, fraction: Double): GraftFrame = {
    val threshold = (fraction * 4294967296L).toLong
    lift(df.filter(graft.QHelp.keyHash31(col(keyCol)) < threshold))
  }
  /** Stratified deterministic sample — the domain-mixing primitive:
    * each stratum (e.g. source/domain) keeps its own fraction of rows,
    * selected by the SAME engine-agnostic Knuth hash as sampleByHash, so
    * up/down-sampling weights reproduce bit-for-bit anywhere (and the
    * DuckDB oracle mirrors it). Blockwise: a chained-when threshold per
    * stratum fuses into the scan — no shuffle, no RNG, no per-stratum
    * pass. Strata absent from `fractions` keep `default` (0 = drop). */
  def sampleByHashStratified(keyCol: String, stratumCol: String,
                             fractions: Map[String, Double],
                             default: Double = 0.0): GraftFrame = {
    def thr(f: Double) = lit((f * 4294967296L).toLong)
    val threshold = fractions.foldLeft(when(lit(false), thr(0.0))) {
      case (acc, (stratum, f)) => acc.when(col(stratumCol) === stratum, thr(f))
    }.otherwise(thr(default))
    lift(df.filter(graft.QHelp.keyHash31(col(keyCol)) < threshold))
  }

  /** Temperature-weighted domain mixing — [[sampleByHashStratified]]
    * with the rates DERIVED from the corpus itself: keep probabilities
    * p_d = (c_min / c_d)^(1-alpha) make the sampled corpus's expected
    * domain proportions ∝ c_d^alpha (the temperature-flattened
    * multinomial of the Pile/Gopher/LLaMA data-mixing recipes, realized
    * as a one-pass deterministic filter — no RNG, reproducible on any
    * cluster). alpha = 1 keeps the natural mix (everything), alpha = 0
    * equalizes expected domain counts, alpha in between downweights
    * head domains; the smallest domain always keeps all rows (rates
    * are normalized to its count, the lossless-for-the-tail choice).
    *
    * Scale shape: one map-side-combined count over the domain column
    * (domain cardinality-sized result), thresholds broadcast back, and
    * the row decision is the same blockwise Knuth-hash compare as
    * [[sampleByHash]] — no data-sized shuffle anywhere. alpha = 0.5
    * computes through sqrt (correctly rounded IEEE — bit-reproducible
    * across engines, the oracle-covered path); other alphas go through
    * pow (≤1 ulp, reproducible within the JVM). Rows with a NULL
    * domain are dropped (inner-join semantics, as in SQL USING). */
  def sampleByTemperature(keyCol: String, domainCol: String,
                          alpha: Double): GraftFrame =
    sampleByTemperatureImpl(keyCol, domainCol, count(lit(1)), alpha)

  /** [[sampleByTemperature]] with domain sizes measured by an integer
    * WEIGHT column (token counts, bytes) instead of document counts —
    * the form a token-budgeted pretraining mix actually runs: expected
    * sampled token mass per domain ∝ W_d^alpha, where W_d is the
    * domain's total weight. Same exact-integer-sums + sqrt/pow
    * thresholds + blockwise Knuth-hash decision; the per-document keep
    * probability is uniform within a domain (long documents are not
    * individually favored — the DOMAIN's budget scales). Domains whose
    * total weight is ≤ 0 (all-empty docs) are dropped like NULL
    * domains: they carry no sampleable mass, and letting one set c_min
    * = 0 would zero every threshold and silently empty the output. */
  def sampleByTemperatureWeighted(keyCol: String, domainCol: String,
                                  weightCol: String,
                                  alpha: Double): GraftFrame =
    sampleByTemperatureImpl(keyCol, domainCol,
      sum(col(weightCol).cast("long")), alpha)

  /** Temperature-weighted domain UP-sampling — the complement of
    * [[sampleByTemperature]] for the curated-data recipe (the Pile /
    * LLaMA "epochs > 1" weighting): instead of dropping head-domain
    * rows, small domains REPEAT. Repeat factors f_d =
    * (c_max / c_d)^(1-alpha) make expected domain mass ∝ c_d^alpha
    * with the LARGEST domain kept exactly once (lossless everywhere —
    * no row of any domain is dropped, alpha=1 degenerates to the
    * identity). Each row emits floor(f_d) whole copies plus one extra
    * copy kept when the (key, epoch)-salted Knuth hash falls under the
    * fractional part — deterministic, no RNG, reproducible on any
    * engine. Factors are capped at `maxRepeat` (a tiny domain next to
    * a 1000× head would otherwise explode the output; the cap is the
    * standard at-most-N-epochs discipline — raise it deliberately).
    *
    * Scale shape: one tiny domain-count aggregate, factors broadcast
    * back, one explode bounded by maxRepeat+1 — output rows ≤
    * (maxRepeat+1)·input, no data-sized shuffle. Output: every input
    * column plus `epoch` (0-based copy index); (key, epoch) is the
    * natural downstream shuffle key. NULL and zero-size domains drop,
    * as in the down-sampler. */
  def upsampleByTemperature(keyCol: String, domainCol: String,
                            alpha: Double,
                            maxRepeat: Int = 10): GraftFrame =
    upsampleByTemperatureImpl(keyCol, domainCol, count(lit(1)), alpha,
      maxRepeat)

  /** [[upsampleByTemperature]] with domain sizes measured by an integer
    * WEIGHT column (token counts, bytes) — repeat factors derive from
    * total domain MASS, f_d = (W_max/W_d)^(1-alpha), so the expected
    * sampled token mass per domain ∝ W_d^alpha with the heaviest
    * domain kept once. The per-document epoch treatment is uniform
    * within a domain (long documents are not individually favored —
    * the weighted-downsampler contract); non-positive-weight domains
    * drop like NULL domains. */
  def upsampleByTemperatureWeighted(keyCol: String, domainCol: String,
                                    weightCol: String, alpha: Double,
                                    maxRepeat: Int = 10): GraftFrame =
    upsampleByTemperatureImpl(keyCol, domainCol,
      sum(col(weightCol).cast("long")), alpha, maxRepeat)

  /** EXPLICIT-RECIPE domain mixing — the published mixture-proportion
    * TABLE form (the LLaMA/Pile "this many tokens from each source"
    * recipe): every domain carries a TARGET mass `budgets(domain)` in
    * `weightCol` units, and each domain independently down- OR
    * up-samples to hit it in expectation. f_d = B_d / W_d: f ≤ 1 is a
    * deterministic Knuth-hash keep at rate f; f > 1 is the epoch
    * machinery (floor(f) whole copies + a fractional (key, epoch)-
    * salted copy), capped at `maxRepeat` like the temperature
    * up-samplers. Domains ABSENT from the recipe drop — the table is
    * the complete mix statement (budget a domain at its own W_d to
    * pass it through unchanged); an explicit zero budget drops its
    * domain loudly-by-declaration. Output carries `epoch` (all-0 for
    * down-sampled domains); exact-integer factors emit exactly f
    * copies (thr = 0 — the fractional copy never fires).
    *
    * Scale shape: LAZY end to end (safe inside the Pipeline's one-plan
    * composition) — the recipe enters as a |budgets|-row literal frame
    * joined to one map-side-combined mass aggregate, factors broadcast
    * back, and the row decision is the blockwise salted-hash compare
    * with one explode bounded by maxRepeat+1. No data-sized shuffle,
    * no RNG; every arithmetic step (integer sums, one divide via
    * `least`, floor, the 2^32 threshold) is IEEE-correctly-rounded, so
    * the oracle recomputes decisions exactly. */
  def sampleByBudget(keyCol: String, domainCol: String,
                     weightCol: String, budgets: Map[String, Long],
                     maxRepeat: Int = 10): GraftFrame = {
    require(budgets.nonEmpty, "sampleByBudget needs a non-empty recipe")
    require(budgets.values.forall(_ >= 0L),
      "sampleByBudget budgets must be >= 0")
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    val kt = df.schema(keyCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"sampleByBudget: key column '$keyCol' must be numeric " +
        s"(got ${kt.simpleString}); factorize or hash string keys first")
    val spark = df.sparkSession
    import spark.implicits._
    val dom = col(domainCol).cast("string")
    val bdf = budgets.toSeq.sortBy(_._1).toDF("__d__", "__b__")
    val counts = df.filter(dom.isInCollection(budgets.keys.toSeq))
      .groupBy(dom.as("__d__"))
      .agg(sum(col(weightCol).cast("long")).as("__w__"))
      .filter(col("__w__") > 0L)
    val fac = least(col("__b__").cast("double") / col("__w__").cast("double"),
      lit(maxRepeat.toDouble))
    val factors = counts.join(bdf, "__d__")
      .select(col("__d__"),
        floor(fac).cast("long").as("__full__"),
        floor((fac - floor(fac)) * lit(4294967296.0)).cast("long")
          .as("__thr__"))
    val cols = df.columns.map(col).toIndexedSeq
    lift(df.join(broadcast(factors), dom === col("__d__"))
      .withColumn("epoch", explode(sequence(lit(0L), col("__full__"))))
      .filter(col("epoch") < col("__full__") ||
        graft.QHelp.keyHash31(
          pmod(col(keyCol), lit(2147483648L)) + col("epoch") * lit(7919L))
          < col("__thr__"))
      .select(cols :+ col("epoch"): _*))
  }

  private def upsampleByTemperatureImpl(keyCol: String, domainCol: String,
                                        sizeAgg: Column, alpha: Double,
                                        maxRepeat: Int): GraftFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1], got $alpha")
    require(maxRepeat >= 1, s"maxRepeat must be >= 1, got $maxRepeat")
    // the (key, epoch) salt is integer arithmetic — a string key would
    // null the hash or throw under ANSI (the shuffleIndex contract)
    val kt = df.schema(keyCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"upsampleByTemperature: key column '$keyCol' must be numeric " +
        s"(got ${kt.simpleString}); factorize or hash string keys first")
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(sizeAgg.as("__c__"))
      .filter(col("__c__") > 0L)
    val cmax = counts.agg(max(col("__c__")).as("__cmax__"))
    val ratio = col("__cmax__").cast("double") / col("__c__").cast("double")
    val f =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 0.0) ratio
      else pow(ratio, lit(1.0 - alpha))
    val capped = least(f, lit(maxRepeat.toDouble))
    val factors = counts.crossJoin(broadcast(cmax))
      .select(col(domainCol),
        floor(capped).cast("long").as("__full__"),
        floor((capped - floor(capped)) * lit(4294967296.0)).cast("long")
          .as("__thr__"))
    val cols = df.columns.map(col).toIndexedSeq
    lift(df.join(broadcast(factors), Seq(domainCol))
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__full__"))))
      .filter(col("epoch") < col("__full__") ||
        graft.QHelp.keyHash31(
          pmod(col(keyCol), lit(2147483648L)) + col("epoch") * lit(7919L))
          < col("__thr__"))
      .select(cols :+ col("epoch"): _*))
  }

  private def sampleByTemperatureImpl(keyCol: String, domainCol: String,
                                      sizeAgg: Column,
                                      alpha: Double): GraftFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1], got $alpha")
    // NULL domains are dropped by the inner join below — they must not
    // set c_min either (a tiny NULL group would silently undersample
    // every real domain and break both documented invariants). The
    // same reasoning excludes non-positive-size domains (possible only
    // on the weighted path, e.g. a domain of all-empty docs): c_min = 0
    // would floor every threshold to 0 and empty the whole output.
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol)).agg(sizeAgg.as("__c__"))
      .filter(col("__c__") > 0L)
    val cmin = counts.agg(min(col("__c__")).as("__cmin__"))
    val ratio = col("__cmin__").cast("double") / col("__c__").cast("double")
    val p =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else if (alpha == 0.0) ratio
      else pow(ratio, lit(1.0 - alpha))
    val thresholds = counts.crossJoin(broadcast(cmin))
      .select(col(domainCol),
        floor(p * lit(4294967296.0)).cast("long").as("__thr__"))
    lift(df.join(broadcast(thresholds), Seq(domainCol))
      .filter(graft.QHelp.keyHash31(col(keyCol)) < col("__thr__"))
      .select(df.columns.map(col).toIndexedSeq: _*))
  }

  /** Deterministic corpus shuffle for training-order mixing: a global
    * position under the engine-agnostic Knuth hash order — the standard
    * "shuffle before sharding" pass, reproducible on any engine/cluster
    * (no RNG). Scale-safe: rides [[graft.operators.WindowOps.globalCumSum]]'s
    * two-pass range-partitioned plan (in-partition window + broadcast
    * npartitions-row offsets), never a single-partition global window.
    * Keys must be distinct mod 2^31 for a total order (hash is injective
    * there); `seed` rotates the permutation. */
  def shuffleIndex(keyCol: String, seed: Long = 0L,
                   outCol: String = "shuffle_pos"): GraftFrame = {
    // integer arithmetic only: a string key under `+ seed` yields null
    // hashes (degenerate permutation) or throws under ANSI — refuse it
    // loudly; factorize/hash string keys to a numeric id first (r6
    // ADVICE). Both addends are masked mod 2^31 BEFORE the add so the
    // sum never overflows Long at any key/seed magnitude; the residue
    // (and so the permutation) is unchanged: pmod(k+s, 2^31) ==
    // pmod(pmod(k,2^31) + pmod(s,2^31), 2^31).
    val kt = df.schema(keyCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"shuffleIndex: key column '$keyCol' must be numeric (got ${kt.simpleString}); " +
        "factorize or hash string keys to an id first")
    val withH = df
      .withColumn("__sh__", graft.QHelp.keyHash31(
        pmod(col(keyCol), lit(2147483648L)) + lit(seed % 2147483648L)))
      .withColumn("__one__", lit(1L))
    lift(graft.operators.WindowOps
      // hashed form (r16): keyHash31-uniform order key, deterministic
      // buckets — no boundary-sampling pass over the corpus subtree
      .globalCumSumHashed(withH, "__sh__", "__one__", outCol, 1L << 32)
      .withColumn(outCol, col(outCol) - 1)
      .drop("__sh__", "__one__"))
  }

  /** SYSTEMATIC importance resampling — the per-ROW weighted selection
    * axis of the mixing matrix (the fourth: temperature and budget
    * mixing act on DOMAINS; this acts on individual documents — the
    * DSIR recipe shape, Xie et al. 2023: select a target-sized subset
    * with inclusion probability ∝ an importance weight such as a
    * classifier log-likelihood ratio mapped to a non-negative integer,
    * a token count, or any quality score). The usual Gumbel-top-k draw
    * is engine-irreproducible (transcendental per-row noise);
    * systematic resampling (the particle-filter standard, offset 0) is
    * the deterministic integer-exact equivalent: rows order by the
    * engine-agnostic Knuth shuffle hash (the [[shuffleIndex]]
    * discipline — keys distinct mod 2^31, `seed` rotates the
    * traversal), weights cumulate through the two-pass range-
    * partitioned cumsum, and row i earns multiplicity
    * floor(cum_i·n/W) − floor((cum_i−w_i)·n/W) — expected copies
    * n·w_i/W, every row with w_i ≥ W/n kept WITH CERTAINTY (the
    * systematic low-variance guarantee), output size exactly n.
    * Output carries `epoch` (0-based copy index) like the up-samplers;
    * rows with multiplicity 0 drop. Zero/negative weights never
    * select; cum·n computes in DECIMAL(38,0), where the product of two
    * signed-64 values always fits — no weight mass / n combination can
    * overflow.
    *
    * Scale shape: one weight-sum aggregate, one range exchange for the
    * cumsum (reused across its two branches), a blockwise multiplicity
    * expression, one explode bounded by each row's own multiplicity.
    * No RNG, no data-sized driver state; every step is integer
    * arithmetic, so an oracle replays each decision exactly. */
  def sampleBySystematic(keyCol: String, weightCol: String, n: Long,
                         seed: Long = 0L): GraftFrame = {
    require(n >= 1, s"sampleBySystematic needs n >= 1, got $n")
    val kt = df.schema(keyCol).dataType
    require(kt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"sampleBySystematic: key column '$keyCol' must be numeric (got " +
        s"${kt.simpleString}); factorize or hash string keys first")
    val withH = df
      .withColumn("__w__", greatest(col(weightCol).cast("long"), lit(0L)))
      .withColumn("__sh__", graft.QHelp.keyHash31(
        pmod(col(keyCol), lit(2147483648L)) + lit(seed % 2147483648L)))
    val cum = graft.operators.WindowOps
      // hashed form (r16): the shuffleIndex rationale
      .globalCumSumHashed(withH, "__sh__", "__w__", "__cum__", 1L << 32)
    // W (total mass) as a broadcast 1-row frame. The aggregate
    // descends from cum itself, so this is a SELF-join: a crossJoin +
    // name resolution trips the analyzer's ambiguous-self-join
    // detection, but the Seq-form equi-join on a dummy key (the
    // globalCumSum offsets-join discipline) dedups cleanly and stays
    // lazy — no checkpoint, the op composes inside one plan.
    val tot = cum.groupBy().agg(sum(col("__w__")).as("__sysW__"))
      .withColumn("__k__", lit(1))
    // cum·n in DECIMAL(38,0): two signed-64 factors always fit 38
    // digits (≤ 8.5e37), so no weight/n combination can overflow — and
    // integral `div`, never `/` (long/long in the Column API is DOUBLE
    // division, which silently loses exactness past 2^53; the oracle
    // and a 100 TB weight mass both need the true floor quotient)
    val m = expr(
      s"((CAST(__cum__ AS DECIMAL(38,0)) * ${n}L) div __sysW__) - " +
        s"(((CAST(__cum__ AS DECIMAL(38,0)) - __w__) * ${n}L) div __sysW__)")
    val cols = df.columns.map(col).toIndexedSeq
    lift(cum.withColumn("__k__", lit(1))
      .join(broadcast(tot), Seq("__k__"))
      .filter(col("__sysW__") > 0L)
      .withColumn("__m__", m)
      .filter(col("__m__") >= 1L)
      .withColumn("epoch", explode(sequence(lit(0L), col("__m__") - 1)))
      .select(cols :+ col("epoch"): _*))
  }

  /** QUALITY TIERS by exact quantile cutpoints — the curriculum /
    * percentile-filter primitive: rows bucket into `nTiers` tiers by a
    * score column, tier k meaning the score exceeds k of the nTiers−1
    * interior cutpoints (ties at a cutpoint land in the LOWER tier —
    * deterministic, no rank arithmetic). Cutpoints are EXACT
    * interpolated percentiles (the [[graft.operators.Checks]]
    * PercentileBetween discipline: both engines interpolate
    * a + f·(b−a) at index p·(n−1), so the oracle hash-checks tiers);
    * the per-row assignment is then a literal when-chain that fuses
    * into the scan — one aggregate pass + one blockwise pass, no
    * data-sized shuffle, no global sort, no window.
    *
    * Degenerate scores — NULL and NaN — land in tier 0 (the WORST
    * tier) and are EXCLUDED from the cutpoint aggregate: a row without
    * a well-defined score is the worst candidate, never the best (the
    * [[selectByBudget]] stance — without the guard Spark's NaN-greatest
    * comparison ordering would promote NaN rows to the TOP tier,
    * inverting the curriculum intent).
    *
    * Scale note: exact `percentile` buffers the score column per
    * partition (the accepted cost everywhere this repo needs
    * oracle-exact percentiles); at sizes where that bites, swap the
    * cutpoint aggregate for `approx_percentile(…, accuracy)` — the
    * assignment chain is unchanged, the oracle becomes rows-only. */
  def withQuantileTier(scoreCol: String, nTiers: Int,
                       outCol: String = "tier"): GraftFrame = {
    require(nTiers >= 2 && nTiers <= 1000,
      s"withQuantileTier needs 2 <= nTiers <= 1000, got $nTiers")
    val st = df.schema(scoreCol).dataType
    require(st.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"withQuantileTier: score column '$scoreCol' must be numeric " +
        s"(got ${st.simpleString})")
    val ps = (1 until nTiers).map(i => i.toDouble / nTiers)
    // Column-based aggregate (no SQL-string interpolation — a column
    // name needing backticks must resolve like every other API here);
    // NaN maps to NULL so percentile ignores it along with real NULLs
    val sc = col(scoreCol).cast("double")
    val cleanScore = when(isnan(sc), lit(null)).otherwise(sc)
    val row = df.agg(percentile(cleanScore,
      lit(ps.toArray)).as("__cuts__")).head()
    if (row.isNullAt(0)) return lift(df.withColumn(outCol, lit(0)))
    val cuts = row.getSeq[Double](0)
    val chain = cuts.foldLeft(lit(0)) { (acc, c) =>
      acc + when(sc > c, 1).otherwise(0) }
    val tier = when(sc.isNull || isnan(sc), lit(0)).otherwise(chain)
    lift(df.withColumn(outCol, tier.cast("int")))
  }

  /** Highest-scoring rows under a TOKEN BUDGET — the data-selection
    * primitive (the DataComp/DSIR-style "take the best B tokens"
    * move): rows rank by (score desc, key asc — the tiebreak makes the
    * selection total-order deterministic), token counts cumulate along
    * that order, and the kept set is the PREFIX whose running total
    * stays ≤ `budget` (greedy prefix, not a knapsack: the first row
    * past the budget line closes the selection for everything ranked
    * below it — the published recipes' semantics, and the only one
    * that is order-stable under re-partitioning). Output rows carry
    * `<outCol>` (the inclusive running token total) for audit.
    *
    * Scale shape: the [[graft.operators.WindowOps.globalCumSum]]
    * two-pass range cumsum over the (−score, key) order — no global
    * single-task sort, no window over the corpus; negative/NULL token
    * counts clamp to 0 (they cost nothing and cannot poison the
    * running total). */
  def selectByBudget(scoreCol: String, tokenCol: String, budget: Long,
                     keyCol: String,
                     outCol: String = "cum_tokens"): GraftFrame = {
    require(budget >= 0L, s"selectByBudget needs budget >= 0, got $budget")
    Seq(scoreCol, tokenCol).foreach { c =>
      require(df.schema(c).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"selectByBudget: column '$c' must be numeric " +
          s"(got ${df.schema(c).dataType.simpleString})")
    }
    // the tiebreak key casts to long for the total order — a fractional
    // type would silently collide after the cast (1.2 and 1.7 both
    // become 1) and the documented determinism contract would be a lie;
    // integral-only is the packedPieceMembers-style explicit contract
    df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"selectByBudget: key column '$keyCol' must be an integral type " +
          s"(byte/short/int/long — the deterministic tiebreak casts it " +
          s"to long), got ${other.simpleString}")
    }
    val cols = df.columns.map(col).toIndexedSeq
    val withOrd = df
      .withColumn("__tok__", greatest(coalesce(col(tokenCol).cast("long"),
        lit(0L)), lit(0L)))
      // NULL scores rank LAST deterministically (coalesce to -inf →
      // +inf after negation) instead of riding engine-specific
      // null-struct ordering — a scoreless row is the worst candidate,
      // not an undefined one
      .withColumn("__ord__", struct(
        (coalesce(col(scoreCol).cast("double"),
          lit(Double.NegativeInfinity)) * -1.0).as("s"),
        col(keyCol).cast("long").as("k")))
    val cum = graft.operators.WindowOps
      .globalCumSum(withOrd, "__ord__", "__tok__", "__cum__")
    lift(cum.filter(col("__cum__") <= budget)
      .select(cols :+ col("__cum__").as(outCol): _*))
  }

  /** Deterministic train/val/test split by key hash — the dataset-split
    * primitive: one blockwise expression (fuses into the scan, no
    * shuffle, no RNG), assignment stable under repartitioning,
    * re-ingestion, and engine choice. Fractions are cumulative
    * thresholds on the same Knuth hash as [[sampleByHash]], so a row's
    * split never changes when other rows are added or removed. */
  def splitByHash(keyCol: String, trainFrac: Double, valFrac: Double,
                  outCol: String = "split"): GraftFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "splitByHash needs non-negative fractions summing to at most 1")
    val h = graft.QHelp.keyHash31(col(keyCol))
    val t1 = (trainFrac * 4294967296L).toLong
    val t2 = ((trainFrac + valFrac) * 4294967296L).toLong
    lift(df.withColumn(outCol,
      when(h < t1, "train").when(h < t2, "val").otherwise("test")))
  }

  /** set_index: range-shuffle + local sort, the reference's SetIndex
    * (reference `_shuffle.py:708-861`). Divisions are implicit — Spark
    * tracks `outputPartitioning`/`outputOrdering`, so later merges/sorts on
    * the index skip the exchange just like the reference's known-divisions
    * fast path. */
  def setIndex(c: String): GraftFrame =
    GraftFrame(df.repartitionByRange(col(c)).sortWithinPartitions(c), Some(c))
  def resetIndex: GraftFrame = copy(indexCol = None)
  /** Label-slice `.loc[lo:hi]` on the index (reference `_indexing.py:
    * 39-84`): inclusive on both ends, either bound open (None). Purely
    * declarative — the range predicate reaches the parquet scan as
    * PushedFilters, and on a range-partitioned (setIndex'd) frame the
    * non-overlapping partitions are pruned: the reference's
    * known-divisions partition culling, for free from Catalyst. */
  def locRange(lo: Option[Any] = None, hi: Option[Any] = None): GraftFrame = {
    val c = indexCol.getOrElse(throw new IllegalArgumentException(
      "locRange: label slices are defined on the index; call setIndex first"))
    val bounds = lo.map(v => col(c) >= lit(v)).toSeq ++
      hi.map(v => col(c) <= lit(v))
    bounds.reduceOption(_ && _).fold(this)(p => lift(df.filter(p)))
  }
  /** rename_axis (reference `_collection.py` rename_axis): rename the
    * index column itself — data rows unchanged, sortedness preserved
    * (a rename never perturbs partitioning or ordering). */
  def renameAxis(name: String): GraftFrame = indexCol match {
    case Some(c) if c != name =>
      GraftFrame(df.withColumnRenamed(c, name), Some(name))
    case _ => this
  }
  /** Index-as-Series extraction (reference `_expr.py:1444-1468`). */
  def indexSeries: GraftFrame = {
    val c = indexCol.getOrElse(
      throw new IllegalStateException("indexSeries: no index set; call setIndex first"))
    lift(df.select(col(c)))
  }

  /** melt/unpivot (capability superset — not in the reference, standard
    * pandas reshape): id columns stay, `valueCols` fold into
    * (variable, value) rows. Blockwise (Spark Expand node) — no shuffle. */
  def melt(idCols: Seq[String], valueCols: Seq[String],
           varName: String = "variable", valueName: String = "value"): GraftFrame =
    lift(df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray,
      varName, valueName))

  /** df.round(decimals) (reference Elemwise `round`): per-column round.
    * Decimal-typed inputs round HALF_UP identically on every engine;
    * double inputs inherit the engine's tie policy — cast to decimal
    * first when cross-engine determinism matters. */
  def roundCols(decimals: Int, cols: Seq[String]): GraftFrame =
    lift(cols.foldLeft(df)((d, c) =>
      d.withColumn(c, round(col(c), decimals))))

  /** get_partition(i) (reference `_collection.py` get_partition /
    * Partitions `_expr.py:1879-1977`): rows of physical partition i.
    * Partition membership follows the CURRENT plan's partitioning — pin
    * it first (setIndex/repartitionByDivisions) for stable semantics.
    * An index past the plan's partition count yields an empty frame
    * (the count isn't known until execution; the reference raises). */
  def getPartition(i: Int): GraftFrame = {
    require(i >= 0, s"getPartition: negative partition index $i")
    lift(df.withColumn("__pid__", spark_partition_id())
      .filter(col("__pid__") === i).drop("__pid__"))
  }

  // ---- dedup / set ops (reference _reductions.py:478-553, _concat.py) ----
  def distinct: GraftFrame = lift(df.distinct())
  /** Deterministic drop_duplicates: keeps the row with minimal `keyOrder`
    * per subset group (pandas keep="first" needs an order; we require one
    * explicitly rather than inheriting partition order). */
  def dropDuplicates(subset: Seq[String], keyOrder: Column): GraftFrame = {
    val w = Window.partitionBy(subset.map(col): _*).orderBy(keyOrder)
    lift(df.withColumn("__rn__", row_number().over(w)).filter(col("__rn__") === 1).drop("__rn__"))
  }
  def concat(other: GraftFrame): GraftFrame =
    lift(df.unionByName(other.df, allowMissingColumns = true))
  def intersect(other: GraftFrame): GraftFrame = lift(df.intersect(other.df))
  def except(other: GraftFrame): GraftFrame = lift(df.except(other.df))

  // ---- repartition family (reference _repartition.py:21-452) ----
  def repartition(n: Int): GraftFrame = lift(df.repartition(n))
  def repartitionByKeys(n: Int, keys: String*): GraftFrame =
    lift(df.repartition(n, keys.map(col): _*))
  def coalescePartitions(n: Int): GraftFrame = lift(df.coalesce(n))
  def repartitionByRange(n: Int, keys: String*): GraftFrame =
    lift(df.repartitionByRange(n, keys.map(col): _*))
  /** Repartition(freq=...) (reference `_repartition.py` Freq): calendar
    * buckets become range partitions on the truncated timestamp. */
  def repartitionByFreq(tsCol: String, unit: String): GraftFrame =
    lift(df.repartitionByRange(date_trunc(unit, col(tsCol))))
  /** Repartition(partition_size=...) (reference Size variant): partition
    * count from optimizer size stats / target bytes — the static analog
    * of AQE's advisoryPartitionSizeInBytes (which handles it adaptively
    * post-shuffle). */
  def repartitionBySize(targetBytes: Long): GraftFrame = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val n = math.max(1, (bytes / BigInt(targetBytes)).toInt +
      (if (bytes % BigInt(targetBytes) > 0) 1 else 0))
    lift(df.repartition(n))
  }
  /** Repartition(divisions=...) (reference `_repartition.py` Divisions
    * variant): EXPLICIT range boundaries instead of sampled ones. Bucket i
    * holds rows with divisions(i-1) <= c < divisions(i) (bucket 0 below
    * the first boundary, bucket n above the last); rows of one bucket
    * always land in one partition, sorted on `c` within it. The bucket
    * expression is a chain of codegen'd comparisons — no sampling pass,
    * the property that makes explicit divisions cheaper than
    * repartitionByRange when the caller already knows the split points. */
  def repartitionByDivisions(c: String, divisions: Seq[Any]): GraftFrame = {
    require(divisions.nonEmpty, "repartitionByDivisions: empty divisions")
    val bucket = divisions.foldLeft(lit(0))((acc, d) =>
      acc + when(col(c) >= lit(d), 1).otherwise(0))
    // the bucket id IS the partition id, placed by an identity
    // partitioner: sampled range partitioning (repartitionByRange) can
    // merge two division buckets into one partition under skew and leave
    // others empty, violating the bucket-i→partition-i layout explicit
    // divisions exist to provide. The RDD crossing is a deliberate
    // trade-off: the placement contract is unreachable from the SQL
    // planner, the data passes through exactly once, but the boundary
    // ends whole-stage codegen — downstream operators start a fresh
    // WholeStageCodegen stage over a row-based scan
    val n = divisions.size + 1
    val withBucket = df.withColumn("__div__", bucket.cast("int"))
    val divIdx = withBucket.schema.fieldIndex("__div__")
    val placed = withBucket.rdd.map(r => (r.getInt(divIdx), r))
      .partitionBy(new graft.operators.Overlap.IdPartitioner(n)).values
    lift(df.sparkSession.createDataFrame(placed, withBucket.schema)
      .sortWithinPartitions(c)
      .drop("__div__"))
  }

  /** map_overlap (reference `_expr.py:595-794`): per-partition function
    * seeing `before`/`after` neighbor rows under a global range order. */
  def mapOverlap(orderCol: String, before: Int, after: Int,
                 outSchema: org.apache.spark.sql.types.StructType)(
      f: Iterator[(Boolean, Row)] => Iterator[Row]): GraftFrame =
    lift(graft.operators.Overlap.mapOverlap(df, orderCol, before, after, outSchema)(f))

  // ---- elementwise conveniences (reference _expr.py:1042-1169) ----
  /** MethodOperator binops with fill_value (reference `_expr.py:1759-1770`):
    * nulls on either side become `fill` before the op. */
  def binopWithFill(out: String, l: Column, r: Column, fill: Double,
                    op: (Column, Column) => Column): GraftFrame =
    lift(df.withColumn(out,
      op(coalesce(l, lit(fill)), coalesce(r, lit(fill)))))
  /** to_numeric(errors='coerce') (reference `_expr.py:1071-1093`):
    * unparseable strings become null, not an ANSI error. */
  def toNumeric(c: String): GraftFrame =
    lift(df.withColumn(c, expr(s"try_cast(`$c` AS DOUBLE)")))
  /** to_datetime with an explicit pattern (reference ToDatetime). */
  def toDatetime(c: String, fmt: String): GraftFrame =
    lift(df.withColumn(c, to_timestamp(col(c), fmt)))
  /** to_timedelta (reference ToTimedelta, `_expr.py:1059-1093`): numeric
    * column → DayTimeIntervalType via make_dt_interval. Interval columns
    * add to timestamps with exact integer arithmetic, the pandas
    * `ts + to_timedelta(n, unit)` pattern. */
  def toTimedelta(c: String, unit: String = "s"): GraftFrame = {
    val v = col(c)
    val iv = unit match {
      case "d" | "day" | "days"       => make_dt_interval(v)
      case "h" | "hour" | "hours"     => make_dt_interval(lit(0), v)
      case "m" | "min" | "minutes"    => make_dt_interval(lit(0), lit(0), v)
      case "s" | "sec" | "seconds"    => make_dt_interval(lit(0), lit(0), lit(0), v)
      case other => throw new IllegalArgumentException(
        s"toTimedelta: unsupported unit '$other' (d/h/m/s)")
    }
    lift(df.withColumn(c, iv))
  }
  /** to_timestamp on a period string (reference ToTimestamp, how="start"):
    * 'yyyy-MM' → first instant of the period. */
  def toTimestampPeriod(c: String): GraftFrame =
    lift(df.withColumn(c, to_timestamp(
      org.apache.spark.sql.functions.concat(col(c), lit("-01")), "yyyy-MM-dd")))
  def clip(c: String, lo: Double, hi: Double): GraftFrame =
    lift(df.withColumn(c, greatest(least(col(c), lit(hi)), lit(lo))))
  def isinFilter(c: String, values: Seq[Any]): GraftFrame =
    lift(df.filter(col(c).isin(values: _*)))
  /** Series.map over a literal dict (reference `_expr.py:1240-1270`):
    * chained `when`s — codegen'd, no UDF. Unmapped values → null (pandas
    * semantics) or `default`. */
  def seriesMap(c: String, out: String, mapping: Map[Any, Any],
                default: Option[Any] = None): GraftFrame = {
    val base = mapping.foldLeft(None: Option[Column]) {
      case (acc, (k, v)) =>
        Some(acc.fold(when(col(c) === lit(k), lit(v)))(_.when(col(c) === lit(k), lit(v))))
    }.getOrElse(lit(null))
    lift(df.withColumn(out, default.fold(base)(d => base.otherwise(lit(d)))))
  }
  /** str.get_dummies (reference `_str_accessor.py` GetDummies): one 0/1
    * indicator column per value of the sep-delimited membership string.
    * `values` is explicit (scale rule: the dummy vocabulary is a schema
    * decision, not a full-corpus distinct scan — compute it once on a
    * sample if unknown). */
  def strGetDummies(c: String, sep: String, values: Seq[String]): GraftFrame =
    lift(values.foldLeft(df)((d, v) =>
      d.withColumn(s"${c}_$v",
        array_contains(split(col(c), java.util.regex.Pattern.quote(sep)), v)
          .cast("int"))))
  /** explode with deterministic position (reference ExplodeSeries
    * `_expr.py:1296-1306`): one output row per array element. */
  def explodeCol(c: String, outPos: String, outVal: String): GraftFrame =
    lift(df.select(df.columns.map(col).toIndexedSeq :+
      posexplode(col(c)).as(Seq(outPos, outVal)): _*).drop(c))
  /** combine_first (reference `_expr.py:857-884`): this frame's values,
    * holes filled from `other`, aligned on key columns. */
  def combineFirst(other: GraftFrame, on: Seq[String]): GraftFrame = {
    val shared = (df.columns.toSet & other.df.columns.toSet) -- on.toSet
    val r = shared.foldLeft(other.df)((d, c) => d.withColumnRenamed(c, c + "__o__"))
    val joined = df.join(r, on, "full_outer")
    val merged = shared.foldLeft(joined)((d, c) =>
      d.withColumn(c, coalesce(col(c), col(c + "__o__"))).drop(c + "__o__"))
    lift(merged)
  }

  /** align (reference `_collection.py:807`, `_expr.py:317-340`): co-align
    * two frames on key columns. Returns BOTH frames reindexed to the
    * joined key set (outer = union, inner = intersection, left/right),
    * holes filled with `fillValue` (null when None). Same one-exchange
    * equi-join machinery as concatAxis1 — co-partitioned inputs skip the
    * shuffle, and both returned frames share the joined subplan, so
    * Catalyst plans the exchange once when both are consumed together. */
  /** Version diff on keys — the corpus-audit operator ("what changed
    * between corpus v1 and v2"): one full-outer equi-join on `keys`,
    * rows classified `added` (only in `other`), `removed` (only in
    * this), or `changed` (both sides, any non-key column differs).
    * Unchanged rows are dropped, so the result is |delta|-sized, not
    * corpus-sized. Content comparison is an md5 over all non-key
    * columns cast to string with an explicit NULL sentinel and a unit
    * separator (concat_ws silently SKIPS nulls, which would conflate
    * (null,"x") with ("x",null)) — deterministic on any engine, so the
    * operator is oracle-checkable. Key matching is null-SAFE (`<=>`):
    * a row whose key is null in both versions matches rather than
    * appearing as a spurious add+remove pair. Known limit: a cell whose
    * literal string value is the sentinel "\u001e" is indistinguishable
    * from null in the signature — irrelevant for prose corpora, use a
    * struct hash if your data carries control characters. Both frames
    * must share the same non-key column set. */
  def diffWith(other: GraftFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diffWith needs at least one key column")
    val nonKey = df.columns.filterNot(keys.contains).toSeq
    require(other.df.columns.filterNot(keys.contains).toSeq.sorted ==
      nonKey.sorted, "diffWith: non-key column sets differ")
    def sig(d: DataFrame): Column =
      md5(concat_ws("\u001f",
        nonKey.sorted.map(c => coalesce(d(c).cast("string"), lit("\u001e"))): _*))
    val l = df.select(keys.map(k => col(k).as(k + "__dl__")) :+
      sig(df).as("__lh__") :+ lit(true).as("__lp__"): _*)
    val r = other.df.select(keys.map(k => col(k).as(k + "__dr__")) :+
      sig(other.df).as("__rh__") :+ lit(true).as("__rp__"): _*)
    val cond = keys.map(k => l(k + "__dl__") <=> r(k + "__dr__"))
      .reduce(_ && _)
    l.join(r, cond, "full_outer")
      .withColumn("change",
        when(col("__lp__").isNull, lit("added"))
          .when(col("__rp__").isNull, lit("removed"))
          .when(col("__lh__") =!= col("__rh__"), lit("changed"))
          .otherwise(lit(null)))
      .filter(col("change").isNotNull)
      .select(keys.map(k =>
        coalesce(col(k + "__dl__"), col(k + "__dr__")).as(k)) :+
        col("change"): _*)
  }

  def align(other: GraftFrame, on: Seq[String], joinHow: String = "outer",
            fillValue: Option[Column] = None): (GraftFrame, GraftFrame) = {
    val how = joinHow match {
      case "outer" => "full_outer"
      case "inner" => "inner"
      case "left"  => "left_outer"
      case "right" => "right_outer"
      case o => throw new IllegalArgumentException(s"align: unsupported join '$o'")
    }
    val leftCols = df.columns.filterNot(on.contains)
    val rightCols = other.df.columns.filterNot(on.contains)
    // presence markers: pandas align(fill_value=...) fills only the holes
    // REINDEXING introduces (rows absent from that side), never a NaN the
    // side already contained — a bare coalesce can't tell them apart
    val l = leftCols.foldLeft(df)((d, c) => d.withColumnRenamed(c, c + "__l__"))
      .withColumn("__lpresent__", lit(true))
    val r = rightCols.foldLeft(other.df)((d, c) => d.withColumnRenamed(c, c + "__r__"))
      .withColumn("__rpresent__", lit(true))
    val joined = l.join(r, on, how)
    // the fill casts to each COLUMN's dtype (a numeric fill on a string
    // column must not coerce the column — ANSI would reject the cast)
    def side(src: DataFrame, cols: Array[String], suf: String, present: String): GraftFrame = lift(
      cols.foldLeft(joined)((d, c) => d.withColumn(c,
          fillValue.map(fv => when(col(present).isNull, fv.cast(src.schema(c).dataType))
              .otherwise(col(c + suf)))
            .getOrElse(col(c + suf))))
        .select((on ++ cols).map(col).toIndexedSeq: _*))
    (side(df, leftCols, "__l__", "__lpresent__"),
     side(other.df, rightCols, "__r__", "__rpresent__"))
  }

  // ---- global idxmin/idxmax (reference _reductions.py:817-839) ----
  def idxmax(valueCol: String, idCol: String): GraftFrame =
    lift(df.agg(max_by(col(idCol), struct(col(valueCol), -col(idCol))).as(s"idxmax_$valueCol")))
  def idxmin(valueCol: String, idCol: String): GraftFrame =
    lift(df.agg(min_by(col(idCol), struct(col(valueCol), col(idCol))).as(s"idxmin_$valueCol")))

  /** concat axis=1 (reference ConcatIndexed `_concat.py:230-252`): align
    * on key columns (the `__index__` convention) — an outer equi-join, so
    * co-partitioned inputs skip the exchange. */
  def concatAxis1(other: GraftFrame, on: Seq[String]): GraftFrame =
    lift(df.join(other.df, on, "full_outer"))

  // ---- groupby / rolling entry points ----
  def groupby(keys: String*): GraftGroupBy = GraftGroupBy(df, keys)
  /** pandas groupby(dropna=...): dropna=true filters null-keyed rows
    * before grouping (the pandas default); the plain `groupby` keeps
    * null groups (SQL semantics, what the oracles compare against). */
  def groupbyDropna(keys: String*): GraftGroupBy =
    GraftGroupBy(df.na.drop("any", keys), keys)
  /** Global-order rolling — single-task at scale; explicit opt-in only
    * for small frames. Prefer rollingBy. */
  def rollingGlobalUnsafe(orderCol: String, window: Int, minPeriods: Int = 1): Rolling =
    Rolling(df, Nil, orderCol, window, minPeriods, allowGlobal = true)
  def rollingBy(partitionCols: Seq[String], orderCol: String, window: Int,
                minPeriods: Int = 1): Rolling =
    Rolling(df, partitionCols, orderCol, window, minPeriods)

  // ---- merge (reference _merge.py:32-404) ----
  def merge(right: GraftFrame, on: Seq[String], how: String = "inner",
            suffixes: (String, String) = ("_x", "_y")): GraftFrame =
    lift(graft.operators.Joins.merge(df, right.df, on, how, suffixes))

  // ---- UDF escape hatches (reference _expr.py:517-592) ----
  /** map_partitions analog: arbitrary per-partition logic with an explicit
    * output schema (the reference's `meta`). */
  def mapPartitionsRows(outSchema: org.apache.spark.sql.types.StructType)(
      f: Iterator[Row] => Iterator[Row]): GraftFrame =
    lift(df.mapPartitions(f)(org.apache.spark.sql.Encoders.row(outSchema)))

  /** Row-wise apply (reference `_expr.py:1212-1237`): arbitrary
    * Row => Row with an explicit output schema (the reference's meta). */
  def applyRows(outSchema: org.apache.spark.sql.types.StructType)(
      f: Row => Row): GraftFrame =
    lift(df.map(f)(org.apache.spark.sql.Encoders.row(outSchema)))

  // ---- sinks (reference ToParquet io/parquet.py:90-395, ToCsv) ----
  /** Overwrite-safety (reference ToParquet, `io/parquet.py:90-175`):
    * refuse to overwrite a path this frame's plan is READING — Spark
    * deletes the target before the job runs, so the job would consume
    * its own half-deleted input and silently corrupt the result. */
  private def guardOverwrite(path: String, mode: String): Unit = {
    if (mode == "overwrite") {
      val target = new org.apache.hadoop.fs.Path(path).toUri.getPath
      val reads = df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          r.relation match {
            case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              h.location.rootPaths.map(_.toUri.getPath)
            case _ => Nil
          }
      }.flatten
      require(!reads.exists(p => p == target ||
          p.startsWith(target + "/") || target.startsWith(p + "/")),
        s"refusing to overwrite '$path': this frame reads from it " +
          "(write elsewhere, or materialize first)")
    }
  }

  def toParquet(path: String, partitionOn: Seq[String] = Nil,
                mode: String = "overwrite"): Unit = {
    guardOverwrite(path, mode)
    val w = df.write.mode(mode)
    (if (partitionOn.nonEmpty) w.partitionBy(partitionOn: _*) else w).parquet(path)
  }
  def toCsv(path: String, header: Boolean = true, mode: String = "overwrite"): Unit = {
    guardOverwrite(path, mode)
    df.write.mode(mode).option("header", header).csv(path)
  }

  /** Persist as a bucketed parquet table: rows are pre-shuffled on `keys`
    * into `buckets` files (optionally sorted within each), so every FUTURE
    * equi-join or aggregation on `keys` between bucketed tables skips the
    * exchange entirely — co-location that survives across jobs, which
    * runtime AQE cannot provide. This is the durable analog of the
    * reference's fully-indexed merge (`_merge.py:254-259`: known divisions
    * on both sides ⇒ zip-merge without shuffle), with hash buckets in
    * place of sorted divisions. Registered in the session catalog under
    * `name` with data at `path`. */
  def toBucketedTable(name: String, path: String, buckets: Int,
                      keys: Seq[String], sortCols: Seq[String] = Nil,
                      mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "toBucketedTable needs at least one bucket key")
    require(buckets > 0, "toBucketedTable needs a positive bucket count")
    // an APPEND to an existing table must land at the table's CURRENT
    // location, not the caller's original path: an online compaction
    // ([[GraftFrame.compactBucketedTable]]) moves the table to a new
    // generation directory, and an append addressed at the stale path
    // would either conflict or silently write beside the live data
    val target =
      if (mode == "append" && df.sparkSession.catalog.tableExists(name))
        df.sparkSession.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(name))
          .location.toString
      else path
    guardOverwrite(target, mode)
    val w0 = df.write.mode(mode).option("path", target)
      .bucketBy(buckets, keys.head, keys.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*) else w0
    w.format("parquet").saveAsTable(name)
    if (mode == "overwrite") {
      // a full rebuild (inherently exclusive — it overwrites the flat
      // layout in place) resets the compaction generation chain: stale
      // `<dir>__genN` siblings from a previous chain would leak disk
      // forever ([[GraftFrame.compactBucketedTable]] layout)
      val p = new org.apache.hadoop.fs.Path(target)
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      if (p.getParent != null && fs.exists(p.getParent))
        fs.listStatus(p.getParent)
          .filter(_.getPath.getName.matches(
            java.util.regex.Pattern.quote(p.getName) + "__gen\\d+"))
          .foreach(st => fs.delete(st.getPath, true))
    }
  }
  /** JSON / ORC sinks (capability superset — the reference ships only
    * parquet+csv, `io/`; Spark provides these natively). */
  def toJson(path: String, mode: String = "overwrite"): Unit = {
    guardOverwrite(path, mode)
    df.write.mode(mode).json(path)
  }
  def toOrc(path: String, mode: String = "overwrite"): Unit = {
    guardOverwrite(path, mode)
    df.write.mode(mode).orc(path)
  }

  def cache(): GraftFrame = lift(df.cache())
  def explainPlan(): Unit = df.explain("formatted")
}

object GraftFrame {
  import org.apache.spark.sql.types.StructType

  /** Compact a bucketed table created by [[GraftFrame.toBucketedTable]]
    * back to one file per bucket. Every `mode = "append"` write adds up
    * to (tasks × buckets-touched) files, so a daily-appended index
    * table's file count grows O(days × tasks) — reads stay
    * exchange-free but pay ever more file opens. The rewrite
    * repartitions on the table's own bucket columns (aligned with the
    * bucket hash, so each task holds exactly one bucket and writes
    * exactly one file), lands in a NEW generation directory via a
    * scratch table entry, and is installed by `ALTER TABLE SET
    * LOCATION` — a catalog-metadata flip, never a rename under the
    * live directory.
    *
    * ONLINE-SAFE vs READERS (r10 verdict #6, same contract as
    * `Ivf.compactIndex`): a concurrent query that resolved the old
    * location keeps reading its files — the generation being replaced
    * stays on disk until the NEXT compaction retires it; only a reader
    * outliving TWO compactions can lose its listing. New queries (and
    * appends — `toBucketedTable` resolves the append target from the
    * catalog, not the caller's path) follow the flipped location.
    * WRITERS stay exclusive with the rewrite itself: an append racing
    * the rewrite lands rows the new generation never saw. Bucket spec,
    * sort spec, row set and the zero-exchange read property are
    * unchanged (spec-checked). */
  def compactBucketedTable(spark: SparkSession, table: String): Unit = {
    import org.apache.spark.sql.functions.col
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"compactBucketedTable: $table carries no bucket spec"))
    val path = new org.apache.hadoop.fs.Path(meta.location)
    // generation chain: <base>, <base>__gen1, <base>__gen2, ... — the
    // live location's suffix names the current generation
    val GenName = """(.*)__gen(\d+)""".r
    val (baseName, curGen) = path.getName match {
      case GenName(b, g) => (b, g.toInt)
      case n => (n, 0)
    }
    graft.llm.Generations.withCompactionLock(spark,
      new org.apache.hadoop.fs.Path(path.getParent,
        s"_COMPACTION_LOCK__$baseName").toString) {
      rewriteBucketedTableLocked(spark, table, spec, path, baseName,
        curGen, identity, "compactBucketedTable")
    }
    ()
  }

  /** Rewrite a bucketed table's ROWS through `transform` (e.g. an
    * anti-join retracting ids) with the same online generation-flip
    * install as [[compactBucketedTable]] — compaction is just the
    * identity transform. Returns (source rows, surviving rows). */
  private[graft] def rewriteBucketedTable(spark: SparkSession,
      table: String, transform: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
      opName: String): (Long, Long) = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    val spec = meta.bucketSpec.getOrElse(throw new IllegalArgumentException(
      s"$opName: $table carries no bucket spec"))
    val path = new org.apache.hadoop.fs.Path(meta.location)
    val GenName = """(.*)__gen(\d+)""".r
    val (baseName, curGen) = path.getName match {
      case GenName(b, g) => (b, g.toInt)
      case n => (n, 0)
    }
    graft.llm.Generations.withCompactionLock(spark,
      new org.apache.hadoop.fs.Path(path.getParent,
        s"_COMPACTION_LOCK__$baseName").toString) {
      rewriteBucketedTableLocked(spark, table, spec, path, baseName,
        curGen, transform, opName)
    }
  }

  private def rewriteBucketedTableLocked(spark: SparkSession, table: String,
      spec: org.apache.spark.sql.catalyst.catalog.BucketSpec,
      path: org.apache.hadoop.fs.Path, baseName: String,
      curGen: Int,
      transform: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame,
      opName: String): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val tmpTable = s"${table}__compacting"
    val tmpPath = new org.apache.hadoop.fs.Path(
      path.getParent, s"${baseName}__gen${curGen + 1}")
    tmpPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(tmpPath, true)
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    val cols = spec.bucketColumnNames
    // One file per bucket needs the shuffle routing to EQUAL the write
    // side's bucket-id function (pmod of the murmur hash): read the
    // files raw (a bucketed-table read advertises its partitioning and
    // lets the exchange elide over arbitrarily-packed appended files)
    // and pin AQE off for the rewrite (adaptive re-planning can merge
    // or re-pack the explicit hash partitions, leaving tasks holding
    // several buckets → several files each). The AQE toggle lives in a
    // CLONED session (shared SparkContext + catalog, isolated SQLConf)
    // so a concurrent query on the caller's session never sees
    // adaptive planning flip off mid-flight (r10 advice).
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val raw = s2.read.schema(spark.table(table).schema)
      .parquet(path.toString)
    val transformed = transform(raw)
    val w0 = transformed.repartition(spec.numBuckets, cols.map(col): _*)
      .write.mode("overwrite").option("path", tmpPath.toString)
      .bucketBy(spec.numBuckets, cols.head, cols.tail: _*)
    val w = spec.sortColumnNames match {
      case Nil => w0
      case s => w0.sortBy(s.head, s.tail: _*)
    }
    w.format("parquet").saveAsTable(tmpTable)
    // Verify the rewrite BEFORE retiring the live directory: a row-count
    // mismatch (partial write — the transform is deterministic, so a
    // recount is a faithful expectation) or a file-per-bucket overshoot
    // (AQE re-packing snuck in) must abort while the original data is
    // still installed — after the flip there is no good rollback state.
    val tmpRows = s2.read.schema(spark.table(table).schema)
      .parquet(tmpPath.toString).count()
    val wantRows = transformed.count()
    val srcRows = raw.count()
    if (tmpRows != wantRows) {
      spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
      throw new IllegalStateException(
        s"$opName: rewrite holds $tmpRows rows, expected $wantRows — aborting before swap")
    }
    spark.sql(s"DROP TABLE $tmpTable") // external entry: the files stay
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmpFiles = fs.listStatus(tmpPath)
      .count(st => st.getPath.getName.endsWith(".parquet"))
    if (tmpFiles > spec.numBuckets)
      throw new IllegalStateException(
        s"$opName: rewrite produced $tmpFiles files for " +
          s"${spec.numBuckets} buckets (adaptive re-packing?) — aborting before swap")
    // the FLIP: catalog metadata only — a concurrent reader holding the
    // old location's file listing keeps reading intact files
    spark.sql(s"ALTER TABLE $table SET LOCATION '${tmpPath.toString}'")
    spark.sql(s"REFRESH TABLE $table")
    // retire generations OLDER than the one just replaced — the
    // replaced generation itself survives for in-flight readers
    for (g <- 0 until curGen) {
      val n = if (g == 0) baseName else s"${baseName}__gen$g"
      fs.delete(new org.apache.hadoop.fs.Path(path.getParent, n), true)
    }
    (srcRows, tmpRows)
  }

  def readParquet(spark: SparkSession, path: String): GraftFrame =
    GraftFrame(spark.read.parquet(path))
  def readCsv(spark: SparkSession, path: String, header: Boolean = true,
              inferSchema: Boolean = true): GraftFrame =
    GraftFrame(spark.read.option("header", header).option("inferSchema", inferSchema).csv(path))
  /** JSON source: pass an explicit schema for deterministic dtypes
    * (inference samples the data — fine interactively, not in a gate). */
  def readJson(spark: SparkSession, path: String,
               schema: Option[org.apache.spark.sql.types.StructType] = None): GraftFrame = {
    val r = spark.read
    GraftFrame(schema.fold(r.json(path))(sc => r.schema(sc).json(path)))
  }
  def readOrc(spark: SparkSession, path: String): GraftFrame =
    GraftFrame(spark.read.orc(path))

  /** FromMap analog (reference `io/io.py:139-299`): distribute driver-side
    * items, build each partition's rows with `f` on the executors (the
    * projectable `columns=` absorption is Catalyst's job once rows exist). */
  def fromMap[T: scala.reflect.ClassTag](
      spark: SparkSession, items: Seq[T], schema: StructType,
      npartitions: Int)(f: T => Iterator[Row]): GraftFrame = {
    val rdd = spark.sparkContext
      .parallelize(items, math.max(1, math.min(npartitions, items.size)))
      .flatMap(f)
    GraftFrame(spark.createDataFrame(rdd, schema))
  }

  /** from_delayed analog (reference FromDelayed `io/_delayed.py:36-129`):
    * a frame whose PARTITIONS are caller-supplied deferred computations —
    * one partition per thunk, evaluated on the executors at scan time,
    * never on the driver. `schema` plays the reference's `meta` role:
    * the output contract is declared up front, so the plan resolves
    * before any thunk runs. Thunks must be serializable and
    * self-contained (no driver-state capture) — the usual Spark closure
    * rules; at cluster scale each delayed source materializes inside its
    * own task, exactly like the reference's delayed-object partitions. */
  def fromDelayed(spark: SparkSession, schema: StructType,
                  thunks: Seq[() => Iterator[Row]]): GraftFrame = {
    require(thunks.nonEmpty, "fromDelayed needs at least one delayed partition")
    val rdd = spark.sparkContext
      .parallelize(thunks, thunks.size)
      .flatMap(f => f())
    GraftFrame(spark.createDataFrame(rdd, schema))
  }

  /** from_pandas analog (reference FromPandas `io/io.py:302-418`): local
    * rows → distributed frame. `npartitions` mirrors the reference's
    * chunking knob. */
  def fromLocal(spark: SparkSession, schema: StructType, rows: Seq[Row],
                npartitions: Int = 0): GraftFrame = {
    val base = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)
    GraftFrame(if (npartitions > 0) base.repartition(npartitions) else base)
  }

  /** Column-oriented local constructor (reference `from_dict`,
    * `_collection.py`): columns as name → values, types inferred across
    * ALL non-null values per column — all-integer → LongType, mixed
    * numeric promotes to DoubleType (pandas-style upcast, so
    * Seq(1, 2.5) is a double column, not a Long column with a stray
    * Double that fails at row encoding), all-Boolean → BooleanType,
    * anything else stringified. */
  def fromDict(spark: SparkSession, columns: Seq[(String, Seq[Any])],
               npartitions: Int = 0): GraftFrame = {
    require(columns.nonEmpty, "fromDict needs at least one column")
    val n = columns.head._2.length
    require(columns.forall(_._2.length == n), "fromDict columns must be equal length")
    def dtypeOf(vs: Seq[Any]): DataType = {
      val nn = vs.filter(_ != null)
      def isInt(v: Any) = v.isInstanceOf[Long] || v.isInstanceOf[Int]
      def isNum(v: Any) = isInt(v) || v.isInstanceOf[Double] || v.isInstanceOf[Float]
      if (nn.isEmpty) StringType
      else if (nn.forall(isInt)) LongType
      else if (nn.forall(isNum)) DoubleType
      else if (nn.forall(_.isInstanceOf[Boolean])) BooleanType
      else StringType
    }
    def norm(v: Any, dt: DataType): Any = (v, dt) match {
      case (null, _) => null
      case (x: Int, LongType) => x.toLong
      case (x: Int, DoubleType) => x.toDouble
      case (x: Long, DoubleType) => x.toDouble
      case (x: Float, DoubleType) => x.toDouble
      case (x, StringType) => x.toString
      case (x, _) => x
    }
    val dts = columns.map { case (_, vs) => dtypeOf(vs) }
    val schema = StructType(columns.zip(dts).map { case ((name, _), dt) =>
      StructField(name, dt) })
    val rows = (0 until n).map(i =>
      Row(columns.zip(dts).map { case ((_, vs), dt) => norm(vs(i), dt) }: _*))
    fromLocal(spark, schema, rows, npartitions)
  }

  /** Deterministic synthetic timeseries (reference `datasets.py:13-116`):
    * integer-hash-driven columns so any engine reproduces the values. */
  def timeseries(spark: SparkSession, startEpoch: Long, rows: Long,
                 stepSeconds: Long = 1L): GraftFrame = {
    // Constants stay well under int64 overflow so ANY engine (ANSI SQL,
    // DuckDB, Spark) reproduces the values exactly.
    val d = spark.range(rows)
      .withColumn("ts", timestamp_seconds(lit(startEpoch) + col("id") * stepSeconds)
        .cast(org.apache.spark.sql.types.TimestampNTZType))
      .withColumn("name", concat(lit("n"), pmod(col("id") * 2654435761L, lit(23L))))
      .withColumn("x", (pmod(col("id") * 48271L + 11L, lit(1000000L))
        .cast("double") / 500000.0) - 1.0)
      .withColumn("y", (pmod(col("id") * 69621L + 7L, lit(1000000L))
        .cast("double") / 500000.0) - 1.0)
    GraftFrame(d)
  }
}
