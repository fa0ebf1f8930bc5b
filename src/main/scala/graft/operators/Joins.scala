package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** pandas merge semantics on Spark joins (reference `_merge.py:32-404`).
  *
  * Physical strategy is delegated: Catalyst + AQE choose broadcast vs
  * shuffled-hash vs sort-merge from *runtime* sizes, replacing the
  * reference's static partition-count heuristic
  * (`n_small < log2(n_big) * 0.5`, reference `_merge.py:168-203`) with
  * observed byte sizes — strictly better at 100 TB where partition counts
  * say little about data volume. `broadcastMerge` force-hints the build
  * side for cases the user knows are dimension tables.
  */
object Joins {

  /** Rename overlapping non-key columns with pandas suffixes
    * (reference `_merge.py:348-404` suffix unwinding). */
  private def suffixed(left: DataFrame, right: DataFrame, on: Seq[String],
                       suffixes: (String, String)): (DataFrame, DataFrame) = {
    val overlap = (left.columns.toSet & right.columns.toSet) -- on.toSet
    val l = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    (l, r)
  }

  def merge(left: DataFrame, right: DataFrame, on: Seq[String], how: String,
            suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val (l, r) = suffixed(left, right, on, suffixes)
    val sparkHow = how match {
      case "outer" => "full_outer"
      case h => h
    }
    l.join(r, on, sparkHow)
  }

  /** pandas merge(left_on=, right_on=): keys with different names on
    * each side; both key columns survive in the output (pandas keeps
    * both when names differ). */
  def mergeOn(left: DataFrame, right: DataFrame,
              leftOn: Seq[String], rightOn: Seq[String], how: String,
              suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    require(leftOn.length == rightOn.length, "mergeOn: key arity mismatch")
    val (l, r) = suffixed(left, right, Nil, suffixes)
    val cond = leftOn.zip(rightOn)
      .map { case (lc, rc) => l(lc) === r(rc) }
      .reduce(_ && _)
    val sparkHow = if (how == "outer") "full_outer" else how
    l.join(r, cond, sparkHow)
  }

  def broadcastMerge(left: DataFrame, right: DataFrame, on: Seq[String],
                     how: String = "inner"): DataFrame =
    left.join(broadcast(right), on, how)

  def semi(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "left_semi")

  def anti(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "left_anti")

  /** merge(indicator=True) (reference `_merge.py:45-58`): full outer join
    * plus a `_merge` membership column. Overlapping columns are suffixed
    * exactly as in `merge`. */
  def mergeIndicator(left: DataFrame, right: DataFrame, on: Seq[String],
                     suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val (l0, r0) = suffixed(left, right, on, suffixes)
    val l = l0.withColumn("__l__", lit(1))
    val r = r0.withColumn("__r__", lit(1))
    l.join(r, on, "full_outer")
      .withColumn("_merge",
        when(col("__l__").isNotNull && col("__r__").isNotNull, "both")
          .when(col("__l__").isNotNull, "left_only")
          .otherwise("right_only"))
      .drop("__l__", "__r__")
  }

  /** df.join([d1, d2, ...]) multi-frame key join (reference
    * JoinRecursive `_merge.py:700-750`). A left fold is sufficient:
    * Catalyst's CostBasedJoinReorder may rebalance the tree. */
  def joinMany(frames: Seq[DataFrame], on: Seq[String], how: String = "outer")
      : DataFrame =
    frames.reduceLeft((a, b) => a.join(b, on, how))

  /** Skew-resistant join: salt the hot side's key into `saltFactor`
    * sub-keys and explode the small side to match. For when AQE's skew
    * handling isn't available (non-AQE sinks, stream-static joins). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int): DataFrame = {
    val salted = big.withColumn("__salt__",
      pmod(hash(col(key), monotonically_increasing_id()), lit(saltFactor)))
    val exploded = small.withColumn("__salt__",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(exploded, Seq(key, "__salt__")).drop("__salt__")
  }

  /** As-of join (nearest right row with rightTs <= leftTs, per by-key) —
    * a capability superset: absent in the reference (equi-join only,
    * reference `_merge.py:32`) and in vanilla Spark.
    *
    * Scale-safe single-shuffle plan: union both sides tagged, hash-shuffle
    * once on the by-keys, order each key's rows by (ts, side) and carry the
    * most recent right-side values forward with `last(..., ignoreNulls)`.
    * No per-key row explosion (the naive join-then-rank materializes
    * |left|x|right| per key), left rows always survive (left-join
    * semantics: a left row earlier than every right row gets nulls), and
    * duplicate left timestamps are preserved.
    *
    * Right rows sort *before* left rows at equal ts (side 0 < 1), so an
    * exact timestamp tie matches — pandas merge_asof default
    * (allow_exact_matches=True). Output: every left column plus the right
    * value columns (overlaps suffixed `_y`).
    */
  def asofJoin(left: DataFrame, right: DataFrame, leftTs: String,
               rightTs: String, by: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None,
               allowExactMatches: Boolean = true): DataFrame = {
    require(by.nonEmpty,
      "asofJoin: empty `by` would order the whole union in one task; " +
        "use asofJoinGlobal (range-partitioned carry) for a by-less as-of")
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoin: direction must be backward/forward/nearest, got '$direction'")
    val (withM, rightVals, tieBreak) = asofPrep(left, right, leftTs, rightTs, by)
    val byCols = by.map(col)
    // Backward: latest right row with rts <= lts — last non-null over an
    // unbounded-preceding frame. The side order at EQUAL ts encodes
    // allow_exact_matches: right-before-left (asc) includes the exact
    // match in the preceding frame; left-before-right (desc) excludes it
    // (strict rts < lts, pandas allow_exact_matches=False).
    val bSide = if (allowExactMatches) col("__side__").asc else col("__side__").desc
    val wB = Window.partitionBy(byCols: _*)
      .orderBy(col("__ts__").asc +: bSide +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Forward: earliest right row with rts >= lts — first non-null over
    // an unbounded-following frame; the mirrored side order does the
    // same exact-match inclusion/exclusion.
    val fSide = if (allowExactMatches) col("__side__").desc else col("__side__").asc
    val wF = Window.partitionBy(byCols: _*)
      .orderBy(col("__ts__").asc +: fSide +: tieBreak: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = direction match {
      case "backward" =>
        withM.withColumn("__m__",
          last(col("__rv__"), ignoreNulls = true).over(wB))
      case "forward" =>
        withM.withColumn("__m__",
          first(col("__rv__"), ignoreNulls = true).over(wF))
      case "nearest" =>
        // both fills, then a per-row pick: closer match wins, exact tie
        // goes backward (documented; the oracle mirrors the same rule)
        nearestPick(withM
          .withColumn("__mb__", last(col("__rv__"), ignoreNulls = true).over(wB))
          .withColumn("__mf__", first(col("__rv__"), ignoreNulls = true).over(wF)))
    }
    asofPost(filled, rightVals, tolerance)
  }

  /** Global (by-less) merge_asof — the guarded escape hatch for the
    * empty-`by` refusal above. A single global window would order the
    * whole union in ONE task; this plans the same two-shuffle carry as
    * [[graft.operators.WindowOps.globalCumSum]]: range-repartition the
    * tagged union on the timestamp (sampled boundaries, equal keys
    * co-located), fill within each range with a window PARTITIONED by
    * the range id, then bridge ranges with an (npartitions)-row carry
    * frame joined back by broadcast — backward carries each range's
    * latest right row forward (exclusive prefix), forward carries each
    * range's earliest right row backward (exclusive suffix). Every
    * range fills in parallel at any scale; the only serial window runs
    * on npartitions rows. Matches [[asofJoin]] semantics exactly
    * (struct'd matched row, exact-match side ordering, tolerance,
    * nearest tie to backward). */
  def asofJoinGlobal(left: DataFrame, right: DataFrame, leftTs: String,
                     rightTs: String,
                     direction: String = "backward",
                     tolerance: Option[Long] = None,
                     allowExactMatches: Boolean = true): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"asofJoinGlobal: direction must be backward/forward/nearest, got '$direction'")
    val (withM, rightVals, tieBreak) = asofPrep(left, right, leftTs, rightTs, Nil)
    // Both carry consumers (the data branch and the npartitions-row
    // carries aggregate) descend from THIS frame, so the range exchange
    // appears twice in the plan. Exchange/stage reuse dedupes it ONLY if
    // both occurrences canonicalize identically, and in r8 they did not:
    // column pruning projected the carries branch narrower (it never
    // touched the left payload columns), so the union pipeline executed
    // twice (~1.6x q_asof_join at sf0.1). Fixed without materializing
    // anything: the per-range fill window's tie-break ordering is
    // extended with every remaining column (see ordTail below), so BOTH
    // branches consume the full exchange output, pruning cannot narrow
    // either side, and the second occurrence plans as a ReusedExchange —
    // the scan+union+shuffle run once, and the reused shuffle files are
    // exactly how Spark shares work at cluster scale (no cached blocks,
    // no fault-tolerance loss). The explicit partition count pins both
    // branches to the same range map even if a future Spark makes
    // user range-repartitions AQE-coalescable (r8 ADVICE): divergent
    // coalescing between branches would silently join carries to the
    // wrong ranges. Reuse is asserted by the plan spec; values are
    // checked end-to-end by the q_asof_global oracle and the
    // multi-partition parity spec.
    val nRanges = withM.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = withM.repartitionByRange(nRanges, col("__ts__"))
      .withColumn("__pid__", spark_partition_id())
    val bSide = if (allowExactMatches) col("__side__").asc else col("__side__").desc
    val fSide = if (allowExactMatches) col("__side__").desc else col("__side__").asc
    // Ordering tail: every input column not already consumed, appended
    // AFTER the real tie-break. Semantically a no-op — payload columns
    // are NULL on every right row (side 0), so the carry order among
    // right rows is untouched, and order among tied LEFT rows cannot
    // change any fill (left rows contribute only nulls to
    // last/first(ignoreNulls)). Their job is to make each fill window
    // consume its ENTIRE input (reuse, above). Computed per-fill from
    // the actual input: in `nearest` the forward fill runs over the
    // backward output, and leaving __mb__ unconsumed there would let
    // pruning collapse the backward carries join to a distinct-pid
    // broadcast over a third, differently-pruned exchange descent.
    def ordTail(d: DataFrame): Seq[Column] = tieBreak ++ d.columns
      .filterNot(c => rightVals.contains(c) ||
        c == "__ts__" || c == "__side__" || c == "__rv__" || c == "__pid__")
      .map(c => col(c).asc_nulls_first)
    // Per-range local fill + cross-range carry. The npartitions-row
    // windows are deliberately un-partitioned (see globalCumSum: an
    // RDD-boundary "fix" severs the plan and recomputes the pipeline).
    def fillBackward(d: DataFrame): DataFrame = {
      val wB = Window.partitionBy(col("__pid__"))
        .orderBy(col("__ts__").asc +: bSide +: ordTail(d): _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = d.withColumn("__mbl__",
        last(col("__rv__"), ignoreNulls = true).over(wB))
      val wP = Window.orderBy(col("__pid__"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // grouped last() is deterministic here: each __pid__ group is one
      // partition, sorted by ordB by the window above, and the local fill
      // is monotone (latest-so-far), so "last" IS the range's latest right
      val carries = local.groupBy(col("__pid__"))
        .agg(last(col("__mbl__"), ignoreNulls = true).as("__lr__"))
        .withColumn("__cb__", last(col("__lr__"), ignoreNulls = true).over(wP))
        .select(col("__pid__"), col("__cb__"))
      local.join(broadcast(carries), Seq("__pid__"))
        .withColumn("__mb__", coalesce(col("__mbl__"), col("__cb__")))
        .drop("__mbl__", "__cb__")
    }
    def fillForward(d: DataFrame): DataFrame = {
      val wF = Window.partitionBy(col("__pid__"))
        .orderBy(col("__ts__").asc +: fSide +: ordTail(d): _*)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val local = d.withColumn("__mfl__",
        first(col("__rv__"), ignoreNulls = true).over(wF))
      val wN = Window.orderBy(col("__pid__"))
        .rowsBetween(1, Window.unboundedFollowing)
      val carries = local.groupBy(col("__pid__"))
        .agg(first(col("__mfl__"), ignoreNulls = true).as("__fr__"))
        .withColumn("__cf__", first(col("__fr__"), ignoreNulls = true).over(wN))
        .select(col("__pid__"), col("__cf__"))
      local.join(broadcast(carries), Seq("__pid__"))
        .withColumn("__mf__", coalesce(col("__mfl__"), col("__cf__")))
        .drop("__mfl__", "__cf__")
    }
    val filled = (direction match {
      case "backward" => fillBackward(ranged).withColumnRenamed("__mb__", "__m__")
      case "forward" => fillForward(ranged).withColumnRenamed("__mf__", "__m__")
      case "nearest" => nearestPick(fillForward(fillBackward(ranged)))
    }).drop("__pid__")
    asofPost(filled, rightVals, tolerance)
  }

  /** Shared as-of prep: suffix overlapping non-key right columns `_y`,
    * tag sides (right 0 < left 1 so equal-ts ordering encodes exact-match
    * semantics), align schemas, union, and attach the matched-row STRUCT
    * `__rv__` — every right value column plus the right row's own
    * timestamp, masked to side 0. pandas merge_asof carries the matched
    * row's values INCLUDING its nulls; filling each column independently
    * with ignoreNulls would let a null value column borrow an OLDER row's
    * value while tolerance/nearest measure distance against a different
    * row's timestamp (r6 ADVICE). The struct is non-null for every right
    * row, so one last/first(ignoreNulls) picks the matched row as a unit
    * — also one window function instead of N+1. Returns
    * (frame, right value names, deterministic tie-break sort). */
  private def asofPrep(left: DataFrame, right: DataFrame, leftTs: String,
                       rightTs: String, by: Seq[String])
      : (DataFrame, Seq[String], Seq[Column]) = {
    val overlap = (left.columns.toSet & right.columns.toSet) -- by.toSet - rightTs
    val r0 = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + "_y"))
    val rightVals = r0.columns.filterNot(c => by.contains(c) || c == rightTs).toSeq
    val lTagged = left
      .withColumn("__ts__", col(leftTs))
      .withColumn("__side__", lit(1))
    val rTagged =
      r0.withColumn("__ts__", col(rightTs)).withColumn("__side__", lit(0))
    // Align schemas: left lacks right value cols, right lacks left cols.
    val leftOnly = left.columns.filterNot(by.contains).toSeq
    val lFull = rightVals.foldLeft(lTagged)((d, c) => d.withColumn(c, lit(null)))
    val rFull = leftOnly.foldLeft(rTagged)((d, c) => d.withColumn(c, lit(null)))
    val cols = (by ++ leftOnly ++ rightVals ++ Seq("__ts__", "__side__")).map(col(_))
    val unioned = lFull.select(cols: _*).unionByName(rFull.select(cols: _*))
    // tertiary sort on the right value columns: multiple right rows
    // sharing a timestamp within a by-group must carry in a deterministic
    // order (last-by-lexicographic-value), or the matched value differs
    // run-to-run (r2 ADVICE)
    val tieBreak = rightVals.map(c => col(c).asc_nulls_first)
    val mFields = rightVals.map(c => col(c).as(c)) :+ col("__ts__").as("__rts__")
    val withM = unioned.withColumn("__rv__",
      when(col("__side__") === 0, struct(mFields: _*)))
    (withM, rightVals, tieBreak)
  }

  /** nearest = closer of the backward/forward structs, exact tie to
    * backward (the oracles mirror the same CASE). */
  private def nearestPick(both: DataFrame): DataFrame = {
    val bts = col("__mb__").getField("__rts__")
    val fts = col("__mf__").getField("__rts__")
    val useB = fts.isNull ||
      (bts.isNotNull && (col("__ts__") - bts) <= (fts - col("__ts__")))
    both.withColumn("__m__", when(useB, col("__mb__")).otherwise(col("__mf__")))
      .drop("__mb__", "__mf__")
  }

  /** Shared as-of postprocessing: unpack the matched struct into the
    * output columns, apply tolerance, restore left-row-only output. */
  private def asofPost(matched: DataFrame, rightVals: Seq[String],
                       tolerance: Option[Long]): DataFrame = {
    val filled = rightVals
      .foldLeft(matched)((dd, c) => dd.withColumn(c, col("__m__").getField(c)))
      .withColumn("__mts__", col("__m__").getField("__rts__"))
    // Tolerance (pandas merge_asof tolerance=): a match farther than the
    // bound is nulled out, row kept (left join semantics preserved).
    // Units: MICROSECONDS for timestamp ts columns (subtraction yields an
    // interval), the column's own units for numeric ts columns.
    val bounded = tolerance match {
      case None => filled
      case Some(t) =>
        require(t >= 0, "asofJoin: tolerance must be non-negative")
        val delta = greatest(col("__ts__") - col("__mts__"),
          col("__mts__") - col("__ts__"))
        val bound = filled.schema("__ts__").dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            expr(s"INTERVAL $t MICROSECOND")
          case _ => lit(t)
        }
        val ok = col("__mts__").isNotNull && delta <= bound
        rightVals.foldLeft(filled)((d, c) => d.withColumn(c, when(ok, col(c))))
    }
    bounded.filter(col("__side__") === 1)
      .drop("__ts__", "__side__", "__rv__", "__m__", "__mts__")
  }

  /** merge_asof(left_by=, right_by=): by-keys named differently on each
    * side — the right side is renamed to the left's names and delegated;
    * the output carries the LEFT names (pandas behavior). */
  def asofJoinOn(left: DataFrame, right: DataFrame, leftTs: String,
                 rightTs: String, leftBy: Seq[String], rightBy: Seq[String],
                 direction: String = "backward",
                 tolerance: Option[Long] = None,
                 allowExactMatches: Boolean = true): DataFrame = {
    require(leftBy.length == rightBy.length, "asofJoinOn: by-key arity mismatch")
    // withColumnRenamed silently no-ops on a missing source and silently
    // duplicates an existing target — both must refuse loudly (r6 ADVICE)
    val missing = rightBy.filterNot(right.columns.contains)
    require(missing.isEmpty,
      s"asofJoinOn: right frame is missing by-column(s) ${missing.mkString(", ")}")
    val clashes = rightBy.zip(leftBy).collect {
      case (rc, lc) if rc != lc && right.columns.contains(lc) => lc }
    require(clashes.isEmpty,
      s"asofJoinOn: right frame already has column(s) ${clashes.mkString(", ")} " +
        "that the left by-name rename would duplicate; rename or drop them first")
    val renamed = rightBy.zip(leftBy).foldLeft(right) {
      case (d, (rc, lc)) => d.withColumnRenamed(rc, lc) }
    asofJoin(left, renamed, leftTs, rightTs, leftBy,
      direction, tolerance, allowExactMatches)
  }
}
