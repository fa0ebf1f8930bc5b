package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** map_overlap (reference `_expr.py:595-794`): run a per-partition
  * function where each partition also sees the last `before` rows of its
  * predecessor (and optionally the first `after` rows of its successor)
  * under a global range order.
  *
  * Plan: range-shuffle on the order column (sampled boundaries — one
  * shuffle), then duplicate ONLY the `before`/`after` boundary rows into
  * the partitions that need them via a tiny ghost-row shuffle zipped back
  * against the ranged data. Owned rows are never re-shuffled and never
  * buffered: the extraction pass streams each partition through a
  * `before`-sized ring buffer, and the receive side buffers only the
  * O(before+after) ghosts. Boundary rows CASCADE past partitions too
  * small (or empty) to supply the full overlap themselves (r2 ADVICE:
  * adjacent-only forwarding silently lost context rows there).
  */
object Overlap {

  /** Identity partitioner over precomputed partition ids — also used by
    * GraftFrame.repartitionByDivisions, where sampled range partitioning
    * could merge two division buckets under skew. */
  private[graft] final class IdPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** @param f per-partition function: Iterator of (isOwned, Row) in order;
    *          emits output rows. Ghost rows (isOwned=false) are context
    *          from neighbor partitions and should not produce output. */
  def mapOverlap(df: DataFrame, orderCol: String, before: Int, after: Int,
                 outSchema: StructType)(
      f: Iterator[(Boolean, Row)] => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    // one RDD object for all three passes so the range shuffle is written
    // once and its output reused (no source re-scan per pass)
    val rangedRdd = ranged.rdd
    val n = rangedRdd.getNumPartitions

    // pass 1: per-partition row counts — n longs on the driver, needed to
    // route boundary rows past under-filled partitions
    val counts = new Array[Long](n)
    rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; while (it.hasNext) { it.next(); c += 1 }
      Iterator((pid, c))
    }.collect().foreach { case (p, c) => counts(p) = c }

    // destinations of partition p's boundary rows: successors q for as
    // long as the rows strictly between p and q cannot cover `before`
    // (mirrored for `after` toward predecessors)
    val nextTargets: Array[Seq[Int]] = Array.tabulate(n) { p =>
      val b = Seq.newBuilder[Int]; var gap = 0L; var q = p + 1
      while (q < n && gap < before) { b += q; gap += counts(q); q += 1 }
      b.result()
    }
    val prevTargets: Array[Seq[Int]] = Array.tabulate(n) { p =>
      val b = Seq.newBuilder[Int]; var gap = 0L; var q = p - 1
      while (q >= 0 && gap < after) { b += q; gap += counts(q); q -= 1 }
      b.result()
    }

    // pass 2: streamed ghost extraction — memory is before + after rows,
    // never the partition
    val ghostRdd = rangedRdd.mapPartitionsWithIndex { (pid, it) =>
      val toNext = nextTargets(pid)
      val toPrev = prevTargets(pid)
      if (toNext.isEmpty && toPrev.isEmpty) Iterator.empty
      else {
        val head = new scala.collection.mutable.ArrayBuffer[Row]()
        val ring = new Array[Row](math.max(before, 1))
        var seen = 0L
        while (it.hasNext) {
          val r = it.next()
          if (toPrev.nonEmpty && head.length < after) head += r
          if (toNext.nonEmpty && before > 0) ring((seen % before).toInt) = r
          seen += 1
        }
        val lastK: Seq[Row] =
          if (toNext.isEmpty || before == 0) Seq.empty
          else {
            val k = math.min(seen, before.toLong).toInt
            (0 until k).map(i => ring(((seen - k + i) % before).toInt))
          }
        toNext.iterator.flatMap(q => lastK.iterator.map(r => (q, r))) ++
          toPrev.iterator.flatMap(q => head.iterator.map(r => (q, r)))
      }
    }.partitionBy(new IdPartitioner(n)).values

    // pass 3: zip ghosts (buffered + sorted — O(before+after) rows) with
    // the streaming owned rows; range partitioning guarantees predecessor
    // ghosts sort strictly below the first owned row and successor ghosts
    // strictly above the last
    val ordIdx = df.schema.fieldIndex(orderCol)
    val out = rangedRdd.zipPartitions(ghostRdd) { (ownedIt, ghostIt) =>
      val ghosts = ghostIt.toArray
      java.util.Arrays.sort(ghosts, new java.util.Comparator[Row] {
        def compare(a: Row, b: Row): Int =
          a.get(ordIdx).asInstanceOf[Comparable[Any]].compareTo(b.get(ordIdx))
      })
      val owned = ownedIt.buffered
      val merged: Iterator[(Boolean, Row)] =
        if (ghosts.isEmpty) owned.map((true, _))
        else if (!owned.hasNext) ghosts.iterator.map((false, _))
        else {
          val firstOrd = owned.head.get(ordIdx).asInstanceOf[Comparable[Any]]
          val (pre, post) = ghosts.partition(g => firstOrd.compareTo(g.get(ordIdx)) > 0)
          pre.iterator.map((false, _)) ++ owned.map((true, _)) ++
            post.iterator.map((false, _))
        }
      f(merged)
    }
    spark.createDataFrame(out, outSchema)
  }
}
