package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** map_overlap (reference `_expr.py:595-794`): run a per-partition
  * function where each partition also sees the last `before` rows of its
  * predecessor (and optionally the first `after` rows of its successor)
  * under a global range order.
  *
  * Plan: range-shuffle on the order column (sampled boundaries — one
  * shuffle), then duplicate ONLY the `before`/`after` boundary rows into
  * neighbor partitions via an explicit identity partitioner — O(npartitions
  * x overlap) extra rows, nothing like the reference's full overlapping
  * partition materialization. Ghost rows are marked so the user function
  * can emit output for owned rows only.
  */
object Overlap {

  private final class IdPartitioner(n: Int) extends Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = key.asInstanceOf[Int]
  }

  /** @param f per-partition function: Iterator of (isOwned, Row) in order;
    *          emits output rows. Ghost rows (isOwned=false) are context
    *          from the neighbor partition and should not produce output. */
  def mapOverlap(df: DataFrame, orderCol: String, before: Int, after: Int,
                 outSchema: StructType)(
      f: Iterator[(Boolean, Row)] => Iterator[Row]): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(col(orderCol))
      .sortWithinPartitions(orderCol)
    val n = ranged.rdd.getNumPartitions
    val tagged = ranged.rdd.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      val owned = rows.iterator.map(r => (pid, (true, r)))
      val toNext =
        if (before > 0 && pid + 1 < n)
          rows.takeRight(before).iterator.map(r => (pid + 1, (false, r)))
        else Iterator.empty
      val toPrev =
        if (after > 0 && pid > 0)
          rows.take(after).iterator.map(r => (pid - 1, (false, r)))
        else Iterator.empty
      owned ++ toNext ++ toPrev
    }
    val ordIdx = df.schema.fieldIndex(orderCol)
    val out = tagged
      .partitionBy(new IdPartitioner(n))
      .mapPartitions { it =>
        // shuffle fetch order across senders is arbitrary — restore the
        // overlap window order by the order column before handing over
        val rows = it.map(_._2).toArray
        java.util.Arrays.sort(rows, new java.util.Comparator[(Boolean, Row)] {
          def compare(a: (Boolean, Row), b: (Boolean, Row)): Int =
            a._2.get(ordIdx).asInstanceOf[Comparable[Any]]
              .compareTo(b._2.get(ordIdx))
        })
        f(rows.iterator)
      }
    spark.createDataFrame(out, outSchema)
  }
}
