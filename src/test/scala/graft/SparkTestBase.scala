package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session + tiny in-memory frame builders for the suites
  * (the FromPandas-analog oracle pattern from SURVEY §5). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  def df(schema: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      schema)

  /** (id long, k string, v double) — the workhorse schema. */
  val kvSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("k", StringType),
    StructField("v", DoubleType)))

  def kv(rows: (Long, String, Double)*): DataFrame =
    df(kvSchema, rows.map { case (i, k, v) => Row(i, k, v) }: _*)

  def collectSorted(d: DataFrame, by: String*): Seq[Row] =
    d.orderBy(by.head, by.tail: _*).collect().toSeq
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = GraftSession.builder(master = "local[2]", appName = "graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
