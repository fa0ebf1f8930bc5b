package graft
/** Mirrors the driver's t1 smoke: entry() at sf0.001 must return rows. */
object SmokeCheck {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
