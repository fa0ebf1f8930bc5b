package graft.tools

/** Prints the FINAL adaptive plan of registered queries (after execution,
  * when AQE has fixed join strategies and reused stages) plus scan/reuse
  * counters — ExplainMain shows the initial plan, which under AQE hides
  * runtime exchange reuse and broadcast decisions.
  *
  * Usage: FinalPlanMain [-v] q_name...  (SPARK_GRAFT_SF_DIR selects data)
  */
object FinalPlanMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val verbose = args.contains("-v")
    for (q <- args.filterNot(_ == "-v")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val scans = "FileScan parquet".r.findAllIn(s).length
      val reused = "ReusedExchange".r.findAllIn(s).length
      val stages = "ShuffleQueryStage".r.findAllIn(s).length
      println(s"$q: parquet-scans=$scans reusedExchange=$reused shuffleStages=$stages")
      if (verbose) println(s.take(8000))
    }
    spark.stop()
  }
}
