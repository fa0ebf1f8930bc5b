package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time one registered query N times in a fresh session —
  * the adjudication probe for per-query sample anomalies in the round
  * bench (e.g. "why are passes 1-2 slow and pass 3 fast?"). Prints one
  * line per run; no JSON contract, not part of the driver surface.
  *
  * Usage: QueryProbe <sfDir> <queryName> [runs=4]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <sfDir> <queryName> [runs]")
    val dir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to runs) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name run $r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
