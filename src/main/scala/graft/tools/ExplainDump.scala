package graft.tools

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Dev utility: dump `.explain("formatted")` of registered queries to
  * files (plan-shape evidence for the optimization rounds). Mirrors the
  * Bench session config (same master/cpus/AQE/shuffle-partition seed) so
  * the captured plan is the one the bench actually runs.
  *
  * Usage: ExplainDump <outDir> <query> [query...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_SUFFIX (default "", e.g. "_before"/"_after").
  * Not part of the driver contract. */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_SUFFIX", "")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (q <- names) {
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(outDir, s"$q$suffix.txt"),
          txt.getBytes(StandardCharsets.UTF_8))
        println(s"[explain] wrote $q$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[explain] $q FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
