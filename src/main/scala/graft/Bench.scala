package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: headline queries at SPARK_GRAFT_SF_DIR, fully
  * materialized through the noop sink (count() would let Catalyst drop
  * terminal sorts and prune computed columns — under-measuring; the noop
  * sink executes the complete plan and discards rows executor-side). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the documented cosmetic WindowExec warnings (the
    // npartitions-row carry frames) flood stderr; when the caller merges
    // streams a mid-line interleave can corrupt the single JSON output
    // line this main exists to print (r5: the driver recorded
    // parsed=None for exactly that bench run).
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen warm-up outside the timed loop so the first query's
    // number is the query, not classloading (r1 verdict finding)
    try SparkEntry.queries("q_head")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    val names = SparkEntry.benchQueries
    // Two full passes over the query list, report the per-query MINIMUM:
    // the container shows 1.4-2x identical-build host variance
    // (STATUS.md), which single-run numbers confound with real
    // regressions. The min of two runs is a far tighter estimator of the
    // plan's true cost; the passes are whole-list sequential so run 2 of
    // a query never rides its own run-1 cache adjacency.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (r <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        best(name) = math.min(best.getOrElse(name, Double.PositiveInfinity), dt)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name run $r FAILED: ${e.getMessage}")
      }
    }
    val failed = names.filterNot(best.contains)
    val qs = names.map { n =>
      "\"" + n + "\":" + (if (best.contains(n)) f"${best(n)}%.3f" else "-1")
    }.mkString("{", ",", "}")
    val total = best.values.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    println(line)
    // also land the record on disk: round-over-round tracking must not
    // depend on tail-grepping sbt logs (BENCH_r05-r07 all parsed null)
    try {
      val out = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    if (failed.nonEmpty) System.err.println(s"[bench] ${failed.size} queries failed")
    spark.stop()
  }
}
