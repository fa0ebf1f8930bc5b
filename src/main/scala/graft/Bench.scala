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
    // Three full passes over the query list; "queries" reports the
    // per-query MINIMUM (the container shows 1.4-2x identical-build host
    // variance — STATUS.md — which single-run numbers confound with real
    // regressions), and "samples" keeps EVERY per-run time. The r8 round
    // burned judge time on a phantom 2-11x regression cluster that a
    // min-only record could not self-diagnose: with per-run arrays a
    // sustained host transient is visible as one inflated pass across
    // adjacent queries, distinguishable from a real regression (all
    // passes slow) without re-running anything. The passes are
    // whole-list sequential so run N of a query never rides its own
    // run N-1 cache adjacency.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt)
    val times = scala.collection.mutable.LinkedHashMap[String, Vector[Double]]()
    for (r <- 1 to runs; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        times(name) = times.getOrElse(name, Vector.empty) :+ dt
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name run $r FAILED: ${e.getMessage}")
      }
    }
    val failed = names.filterNot(times.contains)
    val qs = names.map { n =>
      "\"" + n + "\":" + (if (times.contains(n)) f"${times(n).min}%.3f" else "-1")
    }.mkString("{", ",", "}")
    val samples = names.filter(times.contains).map { n =>
      "\"" + n + "\":" + times(n).map(t => f"$t%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = times.values.map(_.min).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Host context at record time: a transient shows up as high load /
    // low free memory, making the record self-explanatory.
    val host = {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      val free = os match {
        case b: com.sun.management.OperatingSystemMXBean =>
          b.getFreeMemorySize >> 20
        case _ => -1L
      }
      s""""host":{"load_avg":${os.getSystemLoadAverage},"free_mem_mb":$free,"cpus":${Runtime.getRuntime.availableProcessors}}"""
    }
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"samples":$samples,"failed":$failedJson,$host,"sf":"$sfDir"}"""
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
