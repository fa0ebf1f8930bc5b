package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway micro-benchmarks for expression-level costs (dev only). */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.GraftSession.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s  n=$n")
    }
    time("warmup count") { docs.count() }
    time("sum length(text)") {
      docs.agg(sum(length(col("text")))).head().getLong(0)
    }
    for (i <- 1 to 2) {
      time(s"split size (run $i)") {
        docs.agg(sum(size(split(col("text"), "\\s+", -1)))).head().getLong(0)
      }
      time(s"split+filter size (run $i)") {
        docs.agg(sum(size(filter(split(col("text"), "\\s+", -1),
          t => t =!= "" && length(t) >= 2)))).head().getLong(0)
      }
      time(s"explode split+filter count (run $i)") {
        docs.select(explode(filter(split(col("text"), "\\s+", -1),
            t => t =!= "" && length(t) >= 2)).as("term")).count()
      }
      time(s"postings agg (run $i)") {
        graft.llm.Lexical.postings(docs, "doc_id", "text").count()
      }
      val toks = filter(split(col("text"), "\\s+", -1),
        t => t =!= "" && length(t) >= 2)
      val exploded = docs.select(col("doc_id"),
        coalesce(size(toks), lit(0)).as("dl"), explode(toks).as("term"))
      time(s"explode w/ dl count (run $i)") { exploded.count() }
      time(s"groupBy(doc,term,dl) (run $i)") {
        exploded.groupBy("doc_id", "term", "dl")
          .agg(count(lit(1))).count()
      }
      time(s"groupBy(term) (run $i)") {
        exploded.groupBy("term").agg(count(lit(1))).count()
      }
      time(s"groupBy(doc,term,dl) no-spread-1part (run $i)") {
        docs.coalesce(1).select(col("doc_id"),
            coalesce(size(toks), lit(0)).as("dl"), explode(toks).as("term"))
          .groupBy("doc_id", "term", "dl")
          .agg(count(lit(1))).count()
      }
    }
    spark.stop()
  }
}
