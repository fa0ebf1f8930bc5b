package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: stage-level timings for the heaviest bench pipelines, so a
  * perf pass targets the dominant stage instead of guessing (SURVEY §7
  * step 9). Cumulative pipelines share the warm file cache; deltas
  * between lines approximate per-stage cost. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(master = s"local[$cpus]",
        appName = "graft-perfprobe").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  rows=$n")
    }
    val docs = GraftSession.table(spark, dir, "documents")
    docs.count() // warm file cache
    time("shingles") {
      docs.select(org.apache.spark.sql.functions.col("doc_id"),
        graft.functions.TextHashExprs.shingleHashes(
          org.apache.spark.sql.functions.col("text"), 3).as("sh")).count()
    }
    time("signatures") {
      llm.Dedup.signatures(docs, "doc_id", "text").count()
    }
    time("pairs (cand+jaccard)") {
      llm.Dedup.nearDuplicatePairs(docs, "doc_id", "text", 0.6).count()
    }
    time("dropNearDuplicates") {
      llm.Dedup.dropNearDuplicates(docs, "doc_id", "text", 0.6).count()
    }
    val emb = GraftSession.table(spark, dir, "embeddings")
    emb.count()
    time("embed pairs") {
      llm.Dedup.embeddingNearDupPairs(emb, "vec_id", "embedding", 64, 0.95).count()
    }
    spark.stop()
  }
}
