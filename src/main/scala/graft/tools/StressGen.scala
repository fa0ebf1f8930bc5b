package graft.tools

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decimal-stress fixture generator: replicates sf0.1 to ~10× so the
  * flagship aggregates run against sums an order of magnitude larger —
  * the exactDouble 2^53 windows and double→decimal cast rules are
  * exactly the class of logic that only larger data exercises.
  *
  * Scaling rules:
  *  - lineitem / orders: 10 copies with disjoint order keys (offset per
  *    copy), all measures unchanged → aggregate magnitudes grow 10×
  *    while per-row values stay in fixture range.
  *  - embeddings: 10 copies with disjoint vec_ids (per-row queries like
  *    q_embed_norm must keep one row per id; the centroid query's
  *    vec_id < 2000 bound still selects only the original copy).
  *  - documents: 10 copies with disjoint doc_ids and per-copy word
  *    tags (r14 — see the inline note: exact replicas would collapse
  *    in dedup, near replicas would go quadratic in candidates).
  *  - everything else: byte-for-byte file copy (events keeps its
  *    TIMESTAMP(NANOS) physical type — a Spark rewrite would change it).
  *
  * Usage: StressGen <srcSfDir> <outDir> [copies]
  */
object StressGen {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, srcDir, outDir, copies)
    spark.stop()
  }

  /** Generation body, callable with an existing session (graft.Bench
    * builds its sf1 section fixture in-process with this). */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
               copies: Int): Unit = {
    Files.createDirectories(Paths.get(outDir))

    val keyOffset = 100000000L // far above any fixture key
    def replicateWithKeys(table: String, keyCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$srcDir/$table.parquet")
      val out = (0 until copies).map { i =>
        keyCols.foldLeft(base) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * keyOffset)) }
      }.reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$outDir/$table.parquet")
      println(s"[stress] $table x$copies -> ${out.count()} rows")
    }
    replicateWithKeys("lineitem", Seq("l_orderkey"))
    replicateWithKeys("orders", Seq("o_orderkey"))

    // embeddings: disjoint vec_ids AND a per-copy orthogonal sign-flip
    // mask — byte-identical replicas would all land in the same LSH
    // bucket / IVF cell, making candidate generation quadratic in the
    // copy count. NOT a constant shift: adding c to every vector adds
    // c·Σh to every hyperplane projection, which dominates for large c
    // and collapses a whole copy into ONE bucket (measured: the sf1
    // bench hung on exactly that). Flipping a per-(copy, coordinate)
    // hash-selected sign subset is an isometry — cosine geometry and
    // bucket-occupancy statistics are preserved while every copy lands
    // in its own bucket pattern. Copy 0 keeps the original bytes (the
    // centroid oracle pins vec_id < 2000 to the untouched copy).
    {
      val base = spark.read.parquet(s"$srcDir/embeddings.parquet")
      val out = (0 until copies).map { i =>
        val reId = base.withColumn("vec_id", col("vec_id") + lit(i * keyOffset))
        if (i == 0) reId
        else reId.withColumn("embedding",
          transform(col("embedding"), (x, j) =>
            when(shiftright((j.cast("long") + lit(i * 13L)) * lit(2654435761L), 7) % 2 === 0,
              x).otherwise(-x)))
      }.reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
      println(s"[stress] embeddings x$copies (sign-masked) -> ${out.count()} rows")
    }

    // documents: disjoint doc_ids AND a per-copy token-surface tag —
    // byte-identical replicas would COLLAPSE in the chain's exact-dedup
    // stage (one survivor per copy set: the composed pipeline's cost
    // structure degenerates instead of scaling) and near-identical ones
    // would make near-dup candidate generation quadratic in the copy
    // count. Tagging every 3rd word with the copy index leaves NO
    // 3-token shingle (hence no 5-gram) shared across copies — cross-
    // copy Jaccard ~0, so dedup/decontam candidate structure stays
    // representative while doc and token mass scale by `copies`. The
    // keyOffset is a multiple of 10, so each copy keeps the fixture's
    // doc_id%10 train/bench partition. Copy 0 keeps the original bytes
    // (fixed-doc_id oracles pin it).
    {
      val base = spark.read.parquet(s"$srcDir/documents.parquet")
      val out = (0 until copies).map { i =>
        val reId = base.withColumn("doc_id", col("doc_id") + lit(i * keyOffset))
        if (i == 0) reId
        else reId.withColumn("text",
          array_join(transform(split(col("text"), " "), (w, j) =>
            when(j % 3 === 2, concat(w, lit(s"x$i"))).otherwise(w)), " "))
      }.reduce(_ union _)
      out.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
      println(s"[stress] documents x$copies (word-tagged) -> ${out.count()} rows")
    }

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "events")) {
      val src = Paths.get(s"$srcDir/$t.parquet")
      if (Files.exists(src)) {
        Files.copy(src, Paths.get(s"$outDir/$t.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        println(s"[stress] $t copied")
      }
    }
  }
}
