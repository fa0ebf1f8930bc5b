package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Ivf, Pipeline}

/** Embedding-route benchmark decontamination (r14): the paraphrase-
  * shaped leak the n-gram route can't see. The driver gate hash-checks
  * the exact report's scores (q_semantic_decontam); these specs pin
  * the semantics SQL doesn't reach: a PERTURBED (not identical)
  * benchmark vector is caught, orthogonal isn't, the bounds refuse
  * loudly, and the composed sweep retracts hits from every serving
  * sink with an idempotent re-sweep. */
class SemanticDecontamSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rmDir(d: String): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))

  private val vecSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def v(xs: Float*): scala.collection.mutable.ArraySeq[Float] =
    scala.collection.mutable.ArraySeq(xs: _*)

  test("paraphrase-shaped leak caught; orthogonal and anti-parallel not; refusals") {
    // corpus: two orthogonal docs; bench: a small rotation of doc 1
    // (cos ≈ 0.995), an orthogonal probe, and a NEGATED copy of doc 2
    // (cos = -1 — similarity, not distance: must NOT match)
    val corpus = df(vecSchema,
      Row(1L, v(1f, 0f, 0f, 0f)),
      Row(2L, v(0f, 1f, 0f, 0f)))
    val bench = df(StructType(Seq(StructField("bench_id", LongType),
        StructField("embedding", ArrayType(FloatType)))),
      Row(100L, v(0.995f, 0.0998f, 0f, 0f)),
      Row(101L, v(0f, 0f, 1f, 0f)),
      Row(102L, v(0f, -1f, 0f, 0f)))
    val rep = Dedup.semanticContaminationReport(corpus, "vec_id",
        "embedding", bench, "bench_id", "embedding", threshold = 0.9)
      .collect()
    assert(rep.length == 1)
    assert(rep.head.getLong(0) == 1L && rep.head.getLong(1) == 100L)
    assert(rep.head.getDouble(2) > 0.99)
    // decontaminate drops exactly the hit
    val clean = Dedup.semanticDecontaminate(corpus, "vec_id", "embedding",
      bench, "bench_id", "embedding", threshold = 0.9)
    assert(clean.select("vec_id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    // zero-norm vectors have no cosine and never match (no ANSI throw)
    val zcorp = df(vecSchema, Row(3L, v(0f, 0f, 0f, 0f)))
    assert(Dedup.semanticContaminationReport(zcorp, "vec_id", "embedding",
      bench, "bench_id", "embedding", 0.9).count() == 0)
    // refusals: oversized bench; degenerate threshold
    intercept[IllegalArgumentException] {
      Dedup.semanticContaminationReport(corpus, "vec_id", "embedding",
        bench, "bench_id", "embedding", 0.9, maxBench = 2)
    }
    intercept[IllegalArgumentException] {
      Dedup.semanticContaminationReport(corpus, "vec_id", "embedding",
        bench, "bench_id", "embedding", threshold = 0.0)
    }
  }

  test("IVF contamination screen: full probe equals the exact report; partial probe is a subset; cosine parity") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") < 400)
    val ivfDir = tmpDir("graft_scr_ivf")
    try {
      val cents = Ivf.train(corpus, "vec_id", "embedding", nCells = 4,
        iters = 0)
      Ivf.writeIndex(corpus, "vec_id", "embedding", cents, ivfDir)
      val bench = emb.filter(col("vec_id") % 83 === 2)
        .select((col("vec_id") + 7000).as("bench_id"), col("embedding"))
      val exact = Dedup.semanticContaminationReport(corpus, "vec_id",
          "embedding", bench, "bench_id", "embedding", 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(exact.nonEmpty)
      // nprobe == nCells: the screen EQUALS the exact report (scores too)
      val full = Ivf.semanticContaminationScreen(bench, "bench_id",
          "embedding", ivfDir, "vec_id", "embedding", 0.9, nprobe = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(full == exact, s"full-probe screen must equal exact:\n$full\n$exact")
      // partial probe: a strict-or-equal SUBSET — the priced recall trade
      val part = Ivf.semanticContaminationScreen(bench, "bench_id",
          "embedding", ivfDir, "vec_id", "embedding", 0.9, nprobe = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(part.subsetOf(exact))
      // an exact copy's own cell is always its nearest cell: nprobe=1
      // still finds every planted identity hit
      assert(part == exact,
        "identity hits live in the benchmark vector's own nearest cell")
      intercept[IllegalArgumentException] {
        Ivf.semanticContaminationScreen(bench, "bench_id", "embedding",
          ivfDir, "vec_id", "embedding", 0.0)
      }
    } finally rmDir(ivfDir)
  }

  test("unitVector: native one-pass form is bit-identical to the declarative chain") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // float input: every element of every unit vector matches exactly
    val diff = emb.select(
        graft.llm.Similarity.unitVector(col("embedding")).as("a"),
        graft.llm.Similarity.unitVectorDeclarative(col("embedding")).as("b"))
      .select(explode(arrays_zip(col("a"), col("b"))).as("z"))
      .filter(col("z.a") =!= col("z.b"))
    assert(diff.count() == 0, "native unit vector must equal the declarative form")
    // double input path and the zero-norm null contract
    val sch = StructType(Seq(StructField("id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val d = df(sch, Row(1L, Seq(3.0, 4.0)), Row(2L, Seq(0.0, 0.0)))
    val rows = d.select(col("id"),
        graft.llm.Similarity.unitVector(col("v")).as("u")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Double](1)))
      .toMap
    assert(rows(1L) == Seq(0.6, 0.8))
    assert(rows(2L) == null, "zero-norm vector has no direction")
    // a NULL ELEMENT yields null (typed outcome), never a runtime
    // crash from toDoubleArray on the hole (r14 advice)
    val holes = df(sch, Row(3L, Seq[Any](1.0, null, 2.0)),
      Row(4L, Seq[Any](3.0, 4.0)))
    val hs = holes.select(col("id"),
        graft.llm.Similarity.unitVector(col("v")).as("u")).collect()
      .map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(hs(3L), "null-element vector must map to null")
    assert(!hs(4L), "null-free vector unaffected by the guard")
  }

  test("semDeDupPairs: cluster-scoped candidates catch a paraphrase, drop keeps one per component") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    // plant a perturbed copy (paraphrase stand-in): vector 7 scaled by
    // 1.0f + tiny per-element nudge keeps cos ≈ 1 and the SAME nearest
    // centroid (identical direction), so the cluster route must pair it
    val planted = emb.filter(col("vec_id") === 7L)
      .select(lit(9007L).as("vec_id"),
        transform(col("embedding"), x => x * lit(1.001f)).as("embedding"))
    val ext = emb.unionByName(planted)
    // SemDeDup's normalized k-means: centroids trained on unit forms
    val cents = graft.llm.Ivf.train(
      ext.select(col("vec_id"),
        graft.llm.Similarity.unitVector(col("embedding")).as("embedding")),
      "vec_id", "embedding", nCells = 8, iters = 0)
    val pairs = graft.llm.Dedup.semDeDupPairs(ext, "vec_id", "embedding",
      cents, threshold = 0.95).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 7L && pairs.head.getLong(1) == 9007L)
    assert(pairs.head.getDouble(2) > 0.999)
    // drop keeps the min id of the component; docs without an
    // embedding row pass through untouched
    val docs = ext.select(col("vec_id").as("doc_id"))
      .unionByName(spark.range(1).select(lit(777777L).as("doc_id")))
    val kept = graft.llm.Dedup.dropSemanticDuplicatesClustered(docs,
      "doc_id", ext, "vec_id", "embedding", cents, threshold = 0.95)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!kept.contains(9007L) && kept.contains(7L))
    assert(kept.contains(777777L), "no-embedding doc must pass through")
    assert(kept.size == ext.count().toInt) // 501 survivors + sentinel - dropped copy
  }

  test("sweepBenchmarkSemantic: hits retract from every sink; re-sweep is a no-op") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") < 300)
    val idxDir = tmpDir("graft_semidx")
    val ivfDir = tmpDir("graft_semivf")
    val outDir = tmpDir("graft_semout")
    val qDir = tmpDir("graft_semq") + "/qcorp"
    try {
      Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding", 64,
        "semT", idxDir)
      val cents = Ivf.train(corpus, "vec_id", "embedding", nCells = 4,
        iters = 0)
      Ivf.writeIndex(corpus, "vec_id", "embedding", cents, ivfDir)
      val shard = emb.filter(col("vec_id") >= 300 && col("vec_id") < 350)
      Pipeline.ingestEmbeddingShard(shard, "vec_id", "embedding",
        dim = 64, threshold = 0.9, indexName = "semT", indexPath = idxDir,
        outPath = outDir, shardLabel = "s1", ivfPath = Some(ivfDir),
        quantizedPath = Some(qDir))
      // a benchmark released AFTER the landing: two landed vectors
      // verbatim (the paraphrase stand-in with cos = 1)
      val bench = emb.filter(col("vec_id").isin(310L, 340L))
        .select((col("vec_id") + 5000).as("bench_id"), col("embedding"))
      val (rep, removed) = Pipeline.sweepBenchmarkSemantic(spark, bench,
        "bench_id", "embedding", "vec_id", "embedding", "semT", outDir,
        threshold = 0.9, ivfPath = Some(ivfDir),
        quantizedPath = Some(qDir))
      val hitIds = rep.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(hitIds == Set(310L, 340L), s"hits: $hitIds")
      assert(removed("landing") == 2L, s"$removed")
      assert(removed("ivf") == 2L && removed("quantized") == 2L)
      // gone from every sink: landing read-back, vecs boundary, IVF
      assert(spark.read.parquet(outDir)
        .filter(col("vec_id").isin(310L, 340L)).count() == 0)
      assert(spark.table("semT_vecs")
        .filter(col("id").isin(310L, 340L)).count() == 0)
      assert(spark.read.parquet(s"${Ivf.resolveRoot(spark, ivfDir)}/vectors")
        .filter(col("vec_id").isin(310L, 340L)).count() == 0)
      // the report pinned BEFORE the rewrite (localCheckpoint):
      // still readable after the sweep rewrote its source
      assert(rep.count() == 2L)
      // idempotent: the swept corpus no longer matches the benchmark
      val (rep2, removed2) = Pipeline.sweepBenchmarkSemantic(spark, bench,
        "bench_id", "embedding", "vec_id", "embedding", "semT", outDir,
        threshold = 0.9, ivfPath = Some(ivfDir),
        quantizedPath = Some(qDir))
      assert(rep2.count() == 0L && removed2.isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS semT_vecs")
      Seq(idxDir, ivfDir, outDir,
        new java.io.File(qDir).getParent).foreach(rmDir)
    }
  }
}
