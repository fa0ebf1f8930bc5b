package graft

import org.apache.spark.sql.functions._

import graft.llm.{Pq, Similarity}

/** Product quantization (llm/Pq): codebook training, blockwise encode,
  * ADC search, persisted corpus, and the recall instrument. The
  * hash-level exactness is pinned by q_pq_topk / q_pq_recall; these
  * specs cover the properties an oracle can't: approximation quality on
  * clustered data, geometry guards, and path parity. */
class PqSpec extends SparkTestBase {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select("vec_id", "embedding").localCheckpoint(true)

  // clustered fixture: 20 centers, 3 tight members each (deterministic
  // ±2% per-element jitter) — the regime a real embedding corpus runs
  private lazy val clustered = {
    val centers = emb.filter(col("vec_id") % 25 === 0)
    val members = centers.crossJoin(
        spark.range(1, 4).select(col("id").as("r")))
      .select((col("vec_id") * 10 + 2000000 + col("r")).as("vec_id"),
        transform(sequence(lit(0), lit(63)), i =>
          (col("embedding").getItem(i).cast("double") *
            (lit(1.0) + pmod((col("vec_id") * 10 + col("r")) * 64 + i, lit(101))
              .cast("double").minus(50.0) / 2500.0)).cast("float"))
          .as("embedding"))
    emb.unionByName(members).localCheckpoint(true)
  }

  test("encode: m codes per vector, all in range, deterministic") {
    val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, codes = 16, iters = 1).localCheckpoint(true)
    assert(cbs.count() == 8 * 16, "8 subspaces x 16 codes")
    val enc = Pq.encode(emb, "vec_id", "embedding", cbs, 64, 8)
    val rows = enc.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = r.getAs[scala.collection.Seq[Int]]("codes")
      assert(cs.size == 8, s"expected 8 codes, got ${cs.size}")
      assert(cs.forall(c => c >= 0 && c < 16), s"code out of range: $cs")
    }
    val again = Pq.encode(emb, "vec_id", "embedding", cbs, 64, 8)
      .collect().map(_.toString).sorted
    assert(rows.map(_.toString).sorted.sameElements(again),
      "encode must be deterministic")
  }

  test("clustered corpus: ADC top-k finds the planted neighbors (recall >= 0.5 where iid scores ~0.15)") {
    val cbs = Pq.trainCodebooks(clustered, "vec_id", "embedding",
      dim = 64, m = 8, codes = 16, iters = 2, trainFraction = 1.0)
      .localCheckpoint(true)
    val queries = emb.filter(col("vec_id") % 25 === 0)
      .select("vec_id", "embedding")
    val recall = Pq.recallReport(clustered, queries, "vec_id",
        "embedding", "vec_id", "embedding", cbs, dim = 64, m = 8, k = 3)
      .select("mean_recall").distinct().collect().head.getDouble(0)
    assert(recall >= 0.5,
      s"planted ±2% members must dominate ADC top-3 (recall=$recall)")
  }

  test("persisted corpus: indexed search matches in-memory; geometry mismatch throws") {
    val dir = tmpDir("graft_pq")
    try {
      val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
        m = 8, codes = 16, iters = 1).localCheckpoint(true)
      val enc = Pq.encode(emb, "vec_id", "embedding", cbs, 64, 8)
      Pq.writePqCorpus(enc, cbs, dir, dim = 64, m = 8)
      val q = emb.filter(col("vec_id") === 3L)
        .select(col("embedding").as("qv"))
      val mem = Pq.annTopKPq(enc, "vec_id", cbs, q, 64, 8, 10)
        .collect().map(_.toString)
      val idx = Pq.annTopKPqIndexed(spark, dir, "vec_id", q, 10)
        .collect().map(_.toString)
      assert(mem.sameElements(idx),
        "persisted-corpus search must equal the in-memory path")
      val ex = intercept[IllegalArgumentException] {
        Pq.annTopKPqIndexed(spark, dir, "vec_id", q, 10,
          expectDim = Some(128))
      }
      assert(ex.getMessage.contains("dim=64"),
        s"geometry mismatch must throw, got: ${ex.getMessage}")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("IVF+PQ: probe scan reads exactly nprobe cell dirs; rank equals ADC restricted to probe cells") {
    val dir = tmpDir("graft_ivfpq")
    try {
      val cents = graft.llm.Ivf.train(emb, "vec_id", "embedding",
        nCells = 4, iters = 1)
      val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
        m = 8, codes = 16, iters = 1).localCheckpoint(true)
      Pq.writeIvfPqCorpus(emb, "vec_id", "embedding", cents, cbs, dir,
        dim = 64, m = 8)
      val q = emb.filter(col("vec_id") === 7L)
        .select(col("embedding").as("qv"))
      val nprobe = 2
      val res = Pq.annTopKIvfPq(spark, dir, "vec_id", q, k = 10,
        nprobe = nprobe)
      val scans = res.queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.partitionFilters.exists(_.references.exists(_.name == "cell")) => s
      }
      assert(scans.nonEmpty, "no scan with a partition filter on cell")
      val dirsRead = scans.head.relation.location
        .listFiles(scans.head.partitionFilters, scans.head.dataFilters).length
      assert(dirsRead == nprobe, s"probe scan read $dirsRead cell dirs")

      // parity: same rank as flat ADC restricted to the probe-cell members
      val assigned = graft.llm.Ivf.assign(emb, "vec_id", "embedding", cents)
      val probeCells = cents
        .crossJoin(broadcast(q.select(col("qv").cast("array<double>").as("__qv__"))))
        .withColumn("__d__",
          aggregate(zip_with(col("centroid"), col("__qv__"),
            (x, y) => (x - y) * (x - y)), lit(0.0), (a, v) => a + v))
        .orderBy(col("__d__").asc, col("cell").asc).limit(nprobe)
        .select("cell").collect().map(_.getInt(0)).toSeq
      val flat = Pq.annTopKPq(
        Pq.encode(assigned.filter(col("cell").isin(probeCells: _*)),
          "vec_id", "embedding", cbs, 64, 8),
        "vec_id", cbs, q, 64, 8, 10).collect().map(_.toString)
      assert(res.collect().map(_.toString).sameElements(flat),
        "persisted IVF+PQ rank must equal flat ADC over the probe cells")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("PQ corpus maintenance: replay-safe append, online compaction, retraction") {
    val dir = tmpDir("graft_pqmaint")
    try {
      val corpus = emb.filter(col("vec_id") < 400)
      val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
        nCells = 4, iters = 0)
      val cbs = Pq.trainCodebooks(corpus, "vec_id", "embedding", dim = 64,
        m = 8, codes = 16, iters = 0).localCheckpoint(true)
      Pq.writeIvfPqCorpus(corpus, "vec_id", "embedding", cents, cbs, dir,
        dim = 64, m = 8)
      Pq.buildIdBlooms(spark, dir, "vec_id", nBlooms = 8)

      // replay-safe append: fresh shard lands once, replay adds nothing
      val shard = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      Pq.appendToPqCorpus(shard, "vec_id", "embedding", dir)
      Pq.appendToPqCorpus(shard, "vec_id", "embedding", dir)
      def enc() = spark.read.parquet(
        s"${Pq.resolveRoot(spark, dir)}/encoded")
      assert(enc().count() == 450 &&
        enc().select("vec_id").distinct().count() == 450,
        "replayed append must not duplicate ids")

      val q = emb.filter(col("vec_id") === 7L)
        .select(col("embedding").as("qv"))
      val before = Pq.annTopKIvfPq(spark, dir, "vec_id", q, k = 10)
        .collect().map(_.toString)

      // online compaction: probe planned pre-flip runs post-flip,
      // results identical, files per cell -> 1
      val held = Pq.annTopKIvfPq(spark, dir, "vec_id", q, k = 10)
      Pq.compactPqCorpus(spark, dir)
      assert(held.collect().map(_.toString).sameElements(before),
        "probe planned pre-flip must still run post-flip")
      assert(Pq.annTopKIvfPq(spark, dir, "vec_id", q, k = 10)
        .collect().map(_.toString).sameElements(before),
        "compaction changed search results")
      val cells = new java.io.File(
        s"${Pq.resolveRoot(spark, dir)}/encoded").listFiles()
        .filter(_.getName.startsWith("cell="))
      assert(cells.nonEmpty && cells.forall(
        _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
        "compaction must leave one file per cell")

      // retraction: ids gone everywhere, stale bloom positive verified,
      // re-append lands again
      val idsSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType)))
      val (b, a) = Pq.retractFromPqCorpus(spark, dir,
        df(idsSchema, org.apache.spark.sql.Row(405L)), "vec_id")
      assert(b == 450 && a == 449, s"retraction removed ${b - a} rows")
      assert(enc().filter(col("vec_id") === 405L).count() == 0)
      Pq.appendToPqCorpus(shard.filter(col("vec_id") === 405L),
        "vec_id", "embedding", dir)
      assert(enc().filter(col("vec_id") === 405L).count() == 1,
        "retracted id must land again through the stale-positive verify")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("streaming ADC retrieval: per-micro-batch top-k, batch parity, mid-stream compaction picked up") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = tmpDir("graft_pqserve")
    val corpusDir = s"$base/corpus"
    val outDir = s"$base/out"
    try {
      val corpus = emb.filter(col("vec_id") < 300)
      val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
        nCells = 4, iters = 0)
      val cbs = Pq.trainCodebooks(corpus, "vec_id", "embedding", dim = 64,
        m = 8, codes = 16, iters = 0).localCheckpoint(true)
      Pq.writeIvfPqCorpus(corpus, "vec_id", "embedding", cents, cbs,
        corpusDir, dim = 64, m = 8)
      def qvec(id: Long): Seq[Float] = emb.filter(col("vec_id") === id)
        .select("embedding").collect().head.getSeq[Float](0)
      val in = MemoryStream[(Long, Seq[Float])]
      val q = graft.streaming.Streams.annTopKPqStream(
        in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        corpusDir, "vec_id", k = 3,
        outPath = outDir, checkpoint = s"$base/ckpt").start()
      try {
        in.addData((9000L, qvec(0L)), (9001L, qvec(50L)))
        q.processAllAvailable()
        // online compaction between micro-batches: the serving loop
        // re-resolves the live generation at the next trigger
        Pq.compactPqCorpus(spark, corpusDir)
        in.addData((9002L, qvec(100L)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(outDir)
        .select("query_id", "vec_id", "cos_adc")
        .collect().map(_.toString).sorted.toSeq
      val expect = Pq.annTopKPqIndexedBatch(spark, corpusDir, "vec_id",
          emb.filter(col("vec_id") === 0L).select(lit(9000L).as("vec_id"), col("embedding"))
            .unionByName(emb.filter(col("vec_id") === 50L).select(lit(9001L).as("vec_id"), col("embedding")))
            .unionByName(emb.filter(col("vec_id") === 100L).select(lit(9002L).as("vec_id"), col("embedding"))),
          "vec_id", "embedding", k = 3)
        .select("query_id", "vec_id", "cos_adc")
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == expect,
        s"stream results must match the batch path: $got vs $expect")
      assert(new java.io.File(outDir).listFiles()
        .count(_.getName.startsWith("batch_id=")) == 2,
        "each micro-batch must land its own overwrite-able partition")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("residual codes: hits at least match plain codes on the clustered fixture; flat serving refuses residual corpora") {
    val plainDir = tmpDir("graft_pqplain")
    val resDir = tmpDir("graft_pqres")
    try {
      val cents = graft.llm.Ivf.train(clustered, "vec_id", "embedding",
        nCells = 4, iters = 1)
      val cbs = Pq.trainCodebooks(clustered, "vec_id", "embedding",
        dim = 64, m = 8, codes = 16, iters = 1, trainFraction = 1.0)
        .localCheckpoint(true)
      val cbr = Pq.trainResidualCodebooks(clustered, "vec_id",
        "embedding", cents, dim = 64, m = 8, codes = 16, iters = 1,
        trainFraction = 1.0).localCheckpoint(true)
      Pq.writeIvfPqCorpus(clustered, "vec_id", "embedding", cents, cbs,
        plainDir, dim = 64, m = 8)
      Pq.writeIvfPqCorpus(clustered, "vec_id", "embedding", cents, cbr,
        resDir, dim = 64, m = 8, residual = true)

      // exact top-3 of each center query are its planted members; count
      // how many each encoding surfaces at nprobe=all (isolates code
      // quality from probe misses). k = 4 on the approximate side: the
      // query vector itself is IN the corpus and ranks first, so top-4
      // minus the self-match leaves 3 reachable slots — the full
      // denominator (k = 3 would cap every query at 2/3)
      val centers = emb.filter(col("vec_id") % 25 === 0)
        .select("vec_id").collect().map(_.getLong(0)).take(10)
      def hits(dir: String): Int = centers.map { qid =>
        val q = emb.filter(col("vec_id") === qid)
          .select(col("embedding").as("qv"))
        val exact = graft.llm.Similarity.bruteForceTopK(clustered,
            "vec_id", "embedding", queryId = qid, k = 3)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        val approx = Pq.annTopKIvfPq(spark, dir, "vec_id", q, k = 4,
            nprobe = 4)
          .filter(col("vec_id") =!= qid)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (exact & approx).size
      }.sum
      val plainHits = hits(plainDir)
      val resHits = hits(resDir)
      assert(resHits >= plainHits,
        s"residual codes must not lose rank quality (plain=$plainHits, " +
          s"residual=$resHits of ${centers.length * 3})")
      assert(resHits >= centers.length * 3 / 2,
        s"residual encoding must surface most planted members ($resHits)")

      // flat entrypoints refuse residual corpora loudly
      val q0 = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").as("qv"))
      val ex = intercept[IllegalArgumentException] {
        Pq.annTopKPqIndexed(spark, resDir, "vec_id", q0, 5)
      }
      assert(ex.getMessage.contains("RESIDUAL"),
        s"flat serving must refuse residual codes: ${ex.getMessage}")

      // append composes with residual corpora (encode path shared)
      val extra = emb.filter(col("vec_id") >= 490 && col("vec_id") < 495)
        .withColumn("vec_id", col("vec_id") + 5000000L)
      Pq.appendToPqCorpus(extra, "vec_id", "embedding", resDir)
      val enc = spark.read.parquet(
        s"${Pq.resolveRoot(spark, resDir)}/encoded")
      assert(enc.filter(col("vec_id") >= 5000000L).count() == 5,
        "append must land residual-encoded rows")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(plainDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(resDir))
    }
  }

  test("batched IVF+PQ agrees with per-query serving on plain AND residual corpora") {
    val plainDir = tmpDir("graft_ivfpqb")
    val resDir = tmpDir("graft_ivfpqbr")
    try {
      val cents = graft.llm.Ivf.train(emb, "vec_id", "embedding",
        nCells = 4, iters = 0)
      val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
        m = 8, codes = 16, iters = 0).localCheckpoint(true)
      val cbr = Pq.trainResidualCodebooks(emb, "vec_id", "embedding",
        cents, dim = 64, m = 8, codes = 16, iters = 0)
        .localCheckpoint(true)
      Pq.writeIvfPqCorpus(emb, "vec_id", "embedding", cents, cbs,
        plainDir, dim = 64, m = 8)
      Pq.writeIvfPqCorpus(emb, "vec_id", "embedding", cents, cbr,
        resDir, dim = 64, m = 8, residual = true)
      // query ids OUTSIDE the corpus so self-exclusion (batch-only)
      // cannot skew the comparison
      val qids = Seq(3L, 150L, 420L)
      val queries = qids.zipWithIndex.map { case (src, i) =>
        emb.filter(col("vec_id") === src)
          .select(lit(9000L + i).as("vec_id"), col("embedding"))
      }.reduce(_.unionByName(_))
      for (dir <- Seq(plainDir, resDir)) {
        val batch = Pq.annTopKIvfPqBatch(spark, dir, "vec_id", queries,
            "vec_id", "embedding", k = 5, nprobe = 2)
          .collect().groupBy(_.getLong(0))
          .map { case (q, rows) => q -> rows.map(r =>
            (r.getLong(1), r.getDouble(2))).sortBy(-_._2).toSeq }
        qids.zipWithIndex.foreach { case (src, i) =>
          val single = Pq.annTopKIvfPq(spark, dir, "vec_id",
              emb.filter(col("vec_id") === src)
                .select(col("embedding").as("qv")), k = 5, nprobe = 2)
            .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
          assert(batch(9000L + i) == single,
            s"batch must equal per-query serving ($dir, query $src): " +
              s"${batch(9000L + i)} vs $single")
        }
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(plainDir))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(resDir))
    }
  }

  test("embedding ingest keeps the PQ serving copy in lockstep; retraction clears it") {
    val idx = tmpDir("graft_pql")
    val out = tmpDir("graft_pql_out")
    val pqDir = tmpDir("graft_pql_pq")
    try {
      val corpus = emb.filter(col("vec_id") < 300)
      val shard = emb.filter(col("vec_id") >= 300 && col("vec_id") < 350)
        .localCheckpoint(true)
      graft.llm.Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding",
        64, "pql_t", idx)
      val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
        nCells = 4, iters = 0)
      val cbs = Pq.trainCodebooks(corpus, "vec_id", "embedding", dim = 64,
        m = 8, codes = 16, iters = 0).localCheckpoint(true)
      Pq.writeIvfPqCorpus(corpus, "vec_id", "embedding", cents, cbs,
        pqDir, dim = 64, m = 8)

      def pqIds() = spark.read.parquet(
        s"${Pq.resolveRoot(spark, pqDir)}/encoded").select("vec_id")
      val counts = graft.llm.Pipeline.ingestEmbeddingShard(shard,
        "vec_id", "embedding", dim = 64, threshold = 0.9,
        indexName = "pql_t", indexPath = idx, outPath = out,
        shardLabel = "d1", pqPath = Some(pqDir))
      assert(counts("landed") == 50L, s"$counts")
      assert(pqIds().count() == 350 && pqIds().distinct().count() == 350,
        "PQ corpus must grow in lockstep with the ingest")

      // same-label replay is the O(1) manifest path; a new-label replay
      // drops at the gate AND the PQ append's own id guard holds
      graft.llm.Pipeline.ingestEmbeddingShard(shard, "vec_id",
        "embedding", dim = 64, threshold = 0.9, indexName = "pql_t",
        indexPath = idx, outPath = out, shardLabel = "d1",
        pqPath = Some(pqDir))
      val counts2 = graft.llm.Pipeline.ingestEmbeddingShard(shard,
        "vec_id", "embedding", dim = 64, threshold = 0.9,
        indexName = "pql_t", indexPath = idx, outPath = out,
        shardLabel = "d2", pqPath = Some(pqDir))
      assert(counts2("landed") == 0L, s"$counts2")
      assert(pqIds().count() == 350, "replays must not grow the PQ corpus")

      // retraction reaches the PQ sink like every other
      val idsSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id",
          org.apache.spark.sql.types.LongType)))
      val removed = graft.llm.Pipeline.retractEmbeddings(spark,
        df(idsSchema, org.apache.spark.sql.Row(310L)), "vec_id",
        "pql_t", out, pqPath = Some(pqDir))
      assert(removed("pq") == 1L, s"$removed")
      assert(pqIds().filter(col("vec_id") === 310L).count() == 0,
        "retracted id must leave the PQ corpus")
    } finally {
      spark.sql("DROP TABLE IF EXISTS pql_t_vecs")
      Seq(idx, out, pqDir).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("streaming IVF+PQ retrieval: batch parity on a RESIDUAL corpus, mid-stream compaction picked up") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = tmpDir("graft_ivfpqserve")
    val corpusDir = s"$base/corpus"
    val outDir = s"$base/out"
    try {
      val corpus = emb.filter(col("vec_id") < 300)
      val cents = graft.llm.Ivf.train(corpus, "vec_id", "embedding",
        nCells = 4, iters = 0)
      val cbr = Pq.trainResidualCodebooks(corpus, "vec_id", "embedding",
        cents, dim = 64, m = 8, codes = 16, iters = 0)
        .localCheckpoint(true)
      Pq.writeIvfPqCorpus(corpus, "vec_id", "embedding", cents, cbr,
        corpusDir, dim = 64, m = 8, residual = true)
      def qvec(id: Long): Seq[Float] = emb.filter(col("vec_id") === id)
        .select("embedding").collect().head.getSeq[Float](0)
      val in = MemoryStream[(Long, Seq[Float])]
      val q = graft.streaming.Streams.annTopKIvfPqStream(
        in.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        corpusDir, "vec_id", k = 3,
        outPath = outDir, checkpoint = s"$base/ckpt").start()
      try {
        in.addData((9000L, qvec(0L)), (9001L, qvec(50L)))
        q.processAllAvailable()
        Pq.compactPqCorpus(spark, corpusDir)
        in.addData((9002L, qvec(100L)))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(outDir)
        .select("query_id", "vec_id", "cos_adc")
        .collect().map(_.toString).sorted.toSeq
      val expect = Pq.annTopKIvfPqBatch(spark, corpusDir, "vec_id",
          emb.filter(col("vec_id") === 0L).select(lit(9000L).as("vec_id"), col("embedding"))
            .unionByName(emb.filter(col("vec_id") === 50L).select(lit(9001L).as("vec_id"), col("embedding")))
            .unionByName(emb.filter(col("vec_id") === 100L).select(lit(9002L).as("vec_id"), col("embedding"))),
          "vec_id", "embedding", k = 3)
        .select("query_id", "vec_id", "cos_adc")
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == expect,
        s"stream must match the batch path on the residual corpus: " +
          s"$got vs $expect")
      assert(new java.io.File(outDir).listFiles()
        .count(_.getName.startsWith("batch_id=")) == 2,
        "each micro-batch must land its own overwrite-able partition")
    } finally
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("single-query and batched ADC agree") {
    val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, codes = 16, iters = 0).localCheckpoint(true)
    val enc = Pq.encode(emb, "vec_id", "embedding", cbs, 64, 8)
      .localCheckpoint(true)
    val qid = 50L
    val single = Pq.annTopKPq(enc.filter(col("vec_id") =!= qid),
        "vec_id", cbs,
        emb.filter(col("vec_id") === qid).select(col("embedding").as("qv")),
        64, 8, 10)
      .select("vec_id", "cos_adc").collect().map(_.toString)
    val batch = Pq.annTopKPqBatch(enc, "vec_id", cbs,
        emb.filter(col("vec_id") === qid).select("vec_id", "embedding"),
        "vec_id", "embedding", 64, 8, 10)
      .select("vec_id", "cos_adc").collect().map(_.toString)
    assert(single.sameElements(batch),
      "batched ADC must reproduce the single-query ranking")
  }

  test("batched serving refuses an over-cap query frame loudly (qCap contract)") {
    // r11 verdict #3: the per-query LUT broadcast is Q*m*codes doubles;
    // an unbounded Q must fail at the entrypoint with a message naming
    // the chunked/streaming alternative, not deep inside Spark's
    // broadcast machinery.
    val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, codes = 16, iters = 0).localCheckpoint(true)
    val enc = Pq.encode(emb, "vec_id", "embedding", cbs, 64, 8)
    val queries = emb.select("vec_id", "embedding") // 200 rows
    val e1 = intercept[IllegalArgumentException] {
      Pq.annTopKPqBatch(enc, "vec_id", cbs, queries,
        "vec_id", "embedding", 64, 8, 3, qCap = 100)
    }
    assert(e1.getMessage.contains("qCap") &&
      e1.getMessage.contains("Chunk"), e1.getMessage)
    // under the cap: unchanged behavior
    assert(Pq.annTopKPqBatch(enc, "vec_id", cbs, queries.limit(5),
      "vec_id", "embedding", 64, 8, 3, qCap = 100).count() == 15)
    val tmp = tmpDir("graft_pq_qcap")
    try {
      val cents = graft.llm.Ivf.train(emb, "vec_id", "embedding",
        nCells = 4, iters = 0)
      Pq.writeIvfPqCorpus(emb, "vec_id", "embedding", cents, cbs, tmp,
        64, 8)
      val e2 = intercept[IllegalArgumentException] {
        Pq.annTopKIvfPqBatch(spark, tmp, "vec_id", queries, "vec_id",
          "embedding", 3, nprobe = 2, qCap = 100)
      }
      assert(e2.getMessage.contains("annTopKIvfPqBatch"), e2.getMessage)
      // the chunked form the error message names: exact parity with the
      // over-cap-refused one-shot (run under a permissive cap), because
      // scores and per-query top-k are independent across queries
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getDouble(2))
      val oneShot = Pq.annTopKIvfPqBatch(spark, tmp, "vec_id", queries,
        "vec_id", "embedding", 3, nprobe = 2, qCap = 100000)
        .collect().map(key).toSet
      val chunkedRes = Pq.annTopKIvfPqBatchChunked(spark, tmp, "vec_id",
        queries, "vec_id", "embedding", 3, nprobe = 2, qCap = 40)
        .collect().map(key).toSet
      assert(chunkedRes == oneShot,
        s"chunked serving must reproduce the one-shot batch exactly " +
          s"(${chunkedRes.size} vs ${oneShot.size} rows)")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("chunked serving scans the query SOURCE at most twice, whatever the chunk count") {
    // r12 ADVICE / r12-verdict efficiency note: the previous serveChunked
    // filtered the original frame per chunk — an over-cap serve ran n
    // full scans of the query source plus a bounded probe each. The
    // single-pass shape (one count + one chunk-id materialization via
    // localCheckpoint) must leave at most TWO executions that touch the
    // query parquet; every per-chunk filter and cap probe reads
    // checkpoint blocks.
    val cbs = Pq.trainCodebooks(emb, "vec_id", "embedding", dim = 64,
      m = 8, codes = 16, iters = 0).localCheckpoint(true)
    val enc = Pq.encode(emb, "vec_id", "embedding", cbs, 64, 8)
    val tmp = tmpDir("graft_pq_chunkscan")
    try {
      Pq.writePqCorpus(enc, cbs, s"$tmp/corpus", 64, 8)
      emb.select("vec_id", "embedding").write.mode("overwrite")
        .parquet(s"$tmp/queries_src")
      val queries = spark.read.parquet(s"$tmp/queries_src")
      val sourceScans = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = {
          val hits = qe.executedPlan.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec
              if s.relation.location.rootPaths
                .exists(_.toString.contains("queries_src")) => s
          }
          if (hits.nonEmpty) sourceScans.incrementAndGet()
        }
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      try {
        // Q queries at qCap=40 -> ceil(Q/20) chunks (Q = 500 at sf0.001)
        val res = Pq.annTopKPqIndexedBatchChunked(spark, s"$tmp/corpus",
          "vec_id", queries, "vec_id", "embedding", k = 3, qCap = 40)
        assert(res.select("query_id").distinct().count() == emb.count())
        var last = -1; var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val n = sourceScans.get()
          if (n == last) stable += 1 else { stable = 0; last = n }
        }
      } finally spark.listenerManager.unregister(listener)
      assert(sourceScans.get() <= 2,
        s"query source scanned ${sourceScans.get()} times; the chunked " +
          "serve must materialize the chunk id once and read blocks")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }
}
