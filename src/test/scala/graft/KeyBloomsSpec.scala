package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.llm.{Dedup, KeyBlooms, Pipeline}

/** Bloom-sidecar exact gate (llm/KeyBlooms + Dedup.dropExactAgainstIndexBloom):
  * identical output to the plain keys-boundary anti-join, but the corpus
  * touch is O(suspects) — bloom-negative shard keys never read the keys
  * table at all, and the suspects resolve through a bucket-pruned
  * IN-literal probe. */
class KeyBloomsSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dropIndex(name: String): Unit =
    Seq("bands", "shingles", "keys").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s"))

  private def corpus300 =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 300)

  private def keysScans(df: org.apache.spark.sql.DataFrame, path: String) =
    df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.contains(path)) => s
    }

  test("bloom gate: parity with the plain boundary join; dup-free shard plans zero keys-table IO") {
    val tmp = tmpDir("graft_blm")
    try {
      val corpus = corpus300
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "blm_t", tmp)
      KeyBlooms.build(spark, "blm_t", tmp, nBlooms = 8)

      val corpusText = corpus.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val newText1 = "quasar meridian oblong tapestry verdant kiln " +
        "sombrero glacier pivot lighthouse"
      val newText2 = "seventeen lanterns drifted over the quiet harbor " +
        "while fishermen mended copper nets"
      val shard = df(docSchema,
        Row(90001L, newText1),
        Row(90002L, "  " + corpusText + "  "), // exact dup (canonical key)
        Row(90003L, newText2))

      val bloomed = Dedup.dropExactAgainstIndexBloom(shard, "doc_id",
        "text", "blm_t", tmp)
      val plain = Dedup.dropExactAgainstIndex(shard, "doc_id", "text",
        "blm_t")
      assert(bloomed.select("doc_id").collect().map(_.getLong(0)).sorted
        .sameElements(plain.select("doc_id").collect().map(_.getLong(0)).sorted),
        "bloom gate must return exactly the plain boundary-join survivors")
      assert(bloomed.columns.toSeq == shard.columns.toSeq,
        "gate must preserve the shard's schema")

      // the suspect probe is BUCKET-PRUNED: the one true-dup key selects
      // at most a couple of the 8 key buckets (fpp can add a bucket, not
      // restore the full set)
      val probeScans = keysScans(bloomed, tmp)
      assert(probeScans.nonEmpty, "inline path must probe the keys table")
      probeScans.foreach { s =>
        val selected = s.optionalBucketSet
        assert(selected.isDefined && selected.get.cardinality() < 8,
          s"IN-literal probe must bucket-prune the keys scan " +
            s"(selected=${selected.map(_.cardinality())})")
      }

      // a shard with NO corpus content plans no keys-table scan at all —
      // the 100 TB property: zero corpus IO on the common path
      val fresh = df(docSchema,
        Row(91001L, "painted turtles idle beneath the willow shade " +
          "counting slow ripples of a summer creek"))
      val out = Dedup.dropExactAgainstIndexBloom(fresh, "doc_id", "text",
        "blm_t", tmp)
      assert(out.count() == 1)
      assert(keysScans(out, tmp).isEmpty,
        "bloom-negative shard must never touch the keys table")
    } finally {
      dropIndex("blm_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("appendShardToIndex grows the sidecar: a later shard's resubmission is caught through the blooms") {
    val tmp = tmpDir("graft_blm2")
    try {
      val corpus = corpus300
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "blm2_t", tmp)
      KeyBlooms.build(spark, "blm2_t", tmp, nBlooms = 8)
      val before = KeyBlooms.report(spark, tmp)
        .select("total_keys").collect().head.getLong(0)

      val bench = df(docSchema)
      val novel = "umbrella cartographers sketched nine impossible " +
        "coastlines before breakfast ended quietly"
      val s1 = Pipeline.ingestShardFrame(df(docSchema, Row(10L, novel)),
        bench, "doc_id", "text", "blm2_t", tmp)
      assert(s1.count() == 1)
      s1.unpersist()
      assert(KeyBlooms.report(spark, tmp)
        .select("total_keys").collect().head.getLong(0) == before + 1,
        "append must grow the sidecar's key count")

      // the resubmission must drop, and through the BLOOM path: the
      // executed gate bucket-prunes its keys probe (evidence the bloom
      // variant ran, not the full-scan fallback)
      val resub = df(docSchema, Row(20L, novel))
      val gate = Dedup.dropExactAgainstIndexBloom(resub, "doc_id", "text",
        "blm2_t", tmp)
      assert(gate.count() == 0,
        "a key appended after the bloom build must still be bloom-positive")
      val s2 = Pipeline.ingestShardFrame(resub, bench, "doc_id", "text",
        "blm2_t", tmp)
      assert(s2.count() == 0, "pipeline must route through the grown blooms")
      s2.unpersist()
    } finally {
      dropIndex("blm2_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("missing sidecar fails loudly; suspectCap=0 falls back to the plain join with identical output") {
    val tmp = tmpDir("graft_blm3")
    try {
      val corpus = corpus300
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "blm3_t", tmp)
      val shard = df(docSchema, Row(1L, "any text at all here"))
      val ex = intercept[IllegalArgumentException] {
        Dedup.dropExactAgainstIndexBloom(shard, "doc_id", "text",
          "blm3_t", tmp).count()
      }
      assert(ex.getMessage.contains("Bloom sidecar"),
        s"absence must fail loudly, got: ${ex.getMessage}")

      KeyBlooms.build(spark, "blm3_t", tmp, nBlooms = 8)
      val corpusText = corpus.filter(col("doc_id") === 11)
        .select("text").collect().head.getString(0)
      val mixed = df(docSchema,
        Row(1L, corpusText),
        Row(2L, "entirely novel content about migrating cranes over salt flats"))
      val capped = Dedup.dropExactAgainstIndexBloom(mixed, "doc_id", "text",
        "blm3_t", tmp, suspectCap = 0)
      val plain = Dedup.dropExactAgainstIndex(mixed, "doc_id", "text",
        "blm3_t")
      assert(capped.select("doc_id").collect().map(_.getLong(0)).sorted
        .sameElements(plain.select("doc_id").collect().map(_.getLong(0)).sorted),
        "over-cap fallback must equal the plain boundary join")
    } finally {
      dropIndex("blm3_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  private def watchScans(needle: String)(body: => Unit): Seq[String] = {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = {
        val hits = qe.executedPlan.collect {
          case s: FileSourceScanExec if s.relation.location.rootPaths
            .exists(_.toString.contains(needle)) => s
        }
        if (hits.nonEmpty) offenders.synchronized { offenders += funcName }
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      body
      var last = -1; var stable = 0
      while (stable < 3) {
        Thread.sleep(200)
        val n = offenders.synchronized(offenders.size)
        if (n == last) stable += 1 else { stable = 0; last = n }
      }
    } finally spark.listenerManager.unregister(listener)
    offenders.synchronized(offenders.toList)
  }

  test("id-blooms, text ingest: an all-new day never reads the keys table; a bloom-positive replay still skips") {
    val tmp = tmpDir("graft_blm5")
    val out = tmpDir("graft_blm5_out")
    try {
      val corpus = corpus300
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "blm5_t", tmp)
      KeyBlooms.build(spark, "blm5_t", tmp, nBlooms = 8)
      Dedup.buildIdBlooms(spark, "blm5_t", tmp, nBlooms = 8)

      val novel1 = "meteor showers catalogued by patient amateurs " +
        "rewrote the comet tables twice this decade"
      val novel2 = "brass kettles whistle differently at altitude " +
        "said the mountain innkeeper with certainty"
      val shard = df(docSchema, Row(50001L, novel1), Row(50002L, novel2))
      val bench = df(docSchema)

      // BOTH sidecars present: the steady-state day's ingest — content
      // gate AND suspects snapshot — must plan ZERO reads of the keys
      // directory (writes/appends don't scan)
      var counts: Map[String, Long] = Map.empty
      val offenders = watchScans(s"$tmp/keys") {
        counts = Pipeline.ingestShard(shard, bench, "doc_id", "text",
          "blm5_t", tmp, out, "d1")
      }
      assert(counts("landed") == 2L, s"fresh shard must land: $counts")
      assert(offenders.isEmpty,
        s"all-new day must never read the keys table, but these actions " +
          s"did: $offenders")

      // same ids + content under a NEW label: ids are bloom-positive
      // (the sidecar grew with the append), the verify finds them landed
      // under d1, and nothing lands twice
      val counts2 = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "blm5_t", tmp, out, "d2")
      assert(counts2("landed") == 0L,
        s"resubmission under a new label must not re-land: $counts2")
      val landed = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(landed.sameElements(Array(50001L, 50002L)),
        s"landing must hold each doc exactly once: ${landed.toList}")
    } finally {
      dropIndex("blm5_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("id-blooms, embedding ingest: the vecs table is read once (the dedup join), not twice; replay still drops") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") < 400)
    val shard = emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)
      .localCheckpoint(true)
    val idx = tmpDir("graft_blm6")
    val out = tmpDir("graft_blm6_out")
    try {
      Dedup.writeEmbeddingIndex(corpus, "vec_id", "embedding", 64,
        "blm6_t", idx)
      Dedup.buildEmbedIdBlooms(spark, "blm6_t", idx, nBlooms = 8)

      // the steady-state decision itself: every fresh id is
      // bloom-negative, so the pipeline's suspects snapshot is the
      // empty frame BY CONSTRUCTION — the vecs id-column scan the
      // no-sidecar path pays is never planned (the scan itself runs
      // inside a localCheckpoint evaluation, which QueryExecution
      // listeners cannot observe — assert the decision, not the plan)
      assert(KeyBlooms.suspects(shard.select(col("vec_id").as("key")),
          idx, "idblooms").count() == 0,
        "fresh ids must all be bloom-negative")
      val counts = Pipeline.ingestEmbeddingShard(shard, "vec_id",
        "embedding", dim = 64, threshold = 0.9, indexName = "blm6_t",
        indexPath = idx, outPath = out, shardLabel = "d1")
      assert(counts("landed") == 50L, s"fresh shard must land: $counts")

      // replayed ids under a new label are bloom-positive, verified
      // present, and nothing duplicates
      val counts2 = Pipeline.ingestEmbeddingShard(shard, "vec_id",
        "embedding", dim = 64, threshold = 0.9, indexName = "blm6_t",
        indexPath = idx, outPath = out, shardLabel = "d2")
      assert(counts2("landed") == 0L,
        s"replayed shard must not re-land: $counts2")
      val ids = spark.table("blm6_t_vecs").select("id")
      assert(ids.count() == ids.distinct().count(),
        "vecs index must hold no duplicate ids after the replay")
    } finally {
      spark.sql("DROP TABLE IF EXISTS blm6_t_vecs")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(idx))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("id-blooms, IVF append: a fresh append never reads the ids boundary; writeIndex rebuilds the sidecar") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select("vec_id", "embedding").limit(200).localCheckpoint(true)
    val cents = graft.llm.Ivf.train(emb, "vec_id", "embedding",
      nCells = 4, iters = 0)
    val dir = tmpDir("graft_blm7")
    try {
      graft.llm.Ivf.writeIndex(emb.filter(col("vec_id") < 150), "vec_id",
        "embedding", cents, dir)
      graft.llm.Ivf.buildIdBlooms(spark, dir, nBlooms = 8)

      val fresh = emb.filter(col("vec_id") >= 150 && col("vec_id") < 180)
      val scans = watchScans(s"$dir/ids") {
        graft.llm.Ivf.appendToIndex(fresh, "vec_id", "embedding", dir)
      }
      assert(scans.isEmpty,
        s"bloom-negative append must never read the ids boundary: $scans")

      // replay: bloom-positive → verified against the boundary → no dups
      graft.llm.Ivf.appendToIndex(fresh, "vec_id", "embedding", dir)
      val vec = spark.read.parquet(s"$dir/vectors")
      assert(vec.count() == 180 &&
        vec.select("vec_id").distinct().count() == 180,
        "replayed append duplicated vectors")

      // a full rebuild re-populates the sidecar in lockstep
      graft.llm.Ivf.writeIndex(emb, "vec_id", "embedding", cents, dir)
      val total = KeyBlooms.report(spark, dir, "idblooms")
        .select("total_keys").collect().head.getLong(0)
      assert(total == 200L,
        s"writeIndex must rebuild the id sidecar (total_keys=$total)")
      // and the rebuilt blooms still guard: re-appending anything is a no-op
      graft.llm.Ivf.appendToIndex(fresh, "vec_id", "embedding", dir)
      assert(spark.read.parquet(s"$dir/vectors").count() == 200,
        "rebuilt sidecar must still catch re-appended ids")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("retraction leaves a stale positive, not a wrong answer: the re-submission lands") {
    val tmp = tmpDir("graft_blm4")
    val out = tmpDir("graft_blm4_out")
    try {
      val corpus = corpus300
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "blm4_t", tmp)
      KeyBlooms.build(spark, "blm4_t", tmp, nBlooms = 8)

      val idsSchema = StructType(Seq(StructField("doc_id", LongType)))
      Pipeline.retractDocuments(spark, df(idsSchema, Row(7L)), "doc_id",
        "blm4_t", out)
      // doc 7's key is gone from the boundary but still bloom-positive:
      // the gate must route it to the verify join and let it land
      val corpusText = corpus.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val resub = df(docSchema, Row(70007L, corpusText))
      val gate = Dedup.dropExactAgainstIndexBloom(resub, "doc_id", "text",
        "blm4_t", tmp)
      assert(gate.count() == 1,
        "retracted content must land again through the bloom gate")
    } finally {
      dropIndex("blm4_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("null keys never crash the bloom path and match anti-join semantics") {
    // r11 ADVICE: canonicalKey(null) is null; the plain anti-join lets
    // null-key rows survive (null never equals a boundary key), so the
    // bloom gate must produce the SAME output — null keys are
    // definitionally non-suspects, not executor NPEs.
    val tmp = tmpDir("graft_blm5")
    try {
      val corpus = corpus300
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "blm5_t", tmp)
      KeyBlooms.build(spark, "blm5_t", tmp, nBlooms = 4)
      val corpusText = corpus.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val shard = df(docSchema,
        Row(90001L, null),            // null text -> null canonical key
        Row(90002L, corpusText),      // exact dup -> dropped
        Row(90003L, "freshly minted never seen sentence about nothing"))
      val bloomed = Dedup.dropExactAgainstIndexBloom(shard, "doc_id",
        "text", "blm5_t", tmp).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      val plain = Dedup.dropExactAgainstIndex(shard, "doc_id", "text",
        "blm5_t").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(bloomed == plain && bloomed == Set(90001L, 90003L),
        s"null-key rows must survive both gates: bloom=$bloomed plain=$plain")
      // append with a null key is a no-op for that key, not a crash
      val added = KeyBlooms.append(
        df(StructType(Seq(StructField("key", StringType))),
          Row(null), Row("some-new-key")), tmp)
      assert(added == 1L, s"only the non-null key counts, got $added")
    } finally {
      dropIndex("blm5_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("concurrent sidecar appends: second fails loudly, retry after release loses no keys") {
    // the single-appender contract (r11 verdict #7): sidecar growth is
    // per-bucket read-modify-write, so the second of two concurrent
    // appenders must fail IMMEDIATELY and loudly (naming the lock), and
    // the retry after the winner releases must land BOTH key sets.
    val tmp = tmpDir("graft_blm6")
    try {
      val keySchema = StructType(Seq(StructField("key", StringType)))
      KeyBlooms.buildFrom(df(keySchema, Row("seed-key")), tmp, nBlooms = 4)
      val shardA = df(keySchema, Row("shard-a-1"), Row("shard-a-2"))
      val shardB = df(keySchema, Row("shard-b-1"), Row("shard-b-2"))
      // appender A "in flight": its exclusive lock is on disk
      val lock = new java.io.File(tmp, "keyblooms/_APPEND_LOCK")
      java.nio.file.Files.write(lock.toPath, "held\n".getBytes("UTF-8"))
      val ex = intercept[IllegalStateException](
        KeyBlooms.append(shardB, tmp))
      assert(ex.getMessage.contains("_APPEND_LOCK"),
        s"second appender must fail naming the lock: ${ex.getMessage}")
      assert(lock.delete()) // A completes, releases
      assert(KeyBlooms.append(shardA, tmp) == 2L)
      assert(KeyBlooms.append(shardB, tmp) == 2L) // the retry
      // no lost update: every key from both shards is bloom-positive
      val all = df(keySchema, Row("shard-a-1"), Row("shard-a-2"),
        Row("shard-b-1"), Row("shard-b-2"), Row("seed-key"),
        Row("never-inserted-key-xyz"))
      val pos = KeyBlooms.suspects(all, tmp)
        .collect().map(_.getString(0)).toSet
      assert(Set("shard-a-1", "shard-a-2", "shard-b-1", "shard-b-2",
        "seed-key").subsetOf(pos),
        s"all appended keys must be positive after the serialized retries: $pos")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }
}
