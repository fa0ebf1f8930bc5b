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
}
