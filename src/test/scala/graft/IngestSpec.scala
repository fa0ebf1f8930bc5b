package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.llm.{Dedup, Pipeline}

/** Incremental daily-ingest pipeline (llm/Pipeline.ingestShardFrame /
  * ingestShard): one planted shard doc per drop reason, the corpus
  * touched only through its pre-bucketed index tables — the batch analog
  * of Streams.ingestGateStream, plan-asserted corpus-side exchange-free.
  */
class IngestSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val uniq = "zymurgy quokka paradox lantern gosling fjord velvet " +
    "marzipan obelisk tundra quartz nimbus"
  private val uniq2 = "glaciers carve patient valleys while auroras paint " +
    "the winter sky in silent green ribbons overhead"

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def dropIndex(name: String): Unit =
    Seq("bands", "shingles", "keys").foreach(s =>
      spark.sql(s"DROP TABLE IF EXISTS ${name}_$s"))

  test("ingestShardFrame: each planted doc drops for its own reason; index scans ride no exchange") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 300)
    val tmp = tmpDir("graft_ing")
    try {
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ing_t", tmp)
      val corpusText = corpus.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val shard = df(docSchema,
        Row(90001L, uniq),                      // unique, survives
        Row(90002L, "hi there"),                // < minTokens -> quality gate
        Row(90003L, "  " + corpusText + "  "),  // exact dup of corpus doc 7 (canonicalized key)
        Row(90004L, uniq),                      // in-shard exact dup of 90001
        Row(90005L, "results for alpha beta gamma delta epsilon on the benchmark suite"), // contaminated
        Row(90006L, corpusText + " tonight"),   // near dup of corpus doc 7
        Row(90007L, uniq + " tonight"),         // in-shard near dup of 90001
        Row(90008L, uniq2))                     // unique, survives
      val bench = df(docSchema,
        Row(100L, "alpha beta gamma delta epsilon zeta"))

      val survivors = Pipeline.ingestShardFrame(shard, bench, "doc_id",
        "text", "ing_t", tmp)
      val ids = survivors.select("doc_id").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(90001L, 90008L)),
        s"quality (90002), exact-vs-corpus (90003), exact-in-shard (90004), " +
          s"contamination (90005), near-vs-corpus (90006), near-in-shard " +
          s"(90007) must each drop; got ${ids.toSeq}")

      // the keying is PRE-redaction: __ck__ matches the canonical key of
      // the ORIGINAL text (ingest order: key, then redact)
      val ck = survivors.filter(col("doc_id") === 90001L)
        .select("__ck__").collect().head.getString(0)
      val expect = df(docSchema, Row(1L, uniq))
        .select(Dedup.canonicalKey(col("text"))).collect().head.getString(0)
      assert(ck == expect, "__ck__ must key the pre-redaction text")
      survivors.unpersist()

      // the corpus parquet is NEVER in the exact-boundary plan, and the
      // bucketed keys table is read under no shuffle exchange
      val probe = Dedup.dropExactAgainstIndex(
        df(docSchema, Row(95000L, uniq2)), "doc_id", "text", "ing_t")
      val sp = probe.queryExecution.sparkPlan
      val scans = sp.collect { case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString).mkString(",") }
      assert(!scans.exists(_.contains("documents.parquet")),
        s"exact boundary must not rescan the corpus: $scans")
      val shuffledKeys = sp.collect {
        case ex: ShuffleExchangeExec => ex.collect {
          case s: FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("graft_ing")) => s
        }
      }.flatten
      assert(shuffledKeys.isEmpty, "keys-table scan rides a shuffle exchange")
    } finally {
      dropIndex("ing_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("keys boundary grows across shards; PII-differing docs stay distinct at the exact stage") {
    val tmp = tmpDir("graft_ing2")
    try {
      val corpus = df(docSchema, Row(1L, uniq2))
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ing2_t", tmp)
      val bench = df(docSchema)

      // shard 1 lands uniq; shard 2 re-submits it under a new id and the
      // GROWN keys table catches it — no corpus rescan, no shingle work
      val s1 = Pipeline.ingestShardFrame(df(docSchema, Row(10L, uniq)),
        bench, "doc_id", "text", "ing2_t", tmp)
      assert(s1.count() == 1)
      s1.unpersist()
      val s2 = Pipeline.ingestShardFrame(df(docSchema, Row(20L, uniq)),
        bench, "doc_id", "text", "ing2_t", tmp)
      assert(s2.count() == 0, "re-submitted doc must hit the grown keys boundary")
      s2.unpersist()

      // two docs differing ONLY in their PII values are different
      // documents: the pre-redaction key keeps both through the exact
      // stages, and their redacted texts then collapse at the near-dup
      // stage (smallest id wins) — exactly the streaming-gate semantics
      val pii = df(docSchema,
        Row(30L, "contact alice@example.com about the northern harbor project timeline and budget review"),
        Row(31L, "contact bob@sample.org about the northern harbor project timeline and budget review"))
      val s3 = Pipeline.ingestShardFrame(pii, bench, "doc_id", "text",
        "ing2_t", tmp)
      val rows = s3.select("doc_id", "text").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(30L),
        "redacted twins must collapse at near-dup, keeping the smallest id")
      assert(rows.head.getString(1).contains("[EMAIL]"),
        "landed text must be redacted")
      s3.unpersist()
    } finally {
      dropIndex("ing2_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("ingestShard lands parquet + manifest, drops __ck__, append-only across shards") {
    val tmp = tmpDir("graft_ing3")
    val out = tmpDir("graft_ing3_out")
    try {
      Dedup.writeNearDupIndex(df(docSchema, Row(1L, uniq2)), "doc_id",
        "text", "ing3_t", tmp)
      val bench = df(docSchema)
      val shard1 = df(docSchema,
        Row(10L, uniq),
        Row(11L, "hi"),     // quality drop
        Row(12L, uniq))     // exact in-shard dup
      val c1 = Pipeline.ingestShard(shard1, bench, "doc_id", "text",
        "ing3_t", tmp, out, "d01")
      assert(c1 == Map("input" -> 3L, "landed" -> 1L))

      val landed1 = spark.read.parquet(out)
      assert(landed1.columns.sorted.sameElements(
        Array("doc_id", "shard_label", "text")),
        "__ck__ must not land; the per-shard partition column must")
      assert(landed1.count() == 1)

      // second shard: one dup of a shard-1 landing, one fresh — the
      // corpus grows append-only and the manifest is per-shard
      val c2 = Pipeline.ingestShard(
        df(docSchema, Row(20L, uniq),
          Row(21L, "harbor cranes lift crates of amber resin onto barges " +
            "bound for distant river markets before dawn")),
        bench, "doc_id", "text", "ing3_t", tmp, out, "d02")
      assert(c2 == Map("input" -> 2L, "landed" -> 1L))
      assert(spark.read.parquet(out).select("doc_id").collect()
        .map(_.getLong(0)).sorted.sameElements(Array(10L, 21L)))

      val manifests = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("_graft_shard_")).map(_.getName).sorted
      assert(manifests.sameElements(
        Array("_graft_shard_d01.json", "_graft_shard_d02.json")))
      val m1 = scala.io.Source.fromFile(
        new java.io.File(out, "_graft_shard_d01.json"))
      val txt = try m1.mkString.trim finally m1.close()
      assert(txt == """{"input":3,"landed":1}""")
    } finally {
      dropIndex("ing3_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("ingestShard crash-replay: manifest is an O(1) guard; committed-but-unlanded docs are recovered") {
    val tmp = tmpDir("graft_ingR")
    val out = tmpDir("graft_ingR_out")
    try {
      Dedup.writeNearDupIndex(df(docSchema, Row(1L, uniq2)), "doc_id",
        "text", "ingR_t", tmp)
      val bench = df(docSchema)
      val shard = df(docSchema,
        Row(10L, uniq),
        Row(11L, "contact alice@example.com about the amber harbor " +
          "cranes schedule and the river barge manifest for tuesday"))
      // simulate the crash window: the gate ran and the index appends
      // committed (bands/shingles/keys hold the survivors) but the
      // landing and manifest never happened
      Pipeline.ingestShardFrame(shard, bench, "doc_id", "text",
        "ingR_t", tmp).unpersist()
      assert(spark.table("ingR_t_keys").count() == 3,
        "fixture: the crashed run must have grown the keys boundary")
      // replay through the full ingest: the keys boundary would drop
      // both docs at exact-vs-corpus — the r10-advice stranding — so
      // they must come back through the recovery path, redacted
      val c1 = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "ingR_t", tmp, out, "dR")
      assert(c1 == Map("input" -> 2L, "landed" -> 2L),
        s"crashed-run survivors must be recovered, got $c1")
      val landed = spark.read.parquet(out)
      assert(landed.select("doc_id").collect().map(_.getLong(0)).sorted
        .sameElements(Array(10L, 11L)))
      assert(landed.filter(col("doc_id") === 11L).select("text")
        .collect().head.getString(0).contains("[EMAIL]"),
        "recovered docs must be re-redacted before landing")
      assert(spark.table("ingR_t_keys").count() == 3,
        "recovery must not double-append the index")
      // full replay with the same label: O(1) manifest short-circuit,
      // nothing re-lands, counts come back verbatim
      val c2 = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "ingR_t", tmp, out, "dR")
      assert(c2 == c1, s"manifest replay must return recorded counts: $c2")
      assert(spark.read.parquet(out).count() == 2)
      // a DIFFERENT label re-submitting already-landed ids must reject
      // them (suspects present AND landed → not recovered, and the
      // exact boundary drops them from the gate)
      val c3 = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "ingR_t", tmp, out, "dR2")
      assert(c3 == Map("input" -> 2L, "landed" -> 0L),
        s"already-landed ids under a new label must not re-land: $c3")
    } finally {
      dropIndex("ingR_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("ingestShard replay after a crash between landing and manifest re-lands intact — no data loss") {
    val tmp = tmpDir("graft_ingL")
    val out = tmpDir("graft_ingL_out")
    try {
      Dedup.writeNearDupIndex(df(docSchema, Row(1L, uniq2)), "doc_id",
        "text", "ingL_t", tmp)
      val bench = df(docSchema)
      val shard = df(docSchema,
        Row(10L, uniq),
        Row(11L, "the amber harbor cranes schedule and the river barge " +
          "manifest wait for tuesday morning inspection"))
      val c1 = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "ingL_t", tmp, out, "dX")
      assert(c1 == Map("input" -> 2L, "landed" -> 2L))
      // crash simulation for the landing→manifest window: the partition
      // is fully on disk but the manifest write never happened. The
      // r11 review found the recovery's landedIds subtraction counted
      // the crashed label's own partition as landed — the replay then
      // OVERWROTE it with the empty difference and recorded landed=0
      // as success (permanent data loss). Same-label rows must NOT
      // count as landed; only other labels skip.
      assert(new java.io.File(out, "_graft_shard_dX.json").delete(),
        "fixture: manifest must exist to delete")
      val c2 = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "ingL_t", tmp, out, "dX")
      assert(c2 == Map("input" -> 2L, "landed" -> 2L),
        s"replay must re-land the crashed landing, got $c2")
      val landed = spark.read.parquet(out)
      assert(landed.select("doc_id").collect().map(_.getLong(0)).sorted
        .sameElements(Array(10L, 11L)),
        "the landed partition must survive the replay intact")
    } finally {
      dropIndex("ingL_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("retractDocuments: ids leave every sink, the boundary frees, and only affected landing partitions rewrite") {
    val tmp = tmpDir("graft_ingT")
    val out = tmpDir("graft_ingT_out")
    try {
      Dedup.writeNearDupIndex(df(docSchema, Row(1L, uniq2)), "doc_id",
        "text", "ingT_t", tmp)
      val bench = df(docSchema)
      val d10 = "the amber harbor cranes schedule and the river barge " +
        "manifest wait for tuesday morning inspection"
      Pipeline.ingestShard(df(docSchema, Row(10L, d10), Row(11L, uniq)),
        bench, "doc_id", "text", "ingT_t", tmp, out, "s1",
        redactPii = false)
      Pipeline.ingestShard(df(docSchema,
          Row(20L, "granite lighthouse keepers trade lantern oil for " +
            "woven rope every second thursday evening")),
        bench, "doc_id", "text", "ingT_t", tmp, out, "s2",
        redactPii = false)
      val s2File = new java.io.File(out, "shard_label=s2")
      val s2Mtime = s2File.lastModified()
      val counts = Pipeline.retractDocuments(spark,
        df(docSchema, Row(10L, "ignored")).select("doc_id"), "doc_id",
        "ingT_t", out)
      assert(counts("landing") == 1L, s"one landed doc removed: $counts")
      assert(counts("ingT_t_keys") == 1L, s"one keys row removed: $counts")
      // the untouched shard's partition was not rewritten
      assert(s2File.lastModified() == s2Mtime,
        "an unaffected landing partition must not rewrite")
      val landed = spark.read.parquet(out).select("doc_id")
        .collect().map(_.getLong(0)).sorted
      assert(landed.sameElements(Array(11L, 20L)),
        s"retracted doc must leave the landing: ${landed.toSeq}")
      // no index table still knows the id, and a near-dup probe with
      // the retracted content no longer matches
      Seq("bands", "shingles", "keys").foreach { s =>
        assert(spark.table(s"ingT_t_$s").filter(col("id") === 10L)
          .isEmpty, s"$s must drop the retracted id")
      }
      assert(Dedup.nearDupPairsAgainstIndex(
        df(docSchema, Row(99L, d10 + " tonight")), "doc_id", "text",
        "ingT_t", 0.5).isEmpty,
        "a retracted doc must stop matching near-dup probes")
      // the content boundary freed: the SAME text under a new id lands
      val c = Pipeline.ingestShard(df(docSchema, Row(30L, d10)), bench,
        "doc_id", "text", "ingT_t", tmp, out, "s3", redactPii = false)
      assert(c("landed") == 1L,
        s"same content must land again after retraction: $c")
    } finally {
      dropIndex("ingT_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("ingestAudit: per-doc fate attribution; dry run leaves the index unchanged") {
    val corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").filter(col("doc_id") < 300)
    val tmp = tmpDir("graft_ing4")
    try {
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "ing4_t", tmp)
      val corpusText = corpus.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val shard = df(docSchema,
        Row(90001L, uniq),
        Row(90002L, "hi there"),
        Row(90003L, "  " + corpusText + "  "),
        Row(90004L, uniq),
        Row(90005L, "results for alpha beta gamma delta epsilon on the benchmark suite"),
        Row(90006L, corpusText + " tonight"),
        Row(90007L, uniq + " tonight"),
        Row(90008L, uniq2))
      val bench = df(docSchema,
        Row(100L, "alpha beta gamma delta epsilon zeta"))

      val before = spark.table("ing4_t_keys").count()
      val fates = Pipeline.ingestAudit(shard, bench, "doc_id", "text",
          "ing4_t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fates == Map(
        90001L -> "landed", 90002L -> "quality",
        90003L -> "exact_vs_corpus", 90004L -> "exact_in_shard",
        90005L -> "contaminated", 90006L -> "near_vs_corpus",
        90007L -> "near_in_shard", 90008L -> "landed"), s"got $fates")
      // a DRY run: the audit must never grow the index
      assert(spark.table("ing4_t_keys").count() == before)
    } finally {
      dropIndex("ing4_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("q_ingest_gate is deterministic across repeated runs in one session") {
    // each invocation rebuilds the index (writeNearDupIndex overwrite)
    // then appends the shard survivors to it — a second run must see a
    // FRESH index (overwrite truncates the appended files), both when
    // the catalog table already exists (this test) and in a new session
    // over a dirty tmp dir (the driver re-runs Verify per round)
    val fn = SparkEntry.queries("q_ingest_gate")
    try {
      val r1 = fn(spark, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      val r2 = fn(spark, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      assert(r1.nonEmpty, "gate must land survivors")
      assert(r1 == r2, "repeated ingest-gate runs must be identical")
    } finally dropIndex("g_ing")
  }

  test("q_ingest_gate_steady: snapshot restore keeps repeated runs identical and steady-state") {
    // r10 verdict #3: the steady bench entry must measure the gate's
    // marginal cost, so run 1 builds + snapshots the corpus index and
    // every later run RESTORES the pristine snapshot instead of
    // rebuilding. Three runs in one session must agree (the restore
    // path truncates run N-1's appended index files, and refreshTable
    // drops the stale file listings); a wrong restore shows up as
    // survivors dropping against their own previous append.
    val fn = SparkEntry.queries("q_ingest_gate_steady")
    try {
      val r1 = fn(spark, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      val r2 = fn(spark, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      val r3 = fn(spark, "/root/testdata/sf0.001").collect().map(_.toString).toSeq
      assert(r1.nonEmpty, "steady gate must land survivors")
      assert(r1 == r2 && r2 == r3,
        "restore-per-run must make repeated steady runs identical")
    } finally dropIndex("g_ingst")
  }

  test("compactNearDupIndex: files drop to one per bucket, probe stays exchange-free and identical") {
    val tmp = tmpDir("graft_ingc")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      val buckets = 4
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "ingc_t", tmp, buckets = buckets)
      // two daily appends fragment every table (each bucketed append
      // writes new files per touched bucket)
      Seq((200L, 260L), (260L, 320L)).foreach { case (lo, hi) =>
        Dedup.appendShardToIndex(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", "ingc_t", tmp, threshold = 0.5,
          buckets = buckets).unpersist()
      }
      // file counts resolve each table's CURRENT catalog location: the
      // online compaction (r11) installs each rewrite as a new
      // generation directory via ALTER TABLE SET LOCATION
      def files(sub: String): Int =
        new java.io.File(java.net.URI.create(
          spark.sessionState.catalog.getTableMetadata(
            org.apache.spark.sql.catalyst.TableIdentifier(s"ingc_t_$sub"))
            .location.toString)).listFiles()
          .count(_.getName.endsWith(".parquet"))
      val before = Seq("bands", "shingles", "keys").map(s => s -> files(s)).toMap
      assert(before.values.exists(_ > buckets),
        s"appends must fragment at least one table past $buckets files: $before")
      // the maintenance report agrees with the filesystem — the API an
      // operator watches to schedule this compaction
      val rep = Dedup.indexReport(spark, "ingc_t").collect()
        .map(r => r.getString(0) -> r.getLong(2).toInt).toMap
      assert(rep == before.map { case (k, v) => s"ingc_t_$k" -> v },
        s"indexReport disagrees with the filesystem: $rep vs $before")
      val probeDoc = df(docSchema, Row(99001L,
        docs.filter(col("doc_id") === 7).select("text")
          .collect().head.getString(0)))
      def probePairs = Dedup.nearDupPairsAgainstIndex(probeDoc, "doc_id",
          "text", "ingc_t", 0.5).orderBy("id_a", "id_b")
        .collect().map(_.toString).toSeq
      val rowsBefore = Seq("bands", "shingles", "keys")
        .map(s => spark.table(s"ingc_t_$s").count())
      val pairsBefore = probePairs
      assert(pairsBefore.nonEmpty, "planted probe must hit the index")
      // ONLINE-SAFETY (r10 verdict #6): a probe that resolved the old
      // locations pre-flip must still execute post-flip — the replaced
      // generation survives until the NEXT compaction
      val heldProbe = Dedup.nearDupPairsAgainstIndex(probeDoc, "doc_id",
        "text", "ingc_t", 0.5).orderBy("id_a", "id_b")

      Dedup.compactNearDupIndex(spark, "ingc_t")
      assert(heldProbe.collect().map(_.toString).toSeq == pairsBefore,
        "a probe planned pre-flip must still run post-flip (online safety)")
      val after = Seq("bands", "shingles", "keys").map(s => s -> files(s)).toMap
      assert(after.values.forall(_ <= buckets),
        s"compaction must leave at most one file per bucket: $after")
      assert(Seq("bands", "shingles", "keys")
        .map(s => spark.table(s"ingc_t_$s").count()) == rowsBefore,
        "compaction changed a table's row set")
      assert(probePairs == pairsBefore, "compaction changed probe results")
      // the zero-exchange read property survives the rewrite
      val sp = Dedup.nearDupPairsAgainstIndex(probeDoc, "doc_id", "text",
        "ingc_t", 0.5).queryExecution.sparkPlan
      val shuffledIdx = sp.collect {
        case ex: ShuffleExchangeExec => ex.collect {
          case s: FileSourceScanExec if s.relation.location.rootPaths
            .exists(_.toString.contains("graft_ingc")) => s
        }
      }.flatten
      assert(shuffledIdx.isEmpty, "index scan rides a shuffle exchange after compaction")
    } finally {
      dropIndex("ingc_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("Maintain.maintainTextIndex: no drift check by construction; fragmentation compacts, bloom overload rebuilds, gate unchanged") {
    import graft.llm.Maintain
    def reportMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> ((r.getBoolean(3), r.getString(4))))
      .toMap
    val tmp = tmpDir("graft_maintt")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "maintt_t", tmp)
      Dedup.buildIdBlooms(spark, "maintt_t", tmp, nBlooms = 4)
      Seq((200L, 260L), (260L, 320L)).foreach { case (lo, hi) =>
        Dedup.appendShardToIndex(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          "doc_id", "text", "maintt_t", tmp, threshold = 0.5).unpersist()
      }
      val filesBefore = Dedup.indexReport(spark, "maintt_t")
        .agg(max(col("files"))).head().getLong(0)
      val healthy = reportMap(Maintain.maintainTextIndex(spark, "maintt_t",
        Maintain.Policy(maxFilesFlat = 100, maxBloomLoadFactor = 100.0),
        bloomPath = Some(tmp)))
      assert(healthy.keySet == Set("band_drift", "table_files", "bloom_load"))
      assert(healthy.values.forall(!_._1), s"nothing may fire: $healthy")
      assert(healthy("band_drift")._2.startsWith("n/a"),
        "the report must record WHY the family never retrains")
      val fired = reportMap(Maintain.maintainTextIndex(spark, "maintt_t",
        Maintain.Policy(maxFilesFlat = 4, maxBloomLoadFactor = 0.001),
        bloomPath = Some(tmp)))
      assert(fired("table_files") ==
        ((true, "Dedup.compactNearDupIndex")), s"$fired")
      assert(fired("bloom_load") == ((true, "KeyBlooms.rebuild")), s"$fired")
      val filesAfter = Dedup.indexReport(spark, "maintt_t")
        .agg(max(col("files"))).head().getLong(0)
      assert(filesAfter < filesBefore,
        s"compaction must shrink files: $filesBefore -> $filesAfter")
      // the maintained index still gates correctly: a corpus doc's
      // duplicate drops, a unique survivor lands
      val corpusText = docs.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val shard = df(docSchema,
        Row(95001L, uniq), Row(95002L, "  " + corpusText + "  "))
      val survivors = Pipeline.ingestShardFrame(shard,
        df(docSchema, Row(100L, "alpha beta gamma delta epsilon zeta")),
        "doc_id", "text", "maintt_t", tmp)
      assert(survivors.select("doc_id").collect().map(_.getLong(0)).toSeq
        == Seq(95001L),
        "post-maintenance gate must still drop the corpus duplicate")
    } finally {
      dropIndex("maintt_t")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("ingestWindowsShard: shard-local windows land per split, token-exact; O(1) replay; crashed index append recovered") {
    val tmp = tmpDir("graft_wsh_idx")
    val out = tmpDir("graft_wsh_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "wsh_t", tmp)
      Dedup.buildIdBlooms(spark, "wsh_t", tmp, nBlooms = 4)
      val corpusText = docs.filter(col("doc_id") === 7)
        .select("text").collect().head.getString(0)
      val shard1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 260)
        .unionByName(df(docSchema,
          Row(90001L, "hi"),                     // quality drop
          Row(90002L, "  " + corpusText + "  "))) // exact dup vs corpus
      val c1 = Pipeline.ingestWindowsShard(shard1, df(docSchema),
        "doc_id", "text", "wsh_t", tmp, out, windowSize = 64L,
        shardLabel = "d01", redactPii = false)
      assert(c1("input") == 62L, s"$c1")
      assert(c1("landed") <= 60L && c1("landed") > 0, s"$c1")

      // landed windows: partition columns discovered, ids dense per
      // (shard, split), every non-tail window exactly windowSize, and
      // the token mass equals the gated docs' token mass exactly
      val win = spark.read.parquet(out)
      assert(win.columns.sorted.sameElements(Array("n_tokens",
        "shard_label", "split", "window_id", "window_text")))
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
      assert(sidecar.count() == c1("landed"),
        "sidecar must hold exactly the landed doc ids")
      val docTokens = docs.join(sidecar.select("doc_id"), Seq("doc_id"),
          "left_semi")
        .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
      val winTokens = win.agg(sum("n_tokens")).head().getLong(0)
      assert(winTokens == docTokens,
        s"window token mass must conserve the gated docs: $winTokens != $docTokens")
      val perSplit = win.groupBy("split")
        .agg(count(lit(1)).as("n"), max("window_id").as("mx"),
          sum(when(col("n_tokens") =!= 64L, 1).otherwise(0)).as("short"))
        .collect()
      perSplit.foreach { r =>
        assert(r.getLong(2) == r.getLong(1) - 1,
          s"window ids must be dense per split: $r")
        assert(r.getLong(3) <= 1, s"at most one tail window per split: $r")
      }
      assert(c1("train_windows") ==
        win.filter(col("split") === "train").count(), s"$c1")

      // O(1) replay: same label returns identical counts, no re-landing
      val filesBefore = spark.read.parquet(out)
        .select(input_file_name().as("f")).distinct().count()
      val c1b = Pipeline.ingestWindowsShard(shard1, df(docSchema),
        "doc_id", "text", "wsh_t", tmp, out, 64L, "d01",
        redactPii = false)
      assert(c1b == c1, "replay must return the recorded counts")
      val filesAfter = spark.read.parquet(out)
        .select(input_file_name().as("f")).distinct().count()
      assert(filesAfter == filesBefore, "replay must not rewrite the landing")

      // crashed-append recovery: shard 2's index append committed
      // (simulated direct append) but nothing landed — the gate alone
      // would drop every doc as exact-vs-corpus; the suspects snapshot
      // must recover and land them
      val shard2 = docs.filter(col("doc_id") >= 260 && col("doc_id") < 300)
      Dedup.appendShardToIndex(shard2, "doc_id", "text", "wsh_t", tmp,
        threshold = 0.5).unpersist()
      val c2 = Pipeline.ingestWindowsShard(shard2, df(docSchema),
        "doc_id", "text", "wsh_t", tmp, out, 64L, "d02",
        redactPii = false)
      assert(c2("landed") > 0,
        s"crashed-append docs must be recovered, not silently dropped: $c2")
      val d2ids = spark.read.parquet(s"$out/_docsidecar")
        .filter(col("shard_label") === "d02").count()
      assert(d2ids == c2("landed"), s"$c2 vs sidecar $d2ids")
      // and a THIRD submission of the same docs under a new label now
      // finds them landed -> nothing recovered, nothing landed twice
      val c3 = Pipeline.ingestWindowsShard(shard2, df(docSchema),
        "doc_id", "text", "wsh_t", tmp, out, 64L, "d03",
        redactPii = false)
      assert(c3("landed") == 0L,
        s"already-landed docs must not land again under a new label: $c3")

      // split stability: the sidecar's split equals the stable id-hash
      // split the batch path uses
      val expectSplit = graft.api.GraftFrame(
          spark.read.parquet(s"$out/_docsidecar").select("doc_id"))
        .splitByHash("doc_id", 0.8, 0.1).df
      val mismatch = spark.read.parquet(s"$out/_docsidecar")
        .join(expectSplit.withColumnRenamed("split", "esplit"),
          Seq("doc_id"))
        .filter(col("split") =!= col("esplit")).count()
      assert(mismatch == 0, "sidecar split must be the stable id-hash split")
    } finally {
      dropIndex("wsh_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("shard admission control: a contract-violating shard refuses loudly, index and landing untouched") {
    import graft.operators.Checks
    val tmp = tmpDir("graft_adm_idx")
    val out = tmpDir("graft_adm_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "adm_t", tmp)
      val contract = Seq(Checks.NotNull("text"),
        Checks.Unique(Seq("doc_id")), Checks.RowCountBetween(10L, 100000L))
      val keysBefore = spark.table("adm_t_keys").count()
      // broken-scraper day: null texts and a duplicated id
      val bad = docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)
        .unionByName(df(docSchema, Row(9000L, null), Row(9000L, "x y z a b")))
      val e = intercept[IllegalStateException] {
        Pipeline.ingestShard(bad, df(docSchema), "doc_id", "text",
          "adm_t", tmp, out, "bad01", admission = contract)
      }
      assert(e.getMessage.contains("not_null(text)") &&
        e.getMessage.contains("unique(doc_id)"), e.getMessage)
      assert(spark.table("adm_t_keys").count() == keysBefore,
        "a refused shard must not grow the index")
      assert(!new java.io.File(out, "_graft_shard_bad01.json").exists(),
        "a refused shard must not write its manifest")
      // the same contract admits a clean shard; the windows landing
      // enforces it identically
      val good = docs.filter(col("doc_id") >= 200 && col("doc_id") < 230)
      val c = Pipeline.ingestShard(good, df(docSchema), "doc_id", "text",
        "adm_t", tmp, out, "good01", admission = contract)
      assert(c("landed") > 0, s"$c")
      val e2 = intercept[IllegalStateException] {
        Pipeline.ingestWindowsShard(bad, df(docSchema), "doc_id", "text",
          "adm_t", tmp, out + "_w", 64L, "bad02", admission = contract)
      }
      assert(e2.getMessage.contains("not_null(text)"), e2.getMessage)
    } finally {
      dropIndex("adm_t")
      Seq(tmp, out, out + "_w").foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("retractFromWindows: only affected shards rebuild, retracted tokens vanish, others byte-identical; missing text fails loudly") {
    val tmp = tmpDir("graft_wrt_idx")
    val out = tmpDir("graft_wrt_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "wrt_t", tmp)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      val s2 = docs.filter(col("doc_id") >= 240 && col("doc_id") < 280)
      Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id", "text",
        "wrt_t", tmp, out, 64L, "d01", redactPii = false)
      Pipeline.ingestWindowsShard(s2, df(docSchema), "doc_id", "text",
        "wrt_t", tmp, out, 64L, "d02", redactPii = false)
      // retract two docs that landed in shard 1
      val landed1 = spark.read.parquet(s"$out/_docsidecar")
        .filter(col("shard_label") === "d01")
        .select("doc_id").collect().map(_.getLong(0)).sorted
      val victims = landed1.take(2)
      val victimTokens = docs
        .filter(col("doc_id").isin(victims.map(Long.box): _*))
        .agg(sum(size(split(col("text"), " ")))).head().getLong(0)
      val tokens1Before = spark.read.parquet(out)
        .filter(col("shard_label") === "d01")
        .agg(sum("n_tokens")).head().getLong(0)
      val files2Before = spark.read
        .parquet(s"$out/shard_label=d02")
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      val idsDf = spark.createDataFrame(
        java.util.Arrays.asList(victims.map(org.apache.spark.sql.Row(_)): _*),
        StructType(Seq(StructField("doc_id", LongType))))
      val r = Pipeline.retractFromWindows(spark, out, idsDf, "doc_id",
        docs, "text", 64L)
      assert(r("docs") == 2L && r("shards") == 1L, s"$r")
      // shard 1: token mass drops by EXACTLY the victims' tokens and
      // the victims' ids leave the sidecar
      val tokens1After = spark.read.parquet(out)
        .filter(col("shard_label") === "d01")
        .agg(sum("n_tokens")).head().getLong(0)
      assert(tokens1After == tokens1Before - victimTokens,
        s"$tokens1Before -> $tokens1After, victims $victimTokens")
      assert(spark.read.parquet(s"$out/_docsidecar")
        .filter(col("doc_id").isin(victims.map(Long.box): _*)).count() == 0)
      // shard 2: untouched file listing
      val files2After = spark.read
        .parquet(s"$out/shard_label=d02")
        .select(input_file_name().as("f")).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
      assert(files2After == files2Before, "unaffected shard must not rewrite")
      // windows in the rebuilt shard still chop at 64 except the tail
      val shorts = spark.read.parquet(out)
        .filter(col("shard_label") === "d01")
        .groupBy("split")
        .agg(sum(when(col("n_tokens") =!= 64L, 1).otherwise(0)).as("s"))
        .collect().map(_.getLong(1))
      assert(shorts.forall(_ <= 1), s"rebuilt shard must re-chop cleanly")
      // unknown id -> no-op; missing text store entry -> loud failure
      val none = Pipeline.retractFromWindows(spark, out,
        df(StructType(Seq(StructField("doc_id", LongType))), Row(999999L)),
        "doc_id", docs, "text", 64L)
      assert(none == Map("docs" -> 0L, "windows" -> 0L, "shards" -> 0L))
      val e = intercept[IllegalArgumentException] {
        Pipeline.retractFromWindows(spark, out,
          df(StructType(Seq(StructField("doc_id", LongType))),
            Row(landed1.last)),
          "doc_id", docs.filter(col("doc_id") < 0), "text", 64L)
      }
      assert(e.getMessage.contains("missing from the provided text store"),
        e.getMessage)
    } finally {
      dropIndex("wrt_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("windowsReport: per-shard inventory, manifest bit, token-conservation fsck") {
    val tmp = tmpDir("graft_wrp_idx")
    val out = tmpDir("graft_wrp_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "wrp_t", tmp)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 240),
        df(docSchema), "doc_id", "text", "wrp_t", tmp, out, 64L, "d01",
        redactPii = false)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 240 && col("doc_id") < 280),
        df(docSchema), "doc_id", "text", "wrp_t", tmp, out, 64L, "d02",
        redactPii = false)
      val rep = Pipeline.windowsReport(spark, out, Some(docs)).collect()
      assert(rep.map(_.getString(0)).toSeq == Seq("d01", "d02"))
      rep.foreach { r =>
        assert(r.getBoolean(5), s"manifest must be committed: $r")
        assert(r.getBoolean(7), s"tokens must conserve: $r")
        assert(r.getLong(1) > 0 && r.getLong(2) > 0, s"$r")
      }
      // simulate a crashed landing: delete d02's manifest -> the report
      // flags it; a drifted text store -> tokens_match goes false
      new java.io.File(out, "_graft_wshard_d02.json").delete()
      val rep2 = Pipeline.windowsReport(spark, out, Some(docs)).collect()
        .map(r => r.getString(0) -> r.getBoolean(5)).toMap
      assert(rep2("d01") && !rep2("d02"),
        s"a missing manifest must flag the crashed shard: $rep2")
      val drifted = docs.withColumn("text",
        concat(col("text"), lit(" extradrifttoken")))
      val rep3 = Pipeline.windowsReport(spark, out, Some(drifted))
        .collect().map(r => r.getString(0) -> r.getBoolean(7)).toMap
      assert(rep3.values.forall(_ == false),
        s"text-store drift must fail the fsck bit: $rep3")
      // without a store: inventory only, fsck column null
      val rep4 = Pipeline.windowsReport(spark, out).collect()
      assert(rep4.forall(r => r.isNullAt(6) && r.isNullAt(7)),
        "no store -> no conservation verdict")
    } finally {
      dropIndex("wrp_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("ingestQuarantined: reviewed batch requeues through the batch gate exactly once; admission re-checked") {
    import graft.operators.Checks
    val tmp = tmpDir("graft_rq_idx")
    val out = tmpDir("graft_rq_out")
    val quar = tmpDir("graft_rq_quar")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "rq_t", tmp)
      // the parked batch admissionStream would leave: duplicate ids
      // (the original violation), texts fine
      df(docSchema, Row(7001L, uniq), Row(7001L, uniq2))
        .write.parquet(s"$quar/batch_id=7/rows")
      // requeue under the ORIGINAL contract: still violating -> loud
      // refusal, marker NOT written, batch stays requeueable
      val strict = Seq(Checks.Unique(Seq("doc_id")))
      val e1 = intercept[IllegalStateException] {
        Pipeline.ingestQuarantined(spark, quar, 7L, df(docSchema),
          "doc_id", "text", "rq_t", tmp, out, "rq01", admission = strict)
      }
      assert(e1.getMessage.contains("unique(doc_id)"), e1.getMessage)
      assert(!new java.io.File(s"$quar/batch_id=7/_ADMITTED").exists())
      // reviewed: the dup id is tolerable -> corrected contract admits;
      // the batch rides the full gate and lands under its label
      val c = Pipeline.ingestQuarantined(spark, quar, 7L, df(docSchema),
        "doc_id", "text", "rq_t", tmp, out, "rq01",
        admission = Seq(Checks.NotNull("text")))
      assert(c("input") == 2L && c("landed") == 2L, s"$c")
      assert(new java.io.File(s"$quar/batch_id=7/_ADMITTED").exists(),
        "admission must leave the audit marker")
      assert(spark.read.parquet(out).count() == 2L)
      // at-most-once: the second requeue refuses on the marker
      val e2 = intercept[IllegalArgumentException] {
        Pipeline.ingestQuarantined(spark, quar, 7L, df(docSchema),
          "doc_id", "text", "rq_t", tmp, out, "rq02")
      }
      assert(e2.getMessage.contains("already admitted"), e2.getMessage)
      // unknown batch refuses naming the path
      val e3 = intercept[IllegalArgumentException] {
        Pipeline.ingestQuarantined(spark, quar, 99L, df(docSchema),
          "doc_id", "text", "rq_t", tmp, out, "rq03")
      }
      assert(e3.getMessage.contains("nothing to requeue"), e3.getMessage)
    } finally {
      dropIndex("rq_t")
      Seq(tmp, out, quar).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("windows landing survives numeric shard labels and refuses a duplicate-id text store") {
    val tmp = tmpDir("graft_num_idx")
    val out = tmpDir("graft_num_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "num_t", tmp)
      // date-like labels: partition discovery would infer shard_label
      // as INT — the landing/report/retraction/global-id paths must
      // all survive the cast
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 240),
        df(docSchema), "doc_id", "text", "num_t", tmp, out, 64L,
        "20260813", redactPii = false)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 240 && col("doc_id") < 280),
        df(docSchema), "doc_id", "text", "num_t", tmp, out, 64L,
        "20260814", redactPii = false)
      val rep = Pipeline.windowsReport(spark, out, Some(docs)).collect()
      assert(rep.map(_.getString(0)).toSeq == Seq("20260813", "20260814"))
      assert(rep.forall(r => r.getBoolean(5) && r.getBoolean(7)), rep.toSeq)
      val g = Pipeline.globalWindowIds(spark, out)
      assert(g.filter(col("split") === "train")
        .agg(max("global_id")).head().getLong(0) + 1 ==
        g.filter(col("split") === "train").count(),
        "global ids stay dense under numeric labels")
      val victim = spark.read.parquet(s"$out/_docsidecar")
        .filter(col("shard_label").cast("string") === "20260813")
        .select("doc_id").head().getLong(0)
      val idsDf = df(StructType(Seq(StructField("doc_id", LongType))),
        Row(victim))
      val r = Pipeline.retractFromWindows(spark, out, idsDf, "doc_id",
        docs, "text", 64L)
      assert(r("docs") == 1L && r("shards") == 1L, s"$r")
      // duplicate-id text store: refused loudly, not multiplied in
      val dupStore = docs.unionByName(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 280)
          .withColumn("text", concat(col("text"), lit(" v2"))))
      val victim2 = spark.read.parquet(s"$out/_docsidecar")
        .filter(col("shard_label").cast("string") === "20260814")
        .select("doc_id").head().getLong(0)
      val e = intercept[IllegalArgumentException] {
        Pipeline.retractFromWindows(spark, out,
          df(StructType(Seq(StructField("doc_id", LongType))),
            Row(victim2)),
          "doc_id", dupStore, "text", 64L)
      }
      assert(e.getMessage.contains("duplicate row"), e.getMessage)
    } finally {
      dropIndex("num_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("globalWindowIds: dense per split across shards, shard-interleave order, window rows ride no exchange") {
    val tmp = tmpDir("graft_gwi_idx")
    val out = tmpDir("graft_gwi_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "gwi_t", tmp)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 240),
        df(docSchema), "doc_id", "text", "gwi_t", tmp, out, 64L, "d01",
        redactPii = false)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 240 && col("doc_id") < 280),
        df(docSchema), "doc_id", "text", "gwi_t", tmp, out, 64L, "d02",
        redactPii = false)
      val g = Pipeline.globalWindowIds(spark, out)
      // dense 0..n-1 per split, ordered (shard asc, window_id asc)
      g.select("split").distinct().collect().map(_.getString(0)).foreach { sp =>
        val rows = g.filter(col("split") === sp)
          .select("shard_label", "window_id", "global_id")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._3)
        assert(rows.map(_._3).toSeq == rows.indices.map(_.toLong),
          s"global ids must be dense per split: $sp")
        assert(rows.map(r => (r._1, r._2)).toSeq ==
          rows.map(r => (r._1, r._2)).sortBy(identity).toSeq,
          s"global order must be (shard, in-shard position): $sp")
      }
      // the window rows themselves ride no shuffle exchange (offsets
      // broadcast; only the tiny counts frame exchanges)
      val sp = g.queryExecution.executedPlan
      val shuffledWindows = sp.collect {
        case ex: ShuffleExchangeExec => ex.collect {
          case s: FileSourceScanExec
            if s.requiredSchema.fieldNames.contains("window_text") => s
        }
      }.flatten
      assert(shuffledWindows.isEmpty,
        "window rows must reach their global id without an exchange")
    } finally {
      dropIndex("gwi_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("BPE-token-id windows: id-space landing, conservation fsck, O(1) replay, retraction, loader order") {
    val tmp = tmpDir("graft_bwin_idx")
    val mdl = tmpDir("graft_bwin_bpe")
    val out = tmpDir("graft_bwin_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "bwin_bpe", mdl, numMerges = 6)
      val bw = Pipeline.BpeWindows("bwin_bpe", mdl)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "bwin_t", tmp)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      val s2 = docs.filter(col("doc_id") >= 240 && col("doc_id") < 280)
      val c1 = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "bwin_t", tmp, out, 64L, "d01", redactPii = false,
        bpeWindows = Some(bw))
      Pipeline.ingestWindowsShard(s2, df(docSchema), "doc_id", "text",
        "bwin_t", tmp, out, 64L, "d02", redactPii = false,
        bpeWindows = Some(bw))
      // the landing is in ID space: window_ids array, no window_text
      val win = spark.read.parquet(out)
      assert(win.columns.sorted.sameElements(Array("n_tokens",
        "shard_label", "split", "window_id", "window_ids")))
      // (parquet reads array elements back nullable — check the type)
      assert(win.schema("window_ids").dataType
        .asInstanceOf[ArrayType].elementType == LongType)
      // every window's n_tokens is its array length; non-tail = 64
      assert(win.filter(size(col("window_ids")) =!= col("n_tokens"))
        .count() == 0)
      val shortPerSplit = win.groupBy("shard_label", "split")
        .agg(sum(when(col("n_tokens") =!= 64L, 1).otherwise(0)).as("s"))
        .collect().map(_.getLong(2))
      assert(shortPerSplit.forall(_ <= 1), "one tail window max per (shard, split)")
      // conservation IN THE ID UNIT: window mass == the landed docs'
      // BPE token counts (whitespace words would NOT match)
      val merges = graft.llm.Bpe.mergeList(spark.table("bwin_bpe_bpe"))
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
      val landedDocs = docs.join(sidecar.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val bpeMass = graft.llm.Bpe.tokenCounts(landedDocs, "doc_id",
        "text", merges).agg(sum("n_tokens")).head().getLong(0)
      val winMass = win.agg(sum("n_tokens")).head().getLong(0)
      assert(winMass == bpeMass, s"id-space conservation: $winMass != $bpeMass")
      val wsMass = landedDocs.agg(sum(size(split(col("text"), " "))))
        .head().getLong(0)
      assert(winMass != wsMass,
        "BPE mass must differ from whitespace mass or the unit check is vacuous")
      // the fsck counts in the landing's unit: green with the model,
      // token-mismatched without it
      val rep = Pipeline.windowsReport(spark, out, Some(docs),
        bpeWindows = Some(bw)).collect()
      assert(rep.forall(_.getAs[Boolean]("tokens_match")), rep.mkString(";"))
      val repWs = Pipeline.windowsReport(spark, out, Some(docs)).collect()
      assert(repWs.forall(!_.getAs[Boolean]("tokens_match")),
        "whitespace fsck against an id landing must flag, not silently pass")
      // O(1) replay returns the recorded manifest
      val c1b = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "bwin_t", tmp, out, 64L, "d01", redactPii = false,
        bpeWindows = Some(bw))
      assert(c1b == c1)
      // retraction rebuilds in the SAME unit: mass drops by exactly the
      // victim's BPE tokens
      val victim = sidecar.filter(col("shard_label") === "d01")
        .select("doc_id").orderBy("doc_id").head().getLong(0)
      val victimMass = graft.llm.Bpe.tokenCounts(
          docs.filter(col("doc_id") === victim), "doc_id", "text", merges)
        .agg(sum("n_tokens")).head().getLong(0)
      val r = Pipeline.retractFromWindows(spark, out,
        df(StructType(Seq(StructField("doc_id", LongType))), Row(victim)),
        "doc_id", docs, "text", 64L, bpeWindows = Some(bw))
      assert(r("docs") == 1L && r("shards") == 1L, s"$r")
      val winMass2 = spark.read.parquet(out)
        .agg(sum("n_tokens")).head().getLong(0)
      assert(winMass2 == winMass - victimMass,
        s"$winMass -> $winMass2, victim $victimMass")
      assert(Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(bw))
        .collect().forall(_.getAs[Boolean]("tokens_match")))
      // loader contract: global ids are 0..N-1 per split in
      // (shard_label asc, window_id) order, streamed strictly
      // increasing, payload column intact
      val loaded = Pipeline.loadWindows(spark, out, "train")
      assert(loaded.columns.contains("window_ids"))
      val seq = loaded.select("global_id", "shard_label", "window_id")
        .toLocalIterator()
      var expect = 0L
      var prev: (String, Long) = ("", -1L)
      while (seq.hasNext) {
        val row = seq.next()
        assert(row.getLong(0) == expect, s"global_id gap at $expect")
        val cur = (row.getString(1), row.getLong(2))
        assert(Ordering.Tuple2[String, Long].lt(prev, cur),
          s"loader order violated: $prev !< $cur")
        prev = cur; expect += 1
      }
      assert(expect == spark.read.parquet(out)
        .filter(col("split") === "train").count())
    } finally {
      dropIndex("bwin_t")
      Seq("bwin_bpe_bpe", "bwin_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("loadWindowsMixed: weight-proportional deterministic interleave across landings") {
    val tmpA = tmpDir("graft_lwm_ia"); val outA = tmpDir("graft_lwm_oa")
    val tmpB = tmpDir("graft_lwm_ib"); val outB = tmpDir("graft_lwm_ob")
    val tmpC = tmpDir("graft_lwm_ic"); val outC = tmpDir("graft_lwm_oc")
    val mdl = tmpDir("graft_lwm_mdl")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      def land(idx: String, tmp: String, out: String, lo: Long, hi: Long,
               bw: Option[Pipeline.BpeWindows] = None): Unit = {
        Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 100),
          "doc_id", "text", idx, tmp)
        Pipeline.ingestWindowsShard(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi),
          df(docSchema), "doc_id", "text", idx, tmp, out, 48L, "d01",
          redactPii = false, bpeWindows = bw)
      }
      land("lwm_a", tmpA, outA, 200L, 280L)
      land("lwm_b", tmpB, outB, 280L, 330L)
      val mixed = Pipeline.loadWindowsMixed(spark,
        Seq(("a", outA, 2.0), ("b", outB, 1.0)), "train")
      val rows = mixed.select("source", "global_id", "mix_ord").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // set law: each source contributes exactly its loader's window set
      def setOf(path: String) = Pipeline.loadWindows(spark, path, "train")
        .select("global_id").collect().map(_.getLong(0)).toSet
      assert(rows.filter(_._1 == "a").map(_._2).toSet == setOf(outA))
      assert(rows.filter(_._1 == "b").map(_._2).toSet == setOf(outB))
      // proportion law: while both sources still stream, every prefix
      // holds #a ~ 2 x #b (midpoint spacing keeps the drift <= 2)
      var (na, nb) = (0, 0)
      val (totA, totB) = (rows.count(_._1 == "a"), rows.count(_._1 == "b"))
      rows.foreach { case (s, _) =>
        if (s == "a") na += 1 else nb += 1
        if (na < totA && nb < totB)
          assert(math.abs(na - 2 * nb) <= 2,
            s"prefix drift: a=$na b=$nb")
      }
      assert(totA > 10 && totB > 5, "fixture must be non-trivial")
      // deterministic across calls; epoch re-orders within source but
      // keeps the same sets
      val again = Pipeline.loadWindowsMixed(spark,
        Seq(("a", outA, 2.0), ("b", outB, 1.0)), "train")
        .select("source", "global_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(again.toSeq == rows.toSeq)
      val e1 = Pipeline.loadWindowsMixed(spark,
        Seq(("a", outA, 2.0), ("b", outB, 1.0)), "train", epoch = 1L)
        .select("source", "global_id").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(e1.filter(_._1 == "a").map(_._2).toSet == setOf(outA) &&
        e1.filter(_._1 == "b").map(_._2).toSet == setOf(outB))
      assert(e1.toSeq != rows.toSeq, "epochs must draw fresh interleaves")
      // a layout mismatch refuses: an ID landing cannot mix with text
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 100),
        "text", "lwm_bpe", mdl, numMerges = 4)
      land("lwm_c", tmpC, outC, 330L, 350L,
        bw = Some(Pipeline.BpeWindows("lwm_bpe", mdl)))
      val eMix = intercept[IllegalArgumentException] {
        Pipeline.loadWindowsMixed(spark,
          Seq(("a", outA, 1.0), ("c", outC, 1.0)), "train")
      }
      assert(eMix.getMessage.contains("layout"), eMix.getMessage)
      intercept[IllegalArgumentException] {
        Pipeline.loadWindowsMixed(spark,
          Seq(("a", outA, 1.0), ("a", outB, 1.0)), "train")
      }
      intercept[IllegalArgumentException] {
        Pipeline.loadWindowsMixed(spark,
          Seq(("a", outA, 0.0)), "train")
      }
    } finally {
      Seq("lwm_a", "lwm_b", "lwm_c").foreach(dropIndex)
      Seq("lwm_bpe_bpe", "lwm_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmpA, outA, tmpB, outB, tmpC, outC, mdl).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("windowsContaminationScreen: sub-shingle eval overlap resolves to its documents; eod-straddling grams never match") {
    val mdl = tmpDir("graft_wcs_bpe")
    val out = tmpDir("graft_wcs_out")
    try {
      // corpus: filler docs on a disjoint vocab; doc 50 carries a
      // 3-WORD run of the benchmark phrase — SHORT enough to survive
      // the build's 5-word-shingle decontamination, long enough for
      // 5-consecutive-id grams (each word encodes to >= 2 ids here);
      // docs 60/61 carry the phrase SPLIT across their boundary, so
      // any id run exists only straddling an EOD
      val filler = (1L to 40L).map(i => Row(i,
        s"alpha$i beta$i gamma delta epsilon zeta eta theta iota " +
          s"kappa lambda mu nu xi omicron pi rho sigma tau upsilon"))
      val docs = df(docSchema, filler ++ Seq(
        Row(50L, "alpha50 beta50 gamma delta qq ww ee zeta eta theta " +
          "iota kappa lambda mu nu xi omicron pi rho sigma"),
        Row(60L, "alpha60 beta60 gamma delta epsilon zeta eta qq ww"),
        Row(61L, "ee rr zeta eta theta iota kappa lambda mu nu xi")): _*)
      val bench = df(docSchema, Row(900L, "qq ww ee rr tt yy uu"))
      graft.llm.Bpe.writeBpeModel(docs, "text", "wcs_bpe", mdl,
        numMerges = 4)
      val vocab = graft.llm.Bpe.vocabMap(spark.table("wcs_bpe_bpe_vocab"))
      val eod = vocab.values.max + 1L
      val bw = Pipeline.BpeWindows("wcs_bpe", mdl, eodId = Some(eod),
        docSpans = true)
      Pipeline.buildAndWriteWindows(docs, df(docSchema), "doc_id",
        "text", out, windowSize = 64L, decontamK = 5,
        bpeWindows = Some(bw))
      // the planted doc SURVIVED the word-shingle build decontam
      // (3-word overlap < decontamK) — the screen exists because of
      // exactly this gap
      val sidecarless = spark.read.parquet(out)
      assert(sidecarless.columns.contains("doc_spans"))
      val rep = Pipeline.windowsContaminationScreen(spark, out, bench,
        "text", bw, k = 5).collect()
      assert(rep.nonEmpty, "the sub-shingle overlap must be found")
      val implicated = rep.flatMap(_.getSeq[Long](
        rep.head.fieldIndex("doc_ids"))).toSet
      assert(implicated.contains(50L),
        s"doc 50 carries the planted overlap: $implicated")
      // docs 60/61 hold the phrase only ACROSS their eod boundary:
      // every straddling gram contains the eod id and is excluded, so
      // neither doc may be implicated — an eod crossing is not
      // contamination of either document
      assert(!implicated.contains(60L) && !implicated.contains(61L),
        s"eod-straddling grams must never match: $implicated")
      assert(rep.forall(_.getAs[Long]("n_hits") > 0))
      // the shuffle-join fallback (benchmark too big to broadcast)
      // reports IDENTICALLY — the route is a cost choice, never a
      // semantics choice
      val repShuffled = Pipeline.windowsContaminationScreen(spark, out,
          bench, "text", bw, k = 5, broadcastBench = false).collect()
      assert(repShuffled.map(_.toString).sorted.toSeq ==
        rep.map(_.toString).sorted.toSeq)
      // refusals: k too small; gram mass over the broadcast bound
      // (the refusal names the fallback)
      intercept[IllegalArgumentException] {
        Pipeline.windowsContaminationScreen(spark, out, bench, "text",
          bw, k = 1)
      }
      val eBig = intercept[IllegalArgumentException] {
        Pipeline.windowsContaminationScreen(spark, out, bench, "text",
          bw, k = 5, maxBenchGrams = 0L)
      }
      assert(eBig.getMessage.contains("broadcastBench"), eBig.getMessage)
    } finally {
      Seq("wcs_bpe_bpe", "wcs_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("windowsContaminationScreenText: word-shingle screen over a text landing, route equality, refusals") {
    val tmp = tmpDir("graft_wst_idx")
    val out = tmpDir("graft_wst_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "wst_t", tmp)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 240),
        df(docSchema), "doc_id", "text", "wst_t", tmp, out, 64L, "t01",
        redactPii = false)
      // a benchmark holding a 5-word run from a LANDED doc must hit
      val landedText = docs.filter(col("doc_id") === 210)
        .head().getString(1)
      val phrase = landedText.split(" ").slice(3, 8).mkString(" ")
      val bench = df(docSchema, Row(900L, "zz yy " + phrase + " xx ww"))
      val rep = Pipeline.windowsContaminationScreenText(spark, out,
        bench, "text", k = 5).collect()
      assert(rep.nonEmpty && rep.forall(_.getAs[Long]("n_hits") > 0),
        rep.mkString(";"))
      // the shuffled route reports identically
      val rep2 = Pipeline.windowsContaminationScreenText(spark, out,
        bench, "text", k = 5, broadcastBench = false).collect()
      assert(rep2.map(_.toString).sorted.toSeq ==
        rep.map(_.toString).sorted.toSeq)
      // an unrelated benchmark reports nothing
      assert(Pipeline.windowsContaminationScreenText(spark, out,
        df(docSchema, Row(901L, "qq1 qq2 qq3 qq4 qq5 qq6")), "text",
        k = 5).count() == 0)
      intercept[IllegalArgumentException] {
        Pipeline.windowsContaminationScreenText(spark, out, bench,
          "text", k = 1)
      }
      val eBig = intercept[IllegalArgumentException] {
        Pipeline.windowsContaminationScreenText(spark, out, bench,
          "text", k = 5, maxBenchShingles = 0L)
      }
      assert(eBig.getMessage.contains("broadcastBench"), eBig.getMessage)
    } finally {
      dropIndex("wst_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("strided fsck closed form holds across geometries: overlap, chop-degenerate, subsampling") {
    val tmp = tmpDir("graft_sgeo_idx")
    val mdl = tmpDir("graft_sgeo_bpe")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300),
        "text", "sgeo_bpe", mdl, numMerges = 6)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "sgeo_t", tmp)
      val shard = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      // stride < size (overlap), stride == size (bit-degenerate to the
      // chop), stride > size (subsampling: gap tokens land in NO
      // window) — the closed form must price all three
      for (((size, stride), ix) <- Seq((60L, 25L), (48L, 48L),
          (30L, 70L)).zipWithIndex) {
        val out = tmpDir(s"graft_sgeo_out$ix")
        try {
          val bw = Pipeline.BpeWindows("sgeo_bpe", mdl,
            stride = Some(stride))
          Pipeline.ingestWindowsShard(shard, df(docSchema), "doc_id",
            "text", "sgeo_t", tmp, out, size, s"g$ix",
            redactPii = false, bpeWindows = Some(bw))
          val rep = Pipeline.windowsReport(spark, out, Some(docs),
            bpeWindows = Some(bw), windowSize = Some(size)).collect()
          assert(rep.nonEmpty && rep.forall(
            _.getAs[Boolean]("tokens_match")),
            s"geometry ($size, $stride): ${rep.mkString(";")}")
          // tokens_match green means the closed form priced this
          // geometry's landed mass exactly (overlap blow-up, the
          // chop-equal case, and the subsampled deficit respectively)
        } finally org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(out))
      }
    } finally {
      dropIndex("sgeo_t")
      Seq("sgeo_bpe_bpe", "sgeo_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("loadWindowsEpoch: each epoch streams the same window set in its own deterministic permutation") {
    val tmp = tmpDir("graft_lwe_idx")
    val out = tmpDir("graft_lwe_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "lwe_t", tmp)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 240),
        df(docSchema), "doc_id", "text", "lwe_t", tmp, out, 64L, "d01",
        redactPii = false)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 240 && col("doc_id") < 280),
        df(docSchema), "doc_id", "text", "lwe_t", tmp, out, 64L, "d02",
        redactPii = false)
      val canonical = Pipeline.loadWindows(spark, out, "train")
        .select("global_id").collect().map(_.getLong(0)).toSeq
      assert(canonical.size > 10, "fixture must land enough windows")
      def stream(epoch: Long, seed: Long = 0L): Seq[Long] =
        Pipeline.loadWindowsEpoch(spark, out, "train", epoch, seed)
          .select("global_id").collect().map(_.getLong(0)).toSeq
      val e0 = stream(0L)
      val e1 = stream(1L)
      // same SET every epoch — the landed bytes never move
      assert(e0.sorted == canonical && e1.sorted == canonical)
      // different ORDER per epoch, and not the canonical order either
      assert(e0 != e1, "epochs must draw different permutations")
      assert(e1 != canonical, "an epoch shuffle must actually shuffle")
      // deterministic across runs for the same (epoch, seed)
      assert(stream(1L) == e1)
      // the seed is a second independent axis
      assert(stream(1L, seed = 42L) != e1)
      // the stream really is sorted by its order key (resumption
      // bookkeeping depends on it)
      val ordered = Pipeline.loadWindowsEpoch(spark, out, "train", 1L)
        .select("epoch_ord", "global_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(ordered == ordered.sorted, "stream must follow (epoch_ord, id)")
      intercept[IllegalArgumentException] {
        Pipeline.loadWindowsEpoch(spark, out, "train", -1L)
      }
    } finally {
      dropIndex("lwe_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("loadWindows fim: the transform rides the load stream — equals fimTransform over the plain load, deterministic, text landings refuse") {
    val tmp = tmpDir("graft_lwf_idx")
    val mdl = tmpDir("graft_lwf_bpe")
    val out = tmpDir("graft_lwf_out")
    val outText = tmpDir("graft_lwf_outt")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "lwf_bpe", mdl, numMerges = 6)
      val bw = Pipeline.BpeWindows("lwf_bpe", mdl)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "lwf_t", tmp)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 260),
        df(docSchema), "doc_id", "text", "lwf_t", tmp, out, 64L, "d01",
        redactPii = false, bpeWindows = Some(bw))
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 260 && col("doc_id") < 280),
        df(docSchema), "doc_id", "text", "lwf_t", tmp, outText, 64L,
        "d01", redactPii = false) // text landing: no window_ids
      val fs = graft.llm.Bpe.FimSpec(rate = 0.5, seed = 11L,
        preId = 9001L, sufId = 9002L, midId = 9003L)
      def keyed(d: org.apache.spark.sql.DataFrame) =
        d.select("global_id", "window_ids", "fim_applied").collect()
          .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getBoolean(2)))
          .toMap
      val viaLoader = keyed(Pipeline.loadWindows(spark, out, "train",
        fim = Some(fs)))
      val viaTransform = keyed(graft.llm.Bpe.fimTransform(
        Pipeline.loadWindows(spark, out, "train"), "global_id",
        "window_ids", fs.rate, fs.seed, fs.preId, fs.sufId, fs.midId))
      assert(viaLoader.nonEmpty && viaLoader === viaTransform)
      // both populations present at rate 0.5; deterministic re-load
      assert(viaLoader.values.exists(_._2) &&
        viaLoader.values.exists(!_._2))
      assert(keyed(Pipeline.loadWindows(spark, out, "train",
        fim = Some(fs))) === viaLoader)
      // the loader's stream order is unchanged by the transform
      val order = Pipeline.loadWindows(spark, out, "train", Some(fs))
        .select("global_id").collect().map(_.getLong(0)).toSeq
      assert(order == order.sorted)
      // a text landing has no id sequence to rearrange
      val e = intercept[IllegalArgumentException] {
        Pipeline.loadWindows(spark, outText, "train", fim = Some(fs))
      }
      assert(e.getMessage.contains("ID landings"))
      // SPAN CORRUPTION rides the same loader: equals spanCorrupt over
      // the plain load, key-deterministic, same refusals
      val ds = graft.llm.Denoise.SpanSpec(sentinelBase = 9100L,
        spanLen = 3, blockSize = 20, seed = 5L)
      def dkeyed(d: org.apache.spark.sql.DataFrame) =
        d.select("global_id", "window_ids", "target_ids", "n_spans")
          .collect()
          .map(r => r.getLong(0) ->
            (r.getSeq[Long](1), r.getSeq[Long](2), r.getLong(3)))
          .toMap
      val dViaLoader = dkeyed(Pipeline.loadWindows(spark, out, "train",
        denoise = Some(ds)))
      val dViaOp = dkeyed(graft.llm.Denoise.spanCorrupt(
        Pipeline.loadWindows(spark, out, "train"), "global_id",
        "window_ids", ds.sentinelBase, ds.spanLen, ds.blockSize, ds.seed))
      assert(dViaLoader.nonEmpty && dViaLoader === dViaOp)
      assert(dViaLoader.values.exists(_._3 >= 1L),
        "64-id windows must carry at least 3 complete blocks")
      assert(intercept[IllegalArgumentException] {
        Pipeline.loadWindows(spark, outText, "train", denoise = Some(ds))
      }.getMessage.contains("ID landings"))
      assert(intercept[IllegalArgumentException] {
        Pipeline.loadWindows(spark, out, "train", fim = Some(fs),
          denoise = Some(ds))
      }.getMessage.contains("mutually exclusive"))
    } finally {
      dropIndex("lwf_t")
      Seq("lwf_bpe_bpe", "lwf_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl, out, outText).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("STRIDED eval windows: overlapping landing, closed-form fsck, O(1) replay, loader order, refusals") {
    val tmp = tmpDir("graft_sev_idx")
    val mdl = tmpDir("graft_sev_bpe")
    val out = tmpDir("graft_sev_out")
    val wsize = 60L
    val stride = 25L
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "sev_bpe", mdl, numMerges = 6)
      val bw = Pipeline.BpeWindows("sev_bpe", mdl, stride = Some(stride))
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "sev_t", tmp)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      val c1 = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "sev_t", tmp, out, wsize, "e01", redactPii = false,
        bpeWindows = Some(bw))
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 240 && col("doc_id") < 280),
        df(docSchema), "doc_id", "text", "sev_t", tmp, out, wsize, "e02",
        redactPii = false, bpeWindows = Some(bw))
      val win = spark.read.parquet(out)
      assert(win.filter(size(col("window_ids")) =!= col("n_tokens"))
        .count() == 0)
      // per (shard, split): dense ids 0..wmax with wmax = ⌊(T−1)/stride⌋,
      // every non-clipped window EXACTLY windowSize, and consecutive
      // windows OVERLAP by size − stride ids (the eval layout's defining
      // property — the training chop has zero overlap)
      val merges = graft.llm.Bpe.mergeList(spark.table("sev_bpe_bpe"))
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
        .withColumn("shard_label", col("shard_label").cast("string"))
      val massPerSplit = graft.llm.Bpe.tokenCounts(
          docs.join(sidecar, Seq("doc_id"), "left_semi"), "doc_id",
          "text", merges)
        .join(sidecar, Seq("doc_id"))
        .groupBy("shard_label", "split")
        .agg(sum("n_tokens").as("T"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val bySplit = win
        .withColumn("shard_label", col("shard_label").cast("string"))
        .select("shard_label", "split", "window_id", "window_ids",
          "n_tokens")
        .collect()
        .groupBy(r => (r.getString(0), r.getString(1)))
      var overlapsChecked = 0
      bySplit.foreach { case (key, rows) =>
        val bigT = massPerSplit(key)
        val sorted = rows.sortBy(_.getLong(2))
        assert(sorted.map(_.getLong(2)).toSeq ==
          (0L to (bigT - 1) / stride).toSeq,
          s"$key: ids must be dense to floor((T-1)/stride)")
        sorted.foreach { r =>
          val w = r.getLong(2)
          val expect = math.min(w * stride + wsize, bigT) - w * stride
          assert(r.getLong(4) == expect,
            s"$key window $w: ${r.getLong(4)} != $expect (T=$bigT)")
        }
        sorted.sliding(2).foreach {
          case Array(a, b) if a.getLong(4) == wsize =>
            val aIds = a.getSeq[Long](3)
            val bIds = b.getSeq[Long](3)
            assert(aIds.drop(stride.toInt) ==
              bIds.take((wsize - stride).toInt),
              s"$key: windows ${a.getLong(2)}/${b.getLong(2)} must " +
                "overlap by wsize - stride ids")
            overlapsChecked += 1
          case _ => ()
        }
      }
      assert(overlapsChecked > 0, "fixture must exercise real overlaps")
      // closed-form fsck: green with the stride + windowSize; refuses
      // without the size; the CHOP law against this landing must flag
      val rep = Pipeline.windowsReport(spark, out, Some(docs),
        bpeWindows = Some(bw), windowSize = Some(wsize)).collect()
      assert(rep.nonEmpty &&
        rep.forall(_.getAs[Boolean]("tokens_match")), rep.mkString(";"))
      val eNoSize = intercept[IllegalArgumentException] {
        Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(bw)).collect()
      }
      assert(eNoSize.getMessage.contains("windowSize"), eNoSize.getMessage)
      val repChop = Pipeline.windowsReport(spark, out, Some(docs),
        bpeWindows = Some(Pipeline.BpeWindows("sev_bpe", mdl))).collect()
      assert(repChop.forall(!_.getAs[Boolean]("tokens_match")),
        "the chop conservation law must flag a strided landing")
      // O(1) replay returns the recorded manifest counts
      val c1b = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "sev_t", tmp, out, wsize, "e01", redactPii = false,
        bpeWindows = Some(bw))
      assert(c1b == c1)
      // the loader is layout-agnostic: strictly increasing global ids
      val loaded = Pipeline.loadWindows(spark, out, "train")
        .select("global_id").toLocalIterator()
      var expect = 0L
      while (loaded.hasNext) {
        assert(loaded.next().getLong(0) == expect); expect += 1
      }
      assert(expect > 0)
      // spec refusals: the eval layout is chop-shaped and unspanned
      intercept[IllegalArgumentException] {
        Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id", "text",
          "sev_t", tmp, out, wsize, "e03", redactPii = false,
          bpeWindows = Some(bw.copy(packed = true)))
      }
      intercept[IllegalArgumentException] {
        Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id", "text",
          "sev_t", tmp, out, wsize, "e04", redactPii = false,
          bpeWindows = Some(bw.copy(docSpans = true)))
      }
    } finally {
      dropIndex("sev_t")
      Seq("sev_bpe_bpe", "sev_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("EOD insertion + doc-boundary spans: id windows carry the trainer contract") {
    val tmp = tmpDir("graft_eod_idx")
    val mdl = tmpDir("graft_eod_bpe")
    val out = tmpDir("graft_eod_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "eodw_bpe", mdl, numMerges = 6)
      val vocab = graft.llm.Bpe.vocabMap(spark.table("eodw_bpe_bpe_vocab"))
      val eod = vocab.values.max + 1L
      val bw = Pipeline.BpeWindows("eodw_bpe", mdl, eodId = Some(eod),
        docSpans = true)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "eodw_t", tmp)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id", "text",
        "eodw_t", tmp, out, 64L, "d01", redactPii = false,
        bpeWindows = Some(bw))
      val win = spark.read.parquet(out)
      assert(win.columns.sorted.sameElements(Array("doc_spans", "n_tokens",
        "shard_label", "split", "window_id", "window_ids")))
      // conservation in the EOD-inclusive unit: window mass == BPE
      // tokens + exactly one EOD per landed doc
      val merges = graft.llm.Bpe.mergeList(spark.table("eodw_bpe_bpe"))
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
      val landedDocs = docs.join(sidecar.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val bpeMass = graft.llm.Bpe.tokenCounts(landedDocs, "doc_id",
        "text", merges).agg(sum("n_tokens")).head().getLong(0)
      val nDocs = landedDocs.count()
      val winMass = win.agg(sum("n_tokens")).head().getLong(0)
      assert(winMass == bpeMass + nDocs,
        s"EOD-inclusive conservation: $winMass != $bpeMass + $nDocs")
      // every doc's trailing EOD id is present exactly once in the
      // flattened stream
      val eodCount = win.select(explode(col("window_ids")).as("id"))
        .filter(col("id") === eod).count()
      assert(eodCount == nDocs, s"one EOD per doc: $eodCount != $nDocs")
      // the fsck counts in the same unit
      assert(Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(bw))
        .collect().forall(_.getAs[Boolean]("tokens_match")))
      // spans TILE each window exactly: sum(len) == n_tokens, offsets
      // contiguous from 0, and each span's ids slice belongs to its doc
      val rows = win.select("window_ids", "n_tokens", "doc_spans")
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val n = r.getLong(1)
        val spans = r.getSeq[org.apache.spark.sql.Row](2)
        assert(spans.map(_.getLong(2)).sum == n,
          s"span lengths must tile the window: $spans vs $n")
        var off = 0L
        spans.foreach { sp =>
          assert(sp.getLong(1) == off,
            s"span offsets must be contiguous: $spans")
          off += sp.getLong(2)
        }
      }
      // the loader carries the metadata through
      val loaded = Pipeline.loadWindows(spark, out, "train").columns
      assert(loaded.contains("doc_spans") && loaded.contains("window_ids"))
      // an eodId colliding with a vocab id refuses loudly
      val bad = intercept[IllegalArgumentException] {
        graft.llm.Bpe.assembleWindowsIds(s1, "doc_id", "text", 64L, 0L,
          merges, vocab, eodId = Some(vocab.values.max))
      }
      assert(bad.getMessage.contains("collides"), bad.getMessage)
    } finally {
      dropIndex("eodw_t")
      Seq("eodw_bpe_bpe", "eodw_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("WindowsTarget: the fleet sweep surfaces crashed shards and conservation drift on a windows landing") {
    val tmp = tmpDir("graft_wmt_idx")
    val out = tmpDir("graft_wmt_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "wmt_t", tmp)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 200 && col("doc_id") < 230),
        df(docSchema), "doc_id", "text", "wmt_t", tmp, out, 64L, "d01",
        redactPii = false)
      Pipeline.ingestWindowsShard(
        docs.filter(col("doc_id") >= 230 && col("doc_id") < 260),
        df(docSchema), "doc_id", "text", "wmt_t", tmp, out, 64L, "d02",
        redactPii = false)
      def sweep(store: Option[org.apache.spark.sql.DataFrame]) =
        graft.llm.Maintain.maintainAll(spark, Seq(
          "windows" -> graft.llm.Maintain.WindowsTarget(out, store)))
          .collect()
          .map(r => r.getString(1) -> (r.getDouble(2), r.getString(5)))
          .toMap
      // healthy: nothing indicated, conservation green with the store
      val healthy = sweep(Some(docs))
      assert(healthy("uncommitted_shards") == ((0.0, "none")), healthy)
      assert(healthy("token_conservation") == ((0.0, "none")), healthy)
      // the sweep NEVER fires on this sink (observe-and-indicate)
      assert(graft.llm.Maintain.maintainAll(spark, Seq(
          "windows" -> graft.llm.Maintain.WindowsTarget(out)))
        .filter(col("fired")).isEmpty)
      // a crashed landing (manifest missing) is indicated by label
      assert(new java.io.File(out, "_graft_wshard_d02.json").delete())
      val crashed = sweep(None)
      assert(crashed("uncommitted_shards")._1 == 1.0, crashed)
      assert(crashed("uncommitted_shards")._2.contains("d02"), crashed)
      assert(crashed("token_conservation")._2.contains("skipped"))
      // a drifted text store is indicated per shard
      val drifted = docs.withColumn("text",
        concat(col("text"), lit(" extra")))
      val drift = sweep(Some(drifted))
      assert(drift("token_conservation")._1 == 2.0, drift)
      // FILL observable (r14 cont): healthy chop landing fills well
      // (only per-(shard, split) tails are short at C=64 << shard mass)
      val fillOk = graft.llm.Maintain.maintainAll(spark, Seq(
          "windows" -> graft.llm.Maintain.WindowsTarget(out,
            windowSize = Some(64L))))
        .filter(col("check") === "window_fill").head()
      assert(fillOk.getDouble(2) > 0.5 && fillOk.getString(5) == "none",
        fillOk.toString)
      // a degenerate PACKED landing (segmentDocs = 1 at a huge window:
      // one window per doc, almost all pad) is indicated — the waste
      // eye the trainer's pad budget needs
      val mdl = tmpDir("graft_wmt_bpe")
      try {
        graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 200),
          "text", "wmt_bpe", mdl, numMerges = 4)
        val vocab = graft.llm.Bpe.vocabMap(spark.table("wmt_bpe_bpe_vocab"))
        val out2 = tmpDir("graft_wmt_out2")
        try {
          Pipeline.ingestWindowsShard(
            docs.filter(col("doc_id") >= 260 && col("doc_id") < 280),
            df(docSchema), "doc_id", "text", "wmt_t", tmp, out2, 4096L,
            "d01", redactPii = false,
            bpeWindows = Some(Pipeline.BpeWindows("wmt_bpe", mdl,
              packed = true, padId = Some(vocab.values.max + 1L),
              segmentDocs = 1)))
          val lowFill = graft.llm.Maintain.maintainWindows(spark, out2,
            windowSize = Some(4096L)).collect()
            .find(_.getString(0) == "window_fill").get
          assert(lowFill.getDouble(1) < 0.5 &&
            lowFill.getString(4).contains("segmentDocs"),
            lowFill.toString)
        } finally {
          org.apache.commons.io.FileUtils.deleteDirectory(
            new java.io.File(out2))
        }
      } finally {
        Seq("wmt_bpe_bpe", "wmt_bpe_bpe_vocab").foreach(t =>
          spark.sql(s"DROP TABLE IF EXISTS $t"))
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(mdl))
      }
    } finally {
      dropIndex("wmt_t")
      Seq(tmp, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("capstone: GPT-2 byte-level windows landing with EOD + spans reads back as text through the loader") {
    val tmp = tmpDir("graft_cap_idx")
    val mdl = tmpDir("graft_cap_bpe")
    val out = tmpDir("graft_cap_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      // the REAL tokenizer shape: GPT-2 regex pre-tokenization over
      // byte-level symbols, all-256 base vocab — stamped once
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300),
        "text", "cap_bpe", mdl, numMerges = 12, byteLevel = true,
        wordPattern = Some(graft.llm.Bpe.Gpt2WordPattern))
      val vocab = graft.llm.Bpe.vocabMap(spark.table("cap_bpe_bpe_vocab"))
      val eod = vocab.values.max + 1L
      val bw = Pipeline.BpeWindows("cap_bpe", mdl, eodId = Some(eod),
        docSpans = true)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "cap_t", tmp)
      val shard = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      Pipeline.ingestWindowsShard(shard, df(docSchema), "doc_id", "text",
        "cap_t", tmp, out, 128L, "d01", redactPii = false,
        bpeWindows = Some(bw))
      // loader -> detokenizer: the landed train split reads back as
      // TEXT — the landed docs' texts concatenated in the shard's
      // permutation order, EODs rendered as U+FFFD boundaries (the id
      // is deliberately outside the vocab)
      val loaded = Pipeline.loadWindows(spark, out, "train")
      val streamTxt = loaded
        .agg(graft.llm.Bpe.detokenizeIndexed(spark, "cap_bpe", mdl,
          flatten(transform(
            array_sort(collect_list(struct(col("global_id"),
              col("window_ids")))),
            s => s.getField("window_ids")))).as("t"))
        .head().getString(0)
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
        .filter(col("split") === "train").select("doc_id")
      val landedTrain = docs.join(sidecar, Seq("doc_id"), "left_semi")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(landedTrain.nonEmpty)
      val shardSeed = 0L ^
        scala.util.hashing.MurmurHash3.stringHash("d01").toLong
      def h(id: Long): Long = {
        val m = 2147483648L
        val c = ((id % m) + m) % m + shardSeed % m
        (((c % m) + m) % m * 2654435761L) % 4294967296L
      }
      val want = landedTrain.sortBy { case (i, _) => (h(i), i) }
        .map(_._2).mkString("\ufffd") + "\ufffd"
      assert(streamTxt == want,
        s"loader+detok must reproduce the landed train text: " +
          s"${streamTxt.take(120)}... != ${want.take(120)}...")
      // conservation in the stamped unit (GPT-2 words, byte symbols,
      // +1 EOD per doc) — the fsck agrees
      assert(Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(bw))
        .collect().forall(_.getAs[Boolean]("tokens_match")))
      // spans still tile under the composed geometry
      spark.read.parquet(out).select("n_tokens", "doc_spans").collect()
        .foreach { r =>
          assert(r.getSeq[org.apache.spark.sql.Row](1)
            .map(_.getLong(2)).sum == r.getLong(0))
        }
    } finally {
      dropIndex("cap_t")
      Seq("cap_bpe_bpe", "cap_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }

  test("PACKED id windows through the landing: fixed shape, no-split law, fsck, replay, retraction") {
    val tmp = tmpDir("graft_pck_idx")
    val mdl = tmpDir("graft_pck_bpe")
    val out = tmpDir("graft_pck_out")
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
      graft.llm.Bpe.writeBpeModel(docs.filter(col("doc_id") < 300), "text",
        "pck_bpe", mdl, numMerges = 6)
      val vocab = graft.llm.Bpe.vocabMap(spark.table("pck_bpe_bpe_vocab"))
      val eod = vocab.values.max + 1L
      val pad = eod + 1L
      val bw = Pipeline.BpeWindows("pck_bpe", mdl, eodId = Some(eod),
        docSpans = true, packed = true, padId = Some(pad),
        segmentDocs = 8)
      Dedup.writeNearDupIndex(docs.filter(col("doc_id") < 200), "doc_id",
        "text", "pck_t", tmp)
      val s1 = docs.filter(col("doc_id") >= 200 && col("doc_id") < 240)
      val c1 = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "pck_t", tmp, out, 64L, "d01", redactPii = false,
        bpeWindows = Some(bw))
      val win = spark.read.parquet(out)
      // FIXED SHAPE: every window is exactly 64 ids, pads only in the
      // tail region [n_tokens, 64), and n_tokens counts real ids only
      win.select("window_ids", "n_tokens").collect().foreach { r =>
        val ids = r.getSeq[Long](0)
        val n = r.getLong(1)
        assert(ids.length == 64)
        assert(n >= 1L && n <= 64L)
        assert(ids.take(n.toInt).forall(_ != pad))
        assert(ids.drop(n.toInt).forall(_ == pad))
      }
      // NO-SPLIT LAW: every landed doc whose BPE mass + EOD fits in 64
      // appears in exactly one window's spans
      val merges = graft.llm.Bpe.mergeList(spark.table("pck_bpe_bpe"))
      val sidecar = spark.read.parquet(s"$out/_docsidecar")
      val landedDocs = docs.join(sidecar.select("doc_id"), Seq("doc_id"),
        "left_semi")
      val massByDoc = graft.llm.Bpe.tokenCounts(landedDocs, "doc_id",
        "text", merges).collect()
        .map(r => r.getLong(0) -> (r.getLong(1) + 1L)).toMap
      val spanCount = win.select(explode(col("doc_spans")).as("s"))
        .select(col("s.id")).collect().map(_.getLong(0))
        .groupBy(identity).view.mapValues(_.length).toMap
      massByDoc.foreach { case (id, m) =>
        if (m <= 64L) assert(spanCount(id) == 1,
          s"doc $id (mass $m <= 64) split across ${spanCount(id)} windows")
        else assert(spanCount(id) == ((m + 63L) / 64L).toInt,
          s"oversized doc $id (mass $m) must tile into ceil pieces")
      }
      // conservation fsck counts REAL ids (pad excluded), green
      assert(Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(bw))
        .collect().forall(_.getAs[Boolean]("tokens_match")))
      // O(1) replay; retraction drops exactly the victim's mass + EOD
      val c1b = Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id",
        "text", "pck_t", tmp, out, 64L, "d01", redactPii = false,
        bpeWindows = Some(bw))
      assert(c1b == c1)
      val winMass = win.agg(sum("n_tokens")).head().getLong(0)
      val victim = massByDoc.keys.min
      val r = Pipeline.retractFromWindows(spark, out,
        df(StructType(Seq(StructField("doc_id", LongType))), Row(victim)),
        "doc_id", docs, "text", 64L, bpeWindows = Some(bw))
      assert(r("docs") == 1L && r("shards") == 1L, s"$r")
      val winMass2 = spark.read.parquet(out)
        .agg(sum("n_tokens")).head().getLong(0)
      assert(winMass2 == winMass - massByDoc(victim),
        s"$winMass -> $winMass2, victim ${massByDoc(victim)}")
      // refusals: padId without packed; packed + fullWindowsOnly
      intercept[IllegalArgumentException] {
        Pipeline.windowsReport(spark, out, Some(docs),
          bpeWindows = Some(bw.copy(packed = false)))
      }
      intercept[IllegalArgumentException] {
        Pipeline.ingestWindowsShard(s1, df(docSchema), "doc_id", "text",
          "pck_t", tmp, out, 64L, "d99", redactPii = false,
          fullWindowsOnly = true, bpeWindows = Some(bw))
      }
    } finally {
      dropIndex("pck_t")
      Seq("pck_bpe_bpe", "pck_bpe_bpe_vocab").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(tmp, mdl, out).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
  }
}
