package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Multimodal}

/** Multimodal perceptual dedup (r13): dHash over REAL decoded PNGs and
  * envelope hashes over REAL parsed WAVs, paired through the shared
  * Hamming banding core. The planted-variant fixtures are byte-distinct
  * re-encodes whose hashes are provably close (see the Multimodal
  * scaladocs for the bounds), so these specs pin: the real-codec hash
  * path, the Hamming bound of each perturbation, banding == brute-force
  * completeness, flagged-row exclusion, and the drop-composite. */
class MultimodalDedupSpec extends SparkTestBase {

  private val idSchema = StructType(Seq(StructField("doc_id", LongType)))

  private def ids(n: Long, from: Long = 0L) =
    df(idSchema, (from until (from + n)).map(Row(_)): _*)

  /** The dHash recomputed from the synthetic-pixel arithmetic alone
    * (no codec) — what the DuckDB oracle does. */
  private def expectedDhash(id: Long, pert: Boolean): Long = {
    val (w, h) = Multimodal.dims(id)
    val gray = Array.ofDim[Int](8, 9)
    for (gy <- 0 until 8; gx <- 0 until 9) {
      val sx = gx * w / 9
      val sy = gy * h / 8
      val (r0, g, b) = Multimodal.pixel(id, sx, sy)
      val r = if (pert && sx == 0 && sy == 0)
        (r0 + Multimodal.VariantRedDelta) % 256 else r0
      gray(gy)(gx) = (299 * r + 587 * g + 114 * b) / 1000
    }
    var hash = 0L
    for (gy <- 0 until 8; gx <- 0 until 8)
      if (gray(gy)(gx + 1) > gray(gy)(gx)) hash |= (1L << (gy * 8 + gx))
    hash
  }

  test("dhashFeatures: real PNG decode reproduces the arithmetic dHash") {
    val got = Multimodal.dhashFeatures(
        Multimodal.synthPng(ids(40), "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(got.length == 40)
    got.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.dims(id)
      assert(r.getInt(1) == w && r.getInt(2) == h)
      assert(r.getLong(3) == expectedDhash(id, pert = false),
        s"dhash mismatch for id=$id")
    }
  }

  test("variant perturbation keeps dHash within Hamming 3 and stays byte-distinct") {
    val base = Multimodal.synthPng(ids(60), "doc_id")
    val vari = Multimodal.synthPngVariant(
      ids(60).select(col("doc_id") + 100000L as "doc_id",
        col("doc_id") as "src"), "doc_id", "src")
    val bh = Multimodal.dhashFeatures(base, "doc_id", "payload")
      .select(col("doc_id"), col("dhash").as("hb"))
    val vh = Multimodal.dhashFeatures(vari, "doc_id", "payload")
      .select((col("doc_id") - 100000L).as("doc_id"), col("dhash").as("hv"))
    val joined = bh.join(vh, "doc_id")
      .select(col("doc_id"), bit_count(col("hb").bitwiseXOR(col("hv"))))
      .collect()
    assert(joined.length == 60)
    joined.foreach(r => assert(r.getInt(1) <= 3,
      s"variant of ${r.getLong(0)} drifted ${r.getInt(1)} bits"))
    // byte-distinct: exact (payload-hash) dedup must NOT see the copies
    val pays = base.union(vari.select(col("doc_id"), col("payload")))
      .select(md5(col("payload"))).distinct().count()
    assert(pays == 120L)
  }

  test("imageNearDupPairs == brute-force popcount join (banding completeness)") {
    val base = Multimodal.synthPng(ids(80), "doc_id")
    val vari = Multimodal.synthPngVariant(
      ids(80).filter(col("doc_id") % 7 === 0)
        .select(col("doc_id") + 100000L as "doc_id", col("doc_id") as "src"),
      "doc_id", "src")
    val corpus = base.union(vari)
    val got = Dedup.imageNearDupPairs(corpus, "doc_id", "payload")
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sigs = Multimodal.dhashFeatures(corpus, "doc_id", "payload")
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.dhash").bitwiseXOR(col("b.dhash"))).cast("int").as("hm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= 3).sorted
    assert(got.toSeq == brute.toSeq)
    // every planted variant pair is found (its Hamming bound is ≤ 3)
    val pairSet = got.map(p => (p._1, p._2)).toSet
    (0L until 80L).filter(_ % 7 == 0).foreach { id =>
      assert(pairSet.contains((id, id + 100000L)),
        s"planted variant pair ($id, ${id + 100000L}) missed")
    }
  }

  test("corrupt payloads are flagged and excluded from pairing") {
    val base = Multimodal.synthPng(ids(10), "doc_id")
    val junkSchema = Multimodal.payloadSchema
    val junk = df(junkSchema,
      Row(900L, Array[Byte](1, 2, 3)),
      Row(901L, Array[Byte](9, 9, 9, 9)))
    val corpus = base.union(junk)
    val feats = Multimodal.dhashFeatures(corpus, "doc_id", "payload")
      .filter(col("width") < 0).collect()
    assert(feats.map(_.getLong(0)).toSet == Set(900L, 901L))
    // two corrupt rows share dhash 0 but must NOT pair
    val pairs = Dedup.imageNearDupPairs(corpus, "doc_id", "payload")
      .filter(col("id_a") >= 900L || col("id_b") >= 900L).count()
    assert(pairs == 0L)
  }

  test("dropImageNearDuplicates keeps component minima, never flagged rows") {
    val base = Multimodal.synthPng(ids(30), "doc_id")
    val vari = Multimodal.synthPngVariant(
      ids(30).filter(col("doc_id") % 3 === 0)
        .select(col("doc_id") + 100000L as "doc_id", col("doc_id") as "src"),
      "doc_id", "src")
    val junk = df(Multimodal.payloadSchema, Row(900L, Array[Byte](0, 1)))
    val corpus = base.union(vari).union(junk)
    val kept = Dedup.dropImageNearDuplicates(corpus, "doc_id", "payload")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // expected survivors: transitive components over the pair graph
    // (incidental base-image near-dups included), keep each minimum
    val pairs = Dedup.imageNearDupPairs(corpus, "doc_id", "payload")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val allIds = (0L until 30L) ++
      (0L until 30L).filter(_ % 3 == 0).map(_ + 100000L) :+ 900L
    val expected = allIds.filter(id => find(id) == id).toSet
    assert(kept == expected)
    // in particular: every planted variant drops, flagged rows never do
    (0L until 30L).filter(_ % 3 == 0)
      .foreach(id => assert(!kept.contains(id + 100000L)))
    assert(kept.contains(900L), "undecodable row must never drop")
  }

  test("cap-and-split keeps identical images CONNECTED across bands") {
    // three byte-identical renders of the same image under distinct ids:
    // every band bucket holds all three, a cap of 2 splits each bucket.
    // The contract is not pair-completeness (a pair can lose every band
    // with probability (1/nSub)^bands — documented trade-off) but
    // CONNECTIVITY: the band-mixed high-bit salt splits differently per
    // band, so the component stays connected and the drop-composite
    // still collapses it to one survivor. The pre-r13 salt (low bits,
    // band in the multiplier) split all bands identically — this
    // fixture caught it finding only (1,3) and leaving 2 unreachable.
    val payload = Multimodal.synthPng(df(idSchema, Row(7L)), "doc_id")
      .select("payload").collect()(0).getAs[Array[Byte]](0)
    val same = df(Multimodal.payloadSchema,
      Row(1L, payload), Row(2L, payload), Row(3L, payload))
    val pairs = Dedup.imageNearDupPairs(same, "doc_id", "payload",
        hammingK = 3, maxBucketSize = 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(Set((1L, 2L), (1L, 3L), (2L, 3L))) && pairs.size >= 2,
      s"got $pairs")
    // connectivity: all three ids in one component → one survivor
    val kept = Dedup.dropImageNearDuplicates(same, "doc_id", "payload",
        hammingK = 3, maxBucketSize = 2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L))
  }

  // ---- the persisted dHash index (the eleventh maintained family) ----

  test("dhash index: gate drops variants and replays, lands fresh; append is replay-safe") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dhi").toString
    try {
      val corpus = Multimodal.synthPng(ids(30), "doc_id")
      Dedup.writeDhashIndex(corpus, "doc_id", "payload", "dhi_t", tmp)
      // shard: 10 retouched variants of corpus images (+100000), one
      // crash-replayed corpus row (same id 5, same payload), 10 fresh
      val variants = Multimodal.synthPngVariant(
        ids(30).filter(col("doc_id") % 3 === 0)
          .select(col("doc_id") + 100000L as "doc_id", col("doc_id") as "src"),
        "doc_id", "src")
      val replay = corpus.filter(col("doc_id") === 5L)
      val fresh = Multimodal.synthPng(ids(10, from = 500L), "doc_id")
      val junk = df(Multimodal.payloadSchema, Row(900L, Array[Byte](7)))
      val shard = variants.union(replay).union(fresh).union(junk)
      val landed = Dedup.appendImageShardToIndex(shard, "doc_id",
          "payload", "dhi_t", tmp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // variants: Hamming ≤ 3 of their corpus source → drop; the
      // replayed id 5 matches itself at Hamming 0 → drop; fresh land
      // unless incidentally colliding — verify against brute force
      // the undecodable arrival passes through to triage, unindexed
      assert(landed.contains(900L))
      assert(!landed.contains(5L))
      assert(landed.forall(_ >= 500L))
      val corpusSigs = Multimodal.dhashFeatures(corpus, "doc_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      val freshSigs = Multimodal.dhashFeatures(fresh, "doc_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      // shard-internal dedup first: fresh images near-dup of a smaller
      // SHARD member also drop; compute expected exactly
      val variantSigs = Multimodal.dhashFeatures(variants, "doc_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(3)))
      val shardSigs = (variantSigs ++ Array((5L, corpusSigs.find(_._1 == 5L).get._2)) ++ freshSigs).sortBy(_._1)
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val internalKept = shardSigs.filter { case (id, h) =>
        !shardSigs.exists { case (id2, h2) => id2 < id && ham(h, h2) <= 3 } }
      val expected = internalKept.filter { case (_, h) =>
        !corpusSigs.exists { case (_, hc) => ham(h, hc) <= 3 } }
        .map(_._1).toSet
      assert(landed == expected + 900L)
      // index grew by exactly the DECODABLE survivors' band rows (4 per
      // image — the junk pass-through is never indexed)
      assert(spark.table("dhi_t_dhash").count() == (30 + expected.size) * 4L)
      // REPLAY the same shard: every decodable row matches its landed
      // copy (or the corpus) → only the signature-less junk row passes
      // through again (no signature, no replay guard possible — triage
      // owns it), and the index is unchanged
      val landed2 = Dedup.appendImageShardToIndex(shard, "doc_id",
        "payload", "dhi_t", tmp).select("doc_id").collect()
        .map(_.getLong(0)).toSet
      assert(landed2 == Set(900L))
      assert(spark.table("dhi_t_dhash").count() == (30 + expected.size) * 4L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dhi_t_dhash")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("dhash index: corpus side reads in place (zero exchange); retraction re-lands") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_dhi2").toString
    try {
      val corpus = Multimodal.synthPng(ids(25), "doc_id")
      Dedup.writeDhashIndex(corpus, "doc_id", "payload", "dhi2_t", tmp)
      val shard = Multimodal.synthPngVariant(
        ids(25).select(col("doc_id") + 100000L as "doc_id",
          col("doc_id") as "src"), "doc_id", "src")
      val pairs = Dedup.imageNearDupPairsAgainstIndex(shard, "doc_id",
        "payload", "dhi2_t")
      val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // every variant pairs with its source (Hamming ≤ 3 by the bound)
      (0L until 25L).foreach(i => assert(got.contains((i, i + 100000L))))
      // the 100 TB contract: the index scan sits under NO shuffle
      val sp = pairs.queryExecution.sparkPlan
      def isIdxScan(p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
        case s: org.apache.spark.sql.execution.FileSourceScanExec =>
          s.relation.location.rootPaths.exists(_.toString.contains("graft_dhi2"))
        case _ => false
      }
      assert(sp.collect { case p if isIdxScan(p) => p }.size == 1)
      val shuffledIdx = sp.collect {
        case ex: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
          ex.collect { case p if isIdxScan(p) => p }
      }.flatten
      assert(shuffledIdx.isEmpty, "index scan rides a shuffle exchange")
      // hammingK must match the stamp
      val ex = intercept[IllegalArgumentException] {
        Dedup.imageNearDupPairsAgainstIndex(shard, "doc_id", "payload",
          "dhi2_t", hammingK = 7)
      }
      assert(ex.getMessage.contains("hammingK"))
      // RETRACTION: take down image 3 — its variant then lands again
      val (before, after) = Dedup.retractFromDhashIndex(spark, "dhi2_t",
        ids(1).select((col("doc_id") + 3L).as("doc_id")), "doc_id")
      assert(before == 25L * 4 && after == 24L * 4)
      val regate = Dedup.dropImageAgainstIndex(
        shard.filter(col("doc_id") === 100003L), "doc_id", "payload",
        "dhi2_t")
      assert(regate.count() == 1L, "retracted image must stop gating")
      // the fleet sweep reaches the family
      val sweep = graft.llm.Maintain.maintainAll(spark,
        Seq("dhi" -> graft.llm.Maintain.DhashIndexTarget("dhi2_t")))
        .collect()
      assert(sweep.exists(r => r.getString(1) == "retraction" &&
        r.getString(5).contains("native")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS dhi2_t_dhash")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  // ---- audio ----

  test("envelope index: gate drops edits and replays, append replay-safe, retraction re-lands") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ehi").toString
    try {
      val corpus = Multimodal.synthWav(ids(25), "doc_id")
      Dedup.writeEnvelopeIndex(corpus, "doc_id", "payload", "ehi_t", tmp)
      val edits = Multimodal.synthWavVariant(
        ids(25).filter(col("doc_id") % 5 === 0)
          .select(col("doc_id") + 200000L as "doc_id", col("doc_id") as "src"),
        "doc_id", "src")
      val replay = corpus.filter(col("doc_id") === 3L)
      val fresh = Multimodal.synthWav(ids(5, from = 500L), "doc_id")
      val shard = edits.union(replay).union(fresh)
      val got = Dedup.appendAudioShardToIndex(shard, "doc_id", "payload",
          "ehi_t", tmp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!got.contains(3L), "same-id replay must drop at Hamming 0")
      assert(got.forall(_ >= 500L), s"edits must drop: $got")
      // replay the whole shard: nothing lands, index unchanged
      val n1 = spark.table("ehi_t_ehash").count()
      assert(Dedup.appendAudioShardToIndex(shard, "doc_id", "payload",
        "ehi_t", tmp).count() == 0L)
      assert(spark.table("ehi_t_ehash").count() == n1)
      // retraction re-admits content; the fleet sweep reaches the family
      val (b, a) = Dedup.retractFromEnvelopeIndex(spark, "ehi_t",
        ids(1).select((col("doc_id") + 10L).as("doc_id")), "doc_id")
      assert(b - a == 4L, s"one recording = 4 band rows, got $b -> $a")
      val regate = Dedup.dropAudioAgainstIndex(
        edits.filter(col("doc_id") === 200010L), "doc_id", "payload",
        "ehi_t")
      assert(regate.count() == 1L)
      val sweep = graft.llm.Maintain.maintainAll(spark,
        Seq("ehi" -> graft.llm.Maintain.EnvelopeIndexTarget("ehi_t")))
        .collect()
      assert(sweep.exists(r => r.getString(1) == "retraction" &&
        r.getString(5).contains("native")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS ehi_t_ehash")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("ingestImageShard: composed gate+append+landing+manifest with crash recovery") {
    import graft.llm.Pipeline
    val tmp = java.nio.file.Files.createTempDirectory("graft_imi").toString
    val out = java.nio.file.Files.createTempDirectory("graft_imo").toString
    try {
      val corpus = Multimodal.synthPng(ids(20), "doc_id")
      Dedup.writeDhashIndex(corpus, "doc_id", "payload", "imi_t", tmp)
      val edits = Multimodal.synthPngVariant(
        ids(20).filter(col("doc_id") % 4 === 0)
          .select(col("doc_id") + 100000L as "doc_id", col("doc_id") as "src"),
        "doc_id", "src")
      val fresh = Multimodal.synthPng(ids(6, from = 600L), "doc_id")
      val shard = edits.union(fresh)
      val c1 = Pipeline.ingestImageShard(shard, "doc_id", "payload",
        "imi_t", tmp, out, shardLabel = "d1")
      assert(c1("input") == 11L)
      val landedIds = spark.read.parquet(out)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // edits gate out; fresh land (minus incidental collisions —
      // reconcile against the manifest count)
      assert(landedIds.forall(_ >= 600L) && landedIds.size == c1("landed"))
      // manifest O(1) replay: same counts, index untouched
      val n1 = spark.table("imi_t_dhash").count()
      assert(Pipeline.ingestImageShard(shard, "doc_id", "payload",
        "imi_t", tmp, out, shardLabel = "d1") == c1)
      assert(spark.table("imi_t_dhash").count() == n1)
      // CRASH WINDOW: a shard whose index append committed but whose
      // landing/manifest did not — stage it by appending directly,
      // then ingest under a new label: the gate drops everything at
      // Hamming 0, the recovery branch detects committed-but-unlanded
      // ids and lands them anyway
      val crashed = Multimodal.synthPng(ids(4, from = 700L), "doc_id")
      // whatever the staged append actually committed (internal
      // near-dups among the four may drop some) is what the recovery
      // owes the landing
      val committed = Dedup.appendImageShardToIndex(crashed, "doc_id",
          "payload", "imi_t", tmp)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(committed.nonEmpty)
      val c2 = Pipeline.ingestImageShard(crashed, "doc_id", "payload",
        "imi_t", tmp, out, shardLabel = "d2")
      assert(c2("landed") == committed.size.toLong,
        s"crashed survivors must recover: $c2 vs $committed")
      val after = spark.read.parquet(out)
        .filter(col("doc_id") >= 700L).collect()
        .map(_.getLong(0)).toSet
      assert(after == committed)
      // admission refusal before any state is touched
      val nIdx = spark.table("imi_t_dhash").count()
      intercept[IllegalStateException] {
        Pipeline.ingestImageShard(
          Multimodal.synthPng(ids(2, from = 800L), "doc_id"),
          "doc_id", "payload", "imi_t", tmp, out, shardLabel = "d3",
          admission = Seq(graft.operators.Checks.RowCountBetween(5L,
            1000L)))
      }
      assert(spark.table("imi_t_dhash").count() == nIdx)
    } finally {
      spark.sql("DROP TABLE IF EXISTS imi_t_dhash")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  // ---- opaque payloads (the no-codec video-container modality) ----

  test("payload byte-envelope: pairs match brute force; index gate + replay + retraction") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bhi").toString
    try {
      val texts = (0L until 20L).map(i =>
        Row(i, s"opaque container payload number $i with some distinct trailing content ${i * 31}"))
      val docs = df(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))), texts: _*)
      val base = Multimodal.withPayload(docs, "text", "payload")
        .select("doc_id", "payload")
      // one-byte edits: first byte -> 'Z'; Hamming <= 1 by the segment
      // argument (only E(0) changes, so only bit 0 can flip)
      val edits = docs.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 300000L).as("doc_id"),
          encode(concat(lit("Z"), expr("substring(text, 2)")), "UTF-8")
            .as("payload"))
      val corpus = base.union(edits)
      val got = Dedup.payloadNearDupPairs(corpus, "doc_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      val sigs = Multimodal.byteEnvelopeHash(corpus, "doc_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
      val brute = for {
        (a, ha) <- sigs; (b, hb) <- sigs
        if a < b && ham(ha, hb) <= 3
      } yield (a, b, ham(ha, hb))
      assert(got.sorted.toSeq == brute.sorted.toSeq)
      val pairSet = got.map(p => (p._1, p._2)).toSet
      (0L until 20L by 3).foreach(i =>
        assert(pairSet.contains((i, i + 300000L)), s"planted edit $i missed"))
      // empty payloads never pair
      val withEmpty = corpus.union(df(Multimodal.payloadSchema,
        Row(900L, Array.emptyByteArray), Row(901L, Array.emptyByteArray)))
      assert(Dedup.payloadNearDupPairs(withEmpty, "doc_id", "payload")
        .filter(col("id_a").isin(900L, 901L) ||
          col("id_b").isin(900L, 901L)).count() == 0L)
      // index lifecycle: gate drops edits + a same-id replay; replayed
      // append lands nothing; retraction re-admits
      Dedup.writePayloadIndex(base, "doc_id", "payload", "bhi_t", tmp)
      val shard = edits.union(base.filter(col("doc_id") === 4L))
      val landed = Dedup.appendPayloadShardToIndex(shard, "doc_id",
        "payload", "bhi_t", tmp)
      assert(landed.count() == 0L, "edits and the replay must all drop")
      // retraction re-admits: pick a planted edit whose ONLY close
      // corpus neighbor is its own source (prose envelopes also collide
      // incidentally, so not every planted id qualifies)
      val baseSigs = sigs.filter(_._1 < 300000L)
      val lone = (0L until 20L by 3).find { i =>
        val eh2 = sigs.find(_._1 == i + 300000L).get._2
        baseSigs.count(b => ham(b._2, eh2) <= 3) == 1
      }
      assert(lone.isDefined, "fixture must contain a lone planted pair")
      val (b0, a0) = Dedup.retractFromPayloadIndex(spark, "bhi_t",
        docs.filter(col("doc_id") === lone.get).select("doc_id"), "doc_id")
      assert(b0 - a0 == 4L)
      assert(Dedup.dropPayloadAgainstIndex(
        edits.filter(col("doc_id") === lone.get + 300000L), "doc_id",
        "payload", "bhi_t").count() == 1L)
      val sweep = graft.llm.Maintain.maintainAll(spark,
        Seq("bhi" -> graft.llm.Maintain.PayloadIndexTarget("bhi_t")))
        .collect()
      assert(sweep.exists(r => r.getString(1) == "retraction" &&
        r.getString(5).contains("native")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS bhi_t_bhash")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  private def expectedEnvelope(id: Long, pert: Boolean): Long = {
    val n = Multimodal.wavFrames(id)
    val samples = (0 until n).map { i =>
      if (pert && i == 0)
        ((id * 31 + Multimodal.VariantSampleDelta) % 65536).toInt - 32768
      else Multimodal.wavSample(id, i)
    }.toArray
    Multimodal.envelopeHashOf(samples)
  }

  test("audioEnvelopeHash: real WAV parse reproduces the arithmetic hash") {
    val got = Multimodal.audioEnvelopeHash(
        Multimodal.synthWav(ids(40), "doc_id"), "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(got.length == 40)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == Multimodal.wavFrames(id).toLong)
      assert(r.getLong(2) == expectedEnvelope(id, pert = false),
        s"envelope mismatch for id=$id")
    }
  }

  test("audio variant stays within Hamming 1; pairs match brute force") {
    val base = Multimodal.synthWav(ids(60), "doc_id")
    val vari = Multimodal.synthWavVariant(
      ids(60).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id") + 200000L as "doc_id", col("doc_id") as "src"),
      "doc_id", "src")
    // Hamming bound of the perturbation
    (0L until 60L by 5).foreach { id =>
      val d = java.lang.Long.bitCount(
        expectedEnvelope(id, pert = false) ^ expectedEnvelope(id, pert = true))
      assert(d <= 1, s"audio variant of $id drifted $d bits")
    }
    val corpus = base.union(vari)
    val got = Dedup.audioNearDupPairs(corpus, "doc_id", "payload")
      .orderBy("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val sigs = Multimodal.audioEnvelopeHash(corpus, "doc_id", "payload")
    val brute = sigs.as("a").join(sigs.as("b"),
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.ehash").bitwiseXOR(col("b.ehash"))).cast("int").as("hm"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filter(_._3 <= 3).sorted
    assert(got.toSeq == brute.toSeq)
    val pairSet = got.map(p => (p._1, p._2)).toSet
    (0L until 60L by 5).foreach { id =>
      assert(pairSet.contains((id, id + 200000L)),
        s"planted audio pair ($id, ${id + 200000L}) missed")
    }
  }

  test("unparseable audio is flagged and excluded from pairing") {
    val base = Multimodal.synthWav(ids(8), "doc_id")
    val junk = df(Multimodal.payloadSchema,
      Row(900L, Array[Byte](1, 2)), Row(901L, Array[Byte](3, 4)))
    val corpus = base.union(junk)
    val flagged = Multimodal.audioEnvelopeHash(corpus, "doc_id", "payload")
      .filter(col("frames") < 0).collect().map(_.getLong(0)).toSet
    assert(flagged == Set(900L, 901L))
    val pairs = Dedup.audioNearDupPairs(corpus, "doc_id", "payload")
      .filter(col("id_a") >= 900L || col("id_b") >= 900L).count()
    assert(pairs == 0L)
  }

  test("payloadIngestStream: micro-batches land as mini-shards, corpus dup drops, replay O(1), admission quarantines") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_smi").toString
    val (idx, out, out2, qp) =
      (s"$base/idx", s"$base/out", s"$base/out2", s"$base/quarantine")
    try {
      val texts = (0L until 20L).map(i =>
        Row(i, s"opaque container payload number $i with some distinct trailing content ${i * 31}"))
      val docs = df(StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))), texts: _*)
      Dedup.writePayloadIndex(
        Multimodal.withPayload(docs, "text", "payload")
          .select("doc_id", "payload"),
        "doc_id", "payload", "smi_t", idx)
      val dupText = texts(4).getString(1)
      // byte-DIVERSE arrivals: the envelope hash is a coarse byte-
      // distribution signature, so near-identical prose would (by
      // design) read as near-duplicates of each other — each fixture
      // text gets its own byte shape, and the pairwise distance is
      // asserted below so a drop means plumbing, never fixture luck
      val freshTexts: Map[Long, String] = Map(
        30L -> ("z" * 40 + " unique thirty"),
        31L -> "mm distinct thirty one with much longer rambling content that goes on and on and on and never quite stops",
        32L -> "QQ 12345 67890 mixed digits short",
        40L -> ("eo" * 25 + " vowels everywhere in pairs"),
        41L -> "The quick brown fox jumps over the lazy dog repeatedly and again the quick brown fox jumps far",
        51L -> ("9" * 18 + " numeric fifty one block"),
        60L -> "kratkiy tekst shestdesyat s dlinnym hvostom iz soglasnykh zvukov pod konets kkkkkkkkkkkkkkkk",
        61L -> ("AB" * 12 + " " + "cd" * 30 + " sixty one"))
      def fresh(i: Long) = i -> freshTexts(i)
      val allCand = docs.unionByName(
        df(StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))),
          freshTexts.toSeq.map { case (i, t) => Row(i, t) }: _*))
      val sigs = Multimodal.byteEnvelopeHash(
          Multimodal.withPayload(allCand, "text", "payload"),
          "doc_id", "payload")
        .collect().map(r => (r.getLong(0), r.getLong(2)))
      for ((a, ha) <- sigs; (b, hb) <- sigs
           if a < b && (a >= 20L || b >= 20L))
        assert(java.lang.Long.bitCount(ha ^ hb) > 3,
          s"fixture texts $a and $b are envelope-close — pick more byte-diverse texts")

      val in = MemoryStream[(Long, String)]
      val stream = Multimodal.withPayload(
          in.toDF().toDF("doc_id", "text"), "text", "payload")
        .select("doc_id", "payload")
      val q = graft.streaming.Streams.payloadIngestStream(stream,
        "doc_id", "payload", "smi_t", idx, out,
        checkpoint = s"$base/ckpt").start()
      val batch1: Seq[(Long, String)] =
        Seq(fresh(30L), fresh(31L), fresh(32L), 99004L -> dupText)
      try {
        in.addData(batch1: _*)
        q.processAllAvailable()
        in.addData(fresh(40L), fresh(41L))
        q.processAllAvailable()
      } finally q.stop()
      val landed = spark.read.parquet(out)
        .select(col("shard_label").cast("string"), col("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(landed.map(_._1) == Set("stream-0", "stream-1"),
        s"two micro-batches, two shards: $landed")
      assert(!landed.map(_._2).contains(99004L),
        "the corpus duplicate must drop at the gate")
      assert(Set(30L, 31L, 32L).subsetOf(
        landed.filter(_._1 == "stream-0").map(_._2)))
      assert(landed.filter(_._1 == "stream-1").map(_._2) == Set(40L, 41L))
      // replay under the SAME label O(1)-returns the manifest: counts
      // match and nothing duplicates
      val before = spark.read.parquet(out).count()
      val replay = graft.llm.Pipeline.ingestPayloadShard(
        Multimodal.withPayload(
          df(StructType(Seq(StructField("doc_id", LongType),
            StructField("text", StringType))),
            batch1.map { case (i, t) => Row(i, t) }: _*),
          "text", "payload").select("doc_id", "payload"),
        "doc_id", "payload", "smi_t", idx, out, "stream-0")
      assert(replay("input") == 4L && replay("landed") == 3L, s"$replay")
      assert(spark.read.parquet(out).count() == before,
        "a replayed micro-batch must not duplicate its landing")
      // admission failure QUARANTINES the batch and touches nothing:
      // null payloads park under the quarantine path, the index and the
      // landing root stay unchanged, and the stream keeps running
      val keysBefore = spark.table("smi_t_bhash").count()
      val in2 = MemoryStream[(Long, String)]
      val stream2 = Multimodal.withPayload(
          in2.toDF().toDF("doc_id", "text"), "text", "payload")
        .select("doc_id", "payload")
      val q2 = graft.streaming.Streams.payloadIngestStream(stream2,
        "doc_id", "payload", "smi_t", idx, out2,
        checkpoint = s"$base/ckpt2",
        admission = Seq(graft.operators.Checks.NotNull("payload")),
        quarantinePath = Some(qp)).start()
      try {
        in2.addData(50L -> null, fresh(51L))
        q2.processAllAvailable()
        in2.addData(fresh(60L), fresh(61L)) // clean batch still flows
        q2.processAllAvailable()
      } finally q2.stop()
      val parked = spark.read.parquet(s"$qp/batch_id=0/rows")
      assert(parked.count() == 2L, "the violating batch parks WHOLESALE")
      assert(spark.read.parquet(s"$qp/batch_id=0/report")
        .filter(!col("passed")).count() >= 1L)
      val landed2 = spark.read.parquet(out2)
        .select(col("shard_label").cast("string"), col("doc_id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(landed2 == Set("stream-1" -> 60L, "stream-1" -> 61L),
        s"only the clean batch lands: $landed2")
      // the stream's foreachBatch ran in a CLONED session — refresh the
      // outer session's cached file listing before counting
      spark.catalog.refreshTable("smi_t_bhash")
      assert(spark.table("smi_t_bhash").count() > keysBefore,
        s"the clean follow-up batch must still append (landed2=$landed2)")
    } finally {
      spark.sql("DROP TABLE IF EXISTS smi_t_bhash")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
