package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Dedup

/** Span-level exact-substring dedup (Lee et al. 2021 ExactSubstr shape):
  * constructed fixtures pin every geometry the oracle can't isolate —
  * exact span extents, adjacent-window merge, distinct-region splits,
  * the minSpanTokens threshold on TRUE region length, minCount, and the
  * scrub-all-copies / keep-verbatim contracts. */
class SpanDedupSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private def docs(rows: (Long, String)*): DataFrame =
    df(docSchema, rows.map { case (i, t) => Row(i, t) }: _*)

  private def spans(d: DataFrame, k: Int, minCount: Long = 2,
                    minSpan: Int = 0): Seq[(Long, Int, Int)] =
    Dedup.duplicateSpans(d, "doc_id", "text", k, minCount, minSpan)
      .orderBy("doc_id", "span_start")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))

  private def scrub(d: DataFrame, k: Int, minCount: Long = 2,
                    minSpan: Int = 0): Map[Long, (String, Int)] =
    Dedup.scrubDuplicateSpans(d, "doc_id", "text", k, minCount, minSpan)
      .collect().toSeq
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("text"), r.getAs[Int]("tokens_removed")))
      .toMap

  test("shared region yields exact-extent spans in BOTH docs") {
    // 6-token shared region, k=3: merged span must cover exactly the
    // region (positions are 1-based, end exclusive)
    val d = docs(
      (1L, "u1 u2 s1 s2 s3 s4 s5 s6 u3"),
      (2L, "s1 s2 s3 s4 s5 s6 v1 v2 v3 v4"))
    assert(spans(d, k = 3) == Seq((1L, 3, 9), (2L, 1, 7)))
  }

  test("in-doc self-repetition: adjacent windows merge to ONE span") {
    val d = docs((1L, "a b c d a b c d tail bits here now"))
    // "a b c d" at pos 1 and 5 with k=4: windows [1,5) and [5,9) are
    // exactly adjacent -> one merged region covering both copies
    assert(spans(d, k = 4) == Seq((1L, 1, 9)))
  }

  test("two separated duplicated regions stay two spans") {
    val d = docs(
      (1L, "p q r gap1 gap2 gap3 x y z end1 end2"),
      (2L, "p q r other words x y z trailing stuff here"))
    assert(spans(d, k = 3) ==
      Seq((1L, 1, 4), (1L, 7, 10), (2L, 1, 4), (2L, 6, 9)))
  }

  test("minSpanTokens thresholds TRUE region length") {
    // doc 1 vs 2 share a 4-token region; doc 1 vs 3 share a 7-token
    // region; with k=3 both fingerprint, minSpanTokens=6 keeps only the
    // long one (span length == region length for isolated regions)
    val d = docs(
      (1L, "a1 a2 a3 a4 mid1 mid2 b1 b2 b3 b4 b5 b6 b7"),
      (2L, "a1 a2 a3 a4 zz1 zz2 zz3 zz4 zz5"),
      (3L, "yy1 yy2 b1 b2 b3 b4 b5 b6 b7 yy3"))
    val all = spans(d, k = 3)
    assert(all.contains((1L, 1, 5)) && all.contains((1L, 7, 14)))
    val thresholded = spans(d, k = 3, minSpan = 6)
    assert(thresholded == Seq((1L, 7, 14), (3L, 3, 10)))
  }

  test("minCount=3 ignores pairs, catches triples") {
    val d = docs(
      (1L, "c1 c2 c3 c4 one1 one2 one3 one4"),
      (2L, "c1 c2 c3 c4 other tokens here"),
      (3L, "c1 c2 c3 c4 third copy words"),
      (4L, "one1 one2 one3 one4 second copy only"))
    val s = spans(d, k = 4, minCount = 3L)
    assert(s == Seq((1L, 1, 5), (2L, 1, 5), (3L, 1, 5)))
  }

  test("scrub removes ALL copies and keeps untouched docs verbatim") {
    val weird = "no  dup   here at all  today friend ok"
    val d = docs(
      (1L, "head1 head2 dup1 dup2 dup3 dup4 tail1"),
      (2L, "dup1 dup2 dup3 dup4 xx1 xx2 xx3"),
      (3L, weird))
    val out = scrub(d, k = 4)
    assert(out(1L) == ("head1 head2 tail1", 4))
    assert(out(2L) == ("xx1 xx2 xx3", 4))
    // untouched text comes back VERBATIM, irregular whitespace intact
    assert(out(3L) == (weird, 0))
  }

  test("whole-doc duplicate scrubs to EMPTY string, not a dropped row") {
    val d = docs(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5"))
    val out = scrub(d, k = 5)
    assert(out(1L) == ("", 5) && out(2L) == ("", 5))
    assert(out.size == 2)
  }

  test("extra columns ride through scrub unchanged") {
    val d = docs((1L, "z1 z2 z3 z4"), (2L, "z1 z2 z3 z4"))
      .withColumn("lang", concat(lit("en-"), col("doc_id")))
    val out = Dedup.scrubDuplicateSpans(d, "doc_id", "text", 4)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("lang")).toSeq == Seq("en-1", "en-2"))
    assert(out.forall(_.getAs[String]("text") == ""))
  }

  test("docs shorter than k never fingerprint; empty text is safe") {
    val d = docs((1L, "a b"), (2L, "a b"), (3L, ""), (4L, "   "))
    assert(spans(d, k = 3).isEmpty)
    val out = scrub(d, k = 3)
    assert(out(1L) == ("a b", 0) && out(3L) == ("", 0) &&
      out(4L) == ("   ", 0))
  }

  test("minCount < 2 refuses loudly") {
    val d = docs((1L, "a b c"))
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpans(d, "doc_id", "text", 3, minCount = 1L)
    }
  }

  // ------------------------------------------------------------------
  // Persisted gram index — the ninth family's lifecycle
  // ------------------------------------------------------------------

  private def withGramIndex(name: String, base: DataFrame, k: Int = 4)
                           (body: String => Unit): Unit = {
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft_gram_$name").toString
    try {
      Dedup.writeGramIndex(base, "doc_id", "text", name, tmp, k)
      body(tmp)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_grams")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(tmp))
    }
  }

  test("index-routed spans == batch spans over (corpus ∪ shard) restricted to shard rows") {
    val base = docs(
      (1L, "c1 c2 c3 c4 c5 base tail words here"),
      (2L, "other base doc with its own words entirely"))
    val shard = docs(
      (10L, "c1 c2 c3 c4 c5 fresh suffix now"),   // cross-corpus dup
      (11L, "r1 r2 r3 r4 r1 r2 r3 r4 end"),       // shard-internal dup
      (12L, "nothing shared with anyone at all"))
    withGramIndex("gx_par", base) { path =>
      val indexed = Dedup.duplicateSpansAgainstIndex(shard, "doc_id",
          "text", "gx_par", path)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .toSet
      val batch = Dedup.duplicateSpans(base.unionByName(shard),
          "doc_id", "text", k = 4)
        .filter(col("doc_id") >= 10L)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        .toSet
      assert(indexed == batch && indexed.nonEmpty)
      assert(indexed.exists(_._1 == 10L) && indexed.exists(_._1 == 11L))
    }
  }

  test("ledger: append grows detection, a replayed label no-ops, retraction removes the mass") {
    val base = docs((1L, "plain base words sharing nothing with shards"))
    val shardA = docs((20L, "x1 x2 x3 x4 x5 unique to shard a"))
    // shard B repeats shard A's gram — absent from base, so detection
    // exists ONLY via the ledger
    val shardB = docs((30L, "x1 x2 x3 x4 x5 later arrival text"))
    withGramIndex("gx_led", base) { path =>
      def spansB = Dedup.duplicateSpansAgainstIndex(shardB, "doc_id",
        "text", "gx_led", path).collect().toSeq
      assert(spansB.isEmpty, "nothing appended yet — no duplication")
      Dedup.appendShardGrams(shardA, "doc_id", "text", "gx_led", path,
        "day1")
      assert(spansB.map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
        == Seq((30L, 1, 6)))
      // replayed append: same label, counts unchanged
      Dedup.appendShardGrams(shardA, "doc_id", "text", "gx_led", path,
        "day1")
      assert(spansB.size == 1)
      val totalRows = spark.table("gx_led_grams")
        .filter(col("shard_label") === "day1").count()
      Dedup.appendShardGrams(shardA, "doc_id", "text", "gx_led", path,
        "day1")
      assert(spark.table("gx_led_grams")
        .filter(col("shard_label") === "day1").count() == totalRows)
      // retraction: negative delta removes the duplication signal
      Dedup.retractShardGrams(shardA, "doc_id", "text", "gx_led", path,
        "day1")
      assert(spansB.isEmpty, "retracted mass must stop flagging")
      // retract is itself idempotent; unknown labels refuse
      Dedup.retractShardGrams(shardA, "doc_id", "text", "gx_led", path,
        "day1")
      assert(spansB.isEmpty)
      intercept[IllegalArgumentException] {
        Dedup.retractShardGrams(shardA, "doc_id", "text", "gx_led",
          path, "never-appended")
      }
    }
  }

  test("serve: zero exchange on the bucketed ledger side; compaction preserves results and labels") {
    val base = docs(
      (1L, "c1 c2 c3 c4 c5 base tail words here"),
      (2L, "some other unrelated base document text"))
    val shard = docs((10L, "c1 c2 c3 c4 c5 fresh suffix now"))
    withGramIndex("gx_pl", base) { path =>
      // the ledger-side aggregate after the semi join must ride the
      // bucketing (gram == bucket key): assert the bucketed scan's
      // subtree up to the sum carries no hash exchange
      val occ = spark.table("gx_pl_grams")
        .join(docs((99L, "c1 c2 c3 c4 c5")).select(
          explode(lit(Array("c1 c2 c3 c4", "c2 c3 c4 c5"))).as("gram")),
          Seq("gram"), "left_semi")
        .groupBy("gram").agg(sum("cnt").as("ic"))
      val plan = occ.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(gram"),
        s"ledger aggregate must ride the bucketing:\n$plan")
      val before = Dedup.scrubSpansAgainstIndex(shard, "doc_id", "text",
          "gx_pl", path)
        .select("doc_id", "text", "tokens_removed").collect().toSeq
      Dedup.appendShardGrams(docs((20L, "filler shard alpha one")),
        "doc_id", "text", "gx_pl", path, "f1")
      Dedup.appendShardGrams(docs((21L, "filler shard beta two")),
        "doc_id", "text", "gx_pl", path, "f2")
      Dedup.compactGramIndex(spark, "gx_pl")
      val after = Dedup.scrubSpansAgainstIndex(shard, "doc_id", "text",
          "gx_pl", path)
        .select("doc_id", "text", "tokens_removed").collect().toSeq
      assert(after == before, "compaction must preserve serving")
      assert(spark.table("gx_pl_grams")
        .select("shard_label").distinct().count() == 3,
        "compaction must preserve the label ledger")
    }
  }

  test("gram index refusals and maintenance") {
    val base = docs((1L, "a1 a2 a3 a4 a5 a6"))
    // stampless serve refuses
    intercept[IllegalArgumentException] {
      Dedup.duplicateSpansAgainstIndex(base, "doc_id", "text", "gx_no",
        "/tmp/graft-gx-nowhere")
    }
    withGramIndex("gx_mx", base) { path =>
      // base label is reserved
      intercept[IllegalArgumentException] {
        Dedup.appendShardGrams(base, "doc_id", "text", "gx_mx", path,
          "__base__")
      }
      // healthy pass: nothing fires, n/a-drift + native-retraction rows
      val rep = graft.llm.Maintain.maintainGramIndex(spark, "gx_mx")
        .collect().map(r => r.getString(0) ->
          (r.getBoolean(3), r.getString(4))).toMap
      assert(!rep.values.exists(_._1), s"healthy pass fired: $rep")
      assert(rep("drift")._2.contains("n/a"))
      assert(rep("retraction")._2.contains("native"))
      // fragment the ledger, then a tight policy fires the compaction
      for (i <- 1 to 4)
        Dedup.appendShardGrams(docs((100L + i, s"sh$i t$i u$i v$i w$i")),
          "doc_id", "text", "gx_mx", path, s"d$i")
      val rep2 = graft.llm.Maintain.maintainGramIndex(spark, "gx_mx",
          graft.llm.Maintain.Policy(maxFilesFlat = 3))
        .collect().map(r => r.getString(0) ->
          (r.getBoolean(3), r.getString(4))).toMap
      assert(rep2("table_files")._1 &&
        rep2("table_files")._2 == "Dedup.compactGramIndex")
      val filesAfter = graft.llm.Dedup.gramIndexReport(spark, "gx_mx")
        .head().getAs[Long]("files")
      assert(filesAfter <= 8, s"compaction must shrink files: $filesAfter")
      // the fleet sweep reaches the family
      val fleet = graft.llm.Maintain.maintainAll(spark,
          Seq("grams" -> graft.llm.Maintain.GramIndexTarget("gx_mx")))
        .collect()
      assert(fleet.forall(_.getString(0) == "grams") && fleet.length == 4)
    }
  }

  test("GramScrub rides the daily ingest: corpus spans cut from arrivals, cross-shard via the ledger, replay never self-scrubs") {
    import graft.llm.Pipeline
    val base = java.nio.file.Files
      .createTempDirectory("graft_gram_ing").toString
    try {
      val corpus = docs(
        (1L, "c1 c2 c3 c4 c5 c6 landed corpus document text here"))
      graft.llm.Dedup.writeNearDupIndex(corpus, "doc_id", "text",
        "gsing_t", s"$base/idx")
      Dedup.writeGramIndex(corpus, "doc_id", "text", "gsing_g",
        s"$base/gram", k = 4)
      val gs = Pipeline.GramScrub("gsing_g", s"$base/gram")
      val bench = docs((100L, "benchmark prose sharing no shingle"))
      // day 1: doc 10 repeats the corpus's 6-token region (cut,
      // remainder lands); doc 11 carries a unique phrase (lands whole)
      val shard1 = docs(
        (10L, "c1 c2 c3 c4 c5 c6 fresh remainder words beyond that point today"),
        (11L, "u1 u2 u3 u4 u5 unique phrase first sighting today ok"))
      val counts1 = Pipeline.ingestShard(shard1, bench, "doc_id",
        "text", "gsing_t", s"$base/idx", s"$base/land", "d1",
        redactPii = false, gramScrub = Some(gs))
      assert(counts1("landed") == 2L)
      val landed1 = spark.read.parquet(s"$base/land")
        .filter(col("shard_label") === "d1")
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[String]("text")).toMap
      assert(landed1(10L) == "fresh remainder words beyond that point today",
        s"corpus-duplicated span must be cut: ${landed1(10L)}")
      assert(landed1(11L).startsWith("u1 u2 u3 u4 u5"),
        "first sighting lands whole")
      // day 2: repeating day 1's unique phrase is now duplication —
      // detection exists only through the ledger append
      val shard2 = docs(
        (20L, "u1 u2 u3 u4 u5 second sighting gets trimmed here now fine"))
      Pipeline.ingestShard(shard2, bench, "doc_id", "text", "gsing_t",
        s"$base/idx", s"$base/land", "d2", redactPii = false,
        gramScrub = Some(gs))
      val landed2 = spark.read.parquet(s"$base/land")
        .filter(col("shard_label") === "d2")
        .collect().map(_.getAs[String]("text"))
      assert(landed2.toSeq == Seq("second sighting gets trimmed here now fine"),
        s"cross-shard duplication must be cut via the ledger: ${landed2.toSeq}")
      // manifest replay: O(1), same counts, landing untouched
      val replay = Pipeline.ingestShard(shard1, bench, "doc_id", "text",
        "gsing_t", s"$base/idx", s"$base/land", "d1",
        redactPii = false, gramScrub = Some(gs))
      assert(replay == counts1)
      // crash replay: gram append committed, landing did not — the
      // scrub must EXCLUDE the shard's own label or the replay would
      // flag the shard against itself and land nothing but stubs
      val shard3 = docs(
        (30L, "v1 v2 v3 v4 v5 crash window document totally fresh"))
      Dedup.appendShardGrams(shard3, "doc_id", "text", "gsing_g",
        s"$base/gram", "d3") // the crashed run's committed append
      Pipeline.ingestShard(shard3, bench, "doc_id", "text", "gsing_t",
        s"$base/idx", s"$base/land", "d3", redactPii = false,
        gramScrub = Some(gs))
      val landed3 = spark.read.parquet(s"$base/land")
        .filter(col("shard_label") === "d3")
        .collect().map(_.getAs[String]("text"))
      assert(landed3.toSeq ==
        Seq("v1 v2 v3 v4 v5 crash window document totally fresh"),
        s"replay must not scrub the shard against itself: ${landed3.toSeq}")
    } finally {
      Seq("gsing_t_bands", "gsing_t_shingles", "gsing_t_keys",
          "gsing_g_grams")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }

  test("GramScrub rides the streaming windows landing: batch 2 is scrubbed against batch 1's ledger mass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val idx = java.nio.file.Files
      .createTempDirectory("graft_gsw_idx").toString
    val base = java.nio.file.Files
      .createTempDirectory("graft_gsw").toString
    try {
      val corpus = docs(
        (1L, "seed corpus document with plain unrelated words inside"))
      graft.llm.Dedup.writeNearDupIndex(corpus, "doc_id", "text",
        "gsw_t", idx)
      Dedup.writeGramIndex(corpus, "doc_id", "text", "gsw_g",
        s"$base/gram", k = 4)
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.windowsLandingStream(
        in.toDF().toDF("doc_id", "text"),
        docs(), "doc_id", "text", "gsw_t", idx, s"$base/out", 64L,
        s"$base/ckpt", redactPii = false,
        gramScrub = Some(graft.llm.Pipeline.GramScrub("gsw_g",
          s"$base/gram"))).start()
      try {
        in.addData(
          (10L, "p1 p2 p3 p4 p5 first sighting of this phrase today"))
        q.processAllAvailable()
        in.addData(
          (20L, "p1 p2 p3 p4 p5 second arrival must lose the prefix today ok"))
        q.processAllAvailable()
      } finally q.stop()
      val win = spark.read.parquet(s"$base/out")
      val texts = win.select("shard_label", "window_text").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(texts("stream-0").startsWith("p1 p2 p3 p4 p5"),
        s"first sighting lands whole: ${texts("stream-0")}")
      assert(texts("stream-1") ==
        "second arrival must lose the prefix today ok",
        s"ledger mass from batch 1 must trim batch 2: ${texts("stream-1")}")
      // both stream labels entered the ledger
      assert(spark.table("gsw_g_grams").select("shard_label").distinct()
        .collect().map(_.getString(0)).toSet ==
        Set("__base__", "stream-0", "stream-1"))
    } finally {
      Seq("gsw_t_bands", "gsw_t_shingles", "gsw_t_keys", "gsw_g_grams")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      Seq(idx, base).foreach(d =>
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(d)))
    }
  }

  test("SpanScrub rides the Pipeline: equals pre-scrubbing, emptied whole-doc dups drop at the quality gate") {
    import graft.llm.Pipeline
    // minSpanTokens=10 shapes the interaction: 1/2 share a 12-token
    // region (>= 10: scrubbed, both survive on their remainders); 3/4
    // are 12-token whole-doc duplicates (scrub empties BOTH — the
    // quality gate drops them, so exact dedup never sees them); 5/6
    // share only an 8-token region (< 10: the scrub SPARES it, so they
    // stay a near-dup pair and label propagation resolves the early
    // observations); 7 untouched
    val d = docs(
      (1L, "u1 u2 s1 s2 s3 s4 s5 s6 s7 s8 s9 sa sb sc u3 u4 u5 u6 u7"),
      (2L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 sa sb sc v1 v2 v3 v4 v5 v6 v7"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc"),
      (4L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc"),
      (5L, "p1 p2 p3 p4 p5 p6 p7 p8 zz1"),
      (6L, "p1 p2 p3 p4 p5 p6 p7 p8 zz2"),
      (7L, "q1 q2 q3 q4 q5 q6 q7 q8 q9 qq qw qe"))
    val bench = docs((100L, "benchmark prose sharing no shingle"))
    val sp = Pipeline.SpanScrub(k = 5, minSpanTokens = 10)
    val composed = Pipeline.pretrainCorpus(d, bench, "doc_id", "text",
        spanScrub = Some(sp), persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val expected = Pipeline.pretrainCorpus(
        Dedup.scrubDuplicateSpans(d, "doc_id", "text", 5,
            minSpanTokens = 10)
          .drop("tokens_removed"),
        bench, "doc_id", "text", persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(composed == expected)
    assert(!composed.contains(3L) && !composed.contains(4L),
      s"whole-doc duplicates must empty and drop at quality: $composed")
    assert(composed.contains(1L) && composed.contains(2L),
      s"partially-scrubbed docs survive: $composed")
    // observed run: quality counts post-scrub survivors; with
    // persistStages the input tap materializes once despite the
    // stage's double read
    val (out, obs) = Pipeline.pretrainCorpusObserved(d, bench, "doc_id",
      "text", spanScrub = Some(sp))
    out.collect()
    assert(obs("quality").get("rows") == 5L) // 3/4 emptied and dropped
    // "input" is optional-safe under a persisted boundary (the
    // pretrainCorpusObserved caveat: cache materializations don't
    // always surface CollectMetrics) — when it resolves it must be
    // exact, and it must never double-count
    if (!obs("input").getAsJava.isEmpty)
      assert(obs("input").get("rows") == 7L)
    // without persistStages the input tap is withheld (double-read)
    val (out2, obs2) = Pipeline.pretrainCorpusObserved(d, bench,
      "doc_id", "text", spanScrub = Some(sp), persistStages = false)
    out2.collect()
    assert(!obs2.contains("input") && obs2.contains("output"))
  }
}
