package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, size, split, sum}
import org.apache.spark.sql.types._

import graft.llm.Pipeline

/** End-to-end corpus build (llm/Pipeline.pretrainCorpus): one planted
  * document per drop-reason, so each stage's effect on the composed
  * plan is individually visible (the q_pipeline_e2e oracle checks the
  * same chain against DuckDB at sf scale).
  */
class PipelineSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  private val base =
    "the quick brown fox jumps over a lazy dog while rain falls on the quiet hills near town"

  test("each stage drops exactly its planted doc; survivors get split + shuffle_pos") {
    val docs = df(docSchema,
      Row(1L, base),                                  // unique, passes everything
      Row(2L, "hi there"),                            // < minTokens -> quality gate
      Row(3L, "  THE  quick brown fox jumps over a lazy dog while rain falls on the quiet hills near town"), // exact dup of 1 (canonicalized)
      Row(4L, base + " tonight"),                     // near dup of 1 (jaccard ~0.94)
      Row(5L, "results for alpha beta gamma delta epsilon on the benchmark suite"), // contaminated
      Row(6L, "completely different words about ships sailing across wide open seas under bright stars"))
    val bench = df(docSchema,
      Row(100L, "alpha beta gamma delta epsilon zeta"))

    val out = Pipeline.pretrainCorpus(docs, bench, "doc_id", "text")
      .select("doc_id", "text", "split", "shuffle_pos")
      .collect().toSeq.sortBy(_.getLong(0))

    assert(out.map(_.getLong(0)) == Seq(1L, 6L),
      "quality (2), exact-dup (3), near-dup (4), contamination (5) must each drop their doc")
    assert(out.forall(r => Set("train", "val", "test")(r.getString(2))))
    // shuffle_pos is a dense 0..n-1 permutation over survivors
    assert(out.map(_.getLong(3)).sorted == (0L until out.size).toSeq)
    // survivors keep their input columns untouched
    assert(out.find(_.getLong(0) == 1L).get.getString(1) == base)
  }

  test("observed variant reports per-stage kept counts from the one pass") {
    val docs = df(docSchema,
      Row(1L, base),
      Row(2L, "hi there"),
      Row(3L, "  THE  quick brown fox jumps over a lazy dog while rain falls on the quiet hills near town"),
      Row(4L, base + " tonight"),
      Row(5L, "results for alpha beta gamma delta epsilon on the benchmark suite"),
      Row(6L, "completely different words about ships sailing across wide open seas under bright stars"))
    val bench = df(docSchema,
      Row(100L, "alpha beta gamma delta epsilon zeta"))

    val (out, metrics) = Pipeline.pretrainCorpusObserved(
      docs, bench, "doc_id", "text")
    assert(out.count() == 2)
    val counts = metrics.map { case (k, o) => k -> o.get("rows") }
    // decontam (r13): doc 5 shares a 5-shingle with the benchmark and
    // drops there — near_dedup -> decontam now attributes that stage's
    // own drop instead of folding it into output
    assert(counts == Map(
      "input" -> 6L, "quality" -> 5L, "exact_dedup" -> 4L,
      "near_dedup" -> 3L, "decontam" -> 2L, "output" -> 2L))
  }

  test("boilerplate stage stops shared banners gluing docs into near-dup clusters") {
    val banner = "accept cookies to continue reading this site uses essential " +
      "tracking for analytics and advertising purposes please review our policy " +
      "page before proceeding further because consent banners appear on every " +
      "single article page across this entire publishing network today"
    val docs = df(docSchema,
      Row(1L, banner + "\nrivers flow gently north through quiet green valleys"),
      Row(2L, banner + "\nmountains rise sharply east beyond the coastal plain"),
      Row(3L, banner + "\ndeserts stretch quietly west under fading amber light"))
    // without stripping, the 18-token banner dominates every doc's
    // shingle set (pairwise jaccard ~0.67): at least one pair collapses
    // into a near-dup cluster and a distinct body is lost
    val without = Pipeline.pretrainCorpus(docs, df(docSchema), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(without.size < 3 && without.head == 1L,
      s"expected banner-glued cluster, got $without")
    // with the boilerplate stage the banner is corpus-frequent (3 > 2)
    // and is stripped first: the three distinct bodies all survive
    val withStrip = Pipeline.pretrainCorpus(docs, df(docSchema), "doc_id", "text",
        boilerplateMaxDocFreq = Some(2))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(withStrip == Seq(1L, 2L, 3L), s"boilerplate strip failed: $withStrip")
  }

  test("observed input count is not doubled by the boilerplate stage") {
    // r8 defect: the input tap sat on a subtree the boilerplate stage
    // referenced twice (line strip + payload join-back), so the
    // CollectMetrics executed twice and "input" read 2x. The tap now
    // sits after the row-preserving join-back: 3 docs must read as 3.
    val banner = "accept cookies to continue reading this site uses essential " +
      "tracking for analytics and advertising purposes please review our policy " +
      "page before proceeding further because consent banners appear on every " +
      "single article page across this entire publishing network today"
    val docs = df(docSchema,
      Row(1L, banner + "\nrivers flow gently north through quiet green valleys"),
      Row(2L, banner + "\nmountains rise sharply east beyond the coastal plain"),
      Row(3L, banner + "\ndeserts stretch quietly west under fading amber light"))
    val (out, metrics) = Pipeline.pretrainCorpusObserved(
      docs, df(docSchema), "doc_id", "text", boilerplateMaxDocFreq = Some(2))
    assert(out.count() == 3)
    val input = metrics("input")
    if (!input.getAsJava.isEmpty)
      assert(input.get("rows") == 3L,
        s"boilerplate-active input count = ${input.get("rows")}, expected 3")
    assert(metrics("output").get("rows") == 3L)
  }

  test("pretrainCorpusManaged returns handles whose unpersist releases the caches") {
    val docs = df(docSchema,
      Row(1L, base),
      Row(6L, "completely different words about ships sailing across wide open seas under bright stars"))
    val (out, handles) = Pipeline.pretrainCorpusManaged(
      docs, df(docSchema), "doc_id", "text")
    assert(handles.nonEmpty, "managed build returned no stage handles")
    assert(handles.forall(
      _.storageLevel != org.apache.spark.storage.StorageLevel.NONE),
      "handles must arrive persisted")
    assert(out.count() == 2)
    handles.foreach(_.unpersist(blocking = true))
    assert(handles.forall(
      _.storageLevel == org.apache.spark.storage.StorageLevel.NONE),
      "unpersist must release every stage boundary")
  }

  test("embedding stage drops paraphrases the text shingles cannot see") {
    import org.apache.spark.sql.types._
    val docs = df(docSchema,
      Row(1L, "the committee approved the annual budget after a long debate"),
      Row(2L, "following extended discussion the panel ratified this year's spending plan"),
      Row(3L, "penguins huddle tightly together through the long antarctic winter"))
    val embSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    // docs 1 and 2 are paraphrases: same direction, different magnitude
    // (cosine 1.0); doc 3 is orthogonal
    val emb = df(embSchema,
      Row(1L, Seq(1.0, 2.0, 3.0, 4.0)),
      Row(2L, Seq(2.0, 4.0, 6.0, 8.0)),
      Row(3L, Seq(4.0, -3.0, 2.0, -1.0)))
    val without = Pipeline.pretrainCorpus(docs, df(docSchema), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(without == Seq(1L, 2L, 3L), "text shingles should NOT catch the paraphrase")
    val withEmb = Pipeline.pretrainCorpus(docs, df(docSchema), "doc_id", "text",
        embeddingDedup = Some(Pipeline.EmbeddingDedup(emb, "vec_id",
          "embedding", dim = 4, threshold = 0.95)))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(withEmb == Seq(1L, 3L), s"paraphrase not dropped: $withEmb")
    // the SemDeDup cluster route drops the same paraphrase through the
    // same stage slot when centroids are supplied (cells follow the
    // data: the two parallel vectors share a nearest centroid)
    val cents = graft.llm.Ivf.train(
      emb.select(col("vec_id"),
        graft.llm.Similarity.unitVector(col("embedding")).as("embedding")),
      "vec_id", "embedding", nCells = 2, iters = 0, trainFraction = 1.0)
    val withSem = Pipeline.pretrainCorpus(docs, df(docSchema), "doc_id", "text",
        embeddingDedup = Some(Pipeline.EmbeddingDedup(emb, "vec_id",
          "embedding", dim = 4, threshold = 0.95,
          centroids = Some(cents))))
      .select("doc_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(withSem == Seq(1L, 3L), s"SemDeDup route must drop it too: $withSem")
  }

  test("observed near_dedup/output metrics resolve even with zero near-dup pairs") {
    val docs = df(docSchema,
      Row(1L, base),
      Row(2L, "hi there"),
      Row(6L, "completely different words about ships sailing across wide open seas under bright stars"))
    val (out, metrics) = Pipeline.pretrainCorpusObserved(
      docs, df(docSchema), "doc_id", "text")
    assert(out.count() == 2)
    // the documented reliability contract: these two stages always
    // resolve after a query action, whatever the internal job order
    assert(metrics("near_dedup").get("rows") == 2L)
    assert(metrics("output").get("rows") == 2L)
  }

  test("buildAndWrite lands split-partitioned parquet plus a stage manifest") {
    val docs = df(docSchema,
      Row(1L, base),
      Row(2L, "hi there"),
      Row(6L, "completely different words about ships sailing across wide open seas under bright stars"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe_out").toString
    try {
      val counts = graft.llm.Pipeline.buildAndWrite(
        docs, df(docSchema), "doc_id", "text", s"$tmp/corpus")
      // doc 2 fails quality; docs 1 and 6 land in their hash-split
      assert(counts.values.sum == 2L, s"split counts: $counts")
      assert(counts.keySet.subsetOf(Set("train", "val", "test")))
      // split partitioning: every surviving row lands under split=<x>/
      val dirs = new java.io.File(s"$tmp/corpus").listFiles()
        .filter(_.isDirectory).map(_.getName).toSet
      assert(dirs.nonEmpty && dirs.forall(_.startsWith("split=")), s"dirs: $dirs")
      val back = spark.read.parquet(s"$tmp/corpus")
      assert(back.count() == 2 &&
        back.columns.toSet == Set("doc_id", "text", "split", "shuffle_pos"))
      val manifest = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$tmp/corpus/_graft_manifest.json")), "UTF-8")
      assert(counts.forall { case (k, v) => manifest.contains(s""""$k":$v""") },
        s"manifest: $manifest vs $counts")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("composed e2e plan reads the corpus exactly twice (docs + bench branch)") {
    // the round-8 scan-economy claim, pinned: persisted stage boundaries
    // plus the fused quality gate leave exactly two parquet reads of the
    // input table in the whole composed plan — one for the training
    // candidates, one for the benchmark side. A regression here (a new
    // unpersisted reuse, a join-back creeping into the gate) shows up as
    // a third scan long before it shows up in a benchmark.
    val q = SparkEntry.queries("q_pipeline_e2e")
    val plan = q(spark, "/root/testdata/sf0.001").queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val scans = plan.linesIterator
      .count(l => l.contains("Location") && l.contains("documents.parquet"))
    assert(scans == 2, s"expected 2 corpus scans, saw $scans")
  }

  test("buildAndWriteWindows lands per-split training windows; manifest replay is O(1)") {
    // 30 docs of ~14 tokens each, all clean and distinct — enough to
    // produce multiple 32-token windows in the train split
    val mk = (i: Long) =>
      s"document number $i holds plenty of ordinary distinct words " +
        s"about topic ${i * 37 % 91} and matter ${i * 53 % 89} end"
    val docs = df(docSchema, (1L to 30L).map(i => Row(i, mk(i))): _*)
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe_win").toString
    try {
      val out = s"$tmp/windows"
      val counts = graft.llm.Pipeline.buildAndWriteWindows(
        docs, df(docSchema), "doc_id", "text", out, windowSize = 32L)
      assert(counts.keys.exists(_.endsWith("_windows")), s"counts: $counts")
      val back = spark.read.parquet(out)
      assert(back.columns.toSet ==
        Set("split", "window_id", "window_text", "n_tokens"))
      // per-split isolation + token exactness: each split's window token
      // mass equals its own documents' token mass (no token crosses a
      // split boundary), and window ids are dense from 0 per split
      val corpus = graft.llm.Pipeline.pretrainCorpus(
        docs, df(docSchema), "doc_id", "text")
      val docTokens = corpus
        .groupBy("split")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val winTokens = back.groupBy("split")
        .agg(sum(col("n_tokens")).as("toks"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(winTokens == docTokens,
        s"window token mass per split $winTokens != doc token mass $docTokens")
      for ((sp, n) <- back.groupBy("split").count().collect()
             .map(r => (r.getString(0), r.getLong(1)))) {
        val ids = back.filter(col("split") === sp)
          .select("window_id").collect().map(_.getLong(0)).sorted
        assert(ids.sameElements(0L until n),
          s"split $sp window ids not dense: ${ids.take(5).mkString(",")}")
        assert(counts(s"${sp}_windows") == n)
      }
      // all but each split's tail window hold exactly windowSize tokens
      assert(back.filter(col("n_tokens") =!= 32L).count() <= 3,
        "at most one partial (tail) window per split")
      // crash-replay: the manifest is the commit record — delete a data
      // file, re-run, and the recorded counts come back in O(1) with NO
      // rewrite (the landing stays exactly as corrupted)
      val dataFile = new java.io.File(out).listFiles()
        .filter(_.getName.startsWith("split=")).head.listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      assert(dataFile.delete())
      val replay = graft.llm.Pipeline.buildAndWriteWindows(
        docs, df(docSchema), "doc_id", "text", out, windowSize = 32L)
      assert(replay == counts, "manifest replay must return recorded counts")
      assert(!dataFile.exists(),
        "O(1) replay must not rewrite the landing")
      // fullWindowsOnly drops the partial tails
      val out2 = s"$tmp/windows_full"
      graft.llm.Pipeline.buildAndWriteWindows(
        docs, df(docSchema), "doc_id", "text", out2, windowSize = 32L,
        fullWindowsOnly = true)
      val full = spark.read.parquet(out2)
      assert(full.count() > 0 &&
        full.filter(col("n_tokens") =!= 32L).count() == 0,
        "fullWindowsOnly must land only exact-size windows")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("up-mix stage composes: epoch copies, split keyed on doc id, windows chop every copy") {
    // 40-doc head vs 5-doc tail: alpha=0.5 repeats each tail doc
    // ~sqrt(8) ~ 2.83x while the head keeps exactly one copy
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val mk = (i: Long) =>
      s"document number $i holds plenty of ordinary distinct words " +
        s"about topic ${i * 37 % 91} and matter ${i * 53 % 89} end"
    val docs = df(schema,
      ((1L to 40L).map(i => Row(i, mk(i), "head")) ++
       (101L to 105L).map(i => Row(i, mk(i), "tail"))): _*)
    val up = Some(Pipeline.TemperatureMix("source", alpha = 0.5, up = true))
    val (out, m) = Pipeline.pretrainCorpusObserved(
      docs, df(docSchema), "doc_id", "text", temperatureMix = up)
    val got = out.collect()
    val headRows = got.count(_.getAs[String]("source") == "head")
    val tailRows = got.count(_.getAs[String]("source") == "tail")
    assert(headRows == 40, s"largest domain must keep exactly one copy: $headRows")
    assert(tailRows > 5 && tailRows <= 20,
      s"tail domain must repeat ~2.83x: $tailRows")
    // the mix metric counts the GROWN row set (> decontam survivors)
    assert(m("temperature_mix").get("rows") == got.length.toLong &&
      m("temperature_mix").get("rows").asInstanceOf[Long] >
        m("decontam").get("rows").asInstanceOf[Long])
    // copies share their doc's split; shuffle positions are a dense
    // permutation over ALL copies (the composite key gives each its own)
    val byDoc = got.groupBy(_.getLong(0))
    assert(byDoc.forall(_._2.map(_.getAs[String]("split")).distinct.size == 1),
      "all epoch copies of a doc must share its split")
    assert(got.map(_.getAs[Long]("shuffle_pos")).sorted.toSeq ==
      (0L until got.length).toSeq, "dense positions over every copy")
    // windows over the up-mixed corpus: every copy's tokens are chopped
    val tmp = java.nio.file.Files.createTempDirectory("graft_pipe_upwin").toString
    try {
      val counts = Pipeline.buildAndWriteWindows(
        docs, df(docSchema), "doc_id", "text", s"$tmp/w",
        windowSize = 32L, temperatureMix = up)
      val winToks = counts.filter(_._1.endsWith("_tokens")).values.sum
      val expected = got.map(r =>
        r.getAs[String]("text").split(" ").length.toLong).sum
      assert(winToks == expected,
        s"window token mass $winToks must equal the mixed corpus's $expected")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(tmp))
  }

  test("composed windows plan reads the corpus exactly twice (docs + bench branch)") {
    // the e2e scan-economy claim extended to the windows product: three
    // per-split assembly branches each reference the persisted decontam
    // boundary (its cache absorbs the reuse), so the whole composed
    // windows plan still leaves exactly two parquet reads of the input
    // table — a new unpersisted reuse would show up here as a third
    // scan long before a benchmark
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val win = Pipeline.pretrainWindows(
      d.filter(col("doc_id") % 10 =!= 0).select("doc_id", "text"),
      d.filter(col("doc_id") % 10 === 0).select("doc_id", "text"),
      "doc_id", "text", windowSize = 200L)
    val plan = win.queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    val scans = plan.linesIterator
      .count(l => l.contains("Location") && l.contains("documents.parquet"))
    assert(scans == 2, s"expected 2 corpus scans, saw $scans")
  }

  test("near-dup stage keeps the smallest id of a duplicate cluster") {
    val docs = df(docSchema,
      Row(7L, base + " tonight"),
      Row(2L, base))
    val out = Pipeline.pretrainCorpus(docs, df(docSchema), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L))
  }

  test("temperature-mix stage composes inside the build: rates from CLEAN survivors, metrics observed") {
    // two domains of distinct docs plus planted exact duplicates in the
    // head domain: if mixing ran BEFORE dedup, the duplicates would
    // inflate the head's budget (keep rate would derive from 40+20
    // docs); after dedup the head holds 40 clean docs vs the tail's 10,
    // so alpha=0 keeps the tail lossless and ~10/40 of the head.
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("source", StringType)))
    val mkDoc = (i: Long) =>
      s"document number $i with plenty of ordinary distinct words " +
        s"about topic ${i * 37 % 91} and matter ${i * 53 % 89} end"
    val rows =
      (1L to 40L).map(i => Row(i, mkDoc(i), "head")) ++
      (41L to 60L).map(i => Row(i, mkDoc(i - 40), "head")) ++ // exact dups
      (101L to 110L).map(i => Row(i, mkDoc(i), "tail"))
    val docs = df(schema, rows: _*)
    val (out2, m2) = Pipeline.pretrainCorpusObserved(
      docs, df(docSchema), "doc_id", "text",
      temperatureMix = Some(Pipeline.TemperatureMix("source", 0.0)))
    val got = out2.collect()
    val bySource = got.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length).toMap
    assert(bySource("tail") == 10,
      s"smallest domain must stay lossless: $bySource")
    assert(bySource("head") < 40 && bySource("head") > 0,
      s"head domain must downsample toward the tail's clean size: $bySource")
    assert(m2("temperature_mix").get("rows") == got.length.toLong,
      "mix-stage metric must count exactly the mixed survivors")
    assert(m2("near_dedup").get("rows") == 50L,
      "dedup must remove the planted duplicates BEFORE mixing")
    // r13 (r12 ADVICE): the decontam tap cleanly attributes each drop —
    // decontamination drops nothing here (empty bench), so the mixer's
    // entire drop reads as decontam -> temperature_mix
    assert(m2("decontam").get("rows") == 50L,
      "decontam tap must count decontamination survivors")
    // without the stage the observed map must not carry a blocking key
    val (_, m3) = Pipeline.pretrainCorpusObserved(
      docs, df(docSchema), "doc_id", "text")
    assert(!m3.contains("temperature_mix"))
  }

  test("language gate (1a): predicted-label filter composes, tap observes, audit attributes, refusals hold") {
    val labeled = StructType(Seq(StructField("lang", StringType),
      StructField("text", StringType)))
    // two unmistakable "languages" with disjoint vocabularies
    val seed = df(labeled,
      Row("aa", "alpha beta gamma delta epsilon zeta eta theta"),
      Row("aa", "beta gamma alpha epsilon theta zeta delta alpha"),
      Row("bb", "uno dos tres cuatro cinco seis siete ocho"),
      Row("bb", "dos tres uno cinco ocho siete cuatro uno"))
    val model = graft.llm.Classifier.trainMulti(seed, "lang", "text")
    val docs = df(docSchema,
      Row(1L, "alpha beta gamma epsilon delta zeta theta words here"),   // aa -> kept
      Row(2L, "uno dos tres cuatro cinco seis ocho siete extra"),        // bb -> dropped
      Row(3L, "beta alpha theta zeta gamma epsilon more alpha tokens"),  // aa -> kept
      // exact dup of 1 (canonicalized): with zero dups the near stage
      // short-circuits early and completes the UPSTREAM observations
      // with partial rows (only near_dedup/output are contractually
      // reliable then — the zero-pair test above); a planted dup makes
      // the internal job order deliver every stage's count
      Row(4L, "  ALPHA beta gamma epsilon delta zeta  theta words here "),
      // 5/6: an aa-language near-dup pair so the early observations
      // resolve (the pretrainCorpusObserved caveat the clf spec names)
      Row(5L, "gamma delta epsilon zeta eta theta alpha beta closing line one"),
      Row(6L, "gamma delta epsilon zeta eta theta alpha beta closing line two"))
    // the standalone gate
    val kept = graft.llm.Classifier.filterByLang(docs, "doc_id", "text",
      model, keep = Set("aa"))
    assert(kept.select("doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L, 4L, 5L, 6L)))
    // empty keep set refuses loudly
    val e = intercept[IllegalArgumentException] {
      graft.llm.Classifier.filterByLang(docs, "doc_id", "text", model,
        keep = Set.empty)
    }
    assert(e.getMessage.contains("keep"), e.getMessage)
    // composed: the pipeline drops doc 2 at the lang stage and the
    // observed tap records the stage's kept count
    val (out, obs) = Pipeline.pretrainCorpusObserved(docs,
      df(docSchema, Row(900L, "unrelated benchmark sentence about satellites")),
      "doc_id", "text",
      langFilter = Some(Pipeline.LangFilter(model, Set("aa"))))
    val rows0 = out.collect()
    val ids = rows0.map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 3L, 5L)), ids.toSeq.toString)
    assert(obs.contains("lang"))
    assert(obs("quality").get("rows") == 6L)
    assert(obs("lang").get("rows") == 5L)
    assert(obs("exact_dedup").get("rows") == 4L)
    // the audit names the stage as doc 2's fate
    val tmp = java.nio.file.Files.createTempDirectory("graft_lang_idx")
      .toString
    try {
      graft.llm.Dedup.writeNearDupIndex(
        df(docSchema, Row(100L,
          "ships sailing across wide open seas under bright stars tonight")),
        "doc_id", "text", "lang_t", tmp)
      val fates = Pipeline.ingestAudit(docs, df(docSchema), "doc_id",
          "text", "lang_t",
          langFilter = Some(Pipeline.LangFilter(model, Set("aa"))))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fates(2L) == "lang", fates.toString)
      assert(fates(1L) == "landed" && fates(3L) == "landed", fates.toString)
      assert(fates(4L) == "exact_in_shard" && fates(6L) == "near_in_shard",
        fates.toString)
      // the incremental gate applies it too
      val surv = Pipeline.ingestShardFrame(docs, df(docSchema), "doc_id",
        "text", "lang_t", tmp,
        langFilter = Some(Pipeline.LangFilter(model, Set("aa"))))
      assert(surv.select("doc_id").collect().map(_.getLong(0)).sorted
        .sameElements(Array(1L, 3L, 5L)))
      surv.unpersist()
    } finally {
      Seq("bands", "shingles", "keys").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS lang_t_$t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    // keepUnpredicted: a token-less doc follows the flag
    val withEmpty = df(docSchema, Row(7L, ""),
      Row(8L, "alpha beta gamma alpha"))
    assert(graft.llm.Classifier.filterByLang(withEmpty, "doc_id", "text",
        model, Set("aa"), keepUnpredicted = false)
      .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(8L))
    assert(graft.llm.Classifier.filterByLang(withEmpty, "doc_id", "text",
        model, Set("aa"), keepUnpredicted = true)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(7L, 8L))
  }
}
