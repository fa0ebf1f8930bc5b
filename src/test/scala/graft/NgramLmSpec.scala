package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.NgramLm

/** Reference-corpus n-gram LM: exact count training, scoring pinned
  * bit-for-bit against a driver-side StrictMath reference (the logIdf
  * precedent — Spark's Log/Exp evaluate StrictMath), smoothing/unseen
  * semantics, unscorable policy, and the CCNet-style filter. */
class NgramLmSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private val ref: Seq[(Long, String)] = Seq(
    0L -> "the cat sat on the mat",
    1L -> "the dog sat on the rug",
    2L -> "a cat and a dog met on the mat")

  // ------- driver-side reference implementation (plain Scala) -------

  private def toksRef(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  private def gramsRef(t: Seq[String], n: Int): Seq[(String, String)] =
    (0 to t.length - n).map(i => (t.slice(i, i + n - 1).mkString(" "),
      t(i + n - 1)))

  private def trainRef(docs: Seq[(Long, String)], n: Int)
      : Map[(String, String), Long] =
    docs.flatMap(d => gramsRef(toksRef(d._2), n))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def scoreRef(text: String, model: Map[(String, String), Long],
                       n: Int, alpha: Double): Option[Double] = {
    val ctxCnt = model.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2).sum).toMap
    val v = model.keys.map(_._2).toSet.size
    val gs = gramsRef(toksRef(text), n)
    if (gs.isEmpty) None
    else {
      // multiplicity-grouped, folded in sorted (ctx, w) order — the
      // engine's array_sort(struct(ctx, w, ...)) discipline
      val byGram = gs.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val s = byGram.foldLeft(0.0) { case (acc, ((ctx, w), k)) =>
        val cnt = model.getOrElse((ctx, w), 0L)
        val cc = ctxCnt.getOrElse(ctx, 0L)
        acc + k.toDouble * StrictMath.log(
          (cnt.toDouble + alpha) / (cc.toDouble + alpha * v.toDouble))
      }
      Some(s / gs.size.toDouble)
    }
  }

  // -------------------------------------------------------------------

  test("train: exact bigram counts and context totals on a hand fixture") {
    val m = NgramLm.train(docsDf(ref), "text", n = 2)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val want = trainRef(ref, 2)
    val wantCtx = want.toSeq.groupBy(_._1._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(m.keySet == want.keySet)
    for ((k, (cnt, cc)) <- m) {
      assert(cnt == want(k), s"cnt mismatch at $k")
      assert(cc == wantCtx(k._1), s"ctx_cnt mismatch at $k")
    }
    // spot values: 'the' is followed by cat/dog/mat/rug; ("on","the") x3
    assert(m(("on", "the")) == (3L, 3L))
    assert(m(("the", "cat"))._2 == 5L) // ctx 'the' appears 5 times
  }

  test("score matches the StrictMath driver reference exactly, n = 1, 2, 3") {
    val model2 = trainRef(ref, 2)
    val cand = Seq(
      10L -> "the cat sat on the rug",          // all grams known
      11L -> "the zebra sat on a xylophone",    // unseen words, seen ctxs
      12L -> "qq ww ee rr",                     // fully out-of-model
      13L -> "single")                          // unscorable at n >= 2
    for (n <- Seq(1, 2, 3)) {
      val model = NgramLm.train(docsDf(ref), "text", n)
      val got = NgramLm.score(docsDf(cand), "doc_id", "text", model, n)
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
      val refModel = trainRef(ref, n)
      for ((id, text) <- cand) {
        val want = scoreRef(text, refModel, n, alpha = 1.0)
        assert(got(id) == want, s"n=$n doc=$id: ${got(id)} vs $want")
      }
    }
    // integer statistics: doc 10 at n=2 — 5 grams, every (ctx, w) pair
    // known to the model ('the rug' comes from ref doc 1); doc 11 — 5
    // grams, 1 known pair ('sat on'), 3 known ctxs (the/sat/on — 'a'
    // precedes 'xylophone' with ctx 'a' known from ref doc 2)
    val s = NgramLm.score(docsDf(cand), "doc_id", "text",
        NgramLm.train(docsDf(ref), "text", 2), 2)
      .filter(col("doc_id").isin(10L, 11L)).orderBy("doc_id").collect()
    assert(s(0).getLong(1) == 5L && s(0).getLong(2) == 5L &&
      s(0).getLong(3) == 5L, s"doc 10 stats: ${s(0)}")
    assert(s(1).getLong(1) == 5L && s(1).getLong(2) == 1L &&
      s(1).getLong(3) == 4L, s"doc 11 stats: ${s(1)}")
    assert(model2.contains(("on", "the")) && model2.contains(("the", "rug")))
  }

  test("an empty model refuses loudly instead of an ANSI divide-by-zero") {
    val empty = NgramLm.train(docsDf(Seq(0L -> "x")), "text", 2)
    val e = intercept[IllegalArgumentException] {
      NgramLm.score(docsDf(Seq(1L -> "a b c")), "doc_id", "text", empty, 2)
    }
    assert(e.getMessage.contains("empty LM model"))
  }

  test("unseen context degrades to uniform 1/V; ppl = exp(-logprob)") {
    val model = NgramLm.train(docsDf(ref), "text", 2)
    val v = model.select("w").distinct().count()
    val row = NgramLm.score(
      docsDf(Seq(20L -> "zz yy")), "doc_id", "text", model, 2).head()
    // one gram, ctx 'zz' unknown: p = alpha/(alpha*V) = 1/V
    assert(row.getLong(1) == 1L && row.getLong(3) == 0L)
    assert(row.getDouble(6) == StrictMath.log(1.0 / v.toDouble))
    assert(row.getDouble(7) == StrictMath.exp(-row.getDouble(6)))
  }

  test("unscorable docs: n_grams = 0, NULL score; filter policy both ways") {
    val model = NgramLm.train(docsDf(ref), "text", 2)
    val docs = docsDf(Seq(30L -> "the cat sat on the mat",
      31L -> "word", 32L -> ""))
    val scored = NgramLm.score(docs, "doc_id", "text", model, 2)
      .orderBy("doc_id").collect()
    assert(scored.map(_.getLong(1)).toSeq == Seq(5L, 0L, 0L))
    assert(!scored(0).isNullAt(6) && scored(1).isNullAt(6) &&
      scored(2).isNullAt(6))
    val keepU = NgramLm.filterByLm(docs, "doc_id", "text", model,
      minLogprob = -100.0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keepU == Set(30L, 31L, 32L))
    val dropU = NgramLm.filterByLm(docs, "doc_id", "text", model,
        minLogprob = -100.0, keepUnscorable = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(dropU == Set(30L))
  }

  test("LmFilter rides the Pipeline: equals pre-filtering the input, lm_quality metric attributes the stage's own drop") {
    import graft.llm.{NgramLm, Pipeline}
    val model = NgramLm.train(docsDf(ref), "text", 2)
    // enough tokens to clear the rule gate; doc 52 is gibberish the LM
    // must drop, doc 53 is an exact dup of 50 the LATER stage must drop
    // the 54/55 near-dup pair matters beyond coverage: the early-stage
    // observations (input/quality/lm_quality/exact_dedup) only resolve
    // when near-dedup's label propagation executes the upstream plan —
    // i.e. when candidate pairs exist (the pretrainCorpusObserved
    // caveat; real corpora always have them)
    val docs = docsDf(Seq(
      50L -> "the cat sat on the mat and the dog sat on the rug today",
      51L -> "a cat and a dog met on the mat near the rug in daylight",
      52L -> "zz qq ww rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk",
      53L -> "the cat sat on the mat and the dog sat on the rug today",
      54L -> "the cat sat on the mat and a dog met a cat near the rug okay",
      55L -> "the cat sat on the mat and a dog met a cat near the rug yes"))
    val bench = docsDf(Seq(100L -> "benchmark prose sharing no shingle"))
    // threshold from the fixture's own score spread: midway between the
    // best and worst doc splits gibberish from prose deterministically
    val scores = NgramLm.score(docs, "doc_id", "text", model, 2)
      .orderBy("doc_id").collect().map(_.getDouble(6))
    val thr = (scores.max + scores.min) / 2.0
    val lf = Pipeline.LmFilter(model, thr)
    val composed = Pipeline.pretrainCorpus(docs, bench, "doc_id", "text",
        lmFilter = Some(lf), persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // equivalence: the composed stage == pre-dropping the LM failures
    // among rule-quality survivors (scores are per-doc, model fixed)
    val qKept = graft.llm.TextStats.qualityFilter(docs, "text")
    val lmKeptIds = NgramLm.filterByLm(qKept, "doc_id", "text", model, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val qIds = qKept.select("doc_id").collect().map(_.getLong(0)).toSet
    val preDropped = docs.filter(
      !col("doc_id").isin((qIds -- lmKeptIds).toSeq: _*))
    val expected = Pipeline.pretrainCorpus(preDropped, bench, "doc_id",
        "text", persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(composed == expected)
    assert(!composed.contains(52L), s"LM stage must drop gibberish: $composed")
    assert(!composed.contains(53L), "exact dedup still runs after the LM stage")
    // observed: lm_quality counts the stage's own output exactly once
    val (out, obs) = Pipeline.pretrainCorpusObserved(docs, bench,
      "doc_id", "text", lmFilter = Some(lf))
    out.collect()
    assert(obs("lm_quality").get("rows") == lmKeptIds.size.toLong)
    assert(obs("quality").get("rows") == qIds.size.toLong)
    assert(obs("input").get("rows") == 6L &&
      obs("exact_dedup").get("rows") == 4L &&
      obs("near_dedup").get("rows") == 3L)
  }

  test("LmFilter rides the daily ingest: gibberish never reaches the keys boundary or landing; audit says lm_quality") {
    import graft.llm.{Dedup, NgramLm, Pipeline}
    val base = java.nio.file.Files.createTempDirectory("graft_lm_ing")
      .toString
    try {
      val model = NgramLm.train(docsDf(ref), "text", 2)
      val corpus = docsDf(Seq(
        60L -> "the cat sat on the mat and the dog sat on the rug early"))
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "lming_t",
        s"$base/idx")
      val shard = docsDf(Seq(
        61L -> "a cat and a dog met on the mat near the rug in daylight",
        62L -> "zz qq ww rr tt yy uu ii oo pp aa ss dd ff gg hh jj kk"))
      val sc = NgramLm.score(shard, "doc_id", "text", model, 2)
        .orderBy("doc_id").collect().map(_.getDouble(6))
      assert(sc(0) > sc(1))
      val lf = Pipeline.LmFilter(model, (sc(0) + sc(1)) / 2.0)
      val bench = docsDf(Seq(
        100L -> "benchmark prose sharing no shingle with anything here"))
      val counts = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "lming_t", s"$base/idx", s"$base/land", "d1", redactPii = false,
        lmFilter = Some(lf))
      assert(counts("landed") == 1L)
      assert(spark.read.parquet(s"$base/land").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(61L))
      // the LM-dropped doc never entered the index boundary
      assert(spark.table("lming_t_keys").filter(col("id") === 62L).isEmpty)
      // fate attribution names the new stage (61 re-audits as
      // exact_vs_corpus now that its key is in the boundary)
      val fates = Pipeline.ingestAudit(shard, bench, "doc_id", "text",
          "lming_t", redactPii = false, lmFilter = Some(lf))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fates(62L) == "lm_quality")
      assert(fates(61L) == "exact_vs_corpus")
    } finally {
      Seq("lming_t_bands", "lming_t_shingles", "lming_t_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("lmScoreStream: batch parity, per-batch partitions, mid-stream retrain picked up via the catalog") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.llm.NgramLm
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_lm_srv")
      .toString
    try {
      NgramLm.train(docsDf(ref), "text", 2).write
        .saveAsTable("lmsrv_model")
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.lmScoreStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        "lmsrv_model", n = 2, outPath = s"$base/out",
        checkpoint = s"$base/ckpt").start()
      val d1 = Seq(70L -> "the cat sat on the mat")
      val d2 = Seq(71L -> "a dog met a cat on the rug")
      try {
        in.addData(d1.head._1 -> d1.head._2)
        q.processAllAvailable()
        // RETRAIN mid-stream: overwrite the model table (larger ref) —
        // the next trigger must resolve the new generation
        NgramLm.train(docsDf(ref :+ (9L -> "the rug sat on the dog")),
            "text", 2)
          .write.mode("overwrite").saveAsTable("lmsrv_model")
        in.addData(d2.head._1 -> d2.head._2)
        q.processAllAvailable()
      } finally q.stop()
      def batchScore(docs: Seq[(Long, String)], refDocs: Seq[(Long, String)]) =
        NgramLm.score(docsDf(docs), "doc_id", "text",
            NgramLm.train(docsDf(refDocs), "text", 2), 2)
          .select("doc_id", "logprob").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = spark.read.parquet(s"$base/out")
        .select("doc_id", "logprob").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val want = (batchScore(d1, ref) ++
        batchScore(d2, ref :+ (9L -> "the rug sat on the dog")))
        .sortBy(_._1)
      assert(got == want, s"$got vs $want")
      assert(new java.io.File(s"$base/out").listFiles()
        .count(_.getName.startsWith("batch_id=")) == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS lmsrv_model")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("reference-like text outscores gibberish and the filter drops the tail") {
    val model = NgramLm.train(docsDf(ref), "text", 2)
    val docs = docsDf(Seq(
      40L -> "the cat sat on the mat",
      41L -> "zz qq ww rr tt yy uu ii oo pp"))
    val s = NgramLm.score(docs, "doc_id", "text", model, 2)
      .orderBy("doc_id").collect()
    assert(s(0).getDouble(6) > s(1).getDouble(6),
      s"reference-like must outscore gibberish: $s")
    val thr = (s(0).getDouble(6) + s(1).getDouble(6)) / 2.0
    val kept = NgramLm.filterByLm(docs, "doc_id", "text", model, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(40L))
    // the filter preserves caller columns
    assert(NgramLm.filterByLm(docs, "doc_id", "text", model, thr)
      .columns.toSeq == Seq("doc_id", "text"))
  }
}
