package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Classifier, Maintain}

/** Trained counting quality classifier (the GPT-3 curated-vs-crawl
  * gate): exact count training, scoring pinned bit-for-bit against a
  * driver-side StrictMath reference, smoothing/OOV semantics,
  * unscorable policy, the filter, and the persisted-family lifecycle
  * (stamp guard, bit-parity serve, OOV drift, maintenance pass). */
class ClassifierSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private def textDf(rows: Seq[String]): DataFrame =
    df(StructType(Seq(StructField("text", StringType))),
      rows.map(Row(_)): _*)

  private val posSeed = Seq(
    "curated prose reads well and flows clearly",
    "well written careful prose with clear flow",
    "clear careful writing reads well")
  private val negSeed = Seq(
    "click here buy now cheap cheap deals",
    "buy cheap now click now best deals here",
    "cheap deals click buy")

  // ------- driver-side reference implementation (plain Scala) -------

  private def toksRef(t: String): Seq[String] =
    t.split("\\s+").filter(_.nonEmpty).toSeq

  private def countsRef(docs: Seq[String]): Map[String, Long] =
    docs.flatMap(toksRef).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap

  private def modelRef: Map[String, (Long, Long)] = {
    val p = countsRef(posSeed); val n = countsRef(negSeed)
    (p.keySet ++ n.keySet).map(w =>
      w -> (p.getOrElse(w, 0L), n.getOrElse(w, 0L))).toMap
  }

  private def scoreRef(text: String, model: Map[String, (Long, Long)],
                       alpha: Double): Option[(Double, Double)] = {
    val v = model.size
    val npos = model.values.map(_._1).sum
    val nneg = model.values.map(_._2).sum
    val ts = toksRef(text)
    if (ts.isEmpty) None
    else {
      val byW = ts.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val llr = byW.foldLeft(0.0) { case (acc, (w, k)) =>
        val (p0, n0) = model.getOrElse(w, (0L, 0L))
        acc + k.toDouble *
          (StrictMath.log((p0.toDouble + alpha) /
            (npos.toDouble + alpha * v.toDouble)) -
            StrictMath.log((n0.toDouble + alpha) /
              (nneg.toDouble + alpha * v.toDouble)))
      }
      Some((llr, llr / ts.size.toDouble))
    }
  }

  // -------------------------------------------------------------------

  test("train: exact merged counts, zero where a side never saw w") {
    val m = Classifier.train(textDf(posSeed), textDf(negSeed), "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(m == modelRef)
    assert(m("cheap") == (0L, 4L))
    assert(m("prose") == (2L, 0L))
    assert(m("well") == (3L, 0L))
  }

  test("score matches the StrictMath driver reference exactly") {
    val model = Classifier.train(textDf(posSeed), textDf(negSeed), "text")
    val cands = Seq(
      10L -> "careful clear prose and careful flow",
      11L -> "cheap cheap deals click here now",
      12L -> "prose deals unknownword cheap well",
      13L -> "totally novel tokens nowhere in seeds")
    val got = Classifier.score(docsDf(cands), "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Double]("llr"), r.getAs[Double]("llr_mean"))).toMap
    val ref = modelRef
    for ((id, text) <- cands) {
      val Some((llr, mean)) = scoreRef(text, ref, 1.0)
      assert(got(id)._1 == llr, s"llr mismatch at $id")
      assert(got(id)._2 == mean, s"llr_mean mismatch at $id")
    }
    // sign sanity: curated-like positive, crawl-like negative,
    // all-OOV near zero (smoothed floor on both sides)
    assert(got(10L)._2 > 0 && got(11L)._2 < 0)
    assert(math.abs(got(13L)._2) < math.abs(got(10L)._2))
  }

  test("integer statistics: hits and count masses are exact") {
    val model = Classifier.train(textDf(posSeed), textDf(negSeed), "text")
    val row = Classifier.score(
        docsDf(Seq(1L -> "prose cheap prose mystery")),
        "doc_id", "text", model)
      .head()
    assert(row.getAs[Long]("n_tokens") == 4L)
    assert(row.getAs[Long]("n_hit_pos") == 2L) // prose x2
    assert(row.getAs[Long]("n_hit_neg") == 1L) // cheap
    assert(row.getAs[Long]("sum_pos_cnt") == 4L) // 2 copies x pos_cnt 2
    assert(row.getAs[Long]("sum_neg_cnt") == 4L) // 1 copy x neg_cnt 4
  }

  test("unscorable docs: n_tokens = 0, NULL llr, kept by default") {
    val model = Classifier.train(textDf(posSeed), textDf(negSeed), "text")
    val d = docsDf(Seq(1L -> "", 2L -> "   ", 3L -> "cheap deals"))
    val s = Classifier.score(d, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    assert(s(0).getAs[Long]("n_tokens") == 0L && s(0).isNullAt(6))
    assert(s(1).getAs[Long]("n_tokens") == 0L)
    val kept = Classifier.filterByClassifier(d, "doc_id", "text", model,
      minLlrMean = 0.0).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L)) // crawl-like doc 3 drops; empties keep
    val strict = Classifier.filterByClassifier(d, "doc_id", "text", model,
        minLlrMean = 0.0, keepUnscorable = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strict.isEmpty)
  }

  test("empty model refuses loudly; alpha must be positive") {
    val model = Classifier.train(textDf(Nil), textDf(Nil), "text")
    val d = docsDf(Seq(1L -> "anything"))
    intercept[IllegalArgumentException] {
      Classifier.score(d, "doc_id", "text", model)
    }
    val ok = Classifier.train(textDf(posSeed), textDf(negSeed), "text")
    intercept[IllegalArgumentException] {
      Classifier.score(d, "doc_id", "text", ok, alpha = 0.0)
    }
  }

  test("multiclass: StrictMath score parity, argmax prediction, tie-break, unscorable NULL") {
    val seed = Seq(
      ("en", "the quick brown fox jumps over the lazy dog"),
      ("en", "a quick dog jumps over the brown fence"),
      ("de", "der schnelle braune fuchs springt gern hoch"),
      ("de", "der hund springt hoch und gern"),
      ("fr", "le renard brun rapide saute par dessus le chien"))
    val seedDf = df(StructType(Seq(StructField("lang", StringType),
      StructField("text", StringType))),
      seed.map { case (l, t) => Row(l, t) }: _*)
    val model = Classifier.trainMulti(seedDf, "lang", "text")
    // driver-side reference
    val cnts = seed.groupBy(_._1).map { case (l, ds) =>
      l -> ds.flatMap(d => toksRef(d._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
    }
    val v = seed.flatMap(d => toksRef(d._2)).distinct.size
    def scoreRefM(text: String, l: String): Double = {
      val m = cnts(l); val nl = m.values.sum
      toksRef(text).groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (w, k)) =>
          acc + k.toDouble * StrictMath.log(
            (m.getOrElse(w, 0L).toDouble + 1.0) /
              (nl.toDouble + v.toDouble))
        }
    }
    val cands = Seq(
      10L -> "the quick dog jumps high",
      11L -> "der schnelle hund springt hoch",
      12L -> "le renard saute par dessus")
    val candsDf = docsDf(cands)
    val got = Classifier.scoreMulti(candsDf, "doc_id", "text", model)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("label")) -> r.getAs[Double]("score")).toMap
    for ((id, text) <- cands; l <- Seq("en", "de", "fr"))
      assert(got((id, l)) == scoreRefM(text, l),
        s"score mismatch at ($id, $l)")
    val pred = Classifier.predictMulti(candsDf, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(10L -> "en", 11L -> "de", 12L -> "fr"), s"$pred")
    // unscorable doc: NULL prediction, no scoreMulti rows
    val withEmpty = docsDf(Seq(1L -> "", 2L -> "the quick dog"))
    val p2 = Classifier.predictMulti(withEmpty, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) ->
        Option(r.getString(1))).toMap
    assert(p2(1L).isEmpty && p2(2L).contains("en"))
    // tie-break: a doc of only-OOV tokens scores every label at the
    // same smoothed floor ONLY if label masses are equal — construct
    // equal-mass labels and assert the smaller label wins
    val eq = df(StructType(Seq(StructField("lang", StringType),
      StructField("text", StringType))),
      Row("b", "bb1 bb2 bb3"), Row("a", "aa1 aa2 aa3"))
    val eqModel = Classifier.trainMulti(eq, "lang", "text")
    val tie = Classifier.predictMulti(docsDf(Seq(5L -> "zz1 zz2")),
      "doc_id", "text", eqModel).collect()
    assert(tie.head.getString(1) == "a", "ties must break on label asc")
  }

  test("persisted family: stamp guard, bit-parity serve, drift, maintain") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-nbc").toString
    val spark2 = spark
    // stampless serve refuses
    intercept[IllegalArgumentException] {
      Classifier.scoreIndexed(spark2, "t_nbc0", dir + "/none",
        docsDf(Seq(1L -> "x")), "doc_id", "text")
    }
    Classifier.writeClassifier(textDf(posSeed), textDf(negSeed), "text",
      "t_nbc", dir)
    val cands = docsDf(Seq(
      1L -> "careful clear prose and careful flow",
      2L -> "cheap cheap deals click here now"))
    val oneShot = Classifier.score(cands, "doc_id", "text",
        Classifier.train(textDf(posSeed), textDf(negSeed), "text"))
      .orderBy("doc_id").collect().toSeq
    val served = Classifier.scoreIndexed(spark2, "t_nbc", dir, cands,
      "doc_id", "text").orderBy("doc_id").collect().toSeq
    assert(served == oneShot) // bit parity, llr included
    // OOV drift: a fresh slice full of unseen tokens reads high
    val oov = Classifier.classifierOovRate(spark2, "t_nbc", dir,
      textDf(Seq("totally novel words beyond any seed")), "text")
    assert(oov == 1.0)
    val oovLow = Classifier.classifierOovRate(spark2, "t_nbc", dir,
      textDf(Seq("careful prose cheap deals")), "text")
    assert(oovLow == 0.0)
    // maintenance: drift over threshold with seeds present -> retrain
    // fires and the served vocab picks up the fresh tokens
    val rep = Maintain.maintainClassifier(spark2, "t_nbc", dir,
      Maintain.Policy(maxDriftDelta = 0.5),
      freshSample = Some(textDf(Seq("totally novel words"))),
      freshPos = Some(textDf(Seq("totally novel words of quality"))),
      freshNeg = Some(textDf(negSeed)))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(3), r.getString(4))).toMap
    assert(rep("oov_drift")._1,
      "drift over threshold with both seeds must fire the retrain")
    assert(Classifier.classifierOovRate(spark2, "t_nbc", dir,
      textDf(Seq("totally novel words")), "text") == 0.0)
    // drift indicated but seeds absent -> recorded, not fired
    val rep2 = Maintain.maintainClassifier(spark2, "t_nbc", dir,
      Maintain.Policy(maxDriftDelta = 0.0001),
      freshSample = Some(textDf(Seq("yet more unseen vocabulary"))))
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(3), r.getString(4))).toMap
    assert(!rep2("oov_drift")._1 &&
      rep2("oov_drift")._2.contains("indicated"))
  }

  test("ClassifierFilter rides the Pipeline: equals pre-filtering, clf_quality metric resolves, composes with LmFilter") {
    import graft.llm.{NgramLm, Pipeline, TextStats}
    val model = Classifier.train(textDf(posSeed), textDf(negSeed), "text")
    // 72 crawl-like, 73 exact dup of 70, 74/75 a near-dup pair so the
    // early observations resolve (the pretrainCorpusObserved caveat)
    val docs = docsDf(Seq(
      70L -> "curated careful prose reads well and flows clearly all day",
      71L -> "clear careful writing reads well and flows along nicely too",
      72L -> "buy cheap deals click here now buy cheap deals click again",
      73L -> "curated careful prose reads well and flows clearly all day",
      74L -> "careful prose flows clearly and reads well in the morning ok",
      75L -> "careful prose flows clearly and reads well in the morning yes"))
    val bench = docsDf(Seq(100L -> "benchmark prose sharing no shingle"))
    val cf = Pipeline.ClassifierFilter(model, 0.0)
    val composed = Pipeline.pretrainCorpus(docs, bench, "doc_id", "text",
        classifierFilter = Some(cf), persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val qKept = TextStats.qualityFilter(docs, "text")
    val clfKeptIds = Classifier.filterByClassifier(qKept, "doc_id",
        "text", model, 0.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val qIds = qKept.select("doc_id").collect().map(_.getLong(0)).toSet
    val preDropped = docs.filter(
      !col("doc_id").isin((qIds -- clfKeptIds).toSeq: _*))
    val expected = Pipeline.pretrainCorpus(preDropped, bench, "doc_id",
        "text", persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(composed == expected)
    assert(!composed.contains(72L), s"classifier must drop crawl-like: $composed")
    assert(!composed.contains(73L), "exact dedup still runs after the stage")
    val (out, obs) = Pipeline.pretrainCorpusObserved(docs, bench,
      "doc_id", "text", classifierFilter = Some(cf))
    out.collect()
    assert(obs("clf_quality").get("rows") == clfKeptIds.size.toLong)
    assert(obs("quality").get("rows") == qIds.size.toLong)
    assert(obs("input").get("rows") == 6L)
    // both model gates co-active: LM permissive, classifier decisive —
    // the chain composes and the result matches classifier-only
    val lmModel = NgramLm.train(docsDf(Seq(0L -> posSeed.mkString(" "))),
      "text", 1)
    val both = Pipeline.pretrainCorpus(docs, bench, "doc_id", "text",
        lmFilter = Some(Pipeline.LmFilter(lmModel, -1e9, n = 1)),
        classifierFilter = Some(cf), persistStages = false)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(both == composed)
  }

  test("classifierScoreStream: batch parity, per-batch partitions, mid-stream retrain picked up via the catalog") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_nbc_srv")
      .toString
    try {
      Classifier.train(textDf(posSeed), textDf(negSeed), "text")
        .write.saveAsTable("nbcsrv_model")
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.classifierScoreStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        "nbcsrv_model", outPath = s"$base/out",
        checkpoint = s"$base/ckpt").start()
      val d1 = Seq(90L -> "careful clear prose flows well")
      val d2 = Seq(91L -> "cheap deals and fresh vocabulary")
      val posSeed2 = posSeed :+ "fresh vocabulary reads clearly"
      try {
        in.addData(d1.head._1 -> d1.head._2)
        q.processAllAvailable()
        // RETRAIN mid-stream: the next trigger must resolve it
        Classifier.train(textDf(posSeed2), textDf(negSeed), "text")
          .write.mode("overwrite").saveAsTable("nbcsrv_model")
        in.addData(d2.head._1 -> d2.head._2)
        q.processAllAvailable()
      } finally q.stop()
      def batchScore(docs: Seq[(Long, String)], pos: Seq[String]) =
        Classifier.score(docsDf(docs), "doc_id", "text",
            Classifier.train(textDf(pos), textDf(negSeed), "text"))
          .select("doc_id", "llr_mean").collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val got = spark.read.parquet(s"$base/out")
        .select("doc_id", "llr_mean").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
      val want = (batchScore(d1, posSeed) ++ batchScore(d2, posSeed2))
        .sortBy(_._1)
      assert(got == want, s"$got vs $want")
      assert(new java.io.File(s"$base/out").listFiles()
        .count(_.getName.startsWith("batch_id=")) == 2)
    } finally {
      spark.sql("DROP TABLE IF EXISTS nbcsrv_model")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("ClassifierFilter rides the daily ingest: crawl-like never reaches the keys boundary; audit says clf_quality") {
    import graft.llm.{Dedup, Pipeline}
    val base = java.nio.file.Files.createTempDirectory("graft_nbc_ing")
      .toString
    try {
      val model = Classifier.train(textDf(posSeed), textDf(negSeed),
        "text")
      val corpus = docsDf(Seq(
        80L -> "curated careful prose reads well and flows clearly early"))
      Dedup.writeNearDupIndex(corpus, "doc_id", "text", "nbcing_t",
        s"$base/idx")
      val shard = docsDf(Seq(
        81L -> "clear careful writing reads well and flows along nicely",
        82L -> "buy cheap deals click here now best online prices today"))
      val cf = Pipeline.ClassifierFilter(model, 0.0)
      val bench = docsDf(Seq(
        100L -> "benchmark prose sharing no shingle with anything here"))
      val counts = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "nbcing_t", s"$base/idx", s"$base/land", "d1", redactPii = false,
        classifierFilter = Some(cf))
      assert(counts("landed") == 1L)
      assert(spark.read.parquet(s"$base/land").select("doc_id")
        .collect().map(_.getLong(0)).toSet == Set(81L))
      assert(spark.table("nbcing_t_keys").filter(col("id") === 82L).isEmpty)
      val fates = Pipeline.ingestAudit(shard, bench, "doc_id", "text",
          "nbcing_t", redactPii = false, classifierFilter = Some(cf))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(fates(82L) == "clf_quality")
      assert(fates(81L) == "exact_vs_corpus")
    } finally {
      Seq("nbcing_t_bands", "nbcing_t_shingles", "nbcing_t_keys")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("persisted multiclass model: round trip, stampless refusal, fleet-fired retrain, compaction, streaming retrain pickup") {
    val labeled = StructType(Seq(StructField("lang", StringType),
      StructField("text", StringType)))
    val seed = df(labeled,
      Row("aa", "alpha beta gamma delta epsilon zeta eta theta"),
      Row("aa", "beta gamma alpha epsilon theta zeta delta alpha"),
      Row("bb", "uno dos tres cuatro cinco seis siete ocho"),
      Row("bb", "dos tres uno cinco ocho siete cuatro uno"))
    val cand = docsDf(Seq(
      1L -> "alpha beta gamma epsilon words",
      2L -> "uno dos tres cuatro palabras",
      3L -> ""))
    val base = java.nio.file.Files.createTempDirectory("graft_nbm").toString
    val path = s"$base/model"
    try {
      Classifier.writeMulti(seed, "lang", "text", "nbm_t", path)
      // bit parity with the one-shot forms
      val model = Classifier.trainMulti(seed, "lang", "text")
      val want = Classifier.scoreMulti(cand, "doc_id", "text", model)
        .orderBy("doc_id", "label").collect().toSeq
      assert(Classifier.scoreMultiIndexed(spark, "nbm_t", path, cand,
          "doc_id", "text")
        .orderBy("doc_id", "label").collect().toSeq == want)
      val wantPred = Classifier.predictMulti(cand, "doc_id", "text", model)
        .orderBy("doc_id").collect().toSeq
      assert(Classifier.predictMultiIndexed(spark, "nbm_t", path, cand,
          "doc_id", "text")
        .orderBy("doc_id").collect().toSeq == wantPred)
      // the production lang gate serves from the catalog
      assert(Classifier.filterByLangIndexed(spark, "nbm_t", path, cand,
          "doc_id", "text", Set("aa"))
        .select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
      // compaction preserves serving
      Classifier.compactMulti(spark, "nbm_t")
      assert(Classifier.scoreMultiIndexed(spark, "nbm_t", path, cand,
          "doc_id", "text")
        .orderBy("doc_id", "label").collect().toSeq == want)
      // fleet sweep: drift indicated-but-unfireable without a seed,
      // FIRED with one, and serving reads the new generation
      val drifted = docsDf(Seq(
        100L -> "voltage resistor capacitor diode relay circuit"))
      assert(Classifier.multiOovRate(spark, "nbm_t", path, drifted,
        "text") > 0.5)
      val pol = Maintain.Policy(maxDriftDelta = 0.1)
      val sweep1 = Maintain.maintainAll(spark, Seq(
        "nbm" -> Maintain.MultiTarget("nbm_t", path,
          freshSample = Some(drifted))), pol).collect()
        .map(r => r.getString(1) -> (r.getBoolean(4), r.getString(5)))
        .toMap
      assert(!sweep1("oov_drift")._1 &&
        sweep1("oov_drift")._2.contains("indicated"), sweep1.toString)
      val freshSeed = seed.unionByName(df(labeled,
        Row("cc", "voltage resistor capacitor diode relay circuit fuse")))
      val sweep2 = Maintain.maintainAll(spark, Seq(
        "nbm" -> Maintain.MultiTarget("nbm_t", path,
          freshSample = Some(drifted), freshSeed = Some(freshSeed),
          labelCol = "lang")), pol).collect()
        .map(r => r.getString(1) -> (r.getBoolean(4), r.getString(5)))
        .toMap
      assert(sweep2("oov_drift") ==
        ((true, "Classifier.writeMulti(freshSeed)")), sweep2.toString)
      assert(Classifier.multiOovRate(spark, "nbm_t", path, drifted,
        "text") == 0.0)
      assert(Classifier.predictMultiIndexed(spark, "nbm_t", path,
          drifted, "doc_id", "text")
        .head().getString(1) == "cc")
      // streaming serve picks up a mid-stream wholesale retrain
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sq = spark.sqlContext
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.langPredictStream(
        in.toDF().toDF("doc_id", "text"), "doc_id", "text",
        "nbm_t_nbm", outPath = s"$base/out",
        checkpoint = s"$base/ckpt").start()
      try {
        in.addData(10L -> "alpha beta gamma epsilon")
        q.processAllAvailable()
        Classifier.writeMulti(seed, "lang", "text", "nbm_t", path)
        in.addData(11L -> "voltage resistor capacitor diode")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(s"$base/out")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(10L) == "aa", got.toString)
      // after the retrain back to the 2-label seed, 'cc' is gone: the
      // drifted text predicts one of aa/bb (floor everywhere) — the
      // point is the NEW generation decided, not the old
      assert(Set("aa", "bb").contains(got(11L)), got.toString)
      // stampless refusal
      assert(new java.io.File(path, "_graft_nbm_meta.json").delete())
      val e = intercept[IllegalArgumentException] {
        Classifier.scoreMultiIndexed(spark, "nbm_t", path, cand,
          "doc_id", "text")
      }
      assert(e.getMessage.contains("writeMulti"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS nbm_t_nbm")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }
}
