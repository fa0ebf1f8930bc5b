package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Bpe, Classifier, Maintain, NgramLm}

/** The observe→act loop for the TRAINED-model families, closed at the
  * FLEET level (r14): one nightly `maintainAll` sweep carrying refresh
  * corpora must itself fire the wholesale retrains
  * (writeLm / writeClassifier / writeBpeModel) when drift indicates,
  * and serving must read from the new generation afterwards — the
  * r12 discipline that closed observe→act for the index families,
  * extended to models. The per-family passes are specced in their own
  * suites; this one pins the SWEEP as the actor. */
class MaintainFleetSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private val classic: Seq[(Long, String)] = Seq(
    0L -> "the cat sat on the mat and the dog sat on the rug",
    1L -> "a cat and a dog met on the mat near the rug",
    2L -> "the bird sang on the branch while the cat watched")
  // mostly-new vocabulary: OOV drift fires on every family
  private val drifted: Seq[(Long, String)] = Seq(
    100L -> "voltage resistor capacitor diode relay circuit breaker",
    101L -> "inductor transistor amplifier oscillator rectifier fuse",
    102L -> "transformer capacitor relay diode voltage inductor")
  private val negSeed: Seq[(Long, String)] = Seq(
    200L -> "buy cheap pills now click here win prizes fast",
    201L -> "free money lottery winner claim your reward today")

  test("one fleet sweep fires all three trained-model retrains and serving reads the new generation") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_fleet_retrain").toString
    val (lmPath, nbcPath, bpePath) =
      (s"$base/lm", s"$base/nbc", s"$base/bpe")
    try {
      NgramLm.writeLm(docsDf(classic), "text", "flt_lm", lmPath)
      Classifier.writeClassifier(docsDf(classic), docsDf(negSeed),
        "text", "flt_nbc", nbcPath)
      Bpe.writeBpeModel(docsDf(classic), "text", "flt_bpe", bpePath,
        numMerges = 4)
      // pre-sweep: the drifted slice is heavily OOV everywhere
      assert(NgramLm.lmOovRate(spark, "flt_lm", lmPath,
        docsDf(drifted), "text") > 0.5)
      assert(Classifier.classifierOovRate(spark, "flt_nbc", nbcPath,
        docsDf(drifted), "text") > 0.5)
      assert(Bpe.bpeOovRate(spark, "flt_bpe", bpePath,
        docsDf(drifted), "text") > 0.0)

      val freshRef = docsDf(classic ++ drifted)
      // BPE drift is structurally small (OOV words degrade to known
      // CHARACTERS — only unseen code points read -1), so the sweep
      // runs at a policy tight enough to catch it
      val pol = Maintain.Policy(maxDriftDelta = 0.01)
      val sweep = Maintain.maintainAll(spark, Seq(
        "lm" -> Maintain.LmTarget("flt_lm", lmPath,
          freshRef = Some(freshRef)),
        "nbc" -> Maintain.NbcTarget("flt_nbc", nbcPath,
          freshSample = Some(docsDf(drifted)),
          freshPos = Some(freshRef), freshNeg = Some(docsDf(negSeed))),
        "bpe" -> Maintain.BpeTarget("flt_bpe", bpePath,
          freshSample = Some(docsDf(drifted)),
          freshCorpus = Some(freshRef))), pol)
      val fired = sweep
        .filter(col("check") === "oov_drift")
        .collect()
        .map(r => r.getString(0) -> (r.getBoolean(4), r.getString(5)))
        .toMap
      assert(fired.keySet == Set("lm", "nbc", "bpe"))
      assert(fired("lm") == ((true, "NgramLm.writeLm(freshRef)")),
        s"$fired")
      assert(fired("nbc") ==
        ((true, "Classifier.writeClassifier(freshPos, freshNeg)")),
        s"$fired")
      assert(fired("bpe") == ((true, "Bpe.writeBpeModel(freshCorpus)")),
        s"$fired")
      assert(sweep.filter(col("check") === "pass_failed").isEmpty,
        sweep.collect().mkString(";"))

      // serving reads the NEW generation: the drifted vocabulary is
      // now in-model on every family
      assert(NgramLm.lmOovRate(spark, "flt_lm", lmPath,
        docsDf(drifted), "text") == 0.0)
      assert(Classifier.classifierOovRate(spark, "flt_nbc", nbcPath,
        docsDf(drifted), "text") == 0.0)
      assert(Bpe.bpeOovRate(spark, "flt_bpe", bpePath,
        docsDf(drifted), "text") == 0.0)
      // retrained outputs match a from-scratch train on the fresh
      // corpora — the sweep's retrain is the wholesale rebuild, not a
      // partial patch
      val wantLm = NgramLm.score(docsDf(drifted), "doc_id", "text",
          NgramLm.train(freshRef, "text", 2), 2)
        .orderBy("doc_id").collect().toSeq
      assert(NgramLm.scoreIndexed(spark, "flt_lm", lmPath,
          docsDf(drifted), "doc_id", "text")
        .orderBy("doc_id").collect().toSeq == wantLm)
      val wantBpe = Bpe.train(freshRef, "text", 4)
        .orderBy("rank").collect().toSeq
      assert(spark.table("flt_bpe_bpe").orderBy("rank").collect().toSeq
        == wantBpe)

      // a second sweep on the SAME refresh corpora is quiescent: drift
      // observed at 0, nothing fires — the loop converges
      val again = Maintain.maintainAll(spark, Seq(
        "lm" -> Maintain.LmTarget("flt_lm", lmPath,
          freshRef = Some(freshRef)),
        "nbc" -> Maintain.NbcTarget("flt_nbc", nbcPath,
          freshSample = Some(docsDf(drifted)),
          freshPos = Some(freshRef), freshNeg = Some(docsDf(negSeed))),
        "bpe" -> Maintain.BpeTarget("flt_bpe", bpePath,
          freshSample = Some(docsDf(drifted)),
          freshCorpus = Some(freshRef))), pol)
      assert(again.filter(col("check") === "oov_drift" && col("fired"))
        .isEmpty, again.collect().mkString(";"))
    } finally {
      Seq("flt_lm_lm", "flt_nbc_nbc", "flt_bpe_bpe", "flt_bpe_bpe_vocab")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(base))
    }
  }
}
