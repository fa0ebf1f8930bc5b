package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Maintain, NgramLm}

/** Persisted reference LM — the seventh maintained family: bit-parity
  * with the one-shot form, exchange-free ctx-stats derivation,
  * wholesale-retrain lifecycle, fleet-sweep membership, stampless
  * refusal. */
class PersistedLmSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private val ref: Seq[(Long, String)] = Seq(
    0L -> "the cat sat on the mat",
    1L -> "the dog sat on the rug",
    2L -> "a cat and a dog met on the mat")
  private val cand: Seq[(Long, String)] = Seq(
    10L -> "the cat sat on the rug",
    11L -> "the zebra sat on a xylophone",
    12L -> "single")

  private def collectScores(d: DataFrame): Seq[Row] =
    d.orderBy("doc_id").collect().toSeq

  private def withLm(name: String, docs: Seq[(Long, String)])
                    (body: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_plm_$name")
      .toString
    try {
      NgramLm.writeLm(docsDf(docs), "text", name, tmp)
      body(tmp)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_lm")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("scoreIndexed is bit-identical to the one-shot score") {
    withLm("plma", ref) { path =>
      val want = collectScores(NgramLm.score(docsDf(cand), "doc_id",
        "text", NgramLm.train(docsDf(ref), "text", 2), 2))
      val got = collectScores(NgramLm.scoreIndexed(spark, "plma", path,
        docsDf(cand), "doc_id", "text"))
      assert(got == want)
    }
  }

  test("scoreIndexed parity on the parquet fixture") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val refDf = docs.filter(col("doc_id") % 10 === 0)
    val candDf = docs.filter(col("doc_id") % 10 =!= 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_plm_pq").toString
    try {
      NgramLm.writeLm(refDf, "text", "plmb", tmp)
      val want = collectScores(NgramLm.score(candDf, "doc_id", "text",
        NgramLm.train(refDf, "text", 2), 2))
      val got = collectScores(NgramLm.scoreIndexed(spark, "plmb", tmp,
        candDf, "doc_id", "text"))
      assert(got == want && got.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS plmb_lm")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("the ctx-totals aggregate is exchange-free: grouping key == bucketing key") {
    withLm("plmc", ref) { _ =>
      val plan = spark.table("plmc_lm").groupBy("ctx")
        .agg(sum("cnt").as("ctx_cnt"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"ctx aggregate must ride the bucketing, no exchange:\n$plan")
    }
  }

  test("writeLm is the retrain: a rebuild on a grown reference serves the new counts; compaction preserves serving") {
    withLm("plmd", ref) { path =>
      val grown = ref :+ (3L -> "the rug sat on the dog and the cat")
      NgramLm.writeLm(docsDf(grown), "text", "plmd", path)
      val want = collectScores(NgramLm.score(docsDf(cand), "doc_id",
        "text", NgramLm.train(docsDf(grown), "text", 2), 2))
      assert(collectScores(NgramLm.scoreIndexed(spark, "plmd", path,
        docsDf(cand), "doc_id", "text")) == want)
      NgramLm.compactLm(spark, "plmd")
      val files = NgramLm.lmReport(spark, "plmd")
        .select("files").head().getLong(0)
      assert(files <= 8, s"one file per bucket after compaction: $files")
      assert(collectScores(NgramLm.scoreIndexed(spark, "plmd", path,
        docsDf(cand), "doc_id", "text")) == want)
    }
  }

  test("maintainLm: healthy untouched; drifted fresh reference fires the wholesale retrain; fleet sweep carries the target") {
    withLm("plme", ref) { path =>
      // healthy: the fresh slice IS the training reference — OOV 0
      val healthy = Maintain.maintainLm(spark, "plme", path,
        freshRef = Some(docsDf(ref)))
      val rows = healthy.collect()
        .map(r => r.getString(0) -> r.getBoolean(3)).toMap
      assert(rows == Map("retraction" -> false, "oov_drift" -> false,
        "table_files" -> false))
      assert(healthy.filter(col("check") === "oov_drift")
        .head().getDouble(1) == 0.0)
      // drifted: a fresh reference with mostly-new vocabulary
      val drifted = ref.map { case (i, _) =>
        (i + 100L, "voltage resistor capacitor diode relay circuit") }
      val rep = Maintain.maintainLm(spark, "plme", path,
        freshRef = Some(docsDf(drifted)))
      assert(rep.filter(col("check") === "oov_drift").head().getBoolean(3),
        s"drift must fire: ${rep.collect().toSeq}")
      // the retrain installed the fresh reference's counts
      val want = collectScores(NgramLm.score(docsDf(cand), "doc_id",
        "text", NgramLm.train(docsDf(drifted), "text", 2), 2))
      assert(collectScores(NgramLm.scoreIndexed(spark, "plme", path,
        docsDf(cand), "doc_id", "text")) == want)
      // fleet sweep: one LmTarget row set under its label
      val fleet = Maintain.maintainAll(spark,
        Seq("lm" -> Maintain.LmTarget("plme", path,
          Some(docsDf(drifted)))))
      assert(fleet.filter(col("target") === "lm" &&
        col("check") === "oov_drift").count() == 1L)
      assert(fleet.filter(col("check") === "pass_failed").isEmpty)
    }
  }

  test("a stampless directory refuses to serve; lmOovRate on an empty slice is 0") {
    withLm("plmf", ref) { path =>
      assert(NgramLm.lmOovRate(spark, "plmf", path,
        docsDf(Seq.empty), "text") == 0.0)
      val stamp = new java.io.File(path, "_graft_lm_meta.json")
      assert(stamp.delete())
      val e = intercept[IllegalArgumentException] {
        NgramLm.scoreIndexed(spark, "plmf", path, docsDf(cand), "doc_id",
          "text")
      }
      assert(e.getMessage.contains("writeLm"))
    }
  }
}
