package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Dedup, Lexical}

/** Index-routed retroactive decontamination: the champion-term pruned
  * report must EQUAL the full-scan report on true-overlap fixtures, the
  * candidate generation must never scan the corpus text, and the
  * zero-indexable-shingle case must refuse loudly. */
class LexicalDecontamSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  // a corpus with one verbatim benchmark phrase planted (doc 3), one
  // paraphrase sharing a 5-run (doc 4), and unrelated prose
  private val train: Seq[(Long, String)] = Seq(
    0L -> "the red fox jumps over the lazy dog in the morning light",
    1L -> "spark shuffles move rows between partitions with hash keys",
    2L -> "barn owls hunt at night near the quiet river bend",
    3L -> "we note that alpha beta gamma delta epsilon was solved before",
    4L -> "indeed alpha beta gamma delta epsilon zeta follows the lemma",
    5L -> "completely unrelated musings about compilers and caches")
  private val bench: Seq[(Long, String)] = Seq(
    100L -> "alpha beta gamma delta epsilon zeta eta theta",
    101L -> "numbers and letters mixed with careful phrasing throughout")

  private def collectReport(r: DataFrame): Seq[(Long, Long)] =
    r.orderBy("doc_id").collect().toSeq
      .map(x => (x.getLong(0), x.getLong(1)))

  test("indexed report equals the full-scan report; candidates never scan the corpus text") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lexdc").toString
    try {
      Lexical.writeLexicalIndex(docsDf(train), "doc_id", "text", "lxd1",
        tmp)
      val got = Lexical.contaminationReportIndexed(docsDf(train),
        docsDf(bench), "doc_id", "text", "lxd1", tmp)
      val want = Dedup.contaminationReport(docsDf(train), docsDf(bench),
        "doc_id", "text")
      assert(collectReport(got) == collectReport(want))
      assert(collectReport(got).map(_._1).toSet == Set(3L, 4L))
      // the drop form mirrors decontaminate
      val clean = Lexical.decontaminateIndexed(docsDf(train),
        docsDf(bench), "doc_id", "text", "lxd1", tmp)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      assert(clean == Seq(0L, 1L, 2L, 5L))
    } finally {
      Seq("lxd1_postings", "lxd1_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("indexed report equals full scan on the parquet fixture with a real index") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val trainDf = docs.filter(col("doc_id") % 10 =!= 0)
    val benchDf = docs.filter(col("doc_id") % 10 === 0)
    val tmp = java.nio.file.Files.createTempDirectory("graft_lexdc2").toString
    try {
      Lexical.writeLexicalIndex(trainDf, "doc_id", "text", "lxd2", tmp)
      val got = collectReport(Lexical.contaminationReportIndexed(trainDf,
        benchDf, "doc_id", "text", "lxd2", tmp))
      val want = collectReport(Dedup.contaminationReport(trainDf, benchDf,
        "doc_id", "text"))
      assert(got == want && got.nonEmpty)
    } finally {
      Seq("lxd2_postings", "lxd2_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("under termCap the postings restriction bucket-prunes; over it the semi-join path is result-identical") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lexdc5").toString
    try {
      Lexical.writeLexicalIndex(docsDf(train), "doc_id", "text", "lxd5",
        tmp)
      val inset = Lexical.contaminationReportIndexed(docsDf(train),
        docsDf(bench), "doc_id", "text", "lxd5", tmp)
      val plan = inset.queryExecution.executedPlan.toString
      val Sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r
      val prunes = Sel.findAllMatchIn(plan)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
      assert(prunes.nonEmpty, s"no bucket pruning in plan:\n${plan.take(2000)}")
      assert(prunes.exists { case (_, total) => total == 8 },
        s"postings scan not bucket-pruned: $prunes")
      // the over-cap fallback (broadcast semi-join) must agree exactly
      val semi = Lexical.contaminationReportIndexed(docsDf(train),
        docsDf(bench), "doc_id", "text", "lxd5", tmp, termCap = 1)
      assert(collectReport(inset) == collectReport(semi))
    } finally {
      Seq("lxd5_postings", "lxd5_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("absent champion prunes to an empty report") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lexdc3").toString
    try {
      Lexical.writeLexicalIndex(docsDf(train), "doc_id", "text", "lxd3",
        tmp)
      // every shingle of this benchmark carries a word absent from the
      // corpus — its champion has df = 0, so the report is empty
      val got = Lexical.contaminationReportIndexed(docsDf(train),
        docsDf(Seq(200L -> "zyzzyva quokka marzipan obelisk fjord nimbus")),
        "doc_id", "text", "lxd3", tmp)
      assert(got.isEmpty)
    } finally {
      Seq("lxd3_postings", "lxd3_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("sweepBenchmark: a late benchmark retracts its hits from landing, near-dup index and lexical index; re-sweep is a no-op") {
    import graft.llm.Pipeline
    val base = java.nio.file.Files.createTempDirectory("graft_lexsw").toString
    try {
      // the standing corpus: landed parquet (shard_label layout), the
      // near-dup index, and the lexical index all hold the same docs
      docsDf(train).write.parquet(s"$base/land/shard_label=day1")
      Dedup.writeNearDupIndex(docsDf(train), "doc_id", "text", "lxsw",
        s"$base/idx")
      Lexical.writeLexicalIndex(docsDf(train), "doc_id", "text", "lxsl",
        s"$base/lex")
      val lateBench = docsDf(bench)
      val (report, removed) = Pipeline.sweepBenchmark(spark, lateBench,
        "doc_id", "text", "lxsw", s"$base/land", "lxsl", s"$base/lex")
      assert(collectReport(report).map(_._1) == Seq(3L, 4L))
      assert(removed("landing") == 2L)
      // landing: only the clean docs remain
      assert(spark.read.parquet(s"$base/land").select("doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq == Seq(0L, 1L, 2L, 5L))
      // near-dup index: the keys boundary dropped the swept ids
      assert(spark.table("lxsw_keys").filter(col("id").isin(3L, 4L))
        .isEmpty)
      // lexical index: the swept docs are no longer findable by keyword
      val hits = Lexical.bm25TopKIndexed(spark, "lxsl", s"$base/lex",
          docsDf(Seq(0L -> "alpha beta gamma")), "doc_id", "text", k = 5)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!hits.contains(3L) && !hits.contains(4L))
      // idempotent: the second sweep finds nothing and rewrites nothing
      val (r2, rm2) = Pipeline.sweepBenchmark(spark, lateBench, "doc_id",
        "text", "lxsw", s"$base/land", "lxsl", s"$base/lex")
      assert(r2.isEmpty && rm2.isEmpty)
    } finally {
      Seq("lxsw_bands", "lxsw_shingles", "lxsw_keys", "lxsl_postings",
        "lxsl_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("a benchmark shingle with no indexable term refuses loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_lexdc4").toString
    try {
      Lexical.writeLexicalIndex(docsDf(train), "doc_id", "text", "lxd4",
        tmp)
      val e = intercept[IllegalArgumentException] {
        Lexical.contaminationReportIndexed(docsDf(train),
          docsDf(Seq(300L -> "a b c d e alpha beta gamma")),
          "doc_id", "text", "lxd4", tmp)
      }
      assert(e.getMessage.contains("contaminationReport"))
    } finally {
      Seq("lxd4_postings", "lxd4_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }
}
