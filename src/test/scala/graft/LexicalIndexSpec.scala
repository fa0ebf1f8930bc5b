package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Lexical, Maintain}

/** The persisted lexical (BM25 inverted) index family: indexed serving
  * must hash-match the one-shot form (which LexicalSpec pins against a
  * driver-side IEEE reference), the postings scan must BUCKET-PRUNE to
  * the query's terms, and the family carries the full production
  * contract — replay-safe append with crashed-append recovery,
  * retraction, online compaction, and the drift-policy maintenance
  * pass. */
class LexicalIndexSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private def queriesDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("qid", LongType),
      StructField("qtext", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private def collectBm25(r: DataFrame): Seq[(Long, Long, Long, Double, Long)] =
    r.orderBy("query_id", "rank").collect().toSeq.map(row =>
      (row.getLong(row.fieldIndex("query_id")),
        row.getLong(row.fieldIndex("doc_id")),
        row.getLong(row.fieldIndex("n_terms")),
        row.getDouble(row.fieldIndex("score")),
        row.getLong(row.fieldIndex("rank"))))

  private val corpus: Seq[(Long, String)] = Seq(
    0L -> "the red fox jumps over the lazy dog",
    1L -> "red red red fox",
    2L -> "a lazy dog sleeps all day long in the red barn",
    3L -> "fox and dog and fox again",
    4L -> "completely unrelated words about spark shuffles",
    5L -> "",
    6L -> "barn owls hunt at night near the red barn",
    7L -> "spark shuffles move rows between partitions",
    8L -> "the quick brown fox is not the red fox",
    9L -> "dog days of summer in the barn")
  private val qs = Seq(0L -> "red fox", 1L -> "lazy dog barn")

  private def withIndex(name: String, docs: Seq[(Long, String)],
                        buckets: Int = 8)(body: String => Unit): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory(s"graft_lex_$name")
      .toString
    try {
      Lexical.writeLexicalIndex(docsDf(docs), "doc_id", "text", name, tmp,
        buckets = buckets)
      body(tmp)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_postings")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_doclens")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  private def oneShot(docs: Seq[(Long, String)], logIdf: Boolean = false) =
    collectBm25(Lexical.bm25TopK(docsDf(docs), "doc_id", "text",
      queriesDf(qs), "qid", "qtext", k = 5, logIdf = logIdf))

  private def served(name: String, path: String, logIdf: Boolean = false) =
    collectBm25(Lexical.bm25TopKIndexed(spark, name, path,
      queriesDf(qs), "qid", "qtext", k = 5, logIdf = logIdf))

  private def tableRows(name: String): (Long, Long) =
    (spark.table(s"${name}_postings").count(),
      spark.table(s"${name}_doclens").count())

  test("indexed serving hash-matches the one-shot form bit-for-bit") {
    withIndex("lxa", corpus) { path =>
      assert(served("lxa", path) == oneShot(corpus))
      assert(served("lxa", path, logIdf = true) == oneShot(corpus, logIdf = true))
    }
  }

  test("query-term restriction bucket-prunes the postings scan") {
    withIndex("lxb", corpus) { path =>
      val plan = Lexical.bm25TopKIndexed(spark, "lxb", path,
        queriesDf(Seq(0L -> "red fox")), "qid", "qtext", k = 5)
        .queryExecution.executedPlan.toString
      val Sel = """SelectedBucketsCount: (\d+) out of (\d+)""".r
      val prunes = Sel.findAllMatchIn(plan)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toSeq
      // the postings scan advertises bucket pruning and reads at most
      // one bucket per distinct query term, never the full table
      assert(prunes.nonEmpty, s"no bucket pruning in plan:\n${plan.take(2000)}")
      assert(prunes.exists { case (sel, total) => total == 8 && sel <= 2 },
        s"postings scan not pruned to the query's terms: $prunes")
    }
  }

  test("append lands new docs and replaying the same shard is a no-op") {
    val (half, rest) = corpus.partition(_._1 < 5L)
    withIndex("lxc", half) { path =>
      val landed = Lexical.appendToLexicalIndex(docsDf(rest), "doc_id",
        "text", "lxc", path)
      assert(landed == rest.size)
      // post-append serving equals a fresh one-shot over the FULL corpus
      // — df, n_docs and avgdl all moved with the append
      assert(served("lxc", path) == oneShot(corpus))
      val before = tableRows("lxc")
      val again = Lexical.appendToLexicalIndex(docsDf(rest), "doc_id",
        "text", "lxc", path)
      assert(again == 0L)
      assert(tableRows("lxc") == before)
      assert(served("lxc", path) == oneShot(corpus))
    }
  }

  test("crashed append (boundary landed, postings not) recovers on shard replay") {
    val (half, rest) = corpus.partition(_._1 < 5L)
    withIndex("lxd", half) { path =>
      // simulate the crash window: doclens committed, postings append
      // never ran — exactly the state after step 2 of the append order
      graft.api.GraftFrame(
        Lexical.docLengths(docsDf(rest), "doc_id", "text"))
        .toBucketedTable("lxd_doclens", s"$path/doclens", 8,
          Seq("doc_id"), mode = "append")
      // the replayed shard sees every doc present but with orphaned
      // dl > 0 rows; recovery re-derives exactly their postings
      val landed = Lexical.appendToLexicalIndex(docsDf(rest), "doc_id",
        "text", "lxd", path)
      assert(landed == 0L) // nothing NEW — recovery, not a fresh land
      assert(served("lxd", path) == oneShot(corpus))
      // no duplicate postings rows slipped in
      val p = spark.table("lxd_postings")
      assert(p.count() == p.select("doc_id", "term").distinct().count())
      // and doclens rows stayed unique
      val d = spark.table("lxd_doclens")
      assert(d.count() == d.select("doc_id").distinct().count())
    }
  }

  test("retraction removes docs, shrinks the stats boundary, and re-landing works") {
    withIndex("lxe", corpus) { path =>
      import spark.implicits._
      val victims = Seq(1L, 3L)
      val counts = Lexical.retractFromLexicalIndex(spark, "lxe",
        victims.toDF("doc_id"), "doc_id")
      assert(counts("lxe_doclens") == ((corpus.size.toLong,
        corpus.size.toLong - victims.size)))
      val survivors = corpus.filterNot(d => victims.contains(d._1))
      // scores equal a fresh build over the survivors: df AND the
      // n_docs/avgdl stats all reflect the retraction
      assert(served("lxe", path) == oneShot(survivors))
      assert(!served("lxe", path).exists(r => victims.contains(r._2)))
      // a retracted id lands again — the point of a takedown
      val back = Lexical.appendToLexicalIndex(
        docsDf(corpus.filter(d => victims.contains(d._1))), "doc_id",
        "text", "lxe", path)
      assert(back == victims.size)
      assert(served("lxe", path) == oneShot(corpus))
    }
  }

  test("compaction: one file per bucket, serving unchanged") {
    val (half, rest) = corpus.partition(_._1 < 5L)
    withIndex("lxf", half) { path =>
      Lexical.appendToLexicalIndex(docsDf(rest), "doc_id", "text", "lxf",
        path)
      val filesBefore = Lexical.lexicalIndexReport(spark, "lxf")
        .agg(max(col("files"))).head().getLong(0)
      Lexical.compactLexicalIndex(spark, "lxf")
      val report = Lexical.lexicalIndexReport(spark, "lxf").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(report.values.forall(_._2 <= 8), s"files per table: $report")
      assert(report.values.map(_._2).max < filesBefore)
      assert(served("lxf", path) == oneShot(corpus))
    }
  }

  test("maintenance: healthy fires nothing; fragmentation fires compaction") {
    val (half, rest) = corpus.partition(_._1 < 5L)
    withIndex("lxg", half) { path =>
      val healthy = Maintain.maintainLexicalIndex(spark, "lxg").collect()
      assert(healthy.forall(!_.getBoolean(3)))
      assert(healthy.exists(r => r.getString(0) == "stats_drift" &&
        r.getString(4).startsWith("n/a")))
      Lexical.appendToLexicalIndex(docsDf(rest), "doc_id", "text", "lxg",
        path)
      val tight = Maintain.Policy(maxFilesFlat = 1)
      val rep = Maintain.maintainLexicalIndex(spark, "lxg", tight).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(rep("table_files").getBoolean(3))
      assert(rep("table_files").getString(4) == "Lexical.compactLexicalIndex")
      assert(served("lxg", path) == oneShot(corpus))
    }
  }

  test("id-Bloom sidecar: replay still caught, rebuild rides the full rebuild") {
    val (half, rest) = corpus.partition(_._1 < 5L)
    withIndex("lxh", half) { path =>
      Lexical.buildLexicalIdBlooms(spark, "lxh", path, nBlooms = 4)
      Lexical.appendToLexicalIndex(docsDf(rest), "doc_id", "text", "lxh",
        path)
      assert(served("lxh", path) == oneShot(corpus))
      // replay through the bloom-routed guard still appends nothing
      val before = tableRows("lxh")
      assert(Lexical.appendToLexicalIndex(docsDf(rest), "doc_id", "text",
        "lxh", path) == 0L)
      assert(tableRows("lxh") == before)
      // a full rebuild re-populates the sidecar in lockstep: an id only
      // in the OLD population must route as definitely-new afterwards
      Lexical.writeLexicalIndex(docsDf(half), "doc_id", "text", "lxh", path)
      assert(Lexical.appendToLexicalIndex(docsDf(rest), "doc_id", "text",
        "lxh", path) == rest.size)
      assert(served("lxh", path) == oneShot(corpus))
    }
  }

  test("ingestShard lexical lockstep: landed docs keyword-searchable, replay no-op, retraction reaches the index") {
    import graft.llm.{Dedup, Pipeline}
    val (half, rest) = corpus.partition(_._1 < 5L)
    val base = java.nio.file.Files.createTempDirectory("graft_lex_ing")
      .toString
    try {
      Dedup.writeNearDupIndex(docsDf(half), "doc_id", "text", "lxing_t",
        s"$base/idx")
      Lexical.writeLexicalIndex(docsDf(half), "doc_id", "text", "lxj",
        s"$base/lex")
      val bench = docsDf(Seq(100L -> "alpha beta gamma delta epsilon zeta"))
      // shard: the rest of the corpus plus an exact dup of corpus doc 0
      // under a new id — the gate must drop it and the lexical index
      // must never see it
      val shard = docsDf(rest :+ (900L -> half.head._2))
      val counts = Pipeline.ingestShard(shard, bench, "doc_id", "text",
        "lxing_t", s"$base/idx", s"$base/land", "day1",
        lexical = Some(("lxj", s"$base/lex")))
      val landedIds = spark.read.parquet(s"$base/land")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!landedIds.contains(900L) && counts("landed") == landedIds.size)
      val expected = corpus.filter(d => half.exists(_._1 == d._1) ||
        landedIds.contains(d._1))
      assert(served("lxj", s"$base/lex") == oneShot(expected))
      // O(1) manifest replay leaves the lexical index untouched; a
      // forced re-run (manifest deleted) appends nothing new
      val before = tableRows("lxj")
      Pipeline.ingestShard(shard, bench, "doc_id", "text", "lxing_t",
        s"$base/idx", s"$base/land", "day1",
        lexical = Some(("lxj", s"$base/lex")))
      assert(new java.io.File(
        s"$base/land/_graft_shard_day1.json").delete())
      Pipeline.ingestShard(shard, bench, "doc_id", "text", "lxing_t",
        s"$base/idx", s"$base/land", "day1",
        lexical = Some(("lxj", s"$base/lex")))
      assert(tableRows("lxj") == before)
      assert(served("lxj", s"$base/lex") == oneShot(expected))
      // a takedown through the pipeline reaches the lexical leg too
      import spark.implicits._
      val removed = Pipeline.retractDocuments(spark, Seq(6L).toDF("doc_id"),
        "doc_id", "lxing_t", s"$base/land", lexical = Some("lxj"))
      assert(removed("lxj_doclens") == 1L)
      assert(served("lxj", s"$base/lex") ==
        oneShot(expected.filterNot(_._1 == 6L)))
    } finally {
      Seq("lxing_t_bands", "lxing_t_shingles", "lxing_t_keys",
        "lxj_postings", "lxj_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("streaming BM25 serving: batch parity, per-batch partitions, mid-stream compaction picked up") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_lex_srv")
      .toString
    try {
      Lexical.writeLexicalIndex(docsDf(corpus), "doc_id", "text", "lxk",
        s"$base/lex")
      val in = MemoryStream[(Long, String)]
      val q = graft.streaming.Streams.bm25QueryStream(
        in.toDF().toDF("qid", "qtext"), "qid", "qtext", "lxk",
        s"$base/lex", k = 3, outPath = s"$base/out",
        checkpoint = s"$base/ckpt").start()
      try {
        in.addData((0L, "red fox"))
        q.processAllAvailable()
        // an online compaction between micro-batches: the next trigger
        // resolves the flipped table location through the catalog
        Lexical.compactLexicalIndex(spark, "lxk")
        in.addData((1L, "lazy dog barn"))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.read.parquet(s"$base/out")
        .select("query_id", "doc_id", "score", "rank")
        .collect().map(_.toString).sorted.toSeq
      val expect = Lexical.bm25TopKIndexed(spark, "lxk", s"$base/lex",
          queriesDf(qs), "qid", "qtext", k = 3)
        .select("query_id", "doc_id", "score", "rank")
        .collect().map(_.toString).sorted.toSeq
      assert(got.nonEmpty && got == expect,
        s"stream results must match the batch path: $got vs $expect")
      assert(new java.io.File(s"$base/out").listFiles()
        .count(_.getName.startsWith("batch_id=")) == 2)
    } finally {
      Seq("lxk_postings", "lxk_doclens")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("a stampless directory refuses to serve or append") {
    withIndex("lxi", corpus) { path =>
      val stamp = new java.io.File(path, "_graft_lexical_meta.json")
      assert(stamp.delete())
      intercept[IllegalArgumentException] {
        Lexical.bm25TopKIndexed(spark, "lxi", path, queriesDf(qs),
          "qid", "qtext", k = 5)
      }
      intercept[IllegalArgumentException] {
        Lexical.appendToLexicalIndex(docsDf(corpus), "doc_id", "text",
          "lxi", path)
      }
    }
  }
}
