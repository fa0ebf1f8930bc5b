package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Lexical

/** BM25 lexical retrieval + RRF fusion: engine results are compared
  * EXACTLY (bit-equal doubles) against a driver-side reference that
  * mirrors the operator's IEEE operation tree — the same discipline the
  * DuckDB oracle applies cross-engine, applied in-engine so the ln-idf
  * variant (deliberately not oracle-expressible, see Lexical's
  * scaladoc) gets the same strength of evidence. */
class LexicalSpec extends SparkTestBase {

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  private def queriesDf(rows: Seq[(Long, String)]): DataFrame =
    df(StructType(Seq(StructField("qid", LongType),
      StructField("qtext", StringType))),
      rows.map { case (i, t) => Row(i, t) }: _*)

  /** Driver-side BM25 mirroring Lexical.termScore's exact operation
    * order (constants pre-combined the same way; fold in term order). */
  private def refBm25(docs: Seq[(Long, String)], queries: Seq[(Long, String)],
                      k: Int, k1: Double = 1.2, b: Double = 0.75,
                      minTermLen: Int = 2, logIdf: Boolean = false)
      : Seq[(Long, Long, Long, Double, Long)] = {
    def toks(t: String): Seq[String] =
      if (t == null) Seq.empty
      else t.split("\\s+").toSeq.filter(w => w.nonEmpty && w.length >= minTermLen)
    val nDocs = docs.size.toLong
    val dls = docs.map { case (id, t) => id -> toks(t).size.toLong }
    val totalLen = dls.map(_._2).sum
    val avgdl = totalLen.toDouble / nDocs.toDouble
    // (term -> (doc -> tf)), df per term
    val post: Map[String, Map[Long, Long]] = docs.flatMap { case (id, t) =>
      toks(t).groupBy(identity).map { case (w, g) => (w, id, g.size.toLong) }
    }.groupBy(_._1).map { case (w, g) =>
      w -> g.map(x => x._2 -> x._3).toMap
    }
    val dlMap = dls.toMap
    queries.flatMap { case (qid, qt) =>
      val qterms = toks(qt).distinct
      val cands = qterms.flatMap(t => post.getOrElse(t, Map.empty).keys).distinct
      val scored = cands.map { d =>
        val matched = qterms.filter(t => post(t).contains(d)).sorted
        val score = matched.foldLeft(0.0) { (acc, t) =>
          val tf = post(t)(d)
          val dfv = post(t).size.toLong
          val odds = (nDocs.toDouble - dfv.toDouble + 0.5) / (dfv.toDouble + 0.5)
          // Spark's Log expression evaluates StrictMath.log — Math.log
          // may differ in the last ulp, so the mirror must use StrictMath.
          val idf = if (logIdf) StrictMath.log(1.0 + odds) else odds
          val tfp = (tf.toDouble * (k1 + 1.0)) /
            (tf.toDouble + (k1 * (1.0 - b)) +
              (k1 * b) * (dlMap(d).toDouble / avgdl))
          acc + idf * tfp
        }
        (d, matched.size.toLong, score)
      }
      scored.sortBy { case (d, _, s) => (-s, d) }.zipWithIndex
        .take(k)
        .map { case ((d, nt, s), i) => (qid, d, nt, s, (i + 1).toLong) }
    }
  }

  private def collectBm25(r: DataFrame): Seq[(Long, Long, Long, Double, Long)] =
    r.orderBy("query_id", "rank").collect().toSeq.map(row =>
      (row.getLong(row.fieldIndex("query_id")),
        row.getLong(row.fieldIndex("doc_id")),
        row.getLong(row.fieldIndex("n_terms")),
        row.getDouble(row.fieldIndex("score")),
        row.getLong(row.fieldIndex("rank"))))

  private val corpus = Seq(
    0L -> "the red fox jumps over the lazy dog",
    1L -> "red red red fox",
    2L -> "a lazy dog sleeps all day long in the red barn",
    3L -> "fox and dog and fox again",
    4L -> "completely unrelated words about spark shuffles",
    5L -> "")
  private val qs = Seq(0L -> "red fox", 1L -> "lazy dog a", 2L -> "absent")

  test("bm25TopK matches the driver-side reference bit-for-bit") {
    val got = collectBm25(Lexical.bm25TopK(docsDf(corpus), "doc_id", "text",
      queriesDf(qs), "qid", "qtext", k = 4))
    val want = refBm25(corpus, qs, k = 4)
    assert(got == want)
    // non-vacuous: multiple docs ranked, repeated-term tf > 1 present
    assert(got.count(_._1 == 0L) == 4)
    assert(got.exists(_._4 != got.head._4))
  }

  test("bm25TopK ln-idf variant matches the StrictMath.log reference exactly") {
    val got = collectBm25(Lexical.bm25TopK(docsDf(corpus), "doc_id", "text",
      queriesDf(qs), "qid", "qtext", k = 4, logIdf = true))
    val want = refBm25(corpus, qs, k = 4, logIdf = true)
    assert(got == want)
    // same matched sets as the log-free form, scores differ
    val flat = collectBm25(Lexical.bm25TopK(docsDf(corpus), "doc_id", "text",
      queriesDf(qs), "qid", "qtext", k = 4))
    assert(got.map(x => (x._1, x._2)).toSet == flat.map(x => (x._1, x._2)).toSet)
    assert(got.map(_._4) != flat.map(_._4))
  }

  test("bm25TopK property: random corpora/queries match the reference") {
    val rnd = new scala.util.Random(20260815L)
    val vocab = Vector("red", "blue", "fox", "dog", "runs", "far", "xy", "z")
    for (case_ <- 1 to 12) {
      val nd = 1 + rnd.nextInt(12)
      val docs = (0L until nd.toLong).map(i =>
        i -> Seq.fill(rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val nq = 1 + rnd.nextInt(3)
      val queries = (0L until nq.toLong).map(i =>
        i -> Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      val k = 1 + rnd.nextInt(5)
      val logIdf = rnd.nextBoolean()
      val got = collectBm25(Lexical.bm25TopK(docsDf(docs), "doc_id", "text",
        queriesDf(queries), "qid", "qtext", k = k, logIdf = logIdf))
      val want = refBm25(docs, queries, k = k, logIdf = logIdf)
      assert(got == want, s"case $case_ (docs=$docs queries=$queries k=$k log=$logIdf)")
    }
  }

  test("bm25TopK drops sub-minTermLen query tokens and handles empty text") {
    // 'a' must not match anything even though doc 2 contains it
    val got = collectBm25(Lexical.bm25TopK(docsDf(corpus), "doc_id", "text",
      queriesDf(Seq(0L -> "a")), "qid", "qtext", k = 5))
    assert(got.isEmpty)
    // the empty doc 5 contributes to n_docs/avgdl but never ranks
    assert(!collectBm25(Lexical.bm25TopK(docsDf(corpus), "doc_id", "text",
      queriesDf(qs), "qid", "qtext", k = 10)).exists(_._2 == 5L))
  }

  test("rrfFuse matches the reference and orders deterministically") {
    def run(rows: (Long, Long, Long)*): DataFrame =
      df(StructType(Seq(StructField("query_id", LongType),
        StructField("doc_id", LongType), StructField("rank", LongType))),
        rows.map { case (q, d, r) => Row(q, d, r) }: _*)
    // doc 10 ranks 1st in A, absent in B; doc 11 ranks 2nd in both;
    // doc 12 only in B at 1 — RRF must fuse exactly
    val a = run((0L, 10L, 1L), (0L, 11L, 2L), (0L, 13L, 3L))
    val bRun = run((0L, 12L, 1L), (0L, 11L, 2L), (0L, 13L, 3L))
    val got = Lexical.rrfFuse(Seq("a" -> a, "b" -> bRun),
        "query_id", "doc_id", "rank", k = 10)
      .orderBy("rank").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    def s(rank: Long) = 1.0 / (60.0 + rank.toDouble)
    val want = Seq(
      (0L, 11L, 2L, s(2) + s(2)), (0L, 13L, 2L, s(3) + s(3)),
      (0L, 10L, 1L, s(1)), (0L, 12L, 1L, s(1)))
      .sortBy { case (_, d, _, sc) => (-sc, d) }
      .zipWithIndex.map { case ((q, d, n, sc), i) => (q, d, n, sc, (i + 1).toLong) }
    assert(got == want)
    // ties (docs 10 and 12 share s(1)) broke by doc_id
    assert(got.map(_._2).containsSlice(Seq(10L, 12L)))
  }

  test("rrfFuse requires unique run tags") {
    val r0 = docsDf(Seq(0L -> "x")).select(lit(0L).as("query_id"),
      col("doc_id"), lit(1L).as("rank"))
    intercept[IllegalArgumentException] {
      Lexical.rrfFuse(Seq("a" -> r0, "a" -> r0), "query_id", "doc_id", "rank", 5)
    }
  }
}
