package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.{Bpe, TextStats}

/** Doc-aware PACKED training windows (next-fit within bounded
  * permutation segments — the "fewer truncations" layout). The driver
  * gate value-checks the full assembly in DuckDB (q_windows_packed /
  * q_windows_packed_bpe replay the permutation, the segment recurrence
  * and the slices); these specs pin the packing LAWS the SQL replay
  * takes as given: capacity, no-split, conservation, span tiling,
  * pad shape, determinism under repartition. */
class PackedWindowsSpec extends SparkTestBase {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** token counts: 4, 10, 3, 25 (oversized), 7, 10, 2, 5 — exercises
    * exact-fit, oversize split, and underfull-tail regimes at C=10. */
  private def fixture = df(docSchema,
    Row(1L, (1 to 4).map(i => s"a$i").mkString(" ")),
    Row(2L, (1 to 10).map(i => s"b$i").mkString(" ")),
    Row(3L, (1 to 3).map(i => s"c$i").mkString(" ")),
    Row(4L, (1 to 25).map(i => s"d$i").mkString(" ")),
    Row(5L, (1 to 7).map(i => s"e$i").mkString(" ")),
    Row(6L, (1 to 10).map(i => s"f$i").mkString(" ")),
    Row(7L, "g1 g2"),
    Row(8L, (1 to 5).map(i => s"h$i").mkString(" ")))

  private def packed(segmentDocs: Int = 3) =
    TextStats.assembleWindowsPacked(fixture, "doc_id", "text",
      windowSize = 10L, seed = 1L, segmentDocs = segmentDocs,
      withDocSpans = true)

  test("pack_next_fit kernel: placement recurrence and refusals") {
    val out = spark.range(1)
      .select(graft.functions.TextHashExprs.packNextFit(
        array(lit(3L), lit(4L), lit(3L), lit(5L), lit(2L), lit(10L)), 10L)
        .as("p"))
      .selectExpr("transform(p, x -> x.win) AS wins",
        "transform(p, x -> x.off) AS offs")
      .head()
    assert(out.getSeq[Int](0) == Seq(0, 0, 0, 1, 1, 2))
    assert(out.getSeq[Long](1) == Seq(0L, 3L, 7L, 0L, 5L, 0L))
    // a piece longer than capacity (or empty) must throw, not truncate
    val bad = spark.range(1).select(
      graft.functions.TextHashExprs.packNextFit(array(lit(11L)), 10L))
    val e = intercept[Exception] { bad.collect() }
    assert(e.getMessage != null)
  }

  test("capacity law, conservation, and docs <= C never split") {
    val w = packed().collect()
    assert(w.nonEmpty)
    // no window exceeds capacity; n_tokens matches the text itself
    w.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(n >= 1L && n <= 10L)
      assert(r.getAs[String]("window_text").split(" ").length.toLong == n)
    }
    // conservation: every token of every doc lands exactly once
    assert(w.map(_.getAs[Long]("n_tokens")).sum == 4 + 10 + 3 + 25 + 7 + 10 + 2 + 5)
    // a doc that fits in one window appears in EXACTLY one span
    val spansPerDoc = w.flatMap(_.getSeq[Row](3).map(_.getLong(0)))
      .groupBy(identity).view.mapValues(_.length).toMap
    Seq(1L, 2L, 3L, 5L, 6L, 7L, 8L).foreach { id =>
      assert(spansPerDoc(id) == 1, s"doc $id split across windows") }
    // the 25-token doc splits into ceil(25/10) = 3 pieces
    assert(spansPerDoc(4L) == 3)
  }

  test("spans tile each window contiguously from 0") {
    packed().collect().foreach { r =>
      val spans = r.getSeq[Row](3).map(s => (s.getLong(1), s.getLong(2)))
      var off = 0L
      spans.sortBy(_._1).foreach { case (pos, len) =>
        assert(pos == off, s"gap/overlap at $pos (expected $off)")
        off += len
      }
      assert(off == r.getAs[Long]("n_tokens"))
    }
  }

  test("deterministic under repartition; dense window ids") {
    val a = packed().orderBy("window_id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val b = TextStats.assembleWindowsPacked(fixture.repartition(7),
        "doc_id", "text", 10L, 1L, segmentDocs = 3, withDocSpans = true)
      .orderBy("window_id").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(a == b)
    assert(a.map(_._1) == a.indices.map(_.toLong))
  }

  test("all-exact-fit corpus degenerates to the chop layout") {
    val exact = df(docSchema, (1L to 6L).map(i =>
      Row(i, (1 to 10).map(j => s"t${i}_$j").mkString(" "))): _*)
    val p = TextStats.assembleWindowsPacked(exact, "doc_id", "text",
        10L, 9L, segmentDocs = 4)
      .orderBy("window_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val c = TextStats.assembleWindows(exact, "doc_id", "text", 10L, 9L)
      .orderBy("window_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(p == c)
  }

  test("id-space packed windows: pad shape, EOD accounting, collisions") {
    val corpus = fixture
    val merges = Bpe.mergeList(Bpe.train(corpus, "text", numMerges = 4))
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", Bpe.train(
      corpus, "text", numMerges = 4)))
    val eod = vocab.values.max + 1L
    val pad = eod + 1L
    val w = Bpe.assembleWindowsIdsPacked(corpus, "doc_id", "text",
      windowSize = 16L, seed = 2L, merges, vocab,
      eodId = Some(eod), padId = Some(pad), withDocSpans = true,
      segmentDocs = 3).collect()
    assert(w.nonEmpty)
    // every window is EXACTLY windowSize ids; pad fills [n_tokens, 16)
    w.foreach { r =>
      val ids = r.getSeq[Long](1)
      val n = r.getAs[Long]("n_tokens")
      assert(ids.length == 16)
      assert(ids.take(n.toInt).forall(_ != pad))
      assert(ids.drop(n.toInt).forall(_ == pad))
    }
    // conservation in id space: real ids = per-doc BPE tokens + 1 EOD each
    val encoded = Bpe.encodeIds(corpus, "doc_id", "text", merges,
      Bpe.vocabFrame(corpus, "text", Bpe.train(corpus, "text", 4)))
    val docTokens = encoded.groupBy("doc_id").count()
      .agg(sum("count")).head().getLong(0)
    assert(w.map(_.getAs[Long]("n_tokens")).sum == docTokens + 8L)
    // every doc's EOD rides its last piece: id `eod` appears exactly
    // once per doc across all windows
    assert(w.flatMap(_.getSeq[Long](1)).count(_ == eod) == 8)
    // collision refusals
    intercept[IllegalArgumentException] {
      Bpe.assembleWindowsIdsPacked(corpus, "doc_id", "text", 16L, 2L,
        merges, vocab, eodId = Some(eod), padId = Some(eod))
    }
    intercept[IllegalArgumentException] {
      Bpe.assembleWindowsIdsPacked(corpus, "doc_id", "text", 16L, 2L,
        merges, vocab, padId = Some(vocab.values.head))
    }
  }

  test("unpadded id windows conserve and never exceed capacity") {
    val corpus = fixture
    val t = Bpe.train(corpus, "text", numMerges = 4)
    val merges = Bpe.mergeList(t)
    val vocab = Bpe.vocabMap(Bpe.vocabFrame(corpus, "text", t))
    val w = Bpe.assembleWindowsIdsPacked(corpus, "doc_id", "text",
      windowSize = 16L, seed = 2L, merges, vocab, segmentDocs = 3)
      .collect()
    w.foreach { r =>
      val n = r.getAs[Long]("n_tokens")
      assert(r.getSeq[Long](1).length.toLong == n && n <= 16L)
    }
  }
}
