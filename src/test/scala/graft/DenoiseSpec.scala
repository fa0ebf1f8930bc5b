package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.llm.Denoise

/** T5 span corruption: hand-replayed placement geometry (the same
  * two-round xorshift-multiply the engine runs, recomputed in plain
  * Scala), the input/target sentinel layout, the uncorrupted-tail and
  * short-window edges, determinism across runs and divergence across
  * seeds, and the collision/key refusals. */
class DenoiseSpec extends SparkTestBase {

  private val sch = StructType(Seq(
    StructField("key", LongType),
    StructField("ids", ArrayType(LongType, containsNull = false))))

  /** The engine's per-(key, block) draw, re-derived independently. */
  private def off(key: Long, blk: Long, seed: Long,
                  blockSize: Int, spanLen: Int): Long = {
    val s0 = ((key % 2147483648L) +
      java.lang.Math.floorMod(seed + blk * 1779033703L, 2147483648L)) %
      2147483648L
    val r1 = ((s0 ^ (s0 >> 15)) * 2654435761L) % 4294967296L
    val r2 = r1 % 2147483648L
    val h = ((r2 ^ (r2 >> 13)) * 2246822519L) % 4294967296L
    h % (blockSize - spanLen + 1)
  }

  test("geometry: per-block spans at the hand-replayed offsets, sentinel layout, tail passthrough, density exact") {
    val ids = (1L to 45L).toSeq // nb = 2 complete blocks + 5-id tail
    val base = 1000L
    val got = Denoise.spanCorrupt(
        df(sch, Row(7L, ids)), "key", "ids", base)
      .head()
    val o0 = off(7L, 0L, 0L, 20, 3)
    val o1 = off(7L, 1L, 0L, 20, 3)
    val b0 = ids.slice(0, 20)
    val b1 = ids.slice(20, 40)
    val expInput =
      (b0.take(o0.toInt) ++ Seq(base) ++ b0.drop(o0.toInt + 3)) ++
      (b1.take(o1.toInt) ++ Seq(base - 1) ++ b1.drop(o1.toInt + 3)) ++
      ids.drop(40)
    val expTarget =
      (Seq(base) ++ b0.slice(o0.toInt, o0.toInt + 3)) ++
      (Seq(base - 1) ++ b1.slice(o1.toInt, o1.toInt + 3)) ++
      Seq(base - 2)
    assert(got.getSeq[Long](1) === expInput)
    assert(got.getSeq[Long](2) === expTarget)
    assert(got.getLong(3) === 2L)
    // conservation: input + target together hold every original id
    // exactly once plus 2 sentinels each + the closing sentinel
    assert(got.getSeq[Long](1).length + got.getSeq[Long](2).length ===
      45 + 2 + 2 + 1)
    // density is exactly spanLen/blockSize over complete blocks
    assert(got.getSeq[Long](2).count(_ < base - 2) === 6) // 2 spans × 3
  }

  test("short window: no complete block — input unchanged, target is the closing sentinel alone") {
    val got = Denoise.spanCorrupt(
        df(sch, Row(3L, Seq(5L, 6L, 7L))), "key", "ids", 100L)
      .head()
    assert(got.getSeq[Long](1) === Seq(5L, 6L, 7L))
    assert(got.getSeq[Long](2) === Seq(100L))
    assert(got.getLong(3) === 0L)
  }

  test("determinism and seed independence") {
    val ids = (1L to 60L).toSeq
    def run(seed: Long) = Denoise.spanCorrupt(
        df(sch, Row(11L, ids)), "key", "ids", 500L, seed = seed)
      .head().getSeq[Long](1)
    assert(run(0L) === run(0L))
    assert(run(0L) !== run(99L),
      "a different seed must move at least one span")
    // different keys place spans differently (decorrelated draws)
    val two = Denoise.spanCorrupt(
        df(sch, Row(1L, ids), Row(2L, ids)), "key", "ids", 500L)
      .orderBy("key").collect().map(_.getSeq[Long](1))
    assert(two(0) !== two(1))
  }

  test("prefixLm: one hand-replayed cut, both sides non-empty, short windows drop, deterministic") {
    val ids = (1L to 30L).toSeq
    val got = Denoise.prefixLm(df(sch, Row(7L, ids)), "key", "ids")
      .head()
    // the cut is draw index 0 of the SAME shared hash
    val s0 = 7L % 2147483648L
    val r1 = ((s0 ^ (s0 >> 15)) * 2654435761L) % 4294967296L
    val r2 = r1 % 2147483648L
    val h = ((r2 ^ (r2 >> 13)) * 2246822519L) % 4294967296L
    val c = h % 29 + 1
    assert(got.getLong(3) === c)
    assert(got.getSeq[Long](1) === ids.take(c.toInt))
    assert(got.getSeq[Long](2) === ids.drop(c.toInt))
    // cut range [1, n-1]: both sides non-empty for EVERY key
    val many = Denoise.prefixLm(
        df(sch, (1L to 50L).map(k => Row(k, (1L to 5L).toSeq)): _*),
        "key", "ids")
      .collect()
    assert(many.length === 50)
    assert(many.forall(r => r.getSeq[Long](1).nonEmpty &&
      r.getSeq[Long](2).nonEmpty))
    // nothing to condition on or predict: drops
    assert(Denoise.prefixLm(
      df(sch, Row(1L, Seq(9L))), "key", "ids").count() === 0L)
    assert(intercept[IllegalArgumentException] {
      Denoise.prefixLm(df(sch, Row(1L, Seq(1L, 2L)))
        .withColumn("k2", lit("x")), "k2", "ids")
    }.getMessage.contains("integral type"))
  }

  test("refusals: content id in the live sentinel range, non-integral key, whole-block span") {
    val e = intercept[Exception] {
      Denoise.spanCorrupt(
        df(sch, Row(1L, (1L to 20L).toSeq :+ 99L)), "key", "ids", 100L)
        .collect()
    }
    assert(e.getMessage.contains("live sentinel range"))
    // ids below the range are fine (the range is [base - nb, base])
    Denoise.spanCorrupt(
      df(sch, Row(1L, (1L to 21L).toSeq)), "key", "ids", 100L).collect()
    assert(intercept[IllegalArgumentException] {
      Denoise.spanCorrupt(
        df(sch, Row(1L, Seq(1L))).withColumn("k2", lit("x")),
        "k2", "ids", 100L)
    }.getMessage.contains("integral type"))
    assert(intercept[IllegalArgumentException] {
      Denoise.spanCorrupt(df(sch, Row(1L, Seq(1L))), "key", "ids",
        100L, spanLen = 20, blockSize = 20)
    }.getMessage.contains("must be < blockSize"))
  }
}
