package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T5-style SPAN CORRUPTION — the denoising pretraining objective
  * (Raffel et al. 2020 §3.1.4: replace token spans with sentinels,
  * train the model to reconstruct them; the reference corpus op for
  * encoder-decoder pretraining data).
  *
  * Geometry: each window's id stream partitions into fixed BLOCKS of
  * `blockSize` ids; every complete block corrupts exactly one span of
  * `spanLen` ids whose offset inside the block draws deterministically
  * from (key, block). Noise density is exactly spanLen/blockSize (the
  * published noise_density knob — the default 3/20 is T5's 15% with
  * mean span 3), spans can never overlap, and the whole placement
  * replays from the formula alone (integer ops only — the engine
  * determinism contract; published T5 places spans from an RNG, this
  * is the same objective under a hash-seeded placement, stated, not
  * hidden). The draw is the [[Bpe.fimTransform]] two-round
  * xorshift-multiply with the BLOCK INDEX folded in before the
  * avalanche rounds — per-block offsets are mutually decorrelated
  * (an affine hash would make every block's offset a constant shift
  * of its neighbor's). A trailing partial block passes through
  * uncorrupted (landed windows are full-size by construction, so at
  * most one window per stream even has one).
  *
  * Layout (the published sentinel convention, descending extra_ids):
  * inputs replace span k (block k, left to right) with sentinel id
  * `sentinelBase - k`; targets are `sentinel_k ++ span_k ids`
  * concatenated over spans, closed by the final sentinel
  * `sentinelBase - nSpans`. Sentinels must sit OUTSIDE the content id
  * space — a content id inside the window's live sentinel range
  * refuses AT EXECUTION (a silent collision would teach the model to
  * emit text where the mask belongs).
  *
  * Scale shape: blockwise higher-order-function arithmetic over the
  * ids array — fuses into the scan, no shuffle, no driver state;
  * ~linear in corpus tokens at any scale. */
object Denoise {

  /** The [[spanCorrupt]] parameter record — the form the loader path
    * ([[Pipeline.loadWindows]]) takes, so the objective rides the load
    * stream with its parameters recorded in one place (the
    * [[Bpe.FimSpec]] pattern). */
  final case class SpanSpec(sentinelBase: Long, spanLen: Int = 3,
                            blockSize: Int = 20, seed: Long = 0L)

  // the per-(key, block) offset draw is [[Bpe.drawHash]] — the ONE
  // definition of the two-round xorshift-multiply the SQL oracles
  // mirror (a second copy could silently diverge from them)

  /** PREFIX-LM split — UL2's S-denoiser (Tay et al. 2022; the
    * sequential denoising objective completing the family: R/X
    * denoising are [[spanCorrupt]] at (3,20)/(8,16)-style geometry,
    * S is one cut): each window splits at a deterministic per-key
    * point drawn from the SAME [[Bpe.drawHash]] — input keeps
    * `ids[0, c)`, `target_ids` carries `ids[c, n)`, and both sides
    * are always non-empty (c ∈ [1, n−1]; windows shorter than 2 ids
    * drop — there is nothing to condition on or predict). `split_at`
    * records c. Blockwise, no shuffle, no sentinels — the decoder
    * continues the text rather than reconstructing masks. */
  def prefixLm(windows: DataFrame, keyCol: String, idsCol: String,
               seed: Long = 0L): DataFrame = {
    windows.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"prefixLm: key column '$keyCol' must be an integral type " +
          s"(the deterministic draw hashes it as long), got ${other.simpleString}")
    }
    val n = size(col(idsCol)).cast("long")
    val c = pmod(Bpe.drawHash(col(keyCol), lit(0L), seed), n - 1L) + 1L
    windows
      .filter(size(col(idsCol)) >= 2)
      .withColumn("target_ids",
        slice(col(idsCol), (c + 1L).cast("int"), (n - c).cast("int")))
      .withColumn("split_at", c)
      .withColumn(idsCol, slice(col(idsCol), lit(1), c.cast("int")))
  }

  /** Corrupt `idsCol` (array&lt;long&gt;) keyed on integral `keyCol`:
    * output keeps every other column, replaces `idsCol` with the
    * corrupted encoder input, and adds `target_ids` (the decoder
    * stream) and `n_spans`. */
  def spanCorrupt(windows: DataFrame, keyCol: String, idsCol: String,
                  sentinelBase: Long, spanLen: Int = 3,
                  blockSize: Int = 20, seed: Long = 0L): DataFrame = {
    require(spanLen >= 1, s"spanCorrupt: spanLen must be >= 1, got $spanLen")
    require(spanLen < blockSize,
      s"spanCorrupt: spanLen $spanLen must be < blockSize $blockSize — " +
        "a whole-block span leaves no context inside the block " +
        "(density 1 is deletion, not denoising)")
    windows.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"spanCorrupt: key column '$keyCol' must be an integral type " +
          s"(the deterministic draw hashes it as long), got ${other.simpleString}")
    }
    val b = lit(blockSize.toLong)
    val m = lit(spanLen.toLong)
    val n = size(col(idsCol)).cast("long")
    // complete blocks; the tail passes through
    val nb = graft.QHelp.floorDiv(n, blockSize.toLong)
    val blocks = when(nb >= 1L,
      sequence(lit(0L), nb - 1L)).otherwise(
      array().cast("array<bigint>"))
    def intc(c: Column): Column = c.cast("int")
    // one offsets array per row — input and target splice the same
    // draws without re-running the hash pipeline per consumer
    val offs = transform(blocks, blk =>
      pmod(Bpe.drawHash(col(keyCol), blk, seed), b - m + lit(1L)))
    def oAt(i: Column): Column = element_at(offs, intc(i + 1))
    val inputBlocks = flatten(transform(blocks, (blk, i) => {
      val o = oAt(i)
      concat(
        slice(col(idsCol), intc(blk * b + lit(1L)), intc(o)),
        array(lit(sentinelBase) - blk),
        slice(col(idsCol), intc(blk * b + o + m + lit(1L)),
          intc(b - o - m)))
    }))
    val tail = slice(col(idsCol), intc(nb * b + lit(1L)),
      intc(n - nb * b))
    val targetBlocks = flatten(transform(blocks, (blk, i) => {
      val o = oAt(i)
      concat(array(lit(sentinelBase) - blk),
        slice(col(idsCol), intc(blk * b + o + lit(1L)), intc(m)))
    }))
    // live sentinel range for THIS row: [sentinelBase - nb, sentinelBase].
    // The guard rides BOTH outputs — column pruning on a consumer that
    // selects only target_ids must not drop it (a silent collision
    // would teach the model to emit text where the mask belongs)
    val clash = exists(col(idsCol), x =>
      x >= lit(sentinelBase) - nb && x <= lit(sentinelBase))
    def clashError: Column = raise_error(concat(
      lit(s"spanCorrupt: a content id inside the live sentinel range ["),
      (lit(sentinelBase) - nb).cast("string"),
      lit(s", $sentinelBase] — reserve sentinelBase above the " +
        "vocabulary with headroom for nSpans+1 sentinels")))
      .cast("array<bigint>")
    val inputIds = when(clash, clashError)
      .otherwise(concat(inputBlocks, tail))
    val targetIds = when(clash, clashError)
      .otherwise(concat(targetBlocks, array(lit(sentinelBase) - nb)))
    // target/n_spans BEFORE the in-place ids replacement: in one
    // select list, Spark's lateral column alias resolution would bind
    // the target's `ids` reference to the ALREADY-CORRUPTED alias
    // (spans of sentinels, shifted positions), not the source column
    windows
      .withColumn("target_ids", targetIds)
      .withColumn("n_spans", nb)
      .withColumn(idsCol, inputIds)
  }
}
