package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, processed per-partition in batches.
  *
  * The actual codec work (JPEG decode, resample, frame extraction) is
  * STUBBED — the decode libraries are not in this container — behind
  * `fakeDecode`, a deterministic byte-level feature extractor. Everything
  * around it is the real production shape: binary payload column,
  * explicit output schema (the reference's `meta` contract,
  * `_expr.py:517-592`), partition-batched iteration so one task holds at
  * most one partition of payloads, and no driver-side collect anywhere.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format_byte", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Attach a binary payload column (here: utf-8 bytes of a string
    * column; in production: the image/audio bytes read by a binary
    * source such as `spark.read.format("binaryFile")`). */
  def withPayload(df: DataFrame, srcCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, encode(col(srcCol), "UTF-8"))

  /** STUB decode: deterministic pseudo-features from raw bytes (stands in
    * for a JPEG/PNG header parse + decode). Replace the body with the
    * real codec; the signature — Iterator-batched rows with a fixed
    * output schema — is the part that matters for the engine. */
  private def fakeDecode(id: Long, bytes: Array[Byte]): Row = {
    val n = bytes.length
    val b0 = if (n > 0) bytes(0) & 0xff else 0
    // order-independent byte sum: partition order can never change it
    var checksum = 0L
    var i = 0
    while (i < n) { checksum += (bytes(i) & 0xff); i += 1 }
    Row(id, n, b0, b0 % 64 + 1, (n % 64) + 1, checksum % 1000000007L)
  }

  /** Batched per-partition "decode": the mapPartitions shape that a real
    * codec UDF uses (one JNI/process init per partition, streamed rows,
    * no whole-partition materialization). */
  def decodeFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        // real impl: init codec once per partition here
        it.map(r => fakeDecode(r.getLong(0), r.getAs[Array[Byte]](1)))
      }(org.apache.spark.sql.Encoders.row(featureSchema))

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false)))

  /** STUB resize: deterministic byte-stride resample of the payload to
    * exactly `outW*outH` bytes (stands in for a real image resample —
    * swap the loop body for the codec call). Short payloads repeat bytes
    * (the "upscale" path) so the emitted dims ALWAYS describe the
    * payload: length == out_w * out_h is the row's contract. The
    * engine-side shape is the point: binary in → binary out with typed
    * dims, batched per partition, constant memory per row. */
  def resizeStub(df: DataFrame, idCol: String, payloadCol: String,
                 outW: Int, outH: Int): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        val budget = outW * outH
        it.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val out =
            if (bytes.length == 0) new Array[Byte](budget)
            else Array.tabulate(budget)(i =>
              bytes(((i.toLong * bytes.length) / budget).toInt))
          Row(r.getLong(0), out, outW, outH)
        }
      }(org.apache.spark.sql.Encoders.row(resizedSchema))

  /** Deterministic frame-sampling plan for a video-like payload: every
    * `stride`-th offset, as (doc_id, frame_no, offset) rows — the explode
    * pattern that fans one asset into per-frame work items without
    * materializing frames on the driver. */
  def framePlan(df: DataFrame, idCol: String, payloadCol: String,
                stride: Int): DataFrame =
    df.select(col(idCol), length(col(payloadCol)).as("n_bytes"))
      .withColumn("frame_no",
        explode(sequence(lit(0L),
          greatest(floor(col("n_bytes") / lit(stride.toDouble)) - 1L, lit(0L)))))
      .withColumn("offset", col("frame_no") * lit(stride.toLong))
}
