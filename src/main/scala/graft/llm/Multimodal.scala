package graft.llm

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, processed per-partition in batches.
  *
  * The image path is REAL: PNG encode/decode via the JDK's
  * `javax.imageio.ImageIO` (no external codec library needed) and a
  * hand-rolled nearest-neighbor resize over decoded pixels. The engine
  * shape matches the reference's meta contract (`_expr.py:517-592`):
  * binary payload column in, fixed output schema out, partition-batched
  * iteration so one task holds at most one partition of payloads, and no
  * driver-side collect anywhere.
  *
  * Determinism for the oracle: synthetic fixtures are generated from
  * `doc_id` by [[pixel]]/[[dims]] — pure integer arithmetic — so a SQL
  * engine with no codec can predict the decoded width/height/checksum
  * while Spark actually encodes and decodes PNG bytes. A checksum match
  * therefore proves a lossless real-codec round trip, not a stub.
  */
object Multimodal {

  private val ChecksumP = 1000000007L

  /** Deterministic image dimensions for a synthetic fixture id. */
  def dims(id: Long): (Int, Int) = ((id % 13).toInt + 4, (id % 7).toInt + 3)

  /** Deterministic RGB pixel for (id, x, y) — pure integer arithmetic so
    * any engine reproduces it. */
  def pixel(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((id * 31 + x * 7 + y * 13) % 256).toInt,
    ((x.toLong * y + id) % 256).toInt,
    ((x + y * 3) % 256))

  /** Pixel checksum: weighted channel sum mod a prime. Order-independent
    * (a sum), so partitioning can never change it. */
  private def checksumOf(img: BufferedImage): Long = {
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sum += 3L * ((rgb >> 16) & 0xff) + 5L * ((rgb >> 8) & 0xff) + 7L * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    sum % ChecksumP
  }

  private def encodePngBytes(img: BufferedImage): Array[Byte] = {
    val baos = new ByteArrayOutputStream(1024)
    ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Container-format sniff from magic bytes (the metadata a real
    * pipeline extracts before deciding whether to decode at all). */
  def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'
        && bytes(2) == 'N' && bytes(3) == 'G') "png"
    else if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') "bmp"
    else if (bytes.length >= 4 && bytes(0) == 'G' && bytes(1) == 'I'
        && bytes(2) == 'F' && bytes(3) == '8') "gif"
    else "unknown"

  val payloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Synthesize a real PNG payload per id on the EXECUTORS (the fixture
    * generator: stands in for `spark.read.format("binaryFile")` without
    * needing image files on disk). Pixels come from [[pixel]], so the
    * decoded content is independently predictable. */
  def synthPng(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h) = dims(id)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (cr, cg, cb) = pixel(id, x, y)
              img.setRGB(x, y, (cr << 16) | (cg << 8) | cb)
              x += 1
            }
            y += 1
          }
          Row(id, encodePngBytes(img))
        }
      }(org.apache.spark.sql.Encoders.row(payloadSchema))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Decode one payload, absorbing BOTH undecodable shapes: ImageIO.read
    * returns null when no reader claims the bytes, and a corrupt payload a
    * reader DOES claim (truncated PNG) throws — IOException usually, but
    * plugin readers also throw unchecked (IllegalArgumentException,
    * ArrayIndexOutOfBounds, CMMException on bad color profiles), so the
    * net is NonFatal — at corpus scale a single bad row must flag, not
    * fail the task. */
  private def tryDecode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** REAL batched per-partition decode: `ImageIO.read` on each payload,
    * emitting actual decoded dimensions and a pixel checksum. The
    * mapPartitions shape is what a production codec UDF uses (codec
    * registry warm per partition, streamed rows, no whole-partition
    * materialization). Undecodable OR corrupt payloads keep their row
    * with -1 dims/-1 checksum; `format` still reports the CONTAINER
    * sniff (a truncated PNG is "png" with -1 dims, garbage is
    * "unknown") so triage can tell bad-codec from not-an-image — the -1
    * dims alone flag the failed decode. */
  def decodeImageFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          tryDecode(bytes) match {
            case None => Row(id, sniffFormat(bytes), -1, -1, -1L)
            case Some(img) =>
              Row(id, sniffFormat(bytes), img.getWidth, img.getHeight, checksumOf(img))
          }
        }
      }(org.apache.spark.sql.Encoders.row(featureSchema))

  /** Red-channel perturbation applied by [[synthPngVariant]] to pixel
    * (0, 0) — a "locally retouched copy" fixture whose dHash provably
    * stays within Hamming distance h of the original (every grid cell
    * sampling pixel (0,0) shifts to the SAME new gray, so comparisons
    * between two affected cells never flip; only the one boundary
    * comparison per affected grid row can — at most one bit per row,
    * and pixel (0,0) is sampled by at most 3 grid rows at the
    * [[dims]] geometry). */
  val VariantRedDelta = 64

  /** Synthesize the PNG of `srcIdCol`'s image with pixel (0, 0)'s red
    * channel shifted by [[VariantRedDelta]] (mod 256) — the planted
    * near-duplicate fixture for [[graft.llm.Dedup.imageNearDupPairs]]:
    * a real re-encoded payload whose perceptual hash is provably close
    * to the original's while staying byte-distinct (exact dedup cannot
    * see it). Output schema: (doc_id = `idCol`, payload). */
  def synthPngVariant(df: DataFrame, idCol: String,
                      srcIdCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(srcIdCol).cast("long"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val src = r.getLong(1)
          val (w, h) = dims(src)
          val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (cr, cg, cb) = pixel(src, x, y)
              val pr = if (x == 0 && y == 0) (cr + VariantRedDelta) % 256
                       else cr
              img.setRGB(x, y, (pr << 16) | (cg << 8) | cb)
              x += 1
            }
            y += 1
          }
          Row(id, encodePngBytes(img))
        }
      }(org.apache.spark.sql.Encoders.row(payloadSchema))

  /** ITU-R BT.601 integer luma: (299r + 587g + 114b) / 1000, floor —
    * pure integer arithmetic so any engine reproduces it. */
  private def grayOf(rgb: Int): Int =
    (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff)
      + 114 * (rgb & 0xff)) / 1000

  /** 64-bit perceptual difference hash of a decoded image: sample a
    * 9×8 grayscale grid by nearest neighbor (sx = gx·w/9, sy = gy·h/8,
    * integer floor — resolution-normalizing, so a resized copy keeps
    * its hash), then bit gy·8+gx = 1 iff gray(gx+1, gy) > gray(gx, gy).
    * The standard dHash: integer-exact end to end. */
  def dhashOf(img: BufferedImage): Long = {
    val gray = Array.ofDim[Int](8, 9)
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 9) {
        val sx = (gx.toLong * img.getWidth / 9).toInt
        val sy = (gy.toLong * img.getHeight / 8).toInt
        gray(gy)(gx) = grayOf(img.getRGB(sx, sy))
        gx += 1
      }
      gy += 1
    }
    var h = 0L
    gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        if (gray(gy)(gx + 1) > gray(gy)(gx)) h |= (1L << (gy * 8 + gx))
        gx += 1
      }
      gy += 1
    }
    h
  }

  val dhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("dhash", LongType, nullable = false)))

  /** REAL batched perceptual hashing: decode each payload and emit its
    * 64-bit [[dhashOf]] plus the decoded dims. Undecodable or corrupt
    * payloads keep their row FLAGGED (-1 dims, hash 0) — pairing
    * excludes them explicitly rather than letting all corrupt rows
    * collide on the zero hash. The image-side analog of the text
    * SimHash signature pass; feeds
    * [[graft.llm.Dedup.imageNearDupPairs]]. */
  def dhashFeatures(df: DataFrame, idCol: String,
                    payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          tryDecode(r.getAs[Array[Byte]](1)) match {
            case None => Row(id, -1, -1, 0L)
            case Some(img) =>
              Row(id, img.getWidth, img.getHeight, dhashOf(img))
          }
        }
      }(org.apache.spark.sql.Encoders.row(dhashSchema))

  val resizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false)))

  /** REAL nearest-neighbor resize: decode, remap src pixel
    * (x*srcW/outW, y*srcH/outH) — integer floor division, the standard
    * NN kernel — re-encode as PNG. Binary in → binary out with typed
    * dims, batched per partition, constant memory per row. Undecodable
    * or corrupt payloads keep their row, flagged (-1 dims, empty
    * payload), so a downstream `out_w > 0` filter decides their fate —
    * silently dropping rows would skew corpus accounting. */
  def resizeImage(df: DataFrame, idCol: String, payloadCol: String,
                  outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "resizeImage needs positive output dims")
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          tryDecode(r.getAs[Array[Byte]](1)) match {
            case None => Row(id, Array.emptyByteArray, -1, -1)
            case Some(img) =>
              val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < outH) {
                val sy = (y.toLong * img.getHeight / outH).toInt
                var x = 0
                while (x < outW) {
                  val sx = (x.toLong * img.getWidth / outW).toInt
                  out.setRGB(x, y, img.getRGB(sx, sy))
                  x += 1
                }
                y += 1
              }
              Row(id, encodePngBytes(out), outW, outH)
          }
        }
      }(org.apache.spark.sql.Encoders.row(resizedSchema))
  }

  // ---- audio: REAL WAV encode/decode via javax.sound.sampled ----

  /** Deterministic frame count for a synthetic audio fixture id. */
  def wavFrames(id: Long): Int = (id % 400).toInt + 100

  /** Deterministic 16-bit PCM sample for (id, i) — pure integer
    * arithmetic, engine-reproducible. */
  def wavSample(id: Long, i: Int): Int = ((id * 31 + i.toLong * 7) % 65536).toInt - 32768

  /** Synthesize a REAL RIFF/WAVE payload per id on the executors
    * (PCM s16le mono 8 kHz, hand-written 44-byte header so the bytes are
    * fully deterministic). The audio analog of [[synthPng]]. */
  def synthWav(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("long"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val n = wavFrames(id)
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1) // PCM
            .putShort(1) // mono
            .putInt(8000).putInt(8000 * 2) // sample rate, byte rate
            .putShort(2) // block align
            .putShort(16) // bits per sample
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) { bb.putShort(wavSample(id, i).toShort); i += 1 }
          Row(id, bb.array())
        }
      }(org.apache.spark.sql.Encoders.row(payloadSchema))

  val audioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** REAL batched audio decode: `javax.sound.sampled.AudioSystem` parses
    * the container and streams PCM frames; emits the decoded format
    * (rate/channels/bits), frame count, and a sample checksum — the
    * audio metadata+content pass of a multimodal pipeline, no external
    * codec library. Unparseable payloads are flagged, not fatal. */
  def decodeAudioFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val pcm = ais.readAllBytes()
            val le = fmt.isBigEndian == false
            var sum = 0L
            var i = 0
            while (i + 1 < pcm.length) {
              val lo = pcm(if (le) i else i + 1) & 0xff
              val hi = pcm(if (le) i + 1 else i)
              sum += (hi << 8) | lo // signed 16-bit sample
              i += 2
            }
            ais.close()
            Row(id, fmt.getSampleRate.toInt, fmt.getChannels,
              fmt.getSampleSizeInBits, frames,
              ((sum % 1000000007L) + 1000000007L) % 1000000007L)
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException |
                 _: java.io.IOException =>
              Row(id, -1, -1, -1, -1L, -1L)
          }
        }
      }(org.apache.spark.sql.Encoders.row(audioFeatureSchema))

  /** Sample-0 perturbation applied by [[synthWavVariant]] — the audio
    * "slightly edited copy" fixture: only segment 0's energy changes,
    * so the [[audioEnvelopeHash]] moves by at most ONE bit (bit 0, the
    * E(0) > E(1) comparison). */
  val VariantSampleDelta = 9999

  /** Synthesize the WAV of `srcIdCol`'s audio with its FIRST sample
    * shifted by [[VariantSampleDelta]] (mod 2^16) — a byte-distinct
    * re-edit whose envelope hash provably stays within Hamming
    * distance 1. Output schema: (doc_id = `idCol`, payload). */
  def synthWavVariant(df: DataFrame, idCol: String,
                      srcIdCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(srcIdCol).cast("long"))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val src = r.getLong(1)
          val n = wavFrames(src)
          val dataLen = n * 2
          val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
            .put("WAVE".getBytes("US-ASCII"))
            .put("fmt ".getBytes("US-ASCII")).putInt(16)
            .putShort(1).putShort(1)
            .putInt(8000).putInt(8000 * 2)
            .putShort(2).putShort(16)
            .put("data".getBytes("US-ASCII")).putInt(dataLen)
          var i = 0
          while (i < n) {
            val s = if (i == 0)
              ((src * 31 + VariantSampleDelta) % 65536).toInt - 32768
            else wavSample(src, i)
            bb.putShort(s.toShort)
            i += 1
          }
          Row(id, bb.array())
        }
      }(org.apache.spark.sql.Encoders.row(payloadSchema))

  /** 64-bit energy-envelope hash over signed 16-bit PCM samples: split
    * the stream into 64 equal segments (boundaries s·n/64, integer
    * floor — duration-normalizing), E(s) = Σ|sample|, bit s (s < 63) =
    * 1 iff E(s) > E(s+1); bit 63 is always 0. The time-envelope
    * reduction of an acoustic fingerprint's band-energy comparisons,
    * kept integer-exact so any engine reproduces it. */
  def envelopeHashOf(samples: Array[Int]): Long = {
    val n = samples.length
    if (n == 0) return 0L
    val e = new Array[Long](64)
    var s = 0
    while (s < 64) {
      var i = (s.toLong * n / 64).toInt
      val to = ((s + 1).toLong * n / 64).toInt
      var sum = 0L
      while (i < to) { sum += math.abs(samples(i).toLong); i += 1 }
      e(s) = sum
      s += 1
    }
    var h = 0L
    s = 0
    while (s < 63) {
      if (e(s) > e(s + 1)) h |= (1L << s)
      s += 1
    }
    h
  }

  val envelopeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frames", LongType, nullable = false),
    StructField("ehash", LongType, nullable = false)))

  /** REAL batched audio fingerprinting: parse the container
    * (javax.sound.sampled), stream the 16-bit PCM frames, emit the
    * frame count and [[envelopeHashOf]]. Unparseable payloads keep
    * their row flagged (frames = -1, hash 0) — pairing excludes them.
    * Feeds [[graft.llm.Dedup.audioNearDupPairs]]. */
  def audioEnvelopeHash(df: DataFrame, idCol: String,
                        payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val frames = ais.getFrameLength
            val pcm = ais.readAllBytes()
            ais.close()
            val le = !fmt.isBigEndian
            val n = pcm.length / 2
            val samples = new Array[Int](n)
            var i = 0
            while (i < n) {
              val lo = pcm(if (le) 2 * i else 2 * i + 1) & 0xff
              val hi = pcm(if (le) 2 * i + 1 else 2 * i)
              samples(i) = (hi << 8) | lo
              i += 1
            }
            Row(id, frames, envelopeHashOf(samples))
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException |
                 _: java.io.IOException =>
              Row(id, -1L, 0L)
          }
        }
      }(org.apache.spark.sql.Encoders.row(envelopeSchema))

  val byteEnvelopeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("bhash", LongType, nullable = false)))

  /** 64-bit byte-envelope hash of an OPAQUE payload: [[envelopeHashOf]]
    * over the raw unsigned bytes — the codec-independent content
    * fingerprint for modalities with no JDK decoder (video containers,
    * unknown formats): the coarse byte-mass envelope survives
    * container-level re-muxing noise the exact hash can't, while
    * staying pure integer arithmetic any engine reproduces. Empty
    * payloads hash to 0 with n_bytes 0 — pairing excludes them (all
    * empties would otherwise declare each other duplicates). Feeds
    * [[graft.llm.Dedup.payloadNearDupPairs]]. */
  def byteEnvelopeHash(df: DataFrame, idCol: String,
                       payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val vals = new Array[Int](bytes.length)
          var i = 0
          while (i < bytes.length) { vals(i) = bytes(i) & 0xff; i += 1 }
          Row(id, bytes.length.toLong, envelopeHashOf(vals))
        }
      }(org.apache.spark.sql.Encoders.row(byteEnvelopeSchema))

  /** Attach a binary payload column (here: utf-8 bytes of a string
    * column; in production: the image/audio bytes read by a binary
    * source such as `spark.read.format("binaryFile")`). */
  def withPayload(df: DataFrame, srcCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, encode(col(srcCol), "UTF-8"))

  val byteFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("format_byte", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Byte-level feature extraction for OPAQUE payloads (audio/video
    * containers with no JDK codec): length, leading byte, byte checksum.
    * This is the pre-decode triage pass of a real pipeline; for images
    * use [[decodeImageFeatures]], which actually decodes. */
  def byteFeatures(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).cast("long"), col(payloadCol))
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = bytes.length
          val b0 = if (n > 0) bytes(0) & 0xff else 0
          var checksum = 0L
          var i = 0
          while (i < n) { checksum += (bytes(i) & 0xff); i += 1 }
          Row(id, n, b0, b0 % 64 + 1, (n % 64) + 1, checksum % ChecksumP)
        }
      }(org.apache.spark.sql.Encoders.row(byteFeatureSchema))

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
