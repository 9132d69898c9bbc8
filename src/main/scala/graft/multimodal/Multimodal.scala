package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for training-data pipelines.
  *
  * Media travel as opaque `binary` payload columns with typed metadata,
  * and every transform is a `mapPartitions` over batches — the Scala
  * equivalent of `mapInPandas`: per-partition, batched, zero driver
  * involvement, arbitrarily wide scale-out. Image decode is REAL for the
  * formats the JDK ships codecs for (PNG/JPEG/BMP/GIF via javax.imageio);
  * payloads ImageIO cannot parse (synthetic fixtures, audio/video, exotic
  * formats — no external libraries in this container) fall back to
  * `decodeStub`, which derives deterministic fake pixels from the payload
  * bytes so pipelines stay testable end to end.
  */
object Multimodal {

  /** Canonical media schema: id + kind + payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  /** Real image decode through the JDK's ImageIO: returns row-major RGB
    * bytes (3 channels). Undecodable payloads → [[decodeStub]] so the
    * pipeline never throws on mixed/unknown media. */
  private[multimodal] def decodeImage(payload: Array[Byte])
  : (Int, Int, Int, Array[Byte]) = {
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) decodeStub(payload)
    else {
      val w = img.getWidth
      val h = img.getHeight
      val c = 3
      val px = new Array[Byte](w * h * c)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val o = (y * w + x) * c
          px(o) = ((rgb >> 16) & 0xFF).toByte
          px(o + 1) = ((rgb >> 8) & 0xFF).toByte
          px(o + 2) = (rgb & 0xFF).toByte
          x += 1
        }
        y += 1
      }
      (w, h, c, px)
    }
  }

  /** === STUB codec (fallback) ===
    * Deterministic fake decode for payloads no JDK codec accepts:
    * dimensions from payload length, pixel bytes from a rolling transform
    * of the payload. */
  private[multimodal] def decodeStub(payload: Array[Byte])
  : (Int, Int, Int, Array[Byte]) = {
    val w = 8 + (math.abs(java.util.Arrays.hashCode(payload)) % 24)
    val h = 8 + (payload.length % 24)
    val c = 3
    val px = new Array[Byte](w * h * c)
    var i = 0
    while (i < px.length) {
      px(i) = (if (payload.isEmpty) 0
      else payload(i % payload.length) + i).toByte
      i += 1
    }
    (w, h, c, px)
  }

  /** Decode payloads in batches of `batchSize` (the mapInPandas batch
    * shape: a real codec amortizes setup per batch, not per row). */
  def decode(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "payload").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch codec setup would go here
          batch.iterator.map { r =>
            val (w, h, c, px) = decodeImage(r.getAs[Array[Byte]](1))
            Row(r.getLong(0), w, h, c, px)
          }
        }
      }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Resize decoded images (nearest-neighbor over the stub pixel buffer —
    * the buffer layout handling is real, the resample kernel trivial). */
  def resize(decoded: DataFrame, outW: Int, outH: Int): DataFrame = {
    val spark = decoded.sparkSession
    val rows = decoded.select("media_id", "width", "height", "channels",
      "pixels").rdd.mapPartitions { it =>
      it.map { r =>
        val (w, h, c) = (r.getInt(1), r.getInt(2), r.getInt(3))
        val src = r.getAs[Array[Byte]](4)
        val dst = new Array[Byte](outW * outH * c)
        var y = 0
        while (y < outH) {
          val sy = y * h / outH
          var x = 0
          while (x < outW) {
            val sx = x * w / outW
            var ch = 0
            while (ch < c) {
              dst((y * outW + x) * c + ch) = src((sy * w + sx) * c + ch)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        Row(r.getLong(0), outW, outH, c, dst)
      }
    }
    spark.createDataFrame(rows, decodedSchema)
  }

  /** Feature extraction: pixels → float embedding (STUB: mean intensity
    * per strided pixel bucket, byte index modulo `dim` — a real
    * extractor would run a vision model here). Output shape matches the
    * embeddings table (`array<float>`). */
  def extractFeatures(decoded: DataFrame, dim: Int = 16): DataFrame = {
    val featUdf = udf { (pixels: Array[Byte]) =>
      val out = new Array[Float](dim)
      var i = 0
      while (i < pixels.length) {
        out(i % dim) += (pixels(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(1, pixels.length / dim)
      out.map(_ / n)
    }
    decoded.withColumn("embedding", featUdf(col("pixels")))
      .select("media_id", "embedding")
  }

  /** Audio decode output: id + format + integer signal stats. */
  val audioStatsSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_samples", LongType, nullable = false),
    StructField("sum_abs", LongType, nullable = false),
    StructField("peak", IntegerType, nullable = false)))

  /** REAL RIFF/WAVE codec (pure JVM, no external libraries): walks the
    * chunk list, requires a PCM (format 1) 16-bit `fmt ` chunk, and
    * reads little-endian int16 samples from the `data` chunk. Unknown
    * chunks (LIST, fact, …) are skipped by their declared size, and odd
    * chunk sizes honor RIFF's pad byte. Returns null for payloads that
    * are not 16-bit PCM WAV — callers decide whether to stub or drop. */
  private[multimodal] def decodeWav(payload: Array[Byte])
  : Option[(Int, Int, Array[Short])] = {
    def le16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def le32(o: Int): Int = le16(o) | (le16(o + 2) << 16)
    def tag(o: Int): String = new String(payload, o, 4, "US-ASCII")
    if (payload.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE")
      return None
    var fmt: Option[(Int, Int, Int)] = None // (audioFormat, channels, rate)
    var bits = 0
    var out: Option[(Int, Int, Array[Short])] = None
    var o = 12
    while (o + 8 <= payload.length && out.isEmpty) {
      val id = tag(o)
      val size = le32(o + 4)
      if (size < 0 || o + 8 + size > payload.length) return None
      id match {
        case "fmt " if size >= 16 =>
          fmt = Some((le16(o + 8), le16(o + 10), le32(o + 12)))
          bits = le16(o + 22)
        case "data" =>
          fmt match {
            case Some((1, ch, rate)) if bits == 16 && ch >= 1 =>
              val n = size / 2
              val samples = new Array[Short](n)
              var i = 0
              while (i < n) {
                samples(i) = le16(o + 8 + i * 2).toShort
                i += 1
              }
              out = Some((rate, ch, samples))
            case _ => return None // data before fmt, or non-PCM16
          }
        case _ => () // skip LIST/fact/other chunks
      }
      o += 8 + size + (size & 1) // RIFF pads odd-sized chunks
    }
    out
  }

  /** Encode 16-bit PCM samples as a WAV payload (the fixture/sink side
    * of [[decodeWav]]; round-trips bit-exactly). */
  def encodeWav(sampleRate: Int, channels: Int,
                samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Audio feature extraction over a media table: decode WAV payloads
    * through the real codec and reduce each to integer signal stats
    * (sample count, Σ|sample|, peak |sample|) — all-integer output, so
    * the stats are hash-exact across engines. Non-WAV payloads are
    * dropped (count them upstream via a `kind` filter). Batched
    * mapPartitions like [[decode]]: zero driver involvement, scales
    * with partitions. */
  def audioStats(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "payload").rdd
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.flatMap { r =>
            decodeWav(r.getAs[Array[Byte]](1)).map {
              case (rate, ch, samples) =>
                var sumAbs = 0L
                var peak = 0
                var i = 0
                while (i < samples.length) {
                  val a = math.abs(samples(i).toInt)
                  sumAbs += a
                  if (a > peak) peak = a
                  i += 1
                }
                Row(r.getLong(0), rate, ch, samples.length.toLong,
                  sumAbs, peak)
            }
          }
        }
      }
    spark.createDataFrame(rows, audioStatsSchema)
  }

  /** Video frame sampling: one payload → every-Nth synthetic frame rows
    * (explode-shaped, so downstream image ops apply per frame). */
  def frameSample(media: DataFrame, everyN: Int = 10,
                  frameBytes: Int = 256): DataFrame = {
    val frames = udf { (payload: Array[Byte]) =>
      val n = math.max(1, payload.length / frameBytes)
      (0 until n by everyN).map { f =>
        val start = f * frameBytes
        java.util.Arrays.copyOfRange(payload, start,
          math.min(start + frameBytes, payload.length))
      }
    }
    media.select(col("media_id"), posexplode(frames(col("payload")))
      .as(Seq("frame_idx", "payload")))
  }
}
