package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def media(n: Int) = {
    val rows = (0 until n).map { i =>
      Row(i.toLong, "image",
        Array.tabulate[Byte](100 + i * 37)(b => (b * i).toByte),
        Map("source" -> s"cam$i"))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), Multimodal.mediaSchema)
  }

  test("real PNG payloads decode to exact golden pixels via ImageIO") {
    // 2×2 PNG with one pure color per pixel, encoded in-test (lossless
    // format → byte-exact round trip through the JDK codec)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000) // red
    img.setRGB(1, 0, 0x00FF00) // green
    img.setRGB(0, 1, 0x0000FF) // blue
    img.setRGB(1, 1, 0x102030) // mixed
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val rows = Seq(Row(7L, "image", bos.toByteArray,
      Map.empty[String, String]))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), Multimodal.mediaSchema)
    val d = Multimodal.decode(media).collect().head
    assert(d.getInt(1) == 2 && d.getInt(2) == 2 && d.getInt(3) == 3)
    val px = d.getAs[Array[Byte]](4).map(_ & 0xFF)
    assert(px.toSeq == Seq(
      255, 0, 0,   0, 255, 0,    // row 0: red, green
      0, 0, 255,   0x10, 0x20, 0x30)) // row 1: blue, mixed
  }

  test("undecodable payloads fall back to the deterministic stub") {
    val junk = Array.tabulate[Byte](50)(i => (i * 3).toByte)
    val (w, h, c, px) = Multimodal.decodeImage(junk)
    assert((w, h, c, px.toSeq) == {
      val (sw, sh, sc, spx) = Multimodal.decodeStub(junk)
      (sw, sh, sc, spx.toSeq)
    })
  }

  test("decode produces the typed schema and is deterministic") {
    val d1 = Multimodal.decode(media(10), batchSize = 4)
    val d2 = Multimodal.decode(media(10), batchSize = 3)
    assert(d1.schema == Multimodal.decodedSchema)
    val a = d1.orderBy("media_id").collect()
    val b = d2.orderBy("media_id").collect()
    // batch size must not affect results (batching is an amortization
    // detail, not a semantic one)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getLong(0) == y.getLong(0))
      assert(x.getAs[Array[Byte]](4).toSeq == y.getAs[Array[Byte]](4).toSeq)
    }
    a.foreach { r =>
      assert(r.getAs[Array[Byte]](4).length ==
        r.getInt(1) * r.getInt(2) * r.getInt(3))
    }
  }

  test("resize preserves channel count and retargets dimensions") {
    val resized = Multimodal.resize(Multimodal.decode(media(5)), 4, 6)
    resized.collect().foreach { r =>
      assert(r.getInt(1) == 4 && r.getInt(2) == 6 && r.getInt(3) == 3)
      assert(r.getAs[Array[Byte]](4).length == 4 * 6 * 3)
    }
  }

  test("feature extraction emits fixed-dim float embeddings") {
    val feats = Multimodal.extractFeatures(Multimodal.decode(media(5)), 8)
    assert(feats.columns.toSeq == Seq("media_id", "embedding"))
    feats.collect().foreach { r =>
      val e = r.getSeq[Float](1)
      assert(e.length == 8)
      assert(e.forall(v => v >= 0 && v <= 255))
    }
  }

  test("frame sampling explodes payloads into frame rows") {
    val frames = Multimodal.frameSample(media(3), everyN = 2,
      frameBytes = 32)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // payload length 100 → 3 frames of 32B → ceil(3/2)=2 sampled
    assert(counts(0L) == 2)
    assert(frames.columns.toSeq == Seq("media_id", "frame_idx", "payload"))
  }

  test("WAV codec round-trips 16-bit PCM bit-exactly, mono and stereo") {
    val mono = Array.tabulate[Short](300)(t => ((t * 37) % 4001 - 2000).toShort)
    val Some((r1, c1, s1)) =
      Multimodal.decodeWav(Multimodal.encodeWav(16000, 1, mono))
    assert(r1 == 16000 && c1 == 1 && s1.sameElements(mono))
    val stereo = Array.tabulate[Short](128)(t => (t - 64).toShort)
    val Some((r2, c2, s2)) =
      Multimodal.decodeWav(Multimodal.encodeWav(44100, 2, stereo))
    assert(r2 == 44100 && c2 == 2 && s2.sameElements(stereo))
  }

  test("WAV decoder skips unknown chunks and honors the RIFF pad byte") {
    val samples = Array.tabulate[Short](50)(t => (t * 3).toShort)
    val base = Multimodal.encodeWav(8000, 1, samples)
    // splice an odd-sized LIST chunk between fmt and data (offset 36)
    val junk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 0, 0) ++ Array.fill[Byte](7)(0x55) ++
      Array[Byte](0) // pad to even
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    // fix the RIFF size field (bytes 4-7, little-endian)
    val total = spliced.length - 8
    for (k <- 0 until 4) spliced(4 + k) = ((total >> (8 * k)) & 0xFF).toByte
    val Some((rate, ch, got)) = Multimodal.decodeWav(spliced)
    assert(rate == 8000 && ch == 1 && got.sameElements(samples))
  }

  test("WAV decoder rejects non-WAV and truncated payloads as None") {
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Array.emptyByteArray).isEmpty)
    val good = Multimodal.encodeWav(8000, 1,
      Array.tabulate[Short](40)(_.toShort))
    assert(Multimodal.decodeWav(good.take(50)).isEmpty,
      "data chunk truncated mid-payload must not decode")
    // flip the PCM format tag to 3 (IEEE float) — not supported
    val nonPcm = good.clone()
    nonPcm(20) = 3
    assert(Multimodal.decodeWav(nonPcm).isEmpty)
  }

  test("audioStats reduces WAV payloads to exact integer signal stats") {
    val spark2 = spark
    import spark2.implicits._
    val samples = Array[Short](100, -200, 300, -400)
    val rows = Seq((1L, Multimodal.encodeWav(8000, 1, samples)),
      (2L, "junk".getBytes))
    val media = rows.toDF("media_id", "payload")
    val got = Multimodal.audioStats(media).collect()
    assert(got.length == 1, "non-WAV payloads are dropped")
    val r = got.head
    assert(r.getLong(0) == 1L && r.getInt(1) == 8000 && r.getInt(2) == 1)
    assert(r.getLong(3) == 4L && r.getLong(4) == 1000L && r.getInt(5) == 400)
  }
}
