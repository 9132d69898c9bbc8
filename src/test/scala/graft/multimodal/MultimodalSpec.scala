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
}
