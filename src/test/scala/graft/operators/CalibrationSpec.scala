package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PAV isotonic calibration invariants and a hand-checked pooling. */
class CalibrationSpec extends SparkSpec {
  import spark.implicits._

  // rows landing in bins 0..3 with pos-rates 0.2, 0.8, 0.4, 0.6:
  // bins 1,2 violate (0.8 > 0.4) → pooled to 0.6; result 0.2, 0.6, 0.6, 0.6
  // then bin 3 at 0.6 equals the pool — stays.
  private def mk(binRates: Seq[(Int, Int, Int)]) =
    binRates.flatMap { case (b, pos, neg) =>
      val s = (b + 0.5) / 4.0
      Seq.fill(pos)((s, 1.0)) ++ Seq.fill(neg)((s, 0.0))
    }.toDF("score", "label")

  test("PAV pools adjacent violators to the weighted average") {
    val df = mk(Seq((0, 2, 8), (1, 8, 2), (2, 4, 6), (3, 6, 4)))
    val out = Calibration.isotonicBins(df, "score", "label", 4)
      .orderBy("bin").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val iso = out.map(_.getDouble(3))
    assert(math.abs(iso(0) - 0.2) < 1e-9)
    // bins 1..3: pooled (8+4+6)/(10+10+10) = 0.6
    assert(iso.drop(1).forall(v => math.abs(v - 0.6) < 1e-9), iso.toSeq)
  }

  test("fit is monotone and preserves the weighted mean") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select((col("l_discount") * 10).as("score"),
        when(col("l_returnflag") === "R", 1.0).otherwise(0.0).as("label"))
    val out = Calibration.isotonicBins(li, "score", "label", 10)
      .orderBy("bin").collect()
    val iso = out.map(_.getDouble(3))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b + 1e-12 },
      s"not monotone: ${iso.toSeq}")
    // Σ n·iso == Σ n·raw (PAV preserves the weighted mean; 6dp rounding)
    val wIso = out.map(r => r.getLong(1) * r.getDouble(3)).sum
    val wRaw = out.map(r => r.getLong(1) * r.getDouble(2)).sum
    val n = out.map(_.getLong(1)).sum
    assert(math.abs(wIso - wRaw) / n < 1e-5, s"$wIso vs $wRaw")
  }

  test("already-monotone rates pass through unpooled") {
    val df = mk(Seq((0, 1, 9), (1, 3, 7), (2, 5, 5), (3, 9, 1)))
    val out = Calibration.isotonicBins(df, "score", "label", 4)
      .orderBy("bin").collect()
    val raw = out.map(_.getDouble(2))
    val iso = out.map(_.getDouble(3))
    assert(raw.zip(iso).forall { case (a, b) => math.abs(a - b) < 1e-9 })
  }
}
