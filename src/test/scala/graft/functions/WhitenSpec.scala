package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WhitenSpec extends SparkSpec {
  import spark.implicits._

  test("whitened data has identity covariance and is deterministic") {
    // correlated synthetic vectors: coord 1 = coord 0 + noise, coord 2
    // on its own scale — whitening must undo both the correlation and
    // the scale difference
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { _ =>
      val a = rnd.nextGaussian()
      Tuple1(Array(a, a + 0.3 * rnd.nextGaussian(),
        5.0 * rnd.nextGaussian(), rnd.nextGaussian() - 2.0))
    }
    val df = rows.toDF("v")
    val white = VectorOps.whiten(df, "v", 4).select(col("whitened").as("v"))
    val cov = VectorOps.covarianceUpper(white, "v", 4)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    for (i <- 0 until 4; j <- i until 4) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(cov((i, j)) - want) < 1e-6,
        s"cov($i,$j) = ${cov((i, j))}, want $want")
    }
    // deterministic: same input → bitwise-same projection
    val first = white.orderBy(element_at(col("v"), 1)).head().getSeq[Double](0)
    val again = VectorOps.whiten(df, "v", 4).select(col("whitened").as("v"))
      .orderBy(element_at(col("v"), 1)).head().getSeq[Double](0)
    assert(first == again)
  }

  test("whiten never shuffles the data — one agg scan plus a projection") {
    val df = (1 to 50)
      .map(i => Tuple1(Array.tabulate(3)(j => math.sin(i * (j + 1)))))
      .toDF("v")
    val white = VectorOps.whiten(df, "v", 3)
    // the returned frame is the ORIGINAL scan plus a map — no exchange
    assert(!graft.sources.Bucketing.hasShuffle(white))
  }
}
