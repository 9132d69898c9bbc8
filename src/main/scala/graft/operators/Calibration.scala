package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Isotonic (monotone non-decreasing) calibration via pool-adjacent-
  * violators over score bins — the step after q115's reliability bins:
  * turn raw per-bin positive rates into a monotone calibration map.
  *
  * Scale shape: ONE hash aggregate reduces the data to `nBins` rows of
  * integer sufficient statistics (n, positives); PAV then runs on the
  * driver over that bounded, already-aggregated table (like every
  * centroid/boundary collect in this repo, the collect size is a
  * parameter, never the data). The result joins back as a broadcast map.
  *
  * Determinism: pools carry INTEGER (pos, n) sums; violation tests
  * compare pos·n cross-products in BigInt (no doubles anywhere in the
  * merge), and each emitted rate is one integer/integer double division.
  * The fit equals the minimax characterization
  * iso(k) = max_{i≤k} min_{j≥k} avg(i..j), which an external engine can
  * evaluate directly over the same integer sums — landing on bit-identical
  * doubles because the winning interval is the PAV pool itself. */
object Calibration {

  /** Fit isotonic calibration over `nBins` equal-width score bins of
    * `scoreCol` ∈ [0,1]; label is positive when `labelCol` > 0.5.
    * Returns (bin, n, rate_raw, rate_iso) rounded to `roundTo` dp. */
  def isotonicBins(df: DataFrame, scoreCol: String, labelCol: String,
                   nBins: Int, roundTo: Int = 6): DataFrame = {
    require(nBins >= 1 && nBins <= 100000, "nBins must be bounded")
    val bin = least(floor(col(scoreCol) * nBins).cast("long"),
      lit(nBins - 1L)).cast("int")
    // persisted: the driver-side PAV collect and the result join both
    // read the bin table — one data-sized aggregation, not two
    val bins = df
      .select(bin.as("bin"),
        when(col(labelCol) > 0.5, 1L).otherwise(0L).as("_p"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("_p")).as("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded collect: nBins rows of (bin, n, pos) — never the data
    val stats = bins.orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    final case class Pool(hi: Int, pos: Long, n: Long, bins: List[Int])
    val pools = stats.foldLeft(List.empty[Pool]) {
      case (acc, (b, n, pos)) =>
        var st = Pool(b, pos, n, List(b)) :: acc
        // merge while the previous pool's rate EXCEEDS the new one's:
        // prev.pos/prev.n > cur.pos/cur.n ⇔ prev.pos·cur.n > cur.pos·prev.n
        while (st.tail.nonEmpty && {
          val p = st.tail.head; val c = st.head
          BigInt(p.pos) * c.n > BigInt(c.pos) * p.n
        }) {
          val c = st.head; val p = st.tail.head
          st = Pool(c.hi, p.pos + c.pos, p.n + c.n, p.bins ++ c.bins) ::
            st.tail.tail
        }
        st
    }
    val fit = pools.flatMap(p =>
      p.bins.map(b => (b, p.pos.toDouble / p.n.toDouble)))
      .toMap
    val spark = df.sparkSession
    import spark.implicits._
    val iso = fit.toSeq.toDF("bin", "_iso")
    bins.join(broadcast(iso), "bin")
      .select(col("bin"), col("n"),
        round(col("pos").cast("double") / col("n").cast("double")
          + lit(1e-9), roundTo).as("rate_raw"),
        round(col("_iso") + lit(1e-9), roundTo).as("rate_iso"))
  }
}
