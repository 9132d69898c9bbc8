package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * A single hot key turns a keyed shuffle into one straggler task at
  * scale. Salting splits each key's rows across `saltN` sub-keys so the
  * hot key's work spreads over `saltN` tasks, at the cost of either a
  * second (tiny) aggregation or a `saltN`× replication of the small join
  * side. AQE's skew handling covers sort-merge joins; salting is the
  * explicit, planner-independent form that also covers aggregations,
  * which AQE does not rebalance.
  *
  * Results are exactly the unsalted results — the salt only re-routes
  * rows — which is what the oracle checks.
  */
object Skew {

  /** Deterministic salt in [0, saltN): hash of a unique id, never
    * `rand()` (reproducible across retries and engines). */
  private def saltOf(uid: Column, saltN: Int): Column =
    pmod(xxhash64(uid), lit(saltN))

  /** Two-phase (salted) aggregation: partial aggregate on (keys, salt),
    * final aggregate on keys. `aggs` maps output column name → (partial
    * aggregate of the input column, final aggregate of the partial).
    * Identical to the direct groupBy for any decomposable aggregate
    * (sum/count/min/max), but no reduce task ever sees more than
    * ~1/saltN of a hot key's rows.
    *
    * (Spark's hash aggregate already does map-side partials, which
    * covers most skew; the explicit form matters when per-key state is
    * too big to combine map-side — think collect-style or sketch
    * aggregates — or when the planner falls back to sort-based
    * aggregation.) */
  def saltedAgg(df: DataFrame, keys: Seq[String], uid: Column, saltN: Int,
                partial: Seq[(String, Column)],
                fin: Seq[(String, Column)]): DataFrame = {
    require(partial.nonEmpty && partial.length == fin.length)
    val p = df.withColumn("_salt", saltOf(uid, saltN))
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partial.head._2.as(partial.head._1),
        partial.tail.map { case (n, c) => c.as(n) }: _*)
    p.groupBy(keys.map(col): _*)
      .agg(fin.head._2.as(fin.head._1),
        fin.tail.map { case (n, c) => c.as(n) }: _*)
  }

  /** Join-skew ADVISOR — measure before salting: per-key row counts on
    * both join sides and the key's join-output contribution
    * (cnt_left · cnt_right), top-k by contribution. The keys this
    * surfaces are exactly the ones whose reduce tasks straggle; feed
    * them to [[saltedJoin]] / AQE skew thresholds instead of guessing.
    *
    * Cost: one hash aggregate per side (map-side combined), an inner
    * join of the two COUNT tables (key-cardinality-sized, not
    * row-sized), and a bounded-heap top-k — safe to run on the full
    * 100 TB join inputs. All-integer output. */
  def joinSkewReport(left: DataFrame, right: DataFrame, key: String,
                     topK: Int = 10): DataFrame = {
    val l = left.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("cnt_left"))
    val r = right.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("cnt_right"))
    val contrib = l.join(r, "key")
      .withColumn("pairs", col("cnt_left") * col("cnt_right"))
    contrib
      .agg(graft.functions.AggFunctions.collectTopK(
        struct((-col("pairs")).as("np"), col("key"),
          col("cnt_left"), col("cnt_right")), topK, smallest = true)
        .as("_top"))
      .select(posexplode(col("_top")))
      .select((col("pos") + 1).cast("long").as("rnk"),
        col("col.key").as("key"),
        col("col.cnt_left").as("cnt_left"),
        col("col.cnt_right").as("cnt_right"),
        (-col("col.np")).as("pairs"))
  }

  /** Salted equi-join for a skewed big side: the big side gets a hashed
    * salt, the small side is replicated `saltN`× (one copy per salt
    * value), and the join runs on (key, salt). Row-for-row equal to the
    * plain join; the hot key's probe rows now land in `saltN` tasks.
    * Only worth it when the small side is small enough to replicate —
    * the same precondition as a broadcast join, which Spark would
    * otherwise pick; the salted form is for when the small side is just
    * past the broadcast threshold but a hot key still dominates. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigUid: Column, saltN: Int): DataFrame = {
    val b = big.withColumn("_salt", saltOf(bigUid, saltN))
    val s = small.withColumn("_salt",
      explode(array((0 until saltN).map(i => lit(i.toLong)): _*)))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
