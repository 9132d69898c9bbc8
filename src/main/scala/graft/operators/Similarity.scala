package graft.operators

import graft.functions.{VectorOps => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) query set and
  * scan the corpus once — a single map-side pass at any corpus size, with a
  * per-query top-k window on the (tiny) candidate score set.
  *
  * `lsh` is the scale path: both sides bucketed by deterministic
  * sign-hyperplane LSH; only same-bucket pairs are scored. Probing
  * `nProbe` neighboring buckets (bit flips) trades recall for cost.
  */
object Similarity {

  /** Exact top-k cosine neighbors of each query vector.
    * queries: (qid, qv), corpus: (id, v). Queries must be broadcastable. */
  def bruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: score only same-bucket (plus probed-bucket) pairs.
    * At 100 TB the corpus side is one scan + one shuffle on bucket id. */
  def lsh(queries: DataFrame, corpus: DataFrame, k: Int,
          nBits: Int = 8, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col("id"), col("v"),
      V.lshBucket(col("v"), nBits).as("bucket"))
    // probe: the query's own bucket plus single-bit flips (0..nProbe-1)
    val q = queries.select(col("qid"), col("qv"),
      V.lshBucket(col("qv"), nBits).as("qb"))
      .select(col("qid"), col("qv"), explode(array(
        (lit(0) +: (0 until nProbe).map(b => lit(1 << b))).map(f =>
          col("qb").bitwiseXOR(f)): _*)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
