package graft.operators

import graft.functions.{AggFunctions, VectorOps => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) query set and
  * scan the corpus once — a single map-side pass at any corpus size.
  *
  * `lsh` is the scale path: both sides bucketed by deterministic
  * sign-hyperplane LSH; only same-bucket pairs are scored. Probing
  * `nProbe` neighboring buckets (bit flips) trades recall for cost.
  *
  * Both end in [[topK]] — a bounded-heap aggregate, not a per-query
  * window sort: each map task keeps at most k candidates per query, so
  * the shuffle carries ≤ k·#tasks rows per query regardless of corpus
  * size (a window row_number would gather every scored candidate of a
  * query into one task before discarding all but k).
  */
object Similarity {

  /** Per-query top-k by (cosine desc, id asc): bounded-heap aggregate on
    * the struct (-cosine, id), whose ascending order IS that ranking.
    * CollectTopK's eval returns the retained k in ascending order, so
    * array position is the rank. */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(AggFunctions.collectTopK(
        struct((-col("cosine")).as("nc"), col("id")), k, smallest = true)
        .as("_top"))
      .select(col("qid"), posexplode(col("_top")))
      .select(col("qid"), col("col.id").as("id"),
        (-col("col.nc")).as("cosine"), (col("pos") + 1).as("rank"))

  /** Exact top-k cosine neighbors of each query vector.
    * queries: (qid, qv), corpus: (id, v). Queries must be broadcastable. */
  def bruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topK(corpus.join(broadcast(queries))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)

  /** IVF-Flat ANN: a k-means coarse quantizer (distributed MLlib fit)
    * assigns every corpus vector to its nearest of `nList` centroids;
    * queries probe the `nProbe` nearest inverted lists and score only
    * those lists' members. The classic IVF trade-off: centroids adapt to
    * the data distribution (vs. data-oblivious LSH hyperplanes), at the
    * cost of a training pass. Corpus side = one k-means fit + one
    * shuffle on list id; centroids (nList · dim doubles) broadcast. */
  def ivf(queries: DataFrame, corpus: DataFrame, k: Int,
          nList: Int = 16, nProbe: Int = 2, seed: Long = 7L,
          kmeansMaxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.{Vector => MlVector}
    val av = corpus.select(col("id"), col("v"),
      array_to_vector(col("v").cast("array<double>")).as("fv"))
    val model = new KMeans().setK(nList).setSeed(seed)
      .setMaxIter(kmeansMaxIter)
      .setFeaturesCol("fv").setPredictionCol("list").fit(av)
    val bucketed = model.transform(av).select(col("id"), col("v"),
      col("list"))
    val centers = corpus.sparkSession.sparkContext
      .broadcast(model.clusterCenters)
    val probeLists = udf { (qv: Seq[Double]) =>
      centers.value.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        val ca = c.toArray
        while (j < ca.length) {
          val diff = ca(j) - qv(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nProbe).map(_._2)
    }
    val q = queries.select(col("qid"), col("qv"),
      explode(probeLists(col("qv").cast("array<double>"))).as("list"))
    topK(bucketed.join(broadcast(q), Seq("list"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
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
    topK(c.join(broadcast(q), Seq("bucket"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
  }
}
