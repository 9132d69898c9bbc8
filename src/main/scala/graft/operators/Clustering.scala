package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic embedding clustering.
  *
  * [[kmeans]] is fixed-iteration Lloyd's — the reproducible,
  * oracle-checkable companion to the MLlib fits inside
  * [[Similarity]]'s IVF indexes (MLlib's k-means|| init and stopping
  * rule are seed- and engine-specific; this one is mirrorable term for
  * term in SQL). [[semDedup]] composes it into SemDeDup-style semantic
  * near-duplicate detection (Abbas et al. 2023): cluster first, then
  * compare only within a cluster.
  */
object Clustering {

  /** Lloyd's k-means with a FIXED iteration count and deterministic
    * initialization.
    *
    * - Init: the `k` lowest-`idCol` vectors, in id order.
    * - Assign: argmin of squared-L2 distance to the `k` broadcast
    *   centroids; distances round at `roundTo` dp and ties break on the
    *   lower centroid index, so a near-tie cannot flip across engines.
    * - Update: per-(cluster, dim) means — elements round at `roundTo`
    *   dp into exact `DECIMAL(18,roundTo)` sums (order-independent),
    *   divided back in double. An empty cluster keeps its centroid.
    *
    * Scale shape: centroids are k·d doubles — bounded driver/broadcast
    * state by definition, the same discipline as
    * [[Similarity.ivfPq]]'s codebooks. Each iteration is ONE scan of
    * the cached vectors ending in a k·d-row aggregate; the vectors are
    * never shuffled and never collected. Returns `(idCol, cluster)`.
    */
  def kmeans(df: DataFrame, idCol: String, vecCol: String, k: Int,
             iterations: Int, roundTo: Int = 9): DataFrame = {
    require(k >= 1 && iterations >= 1 && roundTo >= 1 && roundTo <= 15)
    val spark = df.sparkSession
    val v = df.select(col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = v.orderBy("_id").limit(k).collect()
      .map(_.getSeq[Double](1).toArray)
    require(init.length == k, s"need at least $k vectors, got ${init.length}")

    def assign(cs: Array[Array[Double]]) = {
      val bc = spark.sparkContext.broadcast(cs)
      udf { (vec: Seq[Double]) =>
        val a = vec.toArray
        var best = 0
        var bestD = Double.MaxValue
        var i = 0
        while (i < bc.value.length) {
          val c = bc.value(i)
          var d = 0.0
          var j = 0
          while (j < c.length) { val t = a(j) - c(j); d += t * t; j += 1 }
          val rd = java.math.BigDecimal.valueOf(d)
            .setScale(roundTo, java.math.RoundingMode.HALF_UP)
            .doubleValue()
          if (rd < bestD) { bestD = rd; best = i }
          i += 1
        }
        best
      }
    }

    var centroids = init
    for (_ <- 1 to iterations) {
      val stats = v
        .select(assign(centroids)(col("_v")).as("_cl"),
          posexplode(col("_v")).as(Seq("_j", "_x")))
        .groupBy("_cl", "_j")
        .agg(sum(round(col("_x"), roundTo)
            .cast(s"decimal(18,$roundTo)")).as("_s"),
          count(lit(1)).as("_n"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        // exact decimal sum → nearest double, then one double division:
        // the same two correctly-rounded steps the SQL mirror takes
        next(r.getInt(0))(r.getInt(1)) =
          r.getDecimal(2).doubleValue() / r.getLong(3)
      }
      centroids = next
    }
    v.select(col("_id").as(idCol), assign(centroids)(col("_v")).as("cluster"))
  }

  /** SemDeDup-style semantic near-duplicate pairs: k-means first, then
    * cosine only WITHIN a cluster — the clustering turns the O(n²)
    * all-pairs comparison into Σ cluster², with the cluster count
    * choosing the trade-off (the same role LSH bands play in
    * [[Dedup.minhashPairs]], but data-adaptive). Emits
    * `(cluster, id_a, id_b, cosine)` for pairs with cosine ≥ `tau`;
    * downstream keeper selection is [[Dedup.resolveClusters]]'s job.
    *
    * A skewed cluster is quadratic in its size — `maxCluster` guards
    * the pathological case (a cluster larger than the cap is dropped
    * from pairing, the [[Dedup]] hot-bucket convention). */
  /** [[semDedup]] with the cluster count derived from the data:
    * k = ceil(n / targetClusterSize). A FIXED k is a scale trap — 10×
    * the points with the same k means 10× per cluster and 100×
    * within-cluster pairs (r7's scaling run measured exactly that:
    * 31× time for 10× data). Pinning the EXPECTED CLUSTER SIZE instead
    * keeps pair generation linear in n; the one extra count() is a
    * single columnless scan (it inherits any exchange the caller's
    * frame carries — e.g. the fixture-scale fan-out — which is absent
    * at production layouts where fanOut is a no-op). */
  def semDedupAuto(df: DataFrame, idCol: String, vecCol: String,
                   tau: Double, targetClusterSize: Long, iterations: Int,
                   maxCluster: Long = 100000L): DataFrame = {
    require(targetClusterSize >= 1)
    val n = df.count()
    val k = math.max(1L,
      (n + targetClusterSize - 1) / targetClusterSize).toInt
    semDedup(df, idCol, vecCol, tau, k, iterations, maxCluster)
  }

  def semDedup(df: DataFrame, idCol: String, vecCol: String, tau: Double,
               k: Int, iterations: Int,
               maxCluster: Long = 100000L): DataFrame = {
    val assigned = kmeans(df, idCol, vecCol, k, iterations)
    val withVec = df.select(col(idCol), col(vecCol))
      .join(assigned, idCol)
      .select(col("cluster"), col(idCol).as("_id"),
        col(vecCol).cast("array<double>").as("_v"))
    val guarded = withVec.join(
      withVec.groupBy("cluster").agg(count(lit(1)).as("_sz")), "cluster")
      .filter(col("_sz") <= maxCluster).drop("_sz")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = guarded.select(col("cluster"), col("_id").as("id_a"),
      col("_v").as("_va"))
    val b = guarded.select(col("cluster"), col("_id").as("id_b"),
      col("_v").as("_vb"))
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"),
        graft.functions.VectorOps.cosine(col("_va"), col("_vb"))
          .as("cosine"))
      .filter(col("cosine") >= tau)
  }
}
