package graft.operators

import org.apache.spark.Partitioner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Size-balanced entity partitioning (A10/X6, reference
  * `photon-api/.../data/RandomEffectDatasetPartitioner.scala:118-171`):
  * heavy entities are greedily bin-packed into the least-loaded
  * partition so per-entity grouped work (the random-effect solve, any
  * `groupByKey`) sees balanced partitions even under entity skew; tail
  * entities fall back to a hash.
  *
  * This repo's DEFAULT stance (SURVEY §2 A10) stands: plain `groupBy` +
  * AQE skew handling needs no custom partitioner, and every built-in
  * operator relies on that. This utility is the opt-in escape hatch for
  * the case AQE cannot fix — when downstream code needs one entity's
  * rows physically co-located in one known partition (per-partition
  * solver state, bounded-memory `mapPartitions` over whole entities)
  * AND the entity-size histogram is known-skewed. Differences from the
  * reference: the heavy-hitter counts come from a distributed
  * `TakeOrdered` (top-K by count) instead of collecting EVERY entity's
  * count to the driver, so the driver never materializes the full
  * entity histogram.
  *
  * The identity repartition drops to the RDD API deliberately:
  * `DataFrame.repartition(n, col)` hashes the expression, which can
  * land two packed bins on one executor core while another sits empty —
  * the whole point of packing is an exact bin→partition identity, which
  * only a custom `Partitioner` expresses.
  */
object BinPacking {

  /** Greedy min-heap packing (the reference's PriorityQueue loop):
    * heaviest entities first, each into the currently least-loaded bin.
    * Deterministic: count ties sort by id, load ties take the lowest
    * bin index. Driver-sized input — callers bound it (topK). */
  def assign(counts: Seq[(String, Long)],
             nPartitions: Int): Map[String, Int] = {
    require(nPartitions > 0,
      s"nPartitions ($nPartitions) must be positive")
    // dequeue yields (least load, lowest index) first
    val heap = scala.collection.mutable.PriorityQueue.tabulate(
      nPartitions)(i => (i, 0L))(Ordering.by(p => (-p._2, -p._1)))
    val out = Map.newBuilder[String, Int]
    counts.sortBy(p => (-p._2, p._1)).foreach { case (id, c) =>
      val (bin, load) = heap.dequeue()
      out += id -> bin
      heap.enqueue((bin, load + c))
    }
    out.result()
  }

  private def tailBin(e: String, nPartitions: Int): Int =
    Math.floorMod(scala.util.hashing.MurmurHash3.stringHash(e),
      nPartitions)

  /** Repartition `df` so each entity's rows land in exactly one
    * partition and partition loads stay balanced under skew: the `topK`
    * heaviest entities are bin-packed (one aggregate + bounded
    * TakeOrdered + broadcast map), the tail is hashed. */
  def packByEntity(df: DataFrame, entityCol: String, nPartitions: Int,
                   topK: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    val heavy = df
      // group on the RAW column and stringify collected keys with the
      // same String.valueOf the row-side keyBy uses: a SQL
      // cast-to-string renders timestamps/decimals differently, and a
      // key that misses the packed map silently demotes that heavy
      // entity to the hash tail (co-location survives, balance doesn't)
      .groupBy(col(entityCol).as("_e")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("_e"))
      .limit(topK) // TakeOrdered: bounded heap per task, no global sort
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toSeq
    val packed = assign(heavy, nPartitions)
    val bmap = spark.sparkContext.broadcast(packed)
    val schema = df.schema
    val idx = schema.fieldIndex(entityCol)
    val n = nPartitions
    val rdd = df.rdd
      .keyBy { r =>
        val e = String.valueOf(r.get(idx))
        bmap.value.getOrElse(e, tailBin(e, n))
      }
      .partitionBy(new Partitioner {
        def numPartitions: Int = n
        def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .values
    spark.createDataFrame(rdd, schema)
  }
}
