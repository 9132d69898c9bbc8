package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact frequent-item mining in the two-phase candidate shape that
  * survives 100 TB: per-partition Misra-Gries summaries produce a small
  * candidate superset in one scan with zero shuffle, then a single
  * broadcast-pruned recount makes the answer exact.
  *
  * Why not one big `groupBy(item).count()`? At corpus scale the item
  * domain (tokens, URLs, user ids) can be billions of distinct keys, so
  * the full-count shuffle moves the whole dataset. Here the shuffle
  * carries only rows matching ≤ ⌈1/s⌉·numPartitions candidates — the
  * broadcast semi-join prunes everything else map-side — and the final
  * answer is still exact, not approximate.
  */
object HeavyHitters {

  /** Items whose global frequency strictly exceeds `s`·N (N = non-null
    * row count of `itemCol`). Output: (`itemCol`, cnt: BIGINT).
    *
    * Soundness of the candidate phase: if an item's global count
    * exceeds s·N, then by pigeonhole its count in at least one
    * partition exceeds s·(that partition's size), and a Misra-Gries
    * summary with capacity ⌈1/s⌉ always retains any item whose local
    * frequency exceeds that local threshold. So the union of
    * per-partition summaries is a superset of the true heavy hitters —
    * the exact recount can only remove false positives, never miss.
    * The candidate set depends on the physical partitioning; the final
    * output does not.
    *
    * Exactly TWO scans of the data: pass 1 emits each partition's MG
    * survivors AND its row count as one fused mapPartitions (the tiny
    * per-partition stats table — ≤ ⌈1/s⌉+1 rows per partition — is
    * persisted, so candidates and the global N are both read from it);
    * pass 2 is the broadcast-pruned exact recount. */
  def frequentItems(items: DataFrame, itemCol: String, s: Double): DataFrame = {
    require(s > 0.0 && s < 1.0, s"support threshold must be in (0,1), got $s")
    val spark = items.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / s).toInt
    val vals = items.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string")).as[String]
    // fused pass 1: (isTotal=false, candidate, 0) rows plus one
    // (isTotal=true, "", localN) row per partition
    val partStats = vals.mapPartitions { it =>
      var localN = 0L
      val counted = it.map { x => localN += 1; x }
      val cands = misraGries(counted, k)
      (cands.map(t => (false, t, 0L)) ++
        Iterator.single((true, "", localN))).iterator
    }.toDF("_isTotal", itemCol, "_n")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val candidates = partStats.filter(!col("_isTotal"))
      .select(col(itemCol)).distinct()
    val total = partStats.filter(col("_isTotal"))
      .agg(sum(col("_n")).as("_n"))
    // both engines compare cnt > s·N in identical IEEE double arithmetic
    vals.toDF(itemCol)
      .join(broadcast(candidates), itemCol)
      .groupBy(itemCol).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt").cast("double") > lit(s) * col("_n").cast("double"))
      .select(col(itemCol), col("cnt"))
  }

  /** Misra-Gries summary of one partition: at most `k` surviving keys;
    * any item with local frequency > localN/k survives. O(1) amortized
    * per element, O(k) memory. Fully consumes `it` and returns the
    * survivors as a materialized collection (safe to use after the
    * input iterator is exhausted). */
  private def misraGries(it: Iterator[String], k: Int): Vector[String] = {
    val counts = new java.util.HashMap[String, java.lang.Long](k * 2)
    while (it.hasNext) {
      val x = it.next()
      val cur = counts.get(x)
      if (cur != null) counts.put(x, cur + 1L)
      else if (counts.size < k) counts.put(x, java.lang.Long.valueOf(1L))
      else {
        val entries = counts.entrySet().iterator()
        while (entries.hasNext) {
          val e = entries.next()
          if (e.getValue == 1L) entries.remove()
          else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counts.keySet().asScala.toVector
  }
}
