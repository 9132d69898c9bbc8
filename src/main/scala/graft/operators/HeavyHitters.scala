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
    */
  def frequentItems(items: DataFrame, itemCol: String, s: Double): DataFrame = {
    require(s > 0.0 && s < 1.0, s"support threshold must be in (0,1), got $s")
    val spark = items.sparkSession
    import spark.implicits._
    val k = math.ceil(1.0 / s).toInt
    val vals = items.filter(col(itemCol).isNotNull)
      .select(col(itemCol).cast("string")).as[String]
    val candidates =
      vals.mapPartitions(it => misraGries(it, k)).toDF(itemCol).distinct()
    val total = vals.toDF(itemCol).agg(count(lit(1)).as("_n"))
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
    * per element, O(k) memory. */
  private def misraGries(it: Iterator[String], k: Int): Iterator[String] = {
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
    // copy out: the iterator must not depend on the live map
    counts.keySet().asScala.toVector.iterator
  }
}
