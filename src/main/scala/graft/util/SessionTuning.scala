package graft.util

import org.apache.spark.sql.SparkSession

/** Engine-level Spark session defaults every entry point (bench, verify,
  * CLI drivers, specs) applies before `getOrCreate`.
  *
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default
  * 128): ObjectHashAggregate — the physical operator behind every
  * TypedImperativeAggregate here (`collect_top_k` bounded heaps,
  * `IndexUnionAgg` bitmaps) — abandons its hash map and SORTS THE WHOLE
  * INPUT once a partition sees more than this many distinct keys. At 128
  * the bounded-heap reservoir degenerated to a full-width sort of every
  * row (q18: 30 s warm vs 3.9 s with the map retained). The per-key
  * state these aggregates carry is deliberately bounded (cap-sized heap,
  * fixed-width bitmap), so a multi-million-key hash map is exactly the
  * memory the operator budgeted for — raise the fallback to 4M keys per
  * partition and keep the executor-memory sizing honest the same way any
  * hash aggregate does.
  */
object SessionTuning {
  val defaults: Seq[(String, String)] = Seq(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "4194304")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    defaults.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
