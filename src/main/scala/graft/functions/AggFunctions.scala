package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggShims
import org.apache.spark.sql.classic.GraftColumnShims

/** Aggregate helpers built on Catalyst aggregates that have no public
  * `functions._` wrapper.
  */
object AggFunctions {

  /** Bounded top-k collect of `e`'s values per group — the k smallest
    * (`smallest = true`) or k largest values, as an array.
    *
    * This is Spark's `CollectTopK` aggregate: every partial (map-side)
    * buffer is a bounded priority queue of at most k elements, so a hot
    * group costs O(k) memory per task and the shuffle carries at most
    * k·#tasks values per group — never the group's full row set. That is
    * exactly the fixed-capacity-heap shape of the reference's
    * deterministic reservoir (MinHeapWithFixedCapacity.scala:29-115),
    * expressed as a Catalyst aggregate instead of a combineByKey.
    */
  def collectTopK(e: Column, k: Int, smallest: Boolean): Column =
    GraftColumnShims.column(
      GraftAggShims.collectTopK(GraftColumnShims.expression(e), k, smallest))

  /** U5: union of per-row `array<int>` index sets, returned as the sorted
    * distinct indices. Map-side partials are bounded bitmaps (one per
    * task, ceil(maxIndex/8) bytes) rather than element lists — see
    * [[IndexUnionAgg]] for the shuffle-size argument vs `collect_set`.
    */
  def indexSetUnion(indices: Column): Column = indexUnionUdaf(indices)

  /** The underlying typed UDAF, exposed for [[graft.GraftExtensions]]'s
    * SQL registration (which needs the bare aggregate function, not a
    * Column). */
  private[graft] lazy val indexUnionUdaf =
    org.apache.spark.sql.functions.udaf(IndexUnionAgg)
}
