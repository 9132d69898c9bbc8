package graft.operators

import org.apache.spark.sql.catalyst.expressions.GraftBloomShims
import org.apache.spark.sql.classic.GraftColumnShims
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit bloom-filter semi-join pruning.
  *
  * The pattern behind Spark's own runtime row-group filtering, exposed
  * as an operator: build a bloom filter over the small side's join keys
  * (one aggregate, a few hundred KB), broadcast it, and drop big-side
  * rows whose key cannot match BEFORE the join shuffle. At 100 TB the
  * join's cost is shuffling the big side; when the small side is
  * selective (a filtered dimension), the bloom probe eliminates most of
  * that shuffle for the price of a broadcast scalar and a codegen'd
  * probe per row. False positives only cost wasted shuffle rows — the
  * exact join behind the filter decides membership, so results are
  * row-for-row the plain join's.
  */
object BloomJoin {

  /** Inner equi-join with the big side pre-pruned by a bloom filter of
    * `small`'s keys. Identical rows to `big.join(small, key)`: the
    * bloom aggregate becomes a scalar subquery in the filter predicate
    * (the same wiring as Spark's InjectRuntimeFilter), evaluated once
    * and broadcast with the plan. */
  def join(big: DataFrame, small: DataFrame, key: String,
           estItems: Long = 1000000L, numBits: Long = 8388608L)
  : DataFrame = {
    val bf = small.agg(GraftColumnShims.column(GraftBloomShims.bloomAgg(
      GraftColumnShims.expression(xxhash64(col(key))), estItems, numBits))
      .as("_bf"))
    big.filter(GraftColumnShims.column(GraftBloomShims.mightContain(
        bf, GraftColumnShims.expression(xxhash64(col(key))))))
      .join(small, key)
  }
}
