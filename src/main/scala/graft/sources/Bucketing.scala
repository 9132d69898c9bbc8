package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a fact-fact join is shuffling both
  * sides on the key. Writing both tables bucketed (and sorted) by the
  * join key moves that shuffle to write time, once; every subsequent
  * join on the key is a zero-exchange sort-merge join of co-located
  * buckets. The bucket count is fixed at write time — pick it for the
  * target parallelism (e.g. 4096 at 100 TB), not today's data size,
  * because changing it later means rewriting the table.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table at `path`.
    * Both sides of a future join must use the SAME `nBuckets` for the
    * exchange to be elided. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts the plan contains no shuffle exchange — verified by
    * [[hasShuffle]] in the spec. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** True if the plan of `df` contains a shuffle exchange (broadcast
    * exchanges don't count — they're not a repartition). Materializes
    * the query first so AQE's final plan — not the opaque adaptive
    * wrapper — is what gets inspected. */
  def hasShuffle(df: DataFrame): Boolean = countShuffles(df) > 0

  /** Number of shuffle exchanges in the EXECUTED plan of `df` (broadcast
    * exchanges don't count — they're not a repartition). Materializes
    * the query first so AQE's final plan — not the opaque adaptive
    * wrapper — is what gets inspected. The count is each query's
    * "shuffle budget": the plan-contract number the scale argument in
    * its scaladoc is making. */
  def countShuffles(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // run THIS DataFrame's own QueryExecution (count() would build a
    // separate one and leave df's adaptive plan un-finalized)
    df.queryExecution.toRdd.foreach(_ => ())
    // QueryStageExec nodes are leaves to TreeNode traversal — their
    // subtree hangs off `.plan` — so a plain collect would see only the
    // ResultQueryStage wrapper; flatten through stages explicitly
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case q: QueryStageExec => flatten(q.plan)
      case other => other.children.flatMap(flatten)
    })
    // count DISTINCT exchange nodes: under AQE the same stage can be
    // referenced from multiple query stages after reuse
    flatten(df.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeLike => s
    }.distinct.size
  }
}
