package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Date-partitioned parquet sink with bounded files per partition.
  *
  * The two failure modes of a naive `partitionBy` write at scale:
  *   - every task holds a writer for every date it sees → thousands of
  *     small files per partition (task count × partition count);
  *   - one hot date funnels through however many tasks happen to carry
  *     it, with no control over file sizes.
  *
  * Repartitioning by (date, hash(uid) % filesPerPartition) first routes
  * each output file's rows to exactly one task: at most
  * `filesPerPartition` files per date, written in parallel, regardless
  * of input partitioning. Readers then prune on `dt` (partition
  * pruning), which is what makes date-ranged scans cheap later.
  */
object PartitionedSink {

  /** Write `df` to `path` partitioned by the date of `tsCol`, with at
    * most `filesPerPartition` parquet files per date directory. */
  def writeByDate(df: DataFrame, path: String, tsCol: String,
                  uidCol: String, filesPerPartition: Int = 4): Unit = {
    val withDt = df.withColumn("dt", to_date(col(tsCol)))
      .withColumn("_slot",
        pmod(xxhash64(col(uidCol)), lit(filesPerPartition)))
    withDt
      .repartition(col("dt"), col("_slot"))
      .drop("_slot")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("dt")
      .parquet(path)
  }
}
