package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension
  * keys so that range-partitioning on the single z-value gives 2-D
  * locality tiles — rows close in BOTH dimensions land in the same
  * partition/file, and a reader filtering on either dimension skips
  * most files. The data-layout optimization lakehouse table formats
  * run at OPTIMIZE time, expressed as plain Spark.
  *
  * The z-value is a pure codegen'd projection (shiftright / and /
  * shiftleft folded over the bit positions — no UDF), and the cluster
  * step is ONE range-partitioning exchange plus partition-local sorts:
  * exactly the cost of a write-side sort, which is what it replaces.
  */
object ZOrder {

  /** Morton code of two non-negative keys, `bits` bits each (a's bits
    * at even positions, b's at odd). Keys must fit `bits` bits — mask
    * upstream (`% (1 << bits)`) if they may not; `bits <= 31` keeps the
    * result in a positive long. */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { k =>
      shiftleft(shiftright(al, k).bitwiseAND(lit(1L)), 2 * k) +
        shiftleft(shiftright(bl, k).bitwiseAND(lit(1L)), 2 * k + 1)
    }.reduce(_ + _)
  }

  /** Physically cluster `df` by the z-order of (`colA`, `colB`):
    * attach the z-value, range-partition on it, sort within
    * partitions. Write the result with any sink to get z-clustered
    * files. */
  def clusterBy(df: DataFrame, colA: String, colB: String, bits: Int,
                numPartitions: Int, zCol: String = "zvalue"): DataFrame =
    df.withColumn(zCol, zValue(col(colA), col(colB), bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)
}
