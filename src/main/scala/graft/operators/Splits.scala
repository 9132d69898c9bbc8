package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment.
  *
  * Splitting by `rand()` is partitioning-dependent in Spark (a retry or a
  * different executor count reshuffles the split); splitting by a hash of
  * the row's stable id is reproducible across recomputations, cluster
  * sizes, and engines, and costs a single codegen'd projection — no
  * shuffle, no state. The same row always lands in the same split, which
  * is also what makes incremental corpus refreshes safe: new data joins a
  * split without moving old data between splits.
  */
object Splits {

  /** Split label from cumulative hash-fraction thresholds.
    * `fractions` maps label → mass; masses must sum to ~1. The hash is
    * salted with `salt` so independent splits of the same table
    * decorrelate. */
  def assign(idCol: Column, fractions: Seq[(String, Double)],
             salt: String = "split"): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val f = DownSampling.hashFraction(Seq(lit(salt), idCol))
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.zip(cum).init.foldRight(lit(fractions.last._1)) {
      case (((label, _), hi), other) => when(f < hi, label).otherwise(other)
    }
  }

  /** Attach a `split` column. */
  def withSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)],
                salt: String = "split"): DataFrame =
    df.withColumn("split", assign(col(idCol), fractions, salt))
}
