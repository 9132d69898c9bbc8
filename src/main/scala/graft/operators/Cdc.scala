package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture snapshot: collapse a changelog of upserts and
  * deletes into the current state of the keyed table.
  *
  * The entire resolution is ONE aggregate — `max(struct(version,
  * payload))` per key — so partial aggregation runs map-side and the
  * shuffle carries one candidate row per (partition, key), never the
  * full change history. (Spark plans struct-max as a SortAggregate —
  * the buffer isn't hash-aggregable — but the sort is per-partition by
  * group key with partials before the exchange, so the scale shape is
  * the same.) The alternative formulation (row_number window over the
  * changelog) shuffles and sorts every change of a hot key into one
  * task; at 100 TB of changelog with skewed keys that window is the
  * bottleneck, while the agg's map-side combine keeps hot keys bounded.
  *
  * Determinism: the caller's `versionCols` must be a total order per key
  * (e.g. ts + a unique change id). Struct comparison is lexicographic by
  * field position, which is exactly last-writer-wins on (version...).
  */
object Cdc {

  /** Latest surviving row per key.
    *
    * @param changelog   the change stream
    * @param keyCols     primary key of the target table
    * @param versionCols total per-key order, earliest→latest (e.g. ts,
    *                    change id); the largest tuple wins
    * @param opCol       column naming the operation of each change
    * @param deleteOps   op values that delete the key; a key whose
    *                    LATEST change is a delete is dropped from the
    *                    snapshot
    * @return one row per live key: keyCols, n_changes, then the payload
    *         (all non-key, non-version columns) of the winning change
    */
  def snapshot(changelog: DataFrame, keyCols: Seq[String],
               versionCols: Seq[String], opCol: String,
               deleteOps: Seq[String]): DataFrame = {
    val payload = changelog.columns.toSeq
      .filterNot(c => keyCols.contains(c) || versionCols.contains(c))
    require(payload.contains(opCol), s"opCol $opCol must be a payload column")
    // version first so struct max = last writer; payload rides along and
    // is recovered atomically from the single winning struct
    val packed = struct(
      (versionCols.map(col) ++ payload.map(col)): _*)
    changelog
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_changes"), max(packed).as("_w"))
      .filter(!col(s"_w.$opCol").isin(deleteOps: _*))
      .select(keyCols.map(col) ++ Seq(col("n_changes")) ++
        versionCols.map(v => col(s"_w.$v").as(v)) ++
        payload.map(p => col(s"_w.$p").as(p)): _*)
  }
}
