package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema-aligned union for heterogeneous corpus ingest: sources that
  * share SOME columns (a crawl with `url`, a book scan with `isbn`, a
  * chat log with `thread_id`) union into one corpus table with every
  * column present and the gaps null-filled — by NAME, never by
  * position, so adding a column to one source cannot silently shift
  * another source's values.
  *
  * Pure plan surgery: each input gets one null-filling projection, then
  * a `unionByName` chain — no shuffle, no data movement beyond the scan
  * itself. Column order is first-seen across the inputs (deterministic
  * in the input sequence). Conflicting types for a shared name fail
  * fast at plan time rather than silently casting.
  */
object AlignUnion {

  /** Union `dfs` (≥ 1) into the widest common schema, null-filling
    * missing columns per input. */
  def unionAligned(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "nothing to union")
    val fields = scala.collection.mutable.LinkedHashMap.empty[String,
      org.apache.spark.sql.types.DataType]
    dfs.foreach(_.schema.fields.foreach { f =>
      fields.get(f.name) match {
        case None => fields.update(f.name, f.dataType)
        case Some(t) =>
          require(t == f.dataType,
            s"column '${f.name}' has conflicting types: $t vs ${f.dataType}")
      }
    })
    val all = fields.keys.toSeq
    dfs.map { df =>
      val have = df.columns.toSet
      df.select(all.map { c =>
        if (have(c)) col(c) else lit(null).cast(fields(c)).as(c)
      }: _*)
    }.reduce(_ unionByName _)
  }
}
