package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff between two snapshots of a table — the audit step of
  * dataset versioning: which examples did this corpus refresh add,
  * remove, or silently rewrite?
  *
  * Each side is reduced map-side to (id, content fingerprint) before the
  * single full-outer shuffle join, so the shuffle carries 8-byte keys
  * plus 16-byte hashes regardless of how wide the compared rows are —
  * the same reduce-then-join shape as [[Dedup]]'s exact pass. Statuses
  * depend only on fingerprint EQUALITY, which any engine reproduces as
  * long as its fingerprint is injective on the compared values, so the
  * result is robust to cross-engine formatting differences by
  * construction.
  *
  * Nulls are tagged before hashing (`concat_ws` drops nulls, which
  * would make (null, "x") collide with ("x",)); the tag byte U+0002
  * must therefore not appear in data values — a safe assumption for
  * the text/numeric columns this is meant for.
  */
object SnapshotDiff {

  /** Diff `current` against `base` keyed by `idCol`, comparing
    * `compareCols`. Returns (idCol, status) with status ∈
    * added | removed | changed (+ unchanged when `includeUnchanged`).
    * `idCol` must be unique within each snapshot. */
  def diff(base: DataFrame, current: DataFrame, idCol: String,
           compareCols: Seq[String],
           includeUnchanged: Boolean = false): DataFrame = {
    require(compareCols.nonEmpty, "no columns to compare")
    def fp(df: DataFrame) = md5(concat_ws("\u0001",
      compareCols.map(c =>
        coalesce(col(c).cast("string"), lit("\u0002"))): _*))
    val b = base.select(col(idCol).as("_id"), fp(base).as("_fb"))
    val c = current.select(col(idCol).as("_id"), fp(current).as("_fc"))
    val j = b.join(c, Seq("_id"), "full_outer")
      .select(col("_id").as(idCol),
        when(col("_fb").isNull, "added")
          .when(col("_fc").isNull, "removed")
          .when(col("_fb") =!= col("_fc"), "changed")
          .otherwise("unchanged").as("status"))
    if (includeUnchanged) j else j.filter(col("status") =!= "unchanged")
  }
}
