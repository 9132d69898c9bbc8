package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MapType

/** Row → GAME-datum projection (P1, reference GameConverters.scala:
  * 44-131 + InputColumnsNames.scala:25-80): configurable input column
  * names for response/offset/weight/uid, defaulted offset/weight when
  * absent, and random-effect id tags resolved from a dedicated column
  * OR the metadataMap fallback — `coalesce(col(tag),
  * metadataMap[tag])`, exactly the reference's getGameDatumFromRow
  * lookup order.
  */
case class InputColumnsNames(response: String = "response",
                             offset: String = "offset",
                             weight: String = "weight",
                             uid: String = "uid",
                             metadataMap: String = "metadataMap")

object GameConverters {

  /** Project a raw read into the canonical GAME input: uid, label,
    * offset, weight, the feature-shard columns untouched, and one string
    * column per id tag. Missing offset/weight columns default to 0/1;
    * id tags fall back to metadataMap[tag] when the column is absent or
    * null. */
  def toGameInput(df: DataFrame, cols: InputColumnsNames,
                  shardCols: Seq[String], idTags: Seq[String]): DataFrame = {
    def has(c: String) = df.columns.contains(c)
    val hasMeta = has(cols.metadataMap) &&
      df.schema(cols.metadataMap).dataType.isInstanceOf[MapType]

    def idTag(tag: String): Column = {
      val fromCol = if (has(tag)) Some(col(tag).cast("string")) else None
      val fromMeta =
        if (hasMeta) Some(element_at(col(cols.metadataMap), tag)) else None
      (fromCol.toSeq ++ fromMeta.toSeq) match {
        case Seq(a, b) => coalesce(a, b).as(tag)
        case Seq(a) => a.as(tag)
        case _ => throw new IllegalArgumentException(
          s"id tag '$tag' has neither a column nor a metadataMap entry")
      }
    }

    val offset =
      if (has(cols.offset)) col(cols.offset).cast("double") else lit(0.0)
    val weight =
      if (has(cols.weight)) coalesce(col(cols.weight).cast("double"),
        lit(1.0))
      else lit(1.0)
    df.select(Seq(
      col(cols.uid).cast("long").as("uid"),
      col(cols.response).cast("double").as("label"),
      offset.as("offset"), weight.as("weight"))
      ++ shardCols.map(col) ++ idTags.map(idTag): _*)
  }
}
