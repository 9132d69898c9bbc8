package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins over event streams: as-of (point-in-time) and
  * bounded-range joins — the two lookups a feature pipeline needs that a
  * plain equi-join can't express.
  *
  * Both are built to survive 100 TB:
  *   - the as-of join is ONE shuffle (union both sides, sort within key)
  *     instead of a per-row backward probe;
  *   - the range join buckets time so candidate pairs are bounded by
  *     bucket co-residency, never a per-key cross product.
  */
object EventJoins {

  /** Point-in-time (as-of) join: for every left row, the payload of the
    * latest right row with the same key and `right.timeCol <=
    * left.timeCol` (ties across sides resolve right-before-left; ties
    * within the right side resolve by largest `tieCol`).
    *
    * Implementation: tag both sides, union, and take a running
    * `last(struct(payload), ignoreNulls)` over (key) ordered by (time,
    * side, tie). One shuffle on the key, one linear pass per key — the
    * sort-merge formulation every streaming engine uses, instead of the
    * per-left-row subquery a naive translation would run. The payload
    * rides as ONE struct (non-null for every right row), so the latest
    * right row wins atomically: its null payload fields surface as
    * null rather than being back-filled from older rows, and
    * multi-column payloads can never mix fields across rows.
    *
    * `left` keeps all its columns; `right`'s non-key, non-time, non-tie
    * columns become the attached payload.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           timeCol: String, tieCol: String): DataFrame = {
    val base = keys ++ Seq(timeCol, tieCol)
    val extras = left.columns.toSeq.filterNot(base.contains)
    val payload = right.columns.toSeq.filterNot(base.contains)
    require(payload.nonEmpty, "right side has no payload columns")
    // a payload column shadowing a left column would produce duplicate
    // output names and ambiguous downstream references (same contract
    // intervalJoin documents) — fail loudly instead
    val collisions = payload.filter(extras.contains)
    require(collisions.isEmpty,
      s"right payload columns ${collisions.mkString(", ")} collide with " +
        "left columns; alias them before the as-of join")
    val pStructR = struct(payload.map(col): _*)
    val pType = org.apache.spark.sql.types.StructType(
      payload.map(p => right.schema(p).copy(name = p)))
    val l = left.select(base.map(col) ++ Seq(lit(1).as("_side"),
      lit(null).cast(pType).as("_p")) ++ extras.map(col): _*)
    val r = right.select(base.map(col) ++ Seq(lit(0).as("_side"),
      pStructR.as("_p")) ++
      extras.map(e => lit(null).cast(left.schema(e).dataType).as(e)): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol), col("_side"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((base ++ extras).map(col) ++ Seq(col("_side"),
        last(col("_p"), ignoreNulls = true).over(w).as("_p")): _*)
      .filter(col("_side") === 1)
      .select((base ++ extras).map(col) ++
        payload.map(p => col(s"_p.$p").as(p)): _*)
  }

  /** Bounded-range aggregate join: for every probe row, `count` and an
    * exact decimal `sum(valCol)` over build rows with the same key and
    * `build.timeCol` in `(probe.timeCol - windowSec, probe.timeCol]`.
    * Probe rows with no matches are kept with count 0 / sum 0.
    *
    * The build side is bucketed by `floor(time / windowSec)`; each probe
    * row checks exactly two buckets (its own and the previous), which
    * together cover the whole window. Candidates are an equi-join on
    * (key, bucket) — the shuffle is keyed and bounded, never the per-key
    * cross product `|probe_k| × |build_k|` a raw inequality join
    * degenerates to at scale.
    */
  def rangeAgg(probe: DataFrame, build: DataFrame, keys: Seq[String],
               idCol: String, timeCol: String, windowSec: Long,
               valCol: String): DataFrame = {
    val winUs = windowSec * 1000000L
    val bucketOf = (t: Column) => floor(unix_micros(t) / winUs)
    val b = build.select(keys.map(col) ++ Seq(
      bucketOf(col(timeCol)).as("_bucket"),
      unix_micros(col(timeCol)).as("_bt"),
      col(valCol).as("_bv")): _*)
    val p = probe.select(keys.map(col) ++ Seq(col(idCol),
      unix_micros(col(timeCol)).as("_pt")): _*)
      .withColumn("_bucket",
        explode(array(floor(col("_pt") / winUs),
          floor(col("_pt") / winUs) - 1)))
    val agg = p.join(b, keys :+ "_bucket")
      .filter(col("_bt") > col("_pt") - winUs && col("_bt") <= col("_pt"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("_n"),
        sum(col("_bv").cast("decimal(18,2)")).as("_s"))
    probe.select(keys.map(col) :+ col(idCol): _*)
      .join(agg, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("_n"), lit(0L)).as("n_in_window"),
        coalesce(col("_s"), lit(0).cast("decimal(18,2)"))
          .cast("double").as("value_sum"))
  }

  /** Bounded-range PAIR join: one row per (probe, build) match with the
    * same key and `build.timeCol` in `(probe.timeCol − windowSec,
    * probe.timeCol]` — [[rangeAgg]]'s pair-producing sibling for
    * consumers that need per-match rows (multi-touch attribution,
    * exposure linking) rather than a count/sum. Identical scale shape:
    * time-bucketized equi-join on (key, bucket), two candidate buckets
    * per probe row, never a per-key cross product. Output is
    * `idCol` + the requested build `payload` columns; unmatched probe
    * rows produce nothing (attach [[rangeAgg]]'s left join when empty
    * matches must survive). */
  def rangePairs(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 idCol: String, timeCol: String, windowSec: Long,
                 payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "payload columns required")
    val reserved = keys ++ Seq(idCol, timeCol)
    val bad = payload.filter(reserved.contains)
    require(bad.isEmpty,
      s"payload columns ${bad.mkString(", ")} collide with key/id/time " +
        "columns; alias them before the range join")
    val winUs = windowSec * 1000000L
    val b = build.select(keys.map(col) ++ Seq(
      floor(unix_micros(col(timeCol)) / winUs).as("_bucket"),
      unix_micros(col(timeCol)).as("_bt")) ++ payload.map(col): _*)
    val p = probe.select(keys.map(col) ++ Seq(col(idCol),
      unix_micros(col(timeCol)).as("_pt")): _*)
      .withColumn("_bucket",
        explode(array(floor(col("_pt") / winUs),
          floor(col("_pt") / winUs) - 1)))
    p.join(b, keys :+ "_bucket")
      .filter(col("_bt") > col("_pt") - winUs && col("_bt") <= col("_pt"))
      .select(col(idCol) +: payload.map(col): _*)
  }
}
