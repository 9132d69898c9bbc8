package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality verification (the Deequ-style contract
  * check a 100 TB ingest runs before publishing a table).
  *
  * All row-local rules (nullability, ranges, set membership, custom
  * predicates) are evaluated in ONE aggregate pass — a single scan
  * however many rules are declared, each rule one conditional-sum
  * column, fully codegen'd with map-side partials. Multi-row rules get
  * the cheapest distributed shape that is still exact: uniqueness is a
  * count-distinct-vs-count delta (two exact aggregates, no join);
  * referential integrity is an anti-join count against the referenced
  * keys. Output is one row per rule: (rule, n_rows, n_violations,
  * passed) — integer-exact, so the report hashes identically on any
  * engine.
  */
object Checks {

  /** A named row-local constraint: `violated` must be true exactly on
    * the rows that break the rule (null-safe — write the predicate so
    * NULL input yields an explicit true/false, e.g. via coalesce). */
  final case class Rule(name: String, violated: Column)

  def notNull(c: String): Rule =
    Rule(s"not_null_$c", col(c).isNull)

  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c",
      coalesce(!(col(c) >= lo && col(c) <= hi), lit(true)))

  def inSet(c: String, values: Seq[String]): Rule =
    Rule(s"in_set_$c", coalesce(!col(c).isInCollection(values), lit(true)))

  /** Evaluate all row-local `rules` in one scan of `df`. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules declared")
    val aggs = count(lit(1)).as("_n") +: rules.map(r =>
      sum(when(r.violated, 1L).otherwise(0L)).as(s"_v_${r.name}"))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.map(r =>
        struct(lit(r.name).as("rule"),
          col("_n").as("n_rows"),
          col(s"_v_${r.name}").as("n_violations"))): _*)).as("r"))
      .select(col("r.rule"), col("r.n_rows"), col("r.n_violations"),
        (col("r.n_violations") === 0L).as("passed"))
  }

  /** Uniqueness of a key tuple: violations = rows beyond the first of
    * each duplicated key (n − distinct n). Two exact aggregates — the
    * count-distinct expands to a two-stage hash agg, never a window. */
  def unique(df: DataFrame, keyCols: Seq[String], name: String): DataFrame = {
    df.agg(count(lit(1)).as("n_rows"),
      (count(lit(1)) -
        count_distinct(struct(keyCols.map(col): _*))).as("n_violations"))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** Referential integrity: rows of `df` whose `keyCols` tuple has no
    * match in `ref`'s `refCols`. Null keys count as violations (they
    * reference nothing). The referenced side is reduced to its DISTINCT
    * keys before the anti join, so the probe is against a key table,
    * not the full dimension. */
  def foreignKey(df: DataFrame, keyCols: Seq[String], ref: DataFrame,
                 refCols: Seq[String], name: String): DataFrame = {
    val refKeys = ref.select(refCols.zip(keyCols).map { case (rc, kc) =>
      col(rc).as(kc)
    }: _*).distinct()
    val orphans = df.select(keyCols.map(col): _*)
      .join(refKeys, keyCols, "left_anti")
    val n = df.agg(count(lit(1)).as("n_rows"))
    orphans.agg(count(lit(1)).as("n_violations")).crossJoin(broadcast(n))
      .select(lit(name).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))
  }

  /** A full verification suite: one-pass row-local rules plus any
    * multi-row checks, unioned into a single (rule, n_rows,
    * n_violations, passed) report. */
  def suite(rowLocal: DataFrame, rules: Seq[Rule],
            multiRow: Seq[DataFrame]): DataFrame =
    multiRow.foldLeft(check(rowLocal, rules))(_.unionByName(_))

  /** k-anonymity audit over a quasi-identifier tuple: every combination
    * held by fewer than `k` rows is a re-identification risk. One hash
    * aggregate over the QI domain; the at-risk report it returns is the
    * input to either suppression or generalization. */
  def kAnonymity(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .filter(col("n") < k)
}
