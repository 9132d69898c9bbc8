package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string matching for record linkage / fuzzy dedup. */
object RecordLinkage {

  /** Pairs of rows whose normalized `textCol` values are within
    * Levenshtein distance `maxDist`, via FastSS deletion-neighborhood
    * blocking (Bocek et al., 2007): every string emits the variants
    * reachable by deleting up to `maxDist` characters; two strings
    * within distance d always share at least one variant, so candidate
    * generation is an EQUI-join on variant keys — never an all-pairs
    * cross product and never a length-band scan. Shared variants can
    * produce false positives, so every candidate pair is verified with
    * the codegen'd `levenshtein` before it is emitted.
    *
    * Scale shape: keys per string are ~C(len, maxDist) (len+1 at
    * maxDist = 1 — keep maxDist ≤ 2); the key join shuffles (key, id)
    * pairs and Σ bucket² is bounded by `maxKeyBucket` — a variant
    * shared by more rows than the cap is dropped, the [[Dedup]]
    * hot-bucket convention (exact-duplicate explosions belong to
    * [[Dedup.exact]], not here).
    *
    * Output: `(id_a, id_b, dist)` with `id_a < id_b`, one row per
    * pair, `dist ≤ maxDist`. Normalization is lower(trim(.)). */
  def fuzzyPairs(df: DataFrame, idCol: String, textCol: String,
                 maxDist: Int = 1,
                 maxKeyBucket: Long = 100000L): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3, "maxDist must be in [1, 3]")
    val t = df.select(col(idCol).as("_id"),
      lower(trim(col(textCol))).as("_t"))
    val delKeys = udf { (s: String) =>
      var cur = Set(s)
      var all = Set(s)
      for (_ <- 1 to maxDist) {
        cur = cur.flatMap(x =>
          (0 until x.length).map(i => x.substring(0, i) + x.substring(i + 1)))
        all = all ++ cur
      }
      all.toSeq.sorted
    }
    val keys = t.select(col("_id"), col("_t"),
      explode(delKeys(col("_t"))).as("_k"))
    val guarded = keys.join(
      keys.groupBy("_k").agg(count(lit(1)).as("_n")), "_k")
      .filter(col("_n") <= maxKeyBucket).drop("_n")
    val cand = guarded.as("a").join(guarded.as("b"),
        col("a._k") === col("b._k") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id_a"), col("b._id").as("id_b"),
        col("a._t").as("_ta"), col("b._t").as("_tb"))
      .distinct()
    cand.select(col("id_a"), col("id_b"),
        levenshtein(col("_ta"), col("_tb")).as("dist"))
      .filter(col("dist") <= maxDist)
  }

  /** One field-comparison rule for [[scorePairs]]: `agree` compares the
    * two sides' values of `field`; a NULL comparison counts as
    * disagreement (coalesced — a missing value supports no link). The
    * weights are the caller's log-odds (Fellegi-Sunter m/u terms);
    * exact-in-binary constants (.0, .5, .25) keep the summed score
    * bit-identical across engines. */
  final case class FieldRule(field: String,
                             agree: (Column, Column) => Column,
                             wAgree: Double, wDisagree: Double)

  object FieldRule {
    def equality(field: String, wAgree: Double, wDisagree: Double): FieldRule =
      FieldRule(field, _ === _, wAgree, wDisagree)
    def within(field: String, tol: Double, wAgree: Double,
               wDisagree: Double): FieldRule =
      FieldRule(field, (a, b) => abs(a - b) <= tol, wAgree, wDisagree)
  }

  /** Fellegi-Sunter-style linkage scoring over candidate `pairs`
    * (e.g. from [[fuzzyPairs]]' blocking): attach each side's entity
    * attributes with two equi-joins on `idCol`, then score every rule
    * as one codegen'd conditional — agree → `wAgree`, disagree/NULL →
    * `wDisagree` — summed in declaration order (fixed IEEE order, so
    * the score reproduces anywhere).
    *
    * Scale shape: candidate pairs are already blocked (never all
    * pairs); the two attribute joins are plain equi-joins a 100 TB
    * entity table handles as ordinary shuffle or broadcast joins, and
    * scoring adds no shuffle at all. Output: all `pairs` columns, one
    * `agree_<field>` flag per rule, and `score`. */
  def scorePairs(pairs: DataFrame, idA: String, idB: String,
                 entities: DataFrame, idCol: String,
                 rules: Seq[FieldRule]): DataFrame = {
    require(rules.nonEmpty, "no field rules declared")
    // the output adds `score` and one `agree_<field>` per rule; a pairs
    // column with one of those names would be silently shadowed
    val added = "score" +: rules.map(r => s"agree_${r.field}")
    val collisions = pairs.columns.toSet.intersect(added.toSet)
    require(collisions.isEmpty,
      s"pairs columns collide with scoring output: ${collisions.mkString(",")}")
    val fields = (idCol +: rules.map(_.field)).distinct
    def side(prefix: String) = entities
      .select(fields.map(f => col(f).as(prefix + f)): _*)
    val joined = pairs
      .join(side("_a_"), col(idA) === col(s"_a_$idCol"))
      .join(side("_b_"), col(idB) === col(s"_b_$idCol"))
    val flags = rules.map(r => coalesce(
      r.agree(col(s"_a_${r.field}"), col(s"_b_${r.field}")), lit(false))
      .as(s"agree_${r.field}"))
    val score = rules.map(r =>
      when(col(s"agree_${r.field}"), lit(r.wAgree))
        .otherwise(lit(r.wDisagree))).reduce(_ + _)
    joined
      .select(pairs.columns.map(col) ++ flags: _*)
      .withColumn("score", score)
  }
}
