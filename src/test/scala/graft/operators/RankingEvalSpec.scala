package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** nDCG/MRR against hand-computed values, and the k-anonymity filter. */
class RankingEvalSpec extends SparkSpec {
  import spark.implicits._

  test("perfect ordering scores ndcg=1; reversed ordering scores lower") {
    val perfect = Seq((1L, 1L, 3), (1L, 2L, 2), (1L, 3L, 1))
      .toDF("qid", "rank", "rel")
    val p = RankingEval.perQuery(perfect, "qid", "rank", "rel", 3).first()
    assert(math.abs(p.getAs[Double]("ndcg") - 1.0) < 1e-6)
    assert(math.abs(p.getAs[Double]("rr") - 1.0) < 1e-6)

    val reversed = Seq((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3))
      .toDF("qid", "rank", "rel")
    val r = RankingEval.perQuery(reversed, "qid", "rank", "rel", 3).first()
    // dcg = 1/1 + 3/log2(3) + 7/2 ; idcg = 7/1 + 3/log2(3) + 1/2
    val dcg = 1.0 + 3.0 / (math.log(3.0) / math.log(2.0)) + 3.5
    val idcg = 7.0 + 3.0 / (math.log(3.0) / math.log(2.0)) + 0.5
    assert(math.abs(r.getAs[Double]("ndcg") - dcg / idcg) < 1e-4)
    // first rel>=3 hit at rank 3
    assert(math.abs(r.getAs[Double]("rr") - 1.0 / 3) < 1e-6)
  }

  test("query with no relevant hit gets rr=0; all-zero grades get ndcg=0") {
    val df = Seq((1L, 1L, 0), (1L, 2L, 0)).toDF("qid", "rank", "rel")
    val r = RankingEval.perQuery(df, "qid", "rank", "rel", 1).first()
    assert(r.getAs[Double]("rr") == 0.0)
    assert(r.getAs[Double]("ndcg") == 0.0) // idcg=0 guard
  }

  test("kAnonymity reports exactly the under-k combinations") {
    val df = (Seq.fill(30)(("US", "A")) ++ Seq.fill(3)(("US", "B")) ++
      Seq.fill(24)(("DE", "A"))).toDF("country", "seg")
    val risk = Checks.kAnonymity(df, Seq("country", "seg"), 25)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(risk.toSet == Set(("US", "B", 3L), ("DE", "A", 24L)))
  }
}
