package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private def flags(text: String,
                    minWords: Int = 5): Map[String, Any] = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val r = QualityRules.gopherRules(df, minWords = minWords).head()
    r.schema.fieldNames.zip(r.toSeq).toMap
  }

  test("hand-computed verdicts per rule") {
    // 6 words, mean len 22/6≈3.67, all bigrams distinct, 2 stopwords
    val good = flags("the cat sat under a table")
    assert(good("n_words") == 6L)
    assert(good("r_word_count") == true && good("r_mean_word_len") == true)
    assert(good("r_dup_bigram") == true && good("r_stopwords") == true)
    assert(good("keep") == true)

    // too short
    assert(flags("tiny doc")("keep") == false)

    // repeated bigram: "x y x y x y ..." → dup fraction well over 0.2
    val rep = flags("the a " + Seq.fill(20)("x y").mkString(" "))
    assert(rep("r_dup_bigram") == false && rep("keep") == false)

    // only one stopword present
    val oneStop = flags("the quick brown fox jumps over lazy dogs")
    assert(oneStop("r_stopwords") == false)
  }

  test("mean-word-length bounds reject symbol salad and run-on tokens") {
    assert(flags("x y z w v u q r s t")("r_mean_word_len") == false)
    val longToks = Seq.fill(8)("pneumonoultramicroscopic").mkString(" ")
    assert(flags(longToks)("r_mean_word_len") == false)
  }

  test("empty and sub-bigram docs are well-defined") {
    val e = flags("", minWords = 0)
    assert(e("n_words") == 0L && e("r_dup_bigram") == true)
    assert(e("r_stopwords") == false)
    val one = flags("word", minWords = 0)
    assert(one("r_dup_bigram") == true)
  }

  test("filterByRules keeps the original schema and only keep=true rows") {
    val df = Seq(
      (1L, "the cat sat under a table near the window today"),
      (2L, "x")).toDF("doc_id", "text")
    val kept = QualityRules.filterByRules(df, minWords = 5)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("zero shuffles in the plan") {
    val df = Seq((1L, "the a of data rows")).toDF("doc_id", "text")
    val plan = QualityRules.gopherRules(df).queryExecution
      .executedPlan.toString
    assert(!plan.contains("Exchange"))
  }
}
