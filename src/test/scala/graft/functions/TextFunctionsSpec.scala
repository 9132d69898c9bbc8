package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed cases for the repetition quality signals (the rest of
  * TextFunctions is gated by the q21-q25 oracle hash compares). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def signals(text: String): (Double, Double, Double) = {
    val r = Seq(text).toDF("text").select(
      TextFunctions.duplicateNgramFraction(col("text"), 1).as("dup"),
      TextFunctions.topNgramFraction(col("text"), 1).as("top1"),
      TextFunctions.topNgramFraction(col("text"), 2).as("top2"))
      .collect().head
    (r.getDouble(0), r.getDouble(1), r.getDouble(2))
  }

  test("repetition signals match hand computation") {
    // "a b a c a": 5 tokens, 3 distinct -> dup 0.4; 'a' 3/5; bigrams
    // (a b)(b a)(a c)(c a) all distinct -> 1/4
    assert(signals("a b a c a") == (0.4, 0.6, 0.25))
    // all-same doc: maximal repetition, bigram "x x" covers everything
    assert(signals("x x x x") == (0.75, 1.0, 1.0))
    // no repetition at all (3 distinct bigrams from 4 tokens)
    assert(signals("p q r s") == (0.0, 0.25, 1.0 / 3.0))
  }

  test("repetition signals degrade to zero on empty and tiny docs") {
    assert(signals("") == (0.0, 0.0, 0.0))
    assert(signals("   ") == (0.0, 0.0, 0.0))
    // one token: no bigrams, top unigram is the whole doc
    assert(signals("solo") == (0.0, 1.0, 0.0))
  }

  test("native TokenCount matches size(split(trim)) on edge cases") {
    import spark.implicits._
    val cases = Seq("", " ", "  ", "a", " a ", "a b", "  a  b  ",
      "a\tb", "\ta b", "a b\t", "\t", "a\t", "\ta", "a\nb\nc",
      "héllo wörld", "多字节 字符 测试", "a  \t  b", "x\r\ny",
      "one two three four five")
    val df = cases.toDF("s").repartition(3)
    val both = df.select(
      TextFunctions.tokenCount(col("s")).as("native"),
      size(when(length(trim(col("s"))) === 0,
        array().cast("array<string>"))
        .otherwise(split(trim(col("s")), "\\s+"))).as("reference"),
      col("s"))
    val bad = both.filter(col("native") =!= col("reference")).collect()
    assert(bad.isEmpty,
      bad.map(r => s"'${r.getString(2)}': native=${r.getInt(0)} " +
        s"ref=${r.getInt(1)}").mkString("; "))
    // random fuzz: whitespace-heavy strings
    val rnd = new scala.util.Random(3)
    val alphabet = "ab \t\n\r\fé中"
    val fuzz = (1 to 500).map(_ => (1 to rnd.nextInt(20)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString).toDF("s")
    val fb = fuzz.select(
      TextFunctions.tokenCount(col("s")).as("native"),
      size(when(length(trim(col("s"))) === 0,
        array().cast("array<string>"))
        .otherwise(split(trim(col("s")), "\\s+"))).as("reference"),
      col("s")).filter(col("native") =!= col("reference")).collect()
    assert(fb.isEmpty, fb.take(5).map(r =>
      s"'${r.getString(2)}': ${r.getInt(0)} vs ${r.getInt(1)}")
      .mkString("; "))
  }

  test("stripHtml drops script/style with content, tags, decodes entities") {
    import spark.implicits._
    val html = "<html><head><style>p{color:red}</style></head><body>" +
      "<h1>A &amp; B</h1>\n<p class='x'>keep &lt;this&gt; text</p>" +
      "<script>\nvar s = '<p>not text</p>';\n</script>" +
      "&quot;q&quot;&#39;a&#39;&nbsp;end</body></html>"
    val got = Seq(html).toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).as[String].head()
    assert(got == "A & B keep <this> text \"q\"'a' end", s"got: '$got'")
  }

  test("stripHtml is the identity modulo whitespace on plain text") {
    import spark.implicits._
    val got = Seq("  plain   text,  no markup  ").toDF("h")
      .select(TextFunctions.stripHtml(col("h"))).as[String].head()
    assert(got == "plain text, no markup")
  }
}
