package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[graft.functions.CleanTextExpr]] — the fused curation clean
  * stage — byte-equal to the chained form it replaced,
  * `redactText(stripMarkupText(_))`, on adversarial inputs chosen to
  * break a WRONG fusion:
  *   - sequential-vs-alternation traps ("a@b.com1.2.3.4": the email
  *     replacement manufactures the word boundary the IPv4 pattern
  *     needs — a single-alternation pass would miss the <IP>),
  *   - gate edges (documents with/without each necessary character),
  *   - whitespace collapse/trim edges (tabs and newlines must survive;
  *     only ASCII 0x20 collapses and trims),
  *   - the planted corpus itself (every plant modulus). */
class CleanTextSpec extends SparkSpec {
  import spark.implicits._

  private def chained(c: org.apache.spark.sql.Column) =
    TextAnalysis.redactText(TextAnalysis.stripMarkupText(c))

  private def both(texts: Seq[String]): Unit = {
    graft.functions.CleanTextExpr.register(spark)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select($"doc_id",
        graft.functions.CleanTextExpr.of($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val exp = df.select($"doc_id", chained($"text").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.indices.foreach { i =>
      assert(got(i.toLong) == exp(i.toLong),
        s"row $i: fused [${got(i.toLong)}] != chained [${exp(i.toLong)}] " +
          s"for input [${texts(i)}]")
    }
  }

  test("fused clean == chained clean on adversarial strings") {
    both(Seq(
      "",
      " ",
      "   ",
      "plain words only",
      "  leading and trailing  ",
      "tabs\tand\nnewlines \t stay",
      // markup
      "<!-- c --><b>x</b>",
      "<!-- keeps -- inside --> tail",
      "<a<!--x-->b>",                       // comment inside broken tag
      "<div class=\"doc\"><p>t</p></div>",
      "bare < not a tag",
      "a <b> c &lt;d&gt; &amp;lt; &quot;q&quot; &#39;s&#39; &nbsp;!",
      "&amp;lt; decodes to literal &lt;",   // &amp; LAST convention
      // pii
      "contact user7@example.com now",
      "a@b.com1.2.3.4",                     // replacement-made \b for IPv4
      "+1-415-555-0042@x.yy",               // phone chars inside email
      "ip 10.2.0.3 and 999.999.999.999 and 1.2.3",
      "call +1-415-555-0042 or +12-333-444-5555",
      "x1.2.3.4 no left boundary? digits4.3.2.1x",
      "me@ex.com 10.0.0.1 +1-222-333-4444 all three",
      // collapse interplay: tag strip creates double spaces
      "a <br/> b",
      "<p>x</p><p>y</p>"))
  }

  test("fused clean == chained clean on the planted corpus") {
    graft.functions.CleanTextExpr.register(spark)
    val base = (0L until 700L).map(i => (i, s"doc $i body words here"))
      .toDF("doc_id", "text")
    val planted = Curation.withPlantedEverything(base, "text", "doc_id")
    val n = planted.select(
        graft.functions.CleanTextExpr.of($"text").as("a"),
        chained($"text").as("b"))
      .filter($"a" =!= $"b" || $"a".isNull =!= $"b".isNull)
      .count()
    assert(n == 0L, s"$n planted rows diverge between fused and chained")
  }

  test("null in, null out") {
    graft.functions.CleanTextExpr.register(spark)
    val df = Seq((1L, null: String), (2L, "ok")).toDF("doc_id", "text")
    val rows = df.select(graft.functions.CleanTextExpr.of($"text").as("c"))
      .collect()
    assert(rows.map(r => Option(r.getString(0))).toSet ==
      Set(None, Some("ok")))
  }
}
