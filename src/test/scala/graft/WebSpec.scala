package graft

import graft.llm.Web
import org.apache.spark.sql.functions._

/** Web-corpus ops: HTML extraction (script/style/comment removal, entity
  * decode order, link counting) and URL canonicalization (tracking-param
  * stripping, fragment drop, registered-domain extraction). All cases run
  * through the DataFrame codegen path, not expression eval.
  */
class WebSpec extends SparkSpec {
  import spark.implicits._

  private def textOf(html: String): String =
    Seq(html).toDF("h").select(Web.htmlText(col("h"))).as[String].head()

  test("htmlText strips script/style/comments incl. uppercase and multiline") {
    val html =
      """<html><head><SCRIPT type="x">
        |var a = 1 < 2 && "</div>";
        |</SCRIPT><style>
        |p { color: red }
        |</style></head><body><!-- a
        |multiline comment --><p>Hello
        |   world</p></body></html>""".stripMargin
    assert(textOf(html) == "Hello world")
  }

  test("htmlText decodes entities once, amp last") {
    assert(textOf("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>")
      == "a & b <tag> \"q\" 's'")
    // &amp;lt; is the ESCAPED string "&lt;" — must NOT double-decode to "<"
    assert(textOf("<p>&amp;lt;</p>") == "&lt;")
    assert(textOf("<p>a&nbsp;b</p>") == "a b")
  }

  test("linkCount matches anchors only at a word boundary") {
    val df = Seq("<a href=x>l</a> <A HREF=y>u</A> <a> <abbr>not</abbr>").toDF("h")
    assert(df.select(Web.linkCount(col("h"))).as[Long].head() == 3L)
  }

  test("linkDensity is links per extracted word; both arg forms agree") {
    // 2 anchors, extracted text = "one two three four" (4 words) -> 0.5
    val html = "<p>one <a href=x>two</a> three</p><a href=y>four</a>"
    val df = Seq(html).toDF("h").withColumn("t", Web.htmlText(col("h")))
    val one = df.select(Web.linkDensity(col("h"))).as[Double].head()
    val two = df.select(Web.linkDensity(col("h"), col("t"))).as[Double].head()
    assert(one == 0.5 && two == 0.5)
    // empty extraction guards the denominator at 1
    val empty = Seq("<a href=x></a>").toDF("h")
      .select(Web.linkDensity(col("h"))).as[Double].head()
    assert(empty == 1.0)
  }

  private def canon(url: String): String =
    Seq(url).toDF("u").select(Web.canonicalUrl(col("u"))).as[String].head()

  test("canonicalUrl strips tracking params, keeps order, drops fragment") {
    assert(canon("https://www.ex.org/a/b.html?utm_source=f&id=7&ref=m&x=1#frag")
      == "https://www.ex.org/a/b.html?id=7&x=1")
    assert(canon("http://ex.org/p?utm_a=1&gclid=2&fbclid=3") == "http://ex.org/p")
    assert(canon("https://ex.org/p") == "https://ex.org/p")
  }

  test("registeredDomain is the last two host labels") {
    val d = Seq("https://a.b.src0.net/x", "https://ex.org/").toDF("u")
      .select(Web.registeredDomain(col("u"))).as[String].collect()
    assert(d.toSeq == Seq("src0.net", "ex.org"))
  }
}
