package graft.ops

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** HTML-to-text normalization rules, one fixture per rule, plus the
  * single-decode entity contract.
  */
class HtmlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clean(html: String*): Seq[String] =
    html.toDF("html").select(Html.toText(col("html")))
      .collect().map(_.getString(0)).toSeq

  test("tags strip to single spaces; text survives") {
    assert(clean("<html><body><p>hello world</p></body></html>") ==
      Seq("hello world"))
    assert(clean("a<br/>b<img src='x.png'>c") == Seq("a b c"))
    assert(clean("<div class=\"a\" data-x='1 > 0 is fine'>t</div>") ==
      Seq("0 is fine'>t")) // '>' inside an attr ends the tag regex: the
    // documented lite-extractor limit (a real parser is the upgrade path)
  }

  test("script and style bodies vanish wholesale, including inner tags") {
    assert(clean("a<script>var x='<p>no</p>';</script>b") == Seq("a b"))
    assert(clean("a<style>p{color:red}</style>b") == Seq("a b"))
    assert(clean("a<script type=\"m\">1</script>b<style \n>2</style>c") ==
      Seq("a b c"))
    // multiline bodies: (?s) makes . cross newlines
    assert(clean("a<script>\nline1\nline2\n</script>b") == Seq("a b"))
  }

  test("entities decode exactly once; &amp; decodes last") {
    assert(clean("x &lt;y&gt; &quot;q&quot; &#39;s &nbsp;z") ==
      Seq("x <y> \"q\" 's z"))
    // already-escaped text must NOT double-decode into live brackets
    assert(clean("&amp;lt;still&amp;gt;") == Seq("&lt;still&gt;"))
  }

  test("whitespace runs collapse; result is trimmed") {
    assert(clean("  a\t\tb\r\nc  ") == Seq("a b c"))
    assert(clean("<p>  </p>") == Seq(""))
  }

  test("normalize: lengths are consistent with the cleaned text") {
    val out = Html.normalize(
      Seq((7L, "<p>ab&nbsp;cd</p>")).toDF("doc_id", "html")).collect().head
    assert(out.getLong(0) == 7L)
    assert(out.getInt(1) == "<p>ab&nbsp;cd</p>".length)
    assert(out.getString(3) == "ab cd")
    assert(out.getInt(2) == "ab cd".length)
  }

  test("synthetic variants: every doc round-trips its text payload") {
    val docs = (0L until 8L).map(i => (i, s"payload $i words"))
      .toDF("doc_id", "text")
    val out = Html.normalize(docs.select(col("doc_id"),
      Html.syntheticHtml(col("doc_id"), col("text")).as("html")))
      .collect().sortBy(_.getLong(0))
    out.foreach { r =>
      val id = r.getLong(0)
      val cleanText = r.getString(3)
      assert(cleanText.startsWith(s"payload $id words"), s"doc $id")
      assert(!cleanText.contains("<p>") && !cleanText.contains("nope"))
      assert(!cleanText.contains("color: red"))
    }
    // variant 3 keeps its once-decoded entities as literal text
    assert(out(3).getString(3).contains("<tag> \"quoted\" 's"))
    assert(out(3).getString(3).contains("&lt;still-escaped&gt;"))
  }
}
