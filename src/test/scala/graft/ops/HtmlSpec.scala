package graft.ops

import graft.SparkSpec

/** X53 extraction invariants beyond the DuckDB oracle: nested tags,
  * script/style/comment removal, entity decoding (including the
  * one-level rule for double-encoded text), attribute-bearing anchors,
  * and the link-density arithmetic.
  */
class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (String, Long, Long) =
    Html.extract(Seq((1L, html)).toDF("doc_id", "h"), "doc_id", "h")
      .as[(Long, String, Long, Long)].head() match {
      case (_, t, n, d) => (t, n, d)
    }

  test("nested tags strip independently; text order is preserved") {
    val (t, n, _) = extract("<div><p>alpha <b>beta</b></p><p>gamma</p></div>")
    assert(t === "alpha beta gamma")
    assert(n === t.length.toLong)
  }

  test("script and style bodies vanish whole, including embedded angle brackets") {
    val (t, _, _) = extract(
      "<style>p > a { color: red; }</style>before" +
        "<script>if (a < b && c > d) { emit('<fake>'); }</script>after")
    assert(t === "before after")
  }

  test("comments are removed; escaped markup stays literal text") {
    val (t, _, _) = extract("a<!-- hidden <b>bold</b> -->b &lt;i&gt;kept&lt;/i&gt;")
    assert(t === "a b <i>kept</i>")
  }

  test("entities decode exactly one level: double-encoded stays encoded once") {
    val (t, _, _) = extract("&quot;q&quot; &#39;s&#39; &amp;amp; &amp; x&nbsp;y")
    assert(t === "\"q\" 's' &amp; & x y")
  }

  test("link density: anchor text chars over total chars in exact ppm") {
    // total extracted = "menu home about content" (23 chars);
    // anchor extracted = "home about" (10 chars) -> 10*10^6 div 23
    val (t, n, d) = extract(
      "<p>menu <a href=\"/\">home</a> <a class=\"x\">about</a> content</p>")
    assert(t === "menu home about content")
    assert(n === 23L)
    assert(d === 10L * 1000000L / 23L)
  }

  test("a-prefixed tags are not anchors; scripted anchors never count") {
    // <article>/<abbr> must not match the anchor pattern; a bare <a>
    // (no attributes) must; an <a> inside a removed script block is
    // code, not a link
    val (t, n, d) = extract(
      "<article>long body text here</article>" +
        "<script>x('<a href=\"/\">nav nav nav nav</a>')</script>" +
        "<abbr>KN</abbr> <a>hi</a>")
    assert(t === "long body text here KN hi")
    assert(n === t.length.toLong)
    // anchor text is exactly "hi" (2 chars) of the 25 total
    assert(d === 2L * 1000000L / n)
  }

  test("empty and markup-only documents yield empty text and zero density") {
    val (t, n, d) = extract("<div><script>x()</script><!-- nothing --></div>")
    assert(t === "")
    assert(n === 0L)
    assert(d === 0L)
  }
}
