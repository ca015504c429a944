package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X53 — HTML/markup text extraction: the step BEFORE every text gate in
  * a web-dump pipeline (strip tags/boilerplate, then run X3 quality
  * stats, X22 curation, X52 LM scoring on the extracted text). Row-local
  * by construction — a fixed chain of regex/replace expressions, zero
  * shuffle, scan-side at any scale.
  *
  * The extraction CONTRACT is the chain order (each stage feeds the
  * next, and the same chain runs in the DuckDB oracle):
  *   1. `<script ...>...</script>` blocks removed whole (their body is
  *      code, not text — including any `<` it contains);
  *   2. `<style ...>...</style>` blocks removed whole;
  *   3. `<!-- ... -->` comments removed;
  *   4. every remaining `<...>` tag replaced by a space (nesting is
  *      irrelevant once blocks are gone — tags strip independently);
  *   5. the five core entities + `&nbsp;` decoded, `&amp;` LAST so
  *      double-encoded text decodes exactly one level;
  *   6. whitespace runs collapsed to one space, ends trimmed.
  * Tag stripping runs BEFORE entity decode, so `&lt;b&gt;` stays
  * literal text — the standard behavior that keeps escaped markup
  * visible.
  *
  * Regex parity note: patterns use inline `(?is)` flags, lazy `.*?`,
  * and explicit `[ \t\r\n]` whitespace classes — the subset where Java
  * regex (Spark) and RE2 (DuckDB) agree; DuckDB additionally needs the
  * `g` flag the oracle passes.
  *
  * LINK DENSITY is the classic boilerplate heuristic (navigation/link
  * farms are mostly anchor text): extracted-anchor-text chars over
  * extracted-total chars, in integer ppm — compose with a threshold
  * filter exactly like the X3 stopword-ratio gate.
  */
object Html {

  private val Ws = "[ \\t\\r\\n]+"

  /** Stages 1-3: script/style/comment blocks removed — shared by the
    * text chain AND the anchor extraction, so content inside removed
    * blocks can never count toward link density.
    */
  private def stripBlocks(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Stages 4-6: tag strip, one-level entity decode, whitespace
    * collapse.
    */
  private def finish(c: Column): Column = {
    val noTags = regexp_replace(c, "(?s)<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(decoded, Ws, " "))
  }

  /** The six-stage extraction chain as a single column expression. */
  def extractText(html: Column): Column = finish(stripBlocks(html))

  /** All anchor bodies, space-joined, run through the SAME finishing
    * chain (anchors may nest markup/entities). Anchors are extracted
    * AFTER block removal — a `<a>` inside a script is code, not a link
    * — and the tag pattern requires whitespace before attributes
    * (`<a ...>` or bare `<a>`) so `<article>`/`<aside>`/`<abbr>` never
    * match; the body is capture group 2.
    */
  def anchorText(html: Column): Column =
    finish(concat_ws(" ", regexp_extract_all(stripBlocks(html),
      lit("(?is)<a([ \\t\\r\\n][^>]*)?>(.*?)</a>"), lit(2))))

  /** Per-document extraction: (idCol, clean_text, n_clean_chars,
    * link_density_ppm). Density is exact integer ppm (0 for empty
    * documents — no float seam anywhere).
    */
  def extract(docs: DataFrame, idCol: String, htmlCol: String): DataFrame =
    docs.select(col(idCol),
        extractText(col(htmlCol)).as("clean_text"),
        anchorText(col(htmlCol)).as("a_text"))
      .select(col(idCol), col("clean_text"),
        length(col("clean_text")).cast("long").as("n_clean_chars"),
        expr("length(a_text) * 1000000L div greatest(length(clean_text), 1)")
          .as("link_density_ppm"))
}
