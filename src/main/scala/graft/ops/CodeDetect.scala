package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X72 — heuristic CODE-vs-PROSE detection: the routing gate a mixed
  * web crawl needs before language-specific processing (code goes to
  * the code pipeline, prose to the text one — the StarCoder/Pile corpora
  * split here first). No trained model: four integer-ppm surface
  * signals any engine reproduces bit-exactly, and a ≥2-of-4 vote — the
  * same published-threshold-conjunction discipline as [[Gopher]], with
  * the thresholds ours (documented constants, not paper claims).
  *
  * Signals (all ppm, integer division):
  *  - `sym_ppm`: chars from `{}();=[]<>` over all page chars — C-family
  *    syntax density.
  *  - `kw_ppm`: words that are reserved words (a fixed 22-word lexicon
  *    across the mainstream languages) over all words.
  *  - `indent_ppm`: lines starting with two spaces or a tab over all
  *    lines — block structure.
  *  - `punctline_ppm`: lines whose last char is `;`, `{` or `}` over
  *    all lines — statement endings.
  *
  * SHAPE AT 100 TB: every signal is a fold or filter over one row's
  * line/word arrays — lambdas touch only the bound element (never an
  * index probe into a computed array, the [[Gopher]] lesson), ZERO
  * shuffle, scan-side verdict. The DuckDB oracle replays each signal
  * relationally (explode → per-line/word booleans → group back).
  *
  * Output: doc_id, the four signals, n_lines, n_words, is_code.
  */
object CodeDetect {

  /** C-family syntax characters counted by `sym_ppm`. */
  val SymbolChars = "{}();=[]<>"

  /** Reserved words across mainstream languages (lowercase match). */
  val Keywords: Seq[String] = Seq(
    "def", "class", "import", "return", "function", "var", "let",
    "const", "if", "else", "for", "while", "int", "void", "public",
    "static", "new", "null", "true", "false", "struct", "fn")

  /** Vote thresholds (ours, documented): a signal fires at >= its
    * threshold; the page is code iff >= [[MinVotes]] signals fire.
    */
  val SymMinPpm = 30000L       // 3% syntax chars
  val KwMinPpm = 80000L        // 8% reserved words
  val IndentMinPpm = 200000L   // 20% indented lines
  val PunctLineMinPpm = 300000L // 30% statement-ended lines
  val MinVotes = 2

  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** The four signals + verdict for one page Column, as (name, Column)
    * pairs — shared by [[detect]] and the composed-pipeline form.
    */
  private def signalCols(page: Column): Seq[(String, Column)] = {
    val lines = split(page, "\n")
    val words = filter(split(translate(page, "\n", " "), " "),
      w => length(w) > 0)
    val nChars = length(page).cast("long")
    val nLines = size(lines).cast("long")
    val nWords = size(words).cast("long")
    val symChars = (nChars -
      length(translate(page, SymbolChars, ""))).cast("long")
    // one array_contains probe per word, not a 22-term OR chain — the
    // filter lambda is interpreted per element, so node count matters
    val kwWords = size(filter(words,
      w => array_contains(lit(Keywords.toArray), lower(w)))).cast("long")
    val indentLines = size(filter(lines,
      l => l.startsWith("  ") || l.startsWith("\t"))).cast("long")
    val punctLines = size(filter(lines, l =>
      Seq(";", "{", "}").map(p => l.endsWith(p)).reduce(_ || _)))
      .cast("long")
    val symPpm = when(nChars > 0, idiv(symChars * lit(1000000L), nChars))
      .otherwise(lit(0L))
    val kwPpm = when(nWords > 0, idiv(kwWords * lit(1000000L), nWords))
      .otherwise(lit(0L))
    val indentPpm = idiv(indentLines * lit(1000000L), nLines)
    val punctPpm = idiv(punctLines * lit(1000000L), nLines)
    Seq("sym_ppm" -> symPpm, "kw_ppm" -> kwPpm,
      "indent_ppm" -> indentPpm, "punctline_ppm" -> punctPpm,
      "n_lines" -> nLines, "n_words" -> nWords)
  }

  /** The code verdict as a Column (for composed pipelines — the
    * [[C4.pageVerdict]] contract).
    */
  def codeVerdict(page: Column): Column = {
    val sigs = signalCols(page).toMap
    val votes = Seq(
      when(sigs("sym_ppm") >= SymMinPpm, 1).otherwise(0),
      when(sigs("kw_ppm") >= KwMinPpm, 1).otherwise(0),
      when(sigs("indent_ppm") >= IndentMinPpm, 1).otherwise(0),
      when(sigs("punctline_ppm") >= PunctLineMinPpm, 1).otherwise(0))
      .reduce(_ + _)
    votes >= MinVotes
  }

  /** The DataFrame op: one projection, all signals + verdict. */
  def detect(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val page = col(textCol)
    val sigs = signalCols(page)
    docs.select(col(idCol) +: (sigs.map { case (n, c) => c.as(n) } :+
      codeVerdict(page).as("is_code")): _*)
  }
}
