package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X64 — C4-style line-based cleaning (Raffel et al. 2020, "Exploring
  * the Limits of Transfer Learning", §2.2): the canonical web-corpus
  * recipe every later pipeline (MassiveText, RefinedWeb, FineWeb)
  * starts from. Line rules — keep a line only if it (1) ends in a
  * terminal punctuation mark, (2) has at least `minWords` words, and
  * (3) does not mention "javascript". Page rules — drop the whole
  * document if it (4) contains a curly brace (code), (5) contains
  * "lorem ipsum" (placeholder boilerplate), or (6) retains fewer than
  * `minLines` lines. (The paper's remaining rules — the bad-word list,
  * which is just rule 3 with a longer lexicon, and the corpus-level
  * three-sentence-span dedup, which is the [[Dedup.substringRuns]] /
  * [[Dedup.removeSpans]] family applied at sentence granularity —
  * compose behind the same column contract.)
  *
  * SHAPE AT 100 TB: every rule is a projection over one row's line
  * array — `split`/`filter`/`array_join` higher-order functions, all
  * codegen'd, ZERO shuffle and no explode. The per-document verdict and
  * cleaned text come out of the same scan that read the row; at 100 TB
  * this is the scan-side gate it is in production pipelines. The DuckDB
  * oracle replays the rules relationally (explode lines → per-line
  * booleans → group back), so the fold/explode equivalence is checked
  * per document.
  *
  * Output: doc_id, n_lines, n_kept, kept_doc, and the cleaned text
  * (kept lines re-joined; NULL for dropped documents).
  */
object C4 {

  /** Terminal punctuation per the paper: period, exclamation, question
    * mark, closing quote.
    */
  val TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")

  private def lineKeep(l: Column, minWords: Int): Column =
    TerminalPunct.map(p => l.endsWith(p)).reduce(_ || _) &&
      size(split(l, " ")) >= minWords &&
      !l.contains("javascript")

  private def keptLines(page: Column, minWords: Int): Column =
    filter(split(page, "\n"), l => lineKeep(l, minWords))

  /** The page-level verdict as a Column — the kernel [[clean]] names,
    * exposed so pipeline compositions (x68) can gate in the same
    * projection.
    */
  def pageVerdict(page: Column, minWords: Int = 3,
                  minLines: Int = 5): Column =
    size(keptLines(page, minWords)) >= minLines &&
      !page.contains("{") && !page.contains("lorem ipsum")

  /** The cleaned page (kept lines re-joined), NULL when the page-level
    * verdict drops the document.
    */
  def cleanedCol(page: Column, minWords: Int = 3,
                 minLines: Int = 5): Column =
    when(pageVerdict(page, minWords, minLines),
      array_join(keptLines(page, minWords), "\n"))

  /** Apply the C4 rules to `textCol` (a "\n"-separated page). */
  def clean(docs: DataFrame, idCol: String, textCol: String,
            minWords: Int = 3, minLines: Int = 5): DataFrame = {
    val page = col(textCol)
    docs.select(
      col(idCol),
      size(split(page, "\n")).cast("long").as("n_lines"),
      size(keptLines(page, minWords)).cast("long").as("n_kept"),
      pageVerdict(page, minWords, minLines).as("kept_doc"),
      cleanedCol(page, minWords, minLines).as("cleaned"))
  }
}
