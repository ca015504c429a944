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

  /** X69 — the corpus-level half of the C4 recipe: "we deduplicated any
    * three-sentence span occurring more than once". Every `span`
    * consecutive-line window is fingerprinted; the globally FIRST
    * occurrence (minimum (doc, start) — document id, then start line)
    * keeps its lines, every later occurrence is excised, and documents
    * reassemble from their surviving lines. Overlapping removed spans
    * union (each line removed once); a removed span overlapping a kept
    * first occurrence still removes its own lines — spans are judged on
    * the ORIGINAL line sequence, single-pass, as the paper does.
    *
    * SHAPE AT 100 TB: the only all-corpus exchange carries (digest,
    * doc, start) — the md5 of the span text, never the text itself (the
    * x1 digest-only discipline; the DuckDB oracle computes the same md5
    * so there is nothing to drift). The removed-start lists come back
    * doc-keyed through the (doc ⨝ removals) equi-join — AQE broadcasts
    * them when small — and the line-level excision is a row-local
    * coverage union (the x67 position-set trick). Two shuffles total:
    * the digest group-by and the doc-id join.
    *
    * Output: doc_id, n_lines, n_removed, deduped ('' if everything was
    * excised).
    */
  def spanDedup(docs: DataFrame, idCol: String, textCol: String,
                span: Int = 3): DataFrame = {
    require(span >= 1, s"span must be >= 1: $span")
    val lines = split(col(textCol), "\n")
    // native windowed join (the Shingles kernel): `slice(lines, i, span)`
    // inside a transform lambda would re-evaluate the split per span
    // position (interpreted lambdas re-run captured subtrees per
    // element — the Gopher lesson), O(lines x chars) per document
    val spanArr = transform(
      graft.functions.Shingles.shingles(lines, span, "\n"), s => md5(s))
    val spans = docs.select(col(idCol), posexplode(spanArr).as(Seq("p", "d")))
      .select(col(idCol), (col("p") + 1).as("start"), col("d"))
    val first = spans.groupBy(col("d"))
      .agg(min(struct(col(idCol), col("start"))).as("keep"))
    val removedStarts = spans.join(first, Seq("d"))
      .filter(!(col("keep").getField(idCol) === col(idCol) &&
        col("keep").getField("start") === col("start")))
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("start"))).as("starts"))
    val covered = array_distinct(flatten(transform(col("starts"),
      st => sequence(st, st + lit(span - 1)))))
    docs.join(removedStarts, Seq(idCol), "left")
      .select(col(idCol), lines.as("ls"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .select(col(idCol),
        size(col("ls")).cast("long").as("n_lines"),
        size(covered).cast("long").as("n_removed"),
        array_join(filter(transform(sequence(lit(1), size(col("ls"))),
          j => when(!array_contains(covered, j), element_at(col("ls"), j))),
          x => x.isNotNull), "\n").as("deduped"))
  }

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
