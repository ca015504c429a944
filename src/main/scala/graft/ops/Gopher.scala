package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X65 — Gopher quality rules (Rae et al. 2021, "Scaling Language
  * Models: ... Gopher", §A1.1): the MassiveText document-level gate
  * that, with [[C4]]'s line rules, bounds what every later web recipe
  * filters on. A document is kept iff ALL of:
  *  - word count in [50, 100,000]
  *  - mean word length in [3, 10] characters
  *  - symbol-to-word ratio ('#' and '...') at most 1/10
  *  - at most 10% of lines start with a bullet point
  *  - at most 30% of lines end with an ellipsis
  *  - at least 80% of words contain an alphabetic character
  *  - at least 2 of the 8 required stopwords appear
  *
  * Every ratio threshold is the paper's rational applied by integer
  * CROSS-MULTIPLICATION (10·symbols ≤ words, 10·bullets ≤ lines,
  * 10·ellipsis-lines ≤ 3·lines, 10·alpha ≥ 8·words, 3·words ≤
  * total-chars ≤ 10·words) — no floating ratio is ever materialized, so
  * the verdict is bit-identical in any engine (the fixed-point house
  * discipline).
  *
  * SHAPE AT 100 TB: like [[C4.clean]], one row's line/word arrays
  * through codegen'd higher-order functions — ZERO shuffle, no explode;
  * the gate rides the scan. The DuckDB oracle replays the rules
  * relationally (unnest → group back), checking the fold/explode
  * equivalence per document.
  *
  * Output: doc_id, n_lines, n_words, the seven per-rule booleans, and
  * the conjunction `kept_doc`.
  */
object Gopher {

  /** The paper's required-stopword list. */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  val MinWords = 50L
  val MaxWords = 100000L
  val MinMeanLen = 3L // chars per word, lower bound
  val MaxMeanLen = 10L
  val MinStopwords = 2

  def qualityRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val page = col(textCol)
    val lines = split(page, "\n")
    val words = filter(split(translate(page, "\n", " "), " "),
      w => length(w) > 0)
    val nLines = size(lines).cast("long")
    val nWords = size(words).cast("long")
    val sumLen = aggregate(transform(words, w => length(w).cast("long")),
      lit(0L), _ + _)
    val nAlpha = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(words),
      array(Stopwords.map(lit): _*))).cast("long")
    val nBullet = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("• "))).cast("long")
    val nEllLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nHash = (length(page) - length(translate(page, "#", ""))).cast("long")
    val nEllOcc = ((length(page) - length(replace(page, lit("..."), lit(""))))
      / lit(3)).cast("long")
    docs.select(
      col(idCol), nLines.as("n_lines"), nWords.as("n_words"),
      (nWords >= MinWords && nWords <= MaxWords).as("g_words"),
      (lit(MinMeanLen) * nWords <= sumLen &&
        sumLen <= lit(MaxMeanLen) * nWords).as("g_meanlen"),
      (lit(10L) * (nHash + nEllOcc) <= nWords).as("g_symbol"),
      (lit(10L) * nBullet <= nLines).as("g_bullet"),
      (lit(10L) * nEllLines <= lit(3L) * nLines).as("g_ellipsis"),
      (lit(10L) * nAlpha >= lit(8L) * nWords).as("g_alpha"),
      (nStop >= MinStopwords).as("g_stop"))
      .withColumn("kept_doc",
        col("g_words") && col("g_meanlen") && col("g_symbol") &&
          col("g_bullet") && col("g_ellipsis") && col("g_alpha") &&
          col("g_stop"))
  }
}
