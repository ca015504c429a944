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

  /** The page's line array — materialize as a real column before
    * handing it to the gate kernels (see [[qualityGates]]).
    */
  def linesOf(page: Column): Column = split(page, "\n")

  /** The page's word array (newline-as-space split, empties dropped) —
    * materialize as a real column before handing it to the gate
    * kernels.
    */
  def wordsOf(page: Column): Column =
    filter(split(translate(page, "\n", " "), " "), w => length(w) > 0)

  /** The seven gate booleans, in the documented order — shared by
    * [[qualityRules]] and [[qualityVerdict]]. `lines`/`words` should be
    * ATTRIBUTE columns (pre-projected via [[linesOf]]/[[wordsOf]]):
    * higher-order-function kernels are CodegenFallback, every fallback
    * node re-evaluates its child tree interpreted with no CSE across
    * sibling columns, so an inline split/filter here re-ran per GATE —
    * and, composed over x68's computed `cleaned` text, re-ran the whole
    * C4 line filter per gate (the round-21 x68 cost center).
    */
  private def qualityGates(page: Column, lines: Column,
                           words: Column): Seq[(String, Column)] = {
    val nLines = size(lines).cast("long")
    val nWords = size(words).cast("long")
    // Σ word lengths = the page's non-separator chars (words are the
    // non-empty tokens of the page split on ' '/'\n'): one codegen'd
    // translate+length instead of an interpreted per-element
    // aggregate(transform(...)) fold — the SortedRunEntropy recipe (§4)
    val sumLen = length(translate(page, " \n", "")).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[a-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(words),
      array(Stopwords.map(lit): _*))).cast("long")
    val nBullet = size(filter(lines,
      l => l.startsWith("- ") || l.startsWith("• "))).cast("long")
    val nEllLines = size(filter(lines, l => l.endsWith("..."))).cast("long")
    val nHash = (length(page) - length(translate(page, "#", ""))).cast("long")
    val nEllOcc = ((length(page) - length(replace(page, lit("..."), lit(""))))
      / lit(3)).cast("long")
    Seq(
      "g_words" -> (nWords >= MinWords && nWords <= MaxWords),
      "g_meanlen" -> (lit(MinMeanLen) * nWords <= sumLen &&
        sumLen <= lit(MaxMeanLen) * nWords),
      "g_symbol" -> (lit(10L) * (nHash + nEllOcc) <= nWords),
      "g_bullet" -> (lit(10L) * nBullet <= nLines),
      "g_ellipsis" -> (lit(10L) * nEllLines <= lit(3L) * nLines),
      "g_alpha" -> (lit(10L) * nAlpha >= lit(8L) * nWords),
      "g_stop" -> (nStop >= MinStopwords))
  }

  /** The conjunction verdict over pre-projected line/word attribute
    * columns (pipeline composition — x68).
    */
  def qualityVerdict(page: Column, lines: Column, words: Column): Column =
    qualityGates(page, lines, words).map(_._2).reduce(_ && _)

  def qualityRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // line/word arrays materialized ONCE as columns (qualityGates doc)
    val pre = docs.select(col(idCol), col(textCol).as("__page"),
      linesOf(col(textCol)).as("__lines"), wordsOf(col(textCol)).as("__words"))
    val gates = qualityGates(col("__page"), col("__lines"), col("__words"))
    pre.select(
      Seq(col(idCol), size(col("__lines")).cast("long").as("n_lines"),
        size(col("__words")).cast("long").as("n_words")) ++
        gates.map { case (n, c) => c.as(n) }: _*)
      .withColumn("kept_doc", gates.map(g => col(g._1)).reduce(_ && _))
  }

  // ----------------------------------------------------------- X67 ----

  /** The paper's repetition thresholds (Table A1), in parts-per-million
    * of the fraction they bound.
    */
  val DupLineMaxPpm = 300000L
  val DupLineCharMaxPpm = 200000L
  val TopGramMaxPpm: Map[Int, Long] =
    Map(2 -> 200000L, 3 -> 180000L, 4 -> 160000L)
  val DupGramMaxPpm: Map[Int, Long] =
    (5 to 10).map(n => n -> (150000L - (n - 5) * 10000L)).toMap

  /** Exact BIGINT integral division as a Column: a − (a mod b) is an
    * exact multiple of b, and dividing an exact multiple ≤ 2^53 is
    * exact in IEEE double — so the result is floor(a/b) bit-exactly
    * for the ppm magnitudes here (a ≤ chars·10^6).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** X67 — Gopher repetition signals (Rae et al. 2021, Table A1): the
    * within-document repetition filters MassiveText applies alongside
    * the [[qualityRules]] gate. Emits, in exact integer ppm:
    *  - duplicate-line fraction and duplicate-line CHARACTER fraction
    *    (occurrences after the first, over all lines / line chars)
    *  - top-n-gram character fraction for n = 2,3,4 (chars of the most
    *    frequent n-gram's occurrences over total word chars; ties to
    *    the lexicographically smallest gram)
    *  - duplicate-n-gram character fraction for n = 5..10 (chars of
    *    word positions COVERED by any n-gram occurring more than once,
    *    each position counted once)
    * and the conjunction verdict against the paper's thresholds.
    * Character accounting is over word characters (separators excluded)
    * — the [[C4]]-family convention; the oracle replays the identical
    * definition.
    *
    * SHAPE AT 100 TB: row-local like the rest of the family — the
    * n-gram coverage runs in a native one-pass kernel
    * ([[graft.functions.DupGramCoveredChars]]): gram hash-count +
    * boolean coverage mark + one length sum, O(m·n) per document, even
    * when every gram is the same one (the adversarial page the filter
    * exists to catch). Declarative forms were tried and rejected twice:
    * both an accumulated-positions fold and a sorted-neighbor scan need
    * per-position probes into computed arrays, and interpreted
    * higher-order-function lambdas re-evaluate the probed array's whole
    * expression tree per probe (no CSE inside lambdas) — O(m²)–O(m³)
    * per document. ZERO shuffle;
    * the DuckDB oracle computes the same signals relationally
    * (group-by-gram, positional coverage join), checking the kernel
    * against the relational form per document.
    */
  def repetitionSignals(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // line/word arrays materialized ONCE as columns (qualityGates doc):
    // each of the 11 signal columns re-evaluated the inline
    // split/filter before this pre-projection
    val pre = docs.select(col(idCol), col(textCol).as("__page"),
      linesOf(col(textCol)).as("__lines"), wordsOf(col(textCol)).as("__words"))
    val (nLines, sigs) =
      repSignalCols(col("__page"), col("__lines"), col("__words"))
    pre.select(col(idCol) +: nLines.as("n_lines") +:
        sigs.map { case (n, c, _) => c.as(n) }: _*)
      .withColumn("kept_doc",
        sigs.map { case (n, _, thr) => col(n) <= thr }.reduce(_ && _))
  }

  /** The conjunction verdict over pre-projected page/line/word attribute
    * columns (x68 composition).
    */
  def repetitionVerdict(page: Column, lines: Column, words: Column): Column =
    repSignalCols(page, lines, words)._2.map { case (_, c, thr) => c <= thr }
      .reduce(_ && _)

  /** (n_lines, (name, ppm Column, max ppm) per signal) over
    * pre-projected page/line/word attribute columns — shared by the
    * DataFrame op and the verdict kernel.
    */
  private def repSignalCols(page: Column, lines: Column,
                            words: Column): (Column, Seq[(String, Column, Long)]) = {
    // char totals straight off the page (the qualityGates sumLen move):
    // Σ word lengths = non-separator chars; Σ line lengths = page length
    // minus the newline count (split keeps trailing empties, so
    // #newlines = size(lines) − 1) — codegen'd arithmetic instead of two
    // interpreted per-element aggregate(transform(...)) folds
    val totalWC = length(translate(page, " \n", "")).cast("long")
    val nLines = size(lines).cast("long")
    val totalLC = (length(page).cast("long") - nLines + lit(1L))
    val nDupLines = nLines - size(array_distinct(lines)).cast("long")
    // occurrences 2..k of each line value add their chars:
    // Σ_v (c_v − 1)·len(v) = Σ line lengths − Σ DISTINCT line lengths —
    // two codegen'd collection ops instead of the interpreted sorted
    // fold (a 3-field struct allocation per line, per document)
    val dupLineChars =
      totalLC - length(array_join(array_distinct(lines), "")).cast("long")

    def topGramPpm(n: Int): Column = {
      // native hash-count kernel (see TopGramChars): the sorted-fold
      // form paid an interpreted comparator per comparison — the
      // dominant x67/x68 bench cost
      val chars = graft.functions.TopGramChars.topGramChars(words, n)
      when(size(words) >= n && totalWC > 0,
        idiv(chars * lit(1000000L), totalWC)).otherwise(lit(0L))
    }

    def dupGramPpm(n: Int): Column = {
      // native one-pass coverage kernel (the Shingles precedent): any
      // declarative form needs per-position element_at probes into a
      // COMPUTED array, and interpreted lambda evaluation re-runs the
      // probed array's whole expression tree per probe — quadratic or
      // worse on exactly the repetitive pages this filter exists to
      // catch
      val dupChars =
        graft.functions.DupGramCoveredChars.dupGramCoveredChars(words, n)
      when(size(words) >= n && totalWC > 0,
        idiv(dupChars * lit(1000000L), totalWC)).otherwise(lit(0L))
    }

    val sigs =
      Seq(("dup_line_ppm", idiv(nDupLines * lit(1000000L), nLines),
          DupLineMaxPpm),
        ("dup_line_char_ppm",
          when(totalLC > 0, idiv(dupLineChars * lit(1000000L), totalLC))
            .otherwise(lit(0L)), DupLineCharMaxPpm)) ++
      (2 to 4).map(n =>
        (s"top${n}_char_ppm", topGramPpm(n), TopGramMaxPpm(n))) ++
      (5 to 10).map(n =>
        (s"dup${n}_char_ppm", dupGramPpm(n), DupGramMaxPpm(n)))
    (nLines, sigs)
  }
}
