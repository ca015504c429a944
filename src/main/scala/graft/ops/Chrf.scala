package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ClippedGramMatches.clippedGramMatches

/** X98 — chrF (Popović 2015): character n-gram F-β score, the
  * tokenization-free MT/generation grade that complements [[Bleu]]
  * (word-precision) and [[Rouge]] (word-recall/LCS) — robust to
  * morphology and segmentation differences because it never tokenizes.
  *
  * Exactly the paper's corpus composition: per order n = 1..maxN,
  * matches M_n = Σ_pairs Σ_grams min(count_hyp, count_ref) (clipping
  * per pair), totals H_n / R_n = Σ_pairs gram counts; CHRP = mean over
  * orders with H_n > 0 of M_n/H_n, CHRR likewise over R_n > 0, and
  * chrF = (1+β²)·P·R / (β²·P + R) with the paper's β = 2 (recall
  * weighted double). Spaces are removed before gramming (the paper's
  * default). Every M/H/R is an exact BIGINT; the P/R means and the
  * final F are the double steps, composed in one fixed-order expression
  * shared textually with the oracle and rounded to 6 digits.
  *
  * Character grams are CODEPOINT-indexed on both engines (Spark
  * `split("")` and `substr` count UTF-8 chars, DuckDB slices
  * characters); supplementary-plane input would diverge only on an
  * engine indexing UTF-16 units (a Java-`String.length` port would
  * halve every astral char into surrogate halves and double the gram
  * lanes). Spark's codepoint grain on astral input is PINNED in
  * ChrfSpec ("supplementary-plane text grams at CODEPOINT grain") —
  * any engine swap that regresses to UTF-16 units fails the exact
  * integer-lane assertions there, not silently at emoji corpora.
  *
  * 100 TB shape: one corpus scan, one group-grain exchange. Clipping
  * is per pair, so [[graft.functions.ClippedGramMatches]] counts every
  * order's matches in one row-local pass over the pair's char arrays
  * (empty-sep join: fixed-length char grams need no separator), and
  * totals are length projections — the only exchange carries maxN+2·maxN
  * integers per pair into the group partial sums. The explode
  * formulation this replaced shuffled ≈ maxN·chars gram rows per side —
  * the family's dominant exchange at scale (measured 32 s → scan-bound
  * at the 10x probe). No collect, no corpus-sized driver state.
  */
object Chrf {

  def corpusChrf(pairs: DataFrame, grpCol: String, idCol: String,
                 hypCol: String, refCol: String, maxN: Int = 6,
                 beta: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN $maxN out of range [1, 8]")
    require(beta >= 1 && beta <= 9, s"beta $beta out of range [1, 9]")
    // char arrays of the despaced text; split("") leaves a trailing ""
    // artifact (and [""] for empty text) — the length filter drops it
    def chars(c: Column): Column =
      filter(split(regexp_replace(c, " ", ""), ""), ch => length(ch) > 0)
    val base = pairs.select(col(grpCol).as("grp"), col(idCol).as("pid"),
      chars(col(hypCol)).as("hc"), chars(col(refCol)).as("rc"))

    // matches and totals: all row-local (fixed-length char grams join
    // with the EMPTY separator — unambiguous, equal to substring grams)
    val perPair = base.select(col("grp") +:
      clippedGramMatches(col("hc"), col("rc"), maxN, "").as("ms") +:
      (1 to maxN).flatMap(n => Seq(
        greatest(size(col("hc")) - (n - 1), lit(0)).cast("long").as(s"h$n"),
        greatest(size(col("rc")) - (n - 1), lit(0)).cast("long").as(s"r$n"))): _*)
    val counts = perPair.groupBy("grp")
      .agg(sum(element_at(col("ms"), 1)).as("m1"),
        ((2 to maxN).map(n => sum(element_at(col("ms"), n)).as(s"m$n")) ++
          (1 to maxN).map(n => sum(s"h$n").as(s"h$n")) ++
          (1 to maxN).map(n => sum(s"r$n").as(s"r$n"))): _*)
    counts.withColumn("chrf", expr(chrfSql(maxN, beta)))
  }

  /** The chrF composition over m/h/r columns — one SQL fragment used
    * VERBATIM by the Spark plan and the DuckDB oracle so the double
    * lane cannot drift (the x88 shared-estimator discipline).
    */
  def chrfSql(maxN: Int, beta: Int): String = {
    def mean(num: Int => String, den: Int => String): String = {
      val terms = (1 to maxN).map(n =>
        s"CASE WHEN ${den(n)} > 0 THEN CAST(${num(n)} AS DOUBLE) / ${den(n)} ELSE CAST(0 AS DOUBLE) END")
        .mkString(" + ")
      val cnt = (1 to maxN).map(n =>
        s"CASE WHEN ${den(n)} > 0 THEN 1 ELSE 0 END").mkString(" + ")
      s"(CASE WHEN ($cnt) = 0 THEN CAST(0 AS DOUBLE) ELSE ($terms) / ($cnt) END)"
    }
    val p = mean(n => s"m$n", n => s"h$n")
    val r = mean(n => s"m$n", n => s"r$n")
    val b2 = beta * beta
    s"""CASE WHEN ($b2 * $p + $r) = 0 THEN CAST(0 AS DOUBLE)
       |ELSE round((1 + $b2) * $p * $r / ($b2 * $p + $r), 6) END""".stripMargin
  }
}
