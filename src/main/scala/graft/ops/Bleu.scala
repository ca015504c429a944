package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ClippedGramMatches.clippedGramMatches

/** X96 — corpus-level BLEU (Papineni, Roukos, Ward & Zhu 2002): the
  * standard machine-translation / text-generation quality score, used in
  * a data pipeline to grade aligned bitext (is the mined pair actually a
  * translation?), paraphrase corpora, and round-trip augmentation
  * outputs against their sources at corpus grain.
  *
  * Exactly the unsmoothed corpus BLEU of the paper: modified (clipped)
  * n-gram precision p_n = Σ_pairs Σ_grams min(count_hyp, count_ref) /
  * Σ_pairs (len_hyp − n + 1), geometric mean over n = 1..maxN, times the
  * brevity penalty exp(min(0, 1 − r/c)). If ANY p_n is zero the score is
  * zero (the paper's convention — no smoothing), which keeps every
  * numerator and denominator an exact integer; the only floating-point
  * step is the final exp/ln composition, rounded to 6 digits.
  *
  * 100 TB shape: ONE pass over the pair table and ONE exchange. Because
  * clipping is per pair, the entire numerator/denominator computation is
  * row-local — [[graft.functions.ClippedGramMatches]] counts all orders'
  * clipped matches in one pass over the pair's two token arrays, and the
  * n-gram totals are length projections — so the only exchange is the
  * group-grain partial-sum aggregate (maxN+2 integers per pair into it,
  * group-cardinality rows out). The earlier explode → (pair, n, gram)
  * join formulation shuffled a row per gram OCCURRENCE; this shape
  * shuffles none.
  */
object Bleu {

  /** Corpus BLEU per group over an aligned pair table.
    *
    * @param pairs  one row per (hypothesis, reference) pair
    * @param grpCol corpus grouping (language, source, shard)
    * @param idCol  unique pair id — clipping is PER PAIR, so the id must
    *               not collide across rows
    * @param maxN   highest n-gram order (4 = the standard BLEU-4)
    */
  def corpusBleu(pairs: DataFrame, grpCol: String, idCol: String,
                 hypCol: String, refCol: String, maxN: Int = 4): DataFrame =
    withBleu(counts(pairs, grpCol, idCol, hypCol, refCol, maxN), maxN)

  /** The per-group ADDITIVE count table (m1..mN clipped matches, t1..tN
    * hyp n-gram totals, c/r length totals) — every column is an exact
    * integer SUM over pairs, so count tables from disjoint pair sets
    * merge by plain addition. That additivity is what the streaming
    * twin's per-batch delta state relies on (the x89 counter law).
    */
  def counts(pairs: DataFrame, grpCol: String, idCol: String,
             hypCol: String, refCol: String, maxN: Int = 4): DataFrame =
    perPairCounts(pairs, grpCol, idCol, hypCol, refCol, maxN)
      .groupBy("grp")
      .agg(sum("m1").as("m1"),
        ((2 to maxN).map(n => sum(s"m$n").as(s"m$n")) ++
          (1 to maxN).map(n => sum(s"t$n").as(s"t$n")) ++
          Seq(sum("lh").as("c"), sum("lr").as("r"))): _*)

  /** Per-PAIR count rows (grp, pid, m1..mN, t1..tN, lh, lr) — entirely
    * row-local (clipping is per pair), the shared scan [[counts]] sums
    * at group grain and [[BleuCi]] resamples before summing.
    */
  private[ops] def perPairCounts(pairs: DataFrame, grpCol: String,
                                 idCol: String, hypCol: String,
                                 refCol: String, maxN: Int): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN $maxN out of range [1, 8]")
    val base = tokenPairs(pairs, grpCol, idCol, hypCol, refCol)
    base.select(Seq(col("grp"), col("pid"),
        clippedGramMatches(col("hts"), col("rts"), maxN).as("ms")) ++
      (1 to maxN).map(n =>
        greatest(size(col("hts")) - (n - 1), lit(0)).cast("long").as(s"t$n")) ++
      Seq(size(col("hts")).cast("long").as("lh"),
        size(col("rts")).cast("long").as("lr")): _*)
      .select(Seq(col("grp"), col("pid")) ++
        (1 to maxN).map(n => element_at(col("ms"), n).as(s"m$n")) ++
        (1 to maxN).map(n => col(s"t$n")) ++
        Seq(col("lh"), col("lr")): _*)
  }

  /** (grp, pid, hts, rts) tokenized pair base shared with [[Rouge]].
    * Zero-length tokens are filtered: `split('', ' ')` yields `[""]`,
    * and without the filter an empty hypothesis or reference would
    * contribute a phantom token (t1=1, c=1, and a matchable ""
    * unigram) to the BLEU/ROUGE counts instead of 0 — mirrored in the
    * oracle CTEs and in [[BleuCi.bleuPairedTest]].
    */
  private[ops] def nonEmptyTokens(c: Column): Column =
    filter(Dedup.tokens(c), t => length(t) > 0)

  private[ops] def tokenPairs(pairs: DataFrame, grpCol: String,
                              idCol: String, hypCol: String,
                              refCol: String): DataFrame =
    pairs.select(col(grpCol).as("grp"), col(idCol).as("pid"),
      nonEmptyTokens(col(hypCol)).as("hts"),
      nonEmptyTokens(col(refCol)).as("rts"))



  /** The BLEU composition over a count table — the ONE shared estimator
    * fragment (batch and stream score through this verbatim, the x83/x88
    * discipline): zero branch if any order has no match, brevity penalty
    * exp(min(0, 1 − r/c)), geometric mean of the order precisions,
    * rounded to 6 digits as the single float step.
    */
  def withBleu(countTab: DataFrame, maxN: Int): DataFrame =
    countTab.withColumn("bleu", expr(bleuSql(maxN)))

  /** The composition as one SQL fragment, shared textually with the
    * oracle side wherever a query re-scores count tables (x101's
    * resamples) — the x88/x98 shared-fragment discipline.
    */
  def bleuSql(maxN: Int): String = {
    val lnTerms = (1 to maxN).map(n => s"ln(CAST(m$n AS DOUBLE) / t$n)")
      .mkString(" + ")
    val zeroGuard = (1 to maxN).map(n => s"m$n = 0").mkString(" OR ")
    s"""CASE WHEN $zeroGuard OR c = 0 THEN 0.0
       |ELSE round(exp(
       |  least(CAST(0 AS DOUBLE), 1.0 - CAST(r AS DOUBLE) / CAST(c AS DOUBLE))
       |  + ($lnTerms) / ${maxN}.0), 6) END""".stripMargin
  }
}
