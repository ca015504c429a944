package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ClippedGramMatches.clippedGramMatches
import graft.functions.TokenLcs.tokenLcs

/** X97 — corpus-level ROUGE (Lin 2004): the recall-oriented complement
  * to [[Bleu]], the standard summarization / compression-pipeline
  * grade. ROUGE-1/2 use the same clipped n-gram matches as BLEU but
  * score against the REFERENCE totals; ROUGE-L scores the longest
  * common subsequence, order-sensitive without requiring contiguity.
  *
  * Aggregate-count form — MICRO-averaged, not the per-pair-averaged F1
  * sacrebleu/rouge-score report: per group, P_n = m_n/ht_n and
  * R_n = m_n/rt_n over summed counts, so F1 collapses to the exact
  * ratio 2·m_n/(ht_n + rt_n); ROUGE-L's F1 is likewise 2·Σlcs/(c + r).
  * Every numerator and denominator is an exact integer sum — the three
  * F1 columns, rounded to 6 digits, are the only floats. Micro weights
  * long pairs proportionally to their token mass; values will NOT
  * match mean-of-per-pair-F1 tooling on length-skewed corpora (the
  * [[Eval.ndcgAt]] averaging contract).
  *
  * 100 TB shape: one corpus scan, one group-grain exchange. Clipped
  * matches, n-gram totals, lengths, AND the LCS are all row-local —
  * [[graft.functions.ClippedGramMatches]] counts every order in one
  * pass over the pair's token arrays, and the LCS is the native
  * [[graft.functions.TokenLcs]] two-row integer DP (per-pair
  * O(|hyp|·|ref|) time) — so the only exchange carries ~3·maxN+3
  * integers per pair into the group partial sums. Nothing gram-grain
  * ever shuffles.
  */
object Rouge {

  def corpusRouge(pairs: DataFrame, grpCol: String, idCol: String,
                  hypCol: String, refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"maxN $maxN out of range [1, 4]")
    val base = Bleu.tokenPairs(pairs, grpCol, idCol, hypCol, refCol)

    // matches, hyp/ref totals, lengths, LCS: all row-local — one
    // projection, then the single group-grain exchange
    val perPair = base.select(col("grp") +:
      clippedGramMatches(col("hts"), col("rts"), maxN).as("ms") +:
      (1 to maxN).flatMap(n => Seq(
        greatest(size(col("hts")) - (n - 1), lit(0)).cast("long").as(s"ht$n"),
        greatest(size(col("rts")) - (n - 1), lit(0)).cast("long").as(s"rt$n"))) :+
      tokenLcs(col("hts"), col("rts")).as("lcs") :+
      size(col("hts")).cast("long").as("lh") :+
      size(col("rts")).cast("long").as("lr"): _*)
    val counts = perPair.groupBy("grp")
      .agg(sum(element_at(col("ms"), 1)).as("m1"),
        ((2 to maxN).map(n => sum(element_at(col("ms"), n)).as(s"m$n")) ++
          (1 to maxN).map(n => sum(s"ht$n").as(s"ht$n")) ++
          (1 to maxN).map(n => sum(s"rt$n").as(s"rt$n")) ++
          Seq(sum("lcs").as("lcs"), sum("lh").as("c"), sum("lr").as("r"))): _*)

    // 2m stays an exact integer; the divide is the one double step (and
    // the 0.0/2.0 literals would otherwise parse DECIMAL — the x88 trap)
    def f1(m: String, d1: String, d2: String) = expr(
      s"""CASE WHEN $d1 + $d2 = 0 THEN CAST(0 AS DOUBLE)
         |ELSE round(CAST(2 * $m AS DOUBLE) / ($d1 + $d2), 6) END""".stripMargin)

    (1 to maxN).foldLeft(counts) { (df, n) =>
      df.withColumn(s"rouge${n}_f", f1(s"m$n", s"ht$n", s"rt$n"))
    }.withColumn("rougel_f", f1("lcs", "c", "r"))
  }
}
