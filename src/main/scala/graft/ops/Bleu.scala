package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * 100 TB shape: ONE pass over the pair table — hyp and ref n-grams for
  * all n ride a single explode each (tagged structs, so there is no
  * per-n rescan), the clip join is keyed (pair, n, gram) with map-side
  * partial counts, and everything after it is group-cardinality-sized.
  * Length totals are row-local projections (no explode). Nothing is
  * collected; the quadratic-looking "clip" is a hash join on exact keys.
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
             hypCol: String, refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN $maxN out of range [1, 8]")
    val base = tokenPairs(pairs, grpCol, idCol, hypCol, refCol)
    val mtab = clippedMatches(base, maxN)

    // denominators + length totals: row-local, no explode
    val tcols = (1 to maxN).map(n =>
      greatest(size(col("hts")) - (n - 1), lit(0)).cast("long").as(s"t$n"))
    val totals = base
      .select(col("grp") +: tcols :+
        size(col("hts")).cast("long").as("lh") :+
        size(col("rts")).cast("long").as("lr"): _*)
      .groupBy("grp")
      .agg(sum("t1").as("t1"),
        (2 to maxN).map(n => sum(s"t$n").as(s"t$n")) ++
          Seq(sum("lh").as("c"), sum("lr").as("r")): _*)

    // a group can miss from `clipped` only if NO order matched at all —
    // left join + coalesce keeps it with m_n = 0 and bleu = 0
    totals.join(mtab, Seq("grp"), "left")
      .select(col("grp") +:
        (1 to maxN).map(n => coalesce(col(s"m$n"), lit(0L)).as(s"m$n")) ++:
        (1 to maxN).map(n => col(s"t$n")) :+
        col("c") :+ col("r"): _*)
  }

  /** (grp, pid, hts, rts) tokenized pair base shared with [[Rouge]]. */
  private[ops] def tokenPairs(pairs: DataFrame, grpCol: String,
                              idCol: String, hypCol: String,
                              refCol: String): DataFrame =
    pairs.select(col(grpCol).as("grp"), col(idCol).as("pid"),
      Dedup.tokens(col(hypCol)).as("hts"), Dedup.tokens(col(refCol)).as("rts"))

  /** Per-group clipped-match sums m1..mN over a [[tokenPairs]] base:
    * Σ_pairs Σ_grams min(count_hyp, count_ref) for each order. All
    * n-gram orders ride ONE tagged explode per side ([(1, g), ...,
    * (maxN, g)] structs), so the corpus is scanned once, not per order;
    * the clip join is keyed (pair, n, gram) with map-side partials.
    */
  private[ops] def clippedMatches(base: DataFrame, maxN: Int): DataFrame = {
    def tagged(ts: Column): Column = concat((1 to maxN).map { n =>
      transform(Dedup.shingles(ts, n),
        g => struct(lit(n).as("n"), g.as("gram")))
    }: _*)

    def gramCounts(ts: String, out: String): DataFrame =
      base.select(col("grp"), col("pid"), explode(tagged(col(ts))).as("g"))
        .groupBy(col("grp"), col("pid"),
          col("g.n").as("n"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as(out))

    val clipped = gramCounts("hts", "hc")
      .join(gramCounts("rts", "rc"), Seq("grp", "pid", "n", "gram"))
      .groupBy(col("grp"), col("n"))
      .agg(sum(least(col("hc"), col("rc"))).as("m"))
    val mcols = (1 to maxN).map(n =>
      coalesce(max(when(col("n") === n, col("m"))), lit(0L)).as(s"m$n"))
    clipped.groupBy("grp").agg(mcols.head, mcols.tail: _*)
  }

  /** The BLEU composition over a count table — the ONE shared estimator
    * fragment (batch and stream score through this verbatim, the x83/x88
    * discipline): zero branch if any order has no match, brevity penalty
    * exp(min(0, 1 − r/c)), geometric mean of the order precisions,
    * rounded to 6 digits as the single float step.
    */
  def withBleu(countTab: DataFrame, maxN: Int): DataFrame = {
    val lnTerms = (1 to maxN).map(n => s"ln(CAST(m$n AS DOUBLE) / t$n)")
      .mkString(" + ")
    val zeroGuard = (1 to maxN).map(n => s"m$n = 0").mkString(" OR ")
    countTab.withColumn("bleu", expr(
      s"""CASE WHEN $zeroGuard OR c = 0 THEN 0.0
         |ELSE round(exp(
         |  least(CAST(0 AS DOUBLE), 1.0 - CAST(r AS DOUBLE) / CAST(c AS DOUBLE))
         |  + ($lnTerms) / ${maxN}.0), 6) END""".stripMargin))
  }
}
