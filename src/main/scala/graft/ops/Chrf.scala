package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  * Character grams are substring slices, CODEPOINT-indexed on both
  * engines for BMP text (Spark `substr` counts UTF-8 chars, DuckDB
  * slices characters); supplementary-plane input would diverge only if
  * an engine indexed UTF-16 units — the corpus contract here is
  * BMP/ASCII text (asserted nowhere because split points stay equal
  * either way for equal-length inputs at test data; revisit for emoji
  * corpora).
  *
  * 100 TB shape: grams for ALL orders ride one tagged explode per side
  * (≈ maxN·chars rows, scan-side), the clip join is keyed
  * (pair, n, gram) with map-side partial counts, totals are row-local
  * length projections, and everything after the join is
  * group-cardinality-sized. No collect, no corpus-sized driver state.
  */
object Chrf {

  def corpusChrf(pairs: DataFrame, grpCol: String, idCol: String,
                 hypCol: String, refCol: String, maxN: Int = 6,
                 beta: Int = 2): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN $maxN out of range [1, 8]")
    require(beta >= 1 && beta <= 9, s"beta $beta out of range [1, 9]")
    val base = pairs.select(col(grpCol).as("grp"), col(idCol).as("pid"),
      regexp_replace(col(hypCol), " ", "").as("hs"),
      regexp_replace(col(refCol), " ", "").as("rs"))

    // all orders from one array per side: slice(sequence(..)) keeps the
    // position list ascending-safe when the text is shorter than n
    def tagged(s: Column): Column = concat((1 to maxN).map { n =>
      transform(
        slice(sequence(lit(1), length(s) + 1), lit(1),
          greatest(length(s) - (n - 1), lit(0))),
        i => struct(lit(n).as("n"), s.substr(i, lit(n)).as("gram")))
    }: _*)

    def gramCounts(sc: String, out: String): DataFrame =
      base.select(col("grp"), col("pid"), explode(tagged(col(sc))).as("g"))
        .groupBy(col("grp"), col("pid"),
          col("g.n").as("n"), col("g.gram").as("gram"))
        .agg(count(lit(1)).as(out))

    val clipped = gramCounts("hs", "hc")
      .join(gramCounts("rs", "rc"), Seq("grp", "pid", "n", "gram"))
      .groupBy(col("grp"), col("n"))
      .agg(sum(least(col("hc"), col("rc"))).as("m"))
    val mcols = (1 to maxN).map(n =>
      coalesce(max(when(col("n") === n, col("m"))), lit(0L)).as(s"m$n"))
    val mtab = clipped.groupBy("grp").agg(mcols.head, mcols.tail: _*)

    val tcols = (1 to maxN).flatMap(n => Seq(
      greatest(length(col("hs")) - (n - 1), lit(0)).cast("long").as(s"h$n"),
      greatest(length(col("rs")) - (n - 1), lit(0)).cast("long").as(s"r$n")))
    val totals = base.select(col("grp") +: tcols: _*)
      .groupBy("grp")
      .agg(sum("h1").as("h1"),
        ((2 to maxN).map(n => sum(s"h$n").as(s"h$n")) ++
          (1 to maxN).map(n => sum(s"r$n").as(s"r$n"))): _*)

    val counts = totals.join(mtab, Seq("grp"), "left")
      .select(col("grp") +:
        (1 to maxN).map(n => coalesce(col(s"m$n"), lit(0L)).as(s"m$n")) ++:
        (1 to maxN).map(n => col(s"h$n")) ++:
        (1 to maxN).map(n => col(s"r$n")): _*)
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
