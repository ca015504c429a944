package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X101 — bootstrap confidence intervals for corpus BLEU (Koehn 2004's
  * significance-testing recipe), resampled the way a 100 TB job
  * actually can: the POISSON bootstrap (each pair enters resample b
  * with multiplicity ~ Poisson(1), the with-replacement limit), which
  * is row-local — no resample ever materializes or shuffles pair
  * identities, each pair row just fans out B weighted count rows.
  *
  * Determinism: the multiplicity is the Poisson(1) inverse CDF applied
  * to the 32-bit md5 lane of (pid | seed | b) — the house [[Sample]]
  * hash — compared against PRECOMPUTED INTEGER thresholds
  * floor(cdf·2³²), so resampling is exact integer arithmetic both
  * engines replay bit-for-bit; multiplicity is capped at 8 (tail mass
  * ~1e-5). Per-(grp, b) counts are exact integer sums scored through
  * the same [[Bleu.withBleu]] estimator as the point score; the CI
  * bounds are order statistics (rank 2.5% / 97.5% of the B resample
  * scores, ties broken by b), picked by a grp-PARTITIONED window —
  * never a float aggregate, never a single-partition sort.
  */
object BleuCi {

  /** floor(2³² · P[Poisson(1) ≤ k]) for k = 0..7: multiplicity =
    * first k with hash < threshold, else 8.
    */
  val PoissonThresholds: Seq[Long] = Seq(1580030168L, 3160060337L,
    3950075421L, 4213413783L, 4279248373L, 4292415291L, 4294609777L,
    4294923276L)

  /** The multiplicity CASE over a 32-bit hash column — one fragment
    * shared textually with the oracle.
    */
  def poissonKSql(hashCol: String): String =
    // bare literals, no L suffix: both engines parse >2^31 as BIGINT
    "CASE " + PoissonThresholds.zipWithIndex.map { case (t, k) =>
      s"WHEN $hashCol < $t THEN $k "
    }.mkString + "ELSE 8 END"

  def bleuCi(pairs: DataFrame, grpCol: String, idCol: String,
             hypCol: String, refCol: String, maxN: Int = 4,
             nBoot: Int = 40, seed: String = "ci"): DataFrame = {
    require(nBoot >= 40 && nBoot <= 10000,
      s"nBoot $nBoot out of range [40, 10000] (below 40 the 2.5% rank is 0)")
    val loRank = math.max(1, (nBoot * 25) / 1000)
    val hiRank = math.min(nBoot, (nBoot * 975 + 999) / 1000)

    val pp = Bleu.perPairCounts(pairs, grpCol, idCol, hypCol, refCol, maxN)
    val sumCols = (1 to maxN).map(n => s"m$n") ++
      (1 to maxN).map(n => s"t$n") ++ Seq("lh", "lr")
    val boot = pp
      .withColumn("b", explode(sequence(lit(1), lit(nBoot))))
      .withColumn("h", conv(substring(md5(concat(
        col("pid").cast("string"), lit(s"|$seed|"),
        col("b").cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("k", expr(poissonKSql("h")).cast("long"))
      .groupBy("grp", "b")
      .agg(sum(col("k") * col("m1")).as("m1"),
        (sumCols.drop(1).map(c => sum(col("k") * col(c)).as(c))): _*)
      .withColumnRenamed("lh", "c").withColumnRenamed("lr", "r")
    val scored = Bleu.withBleu(boot, maxN)
      .withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(col("bleu"), col("b"))))
    val ci = scored.groupBy("grp").agg(
      max(when(col("rn") === loRank, col("bleu"))).as("ci_lo"),
      max(when(col("rn") === hiRank, col("bleu"))).as("ci_hi"),
      count(lit(1)).as("n_boot"))
    Bleu.corpusBleu(pairs, grpCol, idCol, hypCol, refCol, maxN)
      .select(col("grp"), col("bleu"))
      .join(ci, Seq("grp"))
  }

  /** X102 — the PAIRED bootstrap significance test itself (Koehn 2004
    * §3): two systems' hypotheses against one shared reference, scored
    * on the SAME resamples (identical Poisson multiplicities per pair —
    * pairing is what gives the test its power), then compared resample
    * by resample. wins_a / ties / n_boot are exact integers;
    * `significant` is the exact-integer 95% criterion
    * wins_a·1000 ≥ 950·n_boot; share_a is the one display double.
    */
  def bleuPairedTest(pairs: DataFrame, grpCol: String, idCol: String,
                     hypACol: String, hypBCol: String, refCol: String,
                     maxN: Int = 4, nBoot: Int = 40,
                     seed: String = "pt"): DataFrame = {
    require(nBoot >= 40 && nBoot <= 10000,
      s"nBoot $nBoot out of range [40, 10000]")
    import graft.functions.ClippedGramMatches.clippedGramMatches
    val base = pairs.select(col(grpCol).as("grp"), col(idCol).as("pid"),
      Bleu.nonEmptyTokens(col(hypACol)).as("ats"),
      Bleu.nonEmptyTokens(col(hypBCol)).as("bts"),
      Bleu.nonEmptyTokens(col(refCol)).as("rts"))
    // both systems' count lanes from ONE row-local projection
    val pp = base.select(Seq(col("grp"), col("pid"),
        clippedGramMatches(col("ats"), col("rts"), maxN).as("msa"),
        clippedGramMatches(col("bts"), col("rts"), maxN).as("msb")) ++
      (1 to maxN).flatMap(n => Seq(
        greatest(size(col("ats")) - (n - 1), lit(0)).cast("long").as(s"t${n}a"),
        greatest(size(col("bts")) - (n - 1), lit(0)).cast("long").as(s"t${n}b"))) ++
      Seq(size(col("ats")).cast("long").as("ca"),
        size(col("bts")).cast("long").as("cb"),
        size(col("rts")).cast("long").as("lr")): _*)
      .select(Seq(col("grp"), col("pid")) ++
        (1 to maxN).flatMap(n => Seq(
          element_at(col("msa"), n).as(s"m${n}a"),
          element_at(col("msb"), n).as(s"m${n}b"),
          col(s"t${n}a"), col(s"t${n}b"))) ++
        Seq(col("ca"), col("cb"), col("lr")): _*)

    val wcols = (1 to maxN).flatMap(n =>
      Seq(s"m${n}a", s"m${n}b", s"t${n}a", s"t${n}b")) ++
      Seq("ca", "cb", "lr")
    val boot = pp
      .withColumn("b", explode(sequence(lit(1), lit(nBoot))))
      .withColumn("h", conv(substring(md5(concat(
        col("pid").cast("string"), lit(s"|$seed|"),
        col("b").cast("string"))), 1, 8), 16, 10).cast("long"))
      .withColumn("k", expr(poissonKSql("h")).cast("long"))
      .groupBy("grp", "b")
      .agg(sum(col("k") * col(wcols.head)).as(wcols.head),
        wcols.drop(1).map(c => sum(col("k") * col(c)).as(c)): _*)

    def score(sfx: String, out: String): DataFrame =
      Bleu.withBleu(boot.select(Seq(col("grp"), col("b")) ++
          (1 to maxN).map(n => col(s"m$n$sfx").as(s"m$n")) ++
          (1 to maxN).map(n => col(s"t$n$sfx").as(s"t$n")) ++
          Seq(col(s"c$sfx").as("c"), col("lr").as("r")): _*), maxN)
        .select(col("grp"), col("b"), col("bleu").as(out))
    val cmp = score("a", "bleu_a").join(score("b", "bleu_b"), Seq("grp", "b"))
      .groupBy("grp").agg(
        sum(when(col("bleu_a") > col("bleu_b"), 1L).otherwise(0L)).as("wins_a"),
        sum(when(col("bleu_a") === col("bleu_b"), 1L).otherwise(0L)).as("ties"),
        count(lit(1)).as("n_boot"))
      .withColumn("share_a", expr(
        "round(CAST(wins_a AS DOUBLE) / n_boot, 6)"))
      .withColumn("significant", expr("wins_a * 1000 >= 950 * n_boot"))

    def point(hypCol: String, out: String): DataFrame =
      Bleu.corpusBleu(pairs, grpCol, idCol, hypCol, refCol, maxN)
        .select(col("grp"), col("bleu").as(out))
    point(hypACol, "bleu_a").join(point(hypBCol, "bleu_b"), Seq("grp"))
      .join(cmp, Seq("grp"))
  }
}
