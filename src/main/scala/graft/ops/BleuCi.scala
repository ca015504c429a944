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
}
