package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X92 — KMV (k-minimum-values) set sketches for cross-corpus overlap
  * (Bar-Yossef et al. 2002; the unbiased estimator form of Beyer,
  * Haas, Reinwald, Sismanis & Gemulla, SIGMOD 2007 — the theta-sketch
  * family's ancestor): each corpus keeps only its k lexicographically
  * smallest md5 digests per group, and the Jaccard similarity of two
  * corpora is estimated from those 2·k digests ALONE —
  * J ≈ |KMV_k(A ∪ B) ∩ KMV(A) ∩ KMV(B)| / |KMV_k(A ∪ B)| — with
  * neither corpus re-scanned at comparison time. That is the 100 TB
  * use: per-corpus sketches are k-row artifacts computed in one pass,
  * and every pairwise corpus comparison after that is sketch-sized.
  * The exact-Jaccard column the x92 query carries next to the estimate
  * is the test-SF audit baseline (it joins the full shingle sets);
  * production keeps the sketches and drops it.
  *
  * Determinism: "k smallest md5 hex strings" is a pure order statistic
  * on the string lane — no randomness, no engine-specific hex
  * arithmetic — so the sketch, the estimate, and the ppm numbers are
  * bit-identical across engines and the oracle re-derives them.
  *
  * Shape at 100 TB: min-k per group is computed as the x57/x85
  * two-level decomposition — rank within (group, first-hex-digit cell)
  * keeps ≤ 16·k survivors per group with every cell sorted in
  * parallel, then the global rank runs over survivors only — so no
  * single-partition sort ever sees corpus-sized data; the exchanges
  * carry digests, never text.
  */
object Kmv {

  /** The k lexicographically smallest distinct md5(valueCol) digests
    * per group: (grp, h). Two-level min-k; ties cannot exist after
    * distinct.
    */
  def sketch(df: DataFrame, groupCol: String, valueCol: String,
             k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k $k out of [2, 100000]")
    val digests = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), md5(col(valueCol)).as("h"))
      .distinct()
    val cell = Window.partitionBy(col("grp"), substring(col("h"), 1, 1))
      .orderBy(col("h"))
    val grp = Window.partitionBy(col("grp")).orderBy(col("h"))
    digests
      .withColumn("cr", row_number().over(cell))
      .filter(col("cr") <= k)
      .withColumn("r", row_number().over(grp))
      .filter(col("r") <= k)
      .select(col("grp"), col("h"))
  }

  /** X118 — theta-style SET ALGEBRA from two KMV sketches alone
    * (Beyer, Haas, Reinwald, Sismanis & Gemulla, SIGMOD 2007 — the
    * unbiased (k−1)/v_k estimator and its union/intersection
    * composition; the Apache DataSketches theta-sketch recipe): per
    * group, distinct-count estimates for A, B, A∪B, A∩B, A∖B and B∖A,
    * with NEITHER corpus re-scanned — every number derives from the
    * two k-row digest sets. The set-operation member the sketch family
    * lacked: HLL (x88) unions but cannot intersect; KMV's kept digests
    * make intersection and difference first-class.
    *
    * Estimator in EXACT integer lanes: v_k is the k-th smallest
    * digest's first 12 hex chars as a 2⁴⁸-scaled fraction, so
    * n̂ = (k−1)/v_k = (k−1)·2⁴⁸ div h_k — one integral division,
    * bit-identical in any engine (h_k floored at 1; k ≤ 16384 keeps
    * the coefficient inside BIGINT). A sketch with fewer than k rows
    * IS its whole set, so its count is exact — and the union sketch
    * below k rows makes intersection/difference exact too (the same
    * degenerate-case behavior as [[jaccardEst]]). Intersection and
    * differences scale the union estimate by the membership split of
    * the union sketch's k rows: n̂_∩ = n_both·n̂_∪ div n_u (the theta
    * composition). Products stay in BIGINT for cardinalities below
    * 2⁴⁹ — ~500× a 100 TB corpus's distinct-shingle count.
    *
    * Returns (grp, n_a, n_b, n_u, n_both, n_a_only, n_b_only, est_a,
    * est_b, est_union, est_intersect, est_a_only, est_b_only); groups
    * present on one side only report the other side as 0.
    */
  def setAlgebra(kmvA: DataFrame, kmvB: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 16384, s"k $k out of [2, 16384]")
    val coef = (k - 1).toLong * (1L << 48)
    def hv(c: Column): Column =
      conv(substring(c, 1, 12), 16, 10).cast("long")
    def stats(df: DataFrame, pfx: String): DataFrame =
      df.groupBy(col("grp")).agg(
        count(lit(1)).as(s"n_$pfx"), max(hv(col("h"))).as(s"hk_$pfx"))
    val inA = kmvA.select(col("grp"), col("h"), lit(1L).as("a"))
    val inB = kmvB.select(col("grp"), col("h"), lit(1L).as("b"))
    val u = inA.join(inB, Seq("grp", "h"), "full")
      .select(col("grp"), col("h"),
        coalesce(col("a"), lit(0L)).as("ina"),
        coalesce(col("b"), lit(0L)).as("inb"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("r") <= k)
    val us = u.groupBy(col("grp")).agg(
      count(lit(1)).as("n_u"), max(hv(col("h"))).as("hk_u"),
      sum(col("ina") * col("inb")).as("n_both"),
      sum(col("ina") * (lit(1L) - col("inb"))).as("n_a_only"),
      sum((lit(1L) - col("ina")) * col("inb")).as("n_b_only"))
    def est(n: String, hk: String): String =
      s"CASE WHEN $n < $k THEN $n ELSE $coef div greatest($hk, 1L) END"
    stats(kmvA, "a").join(stats(kmvB, "b"), Seq("grp"), "full")
      .join(us, Seq("grp"))
      .select(col("grp"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        col("n_u"), col("n_both"), col("n_a_only"), col("n_b_only"),
        col("hk_a"), col("hk_b"), col("hk_u"))
      .select(col("grp"), col("n_a"), col("n_b"), col("n_u"),
        col("n_both"), col("n_a_only"), col("n_b_only"),
        expr(est("n_a", "hk_a")).as("est_a"),
        expr(est("n_b", "hk_b")).as("est_b"),
        expr(est("n_u", "hk_u")).as("est_union"))
      .withColumn("est_intersect",
        expr("n_both * est_union div greatest(n_u, 1L)"))
      .withColumn("est_a_only",
        expr("n_a_only * est_union div greatest(n_u, 1L)"))
      .withColumn("est_b_only",
        expr("n_b_only * est_union div greatest(n_u, 1L)"))
  }

  /** Jaccard estimate per group from two sketches: the k smallest of
    * the union of the two sketches, intersected with both. Returns
    * (grp, n_u, est_jaccard_ppm) with n_u = |KMV_k(A ∪ B)| (< k only
    * when the union itself has fewer digests — then the estimate is
    * exact by construction).
    */
  def jaccardEst(kmvA: DataFrame, kmvB: DataFrame, k: Int): DataFrame = {
    require(k >= 2 && k <= 100000, s"k $k out of [2, 100000]")
    val inA = kmvA.select(col("grp"), col("h"), lit(1L).as("a"))
    val inB = kmvB.select(col("grp"), col("h"), lit(1L).as("b"))
    val u = inA.join(inB, Seq("grp", "h"), "full")
      .select(col("grp"), col("h"),
        (coalesce(col("a"), lit(0L)) * coalesce(col("b"), lit(0L)))
          .as("both"))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"))))
      .filter(col("r") <= k)
    u.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_u"), sum(col("both")).as("n_both"))
      .select(col("grp"), col("n_u"),
        expr("n_both * 1000000 div n_u").as("est_jaccard_ppm"))
  }
}
