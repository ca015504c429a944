package graft.ops

import org.apache.spark.sql.DataFrame
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
