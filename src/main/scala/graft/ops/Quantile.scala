package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X91 — mergeable ε-approximate quantiles (the Munro & Paterson 1980
  * sampling idea in the one-pass weighted form of Manku, Rajagopalan &
  * Lindsay 1998): the quantile member of the sketch family, next to
  * cardinality (x83/x88) and frequency (x89). Each of `shards`
  * partitions sorts ITS OWN values and keeps every step-th one
  * (step = ceil(n_s/k)) carrying weight = the rows it stands for, plus
  * the partition maximum carrying the remainder — so weights sum to
  * n_s exactly and the summary is ≤ shards·(k+1) weighted rows per
  * group REGARDLESS of corpus size. Quantile φ is then read off the
  * summary's cumulative weight. Summaries MERGE by union (weights just
  * concatenate), which is why the shape survives a 1000-executor
  * fan-in: per-executor summaries roll up without re-sorting anything.
  *
  * Rank-error bound, asserted IN-PLAN rather than cited: a kept row's
  * weight w means the estimate's true rank can sit anywhere inside
  * that w-row gap, so the summary-rank vs true-rank gap is at most
  * max-gap per shard summed = n/k + shards rows; an estimate outside
  * the bound aborts the query (raise_error) instead of hashing green.
  *
  * Determinism: every quantity is an exact integer — values are kept
  * (not interpolated, the percentile_disc convention: smallest v whose
  * cumulative weight reaches ceil(φ·n)), ranks are row_numbers with a
  * pinned (value, id) tie order, shard = id mod shards, and the
  * in-summary cumulative order is (value, shard) — so Spark and DuckDB
  * reproduce the summary and the estimates bit-for-bit.
  *
  * Shape at 100 TB: the per-(group, shard) sort is the one real cost
  * and it is embarrassingly parallel (window partitioned by group AND
  * shard — no global sort anywhere); the cumulative pass runs over the
  * summary only. The exact-rank audit column is the test-SF baseline,
  * production drops it.
  */
object Quantile {

  /** (grp, v, w) weighted summary, ≤ shards·(k+1) rows per group.
    * `idCol` must be unique per row (the deterministic tie-break and
    * the shard assignment).
    */
  def summary(df: DataFrame, groupCol: String, valueCol: String,
              idCol: String, shards: Int, k: Int): DataFrame = {
    require(shards >= 2 && shards <= 1024,
      s"shards $shards out of [2, 1024]")
    require(k >= 2 && k <= 100000, s"k $k out of [2, 100000]")
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("v"),
        col(idCol).as("id"), (col(idCol) % shards).as("shard"))
    val byShard = Window.partitionBy(col("grp"), col("shard"))
    val r = row_number().over(byShard.orderBy(col("v"), col("id")))
    base
      .withColumn("r", r)
      .withColumn("n_s", count(lit(1)).over(byShard))
      .withColumn("step", expr(s"(n_s + $k - 1) div $k"))
      .withColumn("w", expr(
        """CASE WHEN r % step = 0 THEN step
          |     WHEN r = n_s THEN n_s % step
          |     ELSE 0 END""".stripMargin))
      .filter(col("w") > 0)
      .select(col("grp"), col("shard"), col("v"), col("w"))
  }

  /** Per-group φ-quantile estimates from a summary, with the exact
    * audit: for each φ (in ppm), the smallest summary value whose
    * cumulative weight reaches target = ceil(φ·n/10^6), the estimate's
    * TRUE RANK INTERVAL in `df` — [count(< est) + 1, count(<= est)],
    * the right audit under duplicates, where a single point rank is
    * meaningless — and the ε-quantile guarantee asserted in-plan:
    * rank_hi >= target always (the chosen row's cumulative weight
    * undercounts true rank), and rank_lo <= target + n/k + shards
    * (values below est are covered by summary weight < target plus at
    * most one straddling step-block per shard). Returns
    * (grp, n, phi_ppm, est, rank_lo, rank_hi, target, err_ppm) with
    * err_ppm = the target's distance to the rank interval (0 inside).
    */
  /** Per-group φ-quantile estimates from a summary ALONE — the
    * production read path (no truth join, no audit columns), shared by
    * [[estimate]] and the streaming twin
    * ([[graft.streaming.QuantileStream]]) so the two cannot drift on
    * the target/pick arithmetic. Returns (grp, phi_ppm, n, target,
    * est). Deterministic under merged (multi-batch) summaries: tied
    * (v, shard) rows can cumulate in any order, but "some row of value
    * v reaches the target" depends only on the total weight ≤ v, so
    * the min-v pick is order-free.
    */
  def estimateFromSummary(summ: DataFrame,
                          phisPpm: Seq[Long]): DataFrame = {
    require(phisPpm.nonEmpty &&
      phisPpm.forall(p => p >= 1 && p <= 999999),
      s"phisPpm out of [1, 999999]: $phisPpm")
    val cum = Window.partitionBy(col("grp"))
      .orderBy(col("v"), col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withCum = summ
      .withColumn("cw", sum(col("w")).over(cum))
      .withColumn("n", sum(col("w")).over(Window.partitionBy(col("grp"))))
    // BIGINT lane for the phi literals (bare ints would explode as INT
    // and leak an INT column into the output schema)
    val phis = phisPpm.map(p => s"CAST($p AS BIGINT)").mkString(", ")
    // one row per (summary row, phi); keep the first row reaching the
    // target cumulative weight
    withCum
      .select(col("grp"), col("v"), col("cw"), col("n"),
        explode(expr(s"array($phis)")).as("phi_ppm"))
      .withColumn("target", expr("(phi_ppm * n + 999999) div 1000000"))
      .filter(col("cw") >= col("target"))
      .groupBy(col("grp"), col("phi_ppm"), col("n"), col("target"))
      .agg(min(col("v")).as("est"))
  }

  def estimate(summ: DataFrame, df: DataFrame, groupCol: String,
               valueCol: String, phisPpm: Seq[Long], shards: Int,
               k: Int): DataFrame = {
    val est = estimateFromSummary(summ, phisPpm)
    val truth = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), col(valueCol).as("tv"))
    est.join(truth, Seq("grp"))
      .groupBy(col("grp"), col("phi_ppm"), col("n"), col("target"),
        col("est"))
      .agg(
        (sum(when(col("tv") < col("est"), 1L).otherwise(0L)) + 1L)
          .as("rank_lo"),
        sum(when(col("tv") <= col("est"), 1L).otherwise(0L))
          .as("rank_hi"))
      .select(col("grp"), col("n"), col("phi_ppm"), col("est"),
        col("rank_lo"), col("rank_hi"), col("target"),
        expr(
          s"""CASE WHEN rank_hi < target
             |       OR rank_lo > target + n div $k + $shards
             |  THEN CAST(raise_error('quantile summary outside its rank bound') AS BIGINT)
             |  ELSE greatest(rank_lo - target, target - rank_hi, 0)
             |       * 1000000 div n
             |END""".stripMargin).as("err_ppm"))
  }
}
