package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X107/X108 — classifier-evaluation primitives with exact integer
  * lanes: the numbers a labeling/filtering pipeline quotes when it
  * claims two gates agree (chance-corrected) or a feature separates a
  * class (threshold-free).
  */
object Eval {

  /** X107 — Cohen's kappa (Cohen 1960): chance-corrected agreement
    * between two label columns. The entire statistic is one exact
    * rational: kappa = (n·agree − Σ_c a_c·b_c) / (n² − Σ_c a_c·b_c),
    * where a_c/b_c are the raters' marginal class counts — numerator
    * and denominator are emitted as exact BIGINTs beside the round-6
    * display ratio. A degenerate pair (both raters constant and equal,
    * den = 0) reports kappa 0 rather than dividing by zero.
    *
    * 100 TB shape: one scan for (n, agree), marginals are
    * class-cardinality aggregates, the cross term joins two
    * class-sized tables. Nothing beyond class grain shuffles twice.
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val pairs = df.select(col(aCol).as("a"), col(bCol).as("b"))
    val base = pairs.agg(count(lit(1)).as("n"),
      sum(when(col("a") === col("b"), 1L).otherwise(0L)).as("n_agree"))
    val cross = pairs.groupBy(col("a").as("c")).agg(count(lit(1)).as("ca"))
      .join(pairs.groupBy(col("b").as("c")).agg(count(lit(1)).as("cb")),
        Seq("c"))
      .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("cpe"))
    base.crossJoin(broadcast(cross))
      .select(col("n"), col("n_agree"),
        (col("n") * col("n_agree") - col("cpe")).as("num"),
        (col("n") * col("n") - col("cpe")).as("den"))
      .withColumn("kappa", expr(
        """CASE WHEN den = 0 THEN CAST(0 AS DOUBLE)
          |ELSE round(CAST(num AS DOUBLE) / den, 6) END""".stripMargin))
  }

  /** X108 — exact ROC-AUC of an integer score against a boolean label,
    * per group (Mann-Whitney U with average-rank tie handling, exactly):
    * 2·AUC·n_p·n_n = Σ_scores c_p(s)·(2·below_n(s) + c_n(s)), every
    * term an exact integer, ties contributing their half-credit without
    * any float. num2/den2 ride beside the round-6 display ratio.
    *
    * 100 TB shape: one scan into a (group, score)-TYPE table (integer
    * features have bounded score types); the cumulative below-count is
    * a group-PARTITIONED window over that type table; the output is
    * group-cardinality-sized. num2/den2 are emitted as BIGINT — a
    * corpus where n_p·n_n exceeds 2⁶³ must reseat them on
    * DECIMAL(38,0) (the x55/x58 lane); the require makes that seam
    * loud at the audit grain this runs at.
    */
  /** X112 — Kendall rank correlation between each method's top-k
    * ranking and the exact ranking, over their SHARED candidates (the
    * x43 recall audit says "found them"; this says "in the right
    * order"). Both rankings are tie-free by construction (deterministic
    * id tie-breaks), so tau = (C − D) / P exactly, with C/D/P exact
    * integer sums of per-query pair comparisons. Per-query pair work is
    * k²-bounded — audit-sized like the recall join, never corpus-sized.
    */
  def kendallTau(methods: Seq[(String, DataFrame)],
                 exact: DataFrame): DataFrame = {
    require(methods.nonEmpty, "need at least one method to compare")
    val truth = exact.select(col("qid"), col("cid"),
      col("rank").as("re"))
    methods.map { case (name, df) =>
      val shared = df.select(col("qid"), col("cid"), col("rank").as("ra"))
        .join(truth, Seq("qid", "cid"))
      val pairs = shared.as("x").join(shared.as("y"),
          col("x.qid") === col("y.qid") && col("x.cid") < col("y.cid"))
        .select(
          ((col("x.re") - col("y.re")).cast("long") *
            (col("x.ra") - col("y.ra")).cast("long")).as("prod"))
      pairs.agg(
          sum(when(col("prod") > 0, 1L).otherwise(0L)).as("concordant"),
          sum(when(col("prod") < 0, 1L).otherwise(0L)).as("discordant"),
          count(lit(1)).as("n_pairs"))
        .select(lit(name).as("method"),
          coalesce(col("concordant"), lit(0L)).as("concordant"),
          coalesce(col("discordant"), lit(0L)).as("discordant"),
          col("n_pairs"))
    }.reduce(_ unionByName _)
      .withColumn("tau", expr(
        """CASE WHEN n_pairs = 0 THEN CAST(0 AS DOUBLE)
          |ELSE round(CAST(concordant - discordant AS DOUBLE) / n_pairs, 6)
          |END""".stripMargin))
  }

  /** X113 — nDCG@k of each method against binary relevance (membership
    * in the exact top-k): DCG = Σ rel_i / log2(i+1), with the position
    * weights PRE-SCALED to integer micro-units (round(10⁶/log2(i+1)) —
    * a fixed k-entry table both engines inline identically), so the
    * per-query and corpus sums are exact integers and no float ever
    * crosses a partition. The ideal DCG is the same weight table's
    * prefix sum at min(k, n_relevant); ndcg is the one round-6 ratio.
    * Position emphasis is what [[kendallTau]]'s uniform pairs lack —
    * a swap at rank 1 costs nDCG far more than one at rank k.
    *
    * AVERAGING CONTRACT: this is MICRO-averaged nDCG — corpus sum of
    * DCG over corpus sum of ideal DCG — not the field-standard mean of
    * per-query nDCG (trec_eval's form). Micro keeps every lane an
    * exact integer until one final division (the repo's fixed-point
    * discipline) and weights every query by its ideal mass; values
    * will NOT match per-query-averaged tooling on skewed relevance
    * counts. The same contract applies to [[Rouge.corpusRouge]]'s
    * aggregate-count F1.
    */
  /** The micro-unit position weights — ONE table shared with the
    * oracle side (interpolated as literals there), so the log never
    * evaluates in two engines.
    */
  def ndcgWeightsMicro(k: Int): IndexedSeq[Long] = (1 to k).map(i =>
    math.round(1e6 / (math.log(i + 1) / math.log(2))))

  def ndcgAt(methods: Seq[(String, DataFrame)], exact: DataFrame,
             k: Int): DataFrame = {
    require(k >= 1 && k <= 100, s"k $k out of range [1, 100]")
    val wMicro = ndcgWeightsMicro(k)
    val wCase = (1 to k).map(i =>
      s"WHEN rank = $i THEN ${wMicro(i - 1)}").mkString(
      "CASE ", " ", " ELSE 0 END")
    val idealPrefix = wMicro.scanLeft(0L)(_ + _) // idealPrefix(m) = Σ first m
    val idealCase = (0 to k).map(m =>
      s"WHEN n_rel = $m THEN ${idealPrefix(m)}").mkString(
      "CASE ", " ", s" ELSE ${idealPrefix(k)} END")

    val truth = exact.select(col("qid"), col("cid"))
    // per-query ideal: min(k, n_relevant) weights — n_relevant is the
    // exact list's size per query (= k normally; fewer on tiny corpora)
    val ideal = truth.groupBy("qid")
      .agg(least(count(lit(1)), lit(k.toLong)).as("n_rel"))
      .withColumn("idcg_micro", expr(idealCase))
      .agg(sum("idcg_micro").as("idcg_micro"))

    methods.map { case (name, df) =>
      df.filter(col("rank") <= k)
        .join(truth, Seq("qid", "cid"), "left_semi")
        .select(expr(wCase).as("w"))
        .agg(coalesce(sum("w"), lit(0L)).as("dcg_micro"))
        .select(lit(name).as("method"), col("dcg_micro"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(ideal))
      .withColumn("ndcg", expr(
        """CASE WHEN idcg_micro = 0 THEN CAST(0 AS DOUBLE)
          |ELSE round(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6)
          |END""".stripMargin))
  }

  /** X133 — Wilson score interval (Wilson 1927) for per-group binomial
    * rates: the CI that stays calibrated at small n and extreme p̂,
    * where the normal-approximation interval collapses or escapes
    * [0, 1] — the right way to read "source X passes the gate 94% of
    * the time" when X has 20 documents. lo/hi = (p̂ + z²/2n ∓
    * z·sqrt(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n), computed in ONE fixed
    * parenthesization over the exact (n, s) counts and rounded to 6 —
    * replayable by any engine from the two integers.
    *
    * SHAPE AT 100 TB: one group-grain exchange (count + conditional
    * count with map-side combine); the interval math is a projection
    * over group-sized rows. Contrast with the x101 bootstrap: Wilson
    * prices a BINOMIAL rate in closed form — no resampling, no
    * per-replica lanes — which is exactly right for pass/fail gates
    * and exactly wrong for BLEU-style sufficient statistics (where the
    * bootstrap earns its cost).
    *
    * Output: (grp, n, n_hit, rate, lo, hi) per group, hitCol read as
    * a boolean predicate column.
    */
  def wilsonRates(df: DataFrame, grpCol: String, hitCol: String,
                  z: Double = 1.96): DataFrame =
    wilsonOf(df.groupBy(col(grpCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col(hitCol).cast("long")).as("n_hit")), z)

  /** The interval projection over an already-built (grp, n, n_hit)
    * count table — the kernel the streaming twin's snapshots share
    * with the batch operator (counts from disjoint batches merge by
    * pure addition, so one code path covers both).
    */
  private[graft] def wilsonOf(counts: DataFrame,
                              z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive: $z")
    counts.select(col("grp"), col("n"), col("n_hit"),
      round(col("n_hit").cast("double") / col("n"), 6).as("rate"),
      expr(wilsonSql(z, "-")).as("lo"),
      expr(wilsonSql(z, "+")).as("hi"))
  }

  /** The Wilson bound as SQL text — ONE parenthesization, shared
    * verbatim with the DuckDB oracle so the double seams cannot
    * diverge. p̂ enters as the exact ratio n_hit/n; everything is
    * arithmetic over (n, n_hit, z).
    */
  def wilsonSql(z: Double, sign: String): String = {
    val z2 = s"($z * $z)"
    s"""round(((CAST(n_hit AS DOUBLE) / n + $z2 / (2 * n))
       |  $sign $z * sqrt((CAST(n_hit AS DOUBLE) / n)
       |      * (1 - CAST(n_hit AS DOUBLE) / n) / n
       |    + $z2 / (4 * CAST(n AS DOUBLE) * n)))
       |  / (1 + $z2 / n), 6)""".stripMargin.replace("\n", " ")
  }

  def aucExact(scored: DataFrame, grpCol: String, scoreCol: String,
               labelCol: String): DataFrame = {
    val sg = scored.select(col(grpCol).as("grp"),
        col(scoreCol).cast("long").as("s"), col(labelCol).as("lbl"))
      .groupBy("grp", "s")
      .agg(sum(when(col("lbl"), 1L).otherwise(0L)).as("cp"),
        sum(when(!col("lbl"), 1L).otherwise(0L)).as("cn"))
    val below = Window.partitionBy("grp").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, -1)
    sg.withColumn("cb", coalesce(sum("cn").over(below), lit(0L)))
      .groupBy("grp")
      .agg(sum("cp").as("np"), sum("cn").as("nn"),
        sum(col("cp") * (col("cb") * 2 + col("cn"))).as("num2"))
      .withColumn("den2", col("np") * col("nn") * 2)
      .withColumn("auc", expr(
        """CASE WHEN den2 = 0 THEN CAST(0 AS DOUBLE)
          |ELSE round(CAST(num2 AS DOUBLE) / den2, 6) END""".stripMargin))
  }
}
