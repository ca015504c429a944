package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X52 — interpolated Kneser-Ney 5-gram language-model scoring: the
  * filter real pretraining pipelines actually run (CCNet-style KenLM
  * perplexity gates are order-5 Kneser-Ney models), upgrading X26's
  * Laplace bigram to the standard formulation (Kneser & Ney 1995; Chen
  * & Goodman 1998's interpolated variant with a fixed absolute
  * discount).
  *
  * Model, with fixed discount D = 3/4 at every order:
  *  - order 5 (raw counts):  p5(w|h) = max(c5(hw) - D, 0)/tot5(h)
  *      + D·N1+(h·)/tot5(h) · p4,   tot5(h) = Σ_w c5(hw)
  *  - orders 4..2 (CONTINUATION counts — the KN insight that a word's
  *    backoff mass is how many distinct contexts it completes, not how
  *    often): cont_k(u) = |{v : c_{k+1}(v·u) > 0}| over the distinct
  *    raw (k+1)-gram types;  p_k(w|h) = max(cont_k(hw) - D, 0)/den_k(h)
  *      + D·N1+(h·)/den_k(h) · p_{k-1},  den_k(h) = Σ_w cont_k(hw)
  *  - unigram: p1(w) = max(cont1(w) - D, 0)/T + D·V1/T · p0 with
  *    T = Σ_w cont1(w) (# distinct bigram types), V1 = |{w : cont1 >
  *    0}|, and the uniform floor p0 = 1/V over the reference vocabulary
  *    (unseen words keep nonzero mass).
  *  - an UNSEEN history at any order backs off wholesale: p_k := p_{k-1}
  *    (λ = 1 — the history contributes no evidence).
  *
  * DETERMINISM: D = 3/4 stays rational, so with probabilities held as
  * NANO-fixed-point integers (p_fix = floor(p·10^9)) every order folds
  * into ONE exact integral division —
  *   p_k = (max(4·cnt − 3, 0)·S  +  3·n1p·p_{k-1})  div  (4·den)
  * — making per-position scores and per-document sums bit-identical in
  * any engine (the x26/x37 fixed-point discipline; the DuckDB oracle
  * replays the whole model from the data). Magnitude bound: numerators
  * stay under 2^63 while per-history totals and type counts are below
  * ~2.3·10^9, which holds far past any realistic reference slice; past
  * that, re-seat the arithmetic in DECIMAL(38,0)/HUGEINT (the
  * [[Sample.mixtureJoined]] precedent).
  *
  * SHAPE AT 100 TB: training is 5 exploded aggregations over the
  * REFERENCE slice (n-gram counts at each order, map-side combined)
  * plus 4 distinct-type passes — all vocabulary-sized outputs, the
  * persisted model artifact of a real pipeline. Scoring explodes each
  * document's 5-gram positions ONCE, equi-joins the 9 model tables on
  * their n-gram keys (AQE broadcasts small models; big-big joins
  * shuffle on the n-gram key), and re-aggregates per document. The
  * corpus is never row-multiplied by order: every position carries its
  * 9 keys as projections of one 5-gram string.
  */
object KneserNey {

  /** 10^9 nano-probability fixed point (not [[FixedPoint.Scale]]=10^12:
    * the λ-term product 3·n1p·p_fix must clear 2^63 with type counts in
    * the billions — see the magnitude bound above).
    */
  val Scale = 1000000000L

  private[graft] def ngramRows(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(
      graft.functions.Shingles.shingles(split(col(textCol), " "), n)).as("g"))

  /** Distinct (n)-gram types keyed by their (n-1)-token suffix: the
    * continuation-count table cont_{n-1}.
    */
  private def contTable(ref: DataFrame, textCol: String, n: Int,
                        key: String, cn: String): DataFrame =
    ngramRows(ref, textCol, n).distinct()
      .groupBy(substring_index(col("g"), " ", -(n - 1)).as(key))
      .agg(count(lit(1)).as(cn))

  /** The trained model as its 9 join tables + the 1-row constants —
    * the persisted artifact a production run trains once; also the seam
    * [[graft.streaming.KnLmStream]] rebuilds incrementally from its
    * appended state.
    */
  final case class Model(c5: DataFrame, h5: DataFrame,
                         cont4: DataFrame, hist4: DataFrame,
                         cont3: DataFrame, hist3: DataFrame,
                         cont2: DataFrame, hist2: DataFrame,
                         cont1: DataFrame, consts: DataFrame) {
    /** Every table pinned via lazy localCheckpoint — the materialized
      * persisted-artifact form a session shares across consumers (x52
      * scoring, x56 bucketing, x58 discount estimation + scoring):
      * training runs once, each table is vocabulary-sized.
      */
    def pinned: Model = Model(
      c5.localCheckpoint(false), h5.localCheckpoint(false),
      cont4.localCheckpoint(false), hist4.localCheckpoint(false),
      cont3.localCheckpoint(false), hist3.localCheckpoint(false),
      cont2.localCheckpoint(false), hist2.localCheckpoint(false),
      cont1.localCheckpoint(false), consts.localCheckpoint(false))
  }

  /** Train all model tables on `ref` (see object doc for the schema of
    * each).
    */
  def modelTables(ref: DataFrame, textCol: String): Model = {
    val c5 = ngramRows(ref, textCol, 5)
      .groupBy(col("g")).agg(count(lit(1)).as("c5"))
    val h5 = c5.groupBy(substring_index(col("g"), " ", 4).as("h4"))
      .agg(sum(col("c5")).as("tot5"), count(lit(1)).as("n1p5"))
    val cont4 = contTable(ref, textCol, 5, "u4", "cn4")
    val hist4 = cont4.groupBy(substring_index(col("u4"), " ", 3).as("h3"))
      .agg(sum(col("cn4")).as("den4"), count(lit(1)).as("n1p4"))
    val cont3 = contTable(ref, textCol, 4, "u3", "cn3")
    val hist3 = cont3.groupBy(substring_index(col("u3"), " ", 2).as("h2"))
      .agg(sum(col("cn3")).as("den3"), count(lit(1)).as("n1p3"))
    val cont2 = contTable(ref, textCol, 3, "u2", "cn2")
    val hist2 = cont2.groupBy(substring_index(col("u2"), " ", 1).as("h1"))
      .agg(sum(col("cn2")).as("den2"), count(lit(1)).as("n1p2"))
    val cont1 = contTable(ref, textCol, 2, "w", "cn1")
    // three 1-row reductions -> one broadcast constants row
    val consts = cont1.agg(sum(col("cn1")).as("tc1"), count(lit(1)).as("v1"))
      .crossJoin(ref.select(explode(split(col(textCol), " ")).as("t"))
        .agg(countDistinct(col("t")).as("v")))
    Model(c5, h5, cont4, hist4, cont3, hist3, cont2, hist2, cont1, consts)
  }

  /** Score every document's full 5-gram positions under a KN model
    * trained on `ref`. Output per document (docs shorter than 5 tokens
    * have no positions and emit no row): position count, unseen-5-gram
    * count, exact fixed-point sum and integral mean of p5.
    */
  def score(docs: DataFrame, ref: DataFrame,
            idCol: String, textCol: String): DataFrame =
    scoreWithModel(docs, idCol, textCol, modelTables(ref, textCol))

  /** The scoring half, against an already-built [[Model]] (fixed
    * D = 3/4 — [[scoreModified]] runs the same chain with estimated
    * discounts).
    */
  def scoreWithModel(docs: DataFrame, idCol: String, textCol: String,
                     m: Model): DataFrame =
    scoreChain(docs, idCol, textCol, m, estimated = false)

  private def scoreChain(docs: DataFrame, idCol: String, textCol: String,
                         m: Model, estimated: Boolean): DataFrame = {
    val Model(c5, h5, cont4, hist4, cont3, hist3, cont2, hist2, cont1,
      consts) = m
    // ---- scoring: one 5-gram explode, 9 key projections, left joins ----
    val sc = docs.select(col(idCol), explode(
        graft.functions.Shingles.shingles(split(col(textCol), " "), 5)).as("g"))
      .withColumn("h4", substring_index(col("g"), " ", 4))
      .withColumn("u4", substring_index(col("g"), " ", -4))
      .withColumn("h3", substring_index(col("u4"), " ", 3))
      .withColumn("u3", substring_index(col("g"), " ", -3))
      .withColumn("h2", substring_index(col("u3"), " ", 2))
      .withColumn("u2", substring_index(col("g"), " ", -2))
      .withColumn("h1", substring_index(col("u2"), " ", 1))
      .withColumn("w", substring_index(col("g"), " ", -1))

    // the per-order fold: fixed discounts stay in BIGINT; estimated
    // discounts (b up to corpus scale) re-seat every product in
    // DECIMAL(38,0) — operands cast BEFORE multiplying so nothing
    // overflows long on the way in
    def dec(e: String) = s"CAST($e AS DECIMAL(38,0))"
    def order(k: Int, cnt: String, n1p: String, den: String,
              pLow: String): String =
      if (!estimated)
        s"IF($den IS NULL, $pLow, " +
          s"(greatest(4 * coalesce($cnt, 0L) - 3, 0L) * ${Scale}L " +
          s"+ 3 * $n1p * $pLow) div (4 * $den))"
      else
        s"IF($den IS NULL, $pLow, " +
          s"(greatest(${dec(s"b$k")} * coalesce($cnt, 0L) - a$k, ${dec("0")}) " +
          s"* ${Scale}L + ${dec(s"a$k")} * $n1p * $pLow) " +
          s"div (${dec(s"b$k")} * $den))"
    val p1Expr =
      if (!estimated)
        s"(greatest(4 * coalesce(cn1, 0L) - 3, 0L) * ${Scale}L " +
          "+ 3 * v1 * p0) div (4 * tc1)"
      else
        s"(greatest(${dec("b1")} * coalesce(cn1, 0L) - a1, ${dec("0")}) " +
          s"* ${Scale}L + ${dec("a1")} * v1 * p0) div (${dec("b1")} * tc1)"

    val scored = sc
      .join(c5, Seq("g"), "left")
      .join(h5, Seq("h4"), "left")
      .join(cont4, Seq("u4"), "left")
      .join(hist4, Seq("h3"), "left")
      .join(cont3, Seq("u3"), "left")
      .join(hist3, Seq("h2"), "left")
      .join(cont2, Seq("u2"), "left")
      .join(hist2, Seq("h1"), "left")
      .join(cont1, Seq("w"), "left")
      .crossJoin(broadcast(consts))
      .withColumn("p0", expr(s"${Scale}L div v"))
      .withColumn("p1", expr(p1Expr))
      .withColumn("p2", expr(order(2, "cn2", "n1p2", "den2", "p1")))
      .withColumn("p3", expr(order(3, "cn3", "n1p3", "den3", "p2")))
      .withColumn("p4", expr(order(4, "cn4", "n1p4", "den4", "p3")))
      .withColumn("p5", expr(order(5, "c5", "n1p5", "tot5", "p4")))

    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(when(coalesce(col("c5"), lit(0L)) === 0L, 1L).otherwise(0L))
          .as("n_unseen"),
        sum(col("p5")).as("sum_p_fix"))
      .withColumn("avg_p_fix", expr("sum_p_fix div n_ngrams"))
  }

  /** X58 — Kneser-Ney with ESTIMATED discounts (Ney, Essen & Kneser
    * 1994's leaving-one-out estimate, the one Chen & Goodman 1998
    * standardize): D_k = n1 / (n1 + 2·n2) per order, where n1/n2 are
    * the number of entries in that order's count table with count
    * exactly 1 / exactly 2. The discount becomes a data-derived
    * RATIONAL a_k/b_k, so the one-division-per-order fold survives:
    *   p_k = (max(b_k·cnt − a_k, 0)·S + a_k·n1p·p_{k-1}) div (b_k·den)
    * — but b_k is corpus-sized, so the numerator outgrows BIGINT and
    * the arithmetic re-seats in DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB), the [[Sample.mixtureJoined]] precedent: every
    * intermediate stays under ~10^30, exactness is preserved, and the
    * oracle replays discount estimation and scoring bit-for-bit.
    *
    * Degenerate guard: a count table with NO singletons (n1 = 0 —
    * possible only on tiny corpora) makes the estimate 0 (or 0/0);
    * that order falls back to the fixed D = 3/4 of [[score]],
    * deterministically (spec-pinned).
    *
    * Same tables, same join shape as [[score]]; training additionally
    * pays the count-of-count estimate as ONE multi-order pass: the five
    * model tables union as (order, count) rows and a single aggregation
    * emits all ten n1/n2 numbers — one job, one 1-row output, no
    * crossJoin chain (vs the five per-table passes this replaces; the
    * values are identical by construction, spec- and oracle-pinned).
    */
  def scoreModified(docs: DataFrame, ref: DataFrame,
                    idCol: String, textCol: String): DataFrame =
    scoreModifiedWithModel(docs, idCol, textCol, modelTables(ref, textCol))

  /** The estimated-discount scoring half against an already-built
    * [[Model]] — the seam that lets x52 and x58 share ONE training run
    * (the model is the persisted artifact; the discount estimate is a
    * count-of-count pass over its tables, not over the corpus).
    */
  def scoreModifiedWithModel(docs: DataFrame, idCol: String,
                             textCol: String, m: Model): DataFrame = {
    val cc = Seq(
      (m.c5, "c5", 5), (m.cont4, "cn4", 4), (m.cont3, "cn3", 3),
      (m.cont2, "cn2", 2), (m.cont1, "cn1", 1))
      .map { case (t, cnt, k) => t.select(lit(k).as("k"), col(cnt).as("cnt")) }
      .reduce(_.unionByName(_))
    val n12 = (1 to 5).flatMap { k =>
      Seq(
        sum(when(col("k") === k && col("cnt") === 1L, 1L).otherwise(0L))
          .as(s"n1_$k"),
        sum(when(col("k") === k && col("cnt") === 2L, 1L).otherwise(0L))
          .as(s"n2_$k"))
    }
    val dConsts = cc.agg(n12.head, n12.tail: _*)
      .select((1 to 5).flatMap(k => Seq(
        expr(s"IF(n1_$k = 0, 3L, n1_$k)").as(s"a$k"),
        expr(s"IF(n1_$k = 0, 4L, n1_$k + 2 * n2_$k)").as(s"b$k"))): _*)
    scoreChain(docs, idCol, textCol,
      m.copy(consts = m.consts.crossJoin(dConsts)),
      estimated = true)
  }

  /** X56 — CCNet-style perplexity bucketing: split the corpus into
    * head/middle/tail by LM score, the standard downstream use of the
    * [[score]] filter (CCNet trains on head+middle, drops tail; head
    * docs are the most reference-like). Tertile THRESHOLDS derive from
    * the REFERENCE slice's scores only — exactly CCNet's recipe (its
    * thresholds come from the Wikipedia-trained model's distribution,
    * then apply corpus-wide as constants) — so the one totally-ordered
    * window below runs over the reference-sized score table, never the
    * corpus; corpus rows get their bucket from a broadcast 1-row
    * threshold join, scan-side.
    *
    * Exactness: cut ranks are ceil(n/3) and ceil(2n/3) in pure integer
    * arithmetic ((n+2) div 3, (2n+2) div 3), thresholds are the exact
    * fixed-point scores at those ranks (ties to the lower doc id), and
    * assignment is an integer comparison — bucket boundaries are
    * bit-identical in any engine. Docs tying a threshold value share
    * its bucket (value-based assignment, the CCNet behavior).
    *
    * `scored`: the [[score]] output for the whole corpus; `refIds`: the
    * reference slice's ids (one column named idCol). Scoring runs once
    * — reference rows are selected from `scored` by semi-join, not
    * re-scored.
    */
  def perplexityBuckets(scored: DataFrame, refIds: DataFrame,
                        idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val refSc = scored.join(refIds, Seq(idCol), "left_semi")
      .select(col(idCol), col("avg_p_fix"))
    // an empty reference slice (refIds disjoint from scored) would make
    // both tertile thresholds NULL and silently bucket EVERYTHING as
    // 'tail' — refuse loudly instead (mirror of recallAudit's guard).
    // The guard lives INSIDE the plan (t1 is NULL iff the slice was
    // empty; with n >= 1 both cut ranks land on a real row): a driver
    // isEmpty here would run the whole scoring DAG once at plan-build
    // time and again at the caller's action.
    val guardedBucket = when(col("t1").isNull, raise_error(lit(
      "perplexityBuckets: reference slice is empty (refIds disjoint " +
        "from scored?) — thresholds would be NULL and every doc would " +
        "bucket as 'tail'"))).otherwise(bucketOf)
    scored.crossJoin(broadcast(tertileThresholds(refSc, idCol)))
      .select(col(idCol), col("avg_p_fix"), guardedBucket.as("bucket"))
  }

  /** The CCNet tertile cut over a (idCol, avg_p_fix) reference slice:
    * ONE row (t1, t2) — the scores at integer cut ranks (n+2) div 3 and
    * (2n+2) div 3 of the descending score order (ties broken by id).
    * Shared by [[perplexityBuckets]] and the streaming twin
    * ([[graft.streaming.PplBucketStream]]), which must cut the SAME way
    * for its point-in-time contract to reduce to this operator. The
    * caller guards against an empty slice (both thresholds come back
    * NULL) — batch refuses loudly, the stream treats it as warm-up.
    */
  def tertileThresholds(refSc: DataFrame, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    refSc
      .withColumn("r", row_number().over(
        Window.orderBy(col("avg_p_fix").desc, col(idCol))))
      .crossJoin(broadcast(refSc.agg(count(lit(1)).as("n"))))
      .agg(
        max(expr("IF(r = (n + 2) div 3, avg_p_fix, NULL)")).as("t1"),
        max(expr("IF(r = (2 * n + 2) div 3, avg_p_fix, NULL)")).as("t2"))
  }

  /** head/middle/tail assignment against in-scope t1/t2 threshold
    * columns — the value-based tie rule both bucketing forms share.
    */
  private[graft] def bucketOf: org.apache.spark.sql.Column =
    when(col("avg_p_fix") >= col("t1"), lit("head"))
      .when(col("avg_p_fix") >= col("t2"), lit("middle"))
      .otherwise(lit("tail"))
}
