package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X37 — DISTRIBUTED Lloyd k-means over an embedding column: the
  * cluster-scale complement of [[Similarity.trainCoarseCentroids]]'
  * driver-local trainer. The driver trainer is the right tool while a
  * bounded sample represents the corpus; this is the right tool when it
  * doesn't — every Lloyd round is a full corpus pass expressed as ONE
  * map-side-combined aggregation (k×dim running sums), so the only data
  * crossing the wire per round is k partial-sum rows per map task, and
  * the only driver state is the k×dim centroid matrix itself.
  *
  * EXACT FIXED-POINT formulation (the [[Graph.pageRank]] discipline):
  * vectors are floor(x*1000) ints, squared distances are exact integer
  * arithmetic, and centroid updates are `floorDiv(Σ component, n)` —
  * integer sums are addition-order-insensitive, so every round's
  * centroids, every assignment (ties to the lower cluster id), and the
  * final output are bit-identical in any engine. The DuckDB oracle
  * replays the same rounds from the same deterministic init (the k
  * lowest-id vectors) with NO inlined literals — the entire algorithm
  * is reproducible from the data alone.
  *
  * Semantics: `iters` assignment rounds with a centroid update between
  * consecutive rounds (`iters = 1` is pure nearest-seed assignment); a
  * cluster that loses all members keeps its previous centroid. Returns
  * (id, cluster, dist) of the final round, `dist` the exact integer
  * |q - c|^2.
  *
  * Shape at 100 TB: per round, one scan + one k-group aggregation —
  * no shuffle of the corpus itself, no window, no join; assignment is a
  * row-local argmin against broadcast centroid literals exactly like
  * [[Similarity.assignLists]]. Rounds are sequential by nature; the
  * per-round driver collect is k rows.
  */
object KMeansOp {

  /** Past this dim the scalar `sum(q[d])`-per-column update grows a
    * dim-wide aggregate expression tree — the linear-codegen JIT cliff
    * CentroidArgmin exists to avoid — so wide vectors switch to a
    * posexplode form keyed on (list_id, d): k×dim groups, still map-side
    * combined, still only k×dim longs across the wire per round.
    */
  private val ExplodeDimThreshold = 64

  /** One Lloyd-round component-sum pass: (cluster, n, Σ component[d]).
    * Both forms are exact LONG sums; the explode form trades one row
    * expansion for a bounded expression tree at embedding-scale dims.
    */
  private[ops] def componentSums(assigned: DataFrame, dim: Int,
                                 explode: Boolean): Array[(Int, Long, Array[Long])] =
    if (!explode) {
      assigned.groupBy(col("list_id"))
        .agg(count(lit(1)).as("n"),
          (0 until dim).map(d =>
            sum(element_at(col("q"), d + 1).cast("long")).as(s"s$d")): _*)
        .collect()
        .map(r => (r.getInt(0), r.getLong(1),
          Array.tabulate(dim)(d => r.getLong(2 + d))))
    } else {
      assigned.select(col("list_id"), posexplode(col("q")))
        .groupBy(col("list_id"), col("pos"))
        .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
        .collect()
        .groupBy(_.getInt(0)).map { case (cl, rs) =>
          val sums = new Array[Long](dim)
          var n = 0L
          rs.foreach { r => sums(r.getInt(1)) = r.getLong(2); n = r.getLong(3) }
          (cl, n, sums)
        }.toArray
    }

  /** The Lloyd rounds alone: deterministic lowest-id init, `iters - 1`
    * centroid updates, FINAL centroid matrix returned — the shared
    * trainer behind [[fit]] and [[silhouette]] (one loop, so the
    * assignment and the audit can never see different centroids).
    */
  private[ops] def trainCentroids(emb: DataFrame, idCol: String,
                                  vecCol: String, k: Int,
                                  iters: Int): Array[Array[Int]] = {
    require(k >= 1 && iters >= 1, s"k/iters must be >= 1: $k/$iters")
    val q = emb.select(col(idCol), Similarity.quantize(col(vecCol)).as("q"))
    // deterministic init: the k lowest-id vectors (tiny bounded collect —
    // the oracle reproduces it with ORDER BY id LIMIT k)
    var cents: Array[Array[Int]] = q.orderBy(col(idCol)).limit(k).collect()
      .map(_.getSeq[Int](1).toArray)
    require(cents.length == k, s"corpus has fewer than k=$k rows")
    val dim = cents(0).length

    for (_ <- 1 until iters) {
      // one map-side-combined aggregation: k rows of (count, dim sums)
      val assigned = Similarity.assignLists(emb, idCol, vecCol, cents)
      val sums = componentSums(assigned, dim, dim > ExplodeDimThreshold)
      val next = cents.map(_.clone()) // empty cluster keeps its centroid
      sums.foreach { case (cl, n, s) =>
        next(cl) = Array.tabulate(dim)(d => Math.floorDiv(s(d), n).toInt)
      }
      cents = next
    }
    cents
  }

  def fit(emb: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): DataFrame = {
    val cents = trainCentroids(emb, idCol, vecCol, k, iters)
    val q = emb.select(col(idCol), Similarity.quantize(col(vecCol)).as("q"))
    // Final pass: ONE fused argmin evaluation yields both fields. The
    // struct lands in its own projection step; CollapseProject refuses to
    // inline a non-cheap expression into two use-sites, so the plan keeps
    // exactly one CentroidArgmin (PlanShapeSpec pins this).
    val am = graft.functions.VectorOps.centroid_argmin(col("q"), cents)
    q.select(col(idCol), am.as("am"))
      .select(col(idCol), col("am").getField("list_id").as("cluster"),
        col("am").getField("dist").as("dist"))
  }

  /** X156 — simplified-silhouette cluster audit (Rousseeuw 1987;
    * the centroid-based simplification per Hruschka et al. 2004 /
    * Vendramin et al. 2010): per final cluster, how SEPARATED are its
    * members — s(i) = (b − a) / max(a, b) with a = |q − c_own|² and
    * b = min over other clusters |q − c_j|², both exact integers over
    * the same quantized vectors as [[fit]]. Because the assignment IS
    * the argmin against the final centroids, a is the minimum and b
    * the second minimum of one distance sweep — [[graft.functions
    * .VectorOps.centroid_argmin2]]'s fused loop — so a >= 0, b >= a,
    * and s_micro sits in [0, 1e6] (an exact tie reads 0: the point is
    * on the decision boundary). The true silhouette's O(n²) pairwise
    * distances never materialize — at 100 TB this is the only
    * silhouette there is.
    *
    * ARITHMETIC: s_micro = ⌊1e6·(b − a) / max(a, b)⌋ per point
    * (0 when max(a,b) = 0 — a point exactly ON its centroid with a
    * tied other centroid); per-cluster mean is ⌊Σ s_micro / n⌋. All
    * lanes DECIMAL(38,0)-exact; the oracle replays the identical Lloyd
    * rounds and the identical floors.
    *
    * SHAPE AT 100 TB: the Lloyd rounds are [[fit]]'s (one map-side-
    * combined aggregation each); the audit itself is ONE scan-side
    * fused-loop projection plus a k-group fold — no join, no pairwise
    * anything, nothing driver-side beyond the k×dim centroid matrix.
    *
    * Output: (cluster, n_vecs, avg_sil_micro, min_sil_micro,
    * max_sil_micro), one row per non-empty cluster.
    */
  /** X161 — SUPERVISED label-separation audit over an embedding
    * column: the [[silhouette]] geometry with the cluster REPLACED by
    * the dataset's own label — a = |q − c_own|² to the point's LABEL
    * centroid, b = min over OTHER label centroids. Unlike the
    * unsupervised audit, a is NOT the argmin, so the separation can
    * go NEGATIVE: b < a means the point sits closer to another
    * label's centroid than its own — the classic
    * confusable-or-mislabeled signal (the centroid form of Fisher's
    * criterion, and the audit a labeled training set runs before
    * anyone trains on the labels).
    *
    * ARITHMETIC: label centroids use the exact [[fit]] update rule
    * (floorDiv of integer component sums); a comes from the
    * [[graft.functions.VectorOps.vec_sub_centroid]]+dot residual, b
    * from the same fused [[graft.functions.VectorOps
    * .centroid_argmin2]] sweep (dist2 when the argmin IS the own
    * label, dist otherwise); sep_micro = ±⌊1e6·|b−a| / max(a,b)⌋
    * with the sign branch explicit (negatives are the payload here).
    *
    * SHAPE AT 100 TB: ONE map-side-combined (label, dim) aggregation
    * for the centroids (labels × dim longs — bounded model state,
    * the [[fit]] discipline), then one scan-side fused projection and
    * a label-grain fold. No pairwise distances, no joins.
    *
    * Output: (label, n_vecs, n_confused, confused_ppm,
    * avg_sep_micro, min_sep_micro, max_sep_micro) per label —
    * `n_confused` counts b < a strictly.
    */
  def labelSeparation(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String): DataFrame = {
    val q = emb.filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("int").as("label"),
        Similarity.quantize(col(vecCol)).as("q"))
    // label centroids: the explode-form component sums (one exchange,
    // labels x dim rows), floorDiv update — exact integers
    val sums = q.select(col("label"), posexplode(col("q")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col").cast("long")).as("s"), count(lit(1)).as("n"))
      .collect()
    require(sums.nonEmpty, "labelSeparation: no labeled vectors")
    val byLabel = sums.groupBy(_.getInt(0))
    val labels = byLabel.keys.toSeq.sorted
    require(labels.size >= 2,
      s"labelSeparation needs >= 2 labels, got ${labels.size}")
    val cents: Array[Array[Int]] = labels.map { l =>
      val rows = byLabel(l)
      val dim = rows.map(_.getInt(1)).max + 1
      val c = new Array[Int](dim)
      rows.foreach(r =>
        c(r.getInt(1)) = Math.floorDiv(r.getLong(2), r.getLong(3)).toInt)
      c
    }.toArray
    val idx = typedLit(labels.zipWithIndex.toMap)
    val am = graft.functions.VectorOps.centroid_argmin2(col("q"), cents)
    val own = element_at(idx, col("label"))
    val res = graft.functions.VectorOps.vec_sub_centroid(col("q"),
      own, cents)
    q.select(col("label"), own.as("own"), am.as("am"),
        graft.functions.VectorOps.dot_long(res, res).as("a"))
      .select(col("label"), col("a"),
        when(col("am").getField("list_id") === col("own"),
          col("am").getField("dist2"))
          .otherwise(col("am").getField("dist")).as("b"))
      .select(col("label"), col("a"), col("b"), expr(
        """CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
          |WHEN b >= a THEN CAST(CAST(b - a AS DECIMAL(38,0)) * 1000000
          |  div greatest(a, b) AS BIGINT)
          |ELSE -CAST(CAST(a - b AS DECIMAL(38,0)) * 1000000
          |  div greatest(a, b) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("sm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        count_if(col("b") < col("a")).as("n_confused"),
        sum(col("sm")).as("__s"),
        min(col("sm")).as("min_sep_micro"),
        max(col("sm")).as("max_sep_micro"))
      .select(col("label"), col("n_vecs"), col("n_confused"),
        expr("CAST(CAST(n_confused AS DECIMAL(38,0)) * 1000000" +
          " div n_vecs AS BIGINT)").as("confused_ppm"),
        expr("CASE WHEN __s >= 0" +
          " THEN CAST(CAST(__s AS DECIMAL(38,0)) div n_vecs AS BIGINT)" +
          " ELSE -CAST(CAST(-__s AS DECIMAL(38,0)) div n_vecs AS BIGINT)" +
          " END").as("avg_sep_micro"),
        col("min_sep_micro"), col("max_sep_micro"))
  }

  def silhouette(emb: DataFrame, idCol: String, vecCol: String,
                 k: Int, iters: Int): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2 (no 'other' cluster): $k")
    val cents = trainCentroids(emb, idCol, vecCol, k, iters)
    val q = emb.select(col(idCol), Similarity.quantize(col(vecCol)).as("q"))
    val am = graft.functions.VectorOps.centroid_argmin2(col("q"), cents)
    q.select(am.as("am"))
      .select(col("am").getField("list_id").as("cluster"),
        col("am").getField("dist").as("a"),
        col("am").getField("dist2").as("b"))
      .select(col("cluster"), expr(
        """CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST(CAST(b - a AS DECIMAL(38,0)) * 1000000
          |  div greatest(a, b) AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("sm"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("sm")).as("__s"),
        min(col("sm")).as("min_sil_micro"),
        max(col("sm")).as("max_sil_micro"))
      .select(col("cluster"), col("n_vecs"),
        expr("CAST(CAST(__s AS DECIMAL(38,0)) div n_vecs AS BIGINT)")
          .as("avg_sil_micro"),
        col("min_sil_micro"), col("max_sil_micro"))
  }
}
