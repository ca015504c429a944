package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._


/** X62 — prototype-based diversity pruning: the "SSL prototypes" metric
  * of Sorscher et al. 2022 (Beyond neural scaling laws, arXiv:
  * 2206.14486) as productionized in D4 (Tirumala et al. 2023, arXiv:
  * 2308.12284): cluster the embedding space with a coarse k-means
  * quantizer, rank every vector by its cosine to its OWN cluster
  * centroid (its "prototypicality"), and DROP the most prototypical
  * fraction of each cluster — near-centroid points are the
  * semantically redundant mass a pretraining mixture can shed with the
  * least information loss (D4 runs exactly this after SemDeDup; the
  * composition here is x36's keep-set piped into this operator).
  *
  * EXACTNESS: cosine ranking needs no floats — the rank key is
  * signed fixed-point cos² in PARTS-PER-10^12,
  * `proto = sign(dot) · (dot² · 10^12 div (n2·c2))`, computed in
  * DECIMAL(38,0) (dot² · 10^12 can reach ~10^27) and landing in BIGINT
  * (Cauchy-Schwarz bounds the quotient by 10^12). cos is monotone in
  * signed cos² — both negate together — so the ranking is the paper's,
  * bit-identical in any engine (DuckDB mirrors in HUGEINT), ties to
  * the lower id. Zero-norm rows (cos undefined) pin to 0. The
  * per-cluster drop count is integer ppm: `(prunePpm · n) div 10^6`.
  *
  * SHAPE AT 100 TB: centroid assignment is the row-local
  * [[Similarity.assignLists]] argmin (scan-side, centroids inlined);
  * the nlist-row centroid table BROADCASTS into the dot join; the only
  * shuffle is the per-cluster rank window on `list_id` — cluster-sized
  * partitions, the same skew surface as [[SemDedup.semDedup]] (an
  * oversized cluster would re-use the x57 two-pass prefix trick:
  * count-per-rank-bucket first, cut rank from the offset table).
  *
  * Output: every input id with (list_id, proto_ppt, r, is_kept) —
  * the keep-set is `is_kept = 1`, dropped rows are the top
  * `prunePpm/10^6` of each cluster by prototypicality.
  */
object ProtoPrune {

  /** Centroids of the most recent [[prune]] call — the
    * [[SemDedup.lastCentroids]] oracle-inlining contract (graft.Verify
    * runs queries first, dumps oracle SQL after, same JVM).
    */
  @volatile private[graft] var lastCentroids: Option[Array[Array[Int]]] = None

  def prune(emb: DataFrame, idCol: String, vecCol: String,
            nlist: Int, prunePpm: Long,
            centroids: Option[Array[Array[Int]]] = None,
            trainSample: Int = 65536): DataFrame = {
    require(prunePpm >= 0 && prunePpm <= 1000000,
      s"prunePpm must be in [0, 10^6]: $prunePpm")
    require(centroids.forall(_.length == nlist),
      s"centroids.length ${centroids.map(_.length).getOrElse(-1)} != " +
        s"nlist $nlist")
    val cents = centroids.getOrElse(
      Similarity.trainCoarseCentroids(
        Similarity.collectTrainingSample(emb, vecCol, trainSample), nlist))
    lastCentroids = Some(cents)
    val spark = emb.sparkSession
    import spark.implicits._
    val centDf = cents.zipWithIndex.map { case (c, i) =>
      (i, c.map(_.toLong).toSeq, c.map(v => v.toLong * v).sum)
    }.toSeq.toDF("list_id", "cv", "c2")

    val assigned = Similarity.assignLists(emb, idCol, vecCol, cents)
    val dotC = graft.functions.VectorOps.dot_long(col("q"), col("cv"))
    // `div` is Spark's exact integral quotient on decimals (the
    // Sample.mixtureJoined idiom); the quotient is <= 10^12 so the
    // BIGINT landing cast is lossless
    val scored = assigned.join(broadcast(centDf), Seq("list_id"))
      .withColumn("dot", dotC)
      .withColumn("proto_ppt", expr(
        """CASE WHEN n2 * c2 = 0 THEN CAST(0 AS BIGINT)
          |ELSE IF(dot < 0, -1L, 1L) * CAST(
          |  (CAST(dot AS DECIMAL(38,0)) * dot * 1000000000000)
          |    div (CAST(n2 AS DECIMAL(38,0)) * c2) AS BIGINT) END"""
          .stripMargin))
      .select(col(idCol), col("list_id"), col("proto_ppt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("list_id"))
    val byProto = w.orderBy(col("proto_ppt").desc, col(idCol))
    scored
      .withColumn("r", row_number().over(byProto))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("is_kept",
        (col("r") > expr(s"($prunePpm * n) div 1000000L")).cast("int"))
      .select(col(idCol), col("list_id"), col("proto_ppt"),
        col("r").cast("long").as("r"), col("is_kept"))
  }
}
