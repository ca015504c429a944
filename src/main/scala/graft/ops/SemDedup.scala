package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** X36 — semantic deduplication, the SemDeDup recipe (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space with a coarse k-means
  * quantizer, then WITHIN each cluster drop every vector that has a
  * more-canonical (lower-id) neighbor above a cosine threshold. Near-
  * duplicate *meaning* — paraphrases, template rewrites, translations of
  * boilerplate — that n-gram MinHash ([[Dedup]]) cannot see.
  *
  * The clusters are what make the operator tractable: candidate pairs
  * are confined to vectors that share a centroid, so the quadratic
  * blow-up is bounded by the largest cluster, not the corpus. That is
  * the published algorithm's design point, and it maps 1:1 onto Spark:
  * one shuffle on `list_id`, then a per-cluster self-join whose
  * partitions are cluster-sized. (An oversized cluster would sub-shard
  * by a secondary hash of the id — same pattern [[Skew]] uses — before
  * the self-join; at the test corpus scale no cluster needs it.)
  *
  * Everything after centroid training is integer-exact and therefore
  * oracle-checkable: list assignment is the same expanded |q-c|^2 argmin
  * as [[Similarity.ivfTopK]], and the cosine gate `cos(a,b) > tau` is
  * evaluated as `dot > 0 AND dot^2 * 10^6 > tau_pm^2 * n2a * n2b` in
  * DECIMAL(38) arithmetic — no sqrt, no float seam (dot^2 * 10^6
  * overflows BIGINT at embedding dim 64, hence decimal; DuckDB mirrors
  * with HUGEINT).
  *
  * Output: every input id with its cluster, the number of more-canonical
  * in-cluster duplicates, and the keep flag — the SemDeDup keep-set is
  * `is_kept = 1`.
  */
object SemDedup {

  /** Centroids of the most recent [[semDedup]] call — the same
    * oracle-inlining contract as [[Similarity.lastIvfCentroids]]
    * (graft.Verify runs queries first, dumps oracle SQL after, same JVM).
    */
  @volatile private[graft] var lastCentroids: Option[Array[Array[Int]]] = None

  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int, tauPermille: Long,
               centroids: Option[Array[Array[Int]]] = None,
               trainSample: Int = 65536): DataFrame = {
    require(tauPermille >= 0 && tauPermille <= 1000,
      s"tauPermille must be in [0, 1000]: $tauPermille")
    val cents = centroids.getOrElse(
      Similarity.trainCoarseCentroids(
        Similarity.collectTrainingSample(emb, vecCol, trainSample), nlist))
    lastCentroids = Some(cents)
    val assigned = Similarity.assignLists(emb, idCol, vecCol, cents)

    val dec = DecimalType(38, 0)
    val a = assigned.select(col("list_id"), col(idCol).as("id_a"),
      col("q").as("qa"), col("n2").cast(dec).as("n2a"))
    val b = assigned.select(col("list_id"), col(idCol).as("id_b"),
      col("q").as("qb"), col("n2").cast(dec).as("n2b"))
    val d = Similarity.dot(col("qa"), col("qb"))
    val overTau = d > lit(0L) &&
      d.cast(dec) * d.cast(dec) * lit(1000000L).cast(dec) >
        lit(tauPermille * tauPermille).cast(dec) * col("n2a") * col("n2b")
    val dups = a.join(b, Seq("list_id"))
      .filter(col("id_b") < col("id_a") && overTau)
      .groupBy(col("id_a").as(idCol))
      .agg(count(lit(1)).as("n_dup_lower"))

    assigned.select(col(idCol), col("list_id"))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol), col("list_id"),
        coalesce(col("n_dup_lower"), lit(0L)).as("n_dup_lower"),
        when(col("n_dup_lower").isNull, 1).otherwise(0).as("is_kept"))
  }
}
