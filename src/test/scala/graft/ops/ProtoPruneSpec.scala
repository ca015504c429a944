package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** X62 prototype pruning: hand-computed signed cos² fixed-point values,
  * per-cluster ppm drop counts, tie-to-lower-id ranking.
  */
class ProtoPruneSpec extends SparkSpec {
  import spark.implicits._

  // axis-aligned quantized centroids: c0 = +x, c1 = +y
  private val cents = Array(Array(1000, 0), Array(0, 1000))

  private def emb(rows: (Long, Seq[Float])*): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def run(df: DataFrame, ppm: Long) =
    ProtoPrune.prune(df, "vec_id", "embedding", nlist = 2, prunePpm = ppm,
        centroids = Some(cents))
      .as[(Long, Int, Long, Long, Int)].collect()
      .map(r => r._1 -> r).toMap

  test("signed fixed-point cos² matches hand computation") {
    val m = run(emb(
      (1L, Seq(1.0f, 0.0f)),    // c0, cos = 1        -> 10^12
      (2L, Seq(0.6f, 0.8f)),    // c1, cos = 0.8      -> 0.64 * 10^12
      // -0.5f is exact in binary (floor-quantizes to -500, not -501)
      (3L, Seq(-0.5f, -0.5f)),  // tie -> c0, dot<0   -> -0.5 * 10^12
      (4L, Seq(0.0f, 0.0f))),   // zero norm          -> 0
      ppm = 0L)
    assert(m(1L)._3 === 1000000000000L)
    assert(m(2L)._3 === 640000000000L)
    assert(m(3L)._2 === 0 && m(3L)._3 === -500000000000L)
    assert(m(4L)._3 === 0L)
    assert(m.values.forall(_._5 === 1)) // ppm=0 keeps everything
  }

  test("per-cluster ppm drop count floors, most prototypical go first") {
    // one cluster (c0) of 4: drop floor(0.25 * 4) = 1 — the cos=1 row
    val d = emb(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.8f, 0.3f)), (4L, Seq(0.7f, 0.5f)))
    val m = run(d, ppm = 250000L)
    assert(m(1L)._5 === 0) // r=1, the prototype, dropped
    assert(Seq(2L, 3L, 4L).forall(m(_)._5 === 1))
    // ppm=10^6 drops the whole cluster
    assert(run(d, ppm = 1000000L).values.forall(_._5 === 0))
  }

  test("equal vectors tie to the lower id") {
    val m = run(emb(
      (7L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (5L, Seq(0.5f, 0.1f))), ppm = 330000L)
    // both cos=1 rows tie; rank 1 goes to id 3, and floor(0.33*3)=0
    // drops... recompute: n=3, (330000*3) div 10^6 = 0 -> none dropped
    assert(m(3L)._4 === 1L && m(7L)._4 === 2L)
    val m2 = run(emb(
      (7L, Seq(1.0f, 0.0f)), (3L, Seq(1.0f, 0.0f)),
      (5L, Seq(0.5f, 0.1f))), ppm = 340000L)
    // (340000*3) div 10^6 = 1: exactly the lower-id prototype drops
    assert(m2(3L)._5 === 0 && m2(7L)._5 === 1 && m2(5L)._5 === 1)
  }

  test("D4 composition: drop counts derive from the DEDUPED population") {
    // ids 1/2 are identical (cos = 1 > tau): semDedup keeps only 1;
    // with the dup gone the cluster has 3 members, and
    // (250000 * 3) div 10^6 = 0 — nothing pruned. Over the RAW
    // population of 4 the same ppm would have dropped one.
    val d = emb(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.75f, 0.25f)), (4L, Seq(0.5f, 0.25f)))
    val kept = SemDedup.semDedup(d, "vec_id", "embedding", nlist = 2,
        tauPermille = 999L, centroids = Some(cents))
      .filter($"is_kept" === 1).select("vec_id")
    val pruned = ProtoPrune.prune(
        d.join(kept, Seq("vec_id"), "left_semi"), "vec_id", "embedding",
        nlist = 2, prunePpm = 250000L, centroids = Some(cents))
      .as[(Long, Int, Long, Long, Int)].collect()
    assert(pruned.map(_._1).toSet === Set(1L, 3L, 4L))
    assert(pruned.forall(_._5 === 1))
  }
}
