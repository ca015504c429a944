package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X37 distributed k-means invariants beyond the DuckDB oracle:
  * hand-computed Lloyd rounds, pure-assignment iters=1, empty-cluster
  * centroid retention, and argmin tie-breaking to the lower cluster.
  */
class KMeansOpSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float])], k: Int, iters: Int) =
    KMeansOp.fit(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        k, iters)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  // quantized: 0.0 -> 0, 0.25 -> 250, 1.0 -> 1000, 1.25 -> 1250 (exact floats)
  private val fourPoints = Seq(
    0L -> Seq(0.0f, 0.0f),
    1L -> Seq(1.0f, 0.0f),
    2L -> Seq(0.25f, 0.0f),
    3L -> Seq(1.25f, 0.0f))

  test("two Lloyd rounds move the centroids to the hand-computed means") {
    // init c0=(0,0), c1=(1000,0); round 1 assigns {0,2} / {1,3};
    // update: c0=(125,0) (floor of 250/2), c1=(1125,0); round 2 keeps
    // the partition with every point at dist 125^2 from its centroid
    assert(run(fourPoints, k = 2, iters = 2) === Seq(
      (0L, 0, 15625L), (1L, 1, 15625L), (2L, 0, 15625L), (3L, 1, 15625L)))
  }

  test("iters = 1 is pure nearest-seed assignment, no centroid update") {
    assert(run(fourPoints, k = 2, iters = 1) === Seq(
      (0L, 0, 0L), (1L, 1, 0L), (2L, 0, 62500L), (3L, 1, 62500L)))
  }

  test("an emptied cluster keeps its centroid; dist ties go to the lower cluster") {
    // ids 0 and 1 coincide, so both init centroids are (0,0): every
    // round-1 distance ties and cluster 0 takes everything; cluster 1
    // keeps centroid (0,0) while c0 moves to floor(1000/3) = 333 —
    // round 2 then reassigns the two origin points to cluster 1
    val got = run(Seq(
      0L -> Seq(0.0f, 0.0f),
      1L -> Seq(0.0f, 0.0f),
      2L -> Seq(1.0f, 0.0f)), k = 2, iters = 2)
    assert(got === Seq((0L, 1, 0L), (1L, 1, 0L), (2L, 0, 444889L)))
  }

  test("fewer corpus rows than k fails loudly") {
    intercept[IllegalArgumentException] {
      run(Seq(0L -> Seq(0.0f, 0.0f)), k = 2, iters = 1)
    }
  }

  // ---- x156 simplified silhouette ----

  test("silhouette: hand-computed per-point lanes over a nearest-seed " +
    "assignment, including the tie-on-the-boundary zero") {
    // iters=1: centroids are vecs 0 and 1 -> (0,0) and (10000,0).
    // v0/v1 sit ON their centroid (s = 1e6); v2/v3 at a=1e6,
    // b=1.01e8 -> s = 990099; v4 = (5000,0) ties both (a=b=25e6,
    // lower cluster wins) -> s = 0
    val vecs = Seq(
      0L -> Seq(0.0f, 0.0f),
      1L -> Seq(10.0f, 0.0f),
      2L -> Seq(0.0f, 1.0f),
      3L -> Seq(10.0f, 1.0f),
      4L -> Seq(5.0f, 0.0f))
    val got = KMeansOp.silhouette(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2, iters = 1)
      .orderBy("cluster").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === Seq(
      (0, 3L, 663366L, 0L, 1000000L),     // sum 1990099 div 3
      (1, 2L, 995049L, 990099L, 1000000L) // sum 1990099 div 2
    ))
  }

  test("silhouette rides the SAME trained centroids as fit: cluster " +
    "populations match across both entry points") {
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val sizes = KMeansOp.fit(emb, "vec_id", "embedding", k = 3, iters = 2)
      .groupBy("cluster").count()
      .orderBy("cluster").collect().map(r => (r.getInt(0), r.getLong(1)))
    val sil = KMeansOp.silhouette(emb, "vec_id", "embedding",
        k = 3, iters = 2)
      .orderBy("cluster").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sil.toSeq === sizes.toSeq)
    // the audit's invariant under argmin assignment: s in [0, 1e6]
    KMeansOp.silhouette(emb, "vec_id", "embedding", k = 3, iters = 2)
      .collect().foreach { r =>
        assert(r.getLong(3) >= 0L && r.getLong(4) <= 1000000L)
        assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(4))
      }
  }

  test("silhouette refuses k = 1 (no 'other cluster' to separate from)") {
    intercept[IllegalArgumentException] {
      KMeansOp.silhouette(fourPoints.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 1, iters = 1)
    }
  }

  test("explode-form component sums equal the scalar-column form exactly") {
    // wide dims switch the per-round update to a posexplode aggregation
    // (the dim-wide scalar expression tree is the JIT-cliff shape); both
    // forms must produce identical exact LONG sums
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val cents = emb.select(Similarity.quantize(col("embedding")))
      .limit(3).collect().map(_.getSeq[Int](0).toArray)
    val assigned = Similarity.assignLists(emb, "vec_id", "embedding", cents)
    def canon(a: Array[(Int, Long, Array[Long])]) =
      a.map { case (cl, n, s) => (cl, n, s.toSeq) }.sortBy(_._1).toSeq
    assert(canon(KMeansOp.componentSums(assigned, dim, explode = true)) ===
      canon(KMeansOp.componentSums(assigned, dim, explode = false)))
  }
}
