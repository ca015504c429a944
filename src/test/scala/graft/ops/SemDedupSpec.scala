package graft.ops

import graft.SparkSpec
import graft.engine.Tables

/** X36 SemDeDup invariants beyond the DuckDB oracle: the keep rule on
  * hand-checkable clusters, the negative/zero-dot guards, the documented
  * cluster-boundary recall trade, and equality against an independent
  * driver-side BigInt reference on real embeddings.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(vecs: Seq[(Long, Seq[Float])], cents: Array[Array[Int]],
                  tauPermille: Long): Seq[(Long, Int, Long, Int)] =
    SemDedup.semDedup(vecs.toDF("vec_id", "embedding"), "vec_id", "embedding",
        nlist = cents.length, tauPermille = tauPermille,
        centroids = Some(cents))
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq

  test("lower-id neighbor above tau drops a row; zero/negative dot never dups") {
    // single cluster (one zero centroid); tau = 0 makes the gate exactly
    // 'positive cosine': strict dot > 0, so orthogonal and anti-parallel
    // pairs survive even at the loosest threshold
    val got = run(Seq(
      1L -> Seq(1.0f, 0.0f),
      2L -> Seq(-1.0f, 0.0f),  // anti-parallel to 1: dot < 0, kept
      3L -> Seq(0.0f, 1.0f),   // orthogonal to all: dot = 0, kept
      4L -> Seq(0.5f, 0.0f)),  // colinear with 1: cos = 1, dropped
      cents = Array(Array(0, 0)), tauPermille = 0L)
    assert(got === Seq(
      (1L, 0, 0L, 1), (2L, 0, 0L, 1), (3L, 0, 0L, 1), (4L, 0, 1L, 0)))
  }

  test("a cluster boundary splits a near-dup pair: both kept (recall trade)") {
    // ids 1/2 have cosine ~0.9836 (> tau = 0.95? no — pick 0.95 tau and
    // 0.9836 cosine: above tau) but land in DIFFERENT clusters, so the
    // published algorithm — and this operator — keeps both. id 3 is an
    // exact duplicate of id 1 in the same cluster and is dropped.
    val got = run(Seq(
      1L -> Seq(0.75f, 0.625f),  // cluster 0 (closer to (1000, 0))
      2L -> Seq(0.625f, 0.75f),  // cluster 1 — cos(1,2) ≈ 0.9836 > tau
      3L -> Seq(0.75f, 0.625f)), // cluster 0, identical to id 1
      cents = Array(Array(1000, 0), Array(0, 1000)), tauPermille = 950L)
    assert(got === Seq((1L, 0, 0L, 1), (2L, 1, 0L, 1), (3L, 0, 1L, 0)))
  }

  test("supplied centroids must match nlist") {
    // the matching-nlist call must succeed OUTSIDE the intercept — were it
    // inside, an unrelated IllegalArgumentException from it would satisfy
    // the intercept without ever exercising the mismatch require
    run(Seq(1L -> Seq(1.0f, 0.0f)),
      cents = Array(Array(0, 0)), tauPermille = 0L) // ok: nlist 1 == 1
    intercept[IllegalArgumentException] {
      SemDedup.semDedup(Seq(1L -> Seq(1.0f, 0.0f)).toDF("vec_id", "embedding"),
        "vec_id", "embedding", nlist = 64, tauPermille = 0L,
        centroids = Some(Array(Array(0, 0))))
    }
  }

  test("blocked (sub-sharded) self-join equals the unblocked form exactly") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val one = Array(Array.fill(dim)(0)) // single cluster: worst-case skew
    def result(cap: Option[Int]) =
      SemDedup.semDedup(emb, "vec_id", "embedding", nlist = 1,
          tauPermille = 400L, centroids = Some(one), maxClusterRows = cap)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toSeq
    val unblocked = result(None)
    // cap 7 forces many sub-shards; cap 1 is the degenerate extreme
    assert(result(Some(7)) === unblocked)
    assert(result(Some(1)) === unblocked)
  }

  test("single-cluster semDedup equals a BigInt brute-force reference") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = emb.select("embedding").head().getSeq[Float](0).length
    val got = run(
      emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect().toSeq,
      cents = Array(Array.fill(dim)(0)), tauPermille = 400L)

    // independent reference: same floor(x*1000) quantization, exact
    // BigInt arithmetic, all pairs (single cluster = no pruning)
    val q = emb.select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
      .map { case (id, v) =>
        (id, v.map(x => math.floor(x.toDouble * 1000).toLong).toArray)
      }.sortBy(_._1)
    def dot(a: Array[Long], b: Array[Long]): BigInt =
      a.indices.foldLeft(BigInt(0))((s, i) => s + BigInt(a(i)) * b(i))
    val expected = q.map { case (id, v) =>
      val nDup = q.count { case (oid, ov) =>
        oid < id && {
          val d = dot(v, ov)
          d > 0 && d * d * 1000000 > BigInt(160000) * dot(v, v) * dot(ov, ov)
        }
      }.toLong
      (id, 0, nDup, if (nDup == 0) 1 else 0)
    }.toSeq
    assert(got === expected)
  }

  test("semanticDecon: max-cosine vs eval, micro-ppm threshold, dense, " +
    "min-eval-id tie break") {
    import spark.implicits._
    // eval 100=(1,0), 101=(0,1); corpus 1=(1,0) dup of 100,
    // 2=(1,1) cos ~0.7071 to both (tie -> nearest 100), 3=(-1,0) anti
    val corpus = Seq((1L, Seq(1f, 0f)), (2L, Seq(1f, 1f)),
      (3L, Seq(-1f, 0f))).toDF("vec_id", "embedding")
    val ev = Seq((100L, Seq(1f, 0f)), (101L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    val got = SemDedup.semanticDecon(corpus, ev, "vec_id", "embedding",
        tauPpm = 900000L)
      .orderBy("vec_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 1000000L, 100L, "drop"),
      (2L, 707106L, 100L, "keep"), // floor(0.70710678*1e6); tie -> 100
      (3L, 0L, 101L, "keep")))     // anti vs 100 floors to -1e6; best is 0
    // empty eval fails loudly, never silently keeps everything
    intercept[IllegalArgumentException] {
      SemDedup.semanticDecon(corpus,
        ev.filter($"vec_id" < 0), "vec_id", "embedding", 900000L)
    }
  }

  test("semanticDecon: an over-cap eval side aborts loudly before the " +
    "forced broadcast") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val evPrep = (100L to 104L).map(i => (i, Seq(1f, 0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id".as("eval_id"),
        Similarity.quantize($"embedding").as("eq"))
    val e = intercept[IllegalArgumentException] {
      SemDedup.semanticDeconAgainst(corpus, evPrep, "vec_id", "embedding",
        tauPpm = 900000L, maxEvalRows = 3L)
    }
    assert(e.getMessage.contains("over the broadcast cap 3"), e.getMessage)
    // at the cap it runs; the production default admits a real suite
    assert(SemDedup.semanticDeconAgainst(corpus, evPrep.limit(3),
      "vec_id", "embedding", 900000L, maxEvalRows = 3L).count() === 1L)
    assert(SemDedup.MaxEvalRows >= 100000L)
  }
}
