package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X92 KMV: sketch = k smallest digests (driver replica), exactness
  * below k, union mergeability from sketches alone, estimator quality
  * on a known-Jaccard pair, and the guards.
  */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  private def md5(s: String) =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  test("sketch keeps exactly the k smallest distinct digests") {
    val vals = (0 until 500).map(i => s"v $i")
    val rows = vals ++ vals.take(50) // duplicates must not matter
    val got = Kmv.sketch(rows.map(("g", _)).toDF("grp", "v"),
        "grp", "v", 32)
      .collect().map(_.getString(1)).sorted.toSeq
    assert(got === vals.map(md5).distinct.sorted.take(32))
  }

  test("estimate is exact when the union fits in k") {
    val a = (0 until 30).map(i => s"v $i")
    val b = (20 until 50).map(i => s"v $i") // |A∩B|=10, |A∪B|=50
    val ka = Kmv.sketch(a.map(("g", _)).toDF("grp", "v"), "grp", "v", 128)
    val kb = Kmv.sketch(b.map(("g", _)).toDF("grp", "v"), "grp", "v", 128)
    val r = Kmv.jaccardEst(ka, kb, 128).collect().head
    assert(r.getLong(1) === 50L) // n_u = the whole union
    assert(r.getLong(2) === 10L * 1000000 / 50) // exact 200000 ppm
  }

  test("the union's KMV is recoverable from the two sketches") {
    // k smallest of (KMV(A) ∪ KMV(B)) == KMV(A ∪ B) — the merge law
    // jaccardEst leans on
    val a = (0 until 800).map(i => s"a $i")
    val b = (0 until 800).map(i => s"b $i")
    val k = 64
    val ka = Kmv.sketch(a.map(("g", _)).toDF("grp", "v"), "grp", "v", k)
    val kb = Kmv.sketch(b.map(("g", _)).toDF("grp", "v"), "grp", "v", k)
    val fromSketches = ka.select("h").unionAll(kb.select("h")).distinct()
      .orderBy("h").limit(k).collect().map(_.getString(0)).toSeq
    val direct = Kmv.sketch((a ++ b).map(("g", _)).toDF("grp", "v"),
        "grp", "v", k)
      .orderBy("h").collect().map(_.getString(1)).toSeq
    assert(fromSketches === direct)
  }

  test("estimator lands near a known Jaccard at k = 128") {
    // |A| = |B| = 1500, overlap 750: J = 750/2250 = 1/3
    val a = (0 until 1500).map(i => s"v $i")
    val b = (750 until 2250).map(i => s"v $i")
    val k = 128
    val ka = Kmv.sketch(a.map(("g", _)).toDF("grp", "v"), "grp", "v", k)
    val kb = Kmv.sketch(b.map(("g", _)).toDF("grp", "v"), "grp", "v", k)
    val est = Kmv.jaccardEst(ka, kb, k).collect().head.getLong(2)
    // 3 sigma ~ 3*sqrt(J(1-J)/k) ~ 125000 ppm around 333333
    assert(math.abs(est - 333333L) < 150000L,
      s"estimate $est ppm too far from 333333")
  }

  test("set algebra is exact below k and composes the theta way") {
    val a = Seq("x", "y", "z"); val b = Seq("y", "z", "w")
    val got = Kmv.setAlgebra(
        Kmv.sketch(a.map(("g", _)).toDF("grp", "v"), "grp", "v", 8),
        Kmv.sketch(b.map(("g", _)).toDF("grp", "v"), "grp", "v", 8), 8)
      .collect().head
    assert(got.getAs[Long]("n_a") === 3 && got.getAs[Long]("n_b") === 3)
    assert(got.getAs[Long]("n_u") === 4 && got.getAs[Long]("n_both") === 2)
    assert(got.getAs[Long]("est_a") === 3 && got.getAs[Long]("est_b") === 3)
    assert(got.getAs[Long]("est_union") === 4)
    assert(got.getAs[Long]("est_intersect") === 2)
    assert(got.getAs[Long]("est_a_only") === 1
      && got.getAs[Long]("est_b_only") === 1)
  }

  test("full sketch uses the (k-1)*2^48 div h_k integer estimator; a " +
    "one-sided group reports the other side as zero") {
    val k = 2
    val vals = (0 until 10).map(i => s"v $i")
    val got = Kmv.setAlgebra(
        Kmv.sketch(vals.map(("g", _)).toDF("grp", "v"), "grp", "v", k),
        Seq.empty[(String, String)].toDF("grp", "h"), k)
      .collect().head
    // expected straight from the formula on the 2nd-smallest digest
    val hk = java.lang.Long.parseLong(
      vals.map(md5).sorted.apply(1).take(12), 16)
    val want = (k - 1).toLong * (1L << 48) / math.max(hk, 1L)
    assert(got.getAs[Long]("est_a") === want)
    assert(got.getAs[Long]("n_b") === 0 && got.getAs[Long]("est_b") === 0)
    assert(got.getAs[Long]("est_intersect") === 0)
    assert(got.getAs[Long]("est_union") === got.getAs[Long]("est_a"))
    assert(got.getAs[Long]("est_a_only") === got.getAs[Long]("est_union"))
  }

  test("estimator lands near known cardinalities at k = 128") {
    val a = (0 until 1000).map(i => s"a $i")
    val b = (500 until 1500).map(i => s"a $i") // 500 shared
    val got = Kmv.setAlgebra(
        Kmv.sketch(a.map(("g", _)).toDF("grp", "v"), "grp", "v", 128),
        Kmv.sketch(b.map(("g", _)).toDF("grp", "v"), "grp", "v", 128), 128)
      .collect().head
    def near(est: Long, truth: Long, tolPct: Int): Unit =
      assert(math.abs(est - truth) <= truth * tolPct / 100,
        s"est $est vs $truth")
    near(got.getAs[Long]("est_a"), 1000, 30)
    near(got.getAs[Long]("est_b"), 1000, 30)
    near(got.getAs[Long]("est_union"), 1500, 30)
    near(got.getAs[Long]("est_intersect"), 500, 45)
  }

  test("null values drop and k guard holds") {
    val df = Seq(("g", "a"), ("g", null)).toDF("grp", "v")
    assert(Kmv.sketch(df, "grp", "v", 8).count() === 1L)
    intercept[IllegalArgumentException](Kmv.sketch(df, "grp", "v", 1))
    intercept[IllegalArgumentException](
      Kmv.jaccardEst(df, df, 100001))
  }
}
