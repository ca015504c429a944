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

  test("null values drop and k guard holds") {
    val df = Seq(("g", "a"), ("g", null)).toDF("grp", "v")
    assert(Kmv.sketch(df, "grp", "v", 8).count() === 1L)
    intercept[IllegalArgumentException](Kmv.sketch(df, "grp", "v", 1))
    intercept[IllegalArgumentException](
      Kmv.jaccardEst(df, df, 100001))
  }
}
