package graft.ops

import graft.SparkSpec

/** X89 Count-Min: sketch-table and estimate agreement with a
  * driver-side replica, the over-estimate-only invariant under forced
  * collisions, counter-addition mergeability, and the guards.
  */
class CountMinSpec extends SparkSpec {

  import spark.implicits._

  private def md5(s: String) =
    org.apache.commons.codec.digest.DigestUtils.md5Hex(s)

  private def refSketch(toks: Seq[String], depth: Int,
                        k: Int): Map[(Int, String), Long] =
    toks.flatMap(t => (0 until depth)
        .map(i => (i, md5(s"$i|$t").substring(0, k))))
      .groupBy(identity).map { case (key, g) => key -> g.size.toLong }

  private def refEst(sk: Map[(Int, String), Long], t: String, depth: Int,
                     k: Int): Long =
    (0 until depth)
      .map(i => sk.getOrElse((i, md5(s"$i|$t").substring(0, k)), 0L)).min

  test("sketch and estimates match the replica; no under-counts") {
    // 500x "hot" + 400 cold tokens into 16 buckets/lane: collisions
    // guaranteed, so the invariant is exercised, not vacuous
    val toks = Seq.fill(500)("hot") ++ (0 until 400).map(i => s"cold $i")
    val df = toks.toDF("token")
    val sk = CountMin.sketch(df, "token", depth = 4, hexDigits = 1)
    val ref = refSketch(toks, 4, 1)
    val got = sk.collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === ref)
    val exact = toks.groupBy(identity)
      .map { case (t, g) => t -> g.size.toLong }
    val est = CountMin.estimate(sk, toks.distinct.toDF("token"), "token",
        4, 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.distinct.foreach { t =>
      assert(est(t) === refEst(ref, t, 4, 1))
      assert(est(t) >= exact(t), s"under-estimate for $t")
    }
    assert(toks.distinct.exists(t => est(t) > exact(t)),
      "16 buckets with 401 distinct tokens must collide somewhere")
  }

  test("a token the sketch never saw estimates zero (also exact)") {
    val sk = CountMin.sketch(Seq("a", "b").toDF("token"), "token", 4, 2)
    val est = CountMin.estimate(sk, Seq("zzz unseen").toDF("token"),
        "token", 4, 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === Map("zzz unseen" -> 0L))
  }

  test("sketches merge by counter addition") {
    import org.apache.spark.sql.functions._
    val a = (0 until 300).map(i => s"t ${i % 40}").toDF("token")
    val b = (0 until 200).map(i => s"t ${i % 25}").toDF("token")
    val direct = CountMin.sketch(a.unionAll(b), "token", 3, 1).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val merged = CountMin.sketch(a, "token", 3, 1)
      .unionByName(CountMin.sketch(b, "token", 3, 1))
      .groupBy(col("lane"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(merged === direct,
      "per-shard sketches must sum to the union's sketch")
  }

  test("null tokens drop on both build and query side") {
    val sk = CountMin.sketch(Seq("a", null).toDF("token"), "token", 2, 1)
    assert(sk.count() === 2L) // one token x two lanes
    assert(CountMin.estimate(sk, Seq[String](null).toDF("token"),
      "token", 2, 1).count() === 0L)
  }

  test("knob guards") {
    val df = Seq("a").toDF("token")
    intercept[IllegalArgumentException](CountMin.sketch(df, "token", 0, 1))
    intercept[IllegalArgumentException](CountMin.sketch(df, "token", 9, 1))
    intercept[IllegalArgumentException](CountMin.sketch(df, "token", 4, 0))
    intercept[IllegalArgumentException](CountMin.sketch(df, "token", 4, 5))
  }
}
