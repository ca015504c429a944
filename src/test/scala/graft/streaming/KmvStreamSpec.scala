package graft.streaming

import graft.SparkSpec
import graft.ops.Kmv
import org.apache.spark.sql.DataFrame

/** X92 streaming form: accumulated batches equal the batch sketch on
  * their union (KMV's merge-by-construction), admissions append once,
  * replay idempotent, snapshots feed jaccardEst directly, end-to-end
  * through the engine.
  */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  private val k = 8

  private def df(rows: (String, String)*): DataFrame =
    rows.toDF("grp", "v")

  private def latest(statePath: String): Set[(String, String)] =
    KmvStream.latest(spark, statePath)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  private def batchRef(rows: Seq[(String, String)]): Set[(String, String)] =
    Kmv.sketch(rows.toDF("grp", "v"), "grp", "v", k)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("accumulated batches equal the batch sketch on their union") {
    val statePath = tmpDir("kmv-acc")
    val apply = KmvStream.applyBatch(statePath, "grp", "v", k) _
    val b0 = (0 until 40).map(i => ("g", s"a$i")) :+ (("h", "x"))
    val b1 = (20 until 90).map(i => ("g", s"a$i")) // overlaps b0
    apply(df(b0: _*), 0L)
    assert(latest(statePath) === batchRef(b0))
    apply(df(b1: _*), 1L)
    assert(latest(statePath) === batchRef(b0 ++ b1))
  }

  test("a digest admits at most once; replay idempotent") {
    val statePath = tmpDir("kmv-novel")
    val apply = KmvStream.applyBatch(statePath, "grp", "v", k) _
    apply(df(("g", "v1"), ("g", "v1")), 0L)
    val n0 = spark.read.parquet(s"$statePath/mins").count()
    assert(n0 === 1L)
    // same value again: already in the log, nothing appends
    apply(df(("g", "v1")), 1L)
    assert(spark.read.parquet(s"$statePath/mins").count() === n0)
    // replay batch 1: identical prior log, identical partitions
    apply(df(("g", "v1")), 1L)
    assert(spark.read.parquet(s"$statePath/mins").count() === n0)
  }

  test("displaced digests stay in the log but leave the sketch") {
    val statePath = tmpDir("kmv-disp")
    val apply = KmvStream.applyBatch(statePath, "grp", "v", k) _
    val b0 = (0 until 30).map(i => ("g", s"a$i"))
    val b1 = (0 until 30).map(i => ("g", s"b$i"))
    apply(df(b0: _*), 0L)
    apply(df(b1: _*), 1L)
    // snapshot is exactly the k union-minima; log holds >= k rows
    assert(latest(statePath) === batchRef(b0 ++ b1))
    assert(latest(statePath).size === k)
    assert(spark.read.parquet(s"$statePath/mins").count() >= k.toLong)
  }

  test("two streams' snapshots feed jaccardEst without re-scanning") {
    // a larger k here: at k=8 the estimator's sampling spread is ±3σ
    // ≈ ±0.5, so only the wide sketch gives a meaningful band
    val kj = 64
    val pa = tmpDir("kmv-ja"); val pb = tmpDir("kmv-jb")
    val shared = (0 until 120).map(i => ("g", s"s$i"))
    val onlyA = (0 until 40).map(i => ("g", s"a$i"))
    val onlyB = (0 until 40).map(i => ("g", s"b$i"))
    KmvStream.applyBatch(pa, "grp", "v", kj)(df((shared ++ onlyA): _*), 0L)
    KmvStream.applyBatch(pb, "grp", "v", kj)(df((shared ++ onlyB): _*), 0L)
    val est = Kmv.jaccardEst(KmvStream.latest(spark, pa),
      KmvStream.latest(spark, pb), kj).collect().head
    // true J = 120/200 = 0.6; hypergeometric sd at k=64 over 200
    // union values ≈ 0.05 — a ±0.2 band is > 3σ of deterministic slack
    assert(est.getAs[Long]("n_u") === kj.toLong)
    val j = est.getAs[Long]("est_jaccard_ppm")
    assert(j > 400000L && j < 800000L, s"est_jaccard_ppm $j")
  }

  test("null values drop; null groups stay bounded across batches") {
    val statePath = tmpDir("kmv-nulls")
    val apply = KmvStream.applyBatch(statePath, "grp", "v", k) _
    val withNulls = Seq(("g", "a"), ("g", null), (null, "b"))
    apply(withNulls.toDF("grp", "v"), 0L)
    val n0 = spark.read.parquet(s"$statePath/mins").count()
    assert(n0 === 2L) // (g,a) and (null-group, b); null VALUE dropped
    apply(withNulls.toDF("grp", "v"), 1L)
    assert(spark.read.parquet(s"$statePath/mins").count() === n0)
  }

  test("latest() on an all-empty stream is an empty frame, not an NPE") {
    val statePath = tmpDir("kmv-empty")
    KmvStream.applyBatch(statePath, "grp", "v", k)(df(), 0L)
    assert(KmvStream.latest(spark, statePath).count() === 0L)
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("kmv-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)](spark)
    val rows = (0 until 100).map(i => ("g", s"val$i"))
    src.addData(rows: _*)
    val q = KmvStream.start(src.toDF().toDF("grp", "v"), statePath,
      "grp", "v", k, tmpDir("kmv-ckpt"))
    q.awaitTermination(60000)
    assert(latest(statePath) === batchRef(rows))
  }
}
