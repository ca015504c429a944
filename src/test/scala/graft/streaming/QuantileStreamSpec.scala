package graft.streaming

import graft.SparkSpec
import graft.ops.Quantile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** X91 streaming form: estimates equal the shared estimator over the
  * merged per-batch summaries, the merged rank bound (n/k + B·shards)
  * holds against the union data, state appends one bounded summary per
  * batch, replay idempotent, end-to-end through the engine.
  */
class QuantileStreamSpec extends SparkSpec {
  import spark.implicits._

  private val shards = 4
  private val k = 10
  private val phis = Seq(500000L, 900000L) // p50, p90

  private def df(rows: (String, Long, Long)*): DataFrame =
    rows.toDF("grp", "id", "v")

  private def latest(statePath: String): Map[(String, Long), (Long, Long, Long)] =
    QuantileStream.latest(spark, statePath).collect()
      .map(r => (r.getString(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getLong(4)))).toMap

  test("estimates equal the shared estimator over merged batch summaries") {
    val statePath = tmpDir("qs-acc")
    val apply = QuantileStream.applyBatch(statePath, "grp", "v", "id",
      shards, k, phis) _
    val b0 = (0L until 200L).map(i => ("g", i, (i * 37) % 1000))
    val b1 = (200L until 350L).map(i => ("g", i, (i * 91) % 500))
    apply(df(b0: _*), 0L)
    apply(df(b1: _*), 1L)
    // hand-merge the two per-batch summaries and score through the
    // SAME estimator fragment — must match the emitted snapshot exactly
    val merged = Quantile.summary(df(b0: _*), "grp", "v", "id", shards, k)
      .unionByName(
        Quantile.summary(df(b1: _*), "grp", "v", "id", shards, k))
    val want = Quantile.estimateFromSummary(merged, phis).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("est"),
          r.getAs[Long]("target")))).toMap
    assert(latest(statePath) === want)
  }

  test("merged rank bound holds: |rank(est) - target| <= n/k + B*shards") {
    val statePath = tmpDir("qs-bound")
    val apply = QuantileStream.applyBatch(statePath, "grp", "v", "id",
      shards, k, phis) _
    val batches = (0 until 3).map(b =>
      (b * 300L until (b + 1) * 300L).map(i => ("g", i, (i * 53) % 2000)))
    batches.zipWithIndex.foreach { case (rows, b) =>
      apply(df(rows: _*), b.toLong)
    }
    val all = batches.flatten.map(_._3).sorted
    val n = all.length
    val bound = n / k + batches.length * shards
    for (((_, _), (gotN, est, target)) <- latest(statePath)) {
      assert(gotN === n.toLong)
      val rankLo = all.count(_ < est) + 1
      val rankHi = all.count(_ <= est)
      // true rank interval of est must straddle within the bound
      assert(rankHi >= target - bound && rankLo <= target + bound,
        s"est $est rank [$rankLo,$rankHi] target $target bound $bound")
    }
  }

  test("state appends one bounded summary per batch; replay idempotent") {
    val statePath = tmpDir("qs-replay")
    val apply = QuantileStream.applyBatch(statePath, "grp", "v", "id",
      shards, k, phis) _
    val rows = (0L until 500L).map(i => ("g", i, i % 777))
    apply(df(rows: _*), 0L)
    val n0 = spark.read.parquet(s"$statePath/summ").count()
    assert(n0 <= (shards * (k + 1)).toLong) // bounded regardless of 500 rows
    val snap0 = latest(statePath)
    // replay the same batch: identical prior (strict < N), identical
    // partitions rewritten — state count and snapshot unchanged
    apply(df(rows: _*), 0L)
    assert(spark.read.parquet(s"$statePath/summ").count() === n0)
    assert(latest(statePath) === snap0)
  }

  test("latest() on an all-empty stream is an empty frame, not an NPE") {
    val statePath = tmpDir("qs-empty")
    QuantileStream.applyBatch(statePath, "grp", "v", "id", shards, k,
      phis)(df(), 0L)
    assert(QuantileStream.latest(spark, statePath).count() === 0L)
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("qs-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long, Long)](spark)
    val rows = (0L until 400L).map(i => ("g", i, (i * 13) % 997))
    src.addData(rows: _*)
    val q = QuantileStream.start(src.toDF().toDF("grp", "id", "v"),
      statePath, "grp", "v", "id", shards, k, phis, tmpDir("qs-ckpt"))
    q.awaitTermination(60000)
    // the p50 estimate must sit near the true median of the union
    val n = rows.length
    val all = rows.map(_._3).sorted
    val (gotN, est, target) = latest(statePath)(("g", 500000L))
    assert(gotN === n.toLong)
    val bound = n / k + shards // single engine batch here
    val rankLo = all.count(_ < est) + 1
    val rankHi = all.count(_ <= est)
    assert(rankHi >= target - bound && rankLo <= target + bound)
  }
}
