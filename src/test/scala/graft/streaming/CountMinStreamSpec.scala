package graft.streaming

import graft.SparkSpec
import graft.ops.CountMin
import org.apache.spark.sql.DataFrame

/** X89 streaming form: accumulated batches equal the batch operator on
  * their union, the over-estimate guarantee holds at every snapshot,
  * replay idempotent, end-to-end through the engine.
  */
class CountMinStreamSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val hexDigits = 1 // 16 buckets/lane: collisions in-test
  private val watch = Seq("hot", "warm", "never-seen")

  private def df(rows: String*): DataFrame = rows.toDF("token")

  private def latest(statePath: String): Map[String, Long] =
    CountMinStream.latest(spark, statePath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private def batchRef(rows: Seq[String]): Map[String, Long] =
    CountMin.estimate(
        CountMin.sketch(rows.toDF("token"), "token", depth, hexDigits),
        watch.toDF("token"), "token", depth, hexDigits)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("accumulated batches equal the batch sketch on their union") {
    val statePath = tmpDir("cms-acc")
    val apply = CountMinStream.applyBatch(
      statePath, "token", watch, depth, hexDigits) _
    val b0 = Seq.fill(30)("hot") ++ (0 until 50).map(i => s"noise $i")
    val b1 = Seq.fill(5)("warm") ++ Seq.fill(10)("hot")
    apply(df(b0: _*), 0L)
    assert(latest(statePath) === batchRef(b0))
    apply(df(b1: _*), 1L)
    val got = latest(statePath)
    assert(got === batchRef(b0 ++ b1))
    // the guarantee at the snapshot: never below the true stream count
    assert(got("hot") >= 40L)
    assert(got("warm") >= 5L)
  }

  test("state stays sketch-bounded and replay is idempotent") {
    val statePath = tmpDir("cms-replay")
    val apply = CountMinStream.applyBatch(
      statePath, "token", watch, depth, hexDigits) _
    apply(df((0 until 200).map(i => s"t $i"): _*), 0L)
    val n0 = spark.read.parquet(s"$statePath/sk").count()
    assert(n0 <= depth * 16L, "delta sketch must be counter-bounded")
    val snap0 = latest(statePath)
    // replay batch 0: identical prior (none), identical partitions
    apply(df((0 until 200).map(i => s"t $i"): _*), 0L)
    assert(spark.read.parquet(s"$statePath/sk").count() === n0)
    assert(latest(statePath) === snap0)
  }

  test("an empty batch still snapshots (zero estimates allowed)") {
    val statePath = tmpDir("cms-empty")
    CountMinStream.applyBatch(statePath, "token", watch, depth,
      hexDigits)(df(), 0L)
    val got = latest(statePath)
    assert(got.keySet === watch.toSet)
    assert(got.values.forall(_ === 0L))
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("cms-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String](spark)
    val rows = Seq.fill(25)("hot") ++ (0 until 60).map(i => s"w $i")
    src.addData(rows: _*)
    val q = CountMinStream.start(src.toDF().toDF("token"), statePath,
      "token", watch, depth, hexDigits, tmpDir("cms-ckpt"))
    q.awaitTermination(60000)
    assert(latest(statePath) === batchRef(rows))
  }
}
