package graft.streaming

import graft.SparkSpec
import graft.ops.Sketch
import org.apache.spark.sql.DataFrame

/** X83 streaming form: accumulated batches equal the batch operator's
  * sketch columns, state appends novel buckets only, replay idempotent,
  * end-to-end through the engine.
  */
class CardinalityStreamSpec extends SparkSpec {
  import spark.implicits._

  private val hexDigits = 2 // m = 256: small enough to collide in-test

  private def df(rows: (String, String)*): DataFrame =
    rows.toDF("grp", "v")

  private def latest(statePath: String): Map[String, (Long, Double)] =
    CardinalityStream.latest(spark, statePath)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def batchRef(rows: Seq[(String, String)]): Map[String, (Long, Double)] =
    Sketch.linearCount(rows.toDF("grp", "v"), "grp", "v", hexDigits)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("accumulated batches equal the batch sketch on their union") {
    val statePath = tmpDir("card-acc")
    val apply = CardinalityStream.applyBatch(
      statePath, "grp", "v", hexDigits) _
    val b0 = (0 until 60).map(i => ("g", s"a$i")) :+ (("h", "x"))
    val b1 = (30 until 120).map(i => ("g", s"a$i")) // overlaps b0
    apply(df(b0: _*), 0L)
    assert(latest(statePath) === batchRef(b0))
    apply(df(b1: _*), 1L)
    assert(latest(statePath) === batchRef(b0 ++ b1))
  }

  test("state appends novel buckets only; replay idempotent") {
    val statePath = tmpDir("card-novel")
    val apply = CardinalityStream.applyBatch(
      statePath, "grp", "v", hexDigits) _
    apply(df(("g", "v1"), ("g", "v1")), 0L)
    val n0 = spark.read.parquet(s"$statePath/buckets").count()
    assert(n0 === 1L)
    // same value again: nothing novel
    apply(df(("g", "v1")), 1L)
    assert(spark.read.parquet(s"$statePath/buckets").count() === n0)
    // replay batch 1: identical prior state, identical partitions
    apply(df(("g", "v1")), 1L)
    assert(spark.read.parquet(s"$statePath/buckets").count() === n0)
  }

  test("null values drop; null groups stay bounded across batches") {
    val statePath = tmpDir("card-nulls")
    val apply = CardinalityStream.applyBatch(
      statePath, "grp", "v", hexDigits) _
    val withNulls = Seq(("g", "a"), ("g", null), (null, "b"))
    apply(withNulls.toDF("grp", "v"), 0L)
    val n0 = spark.read.parquet(s"$statePath/buckets").count()
    assert(n0 === 2L) // (g,a) and (null-group, b); null VALUE dropped
    // the same rows again: the null-group bucket must NOT re-append
    apply(withNulls.toDF("grp", "v"), 1L)
    assert(spark.read.parquet(s"$statePath/buckets").count() === n0)
  }

  test("latest() on an all-empty stream is an empty frame, not an NPE") {
    val statePath = tmpDir("card-empty")
    CardinalityStream.applyBatch(statePath, "grp", "v", hexDigits)(
      df(), 0L)
    assert(CardinalityStream.latest(spark, statePath).count() === 0L)
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("card-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)](spark)
    val rows = (0 until 40).map(i => ("g", s"val$i"))
    src.addData(rows: _*)
    val q = CardinalityStream.start(src.toDF().toDF("grp", "v"),
      statePath, "grp", "v", hexDigits, tmpDir("card-ckpt"))
    q.awaitTermination(60000)
    assert(latest(statePath) === batchRef(rows))
  }
}
