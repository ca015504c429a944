package graft.streaming

import graft.SparkSpec
import graft.ops.Sketch
import org.apache.spark.sql.DataFrame

/** X88 streaming form: accumulated batches equal the batch sketch on
  * their union, state appends strict register improvements only,
  * replay idempotent, survives cardinalities the linear-counting twin
  * cannot, end-to-end through the engine.
  */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._

  private val hexDigits = 2 // m = 256

  private def df(rows: (String, String)*): DataFrame =
    rows.toDF("grp", "v")

  private def latest(statePath: String): Map[String, (Long, Double)] =
    HllStream.latest(spark, statePath)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap

  private def batchRef(rows: Seq[(String, String)]): Map[String, (Long, Double)] =
    Sketch.hll(rows.toDF("grp", "v"), "grp", "v", hexDigits)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap

  test("accumulated batches equal the batch sketch on their union") {
    val statePath = tmpDir("hll-acc")
    val apply = HllStream.applyBatch(statePath, "grp", "v", hexDigits) _
    val b0 = (0 until 300).map(i => ("g", s"a$i")) :+ (("h", "x"))
    val b1 = (150 until 600).map(i => ("g", s"a$i")) // overlaps b0
    apply(df(b0: _*), 0L)
    assert(latest(statePath) === batchRef(b0))
    apply(df(b1: _*), 1L)
    assert(latest(statePath) === batchRef(b0 ++ b1))
  }

  test("state appends strict improvements only; replay idempotent") {
    val statePath = tmpDir("hll-novel")
    val apply = HllStream.applyBatch(statePath, "grp", "v", hexDigits) _
    apply(df(("g", "v1"), ("g", "v1")), 0L)
    val n0 = spark.read.parquet(s"$statePath/regs").count()
    assert(n0 === 1L)
    // same value again: its register cannot improve
    apply(df(("g", "v1")), 1L)
    assert(spark.read.parquet(s"$statePath/regs").count() === n0)
    // replay batch 1: identical prior maxima, identical partitions
    apply(df(("g", "v1")), 1L)
    assert(spark.read.parquet(s"$statePath/regs").count() === n0)
  }

  test("survives a stream linear counting saturates on") {
    // 5000 distinct values into m=256: CardinalityStream's estimator
    // would raise at read time; the register twin keeps estimating
    val statePath = tmpDir("hll-big")
    val apply = HllStream.applyBatch(statePath, "grp", "v", hexDigits) _
    val rows = (0 until 5000).map(i => ("g", s"v$i"))
    rows.grouped(2000).zipWithIndex.foreach { case (chunk, i) =>
      apply(df(chunk: _*), i.toLong)
    }
    val (filled, est) = latest(statePath)("g")
    assert(filled === 256L)
    assert(math.abs(est - 5000.0) / 5000.0 < 3 * 1.04 / 16)
    assert(latest(statePath) === batchRef(rows))
  }

  test("null values drop; null groups stay bounded across batches") {
    val statePath = tmpDir("hll-nulls")
    val apply = HllStream.applyBatch(statePath, "grp", "v", hexDigits) _
    val withNulls = Seq(("g", "a"), ("g", null), (null, "b"))
    apply(withNulls.toDF("grp", "v"), 0L)
    val n0 = spark.read.parquet(s"$statePath/regs").count()
    assert(n0 === 2L) // (g,a) and (null-group, b); null VALUE dropped
    apply(withNulls.toDF("grp", "v"), 1L)
    assert(spark.read.parquet(s"$statePath/regs").count() === n0)
  }

  test("latest() on an all-empty stream is an empty frame, not an NPE") {
    val statePath = tmpDir("hll-empty")
    HllStream.applyBatch(statePath, "grp", "v", hexDigits)(df(), 0L)
    assert(HllStream.latest(spark, statePath).count() === 0L)
  }

  test("end to end through the streaming engine") {
    val statePath = tmpDir("hll-e2e")
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)](spark)
    val rows = (0 until 400).map(i => ("g", s"val$i"))
    src.addData(rows: _*)
    val q = HllStream.start(src.toDF().toDF("grp", "v"), statePath,
      "grp", "v", hexDigits, tmpDir("hll-ckpt"))
    q.awaitTermination(60000)
    assert(latest(statePath) === batchRef(rows))
  }
}
