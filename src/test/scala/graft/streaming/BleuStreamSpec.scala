package graft.streaming

import graft.SparkSpec
import graft.ops.Bleu
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.Row

/** X96 streaming form: accumulated batches equal the batch operator on
  * their union (the shared-estimator point-in-time contract), state is
  * group-count-bounded integer rows (no retained text), replay
  * idempotent, end-to-end through the engine.
  */
class BleuStreamSpec extends SparkSpec {
  import spark.implicits._

  private val maxN = 2

  private def pairs(rows: (String, Long, String, String)*): DataFrame =
    rows.toDF("grp", "pid", "hyp", "ref")

  private def snap(statePath: String): Map[String, Row] =
    BleuStream.latest(spark, statePath)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap

  private def batchRef(rows: Seq[(String, Long, String, String)]): Map[String, Row] =
    Bleu.corpusBleu(pairs(rows: _*), "grp", "pid", "hyp", "ref", maxN)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap

  private def sameScores(a: Map[String, Row], b: Map[String, Row]): Unit = {
    assert(a.keySet === b.keySet)
    for ((g, ra) <- a; rb = b(g); c <- Seq("m1", "m2", "t1", "t2", "c", "r"))
      assert(ra.getAs[Long](c) === rb.getAs[Long](c), s"$g.$c")
    for ((g, ra) <- a)
      assert(ra.getAs[Double]("bleu") === b(g).getAs[Double]("bleu"), s"$g.bleu")
  }

  test("accumulated batches equal the batch operator on their union") {
    val statePath = tmpDir("bleu-acc")
    val apply = BleuStream.applyBatch(
      statePath, "grp", "pid", "hyp", "ref", maxN) _
    val b0 = Seq(("en", 1L, "a b c d", "a b x d"), ("de", 2L, "p q", "p q r s"))
    val b1 = Seq(("en", 3L, "a b", "a b"), ("fr", 4L, "u v w", "z z z"))
    apply(pairs(b0: _*), 0L)
    sameScores(snap(statePath), batchRef(b0))
    apply(pairs(b1: _*), 1L)
    // the union picks up a new group (fr) and shifts en's clipped sums
    sameScores(snap(statePath), batchRef(b0 ++ b1))
  }

  test("state is count rows only — group-bounded, no text retained") {
    val statePath = tmpDir("bleu-state")
    val apply = BleuStream.applyBatch(
      statePath, "grp", "pid", "hyp", "ref", maxN) _
    val many = (0 until 200).map(i => ("en", i.toLong, s"tok$i a", "a b"))
    apply(pairs(many: _*), 0L)
    val st = spark.read.parquet(s"$statePath/counts")
    assert(st.count() === 1L, "200 pairs, one group => one state row")
    assert(!st.columns.exists(c => c == "hyp" || c == "ref" || c == "pid"))
  }

  test("replay of a batch is idempotent") {
    val statePath = tmpDir("bleu-replay")
    val apply = BleuStream.applyBatch(
      statePath, "grp", "pid", "hyp", "ref", maxN) _
    val b0 = Seq(("en", 1L, "a b c", "a b c"))
    apply(pairs(b0: _*), 0L)
    val s0 = snap(statePath)
    apply(pairs(b0: _*), 0L) // at-least-once redelivery
    sameScores(snap(statePath), s0)
    assert(spark.read.parquet(s"$statePath/counts").count() === 1L)
  }

  test("end-to-end through the engine equals the batch operator") {
    val statePath = tmpDir("bleu-e2e")
    val src = tmpDir("bleu-src")
    val rows = Seq(("en", 1L, "the cat sat", "the cat sat"),
      ("en", 2L, "a b", "a c"), ("de", 3L, "x y z", "x y q"))
    pairs(rows: _*).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(pairs(rows: _*).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    BleuStream.start(stream, statePath, "grp", "pid", "hyp", "ref", maxN,
      tmpDir("bleu-ckpt")).awaitTermination()
    sameScores(snap(statePath), batchRef(rows))
  }
}
