package graft.streaming

import graft.SparkSpec
import graft.ops.CorpusStats
import org.apache.spark.sql.DataFrame

/** X104 streaming form: accumulated batches equal the batch operator
  * on their union vs the pinned reference, state is bucket-bounded
  * integer rows, replay idempotent, end-to-end through the engine.
  */
class PsiDriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private val nBuckets = 16

  private def docs(rows: (String, String)*): DataFrame =
    rows.toDF("lang", "text")

  private def snap(statePath: String): Map[String, Double] =
    PsiDriftStream.latest(spark, statePath).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("psi")).toMap

  private def batchRef(cur: Seq[(String, String)],
                       ref: Seq[(String, String)]): Map[String, Double] =
    CorpusStats.psiDrift(docs(cur: _*), docs(ref: _*), "lang", "text",
        nBuckets).collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("psi")).toMap

  test("accumulated batches equal the batch operator vs the reference") {
    val statePath = tmpDir("psi-acc")
    val ref = Seq(("en", "stable words here again and again"))
    PsiDriftStream.writeReference(docs(ref: _*), statePath, "lang",
      "text", nBuckets)
    val apply = PsiDriftStream.applyBatch(statePath, "lang", "text",
      nBuckets) _
    val b0 = Seq(("en", "stable words here mostly"))
    val b1 = Seq(("en", "novel vocabulary floods in now"))
    apply(docs(b0: _*), 0L)
    assert(snap(statePath) === batchRef(b0, ref))
    apply(docs(b1: _*), 1L)
    // drift grows as the novel batch accumulates
    val s1 = snap(statePath)
    assert(s1 === batchRef(b0 ++ b1, ref))
    assert(s1("en") > batchRef(b0, ref)("en"))
  }

  test("state is bucket-bounded count rows, no text retained") {
    val statePath = tmpDir("psi-state")
    PsiDriftStream.writeReference(docs(("en", "r")), statePath, "lang",
      "text", nBuckets)
    val apply = PsiDriftStream.applyBatch(statePath, "lang", "text",
      nBuckets) _
    val many = (0 until 300).map(i => ("en", s"tok$i other$i more$i"))
    apply(docs(many: _*), 0L)
    val st = spark.read.parquet(s"$statePath/cur")
    assert(st.count() <= nBuckets.toLong, "state must be bucket-bounded")
    assert(st.columns.toSet.subsetOf(Set("grp", "bkt", "c", "batch_id")))
  }

  test("replay is idempotent") {
    val statePath = tmpDir("psi-replay")
    PsiDriftStream.writeReference(docs(("en", "a b c")), statePath,
      "lang", "text", nBuckets)
    val apply = PsiDriftStream.applyBatch(statePath, "lang", "text",
      nBuckets) _
    apply(docs(("en", "a b d")), 0L)
    val s0 = snap(statePath)
    apply(docs(("en", "a b d")), 0L) // at-least-once redelivery
    assert(snap(statePath) === s0)
    assert(spark.read.parquet(s"$statePath/cur").count() ===
      spark.read.parquet(s"$statePath/cur/batch_id=0").count())
  }

  test("end-to-end through the engine equals the batch operator") {
    val statePath = tmpDir("psi-e2e")
    val src = tmpDir("psi-src")
    val ref = Seq(("en", "reference text body"), ("de", "anders hier"))
    val rows = Seq(("en", "reference text body"), ("en", "new stuff"),
      ("de", "anders hier auch"))
    PsiDriftStream.writeReference(docs(ref: _*), statePath, "lang",
      "text", nBuckets)
    docs(rows: _*).write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(docs(rows: _*).schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    PsiDriftStream.start(stream, statePath, "lang", "text", nBuckets,
      tmpDir("psi-ckpt")).awaitTermination()
    assert(snap(statePath) === batchRef(rows, ref))
  }
}
