package graft.streaming

import graft.SparkSpec
import graft.ops.{C4, CodeDetect, Gopher, MassiveText}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The x64/x65/x67/x68/x72/x73/x81 gates are pure scan-side projections
  * (zero shuffle, plan-pinned), so they need no streaming twin: the SAME
  * DataFrame operators run unchanged on an unbounded stream. This spec
  * is that claim executed — each gate applied to a MemoryStream in
  * append mode, batch-equal output, no state store.
  */
class StatelessGateStreamSpec extends SparkSpec {
  import spark.implicits._

  private val pages = Seq(
    (1L, (10 to 69).map(i => s"w${i}a the w${i}b of w${i}c.").mkString("\n")),
    (2L, "no terminal punct\nshort.\nhas { brace."),
    (3L, Seq.fill(20)("same line here again.").mkString("\n")))

  test("C4, Gopher, and the composed gate stream batch-equal in append " +
    "mode with no state store") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    in.addData(pages: _*)
    val streamDf = in.toDF().toDF("doc_id", "page")
    val batchDf = pages.toDF("doc_id", "page")

    def runAppend(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                  name: String): Array[org.apache.spark.sql.Row] = {
      val q = f(streamDf).writeStream.format("memory")
        .queryName(name).outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(60000)
      spark.table(name).collect()
    }

    val c4Stream = runAppend(C4.clean(_, "doc_id", "page"), "c4_gate")
    assert(c4Stream.toSet ===
      C4.clean(batchDf, "doc_id", "page").collect().toSet)

    val qStream = runAppend(Gopher.qualityRules(_, "doc_id", "page"),
      "quality_gate")
    assert(qStream.toSet ===
      Gopher.qualityRules(batchDf, "doc_id", "page").collect().toSet)

    val repStream = runAppend(Gopher.repetitionSignals(_, "doc_id", "page"),
      "rep_gate")
    assert(repStream.toSet ===
      Gopher.repetitionSignals(batchDf, "doc_id", "page").collect().toSet)

    val mtStream = runAppend(MassiveText.gate(_, "doc_id", "page"),
      "mt_gate")
    assert(mtStream.toSet ===
      MassiveText.gate(batchDf, "doc_id", "page").collect().toSet)

    val cdStream = runAppend(CodeDetect.detect(_, "doc_id", "page"),
      "code_gate")
    assert(cdStream.toSet ===
      CodeDetect.detect(batchDf, "doc_id", "page").collect().toSet)

    val smStream = runAppend(graft.ops.ScriptMix.analyze(_, "doc_id", "page"),
      "script_gate")
    assert(smStream.toSet ===
      graft.ops.ScriptMix.analyze(batchDf, "doc_id", "page").collect().toSet)

    // x81 span corruption is row-local too: pair materialization can
    // run directly on the ingest stream
    val scStream = runAppend(
      graft.ops.Augment.spanCorrupt(_, "doc_id", "page"), "span_gate")
    assert(scStream.toSet ===
      graft.ops.Augment.spanCorrupt(batchDf, "doc_id", "page")
        .collect().toSet)
  }
}
