package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** X134 streaming form: online k-anonymity release audit — every
  * batch's snapshot equals the batch operator over everything seen so
  * far; at-risk classes HEAL as they grow past k; replay idempotent;
  * state folds mid-stream.
  */
class KAnonymityStreamSpec extends SparkSpec {

  import spark.implicits._

  private val qids = Seq("lang", "source")

  // batch 0: (en, webA) is a healthy class of 3, (fr, webB) a
  // singleton, one null-lang row its own class; batch 1 heals
  // (fr, webB) past k=2 and introduces a NEW singleton (de, webC)
  private val batch0: Seq[(String, String)] = Seq(
    ("en", "webA"), ("en", "webA"), ("en", "webA"),
    ("fr", "webB"), (null.asInstanceOf[String], "webA"))
  private val batch1: Seq[(String, String)] = Seq(
    ("fr", "webB"), ("de", "webC"))

  private def run(statePath: String, rows: Seq[(String, String)],
                  batchId: Long): Unit =
    KAnonymityStream.applyBatch(statePath, qids, 2L)(
      rows.toDF("lang", "source"), batchId)

  private def snap(statePath: String) =
    KAnonymityStream.latest(spark, statePath)
      .orderBy("lang", "source").collect().map(_.toSeq).toSeq

  private def batchOp(rows: Seq[(String, String)]) =
    graft.ops.Pii.kAnonymity(rows.toDF("lang", "source"), qids, 2L)
      .orderBy("lang", "source").collect().map(_.toSeq).toSeq

  test("every batch's snapshot equals the batch operator over all " +
    "docs so far; singletons heal as their class grows past k") {
    val state = tmpDir("kas-snap")
    run(state, batch0, 0L)
    val s0 = snap(state)
    assert(s0 === batchOp(batch0))
    // after batch 0: (fr,webB) and (null,webA) are at-risk singletons
    assert(s0.find(r => r.head == "fr").get ===
      Seq("fr", "webB", 1L, true, 2L))
    run(state, batch1, 1L)
    val s1 = snap(state)
    assert(s1 === batchOp(batch0 ++ batch1))
    // (fr,webB) healed to k_size 2; (de,webC) is the new leak; the
    // suppression total moved from 2 (fr + null) to 2 (de + null)
    assert(s1.find(r => r.head == "fr").get ===
      Seq("fr", "webB", 2L, false, 2L))
    assert(s1.find(r => r.head == "de").get ===
      Seq("de", "webC", 1L, true, 2L))
    assert(s1.find(r => r.head == null).get ===
      Seq(null, "webA", 1L, true, 2L))
  }

  test("replaying a batch rewrites identical partitions (exactly-once)") {
    val state = tmpDir("kas-replay")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    run(state, batch1, 1L) // at-least-once
    assert(snap(state) === before)
  }

  test("state maintenance: counts fold, risk snapshots prune, the " +
    "stream continues on the folded ledger") {
    val state = tmpDir("kas-maint")
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val before = snap(state)
    val (nFold, nPrune) = StateMaintenance.maintain(spark, state,
      "KAnonymityStream", 2L)
    assert(nFold === 2 && nPrune === 1)
    assert(snap(state) === before)
    run(state, Seq(("de", "webC")), 2L)
    assert(snap(state) === batchOp(batch0 ++ batch1 :+ (("de", "webC"))))
  }

  test("sweep over the accumulated ledger equals the batch sweep over " +
    "everything ingested, before and after a fold; empty pre-ingest") {
    val state = tmpDir("kas-sweep")
    val ksList = Seq(2L, 3L)
    def sweepNow() = KAnonymityStream.sweep(spark, state, qids, ksList)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(sweepNow() === Seq.empty) // fixed schema, no committed batch
    run(state, batch0, 0L)
    run(state, batch1, 1L)
    val want = graft.ops.Pii.kAnonymitySweep(
        (batch0 ++ batch1).toDF("lang", "source"), qids, ksList)
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(sweepNow() === want)
    StateMaintenance.maintain(spark, state, "KAnonymityStream", 2L)
    assert(sweepNow() === want) // the fold changes nothing observable
  }

  test("end-to-end through a self-maintaining streaming query") {
    implicit val sqlCtx = spark.sqlContext
    val state = tmpDir("kas-e2e")
    val ckpt = tmpDir("kas-ckpt")
    val in = MemoryStream[(String, String)]
    for (b <- Seq(batch0, batch1)) {
      in.addData(b)
      val q = KAnonymityStream.start(in.toDF().toDF("lang", "source"),
        state, qids, 2L, ckpt, maintainEvery = 1)
      assert(q.awaitTermination(60000), "query did not terminate")
    }
    assert(snap(state) === batchOp(batch0 ++ batch1))
    assert(new java.io.File(s"$state/counts/batch_id=-1").isDirectory)
  }
}
