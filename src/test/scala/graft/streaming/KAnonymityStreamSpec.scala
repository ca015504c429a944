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

  test("generalize over the accumulated ledger equals the batch " +
    "generalization curve over everything ingested, before and after " +
    "a fold (finest bucket in the twin's tuple)") {
    val state = tmpDir("kas-gen")
    val b0 = 5L
    val buckets = Seq(5L, 10L, 20L)
    // the twin's tuple carries the FINEST bucket (len div 5)
    val gqids = Seq("lang", "len_b")
    def docs(rows: Seq[(String, Long)]) = rows.toDF("lang", "len")
    def ingest(rows: Seq[(String, Long)], id: Long): Unit =
      KAnonymityStream.applyBatch(state, gqids, 2L)(
        docs(rows).withColumn("len_b",
          org.apache.spark.sql.functions.expr("len div 5")), id)
    def genNow() = KAnonymityStream.generalize(spark, state,
        Seq("lang"), "len_b", b0, buckets, 2L)
      .orderBy("bucket").collect().map(_.toSeq).toSeq
    def want(rows: Seq[(String, Long)]) =
      graft.ops.Pii.kAnonymityGeneralize(docs(rows), Seq("lang"), "len",
        buckets, 2L).orderBy("bucket").collect().map(_.toSeq).toSeq
    // fixed schema before any commit: the all-zero curve
    assert(genNow() === want(Seq.empty))
    val rows0 = Seq(("en", 12L), ("en", 13L), ("en", 27L), ("fr", 8L),
      (null.asInstanceOf[String], 40L))
    // en spans finest buckets 2, 5 and 7 — bucket width 20 merges 27
    // and 38 into one class, so the curve is non-trivial
    val rows1 = Seq(("fr", 9L), ("de", 33L), ("en", 14L), ("en", 38L))
    ingest(rows0, 0L)
    ingest(rows1, 1L)
    assert(genNow() === want(rows0 ++ rows1))
    // the curve is non-trivial: coarser buckets merge classes
    assert(genNow().map(_(1)).distinct.size > 1) // n_classes varies
    StateMaintenance.maintain(spark, state, "KAnonymityStream", 2L)
    assert(genNow() === want(rows0 ++ rows1)) // fold changes nothing
    // a misaligned bucket fails loudly, same contract as the batch op
    intercept[IllegalArgumentException] {
      KAnonymityStream.generalize(spark, state, Seq("lang"), "len_b",
        b0, Seq(7L), 2L).collect()
    }
  }

  test("lDiversity and tCloseness over the accumulated ledger equal " +
    "the batch operators over everything ingested, before and after a " +
    "fold (sensitive attribute in the twin's tuple)") {
    val state = tmpDir("kas-ldiv")
    // twin started with tuple (lang, source, sv): its ledger IS the
    // sensitiveClassCounts shape for quasi tuple (lang, source)
    val tuple = Seq("lang", "source", "sv")
    def docs(rows: Seq[(String, String, String)]) =
      rows.toDF("lang", "source", "sv")
    def ingest(rows: Seq[(String, String, String)], id: Long): Unit =
      KAnonymityStream.applyBatch(state, tuple, 2L)(docs(rows), id)
    val ls = Seq(2L, 3L)
    def ldNow() = KAnonymityStream.lDiversity(spark, state,
      Seq("lang", "source"), "sv", ls).orderBy("l")
      .collect().map(_.toSeq).toSeq
    def tcNow() = KAnonymityStream.tCloseness(spark, state,
      Seq("lang", "source"), "sv", 300000L)
      .orderBy("lang", "source").collect().map(_.toSeq).toSeq
    // fixed schemas before any commit
    assert(ldNow() === Seq.empty)
    assert(tcNow() === Seq.empty)
    val rows0 = Seq(("en", "webA", "s1"), ("en", "webA", "s1"),
      ("fr", "webB", "s2"), (null.asInstanceOf[String], "webA", "s1"))
    val rows1 = Seq(("en", "webA", "s2"), ("fr", "webB", "s2"),
      ("en", "webA", null.asInstanceOf[String]))
    ingest(rows0, 0L)
    ingest(rows1, 1L)
    val all = rows0 ++ rows1
    def ldWant() = graft.ops.Pii.lDiversity(docs(all),
      Seq("lang", "source"), "sv", ls).orderBy("l")
      .collect().map(_.toSeq).toSeq
    def tcWant() = graft.ops.Pii.tCloseness(docs(all),
      Seq("lang", "source"), "sv", 300000L)
      .orderBy("lang", "source").collect().map(_.toSeq).toSeq
    assert(ldNow() === ldWant())
    assert(tcNow() === tcWant())
    StateMaintenance.maintain(spark, state, "KAnonymityStream", 2L)
    assert(ldNow() === ldWant()) // the fold changes nothing observable
    assert(tcNow() === tcWant())
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
