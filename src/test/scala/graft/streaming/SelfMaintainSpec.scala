package graft.streaming

import java.io.File

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Every twin's `start()` now routes through
  * [[StateMaintenance.selfMaintaining]]: one spec per STATE SHAPE
  * proving a long stream keeps its own partition count bounded with no
  * external maintenance call, while every observable answer stays
  * identical to an unmaintained control run.
  *
  *   - UNION-READ deltas (DedupStream docs/bands/pairs): folds into
  *     the batch_id=-1 sentinel;
  *   - SNAPSHOT answers (HllStream card): superseded snapshots prune,
  *     the latest survives;
  *   - VERSIONED-ALLOC (UniMaxStream alloc): retired versions prune
  *     AND point-in-time reads of them fail loudly, never silently
  *     empty.
  */
class SelfMaintainSpec extends SparkSpec {

  import spark.implicits._

  private def text(tail: String): String =
    (1 to 39).map(i => s"tok$i").mkString(" ") + " " + tail
  private def distinctText(seed: Int): String =
    (1 to 40).map(i => s"other${seed}_$i").mkString(" ")

  private def parts(dir: String): Set[String] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
      .filter(_.startsWith("batch_id=")).toSet

  test("union-read shape: a 6-batch DedupStream bounds its own " +
    "partition count; pairs identical to the unmaintained control") {
    implicit val sqlCtx = spark.sqlContext
    val batches: Seq[Seq[(Long, String)]] = Seq(
      Seq(1L -> text("tailA"), 2L -> distinctText(1)),
      Seq(3L -> text("tailB"), 4L -> distinctText(2)),
      Seq(5L -> distinctText(3)),
      Seq(6L -> text("tailC")),
      Seq(7L -> distinctText(4), 8L -> text("tailD")),
      Seq(9L -> distinctText(5)))
    def drive(maintainEvery: Int): String = {
      val state = tmpDir(s"auto-dedup-$maintainEvery")
      val ckpt = tmpDir(s"auto-dedup-ckpt-$maintainEvery")
      val in = MemoryStream[(Long, String)]
      for (b <- batches) {
        in.addData(b)
        val q = DedupStream.start(in.toDF().toDF("doc_id", "text"),
          state, "doc_id", "text", ckpt, maintainEvery = maintainEvery)
        assert(q.awaitTermination(60000), "query did not terminate")
      }
      state
    }
    val maintained = drive(2)
    val control = drive(0)
    def pairsSet(p: String) = DedupStream.pairs(spark, p)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairsSet(maintained) === pairsSet(control))
    // every tail* near-dups doc 1's family across fold boundaries
    assert(pairsSet(maintained).contains((1L, 8L)))
    // the control grew one partition per batch; the maintained stream
    // folded itself down to sentinel + the replayable tail
    for (d <- Seq("docs", "bands", "pairs")) {
      assert(parts(s"$control/$d").size === batches.size, d)
      val kept = parts(s"$maintained/$d")
      assert(kept.contains("batch_id=-1"), d)
      assert(kept.size <= 3, s"$d not bounded: $kept")
    }
  }

  test("snapshot shape: HllStream prunes superseded snapshots from " +
    "inside the stream; latest cardinalities identical to control") {
    implicit val sqlCtx = spark.sqlContext
    val batches: Seq[Seq[(String, String)]] = (0 until 6).map(b =>
      (b * 40 until b * 40 + 60).map(i => ("g" + (i % 2), s"v$i")))
    def drive(maintainEvery: Int): String = {
      val state = tmpDir(s"auto-hll-$maintainEvery")
      val ckpt = tmpDir(s"auto-hll-ckpt-$maintainEvery")
      val in = MemoryStream[(String, String)]
      for (b <- batches) {
        in.addData(b)
        val q = HllStream.start(in.toDF().toDF("grp", "v"), state,
          "grp", "v", 2, ckpt, maintainEvery = maintainEvery)
        assert(q.awaitTermination(60000), "query did not terminate")
      }
      state
    }
    val maintained = drive(2)
    val control = drive(0)
    def latest(p: String) = HllStream.latest(spark, p)
      .as[(String, Long, Double)].collect().toSet
    assert(latest(maintained) === latest(control))
    assert(parts(s"$control/card").size === batches.size)
    // register deltas folded, superseded snapshots pruned
    assert(parts(s"$maintained/regs").contains("batch_id=-1"))
    assert(parts(s"$maintained/regs").size <= 3)
    assert(parts(s"$maintained/card").size <= 2)
    assert(parts(s"$maintained/card").contains("batch_id=5"))
  }

  test("versioned-alloc shape: UniMaxStream retires old allocation " +
    "versions; the live allocation identical, retired reads loud") {
    implicit val sqlCtx = spark.sqlContext
    val batches: Seq[Seq[(String, String)]] = (0 until 6).map(b =>
      Seq(("en", Seq.fill(20 + b)("w").mkString(" ")),
        ("fr", Seq.fill(5)("m").mkString(" "))))
    def drive(maintainEvery: Int): String = {
      val state = tmpDir(s"auto-um-$maintainEvery")
      val ckpt = tmpDir(s"auto-um-ckpt-$maintainEvery")
      val in = MemoryStream[(String, String)]
      for (b <- batches) {
        in.addData(b)
        val q = UniMaxStream.start(in.toDF().toDF("lang", "text"),
          state, "lang", "text", ckpt, budgetTokens = 100L,
          maxEpochs = 4L, maintainEvery = maintainEvery)
        assert(q.awaitTermination(60000), "query did not terminate")
      }
      state
    }
    val maintained = drive(2)
    val control = drive(0)
    def alloc(p: String) = UniMaxStream.allocation(spark, p)
      .select("lang", "alloc_tokens").as[(String, Long)].collect().toSet
    assert(alloc(maintained) === alloc(control))
    assert(parts(s"$control/alloc").size === batches.size)
    assert(parts(s"$maintained/counts").contains("batch_id=-1"))
    assert(parts(s"$maintained/counts").size <= 3)
    assert(parts(s"$maintained/alloc").size <= 2)
    // a retired version fails LOUDLY (the CdcApplyStream retention
    // contract), never an empty allocation
    val e = intercept[IllegalArgumentException] {
      UniMaxStream.allocation(spark, maintained, Some(0L))
    }
    assert(e.getMessage.contains("pruned"))
    // the control still serves its full history
    assert(UniMaxStream.allocation(spark, control, Some(0L)).count() > 0)
  }
}
