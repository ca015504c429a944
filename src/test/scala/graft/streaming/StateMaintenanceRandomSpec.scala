package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Randomized replay for the maintenance contract: a seeded random
  * document stream is split into random batches and driven through
  * DedupStream twice — once never compacted, once compacted at RANDOM
  * safe watermarks (sometimes mid-stream, sometimes repeatedly,
  * sometimes with a replay of the newest live batch right after a
  * fold). The pair ledgers must agree EXACTLY at every step. This is
  * the property the fixed fixtures cannot cover: folds composed at
  * arbitrary points of an arbitrary stream.
  */
class StateMaintenanceRandomSpec extends SparkSpec {

  import spark.implicits._

  private def text(rnd: scala.util.Random, near: Boolean): String =
    if (near) (1 to 39).map(i => s"tok$i").mkString(" ") +
      s" tail${rnd.nextInt(1000)}"
    else (1 to 40).map(_ => s"w${rnd.nextInt(5000)}").mkString(" ")

  private def pairsSet(statePath: String): Set[(Long, Long)] =
    DedupStream.pairs(spark, statePath)
      .select("d1", "d2").as[(Long, Long)].collect().toSet

  test("random batches + random fold points: folded state is " +
    "observation-equivalent to the never-compacted control") {
    val rnd = new scala.util.Random(1517)
    val control = tmpDir("smr-control")
    val folded = tmpDir("smr-folded")
    def apply(p: String) =
      DedupStream.applyBatch(p, "doc_id", "text", 16, 4, 0.8) _

    var nextId = 0L
    val batches = (0 until 6).map { _ =>
      val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
        nextId += 1
        // ~40% of docs are near-dups of the shared template: pairs
        // emerge within batches, across batches, and across folds
        (nextId, text(rnd, rnd.nextInt(10) < 4))
      }
      rows.toDF("doc_id", "text")
    }

    var lastBatch: Option[(DataFrame, Long)] = None
    batches.zipWithIndex.foreach { case (b, i) =>
      apply(control)(b, i.toLong)
      apply(folded)(b, i.toLong)
      lastBatch = Some((b, i.toLong))
      // random maintenance: fold everything committed so far (the
      // newest batch stays live — it is the one a replay could rewrite)
      if (rnd.nextBoolean()) {
        StateMaintenance.maintain(spark, folded, "DedupStream", i.toLong)
        // sometimes the live batch replays right after the fold
        if (rnd.nextBoolean())
          lastBatch.foreach { case (df, id) => apply(folded)(df, id) }
      }
      assert(pairsSet(folded) === pairsSet(control), s"after batch $i")
    }
    // a final full fold (watermark past everything committed) and one
    // more batch over sentinel-only state
    StateMaintenance.maintain(spark, folded, "DedupStream",
      batches.length.toLong)
    val extra = Seq((nextId + 1, text(rnd, near = true)))
      .toDF("doc_id", "text")
    apply(control)(extra, batches.length.toLong)
    apply(folded)(extra, batches.length.toLong)
    assert(pairsSet(folded) === pairsSet(control))
    assert(pairsSet(folded).nonEmpty) // the template family collided
  }
}
