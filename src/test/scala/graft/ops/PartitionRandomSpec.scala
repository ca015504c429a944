package graft.ops

import graft.SparkSpec

/** Randomized naive replays for the corpus-partitioning mechanics:
  * splitAssign's cumulative thresholds, epochShuffle's two-pass
  * prefix-group ranks, and exactDedup's canonical selection — all
  * md5-anchored, recomputed in driver Scala with exact agreement.
  */
class PartitionRandomSpec extends SparkSpec {

  import spark.implicits._

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private def thr(f: Double): String =
    f"${math.floor(f * 4294967296.0).toLong}%08x"

  private def seeds = 1L to 5L

  test("splitAssign equals the naive cumulative-threshold replay") {
    val fracs = Seq("train" -> 0.7, "valid" -> 0.15)
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 300L).map(id => (id, r.nextInt(5)))
      val got = Curate.splitAssign(rows.toDF("k", "x"), "k", fracs,
        "test", s"s$seed").orderBy("k").collect()
        .map(x => (x.getLong(0), x.getString(2)))
      val cums = fracs.scanLeft(0.0) { case (c, (_, f)) => c + f }.tail
      val want = rows.map { case (id, _) =>
        val h = md5hex(s"${id}s$seed").take(8)
        val split = fracs.map(_._1).zip(cums)
          .collectFirst { case (n, c) if h < thr(c) => n }
          .getOrElse("test")
        (id, split)
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("epochShuffle equals the naive per-shard global-rank replay") {
    for (seed <- seeds) {
      val rows = (1L to 200L).map(id => Tuple1(id))
      val shards = 16
      val got = Sample.epochShuffle(rows.toDF("k"), "k", shards,
        s"e$seed").orderBy("k").collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
      // naive: shard = int(first 2 hex) % shards; pos = rank of
      // (h, key) within the shard, counted grp-major (the two-pass
      // prefix-group decomposition equals this global per-shard sort
      // because grp is h's own prefix)
      val hashed = rows.map { case Tuple1(id) =>
        val h = md5hex(s"${id}e$seed")
        (id, h, Integer.parseInt(h.take(2), 16) % shards)
      }
      val want = hashed.groupBy(_._3).toSeq.flatMap { case (shard, es) =>
        es.sortBy(e => (e._2, e._1)).zipWithIndex.map {
          case ((id, _, _), i) => (id, shard, i.toLong)
        }
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("exactDedup equals the naive min-id canonical replay") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      // ~40% duplicate payloads
      val rows = (1L to 100L).map(id => (id, s"p${r.nextInt(60)}"))
      val got = Dedup.exactDedup(rows.toDF("id", "payload"), "id",
        "payload").orderBy("digest").collect()
        .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
      val want = rows.groupBy(_._2).toSeq.map { case (p, os) =>
        (md5hex(p), os.map(_._1).min, os.size.toLong)
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed $seed")
    }
  }
}
