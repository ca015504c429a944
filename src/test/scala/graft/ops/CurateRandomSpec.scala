package graft.ops

import graft.SparkSpec

/** Randomized naive-replay cross-checks for the curation mechanics:
  * chunk, seqPack, and the deterministic samplers — positions, pack
  * boundaries, and md5 thresholds replayed exactly in driver Scala.
  */
class CurateRandomSpec extends SparkSpec {

  import spark.implicits._

  private val Vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")

  private def text(r: scala.util.Random, n: Int): String =
    (0 until n).map(_ => Vocab(r.nextInt(Vocab.size))).mkString(" ")

  private def seeds = 1L to 5L

  test("chunk equals the naive sliding-window replay") {
    for (seed <- seeds; (size, stride) <- Seq((4, 2), (5, 5), (3, 1))) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 12L).map(id => (id, text(r, 1 + r.nextInt(20))))
      val got = Curate.chunk(rows.toDF("doc_id", "text"), "doc_id",
        "text", size, stride)
        .orderBy("doc_id", "chunk_idx").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getString(4)))
      val want = rows.flatMap { case (id, t) =>
        val ts = t.split(" ", -1).toSeq
        (0 until ts.size by stride).zipWithIndex.map { case (start, idx) =>
          val ck = ts.slice(start, start + size)
          (id, idx.toLong, start.toLong, ck.size.toLong, ck.mkString(" "))
        }
      }
      assert(got.toSeq === want, s"seed $seed size $size stride $stride")
    }
  }

  test("seqPack equals the naive per-shard running-boundary replay") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 20L).map(id => (id, text(r, 1 + r.nextInt(30))))
      val (shards, ck) = (3, 16)
      val got = Curate.seqPack(rows.toDF("doc_id", "text"), "doc_id",
        "text", shards, ck)
        .orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getLong(4), x.getLong(5), x.getLong(6)))
      val want = rows
        .map { case (id, t) => (id, id % shards, t.split(" ", -1).length.toLong) }
        .groupBy(_._2).toSeq.flatMap { case (shard, ds) =>
          var acc = 0L
          ds.sortBy(_._1).map { case (id, _, n) =>
            val start = acc; acc += n
            val first = start / ck
            val last = (acc - 1) / ck
            (id, shard, n, start, first, last, last - first + 1)
          }
        }.sortBy(_._1)
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("uniform and stratified samplers equal the naive md5-threshold " +
    "replay") {
    def md5hex8(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(8)
    def thr(f: Double): String =
      f"${math.floor(f * 4294967296.0).toLong}%08x"
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 200L).map(id => (id, Vocab(r.nextInt(3))))
      val df = rows.toDF("k", "s")
      val u = Sample.uniform(df, "k", 0.3, "sd").orderBy("k")
        .collect().map(_.getLong(0)).toSeq
      assert(u === rows.map(_._1)
        .filter(id => md5hex8(s"${id}sd") < thr(0.3)), s"seed $seed")
      val fr = Map("aa" -> 0.8, "bb" -> 0.1)
      val st = Sample.stratified(df, "k", "s", fr, 0.4, "sd").orderBy("k")
        .collect().map(_.getLong(0)).toSeq
      assert(st === rows.filter { case (id, s) =>
        md5hex8(s"${id}sd") < thr(fr.getOrElse(s, 0.4))
      }.map(_._1), s"seed $seed")
    }
  }
}
