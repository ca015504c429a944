package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Randomized naive replays for the signal operators: langId's
  * stopword score, featureHash's dual-md5 hashing trick, and
  * gap-sessionization's numbering — thresholds, signs, buckets, and
  * session boundaries recomputed in driver Scala with exact agreement.
  */
class SignalsRandomSpec extends SparkSpec {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def md5hex(s: String): String = java.security.MessageDigest
    .getInstance("MD5").digest(s.getBytes("UTF-8"))
    .map("%02x".format(_)).mkString

  private val Vocab = Vector("the", "cat", "of", "dog", "and", "ran",
    "is", "far", "on", "big")

  private def seeds = 1L to 5L

  test("langId equals the naive stopword-density replay") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 20L).map(id => (id,
        (0 until 1 + r.nextInt(20)).map(_ => Vocab(r.nextInt(Vocab.size)))
          .mkString(" ")))
      val got = TextAnalysis.langId(rows.toDF("doc_id", "text"),
        "doc_id", "text", threshold = 0.2)
        .orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getDouble(1), x.getString(2)))
      val want = rows.map { case (id, t) =>
        val ts = t.split(" ", -1).toSeq
        val score = r6(ts.count(TextAnalysis.Stopwords.contains).toDouble
          / ts.size)
        (id, score, if (score >= 0.2) "en" else "other")
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("featureHash equals the naive dual-md5 replay") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 15L).map(id => (id,
        (0 until 1 + r.nextInt(25)).map(_ => Vocab(r.nextInt(Vocab.size)))
          .mkString(" ")))
      val dim = 8
      val got = TextAnalysis.featureHash(rows.toDF("doc_id", "text"),
        "doc_id", "text", dim)
        .orderBy("doc_id", "bucket").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      val want = rows.flatMap { case (id, t) =>
        t.split(" ", -1).toSeq.map { tok =>
          val b = java.lang.Long.parseLong(
            md5hex(s"fh|$tok").take(8), 16) % dim
          val s = if (Integer.parseInt(
            md5hex(s"fhs|$tok").take(1), 16) % 2 == 0) 1L else -1L
          (id, b, s)
        }.groupBy(_._2).toSeq
          .map { case (b, ws) => (id, b, ws.map(_._3).sum) }
          .filter(_._3 != 0L).sortBy(_._2)
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("sessionize numbering equals the naive gap replay") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      // 3 keys, micro-precision timestamps with gaps straddling 30 s
      val rows = (1L to 60L).map { i =>
        (s"u${r.nextInt(3)}", new Timestamp(1700000000000L +
          r.nextInt(300) * 1000L + r.nextInt(1000)), i)
      }
      val got = Sessionize.assign(rows.toDF("k", "ts", "tie"),
        "k", "ts", "tie", gapSecs = 30L)
        .orderBy("k", "ts", "tie").collect()
        .map(x => (x.getString(0), x.getTimestamp(1).getTime,
          x.getLong(2), x.getLong(4)))
      val want = rows.groupBy(_._1).toSeq.flatMap { case (k, evs) =>
        val sorted = evs.sortBy(e => (e._2.getTime, e._3))
        var seq = 0L; var prev = Long.MinValue
        sorted.map { case (_, ts, tie) =>
          val us = ts.getTime * 1000L
          if (prev == Long.MinValue || us - prev > 30L * 1000000L) seq += 1
          prev = us
          (k, ts.getTime, tie, seq)
        }
      }.sortBy(e => (e._1, e._2, e._3))
      assert(got.toSeq === want, s"seed $seed")
    }
  }
}
