package graft.ops

import graft.SparkSpec

/** Randomized naive-replay cross-checks for the high-traffic text
  * operators (the CorpusStatsRandomSpec discipline applied to the
  * older surface): textStats, repetition, C4.clean, and
  * freqSubsample — each replayed in driver-side Scala over seeded
  * random corpora and required to agree exactly, md5 keep-hashes
  * included.
  */
class OpsRandomSpec extends SparkSpec {

  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val Vocab = Vector("the", "cat", "sat", "mat", "on", "a",
    "of", "and", "big", "dog", "ran", "far")

  private def words(r: scala.util.Random, n: Int): Seq[String] =
    (0 until n).map(_ => Vocab(math.min(Vocab.size - 1,
      (math.abs(r.nextGaussian()) * 3).toInt)))

  private def seeds = 1L to 5L

  test("textStats equals the naive replay on random corpora") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 15L).map(id => (id, words(r, 1 + r.nextInt(30)).mkString(" ")))
      val got = TextAnalysis.textStats(rows.toDF("doc_id", "text"),
        "doc_id", "text").orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getInt(1), x.getInt(2), x.getInt(3),
          x.getDouble(4), x.getDouble(5), x.getDouble(6)))
      val want = rows.map { case (id, t) =>
        val ts = t.split(" ", -1).toSeq
        val n = ts.size
        val dist = ts.distinct.size
        (id, t.length, n, dist,
          r6(ts.map(_.length.toLong).sum.toDouble / n),
          r6(ts.count(TextAnalysis.Stopwords.contains).toDouble / n),
          r6(dist.toDouble / n))
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("repetition equals the naive bigram replay on random corpora") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 15L).map(id => (id, words(r, r.nextInt(25)).mkString(" ")))
      val got = TextAnalysis.repetition(rows.toDF("doc_id", "text"),
        "doc_id", "text", n = 2).orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
          x.getDouble(4), x.getDouble(5)))
      val want = rows.flatMap { case (id, t) =>
        val grams = t.split(" ", -1).toSeq.sliding(2)
          .filter(_.size == 2).map(_.mkString(" ")).toSeq
        if (grams.isEmpty) None
        else {
          val n = grams.size.toLong
          val dist = grams.distinct.size.toLong
          val top = grams.groupBy(identity).values.map(_.size).max.toLong
          Some((id, n, dist, top, r6(top.toDouble / n),
            r6(1.0 - dist.toDouble / n)))
        }
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("C4.clean equals the naive rules replay on random pages") {
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 20L).map { id =>
        val lines = (0 until 1 + r.nextInt(9)).map { _ =>
          val base = words(r, 1 + r.nextInt(6)).mkString(" ")
          base + Vector(".", "", "!", " javascript.", "?", " {.",
            " lorem ipsum.")(r.nextInt(7))
        }
        (id, lines.mkString("\n"))
      }
      val got = C4.clean(rows.toDF("doc_id", "text"), "doc_id", "text",
        minWords = 3, minLines = 2).orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          x.getBoolean(3), Option(x.getString(4))))
      val want = rows.map { case (id, page) =>
        val ls = page.split("\n", -1).toSeq
        val kept = ls.filter(l =>
          Seq(".", "!", "?", "\"").exists(l.endsWith) &&
            l.split(" ", -1).length >= 3 && !l.contains("javascript"))
        val verdict = kept.size >= 2 && !page.contains("{") &&
          !page.contains("lorem ipsum")
        (id, ls.size.toLong, kept.size.toLong, verdict,
          if (verdict) Some(kept.mkString("\n")) else None)
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("freqSubsample equals the naive md5-cut replay on random corpora") {
    val tPpm = 100000L
    val sd = "rs"
    for (seed <- seeds) {
      val r = new scala.util.Random(seed)
      val rows = (1L to 15L).map(id => (id, words(r, 1 + r.nextInt(40)).mkString(" ")))
      val got = Sample.freqSubsample(rows.toDF("doc_id", "text"),
        "doc_id", "text", tPpm, sd).orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
      val toks = rows.flatMap { case (id, t) =>
        t.split(" ", -1).toSeq.zipWithIndex.map { case (w, i) =>
          (id, i + 1L, w) }
      }
      val counts = toks.groupBy(_._3).map { case (w, o) => w -> o.size.toLong }
      val total = toks.size.toLong
      val cuts = counts.map { case (w, c) =>
        val ratio = (tPpm * total).toDouble / (1000000L * c).toDouble
        w -> math.round(math.min(1.0, math.sqrt(ratio) + ratio) *
          4294967296.0)
      }
      def md5hex(s: String): String = java.security.MessageDigest
        .getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val want = toks.groupBy(_._1).toSeq.sortBy(_._1).map { case (id, os) =>
        val keeps = os.sortBy(_._2).map { case (_, pos, w) =>
          val hv = java.lang.Long.parseLong(
            md5hex(s"$id|$pos|$sd").take(8), 16)
          (w, hv < cuts(w))
        }
        (id, keeps.size.toLong, keeps.count(_._2).toLong,
          keeps.filter(_._2).map(_._1).mkString(" "))
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }
}
