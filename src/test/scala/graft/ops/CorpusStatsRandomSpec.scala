package graft.ops

import graft.SparkSpec

/** Randomized cross-checks for the round-14 corpus statistics: each
  * operator is replayed naively in driver-side Scala over seeded
  * random corpora (nulls, empties, astral chars, skewed words
  * included) and must agree exactly — the property-test complement to
  * the hand-worked fixtures, catching fold/lane bugs anywhere in the
  * input space the fixtures don't reach.
  */
class CorpusStatsRandomSpec extends SparkSpec {

  import spark.implicits._

  private val Vocab = Vector("the", "cat", "sat", "mat", "on", "a",
    "😀ast", "ral", "b", "cc", "ddd", "e")
  private val Langs = Vector("en", "de", "zh")

  /** Seeded corpus: (doc_id, lang|null, text|null|empty). */
  private def corpus(seed: Long): Seq[(Long, String, String)] = {
    val r = new scala.util.Random(seed)
    (1L to 20L).map { id =>
      val lang = if (r.nextInt(6) == 0) null else Langs(r.nextInt(3))
      val text =
        if (r.nextInt(10) == 0) null
        else if (r.nextInt(10) == 0) ""
        else {
          // Zipf-ish skew: low vocab indices drawn far more often
          val n = r.nextInt(60)
          (0 until n).map(_ =>
            Vocab(math.min(Vocab.size - 1,
              (math.abs(r.nextGaussian()) * 3).toInt))).mkString(" ")
        }
      (id, lang, text)
    }
  }

  private def seeds = 1L to 5L

  test("charEntropy equals the naive codepoint replay on random corpora") {
    for (seed <- seeds) {
      val rows = corpus(seed)
      val got = TextAnalysis.charEntropy(
        rows.toDF("doc_id", "lang", "text"), "doc_id", "text")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      val want = rows.filter(_._3 != null).map { case (id, _, t) =>
        val cps = t.codePoints().toArray.toSeq
        val n = cps.size.toLong
        val counts = cps.groupBy(identity).values.map(_.size.toLong)
        val s = counts.map(c => math.round(math.log(c.toDouble) * c * 1e6)).sum
        val k = counts.size.toLong
        val e = if (n == 0) 0L
          else math.round(math.log(n.toDouble) * 1e6) - s / n
        val norm = if (k > 1 && e > 0)
          e * 1000000L / math.round(math.log(k.toDouble) * 1e6) else 0L
        (id, n, k, s, e, norm)
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("burstiness equals the naive BigInt replay on random corpora") {
    for (seed <- seeds) {
      val rows = corpus(seed)
      val got = CorpusStats.burstiness(
        rows.toDF("doc_id", "lang", "text"), "doc_id", "text", minDf = 2L)
        .orderBy("w").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val docs = rows.filter(_._3 != null)
      val n = BigInt(docs.size)
      val cwd = docs.flatMap { case (id, _, t) =>
        t.split(" ", -1).toSeq.groupBy(identity)
          .map { case (w, o) => (w, id, o.size.toLong) }
      }
      val want = cwd.groupBy(_._1).toSeq.map { case (w, os) =>
        val df = os.size.toLong
        val s1 = BigInt(os.map(_._3).sum)
        val s2 = os.map(o => BigInt(o._3) * o._3).sum
        val vmr = (n * s2 - s1 * s1) * 1000000 / (n * s1)
        (w, df, s1.toLong, vmr.toLong)
      }.filter(_._2 >= 2L).sortBy(_._1)
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("unigramKl equals the naive micro-nat replay on random corpora") {
    for (seed <- seeds) {
      val rows = corpus(seed)
      val got = CorpusStats.unigramKl(
        rows.toDF("doc_id", "lang", "text"), "lang", "text")
        .orderBy("grp").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val toks = rows.filter(r => r._2 != null && r._3 != null)
        .flatMap { case (_, g, t) => t.split(" ", -1).toSeq.map(g -> _) }
      val cw = toks.groupBy(_._2).map { case (w, o) => w -> o.size.toLong }
      val tC = toks.size.toLong
      val want = toks.groupBy(_._1).toSeq.map { case (g, gtoks) =>
        val tS = gtoks.size.toLong
        val csw = gtoks.groupBy(_._2).map { case (w, o) => w -> o.size.toLong }
        val k = csw.map { case (w, c) =>
          BigInt(c) * math.round(math.log(
            (c.toDouble * tC) / (tS.toDouble * cw(w))) * 1e6)
        }.sum
        (g, tS, csw.size.toLong, (k.max(BigInt(0)) / tS).toLong)
      }.sortBy(_._1)
      assert(got.toSeq === want, s"seed $seed")
    }
  }

  test("removeFrequentLines equals the naive df replay on random corpora") {
    for (seed <- seeds) {
      val rows = corpus(seed)
      // synthesize lines: chunk tokens into width-3 lines so duplicate
      // lines genuinely recur across the skewed corpus
      val paged = rows.map { case (id, l, t) =>
        (id, l, if (t == null) null
          else t.split(" ", -1).grouped(3).map(_.mkString(" "))
            .mkString("\n"))
      }
      val got = Boilerplate.removeFrequentLines(
        paged.toDF("doc_id", "lang", "text"), "doc_id", "text",
        docFracPpm = 200000L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val docs = paged.filter(_._3 != null)
      val df = docs.flatMap { case (_, _, t) =>
        t.split("\n", -1).distinct.toSeq
      }.groupBy(identity).map { case (l, o) => l -> o.size.toLong }
      val nDocs = docs.size.toLong
      val banned = df.filter { case (_, d) =>
        d * 1000000L >= nDocs * 200000L }.keySet
      val want = docs.map { case (id, _, t) =>
        val ls = t.split("\n", -1).toSeq
        val kept = ls.filterNot(banned)
        (id, ls.size.toLong, (ls.size - kept.size).toLong,
          kept.mkString("\n"))
      }
      assert(got.toSeq === want, s"seed $seed")
    }
  }
}
