package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** X132 Dunning G² keyness: hand-worked 2×2 lanes, the degenerate
  * single-group corpus, minCount gating, and a seeded-random naive
  * replay in driver-side Scala demanding exact agreement.
  */
class KeynessSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, String)], minCount: Long = 1L) =
    CorpusStats.dunningKeyness(rows.toDF("lang", "text"), "lang", "text",
      minCount)
      .orderBy("grp", "w").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  /** The engine's arithmetic replayed naively: exact counts, one
    * double ln per observed cell rounded HALF_UP to micro-nats (the
    * Spark/DuckDB round seam), exact weighted sum, ×2.
    */
  private def naive(rows: Seq[(String, String)], minCount: Long)
      : Seq[(String, String, Long, Long, Long)] = {
    val toks = rows.filter(r => r._1 != null && r._2 != null)
      .flatMap { case (g, t) => t.split(" ").map(w => (g, w)) }
    val csw = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cw = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ts = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tc = toks.size.toLong
    def micro(o: Long, rowT: Long, colT: Long): Long =
      if (o == 0L) 0L
      else o * BigDecimal(math.log((o.toDouble * tc) / (rowT.toDouble * colT))
        * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    csw.toSeq.collect { case ((g, w), a) if a >= minCount =>
      val (b, c) = (cw(w) - a, ts(g) - a)
      val d = tc - ts(g) - cw(w) + a
      val s = micro(a, ts(g), cw(w)) + micro(b, tc - ts(g), cw(w)) +
        micro(c, ts(g), tc - cw(w)) + micro(d, tc - ts(g), tc - cw(w))
      val dir = (BigInt(a) * tc) compare (BigInt(ts(g)) * cw(w))
      (g, w, a, dir.toLong, 2L * s)
    }.sortBy(r => (r._1, r._2))
  }

  test("hand-worked 2x2 lanes and direction on the two-group fixture") {
    val rows = Seq(("g1", "a a b"), ("g2", "a c"))
    val got = run(rows)
    assert(got === naive(rows, 1L))
    val byKey = got.map(r => (r._1, r._2) -> r).toMap
    // 'a' is over-represented in g1 (2/3 vs pool 3/5), under in g2
    assert(byKey(("g1", "a"))._4 === 1L)
    assert(byKey(("g2", "a"))._4 === -1L)
    // words exclusive to a group are maximally over-represented there
    assert(byKey(("g1", "b"))._4 === 1L)
    assert(byKey(("g2", "c"))._4 === 1L)
    // G2 is symmetric in the exclusive singletons of same-shape groups
    assert(got.forall(_._5 >= 0L))
  }

  test("single-group corpus: every cell is ln(1) and G2 collapses to 0") {
    val got = run(Seq(("g1", "a a b c"), ("g1", "b d")))
    assert(got.nonEmpty)
    assert(got.forall(r => r._4 === 0L && r._5 === 0L))
  }

  test("minCount gates cells; null group and text drop (the x131 rule)") {
    val rows = Seq(("g1", "a a a b"), ("g2", "a c"),
      (null.asInstanceOf[String], "a a a a"),
      ("g2", null.asInstanceOf[String]))
    val got = run(rows, minCount = 2L)
    assert(got.map(r => (r._1, r._2)) === Seq(("g1", "a")))
    assert(got === naive(rows, 2L))
  }

  test("randomized naive replay: exact agreement over a Zipf-ish corpus") {
    val rnd = new scala.util.Random(4215)
    val langs = Seq("en", "fr", "de", null)
    val vocab = (1 to 30).map(i => s"w$i")
    val rows = (0 until 120).map { _ =>
      val g = langs(rnd.nextInt(langs.size))
      val t = if (rnd.nextInt(20) == 0) null
      else (0 until 1 + rnd.nextInt(12)).map { _ =>
        vocab(math.min(rnd.nextInt(1 + rnd.nextInt(vocab.size)),
          vocab.size - 1)) // skewed toward low ids
      }.mkString(" ")
      (g, t)
    }
    assert(run(rows, 2L) === naive(rows, 2L))
  }
}
