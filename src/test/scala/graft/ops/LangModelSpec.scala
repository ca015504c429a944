package graft.ops

import graft.SparkSpec

/** X26 bigram-LM scoring: exact fixed-point values against hand-derived
  * counts, the unseen-bigram / unseen-conditioning-token edges, the
  * no-bigram document, and the log-space variant against a driver-side
  * Scala reference.
  */
class LangModelSpec extends SparkSpec {

  import spark.implicits._

  // ref = doc 1 only: tokens a,b,a,c → c1 = {a:2, b:1, c:1}, V = 3;
  // bigrams "a b","b a","a c" → c2 = 1 each
  private val docs = Seq(
    (1L, "a b a c"),
    (2L, "a b x"),
    (3L, "a"), // single token: no bigrams
    (4L, "z q")) // unseen conditioning token AND unseen bigram
  private val ref = Seq((1L, "a b a c"))

  private def scored = LangModel.bigramScore(
    docs.toDF("doc_id", "text"), ref.toDF("doc_id", "text"), "doc_id", "text")
    .orderBy("doc_id")
    .collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("fixed-point sums match hand-derived Laplace counts exactly") {
    val s = Graph.Scale // same shared constant
    assert(scored.toSeq === Seq(
      // doc 1: p("a b")=2S div 5, p("b a")=2S div 4, p("a c")=2S div 5
      (1L, 3L, 0L, 2L * s / 5 + 2L * s / 4 + 2L * s / 5,
        (2L * s / 5 + 2L * s / 4 + 2L * s / 5) / 3),
      // doc 2: "a b" seen (2S div 5); "b x" unseen, den=c1(b)+V=4 → S div 4
      (2L, 2L, 1L, 2L * s / 5 + s / 4, (2L * s / 5 + s / 4) / 2),
      // doc 4: "z q" unseen with unseen w1: den = 0+V = 3 → S div 3
      (4L, 1L, 1L, s / 3, s / 3)))
  }

  test("a single-token document produces no output row") {
    assert(!scored.exists(_._1 == 3L))
  }

  test("log-space variant matches a driver-side Scala reference") {
    val c1 = Map("a" -> 2L, "b" -> 1L, "c" -> 1L)
    val c2 = Map("a b" -> 1L, "b a" -> 1L, "a c" -> 1L)
    val v = 3L
    def lnP(bg: String): Double = {
      val w1 = bg.split(" ").head
      val p = (c2.getOrElse(bg, 0L) + 1).toDouble /
        (c1.getOrElse(w1, 0L) + v).toDouble
      // same 6-dp seam as the engine
      BigDecimal(math.log(p)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def expected(text: String): (Long, Double) = {
      val ts = text.split(" ")
      val bgs = ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      (bgs.size.toLong, bgs.map(lnP).sum)
    }
    val got = LangModel.logBigramScore(
      docs.toDF("doc_id", "text"), ref.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 4L))
    for ((docId, n, sumLn, avgLn) <- got) {
      val (en, esum) = expected(docs.find(_._1 == docId).get._2)
      assert(n === en)
      assert(math.abs(sumLn - esum) < 1e-9, s"doc $docId: $sumLn vs $esum")
      assert(math.abs(avgLn - esum / en) < 1e-9)
    }
  }

  test("scoring the ref against itself sees no unseen bigrams") {
    val got = LangModel.bigramScore(
      ref.toDF("doc_id", "text"), ref.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(got.length === 1)
    assert(got.head.getLong(2) === 0L) // n_unseen
  }
}
