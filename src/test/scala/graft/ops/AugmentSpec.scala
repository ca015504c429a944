package graft.ops

import graft.SparkSpec

/** X81 span corruption: the round-trip law (splicing each sentinel's
  * target span back into the input reproduces the original text —
  * correctness without reimplementing the hash lanes), corruption-rate
  * sanity at the configured 15%, determinism in the seed, and guards.
  */
class AugmentSpec extends SparkSpec {

  import spark.implicits._

  private def corrupt(rows: Seq[(Long, String)], seed: String = "sc") =
    Augment.spanCorrupt(rows.toDF("doc_id", "text"), "doc_id", "text",
        grid = 8, maxSpan = 3, pStart = 0.6, seed = seed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSeq

  private val docs = (0L until 40L).map(i =>
    i -> (0 until 50).map(t => s"w${(i * 7 + t * 3) % 23}").mkString(" "))

  test("round trip: splicing target spans into the input restores the text") {
    val out = corrupt(docs)
    assert(out.size === docs.size)
    val sentinel = "<X_(\\d+)>".r
    out.foreach { case (id, input, target, nSpans) =>
      // parse target into sentinel -> span tokens
      val marks = sentinel.findAllMatchIn(target).toSeq
      assert(marks.size.toLong === nSpans, s"doc $id: target sentinel count")
      val spans = marks.zipWithIndex.map { case (m, j) =>
        val end = if (j + 1 < marks.size) marks(j + 1).start else target.length
        m.group(1) -> target.substring(m.end, end).trim
      }.toMap
      val rebuilt = input.split(" ").toSeq.flatMap { s =>
        if (s.startsWith("<X_"))
          spans(s.stripPrefix("<X_").stripSuffix(">")).split(" ")
            .filter(_.nonEmpty).toSeq
        else Seq(s)
      }.mkString(" ")
      assert(rebuilt === docs.find(_._1 == id).get._2, s"doc $id round trip")
    }
  }

  test("corruption rate lands near the configured 15%") {
    val out = corrupt(docs)
    val totalTokens = docs.map(_._2.split(" ").length).sum.toDouble
    val maskedTokens = out.map { case (_, _, target, nSpans) =>
      target.split(" ").length - nSpans // span words minus sentinels
    }.sum.toDouble
    val rate = maskedTokens / totalTokens
    assert(rate > 0.07 && rate < 0.25, s"corruption rate $rate out of band")
  }

  test("deterministic in the seed; a different seed moves spans") {
    assert(corrupt(docs) === corrupt(docs))
    val a = corrupt(docs).map(t => (t._1, t._2))
    val b = corrupt(docs, seed = "other").map(t => (t._1, t._2))
    assert(a !== b)
  }

  test("docs with no fired anchor pass through whole, empty target") {
    val out = corrupt(docs)
    val untouched = out.filter(_._4 == 0L)
    untouched.foreach { case (id, input, target, _) =>
      assert(input === docs.find(_._1 == id).get._2)
      assert(target === "")
    }
  }

  test("guards: span must fit the grid") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](
      Augment.spanCorrupt(df, "doc_id", "text", grid = 4, maxSpan = 5))
    intercept[IllegalArgumentException](
      Augment.spanCorrupt(df, "doc_id", "text", grid = 1))
  }
}
