package graft.ops

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private val template = "alpha beta gamma delta epsilon zeta eta theta"

  test("a template inside a big doc: high containment, low jaccard") {
    val big = template + " " + (1 to 60).map(i => s"body$i").mkString(" ")
    val docs = Seq((1L, template), (2L, big)).toDF("doc_id", "text")
    val r = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      maxDf = 32, minShared = 2).collect()
    assert(r.length === 1)
    val row = r.head
    // every template 3-shingle (6 of them) appears in the big doc
    assert(row.getAs[Long]("i") === 6 && row.getAs[Long]("n1") === 6)
    assert(row.getAs[Long]("cont1_ppm") === 1000000L)
    assert(row.getAs[Boolean]("template"))
    // jaccard would be 6 / (6 + 65 - 6) ~ 0.09 — below any dedup bar
    assert(row.getAs[Long]("cont2_ppm") < 150000L)
  }

  test("the stop-shingle cap drops ubiquitous shingles from the numerator") {
    // 40 docs all share one common phrase; two also share a rare one
    val docs = ((1L to 40L).map(i => (i, s"common phrase here tail$i x$i")) ++
      Seq((100L, "rare shared secret body one"),
        (101L, "rare shared secret body two"))).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      maxDf = 8, minShared = 1).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"))).toSet
    assert(pairs === Set((100L, 101L)),
      "the 40-doc common shingle must not create pairs")
  }

  test("min-shared floor prunes incidental single-shingle overlaps") {
    val docs = Seq((1L, "p q r s t u"), (2L, "p q r x y z"))
      .toDF("doc_id", "text")
    // docs share exactly one 3-shingle ('p q r')
    assert(Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      maxDf = 8, minShared = 2).collect().isEmpty)
    assert(Dedup.containmentPairs(docs, "doc_id", "text", n = 3,
      maxDf = 8, minShared = 1).collect().length === 1)
  }
}
