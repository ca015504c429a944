package graft.ops

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hand-worked counts and PMI on a tiny corpus") {
    val docs = Seq(("en", "a b a b a")).toDF("lang", "text")
    val rows = Collocations.pmiBigrams(docs, "lang", "text", minCount = 2)
      .orderBy("w1", "w2").collect()
    assert(rows.length === 2)
    val ab = rows.head
    assert(ab.getAs[String]("w1") === "a" && ab.getAs[String]("w2") === "b")
    assert(ab.getAs[Long]("c_xy") === 2 && ab.getAs[Long]("c_x") === 3
      && ab.getAs[Long]("c_y") === 2 && ab.getAs[Long]("t") === 4)
    assert(ab.getAs[Double]("pmi") === round6(math.log(2.0 * 4 / (3 * 2))))
  }

  test("a frozen phrase scores high, a chance pair scores near zero") {
    // 'new york' always adjacent; 'the'/'a' mostly occur in OTHER
    // contexts, so their adjacency is near the independence baseline
    val docs = Seq(
      ("en", "new york new york new york new york new york"),
      ("en", "the a the a the x the y a p a q")).toDF("lang", "text")
    val out = Collocations.pmiBigrams(docs, "lang", "text", minCount = 2)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        r.getAs[Double]("pmi")).toMap
    assert(out(("new", "york")) > out(("the", "a")))
  }

  test("min-count floor drops hapax pairs") {
    val docs = Seq(("en", "p q p q zz ww")).toDF("lang", "text")
    val pairs = Collocations.pmiBigrams(docs, "lang", "text", minCount = 2)
      .collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    assert(pairs === Set(("p", "q"))) // (q, p), (q, zz), (zz, ww) are hapax
  }

  test("languages are independent count spaces") {
    val docs = Seq(("en", "x y x y"), ("de", "x y x y x y"))
      .toDF("lang", "text")
    val byLang = Collocations.pmiBigrams(docs, "lang", "text", minCount = 2)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("w1"),
        r.getAs[String]("w2")) -> r.getAs[Long]("t")).toMap
    assert(byLang(("en", "x", "y")) === 3) // en has its own bigram total
    assert(byLang(("de", "x", "y")) === 5)
  }

  test("single-token docs produce no bigrams and do not crash") {
    val docs = Seq(("en", "solo"), ("en", "a a a")).toDF("lang", "text")
    val rows = Collocations.pmiBigrams(docs, "lang", "text", minCount = 1)
      .collect()
    assert(rows.length === 1 && rows.head.getAs[Long]("t") === 2)
  }
}
