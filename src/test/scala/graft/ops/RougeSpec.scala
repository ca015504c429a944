package graft.ops

import graft.SparkSpec
import graft.functions.TokenLcs.tokenLcs
import org.apache.spark.sql.functions._

class RougeSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (String, Long, String, String)*) =
    rows.toDF("grp", "pid", "hyp", "ref")

  private def lcsOf(a: Seq[String], b: Seq[String]): Long =
    Seq((a, b)).toDF("a", "b")
      .select(tokenLcs(col("a"), col("b")).as("l"))
      .collect().head.getLong(0)

  test("token LCS: classic cases, order sensitivity, empty arrays") {
    assert(lcsOf(Seq("a", "b", "c", "d", "e"), Seq("a", "x", "c", "e")) === 3)
    assert(lcsOf(Seq("a", "b", "c"), Seq("c", "b", "a")) === 1) // reversal
    assert(lcsOf(Seq("a", "b"), Seq("a", "b")) === 2)
    assert(lcsOf(Seq.empty[String], Seq("a")) === 0)
    assert(lcsOf(Seq("x"), Seq.empty[String]) === 0)
    assert(lcsOf(Seq("x", "y"), Seq("p", "q")) === 0)
  }

  test("hand-worked corpus: counts and all three F1 lanes") {
    val r = Rouge.corpusRouge(
      pairs(("g", 1L, "the cat sat on the mat", "the cat lay on the mat")),
      "grp", "pid", "hyp", "ref").collect().head
    assert(r.getAs[Long]("m1") === 5 && r.getAs[Long]("ht1") === 6
      && r.getAs[Long]("rt1") === 6)
    assert(r.getAs[Long]("m2") === 3 && r.getAs[Long]("ht2") === 5
      && r.getAs[Long]("rt2") === 5)
    assert(r.getAs[Long]("lcs") === 5) // the cat … on the mat
    assert(r.getAs[Double]("rouge1_f") === 0.833333) // 10/12 rounded
    assert(r.getAs[Double]("rouge2_f") === 0.6)
    assert(r.getAs[Double]("rougel_f") === 0.833333)
  }

  test("ROUGE-L penalizes scrambled order where ROUGE-1 cannot") {
    val r = Rouge.corpusRouge(pairs(("g", 1L, "a b c", "c b a")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head
    assert(r.getAs[Long]("m1") === 3) // bag-of-words: perfect
    assert(r.getAs[Long]("lcs") === 1)
    assert(r.getAs[Double]("rouge1_f") === 1.0)
    assert(r.getAs[Double]("rougel_f") === round6(2.0 / 6))
  }

  test("recall asymmetry: hyp shorter than ref") {
    val r = Rouge.corpusRouge(pairs(("g", 1L, "a b", "a b c d")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head
    // P = 2/2, R = 2/4, F1 = 2*2/(2+4)
    assert(r.getAs[Long]("m1") === 2 && r.getAs[Long]("ht1") === 2
      && r.getAs[Long]("rt1") === 4)
    assert(r.getAs[Double]("rouge1_f") === round6(4.0 / 6))
  }

  test("clipping is per pair and counts sum across pairs") {
    val r = Rouge.corpusRouge(
      pairs(("g", 1L, "a a", "a"), ("g", 2L, "a", "a a")),
      "grp", "pid", "hyp", "ref", maxN = 1).collect().head
    assert(r.getAs[Long]("m1") === 2) // min(2,1) + min(1,2)
    assert(r.getAs[Long]("lcs") === 2) // 1 + 1
    assert(r.getAs[Long]("c") === 3 && r.getAs[Long]("r") === 3)
  }

  test("disjoint texts: zero matches, zero scores, exact zeros") {
    val r = Rouge.corpusRouge(pairs(("g", 1L, "x y", "p q")),
      "grp", "pid", "hyp", "ref").collect().head
    assert(r.getAs[Long]("m1") === 0 && r.getAs[Long]("m2") === 0
      && r.getAs[Long]("lcs") === 0)
    assert(r.getAs[Double]("rouge1_f") === 0.0
      && r.getAs[Double]("rougel_f") === 0.0)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
