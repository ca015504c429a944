package graft.ops

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (String, String)*) = rows.toDF("lang", "text")

  test("identical slices score psi exactly 0 (every term is exact zero)") {
    val d = docs(("en", "a b c d e f"), ("en", "g h i j"))
    val r = CorpusStats.psiDrift(d, d, "lang", "text").collect().head
    assert(r.getAs[Double]("psi") === 0.0)
    assert(r.getAs[Long]("n_a") === 10 && r.getAs[Long]("n_b") === 10)
  }

  test("a drifted slice scores positive, larger drift scores larger") {
    val ref = docs(("en", Seq.fill(50)("stable words here").mkString(" ")))
    val mild = docs(("en", (Seq.fill(40)("stable words here") ++
      Seq.fill(10)("novel tokens appear")).mkString(" ")))
    val wild = docs(("en", Seq.fill(50)("completely different vocabulary").mkString(" ")))
    val pm = CorpusStats.psiDrift(mild, ref, "lang", "text")
      .collect().head.getAs[Double]("psi")
    val pw = CorpusStats.psiDrift(wild, ref, "lang", "text")
      .collect().head.getAs[Double]("psi")
    assert(pm > 0.0 && pw > pm, s"mild=$pm wild=$pw")
  }

  test("psi groups are independent and both-side groups survive") {
    val cur = docs(("en", "a b"), ("de", "x y"))
    val ref = docs(("en", "a b"), ("de", "p q"))
    val m = CorpusStats.psiDrift(cur, ref, "lang", "text").collect()
      .map(r => r.getAs[String]("grp") -> r.getAs[Double]("psi")).toMap
    assert(m("en") === 0.0 && m("de") > 0.0)
  }

  test("good-turing: hand-worked frequency-of-frequencies table") {
    val d = docs(("en", "a a a b b c"))
    val rows = CorpusStats.goodTuring(d, "lang", "text").orderBy("r")
      .collect()
    val byR = rows.map(r => r.getAs[Long]("r") ->
      (r.getAs[Long]("n_r"), r.getAs[Double]("r_star"),
        r.getAs[Double]("p_mass"))).toMap
    assert(byR(1L) === ((1L, 2.0, 0.166667))) // r*=(2)(N2/N1)=2
    assert(byR(2L) === ((1L, 3.0, 0.333333)))
    assert(byR(3L) === ((1L, 0.0, 0.5))) // no N4: r* floor at 0
    assert(rows.map(_.getAs[Long]("n_tokens")).toSet === Set(6L))
  }

  test("good-turing: maxR bounds the table, singleton mass is P0's numerator") {
    val d = docs(("en", (1 to 30).map(i => s"hapax$i").mkString(" ")
      + " " + Seq.fill(20)("common").mkString(" ")))
    val rows = CorpusStats.goodTuring(d, "lang", "text", maxR = 5).collect()
    assert(rows.forall(_.getAs[Long]("r") <= 5))
    val r1 = rows.find(_.getAs[Long]("r") === 1L).get
    assert(r1.getAs[Long]("n_r") === 30) // 30 hapaxes
    assert(r1.getAs[Double]("p_mass") === 0.6) // 30/50
  }
}
