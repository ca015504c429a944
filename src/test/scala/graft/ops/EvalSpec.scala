package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kappa: perfect agreement is 1, exact integer lanes") {
    val df = Seq(("x", "x"), ("y", "y"), ("x", "x")).toDF("a", "b")
    val r = Eval.cohenKappa(df, "a", "b").collect().head
    assert(r.getAs[Double]("kappa") === 1.0)
    assert(r.getAs[Long]("num") === r.getAs[Long]("den"))
  }

  test("kappa: the textbook 2x2 worked example") {
    // 20 raters-pairs: a=(yes:12, no:8), b=(yes:10, no:10), agree=14
    // po=0.7, pe=(12*10 + 8*10)/400=0.5 -> kappa=0.4
    val rows = Seq.fill(9)(("yes", "yes")) ++ Seq.fill(3)(("yes", "no")) ++
      Seq.fill(1)(("no", "yes")) ++ Seq.fill(5)(("no", "no")) ++
      Seq.fill(2)(("no", "no"))
    // recount: yes/yes 9, yes/no 3, no/yes 1, no/no 7 => n=20 agree=16
    val df = rows.toDF("a", "b")
    val r = Eval.cohenKappa(df, "a", "b").collect().head
    val (n, agree) = (20L, 16L)
    val cpe = 12L * 10 + 8L * 10 // a: yes 12, no 8; b: yes 10, no 10
    assert(r.getAs[Long]("n") === n && r.getAs[Long]("n_agree") === agree)
    assert(r.getAs[Long]("num") === n * agree - cpe)
    assert(r.getAs[Long]("den") === n * n - cpe)
    assert(r.getAs[Double]("kappa") ===
      round6((n * agree - cpe).toDouble / (n * n - cpe)))
  }

  test("kappa: chance-level agreement from independent raters is ~0; " +
    "constant raters hit the den=0 guard") {
    val chance = (0 until 400).map(i => (s"c${i % 2}", s"c${(i / 2) % 2}"))
    val k = Eval.cohenKappa(chance.toDF("a", "b"), "a", "b")
      .collect().head.getAs[Double]("kappa")
    assert(math.abs(k) < 0.05, s"kappa $k")
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    assert(Eval.cohenKappa(const, "a", "b").collect().head
      .getAs[Double]("kappa") === 0.0)
  }

  test("auc: perfect separation 1.0, reversed 0.0, random-ish ~0.5") {
    def auc(rows: Seq[(Long, Boolean)]): Double =
      Eval.aucExact(rows.map(r => ("g", r._1, r._2))
        .toDF("grp", "s", "lbl"), "grp", "s", "lbl")
        .collect().head.getAs[Double]("auc")
    assert(auc(Seq((10L, true), (9L, true), (2L, false), (1L, false))) === 1.0)
    assert(auc(Seq((1L, true), (2L, true), (9L, false), (10L, false))) === 0.0)
    val mixed = (0 until 200).map(i => ((i * 7 % 31).toLong, i % 2 == 0))
    assert(math.abs(auc(mixed) - 0.5) < 0.1)
  }

  test("auc: ties earn exactly half credit (the average-rank law)") {
    // all scores equal: AUC must be exactly 0.5, as an exact ratio
    val r = Eval.aucExact(Seq(("g", 5L, true), ("g", 5L, true),
        ("g", 5L, false)).toDF("grp", "s", "lbl"), "grp", "s", "lbl")
      .collect().head
    assert(r.getAs[Long]("num2") === 2L && r.getAs[Long]("den2") === 4L)
    assert(r.getAs[Double]("auc") === 0.5)
  }

  test("kendall tau: identical ranking 1, reversed -1, partial overlap") {
    def rk(rows: (Long, Long, Int)*) = rows.toDF("qid", "cid", "rank")
    val exact = rk((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4))
    def tau(m: org.apache.spark.sql.DataFrame): (Long, Long, Long, Double) = {
      val r = Eval.kendallTau(Seq("m" -> m), exact).collect().head
      (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
        r.getAs[Long]("n_pairs"), r.getAs[Double]("tau"))
    }
    assert(tau(exact) === ((6L, 0L, 6L, 1.0)))
    val rev = rk((1L, 10L, 4), (1L, 11L, 3), (1L, 12L, 2), (1L, 13L, 1))
    assert(tau(rev) === ((0L, 6L, 6L, -1.0)))
    // method finds only 3 of 4, with one swap: pairs C(3,2)=3, one discordant
    val part = rk((1L, 10L, 1), (1L, 12L, 2), (1L, 11L, 3))
    assert(tau(part) === ((2L, 1L, 3L, round6(1.0 / 3))))
  }

  test("kendall tau: pairs never cross queries; empty overlap hits the guard") {
    def rk(rows: (Long, Long, Int)*) = rows.toDF("qid", "cid", "rank")
    val exact = rk((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 1), (2L, 11L, 2))
    val m = rk((1L, 10L, 1), (1L, 11L, 2), (2L, 10L, 2), (2L, 11L, 1))
    val r = Eval.kendallTau(Seq("m" -> m), exact).collect().head
    assert(r.getAs[Long]("n_pairs") === 2) // one pair per query, not C(4,2)
    assert(r.getAs[Double]("tau") === 0.0) // +1 and -1 cancel
    val none = Eval.kendallTau(
      Seq("m" -> rk((9L, 99L, 1))), exact).collect().head
    assert(none.getAs[Long]("n_pairs") === 0
      && none.getAs[Double]("tau") === 0.0)
  }

  test("ndcg: perfect 1.0, top-rank misses cost more than tail misses") {
    def rk(rows: (Long, Long, Int)*) = rows.toDF("qid", "cid", "rank")
    val exact = rk((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3))
    val w = Seq(1000000L, 630930L, 500000L) // round(1e6/log2(i+1))
    def ndcg(m: org.apache.spark.sql.DataFrame): (Long, Double) = {
      val r = Eval.ndcgAt(Seq("m" -> m), exact, k = 3).collect().head
      (r.getAs[Long]("dcg_micro"), r.getAs[Double]("ndcg"))
    }
    assert(ndcg(exact) === ((w.sum, 1.0)))
    // missing the rank-1 truth item but holding 11, 12 at front
    val noTop = rk((1L, 11L, 1), (1L, 12L, 2), (1L, 99L, 3))
    // missing the rank-3 truth item
    val noTail = rk((1L, 10L, 1), (1L, 11L, 2), (1L, 99L, 3))
    assert(ndcg(noTop)._1 === w(0) + w(1))
    assert(ndcg(noTail)._1 === w(0) + w(1))
    // same dcg here (both hold 2 hits at ranks 1-2) — drop a hit to
    // the tail instead to see position emphasis:
    val topHitLast = rk((1L, 99L, 1), (1L, 98L, 2), (1L, 10L, 3))
    assert(ndcg(topHitLast)._1 === w(2))
    assert(ndcg(topHitLast)._2 < ndcg(noTail)._2)
    assert(ndcg(rk((9L, 99L, 1)))._2 === 0.0)
  }

  test("ndcg: the ideal adapts to short exact lists per query") {
    def rk(rows: (Long, Long, Int)*) = rows.toDF("qid", "cid", "rank")
    // qid 2's exact list has only ONE item: its ideal is w1, not w1+w2
    val exact = rk((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
    val perfect = rk((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
    val r = Eval.ndcgAt(Seq("m" -> perfect), exact, k = 2).collect().head
    assert(r.getAs[Double]("ndcg") === 1.0)
  }

  test("auc: groups are independent; single-class group hits the guard") {
    val rows = Seq(("a", 3L, true), ("a", 1L, false),
      ("b", 9L, true), ("b", 9L, true))
    val m = Eval.aucExact(rows.toDF("grp", "s", "lbl"), "grp", "s", "lbl")
      .collect().map(r => r.getAs[String]("grp") -> r.getAs[Double]("auc"))
      .toMap
    assert(m("a") === 1.0 && m("b") === 0.0) // nn=0 -> den2=0 guard
  }
}
