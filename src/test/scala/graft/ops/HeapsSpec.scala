package graft.ops

import graft.SparkSpec

class HeapsSpec extends SparkSpec {
  import spark.implicits._

  private def fit(rows: Seq[(String, Long, String)], cellSize: Int = 256) =
    CorpusStats.heapsFit(rows.toDF("lang", "doc_id", "text"),
      "lang", "doc_id", "text", cellSize)

  /** The spec's own exact-integer least squares over micro-nat points. */
  private def lsq(pts: Seq[(Long, Long)]): (Double, Double) = {
    val n = BigInt(pts.size)
    def mn(v: Double) = BigInt(math.round(math.log(v) * 1e6))
    val xs = pts.map(p => mn(p._1.toDouble)); val ys = pts.map(p => mn(p._2.toDouble))
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
    val sxx = xs.map(a => a * a).sum
    val beta = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
    val lnk = (sy.toDouble - beta * sx.toDouble) / n.toDouble / 1e6
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r6(beta), r6(lnk))
  }

  test("hand-worked growth curve: checkpoints, beta, ln_k") {
    val r = fit(Seq(("g", 1L, "a b a"), ("g", 2L, "a c"), ("g", 3L, "d d")))
      .collect().head
    assert(r.getAs[Long]("n_points") === 3)
    val (beta, lnk) = lsq(Seq((3L, 2L), (5L, 3L), (7L, 4L)))
    assert(r.getAs[Double]("beta") === beta)
    assert(r.getAs[Double]("ln_k") === lnk)
  }

  test("the two-level cell decomposition equals the naive cumulative") {
    val rows = (1L to 40L).map(i =>
      ("g", i, (0 to (i % 5).toInt).map(j => s"w${(i * 7 + j) % 23}").mkString(" ")))
    val a = fit(rows, cellSize = 4).collect().head
    val b = fit(rows, cellSize = 1024).collect().head
    for (c <- Seq("beta", "ln_k"))
      assert(a.getAs[Double](c) === b.getAs[Double](c), c)
    assert(a.getAs[Long]("n_points") === b.getAs[Long]("n_points"))
  }

  test("pure repetition drives beta toward 0, all-new types toward 1") {
    val rep = (1L to 30L).map(i => ("g", i, "same words every time"))
    val fresh = (1L to 30L).map(i => ("g", i, s"u$i v$i w$i x$i"))
    assert(fit(rep).collect().head.getAs[Double]("beta") < 0.2)
    assert(fit(fresh).collect().head.getAs[Double]("beta") > 0.95)
  }

  test("languages fit independently") {
    val rows = (1L to 20L).flatMap(i => Seq(
      ("aa", i, s"u$i v$i"), ("bb", i, "same thing")))
    val m = fit(rows).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Double]("beta")).toMap
    assert(m("aa") > 0.9 && m("bb") < 0.2)
  }

  test("a single-checkpoint language fails loudly, not with NaN") {
    val e = intercept[Throwable] {
      fit(Seq(("g", 1L, "only doc"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("degenerate")), msgs(e).mkString("; "))
  }
}
