package graft.ops

import graft.SparkSpec

/** X119 — exact covariance lanes against a hand case, and the
  * all-but-the-top audit: eigen-ness of the driver-trained component,
  * the exact zero-sum score invariant, and alignment on a corpus built
  * along a known principal direction.
  */
class AbttSpec extends SparkSpec {
  import spark.implicits._

  test("covariance lanes match the hand-worked integer case") {
    val emb = Seq((1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.covarianceTable(emb, "embedding")
      .orderBy("i", "j").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    // q rows: (1000,0), (0,1000), (1000,1000); n=3, s=(2000, 2000)
    // g11 = g22 = 2e6, g12 = 1e6; cov = (g*n - si*sj)/9
    assert(got((1L, 1L)) === ((3L, 2000000L, 2000L, 2000L,
      BigDecimal((2000000L * 3 - 2000L * 2000L) / 9.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got((1L, 2L))._2 === 1000000L)
    assert(got((2L, 2L))._2 === 2000000L)
    assert(got.keySet === Set((1L, 1L), (1L, 2L), (2L, 2L)))
  }

  test("abtt: trained component is an eigenvector; scores sum to the " +
    "exact zero; centered vectors on the PC line score |cos| ~ 1") {
    // corpus along direction (1,1)/sqrt(2) with varied magnitude
    val emb = (0 until 40).map { i =>
      val a = (i - 20) * 0.04f
      (i.toLong, Seq(a, a))
    }.toDF("vec_id", "embedding")
    val rows = Similarity.abtt(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect()
    assert(rows.length === 40) // dense
    // sum of qc is exactly zero coordinate-wise, so scores sum to 0
    assert(rows.map(_.getLong(1)).sum === 0L)
    // the trained component must align with (1,1): equal micro-units
    val (vq, vq2) = Similarity.lastAbttPc.get
    assert(vq.length === 2 && vq(0) === vq(1),
      s"component ${vq.toSeq} not on the (1,1) line")
    assert(vq2 === vq.map(x => x * x).sum)
    // every centered vector lies ON the component line -> |cos| ~ 1
    // (quantization tolerance only); vectors at the mean score ~0
    val far = rows.filter(r => math.abs(r.getLong(0) - 20L) > 2)
    assert(far.forall(r => math.abs(math.abs(r.getDouble(2)) - 1.0) < 1e-3),
      far.map(r => (r.getLong(0), r.getDouble(2))).mkString(","))
    // eigen-ness: C v is parallel to v (cosine > 0.999) on the
    // covariance rebuilt from the exact lanes
    val cov = Similarity.covarianceTable(emb, "embedding").collect()
    val d = 2
    val c = Array.ofDim[Double](d, d)
    cov.foreach { r =>
      val (i, j) = (r.getLong(0).toInt - 1, r.getLong(1).toInt - 1)
      c(i)(j) = r.getDouble(6); c(j)(i) = r.getDouble(6)
    }
    val v = vq.map(_.toDouble)
    val cv = Array.tabulate(d)(i => (0 until d).map(j => c(i)(j) * v(j)).sum)
    val cos = cv.zip(v).map { case (a, b) => a * b }.sum /
      (math.sqrt(cv.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(cos > 0.999, s"Cv not parallel to v: cos $cos")
  }

  test("isotropy: a one-direction corpus reads anisotropy ~ d; trace " +
    "numerator is exact") {
    val emb = (0 until 40).map { i =>
      val a = (i - 20) * 0.04f
      (i.toLong, Seq(a, a))
    }.toDF("vec_id", "embedding")
    val r = Similarity.isotropy(emb, "embedding").collect().head
    assert(r.getAs[Long]("n") === 40L && r.getAs[Long]("d") === 2L)
    // every vector lies on (1,1): the two diagonal cells carry ALL the
    // variance and lambda1 = trace, so the ratio is d = 2 (micro tolerance)
    assert(math.abs(r.getAs[Double]("anisotropy") - 2.0) < 1e-3,
      s"anisotropy ${r.getAs[Double]("anisotropy")}")
    assert(r.getAs[Double]("lambda1") > 0)
    // trace numerator replays exactly from the covariance lanes
    val cov = Similarity.covarianceTable(emb, "embedding").collect()
    val want = cov.filter(x => x.getLong(0) == x.getLong(1))
      .map(x => x.getLong(3) * x.getLong(2) - x.getLong(4) * x.getLong(5))
      .sum
    assert(r.getAs[Long]("trace_num") === want)
  }

  test("abtt fails loudly on empty input") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.abtt(empty, "vec_id", "embedding")
    }
  }
}
