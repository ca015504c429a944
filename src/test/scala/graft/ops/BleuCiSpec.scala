package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BleuCiSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (String, Long, String, String)*) =
    rows.toDF("grp", "pid", "hyp", "ref")

  test("poisson thresholds: mean multiplicity ~ 1 and k=0 mass ~ 1/e") {
    val ks = spark.range(20000)
      .withColumn("h", conv(substring(md5(concat(col("id").cast("string"),
        lit("|t|1"))), 1, 8), 16, 10).cast("long"))
      .selectExpr(BleuCi.poissonKSql("h") + " AS k")
      .groupBy("k").count().collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("count")).toMap
    val n = ks.values.sum.toDouble
    val mean = ks.map { case (k, c) => k * c }.sum / n
    assert(math.abs(mean - 1.0) < 0.03, s"mean $mean")
    assert(math.abs(ks(0) / n - math.exp(-1)) < 0.01)
  }

  test("CI brackets the point estimate and is deterministic across runs") {
    val ps = (1L to 60L).map(i => ("en", i,
      s"tok$i the cat sat on mat ${i % 7}", s"tok$i the cat lay on mat ${i % 5}"))
    val r1 = BleuCi.bleuCi(pairs(ps: _*), "grp", "pid", "hyp", "ref",
      maxN = 2, nBoot = 40).collect().head
    val r2 = BleuCi.bleuCi(pairs(ps: _*), "grp", "pid", "hyp", "ref",
      maxN = 2, nBoot = 40).collect().head
    for (c <- Seq("bleu", "ci_lo", "ci_hi"))
      assert(r1.getAs[Double](c) === r2.getAs[Double](c), c)
    assert(r1.getAs[Long]("n_boot") === 40)
    assert(r1.getAs[Double]("ci_lo") <= r1.getAs[Double]("bleu"))
    assert(r1.getAs[Double]("ci_hi") >= r1.getAs[Double]("bleu") - 1e-9)
    assert(r1.getAs[Double]("ci_lo") < r1.getAs[Double]("ci_hi"))
  }

  test("a homogeneous corpus yields a tight interval, a bimodal one wide") {
    val homo = (1L to 50L).map(i => ("g", i, "a b c d", "a b c d"))
    val bimo = (1L to 50L).map(i => ("g", i, "a b c d",
      if (i % 2 == 0) "a b c d" else "x y z w"))
    def width(ps: Seq[(String, Long, String, String)]): Double = {
      val r = BleuCi.bleuCi(pairs(ps: _*), "grp", "pid", "hyp", "ref",
        maxN = 2, nBoot = 40).collect().head
      r.getAs[Double]("ci_hi") - r.getAs[Double]("ci_lo")
    }
    assert(width(homo) === 0.0) // every resample scores exactly 1
    assert(width(bimo) > 0.0)
  }

  test("a different seed draws a different resample set") {
    // heterogeneous pair quality, so resample weights move the score
    val ps = (1L to 50L).map(i => ("g", i, s"w$i a b",
      if (i % 3 == 0) s"w$i a b" else if (i % 3 == 1) s"w$i a c" else "q r s"))
    val a = BleuCi.bleuCi(pairs(ps: _*), "grp", "pid", "hyp", "ref",
      maxN = 1, nBoot = 40, seed = "s1").collect().head
    val b = BleuCi.bleuCi(pairs(ps: _*), "grp", "pid", "hyp", "ref",
      maxN = 1, nBoot = 40, seed = "s2").collect().head
    assert(a.getAs[Double]("bleu") === b.getAs[Double]("bleu"))
    assert(a.getAs[Double]("ci_lo") !== b.getAs[Double]("ci_lo"))
  }

  test("nBoot floor is enforced") {
    intercept[IllegalArgumentException] {
      BleuCi.bleuCi(pairs(("g", 1L, "a", "a")), "grp", "pid", "hyp", "ref",
        nBoot = 10)
    }
  }
}
