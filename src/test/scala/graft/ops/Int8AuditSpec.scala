package graft.ops

import graft.SparkSpec

/** X125 — int8 scalar-quantization audit: hand-worked code/error
  * lanes, the representable-exactly case, the zero vector, rounding
  * parity on negatives, and the envelope guard.
  */
class Int8AuditSpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(Long, Seq[Float])]) =
    Similarity.int8Audit(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding")
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  /** Reference model of the engine's arithmetic. */
  private def expected(vec: Seq[Float]): (Long, Long, Long) = {
    val q = vec.map(x => math.floor(x.toDouble * 1000).toLong)
    val m = q.map(math.abs).max
    if (m == 0) return (0L, 0L, 0L)
    val err = q.map { y =>
      val c = (254 * math.abs(y) + m) / (2 * m) // round-half-up, nonneg
      val d = 127 * y - math.signum(y) * c * m
      d * d
    }.sum
    val n2 = q.map(y => y * y).sum
    (m, err, (BigInt(err) * 1000000 / (BigInt(16129) * n2)).toLong)
  }

  test("codes and error lanes match the hand model; scale-aligned " +
    "vectors quantize exactly") {
    val vecs = Seq(
      1L -> Seq(1.27f, -0.638f, 0.001f, 0f),
      // only 0 and ±maxabs code exactly under a prime 127 divisor:
      // the all-extremes vector is the representable-exactly case
      2L -> Seq(2f, -2f, 0f, 0f),
      3L -> Seq(-2f, 1.999f, 0.5f, -0.25f))
    val got = audit(vecs)
    vecs.zip(got).foreach { case ((id, v), (gid, m, e, ppm)) =>
      val (wm, we, wppm) = expected(v)
      assert((gid, m, e, ppm) === ((id, wm, we, wppm)), s"vec $id")
    }
    assert(got(1)._3 === 0L && got(1)._4 === 0L)
  }

  test("zero vector quantizes exactly; dense over non-null input") {
    val got = audit(Seq(1L -> Seq(0f, 0f, 0f), 2L -> Seq(0.5f, 0f, 0f)))
    assert(got.length === 2)
    assert(got.head === ((1L, 0L, 0L, 0L)))
  }

  test("negative coordinates round by magnitude (engine/oracle div " +
    "parity), not toward minus infinity") {
    // float-exact ±0.25: q = (±250, 1000), code(|250|) =
    // round(127*250/1000) = round(31.75) = 32. A division applied to
    // the SIGNED lane would truncate/floor −31.75 differently across
    // engines; coding by magnitude keeps the error sign-symmetric
    val neg = audit(Seq(1L -> Seq(-0.25f, 1f)))
    val pos = audit(Seq(1L -> Seq(0.25f, 1f)))
    assert(neg.head._3 === pos.head._3) // symmetric error
    assert(neg.head._3 === expected(Seq(-0.25f, 1f))._2)
  }

  test("the exact-lane envelope refuses oversized magnitudes loudly") {
    val e = intercept[Exception] {
      audit(Seq(1L -> Seq(2001f, 1f)))
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("envelope"), msgs)
  }
}
