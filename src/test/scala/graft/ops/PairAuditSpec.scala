package graft.ops

import graft.SparkSpec

/** X82 pair audit: exact ppm accounting, the empty-tier convention
  * (precision 0, a legitimate measurement), and the loud guards.
  */
class PairAuditSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(ps: (Long, Long)*) = ps.toDF("d1", "d2")

  test("precision and recall are exact integral ppm") {
    val truth = pairs((1L, 2L), (3L, 4L), (5L, 6L), (7L, 8L))
    val tier = pairs((1L, 2L), (3L, 4L), (9L, 10L)) // 2 hits, 1 junk
    val got = Dedup.pairAudit(Seq("t" -> tier), truth).collect().head
    assert((got.getString(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) ===
      (("t", 3L, 2L, 4L, 666666L, 500000L)))
  }

  test("an empty tier measures as precision 0, recall 0") {
    val got = Dedup.pairAudit(
        Seq("empty" -> pairs().limit(0)), pairs((1L, 2L)))
      .collect().head
    assert((got.getLong(1), got.getLong(4), got.getLong(5)) === ((0L, 0L, 0L)))
  }

  test("guards: empty truth and duplicate names are loud") {
    intercept[IllegalArgumentException](
      Dedup.pairAudit(Seq("t" -> pairs((1L, 2L))), pairs().limit(0)))
    val p = pairs((1L, 2L))
    intercept[IllegalArgumentException](
      Dedup.pairAudit(Seq("a" -> p, "a" -> p), p))
    intercept[IllegalArgumentException](Dedup.pairAudit(Nil, p))
  }
}
