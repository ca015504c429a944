package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** X80 RRF: exact integral contributions, the absent-from-a-ranker
  * convention, consensus beating a single first place at K=60, and the
  * argument guards.
  */
class RrfFuseSpec extends SparkSpec {

  import spark.implicits._

  private def fuse(a: Seq[(Long, Int)], b: Seq[(Long, Int)]): Map[Long, (Long, Long, Long)] =
    Retrieval.rrfFuse(
        Seq("bm25" -> a.toDF("doc_id", "rank"), "cos" -> b.toDF("doc_id", "rank")),
        "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("contributions are exact integral micro-units") {
    val got = fuse(Seq(1L -> 1, 2L -> 2), Seq(1L -> 2, 3L -> 1))
    // doc 1: floor(1e6/61) + floor(1e6/62) = 16393 + 16129
    assert(got(1L) === ((1L, 2L, 16393L + 16129L)))
    // doc 2: bm25 only, rank 2
    assert(got(2L) === ((2L, 0L, 16129L)))
    // doc 3: cos only, rank 1
    assert(got(3L) === ((0L, 1L, 16393L)))
  }

  test("consensus beats a single first place (the RRF property)") {
    // doc 10 is rank 3 in BOTH rankers; docs 1 and 2 take the top slots
    // of one ranker each and are absent from the other
    val got = fuse(Seq(1L -> 1, 10L -> 3), Seq(2L -> 1, 10L -> 3))
    val rrf10 = got(10L)._3
    assert(rrf10 > got(1L)._3 && rrf10 > got(2L)._3,
      s"consensus doc must outrank single-list leaders: $got")
  }

  test("a 0-based (or negative) input rank fails in-plan") {
    // rank 0 is the ABSENT output sentinel; an input ranker emitting it
    // would be silently over-weighted (1e6 div 60 vs div 61)
    val e = intercept[Exception] {
      Retrieval.rrfFuse(
        Seq("zr" -> Seq(1L -> 0).toDF("doc_id", "rank")), "doc_id").collect()
    }
    assert(e.getMessage.contains("1-based"))
  }

  test("guards: empty rankings and duplicate names are loud") {
    intercept[IllegalArgumentException](Retrieval.rrfFuse(Nil, "doc_id"))
    val r = Seq(1L -> 1).toDF("doc_id", "rank")
    intercept[IllegalArgumentException](
      Retrieval.rrfFuse(Seq("a" -> r, "a" -> r), "doc_id"))
  }

  test("fusing one ranker is the identity ordering") {
    val out = Retrieval.rrfFuse(
        Seq("solo" -> Seq(5L -> 1, 6L -> 2, 7L -> 3).toDF("doc_id", "rank")),
        "doc_id")
      .orderBy(col("rrf_micro").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    assert(out === Seq(5L, 6L, 7L))
  }
}
