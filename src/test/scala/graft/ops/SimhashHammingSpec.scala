package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X79 pigeonhole Hamming join: exact agreement with the naive all-pairs
  * popcount (losslessness — the pigeonhole argument made a test), sign-bit
  * signatures, cross-band duplicate collapse, the divisibility guard, and
  * simhash64/simhash16 lane consistency.
  */
class SimhashHammingSpec extends SparkSpec {

  import spark.implicits._

  private def naive(sigs: Seq[(Long, Long)], maxDist: Int): Set[(Long, Long, Long)] =
    (for {
      (d1, s1) <- sigs; (d2, s2) <- sigs if d1 < d2
      dist = java.lang.Long.bitCount(s1 ^ s2).toLong if dist <= maxDist
    } yield (d1, d2, dist)).toSet

  private def run(sigs: Seq[(Long, Long)], maxDist: Int): Set[(Long, Long, Long)] =
    Dedup.hammingPairs(sigs.toDF("doc_id", "simhash"), "doc_id", maxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("matches the naive all-pairs popcount, negatives included") {
    val base = 0x123456789abcdefL
    val sigs = Seq(
      1L -> base,
      2L -> (base ^ 1L), // dist 1 from 1
      3L -> (base ^ 0x8000000000000001L), // dist 2, sign bit flipped
      4L -> ~base, // dist 64 from 1
      5L -> (base ^ 0x7L), // dist 3 (3 bits in ONE band) from 1
      6L -> (base ^ 0x0001000100010000L), // dist 3 spread across 3 bands
      7L -> (base ^ 0x1111L)) // dist 4: must NOT pair with 1 at d=3
    for (d <- Seq(0, 1, 3, 7))
      assert(run(sigs, d) === naive(sigs, d), s"maxDist=$d")
  }

  test("identical signatures pair exactly once despite agreeing on every band") {
    val sigs = Seq(1L -> 42L, 2L -> 42L, 3L -> -42L)
    val got = run(sigs, 3)
    assert(got === Set((1L, 2L, 0L)))
  }

  test("maxDist+1 must divide 64") {
    val sigs = Seq(1L -> 0L).toDF("doc_id", "simhash")
    intercept[IllegalArgumentException](Dedup.hammingPairs(sigs, "doc_id", 2))
    intercept[IllegalArgumentException](Dedup.hammingPairs(sigs, "doc_id", -1))
  }

  test("simhash64's low 16 bits ARE simhash16 (same md5 lane family)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "spark shuffles hash partitions across executors at scale"),
      (3L, "a b")) // too short for 3-shingles: absent from both
    val sh = Dedup.shingleTable(docs.toDF("doc_id", "text"), "doc_id", "text")
    val s16 = Dedup.simhash16(sh, "doc_id")
      .withColumnRenamed("simhash", "h16")
    val s64 = Dedup.simhash64(sh, "doc_id")
    val joined = s64.join(s16, Seq("doc_id"))
      .select(col("doc_id"), (col("simhash").bitwiseAND(lit(0xFFFFL))).as("lo"),
        col("h16"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getLong(1) === r.getLong(2),
      s"doc ${r.getLong(0)}: lane mismatch"))
  }
}
