package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ImageHashSpec extends SparkSpec {
  import spark.implicits._

  /** The render rule re-derived independently of the byte path. */
  private def ruleHash(id: Long): (Int, Int, Long) = {
    val w = (id % 8 + 1).toInt; val h = (id % 5 + 1).toInt
    def pix(i: Int): Int = ((id * 31 + i * 7) % 256).toInt
    def gray(si: Int, sj: Int): Int = {
      val p = 3 * (si * w + sj)
      (pix(p) + pix(p + 1) + pix(p + 2)) / 3
    }
    val cells = for (i <- 0 until 4; j <- 0 until 4)
      yield gray(i * h / 4, j * w / 4)
    val avg = cells.sum / 16
    var hash = 0L
    for (k <- cells.indices if cells(k) > avg) hash |= 1L << k
    (w, h, hash)
  }

  test("decoded-byte aHash equals the render-rule derivation for every doc") {
    val docs = (0L until 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.imagePerceptualDedup(
        Multimodal.renderPpm(docs, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3)))).toMap
    for (id <- 0L until 60L)
      assert(got(id) === ruleHash(id), s"doc $id")
  }

  test("identical render inputs share a hash group with min-id canonical") {
    // ids 3 and 43 render DIFFERENT images; a shared group needs equal
    // hashes — assert group bookkeeping on whatever collisions exist
    val docs = (0L until 200L).map(i => (i, "t")).toDF("doc_id", "text")
    val rows = Multimodal.imagePerceptualDedup(
        Multimodal.renderPpm(docs, "doc_id"), "doc_id")
      .collect()
    val byHash = rows.groupBy(_.getLong(3))
    for ((_, g) <- byHash) {
      val canon = g.map(_.getLong(5)).toSet
      assert(canon === Set(g.map(_.getLong(0)).min),
        "canonical must be the min doc_id of the hash group")
      assert(g.map(_.getLong(4)).toSet === Set(g.length.toLong),
        "group_n must be the hash-group size")
    }
    // the 16-bit space over 200 small images must actually collide
    assert(byHash.exists(_._2.length > 1), "expected at least one group")
  }

  /** 64-bit render rule — the [[ruleHash]] derivation at the 8x8 grid. */
  private def ruleHash64(id: Long): Long = {
    val w = (id % 8 + 1).toInt; val h = (id % 5 + 1).toInt
    def pix(i: Int): Int = ((id * 31 + i * 7) % 256).toInt
    def gray(si: Int, sj: Int): Int = {
      val p = 3 * (si * w + sj)
      (pix(p) + pix(p + 1) + pix(p + 2)) / 3
    }
    val cells = for (i <- 0 until 8; j <- 0 until 8)
      yield gray(i * h / 8, j * w / 8)
    val avg = cells.sum / 64
    var hash = 0L
    for (k <- cells.indices if cells(k) > avg) hash |= 1L << k
    hash
  }

  test("decoded-byte aHash64 equals the render-rule derivation") {
    val docs = (0L until 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.imageSignatures(
        Multimodal.renderPpm(docs, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    for (id <- 0L until 60L)
      assert(got(id) === ruleHash64(id), s"doc $id")
  }

  test("hamming pairs equal the naive all-pairs popcount (pigeonhole " +
    "lossless), and flat images pin a distance-0 sliver") {
    val n = 200L
    val docs = (0L until n).map(i => (i, "t")).toDF("doc_id", "text")
    val got = Multimodal.imageHammingPairs(
        Multimodal.renderPpm(docs, "doc_id"), "doc_id", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hashes = (0L until n).map(i => i -> ruleHash64(i)).toMap
    val want = (for {
      a <- 0L until n; b <- (a + 1) until n
      d = java.lang.Long.bitCount(hashes(a) ^ hashes(b))
      if d <= 3
    } yield (a, b, d.toLong)).toSet
    assert(got === want)
    // 1x1 renders (id % 40 == 0) are flat -> hash 0 -> exact pairs at
    // distance 0 must exist, so the equality sliver is really exercised
    assert(want.exists(_._3 == 0L), "expected distance-0 pairs")
    assert(want.exists(_._3 > 0L), "expected loosened (0 < d <= 3) pairs")
  }

  test("canonical-grain hamming equals doc-grain collapsed by signature") {
    val n = 200L
    val docs = (0L until n).map(i => (i, "t")).toDF("doc_id", "text")
    val got = Multimodal.imageHammingCanonical(
        Multimodal.renderPpm(docs, "doc_id"), "doc_id", maxDist = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val hashes = (0L until n).map(i => i -> ruleHash64(i))
    val groups = hashes.groupBy(_._2)
      .map { case (h, g) => h -> (g.map(_._1).min, g.size.toLong) }
    val want = (for {
      (ha, (ca, ma)) <- groups; (hb, (cb, mb)) <- groups
      if ca < cb
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (math.min(ca, cb), math.max(ca, cb)) ->
      ((d.toLong, if (ca < cb) ma else mb, if (ca < cb) mb else ma))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("tier audit: group-grain counts; d3 recall is 1, a16 lumps " +
    "64-distinct content") {
    val n = 200L
    val docs = (0L until n).map(i => (i, "t")).toDF("doc_id", "text")
    val rows = Multimodal.imageTierAudit(
        Multimodal.renderPpm(docs, "doc_id"), "doc_id", maxDist = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    val h64 = (0L until n).map(ruleHash64)
    val truth = h64.groupBy(identity).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    val (_, _, nTruth, _, rec64) = rows("h64_d3")
    assert(nTruth === truth && truth > 0L)
    assert(rec64 === 1000000L) // superset of equality: full recall
    val (p16, h16Hits, _, prec16, _) = rows("a16_exact")
    assert(p16 >= h16Hits) // the coarse grid admits extra pairs...
    assert(prec16 < 1000000L) // ...so its precision is genuinely < 1
  }

  test("non-PPM blobs are skipped, not crashed on") {
    val junk = Seq((1L, Array[Byte]('X', 'Y', 'Z')),
      (2L, "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array.fill(6)(7.toByte)))
      .toDF("doc_id", "image")
    val rows = Multimodal.imagePerceptualDedup(junk, "doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L))
  }
}
