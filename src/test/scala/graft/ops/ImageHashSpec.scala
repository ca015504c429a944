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

  test("non-PPM blobs are skipped, not crashed on") {
    val junk = Seq((1L, Array[Byte]('X', 'Y', 'Z')),
      (2L, "P6\n2 1\n255\n".getBytes("US-ASCII") ++ Array.fill(6)(7.toByte)))
      .toDF("doc_id", "image")
    val rows = Multimodal.imagePerceptualDedup(junk, "doc_id").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(2L))
  }
}
