package graft.ops

import graft.SparkSpec

class AudioFpSpec extends SparkSpec {
  import spark.implicits._

  /** The render rule re-derived independently of the byte path. */
  private def ruleFp(id: Long): (Long, Long, Long) = {
    val nWords = ((id % 50 + 1) * (id % 2 + 1)).toInt
    def s(i: Int): Long = (id * 131 + i * 17) % 65536 - 32768
    val e = new Array[Long](8)
    for (k <- 0 until 8; i <- k * nWords / 8 until (k + 1) * nWords / 8)
      e(k) += s(i) * s(i)
    var fp = 0L
    for (j <- 0 until 7 if e(j + 1) > e(j)) fp |= 1L << j
    (fp, nWords.toLong, e.sum)
  }

  test("decoded-byte fingerprint equals the render-rule derivation") {
    val docs = (0L until 60L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val got = Multimodal.audioPerceptualDedup(
        Multimodal.renderWav(docs, "doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(1), r.getLong(3)))).toMap
    for (id <- 0L until 60L)
      assert(got(id) === ruleFp(id), s"doc $id")
  }

  test("fingerprint groups carry min-id canonicals and true sizes") {
    val docs = (0L until 150L).map(i => (i, "t")).toDF("doc_id", "text")
    val rows = Multimodal.audioPerceptualDedup(
        Multimodal.renderWav(docs, "doc_id"), "doc_id").collect()
    for ((_, g) <- rows.groupBy(_.getLong(2))) {
      assert(g.map(_.getLong(5)).toSet === Set(g.map(_.getLong(0)).min))
      assert(g.map(_.getLong(4)).toSet === Set(g.length.toLong))
    }
    // 7-bit space over 150 clips must collide
    assert(rows.groupBy(_.getLong(2)).exists(_._2.length > 1))
  }

  test("non-WAV blobs are skipped") {
    val junk = Seq((1L, Array[Byte]('n', 'o', 'p', 'e'))).toDF("doc_id", "audio")
    assert(Multimodal.audioPerceptualDedup(junk, "doc_id").collect().isEmpty)
  }
}
