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

  test("groups key on (n_words, fp) with min-id canonicals and true sizes") {
    val docs = (0L until 150L).map(i => (i, "t")).toDF("doc_id", "text")
    val rows = Multimodal.audioPerceptualDedup(
        Multimodal.renderWav(docs, "doc_id"), "doc_id").collect()
    for ((_, g) <- rows.groupBy(r => (r.getLong(1), r.getLong(2)))) {
      assert(g.map(_.getLong(5)).toSet === Set(g.map(_.getLong(0)).min))
      assert(g.map(_.getLong(4)).toSet === Set(g.length.toLong))
    }
    // group sizes equal the rule-derived partition of the key space
    val want = (0L until 150L).map { id =>
      val (fp, nw, _) = ruleFp(id); (nw, fp)
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    for ((k, g) <- rows.groupBy(r => (r.getLong(1), r.getLong(2))))
      assert(want(k) === g.length.toLong, s"key $k")
    // the 7-bit fp alone DOES collide across lengths at 150 clips —
    // the n_words axis is what keeps those out of shared groups
    assert(rows.groupBy(_.getLong(2))
      .exists(_._2.map(_.getLong(1)).distinct.length > 1))
  }

  test("non-WAV blobs are skipped") {
    val junk = Seq((1L, Array[Byte]('n', 'o', 'p', 'e'))).toDF("doc_id", "audio")
    assert(Multimodal.audioPerceptualDedup(junk, "doc_id").collect().isEmpty)
  }
}
