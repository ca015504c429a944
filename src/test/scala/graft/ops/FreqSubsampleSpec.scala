package graft.ops

import graft.SparkSpec
import org.apache.commons.codec.digest.DigestUtils

/** X127 — word-frequency subsampling: the keep set matches the
  * hand-replayed hash-vs-cut decision, rare words always keep, heavy
  * words thin toward √(t/f), output is dense and order-preserving.
  */
class FreqSubsampleSpec extends SparkSpec {
  import spark.implicits._

  private val seed = "s"
  private val tPpm = 100000L // t = 0.1 — bites at this toy scale

  /** The engine's arithmetic, replayed locally. */
  private def expectedKeep(docId: Long, pos: Long, c: Long,
                           total: Long): Boolean = {
    val r = (tPpm * total).toDouble / (1000000L * c).toDouble
    val p = math.min(1.0, math.sqrt(r) + r)
    val cut = BigDecimal(p * 4294967296.0)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val hv = java.lang.Long.parseLong(
      DigestUtils.md5Hex(s"$docId|$pos|$seed").substring(0, 8), 16)
    hv < cut
  }

  test("keep decisions replay the hash-vs-cut rule; reassembly " +
    "preserves token order; dense over all-dropped docs") {
    // "the" dominates (c=12 of 20): p < 1, some occurrences drop;
    // singletons have p = 1 and always survive
    val docs = Seq(
      1L -> "the the the the alpha the the beta the the",
      2L -> "the the gamma the delta",
      3L -> "the the the the the")
    val df = docs.toDF("doc_id", "text")
    val got = Sample.freqSubsample(df, "doc_id", "text", tPpm, seed)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val toks = docs.flatMap { case (id, t) =>
      t.split(" ").zipWithIndex.map { case (w, i) => (id, i + 1L, w) }
    }
    val counts = toks.groupBy(_._3).map { case (w, g) => w -> g.size.toLong }
    val total = toks.size.toLong
    val want = docs.map { case (id, t) =>
      val ts = toks.filter(_._1 == id)
      val kept = ts.filter { case (_, pos, w) =>
        expectedKeep(id, pos, counts(w), total)
      }
      (id, ts.size.toLong, kept.size.toLong, kept.map(_._3).mkString(" "))
    }
    assert(got.toSeq === want)
    // singletons survived; the heavy word actually thinned
    assert(got(0)._4.contains("alpha") && got(0)._4.contains("beta"))
    assert(got(1)._4.contains("gamma") && got(1)._4.contains("delta"))
    assert(got.map(_._3).sum < total, "nothing dropped — t too high")
    assert(got.length === 3) // dense even if a doc dropped everything
  }

  test("determinism: two runs produce the identical kept set") {
    val df = (0L until 50L).map(i =>
      (i, (1 to 30).map(k => s"w${(i + k) % 7}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = Sample.freqSubsample(df, "doc_id", "text", 50000L, "x")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = Sample.freqSubsample(df, "doc_id", "text", 50000L, "x")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("tPpm guard") {
    val df = Seq(1L -> "a b").toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Sample.freqSubsample(df, "doc_id", "text", 0L)
    }
  }
}
