package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X71 hard-negative mining: label-mismatch is enforced, ranking is the
  * quantized cosine with deterministic ties, and the result equals a
  * driver-side brute-force reference on a small corpus.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // 12 vectors in 4 dims, 3 labels; values exercise negative dots
  private val vecs: Seq[(Long, Array[Float], Int)] = (0L until 12L).map { i =>
    val v = Array.tabulate(4)(d =>
      (math.sin(i * 1.7 + d) * 0.8).toFloat)
    (i, v, (i % 3).toInt)
  }
  private def df = vecs.toDF("vec_id", "embedding", "label")

  // driver-side reference with the identical floor(x*1000) quantization
  private def refTopK(k: Int): Set[(Long, Long, Int)] = {
    val q = vecs.map { case (id, v, l) =>
      (id, v.map(x => math.floor(x * 1000).toLong), l)
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    (for {
      (qid, qv, ql) <- q
      ranked = q.filter { case (cid, _, cl) => cid != qid && cl != ql }
        .map { case (cid, cv, _) =>
          val sim = BigDecimal(dot(qv, cv).toDouble /
            (math.sqrt(dot(qv, qv).toDouble) * math.sqrt(dot(cv, cv).toDouble)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          (cid, sim)
        }.sortBy { case (cid, sim) => (-sim, cid) }.take(k)
      ((cid, _), r) <- ranked.zipWithIndex
    } yield (qid, cid, r + 1)).toSet
  }

  test("equals the driver-side brute force; no same-label candidate") {
    val out = Similarity.hardNegatives(df, df, "vec_id", "embedding",
      "label", k = 3).cache()
    val got = out.select("qid", "cid", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === refTopK(3))
    val labels = vecs.map(v => v._1 -> v._3).toMap
    got.foreach { case (qid, cid, _) =>
      assert(labels(qid) !== labels(cid))
    }
    out.unpersist()
  }

  test("every query gets exactly k rows when enough cross-label " +
    "candidates exist; clabel is the candidate's label") {
    val out = Similarity.hardNegatives(df, df, "vec_id", "embedding",
      "label", k = 2)
    val counts = out.groupBy("qid").count().as[(Long, Long)].collect()
    assert(counts.length === 12 && counts.forall(_._2 === 2L))
    val labels = vecs.map(v => v._1 -> v._3).toMap
    out.select("cid", "clabel").as[(Long, Int)].collect()
      .foreach { case (cid, cl) => assert(cl === labels(cid)) }
  }

  test("a query subset mines against the full corpus") {
    val queries = df.filter(col("vec_id") < 2)
    val out = Similarity.hardNegatives(df, queries, "vec_id", "embedding",
      "label", k = 4)
    assert(out.select("qid").distinct().as[Long].collect().toSet
      === Set(0L, 1L))
    // candidates may come from anywhere in the corpus
    assert(out.select("cid").as[Long].collect().exists(_ >= 2L))
  }
}
