package graft.ops

import graft.SparkSpec

/** X161 label separation: a planted mislabeled point is flagged
  * (negative separation, confused lane), clean labels read positive,
  * and the whole output matches an independent driver-side Long
  * replay of the centroid/dist/floor arithmetic.
  */
class LabelSeparationSpec extends SparkSpec {

  import spark.implicits._

  // label 0 at x~0, label 1 at x~10 — except vec 5, labeled 0 but
  // sitting ON label 1's centroid column (the planted mislabel)
  private val vecs: Seq[(Long, Seq[Float], Int)] = Seq(
    (1L, Seq(0.0f, 0.0f), 0),
    (2L, Seq(0.0f, 2.0f), 0),
    (3L, Seq(10.0f, 0.0f), 1),
    (4L, Seq(10.0f, 2.0f), 1),
    (5L, Seq(10.0f, 1.0f), 0))

  /** Independent replay: quantize, floorDiv centroids, exact dists,
    * signed micro floors — plain Scala Longs, no Spark.
    */
  private def replay(rows: Seq[(Long, Seq[Float], Int)])
      : Seq[(Int, Long, Long, Long, Long, Long, Long)] = {
    val q = rows.map { case (_, v, l) =>
      (l, v.map(x => math.floor(x.toDouble * 1000).toLong).toArray)
    }
    val labels = q.map(_._1).distinct.sorted
    val cents = labels.map { l =>
      val vs = q.filter(_._1 == l).map(_._2)
      l -> Array.tabulate(vs.head.length)(d =>
        Math.floorDiv(vs.map(_(d)).sum, vs.size.toLong))
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val per = q.map { case (l, v) =>
      val a = d2(v, cents(l))
      val b = labels.filter(_ != l).map(o => d2(v, cents(o))).min
      val m = math.max(a, b)
      val sm = if (m == 0) 0L
        else if (b >= a) (b - a) * 1000000L / m
        else -((a - b) * 1000000L / m)
      (l, a, b, sm)
    }
    labels.map { l =>
      val rows = per.filter(_._1 == l)
      val sms = rows.map(_._4)
      val s = sms.sum
      val avg = if (s >= 0) s / rows.size else -((-s) / rows.size)
      (l, rows.size.toLong,
        rows.count(r => r._3 < r._2).toLong,
        rows.count(r => r._3 < r._2).toLong * 1000000L / rows.size,
        avg, sms.min, sms.max)
    }
  }

  test("labelSeparation matches the independent Long replay and " +
    "flags the planted mislabel with negative separation") {
    val got = KMeansOp.labelSeparation(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === replay(vecs))
    val l0 = got.head
    assert(l0._3 === 1L, "exactly the planted point is confused")
    assert(l0._6 === -1000000L,
      "a point ON the other centroid reads full negative separation")
    val l1 = got(1)
    assert(l1._3 === 0L && l1._6 > 0L, "the clean label reads positive")
  }

  test("labelSeparation refuses single-label and unlabeled corpora") {
    intercept[IllegalArgumentException] {
      KMeansOp.labelSeparation(
        vecs.map(v => (v._1, v._2, 0)).toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
    }
    intercept[IllegalArgumentException] {
      KMeansOp.labelSeparation(
        Seq((1L, Seq(0.1f), null.asInstanceOf[Integer]))
          .toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
    }
  }
}
