package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X91 quantile summary: exactness when shards fit k, agreement with a
  * driver-side replica plus the rank bound on a skewed corpus, the
  * state cap, and the guards.
  */
class QuantileSpec extends SparkSpec {

  import spark.implicits._

  /** Driver replica of summary + estimate for one phi. */
  private def replica(rows: Seq[(String, Long, Long)], shards: Int,
                      k: Int, phiPpm: Long): Map[String, Long] =
    rows.groupBy(_._1).map { case (g, rs) =>
      val summ = rs.groupBy(_._3 % shards).toSeq.flatMap {
        case (sh, srs) =>
          val sorted = srs.sortBy(r => (r._2, r._3))
          val nS = sorted.size
          val step = (nS + k - 1) / k
          sorted.zipWithIndex.flatMap { case (r, i0) =>
            val r1 = i0 + 1
            val w =
              if (r1 % step == 0) step
              else if (r1 == nS) nS % step
              else 0
            if (w > 0) Some((r._2, sh, w.toLong)) else None
          }
      }
      val n = summ.map(_._3).sum
      val target = (phiPpm * n + 999999) / 1000000
      var cw = 0L
      val est = summ.sortBy(t => (t._1, t._2)).collectFirst {
        case (v, _, w) if { cw += w; cw >= target } => v
      }.get
      g -> est
    }

  test("exact when every shard fits k (step = 1)") {
    val rows = (0 until 40).map(i => ("g", (i * 7 % 100).toLong, i.toLong))
    val df = rows.toDF("grp", "v", "id")
    val summ = Quantile.summary(df, "grp", "v", "id", 8, 50)
    assert(summ.agg(sum("w")).collect().head.getLong(0) === 40L,
      "weights must sum to n")
    val est = Quantile.estimate(summ, df, "grp", "v", Seq(500000L), 8, 50)
      .collect().head
    val sorted = rows.map(_._2).sorted
    assert(est.getAs[Long]("est") === sorted(19)) // ceil(0.5*40) = 20th
    assert(est.getAs[Long]("err_ppm") === 0L)
  }

  test("replica agreement, state cap, and rank bound on skew") {
    val shards = 8
    val k = 10
    // skewed: half the mass at v=3, a long tail above
    val rows = (0 until 2000).map(i =>
      ("g", if (i % 2 == 0) 3L else (i % 97).toLong, i.toLong))
    val df = rows.toDF("grp", "v", "id")
    val summ = Quantile.summary(df, "grp", "v", "id", shards, k)
    assert(summ.count() <= shards * (k + 1L), "summary must stay capped")
    val got = Quantile.estimate(summ, df, "grp", "v",
        Seq(250000L, 500000L, 750000L), shards, k)
      .collect().map(r => r.getAs[Long]("phi_ppm") ->
        (r.getAs[Long]("est"), r.getAs[Long]("rank_lo"),
          r.getAs[Long]("rank_hi"), r.getAs[Long]("target"))).toMap
    for (phi <- Seq(250000L, 500000L, 750000L)) {
      val (est, lo, hi, target) = got(phi)
      assert(est === replica(rows, shards, k, phi)("g"), s"phi $phi")
      // the estimate() plan already aborts outside the bound; re-check
      // the guarantee here against the raw data
      val vs = rows.map(_._2)
      assert(lo === vs.count(_ < est) + 1)
      assert(hi === vs.count(_ <= est))
      assert(hi >= target, "upper rank must reach the target")
      assert(lo <= target + 2000 / k + shards, "epsilon bound")
    }
    // the skew makes the p25 and p50 estimates collapse onto the heavy
    // value with a WIDE rank interval — the duplicate case the
    // interval audit exists for
    assert(got(250000L)._1 === 3L)
    assert(got(250000L)._3 - got(250000L)._2 >= 900L)
  }

  test("null values drop") {
    val df = Seq(("g", Some(5L), 1L), ("g", None, 2L), ("g", Some(7L), 3L))
      .toDF("grp", "v", "id")
    val summ = Quantile.summary(df, "grp", "v", "id", 2, 10)
    assert(summ.agg(sum("w")).collect().head.getLong(0) === 2L)
  }

  test("knob guards") {
    val df = Seq(("g", 1L, 1L)).toDF("grp", "v", "id")
    intercept[IllegalArgumentException](
      Quantile.summary(df, "grp", "v", "id", 1, 10))
    intercept[IllegalArgumentException](
      Quantile.summary(df, "grp", "v", "id", 8, 1))
    intercept[IllegalArgumentException](
      Quantile.estimate(df.limit(0), df, "grp", "v", Seq(0L), 8, 10))
  }
}
