package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X119 sharded continuation — merge-of-shards ≡ single-pass on real
  * vectors, DECIMAL exactness past the single-pass BIGINT cap on hand
  * lanes, the in-plan guards, and training ABTT/isotropy from a merged
  * moment table.
  */
class MomentMergeSpec extends SparkSpec {
  import spark.implicits._

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("mergeMoments over shards reproduces covarianceTable exactly") {
    val emb = (0 until 60).map { i =>
      (i.toLong,
        Seq((i % 7 - 3) * 0.31f, (i % 5 - 2) * 0.17f, (i - 30) * 0.01f))
    }.toDF("vec_id", "embedding")
    val single = Similarity.covarianceTable(emb, "embedding")
      .orderBy("i", "j").collect().toSeq
    val merged = Similarity.mergeMoments(
        Similarity.covarianceMoments(emb, "embedding", col("vec_id") % 4))
      .orderBy("i", "j").collect().toSeq
    assert(merged === single)
  }

  test("mergeMoments cov stays exact past the single-pass BIGINT cap") {
    // two shards of 3e9 rows each: merged n = 6e9 (2000x CovMaxRows),
    // cov numerator g·n ~ 2.1e25 — far outside BIGINT, exact in the
    // DECIMAL(38,0) lane. Expected values from BigInt arithmetic.
    val n1 = 3000000000L
    val n2 = 3000000000L
    val lanes = Seq(
      // (shard, i, j, n, g, s_i, s_j) — g within its 10^6·n bound,
      // s within 10^3·n
      (0L, 1L, 1L, n1, 2000000000000000L, 1200000000000L, 1200000000000L),
      (1L, 1L, 1L, n2, 1500000000000000L, -900000000000L, -900000000000L),
      (0L, 1L, 2L, n1, -700000000000000L, 1200000000000L, 800000000000L),
      (1L, 1L, 2L, n2, 400000000000000L, -900000000000L, 500000000000L),
      (0L, 2L, 2L, n1, 900000000000000L, 800000000000L, 800000000000L),
      (1L, 2L, 2L, n2, 600000000000000L, 500000000000L, 500000000000L))
    val moments = lanes.toDF("shard", "i", "j", "n", "g", "s_i", "s_j")
    val got = Similarity.mergeMoments(moments).orderBy("i", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    val byCell = lanes.groupBy(l => (l._2, l._3))
    byCell.foreach { case (cell, ls) =>
      val n = ls.map(_._4).sum
      val g = ls.map(_._5).sum
      val si = ls.map(_._6).sum
      val sj = ls.map(_._7).sum
      // the engine's arithmetic, replayed: exact integer numerator,
      // one correctly-rounded cast to double, the double division,
      // round-6 HALF_UP
      val num = BigInt(g) * BigInt(n) - BigInt(si) * BigInt(sj)
      assert(num.abs > BigInt(Long.MaxValue),
        s"cell $cell does not actually exercise the >BIGINT regime")
      val cov = BigDecimal(num.toDouble / (n.toDouble * n.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(cell) === ((n, g, si, sj, cov)), s"cell $cell")
    }
    assert(got.keySet === byCell.keySet)
  }

  test("mergeMoments aborts loudly past the lane-exact bound") {
    val over = Similarity.MomentLaneMaxRows / 2 + 1
    val moments = Seq(
      (0L, 1L, 1L, over, 0L, 0L, 0L),
      (1L, 1L, 1L, over, 0L, 0L, 0L))
      .toDF("shard", "i", "j", "n", "g", "s_i", "s_j")
    val e = intercept[Exception] {
      Similarity.mergeMoments(moments).collect()
    }
    assert(messageChain(e).contains("lane-exact bound"),
      messageChain(e))
  }

  test("covarianceMoments aborts loudly on an oversized single shard") {
    // can't build 9e12 real rows — pin the guard's presence by plan
    // text instead: the CASE arm must reference the bound and the
    // raise_error
    val emb = Seq((1L, Seq(1f))).toDF("vec_id", "embedding")
    val plan = Similarity.covarianceMoments(emb, "embedding", lit(0L))
      .queryExecution.analyzed.toString
    assert(plan.contains("raise_error") &&
      plan.contains(Similarity.MomentLaneMaxRows.toString))
  }

  test("covarianceTable's abort points at the implemented continuation") {
    // 1-dim vectors keep the explode cheap: CovMaxRows+1 rows, one cell
    val n = Similarity.CovMaxRows + 1
    val emb = spark.range(n)
      .select(col("id").as("vec_id"), array(lit(0.001f)).as("embedding"))
    val e = intercept[Exception] {
      Similarity.covarianceTable(emb, "embedding").collect()
    }
    val msg = messageChain(e)
    assert(msg.contains("covarianceMoments") && msg.contains("mergeMoments"),
      msg)
  }

  test("isotropy from merged moments past the BIGINT trace aborts " +
    "loudly (DECIMAL lanes carry the value; the cast back is guarded)") {
    // the >BIGINT hand lanes from the merge test, fed through training:
    // the exact trace numerator ~2e25 cannot land in the BIGINT output
    // column — the guard must fire, never a wrapped number
    val n1 = 3000000000L
    val moments = Seq(
      (0L, 1L, 1L, n1, 2000000000000000L, 1200000000000L, 1200000000000L),
      (1L, 1L, 1L, n1, 1500000000000000L, -900000000000L, -900000000000L),
      (0L, 2L, 2L, n1, 900000000000000L, 800000000000L, 800000000000L),
      (1L, 2L, 2L, n1, 600000000000000L, 500000000000L, 500000000000L),
      (0L, 1L, 2L, n1, -700000000000000L, 1200000000000L, 800000000000L),
      (1L, 1L, 2L, n1, 400000000000000L, -900000000000L, 500000000000L))
      .toDF("shard", "i", "j", "n", "g", "s_i", "s_j")
    val merged = Similarity.mergeMoments(moments).localCheckpoint(false)
    val emb = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.isotropy(emb, "embedding", Some(merged)).collect()
    }
    assert(messageChain(e).contains("trace_num exceeds BIGINT"),
      messageChain(e))
  }

  test("abtt refuses when the projection lanes would pass BIGINT") {
    // training succeeds from the merged frame, but the n-scaled
    // centered projection cannot stay integer-exact at n = 6e9 — the
    // in-plan per-row guard fires on execution (zero extra corpus
    // scans), never a wrapped score
    val n1 = 3000000000L
    val moments = Seq(
      (0L, 1L, 1L, n1, 2000000000000000L, 1200000000000L, 1200000000000L),
      (1L, 1L, 1L, n1, 1500000000000000L, -900000000000L, -900000000000L),
      (0L, 2L, 2L, n1, 900000000000000L, 800000000000L, 800000000000L),
      (1L, 2L, 2L, n1, 600000000000000L, 500000000000L, 500000000000L),
      (0L, 1L, 2L, n1, -700000000000000L, 1200000000000L, 800000000000L),
      (1L, 1L, 2L, n1, 400000000000000L, -900000000000L, 500000000000L))
      .toDF("shard", "i", "j", "n", "g", "s_i", "s_j")
    val merged = Similarity.mergeMoments(moments).localCheckpoint(false)
    val emb = Seq((1L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.abtt(emb, "vec_id", "embedding", Some(merged)).collect()
    }
    assert(messageChain(e).contains("exact projection lanes"),
      messageChain(e))
  }

  test("abtt on an empty frame returns empty instead of throwing") {
    val n1 = 3000L
    val moments = Seq(
      (0L, 1L, 1L, n1, 2000000L, 1200L, 1200L),
      (0L, 2L, 2L, n1, 900000L, 800L, 800L),
      (0L, 1L, 2L, n1, -700000L, 1200L, 800L))
      .toDF("shard", "i", "j", "n", "g", "s_i", "s_j")
    val merged = Similarity.mergeMoments(moments).localCheckpoint(false)
    val emb = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(Similarity.abtt(emb, "vec_id", "embedding", Some(merged))
      .collect().isEmpty)
  }

  test("abtt and isotropy train identically from merged moments") {
    val emb = (0 until 40).map { i =>
      val a = (i - 20) * 0.04f
      (i.toLong, Seq(a, a + (i % 3) * 0.01f))
    }.toDF("vec_id", "embedding")
    val merged = Similarity.mergeMoments(
        Similarity.covarianceMoments(emb, "embedding", col("vec_id") % 3))
      .localCheckpoint(false)
    val a1 = Similarity.abtt(emb, "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    val a2 = Similarity.abtt(emb, "vec_id", "embedding", Some(merged))
      .orderBy("vec_id").collect().toSeq
    assert(a2 === a1)
    val i1 = Similarity.isotropy(emb, "embedding").collect().head
    val i2 = Similarity.isotropy(emb, "embedding", Some(merged))
      .collect().head
    assert(i2 === i1)
  }
}
