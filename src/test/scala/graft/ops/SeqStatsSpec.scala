package graft.ops

import graft.SparkSpec

/** X136 digram conditional entropy + X137 exact KS drift: hand-worked
  * lanes, the loop-detection property unigram entropy misses, and
  * randomized naive replays in driver-side Scala.
  */
class SeqStatsSpec extends SparkSpec {

  import spark.implicits._

  // ---- x136 ----

  private def digram(rows: Seq[(Long, String)]) =
    TextAnalysis.digramEntropy(rows.toDF("doc_id", "text"),
      "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  /** The lanes replayed naively: codepoint bigrams, per-count
    * product-round terms (HALF_UP — the Spark/DuckDB seam), clamp, div.
    */
  private def naiveDigram(rows: Seq[(Long, String)]) = rows
    .filter(_._2 != null).map { case (id, t) =>
      val cs = t.toCharArray.map(_.toString).toSeq // test data is BMP
      val m = math.max(cs.size - 1, 0)
      def lane(keys: Seq[String]): Long =
        keys.groupBy(identity).values.map { g =>
          val c = g.size.toLong
          BigDecimal(math.log(c.toDouble) * c * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
      val s2 = lane(cs.sliding(2).filter(_.size == 2)
        .map(_.mkString(" ")).toSeq)
      val s1 = lane(cs.dropRight(1))
      (id, m.toLong, s1, s2,
        if (m == 0) 0L else math.max(s1 - s2, 0L) / m)
    }.sortBy(_._1)

  test("loops are invisible to unigram entropy but zero conditional " +
    "entropy; hand lanes match the naive replay") {
    val rows = Seq(
      (1L, "ababababab"), // pure loop: H(Y|X) = 0, unigram H = ln 2
      (2L, "abacadae"),   // 'a' precedes 4 DIFFERENT successors:
                          // genuinely unpredictable given the predecessor
      (3L, "aaaa"),       // constant: both entropies 0
      (4L, "x"),          // too short: zero row
      (5L, ""),           // empty: zero row
      (6L, "abcdefghij")) // unique predecessors: Y|X deterministic -> 0
    val got = digram(rows)
    assert(got === naiveDigram(rows))
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._5 === 0L) // the loop signature
    assert(byId(2L)._5 > 0L)
    assert(byId(3L)._5 === 0L)
    assert(byId(6L)._5 === 0L)
    assert(byId(4L) === ((4L, 0L, 0L, 0L, 0L)))
    assert(byId(5L) === ((5L, 0L, 0L, 0L, 0L)))
    // the unigram signal CANNOT separate 1 from 2-letters-random:
    // its entropy for "abab..." is maximal over {a, b}
    val uni = TextAnalysis.charEntropy(rows.toDF("doc_id", "text"),
      "doc_id", "text").filter($"doc_id" === 1L).collect()(0)
    assert(uni.getAs[Long]("norm_ppm") >= 999000L) // ~1.0 of ln(2)
  }

  test("randomized naive replay over mixed loop/noise corpora") {
    val rnd = new scala.util.Random(901)
    val rows = (1L to 80L).map { id =>
      val t = rnd.nextInt(4) match {
        case 0 => Seq.fill(2 + rnd.nextInt(20))("ab").mkString
        case 1 => (0 until rnd.nextInt(30))
          .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
        case 2 => ""
        case _ => (0 until 1 + rnd.nextInt(15))
          .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      }
      (id, t)
    }
    assert(digram(rows) === naiveDigram(rows))
  }

  // ---- x137 ----

  private def ks(rows: Seq[(String, Long)]) =
    CorpusStats.ksDrift(rows.toDF("grp", "v"), "grp", "v")
      .orderBy("grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq

  private def naiveKs(rows: Seq[(String, Long)]) = {
    val pool = rows.map(_._2).sorted
    val pts = pool.distinct
    rows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._2)
      val (ns, np) = (BigInt(vs.size), BigInt(pool.size))
      val cands = pts.map { p =>
        val cross = (BigInt(vs.count(_ <= p)) * np -
          BigInt(pool.count(_ <= p)) * ns).abs
        (cross, p)
      }
      val best = cands.maxBy(c => (c._1, -c._2))
      (g, vs.size.toLong, (best._1 * 1000000 / (ns * np)).toLong, best._2)
    }.toSeq.sortBy(_._1)
  }

  test("KS: identical slice has D = 0; a shifted slice peaks at the " +
    "shift boundary; hand fixture matches the naive replay") {
    // s1 mirrors the pool shape; s2 sits entirely above s3
    val rows = Seq.tabulate(10)(i => ("s1", (i % 5 + 1).toLong)) ++
      Seq.tabulate(10)(i => ("s2", (i % 5 + 11).toLong)) ++
      Seq.tabulate(10)(i => ("s3", (i % 5 + 1).toLong))
    val got = ks(rows)
    assert(got === naiveKs(rows))
    val byG = got.map(r => r._1 -> r).toMap
    // s1 == s3 and together 2/3 of the pool in [1,5]: both drift from
    // the pooled mixture by exactly 1/3 at the boundary value 5
    assert(byG("s1")._3 === 333333L && byG("s1")._4 === 5L)
    assert(byG("s3") === byG("s1").copy(_1 = "s3"))
    // s2 diverges maximally: 2/3 of the pool is <= 5 where s2 has 0
    assert(byG("s2")._3 === 666666L && byG("s2")._4 === 5L)
  }

  test("randomized naive replay over skewed length distributions") {
    val rnd = new scala.util.Random(77)
    val rows = (0 until 300).map { _ =>
      val g = s"s${rnd.nextInt(5)}"
      val v = if (g == "s3") 50L + rnd.nextInt(20)
      else (rnd.nextInt(40) + 1).toLong
      (g, v)
    }
    assert(ks(rows) === naiveKs(rows))
    // the deliberately shifted group carries the largest drift
    val got = ks(rows).map(r => r._1 -> r._3).toMap
    assert(got("s3") === got.values.max)
  }
}
