package graft.ops

import graft.SparkSpec

/** X66 waterfilling + materialization pinned on hand tables: every
  * branch (all-capped, none-capped with remainder, mixed), exact budget
  * conservation, and select() against a naive in-test reference that
  * replays the md5 admission order.
  */
class UniMaxSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(counts: Seq[(String, Long)], b: Long, e: Long) =
    UniMax.allocate(counts.toDF("lang", "lang_tokens"), "lang", b, e)
      .as[(String, Long, Boolean, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4))).toMap

  test("budget dwarfing the corpus caps every language at maxEpochs") {
    val out = alloc(Seq("a" -> 10L, "b" -> 20L), b = 1000L, e = 3L)
    assert(out("a") === ((true, 30L)))
    assert(out("b") === ((true, 60L)))
  }

  test("no caps: equal integer shares, remainder to the smallest langs") {
    val out = alloc(Seq("a" -> 100L, "b" -> 100L, "c" -> 100L),
      b = 35L, e = 1L)
    assert(out("a") === ((false, 12L))) // 35 div 3 = 11, remainder 2
    assert(out("b") === ((false, 12L))) // goes to the two smallest by
    assert(out("c") === ((false, 11L))) // (tokens, lang) order
    assert(out.values.map(_._2).sum === 35L) // exact conservation
  }

  test("mixed: contiguous capped prefix, leftover to the rest") {
    val out = alloc(Seq("a" -> 5L, "b" -> 10L, "c" -> 100L),
      b = 60L, e = 2L)
    assert(out("a") === ((true, 10L)))  // 10*3 = 30 <= 60
    assert(out("b") === ((true, 20L)))  // 20*2 = 40 <= 50
    assert(out("c") === ((false, 30L))) // leftover after 30 capped
  }

  test("select: full epochs + greedy md5-prefix partial epoch, equal " +
    "to the naive reference") {
    val seed = "s66"
    val docs = (
      (1 to 4).map(i => (i.toLong, "a", "w1 w2 w3")) ++
      (5 to 10).map(i => (i.toLong, "b", "v1 v2 v3 v4 v5"))
    ).toDF("doc_id", "lang", "text")
    // caps at E=2: a=24, b=60; 24*2=48 > 40 -> none capped; share 20
    // each. a: e_full = 20 div 12 = 1, partial 8; b: e_full 0, partial 20
    val got = UniMax.select(docs, "doc_id", "lang", "text",
        budgetTokens = 40L, maxEpochs = 2L, seed = seed)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    def naive(ids: Seq[Long], tok: Long, eFull: Long, partial: Long) = {
      var cum = 0L
      ids.sortBy(id => (md5hex(id.toString + seed), id)).flatMap { id =>
        val r = eFull + (if (cum < partial) 1L else 0L)
        val row = id -> ((cum, r)); cum += tok
        if (r > 0) Some(row) else None
      }
    }
    val want = (naive(1L to 4L, 3L, 1L, 8L) ++
      naive(5L to 10L, 5L, 0L, 20L)).toMap
    assert(got === want)
    // shape sanity: a keeps all 4 docs (3 at repeats 2), b keeps the
    // 4-doc greedy prefix at repeats 1
    assert(got.count { case (id, (_, r)) => id <= 4 && r == 2L } === 3)
    assert(got.count { case (id, (_, r)) => id <= 4 && r == 1L } === 1)
    assert(got.count { case (id, (_, r)) => id >= 5 && r == 1L } === 4)
  }
}
