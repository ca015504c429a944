package graft.ops

import graft.SparkSpec

/** X86 unigram-LM (Viterbi hard-EM): agreement with a driver-side
  * reference over seed and EM rounds, the longest-piece tie-break, the
  * zero-count pruning closure, and the loud guards.
  */
class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  private val P = 4

  /** Driver-side reference: identical seed, costs, DP scan order. */
  private def refTrain(text: Seq[String], topMulti: Int,
                       iters: Int): Map[String, (Long, Long)] = {
    val words = text.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    def spans: Map[String, Long] = {
      val m = collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, f) <- words; s <- 0 until w.length;
           e <- s until math.min(w.length, s + P))
        m(w.substring(s, e + 1)) += f
      m.toMap
    }
    def reweight(counts: Map[String, Long]): Map[String, (Long, Long)] = {
      val tot = counts.values.sum
      counts.map { case (p, c) =>
        p -> (c, math.round(math.log(tot.toDouble / c.toDouble) * 1e6))
      }
    }
    val sp = spans
    val singles = sp.filter(_._1.length == 1)
    val multis = sp.filter(_._1.length >= 2).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(topMulti)
    var vocab = reweight(singles ++ multis)
    for (_ <- 1 to iters) {
      val counts = collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      for ((w, f) <- words; p <- viterbi(w, vocab.map { case (k, v) => k -> v._2 }))
        counts(p) += f
      vocab = reweight(counts.toMap)
    }
    vocab
  }

  /** DP with the pinned scan: s ascending (longest piece first),
    * replace only on strictly smaller cost.
    */
  private def viterbi(w: String, cost: Map[String, Long]): Seq[String] = {
    val dp = Array.fill[Option[(Long, List[String])]](w.length + 1)(None)
    dp(0) = Some((0L, Nil))
    for (i <- 1 to w.length) {
      var best: Option[(Long, List[String])] = None
      for (s <- math.max(1, i - P + 1) to i) {
        val piece = w.substring(s - 1, i)
        (dp(s - 1), cost.get(piece)) match {
          case (Some((c0, ps)), Some(pc)) =>
            val cand = (c0 + pc, ps :+ piece)
            if (best.isEmpty || cand._1 < best.get._1) best = Some(cand)
          case _ =>
        }
      }
      dp(i) = best
    }
    dp(w.length).get._2
  }

  private def got(text: Seq[String], topMulti: Int,
                  iters: Int): Map[String, (Long, Long)] =
    UnigramLm.train(
        text.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"),
        "text", maxPieceLen = P, topMulti = topMulti, emIters = iters)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("matches the driver-side reference over two EM rounds") {
    val text = Seq("the cat sat on the mat", "the bat and the cat",
      "on and on and on", "mat bat cat the")
    assert(got(text, topMulti = 8, iters = 2) ===
      refTrain(text, topMulti = 8, iters = 2))
  }

  test("EM prunes pieces no segmentation uses, and stays covered") {
    val text = Seq("aaab aaab aaab ab b")
    val v1 = got(text, topMulti = 6, iters = 1)
    val v3 = got(text, topMulti = 6, iters = 3)
    assert(v3 === refTrain(text, topMulti = 6, iters = 3))
    // pruning is monotone: later vocabularies are subsets of round 1's
    assert(v3.keySet.subsetOf(v1.keySet))
    // coverage floor: every corpus word still segments (train would
    // have raised otherwise); the dominant 'aaab' word keeps its pieces
    assert(v3.keySet.exists(p => "aaab".contains(p)))
  }

  test("cost ties break to the longest piece (the pinned DP scan)") {
    // vocab where 'ab' and a+b tie exactly: cost('ab') = cost('a') +
    // cost('b') forces the s-ascending strict-< scan to keep 'ab'
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", 1L, 500000L), ("b", 1L, 500000L),
      ("ab", 1L, 1000000L)).toDF("piece", "cnt", "cost")
    val seg = UnigramLm.viterbiPieces(words, vocab, P)
      .select("pieces").as[Seq[String]].collect().head
    assert(seg === Seq("ab"), "equal-cost paths must keep the longest piece")
  }

  test("a word with a character outside the vocabulary raises in-plan") {
    val words = Seq(("az", 1L)).toDF("word", "freq")
    val vocab = Seq(("a", 1L, 1000L)).toDF("piece", "cnt", "cost")
    val e = intercept[Exception](
      UnigramLm.viterbiPieces(words, vocab, P).collect())
    assert(e.getMessage.contains("not coverable"))
  }

  test("kilobyte words and bad parameters are loud") {
    val long = Seq((1L, "x" * (UnigramLm.MaxWordLen + 1)))
      .toDF("doc_id", "text")
    val e = intercept[Exception](
      UnigramLm.train(long, "text", P, 8, 1).collect())
    assert(e.getMessage.contains("longer than"))
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](UnigramLm.train(df, "text", 1, 8, 1))
    intercept[IllegalArgumentException](UnigramLm.train(df, "text", P, 0, 1))
    intercept[IllegalArgumentException](UnigramLm.train(df, "text", P, 8, 0))
  }

  test("docTokenCounts matches a per-word DP replay") {
    val docs = Seq((1L, "the cat"), (2L, "the the mat"))
      .toDF("doc_id", "text")
    val vocab = UnigramLm.train(docs, "text", P, 6, 1)
    val vmap = vocab.collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exp = Map(
      1L -> (viterbi("the", vmap).size + viterbi("cat", vmap).size).toLong,
      2L -> (2 * viterbi("the", vmap).size + viterbi("mat", vmap).size).toLong)
    val gotCounts = UnigramLm.docTokenCounts(docs, "doc_id", "text", vocab, P)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCounts === exp)
  }
}
