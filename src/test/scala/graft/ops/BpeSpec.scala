package graft.ops

import graft.SparkSpec

/** X44 BPE training invariants beyond the DuckDB oracle: a corpus whose
  * merge sequence is traced by hand below, greedy-overlap semantics,
  * tie-breaking, frequency weighting, and the exhaustion guard.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], iters: Int) = {
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val (merges, words) = Bpe.train(docs, "text", iters)
    (merges, words, docs)
  }

  test("hand-traced merge sequence on a two-word corpus") {
    // corpus: "abab abab abc" -> word types: abab freq 2, abc freq 1.
    // round 1 pairs: (a,b) 2*2+1=5, (b,a) 2, (b,c) 1 -> merge (a,b), 5
    //   abab -> [ab, ab], abc -> [ab, c]
    // round 2 pairs: (ab,ab) 2, (ab,c) 1 -> merge (ab,ab), 2
    //   abab -> [abab], abc unchanged
    // round 3 pairs: (ab,c) 1 -> merge (ab,c), 1
    val (merges, words, _) = train(Seq("abab abab abc"), iters = 3)
    assert(merges === Seq(
      Bpe.Merge(1, "a", "b", 5L),
      Bpe.Merge(2, "ab", "ab", 2L),
      Bpe.Merge(3, "ab", "c", 1L)))
    val syms = words.orderBy("word").select("word", "syms")
      .as[(String, Seq[String])].collect().toSeq
    assert(syms === Seq("abab" -> Seq("abab"), "abc" -> Seq("abc")))
  }

  test("greedy left-to-right non-overlapping merge: aaa -> [aa, a]") {
    // round 1: (a,a) counted per adjacent slot = 2 in 'aaa'; the merge
    // is non-overlapping greedy, so ONE merge happens, leaving [aa, a]
    val (merges, words, _) = train(Seq("aaa"), iters = 1)
    assert(merges === Seq(Bpe.Merge(1, "a", "a", 2L)))
    val syms = words.select("syms").as[Seq[String]].head()
    assert(syms === Seq("aa", "a"))
  }

  test("count ties break to the lexicographically lower pair") {
    // "ba" and "ac": pairs (b,a) 1 and (a,c) 1 tie -> (a,c) wins
    val (merges, _, _) = train(Seq("ba ac"), iters = 1)
    assert(merges === Seq(Bpe.Merge(1, "a", "c", 1L)))
  }

  test("pair counts weight by word frequency, and doc token counts follow") {
    // "xy" appears 3 times, "yz" once: (x,y) 3 beats (y,z) 1
    val (merges, words, docs) = train(Seq("xy xy yz", "xy"), iters = 1)
    assert(merges === Seq(Bpe.Merge(1, "x", "y", 3L)))
    // doc 0 = [xy][xy][y z] -> 1+1+2 = 4 tokens; doc 1 = [xy] -> 1
    val counts = Bpe.docTokenCounts(docs, "doc_id", "text", words)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(counts === Seq((0L, 4L), (1L, 1L)))
  }

  test("encode reproduces the training segmentation and orders tokens by position") {
    val (merges, _, docs) = train(Seq("abab abab abc"), iters = 2)
    // after rounds (a,b) then (ab,ab): abab -> [abab], abc -> [ab, c]
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((0L, 4L, "abab abab ab c")))
  }

  test("encode segments UNSEEN words from characters with the trained merges") {
    val (merges, _, _) = train(Seq("abab abab abc"), iters = 2)
    // "ababab" never occurred: chars -> (a,b) round gives [ab,ab,ab] ->
    // (ab,ab) round merges greedily left-to-right: [abab, ab];
    // "ba" has no applicable merge and stays [b, a]
    val newDocs = Seq((9L, "ababab ba")).toDF("doc_id", "text")
    val got = Bpe.encode(newDocs, "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((9L, 4L, "abab ab b a")))
  }

  test("encode survives a long merge table (periodic lineage checkpoint)") {
    // 40 merges, most inapplicable — exercises the every-8-rounds
    // checkpoint that keeps the fold from collapsing into one 40-deep
    // nested expression; the applicable prefix still applies in order
    val merges = Bpe.Merge(1, "a", "b", 9L) +: Bpe.Merge(2, "ab", "ab", 5L) +:
      (3 to 40).map(r => Bpe.Merge(r, s"z$r", s"q$r", 1L))
    val got = Bpe.encode(Seq((1L, "ababab ba")).toDF("doc_id", "text"),
      "doc_id", "text", merges)
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 4L, "abab ab b a")))
  }

  test("fertility: exact per-language ppm ratios over a given encoding") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "en", "one two three"), // 3 words, 13 chars
      (2L, "en", "four five"), // 2 words, 9 chars
      (3L, "de", "ein"), // 1 word, 3 chars
      (4L, "de", "") // 0 words: drops (not encodable)
    ).toDF("doc_id", "lang", "text")
    val enc = Seq((1L, 5L), (2L, 3L), (3L, 2L))
      .toDF("doc_id", "n_tokens")
    val got = Bpe.fertility(docs, enc, "doc_id", "text", "lang")
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      // de: 1 doc, 1 word, 2 tokens, 3 chars; 2e6/1; 3e6/2
      ("de", 1L, 1L, 2L, 3L, 2000000L, 1500000L),
      // en: 2 docs, 5 words, 8 tokens, 22 chars; 8e6 div 5; 22e6 div 8
      ("en", 2L, 5L, 8L, 22L, 1600000L, 2750000L)))
  }

  test("running out of pairs before iters fails loudly") {
    val e = intercept[IllegalArgumentException] {
      train(Seq("ab"), iters = 2) // round 1 merges the only pair
    }
    assert(e.getMessage.contains("no adjacent pairs"))
  }
}
