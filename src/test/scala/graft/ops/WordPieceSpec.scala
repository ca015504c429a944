package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** X90 WordPiece: likelihood scoring (hand-checked integer scores and
  * the contrast with BPE's frequency pick), '##' positional
  * invariants, the greedy fold, deterministic ties, and the guards.
  */
class WordPieceSpec extends SparkSpec {

  import spark.implicits._

  private def docs(text: String): DataFrame = Seq(text).toDF("text")

  test("likelihood beats raw frequency — the trainer differs from BPE") {
    // (a,##b) occurs 10x but 'a' is common standalone (90x more):
    //   score = 10e12 / (100 * 10) = 1e10
    // (x,##y) occurs only 5x but its symbols occur nowhere else:
    //   score = 5e12 / (5 * 5) = 2e11
    val corpus = docs((Seq.fill(10)("ab") ++ Seq.fill(90)("a") ++
      Seq.fill(5)("xy")).mkString(" "))
    val (merges, _) = WordPiece.train(corpus, "text", 1)
    assert(merges.head.a === "x" && merges.head.b === "##y")
    assert(merges.head.score === 200000000000L)
    assert(merges.head.cnt === 5L)
    // BPE on the same corpus picks the merely-frequent pair
    val (bpe, _) = Bpe.train(corpus, "text", 1)
    assert(bpe.head.a === "a" && bpe.head.b === "b")
  }

  test("greedy non-overlapping fold and hand-checked scores (aaa)") {
    // "aaa" x4: syms [a, ##a, ##a]; counts a=4, ##a=8
    //   score(a,##a)   = 4e12/(4*8)  = 125000000000  <- winner
    //   score(##a,##a) = 4e12/(8*8)  =  62500000000
    // fold: [a,##a,##a] -> [aa, ##a] (the merged tail may not re-merge)
    val (merges, fin) = WordPiece.train(docs("aaa aaa aaa aaa"),
      "text", 1)
    assert(merges === Seq(WordPiece.Merge(1, "a", "##a",
      125000000000L, 4L)))
    val syms = fin.select("syms").as[Seq[String]].collect().head
    assert(syms === Seq("aa", "##a"))
  }

  test("positional invariants and deterministic tie-break (abc)") {
    // "abc" x3: both pairs score 3e12/9; tie breaks on a asc, and
    // '##b' < 'a' lexicographically, so round 1 merges (##b,##c) into
    // '##bc' (continuation preserved), round 2 (a,##bc) into 'abc'
    val (merges, fin) = WordPiece.train(docs("abc abc abc"), "text", 2)
    assert(merges.map(m => (m.a, m.b)) ===
      Seq(("##b", "##c"), ("a", "##bc")))
    assert(merges.forall(_.b.startsWith("##")),
      "right symbol must always be a continuation")
    assert(merges.forall(_.score === 333333333333L))
    assert(fin.select("syms").as[Seq[String]].collect().head ===
      Seq("abc"))
  }

  test("vocab lists final pieces freq-weighted") {
    val (_, fin) = WordPiece.train(docs("aaa aaa aaa aaa"), "text", 1)
    val v = WordPiece.vocab(fin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v === Map("aa" -> 4L, "##a" -> 4L))
  }

  test("guards: iters >= 1 and loud pair exhaustion") {
    intercept[IllegalArgumentException](
      WordPiece.train(docs("a b"), "text", 0))
    val e = intercept[IllegalArgumentException](
      WordPiece.train(docs("a b c"), "text", 1))
    assert(e.getMessage.contains("no adjacent pairs"))
  }
}
