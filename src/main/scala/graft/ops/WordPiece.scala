package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X90 — WordPiece merge training (Schuster & Nakajima 2012; the BERT
  * tokenizer of Devlin et al. 2019), the third trainer in the
  * tokenizer family: BPE's loop (x44) with the pair picked each round
  * by LIKELIHOOD gain, score = cnt(ab) / (cnt(a)·cnt(b)), instead of
  * raw pair frequency — the pair whose merge most increases a unigram
  * LM's corpus likelihood, so rare-but-always-together symbols beat
  * merely-common ones.
  *
  * Symbols carry BERT's positional identity: a word's first character
  * is an initial symbol, every later one is a continuation marked
  * '##', and merging (a, b) yields a + b-without-'##' (position of
  * `a` is preserved; `b` is by construction a continuation — asserted
  * loudly). Initial "x" and continuation "##x" are DIFFERENT symbols
  * with different counts, exactly as in the published tokenizer.
  *
  * Determinism (the x37/x44 replay-from-data discipline): the score is
  * quantized to an exact integer — cnt·10^12 integer-divided by
  * ca·cb, both sides computed in the 38-digit lane (DECIMAL(38,0)
  * here, HUGEINT in the oracle) so no product overflows — and ties
  * break lexicographically on (a, b); merges apply with the x44 greedy
  * left-to-right non-overlapping fold (a merged tail never re-merges
  * in-round: a + strip(b) != a because strip(b) is nonempty). The
  * DuckDB oracle unrolls every round from the data.
  *
  * Shape at 100 TB is the x44 contract verbatim: the corpus pays ONE
  * token explode into the word-TYPE table; each round is two map-side-
  * combined aggregations over types (symbol counts, adjacent-pair
  * counts), a broadcast-sized score join, a 1-row driver argmax, and a
  * row-local fold rewrite. The trained merge table is the kilobyte
  * artifact you persist.
  */
object WordPiece {

  final case class Merge(r: Int, a: String, b: String, score: Long,
                         cnt: Long)

  /** (word, freq, syms): word types with '##'-marked continuation
    * symbols. Empty tokens drop on both engine and oracle sides.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> " +
          "IF(i = 1, substring(word, 1, 1), " +
          "concat('##', substring(word, i, 1))))"))

  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Train `iters` likelihood-scored merges; returns the merge table
    * and the final (word, freq, syms) table. Fails loudly if the
    * corpus runs out of adjacent pairs (the unrolled oracle cannot
    * express an early stop, so neither may the engine).
    */
  def train(docs: DataFrame, textCol: String,
            iters: Int): (Seq[Merge], DataFrame) = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to iters) {
      // this round's symbol counts — over ALL words (a single-symbol
      // word still contributes its symbol's denominator count)
      val symCnt = words
        .select(col("freq"), explode(col("syms")).as("sym"))
        .groupBy(col("sym")).agg(sum(col("freq")).as("c"))
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .join(symCnt.select(col("sym").as("a"), col("c").as("ca")),
          Seq("a"))
        .join(symCnt.select(col("sym").as("b"), col("c").as("cb")),
          Seq("b"))
        // 38-digit lane: cnt*10^12 can pass 2^63 and ca*cb squares the
        // token count; `div` reseats the quantized score in BIGINT
        .select(col("a"), col("b"), col("cnt"), expr(
          "CAST(cnt AS DECIMAL(38,0)) * 1000000000000 div " +
            "(CAST(ca AS DECIMAL(38,0)) * CAST(cb AS DECIMAL(38,0)))")
          .as("score"))
        .orderBy(col("score").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"corpus has no adjacent pairs left at round $r — lower iters")
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      require(b.startsWith("##"),
        s"round $r right symbol '$b' is not a continuation — " +
          "the positional invariant broke")
      merges += Merge(r, a, b, top(0).getLong(3), top(0).getLong(2))
      val (ea, eb, eab) = (sqlLit(a), sqlLit(b), sqlLit(a + b.substring(2)))
      val prev = words
      words = words.withColumn("syms", expr(
        s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
           |  IF(size(acc) > 0 AND element_at(acc, -1) = '$ea' AND x = '$eb',
           |     concat(slice(acc, 1, size(acc) - 1), array('$eab')),
           |     concat(acc, array(x))))""".stripMargin))
        .localCheckpoint()
      // RDD-level release: Dataset.unpersist is a no-op on checkpoint
      // pins (see graft.ops.Pins) — only the latest round stays pinned
      Pins.release(prev)
    }
    (merges.result(), words)
  }

  def mergeTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF("r", "a", "b", "score", "cnt")
  }

  /** The learned subword inventory after training: every final symbol
    * with its freq-weighted occurrence count — initial pieces plain,
    * continuations '##'-marked, merged pieces included.
    */
  def vocab(finalWords: DataFrame): DataFrame =
    finalWords.select(col("freq"), explode(col("syms")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
}
