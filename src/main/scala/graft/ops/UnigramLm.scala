package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X86 — Unigram-LM tokenizer training (Kudo 2018, arXiv:1804.10959;
  * the SentencePiece unigram model): the field-standard alternative to
  * BPE ([[Bpe]], x44). Where BPE GROWS a vocabulary bottom-up by
  * merging, unigram-LM starts from an over-complete seed vocabulary of
  * substrings and refines piece probabilities by EM, re-segmenting the
  * corpus each round under the current piece costs.
  *
  * This is the VITERBI (hard-EM) variant: the E-step segments every
  * word type with the 1-best (minimum total cost) segmentation rather
  * than lattice expectations, and the M-step recounts pieces over those
  * segmentations — Kudo's own sampling/n-best machinery degrades to
  * exactly this at n=1, and hard EM is what keeps every quantity an
  * EXACT INTEGER (the replay-from-data oracle discipline, x37/x44):
  * piece costs are micro-nat BIGINTs `round(ln(total/cnt)·10^6)` (the
  * NB discipline — the one rounded ln per piece per round; all
  * accumulation after it is integer addition), so the argmin
  * segmentation is bit-deterministic on any engine.
  *
  * DETERMINISM: the DP scans split points `s` ascending (longest piece
  * first) and replaces the incumbent only on STRICTLY smaller cost, so
  * cost ties break to the longest piece, then to the earlier split —
  * fixed on both the engine and the DuckDB oracle, which replays the
  * identical fold over a separator-encoded string (the x44 pattern).
  *
  * PRUNING comes free: a piece that wins no Viterbi segmentation
  * counts zero and drops from the next round's vocabulary. This is
  * closed over a fixed corpus — every word's own best pieces survive
  * by construction, so coverage can never be lost (the seed's
  * all-single-chars floor guarantees round-1 coverage; round r's
  * vocabulary covers everything round r−1 segmented).
  *
  * THE SCALE DESIGN IS THE WORD-TYPE TABLE (the x44 contract): the
  * corpus is scanned once into (word, freq); every EM round is (a) one
  * row-local Viterbi DP over word types (O(len·maxPieceLen) per type)
  * against a BROADCAST piece-cost map — the map is in-plan (a 1-row
  * `map_from_entries` aggregate), never a driver collect, and its size
  * is bounded by the seed (distinct chars + topMulti, capped loudly) —
  * (b) one map-side-combined piece-count aggregation, vocabulary-sized,
  * and (c) a 1-row total. At 100 TB the corpus contributes one token
  * explode; the loop never touches it again, and the trained piece
  * table is the kilobyte artifact you persist.
  */
object UnigramLm {

  /** Hard caps that keep the broadcast map and the DP honest: the map
    * must stay dimension-table-sized, and the DP cost is len·maxPieceLen
    * per word type — a corpus with kilobyte "words" means the tokenizer
    * upstream is broken, so fail loudly instead of grinding.
    */
  val MaxTopMulti = 100000
  val MaxWordLen = 64

  /** (word, freq) word-type table with the in-plan length guard. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("word",
        when(length(col("word")) > MaxWordLen,
          raise_error(concat(lit(s"unigramLm: word longer than $MaxWordLen " +
            "chars — pre-tokenize or raise MaxWordLen: "), col("word"))))
          .otherwise(col("word")))

  /** Micro-nat piece costs from counts: ONE rounded ln per piece, all
    * downstream arithmetic integer. Shared by the seed and every round.
    */
  private def reweight(pieceCounts: DataFrame): DataFrame =
    pieceCounts
      .crossJoin(broadcast(pieceCounts.agg(sum(col("cnt")).as("tot"))))
      .select(col("piece"), col("cnt"),
        expr("CAST(round(ln(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)) " +
          "* 1000000) AS BIGINT)").as("cost"))

  /** Over-complete seed: ALL single characters (the coverage floor)
    * plus the `topMulti` most frequent substrings of length
    * 2..maxPieceLen, occurrence-weighted, ties to the lexicographically
    * lower piece. The top-k is a TakeOrdered over the substring-count
    * table, never a global sort.
    */
  def seedVocab(words: DataFrame, maxPieceLen: Int,
                topMulti: Int): DataFrame = {
    require(maxPieceLen >= 2 && maxPieceLen <= 16,
      s"maxPieceLen $maxPieceLen out of [2, 16]")
    require(topMulti >= 1 && topMulti <= MaxTopMulti,
      s"topMulti $topMulti out of [1, $MaxTopMulti] (bounds the broadcast map)")
    val spans = words.select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
           |  transform(sequence(s, least(length(word), s + ${maxPieceLen - 1})),
           |    e -> substring(word, s, e - s + 1))))""".stripMargin))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
    val singles = spans.filter(length(col("piece")) === 1)
    val multis = spans.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(topMulti)
    reweight(singles.unionByName(multis))
  }

  /** The Viterbi DP as one row-local SQL fold: dp[k] = best (cost,
    * pieces) over the k−1-char prefix; position i considers split
    * points s in [i−maxPieceLen+1, i] ASCENDING (longest piece first),
    * keeping the incumbent on ties. An unreachable final state (a char
    * outside the vocabulary) raises in-plan.
    */
  private def dpExpr(maxPieceLen: Int): String = {
    val nullS = "CAST(NULL AS struct<cost: bigint, pieces: array<string>>)"
    s"""aggregate(
       |  sequence(1, length(word)),
       |  CAST(array(named_struct('cost', CAST(0 AS BIGINT),
       |         'pieces', CAST(array() AS array<string>)))
       |    AS array<struct<cost: bigint, pieces: array<string>>>),
       |  (dp, i) -> concat(dp, array(
       |    aggregate(
       |      transform(sequence(greatest(1, i - ${maxPieceLen - 1}), i), s ->
       |        IF(element_at(vmap, substring(word, s, i - s + 1)) IS NULL
       |           OR element_at(dp, s) IS NULL,
       |           $nullS,
       |           named_struct(
       |             'cost', element_at(dp, s).cost
       |               + element_at(vmap, substring(word, s, i - s + 1)),
       |             'pieces', concat(element_at(dp, s).pieces,
       |               array(substring(word, s, i - s + 1)))))),
       |      $nullS,
       |      (b, c) -> CASE WHEN c IS NULL THEN b
       |                     WHEN b IS NULL THEN c
       |                     WHEN c.cost < b.cost THEN c ELSE b END))))""".stripMargin
  }

  /** Segment every word type under `vocab` (piece, cost): returns
    * (word, freq, pieces, cost). The cost map rides in-plan as a 1-row
    * broadcast — bounded by the seed caps, never a driver collect.
    */
  def viterbiPieces(words: DataFrame, vocab: DataFrame,
                    maxPieceLen: Int): DataFrame = {
    val vmap = vocab.agg(map_from_entries(
      collect_list(struct(col("piece"), col("cost")))).as("vmap"))
    words.crossJoin(broadcast(vmap))
      .withColumn("seg", expr(
        s"element_at(${dpExpr(maxPieceLen)}, length(word) + 1)"))
      .withColumn("seg", when(col("seg").isNull,
        raise_error(concat(lit("unigramLm: word not coverable by the " +
          "vocabulary (missing character?): "), col("word"))))
        .otherwise(col("seg")))
      .select(col("word"), col("freq"),
        col("seg.pieces").as("pieces"), col("seg.cost").as("cost"))
  }

  /** Train: seed, then `emIters` Viterbi-EM rounds. Returns the final
    * (piece, cnt, cost) table — cnt is the round's occurrence-weighted
    * piece count, cost its micro-nat negative log-probability. Each
    * round's vocabulary is pinned eagerly (tiny — the x44 constant-size
    * -plan discipline); the word-type table is pinned once.
    */
  def train(docs: DataFrame, textCol: String, maxPieceLen: Int,
            topMulti: Int, emIters: Int): DataFrame = {
    require(emIters >= 1, s"emIters must be >= 1: $emIters")
    val words = wordTable(docs, textCol).localCheckpoint()
    var vocab = seedVocab(words, maxPieceLen, topMulti).localCheckpoint()
    for (_ <- 1 to emIters) {
      val counts = viterbiPieces(words, vocab, maxPieceLen)
        .select(col("freq"), explode(col("pieces")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("freq")).as("cnt"))
      val prev = vocab
      vocab = reweight(counts).localCheckpoint()
      Pins.release(prev) // Dataset.unpersist is a no-op on checkpoint pins
    }
    vocab
  }

  /** Per-document token count under a trained vocabulary: the DP runs
    * once per DISTINCT word type; the corpus pays one token explode and
    * one equi-join against that vocabulary-sized map (AQE broadcasts
    * it) — the [[Bpe.docTokenCounts]] shape, for the x77 fertility
    * audit against BPE.
    */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     vocab: DataFrame, maxPieceLen: Int): DataFrame = {
    val base = docs.select(col(idCol),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val types = wordTable(docs, textCol)
    val perType = viterbiPieces(types, vocab, maxPieceLen)
      .select(col("word"), size(col("pieces")).cast("long").as("n_piece"))
    base.join(perType, Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("n_piece")).as("n_tokens"))
  }
}
