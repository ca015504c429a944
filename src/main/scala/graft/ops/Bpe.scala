package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X44 — BPE merge training (Sennrich et al. 2016, arXiv:1508.07909):
  * `iters` rounds of merge-the-most-frequent-adjacent-symbol-pair over
  * the corpus, the missing *training* half of `x3_token_count`'s
  * "BPE-ish" heuristic. Ties break to the lexicographically lower
  * (a, b) pair, merges apply greedily left-to-right and
  * non-overlapping — both deterministic, so the whole training replays
  * from the data alone (the x37 replay-from-data oracle discipline).
  *
  * THE SCALE DESIGN IS THE WORD-TYPE TABLE: like the reference BPE
  * implementation, training operates on (word, freq) — vocabulary-sized,
  * not corpus-sized. The corpus is scanned ONCE to build it; every round
  * after that is (a) one map-side-combined pair-count aggregation over
  * word types, (b) a 1-row driver argmax, (c) a row-local rewrite of the
  * symbol arrays. At 100 TB the corpus contributes one token explode;
  * the loop's cost is bounded by vocabulary cardinality (~10^6), and the
  * trained merge table is the kilobyte artifact you persist.
  *
  * The rewrite is a left fold (`aggregate` HOF): append each symbol,
  * but when the accumulator ends with `a` and the next symbol is `b`,
  * replace that tail with the merged symbol. Because merged(a,b) != a
  * (b is nonempty), a freshly merged tail can never re-merge with the
  * following symbol in the same round — exactly greedy non-overlapping
  * left-to-right semantics. The DuckDB oracle runs the IDENTICAL fold
  * as a `list_reduce` over a separator-encoded string; `BpeSpec` pins
  * the overlap cases ("aaa" -> [aa, a]) by hand.
  */
object Bpe {

  final case class Merge(r: Int, a: String, b: String, cnt: Long)

  /** (word, freq, syms) base table: corpus word types with occurrence
    * counts and initial single-character symbol arrays. Empty tokens
    * (double spaces) are dropped on both the engine and oracle sides.
    */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("syms",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** Train `iters` merges; returns the merge table and the final
    * (word, freq, syms) table. Fails loudly if the corpus runs out of
    * adjacent pairs before `iters` rounds (the unrolled oracle cannot
    * express an early stop, so neither may the engine).
    */
  def train(docs: DataFrame, textCol: String,
            iters: Int): (Seq[Merge], DataFrame) = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    var words = wordTable(docs, textCol).localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    for (r <- 1 to iters) {
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), i -> " +
            "struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
          .as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty,
        s"corpus has no adjacent pairs left at round $r — lower iters")
      val (a, b, cnt) = (top(0).getString(0), top(0).getString(1),
        top(0).getLong(2))
      merges += Merge(r, a, b, cnt)
      val (ea, eb, eab) = (sqlLit(a), sqlLit(b), sqlLit(a + b))
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
    merges.toDF("r", "a", "b", "cnt")
  }

  /** X54 — ENCODE text under a trained merge table, the downstream use
    * of [[train]]'s artifact: every word starts as single characters and
    * the R merges apply IN RANK ORDER, each with the same greedy
    * left-to-right non-overlapping fold training used — so a word seen
    * at train time reproduces its training segmentation exactly, and an
    * UNSEEN word still segments deterministically from its characters
    * (the property that makes a trained tokenizer portable to new text).
    *
    * Shape at 100 TB: the R-round fold chain runs over the input's
    * DISTINCT word types (vocabulary-sized — each round is one row-local
    * array rewrite, R bounded by the trained vocabulary budget); the
    * corpus itself pays one token posexplode and ONE equi-join against
    * the encoded vocabulary (AQE broadcasts it) plus the per-doc
    * reassembly aggregation. Output per document: token count and the
    * space-joined token stream in original word order.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[Merge]): DataFrame = {
    require(merges.nonEmpty, "need at least one trained merge")
    val base = docs.select(col(idCol),
        posexplode(split(col(textCol), " ")).as(Seq("p", "word")))
      .filter(length(col("word")) > 0)
    val words = base.select(col("word")).distinct()
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    // checkpoint the vocabulary-sized table every few rounds: without
    // it CollapseProject inlines all R fold expressions into one R-deep
    // nested aggregate(...) and Catalyst falls off the expression-size
    // cliff at realistic merge counts (train() pins every round for the
    // same reason; here one pin per CheckpointEvery rounds suffices —
    // the table is small and each pin cuts the lineage)
    val CheckpointEvery = 8
    val enc = merges.sortBy(_.r).zipWithIndex.foldLeft(words) {
      case (acc, (m, i)) =>
        val (ea, eb, eab) = (sqlLit(m.a), sqlLit(m.b), sqlLit(m.a + m.b))
        val next = acc.withColumn("syms", expr(
          s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
             |  IF(size(acc) > 0 AND element_at(acc, -1) = '$ea' AND x = '$eb',
             |     concat(slice(acc, 1, size(acc) - 1), array('$eab')),
             |     concat(acc, array(x))))""".stripMargin))
        if ((i + 1) % CheckpointEvery == 0) next.localCheckpoint(false)
        else next
    }
    base.join(enc, Seq("word"))
      .groupBy(col(idCol))
      .agg(
        sum(size(col("syms"))).as("n_tokens"),
        concat_ws(" ", flatten(expr(
          "transform(array_sort(collect_list(struct(p, syms))), x -> x.syms)")))
          .as("encoded"))
  }

  /** X77 — tokenizer FERTILITY per language: tokens-per-word and
    * chars-per-token under the trained segmentation, the standard
    * tokenizer-equity audit (Ács 2019; the XLM-R / NLLB tokenizer
    * papers) — a language whose fertility is 2× pays 2× the context
    * budget for the same text, and this table is how you catch that
    * before training.
    *
    * Takes the ALREADY-ENCODED corpus (`enc` = [[encode]]'s output, the
    * x54 artifact — shared, not recomputed) and the raw docs; the op
    * itself is one row-local projection (word/char counts), one
    * id-equi-join, and one per-language aggregation. Ratios are exact
    * integer ppm (`·10^6 div`) — no float seam. Docs with no encodable
    * word (empty after tokenization) drop with the inner join: fertility
    * is defined over encoded text; every surviving language slice has
    * n_words ≥ 1 and n_tokens ≥ 1, so the divisions are total.
    */
  def fertility(docs: DataFrame, enc: DataFrame, idCol: String,
                textCol: String, langCol: String): DataFrame =
    docs.select(col(idCol), col(langCol).as("lang"),
        size(filter(split(col(textCol), " "), w => length(w) > 0))
          .cast("long").as("words"),
        length(col(textCol)).cast("long").as("chars"))
      .join(enc.select(col(idCol), col("n_tokens").as("toks")), Seq(idCol))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).as("n_words"),
        sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"))
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_tokens"),
        col("n_chars"),
        // DECIMAL(38,0) reseat (x55/x58): token sums at 100 TB exceed
        // 2^63/10^6, where bare long multiply would wrap silently while
        // the DuckDB oracle's HUGEINT stays exact
        expr("CAST(CAST(n_tokens AS DECIMAL(38,0)) * 1000000L " +
          "div n_words AS BIGINT)").as("fertility_ppm"),
        expr("CAST(CAST(n_chars AS DECIMAL(38,0)) * 1000000L " +
          "div n_tokens AS BIGINT)").as("chars_per_token_ppm"))

  /** Per-document token count under the trained segmentation: one token
    * explode joined to the vocabulary-sized (word -> symbol count) map
    * (AQE broadcasts it), one per-doc sum.
    */
  def docTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                     words: DataFrame): DataFrame = {
    val n = words.select(col("word"), size(col("syms")).cast("long").as("n_sym"))
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .join(n, Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("n_sym")).as("n_bpe"))
  }
}
