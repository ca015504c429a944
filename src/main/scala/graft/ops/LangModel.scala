package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X26 — n-gram language-model document scoring, the relational form of
  * the CCNet/KenLM perplexity filter: train a bigram model on a
  * reference slice of the corpus (here: the deterministic `train` split,
  * composing with [[Curate.splitAssign]]), then score every document by
  * how probable its bigrams are under that model. Low-probability
  * documents are gibberish/boilerplate candidates; unseen bigrams
  * measure drift from the reference distribution.
  *
  * Model: Laplace-smoothed conditional p(w2|w1) = (c2+1) / (c1+V),
  * where c2 = count of the bigram in the reference, c1 = count of w1 as
  * a token in the reference, V = reference vocabulary size.
  *
  * Determinism: probabilities are held in FIXED-POINT integers —
  * p_fix = (c2+1) * 10^12 div (c1+V) — so per-document sums are exact
  * BIGINT arithmetic with no float-addition-order sensitivity, and the
  * DuckDB oracle reproduces every value bit-for-bit. The conventional
  * log-space perplexity over the same counts is [[logBigramScore]];
  * LangModelSpec checks it against a driver-side Scala reference.
  *
  * Shape at 100 TB: the reference counts are classic one-shuffle
  * aggregations with map-side combine (c2 keyed by bigram, c1 by
  * token); scoring joins the exploded document bigrams to the count
  * tables on their keys — big-big shuffle joins that AQE downgrades to
  * broadcasts when the model is small — and re-aggregates per document.
  * The trained model is the natural persisted artifact of the pipeline:
  * at scale you'd write c1/c2 once and score many corpus versions
  * against them.
  */
object LangModel {

  val Scale: Long = FixedPoint.Scale // 10^12 fixed-point

  /** Bigrams of `textCol` as (id, w1, bg) rows — w1 is the conditioning
    * token. One narrow explode; no shuffle.
    */
  private def bigramRows(docs: DataFrame, idCol: String, textCol: String) = {
    val sh = graft.functions.Shingles.shingles(split(col(textCol), " "), 2)
    docs.select(col(idCol), explode(sh).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
  }

  /** Model counts for a bigram LM trained on `ref`: (c2 per bigram,
    * c1 per conditioning token, 1-row vocab size). Shared by the
    * fixed-point and log-space scorers.
    */
  private def modelCounts(ref: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val c2 = bigramRows(ref, idCol, textCol)
      .groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    val c1 = ref.select(explode(split(col(textCol), " ")).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    (c2, c1, vocab)
  }

  /** Per-bigram (id, c2n, den) rows for `docs` under the model trained
    * on `ref` — the shared join stage of both scorers.
    */
  private def joinedCounts(docs: DataFrame, ref: DataFrame,
                           idCol: String, textCol: String): DataFrame = {
    val (c2, c1, vocab) = modelCounts(ref, idCol, textCol)
    bigramRows(docs, idCol, textCol)
      .join(c2, Seq("bg"), "left")
      .join(c1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        coalesce(col("c2"), lit(0L)).as("c2n"),
        (coalesce(col("c1"), lit(0L)) + col("v")).as("den"))
  }

  /** Score every document in `docs` under a bigram model trained on
    * `ref` (typically a split of the same corpus). Output per document:
    * bigram count, unseen-bigram count (c2 = 0: not in the reference),
    * exact fixed-point probability sum and mean.
    */
  def bigramScore(docs: DataFrame, ref: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val scoredBg = joinedCounts(docs, ref, idCol, textCol)
      // exact fixed-point Laplace probability — integer div, no floats
      .withColumn("p_fix", expr(s"(c2n + 1) * ${Scale}L div den"))
    scoredBg.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(when(col("c2n") === 0L, 1L).otherwise(0L)).as("n_unseen"),
        sum(col("p_fix")).as("sum_p_fix"))
      .withColumn("avg_p_fix", expr("sum_p_fix div n_bigrams"))
  }

  /** The conventional log-space form of the same model: per document,
    * Σ ln p(w2|w1) and the mean (mean log-prob = negative log
    * perplexity). Each `ln` is rounded to 6 dp at the seam (the
    * cross-libm discipline from [[Retrieval]]); the sum is a float
    * aggregation, so last-ulp addition-order wobble is possible — use
    * [[bigramScore]] where bit-exactness matters, this where the
    * standard perplexity scale does.
    */
  def logBigramScore(docs: DataFrame, ref: DataFrame,
                     idCol: String, textCol: String): DataFrame = {
    val scoredBg = joinedCounts(docs, ref, idCol, textCol)
      .withColumn("ln_p", round(
        log((col("c2n") + 1.0) / col("den").cast("double")), 6))
    scoredBg.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("ln_p")).as("sum_ln_p"))
      .withColumn("avg_ln_p", col("sum_ln_p") / col("n_bigrams"))
  }
}
