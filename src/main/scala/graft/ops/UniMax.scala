package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X66 — UniMax language-balanced sampling (Chung et al. 2023, "UniMax:
  * Fairer and More Effective Language Sampling for Large-Scale
  * Multilingual Pretraining"): allocate a total token budget across
  * languages by WATERFILLING — each language, visited in ascending
  * corpus size, gets `min(uniform share of what's left, its corpus ×
  * maxEpochs)` — then materialize the allocation as per-document repeat
  * counts. The standard alternative to temperature sampling
  * ([[Sample.temperatureWeights]], x40) that removes the tail-language
  * over-repetition temperature can't avoid.
  *
  * EXACTNESS: the paper's real-valued uniform share is replaced by its
  * integer twin — once the capped prefix is fixed, the leftover divides
  * as `div` with the remainder granted one token each to the
  * smallest-corpus uncapped languages (deterministic, and the total
  * allocation equals the budget exactly whenever any language is
  * uncapped). The capped prefix is CONTIGUOUS in the ascending order
  * (if a language's cap exceeds the uniform share, every larger one's
  * does too — the share is invariant as uncapped languages consume it),
  * so one pass of window arithmetic finds it: language i is capped iff
  * cap_i · (n−i+1) ≤ budget − capSum_{<i}, all in BIGINT
  * cross-multiplication.
  *
  * An allocation turns into data as FULL EPOCHS plus a PARTIAL epoch:
  * e_full = alloc div corpusTokens replays the whole language, and the
  * alloc mod corpusTokens remainder admits documents in deterministic
  * md5 hash order under the x57 greedy-prefix contract (the
  * budget-crossing document is kept whole).
  *
  * SHAPE AT 100 TB: the corpus pass is ONE map-side-combined
  * groupBy(lang) token count; the waterfilling window runs over the
  * LANGUAGE-sized table (hundreds of rows — the [[KneserNey
  * .tertileThresholds]] precedent for a deliberately tiny global
  * window); the partial-epoch admission reuses x57's two-pass prefix
  * sum PARTITIONED BY LANGUAGE — per-(lang, 2-hex-prefix) subtotals,
  * a lang×256-row broadcast offset table, within-group windows — so no
  * task ever sees more than ~1/256 of one language even when one
  * language is 90% of the corpus. The DuckDB oracle is the naive
  * per-language global window, so the hash gate re-proves the
  * decomposition every round (the x48/x57 discipline).
  */
object UniMax {

  /** One corpus pass: whitespace token totals per language. */
  def tokenCounts(df: DataFrame, langCol: String, textCol: String): DataFrame =
    df.groupBy(col(langCol))
      .agg(sum(size(split(col(textCol), " ")).cast("long")).as("lang_tokens"))

  /** The waterfilling allocation over a (langCol, lang_tokens) table:
    * (langCol, lang_tokens, capped, alloc_tokens).
    */
  def allocate(counts: DataFrame, langCol: String,
               budgetTokens: Long, maxEpochs: Long): DataFrame = {
    require(budgetTokens >= 1, s"budget must be >= 1: $budgetTokens")
    require(maxEpochs >= 1, s"maxEpochs must be >= 1: $maxEpochs")
    val ord = Window.orderBy(col("lang_tokens"), col(langCol))
    val base = counts
      .withColumn("i", row_number().over(ord))
      .withColumn("cap", col("lang_tokens") * maxEpochs)
      .withColumn("sprev", coalesce(sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(counts.agg(count(lit(1)).cast("int").as("n"))))
      .withColumn("cond", col("cap") * (col("n") - col("i") + 1) <=
        lit(budgetTokens) - col("sprev"))
    val kRow = base.agg(coalesce(min(when(!col("cond"), col("i"))) - 1,
      max(col("i"))).as("k"))
    val withK = base.crossJoin(broadcast(kRow))
    val skRow = withK.agg(coalesce(
      sum(when(col("i") <= col("k"), col("cap"))), lit(0L)).as("sk"))
    withK.crossJoin(broadcast(skRow))
      .withColumn("leftb", lit(budgetTokens) - col("sk"))
      .withColumn("m", (col("n") - col("k")).cast("long"))
      .withColumn("alloc_tokens", when(col("i") <= col("k"), col("cap"))
        .otherwise(expr("leftb div m") +
          when(col("i") - col("k") <= expr("leftb % m"), lit(1L))
            .otherwise(lit(0L))))
      .select(col(langCol), col("lang_tokens"),
        (col("i") <= col("k")).as("capped"), col("alloc_tokens"))
  }

  /** The full materialization: per-document repeat counts under the
    * allocation — e_full full epochs for everyone in the language, +1
    * for the partial-epoch hash-prefix (x57 greedy contract). Emits
    * documents with repeats > 0.
    */
  def select(df: DataFrame, idCol: String, langCol: String, textCol: String,
             budgetTokens: Long, maxEpochs: Long,
             seed: String = ""): DataFrame = {
    val epochs = allocate(tokenCounts(df, langCol, textCol), langCol,
        budgetTokens, maxEpochs)
      .withColumn("e_full", expr("alloc_tokens div lang_tokens"))
      .withColumn("partial", expr("alloc_tokens % lang_tokens"))
      .select(col(langCol), col("e_full"), col("partial"))
    val base = df.select(col(idCol), col(langCol),
        md5(concat(col(idCol).cast("string"), lit(seed))).as("h"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("grp", substring(col("h"), 1, 2))
    val offsets = base.groupBy(col(langCol), col("grp"))
      .agg(sum(col("n_tokens")).as("gtot"))
      .withColumn("goff", coalesce(sum(col("gtot")).over(
        Window.partitionBy(col(langCol)).orderBy(col("grp"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(langCol), col("grp"), col("goff"))
    val inGrp = Window.partitionBy(col(langCol), col("grp"))
      .orderBy(col("h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base.join(broadcast(offsets), Seq(langCol, "grp"))
      .join(broadcast(epochs), Seq(langCol))
      .withColumn("cum_before",
        col("goff") + coalesce(sum(col("n_tokens")).over(inGrp), lit(0L)))
      .withColumn("repeats", col("e_full") +
        when(col("cum_before") < col("partial"), 1L).otherwise(0L))
      .filter(col("repeats") > 0)
      .select(col(idCol), col(langCol), col("n_tokens"), col("cum_before"),
        col("repeats"))
  }
}
