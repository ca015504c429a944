package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for the 100 TB path.
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * cover the two places AQE cannot: aggregation hot keys (a single
  * reducer owning one giant group) and join-key frequency blowup in the
  * shingle self-join (a boilerplate shingle shared by millions of
  * documents turns the near-dup join quadratic on that one key).
  */
object Skew {

  /** Two-phase salted count: partial count per (key, salt) — spreading a
    * hot key over `saltFactor` reducers — then final sum per key.
    * Identical result to `groupBy(keys).count()`, skew-proof shuffle.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("count"))
  }

  /** Two-phase salted sum, same contract as [[saltedCount]]. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltFactor: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as("sum"))
  }

  /** Document-frequency cap for the shingle self-join: shingles shared by
    * more than `maxDf` documents are boilerplate — they contribute
    * O(df^2) join rows while carrying almost no dedup signal. Dropping
    * them bounds the join's per-key fanout at maxDf^2. This is the
    * standard df-capping approximation (documented deviation from exact
    * Jaccard: intersection/union counts shrink by the capped shingles).
    */
  def capDocumentFrequency(sh: DataFrame, idCol: String, maxDf: Int): DataFrame = {
    val hot = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("s"))
    // broadcast anti-join: the hot-shingle list is small by construction
    sh.join(broadcast(hot), Seq("s"), "left_anti")
  }

  /** Near-dup pairs with df-capping — the shape that survives boilerplate-
    * heavy corpora at scale. Threshold applies to the capped jaccard.
    */
  def jaccardPairsCapped(docs: DataFrame, idCol: String, textCol: String,
                         threshold: Double, maxDf: Int): DataFrame = {
    val sh = capDocumentFrequency(
      Dedup.shingleTable(docs, idCol, textCol), idCol, maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.jaccardPairs(sh, idCol, threshold)
  }
}
