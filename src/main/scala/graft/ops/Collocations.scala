package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X99 — PMI collocation extraction (Church & Hanks 1990): adjacent
  * word pairs that co-occur far more than independence predicts —
  * pmi = ln(c_xy · T / (c_x · c_y)) over per-language bigram and
  * unigram counts. The field-standard phrase-mining primitive: feeds
  * tokenizer seed phrases, stopword-collocation filters, and
  * domain-term inventories over a training corpus.
  *
  * Exactness: every count (c_xy, c_x, c_y, T) is an exact BIGINT; the
  * PMI ratio is composed in ONE fixed-order double expression (double
  * products cannot overflow where a 10^13-token corpus would overflow
  * the BIGINT product c_xy·T) and rounded to 6 digits — the house ln
  * lane. A min-count floor (Church & Hanks recommend dropping hapax
  * pairs, whose PMI is pure noise) bounds the output; the result lists
  * ALL surviving pairs in (lang, w1, w2) order, so no float ever
  * decides membership or order.
  *
  * 100 TB shape: the corpus pays one scan (bigram explode + unigram
  * explode); everything after is TYPE-table-sized — bigram types join
  * unigram types on (lang, word) with map-side partial counts, and the
  * per-language total is a broadcast-sized frame. No collect, no
  * single-partition stage, no float shuffles.
  */
object Collocations {

  def pmiBigrams(docs: DataFrame, langCol: String, textCol: String,
                 minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    val toks = docs.select(col(langCol).as("lang"),
      Dedup.tokens(col(textCol)).as("ts"))

    // both TYPE tables pinned: bi feeds three consumers (count filter,
    // total, output) and uni two (w1 and w2 marginals) — without the
    // pin each reference re-scans the corpus (4 scans measured in the
    // unpinned plan); pinned, the corpus is read exactly twice
    val bi = toks
      .select(col("lang"), explode(arrays_zip(
        slice(col("ts"), lit(1), size(col("ts")) - 1).as("w1"),
        slice(col("ts"), lit(2), size(col("ts")) - 1).as("w2"))).as("bg"))
      .groupBy(col("lang"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("c_xy"))
      .localCheckpoint(false)
    val uni = toks.select(col("lang"), explode(col("ts")).as("w"))
      .groupBy("lang", "w").agg(count(lit(1)).as("c_w"))
      .localCheckpoint(false)
    val tot = bi.groupBy("lang").agg(sum("c_xy").as("t"))

    bi.filter(col("c_xy") >= minCount)
      .join(uni.withColumnRenamed("w", "w1")
        .withColumnRenamed("c_w", "c_x"), Seq("lang", "w1"))
      .join(uni.withColumnRenamed("w", "w2")
        .withColumnRenamed("c_w", "c_y"), Seq("lang", "w2"))
      .join(broadcast(tot), Seq("lang"))
      .select(col("lang"), col("w1"), col("w2"), col("c_xy"),
        col("c_x"), col("c_y"), col("t"))
      .withColumn("pmi", expr(
        """round(ln(CAST(c_xy AS DOUBLE) * CAST(t AS DOUBLE)
          |  / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE))), 6)""".stripMargin))
  }
}
