package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.AhoCorasickHits.ahoCorasickHits

/** X100 — phrase-set coverage via Aho-Corasick: which documents
  * contain which phrases of a (possibly huge) fixed set, in ONE text
  * pass per document. The production form of every list-driven gate
  * the pipeline family uses — badword blocklists (C4), contamination
  * canary strings, license boilerplate — where per-phrase `contains`
  * costs K·len and the automaton costs len.
  *
  * Substring semantics (no word-boundary anchoring), matching the
  * oracle's `contains` exactly; hit sets are reported as sorted
  * phrase lists, so output order never depends on match positions.
  *
  * 100 TB shape: the phrase list is a bounded driver artifact (here
  * derived as the corpus's top-K n-grams — one type-table aggregate +
  * a distributed TakeOrdered, K rows collected under the expression's
  * loud 100k cap); the scan is row-local with the automaton built once
  * per executor; nothing after the scan exceeds doc grain.
  */
object PhraseMatch {

  /** Top-K corpus word n-grams by (count desc, gram asc) — the
    * deterministic from-data phrase source. Distributed top-K
    * (TakeOrdered), never a global sort; K rows reach the driver.
    */
  def topPhrases(docs: DataFrame, textCol: String, n: Int, k: Int): Seq[String] = {
    require(k >= 1 && k <= 10000, s"k $k out of range [1, 10000]")
    docs.select(explode(
        Dedup.shingles(Dedup.tokens(col(textCol)), n)).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("gram"))
      .limit(k).collect().map(_.getString(0)).toSeq
  }

  /** Per-document coverage of the phrase set: distinct-hit count and
    * the sorted comma-joined hit list.
    */
  def coverage(docs: DataFrame, idCol: String, textCol: String,
               phrases: Seq[String]): DataFrame = {
    val sorted = phrases.distinct.sorted
    val phrArr = array(sorted.map(lit): _*)
    docs.select(col(idCol),
        ahoCorasickHits(col(textCol), sorted).as("ids"))
      .select(col(idCol),
        size(col("ids")).cast("long").as("n_hits"),
        concat_ws(",",
          transform(col("ids"), i => get(phrArr, i))).as("hits"))
  }
}
