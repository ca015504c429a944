package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X128 — corpus-frequency line removal: drop every occurrence of any
  * line that appears in at least `docFracPpm` ppm of the corpus's
  * documents. This is the boilerplate filter of CCNet (Wenzek et al.
  * 2020, §3 "deduplicating paragraphs" applied at line grain) and the
  * "line-wise corrections" of RefinedWeb (Penedo et al. 2023, §3.2) —
  * navigation menus, cookie banners, and footer legalese repeat across
  * a large fraction of a web dump, and the cure is frequency-based:
  * a line's DOCUMENT frequency (how many distinct documents contain
  * it), not its occurrence count, decides removal, and ALL occurrences
  * go (unlike [[C4.spanDedup]], which keeps the globally first span —
  * boilerplate has no meaningful first occurrence).
  *
  * SHAPE AT 100 TB: the corpus text never shuffles. Per document the
  * line digests collapse row-locally (`array_distinct` of the md5
  * array) BEFORE the exchange, so the document-frequency group-by
  * carries one digest per (document, distinct line) — the x1
  * digest-only discipline — with map-side partial counts. The
  * frequent set is then boilerplate-sized by construction (a line must
  * recur in ≥ docFracPpm of all documents; Zipf makes that a handful
  * of strings even at web scale), so the digest-keyed probe back into
  * the per-doc distinct grain broadcasts under AQE (un-hinted — the
  * x87 rule: never force-broadcast a data-dependent side), and the
  * banned-set regroup touches only documents that contain at least one
  * frequent line. Excision is row-local array surgery. The paged input
  * is read four times (a count-only scan, the two digest explodes
  * behind the frequency table and the banned probe, and the excision
  * scan) — text leaves its scan only as md5 digests except in the
  * excision projection; a caller chaining passes persists the paged
  * frame upstream (the x127 contract). No collect; the corpus-size
  * scalar rides a 1-row broadcast.
  *
  * Output: (idCol, n_lines, n_removed, cleaned) — DENSE over non-null
  * input: a document whose every line is boilerplate keeps an empty
  * `cleaned` rather than vanishing.
  */
object Boilerplate {

  /** Per-line md5 digests of a "\n"-paged text column. */
  private def lineDigests(page: Column): Column =
    transform(split(page, "\n"), l => md5(l))

  /** (idCol, d) pairs at per-document DISTINCT line grain — digests
    * only, never text; the input of both the frequency table and the
    * banned-set probe. Shared with the streaming twin's delta build.
    */
  private[graft] def docDigests(base: DataFrame, idCol: String,
                                textCol: String): DataFrame =
    base.select(col(idCol),
      explode(array_distinct(lineDigests(col(textCol)))).as("d"))

  /** The ≥-threshold filter over a (d, df) frequency frame and a 1-row
    * corpus size — the merge point the streaming twin feeds with
    * accumulated deltas. Cross-multiplied integer compare (exact — no
    * double ratio); df·10⁶ holds to ~9.2·10¹² documents.
    */
  private[graft] def thresholdFrequent(df: DataFrame, nDocs: DataFrame,
                                       docFracPpm: Long): DataFrame = {
    require(docFracPpm >= 1 && docFracPpm <= 1000000,
      s"docFracPpm $docFracPpm out of [1, 1e6]")
    df.crossJoin(broadcast(nDocs))
      .filter(col("df") * lit(1000000L) >= col("n_docs") * lit(docFracPpm))
  }

  /** Row-local excision of a frequent-digest set (a 1-column `d`
    * frame) from every document — the banned-set probe, regroup, and
    * array surgery shared verbatim by the streaming twin (its "single
    * batch equals the batch operator" contract rests on this being one
    * code path).
    */
  private[graft] def excise(base: DataFrame, idCol: String,
                            textCol: String, frequent: DataFrame): DataFrame = {
    val banned = docDigests(base, idCol, textCol)
      .join(frequent.select("d"), Seq("d"))
      .groupBy(col(idCol)).agg(collect_set(col("d")).as("bans"))
    val ls = split(col(textCol), "\n")
    base.join(banned, Seq(idCol), "left")
      .select(col(idCol), ls.as("ls"),
        coalesce(col("bans"), array().cast("array<string>")).as("bans"))
      .select(col(idCol),
        size(col("ls")).cast("long").as("n_lines"),
        size(filter(col("ls"), l => array_contains(col("bans"), md5(l))))
          .cast("long").as("n_removed"),
        array_join(filter(col("ls"),
          l => !array_contains(col("bans"), md5(l))), "\n").as("cleaned"))
  }

  /** The (digest, df, n_docs) document-frequency table of lines at or
    * above the `docFracPpm` threshold — exposed for audits and
    * inspection.
    */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
                    docFracPpm: Long): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
    val df = docDigests(base, idCol, textCol)
      .groupBy(col("d")).agg(count(lit(1)).as("df"))
    thresholdFrequent(df, base.agg(count(lit(1)).as("n_docs")), docFracPpm)
      .select(col("d"), col("df"), col("n_docs"))
  }

  /** Remove every occurrence of corpus-frequent lines (document
    * frequency ≥ docFracPpm ppm of all documents) from every document.
    */
  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                          docFracPpm: Long): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
    val df = docDigests(base, idCol, textCol)
      .groupBy(col("d")).agg(count(lit(1)).as("df"))
    val frequent = thresholdFrequent(df,
      base.agg(count(lit(1)).as("n_docs")), docFracPpm)
    excise(base, idCol, textCol, frequent)
  }
}
