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
  * frequent line. Excision is row-local array surgery on a second scan
  * of the text (a caller chaining passes persists the lined frame
  * upstream, the x127 contract). No collect; the corpus-size scalar
  * rides a 1-row broadcast.
  *
  * Output: (idCol, n_lines, n_removed, cleaned) — DENSE over non-null
  * input: a document whose every line is boilerplate keeps an empty
  * `cleaned` rather than vanishing.
  */
object Boilerplate {

  /** Per-line md5 digests of a "\n"-paged text column. */
  private def lineDigests(page: Column): Column =
    transform(split(page, "\n"), l => md5(l))

  /** The (digest, df, n_docs) document-frequency table of lines at or
    * above the `docFracPpm` threshold — exposed for audits and for the
    * streaming twin's state updates.
    */
  def frequentLines(docs: DataFrame, idCol: String, textCol: String,
                    docFracPpm: Long): DataFrame = {
    require(docFracPpm >= 1 && docFracPpm <= 1000000,
      s"docFracPpm $docFracPpm out of [1, 1e6]")
    val base = docs.filter(col(textCol).isNotNull)
    val docDistinct = base.select(col(idCol),
      explode(array_distinct(lineDigests(col(textCol)))).as("d"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    docDistinct.groupBy(col("d")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      // integer threshold: df/n_docs >= docFracPpm/1e6 cross-multiplied
      // (exact — no double ratio); df·1e6 ≤ 9.2e12 docs before BIGINT
      .filter(col("df") * lit(1000000L) >= col("n_docs") * lit(docFracPpm))
      .select(col("d"), col("df"), col("n_docs"))
  }

  /** Remove every occurrence of corpus-frequent lines (document
    * frequency ≥ docFracPpm ppm of all documents) from every document.
    */
  def removeFrequentLines(docs: DataFrame, idCol: String, textCol: String,
                          docFracPpm: Long): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
    val frequent = frequentLines(docs, idCol, textCol, docFracPpm)
    // banned digests per affected document — only documents containing
    // a frequent line appear; everyone else takes the null arm below
    val banned = base.select(col(idCol),
        explode(array_distinct(lineDigests(col(textCol)))).as("d"))
      .join(frequent.select("d"), Seq("d"))
      .groupBy(col(idCol))
      .agg(collect_set(col("d")).as("bans"))
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
}
