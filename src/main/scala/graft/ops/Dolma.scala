package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X87 — PARAGRAPH-grain Bloom-gated deduplication (the Dolma recipe:
  * Soldaini et al. 2024, arXiv:2402.00159 §2.2, which dedupes CommonCrawl
  * at paragraph granularity against a Bloom filter of everything already
  * admitted; the same shape as CCNet's paragraph hashes, Wenzek et al.
  * 2020). Two batch forms plus a streaming twin:
  *
  *  - WITHIN-corpus paragraph dedup is [[C4.spanDedup]] at span=1 (the
  *    x69 machinery at paragraph grain): first occurrence by (doc, idx)
  *    wins, digests-only shuffle, row-local excision.
  *  - CROSS-corpus [[paragraphDecontaminate]] (this file): drop every
  *    paragraph of the input that already exists in a REFERENCE corpus
  *    (the prior release / previously-admitted set). This is where the
  *    x74 bitmap gate composes: the reference's paragraph digests build
  *    a fixed m-bit Bloom bitmap; the corpus probe is row-local at the
  *    scan, and only the bloom-positive sliver reaches the exact verify
  *    join. LOSSLESS by the x74 argument — no false negatives, so
  *    gate+verify equals the exact join byte-for-byte, which the oracle
  *    (the naive exact join, no bloom anywhere) re-proves per run.
  *
  * Shape at 100 TB: the reference side reduces to ONE distinct digest
  * table (pinned once — the bitmap build and the verify join read the
  * same materialization) and a 32 KB bitmap literal; the corpus pays a
  * row-local paragraph explode + digest + bitmap probe, and ONLY
  * gate-surviving (digest, doc, idx) triples — never paragraph text —
  * reach the verify join. Dropped indexes come back per-doc as one
  * small int array (doc-count-sized), and the excision is a row-local
  * array rebuild (the x45/x69 shape). A paragraph-text exchange never
  * happens anywhere.
  */
object Dolma {

  /** One digest row per paragraph occurrence: (idCol, idx, d). */
  def paragraphDigests(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("p", "par")))
      .select(col(idCol), (col("p") + 1).as("idx"), md5(col("par")).as("d"))

  /** Drop every paragraph of `docs` whose digest appears among
    * `refPars` (a prepared one-column `d` digest frame — so the
    * streaming twin can feed its accumulated state directly). Returns
    * (idCol, n_pars, n_removed, cleaned), DENSE over every input doc.
    */
  def paragraphDecontaminateAgainst(docs: DataFrame, refPars: DataFrame,
                                    idCol: String, textCol: String,
                                    m: Int, k: Int): DataFrame = {
    // pin BEFORE the bitmap build: the bitmap and the verify join must
    // see the same reference set (two executions of a nondeterministic
    // ref could admit a paragraph the bitmap never saw — breaking the
    // no-false-negative losslessness argument)
    val ref = refPars.select(col("d")).distinct().localCheckpoint(false)
    val bm = Bloom.buildBitmap(ref.select(col("d").as("s")), "s", m, k)
    val cand = paragraphDigests(docs, idCol, textCol)
      .filter(Bloom.mightContain(col("d"), bm, m, k))
    val dropped = cand.join(broadcast(ref), Seq("d"), "left_semi")
      .select(col(idCol), col("idx"))
    exciseByIdx(docs, dropped, idCol, textCol)
  }

  /** Row-local paragraph excision: `droppedIdx` is (idCol, idx) rows
    * naming paragraph positions to cut; they fold to one small int
    * array per doc (doc-count-sized — text never shuffles) and the
    * rebuild is a scan-side array filter. Returns (idCol, n_pars,
    * n_removed, cleaned) DENSE over every input doc. Shared by the
    * batch gate and the streaming twin
    * ([[graft.streaming.ParagraphDedupStream]]) so the two cannot
    * drift on excision semantics.
    */
  def exciseByIdx(docs: DataFrame, droppedIdx: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val dropped = droppedIdx
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(col("idx"))).as("idxs"))
    val lines = split(col(textCol), "\n")
    docs.join(dropped, Seq(idCol), "left")
      .select(col(idCol), lines.as("ls"),
        coalesce(col("idxs"), array().cast("array<int>")).as("idxs"))
      .select(col(idCol),
        size(col("ls")).cast("long").as("n_pars"),
        size(col("idxs")).cast("long").as("n_removed"),
        array_join(filter(transform(sequence(lit(1), size(col("ls"))),
            j => when(!array_contains(col("idxs"), j),
              element_at(col("ls"), j))),
          x => x.isNotNull), "\n").as("cleaned"))
  }

  /** Docs-facing form: the reference is a corpus, reduced here to its
    * paragraph digest set.
    */
  def paragraphDecontaminate(docs: DataFrame, refDocs: DataFrame,
                             idCol: String, textCol: String,
                             m: Int, k: Int): DataFrame =
    paragraphDecontaminateAgainst(docs,
      paragraphDigests(refDocs, idCol, textCol).select(col("d")),
      idCol, textCol, m, k)
}
