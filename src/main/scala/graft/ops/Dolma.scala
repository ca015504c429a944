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
  * table (pinned once — the cardinality count, the bitmap build, and
  * the verify join read the same materialization) and a bitmap literal
  * SIZED TO the measured reference cardinality (skipped loudly once
  * saturated — see [[paragraphDecontaminateAgainst]]); the corpus pays
  * a row-local paragraph explode + digest + bitmap probe, and ONLY
  * gate-surviving (digest, doc, idx) triples — never paragraph text —
  * reach the SHUFFLED (never force-broadcast) verify semi join. Dropped indexes come back per-doc as one
  * small int array (doc-count-sized), and the excision is a row-local
  * array rebuild (the x45/x69 shape). A paragraph-text exchange never
  * happens anywhere.
  */
object Dolma {

  /** Bitmap bits provisioned per reference digest when deriving the
    * gate size from reference cardinality (10 bits/key ≈ 1% FP at the
    * repo's k ≤ 4 hash budget).
    */
  val BitsPerKey: Int = 10

  /** Estimated FP bound past which the saturated gate prunes nothing
    * and is skipped (loudly) in favor of the plain digest semi join.
    */
  val MaxFpRate: Double = 0.5

  /** Standard Bloom false-positive estimate (1 − e^{−kn/m})^k. */
  def bloomFpRate(m: Long, k: Int, n: Long): Double =
    math.pow(1.0 - math.exp(-k.toDouble * n / m), k.toDouble)

  /** Effective bitmap bits for a reference of `nRef` digests: at least
    * `minBits`, grown to [[BitsPerKey]]·nRef (rounded up to a word),
    * hard-capped at [[Bloom.MaxBits]].
    */
  def derivedBits(minBits: Int, nRef: Long): Int =
    math.min(Bloom.MaxBits.toLong,
      math.max(minBits.toLong, (nRef * BitsPerKey + 63) / 64 * 64)).toInt

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
    *
    * SCALE CONTRACT (the production Dolma use is decontaminating
    * against a PRIOR RELEASE — a corpus-scale reference, not a bounded
    * eval suite): `m` is the MINIMUM bitmap size; the effective size
    * grows with measured reference cardinality ([[BitsPerKey]] bits
    * per distinct digest, capped at [[Bloom.MaxBits]]). Past the cap
    * the estimated FP rate ([[bloomFpRate]]) eventually crosses
    * [[MaxFpRate]] — a saturated bitmap passes everything while
    * reading as "gated" — so the gate is then SKIPPED, loudly, and the
    * digest-only semi join carries the whole load. The verify join is
    * deliberately UN-hinted: digests are ~32 bytes/row on both sides,
    * so a shuffled left-semi is cheap at any scale, and AQE still
    * broadcasts genuinely small references on its own; a forced
    * broadcast of a billion-digest prior release would OOM the driver.
    * Every configuration returns byte-identical results (the gate is
    * lossless; skipping it only costs verify-join rows).
    */
  def paragraphDecontaminateAgainst(docs: DataFrame, refPars: DataFrame,
                                    idCol: String, textCol: String,
                                    m: Int, k: Int): DataFrame = {
    // pin BEFORE the cardinality count and bitmap build: the count,
    // the bitmap, and the verify join must see the same reference set
    // (two executions of a nondeterministic ref could admit a paragraph
    // the bitmap never saw — breaking the no-false-negative
    // losslessness argument)
    val ref = refPars.select(col("d")).distinct().localCheckpoint(false)
    val nRef = ref.count()
    val mEff = derivedBits(m, nRef)
    val fp = bloomFpRate(mEff, k, nRef)
    val pars = paragraphDigests(docs, idCol, textCol)
    val cand = if (fp <= MaxFpRate) {
      val bm = Bloom.buildBitmap(ref.select(col("d").as("s")), "s", mEff, k)
      pars.filter(Bloom.mightContain(col("d"), bm, mEff, k))
    } else {
      System.err.println(
        f"[dolma] bloom gate SKIPPED: $nRef%d reference digests saturate " +
          f"the ${Bloom.MaxBits}%d-bit cap (est. FP $fp%.3f > $MaxFpRate%.2f" +
          ") — the gate would prune nothing; falling back to the exact " +
          "digest semi join (results identical)")
      pars
    }
    val dropped = cand.join(ref, Seq("d"), "left_semi")
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
