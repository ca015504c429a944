package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X61 — DSIR: Data Selection via Importance Resampling (Xie et al.
  * 2023, arXiv:2302.03169), the scalable "select corpus data that looks
  * like the target domain" recipe used to build pretraining mixtures:
  * fit two hashed bag-of-n-grams distributions — target p and raw q —
  * and resample documents with probability ∝ exp(Σ_b c_b·(ln p_b −
  * ln q_b)) via Gumbel top-k.
  *
  * Pipeline, all integer-exact at the seams:
  *  1. FEATURES: unigrams + word-bigrams hashed into `dim` buckets
  *     (md5, the [[Sample.bucket]] family) with raw COUNTS — DSIR's
  *     hashed n-gram generative model, sharing X39's hash discipline
  *     but unsigned (a categorical distribution needs counts, not
  *     sign-cancelled sums).
  *  2. RATIOS: per bucket, Laplace-smoothed log-ratio in MICRO-NATS
  *     (the X42 seam — round(ln·10^6) computed by the engine's own ln
  *     on both sides): r_b = round(ln((tgt_b+1)/(T+dim))·10^6) −
  *     round(ln((raw_b+1)/(R+dim))·10^6). A dim-sized table.
  *  3. WEIGHTS: w(x) = Σ_b c_b(x)·r_b — an exact integer dot product
  *     of the document's sparse count vector with the broadcast ratio
  *     table (DSIR's log importance weight, up to the shared
  *     smoothing constants).
  *  4. RESAMPLE: Gumbel top-k — the paper's without-replacement
  *     sampler, determinized: u = (h32 + 0.5)/2^32 from md5(id|seed),
  *     g = round(−ln(−ln u)·10^6), select the k largest w + g (ties to
  *     the lower id). Exactly reproducible in any engine.
  *
  * SHAPE AT 100 TB: features are one narrow explode + ONE map-side-
  * combined (doc, bucket) aggregation (≤ min(tokens, dim) rows per doc
  * reach the shuffle — the X39 bound); both distribution fits aggregate
  * THAT table again into dim-sized outputs (map-side combined, the
  * target side semi-join-filtered scan-side); the ratio table is dim
  * rows and BROADCASTS into the weight join, so the corpus is never
  * shuffled by the model; selection is a global top-k (TakeOrdered — a
  * per-partition heap + driver merge of k·partitions rows, no sort
  * shuffle). Unlike a trained classifier gate (x42/x59) there is no
  * label dependency: the target slice IS the supervision.
  */
object Dsir {

  /** Hashed unigram+bigram COUNT features: (idCol, bucket, cnt) with
    * bucket = md5("seed|gram") first-8-hex mod dim, over each
    * document's tokens and adjacent-pair bigrams.
    */
  def hashedNgramCounts(docs: DataFrame, idCol: String, textCol: String,
                        dim: Int, seed: String): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val toks = split(col(textCol), " ")
    val grams = concat(toks,
      graft.functions.Shingles.shingles(toks, 2))
    docs.select(col(idCol), explode(grams).as("gram"))
      .select(col(idCol), pmod(
          conv(substring(md5(concat(lit(s"$seed|"), col("gram"))), 1, 8),
            16, 10).cast("long"),
          lit(dim.toLong)).as("bucket"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  private def microLn(e: Column): Column =
    round(log(e) * lit(1e6)).cast("long")

  /** The dim-sized micro-nat log-ratio table r_b from a prepared
    * feature table and a target-membership id set: one aggregation per
    * distribution, Laplace(+1) smoothing over `dim` buckets. Buckets
    * unseen in BOTH distributions share the same (cancelling) smoothed
    * mass and are irrelevant to any document, so the table is built
    * over the raw corpus's observed buckets.
    */
  def bucketLogRatios(feats: DataFrame, targetIds: DataFrame,
                      idCol: String, dim: Int): DataFrame = {
    val raw = feats.groupBy(col("bucket"))
      .agg(sum(col("cnt")).as("raw_b"))
    val tgt = feats.join(targetIds, Seq(idCol), "left_semi")
      .groupBy(col("bucket")).agg(sum(col("cnt")).as("tgt_b"))
    val totals = raw.agg(sum(col("raw_b")).as("raw_tot"))
      .crossJoin(tgt.agg(coalesce(sum(col("tgt_b")), lit(0L)).as("tgt_tot")))
    raw.join(tgt, Seq("bucket"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bucket"),
        (microLn((coalesce(col("tgt_b"), lit(0L)) + 1).cast("double") /
            (col("tgt_tot") + dim).cast("double")) -
          microLn((col("raw_b") + 1).cast("double") /
            (col("raw_tot") + dim).cast("double"))).as("r_micro"))
  }

  /** Full DSIR selection: the `k` documents with the largest
    * Gumbel-perturbed importance weight. Output (idCol, w_micro,
    * key_micro), one row per selected document.
    */
  def select(docs: DataFrame, targetIds: DataFrame, idCol: String,
             textCol: String, k: Int, dim: Int, seed: String): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val feats = hashedNgramCounts(docs, idCol, textCol, dim, seed)
    val ratios = bucketLogRatios(feats, targetIds, idCol, dim)
    val w = feats.join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("cnt") * col("r_micro")).as("w_micro"))
    // deterministic Gumbel: u in (0,1) from the 32-bit md5 bucket of
    // (id|seed g-lane), g = -ln(-ln u) in micro-nats
    val u = (conv(Sample.bucket(col(idCol), s"${seed}g"), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    w.withColumn("key_micro",
        col("w_micro") + round(-log(-log(u)) * lit(1e6)).cast("long"))
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }
}
