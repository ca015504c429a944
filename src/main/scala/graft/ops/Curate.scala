package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators: deterministic split assignment,
  * per-domain quota capping, and sequence packing — the steps between a
  * cleaned/deduplicated corpus and actual training shards. All three are
  * built on the same reproducibility primitive as [[Sample]]: an md5 hash
  * bucket of the row key, identically computable by any engine, stable
  * under retries and across shards with no coordination.
  */
object Curate {

  /** The x116 curation-gate signal projection — ONE scan-side pass
    * adding `quality` (distinct-token ratio), `n_ngrams` /
    * `dup_ngram_ratio` (2-gram repetition), and `norm_fp` (normalized
    * md5 fingerprint for exact dedup). Shared by the batch flagship
    * pipeline and [[graft.streaming.CurateStream]] so the two cannot
    * drift; all other columns pass through.
    */
  def gateSignals(docs: DataFrame, textCol: String): DataFrame = {
    // the four output names are RESERVED: silently shadowing (or
    // duplicating) a caller's same-named column would corrupt gatePass
    // downstream with a confusing AnalysisException at best
    val reserved = Seq("quality", "n_ngrams", "dup_ngram_ratio", "norm_fp",
      "__gs_ts", "__gs_sh2")
    val clash = docs.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"gateSignals: input already carries reserved output column(s) " +
        s"${clash.mkString(", ")} — rename or drop them first")
    // token + bigram arrays MATERIALIZED as columns before the signal
    // projection reads them: the Shingles kernel is CodegenFallback
    // (no cross-column CSE), so the inline form re-ran split 3× and
    // the kernel 3× per row (the Gopher lesson); dropped after use so
    // the pass-through column contract is unchanged
    val ts = col("__gs_ts")
    val sh2 = col("__gs_sh2")
    docs
      .withColumn("__gs_ts", split(col(textCol), " "))
      .withColumn("__gs_sh2", graft.functions.Shingles.shingles(ts, 2))
      .select(docs.columns.map(col).toSeq ++ Seq(
        round(size(array_distinct(ts)).cast("double") / size(ts), 6)
          .as("quality"),
        size(sh2).cast("long").as("n_ngrams"),
        // guarded: a 1-token doc has zero bigrams, and under ANSI mode
        // the unguarded divide is a runtime DIVIDE_BY_ZERO (non-ANSI it
        // was already null) — the gate never reads the ratio at
        // n_ngrams = 0, so null is the one value both modes agree on
        when(size(sh2) > 0, round(lit(1.0) -
          size(array_distinct(sh2)).cast("double") / size(sh2), 6))
          .as("dup_ngram_ratio"),
        md5(TextAnalysis.normalize(col(textCol))).as("norm_fp")): _*)
  }

  /** The gate predicate over [[gateSignals]] columns. */
  def gatePass(qualityMin: Double, dupMax: Double): Column =
    col("n_ngrams") > 0 && col("quality") >= qualityMin &&
      col("dup_ngram_ratio") <= dupMax

  /** X144 — per-source gate-RULE attribution: not just how much each
    * source loses at the gate (x133's rate) but to WHICH rule — a
    * source dying on `too_short` wants its extractor fixed, one dying
    * on `repetitive` wants template stripping, one dying on
    * `low_quality` may just be a different register. Rules are counted
    * INDEPENDENTLY (a document can trip several), `n_failed` is the
    * any-rule count (n_docs − passed, so a null-signal document —
    * null text — fails without being attributed to a rule it never
    * evaluated). Null sources are excluded (the x131 rule).
    *
    * SHAPE AT 100 TB: the [[gateSignals]] scan-side projection plus
    * one source-grain exchange with map-side combine — the x133 shape
    * with three more counting lanes; nothing new materializes.
    *
    * Output: (src, n_docs, n_too_short, n_low_quality, n_repetitive,
    * n_failed, fail_ppm), one row per source.
    */
  def gateAttribution(docs: DataFrame, srcCol: String, textCol: String,
                      qualityMin: Double, dupMax: Double): DataFrame =
    attributionOf(attributionCounts(docs, srcCol, textCol, qualityMin,
      dupMax))

  /** The ADDITIVE per-source rule-count lanes both [[gateAttribution]]
    * and the streaming twin's delta build share (counts from disjoint
    * batches merge by pure addition — the [[graft.ops.CorpusStats]]
    * `keynessOf` discipline). One tokenization/threshold path, so the
    * batch and streaming seams cannot drift.
    */
  private[graft] def attributionCounts(docs: DataFrame, srcCol: String,
                                       textCol: String,
                                       qualityMin: Double,
                                       dupMax: Double): DataFrame = {
    val sig = gateSignals(docs.filter(col(srcCol).isNotNull)
      .select(col(srcCol).as("src"), col(textCol)), textCol)
    sig.groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(when(col("n_ngrams") === 0, 1L)), lit(0L))
          .as("n_too_short"),
        coalesce(sum(when(col("n_ngrams") > 0 &&
          col("quality") < qualityMin, 1L)), lit(0L))
          .as("n_low_quality"),
        coalesce(sum(when(col("n_ngrams") > 0 &&
          col("dup_ngram_ratio") > dupMax, 1L)), lit(0L))
          .as("n_repetitive"),
        coalesce(sum(when(gatePass(qualityMin, dupMax), 1L)), lit(0L))
          .as("n_passed"))
  }

  /** The derived lanes over already-accumulated attribution counts. */
  private[graft] def attributionOf(counts: DataFrame): DataFrame =
    counts.select(col("src"), col("n_docs"), col("n_too_short"),
      col("n_low_quality"), col("n_repetitive"),
      (col("n_docs") - col("n_passed")).as("n_failed"),
      expr("CAST(CAST(n_docs - n_passed AS DECIMAL(38,0)) * 1000000 " +
        "div n_docs AS BIGINT)").as("fail_ppm"))

  /** The one hash-bucket expression, shared with [[Sample]] so the two
    * can never diverge.
    */
  private def hashBucket(keyCol: Column, seed: String): Column =
    Sample.bucket(keyCol, seed)

  /** X15 — deterministic train/valid/test split assignment.
    *
    * Each row gets exactly one label: the named splits claim cumulative
    * hash ranges `[0, f1), [f1, f1+f2), ...` and `rest` takes the
    * remainder. A pure row-local CASE over the hash bucket — zero
    * shuffle, zero coordination, and adding data to the corpus never
    * moves an existing row between splits (the property `rand()` or
    * round-robin splitting cannot give you at 100 TB).
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  fractions: Seq[(String, Double)], rest: String,
                  seed: String = ""): DataFrame = {
    require(fractions.nonEmpty, "need at least one named split fraction")
    val cums = fractions.scanLeft(0.0) { case (c, (_, f)) => c + f }.tail
    require(cums.last < 1.0, "named fractions must sum below 1")
    val b = hashBucket(col(keyCol), seed)
    // fold from the LAST threshold outward so the built CASE checks the
    // smallest range first: when(b < thr1, s1).when(b < thr2, s2)...
    val assign = fractions.map(_._1).zip(cums).reverse
      .foldLeft(lit(rest): Column) { case (acc, (name, cum)) =>
        when(b < lit(Sample.threshold(cum)), lit(name)).otherwise(acc)
      }
    df.withColumn("split", assign)
  }

  /** X16 — per-domain quota cap: keep at most `quota` rows per domain,
    * chosen by deterministic hash order (so the kept set is reproducible
    * and unbiased within the domain).
    *
    * The naive form — `row_number() OVER (PARTITION BY domain ORDER BY
    * hash)` then filter — shuffles EVERY row of a hot domain to one
    * partition; at 100 TB a single crawl domain can be billions of rows.
    * This is the two-phase exact form:
    *
    *   1. per-domain counts (map-side-combined agg; result is one row per
    *      domain — tiny — and broadcast back);
    *   2. hash prefilter: keep rows whose bucket falls in the lowest
    *      `prefilterFactor * quota / n` fraction — the expected survivor
    *      count per domain is `prefilterFactor * quota`, independent of
    *      domain size, so the ranking window now shuffles O(quota) rows
    *      per domain instead of O(n);
    *   3. exactness guard: the prefilter keeps a PREFIX of the hash
    *      order, so the result equals the naive form iff every domain
    *      retains >= min(quota, n) survivors. That is re-counted (another
    *      tiny agg) and any short domain — possible only under extreme
    *      hash clustering — falls back to ranking its full row set. The
    *      guard makes the operator exact always, not just with high
    *      probability;
    *   4. row_number over the surviving sliver.
    */
  def domainQuota(df: DataFrame, keyCol: String, domainCol: String,
                  quota: Int, seed: String = "",
                  prefilterFactor: Int = 4): DataFrame = {
    require(quota >= 1, s"quota must be >= 1: $quota")
    val hv = conv(hashBucket(col(keyCol), seed), 16, 10).cast("bigint")
    val withH = df.withColumn("__hv", hv)
    val counts = withH.groupBy(col(domainCol)).agg(count(lit(1)).as("__n"))
    val expect = lit(prefilterFactor.toDouble * quota)
    // whole-domain passthrough when the quota sliver would not shrink it
    val thr = when(expect >= col("__n"), lit(4294967296L))
      .otherwise((expect / col("__n") * lit(4294967296.0)).cast("bigint"))
    val joined = withH.join(broadcast(counts), Seq(domainCol))
    val survivors = joined.filter(col("__hv") < thr)
    val kept = survivors.groupBy(col(domainCol)).agg(count(lit(1)).as("__kept"))
    val short = counts.join(kept, Seq(domainCol), "left")
      .filter(coalesce(col("__kept"), lit(0L)) < least(lit(quota.toLong), col("__n")))
      .select(col(domainCol), lit(true).as("__full"))
    val candidates = joined
      .join(broadcast(short), Seq(domainCol), "left")
      .filter(col("__hv") < thr || col("__full").isNotNull)
    val w = Window.partitionBy(col(domainCol)).orderBy(col("__hv"), col(keyCol))
    candidates
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= quota)
      .drop("__hv", "__n", "__full")
  }

  /** X126 — sequence-length decision audit: for each candidate context
    * length L, the exact cost of the two standard regimes —
    * PAD (one-or-more sequences per doc, ⌈t/L⌉ each, tail padded):
    * `pad_waste_ppm` = padded-slot fraction wasted; TRUNCATE (one
    * sequence per doc, overflow dropped): `trunc_loss_ppm` = token
    * fraction lost. The table a max_seq_len decision reads before
    * committing to [[seqPack]] (concat-and-chunk, which wastes ~0 but
    * lets documents straddle cuts) or doc-boundary packing.
    *
    * Shape at 100 TB: token counts are one scan-side projection, the
    * |grid|-way explode rides the same scan, and the single exchange
    * carries |grid| partial-sum rows after map-side combine — never
    * corpus-sized. The ppm ratios multiply corpus-scale token counts
    * by 10⁶, so those lanes are DECIMAL(38,0) (exact at any corpus
    * size; results are ppm-sized BIGINTs).
    */
  def seqLenAudit(docs: DataFrame, textCol: String,
                  lens: Seq[Long]): DataFrame = {
    require(lens.nonEmpty && lens.forall(_ >= 1),
      s"candidate lengths must be >= 1: $lens")
    require(lens.distinct.size == lens.size, s"duplicate lengths: $lens")
    val base = docs.filter(col(textCol).isNotNull)
      .select(size(split(col(textCol), " ")).cast("bigint").as("t"))
    base.select(col("t"), explode(typedLit(lens)).as("seq_len"))
      .groupBy("seq_len")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("t")).as("n_tokens"),
        sum(expr("(t + seq_len - 1) div seq_len")).as("n_seqs"),
        sum(least(col("t"), col("seq_len"))).as("n_tokens_kept"))
      .select(col("seq_len"), col("n_docs"), col("n_tokens"),
        col("n_seqs"),
        expr("CAST((CAST(n_seqs AS DECIMAL(38,0)) * seq_len - n_tokens)" +
          " * 1000000 div (CAST(n_seqs AS DECIMAL(38,0)) * seq_len)" +
          " AS BIGINT)").as("pad_waste_ppm"),
        col("n_tokens_kept"),
        expr("CAST((CAST(n_tokens AS DECIMAL(38,0)) - n_tokens_kept)" +
          " * 1000000 div CAST(n_tokens AS DECIMAL(38,0)) AS BIGINT)")
          .as("trunc_loss_ppm"))
  }

  /** X33 — overlapping token-window chunking: cut each document into
    * fixed-size token windows with a fixed stride (stride < size gives
    * the overlapping context windows retrieval/embedding pipelines feed
    * their encoders; stride = size gives disjoint blocks). Emits per
    * chunk: its index, 0-based token offset, actual token count (the
    * tail window may be short), and the chunk text.
    *
    * Chunk boundaries depend only on the document's own token count —
    * unlike [[seqPack]] there is no cross-document stream — so the whole
    * operator is one generator projection on the scan: `sequence(0, n-1,
    * stride)` posexploded, then a row-local `slice`. Zero shuffle, zero
    * state, embarrassingly parallel at any scale; output order within a
    * document is the chunk index, reproducible by construction.
    */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            size: Int, stride: Int): DataFrame = {
    require(size >= 1 && stride >= 1, s"size/stride must be >= 1: $size/$stride")
    // stride > size would leave every (stride - size)-token gap in NO
    // chunk — silent corpus loss for the documented encoder-feeding use,
    // and the classic symptom of transposed positional arguments
    require(stride <= size,
      s"stride $stride > size $size would drop tokens between windows")
    val toks = split(col(textCol), " ")
    docs
      .select(col(idCol), toks.as("__ts"))
      .select(col(idCol),
        posexplode(sequence(lit(0L),
          (org.apache.spark.sql.functions.size(col("__ts")) - 1).cast("bigint"),
          lit(stride.toLong))),
        col("__ts"))
      .select(col(idCol),
        col("pos").cast("bigint").as("chunk_idx"),
        col("col").as("start_tok"),
        slice(col("__ts"), (col("col") + 1).cast("int"), lit(size)).as("__ck"))
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        org.apache.spark.sql.functions.size(col("__ck")).cast("bigint").as("n_tok"),
        array_join(col("__ck"), " ").as("chunk_text"))
  }

  /** X17 — sequence packing, concat-and-chunk style: documents are
    * concatenated in deterministic order and the token stream is cut into
    * fixed `chunkTokens` windows (documents may straddle a cut — exactly
    * what GPT-style pretraining does; packing-without-splitting is a bin
    * packing problem that doesn't parallelize exactly).
    *
    * A single global order would be one giant window partition; instead
    * the corpus is sharded by `id mod shards` and packed per shard, so
    * the running sum parallelizes across `shards` independent window
    * partitions (at 100 TB, shards ~ number of output training files).
    * Emits per document: its shard, token span `[tok_start, tok_end)`
    * within the shard's stream, and the chunk range it lands in.
    */
  /** X158 — gate-threshold sensitivity sweep: the x116 gate priced at
    * every (qualityMin, dupMax) arm of a literal grid — docs and
    * TOKENS retained per arm, the tuning curve behind the shipping
    * thresholds (x143 answers "what would moving the near-dup cut
    * keep"; this answers the same question for the quality gate's own
    * two knobs). Token counts matter more than doc counts here: a
    * gate arm that keeps 90% of documents but drops the long tail can
    * still cost a third of the training budget.
    *
    * SHAPE AT 100 TB: ONE [[gateSignals]] scan projection folded by
    * ONE aggregation whose |grid|×2 conditional lanes are all
    * map-side-combined counters — no row expansion, no grid cross
    * join against the corpus, no second pass however many arms. The
    * lanes-to-rows reshape happens on the 1-row aggregate via a
    * literal-grid explode. Every arm applies the EXACT gate
    * predicate ([[gatePass]] at that arm), so the shipping (0.35,
    * 0.05) point on the curve is the x116 gate to the bit.
    *
    * Output: (quality_min, dup_max, n_docs, n_docs_kept,
    * docs_kept_ppm, n_tokens, n_tokens_kept, tokens_kept_ppm), one
    * row per grid arm.
    */
  def gateSweep(docs: DataFrame, textCol: String,
                qualityArms: Seq[Double],
                dupArms: Seq[Double]): DataFrame = {
    require(qualityArms.nonEmpty && dupArms.nonEmpty,
      "need at least one arm on each axis")
    val arms = for (q <- qualityArms; d <- dupArms) yield (q, d)
    val sig = gateSignals(docs.select(col(textCol)), textCol)
      .withColumn("__tok",
        coalesce(size(split(col(textCol), " ")).cast("long"), lit(0L)))
    val laneCols = arms.zipWithIndex.flatMap { case ((q, d), i) =>
      val pass = coalesce(gatePass(q, d), lit(false))
      Seq(count_if(pass).as(s"__d$i"),
        coalesce(sum(when(pass, col("__tok")).otherwise(0L)), lit(0L))
          .as(s"__t$i"))
    }
    val allLanes = Seq(count(lit(1)).as("__n"),
      coalesce(sum(col("__tok")), lit(0L)).as("__nt")) ++ laneCols
    val folded = sig.agg(allLanes.head, allLanes.tail: _*)
    val rows = arms.zipWithIndex.map { case ((q, d), i) =>
      s"struct(CAST($q AS DOUBLE) AS quality_min," +
        s" CAST($d AS DOUBLE) AS dup_max," +
        s" __d$i AS kept, __t$i AS kept_tok)"
    }.mkString("array(", ", ", ")")
    folded
      .select(col("__n"), col("__nt"),
        explode(expr(rows)).as("arm"))
      .select(col("arm.quality_min").as("quality_min"),
        col("arm.dup_max").as("dup_max"),
        col("__n").as("n_docs"),
        col("arm.kept").as("n_docs_kept"),
        expr("CASE WHEN __n = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(CAST(arm.kept AS DECIMAL(38,0)) * 1000000" +
          " div __n AS BIGINT) END").as("docs_kept_ppm"),
        col("__nt").as("n_tokens"),
        col("arm.kept_tok").as("n_tokens_kept"),
        expr("CASE WHEN __nt = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(CAST(arm.kept_tok AS DECIMAL(38,0)) * 1000000" +
          " div __nt AS BIGINT) END").as("tokens_kept_ppm"))
  }

  /** X155 — Gini information gain of metadata fields on the gate
    * outcome (the CART split criterion, Breiman et al. 1984): for each
    * candidate field, how much of the pass/fail impurity does knowing
    * the field's value remove? The curation-debug question "which
    * metadata dimension PREDICTS gate failure" answered with the
    * decision-tree number — a field with high gain means the gate is
    * really a proxy for that dimension (fix the extractor for that
    * slice instead of tightening the gate); all-zero gains mean the
    * gate cuts orthogonally to every dimension you track.
    *
    * Gini is used instead of entropy deliberately: with two outcome
    * classes, impurity = 2·p·(n−p)/n² is pure RATIONAL arithmetic —
    * ppm-exact in DECIMAL(38,0)/HUGEINT with no ln() seam to keep
    * bit-equal across engines. Per-value terms floor individually
    * (the x136 per-term discipline):
    *   base_ppm = ⌊1e6·2·p·(n−p) / n²⌋
    *   cond_ppm = Σ_v ⌊1e6·2·p_v·(n_v−p_v) / (n_v·n)⌋
    *   gain_ppm = base_ppm − cond_ppm   (can floor to −1; deterministic)
    * Null field values are REAL groups (a missing language is a
    * slice); null text fails the gate closed.
    *
    * SHAPE AT 100 TB: the [[gateSignals]] scan projection folds ONCE
    * to the fields' cross grain (attribute-cross-product-bounded,
    * never corpus-sized — the x148 argument), pinned via
    * localCheckpoint; every per-field table is a rollup of that one
    * exchange, and the 1-row total broadcasts.
    *
    * Output: one row per field — (field, n_values, n_docs, n_pass,
    * gini_base_ppm, gini_cond_ppm, gain_ppm).
    */
  def giniGain(docs: DataFrame, textCol: String, fields: Seq[String],
               qualityMin: Double, dupMax: Double): DataFrame = {
    require(fields.nonEmpty, "need at least one candidate field")
    require(!fields.contains(textCol),
      s"textCol '$textCol' cannot also be a candidate field")
    val sig = gateSignals(
      docs.select(fields.map(col) :+ col(textCol): _*), textCol)
    val pass = coalesce(gatePass(qualityMin, dupMax), lit(false))
    val cross = sig.groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("n_v"), count_if(pass).as("p_v"))
      .localCheckpoint(false)
    val tot = broadcast(cross.agg(
      coalesce(sum(col("n_v")), lit(0L)).as("n"),
      coalesce(sum(col("p_v")), lit(0L)).as("p")))
    fields.map { f =>
      cross.groupBy(col(f))
        .agg(sum(col("n_v")).as("n_v"), sum(col("p_v")).as("p_v"))
        .crossJoin(tot)
        .select(col("n"), col("p"),
          expr("CAST(CAST(2 AS DECIMAL(38,0)) * p_v * (n_v - p_v)" +
            " * 1000000 div (CAST(n_v AS DECIMAL(38,0)) * n) AS BIGINT)")
            .as("term"))
        .agg(count(lit(1)).as("n_values"),
          coalesce(max(col("n")), lit(0L)).as("n_docs"),
          coalesce(max(col("p")), lit(0L)).as("n_pass"),
          coalesce(sum(col("term")), lit(0L)).as("gini_cond_ppm"))
        .select(lit(f).as("field"), col("n_values"), col("n_docs"),
          col("n_pass"),
          expr("CASE WHEN n_docs = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE CAST(CAST(2 AS DECIMAL(38,0)) * n_pass" +
            " * (n_docs - n_pass) * 1000000" +
            " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)" +
            " END").as("gini_base_ppm"),
          col("gini_cond_ppm"))
        .withColumn("gain_ppm", col("gini_base_ppm") - col("gini_cond_ppm"))
    }.reduce(_ unionByName _)
  }

  def seqPack(docs: DataFrame, idCol: String, textCol: String,
              shards: Int, chunkTokens: Int): DataFrame = {
    require(shards >= 1 && chunkTokens >= 1)
    val nTok = size(split(col(textCol), " ")).cast("bigint")
    val base = docs.select(col(idCol),
      pmod(col(idCol), lit(shards.toLong)).as("shard"), nTok.as("n_tokens"))
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      // integer `div`, not `/`: epoch-style long division must truncate
      .withColumn("chunk_first", expr(s"tok_start div $chunkTokens"))
      .withColumn("chunk_last", expr(s"(tok_end - 1) div $chunkTokens"))
      .withColumn("n_chunks", col("chunk_last") - col("chunk_first") + lit(1L))
      .select(col(idCol), col("shard"), col("n_tokens"), col("tok_start"),
        col("chunk_first"), col("chunk_last"), col("n_chunks"))
  }
}
