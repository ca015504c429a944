package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X76 — the corpus DATA CARD: the per-slice composition report every
  * released training set ships (Gebru et al. 2021 "Datasheets for
  * Datasets"; the Pile/ROOTS/Dolma data cards) — document, token, and
  * byte counts plus an exact-duplicate rate, for every (source, lang)
  * slice AND every marginal, in ONE pass.
  *
  * The grain is `CUBE(source, lang)`: (source, lang), (source), (lang)
  * and the grand total — a single Expand-based aggregation (the c4
  * ROLLUP shape), not four scans. Every metric is an exact integer:
  * token counts are row-local `size(filter(split))` (no shuffle before
  * the aggregation), and the duplicate rate derives from
  * `count(DISTINCT md5(text))` — digests, never text, cross the
  * aggregation exchange (the x1 discipline). `n_dup_docs` =
  * docs − distinct digests, the slice's exact-duplicate surplus.
  *
  * Marginal labels: marginal rows render as `(all)`, identified by
  * `grouping()` (the bit Spark sets for cube-generated slots), never by
  * the value being NULL — so a marginal can never be conflated with a
  * real value. Dirty dimensions fail LOUDLY in-plan: a NULL or a
  * literal `(all)` in the source/lang columns raises instead of
  * silently merging a slice into the marginals (NULL would also
  * reintroduce the NULLS FIRST/LAST ordering dialect seam the label
  * exists to avoid).
  *
  * Shape at 100 TB: one map-side-combined multi-aggregate over the
  * corpus scan; Expand multiplies rows 4× BEFORE the combine but the
  * combine output is slice-cardinality (sources × langs), so the
  * exchange carries a dimension table, not a corpus. The distinct-digest
  * count plans as Spark's standard two-phase distinct aggregate —
  * digest-sized, the price of an exact dup rate (approx_count_distinct
  * is the sketch you would swap in when ±2% is acceptable).
  */
object Report {

  /** Data card over `docs`: (src, lng, n_docs, n_tokens, n_chars,
    * n_distinct_texts, n_dup_docs) at cube grain.
    */
  def dataCard(docs: DataFrame, sourceCol: String, langCol: String,
               textCol: String, charsCol: String): DataFrame = {
    // dimension guard: NULL or a literal '(all)' would be rendered
    // identically to a cube marginal — fail in-plan rather than merge
    def dim(c: String, alias: String) =
      when(col(c).isNull || col(c) === "(all)",
        raise_error(lit(s"dataCard: dimension '$c' is NULL or '(all)' — " +
          "clean the corpus or re-label; marginals would silently absorb it")))
        .otherwise(col(c)).as(alias)
    docs
      .select(dim(sourceCol, "src0"), dim(langCol, "lng0"),
        size(filter(split(col(textCol), " "), w => length(w) > 0))
          .cast("long").as("toks"),
        col(charsCol).cast("long").as("chars"),
        md5(col(textCol)).as("digest"))
      .cube(col("src0"), col("lng0"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        sum(col("chars")).as("n_chars"),
        countDistinct(col("digest")).as("n_distinct_texts"),
        grouping(col("src0")).as("g_src"),
        grouping(col("lng0")).as("g_lng"))
      .select(
        // the sentinel is emitted ONLY on grouping()=1 slots — the
        // guard above makes the coalesce-equivalent unreachable, but
        // the grouping bit is the semantically correct discriminator
        when(col("g_src") === 1, lit("(all)")).otherwise(col("src0")).as("src"),
        when(col("g_lng") === 1, lit("(all)")).otherwise(col("lng0")).as("lng"),
        col("n_docs"), col("n_tokens"), col("n_chars"),
        col("n_distinct_texts"),
        (col("n_docs") - col("n_distinct_texts")).as("n_dup_docs"))
  }

  /** X138 — corpus composition concentration: the Herfindahl–Hirschman
    * index (Σ share²; 10⁶ ppm = a single source, 10⁶/K = perfectly
    * even), the Gini coefficient over the K source counts (the
    * inequality reading of the same table), and the largest single
    * source's share — the three numbers a data card quotes when asked
    * "is this corpus one crawl wearing twenty source labels?". All
    * exact integer lanes: HHI's Σc² and Gini's Σ|c_i − c_j| run in
    * DECIMAL(38,0) (c² passes BIGINT near 3·10⁹ docs per source), one
    * integral divide each to ppm.
    *
    * SHAPE AT 100 TB: one source-grain exchange folds the corpus to K
    * count rows; the Gini all-pairs self-join is K² over that K-row
    * table (sources are dozens, never corpus-scale), and the output is
    * ONE row. Null sources are excluded (the x131 rule).
    *
    * Output: (n_sources, n_docs, hhi_ppm, gini_ppm, top_share_ppm).
    */
  def sourceConcentration(docs: DataFrame, sourceCol: String): DataFrame =
    concentrationOf(docs.filter(col(sourceCol).isNotNull)
      .groupBy(col(sourceCol).as("src")).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)) // K rows; feeds three folds + the pairs

  /** The concentration lanes over an already-built (src, c) count
    * table — the kernel the streaming twin's snapshots share with the
    * batch operator (counts from disjoint batches merge by pure
    * addition). The caller pins the input.
    */
  private[graft] def concentrationOf(counts: DataFrame): DataFrame = {
    val tot = counts.agg(count(lit(1)).as("k"), sum(col("c")).as("n"),
      sum(col("c").cast("decimal(38,0)") * col("c")).as("__s2"),
      max(col("c")).as("__top"))
    val giniNum = counts.as("a").crossJoin(counts.as("b"))
      .agg(sum(abs(col("a.c").cast("decimal(38,0)") - col("b.c")))
        .as("__g"))
    tot.crossJoin(giniNum)
      .select(col("k").as("n_sources"), col("n").as("n_docs"),
        expr("""CAST((__s2 * 1000000)
               |div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("hhi_ppm"),
        expr("""CAST((__g * 1000000)
               |div (2 * CAST(k AS DECIMAL(38,0)) * n) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("gini_ppm"),
        expr("CAST((CAST(__top AS DECIMAL(38,0)) * 1000000) div n " +
          "AS BIGINT)").as("top_share_ppm"))
  }
}
