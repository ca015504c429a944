package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X85 — Zipf-law fit over the corpus vocabulary: the log-log linear
  * regression of frequency on rank (Zipf 1949), the standard corpus-QA
  * statistic — a natural-language corpus fits slope ≈ −1, and a corpus
  * whose slope drifts (boilerplate floods, templated spam, synthetic
  * text) announces itself in this one number before any sample reading
  * does.
  *
  * DETERMINISTIC least squares, the NB micro-nat discipline: log(rank)
  * and log(frequency) land as `round(ln·10^6)` BIGINT micro-nats, so
  * every regression moment (Σx, Σy, Σxy, Σx²) is an EXACT integer sum
  * — no float-addition order anywhere — carried in DECIMAL(38,0)
  * (x ~ 10^7 micro-nats squared times a 10^8-type vocabulary overflows
  * 2^63; the x55/x58 reseat). Only the final slope/intercept divisions
  * are doubles, and a ratio of two exact decimals is correctly rounded
  * — bit-identical in any engine (round-6, the x12 discipline).
  *
  * Shape at 100 TB: the corpus pays one token explode + map-side-
  * combined (word, count) aggregation; everything after runs on the
  * VOCABULARY (orders of magnitude smaller than the corpus — the x8
  * contract). THE RANK IS TWO-LEVEL, NEVER A GLOBAL SORT (the x57
  * discipline applied to a non-hash order): the naive
  * `row_number() OVER (ORDER BY freq DESC, w)` would funnel the whole
  * vocabulary through one task. The regression only consumes the
  * MULTISET of (ln rank, ln freq) points, and y = ln(freq) is constant
  * within a frequency tie — so the within-tie order is free, and we
  * pick md5(w) so ties decompose over 256 hash-prefix cells exactly
  * like tokenBudget:
  *   rank = foff(freq) + poff(freq, pfx) + row_number within cell
  * where foff is the running word count of strictly-higher freq bands
  * (a window over the DISTINCT-FREQ table — the one single-partition
  *  stage left, orders smaller than vocab: a Zipfian corpus has
  *  O(sqrt(tokens)) distinct counts) and poff is the within-band cell
  * offset (a window PARTITIONED BY freq, ≤256 rows each). The largest
  * window partition shrinks from |vocab| to |largest tie|/256 — the
  * hapax band, the worst case, spreads over 256 cells. The DuckDB
  * oracle is the NAIVE global-window form, so the hash gate re-proves
  * the decomposition equal to the spec every round (the x48
  * discipline). Offset tables join back unhinted — vocab-sized at
  * worst, AQE broadcasts them when small. Output is a single row.
  */
object CorpusStats {

  def zipfFit(docs: DataFrame, textCol: String): DataFrame = {
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .withColumn("pfx", substring(md5(col("w")), 1, 2))
    // (freq, pfx) cell counts: <= min(|vocab|, |distinct freqs| * 256)
    val cells = vocab.groupBy(col("freq"), col("pfx"))
      .agg(count(lit(1)).as("cc"))
    // band offsets: words in strictly higher-frequency bands
    val freqOff = cells.groupBy(col("freq"))
      .agg(sum(col("cc")).as("fc"))
      .withColumn("foff", coalesce(
        sum(col("fc")).over(Window.orderBy(col("freq").desc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("freq"), col("foff"))
    // cell offsets within a band: earlier prefixes' words
    val cellOff = cells
      .withColumn("poff", coalesce(
        sum(col("cc")).over(Window.partitionBy(col("freq"))
          .orderBy(col("pfx")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("freq"), col("pfx"), col("poff"))
    val ranked = vocab
      .join(freqOff, Seq("freq"))
      .join(cellOff, Seq("freq", "pfx"))
      .withColumn("rank",
        (col("foff") + col("poff") +
          row_number().over(Window.partitionBy(col("freq"), col("pfx"))
            .orderBy(col("w")))).cast("long"))
    val pts = ranked.select(
      expr("CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("x"),
      expr("CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("y"))
    val moments = pts.agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))"))
        .as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))"))
        .as("sxx"))
    // slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²); a 1-word vocabulary has
    // zero x-variance — refuse in-plan rather than divide by zero
    moments.select(col("n").as("n_vocab"),
      expr("""CASE WHEN n * sxx - sx * sx = 0
             |  THEN raise_error('zipfFit: degenerate vocabulary (no rank variance)')
             |  ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |END""".stripMargin).as("slope"),
      expr("""round((CAST(sy AS DOUBLE)
             |  - (CAST(n * sxy - sx * sy AS DOUBLE)
             |     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             |  / CAST(n AS DOUBLE) / 1000000.0, 6)""".stripMargin)
        .as("intercept_ln"))
  }

  /** X103 — Heaps'-law fit of vocabulary growth (Heaps 1978; Herdan):
    * V(n) = K·n^β, the companion number to [[zipfFit]] — natural text
    * grows vocabulary as n^~0.5±0.1, and a corpus whose β collapses
    * (template floods repeat words) or nears 1 (synthetic/ID-heavy
    * text mints types per token) flags itself in one statistic.
    *
    * Growth checkpoints are per-document, ordered by doc id: a word
    * contributes a type at its FIRST document (min doc id — exact),
    * so cum_types is the running sum of first-occurrence counts and
    * cum_tokens the running token sum. Points (ln n, ln V) land as
    * micro-nat BIGINTs into the same exact-integer least squares as
    * [[zipfFit]], per language.
    *
    * 100 TB shape: one corpus explode; firsts are a vocab-sized
    * min-aggregate; the running sums NEVER globally sort — the x57/x85
    * two-level decomposition over doc-id cells (per-cell sums, a
    * cell-table offset window orders smaller than the doc table, then
    * within-cell windows ≤ cellSize rows). The oracle is the naive
    * global-window form, re-proving the decomposition each round.
    */
  def heapsFit(docs: DataFrame, langCol: String, idCol: String,
               textCol: String, cellSize: Int = 256): DataFrame = {
    require(cellSize >= 2, s"cellSize $cellSize must be >= 2")
    val words = docs.select(col(langCol).as("lang"), col(idCol).as("did"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val firsts = words.groupBy("lang", "w").agg(min("did").as("did"))
      .groupBy("lang", "did").agg(count(lit(1)).as("nt"))
    val perDoc = words.groupBy("lang", "did").agg(count(lit(1)).as("tk"))
      .join(firsts, Seq("lang", "did"), "left")
      .withColumn("nt", coalesce(col("nt"), lit(0L)))
      .withColumn("cell", floor(col("did") / cellSize))
    val cellOffW = Window.partitionBy("lang").orderBy("cell")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cellOff = perDoc.groupBy("lang", "cell")
      .agg(sum("tk").as("ct"), sum("nt").as("cn"))
      .withColumn("ot", coalesce(sum("ct").over(cellOffW), lit(0L)))
      .withColumn("on", coalesce(sum("cn").over(cellOffW), lit(0L)))
      .select("lang", "cell", "ot", "on")
    val inCellW = Window.partitionBy("lang", "cell").orderBy("did")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pts = perDoc.join(cellOff, Seq("lang", "cell"))
      .withColumn("cumt", col("ot") + sum("tk").over(inCellW))
      .withColumn("cumn", col("on") + sum("nt").over(inCellW))
      .select(col("lang"),
        expr("CAST(round(ln(CAST(cumt AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("x"),
        expr("CAST(round(ln(CAST(cumn AS DOUBLE)) * 1000000) AS BIGINT)")
          .as("y"))
    val moments = pts.groupBy("lang").agg(
      count(lit(1)).as("n"),
      sum(expr("CAST(x AS DECIMAL(38,0))")).as("sx"),
      sum(expr("CAST(y AS DECIMAL(38,0))")).as("sy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0))"))
        .as("sxy"),
      sum(expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))"))
        .as("sxx"))
    moments.select(col("lang"), col("n").as("n_points"),
      expr("""CASE WHEN n * sxx - sx * sx = 0
             |  THEN raise_error('heapsFit: degenerate growth curve (single checkpoint)')
             |  ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
             |    / CAST(n * sxx - sx * sx AS DOUBLE), 6)
             |END""".stripMargin).as("beta"),
      expr("""round((CAST(sy AS DOUBLE)
             |  - (CAST(n * sxy - sx * sy AS DOUBLE)
             |     / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
             |  / CAST(n AS DOUBLE) / 1000000.0, 6)""".stripMargin)
        .as("ln_k"))
  }

  /** X104 — population stability index between two corpus slices
    * (the banking-world drift monitor, standard thresholds 0.1 / 0.25):
    * PSI = Σ_buckets (p_i − q_i)·ln(p_i/q_i) over hashed vocabulary
    * buckets — the one number a nightly pipeline watches to catch a
    * source flipping template, a crawler drifting domains, or a
    * snapshot diverging from its reference.
    *
    * Buckets are md5(word) mod nBuckets (deterministic, engine-portable)
    * with Laplace +1 smoothing so empty buckets stay finite — counts
    * stay exact integers. Each bucket's term is rounded to NANO units
    * and summed as BIGINT (the NB micro-nat discipline widened 1000x:
    * per-term doubles are deterministic, but a float SUM would depend
    * on partition order), then the one division seats the display psi.
    *
    * 100 TB shape: one token explode per slice, map-side-combined into
    * nBuckets rows per group — the exchange is bucket-table-sized and
    * everything after is group-cardinality work.
    */
  def psiDrift(current: DataFrame, reference: DataFrame, grpCol: String,
               textCol: String, nBuckets: Int = 64): DataFrame =
    psiFromBuckets(tokenBuckets(current, grpCol, textCol, nBuckets),
      tokenBuckets(reference, grpCol, textCol, nBuckets), nBuckets)

  /** (grp, bkt, c) hashed-vocabulary bucket counts — ADDITIVE exact
    * integers (counts sum across disjoint slices), which is what the
    * streaming twin's per-batch delta state relies on.
    */
  def tokenBuckets(df: DataFrame, grpCol: String, textCol: String,
                   nBuckets: Int): DataFrame = {
    require(nBuckets >= 2 && nBuckets <= 100000,
      s"nBuckets $nBuckets out of range [2, 100000]")
    df.select(col(grpCol).as("grp"),
        explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .withColumn("bkt", expr(
        s"CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) % $nBuckets"))
      .groupBy("grp", "bkt").agg(count(lit(1)).as("c"))
  }

  /** PSI from two bucket-count tables — the ONE shared estimator
    * (batch and stream score through this verbatim): dense grid,
    * Laplace +1, nano-scaled integer term sums.
    */
  def psiFromBuckets(current: DataFrame, reference: DataFrame,
                     nBuckets: Int): DataFrame = {
    // pin both bucket tables (groups × nBuckets rows): each side feeds
    // the group grid AND the count join — unpinned, every reference
    // re-runs the corpus scan behind it (8 scans measured)
    val cur = current.localCheckpoint(false)
    val ref = reference.localCheckpoint(false)
    // dense (grp, bucket) grid so zero buckets exist on both sides
    val grps = cur.select("grp").distinct()
      .unionByName(ref.select("grp").distinct()).distinct()
    val grid = grps.crossJoin(
      current.sparkSession.range(nBuckets).select(col("id").as("bkt")))
    val joined = grid
      .join(cur.withColumnRenamed("c", "ca"), Seq("grp", "bkt"), "left")
      .join(ref.withColumnRenamed("c", "cb"), Seq("grp", "bkt"), "left")
      .withColumn("ca", coalesce(col("ca"), lit(0L)) + 1)
      .withColumn("cb", coalesce(col("cb"), lit(0L)) + 1)
    val tot = joined.groupBy("grp")
      .agg(sum("ca").as("na"), sum("cb").as("nb"))
    joined.join(tot, Seq("grp"))
      .withColumn("term_nano", expr(
        """CAST(round(
          |  (CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
          |  * ln((CAST(ca AS DOUBLE) / na) / (CAST(cb AS DOUBLE) / nb))
          |  * 1000000000) AS BIGINT)""".stripMargin))
      .groupBy("grp")
      .agg((max("na") - lit(nBuckets)).as("n_a"),
        (max("nb") - lit(nBuckets)).as("n_b"),
        expr("round(CAST(sum(term_nano) AS DOUBLE) / 1000000000.0, 6)")
          .as("psi"))
  }

  /** X105 — Turing frequency re-estimation (Good 1953; Gale & Sampson's
    * presentation): the frequency-of-frequencies table N_r and the
    * Turing estimate r* = (r+1)·N_{r+1}/N_r for small r, plus the
    * unseen-mass estimate P0 = N_1/N as the r = 0 row — the numbers
    * behind every smoothing decision the LM family (x26/x52/x58)
    * makes, surfaced as corpus QA.
    *
    * All N_r and N are exact integers from two vocab-sized aggregates;
    * r* and p are round-6 ratios of exact integers.
    */
  def goodTuring(docs: DataFrame, grpCol: String, textCol: String,
                 maxR: Int = 10, gram: Int = 1): DataFrame = {
    require(maxR >= 1 && maxR <= 1000, s"maxR $maxR out of range [1, 1000]")
    require(gram >= 1 && gram <= 5, s"gram $gram out of range [1, 5]")
    // n-gram grain: unigram tables in a small-vocab corpus have almost
    // no rare events; bigrams restore the Zipfian tail N_r exists for
    val freqs = docs.select(col(grpCol).as("grp"), explode(
        Dedup.shingles(Dedup.tokens(col(textCol)), gram)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w").agg(count(lit(1)).as("r"))
    val nr = freqs.groupBy(col("grp"), col("r"))
      .agg(count(lit(1)).as("n_r"))
    val tot = freqs.groupBy("grp").agg(sum("r").as("n_tokens"))
    val next = nr.select(col("grp"), (col("r") - 1).as("r"),
      col("n_r").as("n_r1"))
    val seen = nr.filter(col("r") <= maxR)
      .join(next, Seq("grp", "r"), "left")
      .join(tot, Seq("grp"))
      .select(col("grp"), col("r"), col("n_r"),
        coalesce(col("n_r1"), lit(0L)).as("n_r1"),
        col("n_tokens"),
        expr("""round(CAST((r + 1) * coalesce(n_r1, 0) AS DOUBLE)
               |  / n_r, 6)""".stripMargin).as("r_star"),
        expr("round(CAST(r * n_r AS DOUBLE) / n_tokens, 6)").as("p_mass"))
    // the promised r = 0 row: N_0 (the unseen-type count) is
    // unobservable, so n_r = 0 and r_star = 0 by convention; p_mass
    // carries the Turing unseen-mass estimate P0 = N_1/N
    val zero = tot
      .join(nr.filter(col("r") === 1)
        .select(col("grp"), col("n_r").as("n1")), Seq("grp"), "left")
      .select(col("grp"), lit(0L).as("r"), lit(0L).as("n_r"),
        coalesce(col("n1"), lit(0L)).as("n_r1"), col("n_tokens"),
        lit(0.0).as("r_star"),
        expr("round(CAST(coalesce(n1, 0) AS DOUBLE) / n_tokens, 6)")
          .as("p_mass"))
    seen.unionByName(zero)
  }

  /** X123 — vocabulary COVERAGE / OOV curve: for each candidate vocab
    * size S, the fraction of corpus tokens covered by the S most
    * frequent word types (rank order: frequency desc, then type asc) —
    * the first number any tokenizer-vocab decision consults ("how much
    * of the stream is OOV at 32k types?"), and the operational
    * complement of the Heaps (x103) growth fit.
    *
    * COMPUTED AT FREQUENCY-GROUP GRAIN, never per-type: within one
    * frequency every type contributes the same mass, so coverage at S
    * = (mass of all freq groups wholly above the boundary) +
    * (S − types above) · boundary_freq — all from the
    * frequency-of-frequencies table. The cumulative windows run over
    * DISTINCT frequencies per group (~√tokens rows under Zipf — the
    * x85/x105 vocabulary-grain argument), and the per-type rank order's
    * tie-break never matters because ties share a frequency. Every
    * lane is an exact BIGINT; coverage_ppm/oov_ppm are integral ppm.
    *
    * Returns (grp, vocab_size, n_types_total, n_tokens, covered,
    * coverage_ppm, oov_ppm) DENSE over every (group, size) — a size
    * beyond the whole vocabulary covers everything.
    */
  def vocabCoverage(docs: DataFrame, grpCol: String, textCol: String,
                    sizes: Seq[Long], gram: Int = 1): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(s => s >= 1),
      s"sizes must be >= 1: $sizes")
    require(gram >= 1 && gram <= 5, s"gram $gram out of range [1, 5]")
    val types = docs.select(col(grpCol).as("grp"), explode(
        Dedup.shingles(Dedup.tokens(col(textCol)), gram)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("grp", "w").agg(count(lit(1)).as("c"))
    val fg = types.groupBy(col("grp"), col("c"))
      .agg(count(lit(1)).as("n_types"))
      .withColumn("mass", col("c") * col("n_types"))
    val above = Window.partitionBy(col("grp")).orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = fg
      .withColumn("t_above", coalesce(sum(col("n_types")).over(above),
        lit(0L)))
      .withColumn("m_above", coalesce(sum(col("mass")).over(above),
        lit(0L)))
    val tot = fg.groupBy(col("grp"))
      .agg(sum(col("mass")).as("n_tokens"),
        sum(col("n_types")).as("n_types_total"))
    val ss = sizes.map(s => s"CAST($s AS BIGINT)").mkString(", ")
    val grid = tot.select(col("grp"), col("n_tokens"),
      col("n_types_total"),
      explode(expr(s"array($ss)")).as("vocab_size"))
    // each size matches its one boundary frequency group; sizes past
    // the whole vocabulary fall through the left join to full coverage
    val hit = grid.join(cum,
        Seq("grp"), "left")
      .filter(col("t_above") < col("vocab_size") &&
        col("vocab_size") <= col("t_above") + col("n_types"))
      .select(col("grp"), col("vocab_size"),
        (col("m_above") +
          (col("vocab_size") - col("t_above")) * col("c")).as("covered"))
    grid.join(hit, Seq("grp", "vocab_size"), "left")
      .select(col("grp"), col("vocab_size"), col("n_types_total"),
        col("n_tokens"),
        coalesce(col("covered"), col("n_tokens")).as("covered"))
      .withColumn("coverage_ppm",
        expr("covered * 1000000 div n_tokens"))
      .withColumn("oov_ppm",
        expr("(n_tokens - covered) * 1000000 div n_tokens"))
  }

  /** X130 — word burstiness / dispersion audit (Church & Gale 1995,
    * "Poisson Mixtures"): per word, the variance-to-mean ratio (Fano
    * factor) of its per-document count across the corpus. VMR ≈ 1 is
    * Poisson — function words spread evenly; VMR ≫ 1 is bursty —
    * content words clump into few documents. The classic separator
    * behind stopword induction and topicality weighting, and a cheap
    * template-spam tell (a "content-looking" word with flat dispersion
    * is boilerplate).
    *
    * EXACT RATIONAL LANES: with s1 = Σ_d c_wd, s2 = Σ_d c_wd² over
    * the word's containing documents (absent documents contribute
    * zero, entering only through N), VMR = (N·s2 − s1²)/(N·s1) —
    * non-negative by Cauchy-Schwarz, computed as one DECIMAL(38,0)
    * integral-divide in micro units: exact, order-independent, zero
    * double steps (the oracle replays it in HUGEINT). Every square and
    * sum runs in the DECIMAL lane from the start ([[wordMoments]]);
    * only the OUTPUT cast needs a bound — vmr ≤ max per-doc count, so
    * BIGINT micro holds to 9.2·10¹² same-word tokens in one document.
    *
    * SHAPE AT 100 TB: one (word, doc) type-grain exchange (the x24
    * tfidf grain) with map-side combine, then a vocab-grain fold; the
    * corpus-size scalar rides a 1-row broadcast. `minDf` gates the
    * output to recurring words — the df-1 tail is vocabulary-sized and
    * its dispersion degenerate.
    *
    * Output: (w, df, n_occ, vmr_micro) for words with df ≥ minDf.
    */
  /** The (grp, w, c_sw) slice-grain count table — the tokenization
    * both [[unigramKl]] and the streaming twin's delta build share
    * (one code path: a delimiter or filter change cannot diverge the
    * snapshot-equality contract). Null-group docs are excluded from
    * slice AND pool: an equi-join would drop the null slice's output
    * row while its tokens skewed every other group's ratio — the pool
    * must be the union of the scored slices.
    */
  private[graft] def groupWordCounts(docs: DataFrame, grpCol: String,
                                     textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull && col(grpCol).isNotNull)
      .select(col(grpCol).as("grp"),
        explode(split(col(textCol), " ")).as("w"))
      .groupBy(col("grp"), col("w")).agg(count(lit(1)).as("c_sw"))

  /** The KL lanes over an already-built (grp, w, c_sw) count table —
    * pool counts, slice totals, and the corpus total all fold from it,
    * and the streaming twin calls this with accumulated counts (one
    * code path for the rounding seam). The input must be pinned by the
    * caller: it feeds three folds and the term join.
    */
  private[graft] def klOf(csw: DataFrame): DataFrame = {
    val cw = csw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val ts = csw.groupBy(col("grp")).agg(sum(col("c_sw")).as("t_s"))
    val tc = csw.agg(sum(col("c_sw")).as("t_c"))
    csw.join(cw, Seq("w"))
      .join(broadcast(ts), Seq("grp"))
      .crossJoin(broadcast(tc))
      .select(col("grp"), col("c_sw"), col("t_s"), expr(
        """CAST(round(ln((CAST(c_sw AS DOUBLE) * t_c)
          |  / (CAST(t_s AS DOUBLE) * c_w)) * 1000000) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("t"))
      .groupBy(col("grp"), col("t_s"))
      .agg(count(lit(1)).as("n_types"),
        sum(expr("CAST(c_sw AS DECIMAL(38,0)) * t")).as("__k"))
      .select(col("grp"), col("t_s").as("n_tokens"), col("n_types"),
        expr("""CAST(greatest(__k, CAST(0 AS DECIMAL(38,0)))
               |div CAST(t_s AS DECIMAL(38,0)) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("kl_micro"))
  }

  /** X131 — per-group unigram KL divergence against the corpus: how
    * far each slice's (language's, source's) token distribution sits
    * from the pooled mixture — the composition-skew diagnostic behind
    * mixture reweighting (a slice with near-zero KL is redundant with
    * the pool; a high-KL slice carries distinct vocabulary). KL(p_s ‖
    * p_c) = Σ_w p_s(w)·ln(p_s(w)/p_c(w)); every slice token exists in
    * the pool, so p_c > 0 and no smoothing is needed (the deliberate
    * contrast with [[Dsir]]'s hashed-bucket +1 smoothing, which
    * compares two DIFFERENT corpora).
    *
    * LANES: per (group, word) the log-ratio term rounds to a BIGINT
    * micro-nat BEFORE the weighted sum (ln of one fixed-
    * parenthesization double ratio of the four exact counts — the
    * X42/DSIR seam), the weighted sum runs in DECIMAL(38,0) (slice
    * tokens × 30e6 µnats passes BIGINT near 3·10¹¹ tokens), and the
    * division by slice size lands back in BIGINT (bounded by the max
    * |term|). The sum clamps at zero before dividing: true KL is
    * non-negative, per-term rounding can dip the lane to −1·types, and
    * trunc-vs-floor division would diverge on negatives.
    *
    * SHAPE AT 100 TB: one (group, word) type-grain exchange with
    * map-side combine builds the count table (pinned — it feeds the
    * pool fold, the slice fold, and the term join, the x127 contract);
    * the pool-side join is vocab-keyed, slice totals broadcast
    * group-sized, the corpus total rides a 1-row broadcast. Null
    * groups are excluded from slice and pool (the oracle mirrors with
    * IS NOT NULL).
    *
    * Output: (grp, n_tokens, n_types, kl_micro), one row per group.
    */
  def unigramKl(docs: DataFrame, grpCol: String, textCol: String): DataFrame =
    klOf(groupWordCounts(docs, grpCol, textCol).localCheckpoint(false))

  /** (w, df, n_occ, s2) per-word dispersion moments — each a sum over
    * the word's containing documents, so moment tables from disjoint
    * document slices MERGE BY ADDITION (a document lives wholly in one
    * slice); the seam the streaming twin accumulates across. s2 runs
    * in a DECIMAL(38,0) lane from the first square: c² would pass
    * BIGINT at ~3·10⁹ same-word tokens in one document, and the
    * corpus-wide (and twin-accumulated) Σc² has no per-document bound
    * at all — the oracle mirrors with HUGEINT.
    */
  private[graft] def wordMoments(base: DataFrame, idCol: String,
                                 textCol: String): DataFrame =
    base.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("df"), sum(col("c")).as("n_occ"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("s2"))

  /** The exact VMR projection over a (w, df, n_occ, s2) moment table
    * and a 1-row corpus size — one code path for the batch operator
    * and the streaming twin's snapshots.
    */
  private[graft] def vmrOf(moments: DataFrame, nDocs: DataFrame,
                           minDf: Long): DataFrame = {
    require(minDf >= 1, s"minDf $minDf must be >= 1")
    moments.filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
      .select(col("w"), col("df"), col("n_occ"),
        expr("""CAST((CAST(n_docs AS DECIMAL(38,0)) * s2
                |  - CAST(n_occ AS DECIMAL(38,0)) * n_occ) * 1000000
                |div (CAST(n_docs AS DECIMAL(38,0)) * n_occ)
                |AS BIGINT)""".stripMargin.replace("\n", " "))
          .as("vmr_micro"))
  }

  def burstiness(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Long): DataFrame = {
    val base = docs.filter(col(textCol).isNotNull)
    vmrOf(wordMoments(base, idCol, textCol),
      base.agg(count(lit(1)).as("n_docs")), minDf)
  }

  /** The G² lanes over an already-built (grp, w, c_sw) count table —
    * the kernel the streaming twin's snapshots share with the batch
    * operator (one code path for every rounding seam). The caller pins
    * the input: it feeds three folds and the cell join (the x127
    * contract).
    *
    * Each of the four 2×2 contingency cells contributes
    * O·round(ln(O·N / (rowTotal·colTotal))·10⁶): the ln of ONE
    * fixed-parenthesization double ratio of exact BIGINT counts rounds
    * to a micro-nat BIGINT (the x131 term seam), the O-weighted sum
    * runs in DECIMAL(38,0), and the output doubles AFTER a guarded
    * BIGINT cast-back (×2 outside the lane keeps the guard bound
    * simple). A zero observed cell contributes exactly 0 — the CASE
    * short-circuits before ln sees a 0 or a 0 denominator, which also
    * makes the degenerate single-group corpus emit all-zero G² (every
    * surviving term is ln(1)).
    */
  private[graft] def keynessOf(csw: DataFrame, minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount $minCount must be >= 1")
    val cw = csw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
    val ts = csw.groupBy(col("grp")).agg(sum(col("c_sw")).as("t_s"))
    val tc = csw.agg(sum(col("c_sw")).as("t_c"))
    def cell(o: String, rowT: String, colT: String): String =
      s"""CASE WHEN $o = 0 THEN CAST(0 AS DECIMAL(38,0))
         |ELSE CAST($o AS DECIMAL(38,0)) *
         |  CAST(round(ln((CAST($o AS DOUBLE) * t_c)
         |    / (CAST($rowT AS DOUBLE) * ($colT))) * 1000000) AS BIGINT)
         |END""".stripMargin.replace("\n", " ")
    csw.join(cw, Seq("w"))
      .join(broadcast(ts), Seq("grp"))
      .crossJoin(broadcast(tc))
      .filter(col("c_sw") >= minCount)
      // the other three observed cells of the 2x2 table: ob = w in the
      // rest of the corpus, oc = other tokens in the group, od = other
      // tokens in the rest
      .withColumn("ob", col("c_w") - col("c_sw"))
      .withColumn("oc", col("t_s") - col("c_sw"))
      .withColumn("od", col("t_c") - col("t_s") - col("c_w") + col("c_sw"))
      .withColumn("__s", expr(
        cell("c_sw", "t_s", "c_w") + " + " + cell("ob", "t_c - t_s", "c_w")
          + " + " + cell("oc", "t_s", "t_c - c_w")
          + " + " + cell("od", "t_c - t_s", "t_c - c_w")))
      .select(col("grp"), col("w"), col("c_sw"),
        // over/under-representation direction from the EXACT cross
        // products (a·N vs rowTotal·colTotal — never the rounded lanes)
        expr("""CASE
               |WHEN CAST(c_sw AS DECIMAL(38,0)) * t_c
               |   > CAST(t_s AS DECIMAL(38,0)) * c_w THEN 1
               |WHEN CAST(c_sw AS DECIMAL(38,0)) * t_c
               |   < CAST(t_s AS DECIMAL(38,0)) * c_w THEN -1
               |ELSE 0 END""".stripMargin.replace("\n", " "))
          .cast("long").as("dir"),
        expr(s"""CASE WHEN abs(__s) > ${Long.MaxValue / 2}BD THEN
                |  CAST(raise_error('keynessOf: G2 lane exceeds the
                | BIGINT-exact bound — widen the output lane') AS BIGINT)
                |ELSE 2 * CAST(__s AS BIGINT) END"""
          .stripMargin.replace("\n", " ")).as("g2_micro"))
  }

  /** X132 — Dunning log-likelihood keyness (Dunning 1993, "Accurate
    * Methods for the Statistics of Surprise and Coincidence"): per
    * (group, word), the G² statistic of the 2×2 contingency table
    * (word-in-group vs word-in-rest) — the classic corpus-linguistics
    * keyness measure, and the surprise-robust alternative to the x99
    * PMI lane for SMALL counts (PMI explodes on rare words; G² is
    * likelihood-calibrated). `dir` carries whether the word is over-
    * (+1) or under- (−1) represented in its group, so the pair
    * (dir, g2_micro) ranks signature vocabulary per slice — the
    * domain-mixture fingerprint behind source reweighting.
    *
    * SHAPE AT 100 TB: identical to [[unigramKl]] — one (group, word)
    * type-grain exchange with map-side combine builds the pinned count
    * table; the word-marginal join is vocab-keyed, group totals
    * broadcast group-sized, the corpus total rides a 1-row broadcast.
    * `minCount` gates the output to recurring (group, word) cells.
    * Null groups/texts are excluded from slice and pool (the x131
    * rule; the oracle mirrors with IS NOT NULL).
    *
    * Output: (grp, w, c_sw, dir, g2_micro) for cells with c_sw ≥
    * minCount.
    */
  def dunningKeyness(docs: DataFrame, grpCol: String, textCol: String,
                     minCount: Long): DataFrame =
    keynessOf(groupWordCounts(docs, grpCol, textCol)
      .localCheckpoint(false), minCount)

  /** X137 — exact two-sample Kolmogorov–Smirnov drift per group: for
    * each slice (source), the KS statistic D = max_x |F_slice(x) −
    * F_pool(x)| between the slice's value distribution and the pooled
    * corpus — the BIN-FREE drift audit (x104 PSI needs a binning
    * choice; KS evaluates every jump point exactly, so a shifted tail
    * cannot hide inside a wide bin). Evaluated over the exact integer
    * cross-difference |cum_s·n_pool − cum_pool·n_s| at every pool jump
    * point, in DECIMAL(38,0) lanes (the products pass BIGINT near
    * 3·10⁹ rows per side), then one integral divide to ppm. `at_val`
    * is the SMALLEST value attaining the maximum (deterministic under
    * ties) — where the distributions diverge most.
    *
    * SHAPE AT 100 TB: one (group, value) exchange with map-side
    * combine builds the count table; the evaluation grid is groups ×
    * distinct values (attribute-bounded, never corpus-sized), filled
    * by TWO cumulative windows partitioned by group — no window ever
    * sees corpus-grain rows. The pool marginal folds from the same
    * pinned count table (the x127 contract).
    *
    * Output: (grp, n, d_ppm, at_val), one row per non-null group.
    *
    * @param scale 0 (default) = integer-grain contract: the value
    *   column must already be integral, fractional columns are refused
    *   loudly. > 0 = FIXED-POINT grain for continuous values: each
    *   value maps to `floor(v * scale)` (micro-units at scale 10⁶) and
    *   the KS grid runs over those exact integers — `at_val` is then in
    *   scaled units. floor, not a long cast: Spark's fractional cast
    *   truncates toward zero while other engines round, floor is the
    *   one map every engine computes identically.
    */
  /** X160 — metadata field ASSOCIATION audit: Pearson's chi-square and
    * Cramér's V (Cramér 1946) for each candidate field PAIR — "are
    * language, source, and length independent dimensions of this
    * corpus, or shadows of one another?" The complement of x155: Gini
    * gain asks what predicts the GATE; this asks what predicts WHAT,
    * which is the first question of any stratified sampling or
    * quota design (quota on source ≈ quota on language when V is
    * high — the strata are not really separate).
    *
    * ARITHMETIC: margins and cell counts are exact integers; each
    * grid cell contributes round(1e6·(O−E)²/E) with E = r·c/n in
    * DOUBLE — per-cell micro rounding (the x136 per-term seam) so the
    * distributed sum is an INTEGER sum, order-insensitive; no double
    * ever crosses an exchange. (O−E)²/E and the final
    * sqrt(chi2 / (n·min(r−1,c−1))) are IEEE arithmetic — identical in
    * any engine, unlike ln (division, multiplication and sqrt are
    * correctly rounded by the standard). ZERO cells of the full
    * margin grid contribute E exactly ((0−E)²/E = E), so the grid is
    * margins × margins LEFT-JOINED to observed cells (the x152 grid
    * discipline). Single-valued fields give dof = 0: chi2 is 0 and V
    * is NULL (undefined, not zero). Null field values are REAL groups.
    *
    * SHAPE AT 100 TB: ONE corpus fold to the fields' cross grain
    * (attribute-cross-product-bounded, localCheckpoint-pinned, the
    * x155/x148 shape); per pair, margins and the grid are rollups of
    * that one exchange — cells are dozens×dozens, nothing corpus-scale
    * repeats per pair.
    *
    * Output: (field_a, field_b, n_docs, n_a, n_b, dof, chi2_micro,
    * cramers_v_micro), one row per pair, fields in given order.
    */
  def fieldAssociation(docs: DataFrame,
                       pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "need at least one field pair")
    val fields = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val cross = docs.select(fields.map(col): _*)
      .groupBy(fields.map(col): _*)
      .agg(count(lit(1)).as("n_c"))
      .localCheckpoint(false)
    pairs.map { case (fa, fb) =>
      val obs = cross.groupBy(col(fa), col(fb))
        .agg(sum(col("n_c")).as("o"))
      val ra = cross.groupBy(col(fa)).agg(sum(col("n_c")).as("r"))
      val rb = cross.groupBy(col(fb)).agg(sum(col("n_c")).as("c"))
      val tot = broadcast(cross.agg(
        coalesce(sum(col("n_c")), lit(0L)).as("n")))
      // margins × margins LEFT JOIN observed — null-safe per
      // attribute: null field values are real classes (the x149 rule)
      val cells = ra.crossJoin(rb)
        .join(obs, ra(fa) <=> obs(fa) && rb(fb) <=> obs(fb), "left")
        .select(col("r"), col("c"), coalesce(col("o"), lit(0L)).as("o"))
        .crossJoin(tot)
        .select(expr(
          """CAST(round((CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
            |  * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / n)
            |  / (CAST(r AS DOUBLE) * c / n) * 1000000) AS BIGINT)"""
            .stripMargin.replace("\n", " ")).as("term"))
      cells
        .agg(coalesce(sum(col("term")), lit(0L)).as("chi2_micro"))
        .crossJoin(tot)
        .crossJoin(broadcast(ra.agg(count(lit(1)).as("n_a"))))
        .crossJoin(broadcast(rb.agg(count(lit(1)).as("n_b"))))
        .select(lit(fa).as("field_a"), lit(fb).as("field_b"),
          col("n").as("n_docs"), col("n_a"), col("n_b"),
          expr("CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(0 AS BIGINT)" +
            " ELSE (n_a - 1) * (n_b - 1) END").as("dof"),
          col("chi2_micro"))
        .withColumn("cramers_v_micro", expr(
          """CASE WHEN dof = 0 OR n_docs = 0 THEN CAST(NULL AS BIGINT)
            |ELSE CAST(round(sqrt((CAST(chi2_micro AS DOUBLE) / 1000000)
            |  / (CAST(n_docs AS DOUBLE)
            |     * least(n_a - 1, n_b - 1))) * 1000000) AS BIGINT)
            |END""".stripMargin.replace("\n", " ")))
    }.reduce(_ unionByName _)
  }

  /** X163 — source VOCABULARY overlap: type-level Jaccard between
    * every source pair — do two feeds write with the same words?
    * x140's who-copies-whom matrix fires only on near-identical
    * DOCUMENTS; vocabulary overlap sees the softer relationship
    * (same register, same template family, same upstream wire
    * service) that survives paraphrase. High lexical overlap between
    * nominally distinct sources is the classic sign that a "diverse"
    * mixture is not — the number a UniMax/temperature mixture design
    * wants before trusting its source boundaries.
    *
    * SHAPE AT 100 TB: ONE (source, word) DISTINCT exchange
    * (vocabulary-grain, localCheckpoint-pinned); the pair
    * intersection self-joins ON THE WORD, so the quadratic factor is
    * sources-per-word — bounded by K² per word with K in the dozens,
    * never corpus-sized. The pair grid derives from the size table so
    * zero-overlap pairs still get a row (fixed K·(K−1)/2 output).
    *
    * Output: (src_a, src_b, v_a, v_b, n_shared, jaccard_ppm) with
    * src_a < src_b; null sources excluded (the x131 rule), null texts
    * contribute no vocabulary.
    */
  def vocabOverlap(docs: DataFrame, srcCol: String,
                   textCol: String): DataFrame = {
    val sw = docs
      .filter(col(srcCol).isNotNull && col(textCol).isNotNull)
      .select(col(srcCol).as("src"),
        explode(split(col(textCol), " ")).as("w"))
      .distinct()
      .localCheckpoint(false)
    val sizes = sw.groupBy(col("src")).agg(count(lit(1)).as("v"))
    val inter = sw.as("a").join(sw.as("b"),
        col("a.w") === col("b.w") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    sizes.as("sa").join(sizes.as("sb"), col("sa.src") < col("sb.src"))
      .select(col("sa.src").as("src_a"), col("sb.src").as("src_b"),
        col("sa.v").as("v_a"), col("sb.v").as("v_b"))
      .join(inter, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"), col("v_a"), col("v_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"))
      .withColumn("jaccard_ppm", expr(
        "CAST(CAST(n_shared AS DECIMAL(38,0)) * 1000000" +
          " div (v_a + v_b - n_shared) AS BIGINT)"))
  }

  def ksDrift(docs: DataFrame, grpCol: String, valCol: String,
              scale: Long = 0L): DataFrame =
    ksOf(groupValueCounts(docs, grpCol, valCol, scale)
      .localCheckpoint(false))

  /** The (grp, v, c) value-count table both [[ksDrift]] and the
    * streaming twin's delta build share (one tokenization/cast path,
    * the [[groupWordCounts]] contract). INTEGER-GRAIN by contract: the
    * jump-point grid and the exact cross-difference lanes are defined
    * over integral values (doc lengths, token counts, bucketed
    * scores); a fractional column would silently truncate every value
    * through the long cast and collapse the distributions, so with
    * `scale = 0` it is refused loudly. A positive `scale` serves the
    * continuous case directly: `floor(v * scale)` fixed-point units
    * (see [[ksDrift]] — floor is engine-identical, a fractional cast
    * is not).
    */
  private[graft] def groupValueCounts(docs: DataFrame, grpCol: String,
                                      valCol: String,
                                      scale: Long = 0L): DataFrame = {
    require(scale >= 0, s"ksDrift: scale must be >= 0: $scale")
    val dt = docs.schema(valCol).dataType
    val v =
      if (scale == 0L) {
        require(Seq("byte", "short", "integer", "long")
            .contains(dt.typeName),
          s"ksDrift: value column '$valCol' is ${dt.typeName} — the " +
            "KS grid is integer-grain; pass scale > 0 for fixed-point " +
            "units (e.g. scale = 1000000 for micro-units) or bucket " +
            "first (e.g. CAST(score * 1000 AS BIGINT))")
        col(valCol).cast("long")
      } else floor(col(valCol) * lit(scale)).cast("long")
    docs.filter(col(grpCol).isNotNull && col(valCol).isNotNull)
      .select(col(grpCol).as("grp"), v.as("v"))
      .groupBy(col("grp"), col("v")).agg(count(lit(1)).as("c"))
  }

  /** The KS lanes over an already-built (grp, v, c) count table — the
    * kernel the streaming twin calls with ACCUMULATED counts (counts
    * from disjoint batches merge by pure addition). The caller pins
    * the input: it feeds the pool fold, the grid, and the totals.
    */
  private[graft] def ksOf(counts: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pool = counts.groupBy(col("v")).agg(sum(col("c")).as("pc"))
    val groups = counts.groupBy(col("grp")).agg(sum(col("c")).as("n_s"))
    val nPool = counts.agg(sum(col("c")).as("n_pool"))
    // the evaluation grid: every group at every pool jump point, with
    // this group's own count at exactly that point (0 where absent)
    val grid = groups.crossJoin(broadcast(pool))
      .join(counts, Seq("grp", "v"), "left")
      .select(col("grp"), col("n_s"), col("v"), col("pc"),
        coalesce(col("c"), lit(0L)).as("c"))
    val wGrp = Window.partitionBy("grp").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val diffs = grid
      .withColumn("cum_s", sum(col("c")).over(wGrp))
      .withColumn("cum_p", sum(col("pc")).over(wGrp))
      .crossJoin(broadcast(nPool))
      .select(col("grp"), col("n_s"), col("v"), col("n_pool"),
        expr("""abs(CAST(cum_s AS DECIMAL(38,0)) * n_pool
               |  - CAST(cum_p AS DECIMAL(38,0)) * n_s)"""
          .stripMargin.replace("\n", " ")).as("cross"))
    val wRank = Window.partitionBy("grp")
      .orderBy(col("cross").desc, col("v").asc)
    diffs
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 1)
      .select(col("grp"), col("n_s").as("n"),
        expr("""CAST((cross * 1000000)
               |div (CAST(n_s AS DECIMAL(38,0)) * n_pool) AS BIGINT)"""
          .stripMargin.replace("\n", " ")).as("d_ppm"),
        col("v").as("at_val"))
  }
}
