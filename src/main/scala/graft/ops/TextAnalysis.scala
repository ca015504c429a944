package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X3 — text analysis for training-data pipelines (SURVEY §2.8): token
  * statistics, quality scoring, language-ID heuristic, BPE-ish token
  * counting, and document fingerprinting. Everything is built from
  * codegen'd array/string built-ins — per-row narrow work that scales
  * embarrassingly (no shuffle at all until a later aggregation).
  */
object TextAnalysis {

  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "for", "on", "with")

  /** Per-document token statistics + quality score:
    * n_tokens, n_distinct, avg token length, stopword ratio,
    * type-token ratio as `quality`.
    */
  def textStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = split(col(textCol), " ")
    val stop = array(Stopwords.map(lit): _*)
    docs.select(
      col(idCol),
      length(col(textCol)).as("n_chars"),
      size(ts).as("n_tokens"),
      size(array_distinct(ts)).as("n_distinct"),
      // Σ token lengths = chars minus the separators (split(" ") keeps
      // empty tokens, which contribute 0): one codegen'd
      // translate+length instead of an interpreted per-element fold
      round(length(translate(col(textCol), " ", "")).cast("long")
        .cast("double") / size(ts), 6).as("avg_tok_len"),
      round(size(filter(ts, t => array_contains(stop, t))).cast("double") / size(ts), 6)
        .as("stopword_ratio"),
      round(size(array_distinct(ts)).cast("double") / size(ts), 6).as("quality"))
  }

  /** Language-ID heuristic: stopword density over a small English lexicon;
    * >= threshold classifies as 'en'. (A real n-gram profile model slots in
    * behind the same column contract.)
    */
  def langId(docs: DataFrame, idCol: String, textCol: String,
             threshold: Double = 0.05): DataFrame = {
    val ts = split(col(textCol), " ")
    val stop = array(Stopwords.map(lit): _*)
    docs.select(col(idCol),
      round(size(filter(ts, t => array_contains(stop, t))).cast("double") / size(ts), 6)
        .as("en_score"))
      .withColumn("predicted_lang",
        when(col("en_score") >= threshold, lit("en")).otherwise(lit("other")))
  }

  /** BPE-ish token count: whitespace words, each contributing
    * ceil(len/4) subword pieces (4-chars-per-piece is the classic BPE
    * rule of thumb).
    */
  def tokenCount(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ts = split(col(textCol), " ")
    docs.select(col(idCol),
      size(ts).as("n_words"),
      aggregate(transform(ts, t => ceil(length(t) / lit(4.0))), lit(0L), _ + _)
        .as("n_bpe_tokens"))
  }

  /** Document fingerprint: digest of the normalized text plus a short
    * prefix fingerprint — the join key for exact dedup across shards.
    */
  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      md5(col(textCol)).as("fp"),
      substring(md5(col(textCol)), 1, 16).as("fp16"))

  // Conservative patterns valid in both Java regex (Spark) and RE2
  // (DuckDB) so the oracle runs the identical expressions.
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^ ]+"

  /** Canonical text normalization: lowercase, strip non-alphanumerics,
    * collapse runs of spaces, trim — pure row-local string ops.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** PII/URL scrubbing: emails and URLs replaced with typed placeholder
    * tokens (URLs first so mailto-ish text can't leak through partially).
    */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, UrlPattern, "<URL>"), EmailPattern, "<EMAIL>")

  /** Corpus vocabulary: top-k tokens by frequency (count desc, token asc
    * for determinism). One explode + one partial-aggregated count shuffle
    * of (token, long) pairs; the top-k is a TakeOrdered, not a full sort.
    */
  def vocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)

  /** Approximate corpus heavy hitters — the bounded-memory twin of
    * [[vocabulary]] via the native Misra-Gries aggregate
    * ([[graft.functions.MisraGries]]): at most k counters per partial
    * buffer regardless of distinct-token cardinality, so the shuffle
    * carries k entries per map task instead of one per distinct token.
    * Contract: every token with frequency > N/(k+1) appears; counts may
    * underestimate by at most N/(k+1).
    */
  def heavyHitters(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("token"))
      .agg(graft.functions.MisraGries.misra_gries(col("token"), k).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.token").as("token"), col("h.count").as("est_count"))

  /** X34 — corpus-common n-gram share (the cross-document complement of
    * [[repetition]]'s within-document gate): per document, what fraction
    * of its n-gram occurrences are n-grams shared widely ACROSS the
    * corpus. A high share marks template/boilerplate text (navigation
    * chrome, license headers, scraped mirror content) that within-doc
    * repetition cannot see because each document contains it only once.
    *
    * "Common" is relative — an n-gram is common when its document
    * frequency exceeds `commonPpm` parts-per-million of the corpus doc
    * count (`df * 1_000_000 > commonPpm * N`, exact integer comparison) —
    * so the gate keeps its meaning as the corpus grows; an absolute df
    * cutoff would go vacuous at 100× the data.
    *
    * Shape at 100 TB: ONE corpus scan — per-(doc, n-gram) occurrence
    * counts aggregate with map-side combine, document frequencies
    * DERIVE from that table (the [[Retrieval.tfIdfTopTerms]] trick: df
    * is a second aggregation of tf, not a second scan), and the
    * count⨝df join carries one row per DISTINCT (doc, n-gram) pair —
    * the duplicate-heavy occurrence stream never shuffles and never
    * joins. AQE broadcasts the df side while it is small and falls back
    * to a shuffle join when the n-gram table outgrows that; the
    * per-document roll-up aggregates (doc, 3×long) rows. The share is
    * fixed-point ppm — exact integers end to end, no float seam.
    */
  def commonNgramShare(docs: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, commonPpm: Long = 2000L): DataFrame = {
    val sh = graft.functions.Shingles.shingles(split(col(textCol), " "), n)
    val pairCounts = docs.select(col(idCol), explode(sh).as("ng"))
      .groupBy(col(idCol), col("ng")).agg(count(lit(1)).as("c"))
    val dfTab = pairCounts.groupBy(col("ng")).agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    pairCounts.join(dfTab, "ng")
      .crossJoin(broadcast(nDocs))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_ngrams"),
        sum(when(col("df") * lit(1000000L) > lit(commonPpm) * col("n_docs"),
          col("c")).otherwise(0L)).as("n_common"))
      .withColumn("common_ppm", expr("n_common * 1000000 div n_ngrams"))
  }

  /** X39 — feature hashing (the hashing trick; Weinberger et al. 2009):
    * sparse document vectors of fixed dimension with NO vocabulary pass —
    * each token hashes to a bucket, a second hash picks ±1, and the
    * bucket weight is the signed occurrence sum. The featurizer behind
    * scalable linear quality classifiers: stateless, so train- and
    * inference-time features can never drift, and new tokens need no
    * vocabulary rebuild.
    *
    * Output is the SPARSE long form (id, bucket, weight), weight-0
    * buckets (sign cancellations) dropped — the layout you persist and
    * feed to a sparse learner; densify with a pivot when needed.
    *
    * Shape at 100 TB: one narrow explode, then ONE map-side-combined
    * aggregation on (doc, bucket) — at most min(n_tokens, dim) rows per
    * document reach the shuffle. Hashes are md5 prefixes, bit-identical
    * in any engine (the [[Sample]] discipline), so the whole matrix is
    * oracle-checkable.
    */
  def featureHash(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int, seed: String = "fh"): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val tok = docs.select(col(idCol), explode(split(col(textCol), " ")).as("token"))
    // bucket: first 8 md5 hex chars of (seed|token) mod dim (non-negative)
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"$seed|"), col("token"))), 1, 8), 16, 10)
        .cast("long"),
      lit(dim.toLong))
    // sign: parity of the first hex digit of a second hash (seed's|token)
    val sign = when(
      conv(substring(md5(concat(lit(s"${seed}s|"), col("token"))), 1, 1), 16, 10)
        .cast("int") % 2 === 0, 1L).otherwise(-1L)
    tok.select(col(idCol), bucket.as("bucket"), sign.as("w"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("w")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  /** X129 — character-entropy quality signal: the Shannon entropy of a
    * document's character unigram distribution, the classic cheap
    * gibberish/encoding-noise detector (low entropy = repeated filler,
    * high entropy near ln(alphabet) = random bytes; prose sits in a
    * stable band). H = ln(n) − (Σ c·ln(c))/n over per-character counts
    * c — computed in micro-nat integer lanes: each term rounds to a
    * BIGINT BEFORE summing (round(ln(c)·c·10⁶), the X42/DSIR seam —
    * both engines' own ln on the same exact integers), so the sum is
    * order-independent and exact, never an unordered double fold. The
    * per-term lane needs n·ln(n)·10⁶ ≤ 2^63 per DOCUMENT — holds to
    * ~3·10¹¹ chars per doc, far past any real document.
    *
    * SHAPE AT 100 TB: a pure projection — the char array sorts
    * row-locally and ONE aggregate fold counts runs and accumulates
    * the micro-nat sum ([[repetition]]'s sorted-run kernel), so there
    * is NO per-char explode and ZERO shuffle; the relational
    * explode+groupBy(doc, char) twin is what the DuckDB oracle runs,
    * checking the fold/explode equivalence per document (the x64
    * discipline). Characters are CODEPOINT-grain on both engines
    * (Spark `split("")` / DuckDB character slicing — the x98 pinned
    * seam).
    *
    * Output: (idCol, n_chars, n_distinct, s_micro, entropy_micro,
    * norm_ppm) — entropy in micro-nats, norm_ppm = H/ln(n_distinct)
    * in ppm (0 for single-char alphabets, where H is exactly 0). DENSE
    * over non-null input: an empty text keeps a zero row.
    */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the sorted char array MATERIALIZED once as a column: the three
    // consumers below are CodegenFallback HOFs with no cross-column
    // CSE, so an inline split+filter+sort re-ran per consumer (the
    // Gopher lesson applied here in round 21)
    val pre = docs.filter(col(textCol).isNotNull)
      .select(col(idCol), array_sort(
        filter(split(col(textCol), ""), ch => length(ch) > 0)).as("__cs"))
    val cs = col("__cs")
    // run-entropy sum via the native one-pass kernel (bit-identical to
    // the interpreted aggregate fold it replaced — property-pinned in
    // SortedRunEntropySpec; the fold allocated a struct per char)
    val sMicro = graft.functions.SortedRunEntropy.sortedRunEntropy(cs)
    pre
      .select(col(idCol),
        size(cs).cast("long").as("n_chars"),
        size(array_distinct(cs)).cast("long").as("n_distinct"),
        sMicro.as("s_micro"))
      .withColumn("entropy_micro", expr(
        """CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
          |ELSE CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000) AS BIGINT)
          |  - (s_micro div n_chars) END""".stripMargin.replace("\n", " ")))
      // entropy_micro > 0 keeps the div non-negative (micro-rounding
      // can land H at −1 µnat near 0, where floor-div and trunc-div
      // engines would diverge)
      .withColumn("norm_ppm", expr(
        """CASE WHEN n_distinct > 1 AND entropy_micro > 0
          |THEN (entropy_micro * 1000000)
          |  div CAST(round(ln(CAST(n_distinct AS DOUBLE)) * 1000000)
          |    AS BIGINT)
          |ELSE CAST(0 AS BIGINT) END""".stripMargin.replace("\n", " ")))
  }

  /** X136 — character digram CONDITIONAL entropy H(Y|X): the
    * sequence-structure quality signal the unigram entropy ([[charEntropy]])
    * cannot see — "ababab…" has a full bit of unigram entropy but
    * H(Y|X) = 0 (every character determines its successor), which is
    * exactly the signature of generation loops, template filler, and
    * encoding stutter. Via the chain rule H(Y|X) = H(XY) − H(X), and
    * both joint and marginal are taken over the SAME m = n−1 bigram
    * positions, so the ln(m) terms cancel:
    * cond_micro = (s1_micro − s2_micro) div m, where s2 = Σ
    * round(ln(c_xy)·c_xy·10⁶) over bigram counts and s1 the same over
    * the bigram PREFIX counts (chars 1..n−1) — the [[charEntropy]]
    * per-run product-round seam, order-independent and exact. The
    * difference clamps at 0 before the divide (conditioning cannot
    * raise entropy; per-run rounding can dip the lane by a few µnats,
    * and floor-vs-trunc division diverges on negatives).
    *
    * SHAPE AT 100 TB: a pure projection — bigrams and prefix chars
    * sort row-locally and two [[charEntropy]]-style run folds
    * accumulate the lanes; NO explode, ZERO shuffle. The DuckDB oracle
    * runs the relational explode+groupBy twin, checking the
    * fold/explode equivalence per document. Codepoint grain on both
    * engines (the x98 pinned seam).
    *
    * Output: (idCol, n_bigrams, s1_micro, s2_micro, cond_micro) DENSE
    * over non-null input — docs under 2 chars keep an all-zero row.
    */
  def digramEntropy(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    // char array, then bigram/prefix arrays, MATERIALIZED as columns
    // before the folds read them (the charEntropy/Gopher lesson): the
    // inline forms re-ran the split+filter per consumer and the
    // Shingles kernel twice per row
    val pre = docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        filter(split(col(textCol), ""), ch => length(ch) > 0).as("__cs"))
      .select(col(idCol),
        graft.functions.Shingles.shingles(col("__cs"), 2).as("__bg"),
        slice(col("__cs"), lit(1),
          greatest(size(col("__cs")) - 1, lit(0))).as("__pre"))
    val bigrams = col("__bg")
    val prefixes = col("__pre")
    // run-entropy sums via the native one-pass kernel (charEntropy's
    // seam — property-pinned in SortedRunEntropySpec)
    def runFold(arr: Column): Column =
      graft.functions.SortedRunEntropy.sortedRunEntropy(array_sort(arr))
    pre
      .select(col(idCol),
        size(bigrams).cast("long").as("n_bigrams"),
        runFold(prefixes).as("s1_micro"),
        runFold(bigrams).as("s2_micro"))
      .withColumn("cond_micro", expr(
        """CASE WHEN n_bigrams = 0 THEN CAST(0 AS BIGINT)
          |ELSE greatest(s1_micro - s2_micro, CAST(0 AS BIGINT))
          |  div n_bigrams END""".stripMargin.replace("\n", " ")))
  }

  /** X159 — readability lanes per language (the syllable-heuristic
    * components of Flesch 1948 / Gunning 1952): average syllables per
    * word and the complex-word share (>= 3 syllables — the Gunning-Fog
    * "hard word" rule). Syllables use the classic vowel-GROUP count
    * (runs of `[aeiouy]+` on the lowercased word, clamped to >= 1 —
    * every word has a nucleus), the standard machine approximation.
    * The corpus has no sentence structure, so the words-per-sentence
    * term of the composite grades is deliberately NOT faked; the two
    * lanes shipped are the ones token streams support, and they are
    * the ones that move when a source starts shipping jargon, OCR
    * noise, or vowelless garbage. Null languages are excluded (the
    * x131 rule); null text contributes a zero-word document.
    *
    * ARITHMETIC: per-word counts are exact integers; the per-language
    * ratios are DECIMAL(38,0) micro/ppm floors (syllables·1e6 div
    * words; complex·1e6 div words), zero-guarded for an all-null-text
    * language.
    *
    * SHAPE AT 100 TB: pure scan-side row-local array work (split,
    * per-token regex, one fold) into ONE language-grain exchange with
    * map-side combine — the x131 shape.
    *
    * Output: (lang, n_docs, n_words, n_syllables, syll_per_word_micro,
    * n_complex, complex_ppm), one row per language.
    */
  def readability(docs: DataFrame, langCol: String,
                  textCol: String): DataFrame = {
    val ts = split(col(textCol), " ")
    def groups(t: Column): Column =
      size(regexp_extract_all(lower(t), lit("[aeiouy]+"), lit(0)))
    val syl = transform(ts, t =>
      greatest(lit(1L), groups(t).cast("long")))
    docs.filter(col(langCol).isNotNull)
      .select(col(langCol).as("lang"),
        coalesce(size(ts).cast("long"), lit(0L)).as("__w"),
        coalesce(aggregate(syl, lit(0L), (acc, x) => acc + x), lit(0L))
          .as("__s"),
        coalesce(size(filter(ts, t => groups(t) >= 3)).cast("long"),
          lit(0L)).as("__c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__w")).as("n_words"),
        sum(col("__s")).as("n_syllables"),
        sum(col("__c")).as("n_complex"))
      .select(col("lang"), col("n_docs"), col("n_words"),
        col("n_syllables"),
        expr("CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(CAST(n_syllables AS DECIMAL(38,0)) * 1000000" +
          " div n_words AS BIGINT) END").as("syll_per_word_micro"),
        col("n_complex"),
        expr("CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT)" +
          " ELSE CAST(CAST(n_complex AS DECIMAL(38,0)) * 1000000" +
          " div n_words AS BIGINT) END").as("complex_ppm"))
  }

  /** Repetition quality gate (the Gopher/MassiveText-style filter): per
    * document, the share of its n-grams taken by the single most repeated
    * one (`top_ngram_ratio`) and the duplicate-n-gram share
    * (`dup_ngram_ratio`) — the two classic knobs for dropping
    * boilerplate/spam before training.
    *
    * Computed ROW-LOCALLY: the n-gram array is sorted so equal n-grams
    * are adjacent, and one `aggregate` fold finds the longest run — no
    * explode, no (doc, ngram) shuffle, which is what makes this a
    * scan-side projection at 100 TB (the relational
    * explode+groupBy(doc, ngram) twin computes the same numbers at the
    * price of shuffling every n-gram occurrence; the DuckDB oracle runs
    * that form, so the equivalence is checked per row).
    * Docs too short for an n-gram are excluded (no n-gram population to
    * measure).
    */
  def repetition(docs: DataFrame, idCol: String, textCol: String,
                 n: Int = 2): DataFrame = {
    val sh = graft.functions.Shingles.shingles(split(col(textCol), " "), n)
    val sorted = array_sort(sh)
    val zero = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
    val maxRun = aggregate(sorted, zero,
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    docs.select(col(idCol),
        size(sh).cast("long").as("n_ngrams"),
        size(array_distinct(sh)).cast("long").as("n_distinct"),
        maxRun.as("top_ngram_count"))
      .filter(col("n_ngrams") > 0)
      .withColumn("top_ngram_ratio",
        round(col("top_ngram_count").cast("double") / col("n_ngrams"), 6))
      .withColumn("dup_ngram_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_ngrams"), 6))
  }
}
