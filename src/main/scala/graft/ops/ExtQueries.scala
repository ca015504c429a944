package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Oracle-checked batch forms of the X1-X4 extension operators
  * (SURVEY §2.8) over the `documents` / `embeddings` / `events` tables.
  * Same contract as PumpQueries: identical aliases on both sides,
  * deterministic ORDER BY, integer-exact or rounded numerics.
  */
object ExtQueries {

  private val JaccardThreshold = 0.8
  private val EmbDupThreshold = 0.4
  private val TopK = 5
  private val NumQueries = 10
  // IVF knobs shared by the Scala call AND the oracle SQL — interpolated
  // into both so changing one cannot silently desync the other (a desync
  // surfaces only as an opaque hash mismatch)
  private val IvfNlist = 8
  private val IvfNprobe = 4
  // PQ knobs — shared by the Scala call and the oracle generator.
  // 16 subspaces x 64 codes = 96 bits/vector (~21x compression at dim 64)
  // measured at recall@5 ~ 0.6 vs brute force on the test corpora
  private val PqNumSub = 16
  private val PqCodes = 64
  // IVF-PQ knobs (coarse pruning + residual compression)
  private val IvfPqNlist = 8
  private val IvfPqNprobe = 4
  // X51 refine tier: exact re-rank of the top-R ADC candidates from a
  // wider probe (the FAISS refine recipe — recall ceiling becomes the
  // candidate lists' coverage of the true top-k)
  private val RefineNprobe = 6
  private val RefineR = 50
  // X51 multi-probe sign-LSH: probe all buckets within Hamming distance
  // ProbeDist of the query's own (6 bucket bits, as the x2_ann_lsh tier)
  private val LshBits = 6
  private val LshProbeDist = 2
  // curation knobs — same shared-constant discipline
  // X116 knobs: eval-holdout fraction (the x13 eval slice's rate) and
  // the id offset of the injected exact-duplicate clone slice
  private val EvalHoldoutFrac = 0.1
  private val E2eCloneOffset = 1000000L

  // X122 knobs: JL projection geometry (64-dim embeddings -> 16), and
  // the coarse-cut width of the JL-fronted ANN tier (RefineR's sizing)
  private val JlDIn = 64
  private val JlDOut = 16
  // 150 (was 50): chosen from the x51_jl_sweep frontier — at fixed
  // dOut=16, candR 50->150 lifts recall@5 0.40->0.76 at sf0.01 while
  // costing only re-rank work (candR exact cosines per query); the
  // dOut=32 arm buys 0.82 but doubles the CORPUS-sized projected scan,
  // the term that dominates at 100 TB. candR is the cheap knob.
  private val JlCandR = 150

  /** x51_jl_sweep knob arms: (method name, dOut, candR) as LITERALS —
    * the sweep prices fixed points of the frontier regardless of what
    * the shipping default ([[JlDOut]], [[JlCandR]] — the d16_r150 arm)
    * currently is. Width dOut prices the projected scan (dOut/dIn of
    * brute force); radius candR prices the exact re-rank (candR/N of
    * the corpus per query).
    */
  private val JlSweepArms: Seq[(String, Int, Int)] = Seq(
    ("jl_d08_r050", 8, 50),
    ("jl_d16_r050", 16, 50),
    ("jl_d16_r150", 16, 150),
    ("jl_d32_r100", 32, 100))

  // X126 knob: candidate context lengths (spanning shorter-than-most-
  // docs through longer-than-every-doc at test SF)
  private val SeqLenGrid = Seq(16L, 32L, 64L, 128L, 512L)

  // X127 knobs: the classic word2vec t = 1e-5 (in ppm) and the hash seed
  private val SubsampleTPpm = 10L
  private val SubsampleSeed = "w2v"

  // X130 knob: dispersion reported for words in >= 5% of documents
  // (25 docs at sf0.01) — the df-1 tail is vocabulary-sized noise
  private val BurstMinDf = 25L

  // X128 knobs: 10% document-frequency removal threshold; the first
  // two injected lines sit above it at both test SFs, the rare banner
  // below it (the retention arm) — see [[boilerPage]]
  private val BoilerFracPpm = 100000L
  private val BoilerNewsletter = "subscribe to our newsletter today"
  private val BoilerRights = "all rights reserved worldwide"
  private val BoilerRare = "rare cookie banner text"

  // X123 knob: candidate vocab sizes (the last exceeds every per-lang
  // vocabulary at test SF — the full-coverage fallthrough case)
  private val VocabSizes = Seq(100L, 1000L, 5000L, 20000L)

  // X117 knob: cosine micro-ppm threshold, calibrated to this synthetic
  // embedding corpus (max corpus-vs-eval cosine p75 ≈ 0.32, p99 ≈ 0.44
  // at sf0.01 — 0.35 exercises both verdicts; a real text-embedding
  // decon runs at 0.9+)
  private val SemDeconTauPpm = 350000L
  private val SplitSeed = "split"
  private val SplitTrain = 0.8
  private val SplitValid = 0.1 // cumulative train+valid = 0.9
  private val QuotaSeed = "q"
  private val QuotaPerDomain = 5
  // curation-pipeline gates (x22): thresholds sit mid-distribution so
  // each stage really filters (quality median ~0.46, dup p75 ~0.047)
  private val CurateQualityMin = 0.35
  private val CurateDupMax = 0.05
  private val KeynessMinCount = 5L
  private val KAnonK = 5L
  private val KAnonBucket = 50L
  // x147: the sweep's candidate release thresholds (KAnonK included so
  // the single-k audit row is reproducible from the curve)
  private val KAnonSweepKs = Seq(2L, 5L, 10L)
  // x148: candidate length-bucket widths, multiples of KAnonBucket so
  // coarser class tables roll up from the finest (one corpus pass)
  private val KAnonGenBuckets = Seq(KAnonBucket, 2 * KAnonBucket,
    4 * KAnonBucket, 8 * KAnonBucket)
  // x153: keyword list depth for the corpus TextRank
  private val TextRankTopK = 50
  // x157: Zermelo fixed-point iterations for the Bradley-Terry
  // strength scale (oracle unrolls them, x153-style); 5 rounds move
  // the sf0.01 scale well past visible convergence drift
  private val BtIters = 5
  // x158: the gate-sweep grid — the shipping (CurateQualityMin,
  // CurateDupMax) point is ON the grid so the curve prices the x116
  // gate itself alongside a looser and a tighter arm per axis
  private val QualitySweepArms = Seq(0.25, CurateQualityMin, 0.5)
  private val DupSweepArms = Seq(0.02, CurateDupMax, 0.1)
  // x151: candidate l values (the sensitive attribute is the 3-valued
  // x94 verdict, so l=3 is the maximum achievable diversity)
  private val LDivLs = Seq(2L, 3L)
  // x152: t-closeness breach threshold, ppm of total-variation EMD
  private val TClosePpm = 200000L
  private val PackShards = 8
  private val PackChunkTokens = 512
  private val RangeJoinWindowUs = 7L * 86400L * 1000000L // 7 days
  // retrieval / LM / graph knobs (round 6) — shared-constant discipline
  private val TfIdfTopK = 3
  private val Bm25Terms = Seq("spark", "join", "vector")
  private val Bm25TopK = 20
  private val PageRankIters = 3
  // X31 target mixture (parts-per-million) over three sources + its seed
  // private[graft]: ScaleProbe builds its 10x dim table from the SAME
  // constant so the probe cannot drift from the oracle-gated weights
  private[graft] val MixtureWeightsPpm =
    Map("src0" -> 500000L, "src1" -> 300000L, "src2" -> 200000L)
  private val MixtureSeed = "m"
  // X33 token-window chunking (stride < size: overlapping windows)
  private val ChunkSize = 16
  private val ChunkStride = 8
  // X34 common-ngram gate: common iff df * 10^6 > CommonNgramPpm * n_docs
  // (relative to corpus size — 2000 ppm sits at the df median of both
  // test SFs, so the gate genuinely splits)
  private val CommonNgramPpm = 2000L
  // X35 phrase query (safe lowercase tokens; present at both test SFs)
  private val PhraseTerms = Seq("value", "table", "part")
  // X36 SemDeDup cosine threshold (permille); nlist reuses IvfPqNlist so
  // the session-cached coarse centroids serve both operators
  private val SemDedupTauPermille = 400L
  // X37 distributed k-means rounds (iters assignment rounds, one
  // centroid update between consecutive rounds — oracle unrolls them)
  private val KMeansK = 8
  private val KMeansIters = 2
  // X39 feature-hashing dimension + seed (shared with the oracle SQL)
  private val FeatureHashDim = 64
  private val FeatureHashSeed = "fh"
  // X40 temperature flattening (permille exponent) + seed; the derived
  // integer weights inline into the oracle (driver pow — see
  // Sample.temperatureWeightsPpm)
  private val TempAlphaPermille = 300L
  private val TempMixSeed = "tm"
  @volatile private var lastTempWeights: Option[Map[String, Long]] = None
  // X44 BPE merge-training rounds (oracle unrolls them, x37-style)
  private val BpeIters = 4
  // X86 unigram-LM knobs: max piece length, seed multi-char vocabulary
  // size, Viterbi-EM rounds (oracle unrolls them, x37-style)
  private val UniPieceLen = 4
  private val UniTopMulti = 48
  private val UniEmIters = 2
  // X59 averaged-perceptron epochs (oracle unrolls them, x37-style);
  // features reuse the X39 dim + seed so the two matrices are identical
  private val PerceptronEpochs = 3
  // X61 DSIR knobs: hashed n-gram bucket count, selection size, hash
  // seed; the target slice is lang='en' (the "select data that looks
  // like the target language" instantiation)
  private val DsirDim = 256
  private val DsirK = 100
  private val DsirSeed = "ds"
  // X62 prototype-prune fraction (ppm of each cluster dropped); nlist
  // reuses IvfPqNlist so the session-cached coarse centroids serve the
  // whole embedding-curation family (x21/x36/x62)
  private val ProtoPrunePpm = 250000L
  // X64 C4-cleaning synthesis: the word-soup corpus has no line
  // structure, so (x53's HTML-shell precedent) the wiring derives a
  // deterministic "\n"-paged twin — C4Width-word lines, with the rule
  // triggers injected by doc_id/line arithmetic replayed verbatim in
  // the oracle: a missing terminal '.' every 4th (doc_id+i), a
  // "javascript" mention every 13th, and page-level '{' / "lorem
  // ipsum" markers on line 0 of every 17th / 19th doc
  private val C4Width = 7
  private val C4MinWords = 3
  private val C4MinLines = 5
  // X66 UniMax: budget/epoch knobs sized so the sf0.01 language table
  // exercises every branch — de caps at 2 epochs (7098 <= the 36000
  // budget's 5-way share), the other four share the leftover with a
  // 2-token remainder (fr/es get +1), and e_full lands at 2/1/1/1/0
  // with a nonzero partial epoch for fr/es/zh/en
  private val UniMaxBudget = 36000L
  private val UniMaxEpochs = 2L
  private val UniMaxSeed = "um"
  // X65 Gopher synthesis (same paged-twin idea, different injections):
  // a "- " bullet every 11th (doc_id+i), an "..." ending instead of "."
  // every 4th, a " # #" symbol pair every 6th, a non-alphabetic "12345"
  // every 9th, and the stopword pack " of and that" on line 0 of every
  // doc_id % 3 != 0 doc (so the >= 2-stopwords rule actually splits the
  // corpus — the word-soup vocabulary carries only "the" natively)
  // X70 epoch-shuffle knobs: 16 shards exercises the prefix-mod
  // mapping (256 groups over 16 shards = 16 groups each), seed "ep"
  private val EpochShards = 16
  private val EpochSeed = "ep"
  // X72 code-twin synthesis: doc_id % 3 == 0 docs code-ify (odd lines
  // indent "  int " + end " = 1;", even lines end " {") — indent,
  // punct-line, and symbol signals all fire, keyword stays just under
  // its threshold; % 3 == 1 docs indent alternate lines only (ONE vote
  // — pinned prose, exercising the >= 2 rule); % 3 == 2 stay plain
  // X73 script-twin phrases (appended per doc_id % 5, see scriptPage)
  private val CyrPhrase = " привет мир"
  private val GrePhrase = " αβγ δεζ"
  private val HanPhrase = " 中文 文本"
  // X74 Bloom gate: 2^18-bit bitmap (4096 longs), 4 md5 lanes — the
  // oracle is the NAIVE exact join (x48 discipline: the gate has no
  // false negatives, so gate-then-verify == exact, proven per run)
  private val BloomBits = 1 << 18
  private val BloomK = 4
  // X75 HITS rounds (oracle unrolls them, x28-style)
  private val HitsIters = 3
  // X84 label-propagation rounds (oracle unrolls them)
  private val LpaIters = 3
  // X78 bitext-margin NN depth (Artetxe & Schwenk's k)
  private val BitextK = 5
  // X79 simhash Hamming radius (Manku et al.'s d=3 over 64 bits)
  private val SimhashMaxDist = 3
  // X80 hybrid-fusion knobs: RRF constant K=60 (the paper's value) and
  // the per-ranker list depth (reuses Bm25TopK so the sparse side IS
  // x25's ranking); the dense query is embedding vec 0
  private val RrfK = 60
  private val RrfQueryVec = 0L
  // X81 span corruption: anchor grid 8, spans 1-3 tokens, fire p=0.6
  // => expected corruption 0.6*2/8 = 15% of tokens (T5's rate)
  private val SpanGrid = 8
  private val SpanMax = 3
  private val SpanP = 0.6
  private val SpanSeed = "sc"
  // X83 linear counting: 16^4 = 65536 buckets — load factor stays well
  // under 1 for per-source distinct shingles at both test SFs
  private val SketchHexDigits = 4
  // X88 HyperLogLog: 16^2 = 256 registers — deliberately 256x less
  // state than x83 on the same input; HLL's max-rank registers don't
  // saturate, which is the point of the comparison
  private val HllHexDigits = 2
  // X89 Count-Min: 4 lanes x 256 buckets = 1024 counters against a
  // vocabulary orders larger — collisions are real at both test SFs,
  // so over_ppm measures the sketch, not a degenerate exact pass
  private val CmsDepth = 4
  private val CmsHexDigits = 2
  private val HeavyTopK = 20
  // X90 WordPiece rounds — same bounded-loop budget as BpeIters; each
  // round is two type-table aggregations + a 1-row argmax
  private val WpIters = 4
  // X91 quantile summary: 8 shards x 50 kept rows — rank-error bound
  // n/50 + 8 (2% + slack), loose enough to hold at every SF, tight
  // enough that the in-plan assert means something
  private val QShards = 8
  private val QK = 50
  private val QPhisPpm = Seq(250000L, 500000L, 750000L)
  // X92 KMV: 128 minimum digests per corpus per source — small enough
  // that both test SFs exercise the k-th-smallest truncation, large
  // enough that the Jaccard estimate lands near the exact audit
  private val KmvK = 128

  /** The x64 paged twin of `documents`: (doc_id, page) with the
    * synthesis documented at [[C4Width]] — pure higher-order functions,
    * zero shuffle, so the synthetic page costs what a real multi-line
    * page column would.
    */
  private def c4Page(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val lines = transform(sequence(lit(0), nl - lit(1)), i =>
      concat(array_join(slice(ts, i * C4Width + 1, lit(C4Width)), " "),
        when((id + i) % 13 === 0, lit(" javascript")).otherwise(lit("")),
        when(id % 17 === 0 && i === 0, lit(" {")).otherwise(lit("")),
        when(id % 19 === 0 && i === 0, lit(" lorem ipsum")).otherwise(lit("")),
        when((id + i) % 4 =!= 3, lit(".")).otherwise(lit(""))))
    docTokens(s, dir).select(id, array_join(lines, "\n").as("page"))
  }

  /** documents projected to (doc_id, ts): the token array MATERIALIZED
    * as a real column before any `transform` lambda references it. An
    * interpreted lambda re-evaluates captured subtrees per ELEMENT (the
    * Gopher/x69 lesson, which the line builders below had not yet
    * applied to themselves): with `ts` inline, every generated line
    * re-ran `split(text)` — O(lines × tokens) per document; as an
    * attribute the lambda reads a row field. CollapseProject keeps the
    * two projections separate because the non-cheap alias is referenced
    * more than once (round-21 plan check).
    */
  private def docTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))

  /** The x65 paged twin (injections documented at the constant block). */
  private def gopherPage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val lines = transform(sequence(lit(0), nl - lit(1)), i =>
      concat(
        when((id + i) % 11 === 0, lit("- ")).otherwise(lit("")),
        array_join(slice(ts, i * C4Width + 1, lit(C4Width)), " "),
        when(id % 3 =!= 0 && i === 0, lit(" of and that")).otherwise(lit("")),
        when((id + i) % 6 === 0, lit(" # #")).otherwise(lit("")),
        when((id + i) % 9 === 0, lit(" 12345")).otherwise(lit("")),
        when((id + i) % 4 === 3, lit("...")).otherwise(lit("."))))
    docTokens(s, dir).select(id, array_join(lines, "\n").as("page"))
  }

  /** The x67 paged twin: width-[[C4Width]] lines where line i is a COPY
    * of line 0 whenever (doc_id + i) % 10 == 0 (i > 0) — injecting the
    * duplicate lines (and, through them, duplicate 5..7-grams) the
    * repetition signals measure; 2..4-gram repetition occurs naturally
    * in the word-soup vocabulary.
    */
  private def repPage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val chunk0 = array_join(slice(ts, lit(1), lit(C4Width)), " ")
    val lines = transform(sequence(lit(0), nl - lit(1)), i =>
      when((id + i) % 10 === 0 && i =!= 0, chunk0)
        .otherwise(array_join(slice(ts, i * C4Width + 1, lit(C4Width)), " ")))
    docTokens(s, dir).select(id, array_join(lines, "\n").as("page"))
  }

  /** The x69 paged twin: even docs cycle their first five width-
    * [[C4Width]] chunks (line i repeats chunk i mod 5), so every
    * 3-line span from line 6 onward duplicates an earlier one; odd
    * docs keep their natural distinct lines. Cross-doc span dedup is
    * spec-pinned on hand rows (chunks are doc-local, so the synthesis
    * cannot produce it).
    */
  private def cycPage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val lines = transform(sequence(lit(0), nl - lit(1)), i => {
      val j = when(id % 2 === 0, pmod(i, lit(5))).otherwise(i)
      array_join(slice(ts, j * C4Width + 1, lit(C4Width)), " ")
    })
    docTokens(s, dir).select(id, array_join(lines, "\n").as("page"))
  }

  /** The x128 paged twin: natural width-[[C4Width]] lines plus
    * cross-document boilerplate appended by doc_id arithmetic — the
    * newsletter line on every even doc, the rights line on every
    * third, and the rare banner on every 97th (below the
    * [[BoilerFracPpm]] document-frequency threshold at both test SFs,
    * so the retention arm fires).
    */
  private def boilerPage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val natural = transform(sequence(lit(0), nl - lit(1)), i =>
      array_join(slice(ts, i * C4Width + 1, lit(C4Width)), " "))
    def maybe(cond: Column, line: String): Column =
      when(cond, array(lit(line))).otherwise(array().cast("array<string>"))
    val page = array_join(concat(natural,
      maybe(id % 2 === 0, BoilerNewsletter),
      maybe(id % 3 === 0, BoilerRights),
      maybe(id % 97 === 0, BoilerRare)), "\n")
    docTokens(s, dir).select(id, page.as("page"))
  }

  /** The x73 script twin: the ASCII word-soup corpus is all-Latin, so
    * multi-script runs are appended by doc_id arithmetic — doc_id % 5
    * picks the script (1 Cyrillic, 2 Greek, 3 Han, 4 one mixed run of
    * all three), repeated (doc_id % 4) * 8 times so the appended script
    * sometimes outweighs the Latin base and the dominant verdict
    * actually switches. Phrases are shared constants spliced verbatim
    * into the oracle.
    */
  private def scriptPage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val page = concat(col("text"),
      when(id % 5 === 1,
        expr(s"repeat('$CyrPhrase', CAST((doc_id % 4) * 8 AS INT))"))
        .otherwise(lit("")),
      when(id % 5 === 2,
        expr(s"repeat('$GrePhrase', CAST((doc_id % 4) * 8 AS INT))"))
        .otherwise(lit("")),
      when(id % 5 === 3,
        expr(s"repeat('$HanPhrase', CAST((doc_id % 4) * 8 AS INT))"))
        .otherwise(lit("")),
      when(id % 5 === 4, lit(CyrPhrase + GrePhrase + HanPhrase))
        .otherwise(lit("")))
    Tables.documents(s, dir).select(id, page.as("page"))
  }

  /** The x72 code twin (synthesis documented at the [[EpochShards]]
    * constant block).
    */
  private def codePage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val lines = transform(sequence(lit(0), nl - lit(1)), i =>
      concat(
        when(id % 3 === 0 && i % 2 === 1, lit("  int "))
          .otherwise(when(id % 3 === 1 && i % 2 === 1, lit("  "))
            .otherwise(lit(""))),
        array_join(slice(ts, i * C4Width + 1, lit(C4Width)), " "),
        when(id % 3 === 0 && i % 2 === 1, lit(" = 1;"))
          .otherwise(when(id % 3 === 0, lit(" {")).otherwise(lit("")))))
    docTokens(s, dir).select(id, array_join(lines, "\n").as("page"))
  }

  /** The x68 paged twin: ALL the family's rule triggers on one page —
    * c4Page's javascript/brace/lorem + missing-punctuation endings,
    * gopherPage's bullets/stopwords/symbols/numerics plus "..." endings
    * on a separate cycle ((d+i)%5=4, so ellipsis lines still end in
    * C4-terminal punctuation), and repPage's duplicated lines — so the
    * three composed stages each gate on something real.
    */
  private def mtPage(s: SparkSession, dir: String): DataFrame = {
    val id = col("doc_id")
    val ts = col("ts")
    val nl = floor((size(ts) + lit(C4Width - 1)) / lit(C4Width)).cast("int")
    val chunk0 = array_join(slice(ts, lit(1), lit(C4Width)), " ")
    val lines = transform(sequence(lit(0), nl - lit(1)), i =>
      concat(
        when((id + i) % 11 === 0, lit("- ")).otherwise(lit("")),
        when((id + i) % 10 === 0 && i =!= 0, chunk0)
          .otherwise(array_join(slice(ts, i * C4Width + 1, lit(C4Width)),
            " ")),
        when(id % 3 =!= 0 && i === 0, lit(" of and that")).otherwise(lit("")),
        when((id + i) % 13 === 0, lit(" javascript")).otherwise(lit("")),
        when(id % 17 === 0 && i === 0, lit(" {")).otherwise(lit("")),
        when(id % 19 === 0 && i === 0, lit(" lorem ipsum")).otherwise(lit("")),
        when((id + i) % 6 === 0, lit(" # #")).otherwise(lit("")),
        when((id + i) % 9 === 0, lit(" 12345")).otherwise(lit("")),
        when((id + i) % 4 === 3, lit(""))
          .when((id + i) % 5 === 4, lit("..."))
          .otherwise(lit("."))))
    docTokens(s, dir).select(id, array_join(lines, "\n").as("page"))
  }

  /** Trained (merges, final word table), cached per (session, dir): one
    * training pass feeds both x44 queries — the artifact contract of
    * [[pqCodebookCache]].
    */
  private val bpeCache =
    new graft.engine.SessionCache[(Seq[Bpe.Merge], DataFrame)]
  private def bpeTrained(s: SparkSession, dir: String): (Seq[Bpe.Merge], DataFrame) =
    bpeCache.getOrCompute(s, dir) {
      Bpe.train(Tables.documents(s, dir), "text", BpeIters)
    }

  /** X90 WordPiece training artifact, cached per (session, dir) — one
    * training pass feeds both x90 queries, the bpeCache contract.
    */
  private val wpCache =
    new graft.engine.SessionCache[(Seq[WordPiece.Merge], DataFrame)]
  private def wpTrained(s: SparkSession,
                        dir: String): (Seq[WordPiece.Merge], DataFrame) =
    wpCache.getOrCompute(s, dir) {
      WordPiece.train(Tables.documents(s, dir), "text", WpIters)
    }

  /** The ENCODED corpus under the trained merges, cached per (session,
    * dir) and pinned: the vocabulary fold + corpus rejoin run once and
    * both x54 and the x77 fertility audit read the same table — the
    * bpeCache artifact contract one stage downstream.
    */
  private val bpeEncCache = new graft.engine.SessionCache[DataFrame]
  private def bpeEncoded(s: SparkSession, dir: String): DataFrame =
    bpeEncCache.getOrCompute(s, dir) {
      Bpe.encode(Tables.documents(s, dir), "doc_id", "text",
        bpeTrained(s, dir)._1).localCheckpoint(false)
    }

  /** The trained unigram-LM piece table, cached per (session, dir):
    * train() already pins each round's vocabulary eagerly (the table
    * IS checkpointed when it lands here), and one training pass feeds
    * both the x86 vocabulary query and the x86 fertility audit — the
    * bpeCache artifact contract.
    */
  private val uniCache = new graft.engine.SessionCache[DataFrame]
  private def uniTrained(s: SparkSession, dir: String): DataFrame =
    uniCache.getOrCompute(s, dir) {
      UnigramLm.train(Tables.documents(s, dir), "text",
        maxPieceLen = UniPieceLen, topMulti = UniTopMulti,
        emIters = UniEmIters)
    }

  /** The x42 classifier result, cached per (session, dir): model
    * training (the driver-side collects inside classify) runs once and
    * both x42 and the x46 mismatch audit read the same plan.
    */
  private val nbCache = new graft.engine.SessionCache[DataFrame]
  private def nbClassified(s: SparkSession, dir: String): DataFrame =
    nbCache.getOrCompute(s, dir) {
      val docs = Tables.documents(s, dir)
      val ref = Curate.splitAssign(docs, "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed).filter(col("split") === "train")
      // margin carried for x124's reliability audit; x42/x46 project
      // it away so their oracle-hashed output is unchanged. PINNED
      // (the knScored contract): the per-doc verdict table is tiny and
      // FIVE queries read it (x42, x46, x107, x124, x59_agreement) —
      // unpinned, each consumer run re-ran the whole scoring plan
      NaiveBayes.classify(docs, ref, "doc_id", "text", "lang",
        withMargin = true).localCheckpoint(false)
    }

  /** X59 perceptron pipeline, cached per (session, dir): training (the
    * per-epoch driver collects inside [[Perceptron.train]]) runs once
    * and both x59_linear_quality and the x59_agreement audit read the
    * same plan — the nbCache contract.
    */
  private val lpCache = new graft.engine.SessionCache[DataFrame]
  private def lpClassified(s: SparkSession, dir: String): DataFrame =
    lpCache.getOrCompute(s, dir) {
      val docs = Tables.documents(s, dir)
      val ref = Curate.splitAssign(docs, "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed).filter(col("split") === "train")
      Perceptron.classifyTrained(docs, ref, "doc_id", "text", "lang",
        dim = FeatureHashDim, seed = FeatureHashSeed,
        epochs = PerceptronEpochs)
        .localCheckpoint(false) // pinned — the nbCache contract above
    }

  // X41 substring-run window size and minimum shared span, in tokens;
  // k=6 makes random small-vocab collisions rare while the generator's
  // planted shared paragraphs (runs up to ~93 tokens) all survive
  private val SubstrK = 6
  private val SubstrMinSpan = 8
  // X47 winnowing window width (expected density 2/(w+1) of windows)
  private val WinnowW = 4
  // X49 content-defined chunking: window bytes + boundary rate 16^-zeros
  private val CdcKb = 8
  private val CdcHexZeros = 1
  /** The chunk table, materialized once per (session, dir) and shared by
    * x49 and the x50 ledger — the window-hash explode is the cost
    * center and the surviving chunk rows are small (the lshPairs trade).
    */
  private val cdcCache = new graft.engine.SessionCache[DataFrame]
  private def cdcChunked(s: SparkSession, dir: String): DataFrame =
    cdcCache.getOrCompute(s, dir) {
      Multimodal.cdcChunks(
        Multimodal.attachBlob(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id", "blob", kb = CdcKb, hexZeros = CdcHexZeros)
        .localCheckpoint(false)
    }

  /** The MinHash-LSH near-dup pair stage, MATERIALIZED once per
    * (session, table dir) and shared by `x1_minhash_lsh` and
    * `x9_components`: the pair list is the expensive part (signatures,
    * banding, bucket self-join, exact verify) and the survivors are tiny
    * (near-dup pairs — a sliver of the corpus), so `localCheckpoint`
    * costs one extra materialization of a handful of rows and saves the
    * clustering query a full recomputation of the pipeline. At 100 TB
    * this is the same pattern writ large: persist the verified pair list
    * (it is the natural intermediate table of a dedup pipeline) and run
    * clustering from it, never inline.
    */
  // per-(session, dir) memo — see graft.engine.SessionCache for why the
  // value side is softly referenced (a cached DataFrame strongly
  // references its own session)
  /** X93 per-node triangle table over the part co-purchase graph
    * (parts linked when they share an order), MATERIALIZED once per
    * (session, dir): the wedge join is the expensive stage and both
    * x93 queries read the same result — the lshPairs artifact
    * contract.
    */
  private val triCache = new graft.engine.SessionCache[DataFrame]
  private def copurchaseTri(s: SparkSession, dir: String): DataFrame =
    triCache.getOrCompute(s, dir) {
      val li = Tables.lineitem(s, dir)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v"))
      Graph.triangles(e).localCheckpoint()
    }

  private val lshPairsCache = new graft.engine.SessionCache[DataFrame]

  /** X116 — the flagship end-to-end pipeline (see the query's comment
    * for the stage list). Every frame with 2+ EXPENSIVE consumers is
    * pinned (localCheckpoint) so no stage re-executes a shared
    * upstream: the corpus parquet is scanned ONCE (plan-shape-pinned),
    * and each stage's drop set plus its survivor stream read the same
    * materialization — the session-cache/pin discipline the x44/x59
    * training artifacts established, applied to a linear pipeline.
    * The near-dedup keeper rule is pairwise (drop the LARGER id of
    * every confirmed pair) — deterministic, one pass, and exactly
    * replayable in SQL; a transitive-component keeper is x9's job.
    *
    * Round-22 restructuring (§1.2/§2):
    *  - the LEDGER (unsorted) is a per-(session, dir) artifact — the
    *    drop ledger IS what a production curation pipeline persists
    *    (the copurchaseTri/lshPairs contract). Before, every invocation
    *    re-ran the whole pipeline AND left ~12 unreleased corpus-sized
    *    checkpoint pins behind (bench runs were visibly climbing:
    *    7.2 → 10.8 s across x116's four runs as pins piled up).
    *  - the gate-drop branch is `sig.filter(NOT gatePass)` — the gate
    *    predicate is never NULL (its n_ngrams > 0 conjunct guards the
    *    one nullable input), so the complement is exact and the old
    *    corpus-sized left-anti exchange disappears.
    *  - survivor views (exactPass, nearPass) are FILTERS over the
    *    ranked pin, not second corpus-sized pins: re-filtering cached
    *    blocks is cheaper than materializing near-duplicate copies.
    *  - `lang` never reaches the ledger — dropped at the base
    *    projection, narrowing every pin (§2.3).
    */
  private val e2eLedgerCache = new graft.engine.SessionCache[DataFrame]
  private def e2ePipeline(s: SparkSession, dir: String): DataFrame =
    e2eLedgerCache.getOrCompute(s, dir) {
    import org.apache.spark.sql.expressions.Window
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("long")
    def ledger(ids: DataFrame, verdict: String): DataFrame =
      ids.select(col("doc_id"), lit(verdict).as("verdict"),
        nullS.as("split"), nullL.as("shard"),
        nullL.as("chunk_first"), nullL.as("n_chunks"))

    // ONE corpus read feeds the holdout split, the gate signals, the
    // eval shingle table, and the ledger. The corpus carries no exact
    // duplicates by construction, so a deterministic clone slice is
    // injected (the x7/x94 fixture discipline) — without it the exact-
    // dedup stage would be vacuously pinned
    val base = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint(false) // both union branches read THIS, not parquet
    val docs = base.unionByName(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + E2eCloneOffset).as("doc_id"),
          col("source"), col("text")))
      .localCheckpoint(false)
    // stage 0: eval holdout (the x60 discipline — eval never trains)
    val evalDocs = Sample.uniform(docs, "doc_id", EvalHoldoutFrac,
      seed = "eval").localCheckpoint(false)
    val corpus = docs.join(evalDocs.select(col("doc_id")),
      Seq("doc_id"), "left_anti")
    // stage 1: gate signals — x22's one scan-side projection (the
    // definition lives in Curate.gateSignals, shared with the x116
    // streaming twin so batch and stream gates cannot drift)
    val sig = Curate.gateSignals(corpus, "text").localCheckpoint(false)
    val gateCol = Curate.gatePass(CurateQualityMin, CurateDupMax)
    val gatePass = sig.filter(gateCol)
    // stage 2: exact dedup — first occurrence per normalized fingerprint
    val ranked = gatePass.withColumn("rn", row_number().over(
      Window.partitionBy("norm_fp").orderBy("doc_id")))
      .localCheckpoint(false)
    val exactPass = ranked.filter(col("rn") === 1).drop("rn", "norm_fp")
    // stage 3: MinHash-LSH near-dedup over survivors (x1 machinery)
    val nearDrop = Dedup.minhashLshPairs(exactPass, "doc_id", "text",
        numSigs = 16, rowsPerBand = 4, threshold = JaccardThreshold)
      .select(col("d2").as("doc_id")).distinct().localCheckpoint(false)
    val nearPass = exactPass.join(nearDrop, Seq("doc_id"), "left_anti")
    // stage 4: decontamination — any 8-shingle shared with an eval doc
    // (x13's join; the eval shingle set broadcasts, the x74 contract)
    val evalSh = Dedup.shingleTable(evalDocs, "doc_id", "text", n = 8)
      .select(col("s").as("es")).distinct()
    val deconDrop = Dedup.shingleTable(nearPass, "doc_id", "text", n = 8)
      .join(broadcast(evalSh), col("s") === col("es"))
      .select(col("doc_id")).distinct().localCheckpoint(false)
    val deconPass = nearPass.join(deconDrop, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // stage 5: per-source quota over survivors (x16's two-phase form)
    val quotaPass = Curate.domainQuota(deconPass, "doc_id", "source",
      quota = QuotaPerDomain, seed = QuotaSeed).localCheckpoint(false)
    val quotaDrop = deconPass.select(col("doc_id"))
      .join(quotaPass.select(col("doc_id")), Seq("doc_id"), "left_anti")
    // stage 6: split assignment (x15)
    val splitDone = Curate.splitAssign(quotaPass, "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed)
      .select(col("doc_id"), col("text"), col("split"))
      .localCheckpoint(false)
    // stage 7: pack the train split (x17)
    val packed = Curate.seqPack(splitDone.filter(col("split") === "train"),
        "doc_id", "text", shards = PackShards,
        chunkTokens = PackChunkTokens)
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        col("chunk_first"), col("n_chunks"))
    val kept = splitDone.join(packed, Seq("doc_id"), "left")
      .select(col("doc_id"), lit("kept").as("verdict"), col("split"),
        col("shard"), col("chunk_first"), col("n_chunks"))
    ledger(evalDocs, "eval_holdout")
      // complement FILTER over the sig pin, not a corpus-sized anti-join
      // (gateCol is never NULL — see the scaladoc)
      .unionByName(ledger(sig.filter(!gateCol), "gate"))
      .unionByName(ledger(ranked.filter(col("rn") > 1), "exact_dup"))
      .unionByName(ledger(nearDrop, "near_dup"))
      .unionByName(ledger(deconDrop, "decon"))
      .unionByName(ledger(quotaDrop, "quota"))
      .unionByName(kept)
      .localCheckpoint(false) // the session artifact: audit-sized rows
  }

  /** The positional k-gram window table over `documents`, PERSISTED once
    * per (session, dir) and shared by the whole substring family (x41
    * exhaustive runs, x47 winnowing, x48 two-tier, x45 removal): it is
    * the family's only corpus-sized intermediate — everything downstream
    * is either a sketch (2/(w+1) density) or a sliver (matched spans) —
    * and each of the four operators starts from the identical
    * scan + posexplode + md5 projection, so one pinned pass replaces
    * four. MEMORY_AND_DISK: at 100 TB the window table spills rather
    * than evicts mid-family, and a real pipeline running the family
    * together would persist exactly this stage (it is also what the x48
    * hot-window guard aggregation reads, so the guard costs a pin scan,
    * not a recompute).
    */
  private val windowTableCache = new graft.engine.SessionCache[DataFrame]
  private def substrWindows(s: SparkSession, dir: String): DataFrame =
    windowTableCache.getOrCompute(s, dir) {
      Dedup.windowTable(Tables.documents(s, dir), "doc_id", "text", SubstrK)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

  /** The trained PQ codebook, cached per (session, table dir): training
    * is a deterministic driver-local pass over a bounded sample — in a
    * real pipeline a persisted artifact trained once per corpus version,
    * so repeated queries must not re-collect the sample and re-run
    * k-means.
    */
  private val pqCodebookCache = new graft.engine.SessionCache[Array[Array[Array[Int]]]]
  private def pqCodebook(s: SparkSession, dir: String): Array[Array[Array[Int]]] =
    pqCodebookCache.getOrCompute(s, dir) {
      Similarity.trainPqCodebook(Tables.embeddings(s, dir), "embedding",
        PqNumSub, PqCodes)
    }

  /** The x36 SemDeDup result, MATERIALIZED once per (session, dir) and
    * shared by x36 and the x63 D4 composition (the [[cdcCache]]
    * contract): the in-cluster pair join is the cost center and the
    * per-vector verdict table is corpus-row-sized but narrow, so the
    * D4 stage reads the pin instead of re-running the pair stage.
    */
  private val semDedupCache = new graft.engine.SessionCache[DataFrame]
  private def semDeduped(s: SparkSession, dir: String): DataFrame =
    semDedupCache.getOrCompute(s, dir) {
      SemDedup.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
        nlist = IvfPqNlist, tauPermille = SemDedupTauPermille,
        centroids = Some(ivfPqTrained(s, dir)._1))
        .localCheckpoint(false)
    }

  /** Trained (coarse, residual codebook) for IVF-PQ, cached like
    * [[pqCodebookCache]]; ONE training-sample collect feeds both
    * trainers.
    */
  private val ivfPqCache =
    new graft.engine.SessionCache[(Array[Array[Int]], Array[Array[Array[Int]]])]
  private def ivfPqTrained(s: SparkSession, dir: String): (Array[Array[Int]], Array[Array[Array[Int]]]) =
    ivfPqCache.getOrCompute(s, dir) {
      val sample = Similarity.collectTrainingSample(
        Tables.embeddings(s, dir), "embedding")
      val coarse = Similarity.trainCoarseCentroids(sample, IvfPqNlist)
      (coarse, Similarity.trainResidualCodebook(sample, coarse, PqNumSub, PqCodes))
    }
  // X57 token-budget sampling: budget + seed (shared with the oracle).
  // 20k tokens sits mid-corpus at sf0.01 so the prefix genuinely cuts
  private val TokenBudget = 20000L
  private val TokenBudgetSeed = "tb"

  /** The x52 KN score table, MATERIALIZED once per (session, dir) and
    * shared by x52 and the x56 bucketing (the [[cdcCache]] contract):
    * the 9-join scoring pipeline is the cost center and the per-doc
    * score table is tiny, so the second consumer reads the pin instead
    * of re-running training + scoring.
    */
  private val knCache = new graft.engine.SessionCache[DataFrame]
  private def knScored(s: SparkSession, dir: String): DataFrame =
    knCache.getOrCompute(s, dir) {
      KneserNey.scoreWithModel(Tables.documents(s, dir), "doc_id", "text",
        knModel(s, dir)).localCheckpoint(false)
    }

  /** The x58 modified-KN (estimated-discount) score table, MATERIALIZED
    * once per (session, dir) — the same persisted-verdict-table
    * treatment [[knScored]] gives x52's scores: the 9-join
    * DECIMAL(38,0) scoring chain is the cost center (round-21 bench:
    * x58 re-ran it every invocation at ~3.6 s while x52 read its pin at
    * ~0.1 s), the per-doc output is tiny, and a production pipeline
    * persists exactly this table once per corpus version.
    */
  private val knMknCache = new graft.engine.SessionCache[DataFrame]
  private def knMknScored(s: SparkSession, dir: String): DataFrame =
    knMknCache.getOrCompute(s, dir) {
      KneserNey.scoreModifiedWithModel(Tables.documents(s, dir), "doc_id",
        "text", knModel(s, dir)).localCheckpoint(false)
    }

  /** The TRAINED KN model (the 9 join tables + constants), built and
    * pinned once per (session, dir) and shared by x52/x56 (fixed-
    * discount scoring) and x58 (estimated-discount scoring): training
    * is the same 5 exploded aggregations + 4 distinct passes over the
    * same reference slice in all three — the persisted model artifact
    * the [[KneserNey]] scaladoc already names, now literally shared the
    * way a production run shares it (train once per corpus version,
    * score many times).
    */
  private val knModelCache = new graft.engine.SessionCache[KneserNey.Model]
  private def knModel(s: SparkSession, dir: String): KneserNey.Model =
    knModelCache.getOrCompute(s, dir) {
      val docs = Tables.documents(s, dir)
      val ref = Curate.splitAssign(docs, "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed).filter(col("split") === "train")
      KneserNey.modelTables(ref, "text").pinned
    }

  /** The x51 refined top-k plan (wider-probe IVF-PQ candidates, exact
    * re-rank), shared by `x51_ann_refine` and the x43 audit row so the
    * candidate pipeline is built once per (session, dir).
    */
  private val refineCache = new graft.engine.SessionCache[DataFrame]
  private def ivfPqRefined(s: SparkSession, dir: String): DataFrame =
    refineCache.getOrCompute(s, dir) {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < NumQueries)
      val cands = Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding",
        RefineR, nlist = IvfPqNlist, nprobe = RefineNprobe,
        numSub = PqNumSub, codes = PqCodes,
        trained = Some(ivfPqTrained(s, dir)))
      Similarity.refineExact(emb, qs, "vec_id", "embedding", TopK, cands)
    }

  /** The ANN-audit RUN ARTIFACTS — the exact top-k ground truth plus
    * every approximate tier's (qid, cid, rank) run list — built once
    * per (session, dir) and shared by the three audit queries that
    * grade the SAME seven retrieval runs (x43 recall, x112 Kendall
    * tau, x113 nDCG) and by the x51 sweep's ground truth. This is how
    * a real eval harness works (the trec_eval model: retrieval runs
    * once, every metric reads the persisted run files), and the same
    * artifact contract [[knScored]]/[[refineCache]]/[[lshPairsCache]]
    * already established: the candidate pipelines are the cost center,
    * the run lists are audit-sized (queries × k rows), so each metric
    * query prices its metric fold, not a fourth rebuild of the seven
    * pipelines. Round-21 measurement: x112+x113+x43 each re-ran all
    * seven tiers + brute force (~10 s combined per bench leg at sf0.1);
    * shared runs collapse the redundancy.
    */
  private val annRunsCache =
    new graft.engine.SessionCache[(DataFrame, Seq[(String, DataFrame)])]
  private def annRuns(s: SparkSession, dir: String): (DataFrame, Seq[(String, DataFrame)]) =
    annRunsCache.getOrCompute(s, dir) {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < NumQueries)
      val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding",
        TopK).select("qid", "cid", "rank").localCheckpoint(false)
      val tiers = Seq(
        "ann_ivf" -> Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
          TopK, nlist = IvfNlist, nprobe = IvfNprobe),
        "ann_lsh" -> Similarity.lshTopK(emb, qs, "vec_id", "embedding",
          TopK, bits = LshBits),
        "ivf_pq" -> Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding",
          TopK, nlist = IvfPqNlist, nprobe = IvfPqNprobe,
          numSub = PqNumSub, codes = PqCodes,
          trained = Some(ivfPqTrained(s, dir))),
        "ivf_pq_refine" -> ivfPqRefined(s, dir),
        "jl_refine" -> jlShippingRun(s, dir),
        "lsh_multiprobe" -> Similarity.lshMultiProbeTopK(emb, qs, "vec_id",
          "embedding", TopK, bits = LshBits, probeDist = LshProbeDist),
        "pq_ann" -> Similarity.pqTopK(emb, qs, "vec_id", "embedding",
          TopK, numSub = PqNumSub, codes = PqCodes,
          codebook = Some(pqCodebook(s, dir))))
        .map { case (name, df) =>
          name -> df.select(col("qid"), col("cid"), col("rank"))
            .localCheckpoint(false)
        }
      (exact, tiers)
    }

  /** The x51 JL-sweep RUN ARTIFACTS — one (qid, cid, rank, sim) run
    * list per sweep arm, built once per (session, dir) and shared by
    * `x51_jl_sweep` (all four arms) and `x51_jl_refine` / the annRuns
    * "jl_refine" tier (the shipping d16_r150 arm IS that query's exact
    * pipeline) — the [[annRunsCache]] contract applied to the sweep.
    * Arms sharing a projection width dOut share ONE projected-distance
    * scan + rank window ([[Similarity.jlCandidates]] at the arms' max
    * candR; each arm is a rank-prefix filter + exact re-rank — rank is
    * cutoff-independent, so the filtered prefix is bit-identical to the
    * arm's standalone candidate set). Run lists are queries × k rows.
    */
  private val jlRunsCache = new graft.engine.SessionCache[Map[String, DataFrame]]
  private def jlRuns(s: SparkSession, dir: String): Map[String, DataFrame] =
    jlRunsCache.getOrCompute(s, dir) {
      val emb = Tables.embeddings(s, dir)
      val qs = emb.filter(col("vec_id") < NumQueries)
      JlSweepArms.groupBy(_._2).toSeq.flatMap { case (dOut, arms) =>
        val maxR = arms.map(_._3).max
        val cands = Similarity.jlCandidates(emb, qs, "vec_id", "embedding",
          JlDIn, dOut, maxR).localCheckpoint(false)
        arms.map { case (name, _, candR) =>
          name -> Similarity.refineExact(emb, qs, "vec_id", "embedding",
              TopK, cands.filter(col("rank") <= candR))
            .localCheckpoint(false)
        }
      }.toMap
    }

  /** The shipping-default JL run (dOut = [[JlDOut]], candR =
    * [[JlCandR]]): read from the sweep's run artifacts when the default
    * is one of the sweep arms (it is — jl_d16_r150), rebuilt standalone
    * only if the constants ever drift off the sweep grid.
    */
  private def jlShippingRun(s: SparkSession, dir: String): DataFrame =
    JlSweepArms.find { case (_, d, r) => d == JlDOut && r == JlCandR } match {
      case Some((name, _, _)) => jlRuns(s, dir)(name)
      case None => Similarity.jlTopK(Tables.embeddings(s, dir),
        Tables.embeddings(s, dir).filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK, JlDIn, JlDOut, JlCandR)
    }

  /** The corpus 16-lane MinHash SIGNATURE table, built and pinned once
    * per (session, dir) — literally "the persisted LSH index: build it
    * once per corpus version, probe it with every delta batch" that
    * [[Dedup.bandRows]]' scaladoc describes, now shared by every
    * consumer that banded it independently per run: the x1 pair stage
    * (4×4 bands), x95's loose edit tier (8×2 bands over the SAME
    * signatures), x30's incremental probe (row-local signatures, so
    * slicing the pinned table by doc_id IS signing the slices), and
    * x162's fidelity audit. Signatures are docs × 16 lanes — the
    * kilobyte-class artifact of the family.
    */
  private val corpusSigsCache = new graft.engine.SessionCache[DataFrame]
  private def corpusSigs16(s: SparkSession, dir: String): DataFrame =
    corpusSigsCache.getOrCompute(s, dir) {
      Dedup.docSignatures(Tables.documents(s, dir), "doc_id", "text",
        numSigs = 16).localCheckpoint(false)
    }

  private def lshPairs(s: SparkSession, dir: String): DataFrame =
    lshPairsCache.getOrCompute(s, dir) {
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        numSigs = 16, rowsPerBand = 4, threshold = JaccardThreshold,
        prebuiltSigs = Some(corpusSigs16(s, dir)))
        .localCheckpoint()
    }

  /** The per-source DISTINCT shingle membership table — (source, s, ia,
    * ib) with ia/ib = 1 when any doc with doc_id % 2 == 0 / % 3 == 0 in
    * that source carries the shingle — built and pinned ONCE per
    * (session, dir) and shared by the five sketch-family queries that
    * each rebuilt the corpus shingle table + source join from scratch
    * (x83 linear counting, x88 HLL, x88 HLL union, x92 KMV Jaccard,
    * x118 KMV set algebra — §1.2: the r21 annRuns disease in
    * miniature, flagged by the round-21 verdict). Every consumer is
    * duplicate-insensitive (countDistinct / HLL register max / KMV
    * min-k-after-distinct), so the pre-aggregated distinct grain
    * preserves every result bit-for-bit while the corpus-sized
    * scan + shingle explode + source join + distinct runs once per
    * session instead of 2–4× per query × 5 queries. The slice flags
    * additionally replace x118's full-join exact audit and x92's
    * intersect/union joins with plain aggregations over this table. At
    * 100 TB this is the natural persisted intermediate of the sketch
    * family: the per-source shingle vocabulary with slice membership.
    */
  private val srcShinglesCache = new graft.engine.SessionCache[DataFrame]
  private def sourceShingles(s: SparkSession, dir: String): DataFrame =
    srcShinglesCache.getOrCompute(s, dir) {
      val docs = Tables.documents(s, dir)
      Dedup.shingleTable(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy(col("source"), col("s"))
        .agg(max(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("ia"),
          max(when(col("doc_id") % 3 === 0, 1L).otherwise(0L)).as("ib"))
        .localCheckpoint(false)
    }

  /** The two KMV slice sketches (k smallest distinct digests per
    * source; slice A = doc_id % 2 docs, slice B = doc_id % 3 docs),
    * k-row artifacts built once per (session, dir) off
    * [[sourceShingles]] and shared by x92 and x118 — the run-artifact
    * contract applied to the sketch family.
    */
  private val kmvSketchCache =
    new graft.engine.SessionCache[(DataFrame, DataFrame)]
  private def kmvSliceSketches(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    kmvSketchCache.getOrCompute(s, dir) {
      val ss = sourceShingles(s, dir)
      def sk(flag: String): DataFrame = Kmv.sketch(
        ss.filter(col(flag) === 1L)
          .select(col("source").as("grp"), col("s")),
        "grp", "s", KmvK).localCheckpoint(false)
      (sk("ia"), sk("ib"))
    }

  /** Distinct customer↔supplier trade pairs (node ids disjoint by
    * parity), MATERIALIZED once per (session, dir) — the expensive
    * lineitem⨝orders + distinct stage of the trade graph, shared across
    * x28 invocations the same way the LSH pair stage is. The distinct
    * pair list is tiny relative to lineitem (the natural persisted
    * intermediate of a graph pipeline: build the edge list once, rank
    * many times).
    */
  private val tradePairCache = new graft.engine.SessionCache[DataFrame]
  private def tradePairs(s: SparkSession, dir: String): DataFrame =
    tradePairCache.getOrCompute(s, dir) {
      val oc = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
      li.join(oc, li("l_orderkey") === oc("o_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
        .localCheckpoint()
    }

  // --------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](

    // X1 exact dedup — events.props has a 10:1 duplication rate
    "x1_exact_dedup" -> ((s, dir) => {
      Dedup.exactDedup(Tables.events(s, dir), "event_id", "props")
        .orderBy("keep_id")
    }),

    // X1 n-gram (3-shingle) Jaccard near-dup pairs — the exact verifier;
    // per-doc sizes come row-locally off the docs (no groupBy shuffle)
    "x1_jaccard_pairs" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = Dedup.shingleTable(docs, "doc_id", "text")
      Dedup.jaccardPairs(sh, Dedup.shingleCounts(docs, "doc_id", "text"),
        "doc_id", JaccardThreshold).orderBy("d1", "d2")
    }),

    // X1 MinHash+LSH near-dup — the scale path, verified exactly
    "x1_minhash_lsh" -> ((s, dir) => lshPairs(s, dir).orderBy("d1", "d2")),

    // X1 SimHash 16-bit signatures
    "x1_simhash" -> ((s, dir) => {
      val sh = Dedup.shingleTable(Tables.documents(s, dir), "doc_id", "text")
      Dedup.simhash16(sh, "doc_id").orderBy("doc_id")
    }),

    // X1 embedding-cosine near-dup pairs (block kernel: exact all-pairs
    // within a driver-bounded block)
    "x1_embedding_dup" -> ((s, dir) => {
      Dedup.embeddingDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        EmbDupThreshold).orderBy("d1", "d2")
    }),

    // X1 embedding near-dup, bucketed form — the 100 TB path: sign-bucket
    // equi-join, no driver collect at any corpus size; 6 bucket bits
    // sized to the test corpus like x2_ann_lsh
    "x1_embedding_dup_bucket" -> ((s, dir) => {
      Dedup.embeddingDupPairsBucketed(Tables.embeddings(s, dir), "vec_id",
        "embedding", EmbDupThreshold, bits = 6).orderBy("d1", "d2")
    }),

    // X2 brute-force cosine top-k (exact baseline)
    "x2_cosine_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK)
        .select("qid", "cid", "rank", "sim").orderBy("qid", "rank")
    }),

    // X2 sign-bucketed ANN (scale path); 6 bucket bits sized to the test
    // corpus (bits scale with corpus cardinality in production)
    "x2_ann_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK, bits = LshBits)
        .select("qid", "cid", "rank", "sim").orderBy("qid", "rank")
    }),

    // X2 IVF ANN (KMeans coarse quantizer; approximate w.r.t. brute force
    // but integer-exact per se, so fully oracle-checked — the trained
    // centroids are inlined into the SQL as literals, see [[ivfOracle]])
    "x2_ann_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK, nlist = IvfNlist, nprobe = IvfNprobe)
        .select("qid", "cid", "rank", "sim").orderBy("qid", "rank")
    }),

    // X2 product-quantization ANN (compressed-domain exhaustive scan;
    // integer-exact codes + ADC table lookups, so fully oracle-checked —
    // the trained codebook is inlined as literals, see [[pqOracle]])
    "x20_pq_ann" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK, numSub = PqNumSub, codes = PqCodes,
        codebook = Some(pqCodebook(s, dir)))
        .select("qid", "cid", "rank", "adc").orderBy("qid", "rank")
    }),

    // X2 IVF-PQ — the composed FAISS recipe: coarse lists prune, residual
    // PQ compresses, ADC distance ranks; integer-exact end to end, so
    // fully oracle-checked with both trained artifacts inlined
    "x21_ivf_pq" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK, nlist = IvfPqNlist, nprobe = IvfPqNprobe,
        numSub = PqNumSub, codes = PqCodes,
        trained = Some(ivfPqTrained(s, dir)))
        .select("qid", "cid", "rank", "dist").orderBy("qid", "rank")
    }),

    // X3 token statistics + quality score
    "x3_text_stats" -> ((s, dir) => {
      TextAnalysis.textStats(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // X3 language-ID heuristic
    "x3_lang_id" -> ((s, dir) => {
      TextAnalysis.langId(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // X3 BPE-ish token counting
    "x3_token_count" -> ((s, dir) => {
      TextAnalysis.tokenCount(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // X3 document fingerprint
    "x3_fingerprint" -> ((s, dir) => {
      TextAnalysis.fingerprint(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // X3 Gopher-style repetition gate: top-bigram share + duplicate-bigram
    // share, computed row-locally (the oracle recomputes relationally)
    "x3_repetition" -> ((s, dir) => {
      TextAnalysis.repetition(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // X4 multimodal metadata extraction over binary blobs
    "x4_media_stats" -> ((s, dir) => {
      Multimodal.mediaStats(
        Multimodal.attachBlob(Tables.documents(s, dir), "doc_id", "text"))
        .orderBy("doc_id")
    }),

    // X4 real binary decode: render deterministic P6 PPM images, parse the
    // headers back via mapPartitions; the oracle recomputes the expected
    // geometry from the construction rule
    "x4_ppm_decode" -> ((s, dir) => {
      Multimodal.decodeImages(
        Multimodal.renderPpm(Tables.documents(s, dir), "doc_id"))
        .orderBy("doc_id")
    }),

    // X4 real audio decode: deterministic PCM WAVs, RIFF chunk-walk header
    // parse via mapPartitions; oracle recomputes from the construction rule
    "x4_wav_decode" -> ((s, dir) => {
      Multimodal.decodeAudio(
        Multimodal.renderWav(Tables.documents(s, dir), "doc_id"))
        .orderBy("doc_id")
    }),

    // X5 gap-based sessionization (30-minute gap) over the event stream
    "x5_sessionize" -> ((s, dir) => {
      Sessionize.sessions(Tables.events(s, dir), "user_id", "ts", "event_id",
        gapSecs = 1800)
        .orderBy("user_id", "session_seq")
    }),

    // X14 as-of join: each purchase gets the user's most recent view at
    // or before it — one exchange + sort, no join operator (see
    // Sessionize.asofLast)
    "x14_asof_join" -> ((s, dir) => {
      Sessionize.asofLast(Tables.events(s, dir), "user_id", "ts", "event_id",
        probePred = col("event_type") === "purchase",
        refPred = col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_ts"), col("asof_lag_us"))
        .orderBy("event_id")
    }),

    // X23 length-weighted deterministic sampling: keep probability
    // proportional to n_chars (exact integer comparison — see
    // Sample.weighted)
    "x23_weighted_sample" -> ((s, dir) => {
      Sample.weighted(Tables.documents(s, dir), "doc_id", "n_chars",
        fraction = 0.3, maxWeight = 600, seed = "w")
        .select("doc_id", "n_chars").orderBy("doc_id")
    }),

    // X6 deterministic stratified sampling: 5% of English docs, 20% of rest
    "x6_stratified_sample" -> ((s, dir) => {
      Sample.stratified(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 0.05), default = 0.2)
        .select("doc_id", "lang").orderBy("doc_id")
    }),

    // X7 normalization + PII/URL scrubbing (emails/URLs injected
    // deterministically so the scrubber has real targets)
    "x7_normalize_scrub" -> ((s, dir) => {
      val id = col("doc_id").cast("string")
      val aug = concat(col("text"), lit(" contact user"), id,
        lit("@example.com via http://ex.example/"), id, lit(" ok"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.normalize(col("text")).as("normalized"),
        TextAnalysis.scrub(aug).as("scrubbed"))
        .orderBy("doc_id")
    }),

    // X8 corpus vocabulary: top-100 tokens by frequency
    "x8_vocab_topk" -> ((s, dir) => {
      TextAnalysis.vocabulary(Tables.documents(s, dir), "text", 100)
        .orderBy(col("n").desc, col("token"))
    }),

    // X9 near-dup clustering: connected components over the MinHash-LSH
    // pair list (min-label propagation; oracle = recursive closure).
    // Reuses the materialized pair stage from x1_minhash_lsh when both run
    // in one session, so x9's cost is the CC iteration alone.
    "x9_components" -> ((s, dir) => {
      Cluster.components(lshPairs(s, dir).select("d1", "d2"))
        .select(col("id").as("doc_id"), col("component"))
        .orderBy("doc_id")
    }),

    // X9 canonical selection — the dedup pipeline's final step: per
    // near-dup cluster keep the highest-quality member (type-token ratio,
    // ties to the lowest doc_id) and count what gets dropped. The window
    // partitions by component — clusters are tiny by construction, so the
    // ranking shuffles only cluster members, never the corpus.
    "x9_canonical" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val comps = Cluster.components(lshPairs(s, dir).select("d1", "d2"))
        .select(col("id").as("doc_id"), col("component"))
      val quality = TextAnalysis.textStats(Tables.documents(s, dir), "doc_id", "text")
        .select(col("doc_id"), col("quality"))
      val ranked = comps.join(quality, "doc_id")
        .withColumn("rn", row_number().over(
          Window.partitionBy("component")
            .orderBy(col("quality").desc, col("doc_id"))))
      val keep = ranked.filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("keep_id"))
      val sizes = comps.groupBy("component").agg(count(lit(1)).as("n_members"))
      keep.join(sizes, "component").orderBy("component")
    }),

    // X11 salted two-phase aggregation (skew path): identical result to a
    // plain GROUP BY — which is exactly what the oracle runs. Values are
    // cast to decimal first so sums are order-exact; the OUTPUT column is
    // double (round 2) because decimal-typed outputs hash differently
    // across the oracle boundary regardless of declared width; rounding at
    // exactly the value's 2 decimal places is tie-free while |sum| x 10^2
    // stays inside 2^53 (~9e13 — far past any realistic group sum).
    "x11_salted_agg" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .withColumn("v", col("value").cast("decimal(18,2)"))
      Skew.saltedSum(ev, Seq("event_type"), "v", saltFactor = 8)
        .withColumn("sum", round(col("sum").cast("double"), 2))
        .orderBy("event_type")
    }),

    // X13 decontamination: docs sharing any 8-token shingle with a
    // (deterministically sampled) eval set are contamination suspects —
    // the standard benchmark-overlap check in training pipelines. Shape:
    // the eval shingle table is small by construction (sampled) and
    // BROADCASTs against the corpus shingle stream; per-doc match counts
    // aggregate with map-side combine. At 100 TB the eval side is a real
    // benchmark suite — still tiny, still broadcast.
    "x13_contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = Dedup.shingleTable(docs, "doc_id", "text", n = 8)
      val evalSh = Dedup.shingleTable(
        Sample.uniform(docs, "doc_id", 0.1, seed = "eval"), "doc_id", "text", n = 8)
        .withColumnRenamed("doc_id", "eval_id")
        .withColumnRenamed("s", "es")
      sh.join(broadcast(evalSh), col("s") === col("es"))
        .filter(col("doc_id") =!= col("eval_id"))
        .groupBy(col("doc_id"))
        .agg(countDistinct(col("eval_id")).as("n_eval_matches"))
        .orderBy("doc_id")
    }),

    // X12 per-stratum length quantiles — exact interpolated percentile,
    // the oracle-checkable twin of the approx_percentile/t-digest sketch
    // you would run at 100 TB (same column contract, bounded memory)
    "x12_quantiles" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(
          round(expr("percentile(n_chars, 0.25)"), 6).as("p25"),
          round(expr("percentile(n_chars, 0.5)"), 6).as("p50"),
          round(expr("percentile(n_chars, 0.75)"), 6).as("p75"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    // X10 per-label embedding centroids: exact integer sums over the
    // quantized vectors, position-exploded (one shuffle of (label, pos))
    "x10_label_centroid" -> ((s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("label"),
          posexplode(Similarity.quantize(col("embedding"))).as(Seq("pos0", "v")))
        .groupBy(col("label"), (col("pos0") + 1).cast("bigint").as("pos"))
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
        .select(col("label"), col("pos"), col("n"), col("s"),
          round(col("s").cast("double") / col("n"), 6).as("centroid"))
        .orderBy("label", "pos")
    }),

    // X15 deterministic train/valid/test split — row-local CASE over the
    // hash bucket, zero shuffle
    "x15_split_assign" -> ((s, dir) => {
      Curate.splitAssign(Tables.documents(s, dir), "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed)
        .select("doc_id", "lang", "split").orderBy("doc_id")
    }),

    // X16 per-domain quota cap — two-phase exact form (hash prefilter +
    // guard + rank); result identical to the naive full-shuffle window,
    // which is exactly what the oracle runs
    "x16_domain_quota" -> ((s, dir) => {
      Curate.domainQuota(Tables.documents(s, dir), "doc_id", "source",
        quota = QuotaPerDomain, seed = QuotaSeed)
        .select("doc_id", "source", "rnk").orderBy("source", "rnk")
    }),

    // X17 sequence packing (concat-and-chunk): per-shard running token
    // sum -> fixed-size chunk spans; one window shuffle, `shards`-way
    // parallel
    "x17_seq_pack" -> ((s, dir) => {
      Curate.seqPack(Tables.documents(s, dir), "doc_id", "text",
        shards = PackShards, chunkTokens = PackChunkTokens)
        .orderBy("doc_id")
    }),

    // X18 banded range join: purchases within 7 days after a view by the
    // same user — equi-join on (user, time-bucket) + exact band predicate
    // instead of a per-user cross product
    "x18_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts").as("purchase_ts"))
      RangeJoin.banded(views, purchases, "user_id", "view_ts", "purchase_ts",
        RangeJoinWindowUs)
        .select("user_id", "view_id", "purchase_id", "lag_us")
        .orderBy("view_id", "purchase_id")
    }),

    // X22 end-to-end curation pipeline — the engine's purpose in one
    // query: quality gate + repetition gate (both row-local, computed in
    // ONE scan-side projection so the filters push to the scan), exact
    // dedup on the normalized-text fingerprint (window over fp — dup
    // groups only), then deterministic split assignment. The only
    // shuffle in the whole pipeline is the dedup window.
    "x22_curation_pipeline" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      // arrays staged as columns before the signal projection (the
      // gateSignals/Gopher lesson: CodegenFallback kernels re-run
      // inline children per consumer)
      val ts = col("__ts")
      val sh = col("__sh")
      val sig = docs
        .withColumn("__ts", split(col("text"), " "))
        .withColumn("__sh", graft.functions.Shingles.shingles(ts, 2))
        .select(col("doc_id"), col("lang"),
        round(size(array_distinct(ts)).cast("double") / size(ts), 6)
          .as("quality"),
        size(sh).cast("long").as("n_ngrams"),
        round(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 6)
          .as("dup_ngram_ratio"),
        md5(TextAnalysis.normalize(col("text"))).as("norm_fp"))
      val gated = sig.filter(col("n_ngrams") > 0 &&
        col("quality") >= CurateQualityMin &&
        col("dup_ngram_ratio") <= CurateDupMax)
      val w = Window.partitionBy("norm_fp").orderBy("doc_id")
      val deduped = gated.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
      Curate.splitAssign(deduped, "doc_id",
          Seq("train" -> SplitTrain, "valid" -> SplitValid), "test", SplitSeed)
        .select("doc_id", "lang", "quality", "split").orderBy("doc_id")
    }),

    // X116 FLAGSHIP end-to-end production pipeline — every stage of the
    // current recipe chained behind ONE oracle: eval holdout -> quality/
    // repetition gate (x22's scan-side signals) -> exact dedup (norm_fp
    // first-occurrence) -> MinHash-LSH near-dedup over survivors (x1
    // machinery; drop the larger id of each confirmed pair) -> eval-
    // shingle decontamination (x13's 8-gram join) -> per-source quota
    // (x16) -> split assignment (x15) -> sequence packing of the train
    // split (x17). Output is the per-document DISPOSITION LEDGER: every
    // input doc carries exactly one verdict (which stage dropped it, or
    // 'kept' + split + pack coordinates), so the oracle pins every
    // stage's behavior AND their composition order in one hash. Each
    // multi-consumer stage is localCheckpoint-pinned — the plan-shape
    // spec asserts the corpus parquet is scanned exactly once.
    "x116_e2e_pipeline" -> ((s, dir) => e2ePipeline(s, dir).orderBy("doc_id")),

    // X118 theta-style set algebra from KMV sketches: distinct-count
    // estimates of A, B, union, intersection, and both differences per
    // source — neither corpus re-scanned (k-row sketches only); exact
    // audit columns carried beside the estimates (test-SF-only, the
    // x92 contract)
    "x118_kmv_algebra" -> ((s, dir) => {
      // slice sketches + membership table shared with x92/x88/x83 (see
      // sourceShingles): the exact audit is a plain aggregation over the
      // pinned membership flags — the old per-query full join of the two
      // freshly-recomputed distinct slices collapses to one agg
      val (ska, skb) = kmvSliceSketches(s, dir)
      val alg = Kmv.setAlgebra(ska, skb, KmvK)
      val ex = sourceShingles(s, dir)
        .filter(col("ia") + col("ib") > 0)
        .groupBy(col("source").as("grp")).agg(
          sum(col("ia")).as("ex_a"),
          sum(col("ib")).as("ex_b"),
          count(lit(1)).as("ex_union"),
          sum(col("ia") * col("ib")).as("ex_intersect"))
      alg.join(ex, Seq("grp")).orderBy("grp")
    }),

    // X119 exact integer covariance table of the embedding column —
    // the second-moment summary every embedding post-processing step
    // starts from; one cell-grain exchange, all lanes exact BIGINT
    "x119_embedding_cov" -> ((s, dir) =>
      Similarity.covarianceTable(Tables.embeddings(s, dir), "embedding")
        .orderBy("i", "j")),

    // X119 sharded continuation: per-shard exact moment lanes merged
    // by the exact lane fold (DECIMAL numerator — no CovMaxRows cap).
    // The oracle is the SINGLE-PASS covariance SQL, so a green row IS
    // the proof that merge(shards) ≡ single-pass at test SF
    "x119_cov_merged" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.mergeMoments(
        Similarity.covarianceMoments(emb, "embedding", col("vec_id") % 3))
        .orderBy("i", "j")
    }),

    // X127 word-frequency subsampling: word2vec's high-frequency
    // damping over token occurrences — per-word integer cut from one
    // fixed-parenthesization double, per-occurrence md5 keep decision,
    // per-doc reassembly; dense (an all-dropped doc keeps empty text)
    "x127_freq_subsample" -> ((s, dir) =>
      Sample.freqSubsample(Tables.documents(s, dir), "doc_id", "text",
        SubsampleTPpm, SubsampleSeed).orderBy("doc_id")),

    // X128 corpus-frequency line removal (the CCNet/RefinedWeb
    // boilerplate filter): doc-distinct digest grain into the
    // document-frequency group-by, AQE-broadcast boilerplate-sized
    // frequent set, row-local excision — corpus text never shuffles
    "x128_line_boilerplate" -> ((s, dir) =>
      Boilerplate.removeFrequentLines(boilerPage(s, dir), "doc_id",
        "page", BoilerFracPpm).orderBy("doc_id")),

    // X129 character-entropy quality signal: sorted-run fold in exact
    // micro-nat integer lanes, zero shuffle; the oracle replays the
    // relational explode+group twin (fold/explode equivalence per doc)
    "x129_char_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id",
        "text").orderBy("doc_id")),

    // X130 word burstiness (Church-Gale Fano factor): exact rational
    // VMR in one DECIMAL integral-divide — (word, doc) type grain,
    // vocab fold, 1-row corpus scalar
    "x130_burstiness" -> ((s, dir) =>
      CorpusStats.burstiness(Tables.documents(s, dir), "doc_id", "text",
        BurstMinDf).orderBy("w")),

    // X131 per-language unigram KL against the pooled corpus:
    // micro-nat terms rounded before the DECIMAL weighted sum, clamped
    // at zero before the slice-size divide
    "x131_lang_kl" -> ((s, dir) =>
      CorpusStats.unigramKl(Tables.documents(s, dir), "lang", "text")
        .orderBy("grp")),

    // X132 Dunning G² keyness: per-(lang, word) log-likelihood-ratio
    // over/under-representation vs the pooled corpus — the x131
    // type-grain exchange with a 2x2 contingency lane per cell; exact
    // micro-nat terms, DECIMAL weighted sum, guarded BIGINT cast-back
    "x132_keyness" -> ((s, dir) =>
      CorpusStats.dunningKeyness(Tables.documents(s, dir), "lang",
        "text", minCount = KeynessMinCount).orderBy("grp", "w")),

    // X133 Wilson score intervals for the per-source gate pass rate:
    // one group-grain exchange over the x116 gate signals, closed-form
    // CI from the exact (n, n_hit) pair — the calibrated way to read a
    // small source's pass rate (contrast: the x101 bootstrap prices
    // sufficient statistics, Wilson prices a binomial)
    "x133_wilson_gate" -> ((s, dir) => {
      // null sources excluded (the x131 rule — a null group would also
      // sort differently across engines: Spark NULLS FIRST, DuckDB LAST)
      val sig = Curate.gateSignals(Tables.documents(s, dir)
        .filter(col("source").isNotNull)
        .select(col("doc_id"), col("source"), col("text")), "text")
      Eval.wilsonRates(sig.withColumn("hit",
          Curate.gatePass(CurateQualityMin, CurateDupMax)),
        "source", "hit").orderBy("grp")
    }),

    // X134 k-anonymity audit over the metadata quasi-identifiers
    // (lang, source, coarse length bucket): equivalence classes below
    // k are re-identification risks; one QI-grain exchange, class
    // table bounded by the attribute cross product
    "x134_k_anonymity" -> ((s, dir) =>
      // any-null quasi-identifier rows excluded (the x131 rule): a null
      // class is not a re-identifiable equivalence class, and the two
      // engines order NULLs on opposite ends
      Pii.kAnonymity(Tables.documents(s, dir)
          .filter(col("lang").isNotNull && col("source").isNotNull &&
            col("n_chars").isNotNull)
          .withColumn("len_bucket", expr(s"n_chars div $KAnonBucket")),
        Seq("lang", "source", "len_bucket"), k = KAnonK)
        .orderBy("lang", "source", "len_bucket")),

    // X147 k-anonymity sweep: suppression cost as a function of k —
    // one classCounts exchange, then a broadcast cross join against
    // the k list; same quasi-identifier tuple and null rule as x134
    "x147_kanon_sweep" -> ((s, dir) =>
      Pii.kAnonymitySweep(Tables.documents(s, dir)
          .filter(col("lang").isNotNull && col("source").isNotNull &&
            col("n_chars").isNotNull)
          .withColumn("len_bucket", expr(s"n_chars div $KAnonBucket")),
        Seq("lang", "source", "len_bucket"), KAnonSweepKs)
        .orderBy("k")),

    // X148 generalization sweep: suppression at fixed k as a function
    // of bucket COARSENESS — one corpus exchange at the finest bucket,
    // coarser class tables rolled up class-grain (counts are additive
    // under coarsening)
    "x148_kanon_generalize" -> ((s, dir) =>
      Pii.kAnonymityGeneralize(Tables.documents(s, dir)
          .filter(col("lang").isNotNull && col("source").isNotNull &&
            col("n_chars").isNotNull),
        Seq("lang", "source"), "n_chars", KAnonGenBuckets, k = KAnonK)
        .orderBy("bucket")),

    // X149 joint re-identifiability x PII audit: do the at-risk
    // quasi-identifier classes coincide with the mask/drop set? Same
    // quasi tuple and null rule as x134, same augmented text and
    // thresholds as x94
    "x149_risk_pii_joint" -> ((s, dir) =>
      Pii.riskPiiJoint(piiAugmented(Tables.documents(s, dir)
          .filter(col("lang").isNotNull && col("source").isNotNull &&
            col("n_chars").isNotNull))
          .withColumn("len_bucket", expr(s"n_chars div $KAnonBucket")),
        Seq("lang", "source", "len_bucket"), "aug", KAnonK, PiiMaxHits)
        .orderBy("at_risk", "verdict")),

    // X135 soft-dedup weights: every near-dup cluster member kept at
    // weight 1/cluster-size (the reweighting alternative to x9's
    // keep-one); components over the session-cached LSH pairs, dense
    // left join back onto the corpus
    "x135_soft_dedup" -> ((s, dir) =>
      Dedup.softDedupWeights(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"), "doc_id")
        .orderBy("doc_id")),

    // X136 digram conditional entropy H(Y|X): the loop/template
    // detector unigram char entropy misses — two sorted-run folds per
    // row (joint + prefix lanes), pure projection, zero shuffle
    "x136_digram_entropy" -> ((s, dir) =>
      TextAnalysis.digramEntropy(Tables.documents(s, dir), "doc_id",
        "text").orderBy("doc_id")),

    // X137 exact two-sample KS drift per source vs the pooled corpus
    // over doc length — bin-free (the x104 PSI contrast); exact
    // DECIMAL cross-difference at every pool jump point
    "x137_ks_drift" -> ((s, dir) =>
      CorpusStats.ksDrift(Tables.documents(s, dir), "source", "n_chars")
        .orderBy("grp")),

    // X137 over a CONTINUOUS column (per-doc mean token length, a
    // double): scale=10⁶ maps each value to floor(v·10⁶) fixed-point
    // micro-units — the exact integer grid the KS lanes need, no
    // pre-bucketing; both engines compute the identical single IEEE
    // divide, multiply, and floor
    "x137_ks_frac" -> ((s, dir) =>
      CorpusStats.ksDrift(Tables.documents(s, dir)
          .filter(col("text").isNotNull)
          .withColumn("avg_tok_len", col("n_chars").cast("double") /
            size(split(col("text"), " "))),
        "source", "avg_tok_len", scale = 1000000L)
        .orderBy("grp")),

    // X138 source-concentration datacard: HHI + Gini + top share over
    // the K source counts in exact ppm — one source-grain fold, a K²
    // self-join over K rows, ONE output row
    "x138_source_concentration" -> ((s, dir) =>
      Report.sourceConcentration(Tables.documents(s, dir), "source")),

    // X139 per-source near-dup participation: which source is
    // self-copying — docs appearing in any verified LSH pair (the
    // session-cached stage), source-grain fold, ppm share
    "x139_source_dup_rate" -> ((s, dir) =>
      Dedup.sourceDupRate(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"), "doc_id", "source")
        .orderBy("src")),

    // X140 cross-source dup matrix: each verified pair attributed to
    // the unordered source pair of its members — who copies whom
    // (diagonal = self-copying, off-diagonal = mirroring); pair-
    // density-sized joins, source-pair-grain fold
    "x140_cross_dup_matrix" -> ((s, dir) =>
      Dedup.crossSourceDupMatrix(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"), "doc_id", "source")
        .orderBy("src_a", "src_b")),

    // X141 dup-cluster size histogram: the SHAPE of duplication —
    // components over the session-cached pairs, size-grain fold,
    // singletons from the corpus count minus the member count
    "x141_cluster_histogram" -> ((s, dir) =>
      Dedup.dupClusterHistogram(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"))
        .orderBy("cluster_size")),

    // X142 dedup token savings per source: the x9 keep-one rule priced
    // in TOKENS — which source's budget share is duplication
    "x142_dedup_savings" -> ((s, dir) =>
      Dedup.dedupSavings(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"), "doc_id", "source",
        "text").orderBy("src")),

    // X143 threshold-sensitivity histogram: verified pairs bucketed by
    // Jaccard at centi grain + the cumulative at-or-above lane — what
    // moving the 0.8 cut would keep; one fold to <= 101 bucket rows
    "x143_pair_histogram" -> ((s, dir) =>
      Dedup.pairSimilarityHistogram(lshPairs(s, dir))
        .orderBy("jac_centi")),

    // X144 per-source gate-RULE attribution: x133 said how much each
    // source loses at the gate; this says to WHICH rule (too_short /
    // low_quality / repetitive) — the x133 shape with three more
    // counting lanes in the same source-grain exchange
    "x144_gate_attribution" -> ((s, dir) =>
      Curate.gateAttribution(Tables.documents(s, dir), "source",
        "text", CurateQualityMin, CurateDupMax).orderBy("src")),

    // X145 dedup-tier overlap: how much of the near-dup problem the
    // cheap exact tier already catches — one fingerprint exchange, the
    // pair union, two membership joins, ONE row
    "x145_tier_overlap" -> ((s, dir) =>
      Dedup.dedupTierOverlap(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"), "doc_id", "text")),

    // X150 joint near-dup x gate audit: does the quality gate already
    // remove the near-duplicates? Rides the session-cached LSH pair
    // stage + one gateSignals scan projection
    "x150_dup_gate_joint" -> ((s, dir) =>
      Dedup.dupGateJoint(Tables.documents(s, dir),
          lshPairs(s, dir).select("d1", "d2"), "doc_id", "text",
          CurateQualityMin, CurateDupMax)
        .orderBy("is_dup", "passed")),

    // X151 distinct l-diversity sweep: the x134 quasi tuple with the
    // x94 PII verdict as the SENSITIVE attribute — a k-anonymous class
    // whose members are all 'mask' still discloses PII status for
    // every member; one corpus exchange, class-grain rollups
    "x151_l_diversity" -> ((s, dir) =>
      Pii.lDiversity(piiVerdictDocs(s, dir),
        Seq("lang", "source", "len_bucket"), "verdict", LDivLs)
        .orderBy("l")),

    // X152 t-closeness audit: per-class EMD (total variation, integer
    // ppm) between the class's verdict distribution and the corpus
    // global — even a diverse class leaks when its distribution skews
    "x152_t_closeness" -> ((s, dir) =>
      Pii.tCloseness(piiVerdictDocs(s, dir),
        Seq("lang", "source", "len_bucket"), "verdict", TClosePpm)
        .orderBy("lang", "source", "len_bucket")),

    // X153 corpus keyword extraction — TextRank (Mihalcea & Tarau,
    // "TextRank: Bringing Order into Text", 2004) over the corpus
    // word co-occurrence graph (adjacent-token window, symmetric
    // unweighted edges), ranked by the SAME fixed-point integer
    // PageRank kernel as x28 (Graph.Scale micro-units — deterministic
    // in both engines, no float drift). Vocabulary-grain graph: the
    // corpus pass ends at the DISTINCT bigram exchange; every
    // iteration after it touches vocab-sized tables only
    "x153_textrank" -> ((s, dir) => {
      val bg = Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(split(col("text"), " ").as("ts"))
        .select(explode(expr(
          "zip_with(slice(ts, 1, size(ts)-1), slice(ts, 2, size(ts)-1)," +
            " (a, b) -> struct(a, b))")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b") && col("a") =!= "" &&
          col("b") =!= "")
      val edges = bg.select(col("a").as("src"), col("b").as("dst"))
        .union(bg.select(col("b").as("src"), col("a").as("dst")))
        .distinct()
      Graph.pageRank(edges, PageRankIters)
        .orderBy(col("rank").desc, col("node")).limit(TextRankTopK)
    }),

    // X154 inter-gate agreement: Cohen's kappa + McNemar between the
    // x116 curation gate (raw text) and the x94 PII-clean predicate
    // (augmented text) per source — x150's joint question answered
    // with the chance-corrected statistic; one scan projection, one
    // source-grain exchange, DECIMAL(38,0) lanes
    "x154_gate_agreement" -> ((s, dir) =>
      Agreement.gatePiiAgreement(piiAugmented(Tables.documents(s, dir)),
        "source", "text", "aug", CurateQualityMin, CurateDupMax)
        .orderBy("src")),

    // X155 Gini information gain: which metadata dimension (lang /
    // source / length bucket) PREDICTS gate failure — the CART split
    // criterion in ppm-exact rational arithmetic (no entropy ln seam);
    // one corpus fold to the attribute cross grain, per-field rollups
    "x155_gini_gain" -> ((s, dir) =>
      Curate.giniGain(Tables.documents(s, dir)
          .withColumn("len_bucket", expr(s"n_chars div $KAnonBucket")),
        "text", Seq("lang", "source", "len_bucket"),
        CurateQualityMin, CurateDupMax).orderBy("field")),

    // X157 Bradley-Terry source strength: every verified CROSS-source
    // near-dup pair is a head-to-head on shared content, won by the
    // higher-quality copy; the Zermelo fixed point turns the win
    // matrix into the keep-WHOSE-copy scale. Rides the session-cached
    // pair stage; only the source-pair win matrix is collected
    "x157_bradley_terry" -> ((s, dir) =>
      Preference.bradleyTerry(Tables.documents(s, dir),
        lshPairs(s, dir).select("d1", "d2"), "doc_id", "source",
        "text", BtIters)
        .orderBy(col("strength_micro").desc, col("src"))),

    // X158 gate-threshold sweep: docs AND tokens retained at every
    // (quality_min, dup_max) grid arm — one gateSignals pass, all
    // arms as map-side-combined conditional lanes, no grid cross join
    // against the corpus; the shipping gate point sits on the grid
    "x158_gate_sweep" -> ((s, dir) =>
      Curate.gateSweep(Tables.documents(s, dir), "text",
        QualitySweepArms, DupSweepArms)
        .orderBy("quality_min", "dup_max")),

    // X159 readability lanes per language: vowel-group syllable
    // heuristic + Gunning-Fog complex-word share — scan-side token
    // work, one language-grain exchange
    "x159_readability" -> ((s, dir) =>
      TextAnalysis.readability(Tables.documents(s, dir), "lang",
        "text").orderBy("lang")),

    // X160 field-association audit: chi-square + Cramér's V for each
    // metadata field pair — are the sampling strata independent
    // dimensions? One corpus fold to the cross grain (x155's shape),
    // margins x margins grids per pair, per-cell micro rounding so
    // only integers cross the exchanges
    "x160_cramers_v" -> ((s, dir) =>
      CorpusStats.fieldAssociation(Tables.documents(s, dir)
          .withColumn("len_bucket", expr(s"n_chars div $KAnonBucket")),
        Seq(("lang", "source"), ("lang", "len_bucket"),
          ("source", "len_bucket")))
        .orderBy("field_a", "field_b")),

    // X161 supervised label-separation audit: the silhouette geometry
    // against the dataset's OWN label centroids — negative separation
    // = closer to another label's centroid (confusable/mislabeled);
    // one centroid exchange + one fused scan projection
    "x161_label_separation" -> ((s, dir) =>
      KMeansOp.labelSeparation(Tables.embeddings(s, dir), "vec_id",
        "embedding", "label").orderBy("label")),

    // X162 MinHash fidelity audit: the 16-lane estimator priced
    // against exact Jaccard on every LSH candidate pair, folded by
    // agreement level — the x43 recall-audit genre for the dedup
    // sketch itself
    "x162_minhash_fidelity" -> ((s, dir) =>
      Dedup.minhashFidelity(Tables.documents(s, dir), "doc_id",
        "text", numSigs = 16, rowsPerBand = 4,
        prebuiltSigs = Some(corpusSigs16(s, dir))).orderBy("n_agree")),

    // X163 source vocabulary overlap: type-level Jaccard per source
    // pair — the soft syndication signal x140's document matrix
    // cannot see; one (source, word) distinct exchange, word-keyed
    // pair join bounded by sources-per-word
    "x163_vocab_overlap" -> ((s, dir) =>
      CorpusStats.vocabOverlap(Tables.documents(s, dir), "source",
        "text").orderBy("src_a", "src_b")),

    // X146 exact-cluster histogram: x141's companion for the cheap
    // tier — fingerprint group sizes, one exchange, no pair table
    "x146_exact_histogram" -> ((s, dir) =>
      Dedup.exactClusterHistogram(Tables.documents(s, dir), "doc_id",
        "text").orderBy("cluster_size")),

    // X126 sequence-length decision audit: exact pad-waste and
    // truncation-loss ppm per candidate context length — group-grain
    // (one row per L), the single exchange carries |grid| partials
    "x126_seq_len_audit" -> ((s, dir) =>
      Curate.seqLenAudit(Tables.documents(s, dir), "text", SeqLenGrid)
        .orderBy("seq_len")),

    // X125 int8 scalar-quantization audit: the standard 4x embedding
    // storage compression priced per vector — symmetric per-row scale,
    // exact integer round-half-up codes, squared-L2 relative error in
    // exact ppm lanes; row-local at the scan, zero shuffle
    "x125_int8_quant" -> ((s, dir) =>
      Similarity.int8Audit(Tables.embeddings(s, dir), "vec_id",
        "embedding").orderBy("vec_id")),

    // X119 all-but-the-top audit: per-vector exact projection score on
    // the driver-trained top principal component (inlined as a
    // micro-unit literal — the IVF-centroid oracle contract) and the
    // centered-vector cosine against it
    "x119_abtt" -> ((s, dir) =>
      Similarity.abtt(Tables.embeddings(s, dir), "vec_id", "embedding")
        .orderBy("vec_id")),

    // X122 JL random sign projection: 64 -> 16 dims through the
    // md5-derived ±1 matrix — row-local, zero trained state, exact
    // BIGINT lanes (exploded rows, not arrays, for the hash compare)
    "x122_jl_project" -> ((s, dir) =>
      Similarity.jlProject(Tables.embeddings(s, dir), "vec_id",
        "embedding", JlDIn, JlDOut).orderBy("vec_id", "dim")),

    // X122 distortion audit on consecutive-id pairs: projected over
    // original squared distance, dOut-normalized ppm — 1e6 in
    // expectation by the JL lemma, exact integer lanes per pair
    "x122_jl_distortion" -> ((s, dir) =>
      Similarity.jlDistortion(Tables.embeddings(s, dir), "vec_id",
        "embedding", JlDIn, JlDOut).orderBy("id_a")),

    // X123 vocabulary coverage / OOV curve per language: corpus-token
    // coverage of the S most frequent types at each candidate vocab
    // size, computed at frequency-group grain (no per-type rank ever
    // materializes) — exact integer ppm lanes
    "x123_vocab_coverage" -> ((s, dir) =>
      CorpusStats.vocabCoverage(Tables.documents(s, dir), "lang", "text",
        VocabSizes).orderBy("grp", "vocab_size")),

    // X121 corpus anisotropy summary: trace (exact integer numerator),
    // Rayleigh lambda1 along the trained component in micro-unit
    // BIGINT lanes, and the lambda1*d/trace ratio — the one-row
    // diagnostic licensing (or not) the x119 ABTT pass
    "x121_isotropy" -> ((s, dir) =>
      Similarity.isotropy(Tables.embeddings(s, dir), "embedding")),

    // X117 semantic decontamination: the x13/x74/x87 lexical gates'
    // embedding-space complement — corpus vectors too cosine-close to
    // the bounded eval suite drop; eval block broadcasts, corpus never
    // shuffles, exact micro-ppm integer lanes
    "x117_semantic_decon" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      SemDedup.semanticDecon(
        emb.filter(col("vec_id") % 10 =!= 0),
        emb.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", SemDeconTauPpm).orderBy("vec_id")
    }),

    // X19 exact per-language distinct token counts — the oracle-checkable
    // twin of the HLL sketch path (approx_count_distinct, spec-verified)
    "x19_distinct_tokens" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("token"))
        .groupBy(col("lang"))
        .agg(countDistinct(col("token")).as("n_distinct"),
          count(lit(1)).as("n_tokens"))
        .orderBy("lang")
    }),

    // X24 TF-IDF top terms per document (idf rounded at the ln seam —
    // see Retrieval class doc for the cross-engine ulp argument)
    "x24_tfidf" -> ((s, dir) => {
      Retrieval.tfIdfTopTerms(Tables.documents(s, dir), "doc_id", "text",
        TfIdfTopK).orderBy("doc_id", "rnk")
    }),

    // X25 BM25 ranked retrieval for a fixed term query — corpus never
    // shuffled: row-local tf/dl, one scalar-row stats broadcast,
    // TakeOrdered top-k
    "x25_bm25" -> ((s, dir) => {
      Retrieval.bm25(Tables.documents(s, dir), "doc_id", "text",
        Bm25Terms, Bm25TopK).orderBy("rank")
    }),

    // X26 bigram-LM document scoring (CCNet-style quality filter): model
    // trained on the deterministic train split, every document scored in
    // exact fixed-point — composes X15 split + LM counts
    "x26_bigram_lm" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ref = Curate.splitAssign(docs, "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed).filter(col("split") === "train")
      LangModel.bigramScore(docs, ref, "doc_id", "text").orderBy("doc_id")
    }),

    // X53 HTML text extraction — the documents wrapped in a fixed
    // markup shell (script/style/comments/entities/anchor), then the
    // row-local extraction chain; the hash gate proves the Java-regex
    // and RE2 chains byte-agree on every document
    "x53_html_extract" -> ((s, dir) => {
      val wrapped = Tables.documents(s, dir).select(col("doc_id"),
        concat(lit(HtmlPre), col("text"), lit(HtmlMid), col("source"),
          lit(HtmlSuf)).as("h"))
      Html.extract(wrapped, "doc_id", "h").orderBy("doc_id")
    }),

    // X52 interpolated Kneser-Ney 5-gram LM — the CCNet-class quality
    // filter; trains on the same deterministic train split as x26/x42,
    // nano-fixed-point exact, oracle replays the whole model from data
    "x52_kn_lm" -> ((s, dir) => knScored(s, dir).orderBy("doc_id")),

    // X56 CCNet-style perplexity bucketing — tertile thresholds from
    // the reference slice's x52 scores (one shared scoring pipeline),
    // corpus bucketed scan-side against the broadcast thresholds
    "x56_ppl_buckets" -> ((s, dir) => {
      val refIds = Curate.splitAssign(Tables.documents(s, dir), "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed).filter(col("split") === "train").select("doc_id")
      KneserNey.perplexityBuckets(knScored(s, dir), refIds, "doc_id")
        .orderBy("doc_id")
    }),

    // X58 modified KN — discounts ESTIMATED from count-of-count
    // statistics (D_k = n1/(n1+2n2) per order), DECIMAL(38,0) exact;
    // same train split, same join shape as x52
    "x58_kn_mkn" -> ((s, dir) =>
      // same train split, same join shape as x52 — the SAME trained
      // model artifact (knModel) and now the same pinned score table
      // treatment (knMknScored): only discount estimation differs
      knMknScored(s, dir).orderBy("doc_id")),

    // X57 token-budget sampling — greedy prefix in deterministic hash
    // order via the two-pass distributed prefix sum; the oracle is the
    // naive global-window form, so the gate proves the decomposition
    "x57_token_budget" -> ((s, dir) => {
      Sample.tokenBudget(Tables.documents(s, dir), "doc_id", "text",
        TokenBudget, seed = TokenBudgetSeed).orderBy("doc_id")
    }),

    // X27 SCD2 dimension history: order-priority runs per customer with
    // valid_from/valid_to intervals — one key-partitioned exchange
    "x27_scd2" -> ((s, dir) => {
      Cdc.scd2(Tables.orders(s, dir), "o_custkey", "o_orderpriority",
        "o_orderdate", "o_orderkey").orderBy("o_custkey", "version")
    }),

    // X28 fixed-point PageRank over the bipartite customer<->supplier
    // graph (distinct trade edges, both directions) — exact BIGINT
    // iterations, oracle = the same 3 rounds unrolled in SQL
    "x28_pagerank" -> ((s, dir) => {
      val pair = tradePairs(s, dir)
      val edges = pair.select(col("c").as("src"), col("s").as("dst"))
        .union(pair.select(col("s").as("src"), col("c").as("dst")))
      Graph.pageRank(edges, PageRankIters)
        .orderBy(col("rank").desc, col("node")).limit(100)
    }),

    // X29 CDC apply/merge — the other half of X27: merge a change batch
    // (orders as upserts; 'F'-status orders modeled as deletes) into the
    // customer-dimension snapshot, materializing latest-row-per-key.
    // One key shuffle; the rank-1 window becomes WindowGroupLimit
    // (map-side top-1 per key) — spec-pinned
    "x29_cdc_apply" -> ((s, dir) => {
      val snap = Tables.customer(s, dir).select(
        col("c_custkey").as("cust_key"),
        col("c_mktsegment").as("attr"),
        to_timestamp(lit("1990-01-01 00:00:00")).as("ts"),
        lit(0L).as("tie"),
        lit("U").as("op"))
      val chg = Tables.orders(s, dir).select(
        col("o_custkey").as("cust_key"),
        col("o_orderpriority").as("attr"),
        col("o_orderdate").as("ts"),
        col("o_orderkey").as("tie"),
        when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"))
      Cdc.applyChanges(snap, chg, "cust_key", "ts", "tie", "op")
        .orderBy("cust_key")
    }),

    // X31 deterministic mixture sampling — keep a 50/30/20 blend of
    // three sources, scarcest source kept whole, exact-integer cuts
    "x31_mixture_sample" -> ((s, dir) => {
      Sample.mixture(Tables.documents(s, dir), "doc_id", "source",
        MixtureWeightsPpm, seed = MixtureSeed)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // X55 join-based mixture — identical exact-integer cuts to x31, but
    // weights arrive as a broadcast dim table and the cuts derive
    // distributed in DECIMAL(38,0): the no-cap path for web-domain
    // cardinality (same oracle SQL as x31 proves cut-for-cut equality)
    "x55_mixture_joined" -> ((s, dir) => {
      import s.implicits._
      Sample.mixtureJoined(Tables.documents(s, dir), "doc_id", "source",
        MixtureWeightsPpm.toSeq.sortBy(_._1).toDF("source", "w_ppm"),
        seed = MixtureSeed)
        .select("doc_id", "source").orderBy("doc_id")
    }),

    // X32 corpus-overlap sketches — per-source MinHash signatures
    // (mergeable min-aggregates), pairwise agreement estimates
    // cross-source shingle Jaccard from kilobyte sketches
    "x32_corpus_overlap" -> ((s, dir) => {
      val sh = Dedup.shingleTable(
        Tables.documents(s, dir).select(col("source"), col("text")),
        "source", "text")
      Dedup.sketchOverlap(Dedup.minhashSignatures(sh, "source", 16),
        "source", 16).orderBy("g1", "g2")
    }),

    // X30 incremental near-dup — dedup the way a production pipeline
    // actually runs it: the delta batch (doc_id % 7 = 0) probes the
    // corpus's persisted band index; corpus×corpus pairs are never
    // recomputed, per-batch cost scales with the delta
    "x30_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // signatures are row-local, so slicing the pinned corpus index
      // by doc_id IS signing the slices — the indexed form probes the
      // shared artifact instead of re-hashing both sides per run
      val sigs = corpusSigs16(s, dir)
      def bands(p: Column => Column) = Dedup.bandRows(
        sigs.filter(p(col("doc_id"))), "doc_id", numSigs = 16,
        rowsPerBand = 4)
      Dedup.incrementalLshPairsIndexed(
        docs.filter(col("doc_id") % 7 === 0), bands(_ % 7 === 0),
        docs.filter(col("doc_id") % 7 =!= 0), bands(_ % 7 =!= 0),
        "doc_id", "text", threshold = JaccardThreshold)
        .orderBy("d1", "d2")
    }),

    // X33 overlapping token-window chunking — one zero-shuffle generator
    // projection (sequence + posexplode + slice)
    "x33_chunking" -> ((s, dir) => {
      Curate.chunk(Tables.documents(s, dir), "doc_id", "text",
        ChunkSize, ChunkStride).orderBy("doc_id", "chunk_idx")
    }),

    // X34 corpus-common n-gram share — the cross-document boilerplate
    // gate; df from distinct (doc, ngram) pairs, relative-ppm cutoff
    "x34_common_ngrams" -> ((s, dir) => {
      TextAnalysis.commonNgramShare(Tables.documents(s, dir), "doc_id",
        "text", n = 3, commonPpm = CommonNgramPpm).orderBy("doc_id")
    }),

    // X35 positional phrase search — postings adjacency equi-join chain,
    // term filters pushed to the postings scan
    "x35_phrase_search" -> ((s, dir) => {
      Retrieval.phraseSearch(Tables.documents(s, dir), "doc_id", "text",
        PhraseTerms).orderBy("doc_id")
    }),

    // X36 SemDeDup — semantic near-dup drop within coarse k-means
    // clusters; reuses the session-cached IVF-PQ coarse centroids (same
    // nlist), so clustering costs no additional training pass
    "x36_semdedup" -> ((s, dir) =>
      semDeduped(s, dir).orderBy("vec_id")),

    // X37 distributed Lloyd k-means — fixed-point exact, deterministic
    // lowest-id init, so the oracle replays the rounds from data alone
    "x37_kmeans" -> ((s, dir) => {
      KMeansOp.fit(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = KMeansK, iters = KMeansIters).orderBy("vec_id")
    }),

    // X156 simplified-silhouette cluster audit over the SAME Lloyd
    // rounds as x37 (shared trainer, shared knobs): per cluster, the
    // integer-exact (b-a)/max(a,b) separation in micro units — a and b
    // from ONE fused centroid_argmin2 sweep, no pairwise distances
    "x156_silhouette" -> ((s, dir) =>
      KMeansOp.silhouette(Tables.embeddings(s, dir), "vec_id",
        "embedding", k = KMeansK, iters = KMeansIters)
        .orderBy("cluster")),

    // X40 temperature-flattened mixture — weights ∝ count^0.3 derived
    // driver-side from the domain-count dim table, then the same exact
    // scan-side keep-cut machinery as x31. The test corpus's sources are
    // deliberately uniform, so the demo derives a 70/20/10-skewed domain
    // from the id (mirrored in the oracle) — flattening visibly
    // downsamples the head domain toward the tail
    "x40_temperature_mix" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).withColumn("domain",
        concat(lit("d"), when(col("doc_id") % 10 < 7, 0)
          .when(col("doc_id") % 10 < 9, 1).otherwise(2)))
      val counts = docs.groupBy(col("domain"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val w = Sample.temperatureWeightsPpm(counts, TempAlphaPermille)
      lastTempWeights = Some(w)
      Sample.mixture(docs, "doc_id", "domain", w, seed = TempMixSeed)
        .select("doc_id", "domain").orderBy("doc_id")
    }),

    // X39 feature hashing — sparse fixed-dim document vectors with no
    // vocabulary pass; one explode + one (doc, bucket) aggregation
    "x39_feature_hash" -> ((s, dir) => {
      TextAnalysis.featureHash(Tables.documents(s, dir), "doc_id", "text",
        dim = FeatureHashDim, seed = FeatureHashSeed)
        .orderBy("doc_id", "bucket")
    }),

    // X44 BPE merge training — iters rounds of most-frequent-adjacent-
    // pair merge over the VOCABULARY-sized word-type table; merges and
    // per-doc token counts both replay from the data alone
    "x44_bpe_merges" -> ((s, dir) => {
      Bpe.mergeTable(s, bpeTrained(s, dir)._1).orderBy("r")
    }),

    "x44_bpe_tokens" -> ((s, dir) => {
      Bpe.docTokenCounts(Tables.documents(s, dir), "doc_id", "text",
        bpeTrained(s, dir)._2).orderBy("doc_id")
    }),

    // X54 BPE encode-at-scale — the trained merges applied in rank order
    // over the input's distinct word types, corpus joined once; the
    // oracle replays the identical training fold and reassembles the
    // token stream in word order
    "x54_bpe_encode" -> ((s, dir) =>
      bpeEncoded(s, dir).orderBy("doc_id")),

    // X43 ANN recall audit — recall@k of every approximate tier against
    // the exact top-k on the same corpus/queries; the exact list is
    // pinned once, intersections are semi joins of audit-sized lists
    "x43_ann_recall" -> ((s, dir) => {
      val (exact, tiers) = annRuns(s, dir)
      Similarity.recallAudit(tiers, exact.select("qid", "cid"))
        .orderBy("method")
    }),

    // X51 exact re-rank: top-R ADC candidates from a wider IVF-PQ probe,
    // re-scored with the exact quantized cosine — the FAISS refine
    // recipe; x43 measures its recall against the raw ADC ranking
    "x51_ann_refine" -> ((s, dir) =>
      ivfPqRefined(s, dir)
        .select("qid", "cid", "rank", "sim").orderBy("qid", "rank")),

    // X51 JL knob sweep: the tier's two free knobs — projection width
    // dOut (scan cost scales dOut/dIn) and coarse-cut radius candR
    // (re-rank cost scales candR/N) — priced on the recall frontier
    // against the shared exact truth; the audit that justifies the
    // shipping default (see PLANS round 15). Names sort by cost arm.
    "x51_jl_sweep" -> ((s, dir) => {
      // ground truth shared with the x43/x112/x113 audits (annRuns);
      // arm run lists shared via jlRuns — the sweep prices the metric
      // fold, not a rebuild of four projection pipelines
      val exact = annRuns(s, dir)._1.select("qid", "cid")
      val runs = jlRuns(s, dir)
      Similarity.recallAudit(JlSweepArms.map { case (name, _, _) =>
        name -> runs(name)
      }, exact).orderBy("method")
    }),

    // X51 JL-fronted exact re-rank: the x122 sign projection as the
    // coarse tier (row-local, zero trained state), candR nearest by
    // exact projected L2, then the exact cosine re-rank — the
    // projection composed into the ANN family it exists to front
    "x51_jl_refine" -> ((s, dir) =>
      // the shipping arm's pinned run list (see jlRuns) — identical
      // pipeline, shared with the sweep's jl_d16_r150 arm
      jlShippingRun(s, dir)
        .select("qid", "cid", "rank", "sim").orderBy("qid", "rank")),

    // X51 multi-probe sign-LSH: queries probe every bucket within
    // Hamming distance 2 — the recall recovery path for the cheapest tier
    "x51_lsh_multiprobe" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.lshMultiProbeTopK(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", TopK, bits = LshBits, probeDist = LshProbeDist)
        .select("qid", "cid", "rank", "sim").orderBy("qid", "rank")
    }),

    // X42 trained NB classifier — integer micro-nat scores, argmax with
    // lex tie-break; trains on the deterministic train split, classes
    // from the corpus's lang labels (the labeled column the data ships)
    "x42_nb_quality" -> ((s, dir) =>
      nbClassified(s, dir).select("doc_id", "pred", "score_micro")
        .orderBy("doc_id")),

    // X124 margin-reliability audit: the trained classifier's verdicts
    // grouped by confidence — margin_micro (winner minus runner-up,
    // exact micro-nats) binned by DIGIT COUNT (exact log10 buckets, no
    // float boundary), per-bin accuracy vs the declared label. The
    // calibration question ("does a bigger margin mean a more reliable
    // prediction?") answered in exact integer lanes; group-grain
    // output, one corpus classify pass shared with x42/x46
    "x124_margin_reliability" -> ((s, dir) => {
      val declared = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"))
      nbClassified(s, dir)
        .join(declared, Seq("doc_id"))
        // degenerate single-class corpus: classify emits NULL margin
        // when there is no runner-up; the oracle's inner join on rn = 2
        // drops those docs, so the engine drops them too (round-15
        // review fix — both sides now agree on the single-class edge)
        .filter(col("margin_micro").isNotNull)
        .select(col("margin_micro"),
          (col("pred") === col("lang")).cast("long").as("hit"))
        .groupBy(length(col("margin_micro").cast("string")).cast("long")
          .as("bin"))
        // corpus-scale lanes in DECIMAL (the x125/x126 rule): the ppm
        // product and the margin sum would pass BIGINT around 10^13
        // rows per bin; sum_margin casts back guarded — loud, not
        // wrapped — keeping the test-SF schema BIGINT
        .agg(count(lit(1)).as("n"), sum(col("hit")).as("n_correct"),
          sum(col("margin_micro").cast("decimal(38,0)")).as("__sm"))
        .select(col("bin"), col("n"), col("n_correct"),
          expr("CAST(CAST(n_correct AS DECIMAL(38,0)) * 1000000 div n " +
            "AS BIGINT)").as("acc_ppm"),
          expr(s"""CASE WHEN __sm > ${Long.MaxValue}BD THEN
                  |  CAST(raise_error('x124: sum_margin exceeds BIGINT —
                  | widen the lane') AS BIGINT)
                  |ELSE CAST(__sm AS BIGINT) END"""
            .stripMargin.replace("\n", " ")).as("sum_margin"))
        .orderBy("bin")
    }),

    // X46 language-mismatch audit — the NB gate composed: docs whose
    // predicted language disagrees with the declared label (mislabeled
    // or mixed-language rows a cleaning pipeline quarantines); shares
    // the session-cached classifier with x42
    "x46_lang_mismatch" -> ((s, dir) => {
      val declared = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      nbClassified(s, dir)
        .join(declared, Seq("doc_id"))
        .filter(col("pred") =!= col("lang"))
        .select(col("doc_id"), col("lang"), col("pred"), col("score_micro"))
        .orderBy("doc_id")
    }),

    // X41 sequence-level exact substring dedup — maximal shared token
    // runs via window-fingerprint diagonals: one corpus-sized shuffle
    // (the hash join), run detection reuses its own exchange
    "x41_substring_dedup" -> ((s, dir) => {
      Dedup.substringRunsFrom(substrWindows(s, dir), "doc_id",
        k = SubstrK, minSpan = SubstrMinSpan)
        .orderBy("d1", "d2", "a_start", "b_start")
    }),

    // X47 winnowing fingerprints — the MOSS selection: per-doc minimum
    // window hash per width-w frame (ties rightmost), the index-size
    // dial for the substring family
    "x47_winnow" -> ((s, dir) => {
      Dedup.winnowFrom(substrWindows(s, dir), "doc_id", w = WinnowW)
        .orderBy("doc_id", "p")
    }),

    // X48 two-tier substring dedup — fingerprint-index candidates +
    // member-pruned full verification; EQUALS the exhaustive x41 form
    // above the guarantee threshold, so the oracle IS the exhaustive SQL
    "x48_substring_pruned" -> ((s, dir) => {
      Dedup.substringRunsPrunedFrom(substrWindows(s, dir), "doc_id",
        k = SubstrK, minSpan = SubstrK + WinnowW - 1, w = WinnowW)
        .orderBy("d1", "d2", "a_start", "b_start")
    }),

    // X49 content-defined chunking over the binary blob column — the
    // LBFS/gear-CDC boundary rule with the engine-portable md5 window
    "x49_cdc_chunks" -> ((s, dir) =>
      cdcChunked(s, dir).orderBy("doc_id", "chunk_idx")),

    // X50 chunk-level dedup ledger — identical chunk hashes across the
    // corpus (shared spans dedup at the storage layer even at
    // different byte offsets: the point of content-defined boundaries);
    // reads the session-cached chunk table, not a recompute
    "x50_chunk_dedup" -> ((s, dir) =>
      Multimodal.chunkDedup(cdcChunked(s, dir), "doc_id")
        .orderBy("chunk_md5")),

    // X45 substring-run removal — the actionable half of x41: later
    // docs drop spans a more-canonical doc already carries; untouched
    // docs pass through bit-identical (semi-join pruned, never exploded)
    "x45_remove_spans" -> ((s, dir) => {
      Dedup.removeRunsFrom(Tables.documents(s, dir),
        substrWindows(s, dir), "doc_id", "text",
        k = SubstrK, minSpan = SubstrMinSpan)
        .orderBy("doc_id")
    }),

    // X38 split-leakage audit — near-dup pairs (the session-cached LSH
    // stage) that straddle a train/valid/test boundary: contamination a
    // split-then-dedup pipeline would ship into evaluation
    "x38_split_leakage" -> ((s, dir) => {
      val splits = Curate.splitAssign(Tables.documents(s, dir), "doc_id",
        Seq("train" -> SplitTrain, "valid" -> SplitValid), rest = "test",
        seed = SplitSeed).select(col("doc_id"), col("split"))
      lshPairs(s, dir)
        .join(splits.select(col("doc_id").as("d1"), col("split").as("split1")), "d1")
        .join(splits.select(col("doc_id").as("d2"), col("split").as("split2")), "d2")
        .filter(col("split1") =!= col("split2"))
        .select("d1", "d2", "jac", "split1", "split2")
        .orderBy("d1", "d2")
    }),

    // X60 eval-set decontamination — X13's 8-gram overlap positions
    // composed with X45's interval-union span removal: the corpus
    // (minus the eval docs themselves) with every eval-overlapping
    // span excised; eval shingles broadcast, untouched docs pass
    // through bit-identical via the semi-join-pruned rebuild
    "x60_decontaminate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ev = Sample.uniform(docs, "doc_id", 0.1, seed = "eval")
      val train = docs.join(ev.select("doc_id"), Seq("doc_id"), "left_anti")
      Dedup.decontaminate(train, ev, "doc_id", "text", n = 8)
        .orderBy("doc_id")
    }),

    // X62 prototype-based diversity pruning (SSL prototypes / D4) —
    // per-cluster cosine-to-centroid rank in signed fixed-point cos²,
    // top prunePpm/10^6 of each cluster dropped; reuses the
    // session-cached IVF-PQ coarse centroids
    "x62_proto_prune" -> ((s, dir) => {
      ProtoPrune.prune(Tables.embeddings(s, dir), "vec_id", "embedding",
        nlist = IvfPqNlist, prunePpm = ProtoPrunePpm,
        centroids = Some(ivfPqTrained(s, dir)._1)).orderBy("vec_id")
    }),

    // X63 the full D4 pipeline (Tirumala et al. 2023): SemDeDup's
    // keep-set, then prototype pruning over what survives — per-cluster
    // drop counts re-derive over the DEDUPED population (the paper's
    // order; both stages share the session-cached coarse centroids and
    // the semDedup stage is computed once per session with x36)
    "x63_d4" -> ((s, dir) => {
      val kept = semDeduped(s, dir).filter(col("is_kept") === 1)
        .select("vec_id")
      ProtoPrune.prune(
        Tables.embeddings(s, dir).join(kept, Seq("vec_id"), "left_semi"),
        "vec_id", "embedding", nlist = IvfPqNlist,
        prunePpm = ProtoPrunePpm,
        centroids = Some(ivfPqTrained(s, dir)._1)).orderBy("vec_id")
    }),

    // X61 DSIR importance resampling — hashed unigram+bigram target/raw
    // log-ratios (micro-nat seam), exact integer dot-product weights,
    // deterministic Gumbel top-k; ratio table broadcasts, corpus never
    // shuffled by the model
    "x61_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dsir.select(docs, docs.filter(col("lang") === "en").select("doc_id"),
          "doc_id", "text", k = DsirK, dim = DsirDim, seed = DsirSeed)
        .orderBy("doc_id")
    }),

    // X59 trained linear quality classifier — epoch-synchronous averaged
    // perceptron over the X39 hashed features, integer-exact end to end;
    // the oracle re-trains all epochs from the raw data (x37 discipline)
    "x59_linear_quality" -> ((s, dir) =>
      lpClassified(s, dir).orderBy("doc_id")),

    // X59/X42 agreement audit — the discriminative (perceptron) and
    // generative (NB) gates compared per declared language: agreement
    // rate plus each model's label accuracy on the labeled corpus
    "x59_agreement" -> ((s, dir) => {
      val declared = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val nb = nbClassified(s, dir)
        .select(col("doc_id"), col("pred").as("nb_pred"))
      val lp = lpClassified(s, dir)
        .select(col("doc_id"), col("pred").as("lp_pred"))
      declared.join(nb, Seq("doc_id")).join(lp, Seq("doc_id"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("nb_pred") === col("lp_pred"), 1L).otherwise(0L))
            .as("n_agree"),
          sum(when(col("nb_pred") === col("lang"), 1L).otherwise(0L))
            .as("n_nb_correct"),
          sum(when(col("lp_pred") === col("lang"), 1L).otherwise(0L))
            .as("n_lp_correct"))
        .orderBy("lang")
    }),

    // X64 C4 line-based cleaning over the synthesized paged twin —
    // scan-side higher-order functions, zero shuffle end to end
    "x64_c4_clean" -> ((s, dir) =>
      C4.clean(c4Page(s, dir), "doc_id", "page", C4MinWords, C4MinLines)
        .orderBy("doc_id")),

    // X65 Gopher document-quality gate over its injected paged twin —
    // integer cross-multiplied ratio thresholds, zero shuffle
    "x65_gopher_rules" -> ((s, dir) =>
      Gopher.qualityRules(gopherPage(s, dir), "doc_id", "page")
        .orderBy("doc_id")),

    // X67 Gopher repetition signals over the duplicate-injected paged
    // twin — row-local sorted folds, zero shuffle
    "x67_gopher_rep" -> ((s, dir) =>
      Gopher.repetitionSignals(repPage(s, dir), "doc_id", "page")
        .orderBy("doc_id")),

    // X68 the composed MassiveText-style gate: C4 line cleaning, then
    // Gopher quality + repetition verdicts over the CLEANED text — one
    // scan-side projection, no join between stages
    "x68_massivetext" -> ((s, dir) =>
      MassiveText.gate(mtPage(s, dir), "doc_id", "page",
        C4MinWords, C4MinLines).orderBy("doc_id")),

    // X69 C4 three-sentence-span corpus dedup over the cyclic twin —
    // digest-only global shuffle, row-local line excision
    "x69_c4_spandedup" -> ((s, dir) =>
      C4.spanDedup(cycPage(s, dir), "doc_id", "page", span = 3)
        .orderBy("doc_id")),

    // X66 UniMax waterfilling allocation (language-sized)
    "x66_unimax_alloc" -> ((s, dir) =>
      UniMax.allocate(
        UniMax.tokenCounts(Tables.documents(s, dir), "lang", "text"),
        "lang", UniMaxBudget, UniMaxEpochs).orderBy("lang")),

    // X66 the materialized per-document repeat counts (full epochs +
    // hash-prefix partial epoch, x57 greedy contract per language)
    "x66_unimax" -> ((s, dir) =>
      UniMax.select(Tables.documents(s, dir), "doc_id", "lang", "text",
        UniMaxBudget, UniMaxEpochs, seed = UniMaxSeed).orderBy("doc_id")),

    // X70 deterministic epoch shuffle (two-pass prefix-group rank; the
    // oracle is the naive per-shard global window, x48 discipline)
    "x70_epoch_shuffle" -> ((s, dir) =>
      Sample.epochShuffle(Tables.documents(s, dir), "doc_id",
        EpochShards, EpochSeed).orderBy("doc_id")),

    // X71 contrastive hard-negative mining: x2's broadcast top-k shape
    // with the label-mismatch predicate riding the same join
    "x71_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < NumQueries),
        "vec_id", "embedding", "label", TopK)
        .select("qid", "cid", "clabel", "rank", "sim")
        .orderBy("qid", "rank")
    }),

    // X72 code-vs-prose routing gate over the code twin (synthesis at
    // [[codePage]]) — scan-side integer-ppm signals, >= 2-of-4 vote
    "x72_code_detect" -> ((s, dir) =>
      CodeDetect.detect(codePage(s, dir), "doc_id", "page")
        .orderBy("doc_id")),

    // X73 Unicode script mix over the script twin (synthesis at
    // [[scriptPage]]) — row-local strip-and-diff codepoint counts
    "x73_script_mix" -> ((s, dir) =>
      ScriptMix.analyze(scriptPage(s, dir), "doc_id", "page")
        .orderBy("doc_id")),

    // X74 Bloom-gated eval contamination — x13's exact semantics on the
    // x60 train/eval split, computed through a 32 KB scan-side bitmap
    // pre-gate + exact verify; the oracle is the naive exact join (the
    // gate is lossless — no false negatives)
    "x74_bloom_decon" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val ev = Sample.uniform(docs, "doc_id", 0.1, seed = "eval")
      val train = docs.join(ev.select("doc_id"), Seq("doc_id"), "left_anti")
      Bloom.contamination(train, ev, "doc_id", "text", n = 8,
        m = BloomBits, k = BloomK).orderBy("doc_id")
    }),

    // X75 HITS hubs & authorities over the DIRECTED customer→supplier
    // trade graph (pure bipartite: customers are hubs, suppliers
    // authorities) — exact fixed-point iterations, oracle unrolled
    "x75_hits" -> ((s, dir) => {
      val pair = tradePairs(s, dir)
      Graph.hits(pair.select(col("c").as("src"), col("s").as("dst")),
        HitsIters).orderBy(col("auth").desc, col("node")).limit(100)
    }),

    // X76 corpus data card — docs/tokens/chars/exact-dup counts for
    // every (source, lang) slice and every marginal, one CUBE pass
    "x76_datacard" -> ((s, dir) =>
      Report.dataCard(Tables.documents(s, dir), "source", "lang",
        "text", "n_chars").orderBy("src", "lng")),

    // X77 tokenizer fertility per language under the trained BPE —
    // reads the session-cached x54 encode artifact, exact integer ppm
    "x77_fertility" -> ((s, dir) =>
      Bpe.fertility(Tables.documents(s, dir), bpeEncoded(s, dir),
        "doc_id", "text", "lang").orderBy("lang")),

    // X78 margin-based bitext mining between the label-0 and label-1
    // embedding slices — ratio margin over one broadcast pair table,
    // exact integer micro-cosines and ppm margins
    "x78_bitext_margin" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      Similarity.bitextMargin(emb.filter(col("label") === 0),
        emb.filter(col("label") === 1), "vec_id", "embedding", BitextK)
        .orderBy("aid")
    }),

    // X79 SimHash near-dup PAIRS at the production signature width —
    // 64-bit signatures, pigeonhole banded self-join, popcount verify;
    // the signature table pins once and feeds both join sides
    "x79_simhash_hamming" -> ((s, dir) => {
      val sig = Dedup.simhash64(
        Dedup.shingleTable(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id").localCheckpoint(false)
      Dedup.hammingPairs(sig, "doc_id", SimhashMaxDist).orderBy("d1", "d2")
    }),

    // X80 hybrid retrieval — x25's sparse BM25 ranking fused with a
    // dense cosine ranking for embedding vec 0 by exact-integer
    // reciprocal-rank fusion; fusion cost is ranker-output-sized
    "x80_hybrid_rrf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val dense = Similarity.bruteForceTopK(emb,
          emb.filter(col("vec_id") === RrfQueryVec), "vec_id", "embedding",
          Bm25TopK)
        .select(col("cid").as("doc_id"), col("rank"))
      val sparse = Retrieval.bm25(Tables.documents(s, dir), "doc_id",
          "text", Bm25Terms, Bm25TopK)
        .select(col("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq("bm25" -> sparse, "cos" -> dense), "doc_id",
          kRrf = RrfK)
        .orderBy(col("rrf_micro").desc, col("doc_id"))
    }),

    // X81 T5 span-corruption pair materialization — grid-anchored
    // deterministic spans, block-ordinal sentinels, one scan-side
    // projection (stateless gate; zero shuffle)
    "x81_span_corrupt" -> ((s, dir) =>
      Augment.spanCorrupt(Tables.documents(s, dir), "doc_id", "text",
        grid = SpanGrid, maxSpan = SpanMax, pStart = SpanP,
        seed = SpanSeed).orderBy("doc_id")),

    // X82 dedup-tier audit — precision/recall of MinHash-LSH and
    // SimHash-d3 pairs against exact Jaccard ground truth, integer ppm;
    // every stage is pair-list-sized (the x43 discipline for dedup)
    "x82_dedup_audit" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val sh = Dedup.shingleTable(docs, "doc_id", "text")
      val truth = Dedup.jaccardPairs(sh,
        Dedup.shingleCounts(docs, "doc_id", "text"), "doc_id",
        JaccardThreshold)
      val sig = Dedup.simhash64(sh, "doc_id").localCheckpoint(false)
      Dedup.pairAudit(Seq(
          "minhash_lsh" -> lshPairs(s, dir),
          "simhash64_d3" -> Dedup.hammingPairs(sig, "doc_id",
            SimhashMaxDist)),
        truth).orderBy("method")
    }),

    // X83 per-source distinct-shingle cardinality: linear-counting
    // sketch (bounded m-bucket state) audited against the exact count
    "x83_cardinality" -> ((s, dir) =>
      // pinned distinct membership table shared with x88/x92/x118 (see
      // sourceShingles); linear counting is duplicate-insensitive, so
      // the pre-distinct grain gives identical (n_exact, filled)
      Sketch.linearCount(sourceShingles(s, dir), "source", "s",
        SketchHexDigits).orderBy("grp")),

    // X84 label-propagation communities over the undirected trade graph
    // (both directions, the x28 edge set) — deterministic ties, exact
    // integer counting, oracle unrolled
    "x84_label_prop" -> ((s, dir) => {
      val pair = tradePairs(s, dir)
      val edges = pair.select(col("c").as("src"), col("s").as("dst"))
        .union(pair.select(col("s").as("src"), col("c").as("dst")))
      Graph.labelPropagation(edges, LpaIters).orderBy("node")
    }),

    // X85 Zipf-law fit over the corpus vocabulary — micro-nat integer
    // regression moments, one double division at the end
    "x85_zipf" -> ((s, dir) =>
      CorpusStats.zipfFit(Tables.documents(s, dir), "text")),

    // X86 unigram-LM tokenizer training (Kudo 2018 hard-EM) — the
    // final piece table after the seeded Viterbi-EM rounds; oracle
    // replays seed + every round from the data (x37/x44 discipline)
    "x86_unigram" -> ((s, dir) =>
      uniTrained(s, dir).orderBy(col("cnt").desc, col("piece"))),

    // X87 corpus-wide paragraph dedup (the Dolma grain): the x69 span
    // machinery at span=1 over the duplicate-rich cyclic twin —
    // first (doc, idx) occurrence wins, digests-only shuffle,
    // row-local excision
    "x87_paragraph_dedup" -> ((s, dir) =>
      C4.spanDedup(cycPage(s, dir), "doc_id", "page", span = 1)
        .orderBy("doc_id")),

    // X87 cross-corpus paragraph decontamination: docs vs the doc_id%7
    // "prior release" slice, x74 bitmap gate + exact verify — the
    // oracle is the naive exact join, re-proving the gate lossless
    "x87_paragraph_decon" -> ((s, dir) => {
      val page = cycPage(s, dir)
      Dolma.paragraphDecontaminate(
        page.filter(col("doc_id") % 7 =!= 0),
        page.filter(col("doc_id") % 7 === 0),
        "doc_id", "page", m = BloomBits, k = BloomK).orderBy("doc_id")
    }),

    // X86 fertility audit: the trained unigram tokenizer vs the x54
    // BPE on the identical corpus, per language — the x77 table run
    // under both vocabularies and joined (both read session-cached
    // training artifacts)
    "x86_fertility" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val bpe = Bpe.fertility(docs, bpeEncoded(s, dir),
          "doc_id", "text", "lang")
        .select(col("lang"), col("fertility_ppm").as("bpe_fertility_ppm"))
      val uni = Bpe.fertility(docs,
          UnigramLm.docTokenCounts(docs, "doc_id", "text",
            uniTrained(s, dir), UniPieceLen),
          "doc_id", "text", "lang")
        .select(col("lang"), col("fertility_ppm").as("uni_fertility_ppm"))
      bpe.join(uni, Seq("lang")).orderBy("lang")
    }),

    // X88 HyperLogLog per-source shingle cardinality — the x83 input
    // with 256 registers instead of 65536 linear-counting buckets: the
    // max-rank register survives cardinalities that saturate linear
    // counting, at 1/256th the state
    "x88_hll" -> ((s, dir) =>
      // pinned distinct membership table shared with x83/x92/x118 (see
      // sourceShingles); HLL registers and the exact countDistinct
      // baseline are duplicate-insensitive
      Sketch.hll(sourceShingles(s, dir), "source", "s", HllHexDigits)
        .orderBy("grp")),

    // X88 sketch-merge: union cardinality of two OVERLAPPING corpus
    // slices from their registers alone (pointwise max), neither slice
    // re-scanned at merge time — the cross-shard rollup HLL exists for
    "x88_hll_union" -> ((s, dir) => {
      // the two overlapping slices are membership-flag filters over the
      // pinned distinct table (see sourceShingles) — register max and
      // the union's exact countDistinct are duplicate-insensitive
      val ss = sourceShingles(s, dir)
      Sketch.hllMerged(
        ss.filter(col("ia") === 1L),
        ss.filter(col("ib") === 1L),
        "source", "s", HllHexDigits).orderBy("grp")
    }),

    // X89 Count-Min heavy hitters: the exact top-K tokens (the audit
    // baseline) point-queried against the 1024-counter sketch; the
    // over-estimate-only guarantee is asserted in-plan — an estimate
    // below the exact count aborts the query instead of hashing green
    "x89_heavy_hitters" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
      val sk = CountMin.sketch(toks, "token", CmsDepth, CmsHexDigits)
      val top = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(HeavyTopK)
      CountMin.estimate(sk, top.select("token"), "token",
          CmsDepth, CmsHexDigits)
        .join(top, Seq("token"))
        .select(col("token"), col("n_exact"), col("est"),
          expr("""CASE WHEN est < n_exact
                 |  THEN CAST(raise_error('count-min under-estimated: impossible') AS BIGINT)
                 |  ELSE (est - n_exact) * 1000000 div n_exact
                 |END""".stripMargin).as("over_ppm"))
        .orderBy(col("n_exact").desc, col("token"))
    }),

    // X90 WordPiece training — the likelihood-scored merge table
    // (Schuster & Nakajima 2012); oracle replays every round from the
    // data with the identical quantized-score argmax
    "x90_wordpiece" -> ((s, dir) =>
      WordPiece.mergeTable(s, wpTrained(s, dir)._1).orderBy("r")),

    // X90 learned subword inventory after the merges — '##'-marked
    // continuations and merged pieces with freq-weighted counts
    "x90_wp_vocab" -> ((s, dir) =>
      WordPiece.vocab(wpTrained(s, dir)._2)
        .orderBy(col("cnt").desc, col("piece"))),

    // X91 mergeable quantile summary over doc lengths per language —
    // est quantiles read off the bounded weighted sample, true rank
    // audited against the corpus, bound asserted in-plan
    "x91_quantile_sketch" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val summ = Quantile.summary(docs, "lang", "n_chars", "doc_id",
        QShards, QK)
      Quantile.estimate(summ, docs, "lang", "n_chars", QPhisPpm,
        QShards, QK).orderBy("grp", "phi_ppm")
    }),

    // X92 KMV overlap: Jaccard between the x88 corpus slices estimated
    // from two 128-digest sketches alone, exact Jaccard (the full
    // shingle join) alongside as the audit baseline
    "x92_kmv_overlap" -> ((s, dir) => {
      // slice sketches + membership table shared with x118/x88/x83 (see
      // sourceShingles): the exact union/intersection audit is one agg
      // over the pinned membership flags instead of two joins over
      // freshly-recomputed distinct slices
      val (ska, skb) = kmvSliceSketches(s, dir)
      val est = Kmv.jaccardEst(ska, skb, KmvK)
      val ex = sourceShingles(s, dir)
        .filter(col("ia") + col("ib") > 0)
        .groupBy(col("source").as("grp")).agg(
          count(lit(1)).as("n_un"),
          sum(col("ia") * col("ib")).as("n_i"))
      est.join(ex, Seq("grp"))
        .select(col("grp"), col("n_u"), col("est_jaccard_ppm"),
          expr("coalesce(n_i, 0L) * 1000000 div n_un")
            .as("exact_jaccard_ppm"),
          expr("abs(est_jaccard_ppm - " +
            "coalesce(n_i, 0L) * 1000000 div n_un)").as("abs_err_ppm"))
        .orderBy("grp")
    }),

    // X93 exact triangle counting over the part co-purchase graph —
    // per-node degree + triangle participation, each triangle
    // generated once at its (degree, id)-minimum vertex
    "x93_triangles" -> ((s, dir) =>
      copurchaseTri(s, dir).orderBy("node")),

    // X93 global clustering: transitivity = closed wedges over all
    // wedges, exact integers derived from the per-node table
    "x93_clustering" -> ((s, dir) =>
      copurchaseTri(s, dir).agg(
        count(lit(1)).as("n_nodes"),
        expr("sum(deg) div 2").as("n_edges"),
        expr("sum(tri) div 3").as("n_triangles"),
        expr("sum(deg * (deg - 1)) div 2").as("n_wedges"),
        expr("sum(tri) * 1000000 div (sum(deg * (deg - 1)) div 2)")
          .as("transitivity_ppm"))),

    // X94 PII policy (the Dolma recipe): emails/phones/IPs injected
    // deterministically (plus two negative controls that must NOT
    // match), per-category counts, mask-or-drop verdict, masked text
    // for survivors — all one scan-side projection
    "x94_pii_policy" -> ((s, dir) =>
      Pii.policy(piiAugmented(Tables.documents(s, dir)), "doc_id", "aug",
        PiiMaxHits).orderBy("doc_id")),

    // X94 corpus PII report: per-verdict doc counts + category totals
    "x94_pii_summary" -> ((s, dir) =>
      Pii.summary(piiAugmented(Tables.documents(s, dir)), "doc_id", "aug",
        PiiMaxHits).orderBy("verdict"))
  ) ++ Map[String, (SparkSession, String) => DataFrame](

    // X95 edit-distance verification over a LOOSE MinHash band tier
    // (8 bands of 2 sigs — a deliberately high-recall / low-precision
    // candidate stage, unlike x1's 4x4): Levenshtein per candidate,
    // length-normalized exact-integer similarity, confirmed verdict;
    // rejected rows are the sketch tier's measured false positives
    "x95_edit_verify" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // same 16 signature lanes as the x1 tier, banded 8×2 here —
      // read from the shared persisted index (corpusSigs16)
      val cands = Dedup.lshCandidates(corpusSigs16(s, dir),
        "doc_id", numSigs = 16, rowsPerBand = EditRowsPerBand)
      Dedup.editVerify(docs, cands, "doc_id", "text", EditSimPpm)
        .orderBy("d1", "d2")
    }),

    // X96 corpus BLEU-4 per language over adjacent-doc pairs (hyp =
    // doc i, ref = doc i+1 — a deterministic stand-in for an upstream
    // aligner's output): clipped n-gram match/total counts stay exact
    // integers; the geometric mean + brevity penalty is the one rounded
    // double. Groups with no 4-gram match exercise the zero branch,
    // groups with r > c exercise the brevity penalty.
    "x96_bleu" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = d.as("a").join(d.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.lang").as("lang"), col("a.doc_id").as("pid"),
          col("a.text").as("hyp"), col("b.text").as("ref"))
      Bleu.corpusBleu(pairs, "lang", "pid", "hyp", "ref", maxN = 4)
        .orderBy("grp")
    }),

    // X97 corpus ROUGE-1/2/L per language over the same adjacent-doc
    // pairing as x96: clipped matches + hyp/ref totals + native-DP LCS
    // stay exact integers; the three F1 ratios are the rounded doubles.
    // Scrambled vs aligned word order separates rougel_f from rouge1_f.
    "x97_rouge" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = d.as("a").join(d.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.lang").as("lang"), col("a.doc_id").as("pid"),
          col("a.text").as("hyp"), col("b.text").as("ref"))
      Rouge.corpusRouge(pairs, "lang", "pid", "hyp", "ref", maxN = 2)
        .orderBy("grp")
    }),

    // X98 corpus chrF (β=2, orders 1..6) per language over the same
    // adjacent-doc pairing: character grams on despaced text, so the
    // score is tokenization-free — the third leg of the x96/x97/x98
    // generation-grading family. All match/total lanes exact BIGINT;
    // the P/R means + F composition is ONE fragment (Chrf.chrfSql)
    // shared textually with the oracle.
    "x98_chrf" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = d.as("a").join(d.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.lang").as("lang"), col("a.doc_id").as("pid"),
          col("a.text").as("hyp"), col("b.text").as("ref"))
      Chrf.corpusChrf(pairs, "lang", "pid", "hyp", "ref", maxN = 6,
        beta = 2).orderBy("grp")
    }),

    // X99 PMI collocations per language (count floor 3): exact-integer
    // bigram/unigram/total counts decide membership and order; the PMI
    // ln-ratio (house round-6 lane) is display-only, so no float ever
    // picks rows.
    "x99_pmi_collocations" -> ((s, dir) =>
      Collocations.pmiBigrams(Tables.documents(s, dir), "lang", "text",
        minCount = 3).orderBy("lang", "w1", "w2")),

    // X100 Aho-Corasick phrase coverage: the phrase set is the corpus's
    // top-20 trigrams (from data — distributed TakeOrdered, 20 rows to
    // the driver), matched back over every doc in one automaton pass.
    // Substring semantics — the oracle's per-phrase contains() is the
    // K·len naive form the automaton replaces.
    "x100_phrase_coverage" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val phrases = PhraseMatch.topPhrases(d, "text", n = 3, k = 20)
      PhraseMatch.coverage(d, "doc_id", "text", phrases).orderBy("doc_id")
    }),

    // X101 Poisson-bootstrap CI for corpus BLEU (Koehn 2004 resampling
    // at the row-local Poisson limit): multiplicities are exact-integer
    // inverse-CDF thresholds on the md5 lane, resample scores ride the
    // shared x96 estimator, and CI bounds are order statistics over a
    // grp-partitioned window — floats never decide membership.
    "x101_bleu_ci" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val pairs = d.as("a").join(d.as("b"),
          col("b.doc_id") === col("a.doc_id") + 1)
        .select(col("a.lang").as("lang"), col("a.doc_id").as("pid"),
          col("a.text").as("hyp"), col("b.text").as("ref"))
      BleuCi.bleuCi(pairs, "lang", "pid", "hyp", "ref", maxN = 4,
        nBoot = 40, seed = "ci").orderBy("grp")
    }),

    // X102 paired bootstrap significance test (Koehn 2004 §3): system A
    // = doc i, system B = doc i+2, shared reference = doc i+1 — both
    // systems scored on the SAME Poisson resamples (one multiplicity
    // per pair), compared resample-by-resample. wins/ties/n and the 95%
    // criterion are exact integers.
    "x102_bleu_paired" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val t = d.as("a")
        .join(d.as("r"), col("r.doc_id") === col("a.doc_id") + 1)
        .join(d.as("b2"), col("b2.doc_id") === col("a.doc_id") + 2)
        .select(col("a.lang").as("lang"), col("a.doc_id").as("pid"),
          col("a.text").as("hyp_a"), col("b2.text").as("hyp_b"),
          col("r.text").as("ref"))
      BleuCi.bleuPairedTest(t, "lang", "pid", "hyp_a", "hyp_b", "ref",
        maxN = 4, nBoot = 40, seed = "pt").orderBy("grp")
    }),

    // X103 Heaps'-law vocabulary-growth fit per language — x85's
    // companion corpus-QA number. Checkpoints are per-doc exact
    // first-occurrence counts; the running sums use the x57/x85
    // two-level cell decomposition (oracle = naive global window,
    // re-proving it).
    "x103_heaps" -> ((s, dir) =>
      CorpusStats.heapsFit(Tables.documents(s, dir), "lang", "doc_id",
        "text").orderBy("lang")),

    // X104 PSI drift between the even- and odd-doc slices (stand-in
    // for current-vs-reference snapshots) per language: hashed vocab
    // buckets, Laplace-smoothed exact counts, nano-scaled integer term
    // sums so no float addition ever crosses partitions.
    "x104_psi_drift" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      CorpusStats.psiDrift(d.filter(col("doc_id") % 2 === 0),
        d.filter(col("doc_id") % 2 === 1), "lang", "text")
        .orderBy("grp")
    }),

    // X105 Turing frequency re-estimation per language: N_r table,
    // r* = (r+1)N_{r+1}/N_r, and per-band probability mass — exact
    // integer lanes, round-6 ratios.
    "x105_good_turing" -> ((s, dir) =>
      CorpusStats.goodTuring(Tables.documents(s, dir), "lang", "text",
        maxR = 10, gram = 2).orderBy("grp", "r")),

    // X106 Matryoshka-style truncation audit (Kusupati et al. 2022's
    // question asked of ANY embedding column): exact top-k recall at
    // prefix dims 64/32/16/8 vs the full-dim truth — the measured
    // curve that licenses (or forbids) serving truncated vectors.
    // Dim 64 is the full width, a built-in recall=1.0 harness check.
    "x106_mrl_truncation" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      def trunc(d: Int) = emb.withColumn("embedding",
        slice(col("embedding"), 1, d))
      // ground truth shared with the x43/x112/x113 audits (annRuns);
      // trunc_64 IS the full width (JlDIn = 64), so its brute-force
      // list is the same exact list — reuse it instead of re-running
      // the identical full-dim pipeline (recall stays 1.0 by identity)
      val exact = annRuns(s, dir)._1.select("qid", "cid")
      val methods = Seq(64, 32, 16, 8).map { d =>
        if (d == JlDIn)
          s"trunc_$d" -> annRuns(s, dir)._1
        else {
          val e = trunc(d)
          s"trunc_$d" -> Similarity.bruteForceTopK(e,
            e.filter(col("vec_id") < NumQueries), "vec_id", "embedding",
            TopK)
        }
      }
      Similarity.recallAudit(methods, exact).orderBy("method")
    }),

    // X107 Cohen's kappa over the three rater pairs (NB gate,
    // perceptron gate, declared label): chance-corrected agreement as
    // ONE exact rational per pair — the number x59's raw counts lack.
    "x107_kappa" -> ((s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      val nb = nbClassified(s, dir)
        .select(col("doc_id"), col("pred").as("nb_pred"))
      val lp = lpClassified(s, dir)
        .select(col("doc_id"), col("pred").as("lp_pred"))
      val joined = d.join(nb, Seq("doc_id")).join(lp, Seq("doc_id"))
        .localCheckpoint(false)
      def one(name: String, a: String, b: String) =
        Eval.cohenKappa(joined, a, b).withColumn("pair", lit(name))
          .select("pair", "n", "n_agree", "num", "den", "kappa")
      one("lp_vs_declared", "lp_pred", "lang")
        .unionByName(one("nb_vs_declared", "nb_pred", "lang"))
        .unionByName(one("nb_vs_lp", "nb_pred", "lp_pred"))
        .orderBy("pair")
    }),

    // X108 exact feature AUC: does a cheap scalar feature separate the
    // 'is English' class? Tie-aware Mann-Whitney with every lane an
    // exact integer — the threshold-free audit run before any filter
    // rule gets a cutoff.
    "x108_feature_auc" -> ((s, dir) => {
      val f = Tables.documents(s, dir).select(
        (col("lang") === "en").as("lbl"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars"),
        expr("""(1000 * size(array_distinct(split(text, ' '))))
               |div size(split(text, ' '))""".stripMargin).as("ttr_permille"))
      val scores = f.selectExpr("lbl",
        """stack(3, 'n_chars', n_chars, 'n_tokens', n_tokens,
          |'ttr_permille', ttr_permille) AS (grp, s)""".stripMargin)
      Eval.aucExact(scores, "grp", "s", "lbl").orderBy("grp")
    }),

    // X109 perceptual image dedup: aHash-16 over the REAL decoded PPM
    // bytes, exact-hash groups with min-id canonicals. The oracle
    // re-derives every pixel from the render RULE (never touching the
    // binary), so a byte-offset bug anywhere in the decode path breaks
    // the hash match — the x4_wav construction-rule discipline.
    "x109_image_ahash" -> ((s, dir) =>
      Multimodal.imagePerceptualDedup(
        Multimodal.renderPpm(Tables.documents(s, dir), "doc_id"),
        "doc_id").orderBy("doc_id")),

    // X110 perceptual audio dedup: the x109 discipline on the PCM
    // stream — 8-window energy-delta fingerprint over the real decoded
    // bytes, oracle re-deriving every sample from the render rule.
    "x110_audio_fp" -> ((s, dir) =>
      Multimodal.audioPerceptualDedup(
        Multimodal.renderWav(Tables.documents(s, dir), "doc_id"),
        "doc_id").orderBy("doc_id")),

    // X115 Hamming-banded near-duplicate images, CANONICAL grain:
    // 64-bit aHash, exact-equal signatures collapsed first (min-id
    // canonical + member count), then the x79 pigeonhole band join
    // over distinct signatures only — output bounded by signature
    // pairs, never doc pairs (this synthetic corpus is duplication-
    // heavy: doc-grain d<=3 pairs are ~2% of ALL doc pairs). Oracle =
    // naive all-pairs popcount over the distinct hashes re-derived
    // from the render rule (lossless prune, re-proven per run).
    "x115_image_hamming" -> ((s, dir) =>
      Multimodal.imageHammingCanonical(
        Multimodal.renderPpm(Tables.documents(s, dir), "doc_id"),
        "doc_id", ImgHamMaxDist).orderBy("d1", "d2")),

    // X115 tier audit (the x82 pattern on the image family): precision
    // and recall of the banded d<=3 tier and the 16-bit exact tier
    // against exact 64-bit signature equality as truth — computed at
    // signature-GROUP grain (doc-pair counts are binomials/products of
    // group sizes; no doc pair enumerates). Recall of the superset
    // d<=3 tier is 1 by construction; its precision is the number a
    // pipeline owner tunes the distance knob by.
    "x115_image_audit" -> ((s, dir) =>
      Multimodal.imageTierAudit(
        Multimodal.renderPpm(Tables.documents(s, dir), "doc_id"),
        "doc_id", ImgHamMaxDist).orderBy("method")),

    // X111 cross-modal consistency audit: doc groups sharing a
    // PERCEPTUAL image hash whose texts disagree (distinct norm_fp) —
    // the same-image-different-caption smell a multimodal corpus QA
    // pass flags. Image key = x109's aHash (collides by construction
    // in 16 bits), text key = x9's norm_fp; the audit is two group-bys
    // and a join. (The text-keyed direction is vacuous on this corpus:
    // no two docs normalize to the same text.)
    // X112 rank fidelity of every ANN tier: Kendall tau between each
    // method's top-k and the exact ranking over their shared
    // candidates — x43 measures WHAT was found, this measures whether
    // it arrived in the right ORDER (ADC distortion reorders even when
    // recall holds). Exact C/D/P integer lanes, k²-bounded pair work.
    "x112_rank_tau" -> ((s, dir) => {
      val (exact, tiers) = annRuns(s, dir)
      Eval.kendallTau(tiers, exact).orderBy("method")
    }),

    // X113 nDCG@k of every ANN tier against exact-top-k relevance:
    // position-weighted complement of x112 (a rank-1 miss costs more
    // than a rank-k miss). Weights are one integer micro-unit table
    // shared with the oracle, so every sum is exact.
    "x113_ndcg" -> ((s, dir) => {
      val (exact, tiers) = annRuns(s, dir)
      Eval.ndcgAt(tiers, exact, TopK).orderBy("method")
    }),

    // X114 Broder containment — the directional near-dup resemblance
    // tiers miss: a template inside a big doc has high containment but
    // low Jaccard, so whole-doc band-LSH never pairs them. Numerator
    // counts discriminative shingles only (df-capped — the scale knob
    // AND standard practice); all lanes exact integers.
    "x114_containment" -> ((s, dir) =>
      Dedup.containmentPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 6, maxDf = 32, minShared = 3, thresholdPpm = 500000L)
        .orderBy("d1", "d2")),

    "x111_modal_consistency" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val text = d.select(col("doc_id"),
        md5(TextAnalysis.normalize(col("text"))).as("norm_fp"))
      val img = Multimodal.imagePerceptualDedup(
          Multimodal.renderPpm(d, "doc_id"), "doc_id")
        .select(col("doc_id"), col("ahash"))
      text.join(img, Seq("doc_id"))
        .groupBy("ahash")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("norm_fp")).as("n_text"),
          min("doc_id").as("canonical_id"))
        .filter(col("n_docs") > 1)
        .withColumn("consistent", col("n_text") === 1)
        .orderBy("ahash")
    })
  )

  // X95 knobs: 2-sig bands recall near-dups the 4x4 tier misses (at the
  // cost of false candidates — which is the point: the edit tier must
  // have something to reject); confirmation at 90% char similarity.
  private val EditRowsPerBand = 2
  private val EditSimPpm = 900000L

  // X115 knob: Hamming radius of the banded image tier (maxDist+1 = 4
  // bands of 16 bits — the Manku web-dedup geometry).
  private val ImgHamMaxDist = 3

  /** Shared x115 CTE chain: 64-bit aHash per doc re-derived from the
    * render RULE (8x8 grid over the doc_id-derived pixels — never
    * touching the binary), bit 63 as the sign-bit literal because
    * DuckDB's `1 << 63` overflows where two's complement wraps.
    */
  private def x115HashCtes: String = {
    val pidx = "(3 * ((((ks.k // 8) * h) // 8) * w + (((ks.k % 8)) * w) // 8))"
    def chan(d: Int) = s"((31 * doc_id + 7 * ($pidx + $d)) % 256)"
    s"""im AS (SELECT doc_id,
       |    CAST(doc_id % 8 + 1 AS INTEGER) AS w,
       |    CAST(doc_id % 5 + 1 AS INTEGER) AS h FROM documents),
       |cells AS (SELECT doc_id, w, h, ks.k AS k,
       |    (${chan(0)} + ${chan(1)} + ${chan(2)}) // 3 AS g
       |  FROM im CROSS JOIN
       |    (SELECT unnest(generate_series(0, 63)) AS k) ks),
       |av AS (SELECT doc_id, sum(g) // 64 AS avg FROM cells GROUP BY 1),
       |hs AS (SELECT cells.doc_id,
       |    CAST(sum(CASE WHEN g > av.avg THEN
       |      (CASE WHEN k = 63 THEN CAST(-9223372036854775808 AS BIGINT)
       |            ELSE (CAST(1 AS BIGINT) << k) END)
       |      ELSE 0 END) AS BIGINT) AS h64
       |  FROM cells JOIN av ON av.doc_id = cells.doc_id GROUP BY 1)""".stripMargin
  }

  // X94 PII-injection fixture: the corpus carries no real PII (synthetic
  // word-salad), so targets are constructed deterministically from
  // doc_id — the x7 discipline. Every doc also gets two NEGATIVE
  // controls (a 5-3-4 order-id whose 3-3-4 suffix is not word-bounded,
  // and a 2-part version number that is not a dotted quad); %17 docs get
  // a PII-dense "directory page" tail that must cross PiiMaxHits and
  // draw the drop verdict.
  private val PiiMaxHits = 4
  /** The x151/x152 input: the x134 quasi tuple + the x94 verdict over
    * augmented text as the sensitive attribute — all three privacy
    * audits share their upstream exactly (same filters, same bucket,
    * same thresholds), so the curves are about the SAME release.
    */
  private def piiVerdictDocs(s: SparkSession, dir: String): DataFrame =
    Pii.withVerdict(piiAugmented(Tables.documents(s, dir)
        .filter(col("lang").isNotNull && col("source").isNotNull &&
          col("n_chars").isNotNull))
        .withColumn("len_bucket", expr(s"n_chars div $KAnonBucket")),
      "aug", PiiMaxHits)

  private def piiAugmented(docs: DataFrame): DataFrame = {
    val id = col("doc_id")
    // every input column rides along (x149 keeps its quasi-identifiers;
    // x94's policy projection is insensitive to the extras)
    docs.select(docs.columns.map(col).toSeq :+ concat(
      col("text"),
      lit(" id 12345-678-9012 v1.2 beta"),
      when(id % 3 === 0, concat(lit(" reach user"), id.cast("string"),
        lit("@example.org now"))).otherwise(lit("")),
      when(id % 4 === 0, concat(lit(" call 415-555-"),
        lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
      when(id % 5 === 0, concat(lit(" node 10."), (id % 200).cast("string"),
        lit(".0."), (id % 250).cast("string"), lit(" up")))
        .otherwise(lit("")),
      // phone-shaped local part INSIDE an email: must count once as
      // email, never as phone (the count/mask-order consistency case)
      when(id % 9 === 0, lit(" mail 415-555-0199@example.org ok"))
        .otherwise(lit("")),
      when(id % 17 === 0, lit(PiiDirectoryTail)).otherwise(lit(""))
    ).as("aug"): _*)
  }
  // 3 phones (one dot-separated — the IP-vs-phone ordering case) + 2
  // IPs = 5 extra hits, > PiiMaxHits on its own
  private val PiiDirectoryTail =
    " directory 202-555-0101, 202-555-0102, 303.555.0199 at 192.168.0.1 and 10.0.0.2"
  // the identical augmentation as a DuckDB scalar over `documents`
  private def piiAugmentSql: String =
    "text || ' id 12345-678-9012 v1.2 beta'" +
      " || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.org now' ELSE '' END" +
      " || CASE WHEN doc_id % 4 = 0 THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END" +
      " || CASE WHEN doc_id % 5 = 0 THEN ' node 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) || ' up' ELSE '' END" +
      " || CASE WHEN doc_id % 9 = 0 THEN ' mail 415-555-0199@example.org ok' ELSE '' END" +
      s" || CASE WHEN doc_id % 17 = 0 THEN '$PiiDirectoryTail' ELSE '' END"

  // ---------------------------------------------------------------- oracle

  /** Shared CTE: distinct 3-shingles per document. */
  private val ShingleCte =
    """t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest(list_transform(generate_series(1, len(ts) - 2),
      |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM t)""".stripMargin

  /** 4-lane md5 minhash (see [[Dedup.minhashSignatures]]): sig i is the
    * min over the i%4-th 8-hex-char lane of md5((i/4)|shingle).
    */
  private def minhashSigCols: String =
    (0 until 16).map(i =>
      s"min(substring(md5('${i / 4}|' || s), ${(i % 4) * 8 + 1}, 8)) AS sig$i")
      .mkString(", ")

  private def bandUnion: String = bandUnionW(4)

  /** One k-means assignment CTE pair (all-pairs distances from
    * `centsCte`, then rn = 1 argmin with ties to the lower cluster id)
    * — shared by the x37 and x156 oracles so the replayed Lloyd rounds
    * cannot drift between the two.
    */
  private def kmeansAssignCte(centsCte: String, out: String,
                              keepDist: Boolean): String = {
    val distCols = if (keepDist) ", dist" else ""
    s"""d$out AS (SELECT e.vec_id, e.q, $centsCte.cl,
       |  list_dot_product(e.q, e.q) - 2 * list_dot_product(e.q, $centsCte.cq)
       |    + list_dot_product($centsCte.cq, $centsCte.cq) AS dist
       |  FROM e CROSS JOIN $centsCte),
       |a$out AS (SELECT vec_id, q, cl$distCols FROM (
       |  SELECT vec_id, q, cl, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
       |  FROM d$out) WHERE rn = 1)""".stripMargin
  }

  /** The x37 Lloyd-round replay up to the FINAL centroid table `c1`:
    * quantize, lowest-id init, one assignment round, floor-div
    * centroid update (empty cluster keeps its centroid).
    */
  private def kmeansRoundsPrefix: String =
    s"""e AS (SELECT vec_id,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
       |  FROM embeddings),
       |c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, q AS cq
       |  FROM e ORDER BY vec_id LIMIT $KMeansK),
       |${kmeansAssignCte("c0", "1", keepDist = false)},
       |u1 AS (SELECT cl, unnest(generate_series(1, len(q))) AS d, q FROM a1),
       |s1 AS (SELECT cl, d, sum(CAST(q[d] AS BIGINT)) AS sv, count(*) AS n
       |  FROM u1 GROUP BY 1, 2),
       |m1 AS (SELECT cl, list(CAST(
       |    (sv // n) - CASE WHEN sv < 0 AND sv % n <> 0 THEN 1 ELSE 0 END
       |    AS DOUBLE) ORDER BY d) AS cq
       |  FROM s1 GROUP BY cl),
       |c1 AS (SELECT c0.cl, coalesce(m1.cq, c0.cq) AS cq
       |  FROM c0 LEFT JOIN m1 ON m1.cl = c0.cl)""".stripMargin

  /** [[bandUnion]] at any band width (mirrors Dedup.bandRows: 16 sigs
    * split into 16/w bands of w, key = md5 of the comma-joined lane).
    */
  private def bandUnionW(rowsPerBand: Int): String =
    (0 until 16 / rowsPerBand).map { b =>
      val key = (0 until rowsPerBand)
        .map(r => s"sig${b * rowsPerBand + r}").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band_id, md5($key) AS key FROM sig"
    }.mkString(" UNION ALL ")

  // ONE lane arithmetic for both simhash widths (mirrors
  // Dedup.simhashBits — two copies of this must never diverge); bit 63
  // lands as the two's-complement sign weight so the HUGEINT vote sum
  // re-seats exactly in BIGINT
  private def simhashVotesN(bits: Int): String =
    (0 until bits).map { j =>
      s"sum(2 * (((strpos('0123456789abcdef', substring(h, ${j / 4 + 1}, 1)) - 1) >> ${j % 4}) & 1) - 1) AS v$j"
    }.mkString(", ")

  private def simhashAssembleN(bits: Int): String =
    (0 until bits).map { j =>
      val w = if (j == 63) Long.MinValue else 1L << j
      s"(CASE WHEN v$j >= 0 THEN $w ELSE 0 END)"
    }.mkString(" + ")

  private def simhashVotes: String = simhashVotesN(16)
  private def simhashAssemble: String = simhashAssembleN(16)
  private def simhash64Votes: String = simhashVotesN(64)
  private def simhash64Assemble: String = simhashAssembleN(64)

  private def signBucketSql(col: String, bits: Int = 16): String =
    (0 until bits).map(j => s"(CASE WHEN $col[${j + 1}] >= 0 THEN ${1L << j} ELSE 0 END)")
      .mkString(" + ")

  /** IVF oracle, rendered from the trained coarse quantizer. The centroids
    * are data-dependent (seed-42 k-means on the corpus sample), so the SQL
    * can only be generated after [[Similarity.ivfTopK]] has run — which is
    * guaranteed by graft.Verify's run-queries-then-dump-oracle order. The
    * whole path is integer-exact (see Similarity.ivfTopK doc), so DuckDB
    * reproduces list assignment, probe selection, and scores bit-for-bit.
    * Centroid elements are emitted as DOUBLE literals (integer-valued, so
    * exact) to match DuckDB's floor()-is-DOUBLE quantized vectors.
    */
  private def ivfOracle: Map[String, String] = {
    if (Similarity.lastIvfCentroids.isEmpty)
      // fail loudly, not silently: an oracle dump without a prior ivfTopK
      // run in this JVM would otherwise just omit x2_ann_ivf and the
      // driver would record a weaker rows-only check with no explanation
      System.err.println(
        "[graft] WARNING: x2_ann_ivf oracle OMITTED — Similarity.ivfTopK has " +
          "not run in this JVM, so there are no trained centroids to inline. " +
          "Run the queries before dumping oracleSql (graft.Verify's order).")
    Similarity.lastIvfCentroids.map { cents =>
      val rows = cents.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(v => v.toLong * v).sum
        s"($i, ${c.map(v => s"$v.0").mkString("[", ", ", "]")}, $c2.0)"
      }.mkString(",\n  ")
      "x2_ann_ivf" ->
        s"""WITH cent(list_id, cv, c2) AS (VALUES
           |  $rows),
           |e AS (SELECT vec_id,
           |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
           |  FROM embeddings),
           |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
           |ad AS (SELECT n.vec_id, cent.list_id,
           |  n.n2 - 2 * list_dot_product(n.q, cent.cv) + cent.c2 AS dist
           |  FROM n CROSS JOIN cent),
           |corpus AS (SELECT vec_id, list_id FROM (
           |  SELECT vec_id, list_id,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
           |  FROM ad) WHERE rn = 1),
           |probes AS (SELECT vec_id AS qid, list_id FROM (
           |  SELECT vec_id, list_id,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
           |  FROM ad WHERE vec_id < $NumQueries) WHERE rn <= $IvfNprobe),
           |scored AS (SELECT p.qid, c.vec_id AS cid,
           |  round(list_dot_product(qn.q, cn.q) / (sqrt(qn.n2) * sqrt(cn.n2)), 6) AS sim
           |  FROM probes p JOIN corpus c ON c.list_id = p.list_id AND c.vec_id != p.qid
           |  JOIN n qn ON qn.vec_id = p.qid
           |  JOIN n cn ON cn.vec_id = c.vec_id),
           |ranked AS (SELECT qid, cid, sim,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rank
           |  FROM scored)
           |SELECT qid, cid, rank, sim FROM ranked WHERE rank <= $TopK
           |ORDER BY qid, rank""".stripMargin
    }.toMap
  }

  /** PQ oracle, rendered from the trained codebook — same
    * run-queries-then-dump contract as [[ivfOracle]]. Code assignment,
    * ADC table lookup, and ranking are integer-exact (see
    * [[Similarity.pqTopK]]), so DuckDB reproduces them bit-for-bit: the
    * codebook is unpivoted into a (m, code, cv, c2) VALUES table, corpus
    * sub-vectors join it for the argmin, query sub-vectors join it for
    * the inner-product table, and each (query, corpus, subspace) triple
    * contributes exactly one lookup to the ADC sum.
    */
  private def pqOracle: Map[String, String] = {
    if (Similarity.lastPqCodebook.isEmpty)
      System.err.println(
        "[graft] WARNING: x20_pq_ann oracle OMITTED — Similarity.pqTopK has " +
          "not run in this JVM, so there is no trained codebook to inline. " +
          "Run the queries before dumping oracleSql (graft.Verify's order).")
    Similarity.lastPqCodebook.map { cb =>
      val sub = cb(0)(0).length
      val rows = cb.zipWithIndex.flatMap { case (cents, m) =>
        cents.zipWithIndex.map { case (c, j) =>
          val c2 = c.map(v => v.toLong * v).sum
          s"($m, $j, ${c.map(v => s"$v.0").mkString("[", ", ", "]")}, $c2.0)"
        }
      }.mkString(",\n  ")
      val svUnion = (0 until PqNumSub).map { m =>
        s"SELECT vec_id, $m AS m, q[${m * sub + 1}:${(m + 1) * sub}] AS sv FROM e"
      }.mkString(" UNION ALL ")
      "x20_pq_ann" ->
        s"""WITH cb(m, code, cv, c2) AS (VALUES
           |  $rows),
           |e AS (SELECT vec_id,
           |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
           |  FROM embeddings),
           |sv AS ($svUnion),
           |ad AS (SELECT sv.vec_id, sv.m, cb.code,
           |  list_dot_product(sv.sv, sv.sv) - 2 * list_dot_product(sv.sv, cb.cv)
           |    + cb.c2 AS dist,
           |  list_dot_product(sv.sv, cb.cv) AS ip
           |  FROM sv JOIN cb ON cb.m = sv.m),
           |codes AS (SELECT vec_id, m, code FROM (
           |  SELECT vec_id, m, code,
           |    row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS rn
           |  FROM ad) WHERE rn = 1),
           |qtab AS (SELECT vec_id AS qid, m, code, ip FROM ad
           |  WHERE vec_id < $NumQueries),
           |scored AS (SELECT t.qid, c.vec_id AS cid, CAST(sum(t.ip) AS BIGINT) AS adc
           |  FROM codes c JOIN qtab t ON t.m = c.m AND t.code = c.code
           |    AND t.qid != c.vec_id
           |  GROUP BY 1, 2),
           |ranked AS (SELECT qid, cid, adc,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY adc DESC, cid) AS INTEGER) AS rank
           |  FROM scored)
           |SELECT qid, cid, rank, adc FROM ranked WHERE rank <= $TopK
           |ORDER BY qid, rank""".stripMargin
    }.toMap
  }

  /** IVF-PQ oracle — both trained artifacts (coarse centroids + residual
    * codebook) inlined; same run-then-dump contract as [[ivfOracle]].
    * Structure: coarse argmin -> integer residuals -> per-subspace code
    * argmin (corpus) / ADC tables (probed queries) -> grouped distance
    * sum. Every intermediate is an exact integer, so DuckDB reproduces
    * list assignment, codes, and the final ranking bit-for-bit.
    */
  private def ivfPqOracle: Map[String, String] = {
    if (Similarity.lastIvfPq.isEmpty)
      System.err.println(
        "[graft] WARNING: x21_ivf_pq oracle OMITTED — Similarity.ivfPqTopK " +
          "has not run in this JVM. Run the queries before dumping oracleSql.")
    ivfPqPipelineSql(IvfPqNprobe, TopK).map("x21_ivf_pq" -> _).toMap
  }

  /** The full IVF-PQ pipeline SQL at a given (nprobe, rank limit) —
    * factored out so the x51 refine oracle can embed the identical
    * candidate-generation pipeline at its own wider settings.
    */
  private def ivfPqPipelineSql(nprobe: Int, limit: Int): Option[String] = {
    Similarity.lastIvfPq.map { case (coarse, cb) =>
      val dim = coarse(0).length
      val sub = cb(0)(0).length
      val centRows = coarse.zipWithIndex.map { case (c, i) =>
        val c2 = c.map(v => v.toLong * v).sum
        s"($i, ${c.map(v => s"$v.0").mkString("[", ", ", "]")}, $c2.0)"
      }.mkString(",\n  ")
      val cbRows = cb.zipWithIndex.flatMap { case (cents, m) =>
        cents.zipWithIndex.map { case (c, j) =>
          val c2 = c.map(v => v.toLong * v).sum
          s"($m, $j, ${c.map(v => s"$v.0").mkString("[", ", ", "]")}, $c2.0)"
        }
      }.mkString(",\n  ")
      val svUnion = (0 until PqNumSub).map { m =>
        s"SELECT vec_id, $m AS m, r[${m * sub + 1}:${(m + 1) * sub}] AS sv FROM res"
      }.mkString(" UNION ALL ")
      val qsvUnion = (0 until PqNumSub).map { m =>
        s"SELECT qid, list_id, $m AS m, qr[${m * sub + 1}:${(m + 1) * sub}] AS sv FROM qres"
      }.mkString(" UNION ALL ")
      s"""WITH cent(list_id, cv, cc2) AS (VALUES
           |  $centRows),
           |cb(m, code, cv, c2) AS (VALUES
           |  $cbRows),
           |e AS (SELECT vec_id,
           |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
           |  FROM embeddings),
           |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
           |ad AS (SELECT n.vec_id, cent.list_id,
           |  n.n2 - 2 * list_dot_product(n.q, cent.cv) + cent.cc2 AS dist
           |  FROM n CROSS JOIN cent),
           |corpus0 AS (SELECT vec_id, list_id FROM (
           |  SELECT vec_id, list_id,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
           |  FROM ad) WHERE rn = 1),
           |res AS (SELECT c0.vec_id,
           |  list_transform(generate_series(1, $dim), i -> n.q[i] - cent.cv[i]) AS r
           |  FROM corpus0 c0 JOIN n ON n.vec_id = c0.vec_id
           |  JOIN cent ON cent.list_id = c0.list_id),
           |sv AS ($svUnion),
           |cd AS (SELECT vec_id, m, code FROM (
           |  SELECT sv.vec_id, sv.m, cb.code,
           |    row_number() OVER (PARTITION BY sv.vec_id, sv.m ORDER BY
           |      list_dot_product(sv.sv, sv.sv)
           |        - 2 * list_dot_product(sv.sv, cb.cv) + cb.c2, cb.code) AS rn
           |  FROM sv JOIN cb ON cb.m = sv.m) WHERE rn = 1),
           |probes AS (SELECT vec_id AS qid, list_id FROM (
           |  SELECT vec_id, list_id,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
           |  FROM ad WHERE vec_id < $NumQueries) WHERE rn <= $nprobe),
           |qres AS (SELECT p.qid, p.list_id,
           |  list_transform(generate_series(1, $dim), i -> n.q[i] - cent.cv[i]) AS qr
           |  FROM probes p JOIN n ON n.vec_id = p.qid
           |  JOIN cent ON cent.list_id = p.list_id),
           |qrn AS (SELECT qid, list_id, list_dot_product(qr, qr) AS qrn2 FROM qres),
           |qsv AS ($qsvUnion),
           |qtab AS (SELECT qsv.qid, qsv.list_id, qsv.m, cb.code,
           |  list_dot_product(qsv.sv, cb.cv) AS ip, cb.c2
           |  FROM qsv JOIN cb ON cb.m = qsv.m),
           |scored AS (SELECT p.qid, c0.vec_id AS cid,
           |  CAST(qrn.qrn2 - 2 * sum(t.ip) + sum(t.c2) AS BIGINT) AS dist
           |  FROM probes p
           |  JOIN corpus0 c0 ON c0.list_id = p.list_id AND c0.vec_id != p.qid
           |  JOIN cd ON cd.vec_id = c0.vec_id
           |  JOIN qtab t ON t.qid = p.qid AND t.list_id = p.list_id
           |    AND t.m = cd.m AND t.code = cd.code
           |  JOIN qrn ON qrn.qid = p.qid AND qrn.list_id = p.list_id
           |  GROUP BY p.qid, c0.vec_id, qrn.qrn2),
           |ranked AS (SELECT qid, cid, dist,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, cid) AS INTEGER) AS rank
           |  FROM scored)
           |SELECT qid, cid, rank, dist FROM ranked WHERE rank <= $limit
           |ORDER BY qid, rank""".stripMargin
    }
  }

  /** SemDeDup oracle, rendered from the centroids of the most recent
    * [[SemDedup.semDedup]] run — same run-queries-then-dump contract as
    * [[ivfOracle]]. List assignment is the identical integer argmin; the
    * cosine gate is the identical no-sqrt integer comparison in HUGEINT
    * (dot^2 * 10^6 overflows BIGINT at dim 64).
    */
  /** Shared SQL fragments for the centroid-replay oracles (x36, x62,
    * x63) — ONE builder per stage so a formula fix cannot silently
    * drift between the three replays. [[centAssignCtes]] = centroid
    * VALUES + quantize + expanded |q−c|² argmin assignment;
    * [[cosinePairCte]] = the lower-id duplicate-pair cosine gate
    * (HUGEINT no-sqrt comparison); [[protoRankTail]] = proto_ppt
    * scoring + per-cluster rank + ppm keep verdict over the population
    * CTE named `pop` (asg for x62, the deduped kp for x63).
    */
  private def centAssignCtes(cents: Array[Array[Int]]): String = {
    val rows = cents.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(v => v.toLong * v).sum
      s"($i, ${c.map(v => s"$v.0").mkString("[", ", ", "]")}, $c2.0)"
    }.mkString(",\n  ")
    s"""WITH cent(list_id, cv, c2) AS (VALUES
       |  $rows),
       |e AS (SELECT vec_id,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
       |ad AS (SELECT n.vec_id, cent.list_id,
       |  n.n2 - 2 * list_dot_product(n.q, cent.cv) + cent.c2 AS dist
       |  FROM n CROSS JOIN cent),
       |asg AS (SELECT vec_id, list_id FROM (
       |  SELECT vec_id, list_id,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, list_id) AS rn
       |  FROM ad) WHERE rn = 1)""".stripMargin
  }

  private def cosinePairCte: String = {
    val tau2 = SemDedupTauPermille * SemDedupTauPermille
    s"""pair AS (SELECT a.vec_id AS ia, count(*) AS n_dup_lower
       |  FROM asg a JOIN asg b ON a.list_id = b.list_id AND b.vec_id < a.vec_id
       |  JOIN n na ON na.vec_id = a.vec_id
       |  JOIN n nb ON nb.vec_id = b.vec_id
       |  WHERE list_dot_product(na.q, nb.q) > 0
       |    AND CAST(list_dot_product(na.q, nb.q) AS HUGEINT)
       |      * CAST(list_dot_product(na.q, nb.q) AS HUGEINT) * 1000000
       |      > $tau2 * CAST(na.n2 AS HUGEINT) * CAST(nb.n2 AS HUGEINT)
       |  GROUP BY 1)""".stripMargin
  }

  private def protoRankTail(pop: String): String =
    s"""s AS (SELECT n.vec_id, $pop.list_id,
       |  CASE WHEN n.n2 * cent.c2 = 0 THEN 0
       |    ELSE (CASE WHEN list_dot_product(n.q, cent.cv) < 0
       |            THEN -1 ELSE 1 END)
       |      * CAST((CAST(list_dot_product(n.q, cent.cv) AS HUGEINT)
       |          * CAST(list_dot_product(n.q, cent.cv) AS HUGEINT)
       |          * 1000000000000)
       |        // (CAST(n.n2 AS HUGEINT) * CAST(cent.c2 AS HUGEINT))
       |        AS BIGINT) END AS proto_ppt
       |  FROM $pop JOIN n ON n.vec_id = $pop.vec_id
       |  JOIN cent ON cent.list_id = $pop.list_id),
       |r AS (SELECT vec_id, list_id, proto_ppt,
       |    row_number() OVER (PARTITION BY list_id
       |      ORDER BY proto_ppt DESC, vec_id) AS r,
       |    count(*) OVER (PARTITION BY list_id) AS n FROM s)
       |SELECT vec_id, CAST(list_id AS INTEGER) AS list_id,
       |  CAST(proto_ppt AS BIGINT) AS proto_ppt, CAST(r AS BIGINT) AS r,
       |  CAST(CASE WHEN r > ($ProtoPrunePpm * n) // 1000000
       |    THEN 1 ELSE 0 END AS INTEGER) AS is_kept
       |FROM r ORDER BY vec_id""".stripMargin

  private def semDedupOracle: Map[String, String] = {
    if (SemDedup.lastCentroids.isEmpty)
      System.err.println(
        "[graft] WARNING: x36_semdedup oracle OMITTED — SemDedup.semDedup " +
          "has not run in this JVM, so there are no centroids to inline. " +
          "Run the queries before dumping oracleSql (graft.Verify's order).")
    SemDedup.lastCentroids.map { cents =>
      "x36_semdedup" ->
        s"""${centAssignCtes(cents)},
           |$cosinePairCte
           |SELECT asg.vec_id, CAST(asg.list_id AS INTEGER) AS list_id,
           |  CAST(coalesce(p.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
           |  CAST(CASE WHEN p.ia IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_kept
           |FROM asg LEFT JOIN pair p ON p.ia = asg.vec_id
           |ORDER BY asg.vec_id""".stripMargin
    }.toMap
  }

  /** X62 oracle — the same centroid-inlining contract as
    * [[semDedupOracle]]: list assignment replays the expanded |q−c|²
    * argmin, prototypicality re-derives as signed HUGEINT cos²·10^12
    * with DuckDB's // (floor division — operands are non-negative, so
    * it equals Spark's truncating decimal `div`), then the identical
    * per-cluster rank + ppm drop-count arithmetic.
    */
  private def protoPruneOracle: Map[String, String] = {
    if (ProtoPrune.lastCentroids.isEmpty)
      System.err.println(
        "[graft] WARNING: x62_proto_prune oracle OMITTED — " +
          "ProtoPrune.prune has not run in this JVM, so there are no " +
          "centroids to inline. Run the queries before dumping oracleSql " +
          "(graft.Verify's order).")
    ProtoPrune.lastCentroids.map { cents =>
      "x62_proto_prune" ->
        s"""${centAssignCtes(cents)},
           |${protoRankTail("asg")}""".stripMargin
    }.toMap
  }

  /** X63 oracle — the x36 pair stage and the x62 rank stage composed:
    * the kept set from the cosine-gate pairs, then the prototype rank
    * with per-cluster sizes over the DEDUPED population. Same centroid
    * inlining contract ([[semDedupOracle]]).
    */
  private def d4Oracle: Map[String, String] = {
    if (ProtoPrune.lastCentroids.isEmpty)
      System.err.println(
        "[graft] WARNING: x63_d4 oracle OMITTED — ProtoPrune.prune has " +
          "not run in this JVM, so there are no centroids to inline. Run " +
          "the queries before dumping oracleSql (graft.Verify's order).")
    ProtoPrune.lastCentroids.map { cents =>
      "x63_d4" ->
        s"""${centAssignCtes(cents)},
           |$cosinePairCte,
           |kp AS (SELECT asg.vec_id, asg.list_id FROM asg
           |  LEFT JOIN pair p ON p.ia = asg.vec_id WHERE p.ia IS NULL),
           |${protoRankTail("kp")}""".stripMargin
    }.toMap
  }

  /** Temperature-mix oracle: the derived weights inline as literals
    * (driver `pow` is not cross-libm reproducible — see
    * [[Sample.temperatureWeightsPpm]]); cuts re-derive in HUGEINT from
    * those weights exactly like the x31 oracle. Same
    * run-queries-then-dump contract as [[ivfOracle]].
    */
  private def tempMixOracle: Map[String, String] = {
    if (lastTempWeights.isEmpty)
      System.err.println(
        "[graft] WARNING: x40_temperature_mix oracle OMITTED — the query " +
          "has not run in this JVM, so there are no derived weights to " +
          "inline. Run the queries before dumping oracleSql.")
    lastTempWeights.map { w =>
      val vals = w.toSeq.sortBy(_._1)
        .map { case (d, v) => s"('${d.replace("'", "''")}', $v)" }
        .mkString(", ")
      "x40_temperature_mix" ->
        s"""WITH docs AS (SELECT doc_id,
           |  'd' || CASE WHEN doc_id % 10 < 7 THEN 0
           |              WHEN doc_id % 10 < 9 THEN 1 ELSE 2 END AS domain
           |  FROM documents),
           |w(domain, w) AS (VALUES $vals),
           |cnt AS (SELECT domain, count(*) AS n FROM docs
           |  WHERE domain IN (SELECT domain FROM w) GROUP BY 1),
           |t AS (SELECT min((CAST(n AS HUGEINT) * 1000000) // w) AS t
           |  FROM cnt JOIN w USING (domain)),
           |cut AS (SELECT domain,
           |  (CAST(4294967296 AS HUGEINT) * w * t.t)
           |    // (CAST(1000000 AS HUGEINT) * n) AS cut
           |  FROM cnt JOIN w USING (domain) CROSS JOIN t)
           |SELECT d.doc_id, d.domain
           |FROM docs d JOIN cut c ON c.domain = d.domain
           |WHERE c.cut >= 4294967296 OR
           |  ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '$TempMixSeed'), 1, 8))::BIGINT < c.cut
           |ORDER BY d.doc_id""".stripMargin
    }.toMap
  }

  /** Exact brute-force and sign-bucket ANN SQL — named so the x43 recall
    * oracle can embed the identical pipelines as subqueries.
    */
  private def cosineTopkSql: String =
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
       |scored AS (SELECT qs.vec_id AS qid, c.vec_id AS cid,
       |  round(list_dot_product(qs.q, c.q) / (sqrt(qs.n2) * sqrt(c.n2)), 6) AS sim
       |  FROM n qs JOIN n c ON c.vec_id != qs.vec_id WHERE qs.vec_id < $NumQueries),
       |ranked AS (SELECT qid, cid, sim,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT qid, cid, rank, sim FROM ranked WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  private def annLshSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2,
       |  ${signBucketSql("embedding", LshBits)} AS bucket FROM e),
       |scored AS (SELECT qs.vec_id AS qid, c.vec_id AS cid,
       |  round(list_dot_product(qs.q, c.q) / (sqrt(qs.n2) * sqrt(c.n2)), 6) AS sim
       |  FROM n qs JOIN n c ON c.bucket = qs.bucket AND c.vec_id != qs.vec_id
       |  WHERE qs.vec_id < $NumQueries),
       |ranked AS (SELECT qid, cid, sim,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT qid, cid, rank, sim FROM ranked WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  /** JL-fronted exact re-rank SQL (x51_jl_refine and the x43/x112/x113
    * audit arms): sign matrix re-derived from SQL md5, exact projected
    * L2 coarse cut at [[JlCandR]], exact cosine re-rank. Fully STATIC —
    * the one ANN tier with no trained artifacts to inline.
    */
  private def jlTopkSql: String = jlTopkSqlAt(JlDOut, JlCandR)

  /** The same pipeline at arbitrary (dOut, candR) — the x51_jl_sweep
    * knob arms price the recall/cost frontier against these replays.
    */
  private def jlTopkSqlAt(dOut: Int, candR: Int): String =
    s"""WITH e AS (SELECT vec_id,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))
       |    AS q FROM embeddings WHERE embedding IS NOT NULL),
       |sg AS (SELECT a.i, b.j,
       |  CASE WHEN ('0x' || substring(md5('jl|' || a.i || '|' || b.j),
       |      1, 1))::INTEGER % 2 = 1 THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(generate_series(1, $JlDIn)) AS i) a
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dOut)) AS j) b),
       |t AS (SELECT e.vec_id, sg.j AS dim,
       |  CAST(sum(q[sg.i] * sg.s) AS BIGINT) AS y
       |  FROM e CROSS JOIN sg GROUP BY 1, 2),
       |pd AS (SELECT tq.vec_id AS qid, tc.vec_id AS cid,
       |  CAST(sum((tc.y - tq.y) * (tc.y - tq.y)) AS BIGINT) AS pdist
       |  FROM t tq JOIN t tc ON tc.dim = tq.dim AND tc.vec_id != tq.vec_id
       |  WHERE tq.vec_id < $NumQueries GROUP BY 1, 2),
       |cand AS (SELECT qid, cid FROM (SELECT qid, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY pdist, cid) AS r
       |  FROM pd) WHERE r <= $candR),
       |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
       |scored AS (SELECT cand.qid, cand.cid,
       |  round(list_dot_product(qn.q, cn.q) / (sqrt(qn.n2) * sqrt(cn.n2)), 6) AS sim
       |  FROM cand JOIN n qn ON qn.vec_id = cand.qid
       |  JOIN n cn ON cn.vec_id = cand.cid),
       |ranked AS (SELECT qid, cid, sim,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT qid, cid, rank, sim FROM ranked WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  /** Mixture-sampling SQL, shared verbatim by x31 (compiled-predicate
    * engine form) and x55 (join-based engine form): ONE oracle proving
    * the two execution shapes produce the identical row set.
    */
  private def mixtureSql: String = {
    val vals = MixtureWeightsPpm.toSeq.sortBy(_._1)
      .map { case (d, w) => s"('$d', $w)" }.mkString(", ")
    s"""WITH w(source, w) AS (VALUES $vals),
       |cnt AS (SELECT source, count(*) AS n FROM documents
       |  WHERE source IN (SELECT source FROM w) GROUP BY 1),
       |t AS (SELECT min((CAST(n AS HUGEINT) * 1000000) // w) AS t
       |  FROM cnt JOIN w USING (source)),
       |cut AS (SELECT source,
       |  (CAST(4294967296 AS HUGEINT) * w * t.t)
       |    // (CAST(1000000 AS HUGEINT) * n) AS cut
       |  FROM cnt JOIN w USING (source) CROSS JOIN t)
       |SELECT d.doc_id, d.source
       |FROM documents d JOIN cut c ON c.source = d.source
       |WHERE c.cut >= 4294967296 OR
       |  ('0x' || substring(md5(CAST(d.doc_id AS VARCHAR) || '$MixtureSeed'), 1, 8))::BIGINT < c.cut
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Multi-probe sign-LSH SQL (x51): the [[annLshSql]] pipeline with the
    * query side exploded over every XOR mask of Hamming weight <=
    * [[LshProbeDist]] — identical masks to the engine's enumeration.
    */
  private def lshProbeMasks: Seq[Long] =
    (0L until (1L << LshBits))
      .filter(m => java.lang.Long.bitCount(m) <= LshProbeDist)

  private def lshMultiProbeSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
       |  FROM embeddings),
       |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2,
       |  ${signBucketSql("embedding", LshBits)} AS bucket FROM e),
       |probes AS (SELECT vec_id AS qid, q AS qq, n2 AS qn2,
       |  xor(bucket, m) AS bucket
       |  FROM n, LATERAL unnest([${lshProbeMasks.mkString(", ")}]) AS mk(m)
       |  WHERE vec_id < $NumQueries),
       |scored AS (SELECT p.qid, c.vec_id AS cid,
       |  round(list_dot_product(p.qq, c.q) / (sqrt(p.qn2) * sqrt(c.n2)), 6) AS sim
       |  FROM probes p JOIN n c ON c.bucket = p.bucket AND c.vec_id != p.qid),
       |ranked AS (SELECT qid, cid, sim,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT qid, cid, rank, sim FROM ranked WHERE rank <= $TopK
       |ORDER BY qid, rank""".stripMargin

  /** x51 refine oracle: the IVF-PQ pipeline at (RefineNprobe, RefineR)
    * as the candidate subquery, exact-rescored and re-ranked — same
    * run-queries-then-dump contract as [[ivfOracle]].
    */
  private def annRefineOracle: Map[String, String] =
    ivfPqPipelineSql(RefineNprobe, RefineR).map { cand =>
      "x51_ann_refine" ->
        s"""WITH cand AS (SELECT qid, cid FROM ($cand)),
           |e AS (SELECT vec_id,
           |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
           |  FROM embeddings),
           |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
           |scored AS (SELECT cand.qid, cand.cid,
           |  round(list_dot_product(qn.q, cn.q) / (sqrt(qn.n2) * sqrt(cn.n2)), 6) AS sim
           |  FROM cand JOIN n qn ON qn.vec_id = cand.qid
           |  JOIN n cn ON cn.vec_id = cand.cid),
           |ranked AS (SELECT qid, cid, sim,
           |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS INTEGER) AS rank
           |  FROM scored)
           |SELECT qid, cid, rank, sim FROM ranked WHERE rank <= $TopK
           |ORDER BY qid, rank""".stripMargin
    }.toMap

  /** x43 recall audit oracle: each ANN method's full oracle pipeline
    * (trained artifacts inlined) embedded as a subquery and intersected
    * with the exact top-k — emitted only when every trained oracle is
    * available (same run-queries-then-dump contract as [[ivfOracle]]).
    */
  private def annRecallOracle: Map[String, String] = (for {
    ivf <- ivfOracle.get("x2_ann_ivf")
    pq <- pqOracle.get("x20_pq_ann")
    ivfpq <- ivfPqOracle.get("x21_ivf_pq")
    refine <- annRefineOracle.get("x51_ann_refine")
  } yield "x43_ann_recall" ->
    s"""WITH ex AS (SELECT qid, cid FROM ($cosineTopkSql)),
       |lshm AS (SELECT qid, cid FROM ($annLshSql)),
       |mpm AS (SELECT qid, cid FROM ($lshMultiProbeSql)),
       |ivfm AS (SELECT qid, cid FROM ($ivf)),
       |pqm AS (SELECT qid, cid FROM ($pq)),
       |ivfpqm AS (SELECT qid, cid FROM ($ivfpq)),
       |refm AS (SELECT qid, cid FROM ($refine)),
       |jlm AS (SELECT qid, cid FROM ($jlTopkSql)),
       |t AS (SELECT count(*) AS n_truth FROM ex),
       |u AS (
       |  SELECT 'ann_ivf' AS method, count(*) AS n_hits
       |    FROM ivfm JOIN ex USING (qid, cid)
       |  UNION ALL SELECT 'ann_lsh', count(*) FROM lshm JOIN ex USING (qid, cid)
       |  UNION ALL SELECT 'ivf_pq', count(*) FROM ivfpqm JOIN ex USING (qid, cid)
       |  UNION ALL SELECT 'ivf_pq_refine', count(*) FROM refm JOIN ex USING (qid, cid)
       |  UNION ALL SELECT 'jl_refine', count(*) FROM jlm JOIN ex USING (qid, cid)
       |  UNION ALL SELECT 'lsh_multiprobe', count(*) FROM mpm JOIN ex USING (qid, cid)
       |  UNION ALL SELECT 'pq_ann', count(*) FROM pqm JOIN ex USING (qid, cid))
       |SELECT method, CAST(n_hits AS BIGINT) AS n_hits,
       |  CAST(t.n_truth AS BIGINT) AS n_truth,
       |  CAST(n_hits * 1000000 // t.n_truth AS BIGINT) AS recall_ppm
       |FROM u CROSS JOIN t ORDER BY method""".stripMargin).toMap

  /** x112 rank-fidelity oracle: each method's ranked subquery joined
    * to the exact ranking on shared (qid, cid), per-query pair
    * products, exact C/D/P counts — same conditional-emission contract
    * as [[annRecallOracle]].
    */
  private def rankTauOracle: Map[String, String] = (for {
    ivf <- ivfOracle.get("x2_ann_ivf")
    pq <- pqOracle.get("x20_pq_ann")
    ivfpq <- ivfPqOracle.get("x21_ivf_pq")
    refine <- annRefineOracle.get("x51_ann_refine")
  } yield {
    val methods = Seq("ann_ivf" -> ivf, "ann_lsh" -> annLshSql,
      "ivf_pq" -> ivfpq, "ivf_pq_refine" -> refine,
      "jl_refine" -> jlTopkSql,
      "lsh_multiprobe" -> lshMultiProbeSql, "pq_ann" -> pq)
    val mCtes = methods.zipWithIndex.map { case ((_, sql), i) =>
      s"""s$i AS (SELECT m.qid, m.cid, m.rank AS ra, ex.re
         |  FROM (SELECT qid, cid, rank FROM ($sql)) m
         |  JOIN ex ON ex.qid = m.qid AND ex.cid = m.cid)""".stripMargin
    }.mkString(",\n")
    val unions = methods.zipWithIndex.map { case ((name, _), i) =>
      s"""SELECT '$name' AS method,
         |    coalesce(sum(CASE WHEN prod > 0 THEN 1 ELSE 0 END), 0)
         |      AS concordant,
         |    coalesce(sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END), 0)
         |      AS discordant,
         |    count(*) AS n_pairs FROM (
         |    SELECT (CAST(x.re AS BIGINT) - y.re)
         |      * (CAST(x.ra AS BIGINT) - y.ra) AS prod
         |    FROM s$i x JOIN s$i y
         |      ON x.qid = y.qid AND x.cid < y.cid)""".stripMargin
    }.mkString("\n  UNION ALL ")
    "x112_rank_tau" ->
      s"""WITH ex AS (SELECT qid, cid, rank AS re FROM ($cosineTopkSql)),
         |$mCtes,
         |u AS (
         |  $unions)
         |SELECT method, CAST(concordant AS BIGINT) AS concordant,
         |  CAST(discordant AS BIGINT) AS discordant,
         |  CAST(n_pairs AS BIGINT) AS n_pairs,
         |  CASE WHEN n_pairs = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE round(CAST(concordant - discordant AS DOUBLE) / n_pairs, 6)
         |  END AS tau
         |FROM u ORDER BY method""".stripMargin
  }).toMap

  /** x113 nDCG oracle: the same micro-unit weight table inlined as
    * literals, per-method hit weights summed over shared (qid, cid),
    * the per-query ideal from exact-list sizes.
    */
  private def ndcgOracle: Map[String, String] = (for {
    ivf <- ivfOracle.get("x2_ann_ivf")
    pq <- pqOracle.get("x20_pq_ann")
    ivfpq <- ivfPqOracle.get("x21_ivf_pq")
    refine <- annRefineOracle.get("x51_ann_refine")
  } yield {
    val methods = Seq("ann_ivf" -> ivf, "ann_lsh" -> annLshSql,
      "ivf_pq" -> ivfpq, "ivf_pq_refine" -> refine,
      "jl_refine" -> jlTopkSql,
      "lsh_multiprobe" -> lshMultiProbeSql, "pq_ann" -> pq)
    val w = Eval.ndcgWeightsMicro(TopK)
    val wCase = (1 to TopK).map(i =>
      s"WHEN $i THEN ${w(i - 1)}").mkString("CASE m.rank ", " ", " ELSE 0 END")
    val pfx = w.scanLeft(0L)(_ + _)
    val idealCase = (0 to TopK).map(m =>
      s"WHEN $m THEN ${pfx(m)}").mkString(
      "CASE n_rel ", " ", s" ELSE ${pfx(TopK)} END")
    val unions = methods.map { case (name, sql) =>
      s"""SELECT '$name' AS method, coalesce(sum($wCase), 0) AS dcg_micro
         |  FROM (SELECT qid, cid, rank FROM ($sql)) m
         |  JOIN ex ON ex.qid = m.qid AND ex.cid = m.cid
         |  WHERE m.rank <= $TopK""".stripMargin
    }.mkString("\n  UNION ALL ")
    "x113_ndcg" ->
      s"""WITH ex AS (SELECT qid, cid FROM ($cosineTopkSql)),
         |id0 AS (SELECT qid, least(count(*), $TopK) AS n_rel
         |  FROM ex GROUP BY 1),
         |idt AS (SELECT sum($idealCase) AS idcg_micro FROM id0),
         |u AS (
         |  $unions)
         |SELECT method, CAST(dcg_micro AS BIGINT) AS dcg_micro,
         |  CAST(idt.idcg_micro AS BIGINT) AS idcg_micro,
         |  CASE WHEN idt.idcg_micro = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE round(CAST(dcg_micro AS DOUBLE) / idt.idcg_micro, 6)
         |  END AS ndcg
         |FROM u CROSS JOIN idt ORDER BY method""".stripMargin
  }).toMap

  /** x114 oracle: same 6-shingle distinct table, df cap, shared-count
    * floor, exact-integer containment ppm.
    */
  private def containmentOracle: Map[String, String] = Map(
    "x114_containment" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
        |  FROM documents),
        |sh AS (SELECT DISTINCT doc_id, s FROM (
        |  SELECT doc_id, unnest(list_transform(
        |    generate_series(1, len(ts) - 5),
        |    i -> array_to_string(ts[i:i+5], ' '))) AS s FROM t)),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |keep AS (SELECT s FROM (SELECT s, count(*) AS df FROM sh
        |  GROUP BY 1) WHERE df <= 32),
        |rare AS (SELECT sh.doc_id, sh.s FROM sh JOIN keep USING (s)),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
        |    count(*) AS i
        |  FROM rare a JOIN rare b ON a.s = b.s AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 3)
        |SELECT d1, d2, CAST(i AS BIGINT) AS i,
        |  CAST(s1.n AS BIGINT) AS n1, CAST(s2.n AS BIGINT) AS n2,
        |  CAST(i * 1000000 // s1.n AS BIGINT) AS cont1_ppm,
        |  CAST(i * 1000000 // s2.n AS BIGINT) AS cont2_ppm,
        |  greatest(i * 1000000 // s1.n, i * 1000000 // s2.n) >= 500000
        |    AS template
        |FROM inter JOIN sz s1 ON s1.doc_id = d1
        |  JOIN sz s2 ON s2.doc_id = d2
        |ORDER BY d1, d2""".stripMargin)

  /** x44 oracle building blocks: the full BPE training unrolled round by
    * round, x37-style — w0 is the word-type table; each round counts
    * adjacent pairs, picks the (count DESC, a, b) argmax, and re-folds
    * every word's separator-encoded symbol string with the IDENTICAL
    * greedy left fold the engine runs on symbol arrays.
    */
  private def bpeW0Cte: String =
    s"""w0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |  chr(31) || array_to_string(
       |    list_transform(generate_series(1, length(word)), i -> word[i:i]),
       |    chr(31)) AS s
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word)""".stripMargin

  private def bpeRoundCtes(r: Int): String =
    s"""wp$r AS (SELECT freq, string_split(s[2:], chr(31)) AS ps FROM w${r - 1}),
       |pc$r AS (SELECT ps[i] AS a, ps[i+1] AS b, sum(freq) AS c
       |  FROM wp$r, LATERAL unnest(generate_series(1, len(ps) - 1)) AS u$r(i)
       |  GROUP BY 1, 2),
       |best$r AS (SELECT a, b, CAST(c AS BIGINT) AS c FROM pc$r
       |  ORDER BY c DESC, a, b LIMIT 1),
       |w$r AS (SELECT word, freq,
       |  list_reduce(list_prepend('', string_split(s[2:], chr(31))),
       |    (acc, x) -> CASE
       |      WHEN ends_with(acc, chr(31) || best$r.a) AND x = best$r.b
       |      THEN concat(left(acc, length(acc) - length(best$r.a) - 1),
       |        chr(31), best$r.a, best$r.b)
       |      ELSE acc || chr(31) || x END) AS s
       |  FROM w${r - 1} CROSS JOIN best$r)""".stripMargin

  private def bpeAllRounds: String =
    (bpeW0Cte +: (1 to BpeIters).map(bpeRoundCtes)).mkString(",\n")

  /** x90 WordPiece unroll — the x44 fold pattern with '##'-marked
    * continuation symbols and the likelihood-scored argmax: HUGEINT is
    * DuckDB's 38-digit lane for the engine's DECIMAL(38,0) score
    * quantization (cnt·10^12 // ca·cb), `b[3:]` strips the '##' the
    * engine strips with substring(b, 3).
    */
  private def wpW0Cte: String =
    s"""ww0 AS (SELECT word, CAST(count(*) AS BIGINT) AS freq,
       |  chr(31) || array_to_string(
       |    list_transform(generate_series(1, length(word)),
       |      i -> CASE WHEN i = 1 THEN word[i:i]
       |           ELSE '##' || word[i:i] END),
       |    chr(31)) AS s
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word)""".stripMargin

  private def wpRoundCtes(r: Int): String =
    s"""wwp$r AS (SELECT freq, string_split(s[2:], chr(31)) AS ps FROM ww${r - 1}),
       |wsc$r AS (SELECT ps[i] AS sym, sum(freq) AS c
       |  FROM wwp$r, LATERAL unnest(generate_series(1, len(ps))) AS s$r(i)
       |  GROUP BY 1),
       |wpc$r AS (SELECT ps[i] AS a, ps[i+1] AS b, sum(freq) AS cnt
       |  FROM wwp$r, LATERAL unnest(generate_series(1, len(ps) - 1)) AS u$r(i)
       |  GROUP BY 1, 2),
       |wbest$r AS (SELECT wpc$r.a AS a, wpc$r.b AS b,
       |  CAST(wpc$r.cnt AS BIGINT) AS cnt,
       |  CAST(CAST(wpc$r.cnt AS HUGEINT) * 1000000000000 //
       |    (CAST(sa.c AS HUGEINT) * CAST(sb.c AS HUGEINT)) AS BIGINT) AS score
       |  FROM wpc$r JOIN wsc$r sa ON sa.sym = wpc$r.a
       |    JOIN wsc$r sb ON sb.sym = wpc$r.b
       |  ORDER BY score DESC, a, b LIMIT 1),
       |ww$r AS (SELECT word, freq,
       |  list_reduce(list_prepend('', string_split(s[2:], chr(31))),
       |    (acc, x) -> CASE
       |      WHEN ends_with(acc, chr(31) || wbest$r.a) AND x = wbest$r.b
       |      THEN concat(left(acc, length(acc) - length(wbest$r.a) - 1),
       |        chr(31), wbest$r.a, wbest$r.b[3:])
       |      ELSE acc || chr(31) || x END) AS s
       |  FROM ww${r - 1} CROSS JOIN wbest$r)""".stripMargin

  private def wpAllRounds: String =
    (wpW0Cte +: (1 to WpIters).map(wpRoundCtes)).mkString(",\n")

  /** x86 unigram-LM seed: word types, occurrence-weighted substring
    * counts (chained LATERAL unnest over start/end), the all-singles +
    * top-multis vocabulary, and micro-nat costs — the exact engine
    * arithmetic (one rounded ln per piece; everything else integer).
    */
  /** The x69 cyclic-twin page lines as shared CTEs (t, l): doc lines
    * after the even-doc chunk cycling — reused by both x87 oracles.
    */
  private def cycLinesCtes: String =
    s"""t AS (SELECT doc_id, string_split(text, ' ') AS ts
       |  FROM documents),
       |l AS (SELECT doc_id, i,
       |   array_to_string(ts[(j*$C4Width+1):(j*$C4Width+$C4Width)], ' ')
       |     AS line
       |  FROM (SELECT doc_id, ts, i,
       |     CASE WHEN doc_id % 2 = 0 THEN i % 5 ELSE i END AS j
       |    FROM t, LATERAL unnest(generate_series(0,
       |      (len(ts) + ${C4Width - 1}) // $C4Width - 1)) AS u(i)))""".stripMargin

  private def uniSeedCtes: String =
    s"""uw AS (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
       |  WHERE length(word) > 0 GROUP BY word),
       |usp AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |  SELECT freq, word[s:e] AS piece FROM uw,
       |    LATERAL unnest(generate_series(1, length(word))) AS t1(s),
       |    LATERAL unnest(generate_series(s,
       |      least(length(word), s + ${UniPieceLen - 1}))) AS t2(e))
       |  GROUP BY piece),
       |uv0c AS (SELECT piece, cnt FROM usp WHERE length(piece) = 1
       |  UNION ALL
       |  SELECT piece, cnt FROM (SELECT piece, cnt FROM usp
       |    WHERE length(piece) >= 2 ORDER BY cnt DESC, piece
       |    LIMIT $UniTopMulti)),
       |uv0 AS (SELECT piece, cnt,
       |  CAST(round(ln(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000)
       |    AS BIGINT) AS cost
       |  FROM uv0c CROSS JOIN (SELECT sum(cnt) AS tot FROM uv0c))""".stripMargin

  /** One x86 Viterbi-EM round: the engine's DP replayed as a
    * list_reduce over a separator-encoded dp string (the x44 fold
    * pattern) — chr(30) separates positions, chr(31) separates the
    * cost head from the piece tail of each entry, '' encodes an
    * unreachable prefix. Split points scan ASCENDING (longest piece
    * first) with strict-< replacement — the engine's pinned tie-break.
    */
  private def uniRoundCtes(r: Int): String =
    s"""um$r AS (SELECT map_from_entries(list({'k': piece, 'v': cost})) AS m
       |  FROM uv${r - 1}),
       |useg$r AS (SELECT word, freq,
       |  list_reduce(list_prepend('0',
       |      list_transform(generate_series(1, length(word)),
       |        ii -> CAST(ii AS VARCHAR))),
       |    (acc, x) -> acc || chr(30) ||
       |      list_reduce(list_prepend('',
       |          list_transform(generate_series(
       |              greatest(1, CAST(x AS INT) - ${UniPieceLen - 1}),
       |              CAST(x AS INT)),
       |            s -> CASE
       |              WHEN len(m[word[s:CAST(x AS INT)]]) = 0
       |                OR string_split(acc, chr(30))[s] = ''
       |              THEN ''
       |              ELSE concat(
       |                CAST(CAST(string_split(
       |                    string_split(acc, chr(30))[s], chr(31))[1] AS BIGINT)
       |                  + m[word[s:CAST(x AS INT)]][1] AS VARCHAR),
       |                substr(string_split(acc, chr(30))[s],
       |                  length(string_split(
       |                    string_split(acc, chr(30))[s], chr(31))[1]) + 1),
       |                chr(31), word[s:CAST(x AS INT)]) END)),
       |        (b, c) -> CASE WHEN c = '' THEN b WHEN b = '' THEN c
       |          WHEN CAST(string_split(c, chr(31))[1] AS BIGINT)
       |             < CAST(string_split(b, chr(31))[1] AS BIGINT) THEN c
       |          ELSE b END)) AS dp
       |  FROM uw CROSS JOIN um$r),
       |upc$r AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |  SELECT freq, unnest(string_split(
       |    string_split(dp, chr(30))[length(word) + 1], chr(31))[2:]) AS piece
       |  FROM useg$r) GROUP BY piece),
       |uv$r AS (SELECT piece, cnt,
       |  CAST(round(ln(CAST(tot AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000000)
       |    AS BIGINT) AS cost
       |  FROM upc$r CROSS JOIN (SELECT sum(cnt) AS tot FROM upc$r))""".stripMargin

  private def uniAllRounds: String =
    (uniSeedCtes +: (1 to UniEmIters).map(uniRoundCtes)).mkString(",\n")

  /** x25 BM25 pipeline SQL — named so the x80 fusion can embed the
    * identical ranking as a subquery (the x43/x46 composition pattern).
    */
  private def bm25Sql: String = {
    // terms are interpolated into SQL string literals — escape quotes
    // so a term containing ' can never break or alter the oracle
    val esc = Bm25Terms.map(_.replace("'", "''"))
    val dfCols = esc.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN list_contains(ts, '$t') THEN 1 ELSE 0 END) AS df$i"
    }.mkString(", ")
    val tfCols = esc.zipWithIndex.map { case (t, i) =>
      s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE) AS tf$i"
    }.mkString(",\n  ")
    // identical operator tree to Retrieval.bm25: ((1.0-b) + ((b*dl)/avgdl))
    // etc., so every float op sees the same operand bits
    val termSum = Bm25Terms.indices.map { i =>
      s"""CASE WHEN tf$i > 0.0 THEN
         |  round(ln((CAST(n AS DOUBLE) - df$i + 0.5) / (df$i + 0.5) + 1.0), 6)
         |    * (tf$i * (1.2 + 1.0))
         |    / (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(total_tokens AS DOUBLE) / n)))
         |  ELSE 0.0 END""".stripMargin
    }.mkString("\n + ")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |stats AS (SELECT count(*) AS n,
       |  CAST(sum(len(ts)) AS BIGINT) AS total_tokens, $dfCols FROM t),
       |d AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl,
       |  $tfCols FROM t),
       |s AS (SELECT doc_id, round($termSum, 6) AS score
       |  FROM d CROSS JOIN stats),
       |r AS (SELECT doc_id, score,
       |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS rank
       |  FROM s WHERE score > 0.0)
       |SELECT doc_id, score, rank FROM r WHERE rank <= $Bm25TopK
       |ORDER BY rank""".stripMargin
  }

  /** x42 NB pipeline SQL — named so the x46 mismatch audit can embed the
    * identical pipeline as a subquery (the x43 composition pattern).
    */
  /** The NB scoring pipeline through the ranked per-(doc, class) score
    * table `r` — shared by the x42 oracle (rn = 1 tail) and the x124
    * margin-reliability oracle (rn = 1 minus rn = 2).
    */
  private def nbScoredCtes: String =
    s"""WITH sp AS (SELECT doc_id,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
       |           < '${Sample.threshold(SplitTrain)}' THEN 'train'
       |         WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
       |           < '${Sample.threshold(SplitTrain + SplitValid)}' THEN 'valid'
       |         ELSE 'test' END AS split
       |  FROM documents),
       |tr AS (SELECT d.doc_id, d.text, d.lang FROM documents d
       |  JOIN sp ON sp.doc_id = d.doc_id WHERE sp.split = 'train'),
       |tok AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM tr),
       |cw AS (SELECT lang, w, count(*) AS c FROM tok GROUP BY 1, 2),
       |tl AS (SELECT lang, count(*) AS t FROM tok GROUP BY 1),
       |v AS (SELECT count(DISTINCT w) AS v FROM tok),
       |pr AS (SELECT lang, count(*) AS d FROM tr GROUP BY 1),
       |n AS (SELECT count(*) AS n FROM tr),
       |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |s AS (SELECT dt.doc_id, tl.lang,
       |    CAST(round(ln((coalesce(cw.c, 0) + 1)
       |      / CAST(tl.t + v.v AS DOUBLE)) * 1000000) AS BIGINT) AS lnp
       |  FROM dt CROSS JOIN tl CROSS JOIN v
       |  LEFT JOIN cw ON cw.lang = tl.lang AND cw.w = dt.w),
       |agg AS (SELECT doc_id, lang, sum(lnp) AS sl FROM s GROUP BY 1, 2),
       |sc AS (SELECT agg.doc_id, agg.lang,
       |    CAST(agg.sl + CAST(round(ln(pr.d / CAST(n.n AS DOUBLE)) * 1000000)
       |      AS BIGINT) AS BIGINT) AS score
       |  FROM agg JOIN pr ON pr.lang = agg.lang CROSS JOIN n),
       |r AS (SELECT doc_id, lang, score, row_number()
       |    OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
       |  FROM sc)""".stripMargin

  private def nbQualitySql: String =
    s"""$nbScoredCtes
       |SELECT doc_id, lang AS pred, score AS score_micro FROM r
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin

  /** x124 oracle: margin = rn1 − rn2 score from the shared NB ranked
    * table, digit-count bins, per-bin accuracy vs the declared label.
    */
  private def marginReliabilitySql: String =
    s"""$nbScoredCtes,
       |mg AS (SELECT a.doc_id, a.lang AS pred, a.score - b.score AS margin
       |  FROM r a JOIN r b ON b.doc_id = a.doc_id AND b.rn = 2
       |  WHERE a.rn = 1),
       |j AS (SELECT mg.margin,
       |    CASE WHEN mg.pred = d.lang THEN 1 ELSE 0 END AS hit
       |  FROM mg JOIN documents d USING (doc_id))
       |SELECT CAST(length(CAST(margin AS VARCHAR)) AS BIGINT) AS bin,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(hit) AS BIGINT) AS n_correct,
       |  CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS acc_ppm,
       |  CAST(sum(margin) AS BIGINT) AS sum_margin
       |FROM j GROUP BY 1 ORDER BY bin""".stripMargin

  /** x59 oracle: the E perceptron epochs replayed from the raw data
    * alone (x37 discipline) — X39 feature hashing, zero-initialized
    * dense weights over (label, bucket), then per epoch: per-(doc,
    * label) scores, argmax predictions (score DESC, label ASC — the
    * engine's tie-break), mistake deltas, weight update. The classifier
    * scores against the SUM of the E epoch snapshots (argmax-invariant
    * unscaled average); docs whose features all sign-cancelled away
    * score 0 everywhere via the dense documents x langs left join.
    * All arithmetic is integer (DuckDB widens sums to HUGEINT; the
    * final score casts back to BIGINT like the engine's long).
    */
  private def perceptronSql: String = {
    def fhSign = "CASE WHEN ('0x' || substring(md5('" + FeatureHashSeed +
      "s|' || token), 1, 1))::INTEGER % 2 = 0 THEN 1 ELSE -1 END"
    def epoch(e: Int): String = {
      val wp = s"w${e - 1}"
      s"""s$e AS (SELECT f.doc_id, w.label, sum(f.weight * w.w) AS sc
         |  FROM tf f JOIN $wp w ON w.bucket = f.bucket GROUP BY 1, 2),
         |p$e AS (SELECT doc_id, label AS pred FROM (
         |  SELECT doc_id, label, row_number()
         |      OVER (PARTITION BY doc_id ORDER BY sc DESC, label ASC) AS rn
         |    FROM s$e) WHERE rn = 1),
         |m$e AS (SELECT p.doc_id, lab.label AS t, p.pred
         |  FROM p$e p JOIN lab ON lab.doc_id = p.doc_id
         |  WHERE lab.label <> p.pred),
         |d$e AS (SELECT l.label, f.bucket,
         |    sum(f.weight * (CASE WHEN l.label = m.t THEN 1 ELSE 0 END
         |      - CASE WHEN l.label = m.pred THEN 1 ELSE 0 END)) AS dw
         |  FROM m$e m JOIN tf f ON f.doc_id = m.doc_id CROSS JOIN langs l
         |  GROUP BY 1, 2),
         |w$e AS (SELECT wp.label, wp.bucket, wp.w + coalesce(d.dw, 0) AS w
         |  FROM $wp wp LEFT JOIN d$e d
         |    ON d.label = wp.label AND d.bucket = wp.bucket)""".stripMargin
    }
    val epochs = (1 to PerceptronEpochs).map(epoch).mkString(",\n")
    val snapshots = (1 to PerceptronEpochs)
      .map(e => s"SELECT * FROM w$e").mkString(" UNION ALL ")
    s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
       |  FROM documents),
       |f AS (SELECT doc_id,
       |    ('0x' || substring(md5('$FeatureHashSeed|' || token), 1, 8))::BIGINT
       |      % $FeatureHashDim AS bucket,
       |    CAST(sum($fhSign) AS BIGINT) AS weight
       |  FROM tk GROUP BY 1, 2 HAVING sum($fhSign) != 0),
       |lab AS (SELECT d.doc_id, d.lang AS label FROM documents d
       |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
       |    < '${Sample.threshold(SplitTrain)}'),
       |tf AS (SELECT f.doc_id, f.bucket, f.weight
       |  FROM f JOIN lab ON lab.doc_id = f.doc_id),
       |langs AS (SELECT DISTINCT label FROM lab),
       |bk AS (SELECT unnest(generate_series(0, ${FeatureHashDim - 1}))
       |  AS bucket),
       |w0 AS (SELECT label, bucket, CAST(0 AS BIGINT) AS w
       |  FROM langs CROSS JOIN bk),
       |$epochs,
       |ws AS (SELECT label, bucket, sum(w) AS w
       |  FROM ($snapshots) GROUP BY 1, 2),
       |cs AS (SELECT f.doc_id, w.label, sum(f.weight * w.w) AS sc
       |  FROM f JOIN ws w ON w.bucket = f.bucket GROUP BY 1, 2),
       |cd AS (SELECT d.doc_id, l.label, coalesce(cs.sc, 0) AS sc
       |  FROM documents d CROSS JOIN langs l
       |  LEFT JOIN cs ON cs.doc_id = d.doc_id AND cs.label = l.label),
       |r AS (SELECT doc_id, label, sc, row_number()
       |    OVER (PARTITION BY doc_id ORDER BY sc DESC, label ASC) AS rn
       |  FROM cd)
       |SELECT doc_id, label AS pred, CAST(sc AS BIGINT) AS score FROM r
       |WHERE rn = 1 ORDER BY doc_id""".stripMargin
  }

  // X53 fixed markup shell around each document (no single quotes, so
  // the strings interpolate into the oracle SQL literally): a script
  // block with comparison operators, a style block, entities (including
  // a double-encoded one), the text body, an anchor on `source`, and a
  // trailing comment
  private val HtmlPre =
    "<html><head><title>Doc</title><style>p { margin: 0; }</style>" +
      "</head><body><script type=\"text/javascript\">if (x < 2 && y > 1) " +
      "{ go(); }</script><h1>Entities &amp; &lt;raw&gt; &quot;quoted&quot;" +
      "&nbsp;and &amp;amp; twice</h1>" +
      // the anchor-scope edges the gate must exercise corpus-wide: an
      // a-prefixed non-anchor tag, and an anchor living inside a
      // removed script block — neither may count toward link density
      "<article>article text stays but is not a link</article>" +
      "<script>w(\"<a href=\\\"/\\\">scripted nav</a>\");</script><p>"
  private val HtmlMid = "</p><div><a href=\"http://x\"><b>"
  private val HtmlSuf = "</b></a></div><!-- trailing comment --></body></html>"

  /** The x53 extraction chain in DuckDB syntax — stage-for-stage
    * identical to [[Html.extractText]]/[[Html.anchorText]] (RE2 needs
    * the explicit `g` flag where Java regex replaces globally by
    * default). Split like the engine: block removal is shared by the
    * text chain and the anchor extraction.
    */
  private def htmlStripBlocksSql(in: String): String =
    "regexp_replace(regexp_replace(regexp_replace(" +
      in +
      ", '(?is)<script[^>]*>.*?</script>', ' ', 'g')" +
      ", '(?is)<style[^>]*>.*?</style>', ' ', 'g')" +
      ", '(?s)<!--.*?-->', ' ', 'g')"

  private def htmlFinishSql(in: String): String =
    "trim(regexp_replace(" +
      "replace(replace(replace(replace(replace(replace(" +
      "regexp_replace(" + in + ", '(?s)<[^>]+>', ' ', 'g')" +
      ", '&lt;', '<'), '&gt;', '>'), '&quot;', '\"')" +
      ", '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&')" +
      ", '[ \\t\\r\\n]+', ' ', 'g'))"

  private def htmlExtractOracle: String =
    s"""WITH he AS (SELECT doc_id,
       |  '$HtmlPre' || text || '$HtmlMid' || source || '$HtmlSuf' AS h
       |  FROM documents),
       |hb AS (SELECT doc_id, ${htmlStripBlocksSql("h")} AS hs FROM he),
       |ex AS (SELECT doc_id,
       |  ${htmlFinishSql("hs")} AS clean_text,
       |  ${htmlFinishSql(
             "array_to_string(regexp_extract_all(hs, " +
               "'(?is)<a([ \\t\\r\\n][^>]*)?>(.*?)</a>', 2), ' ')")}
       |    AS a_text
       |  FROM hb)
       |SELECT doc_id, clean_text,
       |  CAST(length(clean_text) AS BIGINT) AS n_clean_chars,
       |  CAST(length(a_text) * 1000000 // greatest(length(clean_text), 1)
       |    AS BIGINT) AS link_density_ppm
       |FROM ex ORDER BY doc_id""".stripMargin

  /** x52 Kneser-Ney 5-gram oracle: the full model — raw 5-gram counts,
    * continuation-count tables at orders 4..1 from distinct type sets,
    * history denominators — replayed from the data, then the per-order
    * fixed-point chain p1→p5 with the identical single-division-per-
    * order arithmetic (see [[KneserNey]]; `//` on DuckDB integers
    * truncates like Spark's `div`, and every operand is non-negative).
    */
  /** x67 oracle: the duplicate-injected paged twin replayed, then every
    * repetition signal in its relational form — group-by-line /
    * group-by-gram counts, top-1 by (count DESC, gram), positional
    * coverage join for the duplicate-n-gram character fractions.
    */
  /** The repetition-signal CTE generators shared by [[x67Sql]] and
    * [[x68Sql]], parameterized by a CTE-name prefix: every table the
    * fragments read is prefix+name (wl/wx/twc/lm for x67's paged twin,
    * rwl/rwx/rtwc/rlm for x68's cleaned pages), so ONE generator feeds
    * both replays and a threshold or formula fix cannot drift between
    * them. [[repSignalCtes]] = per-n gram explode + counts + top-1 +
    * duplicate coverage; [[repKeptConj]] = the Gopher threshold
    * conjunction; [[repSignalJoins]] = the per-signal LEFT JOINs.
    */
  private def repSignalCtes(pfx: String): String = {
    def gramCtes(n: Int): String =
      s"""${pfx}gn$n AS (SELECT doc_id, i AS p,
         |    array_to_string(ws[i:i+${n - 1}], ' ') AS g
         |  FROM ${pfx}wl, LATERAL unnest(generate_series(1, len(ws) - ${n - 1}))
         |    AS u(i)),
         |${pfx}tc$n AS (SELECT doc_id, g, count(*) AS c FROM ${pfx}gn$n
         |  GROUP BY doc_id, g)""".stripMargin
    def topCtes(n: Int): String =
      s"""${pfx}tb$n AS (SELECT doc_id, c, g FROM (SELECT doc_id, g, c,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g)
         |      AS rn FROM ${pfx}tc$n) WHERE rn = 1),
         |${pfx}tp$n AS (SELECT ${pfx}tb$n.doc_id,
         |   CAST(${pfx}tb$n.c * (length(${pfx}tb$n.g) - ${n - 1}) * 1000000
         |     // ${pfx}twc.twc AS BIGINT) AS v
         |  FROM ${pfx}tb$n JOIN ${pfx}twc
         |    ON ${pfx}twc.doc_id = ${pfx}tb$n.doc_id)""".stripMargin
    def dupCtes(n: Int): String =
      s"""${pfx}dd$n AS (SELECT doc_id, g FROM ${pfx}tc$n WHERE c > 1),
         |${pfx}dp$n AS (SELECT DISTINCT ${pfx}gn$n.doc_id, s.pos
         |  FROM ${pfx}gn$n JOIN ${pfx}dd$n ON ${pfx}dd$n.doc_id = ${pfx}gn$n.doc_id
         |    AND ${pfx}dd$n.g = ${pfx}gn$n.g,
         |  LATERAL unnest(generate_series(${pfx}gn$n.p, ${pfx}gn$n.p + ${n - 1}))
         |    AS s(pos)),
         |${pfx}dc$n AS (SELECT ${pfx}dp$n.doc_id, CAST(sum(length(${pfx}wx.w)) AS BIGINT)
         |    AS dchars
         |  FROM ${pfx}dp$n JOIN ${pfx}wx ON ${pfx}wx.doc_id = ${pfx}dp$n.doc_id
         |    AND ${pfx}wx.p = ${pfx}dp$n.pos
         |  GROUP BY ${pfx}dp$n.doc_id),
         |${pfx}du$n AS (SELECT ${pfx}dc$n.doc_id,
         |   CAST(${pfx}dc$n.dchars * 1000000 // ${pfx}twc.twc AS BIGINT) AS v
         |  FROM ${pfx}dc$n JOIN ${pfx}twc
         |    ON ${pfx}twc.doc_id = ${pfx}dc$n.doc_id)""".stripMargin
    ((2 to 10).map(gramCtes) ++ (2 to 4).map(topCtes) ++
      (5 to 10).map(dupCtes)).mkString(",\n")
  }

  private def repKeptConj(pfx: String): String = (Seq(
      s"${pfx}lm.n_dup * 1000000 // ${pfx}lm.n_lines <= ${Gopher.DupLineMaxPpm}",
      s"(CASE WHEN ${pfx}lm.total_lc > 0 THEN ${pfx}lm.dup_lc * 1000000 " +
        s"// ${pfx}lm.total_lc ELSE 0 END) <= ${Gopher.DupLineCharMaxPpm}") ++
      (2 to 4).map(n =>
        s"coalesce(${pfx}tp$n.v, 0) <= ${Gopher.TopGramMaxPpm(n)}") ++
      (5 to 10).map(n =>
        s"coalesce(${pfx}du$n.v, 0) <= ${Gopher.DupGramMaxPpm(n)}"))
      .mkString("(", "\n   AND ", ")")

  private def repSignalJoins(pfx: String): String =
    ((2 to 4).map(n =>
      s"LEFT JOIN ${pfx}tp$n ON ${pfx}tp$n.doc_id = ${pfx}lm.doc_id") ++
      (5 to 10).map(n =>
        s"LEFT JOIN ${pfx}du$n ON ${pfx}du$n.doc_id = ${pfx}lm.doc_id"))
      .mkString("\n  ")

  private def x67Sql: String = {
    val W = C4Width
    val topVals = (2 to 4).map(n =>
      s"CAST(coalesce(tp$n.v, 0) AS BIGINT) AS top${n}_char_ppm")
    val dupVals = (5 to 10).map(n =>
      s"CAST(coalesce(du$n.v, 0) AS BIGINT) AS dup${n}_char_ppm")
    val keptConj = repKeptConj("")
    val joins = repSignalJoins("")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
       |  FROM documents),
       |l AS (SELECT doc_id, i,
       |   CASE WHEN (doc_id + i) % 10 = 0 AND i > 0
       |     THEN array_to_string(ts[1:$W], ' ')
       |     ELSE array_to_string(ts[(i*$W+1):(i*$W+$W)], ' ') END AS line
       |  FROM t, LATERAL unnest(generate_series(0,
       |    (len(ts) + ${W - 1}) // $W - 1)) AS u(i)),
       |pg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS page
       |  FROM l GROUP BY doc_id),
       |lc AS (SELECT doc_id, line, count(*) AS c FROM l
       |  GROUP BY doc_id, line),
       |lm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
       |   CAST(sum(c) - count(*) AS BIGINT) AS n_dup,
       |   CAST(sum((c - 1) * length(line)) AS BIGINT) AS dup_lc,
       |   CAST(sum(c * length(line)) AS BIGINT) AS total_lc
       |  FROM lc GROUP BY doc_id),
       |w0 AS (SELECT doc_id,
       |   string_split(replace(page, chr(10), ' '), ' ') AS aw FROM pg),
       |wx AS (SELECT doc_id,
       |   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p,
       |   aw[i] AS w
       |  FROM w0, LATERAL unnest(generate_series(1, len(aw))) AS u(i)
       |  WHERE length(aw[i]) > 0),
       |twc AS (SELECT doc_id, CAST(sum(length(w)) AS BIGINT) AS twc
       |  FROM wx GROUP BY doc_id),
       |wl AS (SELECT doc_id, list(w ORDER BY p) AS ws FROM wx
       |  GROUP BY doc_id),
       |${repSignalCtes("")}
       |SELECT lm.doc_id, lm.n_lines,
       |  CAST(lm.n_dup * 1000000 // lm.n_lines AS BIGINT) AS dup_line_ppm,
       |  CAST(CASE WHEN lm.total_lc > 0
       |    THEN lm.dup_lc * 1000000 // lm.total_lc ELSE 0 END AS BIGINT)
       |    AS dup_line_char_ppm,
       |  ${(topVals ++ dupVals).mkString(",\n  ")},
       |  $keptConj AS kept_doc
       |FROM lm
       |$joins
       |ORDER BY lm.doc_id""".stripMargin
  }

  /** x68 oracle: the combined paged twin, C4-cleaned relationally, then
    * the x65 quality and x67 repetition signal formulas (q_/r_-prefixed
    * CTEs) replayed over the CLEANED pages; stage verdicts left-join
    * back so dropped-at-C4 docs carry NULL downstream verdicts, exactly
    * like the engine's `when(c4_kept, …)`.
    */
  private def x68Sql: String = {
    val W = C4Width
    val repConj = repKeptConj("r")
    val repJoins = repSignalJoins("r")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
       |  FROM documents),
       |l AS (SELECT doc_id, i,
       |   (CASE WHEN (doc_id + i) % 11 = 0 THEN '- ' ELSE '' END)
       |   || (CASE WHEN (doc_id + i) % 10 = 0 AND i > 0
       |       THEN array_to_string(ts[1:$W], ' ')
       |       ELSE array_to_string(ts[(i*$W+1):(i*$W+$W)], ' ') END)
       |   || (CASE WHEN doc_id % 3 <> 0 AND i = 0 THEN ' of and that'
       |       ELSE '' END)
       |   || (CASE WHEN (doc_id + i) % 13 = 0 THEN ' javascript'
       |       ELSE '' END)
       |   || (CASE WHEN doc_id % 17 = 0 AND i = 0 THEN ' {' ELSE '' END)
       |   || (CASE WHEN doc_id % 19 = 0 AND i = 0 THEN ' lorem ipsum'
       |       ELSE '' END)
       |   || (CASE WHEN (doc_id + i) % 6 = 0 THEN ' # #' ELSE '' END)
       |   || (CASE WHEN (doc_id + i) % 9 = 0 THEN ' 12345' ELSE '' END)
       |   || (CASE WHEN (doc_id + i) % 4 = 3 THEN ''
       |       WHEN (doc_id + i) % 5 = 4 THEN '...' ELSE '.' END) AS line
       |  FROM t, LATERAL unnest(generate_series(0,
       |    (len(ts) + ${W - 1}) // $W - 1)) AS u(i)),
       |k AS (SELECT doc_id, i, line,
       |   (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
       |     OR line LIKE '%"')
       |   AND len(string_split(line, ' ')) >= $C4MinWords
       |   AND NOT contains(line, 'javascript') AS keep
       |  FROM l),
       |g AS (SELECT doc_id,
       |   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |   string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY i)
       |     AS joined,
       |   bool_or(contains(line, '{')) AS has_brace,
       |   bool_or(contains(line, 'lorem ipsum')) AS has_lorem
       |  FROM k GROUP BY doc_id),
       |cp AS (SELECT doc_id,
       |   (n_kept >= $C4MinLines AND NOT has_brace AND NOT has_lorem)
       |     AS c4_kept,
       |   CASE WHEN n_kept >= $C4MinLines AND NOT has_brace
       |       AND NOT has_lorem
       |     THEN coalesce(joined, '') END AS page
       |  FROM g),
       |cps AS (SELECT doc_id, page FROM cp WHERE c4_kept),
       |qwx AS (SELECT doc_id, w
       |  FROM cps, LATERAL unnest(string_split(replace(page, chr(10),
       |    ' '), ' ')) AS u(w) WHERE length(w) > 0),
       |qwm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |   CAST(sum(length(w)) AS BIGINT) AS sum_len,
       |   CAST(sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0
       |     END) AS BIGINT) AS n_alpha,
       |   CAST(count(DISTINCT CASE WHEN w IN ('the','be','to','of',
       |     'and','that','have','with') THEN w END) AS BIGINT) AS n_stop
       |  FROM qwx GROUP BY doc_id),
       |ql AS (SELECT doc_id, line FROM cps,
       |  LATERAL unnest(string_split(page, chr(10))) AS u(line)),
       |qlm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |   CAST(sum(CASE WHEN line LIKE '- %' OR line LIKE '• %'
       |     THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
       |   CAST(sum(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END)
       |     AS BIGINT) AS n_ell
       |  FROM ql GROUP BY doc_id),
       |qpm AS (SELECT doc_id,
       |   CAST(length(page) - length(replace(page, '#', '')) AS BIGINT)
       |     AS n_hash,
       |   CAST((length(page) - length(replace(page, '...', ''))) // 3
       |     AS BIGINT) AS n_ell_occ
       |  FROM cps),
       |gq AS (SELECT qwm.doc_id,
       |  ((n_words BETWEEN 50 AND 100000)
       |   AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
       |   AND 10 * (n_hash + n_ell_occ) <= n_words
       |   AND 10 * n_bullet <= n_lines
       |   AND 10 * n_ell <= 3 * n_lines
       |   AND 10 * n_alpha >= 8 * n_words
       |   AND n_stop >= 2) AS q_kept
       |  FROM qwm JOIN qlm ON qlm.doc_id = qwm.doc_id
       |    JOIN qpm ON qpm.doc_id = qwm.doc_id),
       |rl AS (SELECT doc_id, line FROM cps,
       |  LATERAL unnest(string_split(page, chr(10))) AS u(line)),
       |rlc AS (SELECT doc_id, line, count(*) AS c FROM rl
       |  GROUP BY doc_id, line),
       |rlm AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
       |   CAST(sum(c) - count(*) AS BIGINT) AS n_dup,
       |   CAST(sum((c - 1) * length(line)) AS BIGINT) AS dup_lc,
       |   CAST(sum(c * length(line)) AS BIGINT) AS total_lc
       |  FROM rlc GROUP BY doc_id),
       |rw0 AS (SELECT doc_id,
       |   string_split(replace(page, chr(10), ' '), ' ') AS aw FROM cps),
       |rwx AS (SELECT doc_id,
       |   row_number() OVER (PARTITION BY doc_id ORDER BY i) AS p,
       |   aw[i] AS w
       |  FROM rw0, LATERAL unnest(generate_series(1, len(aw))) AS u(i)
       |  WHERE length(aw[i]) > 0),
       |rtwc AS (SELECT doc_id, CAST(sum(length(w)) AS BIGINT) AS twc
       |  FROM rwx GROUP BY doc_id),
       |rwl AS (SELECT doc_id, list(w ORDER BY p) AS ws FROM rwx
       |  GROUP BY doc_id),
       |${repSignalCtes("r")},
       |gr AS (SELECT rlm.doc_id, $repConj AS rep_kept
       |  FROM rlm
       |  $repJoins)
       |SELECT cp.doc_id, cp.c4_kept, gq.q_kept AS quality_kept,
       |  gr.rep_kept,
       |  (cp.c4_kept AND coalesce(gq.q_kept, FALSE)
       |    AND coalesce(gr.rep_kept, FALSE)) AS kept_doc
       |FROM cp
       |LEFT JOIN gq ON gq.doc_id = cp.doc_id
       |LEFT JOIN gr ON gr.doc_id = cp.doc_id
       |ORDER BY cp.doc_id""".stripMargin
  }

  /** x72: the code-twin synthesis replayed, then each signal
    * relationally — lines/words unnested and grouped back, symbol chars
    * via the same translate strip, identical integer ppm cuts and the
    * >= [[CodeDetect.MinVotes]] vote.
    */
  private def x72Sql: String = {
    val W = C4Width
    val kws = CodeDetect.Keywords.mkString("'", "','", "'")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
       |  FROM documents),
       |l AS (SELECT doc_id, i,
       |   (CASE WHEN doc_id % 3 = 0 AND i % 2 = 1 THEN '  int '
       |         WHEN doc_id % 3 = 1 AND i % 2 = 1 THEN '  '
       |         ELSE '' END)
       |   || array_to_string(ts[(i*$W+1):(i*$W+$W)], ' ')
       |   || (CASE WHEN doc_id % 3 = 0 AND i % 2 = 1 THEN ' = 1;'
       |            WHEN doc_id % 3 = 0 THEN ' {' ELSE '' END) AS line
       |  FROM t, LATERAL unnest(generate_series(0,
       |    (len(ts) + ${W - 1}) // $W - 1)) AS u(i)),
       |p AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS page
       |  FROM l GROUP BY doc_id),
       |lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       |   CAST(sum(CASE WHEN starts_with(line, '  ')
       |     OR starts_with(line, chr(9)) THEN 1 ELSE 0 END) AS BIGINT)
       |     AS n_ind,
       |   CAST(sum(CASE WHEN ends_with(line, ';') OR ends_with(line, '{')
       |     OR ends_with(line, '}') THEN 1 ELSE 0 END) AS BIGINT) AS n_pct
       |  FROM l GROUP BY doc_id),
       |wx AS (SELECT doc_id, w
       |  FROM p, LATERAL unnest(string_split(replace(page, chr(10), ' '),
       |    ' ')) AS u(w) WHERE length(w) > 0),
       |wm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |   CAST(sum(CASE WHEN lower(w) IN ($kws) THEN 1 ELSE 0 END)
       |     AS BIGINT) AS n_kw
       |  FROM wx GROUP BY doc_id),
       |pm AS (SELECT doc_id, CAST(length(page) AS BIGINT) AS n_chars,
       |   CAST(length(page) - length(translate(page,
       |     '${CodeDetect.SymbolChars}', '')) AS BIGINT) AS n_sym
       |  FROM p),
       |sg AS (SELECT lm.doc_id,
       |   CAST(CASE WHEN pm.n_chars > 0
       |     THEN pm.n_sym * 1000000 // pm.n_chars ELSE 0 END AS BIGINT)
       |     AS sym_ppm,
       |   CAST(CASE WHEN wm.n_words > 0
       |     THEN wm.n_kw * 1000000 // wm.n_words ELSE 0 END AS BIGINT)
       |     AS kw_ppm,
       |   CAST(lm.n_ind * 1000000 // lm.n_lines AS BIGINT) AS indent_ppm,
       |   CAST(lm.n_pct * 1000000 // lm.n_lines AS BIGINT)
       |     AS punctline_ppm,
       |   lm.n_lines, wm.n_words
       |  FROM lm JOIN wm ON wm.doc_id = lm.doc_id
       |  JOIN pm ON pm.doc_id = lm.doc_id)
       |SELECT doc_id, sym_ppm, kw_ppm, indent_ppm, punctline_ppm,
       |  n_lines, n_words,
       |  ((CASE WHEN sym_ppm >= ${CodeDetect.SymMinPpm} THEN 1 ELSE 0 END)
       |   + (CASE WHEN kw_ppm >= ${CodeDetect.KwMinPpm} THEN 1 ELSE 0 END)
       |   + (CASE WHEN indent_ppm >= ${CodeDetect.IndentMinPpm}
       |       THEN 1 ELSE 0 END)
       |   + (CASE WHEN punctline_ppm >= ${CodeDetect.PunctLineMinPpm}
       |       THEN 1 ELSE 0 END)) >= ${CodeDetect.MinVotes} AS is_code
       |FROM sg ORDER BY doc_id""".stripMargin
  }

  /** x73: the script-twin synthesis + strip-and-diff counts replayed;
    * the dominant CASE is the closed form of the engine's alphabetical
    * strict-> fold (a script wins iff its count >= every later one's
    * and the overall max is nonzero).
    */
  private def x73Sql: String = {
    val cls = ScriptMix.Classes.toMap
    def strip(name: String): String =
      s"CAST(length(page) - length(regexp_replace(page, '${cls(name)}', '', 'g')) AS BIGINT)"
    s"""WITH p AS (SELECT doc_id, text
       |   || (CASE WHEN doc_id % 5 = 1
       |       THEN repeat('$CyrPhrase', CAST((doc_id % 4) * 8 AS INT))
       |       ELSE '' END)
       |   || (CASE WHEN doc_id % 5 = 2
       |       THEN repeat('$GrePhrase', CAST((doc_id % 4) * 8 AS INT))
       |       ELSE '' END)
       |   || (CASE WHEN doc_id % 5 = 3
       |       THEN repeat('$HanPhrase', CAST((doc_id % 4) * 8 AS INT))
       |       ELSE '' END)
       |   || (CASE WHEN doc_id % 5 = 4
       |       THEN '$CyrPhrase$GrePhrase$HanPhrase' ELSE '' END) AS page
       |  FROM documents),
       |c AS (SELECT doc_id, CAST(length(page) AS BIGINT) AS n_chars,
       |   ${strip("cyrillic")} AS cyrillic_chars,
       |   ${strip("greek")} AS greek_chars,
       |   ${strip("han")} AS han_chars,
       |   ${strip("latin")} AS latin_chars
       |  FROM p)
       |SELECT doc_id, cyrillic_chars, greek_chars, han_chars, latin_chars,
       |  CAST(CASE WHEN n_chars > 0
       |    THEN cyrillic_chars * 1000000 // n_chars ELSE 0 END AS BIGINT)
       |    AS cyrillic_ppm,
       |  CAST(CASE WHEN n_chars > 0
       |    THEN greek_chars * 1000000 // n_chars ELSE 0 END AS BIGINT)
       |    AS greek_ppm,
       |  CAST(CASE WHEN n_chars > 0
       |    THEN han_chars * 1000000 // n_chars ELSE 0 END AS BIGINT)
       |    AS han_ppm,
       |  CAST(CASE WHEN n_chars > 0
       |    THEN latin_chars * 1000000 // n_chars ELSE 0 END AS BIGINT)
       |    AS latin_ppm,
       |  n_chars,
       |  CASE
       |    WHEN greatest(cyrillic_chars, greek_chars, han_chars,
       |      latin_chars) = 0 THEN 'none'
       |    WHEN cyrillic_chars >= greatest(greek_chars, han_chars,
       |      latin_chars) THEN 'cyrillic'
       |    WHEN greek_chars >= greatest(han_chars, latin_chars)
       |      THEN 'greek'
       |    WHEN han_chars >= latin_chars THEN 'han'
       |    ELSE 'latin' END AS dominant
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** x66 waterfilling CTE (shared by both x66 oracles): the contiguous
    * capped prefix found by the same BIGINT cross-multiplication as
    * [[UniMax.allocate]], integer leftover share + remainder-to-
    * smallest.
    */
  private def uniMaxAllocCte: String = {
    val b = UniMaxBudget
    val e = UniMaxEpochs
    s"""c AS (SELECT lang,
       |   CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS ct
       |  FROM documents GROUP BY lang),
       |w AS (SELECT lang, ct, ct * $e AS cap,
       |   CAST(row_number() OVER (ORDER BY ct, lang) AS BIGINT) AS i,
       |   CAST(count(*) OVER () AS BIGINT) AS n,
       |   CAST(coalesce(sum(ct * $e) OVER (ORDER BY ct, lang
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |     AS BIGINT) AS sprev
       |  FROM c),
       |f AS (SELECT *, (cap * (n - i + 1) <= $b - sprev) AS cond FROM w),
       |kk AS (SELECT coalesce(min(CASE WHEN NOT cond THEN i END) - 1,
       |    max(i)) AS k FROM f),
       |sk AS (SELECT CAST(coalesce(sum(CASE WHEN f.i <= kk.k THEN f.cap
       |    END), 0) AS BIGINT) AS sk FROM f, kk),
       |a AS (SELECT f.lang, f.ct, f.i, kk.k,
       |   CASE WHEN f.i <= kk.k THEN f.cap
       |     ELSE ($b - sk.sk) // (f.n - kk.k)
       |       + (CASE WHEN f.i - kk.k <= ($b - sk.sk) % (f.n - kk.k)
       |          THEN 1 ELSE 0 END)
       |   END AS alloc
       |  FROM f, kk, sk)""".stripMargin
  }

  private def knLmSql: String = knLmSqlBuilder(estimated = false)

  /** The same pipeline with ESTIMATED discounts (x58): per-order
    * a_k/b_k from the count-of-count singleton/doubleton statistics,
    * arithmetic in HUGEINT (the rational b_k outgrows BIGINT — mirror
    * of the engine's DECIMAL(38,0) seat).
    */
  private def knMknSql: String = knLmSqlBuilder(estimated = true)

  private def knLmSqlBuilder(estimated: Boolean): String = {
    val S = KneserNey.Scale
    def ord(k: Int, cnt: String, n1p: String, den: String,
            pLow: String): String =
      if (!estimated)
        s"CASE WHEN $den IS NULL THEN $pLow ELSE " +
          s"(greatest(4 * coalesce($cnt, 0) - 3, 0) * $S + 3 * $n1p * $pLow)" +
          s" // (4 * $den) END"
      else
        s"CASE WHEN $den IS NULL THEN $pLow ELSE " +
          s"(greatest(CAST(b$k AS HUGEINT) * coalesce($cnt, 0) - a$k, " +
          s"CAST(0 AS HUGEINT)) * $S + CAST(a$k AS HUGEINT) * $n1p * $pLow)" +
          s" // (CAST(b$k AS HUGEINT) * $den) END"
    def dRow(src: String, cnt: String, k: Int): String =
      s"""(SELECT CASE WHEN n1 = 0 THEN 3 ELSE n1 END AS a$k,
         |  CASE WHEN n1 = 0 THEN 4 ELSE n1 + 2 * n2 END AS b$k
         |  FROM (SELECT sum(CASE WHEN $cnt = 1 THEN 1 ELSE 0 END) AS n1,
         |    sum(CASE WHEN $cnt = 2 THEN 1 ELSE 0 END) AS n2 FROM $src)) d$k"""
        .stripMargin
    val ddCte = if (!estimated) "" else
      s""",
         |dd AS (SELECT * FROM ${dRow("r5", "c5", 5)}
         |  CROSS JOIN ${dRow("cont4", "cn4", 4)}
         |  CROSS JOIN ${dRow("cont3", "cn3", 3)}
         |  CROSS JOIN ${dRow("cont2", "cn2", 2)}
         |  CROSS JOIN ${dRow("cont1", "cn1", 1)})""".stripMargin
    val ddJoin = if (!estimated) "" else " CROSS JOIN dd"
    val ddCols = if (!estimated) "" else ", dd.*"
    val p1Expr =
      if (!estimated)
        s"(greatest(4 * coalesce(cn1, 0) - 3, 0) * $S + 3 * v1 * p0) // (4 * tc1)"
      else
        s"(greatest(CAST(b1 AS HUGEINT) * coalesce(cn1, 0) - a1, " +
          s"CAST(0 AS HUGEINT)) * $S + CAST(a1 AS HUGEINT) * v1 * p0)" +
          s" // (CAST(b1 AS HUGEINT) * tc1)"
    s"""WITH sp AS (SELECT doc_id,
       |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
       |      < '${Sample.threshold(SplitTrain)}' THEN 'train' ELSE 'other' END AS split
       |  FROM documents),
       |trt AS (SELECT d.doc_id, string_split(d.text, ' ') AS ts
       |  FROM documents d JOIN sp ON sp.doc_id = d.doc_id
       |  WHERE sp.split = 'train'),
       |r5 AS (SELECT array_to_string(ts[i:i+4], ' ') AS g,
       |    CAST(count(*) AS BIGINT) AS c5
       |  FROM trt, LATERAL unnest(generate_series(1, len(ts) - 4)) AS u5(i)
       |  GROUP BY 1),
       |h5 AS (SELECT array_to_string(string_split(g, ' ')[1:4], ' ') AS h4,
       |    CAST(sum(c5) AS BIGINT) AS tot5, CAST(count(*) AS BIGINT) AS n1p5
       |  FROM r5 GROUP BY 1),
       |cont4 AS (SELECT array_to_string(string_split(g, ' ')[2:5], ' ') AS u4,
       |    CAST(count(*) AS BIGINT) AS cn4 FROM r5 GROUP BY 1),
       |hist4 AS (SELECT array_to_string(string_split(u4, ' ')[1:3], ' ') AS h3,
       |    CAST(sum(cn4) AS BIGINT) AS den4, CAST(count(*) AS BIGINT) AS n1p4
       |  FROM cont4 GROUP BY 1),
       |r4 AS (SELECT DISTINCT array_to_string(ts[i:i+3], ' ') AS g
       |  FROM trt, LATERAL unnest(generate_series(1, len(ts) - 3)) AS u4g(i)),
       |cont3 AS (SELECT array_to_string(string_split(g, ' ')[2:4], ' ') AS u3,
       |    CAST(count(*) AS BIGINT) AS cn3 FROM r4 GROUP BY 1),
       |hist3 AS (SELECT array_to_string(string_split(u3, ' ')[1:2], ' ') AS h2,
       |    CAST(sum(cn3) AS BIGINT) AS den3, CAST(count(*) AS BIGINT) AS n1p3
       |  FROM cont3 GROUP BY 1),
       |r3 AS (SELECT DISTINCT array_to_string(ts[i:i+2], ' ') AS g
       |  FROM trt, LATERAL unnest(generate_series(1, len(ts) - 2)) AS u3g(i)),
       |cont2 AS (SELECT array_to_string(string_split(g, ' ')[2:3], ' ') AS u2,
       |    CAST(count(*) AS BIGINT) AS cn2 FROM r3 GROUP BY 1),
       |hist2 AS (SELECT string_split(u2, ' ')[1] AS h1,
       |    CAST(sum(cn2) AS BIGINT) AS den2, CAST(count(*) AS BIGINT) AS n1p2
       |  FROM cont2 GROUP BY 1),
       |r2 AS (SELECT DISTINCT array_to_string(ts[i:i+1], ' ') AS g
       |  FROM trt, LATERAL unnest(generate_series(1, len(ts) - 1)) AS u2g(i)),
       |cont1 AS (SELECT string_split(g, ' ')[2] AS w,
       |    CAST(count(*) AS BIGINT) AS cn1 FROM r2 GROUP BY 1),
       |km AS (SELECT CAST(sum(cn1) AS BIGINT) AS tc1,
       |    CAST(count(*) AS BIGINT) AS v1 FROM cont1),
       |kv AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v
       |  FROM (SELECT unnest(ts) AS t FROM trt))$ddCte,
       |dt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |scp AS (SELECT doc_id,
       |    array_to_string(ts[i:i+4], ' ') AS g,
       |    array_to_string(ts[i:i+3], ' ') AS h4,
       |    array_to_string(ts[i+1:i+4], ' ') AS u4,
       |    array_to_string(ts[i+1:i+3], ' ') AS h3,
       |    array_to_string(ts[i+2:i+4], ' ') AS u3,
       |    array_to_string(ts[i+2:i+3], ' ') AS h2,
       |    array_to_string(ts[i+3:i+4], ' ') AS u2,
       |    ts[i+3] AS h1, ts[i+4] AS w
       |  FROM dt, LATERAL unnest(generate_series(1, len(ts) - 4)) AS usc(i)),
       |j AS (SELECT s.doc_id, r5.c5, h5.tot5, h5.n1p5, cont4.cn4,
       |    hist4.den4, hist4.n1p4, cont3.cn3, hist3.den3, hist3.n1p3,
       |    cont2.cn2, hist2.den2, hist2.n1p2, cont1.cn1, km.tc1, km.v1, kv.v$ddCols
       |  FROM scp s
       |  LEFT JOIN r5 ON r5.g = s.g
       |  LEFT JOIN h5 ON h5.h4 = s.h4
       |  LEFT JOIN cont4 ON cont4.u4 = s.u4
       |  LEFT JOIN hist4 ON hist4.h3 = s.h3
       |  LEFT JOIN cont3 ON cont3.u3 = s.u3
       |  LEFT JOIN hist3 ON hist3.h2 = s.h2
       |  LEFT JOIN cont2 ON cont2.u2 = s.u2
       |  LEFT JOIN hist2 ON hist2.h1 = s.h1
       |  LEFT JOIN cont1 ON cont1.w = s.w
       |  CROSS JOIN km CROSS JOIN kv$ddJoin),
       |s1 AS (SELECT *, $S // v AS p0 FROM j),
       |s2 AS (SELECT *, $p1Expr AS p1 FROM s1),
       |s3 AS (SELECT *, ${ord(2, "cn2", "n1p2", "den2", "p1")} AS p2 FROM s2),
       |s4 AS (SELECT *, ${ord(3, "cn3", "n1p3", "den3", "p2")} AS p3 FROM s3),
       |s5 AS (SELECT *, ${ord(4, "cn4", "n1p4", "den4", "p3")} AS p4 FROM s4),
       |s6 AS (SELECT *, ${ord(5, "c5", "n1p5", "tot5", "p4")} AS p5 FROM s5)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
       |  CAST(sum(CASE WHEN coalesce(c5, 0) = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_unseen,
       |  CAST(sum(p5) AS BIGINT) AS sum_p_fix,
       |  CAST(sum(p5) // count(*) AS BIGINT) AS avg_p_fix
       |FROM s6 GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** x49/x50 shared CTE chain, ending in `ck` (doc_id, chunk_idx, start,
    * clen, chunk_md5). The engine hashes BINARY slices of the blob; the
    * oracle hashes text slices — identical md5s because the test corpus
    * is ASCII and the blob is its UTF-8 encoding (the engine form is the
    * general one; the oracle seam is single-byte-text only).
    */
  private def cdcChunkCtes: String =
    s"""cm AS (SELECT doc_id, text, length(text) AS len FROM documents),
       |cb AS (SELECT doc_id, i + ${CdcKb - 1} AS e
       |  FROM cm, LATERAL unnest(generate_series(1, len - ${CdcKb - 1})) AS u(i)
       |  WHERE substring(md5(substring(text, i, $CdcKb)), 1, $CdcHexZeros)
       |    = '${"0" * CdcHexZeros}'),
       |cc AS (SELECT DISTINCT doc_id, e FROM (
       |  SELECT doc_id, e FROM cb
       |  UNION ALL SELECT doc_id, len FROM cm WHERE len >= 1)),
       |cs AS (SELECT doc_id, e,
       |    coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY e) + 1, 1)
       |      AS cstart,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1
       |      AS chunk_idx
       |  FROM cc),
       |ck AS (SELECT cs.doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
       |    CAST(cstart AS INTEGER) AS start,
       |    CAST(e - cstart + 1 AS INTEGER) AS clen,
       |    md5(substring(cm.text, CAST(cstart AS INTEGER),
       |      CAST(e - cstart + 1 AS INTEGER))) AS chunk_md5
       |  FROM cs JOIN cm ON cm.doc_id = cs.doc_id)""".stripMargin

  /** Shared x41/x45 CTE chain: window fingerprints -> matched positions
    * -> diagonal islands -> maximal runs (g). Mirrors
    * [[Dedup.substringRuns]] stage for stage.
    */
  private def substrRunCtes: String =
    s"""t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
       |w AS (SELECT doc_id, p - 1 AS p,
       |    md5(array_to_string(ts[p : p + $SubstrK - 1], ' ')) AS h
       |  FROM t, LATERAL unnest(generate_series(1, len(ts) - $SubstrK + 1)) AS u(p)),
       |m AS (SELECT a.doc_id AS d1, b.doc_id AS d2, a.p AS pa, b.p AS pb
       |  FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id),
       |r AS (SELECT d1, d2, pa - pb AS diag, pa, pb,
       |    pa - row_number() OVER (PARTITION BY d1, d2, pa - pb ORDER BY pa)
       |      AS island
       |  FROM m),
       |g AS (SELECT d1, d2, CAST(min(pa) AS INTEGER) AS a_start,
       |    CAST(min(pb) AS INTEGER) AS b_start,
       |    CAST(count(*) + $SubstrK - 1 AS BIGINT) AS span_len
       |  FROM r GROUP BY d1, d2, diag, island)""".stripMargin

  /** X119 ABTT oracle, rendered from the trained top principal
    * component (micro-unit integer literal) — same
    * run-queries-then-dump contract as [[ivfOracle]]. The projection
    * arithmetic is exact BIGINT, so DuckDB replays scores and the one
    * round-6 cosine bit-for-bit.
    */
  private def abttOracle: Map[String, String] = {
    if (Similarity.lastAbttPc.isEmpty)
      System.err.println(
        "[graft] WARNING: x119_abtt oracle OMITTED — Similarity.abtt has " +
          "not run in this JVM, so there is no trained component to " +
          "inline. Run the queries before dumping oracleSql.")
    Similarity.lastAbttPc.toSeq.flatMap { case (vq, vq2) =>
      Seq(
        "x119_abtt" ->
          s"""WITH e AS (SELECT vec_id,
             |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))
             |    AS q FROM embeddings WHERE embedding IS NOT NULL),
             |ix AS (SELECT unnest(generate_series(1,
             |  (SELECT max(len(q)) FROM e))) AS i),
             |sums AS (SELECT ix.i AS p, CAST(sum(q[ix.i]) AS BIGINT) AS s,
             |  CAST(count(*) AS BIGINT) AS n FROM e CROSS JOIN ix GROUP BY 1),
             |v(p, vv) AS (SELECT unnest(generate_series(1, ${vq.length})),
             |  unnest(${vq.mkString("[", ", ", "]")})),
             |terms AS (SELECT e.vec_id,
             |  (q[sums.p] * sums.n - sums.s) AS qc, v.vv
             |  FROM e CROSS JOIN sums JOIN v ON v.p = sums.p),
             |agg AS (SELECT vec_id,
             |  CAST(sum(qc * vv) AS BIGINT) AS pc1_score,
             |  CAST(sum(qc * qc) AS BIGINT) AS qc2 FROM terms GROUP BY 1)
             |SELECT vec_id, pc1_score,
             |  CASE WHEN qc2 = 0 THEN CAST(0 AS DOUBLE)
             |       ELSE round(CAST(pc1_score AS DOUBLE)
             |         / (sqrt(qc2) * sqrt($vq2)), 6) END AS cos_pc1
             |FROM agg ORDER BY vec_id""".stripMargin,

        // x121: same covariance CTEs + the same inlined component; the
        // per-cell Rayleigh term is rounded to micro-unit BIGINT with
        // the identical fixed parenthesization, then exactly summed
        "x121_isotropy" ->
          s"""WITH e AS (SELECT
             |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))
             |    AS q FROM embeddings WHERE embedding IS NOT NULL),
             |ix AS (SELECT unnest(generate_series(1,
             |  (SELECT max(len(q)) FROM e))) AS i),
             |cells AS (SELECT a.i, b.i AS j,
             |  CAST(sum(q[a.i] * q[b.i]) AS BIGINT) AS g
             |  FROM e CROSS JOIN ix a CROSS JOIN ix b WHERE b.i >= a.i
             |  GROUP BY 1, 2),
             |sums AS (SELECT ix.i AS p, CAST(sum(q[ix.i]) AS BIGINT) AS s,
             |  CAST(count(*) AS BIGINT) AS n FROM e CROSS JOIN ix GROUP BY 1),
             |cv AS (SELECT cells.i, cells.j, sa.n,
             |  (cells.g * sa.n - sa.s * sb.s) AS cnum
             |  FROM cells JOIN sums sa ON sa.p = cells.i
             |  JOIN sums sb ON sb.p = cells.j),
             |v(p, vv) AS (SELECT unnest(generate_series(1, ${vq.length})),
             |  unnest(${vq.mkString("[", ", ", "]")})),
             |terms AS (SELECT cv.i, cv.j, cv.n, cv.cnum,
             |  va.vv AS vi, vb.vv AS vj
             |  FROM cv JOIN v va ON va.p = cv.i JOIN v vb ON vb.p = cv.j),
             |agg AS (SELECT CAST(max(n) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN i = j THEN cnum ELSE 0 END) AS BIGINT)
             |    AS trace_num,
             |  CAST(sum(CAST(round(CAST(cnum AS DOUBLE)
             |    * CAST(vi AS DOUBLE) * CAST(vj AS DOUBLE)
             |    * (CASE WHEN i = j THEN 1.0 ELSE 2.0 END)
             |    / $vq2.0 / CAST(n * n AS DOUBLE) * 1000000.0)
             |    AS BIGINT)) AS BIGINT) AS l1_micro
             |  FROM terms)
             |SELECT n, CAST(${vq.length} AS BIGINT) AS d, trace_num,
             |  l1_micro,
             |  round(CAST(trace_num AS DOUBLE) / CAST(n * n AS DOUBLE), 6)
             |    AS trace,
             |  round(CAST(l1_micro AS DOUBLE) / 1000000.0, 6) AS lambda1,
             |  CASE WHEN trace_num = 0 THEN CAST(0 AS DOUBLE)
             |       ELSE round(CAST(l1_micro AS DOUBLE) / 1000000.0
             |         * ${vq.length}
             |         / (CAST(trace_num AS DOUBLE) / CAST(n * n AS DOUBLE)),
             |         6) END AS anisotropy
             |FROM agg""".stripMargin)
    }.toMap
  }

  /** X119 single-pass covariance SQL — shared by `x119_embedding_cov`
    * (pinning the single-pass engine path) and `x119_cov_merged`
    * (pinning that the shard-then-merge fold reproduces it exactly).
    */
  private val covSinglePassSql: String =
    """WITH e AS (SELECT
      |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))
      |    AS q FROM embeddings WHERE embedding IS NOT NULL),
      |ix AS (SELECT unnest(generate_series(1,
      |  (SELECT max(len(q)) FROM e))) AS i),
      |cells AS (SELECT a.i, b.i AS j,
      |  CAST(sum(q[a.i] * q[b.i]) AS BIGINT) AS g
      |  FROM e CROSS JOIN ix a CROSS JOIN ix b WHERE b.i >= a.i
      |  GROUP BY 1, 2),
      |sums AS (SELECT ix.i AS p, CAST(sum(q[ix.i]) AS BIGINT) AS s,
      |  CAST(count(*) AS BIGINT) AS n FROM e CROSS JOIN ix GROUP BY 1)
      |SELECT CAST(cells.i AS BIGINT) AS i, CAST(cells.j AS BIGINT) AS j,
      |  sa.n, cells.g, sa.s AS s_i, sb.s AS s_j,
      |  round(CAST(cells.g * sa.n - sa.s * sb.s AS DOUBLE)
      |    / (sa.n * sa.n), 6) AS cov
      |FROM cells JOIN sums sa ON sa.p = cells.i
      |JOIN sums sb ON sb.p = cells.j
      |ORDER BY i, j""".stripMargin

  def oracle: Map[String, String] =
    ivfOracle ++ pqOracle ++ ivfPqOracle ++ semDedupOracle ++
      protoPruneOracle ++ d4Oracle ++
      tempMixOracle ++ annRecallOracle ++ rankTauOracle ++
      ndcgOracle ++ containmentOracle ++ annRefineOracle ++
      abttOracle ++ Map(

    // X119: the covariance lanes re-derived by the naive coordinate
    // cross join — exact integers, one round-6 double
    "x119_embedding_cov" -> covSinglePassSql,

    // X119 merged: the oracle is the SAME single-pass SQL — the row is
    // green iff the engine's shard-then-merge fold reproduces the
    // single-pass lanes and cov bit-for-bit
    "x119_cov_merged" -> covSinglePassSql,

    "x51_lsh_multiprobe" -> lshMultiProbeSql,

    "x51_jl_refine" -> jlTopkSql,

    // the JL knob arms replayed at their own (dOut, candR) and
    // intersected with the shared exact truth — the x43 audit shape
    "x51_jl_sweep" -> {
      val ctes = JlSweepArms.zipWithIndex.map { case ((_, d, r), i) =>
        s"m$i AS (SELECT qid, cid FROM (${jlTopkSqlAt(d, r)}))"
      }.mkString(",\n")
      val arms = JlSweepArms.zipWithIndex.map { case ((name, _, _), i) =>
        (if (i == 0) s"SELECT '$name' AS method, count(*) AS n_hits"
         else s"UNION ALL SELECT '$name', count(*)") +
          s" FROM m$i JOIN ex USING (qid, cid)"
      }.mkString("\n")
      s"""WITH ex AS (SELECT qid, cid FROM ($cosineTopkSql)),
         |$ctes,
         |t AS (SELECT count(*) AS n_truth FROM ex),
         |u AS ($arms)
         |SELECT method, CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(t.n_truth AS BIGINT) AS n_truth,
         |  CAST(n_hits * 1000000 // t.n_truth AS BIGINT) AS recall_ppm
         |FROM u CROSS JOIN t ORDER BY method""".stripMargin
    },

    "x44_bpe_merges" ->
      s"""WITH $bpeAllRounds
         |SELECT * FROM (
         |  ${(1 to BpeIters).map(r =>
              s"SELECT $r AS r, a, b, c AS cnt FROM best$r")
              .mkString("\n  UNION ALL ")}
         |) ORDER BY r""".stripMargin,

    "x44_bpe_tokens" ->
      s"""WITH $bpeAllRounds,
         |n AS (SELECT word,
         |  CAST(len(string_split(s[2:], chr(31))) AS BIGINT) AS n_sym
         |  FROM w$BpeIters),
         |dt AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |  FROM documents)
         |SELECT doc_id, CAST(sum(n_sym) AS BIGINT) AS n_bpe
         |FROM dt JOIN n USING (word) WHERE length(word) > 0
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x52_kn_lm" -> knLmSql,

    "x58_kn_mkn" -> knMknSql,

    // x64: the paged-twin synthesis (see c4Page) replayed relationally,
    // then the C4 rules as per-line booleans grouped back per doc
    "x64_c4_clean" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |l AS (SELECT doc_id, i,
         |    array_to_string(ts[(i*$C4Width+1):(i*$C4Width+$C4Width)], ' ')
         |      AS chunk
         |  FROM t, LATERAL unnest(generate_series(0,
         |    (len(ts) + ${C4Width - 1}) // $C4Width - 1)) AS u(i)),
         |d AS (SELECT doc_id, i, chunk
         |   || (CASE WHEN (doc_id + i) % 13 = 0 THEN ' javascript' ELSE '' END)
         |   || (CASE WHEN doc_id % 17 = 0 AND i = 0 THEN ' {' ELSE '' END)
         |   || (CASE WHEN doc_id % 19 = 0 AND i = 0 THEN ' lorem ipsum'
         |       ELSE '' END)
         |   || (CASE WHEN (doc_id + i) % 4 <> 3 THEN '.' ELSE '' END) AS line
         |  FROM l),
         |k AS (SELECT doc_id, i, line,
         |   (line LIKE '%.' OR line LIKE '%!' OR line LIKE '%?'
         |     OR line LIKE '%"')
         |   AND len(string_split(line, ' ')) >= $C4MinWords
         |   AND NOT contains(line, 'javascript') AS keep
         |  FROM d),
         |g AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |   CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |   string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY i)
         |     AS joined,
         |   bool_or(contains(line, '{')) AS has_brace,
         |   bool_or(contains(line, 'lorem ipsum')) AS has_lorem
         |  FROM k GROUP BY doc_id)
         |SELECT doc_id, n_lines, n_kept,
         |  (n_kept >= $C4MinLines AND NOT has_brace AND NOT has_lorem)
         |    AS kept_doc,
         |  CASE WHEN n_kept >= $C4MinLines AND NOT has_brace
         |      AND NOT has_lorem
         |    THEN coalesce(joined, '') ELSE NULL END AS cleaned
         |FROM g ORDER BY doc_id""".stripMargin,

    "x67_gopher_rep" -> x67Sql,

    "x68_massivetext" -> x68Sql,

    // x69: the cyclic twin replayed, spans fingerprinted with the SAME
    // md5 the engine shuffles (nothing to drift), first-occurrence rank
    // by (doc_id, start), coverage union excision
    "x69_c4_spandedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |l AS (SELECT doc_id, i,
         |   array_to_string(ts[(j*$C4Width+1):(j*$C4Width+$C4Width)], ' ')
         |     AS line
         |  FROM (SELECT doc_id, ts, i,
         |     CASE WHEN doc_id % 2 = 0 THEN i % 5 ELSE i END AS j
         |    FROM t, LATERAL unnest(generate_series(0,
         |      (len(ts) + ${C4Width - 1}) // $C4Width - 1)) AS u(i))),
         |lw AS (SELECT doc_id, list(line ORDER BY i) AS ls FROM l
         |  GROUP BY doc_id),
         |sp AS (SELECT doc_id, i AS start,
         |   md5(array_to_string(ls[i:i+2], chr(10))) AS d
         |  FROM lw, LATERAL unnest(generate_series(1, len(ls) - 2))
         |    AS u(i)),
         |rk AS (SELECT doc_id, start,
         |   row_number() OVER (PARTITION BY d ORDER BY doc_id, start)
         |     AS rn FROM sp),
         |cov AS (SELECT DISTINCT rk.doc_id, v.pos FROM rk,
         |  LATERAL unnest(generate_series(rk.start, rk.start + 2))
         |    AS v(pos)
         |  WHERE rk.rn > 1),
         |ln AS (SELECT doc_id, i + 1 AS j, line FROM l)
         |SELECT ln.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN cov.pos IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN cov.pos IS NULL THEN line END,
         |    chr(10) ORDER BY j), '') AS deduped
         |FROM ln LEFT JOIN cov ON cov.doc_id = ln.doc_id
         |  AND cov.pos = ln.j
         |GROUP BY ln.doc_id ORDER BY ln.doc_id""".stripMargin,

    // x70: the NAIVE per-shard global window (the engine's two-pass
    // prefix-group decomposition proven equal by the hash gate — x48
    // discipline); shard from the same 2-hex md5 prefix
    "x70_epoch_shuffle" ->
      s"""WITH b AS (SELECT doc_id,
         |   md5(CAST(doc_id AS VARCHAR) || '$EpochSeed') AS h
         |  FROM documents),
         |s AS (SELECT doc_id, h,
         |   CAST(('0x' || substring(h, 1, 2))::BIGINT % $EpochShards
         |     AS INTEGER) AS shard
         |  FROM b)
         |SELECT doc_id, shard,
         |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id)
         |    - 1 AS BIGINT) AS pos
         |FROM s ORDER BY doc_id""".stripMargin,

    // x71: x2's brute-force cosine replay with the label-mismatch
    // predicate on the same join
    "x71_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings),
         |n AS (SELECT vec_id, label, q, list_dot_product(q, q) AS n2 FROM e),
         |scored AS (SELECT qs.vec_id AS qid, c.vec_id AS cid,
         |  c.label AS clabel,
         |  round(list_dot_product(qs.q, c.q) / (sqrt(qs.n2) * sqrt(c.n2)), 6)
         |    AS sim
         |  FROM n qs JOIN n c ON c.vec_id != qs.vec_id
         |    AND c.label != qs.label
         |  WHERE qs.vec_id < $NumQueries),
         |ranked AS (SELECT qid, cid, clabel, sim,
         |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
         |    AS INTEGER) AS rank
         |  FROM scored)
         |SELECT qid, cid, clabel, rank, sim FROM ranked
         |WHERE rank <= $TopK ORDER BY qid, rank""".stripMargin,

    // x72: the code-twin synthesis replayed, each signal relationally
    // (explode lines/words, group back), identical integer ppm cuts
    "x72_code_detect" -> x72Sql,

    // x73: the script twin replayed with the SAME literal-range
    // patterns and phrases (identical bytes, no escape-syntax seam);
    // codepoint strip-and-diff counts, alphabetical-tie dominant
    "x73_script_mix" -> x73Sql,

    // x66: the waterfilling allocation replayed over the language table
    // (naive single-window form), shared by both x66 queries
    "x66_unimax_alloc" ->
      s"""WITH $uniMaxAllocCte
         |SELECT lang, ct AS lang_tokens, (i <= k) AS capped,
         |  CAST(alloc AS BIGINT) AS alloc_tokens
         |FROM a ORDER BY lang""".stripMargin,

    // x66: per-document repeats — the oracle's admission window is the
    // NAIVE per-language global prefix sum (x48/x57 discipline: the
    // hash gate proves the engine's two-pass decomposition equal)
    "x66_unimax" ->
      s"""WITH $uniMaxAllocCte,
         |e AS (SELECT lang, alloc // ct AS e_full, alloc % ct AS part
         |  FROM a),
         |d AS (SELECT doc_id, lang,
         |   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         |   md5(CAST(doc_id AS VARCHAR) || '$UniMaxSeed') AS h
         |  FROM documents),
         |cb AS (SELECT doc_id, lang, n_tokens,
         |   CAST(coalesce(sum(n_tokens) OVER (PARTITION BY lang
         |     ORDER BY h, doc_id
         |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |     AS BIGINT) AS cum_before
         |  FROM d)
         |SELECT cb.doc_id, cb.lang, cb.n_tokens, cb.cum_before,
         |  CAST(e.e_full + (CASE WHEN cb.cum_before < e.part
         |    THEN 1 ELSE 0 END) AS BIGINT) AS repeats
         |FROM cb JOIN e USING (lang)
         |WHERE e.e_full + (CASE WHEN cb.cum_before < e.part
         |  THEN 1 ELSE 0 END) > 0
         |ORDER BY doc_id""".stripMargin,

    // x65: the Gopher paged-twin synthesis replayed, then each rule as
    // the same integer cross-multiplication over unnested words/lines
    "x65_gopher_rules" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |l AS (SELECT doc_id, i,
         |    array_to_string(ts[(i*$C4Width+1):(i*$C4Width+$C4Width)], ' ')
         |      AS chunk
         |  FROM t, LATERAL unnest(generate_series(0,
         |    (len(ts) + ${C4Width - 1}) // $C4Width - 1)) AS u(i)),
         |d AS (SELECT doc_id, i,
         |   (CASE WHEN (doc_id + i) % 11 = 0 THEN '- ' ELSE '' END)
         |   || chunk
         |   || (CASE WHEN doc_id % 3 <> 0 AND i = 0 THEN ' of and that'
         |       ELSE '' END)
         |   || (CASE WHEN (doc_id + i) % 6 = 0 THEN ' # #' ELSE '' END)
         |   || (CASE WHEN (doc_id + i) % 9 = 0 THEN ' 12345' ELSE '' END)
         |   || (CASE WHEN (doc_id + i) % 4 = 3 THEN '...' ELSE '.' END)
         |     AS line
         |  FROM l),
         |p AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS page
         |  FROM d GROUP BY doc_id),
         |wx AS (SELECT doc_id, w
         |  FROM p, LATERAL unnest(string_split(replace(page, chr(10), ' '),
         |    ' ')) AS u(w) WHERE length(w) > 0),
         |wm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
         |   CAST(sum(length(w)) AS BIGINT) AS sum_len,
         |   CAST(sum(CASE WHEN regexp_matches(w, '[a-z]') THEN 1 ELSE 0
         |     END) AS BIGINT) AS n_alpha,
         |   CAST(count(DISTINCT CASE WHEN w IN ('the','be','to','of',
         |     'and','that','have','with') THEN w END) AS BIGINT) AS n_stop
         |  FROM wx GROUP BY doc_id),
         |lm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
         |   CAST(sum(CASE WHEN line LIKE '- %' OR line LIKE '• %'
         |     THEN 1 ELSE 0 END) AS BIGINT) AS n_bullet,
         |   CAST(sum(CASE WHEN line LIKE '%...' THEN 1 ELSE 0 END)
         |     AS BIGINT) AS n_ell
         |  FROM d GROUP BY doc_id),
         |pm AS (SELECT doc_id,
         |   CAST(length(page) - length(replace(page, '#', '')) AS BIGINT)
         |     AS n_hash,
         |   CAST((length(page) - length(replace(page, '...', ''))) // 3
         |     AS BIGINT) AS n_ell_occ
         |  FROM p)
         |SELECT doc_id, n_lines, n_words,
         |  (n_words BETWEEN 50 AND 100000) AS g_words,
         |  (3 * n_words <= sum_len AND sum_len <= 10 * n_words) AS g_meanlen,
         |  (10 * (n_hash + n_ell_occ) <= n_words) AS g_symbol,
         |  (10 * n_bullet <= n_lines) AS g_bullet,
         |  (10 * n_ell <= 3 * n_lines) AS g_ellipsis,
         |  (10 * n_alpha >= 8 * n_words) AS g_alpha,
         |  (n_stop >= 2) AS g_stop,
         |  ((n_words BETWEEN 50 AND 100000)
         |   AND 3 * n_words <= sum_len AND sum_len <= 10 * n_words
         |   AND 10 * (n_hash + n_ell_occ) <= n_words
         |   AND 10 * n_bullet <= n_lines
         |   AND 10 * n_ell <= 3 * n_lines
         |   AND 10 * n_alpha >= 8 * n_words
         |   AND n_stop >= 2) AS kept_doc
         |FROM wm JOIN lm USING (doc_id) JOIN pm USING (doc_id)
         |ORDER BY doc_id""".stripMargin,

    // tertile thresholds over the train slice of the embedded x52
    // pipeline, value-based bucket assignment — integer-exact cut ranks
    "x56_ppl_buckets" ->
      s"""WITH k AS (SELECT doc_id, avg_p_fix FROM ($knLmSql)),
         |spb AS (SELECT doc_id,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
         |    < '${Sample.threshold(SplitTrain)}' THEN 'train' ELSE 'other' END AS split
         |  FROM documents),
         |rsc AS (SELECT k.doc_id, k.avg_p_fix FROM k
         |  JOIN spb ON spb.doc_id = k.doc_id WHERE spb.split = 'train'),
         |rk AS (SELECT doc_id, avg_p_fix,
         |  row_number() OVER (ORDER BY avg_p_fix DESC, doc_id) AS r,
         |  count(*) OVER () AS n FROM rsc),
         |th AS (SELECT
         |  max(CASE WHEN r = (n + 2) // 3 THEN avg_p_fix END) AS t1,
         |  max(CASE WHEN r = (2 * n + 2) // 3 THEN avg_p_fix END) AS t2
         |  FROM rk)
         |SELECT k.doc_id, k.avg_p_fix,
         |  CASE WHEN k.avg_p_fix >= th.t1 THEN 'head'
         |       WHEN k.avg_p_fix >= th.t2 THEN 'middle'
         |       ELSE 'tail' END AS bucket
         |FROM k CROSS JOIN th ORDER BY k.doc_id""".stripMargin,

    // the NAIVE global-prefix-sum spec of x57 — the engine's two-pass
    // grouped decomposition must reproduce it row for row
    "x57_token_budget" ->
      s"""WITH b AS (SELECT doc_id,
         |  md5(CAST(doc_id AS VARCHAR) || '$TokenBudgetSeed') AS h,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT doc_id, n_tokens,
         |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |    AS cum_before
         |  FROM b)
         |SELECT doc_id, n_tokens, cum_before FROM c
         |WHERE cum_before < $TokenBudget ORDER BY doc_id""".stripMargin,

    "x53_html_extract" -> htmlExtractOracle,

    "x54_bpe_encode" ->
      s"""WITH $bpeAllRounds,
         |enc AS (SELECT word, string_split(s[2:], chr(31)) AS toks
         |  FROM w$BpeIters),
         |t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |dt AS (SELECT doc_id, i AS p, ts[i] AS word
         |  FROM t, LATERAL unnest(generate_series(1, len(ts))) AS u(i)
         |  WHERE length(ts[i]) > 0),
         |j AS (SELECT dt.doc_id, dt.p, enc.toks FROM dt JOIN enc USING (word))
         |SELECT doc_id, CAST(sum(len(toks)) AS BIGINT) AS n_tokens,
         |  string_agg(array_to_string(toks, ' '), ' ' ORDER BY p) AS encoded
         |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x1_exact_dedup" ->
      """SELECT md5(props) AS digest, min(event_id) AS keep_id,
        |  CAST(count(*) AS BIGINT) AS dups
        |FROM events GROUP BY 1 ORDER BY keep_id""".stripMargin,

    "x1_jaccard_pairs" ->
      s"""WITH $ShingleCte,
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2)
         |SELECT d1, d2, jac FROM j WHERE jac >= $JaccardThreshold
         |ORDER BY d1, d2""".stripMargin,

    "x1_minhash_lsh" ->
      s"""WITH $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2)
         |SELECT d1, d2, jac FROM j WHERE jac >= $JaccardThreshold
         |ORDER BY d1, d2""".stripMargin,

    "x1_simhash" ->
      s"""WITH $ShingleCte,
         |hh AS (SELECT doc_id, md5(s) AS h FROM sh),
         |votes AS (SELECT doc_id, $simhashVotes FROM hh GROUP BY doc_id)
         |SELECT doc_id, CAST($simhashAssemble AS BIGINT) AS simhash
         |FROM votes ORDER BY doc_id""".stripMargin,

    "x1_embedding_dup" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings),
         |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
         |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
         |  round(list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)), 6) AS sim
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id)
         |SELECT d1, d2, sim FROM p WHERE sim >= $EmbDupThreshold
         |ORDER BY d1, d2""".stripMargin,

    "x1_embedding_dup_bucket" ->
      s"""WITH e AS (SELECT vec_id, embedding,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings),
         |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2,
         |  ${signBucketSql("embedding", 6)} AS bucket FROM e),
         |p AS (SELECT a.vec_id AS d1, b.vec_id AS d2,
         |  round(list_dot_product(a.q, b.q) / (sqrt(a.n2) * sqrt(b.n2)), 6) AS sim
         |  FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT d1, d2, sim FROM p WHERE sim >= $EmbDupThreshold
         |ORDER BY d1, d2""".stripMargin,

    "x2_cosine_topk" -> cosineTopkSql,

    "x2_ann_lsh" -> annLshSql,

    "x3_text_stats" -> {
      val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
         |  string_split(text, ' ') AS ts FROM documents)
         |SELECT doc_id, n_chars,
         |  CAST(len(ts) AS INTEGER) AS n_tokens,
         |  CAST(len(list_distinct(ts)) AS INTEGER) AS n_distinct,
         |  round(CAST(list_sum(list_transform(ts, x -> length(x))) AS DOUBLE) / len(ts), 6) AS avg_tok_len,
         |  round(CAST(len(list_filter(ts, x -> list_contains($stop, x))) AS DOUBLE) / len(ts), 6) AS stopword_ratio,
         |  round(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS quality
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "x3_lang_id" -> {
      val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sc AS (SELECT doc_id,
         |  round(CAST(len(list_filter(ts, x -> list_contains($stop, x))) AS DOUBLE) / len(ts), 6) AS en_score
         |  FROM t)
         |SELECT doc_id, en_score,
         |  CASE WHEN en_score >= 0.05 THEN 'en' ELSE 'other' END AS predicted_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    "x3_token_count" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents)
        |SELECT doc_id, CAST(len(ts) AS INTEGER) AS n_words,
        |  CAST(list_sum(list_transform(ts, x -> ceil(length(x) / 4.0))) AS BIGINT) AS n_bpe_tokens
        |FROM t ORDER BY doc_id""".stripMargin,

    "x3_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp, substring(md5(text), 1, 16) AS fp16
        |FROM documents ORDER BY doc_id""".stripMargin,

    // relational twin of the row-local fold: count per (doc, bigram), then
    // max/sum/count per doc — same numbers, explode+shuffle price
    "x3_repetition" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
        |  i -> ts[i] || ' ' || ts[i+1])) AS s FROM t),
        |c AS (SELECT doc_id, s, count(*) AS cnt FROM g GROUP BY 1, 2),
        |a AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_ngrams,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(max(cnt) AS BIGINT) AS top_ngram_count
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_ngrams, n_distinct, top_ngram_count,
        |  round(CAST(top_ngram_count AS DOUBLE) / n_ngrams, 6) AS top_ngram_ratio,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_ngrams, 6) AS dup_ngram_ratio
        |FROM a WHERE n_ngrams > 0 ORDER BY doc_id""".stripMargin,

    "x4_media_stats" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes, md5(text) AS digest,
        |  'application/octet-stream' AS mime,
        |  doc_id % 640 AS width, doc_id * 7 % 480 AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x4_ppm_decode" ->
      """SELECT doc_id,
        |  CAST(doc_id % 8 + 1 AS INTEGER) AS width,
        |  CAST(doc_id % 5 + 1 AS INTEGER) AS height,
        |  CAST(255 AS INTEGER) AS maxval,
        |  CAST((doc_id % 8 + 1) * (doc_id % 5 + 1) * 3 AS INTEGER) AS n_pixel_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x4_wav_decode" ->
      """WITH w AS (SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
        |  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
        |       ELSE 44100 END AS INTEGER) AS sample_rate,
        |  CAST(16 AS INTEGER) AS bits,
        |  CAST(doc_id % 50 + 1 AS BIGINT) AS n_samples
        |  FROM documents)
        |SELECT doc_id, channels, sample_rate, bits, n_samples,
        |  CAST(n_samples * 1000000 // sample_rate AS BIGINT) AS duration_us
        |FROM w ORDER BY doc_id""".stripMargin,

    "x5_sessionize" ->
      """WITH s AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |l AS (SELECT *, lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pus
        |  FROM s),
        |q AS (SELECT *, sum(CASE WHEN pus IS NULL OR us - pus > 1800000000 THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING)
        |    AS session_seq FROM l)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        |  count(*) AS n_events, min(t) AS start_ts, max(t) AS end_ts,
        |  CAST(max(us) - min(us) AS BIGINT) AS duration_us
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x6_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
         |  CASE WHEN lang = 'en' THEN '${Sample.threshold(0.05)}'
         |       ELSE '${Sample.threshold(0.2)}' END
         |ORDER BY doc_id""".stripMargin,

    "x23_weighted_sample" -> {
      val frac = math.floor(0.3 * 4294967296.0).toLong
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || 'w'), 1, 8))::BIGINT
         |    * 600 < $frac * least(n_chars, 600)
         |ORDER BY doc_id""".stripMargin
    },

    "x7_normalize_scrub" -> {
      val aug = "text || ' contact user' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com via http://ex.example/' || CAST(doc_id AS VARCHAR) || ' ok'"
      s"""SELECT doc_id,
         |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
         |    ' +', ' ', 'g')) AS normalized,
         |  regexp_replace(regexp_replace($aug,
         |    '${TextAnalysis.UrlPattern}', '<URL>', 'g'),
         |    '${TextAnalysis.EmailPattern}', '<EMAIL>', 'g') AS scrubbed
         |FROM documents ORDER BY doc_id""".stripMargin
    },

    "x8_vocab_topk" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |SELECT token, count(*) AS n FROM t
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 100""".stripMargin,

    "x9_components" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |e AS (SELECT d1 AS a, d2 AS b FROM p UNION ALL SELECT d2 AS a, d1 AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS nd FROM e),
         |r(nd, m) AS (SELECT nd, nd FROM nodes
         |  UNION SELECT r.nd, e.b FROM r JOIN e ON r.m = e.a)
         |SELECT nd AS doc_id, min(m) AS component FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    // the x9 pipeline up to the verified pair list (no closure needed:
    // participation is membership in ANY pair), source-grain fold
    "x139_source_dup_rate" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |m AS (SELECT DISTINCT doc_id FROM (SELECT d1 AS doc_id FROM p
         |  UNION ALL SELECT d2 AS doc_id FROM p))
         |SELECT d.source AS src, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(m.doc_id) AS BIGINT) AS n_dup_docs,
         |  CAST(CAST(count(m.doc_id) AS HUGEINT) * 1000000 // count(*)
         |    AS BIGINT) AS dup_ppm
         |FROM documents d LEFT JOIN m ON m.doc_id = d.doc_id
         |WHERE d.source IS NOT NULL
         |GROUP BY 1 ORDER BY src""".stripMargin,

    // the x9 pipeline up to the pair list, each pair attributed to the
    // unordered source pair of its members (null-source members drop)
    "x140_cross_dup_matrix" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |sp AS (SELECT da.source AS s1, db.source AS s2
         |  FROM p JOIN documents da ON da.doc_id = p.d1
         |  JOIN documents db ON db.doc_id = p.d2
         |  WHERE da.source IS NOT NULL AND db.source IS NOT NULL)
         |SELECT least(s1, s2) AS src_a, greatest(s1, s2) AS src_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM sp GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    // the x9 component closure folded to a size-grain histogram; the
    // singleton row is corpus count minus member count
    "x141_cluster_histogram" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |e AS (SELECT d1 AS a, d2 AS b FROM p UNION ALL SELECT d2 AS a, d1 AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS nd FROM e),
         |r(nd, m) AS (SELECT nd, nd FROM nodes
         |  UNION SELECT r.nd, e.b FROM r JOIN e ON r.m = e.a),
         |comp AS (SELECT nd AS doc_id, min(m) AS component FROM r GROUP BY 1),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM comp GROUP BY 1),
         |multi AS (SELECT cluster_size,
         |   CAST(count(*) AS BIGINT) AS n_clusters,
         |   CAST(sum(cluster_size) AS BIGINT) AS n_docs
         |  FROM sz GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
         |mem AS (SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT)
         |   AS members FROM sz),
         |uni AS (SELECT * FROM multi UNION ALL
         |  SELECT CAST(1 AS BIGINT), total - members, total - members
         |  FROM tot CROSS JOIN mem WHERE total - members > 0)
         |SELECT cluster_size, n_clusters, n_docs,
         |  CAST(CAST(n_docs AS HUGEINT) * 1000000 // total AS BIGINT)
         |    AS docs_ppm
         |FROM uni CROSS JOIN tot ORDER BY cluster_size""".stripMargin,

    // the x133 sig CTE with per-rule counting lanes; null-signal rows
    // (null text) count in n_docs and n_failed but no specific rule
    "x144_gate_attribution" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |   string_split(text, ' ') AS ts FROM documents
         |   WHERE source IS NOT NULL),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM t),
         |sig AS (SELECT t.doc_id, t.source,
         |  round(CAST(len(list_distinct(t.ts)) AS DOUBLE) / len(t.ts), 6)
         |    AS quality,
         |  len(sh.g) AS n_ngrams,
         |  round(1.0 - CAST(len(list_distinct(sh.g)) AS DOUBLE) / len(sh.g), 6)
         |    AS dup_ngram_ratio
         |  FROM t JOIN sh ON sh.doc_id = t.doc_id)
         |SELECT source AS src, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE n_ngrams = 0) AS BIGINT)
         |    AS n_too_short,
         |  CAST(count(*) FILTER (WHERE n_ngrams > 0
         |    AND quality < $CurateQualityMin) AS BIGINT) AS n_low_quality,
         |  CAST(count(*) FILTER (WHERE n_ngrams > 0
         |    AND dup_ngram_ratio > $CurateDupMax) AS BIGINT)
         |    AS n_repetitive,
         |  CAST(count(*) - count(*) FILTER (WHERE n_ngrams > 0
         |    AND quality >= $CurateQualityMin
         |    AND dup_ngram_ratio <= $CurateDupMax) AS BIGINT) AS n_failed,
         |  CAST(CAST(count(*) - count(*) FILTER (WHERE n_ngrams > 0
         |     AND quality >= $CurateQualityMin
         |     AND dup_ngram_ratio <= $CurateDupMax) AS HUGEINT)
         |    * 1000000 // count(*) AS BIGINT) AS fail_ppm
         |FROM sig GROUP BY 1 ORDER BY src""".stripMargin,

    // the fingerprint group sizes folded exactly like x141's component
    // sizes; singletons (including null-text docs) from corpus minus
    // members
    "x146_exact_histogram" ->
      s"""WITH fp AS (SELECT
         |   md5(trim(regexp_replace(regexp_replace(lower(text),
         |     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS f
         |  FROM documents WHERE text IS NOT NULL),
         |sz AS (SELECT f, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM fp GROUP BY 1 HAVING count(*) > 1),
         |multi AS (SELECT cluster_size,
         |   CAST(count(*) AS BIGINT) AS n_clusters,
         |   CAST(sum(cluster_size) AS BIGINT) AS n_docs
         |  FROM sz GROUP BY 1),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM documents),
         |mem AS (SELECT CAST(coalesce(sum(cluster_size), 0) AS BIGINT)
         |   AS members FROM sz),
         |uni AS (SELECT * FROM multi UNION ALL
         |  SELECT CAST(1 AS BIGINT), total - members, total - members
         |  FROM tot CROSS JOIN mem WHERE total - members > 0)
         |SELECT cluster_size, n_clusters, n_docs,
         |  CAST(CAST(n_docs AS HUGEINT) * 1000000 // total AS BIGINT)
         |    AS docs_ppm
         |FROM uni CROSS JOIN tot ORDER BY cluster_size""".stripMargin,

    // the x9 pair list's member-id union against the normalized-
    // fingerprint exact groups — one overlap row
    "x145_tier_overlap" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |m AS (SELECT DISTINCT doc_id FROM (SELECT d1 AS doc_id FROM p
         |  UNION ALL SELECT d2 AS doc_id FROM p)),
         |fp AS (SELECT doc_id,
         |   md5(trim(regexp_replace(regexp_replace(lower(text),
         |     '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS f
         |  FROM documents WHERE text IS NOT NULL),
         |g AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 1),
         |ex AS (SELECT fp.doc_id FROM fp JOIN g USING (f)),
         |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |   CAST(count(ex.doc_id) AS BIGINT) AS n_exact,
         |   CAST(count(m.doc_id) AS BIGINT) AS n_near,
         |   CAST(count(CASE WHEN ex.doc_id IS NOT NULL
         |     AND m.doc_id IS NOT NULL THEN 1 END) AS BIGINT) AS n_both
         |  FROM documents d
         |  LEFT JOIN ex ON ex.doc_id = d.doc_id
         |  LEFT JOIN m ON m.doc_id = d.doc_id)
         |SELECT n_docs, n_exact, n_near, n_both,
         |  n_exact - n_both AS n_exact_only,
         |  n_near - n_both AS n_near_only,
         |  CASE WHEN n_near = 0 THEN CAST(0 AS BIGINT)
         |  ELSE CAST(CAST(n_both AS HUGEINT) * 1000000 // n_near
         |    AS BIGINT) END AS exact_covers_near_ppm
         |FROM agg""".stripMargin,

    // x150: x145's full MinHash pair pipeline for the member set, the
    // x133 signal lanes for the gate (null text fails closed — DuckDB
    // null-division and Spark null-AND both coalesce to false)
    "x150_dup_gate_joint" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |jp AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM jp WHERE jac >= $JaccardThreshold),
         |m AS (SELECT DISTINCT doc_id FROM (SELECT d1 AS doc_id FROM p
         |  UNION ALL SELECT d2 AS doc_id FROM p)),
         |tok AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |bg AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM tok),
         |gate AS (SELECT tok.doc_id,
         |  coalesce(len(bg.g) > 0
         |    AND round(CAST(len(list_distinct(tok.ts)) AS DOUBLE)
         |      / len(tok.ts), 6) >= $CurateQualityMin
         |    AND round(1.0 - CAST(len(list_distinct(bg.g)) AS DOUBLE)
         |      / len(bg.g), 6) <= $CurateDupMax, false) AS passed
         |  FROM tok JOIN bg ON bg.doc_id = tok.doc_id),
         |cells AS (SELECT m.doc_id IS NOT NULL AS is_dup, passed,
         |   CAST(count(*) AS BIGINT) AS n_docs
         |  FROM gate LEFT JOIN m ON m.doc_id = gate.doc_id GROUP BY 1, 2),
         |tot AS (SELECT sum(n_docs) AS t FROM cells)
         |SELECT is_dup, passed, n_docs,
         |  CAST(CAST(n_docs AS HUGEINT) * 1000000 // t AS BIGINT)
         |    AS share_ppm
         |FROM cells CROSS JOIN tot ORDER BY is_dup, passed""".stripMargin,

    // the x9 pair list bucketed by its own rounded jac lane; the
    // cumulative window runs over <= 101 bucket rows
    "x143_pair_histogram" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2, jac FROM j WHERE jac >= $JaccardThreshold),
         |h AS (SELECT CAST(round(jac * 1000000) AS BIGINT) // 10000
         |     AS jac_centi,
         |   CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM p GROUP BY 1)
         |SELECT jac_centi, n_pairs,
         |  CAST(sum(n_pairs) OVER (ORDER BY jac_centi DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS BIGINT) AS n_at_or_above
         |FROM h ORDER BY jac_centi""".stripMargin,

    // the x9 keep-one rule priced in whitespace tokens, source grain
    "x142_dedup_savings" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |e AS (SELECT d1 AS a, d2 AS b FROM p UNION ALL SELECT d2 AS a, d1 AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS nd FROM e),
         |r(nd, m) AS (SELECT nd, nd FROM nodes
         |  UNION SELECT r.nd, e.b FROM r JOIN e ON r.m = e.a),
         |comp AS (SELECT nd AS doc_id, min(m) AS component FROM r GROUP BY 1),
         |canon AS (SELECT component, min(doc_id) AS keep
         |  FROM comp GROUP BY 1),
         |rm AS (SELECT comp.doc_id FROM comp JOIN canon USING (component)
         |  WHERE comp.doc_id <> canon.keep),
         |d AS (SELECT doc_id, source AS src,
         |   CAST(coalesce(len(string_split(text, ' ')), 0) AS BIGINT)
         |     AS toks
         |  FROM documents WHERE source IS NOT NULL)
         |SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(rm.doc_id) AS BIGINT) AS n_removed,
         |  CAST(sum(toks) AS BIGINT) AS tokens_total,
         |  CAST(coalesce(sum(toks)
         |     FILTER (WHERE rm.doc_id IS NOT NULL), 0) AS BIGINT)
         |    AS tokens_removed,
         |  CASE WHEN sum(toks) = 0 THEN CAST(0 AS BIGINT)
         |  ELSE CAST(CAST(coalesce(sum(toks)
         |       FILTER (WHERE rm.doc_id IS NOT NULL), 0) AS HUGEINT)
         |     * 1000000 // sum(toks) AS BIGINT) END AS savings_ppm
         |FROM d LEFT JOIN rm ON rm.doc_id = d.doc_id
         |GROUP BY 1 ORDER BY src""".stripMargin,

    // same recursive closure as x9_components, folded to cluster sizes
    // and joined dense onto the corpus — singletons weight 10^6
    "x135_soft_dedup" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |e AS (SELECT d1 AS a, d2 AS b FROM p UNION ALL SELECT d2 AS a, d1 AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS nd FROM e),
         |r(nd, m) AS (SELECT nd, nd FROM nodes
         |  UNION SELECT r.nd, e.b FROM r JOIN e ON r.m = e.a),
         |comp AS (SELECT nd AS doc_id, min(m) AS component FROM r GROUP BY 1),
         |sz AS (SELECT component, CAST(count(*) AS BIGINT) AS n_members
         |  FROM comp GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(sz.n_members, CAST(1 AS BIGINT)) AS n_members,
         |  CAST(1000000 // coalesce(sz.n_members, CAST(1 AS BIGINT))
         |    AS BIGINT) AS weight_ppm
         |FROM documents d
         |LEFT JOIN comp ON comp.doc_id = d.doc_id
         |LEFT JOIN sz ON sz.component = comp.component
         |ORDER BY d.doc_id""".stripMargin,

    // same recursive closure as x9_components, extended with the quality
    // ranking (quality = the x3_text_stats type-token ratio)
    "x9_canonical" ->
      s"""WITH RECURSIVE $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |e AS (SELECT d1 AS a, d2 AS b FROM p UNION ALL SELECT d2 AS a, d1 AS b FROM p),
         |nodes AS (SELECT DISTINCT a AS nd FROM e),
         |r(nd, m) AS (SELECT nd, nd FROM nodes
         |  UNION SELECT r.nd, e.b FROM r JOIN e ON r.m = e.a),
         |comp AS (SELECT nd AS doc_id, min(m) AS component FROM r GROUP BY 1),
         |qual AS (SELECT doc_id,
         |  round(CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS quality FROM t),
         |ranked AS (SELECT c.component, c.doc_id,
         |  row_number() OVER (PARTITION BY c.component
         |    ORDER BY q.quality DESC, c.doc_id) AS rn
         |  FROM comp c JOIN qual q ON q.doc_id = c.doc_id)
         |SELECT k.component, k.doc_id AS keep_id, s.n_members
         |FROM (SELECT component, doc_id FROM ranked WHERE rn = 1) k
         |JOIN (SELECT component, CAST(count(*) AS BIGINT) AS n_members
         |  FROM comp GROUP BY 1) s ON s.component = k.component
         |ORDER BY k.component""".stripMargin,

    "x14_asof_join" ->
      """WITH w AS (SELECT event_id, user_id, event_type,
        |  CAST(ts AS TIMESTAMP) AS ts,
        |  max(CASE WHEN event_type = 'view' THEN CAST(ts AS TIMESTAMP) END)
        |    OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |          ROWS UNBOUNDED PRECEDING) AS asof_ts
        |  FROM events)
        |SELECT event_id, user_id, ts, asof_ts,
        |  CAST(date_diff('microseconds', asof_ts, ts) AS BIGINT) AS asof_lag_us
        |FROM w WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "x11_salted_agg" ->
      """SELECT event_type,
        |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "x13_contamination" -> {
      val gram8 = (0 until 8).map(k => s"ts[i+$k]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sh8 AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(generate_series(1, len(ts) - 7), i -> $gram8)) AS s
         |  FROM t),
         |ev AS (SELECT doc_id AS eval_id, s AS es FROM sh8
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8)
         |    < '${Sample.threshold(0.1)}')
         |SELECT doc_id, CAST(count(DISTINCT eval_id) AS BIGINT) AS n_eval_matches
         |FROM sh8 JOIN ev ON s = es AND doc_id != eval_id
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },

    "x12_quantiles" ->
      """SELECT lang,
        |  round(quantile_cont(n_chars, 0.25), 6) AS p25,
        |  round(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  round(quantile_cont(n_chars, 0.75), 6) AS p75,
        |  count(*) AS n
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "x10_label_centroid" ->
      """WITH e AS (SELECT label,
        |  list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings)
        |SELECT label, i AS pos, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(q[i]) AS BIGINT) AS s,
        |  round(CAST(sum(q[i]) AS DOUBLE) / count(*), 6) AS centroid
        |FROM e, range(1, 65) t(i) GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "x15_split_assign" ->
      s"""SELECT doc_id, lang,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
         |         < '${Sample.threshold(SplitTrain)}' THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
         |         < '${Sample.threshold(SplitTrain + SplitValid)}' THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM documents ORDER BY doc_id""".stripMargin,

    // the oracle runs the NAIVE one-phase form — the two-phase Spark
    // operator is exact by construction (prefilter keeps a prefix of the
    // hash order; the guard re-ranks any short domain in full)
    "x16_domain_quota" ->
      s"""WITH h AS (SELECT doc_id, source,
         |  substring(md5(CAST(doc_id AS VARCHAR) || '$QuotaSeed'), 1, 8) AS hh
         |  FROM documents),
         |r AS (SELECT doc_id, source,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY hh, doc_id)
         |    AS BIGINT) AS rnk FROM h)
         |SELECT doc_id, source, rnk FROM r WHERE rnk <= $QuotaPerDomain
         |ORDER BY source, rnk""".stripMargin,

    "x17_seq_pack" ->
      s"""WITH b AS (SELECT doc_id, doc_id % $PackShards AS shard,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
         |  FROM b)
         |SELECT doc_id, shard, n_tokens, tok_end - n_tokens AS tok_start,
         |  (tok_end - n_tokens) // $PackChunkTokens AS chunk_first,
         |  (tok_end - 1) // $PackChunkTokens AS chunk_last,
         |  ((tok_end - 1) // $PackChunkTokens)
         |    - ((tok_end - n_tokens) // $PackChunkTokens) + 1 AS n_chunks
         |FROM c ORDER BY doc_id""".stripMargin,

    "x18_range_join" ->
      s"""SELECT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id,
         |  CAST(date_diff('microseconds', CAST(v.ts AS TIMESTAMP),
         |    CAST(p.ts AS TIMESTAMP)) AS BIGINT) AS lag_us
         |FROM events v JOIN events p ON v.user_id = p.user_id
         |  AND v.event_type = 'view' AND p.event_type = 'purchase'
         |  AND CAST(p.ts AS TIMESTAMP) >= CAST(v.ts AS TIMESTAMP)
         |  AND date_diff('microseconds', CAST(v.ts AS TIMESTAMP),
         |    CAST(p.ts AS TIMESTAMP)) <= $RangeJoinWindowUs
         |ORDER BY view_id, purchase_id""".stripMargin,

    "x19_distinct_tokens" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS token
        |  FROM documents)
        |SELECT lang, CAST(count(DISTINCT token) AS BIGINT) AS n_distinct,
        |  CAST(count(*) AS BIGINT) AS n_tokens
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,

    "x22_curation_pipeline" ->
      s"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ts
         |  FROM documents),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM t),
         |sig AS (SELECT t.doc_id, t.lang,
         |  round(CAST(len(list_distinct(t.ts)) AS DOUBLE) / len(t.ts), 6) AS quality,
         |  len(sh.g) AS n_ngrams,
         |  round(1.0 - CAST(len(list_distinct(sh.g)) AS DOUBLE) / len(sh.g), 6)
         |    AS dup_ngram_ratio,
         |  md5(trim(regexp_replace(regexp_replace(lower(t.text),
         |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
         |  FROM t JOIN sh ON sh.doc_id = t.doc_id),
         |gated AS (SELECT * FROM sig WHERE n_ngrams > 0
         |  AND quality >= $CurateQualityMin AND dup_ngram_ratio <= $CurateDupMax),
         |dedup AS (SELECT * FROM (SELECT *,
         |  row_number() OVER (PARTITION BY norm_fp ORDER BY doc_id) AS rn
         |  FROM gated) WHERE rn = 1)
         |SELECT doc_id, lang, quality,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
         |         < '${Sample.threshold(SplitTrain)}' THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
         |         < '${Sample.threshold(SplitTrain + SplitValid)}' THEN 'valid'
         |       ELSE 'test' END AS split
         |FROM dedup ORDER BY doc_id""".stripMargin,

    // X116: every stage replayed naively — eval slice, gate signals,
    // fingerprint window, the FULL x1 minhash/band/verify chain over
    // survivors, the 8-gram decon join, the naive quota window, the
    // split CASE, the pack running sum — then the same one-verdict-
    // per-doc ledger. The engine's pins and two-phase forms must be
    // invisible here; that is the composition proof.
    "x116_e2e_pipeline" -> {
      val gram8 = (0 until 8).map(k => s"ts[i+$k]").mkString(" || ' ' || ")
      s"""WITH t0 AS (SELECT doc_id, lang, source, text FROM documents
         |  UNION ALL SELECT doc_id + $E2eCloneOffset, lang, source, text
         |  FROM documents WHERE doc_id % 11 = 0),
         |ev AS (SELECT * FROM t0
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8)
         |    < '${Sample.threshold(EvalHoldoutFrac)}'),
         |corp AS (SELECT t0.* FROM t0 ANTI JOIN ev USING (doc_id)),
         |tt AS (SELECT doc_id, source, text, string_split(text, ' ') AS ts
         |  FROM corp),
         |bg AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM tt),
         |sg AS (SELECT tt.doc_id, tt.source, tt.text, tt.ts,
         |  round(CAST(len(list_distinct(tt.ts)) AS DOUBLE) / len(tt.ts), 6)
         |    AS quality,
         |  len(bg.g) AS n_ngrams,
         |  round(1.0 - CAST(len(list_distinct(bg.g)) AS DOUBLE) / len(bg.g), 6)
         |    AS dup_ngram_ratio,
         |  md5(trim(regexp_replace(regexp_replace(lower(tt.text),
         |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
         |  FROM tt JOIN bg ON bg.doc_id = tt.doc_id),
         |gp AS (SELECT * FROM sg WHERE n_ngrams > 0
         |  AND quality >= $CurateQualityMin
         |  AND dup_ngram_ratio <= $CurateDupMax),
         |exr AS (SELECT *,
         |  row_number() OVER (PARTITION BY norm_fp ORDER BY doc_id) AS rn
         |  FROM gp),
         |exp2 AS (SELECT doc_id, source, text, ts FROM exr WHERE rn = 1),
         |sh AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(generate_series(1, len(ts) - 2),
         |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM exp2),
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |neard AS (SELECT DISTINCT d2 AS doc_id FROM inter
         |  JOIN nsh na ON na.doc_id = d1 JOIN nsh nb ON nb.doc_id = d2
         |  WHERE round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6)
         |    >= $JaccardThreshold),
         |nearp AS (SELECT exp2.* FROM exp2 ANTI JOIN neard USING (doc_id)),
         |evt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM ev),
         |evsh AS (SELECT DISTINCT
         |  unnest(list_transform(generate_series(1, len(ts) - 7),
         |    i -> $gram8)) AS es FROM evt),
         |csh AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(generate_series(1, len(ts) - 7),
         |    i -> $gram8)) AS s FROM nearp),
         |cont AS (SELECT DISTINCT doc_id FROM csh
         |  JOIN evsh ON evsh.es = csh.s),
         |deconp AS (SELECT nearp.* FROM nearp ANTI JOIN cont USING (doc_id)),
         |qr AS (SELECT doc_id, source, text,
         |  CAST(row_number() OVER (PARTITION BY source
         |    ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || '$QuotaSeed'),
         |      1, 8), doc_id) AS BIGINT) AS rnk FROM deconp),
         |qp AS (SELECT * FROM qr WHERE rnk <= $QuotaPerDomain),
         |spl AS (SELECT doc_id, text,
         |  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'),
         |         1, 8) < '${Sample.threshold(SplitTrain)}' THEN 'train'
         |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'),
         |         1, 8) < '${Sample.threshold(SplitTrain + SplitValid)}'
         |         THEN 'valid'
         |       ELSE 'test' END AS split FROM qp),
         |pk0 AS (SELECT doc_id, doc_id % $PackShards AS shard,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM spl WHERE split = 'train'),
         |pk1 AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY shard
         |    ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
         |  FROM pk0),
         |pk AS (SELECT doc_id, CAST(shard AS BIGINT) AS shard,
         |  (tok_end - n_tokens) // $PackChunkTokens AS chunk_first,
         |  ((tok_end - 1) // $PackChunkTokens)
         |    - ((tok_end - n_tokens) // $PackChunkTokens) + 1 AS n_chunks
         |  FROM pk1),
         |led AS (
         |  SELECT doc_id, 'eval_holdout' AS verdict,
         |    CAST(NULL AS VARCHAR) AS split, CAST(NULL AS BIGINT) AS shard,
         |    CAST(NULL AS BIGINT) AS chunk_first,
         |    CAST(NULL AS BIGINT) AS n_chunks FROM ev
         |  UNION ALL SELECT sg.doc_id, 'gate', NULL, NULL, NULL, NULL
         |    FROM sg ANTI JOIN gp USING (doc_id)
         |  UNION ALL SELECT doc_id, 'exact_dup', NULL, NULL, NULL, NULL
         |    FROM exr WHERE rn > 1
         |  UNION ALL SELECT doc_id, 'near_dup', NULL, NULL, NULL, NULL
         |    FROM neard
         |  UNION ALL SELECT doc_id, 'decon', NULL, NULL, NULL, NULL
         |    FROM cont
         |  UNION ALL SELECT doc_id, 'quota', NULL, NULL, NULL, NULL
         |    FROM qr WHERE rnk > $QuotaPerDomain
         |  UNION ALL SELECT spl.doc_id, 'kept', spl.split, pk.shard,
         |    pk.chunk_first, pk.n_chunks
         |    FROM spl LEFT JOIN pk ON pk.doc_id = spl.doc_id)
         |SELECT doc_id, verdict, split, shard, chunk_first, n_chunks
         |FROM led ORDER BY doc_id""".stripMargin
    },

    // idf rounded at the ln seam on both sides (see Retrieval doc);
    // tf * idf and the final round are IEEE-core, hence bit-exact
    "x24_tfidf" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |tok AS (SELECT doc_id, unnest(ts) AS token FROM t),
         |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
         |  FROM tok GROUP BY 1, 2),
         |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |s AS (SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |  round(tf.tf * round(ln(CAST(n.n AS DOUBLE) / df.df), 6), 6) AS tfidf
         |  FROM tf JOIN df USING (token) CROSS JOIN n),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
         |  ORDER BY tfidf DESC, token) AS INTEGER) AS rnk FROM s)
         |SELECT doc_id, token, tf, df, tfidf, rnk FROM r WHERE rnk <= $TfIdfTopK
         |ORDER BY doc_id, rnk""".stripMargin,

    "x25_bm25" -> bm25Sql,

    // exact fixed-point Laplace bigram LM — every value is BIGINT
    // arithmetic, so the oracle reproduces sums bit-for-bit
    "x26_bigram_lm" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |ref AS (SELECT * FROM t
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
         |    < '${Sample.threshold(SplitTrain)}'),
         |rbg AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1])) AS bg FROM ref),
         |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM rbg GROUP BY 1),
         |rtok AS (SELECT unnest(ts) AS w1 FROM ref),
         |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM rtok GROUP BY 1),
         |v AS (SELECT count(*) AS v FROM c1),
         |dbg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1])) AS bg FROM t),
         |j AS (SELECT d.doc_id, coalesce(c2.c2, 0) AS c2n,
         |  coalesce(c1.c1, 0) + v.v AS den
         |  FROM dbg d LEFT JOIN c2 USING (bg)
         |  LEFT JOIN c1 ON c1.w1 = split_part(d.bg, ' ', 1)
         |  CROSS JOIN v),
         |p AS (SELECT doc_id, c2n,
         |  (c2n + 1) * ${LangModel.Scale} // den AS p_fix FROM j)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CASE WHEN c2n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen,
         |  CAST(sum(p_fix) AS BIGINT) AS sum_p_fix,
         |  CAST(sum(p_fix) // count(*) AS BIGINT) AS avg_p_fix
         |FROM p GROUP BY 1 ORDER BY doc_id""".stripMargin,

    "x27_scd2" ->
      """WITH o AS (SELECT o_custkey, o_orderpriority,
        |  CAST(o_orderdate AS TIMESTAMP) AS ts, o_orderkey FROM orders),
        |l AS (SELECT *, lag(o_orderpriority) OVER
        |  (PARTITION BY o_custkey ORDER BY ts, o_orderkey) AS prev FROM o),
        |v AS (SELECT *, CAST(sum(CASE WHEN prev IS NULL
        |    OR prev != o_orderpriority THEN 1 ELSE 0 END)
        |  OVER (PARTITION BY o_custkey ORDER BY ts, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version FROM l),
        |runs AS (SELECT o_custkey, version,
        |  min(o_orderpriority) AS o_orderpriority,
        |  min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_rows
        |  FROM v GROUP BY 1, 2),
        |c AS (SELECT *, lead(valid_from) OVER
        |  (PARTITION BY o_custkey ORDER BY version) AS valid_to FROM runs)
        |SELECT o_custkey, version, o_orderpriority, valid_from, valid_to,
        |  n_rows,
        |  CAST(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_current
        |FROM c ORDER BY o_custkey, version""".stripMargin,

    // the same 3 fixed-point rounds unrolled — all BIGINT, bit-exact
    "x28_pagerank" -> {
      val iter = (k: Int) =>
        s"""i$k AS (SELECT e.dst AS node,
           |  sum(r.rank * 85 // (od.outdeg * 100)) AS inflow
           |  FROM e JOIN r${k - 1} r ON r.node = e.src
           |  JOIN od ON od.src = e.src GROUP BY 1),
           |r$k AS (SELECT nodes.node, b.b + coalesce(i$k.inflow, 0) AS rank
           |  FROM nodes LEFT JOIN i$k USING (node) CROSS JOIN base b)""".stripMargin
      s"""WITH pair AS (SELECT DISTINCT o.o_custkey * 2 AS c,
         |  l.l_suppkey * 2 + 1 AS s
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT c AS src, s AS dst FROM pair
         |  UNION ALL SELECT s AS src, c AS dst FROM pair),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
         |n AS (SELECT count(*) AS n FROM nodes),
         |base AS (SELECT 15 * ${Graph.Scale} // (100 * n) AS b FROM n),
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node, ${Graph.Scale} // n.n AS rank
         |  FROM nodes CROSS JOIN n),
         |${(1 to PageRankIters).map(iter).mkString(",\n")}
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$PageRankIters
         |ORDER BY rank DESC, node LIMIT 100""".stripMargin
    },

    // latest-row-per-key merge of the change batch into the snapshot —
    // identical window + rank-1 filter on both sides
    "x29_cdc_apply" ->
      """WITH snap AS (SELECT c_custkey AS cust_key, c_mktsegment AS attr,
        |  TIMESTAMP '1990-01-01 00:00:00' AS ts, CAST(0 AS BIGINT) AS tie,
        |  'U' AS op FROM customer),
        |chg AS (SELECT o_custkey AS cust_key, o_orderpriority AS attr,
        |  CAST(o_orderdate AS TIMESTAMP) AS ts, o_orderkey AS tie,
        |  CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op
        |  FROM orders),
        |m AS (SELECT * FROM snap UNION ALL SELECT * FROM chg),
        |r AS (SELECT *, row_number() OVER (PARTITION BY cust_key
        |  ORDER BY ts DESC, tie DESC) AS rn FROM m)
        |SELECT cust_key, attr, ts, tie FROM r WHERE rn = 1 AND op = 'U'
        |ORDER BY cust_key""".stripMargin,

    // per-source sketches with the same md5-lane hash family, agreement
    // counted over the 16 signature slots
    "x32_corpus_overlap" -> {
      val agreeSql = (0 until 16)
        .map(i => s"(CASE WHEN a.sig$i = b.sig$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH t AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT DISTINCT source,
         |  unnest(list_transform(generate_series(1, len(ts) - 2),
         |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS s FROM t),
         |sig AS (SELECT source, $minhashSigCols FROM sh GROUP BY source)
         |SELECT a.source AS g1, b.source AS g2,
         |  CAST($agreeSql AS BIGINT) AS n_agree,
         |  round(CAST($agreeSql AS DOUBLE) / 16, 6) AS est_jaccard
         |FROM sig a JOIN sig b ON a.source < b.source
         |ORDER BY g1, g2""".stripMargin
    },

    // same exact-integer cut derivation in HUGEINT: T maximizes the
    // kept total, cut_d = floor(2^32 * w_d * T / (10^6 * n_d))
    "x31_mixture_sample" -> mixtureSql,

    // x55 runs the identical derivation through the join path — the
    // shared SQL makes the hash gate prove the two engine forms equal
    "x55_mixture_joined" -> mixtureSql,

    // the full-corpus LSH pipeline restricted to pairs with a delta
    // member — band-candidate semantics identical to x1_minhash_lsh
    "x30_incremental_dedup" ->
      s"""WITH $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id
         |  WHERE a.doc_id % 7 = 0 OR b.doc_id % 7 = 0),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2)
         |SELECT d1, d2, jac FROM j WHERE jac >= $JaccardThreshold
         |ORDER BY d1, d2""".stripMargin,

    // same generate_series walk: starts 0, stride, ... < n_tokens; the
    // tail window clamps to the document end
    "x33_chunking" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts,
         |  unnest(generate_series(0, len(ts) - 1, $ChunkStride)) AS start_tok
         |  FROM t)
         |SELECT doc_id,
         |  CAST(start_tok // $ChunkStride AS BIGINT) AS chunk_idx,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  CAST(least($ChunkSize, len(ts) - start_tok) AS BIGINT) AS n_tok,
         |  array_to_string(ts[start_tok + 1 : start_tok + $ChunkSize], ' ')
         |    AS chunk_text
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    // df over distinct (doc, ngram); the SAME relative-ppm integer cutoff
    "x34_common_ngrams" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |occ AS (SELECT doc_id,
         |  unnest(list_transform(generate_series(1, len(ts) - 2),
         |    i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS ng FROM t),
         |df AS (SELECT ng, count(DISTINCT doc_id) AS df FROM occ GROUP BY 1),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |g AS (SELECT o.doc_id, count(*) AS n_ngrams,
         |  CAST(sum(CASE WHEN f.df * 1000000 > $CommonNgramPpm * nd.n_docs
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |  FROM occ o JOIN df f USING (ng) CROSS JOIN nd GROUP BY 1)
         |SELECT doc_id, n_ngrams, n_common,
         |  CAST(n_common * 1000000 // n_ngrams AS BIGINT) AS common_ppm
         |FROM g ORDER BY doc_id""".stripMargin,

    // the full Lloyd replay: lowest-id init, per-round argmin assignment
    // (ties to the lower cluster), element-wise floor-div centroid
    // update (empty cluster keeps its centroid via the LEFT JOIN), all
    // in integer-exact arithmetic — no inlined literals at all
    "x37_kmeans" ->
      s"""WITH $kmeansRoundsPrefix,
         |${kmeansAssignCte("c1", "2", keepDist = true)}
         |SELECT vec_id, CAST(cl AS INTEGER) AS cluster,
         |  CAST(dist AS BIGINT) AS dist
         |FROM a2 ORDER BY vec_id""".stripMargin,

    // x156: the x37 round chain replayed verbatim (shared prefix),
    // then a = the rn=1 distance, b = min distance over the OTHER
    // final centroids, and the same micro floor as the Spark side
    "x156_silhouette" ->
      s"""WITH $kmeansRoundsPrefix,
         |d2 AS (SELECT e.vec_id, c1.cl,
         |  list_dot_product(e.q, e.q) - 2 * list_dot_product(e.q, c1.cq)
         |    + list_dot_product(c1.cq, c1.cq) AS dist
         |  FROM e CROSS JOIN c1),
         |a2 AS (SELECT vec_id, cl, dist FROM (
         |  SELECT vec_id, cl, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
         |  FROM d2) WHERE rn = 1),
         |b2 AS (SELECT d2.vec_id, min(d2.dist) AS b
         |  FROM d2 JOIN a2 ON a2.vec_id = d2.vec_id AND d2.cl <> a2.cl
         |  GROUP BY 1),
         |s AS (SELECT a2.cl AS cluster, CAST(a2.dist AS BIGINT) AS a,
         |  CAST(b2.b AS BIGINT) AS b FROM a2 JOIN b2 USING (vec_id)),
         |sm AS (SELECT cluster,
         |  CASE WHEN greatest(a, b) = 0 THEN CAST(0 AS BIGINT)
         |  ELSE CAST(CAST(b - a AS HUGEINT) * 1000000
         |    // greatest(a, b) AS BIGINT) END AS sm FROM s)
         |SELECT CAST(cluster AS INTEGER) AS cluster,
         |  CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(sum(sm) // count(*) AS BIGINT) AS avg_sil_micro,
         |  CAST(min(sm) AS BIGINT) AS min_sil_micro,
         |  CAST(max(sm) AS BIGINT) AS max_sil_micro
         |FROM sm GROUP BY 1 ORDER BY 1""".stripMargin,

    // Laplace NB replayed from the data alone: per-(token, class)
    // counts over the train split, micro-nat ln seam per token, exact
    // BIGINT sums, argmax by (score DESC, lang ASC)
    "x42_nb_quality" -> nbQualitySql,

    "x124_margin_reliability" -> marginReliabilitySql,

    // X127: the subsampler replayed — same cut formula text, same
    // md5(doc|pos|seed) occurrence hash, ORDER BY pos reassembly
    "x127_freq_subsample" ->
      s"""WITH tk AS (SELECT doc_id, ts[i] AS w, CAST(i AS BIGINT) AS pos
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ts
         |    FROM documents WHERE text IS NOT NULL),
         |  LATERAL unnest(generate_series(1, len(ts))) AS u(i)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tk),
         |cu AS (SELECT w, CAST(round(least(CAST(1.0 AS DOUBLE),
         |    sqrt(CAST($SubsampleTPpm * tot.total AS DOUBLE)
         |      / CAST(1000000 * count(*) AS DOUBLE))
         |    + CAST($SubsampleTPpm * tot.total AS DOUBLE)
         |      / CAST(1000000 * count(*) AS DOUBLE))
         |  * 4294967296.0) AS BIGINT) AS cut
         |  FROM tk CROSS JOIN tot GROUP BY w, tot.total),
         |k AS (SELECT tk.doc_id, tk.pos, tk.w,
         |    ('0x' || substring(md5(CAST(tk.doc_id AS VARCHAR) || '|' ||
         |      CAST(tk.pos AS VARCHAR) || '|$SubsampleSeed'), 1, 8))::BIGINT
         |      < cu.cut AS keep
         |  FROM tk JOIN cu USING (w))
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(count(*) FILTER (WHERE keep) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(w, ' ' ORDER BY pos) FILTER (WHERE keep),
         |    '') AS sub_text
         |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x128: the boilerPage twin replayed (natural width-7 lines +
    // arithmetic-injected boilerplate with cumulative append
    // positions), then CCNet document-frequency removal relationally:
    // distinct (doc, digest) -> df -> frequent set -> left-join excise
    "x128_line_boilerplate" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents WHERE text IS NOT NULL),
         |nat AS (SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos,
         |   array_to_string(ts[(i*$C4Width+1):(i*$C4Width+$C4Width)], ' ')
         |     AS line
         |  FROM t, LATERAL unnest(generate_series(0,
         |    (len(ts) + ${C4Width - 1}) // $C4Width - 1)) AS u(i)),
         |nl AS (SELECT doc_id,
         |   CAST((len(ts) + ${C4Width - 1}) // $C4Width AS BIGINT) AS n
         |  FROM t),
         |inj AS (
         |  SELECT doc_id, n + 1 AS pos, '$BoilerNewsletter' AS line
         |    FROM nl WHERE doc_id % 2 = 0
         |  UNION ALL
         |  SELECT doc_id,
         |    n + 1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END,
         |    '$BoilerRights' FROM nl WHERE doc_id % 3 = 0
         |  UNION ALL
         |  SELECT doc_id,
         |    n + 1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END
         |      + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END,
         |    '$BoilerRare' FROM nl WHERE doc_id % 97 = 0),
         |l AS (SELECT * FROM nat UNION ALL SELECT * FROM inj),
         |d AS (SELECT doc_id, pos, line, md5(line) AS dg FROM l),
         |dd AS (SELECT DISTINCT doc_id, dg FROM d),
         |nd AS (SELECT count(DISTINCT doc_id) AS n FROM d),
         |fr AS (SELECT dg FROM dd, nd GROUP BY dg, nd.n
         |  HAVING count(*) * 1000000 >= nd.n * $BoilerFracPpm)
         |SELECT d.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN fr.dg IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN fr.dg IS NULL THEN line END,
         |    chr(10) ORDER BY pos), '') AS cleaned
         |FROM d LEFT JOIN fr ON fr.dg = d.dg
         |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,

    // x131: the micro-nat KL lanes replayed — the ln ratio is ONE
    // fixed-parenthesization double of the four exact counts, terms
    // round to BIGINT before the HUGEINT weighted sum, and the clamp
    // keeps the final divide on non-negative lanes (floor == trunc)
    "x131_lang_kl" ->
      s"""WITH tk AS (SELECT lang AS grp,
         |   unnest(string_split(text, ' ')) AS w
         |  FROM documents
         |  WHERE text IS NOT NULL AND lang IS NOT NULL),
         |csw AS (SELECT grp, w, count(*) AS c_sw FROM tk GROUP BY 1, 2),
         |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w
         |  FROM csw GROUP BY 1),
         |ts AS (SELECT grp, CAST(sum(c_sw) AS BIGINT) AS t_s
         |  FROM csw GROUP BY 1),
         |tc AS (SELECT CAST(sum(c_sw) AS BIGINT) AS t_c FROM csw),
         |term AS (SELECT csw.grp, csw.c_sw, ts.t_s,
         |   CAST(round(ln((CAST(c_sw AS DOUBLE) * t_c)
         |     / (CAST(t_s AS DOUBLE) * c_w)) * 1000000) AS BIGINT) AS t
         |  FROM csw JOIN cw USING (w) JOIN ts USING (grp) CROSS JOIN tc)
         |SELECT grp, t_s AS n_tokens, CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(greatest(sum(CAST(c_sw AS HUGEINT) * t),
         |      CAST(0 AS HUGEINT))
         |    // CAST(t_s AS HUGEINT) AS BIGINT) AS kl_micro
         |FROM term GROUP BY grp, t_s ORDER BY grp""".stripMargin,

    // x132: the G² identity replayed — same count CTEs as x131, the
    // four contingency cells each as O·round(ln(fixed ratio)·1e6),
    // HUGEINT weighted sum, ×2 after the BIGINT cast like the engine
    "x132_keyness" -> {
      def cell(o: String, rowT: String, colT: String): String =
        s"""CASE WHEN $o = 0 THEN CAST(0 AS HUGEINT)
           |ELSE CAST($o AS HUGEINT) *
           |  CAST(round(ln((CAST($o AS DOUBLE) * t_c)
           |    / (CAST($rowT AS DOUBLE) * ($colT))) * 1000000) AS BIGINT)
           |END""".stripMargin.replace("\n", " ")
      s"""WITH tk AS (SELECT lang AS grp,
         |   unnest(string_split(text, ' ')) AS w
         |  FROM documents
         |  WHERE text IS NOT NULL AND lang IS NOT NULL),
         |csw AS (SELECT grp, w, count(*) AS c_sw FROM tk GROUP BY 1, 2),
         |cw AS (SELECT w, CAST(sum(c_sw) AS BIGINT) AS c_w
         |  FROM csw GROUP BY 1),
         |ts AS (SELECT grp, CAST(sum(c_sw) AS BIGINT) AS t_s
         |  FROM csw GROUP BY 1),
         |tc AS (SELECT CAST(sum(c_sw) AS BIGINT) AS t_c FROM csw),
         |cells AS (SELECT csw.grp, csw.w, csw.c_sw, cw.c_w, ts.t_s,
         |   tc.t_c, cw.c_w - csw.c_sw AS ob, ts.t_s - csw.c_sw AS oc,
         |   tc.t_c - ts.t_s - cw.c_w + csw.c_sw AS od
         |  FROM csw JOIN cw USING (w) JOIN ts USING (grp) CROSS JOIN tc
         |  WHERE csw.c_sw >= $KeynessMinCount),
         |lane AS (SELECT grp, w, c_sw,
         |   CASE WHEN CAST(c_sw AS HUGEINT) * t_c
         |          > CAST(t_s AS HUGEINT) * c_w THEN 1
         |        WHEN CAST(c_sw AS HUGEINT) * t_c
         |          < CAST(t_s AS HUGEINT) * c_w THEN -1
         |        ELSE 0 END AS dir,
         |   ${cell("c_sw", "t_s", "c_w")}
         |   + ${cell("ob", "t_c - t_s", "c_w")}
         |   + ${cell("oc", "t_s", "t_c - c_w")}
         |   + ${cell("od", "t_c - t_s", "t_c - c_w")} AS s
         |  FROM cells)
         |SELECT grp, w, CAST(c_sw AS BIGINT) AS c_sw,
         |  CAST(dir AS BIGINT) AS dir,
         |  2 * CAST(s AS BIGINT) AS g2_micro
         |FROM lane ORDER BY grp, w""".stripMargin
    },

    // x133: the x22 gate-signal CTEs restricted to the pass predicate,
    // then the Wilson bound from the SHARED SQL text (Eval.wilsonSql —
    // one parenthesization, so the double seams cannot diverge)
    "x133_wilson_gate" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |   string_split(text, ' ') AS ts FROM documents
         |   WHERE source IS NOT NULL),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM t),
         |sig AS (SELECT t.doc_id, t.source,
         |  round(CAST(len(list_distinct(t.ts)) AS DOUBLE) / len(t.ts), 6)
         |    AS quality,
         |  len(sh.g) AS n_ngrams,
         |  round(1.0 - CAST(len(list_distinct(sh.g)) AS DOUBLE) / len(sh.g), 6)
         |    AS dup_ngram_ratio
         |  FROM t JOIN sh ON sh.doc_id = t.doc_id),
         |g AS (SELECT source AS grp, CAST(count(*) AS BIGINT) AS n,
         |   CAST(count(*) FILTER (WHERE n_ngrams > 0
         |     AND quality >= $CurateQualityMin
         |     AND dup_ngram_ratio <= $CurateDupMax) AS BIGINT) AS n_hit
         |  FROM sig GROUP BY 1)
         |SELECT grp, n, n_hit,
         |  round(CAST(n_hit AS DOUBLE) / n, 6) AS rate,
         |  ${Eval.wilsonSql(1.96, "-")} AS lo,
         |  ${Eval.wilsonSql(1.96, "+")} AS hi
         |FROM g ORDER BY grp""".stripMargin,

    // x136: the fold/explode equivalence — bigram and prefix counts
    // relationally, the same per-run product-round term, dense over
    // non-null text (short docs keep zero rows)
    "x136_digram_entropy" ->
      """WITH b AS (SELECT doc_id, text AS t FROM documents
        |  WHERE text IS NOT NULL),
        |bg AS (SELECT doc_id, t[i:i] || ' ' || t[i+1:i+1] AS g
        |  FROM b, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
        |pf AS (SELECT doc_id, t[i:i] AS ch
        |  FROM b, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i)),
        |c2 AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT doc_id, ch, count(*) AS c FROM pf GROUP BY 1, 2),
        |s2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS m,
        |   CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * c * 1000000)
        |     AS BIGINT)) AS BIGINT) AS s2m
        |  FROM c2 GROUP BY 1),
        |s1 AS (SELECT doc_id,
        |   CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * c * 1000000)
        |     AS BIGINT)) AS BIGINT) AS s1m
        |  FROM c1 GROUP BY 1)
        |SELECT b.doc_id,
        |  CAST(coalesce(s2.m, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(s1.s1m, 0) AS BIGINT) AS s1_micro,
        |  CAST(coalesce(s2.s2m, 0) AS BIGINT) AS s2_micro,
        |  CASE WHEN coalesce(s2.m, 0) = 0 THEN CAST(0 AS BIGINT)
        |  ELSE greatest(s1.s1m - s2.s2m, CAST(0 AS BIGINT)) // s2.m
        |  END AS cond_micro
        |FROM b LEFT JOIN s2 USING (doc_id) LEFT JOIN s1 USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // x137: the KS identity replayed — same grid, same cumulative
    // windows, HUGEINT cross products, min-value tie-break
    "x137_ks_drift" ->
      """WITH base AS (SELECT source AS grp, n_chars AS v FROM documents
        |  WHERE source IS NOT NULL AND n_chars IS NOT NULL),
        |counts AS (SELECT grp, v, count(*) AS c FROM base GROUP BY 1, 2),
        |pool AS (SELECT v, CAST(sum(c) AS BIGINT) AS pc
        |  FROM counts GROUP BY 1),
        |grps AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_s
        |  FROM counts GROUP BY 1),
        |np AS (SELECT CAST(sum(c) AS BIGINT) AS n_pool FROM counts),
        |grid AS (SELECT g.grp, g.n_s, p.v, p.pc, coalesce(c.c, 0) AS c
        |  FROM grps g CROSS JOIN pool p
        |  LEFT JOIN counts c ON c.grp = g.grp AND c.v = p.v),
        |cum AS (SELECT grp, n_s, v,
        |   sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum_s,
        |   sum(pc) OVER (PARTITION BY grp ORDER BY v) AS cum_p
        |  FROM grid),
        |diffs AS (SELECT grp, n_s, v, n_pool,
        |   abs(CAST(cum_s AS HUGEINT) * n_pool
        |     - CAST(cum_p AS HUGEINT) * n_s) AS cr
        |  FROM cum CROSS JOIN np),
        |r AS (SELECT grp, n_s, v, cr, n_pool,
        |   row_number() OVER (PARTITION BY grp ORDER BY cr DESC, v ASC)
        |     AS rn
        |  FROM diffs)
        |SELECT grp, n_s AS n,
        |  CAST((cr * 1000000) // (CAST(n_s AS HUGEINT) * n_pool)
        |    AS BIGINT) AS d_ppm,
        |  CAST(v AS BIGINT) AS at_val
        |FROM r WHERE rn = 1 ORDER BY grp""".stripMargin,

    // x137_frac: the same KS identity over the micro-unit fixed-point
    // map of a continuous column — floor((n_chars/ntok)·10⁶), one IEEE
    // divide+multiply+floor, engine-identical (a fractional CAST would
    // not be: DuckDB rounds, Spark truncates)
    "x137_ks_frac" ->
      """WITH base AS (SELECT source AS grp,
        |   CAST(floor((CAST(n_chars AS DOUBLE)
        |     / len(string_split(text, ' '))) * 1000000) AS BIGINT) AS v
        |  FROM documents WHERE source IS NOT NULL
        |   AND text IS NOT NULL AND n_chars IS NOT NULL),
        |counts AS (SELECT grp, v, count(*) AS c FROM base GROUP BY 1, 2),
        |pool AS (SELECT v, CAST(sum(c) AS BIGINT) AS pc
        |  FROM counts GROUP BY 1),
        |grps AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n_s
        |  FROM counts GROUP BY 1),
        |np AS (SELECT CAST(sum(c) AS BIGINT) AS n_pool FROM counts),
        |grid AS (SELECT g.grp, g.n_s, p.v, p.pc, coalesce(c.c, 0) AS c
        |  FROM grps g CROSS JOIN pool p
        |  LEFT JOIN counts c ON c.grp = g.grp AND c.v = p.v),
        |cum AS (SELECT grp, n_s, v,
        |   sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum_s,
        |   sum(pc) OVER (PARTITION BY grp ORDER BY v) AS cum_p
        |  FROM grid),
        |diffs AS (SELECT grp, n_s, v, n_pool,
        |   abs(CAST(cum_s AS HUGEINT) * n_pool
        |     - CAST(cum_p AS HUGEINT) * n_s) AS cr
        |  FROM cum CROSS JOIN np),
        |r AS (SELECT grp, n_s, v, cr, n_pool,
        |   row_number() OVER (PARTITION BY grp ORDER BY cr DESC, v ASC)
        |     AS rn
        |  FROM diffs)
        |SELECT grp, n_s AS n,
        |  CAST((cr * 1000000) // (CAST(n_s AS HUGEINT) * n_pool)
        |    AS BIGINT) AS d_ppm,
        |  CAST(v AS BIGINT) AS at_val
        |FROM r WHERE rn = 1 ORDER BY grp""".stripMargin,

    // x138: the concentration identities replayed in HUGEINT
    "x138_source_concentration" ->
      """WITH c AS (SELECT source AS src, CAST(count(*) AS BIGINT) AS c
        |  FROM documents WHERE source IS NOT NULL GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |   CAST(sum(c) AS BIGINT) AS n,
        |   sum(CAST(c AS HUGEINT) * c) AS s2,
        |   CAST(max(c) AS BIGINT) AS top FROM c),
        |g AS (SELECT sum(abs(CAST(a.c AS HUGEINT) - b.c)) AS gn
        |  FROM c a CROSS JOIN c b)
        |SELECT t.k AS n_sources, t.n AS n_docs,
        |  CAST((s2 * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT)
        |    AS hhi_ppm,
        |  CAST((gn * 1000000) // (2 * CAST(k AS HUGEINT) * n) AS BIGINT)
        |    AS gini_ppm,
        |  CAST((CAST(top AS HUGEINT) * 1000000) // n AS BIGINT)
        |    AS top_share_ppm
        |FROM t CROSS JOIN g""".stripMargin,

    // x134: quasi-identifier class sizes, the risk flag, and the
    // suppression count broadcast onto every class row
    "x134_k_anonymity" ->
      s"""WITH cls AS (SELECT lang, source,
         |   n_chars // $KAnonBucket AS len_bucket,
         |   CAST(count(*) AS BIGINT) AS k_size
         |  FROM documents WHERE lang IS NOT NULL
         |   AND source IS NOT NULL AND n_chars IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |sup AS (SELECT CAST(coalesce(sum(k_size), 0) AS BIGINT)
         |   AS n_suppressed FROM cls WHERE k_size < $KAnonK)
         |SELECT lang, source, len_bucket, k_size,
         |  k_size < $KAnonK AS at_risk, n_suppressed
         |FROM cls CROSS JOIN sup
         |ORDER BY lang, source, len_bucket""".stripMargin,

    // x147: the same cls CTE as x134, swept over the k list via a
    // cross join; ppm in HUGEINT floor division (both lanes >= 0)
    "x147_kanon_sweep" ->
      s"""WITH cls AS (SELECT lang, source,
         |   n_chars // $KAnonBucket AS len_bucket,
         |   CAST(count(*) AS BIGINT) AS k_size
         |  FROM documents WHERE lang IS NOT NULL
         |   AND source IS NOT NULL AND n_chars IS NOT NULL
         |  GROUP BY 1, 2, 3),
         |ks(k) AS (SELECT CAST(v AS BIGINT)
         |  FROM (VALUES ${KAnonSweepKs.map("(" + _ + ")").mkString(", ")})
         |    t(v))
         |SELECT k, CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(count(*) FILTER (WHERE k_size < k) AS BIGINT) AS n_at_risk,
         |  CAST(coalesce(sum(k_size) FILTER (WHERE k_size < k), 0)
         |    AS BIGINT) AS n_suppressed,
         |  CAST(CAST(coalesce(sum(k_size) FILTER (WHERE k_size < k), 0)
         |    AS HUGEINT) * 1000000 // sum(k_size) AS BIGINT)
         |    AS suppressed_ppm
         |FROM cls CROSS JOIN ks GROUP BY k ORDER BY k""".stripMargin,

    // x148: the finest class table once, each coarser grain rolled up
    // from it (n_chars >= 0, so // matches Spark's div on the bucket
    // lanes); one UNION ALL branch per bucket width
    "x148_kanon_generalize" -> {
      val branches = KAnonGenBuckets.map { b =>
        s"""SELECT CAST($b AS BIGINT) AS bucket,
           |  CAST(count(*) AS BIGINT) AS n_classes,
           |  CAST(count(*) FILTER (WHERE k_size < $KAnonK) AS BIGINT)
           |    AS n_at_risk,
           |  CAST(coalesce(sum(k_size) FILTER (WHERE k_size < $KAnonK), 0)
           |    AS BIGINT) AS n_suppressed,
           |  CASE WHEN coalesce(sum(k_size), 0) > 0 THEN
           |    CAST(CAST(coalesce(sum(k_size) FILTER (WHERE k_size < $KAnonK),
           |      0) AS HUGEINT) * 1000000 // sum(k_size) AS BIGINT)
           |  ELSE CAST(0 AS BIGINT) END AS suppressed_ppm
           |FROM (SELECT lang, source, lb // ${b / KAnonBucket} AS cb,
           |    CAST(sum(k_size) AS BIGINT) AS k_size
           |  FROM cls0 GROUP BY 1, 2, 3)""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH cls0 AS (SELECT lang, source,
         |   n_chars // $KAnonBucket AS lb,
         |   CAST(count(*) AS BIGINT) AS k_size
         |  FROM documents WHERE lang IS NOT NULL
         |   AND source IS NOT NULL AND n_chars IS NOT NULL
         |  GROUP BY 1, 2, 3)
         |$branches
         |ORDER BY bucket""".stripMargin
    },

    // x149: x134's class CTE joined onto x94's verdict chain over the
    // same filtered + augmented corpus; share in HUGEINT floor ppm
    "x149_risk_pii_joint" ->
      s"""WITH base AS (SELECT doc_id, lang, source,
         |   n_chars // $KAnonBucket AS len_bucket, $piiAugmentSql AS t
         |  FROM documents WHERE lang IS NOT NULL
         |   AND source IS NOT NULL AND n_chars IS NOT NULL),
         |cls AS (SELECT lang, source, len_bucket,
         |   CAST(count(*) AS BIGINT) AS k_size
         |  FROM base GROUP BY 1, 2, 3),
         |em AS (SELECT lang, source, len_bucket, t,
         |  regexp_replace(t, '${Pii.EmailPattern}', '${Pii.EmailToken}',
         |    'g') AS te FROM base),
         |v AS (SELECT lang, source, len_bucket,
         |  CASE WHEN n_pii > $PiiMaxHits THEN 'drop'
         |       WHEN n_pii > 0 THEN 'mask' ELSE 'keep' END AS verdict
         |  FROM (SELECT lang, source, len_bucket,
         |    len(regexp_extract_all(t, '${Pii.EmailPattern}'))
         |    + len(regexp_extract_all(
         |        regexp_replace(te, '${Pii.Ipv4Pattern}',
         |          '${Pii.IpToken}', 'g'), '${Pii.PhonePattern}'))
         |    + len(regexp_extract_all(te, '${Pii.Ipv4Pattern}'))
         |      AS n_pii FROM em)),
         |j AS (SELECT cls.k_size < $KAnonK AS at_risk, v.verdict
         |  FROM v JOIN cls USING (lang, source, len_bucket)),
         |tot AS (SELECT count(*) AS t FROM j)
         |SELECT at_risk, verdict, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(CAST(count(*) AS HUGEINT) * 1000000 // t AS BIGINT)
         |    AS share_ppm
         |FROM j CROSS JOIN tot GROUP BY 1, 2, t
         |ORDER BY at_risk, verdict""".stripMargin,

    // x151: x149's verdict chain feeding the class-value ledger; n_sv
    // counts LEDGER ROWS per class (groupBy-null semantics, never
    // count(DISTINCT)), the l sweep is the x147 FILTER pattern
    "x151_l_diversity" ->
      s"""WITH base AS (SELECT lang, source,
         |   n_chars // $KAnonBucket AS len_bucket, $piiAugmentSql AS t
         |  FROM documents WHERE lang IS NOT NULL
         |   AND source IS NOT NULL AND n_chars IS NOT NULL),
         |em AS (SELECT lang, source, len_bucket, t,
         |  regexp_replace(t, '${Pii.EmailPattern}', '${Pii.EmailToken}',
         |    'g') AS te FROM base),
         |v AS (SELECT lang, source, len_bucket,
         |  CASE WHEN n_pii > $PiiMaxHits THEN 'drop'
         |       WHEN n_pii > 0 THEN 'mask' ELSE 'keep' END AS sv
         |  FROM (SELECT lang, source, len_bucket,
         |    len(regexp_extract_all(t, '${Pii.EmailPattern}'))
         |    + len(regexp_extract_all(
         |        regexp_replace(te, '${Pii.Ipv4Pattern}',
         |          '${Pii.IpToken}', 'g'), '${Pii.PhonePattern}'))
         |    + len(regexp_extract_all(te, '${Pii.Ipv4Pattern}'))
         |      AS n_pii FROM em)),
         |svc AS (SELECT lang, source, len_bucket, sv,
         |   CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2, 3, 4),
         |cls AS (SELECT lang, source, len_bucket,
         |   CAST(sum(cnt) AS BIGINT) AS k_size,
         |   CAST(count(*) AS BIGINT) AS n_sv FROM svc GROUP BY 1, 2, 3),
         |ls AS (SELECT unnest(ARRAY[${LDivLs.mkString(", ")}]) AS l)
         |SELECT CAST(l AS BIGINT) AS l,
         |  CAST(count(*) AS BIGINT) AS n_classes,
         |  CAST(count(*) FILTER (WHERE n_sv < l) AS BIGINT) AS n_low_div,
         |  CAST(coalesce(sum(k_size) FILTER (WHERE n_sv < l), 0)
         |    AS BIGINT) AS n_docs_low,
         |  CAST(CAST(coalesce(sum(k_size) FILTER (WHERE n_sv < l), 0)
         |    AS HUGEINT) * 1000000 // sum(k_size) AS BIGINT)
         |    AS low_div_ppm
         |FROM cls CROSS JOIN ls GROUP BY l ORDER BY l""".stripMargin,

    // x152: the same ledger, three rollups (class sizes, global
    // distribution, total), classes x values grid, NULL-SAFE left join
    // back onto the ledger, HUGEINT total-variation ppm per class
    "x152_t_closeness" ->
      s"""WITH base AS (SELECT lang, source,
         |   n_chars // $KAnonBucket AS len_bucket, $piiAugmentSql AS t
         |  FROM documents WHERE lang IS NOT NULL
         |   AND source IS NOT NULL AND n_chars IS NOT NULL),
         |em AS (SELECT lang, source, len_bucket, t,
         |  regexp_replace(t, '${Pii.EmailPattern}', '${Pii.EmailToken}',
         |    'g') AS te FROM base),
         |v AS (SELECT lang, source, len_bucket,
         |  CASE WHEN n_pii > $PiiMaxHits THEN 'drop'
         |       WHEN n_pii > 0 THEN 'mask' ELSE 'keep' END AS sv
         |  FROM (SELECT lang, source, len_bucket,
         |    len(regexp_extract_all(t, '${Pii.EmailPattern}'))
         |    + len(regexp_extract_all(
         |        regexp_replace(te, '${Pii.Ipv4Pattern}',
         |          '${Pii.IpToken}', 'g'), '${Pii.PhonePattern}'))
         |    + len(regexp_extract_all(te, '${Pii.Ipv4Pattern}'))
         |      AS n_pii FROM em)),
         |svc AS (SELECT lang, source, len_bucket, sv,
         |   CAST(count(*) AS BIGINT) AS cnt FROM v GROUP BY 1, 2, 3, 4),
         |cls AS (SELECT lang, source, len_bucket,
         |   CAST(sum(cnt) AS BIGINT) AS n_c FROM svc GROUP BY 1, 2, 3),
         |gdist AS (SELECT sv, CAST(sum(cnt) AS BIGINT) AS g
         |  FROM svc GROUP BY 1),
         |tot AS (SELECT CAST(sum(g) AS BIGINT) AS n_total FROM gdist),
         |grid AS (SELECT cls.lang, cls.source, cls.len_bucket, cls.n_c,
         |   gdist.sv, gdist.g, tot.n_total
         |  FROM cls CROSS JOIN gdist CROSS JOIN tot),
         |cv AS (SELECT grid.lang, grid.source, grid.len_bucket,
         |   grid.n_c, grid.n_total, grid.g, coalesce(svc.cnt, 0) AS cnt
         |  FROM grid LEFT JOIN svc
         |   ON grid.lang IS NOT DISTINCT FROM svc.lang
         |   AND grid.source IS NOT DISTINCT FROM svc.source
         |   AND grid.len_bucket IS NOT DISTINCT FROM svc.len_bucket
         |   AND grid.sv IS NOT DISTINCT FROM svc.sv)
         |SELECT lang, source, len_bucket, n_c AS k_size,
         |  CAST(sum(abs(CAST(cnt AS HUGEINT) * n_total
         |      - CAST(g AS HUGEINT) * n_c)) * 1000000
         |    // (2 * CAST(n_c AS HUGEINT) * n_total) AS BIGINT)
         |    AS emd_ppm,
         |  CAST(sum(abs(CAST(cnt AS HUGEINT) * n_total
         |      - CAST(g AS HUGEINT) * n_c)) * 1000000
         |    // (2 * CAST(n_c AS HUGEINT) * n_total) AS BIGINT)
         |    > $TClosePpm AS breach
         |FROM cv GROUP BY 1, 2, 3, 4, n_total
         |ORDER BY lang, source, len_bucket""".stripMargin,

    // x154: the x144 gate-signal lanes (raw text) joined to the x151
    // PII-count chain (augmented text), per-source contingency cells,
    // then kappa/McNemar in HUGEINT with the sign CASE made explicit
    // (mirrors the Spark DECIMAL(38,0) projection term for term)
    "x154_gate_agreement" ->
      s"""WITH t AS (SELECT doc_id, source, text,
         |   string_split(text, ' ') AS ts, $piiAugmentSql AS aug
         |  FROM documents WHERE source IS NOT NULL),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM t),
         |em AS (SELECT doc_id, aug,
         |  regexp_replace(aug, '${Pii.EmailPattern}', '${Pii.EmailToken}',
         |    'g') AS te FROM t),
         |pii AS (SELECT doc_id,
         |  len(regexp_extract_all(aug, '${Pii.EmailPattern}'))
         |  + len(regexp_extract_all(
         |      regexp_replace(te, '${Pii.Ipv4Pattern}',
         |        '${Pii.IpToken}', 'g'), '${Pii.PhonePattern}'))
         |  + len(regexp_extract_all(te, '${Pii.Ipv4Pattern}')) AS n_pii
         |  FROM em),
         |r AS (SELECT t.source AS src,
         |  coalesce(len(sh.g) > 0
         |    AND round(CAST(len(list_distinct(t.ts)) AS DOUBLE)
         |      / len(t.ts), 6) >= $CurateQualityMin
         |    AND round(1.0 - CAST(len(list_distinct(sh.g)) AS DOUBLE)
         |      / len(sh.g), 6) <= $CurateDupMax, false) AS a_pass,
         |  coalesce(pii.n_pii = 0, false) AS b_pass
         |  FROM t JOIN sh USING (doc_id) JOIN pii USING (doc_id)),
         |c AS (SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(*) FILTER (WHERE a_pass) AS BIGINT) AS n_a_pass,
         |  CAST(count(*) FILTER (WHERE b_pass) AS BIGINT) AS n_b_pass,
         |  CAST(count(*) FILTER (WHERE a_pass AND b_pass) AS BIGINT)
         |    AS n_both
         |  FROM r GROUP BY 1),
         |d AS (SELECT *,
         |  n_docs - n_a_pass - n_b_pass + 2 * n_both AS n_agree,
         |  CAST(n_a_pass AS HUGEINT) * n_b_pass
         |    + CAST(n_docs - n_a_pass AS HUGEINT) * (n_docs - n_b_pass)
         |    AS pe_num
         |  FROM c)
         |SELECT src, n_docs, n_a_pass, n_b_pass, n_both,
         |  n_a_pass - n_both AS n_only_a,
         |  n_b_pass - n_both AS n_only_b,
         |  CAST(CAST(n_agree AS HUGEINT) * 1000000 // n_docs AS BIGINT)
         |    AS po_ppm,
         |  CAST(pe_num * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs)
         |    AS BIGINT) AS pe_ppm,
         |  CASE WHEN CAST(n_docs AS HUGEINT) * n_docs = pe_num
         |    THEN CAST(NULL AS BIGINT)
         |  WHEN CAST(n_docs AS HUGEINT) * n_agree >= pe_num
         |    THEN CAST((CAST(n_docs AS HUGEINT) * n_agree - pe_num)
         |      * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs - pe_num)
         |      AS BIGINT)
         |  ELSE -CAST((pe_num - CAST(n_docs AS HUGEINT) * n_agree)
         |      * 1000000 // (CAST(n_docs AS HUGEINT) * n_docs - pe_num)
         |      AS BIGINT)
         |  END AS kappa_micro,
         |  CASE WHEN n_a_pass + n_b_pass - 2 * n_both = 0
         |    THEN CAST(NULL AS BIGINT)
         |  ELSE CAST(CAST(n_a_pass - n_b_pass AS HUGEINT)
         |      * (n_a_pass - n_b_pass) * 1000000
         |      // (n_a_pass + n_b_pass - 2 * n_both) AS BIGINT)
         |  END AS mcnemar_micro
         |FROM d ORDER BY src""".stripMargin,

    // x155: per-field (value, pass) rollups off one gate-signal CTE,
    // per-value Gini terms floored individually in HUGEINT, and the
    // field list LEFT-JOINED from a literal array so an empty corpus
    // still yields one all-zero row per field (the x148 empty-parity
    // lesson applied up front)
    "x155_gini_gain" ->
      s"""WITH t AS (SELECT doc_id, lang, source,
         |   n_chars // $KAnonBucket AS len_bucket,
         |   string_split(text, ' ') AS ts FROM documents),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM t),
         |sig AS (SELECT t.lang, t.source, t.len_bucket,
         |  coalesce(len(sh.g) > 0
         |    AND round(CAST(len(list_distinct(t.ts)) AS DOUBLE)
         |      / len(t.ts), 6) >= $CurateQualityMin
         |    AND round(1.0 - CAST(len(list_distinct(sh.g)) AS DOUBLE)
         |      / len(sh.g), 6) <= $CurateDupMax, false) AS pass
         |  FROM t JOIN sh USING (doc_id)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(count(*) FILTER (WHERE pass) AS BIGINT) AS p FROM sig),
         |pv AS (
         |  SELECT 'lang' AS field, CAST(lang AS VARCHAR) AS v,
         |    CAST(count(*) AS BIGINT) AS n_v,
         |    CAST(count(*) FILTER (WHERE pass) AS BIGINT) AS p_v
         |  FROM sig GROUP BY 2
         |  UNION ALL SELECT 'len_bucket', CAST(len_bucket AS VARCHAR),
         |    CAST(count(*) AS BIGINT),
         |    CAST(count(*) FILTER (WHERE pass) AS BIGINT)
         |  FROM sig GROUP BY 2
         |  UNION ALL SELECT 'source', source,
         |    CAST(count(*) AS BIGINT),
         |    CAST(count(*) FILTER (WHERE pass) AS BIGINT)
         |  FROM sig GROUP BY 2),
         |terms AS (SELECT field,
         |  CAST(CAST(2 AS HUGEINT) * p_v * (n_v - p_v) * 1000000
         |    // (CAST(n_v AS HUGEINT) * tot.n) AS BIGINT) AS term
         |  FROM pv CROSS JOIN tot),
         |agg AS (SELECT field, CAST(count(*) AS BIGINT) AS n_values,
         |  CAST(coalesce(sum(term), 0) AS BIGINT) AS gini_cond_ppm
         |  FROM terms GROUP BY field),
         |flds AS (SELECT unnest(
         |  ARRAY['lang', 'len_bucket', 'source']) AS field)
         |SELECT flds.field,
         |  coalesce(agg.n_values, 0) AS n_values,
         |  tot.n AS n_docs, tot.p AS n_pass,
         |  CASE WHEN tot.n = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(CAST(2 AS HUGEINT) * tot.p * (tot.n - tot.p)
         |      * 1000000 // (CAST(tot.n AS HUGEINT) * tot.n) AS BIGINT)
         |  END AS gini_base_ppm,
         |  coalesce(agg.gini_cond_ppm, 0) AS gini_cond_ppm,
         |  CASE WHEN tot.n = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(CAST(2 AS HUGEINT) * tot.p * (tot.n - tot.p)
         |      * 1000000 // (CAST(tot.n AS HUGEINT) * tot.n) AS BIGINT)
         |  END - coalesce(agg.gini_cond_ppm, 0) AS gain_ppm
         |FROM flds LEFT JOIN agg ON agg.field = flds.field
         |CROSS JOIN tot ORDER BY flds.field""".stripMargin,

    // x162: the x139 chain WITHOUT the threshold cut, joined back to
    // the signature table for the lane-agreement estimate; per-pair
    // integer error lanes folded by agreement level
    "x162_minhash_fidelity" ->
      s"""WITH $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |ag AS (SELECT j.d1, j.d2,
         |  CAST(round(j.jac * 1000000) AS BIGINT) AS jac_micro,
         |  ${(0 until 16).map(i =>
             s"CASE WHEN a.sig$i = b.sig$i THEN 1 ELSE 0 END")
             .mkString(" + ")} AS n_agree
         |  FROM j JOIN sig a ON a.doc_id = j.d1
         |  JOIN sig b ON b.doc_id = j.d2),
         |er AS (SELECT CAST(n_agree AS BIGINT) AS n_agree, jac_micro,
         |  CAST(n_agree AS BIGINT) * 1000000 // 16 AS est_micro,
         |  abs(CAST(n_agree AS BIGINT) * 1000000 // 16 - jac_micro)
         |    AS err FROM ag)
         |SELECT n_agree, CAST(max(est_micro) AS BIGINT) AS est_jac_micro,
         |  CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(CAST(sum(jac_micro) AS HUGEINT) // count(*) AS BIGINT)
         |    AS avg_jac_micro,
         |  CAST(CAST(sum(err) AS HUGEINT) // count(*) AS BIGINT)
         |    AS avg_abs_err_micro,
         |  CAST(max(err) AS BIGINT) AS max_abs_err_micro
         |FROM er GROUP BY n_agree ORDER BY n_agree""".stripMargin,

    // x163: the (source, word) distinct exchange, word-keyed pair
    // intersections, pair grid from the size table so zero-overlap
    // pairs keep a row
    "x163_vocab_overlap" ->
      s"""WITH sw AS (SELECT DISTINCT source AS src,
         |   unnest(string_split(text, ' ')) AS w
         |  FROM documents
         |  WHERE source IS NOT NULL AND text IS NOT NULL),
         |sz AS (SELECT src, CAST(count(*) AS BIGINT) AS v
         |  FROM sw GROUP BY 1),
         |iv AS (SELECT a.src AS src_a, b.src AS src_b,
         |   CAST(count(*) AS BIGINT) AS n_shared
         |  FROM sw a JOIN sw b ON a.w = b.w AND a.src < b.src
         |  GROUP BY 1, 2)
         |SELECT sa.src AS src_a, sb.src AS src_b, sa.v AS v_a,
         |  sb.v AS v_b, coalesce(iv.n_shared, 0) AS n_shared,
         |  CAST(CAST(coalesce(iv.n_shared, 0) AS HUGEINT) * 1000000
         |    // (sa.v + sb.v - coalesce(iv.n_shared, 0)) AS BIGINT)
         |    AS jaccard_ppm
         |FROM sz sa JOIN sz sb ON sa.src < sb.src
         |LEFT JOIN iv ON iv.src_a = sa.src AND iv.src_b = sb.src
         |ORDER BY src_a, src_b""".stripMargin,

    // x161: label centroids via the m1 floorDiv rule, all-pairs label
    // distances, a = own-label dist, b = min over others, the signed
    // micro floor mirrored branch for branch (negatives are real here)
    "x161_label_separation" ->
      s"""WITH e AS (SELECT vec_id, label,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings WHERE label IS NOT NULL),
         |u AS (SELECT label, unnest(generate_series(1, len(q))) AS d, q
         |  FROM e),
         |s AS (SELECT label, d, sum(CAST(q[d] AS BIGINT)) AS sv,
         |   count(*) AS n FROM u GROUP BY 1, 2),
         |c AS (SELECT label, list(CAST(
         |    (sv // n) - CASE WHEN sv < 0 AND sv % n <> 0 THEN 1 ELSE 0 END
         |    AS DOUBLE) ORDER BY d) AS cq
         |  FROM s GROUP BY 1),
         |dall AS (SELECT e.vec_id, e.label, c.label AS cl,
         |  list_dot_product(e.q, e.q) - 2 * list_dot_product(e.q, c.cq)
         |    + list_dot_product(c.cq, c.cq) AS dist
         |  FROM e CROSS JOIN c),
         |a AS (SELECT vec_id, label, CAST(dist AS BIGINT) AS a
         |  FROM dall WHERE cl = label),
         |b AS (SELECT vec_id, CAST(min(dist) AS BIGINT) AS b
         |  FROM dall WHERE cl <> label GROUP BY 1),
         |sm AS (SELECT a.label, a.a, b.b,
         |  CASE WHEN greatest(a.a, b.b) = 0 THEN CAST(0 AS BIGINT)
         |  WHEN b.b >= a.a THEN CAST(CAST(b.b - a.a AS HUGEINT)
         |    * 1000000 // greatest(a.a, b.b) AS BIGINT)
         |  ELSE -CAST(CAST(a.a - b.b AS HUGEINT) * 1000000
         |    // greatest(a.a, b.b) AS BIGINT) END AS sm
         |  FROM a JOIN b USING (vec_id))
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(count(*) FILTER (WHERE b < a) AS BIGINT) AS n_confused,
         |  CAST(CAST(count(*) FILTER (WHERE b < a) AS HUGEINT)
         |    * 1000000 // count(*) AS BIGINT) AS confused_ppm,
         |  CASE WHEN sum(sm) >= 0
         |    THEN CAST(CAST(sum(sm) AS HUGEINT) // count(*) AS BIGINT)
         |    ELSE -CAST(CAST(-sum(sm) AS HUGEINT) // count(*) AS BIGINT)
         |  END AS avg_sep_micro,
         |  CAST(min(sm) AS BIGINT) AS min_sep_micro,
         |  CAST(max(sm) AS BIGINT) AS max_sep_micro
         |FROM sm GROUP BY label ORDER BY label""".stripMargin,

    // x160: the cross-grain fold shared across three scoped-WITH
    // branches; margins x margins LEFT JOIN observed (NULL-SAFE per
    // attribute), per-cell round(1e6·(O-E)²/E) summed as integers,
    // IEEE sqrt for V — every double op mirrored term for term
    "x160_cramers_v" -> {
      def pairSql(fa: String, fb: String) =
        s"""(WITH ra AS (SELECT $fa AS va, CAST(sum(n_c) AS BIGINT) AS r
           |    FROM crossg GROUP BY 1),
           |  rb AS (SELECT $fb AS vb, CAST(sum(n_c) AS BIGINT) AS c
           |    FROM crossg GROUP BY 1),
           |  obs AS (SELECT $fa AS va, $fb AS vb,
           |    CAST(sum(n_c) AS BIGINT) AS o FROM crossg GROUP BY 1, 2),
           |  cells AS (SELECT ra.r, rb.c, coalesce(obs.o, 0) AS o
           |    FROM ra CROSS JOIN rb LEFT JOIN obs
           |    ON obs.va IS NOT DISTINCT FROM ra.va
           |    AND obs.vb IS NOT DISTINCT FROM rb.vb),
           |  chi AS (SELECT CAST(coalesce(sum(CAST(round(
           |      (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / tot.n)
           |      * (CAST(o AS DOUBLE) - CAST(r AS DOUBLE) * c / tot.n)
           |      / (CAST(r AS DOUBLE) * c / tot.n) * 1000000)
           |      AS BIGINT)), 0) AS BIGINT) AS chi2_micro
           |    FROM cells CROSS JOIN tot),
           |  na AS (SELECT CAST(count(*) AS BIGINT) AS n_a FROM ra),
           |  nb AS (SELECT CAST(count(*) AS BIGINT) AS n_b FROM rb)
           |  SELECT '$fa' AS field_a, '$fb' AS field_b, tot.n AS n_docs,
           |    na.n_a, nb.n_b,
           |    CASE WHEN na.n_a = 0 OR nb.n_b = 0 THEN CAST(0 AS BIGINT)
           |      ELSE (na.n_a - 1) * (nb.n_b - 1) END AS dof,
           |    chi.chi2_micro,
           |    CASE WHEN (CASE WHEN na.n_a = 0 OR nb.n_b = 0
           |        THEN 0 ELSE (na.n_a - 1) * (nb.n_b - 1) END) = 0
           |        OR tot.n = 0 THEN CAST(NULL AS BIGINT)
           |      ELSE CAST(round(sqrt(
           |        (CAST(chi.chi2_micro AS DOUBLE) / 1000000)
           |        / (CAST(tot.n AS DOUBLE)
           |           * least(na.n_a - 1, nb.n_b - 1))) * 1000000)
           |        AS BIGINT) END AS cramers_v_micro
           |  FROM chi CROSS JOIN tot CROSS JOIN na CROSS JOIN nb)"""
          .stripMargin
      s"""WITH base AS (SELECT lang, source,
         |   n_chars // $KAnonBucket AS len_bucket FROM documents),
         |crossg AS (SELECT lang, source, len_bucket,
         |   CAST(count(*) AS BIGINT) AS n_c
         |  FROM base GROUP BY 1, 2, 3),
         |tot AS (SELECT CAST(coalesce(sum(n_c), 0) AS BIGINT) AS n
         |  FROM crossg)
         |SELECT * FROM (
         |${pairSql("lang", "source")}
         |UNION ALL
         |${pairSql("lang", "len_bucket")}
         |UNION ALL
         |${pairSql("source", "len_bucket")}
         |) ORDER BY field_a, field_b""".stripMargin
    },

    // x158: the x144 signal CTE priced per grid arm — arms LEFT JOIN
    // the signal rows (not inner: an empty corpus keeps one all-zero
    // row per arm, the x155 empty-parity lesson), exact gate
    // predicate per arm, HUGEINT ppm floors
    "x158_gate_sweep" -> {
      val qArr = QualitySweepArms
        .map(q => s"CAST($q AS DOUBLE)").mkString(", ")
      val dArr = DupSweepArms
        .map(d => s"CAST($d AS DOUBLE)").mkString(", ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |sh AS (SELECT doc_id, list_transform(generate_series(1, len(ts) - 1),
         |  i -> ts[i] || ' ' || ts[i+1]) AS g FROM t),
         |sig AS (SELECT coalesce(len(t.ts), 0) AS tok,
         |  len(sh.g) AS n_ngrams,
         |  round(CAST(len(list_distinct(t.ts)) AS DOUBLE)
         |    / len(t.ts), 6) AS quality,
         |  round(1.0 - CAST(len(list_distinct(sh.g)) AS DOUBLE)
         |    / len(sh.g), 6) AS dup
         |  FROM t JOIN sh USING (doc_id)),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(coalesce(sum(tok), 0) AS BIGINT) AS nt FROM sig),
         |arms AS (SELECT q.quality_min, d.dup_max
         |  FROM (SELECT unnest(ARRAY[$qArr]) AS quality_min) q
         |  CROSS JOIN (SELECT unnest(ARRAY[$dArr]) AS dup_max) d),
         |k AS (SELECT a.quality_min, a.dup_max,
         |  CAST(count(*) FILTER (WHERE coalesce(s.n_ngrams > 0
         |    AND s.quality >= a.quality_min
         |    AND s.dup <= a.dup_max, false)) AS BIGINT) AS kept,
         |  CAST(coalesce(sum(s.tok) FILTER (WHERE coalesce(
         |    s.n_ngrams > 0 AND s.quality >= a.quality_min
         |    AND s.dup <= a.dup_max, false)), 0) AS BIGINT) AS kept_tok
         |  FROM arms a LEFT JOIN sig s ON true GROUP BY 1, 2)
         |SELECT k.quality_min, k.dup_max, tot.n AS n_docs,
         |  k.kept AS n_docs_kept,
         |  CASE WHEN tot.n = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(CAST(k.kept AS HUGEINT) * 1000000 // tot.n
         |      AS BIGINT) END AS docs_kept_ppm,
         |  tot.nt AS n_tokens, k.kept_tok AS n_tokens_kept,
         |  CASE WHEN tot.nt = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(CAST(k.kept_tok AS HUGEINT) * 1000000 // tot.nt
         |      AS BIGINT) END AS tokens_kept_ppm
         |FROM k CROSS JOIN tot
         |ORDER BY quality_min, dup_max""".stripMargin
    },

    // x159: the per-word vowel-group fold replayed relationally —
    // list_transform/list_filter on the same lowercased regex, HUGEINT
    // ppm floors, zero-guarded like the Spark projection
    "x159_readability" ->
      s"""WITH t AS (SELECT lang, string_split(text, ' ') AS ts
         |  FROM documents WHERE lang IS NOT NULL),
         |d AS (SELECT lang,
         |  CAST(coalesce(len(ts), 0) AS BIGINT) AS w,
         |  CAST(coalesce(list_sum(list_transform(ts, x ->
         |    greatest(1, len(regexp_extract_all(lower(x),
         |      '[aeiouy]+'))))), 0) AS BIGINT) AS s,
         |  CAST(coalesce(len(list_filter(ts, x ->
         |    len(regexp_extract_all(lower(x), '[aeiouy]+')) >= 3)), 0)
         |    AS BIGINT) AS c
         |  FROM t)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(w) AS BIGINT) AS n_words,
         |  CAST(sum(s) AS BIGINT) AS n_syllables,
         |  CASE WHEN sum(w) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(CAST(sum(s) AS HUGEINT) * 1000000 // sum(w)
         |      AS BIGINT) END AS syll_per_word_micro,
         |  CAST(sum(c) AS BIGINT) AS n_complex,
         |  CASE WHEN sum(w) = 0 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(CAST(sum(c) AS HUGEINT) * 1000000 // sum(w)
         |      AS BIGINT) END AS complex_ppm
         |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    // x157: the x139 verified-pair chain, quality-win fold to the
    // source-pair matrix, then the Zermelo fixed point unrolled
    // x153-style — HUGEINT per-edge floors mirroring the BigInt
    // driver iteration lane for lane. The edge matrix and every p_k
    // are MATERIALIZED: each d_k references p_{k-1} twice, and under
    // DuckDB's default CTE inlining that doubles the expansion per
    // level — 2^iters copies of the whole upstream LSH pipeline
    // (measured: fd exhaustion at iters = 5 before the keyword)
    "x157_bradley_terry" -> {
      val iter = (k: Int) =>
        s"""d$k AS (SELECT e.i AS src,
           |  sum((CAST(e.n_ij AS HUGEINT) * 1000000 * 1000000)
           |    // (pi.p + pj.p)) AS denom
           |  FROM e JOIN p${k - 1} pi ON pi.src = e.i
           |  JOIN p${k - 1} pj ON pj.src = e.j GROUP BY 1),
           |r$k AS (SELECT d$k.src,
           |  (wt.w * 1000000 * 1000000 * 1000000) // d$k.denom AS raw
           |  FROM d$k JOIN wt ON wt.src = d$k.src),
           |t$k AS (SELECT sum(raw) AS tot FROM r$k),
           |p$k AS MATERIALIZED (SELECT r$k.src,
           |    (r$k.raw * ns.s * 1000000) // t$k.tot AS p
           |  FROM r$k CROSS JOIN t$k CROSS JOIN ns)""".stripMargin
      s"""WITH $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2 FROM j WHERE jac >= $JaccardThreshold),
         |qual AS (SELECT doc_id, source,
         |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |    / len(string_split(text, ' ')), 6) AS quality
         |  FROM documents WHERE source IS NOT NULL),
         |m AS (SELECT a.source AS s1, b.source AS s2,
         |   a.quality AS q1, b.quality AS q2
         |  FROM p JOIN qual a ON a.doc_id = p.d1
         |  JOIN qual b ON b.doc_id = p.d2
         |  WHERE a.source <> b.source AND a.quality <> b.quality),
         |wm AS (SELECT CASE WHEN q1 > q2 THEN s1 ELSE s2 END AS w,
         |   CASE WHEN q1 > q2 THEN s2 ELSE s1 END AS l,
         |   CAST(count(*) AS BIGINT) AS n_w
         |  FROM m GROUP BY 1, 2),
         |up AS (SELECT least(w, l) AS a, greatest(w, l) AS b,
         |   CAST(coalesce(sum(CASE WHEN w < l THEN n_w END), 0)
         |     AS BIGINT) AS w_ab,
         |   CAST(coalesce(sum(CASE WHEN w > l THEN n_w END), 0)
         |     AS BIGINT) AS w_ba
         |  FROM wm GROUP BY 1, 2),
         |e AS MATERIALIZED (SELECT a AS i, b AS j, w_ab + 1 AS w_ij,
         |    w_ab + w_ba + 2 AS n_ij FROM up
         |  UNION ALL SELECT b, a, w_ba + 1, w_ab + w_ba + 2 FROM up),
         |srcs AS (SELECT DISTINCT i AS src FROM e),
         |ns AS (SELECT CAST(count(*) AS HUGEINT) AS s FROM srcs),
         |wt AS (SELECT i AS src, CAST(sum(w_ij) AS HUGEINT) AS w
         |  FROM e GROUP BY 1),
         |p0 AS MATERIALIZED (SELECT src, CAST(1000000 AS HUGEINT) AS p
         |  FROM srcs),
         |${(1 to BtIters).map(iter).mkString(",\n")},
         |ragg AS (SELECT i AS src, CAST(sum(n_ij - 2) AS BIGINT)
         |    AS n_comps,
         |  CAST(sum(w_ij - 1) AS BIGINT) AS n_wins FROM e GROUP BY 1)
         |SELECT ragg.src, ragg.n_comps, ragg.n_wins,
         |  CAST(p$BtIters.p AS BIGINT) AS strength_micro
         |FROM ragg JOIN p$BtIters ON p$BtIters.src = ragg.src
         |ORDER BY strength_micro DESC, ragg.src""".stripMargin
    },

    // x153: the x28 fixed-point iteration chain over the word
    // co-occurrence graph; zipped parallel unnests give the adjacent
    // bigrams, UNION (not UNION ALL) dedups the symmetric edge set
    "x153_textrank" -> {
      val iter = (k: Int) =>
        s"""i$k AS (SELECT e.dst AS node,
           |  sum(r.rank * 85 // (od.outdeg * 100)) AS inflow
           |  FROM e JOIN r${k - 1} r ON r.node = e.src
           |  JOIN od ON od.src = e.src GROUP BY 1),
           |r$k AS (SELECT nodes.node, b.b + coalesce(i$k.inflow, 0) AS rank
           |  FROM nodes LEFT JOIN i$k USING (node) CROSS JOIN base b)""".stripMargin
      s"""WITH tk AS (SELECT string_split(text, ' ') AS ts
         |  FROM documents WHERE text IS NOT NULL),
         |bg AS (SELECT unnest(ts[1:len(ts)-1]) AS a,
         |   unnest(ts[2:len(ts)]) AS b FROM tk),
         |bf AS (SELECT a, b FROM bg
         |  WHERE a <> b AND a <> '' AND b <> ''),
         |e AS (SELECT a AS src, b AS dst FROM bf
         |  UNION SELECT b AS src, a AS dst FROM bf),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
         |n AS (SELECT count(*) AS n FROM nodes),
         |base AS (SELECT 15 * ${Graph.Scale} // (100 * n) AS b FROM n),
         |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         |r0 AS (SELECT node, ${Graph.Scale} // n.n AS rank
         |  FROM nodes CROSS JOIN n),
         |${(1 to PageRankIters).map(iter).mkString(",\n")}
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r$PageRankIters
         |ORDER BY rank DESC, node LIMIT $TextRankTopK""".stripMargin
    },

    // x130: the VMR identity replayed in HUGEINT (both engines floor-
    // divide non-negative lanes — Cauchy-Schwarz keeps the numerator
    // >= 0, so floor == trunc)
    "x130_burstiness" ->
      s"""WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents WHERE text IS NOT NULL),
         |cwd AS (SELECT doc_id, w, count(*) AS c FROM tk GROUP BY 1, 2),
         |nd AS (SELECT count(*) AS n FROM documents
         |  WHERE text IS NOT NULL),
         |ag AS (SELECT w, CAST(count(*) AS BIGINT) AS df,
         |   CAST(sum(c) AS BIGINT) AS n_occ,
         |   sum(CAST(c AS HUGEINT) * c) AS s2
         |  FROM cwd GROUP BY 1)
         |SELECT w, df, n_occ,
         |  CAST((CAST(nd.n AS HUGEINT) * s2
         |      - CAST(n_occ AS HUGEINT) * n_occ) * 1000000
         |    // (CAST(nd.n AS HUGEINT) * n_occ) AS BIGINT) AS vmr_micro
         |FROM ag, nd WHERE df >= $BurstMinDf ORDER BY w""".stripMargin,

    // x129: the relational explode+group twin of the sorted-run fold —
    // per-codepoint slices, per-char counts, micro-nat terms rounded
    // to BIGINT BEFORE summing (order-independent exact sum), dense
    // over non-null input via the LEFT JOIN back to documents
    "x129_char_entropy" ->
      s"""WITH ch AS (SELECT doc_id, t[i:i] AS ch
         |  FROM (SELECT doc_id, text AS t FROM documents
         |    WHERE text IS NOT NULL) b,
         |  LATERAL unnest(generate_series(1, len(t))) AS u(i)),
         |ct AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         |   CAST(count(*) AS BIGINT) AS n_distinct,
         |   CAST(sum(CAST(round(ln(CAST(c AS DOUBLE)) * c * 1000000)
         |     AS BIGINT)) AS BIGINT) AS s_micro
         |  FROM ct GROUP BY 1),
         |ent AS (SELECT doc_id, n_chars, n_distinct, s_micro,
         |   CASE WHEN n_chars = 0 THEN CAST(0 AS BIGINT)
         |   ELSE CAST(round(ln(CAST(n_chars AS DOUBLE)) * 1000000)
         |       AS BIGINT)
         |     - s_micro // n_chars END AS entropy_micro
         |  FROM agg),
         |fin AS (SELECT doc_id, n_chars, n_distinct, s_micro,
         |   entropy_micro,
         |   CASE WHEN n_distinct > 1 AND entropy_micro > 0
         |   THEN (entropy_micro * 1000000)
         |     // CAST(round(ln(CAST(n_distinct AS DOUBLE)) * 1000000)
         |       AS BIGINT)
         |   ELSE CAST(0 AS BIGINT) END AS norm_ppm
         |  FROM ent)
         |SELECT doc.doc_id,
         |  coalesce(f.n_chars, CAST(0 AS BIGINT)) AS n_chars,
         |  coalesce(f.n_distinct, CAST(0 AS BIGINT)) AS n_distinct,
         |  coalesce(f.s_micro, CAST(0 AS BIGINT)) AS s_micro,
         |  coalesce(f.entropy_micro, CAST(0 AS BIGINT)) AS entropy_micro,
         |  coalesce(f.norm_ppm, CAST(0 AS BIGINT)) AS norm_ppm
         |FROM documents doc LEFT JOIN fin f USING (doc_id)
         |WHERE doc.text IS NOT NULL
         |ORDER BY doc.doc_id""".stripMargin,

    // X126: the pad/truncate table replayed over a lateral length grid
    "x126_seq_len_audit" -> {
      val grid = SeqLenGrid.mkString("[", ", ", "]")
      s"""WITH d AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT)
         |    AS t FROM documents WHERE text IS NOT NULL),
         |c AS (SELECT t, CAST(l AS BIGINT) AS seq_len
         |  FROM d, LATERAL unnest($grid) AS u(l)),
         |g AS (SELECT seq_len, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(t) AS BIGINT) AS n_tokens,
         |  CAST(sum((t + seq_len - 1) // seq_len) AS BIGINT) AS n_seqs,
         |  CAST(sum(least(t, seq_len)) AS BIGINT) AS n_tokens_kept
         |  FROM c GROUP BY 1)
         |SELECT seq_len, n_docs, n_tokens, n_seqs,
         |  CAST((CAST(n_seqs AS HUGEINT) * seq_len - n_tokens) * 1000000
         |    // (CAST(n_seqs AS HUGEINT) * seq_len) AS BIGINT)
         |    AS pad_waste_ppm,
         |  n_tokens_kept,
         |  CAST((CAST(n_tokens AS HUGEINT) - n_tokens_kept) * 1000000
         |    // CAST(n_tokens AS HUGEINT) AS BIGINT) AS trunc_loss_ppm
         |FROM g ORDER BY seq_len""".stripMargin
    },

    // X125: the int8 audit replayed with DuckDB list lambdas — same
    // nonnegative integral-div rounding, HUGEINT ppm ratio
    "x125_int8_quant" ->
      """WITH e AS (SELECT vec_id,
        |  list_transform(embedding,
        |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |m AS (SELECT vec_id, q,
        |  list_max(list_transform(q, y -> abs(y))) AS maxabs FROM e),
        |t AS (SELECT vec_id, maxabs,
        |  CASE WHEN maxabs = 0 THEN 0 ELSE
        |    list_sum(list_transform(q, y ->
        |      (127 * y - CAST(sign(y) AS BIGINT) *
        |        ((254 * abs(y) + maxabs) // (2 * maxabs)) * maxabs)
        |      * (127 * y - CAST(sign(y) AS BIGINT) *
        |        ((254 * abs(y) + maxabs) // (2 * maxabs)) * maxabs)))
        |  END AS err_num,
        |  list_sum(list_transform(q, y -> y * y)) AS n2
        |  FROM m)
        |SELECT vec_id, CAST(maxabs AS BIGINT) AS maxabs,
        |  CAST(err_num AS BIGINT) AS err_num,
        |  CAST(CASE WHEN n2 = 0 THEN 0
        |    ELSE (CAST(err_num AS HUGEINT) * 1000000)
        |      // (16129 * CAST(n2 AS HUGEINT))
        |  END AS BIGINT) AS err_ppm
        |FROM t ORDER BY vec_id""".stripMargin,

    // the NB prediction disagreeing with the declared label — the
    // language-mismatch audit; embeds the full x42 pipeline
    "x46_lang_mismatch" ->
      s"""WITH nb AS (SELECT doc_id, pred, score_micro FROM ($nbQualitySql))
         |SELECT d.doc_id, d.lang, nb.pred, nb.score_micro
         |FROM nb JOIN documents d ON d.doc_id = nb.doc_id
         |WHERE nb.pred <> d.lang
         |ORDER BY d.doc_id""".stripMargin,

    // positional window fingerprints -> hash-matched (pa, pb) pairs ->
    // gaps-and-islands per (pair, diagonal); mirrors Dedup.substringRuns
    "x41_substring_dedup" ->
      s"""WITH $substrRunCtes
         |SELECT d1, d2, a_start, b_start, span_len FROM g
         |WHERE span_len >= $SubstrMinSpan
         |ORDER BY d1, d2, a_start, b_start""".stripMargin,

    // same t/w CTEs as x41; the rightmost-tie argmin is the identical
    // encoded-string min, decoded back to (p, h)
    "x47_winnow" ->
      s"""WITH $substrRunCtes,
         |e AS (SELECT doc_id, p,
         |    h || '|' || lpad(CAST(1000000000 - p AS VARCHAR), 10, '0') AS enc,
         |    max(p) OVER (PARTITION BY doc_id) AS maxp
         |  FROM w),
         |f AS (SELECT doc_id, p, maxp,
         |    min(enc) OVER (PARTITION BY doc_id ORDER BY p
         |      ROWS BETWEEN CURRENT ROW AND ${WinnowW - 1} FOLLOWING) AS mw
         |  FROM e),
         |sel AS (SELECT DISTINCT doc_id, mw FROM f
         |  WHERE p <= maxp - ${WinnowW - 1})
         |SELECT doc_id,
         |  CAST(1000000000 - CAST(substring(mw, 34, 10) AS BIGINT) AS INTEGER) AS p,
         |  substring(mw, 1, 32) AS h
         |FROM sel ORDER BY doc_id, p""".stripMargin,

    "x49_cdc_chunks" ->
      s"""WITH $cdcChunkCtes
         |SELECT doc_id, chunk_idx, start, clen, chunk_md5 FROM ck
         |ORDER BY doc_id, chunk_idx""".stripMargin,

    "x50_chunk_dedup" ->
      s"""WITH $cdcChunkCtes
         |SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies,
         |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |FROM ck GROUP BY 1 HAVING count(*) > 1
         |ORDER BY chunk_md5""".stripMargin,

    // the pruned two-tier form produces IDENTICAL rows to the
    // exhaustive pipeline above the guarantee threshold — the oracle is
    // the exhaustive SQL itself, which is exactly the claim being gated
    "x48_substring_pruned" ->
      s"""WITH $substrRunCtes
         |SELECT d1, d2, a_start, b_start, span_len FROM g
         |WHERE span_len >= ${SubstrK + WinnowW - 1}
         |ORDER BY d1, d2, a_start, b_start""".stripMargin,

    // the runs' d2 side drops its duplicated token positions (interval
    // union per doc); only affected docs rebuild, others pass through
    "x45_remove_spans" ->
      s"""WITH $substrRunCtes,
         |rm AS (SELECT DISTINCT doc_id, p FROM (
         |  SELECT d2 AS doc_id,
         |    unnest(generate_series(b_start, b_start + span_len - 1)) AS p
         |  FROM g WHERE span_len >= $SubstrMinSpan)),
         |aff AS (SELECT DISTINCT doc_id FROM rm),
         |tk AS (SELECT t.doc_id, p - 1 AS p, ts[p] AS w
         |  FROM t JOIN aff ON aff.doc_id = t.doc_id,
         |  LATERAL unnest(generate_series(1, len(ts))) AS uu(p)),
         |rb AS (SELECT tk.doc_id,
         |    coalesce(array_to_string(list(tk.w ORDER BY tk.p)
         |      FILTER (WHERE rm.p IS NULL), ' '), '') AS clean_text,
         |    CAST(count(*) FILTER (WHERE rm.p IS NOT NULL) AS BIGINT)
         |      AS n_removed
         |  FROM tk LEFT JOIN rm ON rm.doc_id = tk.doc_id AND rm.p = tk.p
         |  GROUP BY tk.doc_id)
         |SELECT d.doc_id, coalesce(rb.clean_text, d.text) AS clean_text,
         |  CAST(coalesce(rb.n_removed, 0) AS BIGINT) AS n_removed
         |FROM documents d LEFT JOIN rb ON rb.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // the LSH pair stage (identical CTEs to x1_minhash_lsh) joined to
    // the split CASE on both endpoints; only boundary-crossing pairs out
    "x38_split_leakage" -> {
      val splitCase =
        s"""CASE WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
           |         < '${Sample.threshold(SplitTrain)}' THEN 'train'
           |       WHEN substring(md5(CAST(doc_id AS VARCHAR) || '$SplitSeed'), 1, 8)
           |         < '${Sample.threshold(SplitTrain + SplitValid)}' THEN 'valid'
           |       ELSE 'test' END""".stripMargin
      s"""WITH $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |inter AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |j AS (SELECT d1, d2,
         |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM inter JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2),
         |p AS (SELECT d1, d2, jac FROM j WHERE jac >= $JaccardThreshold),
         |sp AS (SELECT doc_id, $splitCase AS split FROM documents)
         |SELECT p.d1, p.d2, p.jac, s1.split AS split1, s2.split AS split2
         |FROM p JOIN sp s1 ON s1.doc_id = p.d1
         |JOIN sp s2 ON s2.doc_id = p.d2
         |WHERE s1.split <> s2.split
         |ORDER BY d1, d2""".stripMargin
    },

    // identical md5-prefix bucket/sign hashes; HAVING drops cancelled
    // buckets like the Spark-side filter
    "x39_feature_hash" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |  FROM documents)
         |SELECT doc_id,
         |  ('0x' || substring(md5('$FeatureHashSeed|' || token), 1, 8))::BIGINT
         |    % $FeatureHashDim AS bucket,
         |  CAST(sum(CASE WHEN
         |    ('0x' || substring(md5('${FeatureHashSeed}s|' || token), 1, 1))::INTEGER
         |      % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS weight
         |FROM t GROUP BY 1, 2 HAVING sum(CASE WHEN
         |    ('0x' || substring(md5('${FeatureHashSeed}s|' || token), 1, 1))::INTEGER
         |      % 2 = 0 THEN 1 ELSE -1 END) != 0
         |ORDER BY doc_id, bucket""".stripMargin,

    // 1-based positional match: ts[pos + i] must equal phrase term i
    // (a position past the document end is NULL, never equal)
    "x35_phrase_search" -> {
      val conds = PhraseTerms.zipWithIndex.map { case (t, i) =>
        val esc = t.replace("'", "''")
        if (i == 0) s"ts[pos] = '$esc'" else s"ts[pos + $i] = '$esc'"
      }.mkString(" AND ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |p AS (SELECT doc_id, ts,
         |  unnest(generate_series(1, len(ts))) AS pos FROM t),
         |m AS (SELECT doc_id, pos FROM p WHERE $conds)
         |SELECT doc_id, count(*) AS n_matches,
         |  CAST(min(pos) AS BIGINT) AS first_pos
         |FROM m GROUP BY 1 ORDER BY doc_id""".stripMargin
    },

    // eval 8-gram shingles (the x13 eval set) matched POSITIONALLY
    // against the non-eval corpus, covered token intervals unioned,
    // then the x45 rebuild; 1-based shingle start ii covers 0-based
    // token positions ii-1 .. ii+6
    // the DSIR pipeline replayed relationally: hashed unigram+bigram
    // counts, Laplace-smoothed micro-nat log-ratios (round(ln·10^6) on
    // each side separately, the x42 seam), integer dot-product weights,
    // the same md5-derived Gumbel keys, top-K by (key DESC, id)
    "x61_dsir" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents),
         |g AS (SELECT doc_id, unnest(ts) AS gram FROM t
         |  UNION ALL
         |  SELECT doc_id, unnest(list_transform(
         |    generate_series(1, len(ts) - 1),
         |    i -> ts[i] || ' ' || ts[i+1])) AS gram FROM t),
         |f AS (SELECT doc_id,
         |    ('0x' || substring(md5('$DsirSeed|' || gram), 1, 8))::BIGINT
         |      % $DsirDim AS bucket,
         |    count(*) AS cnt
         |  FROM g GROUP BY 1, 2),
         |raw AS (SELECT bucket, sum(cnt) AS raw_b FROM f GROUP BY 1),
         |tgt AS (SELECT bucket, sum(cnt) AS tgt_b
         |  FROM f JOIN (SELECT doc_id FROM documents WHERE lang = 'en') e
         |    USING (doc_id) GROUP BY 1),
         |tot AS (SELECT (SELECT sum(raw_b) FROM raw) AS raw_tot,
         |  (SELECT coalesce(sum(tgt_b), 0) FROM tgt) AS tgt_tot),
         |r AS (SELECT raw.bucket,
         |    CAST(round(ln(CAST(coalesce(tgt_b, 0) + 1 AS DOUBLE)
         |        / CAST(tgt_tot + $DsirDim AS DOUBLE)) * 1000000) AS BIGINT)
         |    - CAST(round(ln(CAST(raw_b + 1 AS DOUBLE)
         |        / CAST(raw_tot + $DsirDim AS DOUBLE)) * 1000000) AS BIGINT)
         |      AS r_micro
         |  FROM raw LEFT JOIN tgt ON tgt.bucket = raw.bucket, tot),
         |w AS (SELECT f.doc_id,
         |    CAST(sum(f.cnt * r.r_micro) AS BIGINT) AS w_micro
         |  FROM f JOIN r ON r.bucket = f.bucket GROUP BY 1),
         |sel AS (SELECT doc_id, w_micro,
         |    w_micro + CAST(round(-ln(-ln(
         |      ((('0x' || substring(md5(CAST(doc_id AS VARCHAR)
         |        || '${DsirSeed}g'), 1, 8))::BIGINT + 0.5) / 4294967296.0)
         |    )) * 1000000) AS BIGINT) AS key_micro
         |  FROM w
         |  ORDER BY key_micro DESC, doc_id LIMIT $DsirK)
         |SELECT doc_id, w_micro, key_micro FROM sel
         |ORDER BY doc_id""".stripMargin,

    "x60_decontaminate" -> {
      val gram8 = (0 until 8).map(k => s"ts[ii+$k]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts
         |  FROM documents),
         |evd AS (SELECT doc_id FROM documents
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8)
         |    < '${Sample.threshold(0.1)}'),
         |tr AS (SELECT t.* FROM t ANTI JOIN evd ON evd.doc_id = t.doc_id),
         |es AS (SELECT DISTINCT $gram8 AS s
         |  FROM t JOIN evd ON evd.doc_id = t.doc_id,
         |  LATERAL unnest(generate_series(1, len(ts) - 7)) AS u(ii)),
         |ps AS (SELECT doc_id, ii, $gram8 AS s
         |  FROM tr, LATERAL unnest(generate_series(1, len(ts) - 7)) AS u(ii)),
         |mt AS (SELECT ps.doc_id, ps.ii FROM ps JOIN es ON es.s = ps.s),
         |rm AS (SELECT DISTINCT doc_id,
         |    unnest(generate_series(ii - 1, ii + 6)) AS p FROM mt),
         |aff AS (SELECT DISTINCT doc_id FROM rm),
         |tk AS (SELECT t2.doc_id, p - 1 AS p, ts[p] AS w
         |  FROM tr t2 JOIN aff ON aff.doc_id = t2.doc_id,
         |  LATERAL unnest(generate_series(1, len(ts))) AS uu(p)),
         |rb AS (SELECT tk.doc_id,
         |    coalesce(array_to_string(list(tk.w ORDER BY tk.p)
         |      FILTER (WHERE rm.p IS NULL), ' '), '') AS clean_text,
         |    CAST(count(*) FILTER (WHERE rm.p IS NOT NULL) AS BIGINT)
         |      AS n_removed
         |  FROM tk LEFT JOIN rm ON rm.doc_id = tk.doc_id AND rm.p = tk.p
         |  GROUP BY tk.doc_id)
         |SELECT d.doc_id, coalesce(rb.clean_text, d.text) AS clean_text,
         |  CAST(coalesce(rb.n_removed, 0) AS BIGINT) AS n_removed
         |FROM tr d LEFT JOIN rb ON rb.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },

    // the E perceptron epochs re-trained from the raw data, then the
    // summed-snapshot (averaged) classifier over the whole corpus
    "x59_linear_quality" -> perceptronSql,

    // both trained gates as subqueries (the x43/x46 composition
    // pattern), compared per declared language
    "x59_agreement" ->
      s"""WITH nb AS (SELECT doc_id, pred AS nb_pred FROM ($nbQualitySql)),
         |lp AS (SELECT doc_id, pred AS lp_pred FROM ($perceptronSql))
         |SELECT d.lang, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN nb.nb_pred = lp.lp_pred THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_agree,
         |  CAST(sum(CASE WHEN nb.nb_pred = d.lang THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_nb_correct,
         |  CAST(sum(CASE WHEN lp.lp_pred = d.lang THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_lp_correct
         |FROM documents d
         |JOIN nb ON nb.doc_id = d.doc_id
         |JOIN lp ON lp.doc_id = d.doc_id
         |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // the NAIVE exact join over the train slice — the Bloom gate is
    // lossless, so this IS x74's answer (the x48 prune-proof pattern)
    "x74_bloom_decon" -> {
      val gram8 = (0 until 8).map(k => s"ts[i+$k]").mkString(" || ' ' || ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sh8 AS (SELECT DISTINCT doc_id,
         |  unnest(list_transform(generate_series(1, len(ts) - 7), i -> $gram8)) AS s
         |  FROM t),
         |ev AS (SELECT doc_id AS eval_id, s AS es FROM sh8
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8)
         |    < '${Sample.threshold(0.1)}'),
         |evd AS (SELECT doc_id FROM documents
         |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || 'eval'), 1, 8)
         |    < '${Sample.threshold(0.1)}'),
         |trd AS (SELECT doc_id FROM documents
         |  WHERE doc_id NOT IN (SELECT doc_id FROM evd)),
         |tr AS (SELECT sh8.* FROM sh8 JOIN trd USING (doc_id)),
         |hits AS (SELECT doc_id, count(DISTINCT eval_id) AS m
         |  FROM tr JOIN ev ON s = es GROUP BY 1)
         |SELECT trd.doc_id, CAST(coalesce(hits.m, 0) AS BIGINT) AS n_eval_matches
         |FROM trd LEFT JOIN hits USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    },

    // the same HitsIters L1-normalized half-rounds unrolled; HUGEINT
    // re-seats the raw·SCALE product exactly as Spark's DECIMAL(38,0)
    "x75_hits" -> {
      val SC = Graph.Scale
      val iter = (k: Int) =>
        s"""ar$k AS (SELECT e.dst AS node, sum(h.hub) AS raw
           |  FROM e JOIN h${k - 1} h ON h.node = e.src GROUP BY 1),
           |at$k AS (SELECT sum(raw) AS t FROM ar$k),
           |a$k AS (SELECT nodes.node, CASE WHEN at$k.t > 0
           |    THEN CAST(CAST(coalesce(ar$k.raw, 0) AS HUGEINT) * $SC // at$k.t AS BIGINT)
           |    ELSE 0 END AS auth
           |  FROM nodes LEFT JOIN ar$k USING (node) CROSS JOIN at$k),
           |hr$k AS (SELECT e.src AS node, sum(a.auth) AS raw
           |  FROM e JOIN a$k a ON a.node = e.dst GROUP BY 1),
           |ht$k AS (SELECT sum(raw) AS t FROM hr$k),
           |h$k AS (SELECT nodes.node, CASE WHEN ht$k.t > 0
           |    THEN CAST(CAST(coalesce(hr$k.raw, 0) AS HUGEINT) * $SC // ht$k.t AS BIGINT)
           |    ELSE 0 END AS hub
           |  FROM nodes LEFT JOIN hr$k USING (node) CROSS JOIN ht$k)""".stripMargin
      s"""WITH pair AS (SELECT DISTINCT o.o_custkey * 2 AS c,
         |  l.l_suppkey * 2 + 1 AS s
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT c AS src, s AS dst FROM pair),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
         |n AS (SELECT count(*) AS n FROM nodes),
         |h0 AS (SELECT node, $SC // n.n AS hub FROM nodes CROSS JOIN n),
         |${(1 to HitsIters).map(iter).mkString(",\n")}
         |SELECT node, CAST(h.hub AS BIGINT) AS hub, CAST(a.auth AS BIGINT) AS auth
         |FROM h$HitsIters h JOIN a$HitsIters a USING (node)
         |ORDER BY auth DESC, node LIMIT 100""".stripMargin
    },

    // one CUBE aggregation, marginal NULLs rendered '(all)' on both
    // engines so ordering never hits a NULLS FIRST/LAST dialect seam
    "x76_datacard" ->
      """SELECT coalesce(source, '(all)') AS src,
        |  coalesce(lang, '(all)') AS lng,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(list_filter(string_split(text, ' '),
        |    w -> length(w) > 0))) AS BIGINT) AS n_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |  CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dup_docs
        |FROM documents GROUP BY CUBE (source, lang)
        |ORDER BY src, lng""".stripMargin,

    // the x54 encode replayed per word type, then per-language exact
    // integer ppm ratios
    "x77_fertility" ->
      s"""WITH $bpeAllRounds,
         |enc AS (SELECT word,
         |  CAST(len(string_split(s[2:], chr(31))) AS BIGINT) AS ntok
         |  FROM w$BpeIters),
         |t AS (SELECT doc_id, lang, length(text) AS chars,
         |  string_split(text, ' ') AS ts FROM documents),
         |dt AS (SELECT doc_id, ts[i] AS word
         |  FROM t, LATERAL unnest(generate_series(1, len(ts))) AS u(i)
         |  WHERE length(ts[i]) > 0),
         |dwc AS (SELECT doc_id, count(*) AS words, sum(enc.ntok) AS toks
         |  FROM dt JOIN enc USING (word) GROUP BY 1),
         |j AS (SELECT t.doc_id, t.lang, t.chars, dwc.words, dwc.toks
         |  FROM t JOIN dwc USING (doc_id))
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(words) AS BIGINT) AS n_words,
         |  CAST(sum(toks) AS BIGINT) AS n_tokens,
         |  CAST(sum(chars) AS BIGINT) AS n_chars,
         |  CAST(sum(toks) * 1000000 // sum(words) AS BIGINT) AS fertility_ppm,
         |  CAST(sum(chars) * 1000000 // sum(toks) AS BIGINT) AS chars_per_token_ppm
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // identical pair table, NN-sum windows, and integral margin
    // division; float ops (dot, sqrt, divide, floor) are all IEEE
    // correctly-rounded in the same association, so cmicro byte-matches
    "x78_bitext_margin" ->
      s"""WITH e AS (SELECT vec_id, label,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings),
         |n AS (SELECT vec_id, label, q, list_dot_product(q, q) AS n2 FROM e),
         |a AS (SELECT vec_id AS aid, q AS qa, n2 AS na FROM n WHERE label = 0),
         |b AS (SELECT vec_id AS bid, q AS qb, n2 AS nb FROM n WHERE label = 1),
         |p AS (SELECT aid, bid,
         |  CAST(floor(list_dot_product(qa, qb) / (sqrt(na) * sqrt(nb))
         |    * 1000000) AS BIGINT) AS cmicro
         |  FROM a CROSS JOIN b),
         |sa AS (SELECT aid, sum(cmicro) AS sa FROM (
         |  SELECT aid, cmicro, row_number() OVER (PARTITION BY aid
         |    ORDER BY cmicro DESC, bid) AS rn FROM p)
         |  WHERE rn <= $BitextK GROUP BY 1),
         |sb AS (SELECT bid, sum(cmicro) AS sb FROM (
         |  SELECT bid, cmicro, row_number() OVER (PARTITION BY bid
         |    ORDER BY cmicro DESC, aid) AS rn FROM p)
         |  WHERE rn <= $BitextK GROUP BY 1),
         |m AS (SELECT p.aid, p.bid,
         |  cmicro * ${2 * BitextK} * 1000000 // (sa.sa + sb.sb) AS margin_ppm
         |  FROM p JOIN sa USING (aid) JOIN sb USING (bid)
         |  WHERE cmicro >= 0 AND sa.sa + sb.sb > 0)
         |SELECT aid, bid, CAST(margin_ppm AS BIGINT) AS margin_ppm FROM (
         |  SELECT aid, bid, margin_ppm, row_number() OVER (PARTITION BY aid
         |    ORDER BY margin_ppm DESC, bid) AS rn FROM m)
         |WHERE rn = 1 ORDER BY aid""".stripMargin,

    // the NAIVE all-pairs popcount — the pigeonhole prune is lossless,
    // so this IS x79's answer (the x48 prune-proof discipline)
    "x79_simhash_hamming" ->
      s"""WITH $ShingleCte,
         |hh AS (SELECT doc_id, md5(s) AS h FROM sh),
         |votes AS (SELECT doc_id, $simhash64Votes FROM hh GROUP BY doc_id),
         |sig AS (SELECT doc_id, CAST($simhash64Assemble AS BIGINT) AS simhash
         |  FROM votes)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS dist
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxDist
         |ORDER BY d1, d2""".stripMargin,

    // the x25 ranking and the vec-0 dense ranking as subqueries,
    // full-outer fused with integral reciprocal-rank contributions
    "x80_hybrid_rrf" ->
      s"""WITH bm AS (SELECT doc_id, rank FROM ($bm25Sql)),
         |e AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings),
         |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
         |qv AS (SELECT q, n2 FROM n WHERE vec_id = $RrfQueryVec),
         |scored AS (SELECT n.vec_id AS doc_id,
         |  round(list_dot_product(qv.q, n.q) / (sqrt(qv.n2) * sqrt(n.n2)), 6) AS sim
         |  FROM n CROSS JOIN qv WHERE n.vec_id != $RrfQueryVec),
         |cs AS (SELECT doc_id, rank FROM (
         |  SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY sim DESC, doc_id) AS INTEGER) AS rank
         |  FROM scored) WHERE rank <= $Bm25TopK),
         |f AS (SELECT coalesce(bm.doc_id, cs.doc_id) AS doc_id,
         |  coalesce(bm.rank, 0) AS bm25_rank, coalesce(cs.rank, 0) AS cos_rank,
         |  coalesce(1000000 // ($RrfK + bm.rank), 0)
         |    + coalesce(1000000 // ($RrfK + cs.rank), 0) AS rrf_micro
         |  FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id)
         |SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
         |  CAST(cos_rank AS BIGINT) AS cos_rank,
         |  CAST(rrf_micro AS BIGINT) AS rrf_micro
         |FROM f ORDER BY rrf_micro DESC, doc_id""".stripMargin,

    // identical grid/lane arithmetic: block hash lanes via md5 string
    // compare (Sample.threshold discipline), length lane via the
    // strpos hex trick, slices clipped at doc end on both engines
    "x81_span_corrupt" -> {
      val thr = Sample.threshold(SpanP)
      val lenLane = (h: String) =>
        s"(strpos('0123456789abcdef', substring($h, 9, 1)) - 1) % $SpanMax + 1"
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |bl AS (SELECT doc_id, ts, (len(ts) + ${SpanGrid - 1}) // $SpanGrid AS nb FROM t),
         |h AS (SELECT doc_id, ts, nb,
         |  list_transform(range(0, CAST(nb AS INT)), b ->
         |    md5(CAST(doc_id AS VARCHAR) || ':' ||
         |        CAST(b * $SpanGrid AS VARCHAR) || ':$SpanSeed')) AS hs
         |  FROM bl)
         |SELECT doc_id,
         |  array_to_string(list_filter(
         |    list_transform(generate_series(1, len(ts)), i ->
         |      CASE WHEN substring(hs[((i-1) // $SpanGrid) + 1], 1, 8) < '$thr'
         |        THEN CASE
         |          WHEN (i-1) % $SpanGrid = 0
         |          THEN '<X_' || CAST((i-1) // $SpanGrid AS VARCHAR) || '>'
         |          WHEN (i-1) % $SpanGrid <
         |            ${lenLane(s"hs[((i-1) // $SpanGrid) + 1]")}
         |          THEN NULL
         |          ELSE ts[i] END
         |        ELSE ts[i] END),
         |    x -> x IS NOT NULL), ' ') AS input,
         |  coalesce(array_to_string(list_filter(
         |    list_transform(range(0, CAST(nb AS INT)), b ->
         |      CASE WHEN substring(hs[b + 1], 1, 8) < '$thr'
         |        THEN '<X_' || CAST(b AS VARCHAR) || '> ' ||
         |          array_to_string(
         |            ts[b * $SpanGrid + 1 :
         |               b * $SpanGrid + ${lenLane(s"hs[b + 1]")}], ' ')
         |        ELSE NULL END),
         |    x -> x IS NOT NULL), ' '), '') AS target,
         |  CAST(len(list_filter(range(0, CAST(nb AS INT)), b ->
         |    substring(hs[b + 1], 1, 8) < '$thr')) AS BIGINT) AS n_spans
         |FROM h ORDER BY doc_id""".stripMargin
    },

    // all three pair pipelines composed from the SAME fragments their
    // own oracles use (ShingleCte / minhash bands / simhash64 lanes),
    // then audit-sized count aggregates
    "x82_dedup_audit" ->
      s"""WITH $ShingleCte,
         |n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |tin AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (SELECT d1, d2 FROM (SELECT d1, d2,
         |    round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM tin JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2)
         |  WHERE jac >= $JaccardThreshold),
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS ($bandUnion),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |min_i AS (SELECT c.d1, c.d2, count(*) AS i FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.d1
         |  JOIN sh sb ON sb.doc_id = c.d2 AND sa.s = sb.s GROUP BY 1, 2),
         |mh AS (SELECT d1, d2 FROM (SELECT d1, d2,
         |    round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jac
         |  FROM min_i JOIN n na ON na.doc_id = d1 JOIN n nb ON nb.doc_id = d2)
         |  WHERE jac >= $JaccardThreshold),
         |hh AS (SELECT doc_id, md5(s) AS h FROM sh),
         |votes AS (SELECT doc_id, $simhash64Votes FROM hh GROUP BY doc_id),
         |s64 AS (SELECT doc_id, CAST($simhash64Assemble AS BIGINT) AS simhash
         |  FROM votes),
         |sh64 AS (SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM s64 a JOIN s64 b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxDist),
         |counts AS (
         |  SELECT 'minhash_lsh' AS method,
         |    (SELECT count(*) FROM mh) AS np,
         |    (SELECT count(*) FROM mh JOIN truth USING (d1, d2)) AS nh
         |  UNION ALL SELECT 'simhash64_d3',
         |    (SELECT count(*) FROM sh64),
         |    (SELECT count(*) FROM sh64 JOIN truth USING (d1, d2))),
         |tt AS (SELECT count(*) AS nt FROM truth)
         |SELECT method, CAST(np AS BIGINT) AS n_pairs,
         |  CAST(nh AS BIGINT) AS n_hits, CAST(nt AS BIGINT) AS n_truth,
         |  CAST(CASE WHEN np > 0 THEN nh * 1000000 // np ELSE 0 END AS BIGINT)
         |    AS precision_ppm,
         |  CAST(nh * 1000000 // nt AS BIGINT) AS recall_ppm
         |FROM counts CROSS JOIN tt ORDER BY method""".stripMargin,

    // identical string-bucket lane and double formula; saturation would
    // raise on both engines (the in-plan guard / ln-of-zero)
    "x83_cardinality" -> {
      val m = math.pow(16, SketchHexDigits).toLong
      s"""WITH $ShingleCte,
         |t2 AS (SELECT d.source AS grp, sh.s,
         |  substring(md5(sh.s), 1, $SketchHexDigits) AS pos
         |  FROM sh JOIN documents d USING (doc_id)
         |  WHERE sh.s IS NOT NULL),
         |agg AS (SELECT grp, count(DISTINCT s) AS n_exact,
         |  count(DISTINCT pos) AS filled FROM t2 GROUP BY 1)
         |SELECT grp, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(filled AS BIGINT) AS filled,
         |  CASE WHEN filled >= $m THEN error('saturated')
         |    ELSE round(-$m.0 * ln(1.0 - CAST(filled AS DOUBLE) / $m.0), 6)
         |  END AS est,
         |  round(((CASE WHEN filled >= $m THEN error('saturated')
         |    ELSE round(-$m.0 * ln(1.0 - CAST(filled AS DOUBLE) / $m.0), 6)
         |  END) - CAST(n_exact AS DOUBLE))
         |    / CAST(n_exact AS DOUBLE) * 1000000.0, 6) AS err_ppm
         |FROM agg ORDER BY grp""".stripMargin
    },

    // the same deterministic-tie synchronous rounds unrolled
    "x84_label_prop" -> {
      val iter = (k: Int) =>
        s"""c$k AS (SELECT e.dst AS node, l.label, count(*) AS c
           |  FROM e JOIN l${k - 1} l ON l.node = e.src GROUP BY 1, 2),
           |a$k AS (SELECT node, label FROM (SELECT node, label,
           |    row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn
           |  FROM c$k) WHERE rn = 1),
           |l$k AS (SELECT l.node, coalesce(a.label, l.label) AS label
           |  FROM l${k - 1} l LEFT JOIN a$k a USING (node))""".stripMargin
      s"""WITH pair AS (SELECT DISTINCT o.o_custkey * 2 AS c,
         |  l.l_suppkey * 2 + 1 AS s
         |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
         |e AS (SELECT c AS src, s AS dst FROM pair
         |  UNION ALL SELECT s AS src, c AS dst FROM pair),
         |nodes AS (SELECT DISTINCT node FROM
         |  (SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
         |l0 AS (SELECT node, node AS label FROM nodes),
         |${(1 to LpaIters).map(iter).mkString(",\n")}
         |SELECT node, CAST(label AS BIGINT) AS community FROM l$LpaIters
         |ORDER BY node""".stripMargin
    },

    // identical micro-nat moments in HUGEINT; the only doubles are the
    // final slope/intercept divisions, same operand order
    "x85_zipf" ->
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        |v AS (SELECT w, count(*) AS freq FROM tok WHERE length(w) > 0
        |  GROUP BY 1),
        |r AS (SELECT w, freq,
        |  row_number() OVER (ORDER BY freq DESC, w) AS rank FROM v),
        |p AS (SELECT
        |  CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |  CAST(round(ln(CAST(freq AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM r),
        |mo AS (SELECT count(*) AS n,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |  sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx FROM p)
        |SELECT CAST(n AS BIGINT) AS n_vocab,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN error('degenerate')
        |    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS slope,
        |  round((CAST(sy AS DOUBLE)
        |    - (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 1000000.0, 6) AS intercept_ln
        |FROM mo""".stripMargin,

    // x87 within-corpus: first-occurrence paragraph rank over the
    // cyclic twin's lines (the x69 CTEs at span=1)
    "x87_paragraph_dedup" ->
      s"""WITH $cycLinesCtes,
         |rk AS (SELECT doc_id, i + 1 AS j, line,
         |   row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, i)
         |     AS rn FROM l)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  coalesce(string_agg(CASE WHEN rn = 1 THEN line END,
         |    chr(10) ORDER BY j), '') AS deduped
         |FROM rk GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // x87 cross-corpus: the NAIVE exact paragraph join (no bloom
    // anywhere) — the gate in the engine must be invisible here, which
    // is the losslessness proof
    "x87_paragraph_decon" ->
      s"""WITH $cycLinesCtes,
         |ln AS (SELECT doc_id, i + 1 AS j, line FROM l),
         |ref AS (SELECT DISTINCT md5(line) AS d FROM ln
         |  WHERE doc_id % 7 = 0),
         |c AS (SELECT doc_id, j, line, md5(line) AS d FROM ln
         |  WHERE doc_id % 7 <> 0)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_pars,
         |  CAST(sum(CASE WHEN ref.d IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_removed,
         |  coalesce(string_agg(CASE WHEN ref.d IS NULL THEN line END,
         |    chr(10) ORDER BY j), '') AS cleaned
         |FROM c LEFT JOIN ref ON ref.d = c.d
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // seed + every Viterbi-EM round replayed from the data (the x44
    // unrolled-training discipline); the final piece table is the output
    "x86_unigram" ->
      s"""WITH $uniAllRounds
         |SELECT piece, cnt, cost FROM uv$UniEmIters
         |ORDER BY cnt DESC, piece""".stripMargin,

    // both tokenizers' full training replayed, each word type encoded
    // under its final vocabulary (BPE: the trained word table; unigram:
    // one more Viterbi pass), then the x77 per-language fertility on
    // the identical corpus join
    "x86_fertility" ->
      s"""WITH $bpeAllRounds,
         |$uniAllRounds,
         |${uniRoundCtes(UniEmIters + 1)},
         |benc AS (SELECT word,
         |  CAST(len(string_split(s[2:], chr(31))) AS BIGINT) AS ntok
         |  FROM w$BpeIters),
         |uenc AS (SELECT word, CAST(len(string_split(
         |    string_split(dp, chr(30))[length(word) + 1], chr(31))[2:])
         |  AS BIGINT) AS ntok FROM useg${UniEmIters + 1}),
         |t AS (SELECT doc_id, lang, string_split(text, ' ') AS ts
         |  FROM documents),
         |dt AS (SELECT doc_id, ts[i] AS word
         |  FROM t, LATERAL unnest(generate_series(1, len(ts))) AS u(i)
         |  WHERE length(ts[i]) > 0),
         |bwc AS (SELECT doc_id, count(*) AS words, sum(benc.ntok) AS toks
         |  FROM dt JOIN benc USING (word) GROUP BY 1),
         |uwc AS (SELECT doc_id, sum(uenc.ntok) AS toks
         |  FROM dt JOIN uenc USING (word) GROUP BY 1),
         |j AS (SELECT t.doc_id, t.lang, bwc.words,
         |  bwc.toks AS btoks, uwc.toks AS utoks
         |  FROM t JOIN bwc USING (doc_id) JOIN uwc USING (doc_id))
         |SELECT lang,
         |  CAST(sum(btoks) * 1000000 // sum(words) AS BIGINT)
         |    AS bpe_fertility_ppm,
         |  CAST(sum(utoks) * 1000000 // sum(words) AS BIGINT)
         |    AS uni_fertility_ppm
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // X88: registers re-derived from the data with the SAME fragments
    // the Scala side runs (rho / register term / estimator interpolated
    // from Sketch), so the two engines cannot diverge on lane
    // arithmetic or the small-range-correction branch
    "x88_hll" -> {
      val m = math.pow(16, HllHexDigits).toLong
      val est = Sketch.hllEstExpr(m)
      s"""WITH $ShingleCte,
         |v AS (SELECT d.source AS grp, md5(sh.s) AS h
         |  FROM sh JOIN documents d USING (doc_id) WHERE sh.s IS NOT NULL),
         |r AS (SELECT grp, substring(h, 1, $HllHexDigits) AS reg,
         |  ${Sketch.rhoSql("h", HllHexDigits + 1)} AS rho FROM v),
         |regs AS (SELECT grp, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
         |agg AS (SELECT grp, count(*) AS filled,
         |  sum(${Sketch.hllTermSql}) AS s_present FROM regs GROUP BY 1),
         |ex AS (SELECT d.source AS grp, count(DISTINCT sh.s) AS n_exact
         |  FROM sh JOIN documents d USING (doc_id)
         |  WHERE sh.s IS NOT NULL GROUP BY 1)
         |SELECT grp, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(filled AS BIGINT) AS filled,
         |  $est AS est,
         |  round((($est) - CAST(n_exact AS DOUBLE))
         |    / CAST(n_exact AS DOUBLE) * 1000000.0, 6) AS err_ppm
         |FROM agg JOIN ex USING (grp) ORDER BY grp""".stripMargin
    },

    // the merge collapses to one max over the unioned slices' rows
    // (max is associative: per-slice registers then pointwise max ==
    // max over the union), which is exactly the losslessness claim
    "x88_hll_union" -> {
      val m = math.pow(16, HllHexDigits).toLong
      val est = Sketch.hllEstExpr(m)
      s"""WITH $ShingleCte,
         |j AS (SELECT sh.doc_id, d.source, sh.s
         |  FROM sh JOIN documents d USING (doc_id) WHERE sh.s IS NOT NULL),
         |u AS (SELECT source AS grp, s FROM j WHERE doc_id % 2 = 0
         |  UNION ALL SELECT source, s FROM j WHERE doc_id % 3 = 0),
         |v AS (SELECT grp, s, md5(s) AS h FROM u),
         |r AS (SELECT grp, substring(h, 1, $HllHexDigits) AS reg,
         |  ${Sketch.rhoSql("h", HllHexDigits + 1)} AS rho FROM v),
         |regs AS (SELECT grp, reg, max(rho) AS mj FROM r GROUP BY 1, 2),
         |agg AS (SELECT grp, count(*) AS filled,
         |  sum(${Sketch.hllTermSql}) AS s_present FROM regs GROUP BY 1),
         |ex AS (SELECT grp, count(DISTINCT s) AS n_exact FROM u GROUP BY 1)
         |SELECT grp, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(filled AS BIGINT) AS filled,
         |  $est AS est,
         |  round((($est) - CAST(n_exact AS DOUBLE))
         |    / CAST(n_exact AS DOUBLE) * 1000000.0, 6) AS err_ppm
         |FROM agg JOIN ex USING (grp) ORDER BY grp""".stripMargin
    },

    // X89: sketch rebuilt from the data with the same "lane|token" md5
    // lane; integer-exact counters and ppm, so the hash compare is
    // bit-strict; error() mirrors the in-plan under-estimate guard
    "x89_heavy_hitters" ->
      s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS token
         |  FROM documents),
         |lanes AS (SELECT unnest(generate_series(0, ${CmsDepth - 1})) AS lane),
         |lb AS (SELECT lane,
         |  substring(md5(CAST(lane AS VARCHAR) || '|' || token), 1,
         |    $CmsHexDigits) AS bucket
         |  FROM t CROSS JOIN lanes),
         |sk AS (SELECT lane, bucket, count(*) AS cnt FROM lb GROUP BY 1, 2),
         |top AS (SELECT token, count(*) AS n_exact FROM t GROUP BY 1
         |  ORDER BY n_exact DESC, token LIMIT $HeavyTopK),
         |q AS (SELECT token, n_exact, lane,
         |  substring(md5(CAST(lane AS VARCHAR) || '|' || token), 1,
         |    $CmsHexDigits) AS bucket
         |  FROM top CROSS JOIN lanes),
         |e AS (SELECT token, n_exact, min(cnt) AS est
         |  FROM q JOIN sk USING (lane, bucket) GROUP BY 1, 2)
         |SELECT token, CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(est AS BIGINT) AS est,
         |  CAST(CASE WHEN est < n_exact
         |    THEN error('count-min under-estimated: impossible')
         |    ELSE (est - n_exact) * 1000000 // n_exact
         |  END AS BIGINT) AS over_ppm
         |FROM e ORDER BY n_exact DESC, token""".stripMargin,

    // X90: every training round replayed from the data (the x44
    // discipline) — the per-round winning pair with its quantized
    // likelihood score
    "x90_wordpiece" ->
      s"""WITH $wpAllRounds
         |SELECT * FROM (
         |  ${(1 to WpIters).map(r =>
              s"SELECT $r AS r, a, b, score, cnt FROM wbest$r")
              .mkString("\n  UNION ALL ")}
         |) ORDER BY r""".stripMargin,

    "x90_wp_vocab" ->
      s"""WITH $wpAllRounds,
         |fin AS (SELECT freq,
         |  unnest(string_split(s[2:], chr(31))) AS piece FROM ww$WpIters)
         |SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM fin
         |GROUP BY 1 ORDER BY cnt DESC, piece""".stripMargin,

    // X91: the summary re-derived with the identical integer lanes —
    // ROWS-mode cumulative window (Spark's rowsBetween), ceil targets,
    // and the same in-plan bound via error()
    "x91_quantile_sketch" -> {
      val phis = QPhisPpm.mkString(", ")
      s"""WITH base AS (SELECT lang AS grp, n_chars AS v, doc_id AS id,
         |  doc_id % $QShards AS shard
         |  FROM documents WHERE n_chars IS NOT NULL),
         |rk AS (SELECT grp, shard, v, id,
         |  row_number() OVER (PARTITION BY grp, shard ORDER BY v, id) AS r,
         |  count(*) OVER (PARTITION BY grp, shard) AS n_s FROM base),
         |kept AS (SELECT grp, shard, v,
         |  CASE WHEN r % step = 0 THEN step
         |       WHEN r = n_s THEN n_s % step ELSE 0 END AS w
         |  FROM (SELECT *, (n_s + ${QK - 1}) // $QK AS step FROM rk)),
         |summ AS (SELECT grp, shard, v, w FROM kept WHERE w > 0),
         |cumt AS (SELECT grp, v,
         |  sum(w) OVER (PARTITION BY grp ORDER BY v, shard
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
         |  sum(w) OVER (PARTITION BY grp) AS n FROM summ),
         |e AS (SELECT grp, phi_ppm, n, target, min(v) AS est FROM (
         |  SELECT grp, v, cw, n, phi_ppm,
         |    (phi_ppm * n + 999999) // 1000000 AS target
         |  FROM cumt CROSS JOIN
         |    (SELECT unnest([$phis]) AS phi_ppm))
         |  WHERE cw >= target GROUP BY 1, 2, 3, 4),
         |tr AS (SELECT e.grp, e.phi_ppm, e.n, e.target, e.est,
         |  sum(CASE WHEN d.n_chars < e.est THEN 1 ELSE 0 END) + 1 AS rank_lo,
         |  sum(CASE WHEN d.n_chars <= e.est THEN 1 ELSE 0 END) AS rank_hi
         |  FROM e JOIN documents d ON d.lang = e.grp
         |  GROUP BY 1, 2, 3, 4, 5)
         |SELECT grp, CAST(n AS BIGINT) AS n,
         |  CAST(phi_ppm AS BIGINT) AS phi_ppm, est,
         |  CAST(rank_lo AS BIGINT) AS rank_lo,
         |  CAST(rank_hi AS BIGINT) AS rank_hi,
         |  CAST(target AS BIGINT) AS target,
         |  CAST(CASE WHEN rank_hi < target
         |         OR rank_lo > target + n // $QK + $QShards
         |    THEN error('quantile summary outside its rank bound')
         |    ELSE greatest(rank_lo - target, target - rank_hi, 0)
         |         * 1000000 // n
         |  END AS BIGINT) AS err_ppm
         |FROM tr ORDER BY grp, phi_ppm""".stripMargin
    },

    // X92: sketches re-derived as plain order statistics on the md5
    // string lane (direct window here — min-k is min-k regardless of
    // the engine's two-level decomposition), estimator and exact audit
    // in the same integer-ppm lanes
    "x92_kmv_overlap" ->
      s"""WITH $ShingleCte,
         |j AS (SELECT sh.doc_id, d.source AS grp, sh.s
         |  FROM sh JOIN documents d USING (doc_id) WHERE sh.s IS NOT NULL),
         |a AS (SELECT DISTINCT grp, s FROM j WHERE doc_id % 2 = 0),
         |b AS (SELECT DISTINCT grp, s FROM j WHERE doc_id % 3 = 0),
         |ka AS (SELECT grp, h FROM (SELECT grp, md5(s) AS h,
         |  row_number() OVER (PARTITION BY grp ORDER BY md5(s)) AS r
         |  FROM a) WHERE r <= $KmvK),
         |kb AS (SELECT grp, h FROM (SELECT grp, md5(s) AS h,
         |  row_number() OVER (PARTITION BY grp ORDER BY md5(s)) AS r
         |  FROM b) WHERE r <= $KmvK),
         |uu AS (SELECT coalesce(ka.grp, kb.grp) AS grp,
         |  coalesce(ka.h, kb.h) AS h,
         |  CASE WHEN ka.h IS NOT NULL AND kb.h IS NOT NULL
         |    THEN 1 ELSE 0 END AS hit
         |  FROM ka FULL JOIN kb ON ka.grp = kb.grp AND ka.h = kb.h),
         |uk AS (SELECT grp, hit,
         |  row_number() OVER (PARTITION BY grp ORDER BY h) AS r FROM uu),
         |e AS (SELECT grp, count(*) AS n_u, sum(hit) AS n_both
         |  FROM uk WHERE r <= $KmvK GROUP BY 1),
         |ni AS (SELECT grp, count(*) AS n_i FROM a JOIN b USING (grp, s)
         |  GROUP BY 1),
         |nun AS (SELECT grp, count(*) AS n_un FROM
         |  (SELECT grp, s FROM a UNION SELECT grp, s FROM b) GROUP BY 1)
         |SELECT e.grp, CAST(n_u AS BIGINT) AS n_u,
         |  CAST(n_both * 1000000 // n_u AS BIGINT) AS est_jaccard_ppm,
         |  CAST(coalesce(n_i, 0) * 1000000 // n_un AS BIGINT)
         |    AS exact_jaccard_ppm,
         |  CAST(abs(n_both * 1000000 // n_u -
         |    coalesce(n_i, 0) * 1000000 // n_un) AS BIGINT) AS abs_err_ppm
         |FROM e JOIN nun USING (grp) LEFT JOIN ni USING (grp)
         |ORDER BY grp""".stripMargin,

    // X93: the same degree-ordered orientation as row-value
    // comparisons — each triangle closed by one semi-join, counted at
    // its (degree, id)-minimum vertex
    "x93_triangles" -> (x93PerNodeSql +
      """
        |SELECT node, CAST(d AS BIGINT) AS deg,
        |  CAST(coalesce(pt.tri, 0) AS BIGINT) AS tri
        |FROM deg LEFT JOIN pt USING (node) ORDER BY node""".stripMargin),

    "x93_clustering" -> (x93PerNodeSql +
      """
        |, pn AS (SELECT deg.node, deg.d, coalesce(pt.tri, 0) AS tri
        |  FROM deg LEFT JOIN pt USING (node))
        |SELECT CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST(sum(d) // 2 AS BIGINT) AS n_edges,
        |  CAST(sum(tri) // 3 AS BIGINT) AS n_triangles,
        |  CAST(sum(d * (d - 1)) // 2 AS BIGINT) AS n_wedges,
        |  CAST(sum(tri) * 1000000 // (sum(d * (d - 1)) // 2) AS BIGINT)
        |    AS transitivity_ppm
        |FROM pn""".stripMargin),

    // X94: identical injection, identical regex lanes (patterns are
    // lookaround-free so Java regex and RE2 agree), identical
    // email -> IP -> phone mask order, identical verdict CASE
    "x94_pii_policy" -> (x94ScanSql +
      s"""
         |SELECT doc_id, n_email, n_phone, n_ip, n_pii,
         |  CASE WHEN n_pii > $PiiMaxHits THEN 'drop'
         |       WHEN n_pii > 0 THEN 'mask' ELSE 'keep' END AS verdict,
         |  CASE WHEN n_pii > $PiiMaxHits THEN NULL
         |       WHEN n_pii > 0 THEN $x94MaskSql
         |       ELSE t END AS out_text
         |FROM sc ORDER BY doc_id""".stripMargin),

    "x94_pii_summary" -> (x94ScanSql +
      s"""
         |, v AS (SELECT
         |    CASE WHEN n_pii > $PiiMaxHits THEN 'drop'
         |         WHEN n_pii > 0 THEN 'mask' ELSE 'keep' END AS verdict,
         |    n_email, n_phone, n_ip FROM sc)
         |SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_email) AS BIGINT) AS n_email,
         |  CAST(sum(n_phone) AS BIGINT) AS n_phone,
         |  CAST(sum(n_ip) AS BIGINT) AS n_ip
         |FROM v GROUP BY 1 ORDER BY verdict""".stripMargin),

    // X95: identical candidate CTEs to x1_minhash_lsh (signatures,
    // banding, bucket self-join — no Jaccard verify), then the same
    // native levenshtein + exact-integer similarity lanes
    "x95_edit_verify" ->
      s"""WITH $ShingleCte,
         |sig AS (SELECT doc_id, $minhashSigCols FROM sh GROUP BY doc_id),
         |band AS (${bandUnionW(EditRowsPerBand)}),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM band a JOIN band b
         |  ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id),
         |m AS (SELECT c.d1, c.d2,
         |  CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist,
         |  CAST(greatest(len(ta.text), len(tb.text)) AS BIGINT) AS max_len
         |  FROM cand c
         |  JOIN documents ta ON ta.doc_id = c.d1
         |  JOIN documents tb ON tb.doc_id = c.d2),
         |e AS (SELECT d1, d2, dist, max_len,
         |  CAST(CASE WHEN max_len = 0 THEN 1000000
         |    ELSE (max_len - dist) * 1000000 // max_len END AS BIGINT)
         |    AS sim_ppm FROM m)
         |SELECT d1, d2, dist, max_len, sim_ppm,
         |  sim_ppm >= $EditSimPpm AS confirmed
         |FROM e ORDER BY d1, d2""".stripMargin,

    // X96: identical pairing, identical clipped-count integer lanes,
    // identical unsmoothed BLEU composition (zero branch, brevity
    // penalty, round-6 double as the only float step)
    "x96_bleu" ->
      """WITH pr AS (SELECT a.lang AS grp, a.doc_id AS pid,
        |    list_filter(string_split(a.text, ' '), t -> len(t) > 0) AS hts,
        |    list_filter(string_split(b.text, ' '), t -> len(t) > 0) AS rts
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |hg AS (SELECT grp, pid, n, gram, count(*) AS hc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(hts) - ns.n + 1),
        |      i -> array_to_string(hts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |rg AS (SELECT grp, pid, n, gram, count(*) AS rc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(rts) - ns.n + 1),
        |      i -> array_to_string(rts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |cl AS (SELECT grp, n, sum(least(hc, rc)) AS m
        |  FROM hg JOIN rg USING (grp, pid, n, gram) GROUP BY 1, 2),
        |tot AS (SELECT grp, n, sum(greatest(len(hts) - n + 1, 0)) AS t
        |  FROM pr CROSS JOIN ns GROUP BY 1, 2),
        |lens AS (SELECT grp, sum(len(hts)) AS c, sum(len(rts)) AS r
        |  FROM pr GROUP BY 1),
        |mm AS (SELECT grp,
        |  coalesce(max(CASE WHEN n=1 THEN m END), 0) AS m1,
        |  coalesce(max(CASE WHEN n=2 THEN m END), 0) AS m2,
        |  coalesce(max(CASE WHEN n=3 THEN m END), 0) AS m3,
        |  coalesce(max(CASE WHEN n=4 THEN m END), 0) AS m4
        |  FROM cl GROUP BY 1),
        |tt AS (SELECT grp,
        |  max(CASE WHEN n=1 THEN t END) AS t1, max(CASE WHEN n=2 THEN t END) AS t2,
        |  max(CASE WHEN n=3 THEN t END) AS t3, max(CASE WHEN n=4 THEN t END) AS t4
        |  FROM tot GROUP BY 1)
        |SELECT tt.grp, CAST(coalesce(m1, 0) AS BIGINT) AS m1,
        |  CAST(coalesce(m2, 0) AS BIGINT) AS m2,
        |  CAST(coalesce(m3, 0) AS BIGINT) AS m3,
        |  CAST(coalesce(m4, 0) AS BIGINT) AS m4,
        |  CAST(t1 AS BIGINT) AS t1, CAST(t2 AS BIGINT) AS t2,
        |  CAST(t3 AS BIGINT) AS t3, CAST(t4 AS BIGINT) AS t4,
        |  CAST(c AS BIGINT) AS c, CAST(r AS BIGINT) AS r,
        |  CASE WHEN coalesce(m1,0)=0 OR coalesce(m2,0)=0 OR coalesce(m3,0)=0
        |         OR coalesce(m4,0)=0 OR c=0 THEN 0.0
        |  ELSE round(exp(
        |    least(CAST(0 AS DOUBLE), 1.0 - CAST(r AS DOUBLE) / CAST(c AS DOUBLE))
        |    + (ln(CAST(m1 AS DOUBLE)/t1) + ln(CAST(m2 AS DOUBLE)/t2)
        |       + ln(CAST(m3 AS DOUBLE)/t3) + ln(CAST(m4 AS DOUBLE)/t4)) / 4.0),
        |    6) END AS bleu
        |FROM tt LEFT JOIN mm ON tt.grp = mm.grp
        |  JOIN lens ON lens.grp = tt.grp
        |ORDER BY tt.grp""".stripMargin,

    // X97: identical pairing and clipped-count lanes (orders 1..2),
    // LCS re-derived by the same max-of-three two-row DP as the native
    // expression (nested list_reduce: outer over hyp-token match rows,
    // inner over ref positions with the left-carry in the accumulator),
    // F1 = 2m/(ht+rt) exactly as the aggregate-count collapse
    "x97_rouge" ->
      """WITH pr AS (SELECT a.lang AS grp, a.doc_id AS pid,
        |    list_filter(string_split(a.text, ' '), t -> len(t) > 0) AS hts,
        |    list_filter(string_split(b.text, ' '), t -> len(t) > 0) AS rts
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |ns AS (SELECT unnest([1, 2]) AS n),
        |hg AS (SELECT grp, pid, n, gram, count(*) AS hc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(hts) - ns.n + 1),
        |      i -> array_to_string(hts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |rg AS (SELECT grp, pid, n, gram, count(*) AS rc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(rts) - ns.n + 1),
        |      i -> array_to_string(rts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |cl AS (SELECT grp, n, sum(least(hc, rc)) AS m
        |  FROM hg JOIN rg USING (grp, pid, n, gram) GROUP BY 1, 2),
        |mm AS (SELECT grp,
        |  coalesce(max(CASE WHEN n=1 THEN m END), 0) AS m1,
        |  coalesce(max(CASE WHEN n=2 THEN m END), 0) AS m2
        |  FROM cl GROUP BY 1),
        |lc AS (SELECT grp, pid,
        |  list_reduce(
        |    [list_transform(generate_series(0, len(rts)), i -> 0)] ||
        |    list_transform(hts, tok ->
        |      list_transform(generate_series(0, len(rts)), j ->
        |        CASE WHEN j = 0 THEN 0
        |             WHEN rts[j] = tok THEN 1 ELSE 0 END)),
        |    (prev, mrow) -> list_reduce(
        |      list_transform(generate_series(0, len(mrow) - 1), j -> [j]),
        |      (acc, jj) -> CASE WHEN jj[1] = 0 THEN [0]
        |        ELSE acc || [greatest(prev[jj[1] + 1], acc[len(acc)],
        |                              prev[jj[1]] + mrow[jj[1] + 1])] END)
        |  )[len(rts) + 1] AS lcs,
        |  len(hts) AS lh, len(rts) AS lr,
        |  greatest(len(hts), 0) AS ht1, greatest(len(hts) - 1, 0) AS ht2,
        |  greatest(len(rts), 0) AS rt1, greatest(len(rts) - 1, 0) AS rt2
        |  FROM pr),
        |tot AS (SELECT grp, sum(ht1) AS ht1, sum(ht2) AS ht2,
        |    sum(rt1) AS rt1, sum(rt2) AS rt2, sum(lcs) AS lcs,
        |    sum(lh) AS c, sum(lr) AS r
        |  FROM lc GROUP BY 1)
        |SELECT tot.grp,
        |  CAST(coalesce(m1, 0) AS BIGINT) AS m1,
        |  CAST(coalesce(m2, 0) AS BIGINT) AS m2,
        |  CAST(ht1 AS BIGINT) AS ht1, CAST(ht2 AS BIGINT) AS ht2,
        |  CAST(rt1 AS BIGINT) AS rt1, CAST(rt2 AS BIGINT) AS rt2,
        |  CAST(lcs AS BIGINT) AS lcs,
        |  CAST(c AS BIGINT) AS c, CAST(r AS BIGINT) AS r,
        |  CASE WHEN ht1 + rt1 = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(CAST(2 * coalesce(m1, 0) AS DOUBLE) / (ht1 + rt1), 6) END AS rouge1_f,
        |  CASE WHEN ht2 + rt2 = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(CAST(2 * coalesce(m2, 0) AS DOUBLE) / (ht2 + rt2), 6) END AS rouge2_f,
        |  CASE WHEN c + r = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(CAST(2 * lcs AS DOUBLE) / (c + r), 6) END AS rougel_f
        |FROM tot LEFT JOIN mm ON tot.grp = mm.grp
        |ORDER BY tot.grp""".stripMargin,

    // X98: identical pairing, despacing, char-gram slices (DuckDB
    // character slicing == Spark substr for the corpus's BMP text),
    // clipped-count lanes, and the VERBATIM Chrf.chrfSql composition —
    // the double lane cannot drift because it is one shared string
    "x98_chrf" -> {
      val mSel = (1 to 6).map(n =>
        s"coalesce(max(CASE WHEN n=$n THEN m END), 0) AS m$n").mkString(",\n        |  ")
      val hSel = (1 to 6).map(n =>
        s"sum(greatest(len(hs) - ${n - 1}, 0)) AS h$n").mkString(",\n        |    ")
      val rSel = (1 to 6).map(n =>
        s"sum(greatest(len(rs) - ${n - 1}, 0)) AS r$n").mkString(",\n        |    ")
      val finSel = ((1 to 6).map(n => s"CAST(coalesce(m$n, 0) AS BIGINT) AS m$n") ++
        (1 to 6).map(n => s"CAST(h$n AS BIGINT) AS h$n") ++
        (1 to 6).map(n => s"CAST(r$n AS BIGINT) AS r$n")).mkString(",\n        |  ")
      s"""WITH pr AS (SELECT a.lang AS grp, a.doc_id AS pid,
        |    replace(a.text, ' ', '') AS hs, replace(b.text, ' ', '') AS rs
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |ns AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
        |hg AS (SELECT grp, pid, n, gram, count(*) AS hc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(hs) - ns.n + 1),
        |      i -> hs[i:i+ns.n-1])) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |rg AS (SELECT grp, pid, n, gram, count(*) AS rc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(rs) - ns.n + 1),
        |      i -> rs[i:i+ns.n-1])) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |cl AS (SELECT grp, n, sum(least(hc, rc)) AS m
        |  FROM hg JOIN rg USING (grp, pid, n, gram) GROUP BY 1, 2),
        |mm AS (SELECT grp,
        |  $mSel
        |  FROM cl GROUP BY 1),
        |tot AS (SELECT grp,
        |    $hSel,
        |    $rSel
        |  FROM pr GROUP BY 1),
        |fin AS (SELECT tot.grp,
        |  $finSel
        |  FROM tot LEFT JOIN mm ON tot.grp = mm.grp)
        |SELECT fin.*, ${Chrf.chrfSql(6, 2)} AS chrf
        |FROM fin ORDER BY grp""".stripMargin
    },

    // X99: identical tokenization, bigram/unigram type counts,
    // per-language totals, the same count floor, and the same
    // fixed-order double PMI composition
    "x99_pmi_collocations" ->
      """WITH tk AS (SELECT lang, string_split(text, ' ') AS ts FROM documents),
        |bgl AS (SELECT lang, unnest(list_transform(
        |    generate_series(1, len(ts) - 1),
        |    i -> {'w1': ts[i], 'w2': ts[i + 1]})) AS bg FROM tk),
        |bc AS (SELECT lang, bg.w1 AS w1, bg.w2 AS w2, count(*) AS c_xy
        |  FROM bgl GROUP BY ALL),
        |un AS (SELECT lang, w, count(*) AS c_w
        |  FROM (SELECT lang, unnest(ts) AS w FROM tk) GROUP BY ALL),
        |tt AS (SELECT lang, CAST(sum(c_xy) AS BIGINT) AS t
        |  FROM bc GROUP BY 1)
        |SELECT bc.lang, w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
        |  CAST(u1.c_w AS BIGINT) AS c_x, CAST(u2.c_w AS BIGINT) AS c_y, t,
        |  round(ln(CAST(c_xy AS DOUBLE) * CAST(t AS DOUBLE)
        |    / (CAST(u1.c_w AS DOUBLE) * CAST(u2.c_w AS DOUBLE))), 6) AS pmi
        |FROM bc
        |  JOIN un u1 ON u1.lang = bc.lang AND u1.w = bc.w1
        |  JOIN un u2 ON u2.lang = bc.lang AND u2.w = bc.w2
        |  JOIN tt ON tt.lang = bc.lang
        |WHERE c_xy >= 3
        |ORDER BY bc.lang, w1, w2""".stripMargin,

    // X100: same top-20 trigram derivation (count desc, gram asc), then
    // the naive per-phrase contains() join the automaton replaces;
    // hit lists re-sorted lexicographically to match id-rank order
    "x100_phrase_coverage" ->
      """WITH tk AS (SELECT doc_id, text, string_split(text, ' ') AS ts
        |  FROM documents),
        |tg AS (SELECT gram, count(*) AS c FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(ts) - 2),
        |    i -> array_to_string(ts[i:i+2], ' '))) AS gram FROM tk)
        |  GROUP BY 1),
        |topk AS (SELECT gram FROM tg ORDER BY c DESC, gram LIMIT 20),
        |hits AS (SELECT d.doc_id, t.gram FROM documents d
        |  JOIN topk t ON contains(d.text, t.gram)),
        |agg AS (SELECT doc_id, count(*) AS n,
        |    string_agg(gram, ',' ORDER BY gram) AS hs
        |  FROM hits GROUP BY 1)
        |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_hits,
        |  coalesce(agg.hs, '') AS hits
        |FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // X101: identical per-pair count lanes (the x96 CTEs at pair
    // grain), the VERBATIM Poisson threshold CASE and BLEU composition
    // fragments, ranks 1/39 of the 40 resamples as the 2.5/97.5
    // order statistics
    "x101_bleu_ci" ->
      s"""WITH pr AS (SELECT a.lang AS grp, a.doc_id AS pid,
        |    list_filter(string_split(a.text, ' '), t -> len(t) > 0) AS hts,
        |    list_filter(string_split(b.text, ' '), t -> len(t) > 0) AS rts
        |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |hg AS (SELECT grp, pid, n, gram, count(*) AS hc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(hts) - ns.n + 1),
        |      i -> array_to_string(hts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |rg AS (SELECT grp, pid, n, gram, count(*) AS rc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(rts) - ns.n + 1),
        |      i -> array_to_string(rts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |clp AS (SELECT grp, pid, n, sum(least(hc, rc)) AS m
        |  FROM hg JOIN rg USING (grp, pid, n, gram) GROUP BY 1, 2, 3),
        |pm AS (SELECT grp, pid,
        |  coalesce(max(CASE WHEN n=1 THEN m END), 0) AS m1,
        |  coalesce(max(CASE WHEN n=2 THEN m END), 0) AS m2,
        |  coalesce(max(CASE WHEN n=3 THEN m END), 0) AS m3,
        |  coalesce(max(CASE WHEN n=4 THEN m END), 0) AS m4
        |  FROM clp GROUP BY 1, 2),
        |pp AS (SELECT pr.grp, pr.pid,
        |  coalesce(m1, 0) AS m1, coalesce(m2, 0) AS m2,
        |  coalesce(m3, 0) AS m3, coalesce(m4, 0) AS m4,
        |  greatest(len(hts), 0) AS t1, greatest(len(hts) - 1, 0) AS t2,
        |  greatest(len(hts) - 2, 0) AS t3, greatest(len(hts) - 3, 0) AS t4,
        |  len(hts) AS lh, len(rts) AS lr
        |  FROM pr LEFT JOIN pm ON pm.grp = pr.grp AND pm.pid = pr.pid),
        |bt AS (SELECT grp, pid, bs.b AS b,
        |  ('0x' || substring(md5(CAST(pid AS VARCHAR) || '|ci|'
        |    || CAST(bs.b AS VARCHAR)), 1, 8))::BIGINT AS h,
        |  m1, m2, m3, m4, t1, t2, t3, t4, lh, lr
        |  FROM pp CROSS JOIN (SELECT unnest(generate_series(1, 40)) AS b) bs),
        |bk AS (SELECT grp, b, ${BleuCi.poissonKSql("h")} AS k,
        |  m1, m2, m3, m4, t1, t2, t3, t4, lh, lr FROM bt),
        |bs2 AS (SELECT grp, b,
        |  sum(k * m1) AS m1, sum(k * m2) AS m2, sum(k * m3) AS m3,
        |  sum(k * m4) AS m4, sum(k * t1) AS t1, sum(k * t2) AS t2,
        |  sum(k * t3) AS t3, sum(k * t4) AS t4,
        |  sum(k * lh) AS c, sum(k * lr) AS r FROM bk GROUP BY 1, 2),
        |sc AS (SELECT grp, b, ${Bleu.bleuSql(4)} AS bleu FROM bs2),
        |rk AS (SELECT grp, b, bleu,
        |  row_number() OVER (PARTITION BY grp ORDER BY bleu, b) AS rn
        |  FROM sc),
        |ci AS (SELECT grp, max(CASE WHEN rn = 1 THEN bleu END) AS ci_lo,
        |    max(CASE WHEN rn = 39 THEN bleu END) AS ci_hi,
        |    CAST(count(*) AS BIGINT) AS n_boot
        |  FROM rk GROUP BY 1),
        |pt AS (SELECT grp, sum(m1) AS m1, sum(m2) AS m2, sum(m3) AS m3,
        |    sum(m4) AS m4, sum(t1) AS t1, sum(t2) AS t2, sum(t3) AS t3,
        |    sum(t4) AS t4, sum(lh) AS c, sum(lr) AS r FROM pp GROUP BY 1),
        |psc AS (SELECT grp, ${Bleu.bleuSql(4)} AS bleu FROM pt)
        |SELECT psc.grp, psc.bleu, ci.ci_lo, ci.ci_hi, ci.n_boot
        |FROM psc JOIN ci ON ci.grp = psc.grp
        |ORDER BY psc.grp""".stripMargin,

    // X102: identical triple pairing, both systems' clip lanes against
    // ONE shared reference gram table, identical Poisson multiplicities
    // (paired!), the shared estimator fragment per side, exact-integer
    // win counts and 95% criterion
    "x102_bleu_paired" ->
      s"""WITH pr AS (SELECT a.lang AS grp, a.doc_id AS pid,
        |    list_filter(string_split(a.text, ' '), t -> len(t) > 0) AS ats,
        |    list_filter(string_split(b2.text, ' '), t -> len(t) > 0) AS bts,
        |    list_filter(string_split(r.text, ' '), t -> len(t) > 0) AS rts
        |  FROM documents a
        |    JOIN documents r ON r.doc_id = a.doc_id + 1
        |    JOIN documents b2 ON b2.doc_id = a.doc_id + 2),
        |ns AS (SELECT unnest([1, 2, 3, 4]) AS n),
        |ha AS (SELECT grp, pid, n, gram, count(*) AS hc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(ats) - ns.n + 1),
        |      i -> array_to_string(ats[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |hb AS (SELECT grp, pid, n, gram, count(*) AS hc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(bts) - ns.n + 1),
        |      i -> array_to_string(bts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |rg AS (SELECT grp, pid, n, gram, count(*) AS rc FROM (
        |  SELECT grp, pid, ns.n AS n,
        |    unnest(list_transform(generate_series(1, len(rts) - ns.n + 1),
        |      i -> array_to_string(rts[i:i+ns.n-1], ' '))) AS gram
        |  FROM pr CROSS JOIN ns) GROUP BY ALL),
        |clpa AS (SELECT grp, pid, n, sum(least(ha.hc, rg.rc)) AS m
        |  FROM ha JOIN rg USING (grp, pid, n, gram) GROUP BY 1, 2, 3),
        |clpb AS (SELECT grp, pid, n, sum(least(hb.hc, rg.rc)) AS m
        |  FROM hb JOIN rg USING (grp, pid, n, gram) GROUP BY 1, 2, 3),
        |pma AS (SELECT grp, pid,
        |  coalesce(max(CASE WHEN n=1 THEN m END), 0) AS m1a,
        |  coalesce(max(CASE WHEN n=2 THEN m END), 0) AS m2a,
        |  coalesce(max(CASE WHEN n=3 THEN m END), 0) AS m3a,
        |  coalesce(max(CASE WHEN n=4 THEN m END), 0) AS m4a
        |  FROM clpa GROUP BY 1, 2),
        |pmb AS (SELECT grp, pid,
        |  coalesce(max(CASE WHEN n=1 THEN m END), 0) AS m1b,
        |  coalesce(max(CASE WHEN n=2 THEN m END), 0) AS m2b,
        |  coalesce(max(CASE WHEN n=3 THEN m END), 0) AS m3b,
        |  coalesce(max(CASE WHEN n=4 THEN m END), 0) AS m4b
        |  FROM clpb GROUP BY 1, 2),
        |pp AS (SELECT pr.grp, pr.pid,
        |  coalesce(m1a, 0) AS m1a, coalesce(m2a, 0) AS m2a,
        |  coalesce(m3a, 0) AS m3a, coalesce(m4a, 0) AS m4a,
        |  coalesce(m1b, 0) AS m1b, coalesce(m2b, 0) AS m2b,
        |  coalesce(m3b, 0) AS m3b, coalesce(m4b, 0) AS m4b,
        |  greatest(len(ats), 0) AS t1a, greatest(len(ats) - 1, 0) AS t2a,
        |  greatest(len(ats) - 2, 0) AS t3a, greatest(len(ats) - 3, 0) AS t4a,
        |  greatest(len(bts), 0) AS t1b, greatest(len(bts) - 1, 0) AS t2b,
        |  greatest(len(bts) - 2, 0) AS t3b, greatest(len(bts) - 3, 0) AS t4b,
        |  len(ats) AS ca, len(bts) AS cb, len(rts) AS lr
        |  FROM pr LEFT JOIN pma ON pma.grp = pr.grp AND pma.pid = pr.pid
        |    LEFT JOIN pmb ON pmb.grp = pr.grp AND pmb.pid = pr.pid),
        |bt AS (SELECT pp.*, bs.b AS b,
        |  ('0x' || substring(md5(CAST(pid AS VARCHAR) || '|pt|'
        |    || CAST(bs.b AS VARCHAR)), 1, 8))::BIGINT AS h
        |  FROM pp CROSS JOIN (SELECT unnest(generate_series(1, 40)) AS b) bs),
        |bk AS (SELECT grp, b, ${BleuCi.poissonKSql("h")} AS k, bt.*
        |  FROM bt),
        |bs2 AS (SELECT grp, b,
        |  sum(k * m1a) AS m1a, sum(k * m2a) AS m2a, sum(k * m3a) AS m3a,
        |  sum(k * m4a) AS m4a, sum(k * m1b) AS m1b, sum(k * m2b) AS m2b,
        |  sum(k * m3b) AS m3b, sum(k * m4b) AS m4b,
        |  sum(k * t1a) AS t1a, sum(k * t2a) AS t2a, sum(k * t3a) AS t3a,
        |  sum(k * t4a) AS t4a, sum(k * t1b) AS t1b, sum(k * t2b) AS t2b,
        |  sum(k * t3b) AS t3b, sum(k * t4b) AS t4b,
        |  sum(k * ca) AS ca, sum(k * cb) AS cb, sum(k * lr) AS r
        |  FROM bk GROUP BY 1, 2),
        |sca AS (SELECT grp, b, ${Bleu.bleuSql(4)} AS bleu_a FROM (
        |  SELECT grp, b, m1a AS m1, m2a AS m2, m3a AS m3, m4a AS m4,
        |    t1a AS t1, t2a AS t2, t3a AS t3, t4a AS t4, ca AS c, r
        |  FROM bs2)),
        |scb AS (SELECT grp, b, ${Bleu.bleuSql(4)} AS bleu_b FROM (
        |  SELECT grp, b, m1b AS m1, m2b AS m2, m3b AS m3, m4b AS m4,
        |    t1b AS t1, t2b AS t2, t3b AS t3, t4b AS t4, cb AS c, r
        |  FROM bs2)),
        |cmp AS (SELECT grp,
        |    CAST(sum(CASE WHEN bleu_a > bleu_b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS wins_a,
        |    CAST(sum(CASE WHEN bleu_a = bleu_b THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ties,
        |    CAST(count(*) AS BIGINT) AS n_boot
        |  FROM sca JOIN scb USING (grp, b) GROUP BY 1),
        |pta AS (SELECT grp, ${Bleu.bleuSql(4)} AS bleu_a FROM (
        |  SELECT grp, sum(m1a) AS m1, sum(m2a) AS m2, sum(m3a) AS m3,
        |    sum(m4a) AS m4, sum(t1a) AS t1, sum(t2a) AS t2, sum(t3a) AS t3,
        |    sum(t4a) AS t4, sum(ca) AS c, sum(lr) AS r FROM pp GROUP BY 1)),
        |ptb AS (SELECT grp, ${Bleu.bleuSql(4)} AS bleu_b FROM (
        |  SELECT grp, sum(m1b) AS m1, sum(m2b) AS m2, sum(m3b) AS m3,
        |    sum(m4b) AS m4, sum(t1b) AS t1, sum(t2b) AS t2, sum(t3b) AS t3,
        |    sum(t4b) AS t4, sum(cb) AS c, sum(lr) AS r FROM pp GROUP BY 1))
        |SELECT pta.grp, pta.bleu_a, ptb.bleu_b, cmp.wins_a, cmp.ties,
        |  cmp.n_boot,
        |  round(CAST(wins_a AS DOUBLE) / n_boot, 6) AS share_a,
        |  wins_a * 1000 >= 950 * n_boot AS significant
        |FROM pta JOIN ptb ON ptb.grp = pta.grp
        |  JOIN cmp ON cmp.grp = pta.grp
        |ORDER BY pta.grp""".stripMargin,

    // X103: same first-occurrence checkpoints, NAIVE per-language
    // cumulative window (the decomposition's spec), same micro-nat
    // integer least squares as x85
    "x103_heaps" ->
      """WITH tw AS (SELECT lang, doc_id AS did,
        |    unnest(string_split(text, ' ')) AS w FROM documents),
        |tf AS (SELECT lang, did, w FROM tw WHERE length(w) > 0),
        |fd AS (SELECT lang, w, min(did) AS did FROM tf GROUP BY 1, 2),
        |nt AS (SELECT lang, did, count(*) AS nt FROM fd GROUP BY 1, 2),
        |tk AS (SELECT lang, did, count(*) AS tk FROM tf GROUP BY 1, 2),
        |pd AS (SELECT tk.lang, tk.did, tk.tk, coalesce(nt.nt, 0) AS nt
        |  FROM tk LEFT JOIN nt ON nt.lang = tk.lang AND nt.did = tk.did),
        |cm AS (SELECT lang,
        |  sum(tk) OVER (PARTITION BY lang ORDER BY did) AS cumt,
        |  sum(nt) OVER (PARTITION BY lang ORDER BY did) AS cumn FROM pd),
        |p AS (SELECT lang,
        |  CAST(round(ln(CAST(cumt AS DOUBLE)) * 1000000) AS BIGINT) AS x,
        |  CAST(round(ln(CAST(cumn AS DOUBLE)) * 1000000) AS BIGINT) AS y
        |  FROM cm),
        |mo AS (SELECT lang, count(*) AS n,
        |  sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
        |  sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
        |  sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        |  FROM p GROUP BY 1)
        |SELECT lang, CAST(n AS BIGINT) AS n_points,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN error('degenerate')
        |    ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE), 6) END AS beta,
        |  round((CAST(sy AS DOUBLE)
        |    - (CAST(n * sxy - sx * sy AS DOUBLE)
        |       / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
        |    / CAST(n AS DOUBLE) / 1000000.0, 6) AS ln_k
        |FROM mo ORDER BY lang""".stripMargin,

    // X104: same slices, same md5-mod buckets, same Laplace +1, same
    // nano-unit term rounding before the integer sum
    "x104_psi_drift" ->
      """WITH tka AS (SELECT lang AS grp, w FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE doc_id % 2 = 0) WHERE length(w) > 0),
        |tkb AS (SELECT lang AS grp, w FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS w
        |    FROM documents WHERE doc_id % 2 = 1) WHERE length(w) > 0),
        |ca AS (SELECT grp,
        |    ('0x' || substring(md5(w), 1, 8))::BIGINT % 64 AS bkt,
        |    count(*) AS c FROM tka GROUP BY 1, 2),
        |cb AS (SELECT grp,
        |    ('0x' || substring(md5(w), 1, 8))::BIGINT % 64 AS bkt,
        |    count(*) AS c FROM tkb GROUP BY 1, 2),
        |gs AS (SELECT DISTINCT grp FROM (
        |    SELECT grp FROM ca UNION ALL SELECT grp FROM cb)),
        |grid AS (SELECT grp, b.bkt FROM gs CROSS JOIN
        |    (SELECT unnest(generate_series(0, 63)) AS bkt) b),
        |j AS (SELECT grid.grp, grid.bkt,
        |    coalesce(ca.c, 0) + 1 AS ca, coalesce(cb.c, 0) + 1 AS cb
        |  FROM grid
        |    LEFT JOIN ca ON ca.grp = grid.grp AND ca.bkt = grid.bkt
        |    LEFT JOIN cb ON cb.grp = grid.grp AND cb.bkt = grid.bkt),
        |t AS (SELECT grp, sum(ca) AS na, sum(cb) AS nb FROM j GROUP BY 1),
        |terms AS (SELECT j.grp, na, nb,
        |    CAST(round((CAST(ca AS DOUBLE) / na - CAST(cb AS DOUBLE) / nb)
        |      * ln((CAST(ca AS DOUBLE) / na) / (CAST(cb AS DOUBLE) / nb))
        |      * 1000000000) AS BIGINT) AS tn
        |  FROM j JOIN t ON t.grp = j.grp)
        |SELECT grp, CAST(max(na) - 64 AS BIGINT) AS n_a,
        |  CAST(max(nb) - 64 AS BIGINT) AS n_b,
        |  round(CAST(sum(tn) AS DOUBLE) / 1000000000.0, 6) AS psi
        |FROM terms GROUP BY 1 ORDER BY grp""".stripMargin,

    // X105: same tokenization, frequency-of-frequencies, shifted
    // self-join for N_{r+1}, round-6 exact-integer ratios
    "x105_good_turing" ->
      """WITH tk AS (SELECT lang AS grp, w FROM (
        |    SELECT lang, unnest(list_transform(
        |      generate_series(1, len(string_split(text, ' ')) - 1),
        |      i -> array_to_string(string_split(text, ' ')[i:i+1], ' ')))
        |      AS w
        |    FROM documents) WHERE length(w) > 0),
        |f AS (SELECT grp, w, count(*) AS r FROM tk GROUP BY 1, 2),
        |nr AS (SELECT grp, r, count(*) AS n_r FROM f GROUP BY 1, 2),
        |t AS (SELECT grp, CAST(sum(r) AS BIGINT) AS n_tokens
        |  FROM f GROUP BY 1),
        |nx AS (SELECT grp, r - 1 AS r, n_r AS n_r1 FROM nr),
        |seen AS (SELECT nr.grp, CAST(nr.r AS BIGINT) AS r,
        |  CAST(nr.n_r AS BIGINT) AS n_r,
        |  CAST(coalesce(nx.n_r1, 0) AS BIGINT) AS n_r1, n_tokens,
        |  round(CAST((nr.r + 1) * coalesce(nx.n_r1, 0) AS DOUBLE)
        |    / nr.n_r, 6) AS r_star,
        |  round(CAST(nr.r * nr.n_r AS DOUBLE) / n_tokens, 6) AS p_mass
        |FROM nr LEFT JOIN nx ON nx.grp = nr.grp AND nx.r = nr.r
        |  JOIN t ON t.grp = nr.grp
        |WHERE nr.r <= 10),
        |zr AS (SELECT t.grp, CAST(0 AS BIGINT) AS r,
        |  CAST(0 AS BIGINT) AS n_r,
        |  CAST(coalesce(n1.n_r, 0) AS BIGINT) AS n_r1, n_tokens,
        |  0.0 AS r_star,
        |  round(CAST(coalesce(n1.n_r, 0) AS DOUBLE) / n_tokens, 6)
        |    AS p_mass
        |FROM t LEFT JOIN (SELECT grp, n_r FROM nr WHERE r = 1) n1
        |  ON n1.grp = t.grp)
        |SELECT * FROM (SELECT * FROM seen UNION ALL SELECT * FROM zr)
        |ORDER BY grp, r""".stripMargin,

    // X106: the x43 recall-audit oracle shape over prefix-sliced
    // embeddings — slice THEN quantize, same as the engine
    "x106_mrl_truncation" -> {
      def truncSql(d: Int): String =
        s"""WITH e AS (SELECT vec_id,
           |  list_transform(embedding[1:$d],
           |    x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
           |  FROM embeddings),
           |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
           |scored AS (SELECT qs.vec_id AS qid, c.vec_id AS cid,
           |  round(list_dot_product(qs.q, c.q)
           |    / (sqrt(qs.n2) * sqrt(c.n2)), 6) AS sim
           |  FROM n qs JOIN n c ON c.vec_id != qs.vec_id
           |  WHERE qs.vec_id < $NumQueries),
           |ranked AS (SELECT qid, cid,
           |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, cid)
           |    AS rank FROM scored)
           |SELECT qid, cid FROM ranked WHERE rank <= $TopK""".stripMargin
      val unions = Seq(64, 32, 16, 8).map(d =>
        s"SELECT 'trunc_$d' AS method, count(*) AS n_hits " +
          s"FROM m$d JOIN ex USING (qid, cid)").mkString("\n  UNION ALL ")
      val mctes = Seq(64, 32, 16, 8).map(d =>
        s"m$d AS (SELECT qid, cid FROM (${truncSql(d)}))").mkString(",\n")
      s"""WITH ex AS (SELECT qid, cid FROM (${truncSql(64)})),
         |$mctes,
         |t AS (SELECT count(*) AS n_truth FROM ex),
         |u AS (
         |  $unions)
         |SELECT method, CAST(n_hits AS BIGINT) AS n_hits,
         |  CAST(t.n_truth AS BIGINT) AS n_truth,
         |  CAST(n_hits * 1000000 // t.n_truth AS BIGINT) AS recall_ppm
         |FROM u CROSS JOIN t ORDER BY method""".stripMargin
    },

    // X107: both trained gates replayed (the x59 subquery composition),
    // kappa as the exact rational (n·agree − Σ a_c·b_c) / (n² − Σ)
    "x107_kappa" ->
      s"""WITH nb AS (SELECT doc_id, pred FROM ($nbQualitySql)),
         |lp AS (SELECT doc_id, pred FROM ($perceptronSql)),
         |pairs AS (
         |  SELECT 'lp_vs_declared' AS pair, lp.pred AS a, d.lang AS b
         |    FROM lp JOIN documents d USING (doc_id)
         |  UNION ALL SELECT 'nb_vs_declared', nb.pred, d.lang
         |    FROM nb JOIN documents d USING (doc_id)
         |  UNION ALL SELECT 'nb_vs_lp', nb.pred, lp.pred
         |    FROM nb JOIN lp USING (doc_id)),
         |base AS (SELECT pair, count(*) AS n,
         |    sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS agree
         |  FROM pairs GROUP BY 1),
         |ma AS (SELECT pair, a AS c, count(*) AS ca FROM pairs GROUP BY 1, 2),
         |mb AS (SELECT pair, b AS c, count(*) AS cb FROM pairs GROUP BY 1, 2),
         |cx AS (SELECT pair, sum(ca * cb) AS cpe
         |  FROM ma JOIN mb USING (pair, c) GROUP BY 1)
         |SELECT base.pair, CAST(n AS BIGINT) AS n,
         |  CAST(agree AS BIGINT) AS n_agree,
         |  CAST(n * agree - coalesce(cpe, 0) AS BIGINT) AS num,
         |  CAST(n * n - coalesce(cpe, 0) AS BIGINT) AS den,
         |  CASE WHEN n * n - coalesce(cpe, 0) = 0 THEN CAST(0 AS DOUBLE)
         |    ELSE round(CAST(n * agree - coalesce(cpe, 0) AS DOUBLE)
         |      / (n * n - coalesce(cpe, 0)), 6) END AS kappa
         |FROM base LEFT JOIN cx USING (pair)
         |ORDER BY base.pair""".stripMargin,

    // X108: same features, same tie-aware exact rank-sum composition
    "x108_feature_auc" ->
      """WITH f AS (SELECT lang = 'en' AS lbl,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    length(text) AS n_chars,
        |    (1000 * len(list_distinct(string_split(text, ' '))))
        |      // len(string_split(text, ' ')) AS ttr_permille
        |  FROM documents),
        |u AS (SELECT 'n_chars' AS grp, lbl, CAST(n_chars AS BIGINT) AS s FROM f
        |  UNION ALL SELECT 'n_tokens', lbl, CAST(n_tokens AS BIGINT) FROM f
        |  UNION ALL SELECT 'ttr_permille', lbl, CAST(ttr_permille AS BIGINT) FROM f),
        |sg AS (SELECT grp, s,
        |    sum(CASE WHEN lbl THEN 1 ELSE 0 END) AS cp,
        |    sum(CASE WHEN lbl THEN 0 ELSE 1 END) AS cn
        |  FROM u GROUP BY 1, 2),
        |cw AS (SELECT grp, s, cp, cn, coalesce(sum(cn) OVER (
        |    PARTITION BY grp ORDER BY s
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM sg),
        |ag AS (SELECT grp, sum(cp) AS np, sum(cn) AS nn,
        |    sum(cp * (cb * 2 + cn)) AS num2
        |  FROM cw GROUP BY 1)
        |SELECT grp, CAST(np AS BIGINT) AS np, CAST(nn AS BIGINT) AS nn,
        |  CAST(num2 AS BIGINT) AS num2,
        |  CAST(np * nn * 2 AS BIGINT) AS den2,
        |  CASE WHEN np * nn = 0 THEN CAST(0 AS DOUBLE)
        |    ELSE round(CAST(num2 AS DOUBLE) / (np * nn * 2), 6) END AS auc
        |FROM ag ORDER BY grp""".stripMargin,

    // X109: pixels re-derived from the render rule (id*31 + 7*byteIdx
    // mod 256 over a (id%8+1) x (id%5+1) frame) — the binary is never
    // parsed here, so the engine's byte-walk must agree with the pure
    // arithmetic to hash-match
    "x109_image_ahash" -> {
      // p = 3*(si*w + sj), si = (i*h)//4, sj = (j*w)//4, i = k//4, j = k%4
      val pidx = "(3 * ((((ks.k // 4) * h) // 4) * w + (((ks.k % 4)) * w) // 4))"
      def chan(d: Int) = s"((31 * doc_id + 7 * ($pidx + $d)) % 256)"
      s"""WITH im AS (SELECT doc_id,
         |    CAST(doc_id % 8 + 1 AS INTEGER) AS w,
         |    CAST(doc_id % 5 + 1 AS INTEGER) AS h FROM documents),
         |cells AS (SELECT doc_id, w, h, ks.k AS k,
         |    (${chan(0)} + ${chan(1)} + ${chan(2)}) // 3 AS g
         |  FROM im CROSS JOIN
         |    (SELECT unnest(generate_series(0, 15)) AS k) ks),
         |av AS (SELECT doc_id, sum(g) // 16 AS avg FROM cells GROUP BY 1),
         |hs AS (SELECT cells.doc_id, max(cells.w) AS width,
         |    max(cells.h) AS height,
         |    CAST(sum(CASE WHEN g > av.avg
         |      THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS ahash
         |  FROM cells JOIN av ON av.doc_id = cells.doc_id GROUP BY 1),
         |gr AS (SELECT ahash, CAST(count(*) AS BIGINT) AS group_n,
         |    min(doc_id) AS canonical_id FROM hs GROUP BY 1)
         |SELECT hs.doc_id, hs.width, hs.height, hs.ahash,
         |  gr.group_n, gr.canonical_id
         |FROM hs JOIN gr ON gr.ahash = hs.ahash
         |ORDER BY hs.doc_id""".stripMargin
    },

    // X110: samples re-derived from the render rule (id*131 + 17*word
    // mod 65536 minus 32768, nWords = (id%50+1)*(id%2+1)); window
    // energies as conditional integer sums over the word list
    "x110_audio_fp" -> {
      val eCols = (0 until 8).map(k =>
        s"sum(CASE WHEN i >= $k * nw // 8 AND i < ${k + 1} * nw // 8 " +
          s"THEN s * s ELSE 0 END) AS e$k").mkString(",\n        |    ")
      val fpBits = (0 until 7).map(j =>
        s"(CASE WHEN e${j + 1} > e$j THEN ${1L << j} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH w AS (SELECT doc_id,
         |    CAST((doc_id % 50 + 1) * (doc_id % 2 + 1) AS BIGINT) AS nw
         |  FROM documents),
         |sq AS (SELECT doc_id, nw, i,
         |    (doc_id * 131 + i * 17) % 65536 - 32768 AS s
         |  FROM (SELECT doc_id, nw,
         |    unnest(generate_series(0, nw - 1)) AS i FROM w)),
         |en AS (SELECT doc_id, max(nw) AS n_words,
         |    $eCols,
         |    sum(s * s) AS energy
         |  FROM sq GROUP BY 1),
         |fp AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         |    CAST($fpBits AS BIGINT) AS fp,
         |    CAST(energy AS BIGINT) AS energy FROM en),
         |gr AS (SELECT fp.n_words, fp.fp,
         |    CAST(count(*) AS BIGINT) AS group_n,
         |    min(doc_id) AS canonical_id FROM fp GROUP BY 1, 2)
         |SELECT fp.doc_id, fp.n_words, fp.fp, fp.energy,
         |  gr.group_n, gr.canonical_id
         |FROM fp JOIN gr ON gr.fp = fp.fp AND gr.n_words = fp.n_words
         |ORDER BY fp.doc_id""".stripMargin
    },

    // X111: the x9 norm_fp and the x109 rule-derived aHash joined into
    // the same two-group-by audit
    "x111_modal_consistency" -> {
      val pidx = "(3 * ((((ks.k // 4) * h) // 4) * w + (((ks.k % 4)) * w) // 4))"
      def chan(d: Int) = s"((31 * doc_id + 7 * ($pidx + $d)) % 256)"
      s"""WITH tf AS (SELECT doc_id,
         |    md5(trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
         |  FROM documents),
         |im AS (SELECT doc_id,
         |    CAST(doc_id % 8 + 1 AS INTEGER) AS w,
         |    CAST(doc_id % 5 + 1 AS INTEGER) AS h FROM documents),
         |cells AS (SELECT doc_id, ks.k AS k,
         |    (${chan(0)} + ${chan(1)} + ${chan(2)}) // 3 AS g
         |  FROM im CROSS JOIN
         |    (SELECT unnest(generate_series(0, 15)) AS k) ks),
         |av AS (SELECT doc_id, sum(g) // 16 AS avg FROM cells GROUP BY 1),
         |hs AS (SELECT cells.doc_id,
         |    CAST(sum(CASE WHEN g > av.avg
         |      THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS ahash
         |  FROM cells JOIN av ON av.doc_id = cells.doc_id GROUP BY 1)
         |SELECT hs.ahash, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT tf.norm_fp) AS BIGINT) AS n_text,
         |  min(tf.doc_id) AS canonical_id,
         |  count(DISTINCT tf.norm_fp) = 1 AS consistent
         |FROM tf JOIN hs ON hs.doc_id = tf.doc_id
         |GROUP BY 1 HAVING count(*) > 1
         |ORDER BY hs.ahash""".stripMargin
    },

    // X115: naive all-pairs popcount over the DISTINCT 64-bit hashes
    // re-derived from the render rule, canonical = min doc per hash —
    // the banded pigeonhole in the engine must be invisible here (the
    // losslessness proof, x48/x79 discipline)
    "x115_image_hamming" ->
      s"""WITH $x115HashCtes,
         |g AS (SELECT h64, min(doc_id) AS cid,
         |    CAST(count(*) AS BIGINT) AS m FROM hs GROUP BY 1)
         |SELECT a.cid AS d1, b.cid AS d2,
         |  CAST(bit_count(xor(a.h64, b.h64)) AS BIGINT) AS dist,
         |  a.m AS n1, b.m AS n2
         |FROM g a JOIN g b ON a.cid < b.cid
         |WHERE bit_count(xor(a.h64, b.h64)) <= $ImgHamMaxDist
         |ORDER BY d1, d2""".stripMargin,

    // X115 audit: both tiers re-derived at signature-group grain
    // (binomials/products of group sizes — no doc-pair enumeration),
    // truth = exact 64-bit equality, then the pairAudit integer-ppm
    // arithmetic verbatim
    "x115_image_audit" -> {
      val pidx16 = "(3 * ((((ks.k // 4) * h) // 4) * w + (((ks.k % 4)) * w) // 4))"
      def chan16(d: Int) = s"((31 * doc_id + 7 * ($pidx16 + $d)) % 256)"
      s"""WITH $x115HashCtes,
         |c16 AS (SELECT doc_id, w, h, ks.k AS k,
         |    (${chan16(0)} + ${chan16(1)} + ${chan16(2)}) // 3 AS g
         |  FROM im CROSS JOIN
         |    (SELECT unnest(generate_series(0, 15)) AS k) ks),
         |a16v AS (SELECT doc_id, sum(g) // 16 AS avg FROM c16 GROUP BY 1),
         |ht AS (SELECT c16.doc_id,
         |    CAST(sum(CASE WHEN g > a16v.avg
         |      THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT) AS h16
         |  FROM c16 JOIN a16v ON a16v.doc_id = c16.doc_id GROUP BY 1),
         |g64 AS (SELECT h64, CAST(count(*) AS BIGINT) AS m
         |  FROM hs GROUP BY 1),
         |tr AS (SELECT CAST(coalesce(sum(m * (m - 1) // 2), 0) AS BIGINT)
         |  AS n_truth FROM g64),
         |cx AS (SELECT CAST(coalesce(sum(a.m * b.m), 0) AS BIGINT)
         |  AS n_cross FROM g64 a JOIN g64 b ON a.h64 < b.h64
         |  AND bit_count(xor(a.h64, b.h64)) <= $ImgHamMaxDist),
         |w64 AS (SELECT CAST(coalesce(sum(m * (m - 1) // 2), 0) AS BIGINT)
         |  AS n_within FROM g64),
         |g16 AS (SELECT CAST(coalesce(sum(m * (m - 1) // 2), 0) AS BIGINT)
         |  AS n_pairs FROM (SELECT h16, CAST(count(*) AS BIGINT) AS m
         |    FROM ht GROUP BY 1)),
         |jt AS (SELECT CAST(coalesce(sum(m * (m - 1) // 2), 0) AS BIGINT)
         |  AS n_hits FROM (SELECT ht.h16, hs.h64,
         |      CAST(count(*) AS BIGINT) AS m
         |    FROM ht JOIN hs ON hs.doc_id = ht.doc_id GROUP BY 1, 2)),
         |m AS (
         |  SELECT 'a16_exact' AS method, g16.n_pairs, jt.n_hits
         |    FROM g16 CROSS JOIN jt
         |  UNION ALL
         |  SELECT 'h64_d3', w64.n_within + cx.n_cross, w64.n_within
         |    FROM w64 CROSS JOIN cx)
         |SELECT method, n_pairs, n_hits, tr.n_truth,
         |  CAST(CASE WHEN n_pairs > 0 THEN n_hits * 1000000 // n_pairs
         |       ELSE 0 END AS BIGINT) AS precision_ppm,
         |  CAST(n_hits * 1000000 // tr.n_truth AS BIGINT) AS recall_ppm
         |FROM m CROSS JOIN tr ORDER BY method""".stripMargin
    },

    // X117: the naive corpus-x-eval cosine scan — identical quantized
    // integer lanes and floor(cos*1e6) micro-units, max per corpus
    // row with min-eval-id tie break
    "x117_semantic_decon" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS q
         |  FROM embeddings),
         |n AS (SELECT vec_id, q, list_dot_product(q, q) AS n2 FROM e),
         |c AS (SELECT * FROM n WHERE vec_id % 10 <> 0),
         |ev AS (SELECT vec_id AS eval_id, q, n2 FROM n WHERE vec_id % 10 = 0),
         |s AS (SELECT c.vec_id, ev.eval_id,
         |  CAST(floor(list_dot_product(c.q, ev.q)
         |    / (sqrt(c.n2) * sqrt(ev.n2)) * 1000000) AS BIGINT) AS sim_ppm
         |  FROM c JOIN ev ON ev.eval_id <> c.vec_id),
         |m AS (SELECT vec_id, max(sim_ppm) AS max_sim_ppm FROM s GROUP BY 1),
         |pick AS (SELECT s.vec_id, m.max_sim_ppm,
         |  min(s.eval_id) AS nearest_eval
         |  FROM s JOIN m ON m.vec_id = s.vec_id AND s.sim_ppm = m.max_sim_ppm
         |  GROUP BY 1, 2)
         |SELECT vec_id, max_sim_ppm, nearest_eval,
         |  CASE WHEN max_sim_ppm >= $SemDeconTauPpm THEN 'drop'
         |       ELSE 'keep' END AS verdict
         |FROM pick ORDER BY vec_id""".stripMargin,

    // X123: the same frequency-group-grain arithmetic — cumulative
    // windows over distinct frequencies, one boundary group per size,
    // full-coverage fallthrough past the vocabulary
    "x123_vocab_coverage" -> {
      val ss = VocabSizes.mkString("[", ", ", "]")
      s"""WITH tk AS (SELECT grp, w FROM (SELECT lang AS grp,
         |    unnest(string_split(text, ' ')) AS w FROM documents)
         |  WHERE length(w) > 0),
         |ty AS (SELECT grp, w, CAST(count(*) AS BIGINT) AS c
         |  FROM tk GROUP BY 1, 2),
         |fg AS (SELECT grp, c, CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(c * count(*) AS BIGINT) AS mass FROM ty GROUP BY 1, 2),
         |cum AS (SELECT *,
         |  CAST(coalesce(sum(n_types) OVER (PARTITION BY grp
         |    ORDER BY c DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS t_above,
         |  CAST(coalesce(sum(mass) OVER (PARTITION BY grp
         |    ORDER BY c DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS BIGINT) AS m_above FROM fg),
         |tot AS (SELECT grp, CAST(sum(mass) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_types) AS BIGINT) AS n_types_total
         |  FROM fg GROUP BY 1),
         |grid AS (SELECT grp, n_tokens, n_types_total,
         |  CAST(unnest($ss) AS BIGINT) AS vocab_size FROM tot),
         |hit AS (SELECT g.grp, g.vocab_size,
         |  CAST(c2.m_above + (g.vocab_size - c2.t_above) * c2.c
         |    AS BIGINT) AS covered
         |  FROM grid g JOIN cum c2 ON c2.grp = g.grp
         |  AND c2.t_above < g.vocab_size
         |  AND g.vocab_size <= c2.t_above + c2.n_types)
         |SELECT g.grp, g.vocab_size, g.n_types_total, g.n_tokens,
         |  CAST(coalesce(hit.covered, g.n_tokens) AS BIGINT) AS covered,
         |  CAST(coalesce(hit.covered, g.n_tokens) * 1000000 // g.n_tokens
         |    AS BIGINT) AS coverage_ppm,
         |  CAST((g.n_tokens - coalesce(hit.covered, g.n_tokens)) * 1000000
         |    // g.n_tokens AS BIGINT) AS oov_ppm
         |FROM grid g LEFT JOIN hit
         |  ON hit.grp = g.grp AND hit.vocab_size = g.vocab_size
         |ORDER BY g.grp, g.vocab_size""".stripMargin
    },

    // X122: the sign matrix re-derived from SQL md5 (a pure function
    // of the dimension pair — no literals to inline), projection and
    // distortion as exact integer sums
    "x122_jl_project" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))
         |    AS q FROM embeddings WHERE embedding IS NOT NULL),
         |sg AS (SELECT a.i, b.j,
         |  CASE WHEN ('0x' || substring(md5('jl|' || a.i || '|' || b.j),
         |      1, 1))::INTEGER % 2 = 1 THEN 1 ELSE -1 END AS s
         |  FROM (SELECT unnest(generate_series(1, $JlDIn)) AS i) a
         |  CROSS JOIN (SELECT unnest(generate_series(1, $JlDOut)) AS j) b)
         |SELECT e.vec_id, CAST(sg.j AS BIGINT) AS dim,
         |  CAST(sum(q[sg.i] * sg.s) AS BIGINT) AS y
         |FROM e CROSS JOIN sg GROUP BY 1, 2
         |ORDER BY vec_id, dim""".stripMargin,

    "x122_jl_distortion" ->
      s"""WITH e AS (SELECT vec_id,
         |  list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000))
         |    AS q FROM embeddings WHERE embedding IS NOT NULL),
         |ix AS (SELECT unnest(generate_series(1, $JlDIn)) AS i),
         |sg AS (SELECT a.i, b.j,
         |  CASE WHEN ('0x' || substring(md5('jl|' || a.i || '|' || b.j),
         |      1, 1))::INTEGER % 2 = 1 THEN 1 ELSE -1 END AS s
         |  FROM (SELECT unnest(generate_series(1, $JlDIn)) AS i) a
         |  CROSS JOIN (SELECT unnest(generate_series(1, $JlDOut)) AS j) b),
         |t AS (SELECT e.vec_id, sg.j AS dim,
         |  CAST(sum(q[sg.i] * sg.s) AS BIGINT) AS y
         |  FROM e CROSS JOIN sg GROUP BY 1, 2),
         |po AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  CAST(sum((a.q[ix.i] - b.q[ix.i]) * (a.q[ix.i] - b.q[ix.i]))
         |    AS BIGINT) AS orig2
         |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1 CROSS JOIN ix
         |  GROUP BY 1, 2),
         |pd AS (SELECT ya.vec_id AS id_a,
         |  CAST(sum((ya.y - yb.y) * (ya.y - yb.y)) AS BIGINT) AS proj2
         |  FROM t ya JOIN t yb
         |  ON yb.vec_id = ya.vec_id + 1 AND yb.dim = ya.dim
         |  GROUP BY 1)
         |SELECT po.id_a, po.id_b, po.orig2, pd.proj2,
         |  CAST(pd.proj2 * 1000000 // ($JlDOut * po.orig2) AS BIGINT)
         |    AS distortion_ppm
         |FROM po JOIN pd ON pd.id_a = po.id_a
         |WHERE po.orig2 > 0 ORDER BY po.id_a""".stripMargin,

    // X118: sketches re-derived by the naive min-k window (the x92
    // CTEs), then the identical (k-1)*2^48 div h_k integer estimator
    // and theta composition; exact audit from the full distinct sets
    "x118_kmv_algebra" -> {
      val coef = (KmvK - 1).toLong * (1L << 48)
      def estSql(n: String, hk: String): String =
        s"CASE WHEN $n < $KmvK THEN $n ELSE $coef // greatest($hk, 1) END"
      s"""WITH $ShingleCte,
         |j AS (SELECT sh.doc_id, d.source AS grp, sh.s
         |  FROM sh JOIN documents d USING (doc_id) WHERE sh.s IS NOT NULL),
         |a AS (SELECT DISTINCT grp, s FROM j WHERE doc_id % 2 = 0),
         |b AS (SELECT DISTINCT grp, s FROM j WHERE doc_id % 3 = 0),
         |ka AS (SELECT grp, h FROM (SELECT grp, md5(s) AS h,
         |  row_number() OVER (PARTITION BY grp ORDER BY md5(s)) AS r
         |  FROM a) WHERE r <= $KmvK),
         |kb AS (SELECT grp, h FROM (SELECT grp, md5(s) AS h,
         |  row_number() OVER (PARTITION BY grp ORDER BY md5(s)) AS r
         |  FROM b) WHERE r <= $KmvK),
         |sa AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_a,
         |  max(('0x' || substring(h, 1, 12))::BIGINT) AS hk_a
         |  FROM ka GROUP BY 1),
         |sb AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_b,
         |  max(('0x' || substring(h, 1, 12))::BIGINT) AS hk_b
         |  FROM kb GROUP BY 1),
         |uu AS (SELECT coalesce(ka.grp, kb.grp) AS grp,
         |  coalesce(ka.h, kb.h) AS h,
         |  CASE WHEN ka.h IS NOT NULL THEN 1 ELSE 0 END AS ina,
         |  CASE WHEN kb.h IS NOT NULL THEN 1 ELSE 0 END AS inb
         |  FROM ka FULL JOIN kb ON ka.grp = kb.grp AND ka.h = kb.h),
         |uk AS (SELECT *, row_number() OVER (PARTITION BY grp ORDER BY h)
         |  AS r FROM uu),
         |us AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_u,
         |  max(('0x' || substring(h, 1, 12))::BIGINT) AS hk_u,
         |  CAST(sum(ina * inb) AS BIGINT) AS n_both,
         |  CAST(sum(ina * (1 - inb)) AS BIGINT) AS n_a_only,
         |  CAST(sum((1 - ina) * inb) AS BIGINT) AS n_b_only
         |  FROM uk WHERE r <= $KmvK GROUP BY 1),
         |alg AS (SELECT us.grp,
         |  CAST(coalesce(sa.n_a, 0) AS BIGINT) AS n_a,
         |  CAST(coalesce(sb.n_b, 0) AS BIGINT) AS n_b,
         |  n_u, n_both, n_a_only, n_b_only,
         |  CAST(${estSql("coalesce(sa.n_a, 0)", "sa.hk_a")} AS BIGINT)
         |    AS est_a,
         |  CAST(${estSql("coalesce(sb.n_b, 0)", "sb.hk_b")} AS BIGINT)
         |    AS est_b,
         |  CAST(${estSql("n_u", "hk_u")} AS BIGINT) AS est_union
         |  FROM us LEFT JOIN sa ON sa.grp = us.grp
         |  LEFT JOIN sb ON sb.grp = us.grp),
         |ex AS (SELECT grp,
         |  CAST(sum(ia) AS BIGINT) AS ex_a, CAST(sum(ib) AS BIGINT) AS ex_b,
         |  CAST(count(*) AS BIGINT) AS ex_union,
         |  CAST(sum(ia * ib) AS BIGINT) AS ex_intersect
         |  FROM (SELECT coalesce(a.grp, b.grp) AS grp,
         |    CASE WHEN a.s IS NOT NULL THEN 1 ELSE 0 END AS ia,
         |    CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END AS ib
         |    FROM a FULL JOIN b ON a.grp = b.grp AND a.s = b.s) GROUP BY 1)
         |SELECT alg.grp, n_a, n_b, n_u, n_both, n_a_only, n_b_only,
         |  est_a, est_b, est_union,
         |  CAST(n_both * est_union // greatest(n_u, 1) AS BIGINT)
         |    AS est_intersect,
         |  CAST(n_a_only * est_union // greatest(n_u, 1) AS BIGINT)
         |    AS est_a_only,
         |  CAST(n_b_only * est_union // greatest(n_u, 1) AS BIGINT)
         |    AS est_b_only,
         |  ex_a, ex_b, ex_union, ex_intersect
         |FROM alg JOIN ex ON ex.grp = alg.grp
         |ORDER BY alg.grp""".stripMargin
    }
  )

  /** Shared x94 CTE: augmented text + per-category counts in [[Pii.mask]]
    * priority order (email on the raw text, IP on the email-masked text,
    * phone on the email-then-IP-masked text — mirroring [[Pii.scan]], so
    * a phone/IP-shaped substring inside an email counts once as email).
    */
  private def x94ScanSql: String =
    s"""WITH aug AS (SELECT doc_id, $piiAugmentSql AS t FROM documents),
       |em AS (SELECT doc_id, t,
       |  regexp_replace(t, '${Pii.EmailPattern}', '${Pii.EmailToken}', 'g')
       |    AS te FROM aug),
       |sc AS (SELECT doc_id, t,
       |  CAST(len(regexp_extract_all(t, '${Pii.EmailPattern}')) AS BIGINT)
       |    AS n_email,
       |  CAST(len(regexp_extract_all(
       |    regexp_replace(te, '${Pii.Ipv4Pattern}', '${Pii.IpToken}', 'g'),
       |    '${Pii.PhonePattern}')) AS BIGINT) AS n_phone,
       |  CAST(len(regexp_extract_all(te, '${Pii.Ipv4Pattern}')) AS BIGINT)
       |    AS n_ip,
       |  CAST(len(regexp_extract_all(t, '${Pii.EmailPattern}'))
       |    + len(regexp_extract_all(
       |        regexp_replace(te, '${Pii.Ipv4Pattern}', '${Pii.IpToken}', 'g'),
       |        '${Pii.PhonePattern}'))
       |    + len(regexp_extract_all(te, '${Pii.Ipv4Pattern}')) AS BIGINT)
       |    AS n_pii
       |  FROM em)""".stripMargin

  private def x94MaskSql: String =
    s"""regexp_replace(regexp_replace(regexp_replace(t,
       |    '${Pii.EmailPattern}', '${Pii.EmailToken}', 'g'),
       |    '${Pii.Ipv4Pattern}', '${Pii.IpToken}', 'g'),
       |    '${Pii.PhonePattern}', '${Pii.PhoneToken}', 'g')""".stripMargin

  /** Shared x93 CTE chain: co-purchase edges -> degrees ->
    * degree-ordered orientation -> wedges -> closed triangles ->
    * per-node participation.
    */
  private def x93PerNodeSql: String =
    s"""WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
       |  FROM lineitem),
       |e AS (SELECT DISTINCT a.pk AS u, b.pk AS v
       |  FROM li a JOIN li b USING (ok) WHERE a.pk < b.pk),
       |deg AS (SELECT node, count(*) AS d FROM
       |  (SELECT u AS node FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
       |o AS (SELECT
       |  CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.u ELSE e.v END AS src,
       |  CASE WHEN (da.d, e.u) < (db.d, e.v) THEN e.v ELSE e.u END AS dst,
       |  CASE WHEN (da.d, e.u) < (db.d, e.v) THEN db.d ELSE da.d END AS dd
       |  FROM e JOIN deg da ON da.node = e.u JOIN deg db ON db.node = e.v),
       |wdg AS (SELECT x.src AS a1, x.dst AS a2, y.dst AS a3
       |  FROM o x JOIN o y
       |  ON x.src = y.src AND (x.dd, x.dst) < (y.dd, y.dst)),
       |tri AS (SELECT a1, a2, a3 FROM wdg
       |  SEMI JOIN o ON wdg.a2 = o.src AND wdg.a3 = o.dst),
       |pt AS (SELECT node, count(*) AS tri FROM
       |  (SELECT a1 AS node FROM tri UNION ALL SELECT a2 FROM tri
       |   UNION ALL SELECT a3 FROM tri) GROUP BY 1)""".stripMargin
}
