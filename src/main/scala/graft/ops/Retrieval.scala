package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X24/X25 — relevance scoring for corpus curation and retrieval:
  * per-document TF-IDF top terms and BM25 ranked retrieval.
  *
  * Both are standard IR formulas (Robertson & Spärck Jones; the BM25
  * form is the Okapi variant used by Lucene), expressed as declarative
  * plans so Catalyst keeps every per-document step inside the scan
  * projection.
  *
  * Determinism note (oracle contract): `ln` is NOT an IEEE-core op —
  * glibc and the JVM disagree by 1 ulp on ~1/3600 inputs (measured),
  * so every `ln` result is rounded to 6 dp immediately on BOTH engine
  * sides; all downstream arithmetic is IEEE-core (+,*,/) on identical
  * bits and therefore exact.
  */
object Retrieval {

  /** Top-k terms per document by TF-IDF (idf = ln(N/df), rounded — see
    * class doc).
    *
    * Shape at 100 TB: term frequencies aggregate with map-side combine,
    * so the (doc, token) shuffle carries distinct pairs, not token
    * occurrences; document frequencies derive from the tf table (no
    * second corpus scan); the tf⨝df join shuffles on token — AQE
    * broadcasts the df side automatically when the vocabulary is small,
    * and falls back to a shuffle join when it is not (no manual hint to
    * outgrow). The per-doc top-k is a bounded window over doc_id.
    */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("token"))
    val tf = tok.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val scored = tf.join(df_, "token").crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * round(log(col("n").cast("double") / col("df")), 6), 6))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tfidf").desc, col("token"))).cast("int"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("token"), col("tf"), col("df"),
        col("tfidf"), col("rnk"))
  }

  /** X35 — exact phrase search over a positional inverted index: find
    * every document containing `phrase` as consecutive tokens, with the
    * match count and first match position (1-based).
    *
    * The engine-side plan is the classic positional-postings
    * intersection: posexplode yields (doc, pos, term) postings; the
    * postings of phrase term 0 anchor the match, and each later term i
    * joins on `(doc, anchor_pos + i)` — a chain of hash EQUI-joins (the
    * position offset folds into the join key), never a nested-loop or a
    * LIKE scan.
    *
    * Shape at 100 TB: each join input is one term's posting list — a
    * `term = const` filter pushed to the postings scan, so rare terms
    * broadcast and only common terms shuffle, on (doc, pos) keys that
    * are unique per posting (no skew: a document contributes at most
    * one row per position). In a persisted-index pipeline the postings
    * table is the natural bucketed artifact (bucket by doc) and every
    * join below is co-located.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val postings = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .select(col(idCol), col("pos").cast("bigint").as("pos"),
        col("col").as("term"))
    val anchor = postings.filter(col("term") === phrase.head)
      .select(col(idCol), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(anchor) {
      case (acc, (t, i)) =>
        val next = postings.filter(col("term") === t)
          .select(col(idCol), (col("pos") - i).as("pos"))
        acc.join(next, Seq(idCol, "pos"))
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("pos")) + 1L).as("first_pos"))
  }

  /** BM25 ranked retrieval for a fixed term query (k1/b are the Okapi
    * defaults). Returns the `topK` documents by score (ties to the
    * lower id).
    *
    * Shape at 100 TB: the corpus is NEVER shuffled — per-document term
    * frequencies and length come row-locally off the token array
    * (query terms are a static list, so `tf_t` is a fixed set of
    * `size(filter(...))` projections), the corpus statistics (N, total
    * tokens, per-term df) reduce to ONE scalar row that cross-joins
    * back as a broadcast, and the top-k is a TakeOrdered, not a sort.
    * The per-term score sum is a FIXED-ORDER expression fold (not an
    * aggregation), so float addition order is identical on both oracle
    * sides.
    */
  /** X80 — reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    * the standard hybrid-retrieval combiner — fuse N rankings of the
    * same corpus (here sparse BM25 + dense cosine) by summing
    * reciprocal ranks, rrf(d) = Σ_r 1/(K + rank_r(d)), K = 60. RRF
    * needs no score calibration between rankers (ranks only), which is
    * why it is the default fusion in hybrid search engines.
    *
    * EXACT INTEGER form: each contribution is `floor(10^6/(K + rank))`
    * micro-units — one integral division per (doc, ranker), no float
    * anywhere — so the fused ordering is bit-reproducible. A doc absent
    * from a ranker's top-k contributes 0 (the standard top-k fusion
    * convention) and reports rank 0 in that ranker's column.
    *
    * Shape at 100 TB: fusion cost is RANKER-OUTPUT-sized, never
    * corpus-sized — the inputs are already top-k lists, the full-outer
    * fold joins k-row frames (AQE broadcasts them), and the final sort
    * orders ≤ N·k rows. The rankers themselves carry the corpus-scale
    * contracts (bm25's scalar-stats broadcast, x2's query broadcast).
    *
    * `rankings` maps ranker name → (idCol, rank) frame; output carries
    * one `<name>_rank` column per ranker plus `rrf_micro`.
    */
  def rrfFuse(rankings: Seq[(String, DataFrame)], idCol: String,
              kRrf: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    require(rankings.map(_._1).distinct.size == rankings.size,
      "ranker names must be distinct")
    // names are spliced into column identifiers and expr() SQL below —
    // anything beyond a bare identifier would mis-parse (e.g. "bm-25"
    // reads as a subtraction)
    rankings.foreach { case (name, _) =>
      require(name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"ranker name '$name' must be a bare identifier ([A-Za-z0-9_])")
    }
    val sides = rankings.map { case (name, r) =>
      // ranks must be 1-based: rank 0 is the 'absent from this ranker'
      // output sentinel, and the 10^6 div (K + rank) contribution
      // assumes 1-based — a 0-based ranker would be indistinguishable
      // from absent AND silently over-weighted. Fail in-plan instead.
      val rk = col("rank").cast("long")
      r.select(col(idCol),
        when(rk.isNull || rk < 1L,
          raise_error(lit(s"rrfFuse: ranker '$name' emitted a rank < 1 " +
            "(or NULL) — ranks must be 1-based")))
          .otherwise(rk).as(s"${name}_rank"))
    }
    val joined = sides.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = rankings.map { case (name, _) =>
      coalesce(expr(s"1000000L div (${kRrf}L + ${name}_rank)"), lit(0L))
    }.reduce(_ + _)
    joined.select(
      col(idCol) +:
        rankings.map { case (name, _) =>
          coalesce(col(s"${name}_rank"), lit(0L)).as(s"${name}_rank")
        } :+ rrf.as("rrf_micro"): _*)
  }

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], topK: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ts = split(col(textCol), " ")
    val dfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(array_contains(ts, t), 1L).otherwise(0L)).as(s"df$i")
    }
    val stats = docs.agg(count(lit(1)).as("n"),
      sum(size(ts).cast("long")).as("total_tokens") +: dfCols: _*)
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      size(filter(ts, x => x === lit(t))).cast("double").as(s"tf$i")
    }
    val withStats = docs
      .select(col(idCol) +: size(ts).cast("double").as("dl") +: tfCols: _*)
      .crossJoin(broadcast(stats))
    val avgdl = col("total_tokens").cast("double") / col("n")
    // operator tree mirrors the oracle SQL exactly: ((1.0-b) + ((b*dl)/avgdl))
    val lenNorm = lit(1.0 - b) + lit(b) * col("dl") / avgdl
    val termScores = queryTerms.indices.map { i =>
      val tf = col(s"tf$i")
      val idf = round(log((col("n").cast("double") - col(s"df$i") + 0.5) /
        (col(s"df$i") + 0.5) + 1.0), 6)
      when(tf > 0.0,
        idf * (tf * (k1 + 1.0)) / (tf + lit(k1) * lenNorm))
        .otherwise(lit(0.0))
    }
    val score = round(termScores.reduceLeft(_ + _), 6)
    val top = withStats.select(col(idCol), score.as("score"))
      .filter(col("score") > 0.0)
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
    // ranking the already-limited top-k: a single tiny partition by
    // construction, not a corpus-wide global window
    top.withColumn("rank", row_number().over(
      Window.orderBy(col("score").desc, col(idCol))).cast("int"))
  }
}
