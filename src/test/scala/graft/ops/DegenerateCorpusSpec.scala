package graft.ops

import graft.SparkSpec
import graft.engine.Monitor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The ANSI divide-by-zero class, caught structurally (round-16's x144
  * spec found `gateSignals` crashing on the first 1-token document —
  * a bug three shipped families carried because no fixture contained
  * one). This suite drives the headline text / dedup / embedding /
  * monitor kernels over ONE canonical degenerate corpus so every
  * zero-denominator seam (zero bigrams, empty text, null text, zero
  * vector, single-member source, single-instant event stream) is
  * exercised on every test run — a new op that divides unguarded by a
  * structurally-occasionally-zero count breaks here, not in
  * production. Spark 4 runs ANSI mode by default: these divides THROW
  * rather than return null, so "no crash" assertions are load-bearing.
  */
class DegenerateCorpusSpec extends SparkSpec {

  import spark.implicits._

  /** The canonical degenerate corpus: every row is a denominator edge.
    * (normal control, 1-token = zero bigrams, empty text, null text,
    * exact dup in a single-member source, all-repeat tokens.)
    */
  private def docs: DataFrame = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "webA"),
    (2L, "solo", "webA"),
    (3L, "", "webB"),
    (4L, null.asInstanceOf[String], "webB"),
    (5L, "alpha beta gamma delta epsilon zeta", "lone"),
    (6L, "a a a a a a a a", "webA")
  ).toDF("doc_id", "text", "source")

  /** Zero vector (id 100) among unit-ish vectors. */
  private def embs: DataFrame = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (100L, Seq(0.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("id", "vec")

  test("text analysis kernels survive 1-token, empty, and null text") {
    val stats = TextAnalysis.textStats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(stats.size === 6)
    // 1-token doc: every per-token ratio defined (denominator 1)
    assert(stats(2L).getAs[Int]("n_tokens") === 1)
    assert(stats(2L).getAs[Double]("quality") === 1.0)
    // empty text splits to one zero-length token, never zero tokens
    assert(stats(3L).getAs[Int]("n_tokens") === 1)
    // null text propagates null signals, not a crash
    assert(stats(4L).isNullAt(stats(4L).fieldIndex("n_tokens")))
    val lang = TextAnalysis.langId(docs, "doc_id", "text").collect()
    assert(lang.length === 6)
    // zero bigrams: the n_ngrams > 0 pre-filter drops doc 2 from the
    // ngram-ratio table instead of dividing by zero
    val ngrams = TextAnalysis.commonNgramShare(docs, "doc_id", "text")
    assert(!ngrams.select("doc_id").as[Long].collect().contains(2L))
  }

  test("curation gate survives the degenerate corpus and fails the " +
    "degenerate rows closed") {
    val sig = Curate.gateSignals(docs, "text")
    val rows = sig.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 1-token doc: zero bigrams -> null ratio (the round-16 guard), and
    // the gate never passes it (n_ngrams > 0 is the first conjunct)
    assert(rows(2L).getAs[Long]("n_ngrams") === 0L)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("dup_ngram_ratio")))
    val passed = sig.filter(Curate.gatePass(0.5, 0.2))
      .select("doc_id").as[Long].collect().toSet
    assert(!passed.contains(2L) && !passed.contains(4L))
    assert(passed.contains(1L))
    // per-source attribution counts over the same corpus: no crash,
    // every named source present
    val attr = Curate.attributionCounts(docs, "source", "text", 0.5, 0.2)
    assert(attr.select("src").as[String].collect().toSet ===
      Set("webA", "webB", "lone"))
  }

  test("dedup tiers survive the degenerate corpus; zero-shingle docs " +
    "drop out of LSH instead of pairing") {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numSigs = 16, rowsPerBand = 4, threshold = 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L))) // the exact dup still collides
    // docs 2/3/4 have zero 3-shingles: no signature, no bands, no pairs
    assert(!pairs.exists(p => Set(p._1, p._2).exists(Set(2L, 3L, 4L))))
    val exact = Dedup.exactDedup(
      docs.withColumn("fp", TextAnalysis.normalize(col("text"))),
      "doc_id", "fp")
    assert(exact.filter(col("dups") > 1).count() === 1) // the (1,5) pair
    // single-member source + sources with zero dup members: the ppm
    // lane's denominator is per-source count >= 1
    val rate = Dedup.sourceDupRate(docs,
      Seq((1L, 5L)).toDF("d1", "d2"), "doc_id", "source")
      .collect().map(r => r.getAs[String]("src") -> r).toMap
    assert(rate("lone").getAs[Long]("n_docs") === 1L)
    assert(rate("lone").getAs[Long]("dup_ppm") === 1000000L)
    assert(rate("webB").getAs[Long]("dup_ppm") === 0L)
  }

  test("zero vectors never crash the ANN kernels and never displace a " +
    "real neighbor") {
    // zero vector in the CORPUS: its cosine is null (undefined), so it
    // sorts after every real candidate and stays out of a k=2 top-k
    val top = Similarity.bruteForceTopK(embs,
      embs.filter(col("id") === 1L), "id", "vec", k = 2)
    val hit = top.select("cid").as[Long].collect().toSet
    assert(!hit.contains(100L))
    assert(hit.contains(2L)) // the real near neighbor survives
    // zero vector as the QUERY: every sim is null, nothing throws
    val qz = Similarity.bruteForceTopK(embs,
      embs.filter(col("id") === 100L), "id", "vec", k = 2)
    assert(qz.collect().forall(r => r.isNullAt(r.fieldIndex("sim"))))
    // zero vectors on both sides of the margin kernel: the cmicro >= 0
    // filter drops their null rows before the ratio division
    val m = Similarity.bitextMargin(
      embs.toDF("id", "vec"), embs.toDF("id", "vec"), "id", "vec", k = 2)
      .select("aid").as[Long].collect().toSet
    assert(!m.contains(100L))
  }

  test("monitor rates survive a single-instant event stream") {
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "sub"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "sub")
    ).toDF("event_id", "ts", "stage")
    // runtime_secs = 0: the rate is undefined -> null, not a crash
    val rates = Monitor.avgRates(events, col("ts"), col("stage")).collect()
    assert(rates.length === 1)
    assert(rates(0).getAs[Long]("total") === 2L)
    assert(rates(0).isNullAt(rates(0).fieldIndex("avg_mps")))
    // literal-denominator rates reject a zero window at the door
    intercept[IllegalArgumentException] {
      Monitor.normalizeRates(events, 0)
    }
  }
}
