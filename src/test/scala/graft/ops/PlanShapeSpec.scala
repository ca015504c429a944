package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan shape regressions: these operators were designed around
  * specific exchange/broadcast properties (PLANS.md) — a refactor that
  * silently adds a shuffle or forces a broadcast would pass every
  * value-level test while breaking the 100 TB story, so the properties
  * are pinned here.
  */
class PlanShapeSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def countOccurrences(s: String, needle: String): Int =
    s.sliding(needle.length).count(_ == needle)

  test("shingle table is generated scan-side: zero exchanges") {
    val plan = physical(
      Dedup.shingleTable(Tables.documents(spark, sf), "doc_id", "text"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("as-of join costs exactly one exchange (no join operator)") {
    val plan = physical(
      Sessionize.asofLast(Tables.events(spark, sf), "user_id", "ts", "event_id",
        probePred = col("event_type") === "purchase",
        refPred = col("event_type") === "view"))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("sessionize shares one exchange across both window passes and the agg") {
    val plan = physical(
      Sessionize.sessions(Tables.events(spark, sf), "user_id", "ts", "event_id",
        gapSecs = 1800))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
  }

  test("c1 keeps the nation dim broadcast (explicit hint survives planning)") {
    val plan = physical(graft.engine.AnalyticsQueries
      .queries("c1_revenue_by_nation")(spark, sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"nation dim not broadcast in:\n$plan")
  }

  test("bucketed embedding dedup plan carries no forced broadcast hint") {
    // AQE may CHOOSE broadcast at this tiny SF; what must not exist is a
    // planted hint that would force it at 100 TB. Inspect the analyzed
    // (pre-AQE) plan for ResolvedHint nodes.
    val analyzed = Dedup.embeddingDupPairsBucketed(
      Tables.embeddings(spark, sf), "vec_id", "embedding", 0.4, bits = 6)
      .queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"forced hint in:\n$analyzed")
  }

  test("text stats and repetition are pure projections: zero exchanges") {
    for (df <- Seq(
        TextAnalysis.textStats(Tables.documents(spark, sf), "doc_id", "text"),
        TextAnalysis.repetition(Tables.documents(spark, sf), "doc_id", "text"))) {
      val plan = physical(df)
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    }
  }

  test("char entropy is a pure projection: zero exchanges (the sorted-" +
    "run fold never explodes chars)") {
    val plan = physical(TextAnalysis.charEntropy(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("burstiness is two type-grain exchanges + the 1-row scalar " +
    "broadcast — no cartesian, nothing corpus-keyed twice") {
    val plan = physical(CorpusStats.burstiness(
      Tables.documents(spark, sf), "doc_id", "text", 25L))
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 2,
      s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("unigram KL joins its group totals and corpus scalar by " +
    "broadcast — no cartesian product") {
    val plan = physical(CorpusStats.unigramKl(
      Tables.documents(spark, sf), "lang", "text"))
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(countOccurrences(plan, "BroadcastExchange") >= 2,
      s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("keyness joins its word marginals and totals like unigram KL: " +
    "broadcast group/corpus sides, no cartesian product") {
    val plan = physical(CorpusStats.dunningKeyness(
      Tables.documents(spark, sf), "lang", "text", 5L))
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("wilson rates cost exactly one group-grain exchange; the " +
    "interval math is a projection") {
    val sig = Curate.gateSignals(Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")), "text")
      .withColumn("hit", Curate.gatePass(0.35, 0.05))
    val plan = physical(Eval.wilsonRates(sig, "source", "hit"))
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 1,
      s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("k-anonymity costs one quasi-identifier exchange; the " +
    "suppression scalar rides a broadcast, never a corpus re-scan") {
    val plan = physical(Pii.kAnonymity(
      Tables.documents(spark, sf)
        .withColumn("len_bucket", expr("n_chars div 50")),
      Seq("lang", "source", "len_bucket"), 5L))
    assert(countOccurrences(plan, "Exchange hashpartitioning") <= 2,
      s"plan:\n$plan") // QI agg (+ its reuse for the scalar fold)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"plan:\n$plan")
  }

  test("digram conditional entropy is a pure projection: zero " +
    "exchanges (two run folds, no explode)") {
    val plan = physical(TextAnalysis.digramEntropy(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 0,
      s"plan:\n$plan")
  }

  test("KS drift: the corpus shuffles once into the count table; the " +
    "grid windows stay group-partitioned, no cartesian on data") {
    val plan = physical(CorpusStats.ksDrift(
      Tables.documents(spark, sf), "source", "n_chars"))
    // count-table agg + the two window stages over the grid — every
    // exchange is (grp)- or (grp, v)-keyed, none corpus-row-grain
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), s"plan:\n$plan")
  }

  test("source concentration: everything past the pinned K-row count " +
    "table is single-partition folds + a broadcast pair join") {
    // the corpus-grain source fold happens INSIDE the localCheckpoint
    // pin; the visible plan must add no hash exchange and no cartesian
    val plan = physical(Report.sourceConcentration(
      Tables.documents(spark, sf), "source"))
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 0,
      s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
  }

  test("line boilerplate removal carries no forced broadcast: the " +
    "frequent-side build is AQE's call (the x87 rule)") {
    val df = Boilerplate.removeFrequentLines(
      Tables.documents(spark, sf), "doc_id", "text", 100000L)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint") ||
      // the 1-row corpus-count scalar is the only sanctioned hint
      countOccurrences(analyzed, "ResolvedHint") === 1,
      s"forced hint beyond the 1-row scalar in:\n$analyzed")
  }

  test("split assignment is a pure scan-side projection: zero exchanges") {
    val plan = physical(Curate.splitAssign(Tables.documents(spark, sf),
      "doc_id", Seq("train" -> 0.8, "valid" -> 0.1), "test", "s"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("banded range join plans as an equi hash join, never a nested loop") {
    val ev = Tables.events(spark, sf)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
    val plan = physical(RangeJoin.banded(views, purchases, "user_id",
      "view_ts", "purchase_ts", 7L * 86400L * 1000000L))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a cross product in:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"no equi join operator in:\n$plan")
  }

  test("curation pipeline costs exactly one exchange (the dedup window)") {
    // both gates and the fingerprint are scan-side; only the
    // dedup-by-fingerprint window may shuffle
    val plan = physical(graft.ops.ExtQueries
      .queries("x22_curation_pipeline")(spark, sf))
    val shuffles = countOccurrences(plan, "Exchange") -
      countOccurrences(plan, "BroadcastExchange")
    // the trailing orderBy adds a range exchange; the pipeline itself
    // must contribute only the window's hash exchange
    assert(shuffles <= 2, s"extra shuffle in:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(norm_fp"),
      s"dedup window not partitioned by fingerprint in:\n$plan")
  }

  test("domain quota ranks through a domain-partitioned window with rank pushdown") {
    // the counts/short-domain sides are broadcast by design (tiny, and
    // counts appears in two branches so it broadcasts more than once);
    // what matters for 100 TB is that the DATA rows reach the ranking
    // window via hash partitioning on the domain and that Spark pushes
    // the rank limit below the window (WindowGroupLimit), so each task
    // keeps quota rows instead of sorting its full partition
    val plan = physical(Curate.domainQuota(Tables.documents(spark, sf),
      "doc_id", "source", 5, seed = "q"))
    assert(plan.contains("Exchange hashpartitioning(source"),
      s"data path not hash-partitioned by domain in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank limit not pushed below the window in:\n$plan")
  }

  test("bm25 never shuffles the corpus: no hash exchange on the data path") {
    // the corpus side is row-local tf/dl projections; the only exchanges
    // allowed are the single-row stats aggregation (SinglePartition) and
    // its broadcast back — a hashpartitioning exchange would mean the
    // corpus itself got shuffled
    val plan = physical(Retrieval.bm25(Tables.documents(spark, sf),
      "doc_id", "text", Seq("spark", "join"), topK = 10))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus shuffled in bm25:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not a TakeOrdered in:\n$plan")
  }

  test("cdc apply keeps one key exchange with map-side rank-1 pushdown") {
    val snap = Tables.customer(spark, sf).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("attr"),
      to_timestamp(lit("1990-01-01 00:00:00")).as("ts"),
      lit(0L).as("tie"), lit("U").as("op"))
    val chg = Tables.orders(spark, sf).select(
      col("o_custkey").as("k"), col("o_orderpriority").as("attr"),
      col("o_orderdate").as("ts"), col("o_orderkey").as("tie"),
      when(col("o_orderstatus") === "F", "D").otherwise("U").as("op"))
    val plan = physical(Cdc.applyChanges(snap, chg, "k", "ts", "tie", "op"))
    assert(countOccurrences(plan, "Exchange hashpartitioning(k") === 1,
      s"merge must cost exactly one key exchange:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"rank-1 not pushed below the exchange in:\n$plan")
  }

  test("chunking is a pure scan-side generator: zero exchanges") {
    val plan = physical(Curate.chunk(Tables.documents(spark, sf),
      "doc_id", "text", size = 16, stride = 8))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("Generate"), s"no generator in:\n$plan")
  }

  test("phrase search intersects postings via hash equi-joins, no nested loop") {
    val plan = physical(Retrieval.phraseSearch(Tables.documents(spark, sf),
      "doc_id", "text", Seq("value", "table", "part")))
    assert(!plan.contains("NestedLoop"),
      s"postings intersection degraded to a nested loop in:\n$plan")
    assert(plan.contains("HashJoin"), s"no hash join in:\n$plan")
  }

  test("k-means output is a pure scan projection: the corpus never shuffles") {
    // assignment is a row-local native argmin against centroid literals;
    // only the (driver-collected) per-round update aggregations shuffle,
    // and those are not part of the returned plan
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(KMeansOp.fit(emb, "vec_id", "embedding",
      k = 4, iters = 2))
    assert(!plan.contains("Exchange"), s"corpus shuffled in:\n$plan")
  }

  test("k-means final pass evaluates the k×dim argmin exactly once per row") {
    // cluster AND dist both come off one CentroidArgmin struct; the
    // struct lands in its own projection step and CollapseProject refuses
    // to inline a non-cheap expression into two use-sites, so a regression
    // back to two evaluations doubles the final-pass cost silently
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(KMeansOp.fit(emb, "vec_id", "embedding",
      k = 4, iters = 2))
    assert(countOccurrences(plan, "centroid_argmin") === 1,
      s"expected exactly one argmin evaluation in:\n$plan")
  }

  test("substring runs: island aggregate reuses the diagonal window's exchange") {
    // window table is scan-side, the join strategy is AQE's choice
    // (broadcast at this SF, shuffle at scale) — the pinned property is
    // run detection: exactly ONE hash exchange keyed on (d1, d2, diag),
    // and the island groupBy (a superset clustering) must NOT add its own
    val plan = physical(Dedup.substringRuns(
      Tables.documents(spark, sf), "doc_id", "text", k = 6, minSpan = 8))
    assert(countOccurrences(plan, "Exchange hashpartitioning(d1") === 1,
      s"plan:\n$plan")
  }

  test("NB scoring shuffles the corpus tokens exactly once (the per-doc agg)") {
    // the k-wide pivoted vocabulary joins in (AQE broadcast at this SF,
    // model-sized at any scale); the corpus token stream itself must hit
    // exactly one hash exchange — the doc_id aggregation. A (token x
    // class) cross-join regression would multiply the corpus k-fold
    // before that exchange; the training-side aggregations are keyed on
    // w/label, never doc_id
    val docs = Tables.documents(spark, sf)
    val plan = physical(NaiveBayes.classify(docs, docs, "doc_id", "text", "lang"))
    assert(countOccurrences(plan, "Exchange hashpartitioning(doc_id") === 1,
      s"plan:\n$plan")
  }

  test("feature hashing costs exactly one data exchange with partial aggregation") {
    val plan = physical(TextAnalysis.featureHash(
      Tables.documents(spark, sf), "doc_id", "text", dim = 64))
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 1,
      s"expected one (doc, bucket) exchange in:\n$plan")
    // map-side combine: a partial HashAggregate must sit below the exchange
    assert(countOccurrences(plan, "HashAggregate") >= 2,
      s"no partial aggregation below the shuffle in:\n$plan")
  }

  test("token budget: the corpus running sum is PARTITIONED; only the " +
    "256-row offset table passes a single-partition exchange") {
    val plan = physical(Sample.tokenBudget(
      Tables.documents(spark, sf), "doc_id", "text", 5000L, seed = "s"))
    // the corpus-side window must carry the grp partition spec — a
    // regression to the naive global prefix sum would drop it and
    // funnel the corpus through one task
    assert(plan.contains("[grp"), s"corpus window not partitioned in:\n$plan")
    assert(countOccurrences(plan, "Exchange SinglePartition") === 1,
      s"expected exactly the offset-table global window in:\n$plan")
  }

  test("exact re-rank: candidate lists broadcast into the corpus scan; " +
    "the only hash exchange is the rank window") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val qs = emb.filter(col("vec_id") < 3)
    val cands = (0L until 3L).flatMap(q => (10L to 30L).map(c => (q, c)))
      .toDF("qid", "cid")
    val plan = physical(
      Similarity.refineExact(emb, qs, "vec_id", "embedding", 5, cands))
    assert(countOccurrences(plan, "BroadcastHashJoin") === 2,
      s"candidates/queries not broadcast in:\n$plan")
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 1,
      s"corpus must not shuffle outside the rank window in:\n$plan")
  }

  test("multi-probe LSH: probes broadcast, corpus keeps its scan-side " +
    "bucket, one rank-window exchange") {
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(Similarity.lshMultiProbeTopK(
      emb, emb.filter(col("vec_id") < 3), "vec_id", "embedding", 5,
      bits = 6, probeDist = 2))
    assert(plan.contains("BroadcastHashJoin"), s"probe join not broadcast:\n$plan")
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 1,
      s"corpus must not shuffle outside the rank window in:\n$plan")
  }

  test("joined mixture: the keep decision is a broadcast join, never a " +
    "sort-merge shuffle of the corpus") {
    import spark.implicits._
    val plan = physical(Sample.mixtureJoined(
      Tables.documents(spark, sf), "doc_id", "source",
      Seq(("src0", 500000L), ("src1", 300000L), ("src2", 200000L))
        .toDF("source", "w_ppm"), seed = "m"))
    assert(plan.contains("BroadcastHashJoin"), s"cut join not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled for the join:\n$plan")
  }

  test("DSIR: dim-sized ratio table broadcasts into the weight join; " +
    "selection is TakeOrdered, never a global sort exchange") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val plan = physical(Dsir.select(docs,
      docs.filter(col("lang") === "en").select("doc_id"),
      "doc_id", "text", k = 10, dim = 64, seed = "s"))
    assert(plan.contains("BroadcastHashJoin"),
      s"ratio join not broadcast in:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k not TakeOrdered in:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort shuffle in:\n$plan")
  }

  test("prototype prune: centroids broadcast; the ONLY hash exchange is " +
    "the per-cluster rank window") {
    val emb = Tables.embeddings(spark, sf)
    val cents = Array(Array.fill(64)(100), Array.fill(64)(-100))
    val plan = physical(ProtoPrune.prune(emb, "vec_id", "embedding",
      nlist = 2, prunePpm = 250000L, centroids = Some(cents)))
    assert(plan.contains("BroadcastHashJoin"),
      s"centroid join not broadcast in:\n$plan")
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 1,
      s"corpus must not shuffle outside the rank window in:\n$plan")
  }

  test("C4 clean and the Gopher gate are pure scan-side projections: " +
    "zero exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "a b c.\nd e f.")).toDF("doc_id", "page")
    val c4 = physical(C4.clean(docs, "doc_id", "page"))
    assert(!c4.contains("Exchange"), s"unexpected shuffle in:\n$c4")
    val go = physical(Gopher.qualityRules(docs, "doc_id", "page"))
    assert(!go.contains("Exchange"), s"unexpected shuffle in:\n$go")
    val rep = physical(Gopher.repetitionSignals(docs, "doc_id", "page"))
    assert(!rep.contains("Exchange"), s"unexpected shuffle in:\n$rep")
    // the x68 three-stage composition stays one projection: no join,
    // no shuffle between the stages
    val mt = physical(MassiveText.gate(docs, "doc_id", "page"))
    assert(!mt.contains("Exchange"), s"unexpected shuffle in:\n$mt")
    assert(!mt.contains("Join"), s"unexpected join in:\n$mt")
  }

  test("span dedup: two hash exchanges total (digest group-by + removal " +
    "lists), removals broadcast back, corpus text never shuffles") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "replace(text, ' the ', chr(10)) AS page")
    val plan = physical(C4.spanDedup(docs, "doc_id", "page"))
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 2,
      s"expected exactly 2 hash exchanges in:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort shuffle in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled to join:\n$plan")
  }

  test("UniMax select: the corpus is never globally sorted; the offset " +
    "and epoch dim tables broadcast into the scan") {
    val docs = Tables.documents(spark, sf)
    val plan = physical(UniMax.select(docs, "doc_id", "lang", "text",
      budgetTokens = 36000L, maxEpochs = 2L, seed = "um"))
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort shuffle in:\n$plan")
    assert(countOccurrences(plan, "BroadcastHashJoin") >= 2,
      s"offset/epoch joins not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled to join:\n$plan")
  }

  test("decontaminate: the eval shingle set broadcasts into the " +
    "positional match — the corpus is never sort-merge joined") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val ev = Seq((9000001L, "e1 e2 e3 e4 e5 e6 e7 e8")).toDF("doc_id", "text")
    val plan = physical(
      Dedup.decontaminate(docs, ev, "doc_id", "text", n = 8))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles not broadcast in:\n$plan")
  }

  test("epoch shuffle: the corpus rank window is PARTITIONED by the " +
    "prefix group; offsets broadcast; no global sort") {
    val plan = physical(Sample.epochShuffle(
      Tables.documents(spark, sf), "doc_id", numShards = 16, seed = "ep"))
    // a regression to the naive per-shard window would partition by
    // shard (16 partitions at any corpus size) or sort globally
    assert(plan.contains("[grp"), s"corpus window not grp-partitioned:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"global sort shuffle in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"offset table not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled to join:\n$plan")
  }

  test("hard negatives: queries broadcast into the corpus scan; the " +
    "only hash exchange is the rank window") {
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(Similarity.hardNegatives(emb,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", "label", 5))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"queries not broadcast in:\n$plan")
    assert(countOccurrences(plan, "Exchange hashpartitioning") === 1,
      s"corpus must not shuffle outside the rank window in:\n$plan")
  }

  test("code detect is a pure scan-side projection: zero exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "int f() {\n  return 0;\n}")).toDF("doc_id", "page")
    val plan = physical(CodeDetect.detect(docs, "doc_id", "page"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("script mix is a pure scan-side projection: zero exchanges") {
    import spark.implicits._
    val docs = Seq((1L, "abc привет")).toDF("doc_id", "page")
    val plan = physical(ScriptMix.analyze(docs, "doc_id", "page"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("bloom contamination: the bitmap gate filters BEFORE the verify " +
    "join, and the eval side broadcasts — the corpus is never sort-merge " +
    "joined") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val ev = Seq((9000001L, "e1 e2 e3 e4 e5 e6 e7 e8")).toDF("doc_id", "text")
    val plan = physical(Bloom.contamination(docs, ev, "doc_id", "text",
      n = 8, m = 1 << 12, k = 4))
    // the membership probe (element_at into the literal bitmap) must sit
    // in a Filter on the corpus side, upstream of the join
    assert(plan.contains("shiftright"), s"bloom gate not in the plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"eval shingles not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus shuffled to join:\n$plan")
  }

  test("bitext margin: ONE pinned pair table feeds all three consumers; " +
    "NN sums rejoin broadcast; rank windows get group-limit pushdown — " +
    "no sort-merge join anywhere") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.bitextMargin(emb.filter(col("label") === 0),
      emb.filter(col("label") === 1), "vec_id", "embedding", 5)
    val plan = physical(out)
    // the checkpointed pair table appears as the SAME RDD scan in the
    // margin join and both NN-sum subplans — scored once, read thrice
    // (its own upstream plan — source side broadcast into the target
    // scan — is truncated behind the checkpoint by design)
    assert(countOccurrences(plan, "Scan ExistingRDD") === 3,
      s"pair table not shared across the three consumers in:\n$plan")
    assert(countOccurrences(plan, "BroadcastHashJoin") === 2,
      s"NN sums not broadcast back in:\n$plan")
    assert(plan.contains("WindowGroupLimit"),
      s"top-k rank not pushed down in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"pair table shuffled to join:\n$plan")
  }

  test("x87 decon verify join carries no forced broadcast hint: a " +
    "corpus-scale prior release must shuffle digests, never collect " +
    "to the driver") {
    val d = Tables.documents(spark, sf)
    val df = Dolma.paragraphDecontaminate(
      d.filter(col("doc_id") % 7 =!= 0).select(col("doc_id"), col("text")),
      d.filter(col("doc_id") % 7 === 0).select(col("doc_id"), col("text")),
      "doc_id", "text", m = 1 << 12, k = 4)
    // AQE may still CHOOSE broadcast for a genuinely small ref — what
    // must not exist is a planted hint forcing it at any size (the
    // bucketed-embedding pin's discipline)
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("ResolvedHint"), s"forced hint in:\n$analyzed")
    // and the gate itself must still be planted: the scan-side bitmap
    // probe shows up as the md5-lane conv chain in the optimized plan
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("conv(substring(md5"),
      s"bloom probe missing from:\n$optimized")
  }

  test("x116 e2e pipeline: the query reads the pinned session LEDGER — " +
    "its plan holds ZERO parquet scans (the one corpus read lives " +
    "inside the artifact build) and exactly the artifact leaf, so no " +
    "invocation re-executes any pipeline stage") {
    val plan = physical(
      graft.SparkEntry.queries("x116_e2e_pipeline")(spark, sf))
    assert(countOccurrences(plan, "FileScan") === 0,
      s"a stage re-reads the corpus instead of its pin in:\n$plan")
    // round 22: the whole ledger is one per-(session, dir) checkpoint
    // artifact (the copurchaseTri contract) — the query plan is a sort
    // over that single RDD leaf; the old >= 5 stage pins live inside
    // the artifact's one-time build, not in the per-invocation plan
    assert(countOccurrences(plan, "Scan ExistingRDD") === 1,
      s"expected exactly the pinned ledger leaf in:\n$plan")
  }

  test("x117 semantic decon: the eval block broadcasts into the corpus " +
    "scan — corpus vectors never shuffle into the scoring join") {
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(SemDedup.semanticDecon(
      emb.filter(col("vec_id") % 10 =!= 0),
      emb.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", 350000L))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"eval block not broadcast in:\n$plan")
    // the only permissible sort-merge join is the DENSITY left join of
    // two id-grain tables (ids + 3 longs — narrow at any scale); the
    // Inner scoring join itself must never shuffle corpus vectors
    val smj = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
    assert(smj.forall(_.contains("LeftOuter")),
      s"corpus shuffled into the scoring join in:\n$plan")
  }

  test("span corruption is a pure scan-side projection: zero exchanges") {
    val plan = physical(Augment.spanCorrupt(
      Tables.documents(spark, sf), "doc_id", "text"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("datacard is ONE Expand aggregation — a single cube pass, not " +
    "four scans") {
    val plan = physical(Report.dataCard(Tables.documents(spark, sf),
      "source", "lang", "text", "n_chars"))
    assert(countOccurrences(plan, "Expand") >= 1, s"no Expand in:\n$plan")
    assert(countOccurrences(plan, "Scan parquet") <= 1,
      s"cube must scan the corpus once in:\n$plan")
  }

  test("zipf fit: the vocab rank window is PARTITIONED by (freq, pfx); " +
    "only the distinct-freq offset table and the 1-row moments agg pass " +
    "a single-partition exchange; AQE reuses the vocab shuffle") {
    val df = CorpusStats.zipfFit(Tables.documents(spark, sf), "text")
    val initial = physical(df)
    // the rank window must carry the (freq, pfx) partition spec — a
    // regression to the naive global ORDER BY freq DESC, w would funnel
    // the whole vocabulary through one task
    assert(initial.contains("row_number() windowspecdefinition(freq"),
      s"rank window not partitioned in:\n$initial")
    assert(countOccurrences(initial, "Exchange SinglePartition") === 2,
      s"expected only the freq-band offsets + final moments agg in:\n$initial")
    // the vocab and cell shuffles must be REUSED, not recomputed — the
    // corpus is scanned once even though three subtrees consume vocab
    df.collect()
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(countOccurrences(fin, "ReusedExchange") === 2,
      s"vocab/cell exchanges not reused in final plan:\n$fin")
    assert(countOccurrences(fin, "FileScan") === 1,
      s"corpus must be scanned exactly once in final plan:\n$fin")
  }

  test("hll registers: rho is scan-side, ONE register-keyed exchange, " +
    "no single-partition stage") {
    val plan = physical(Sketch.hllRegisters(
      Tables.documents(spark, sf), "source", "text", hexDigits = 2))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    // partial max before the exchange = the map-side combine the
    // bounded-state claim rests on
    assert(plan.contains("partial_max") || plan.contains("partial"),
      s"no map-side combine in:\n$plan")
  }

  test("count-min sketch: lane explode is scan-side, ONE counter-keyed " +
    "exchange, map-side combine present") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
    val plan = physical(CountMin.sketch(toks, "token", 4, 2))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    assert(plan.contains("partial"), s"no map-side combine in:\n$plan")
  }

  test("quantile summary: the sort windows are PARTITIONED by " +
    "(group, shard) over ONE exchange — no global sort anywhere") {
    val plan = physical(Quantile.summary(
      Tables.documents(spark, sf), "lang", "n_chars", "doc_id", 8, 50))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    assert(plan.contains("windowspecdefinition(grp"),
      s"window not partitioned in:\n$plan")
  }

  test("kmv sketch: two-level min-k — cell-partitioned rank, then the " +
    "group rank over survivors only; no single-partition stage") {
    val plan = physical(Kmv.sketch(
      Tables.documents(spark, sf).select(col("source").as("grp"),
        col("text").as("v")), "grp", "v", 128))
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    // distinct + cell window + group window = exactly three exchanges
    assert(countOccurrences(plan, "Exchange") === 3, s"plan:\n$plan")
    assert(countOccurrences(plan, "windowspecdefinition(grp") === 2,
      s"both rank windows must be grp-partitioned in:\n$plan")
  }

  test("x91 end-to-end carries no single-partition exchange (the " +
    "cumulative pass runs over the summary only)") {
    val docs = Tables.documents(spark, sf)
    val summ = Quantile.summary(docs, "lang", "n_chars", "doc_id", 8, 50)
    val plan = physical(Quantile.estimate(summ, docs, "lang", "n_chars",
      Seq(500000L), 8, 50))
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
  }

  private def adjacentPairs(sfDir: String): DataFrame = {
    val d = Tables.documents(spark, sfDir)
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.lang").as("lang"), col("a.doc_id").as("pid"),
        col("a.text").as("hyp"), col("b.text").as("ref"))
  }

  test("bleu/rouge/chrf are SINGLE-exchange: per-pair clipping is " +
    "row-local, so only the group aggregate shuffles — no join, no " +
    "gram-grain exchange anywhere") {
    val d = Tables.documents(spark, sf)
    val pairs = d.select(col("lang"), col("doc_id").as("pid"),
      col("text").as("hyp"), col("text").as("ref"))
    for (df <- Seq(
        Bleu.corpusBleu(pairs, "lang", "pid", "hyp", "ref", 4),
        Rouge.corpusRouge(pairs, "lang", "pid", "hyp", "ref", 2),
        Chrf.corpusChrf(pairs, "lang", "pid", "hyp", "ref", 6))) {
      val plan = physical(df)
      assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
      assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
    }
  }

  test("rouge's LCS survives as the native row-local expression (not a " +
    "driver eval or a lambda pipeline)") {
    val plan = physical(
      Rouge.corpusRouge(adjacentPairs(sf), "lang", "pid", "hyp", "ref", 2))
    assert(plan.contains("token_lcs"), s"native LCS missing in:\n$plan")
  }

  test("pmi collocations: the per-language total joins broadcast; no " +
    "cartesian, no single-partition stage") {
    val plan = physical(Collocations.pmiBigrams(
      Tables.documents(spark, sf), "lang", "text", 3))
    assert(plan.contains("BroadcastHashJoin"), s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("SinglePartition"), s"plan:\n$plan")
  }

  test("phrase coverage is a pure scan-side projection: zero exchanges, " +
    "automaton expression in-plan") {
    val plan = physical(PhraseMatch.coverage(
      Tables.documents(spark, sf), "doc_id", "text", Seq("a b", "c d")))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
    assert(plan.contains("aho_corasick_hits"), s"plan:\n$plan")
  }

  test("heaps fit: the running sums decompose over doc-id cells — " +
    "every window is partitioned, no single-partition stage") {
    val plan = physical(CorpusStats.heapsFit(
      Tables.documents(spark, sf), "lang", "doc_id", "text"))
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    assert(plan.contains("windowspecdefinition(lang"),
      s"windows must be lang-partitioned in:\n$plan")
  }

  test("psi drift and good-turing: corpus pays the explode, every " +
    "aggregate is keyed — no single-partition stage") {
    val d = Tables.documents(spark, sf)
    for (df <- Seq(
        CorpusStats.psiDrift(d.filter(col("doc_id") % 2 === 0),
          d.filter(col("doc_id") % 2 === 1), "lang", "text"),
        CorpusStats.goodTuring(d, "lang", "text", maxR = 10, gram = 2))) {
      val plan = physical(df)
      assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    }
  }

  test("jl top-k: the coarse tier broadcasts QUERIES into the projected " +
    "corpus scan — the corpus side never shuffles before the rank cut") {
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(Similarity.jlTopK(emb,
      emb.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, dIn = 64, dOut = 8, candR = 20))
    // the scoring join must be the deliberate broadcast nested loop
    // (non-equi qid != cid over broadcast queries)
    assert(plan.contains("BroadcastNestedLoopJoin"), s"plan:\n$plan")
    // shuffles exist only AFTER the coarse cut (rank windows + refine
    // joins on audit-sized frames): the projected-corpus side feeds the
    // BNLJ straight from the scan, so no Exchange may appear between
    // the parquet scan and the first join
    val beforeJoin = plan.substring(plan.indexOf("BroadcastNestedLoopJoin"))
    assert(beforeJoin.contains("Scan parquet"), s"plan:\n$plan")
    assert(!beforeJoin.substring(0, beforeJoin.indexOf("Scan parquet"))
      .contains("Exchange hashpartitioning"),
      s"corpus shuffled before the coarse join:\n$plan")
  }

  test("x119 moments: per-shard lanes + merge stay at cell grain — " +
    "every exchange is keyed, no single-partition stage") {
    val emb = Tables.embeddings(spark, sf)
    val plan = physical(Similarity.mergeMoments(
      Similarity.covarianceMoments(emb, "embedding", col("vec_id") % 4)))
    assert(!plan.contains("SinglePartition"), s"plan:\n$plan")
    // partial aggregation runs map-side before the first exchange: the
    // shuffled rows are (shard, i, j) partials, never vector-count-sized
    assert(plan.contains("HashAggregate"), s"plan:\n$plan")
  }

  test("int8 audit is a pure scan-side projection: zero exchanges") {
    val plan = physical(Similarity.int8Audit(
      Tables.embeddings(spark, sf), "vec_id", "embedding"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("x144 gate attribution is ONE source-grain exchange over the " +
    "scan-side signal projection (the x133 shape, more lanes)") {
    val plan = physical(Curate.gateAttribution(
      Tables.documents(spark, sf), "source", "text", 0.35, 0.05))
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("x148 generalization sweep: every bucket branch folds the " +
    "PINNED finest class table — no parquet scan in the sweep plan") {
    val plan = physical(graft.ops.Pii.kAnonymityGeneralize(
      Tables.documents(spark, sf), Seq("lang", "source"), "n_chars",
      Seq(50L, 100L, 200L), 5L))
    // the corpus is exchanged once, at the checkpoint the branches
    // share; the sweep plan itself only ever sees class-grain rows
    assert(!plan.contains("Scan parquet"), s"corpus rescan in:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("x158 gate sweep: one corpus scan, one aggregation exchange, " +
    "no join — the whole grid rides conditional lanes") {
    val plan = physical(Curate.gateSweep(Tables.documents(spark, sf),
      "text", Seq(0.25, 0.35, 0.5), Seq(0.02, 0.05, 0.1)))
    assert(countOccurrences(plan, "Scan parquet") === 1, s"plan:\n$plan")
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("x155 gini gain: every field branch rolls up the PINNED cross " +
    "table — no parquet rescan in the audit plan") {
    val plan = physical(Curate.giniGain(Tables.documents(spark, sf)
        .withColumn("len_bucket", expr("n_chars div 50")),
      "text", Seq("lang", "source", "len_bucket"), 0.35, 0.05))
    assert(!plan.contains("Scan parquet"), s"corpus rescan in:\n$plan")
  }

  test("x160 field association: every pair branch rolls up the PINNED " +
    "cross table — no parquet rescan, cells joined without cartesian " +
    "of anything corpus-sized") {
    val plan = physical(CorpusStats.fieldAssociation(
      Tables.documents(spark, sf)
        .withColumn("len_bucket", expr("n_chars div 50")),
      Seq(("lang", "source"), ("lang", "len_bucket"))))
    assert(!plan.contains("Scan parquet"), s"corpus rescan in:\n$plan")
  }

  test("x161 label separation: one corpus scan and one label-grain " +
    "exchange after the eager centroid fold; no join") {
    val plan = physical(KMeansOp.labelSeparation(
      Tables.embeddings(spark, sf), "vec_id", "embedding", "label"))
    assert(countOccurrences(plan, "Scan parquet") === 1, s"plan:\n$plan")
    assert(countOccurrences(plan, "Exchange") <= 2, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("x143 pair histogram: the bucket fold pays one exchange; the " +
    "cumulative window's single-partition exchange sees only the " +
    "<= 101 bucket rows, never the pair table") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.85), (3L, 4L, 0.92)).toDF("d1", "d2", "jac")
    val plan = physical(Dedup.pairSimilarityHistogram(pairs))
    // exactly two: the centi-grain aggregation exchange (pair-table
    // sized input, bucket-sized output) and the global-window
    // SinglePartition exchange that follows it (bucket-sized input)
    assert(countOccurrences(plan, "Exchange") === 2, s"plan:\n$plan")
    assert(plan.contains("SinglePartition"), s"plan:\n$plan")
  }

  test("x140/x145 pair-attribution joins carry no cartesian product " +
    "and no planted broadcast hint") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("d1", "d2")
    for (df <- Seq(
        Dedup.crossSourceDupMatrix(Tables.documents(spark, sf), pairs,
          "doc_id", "source"),
        Dedup.dedupTierOverlap(Tables.documents(spark, sf), pairs,
          "doc_id", "text"))) {
      assert(!physical(df).contains("CartesianProduct"),
        s"cartesian in:\n${physical(df)}")
      assert(!df.queryExecution.analyzed.toString.contains("ResolvedHint"),
        "planted broadcast hint")
    }
  }

  // ---- the eval trio (x58/x96/x98): 3 of the top-10 roster costs.
  // Their design claim is "the corpus is scanned once; n-gram orders
  // are projections of one pass, never per-order rescans" — a refactor
  // that exploded per order would pass every value test (the counts
  // are identical) while multiplying the 100 TB scan bill by maxN.
  // The pairs input below is a no-join projection of one parquet read,
  // so "Scan parquet" counts exactly the corpus passes.

  test("x96 BLEU: orders 1..4 are projections of ONE corpus pass — " +
    "one scan, one group-grain aggregation exchange, no join") {
    val pairs = Tables.documents(spark, sf).select(
      col("lang"), col("doc_id").as("pid"),
      col("text").as("hyp"), col("text").as("ref"))
    val plan = physical(
      Bleu.corpusBleu(pairs, "lang", "pid", "hyp", "ref", maxN = 4))
    assert(countOccurrences(plan, "Scan parquet") === 1, s"plan:\n$plan")
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("x98 chrF: orders 1..6 are projections of ONE corpus pass — " +
    "one scan, one group-grain aggregation exchange, no join") {
    val pairs = Tables.documents(spark, sf).select(
      col("lang"), col("doc_id").as("pid"),
      col("text").as("hyp"), col("text").as("ref"))
    val plan = physical(
      Chrf.corpusChrf(pairs, "lang", "pid", "hyp", "ref", maxN = 6,
        beta = 2))
    assert(countOccurrences(plan, "Scan parquet") === 1, s"plan:\n$plan")
    assert(countOccurrences(plan, "Exchange") === 1, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"unexpected join in:\n$plan")
  }

  test("x58 modified KN: the scored corpus is read ONCE — every order's " +
    "key is a projection of the single 5-gram explode, never a " +
    "per-order corpus rescan (train-side passes run over the in-memory " +
    "ref here, so parquet scans count only the corpus side)") {
    import spark.implicits._
    val ref = Seq((1L, "a b c d e f g"), (2L, "a b c d x y z"))
      .toDF("doc_id", "text")
    val plan = physical(KneserNey.scoreModified(
      Tables.documents(spark, sf), ref, "doc_id", "text"))
    assert(countOccurrences(plan, "Scan parquet") === 1, s"plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"plan:\n$plan")
  }

  test("x94 PII summary: one PRUNED corpus scan into the typed fold, " +
    "map-side partial agg before the verdict-grain exchange, no join " +
    "(the round-20 single-level shape)") {
    val df = Pii.summary(Tables.documents(spark, sf), "doc_id", "text", 4)
    val plan = physical(df)
    assert(countOccurrences(plan, "Scan parquet") === 1, s"plan:\n$plan")
    assert(plan.contains("MapPartitions"), s"plan:\n$plan")
    // partial + final HashAggregate around one verdict-grain exchange
    assert(countOccurrences(plan, "HashAggregate") >= 2, s"plan:\n$plan")
    assert(!plan.contains("Join"), s"plan:\n$plan")
    // column pruning reached the scan: the fold reads text only
    val scanLine = plan.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(scanLine.contains("text"), s"scan line: $scanLine")
    assert(!scanLine.contains("lang"), s"scan not pruned: $scanLine")
  }
}
