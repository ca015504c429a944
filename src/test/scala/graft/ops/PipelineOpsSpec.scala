package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions._

/** X5-X10 behavioral invariants beyond the DuckDB oracle. */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("mixture sampling: scarcest domain kept whole, blend tracks targets, deterministic") {
    // a:1000, b:1000, c:100 at 45/45/10 — c binds (T=1000): c keeps all
    // 100, a and b Bernoulli-keep at 45% (expected 450 each)
    val rows = (1 to 1000).map(i => (i.toLong, "a")) ++
      (1 to 1000).map(i => (1000L + i, "b")) ++
      (1 to 100).map(i => (2000L + i, "c")) ++
      (1 to 50).map(i => (3000L + i, "unlisted"))
    val df = rows.toDF("doc_id", "source")
    val w = Map("a" -> 450000L, "b" -> 450000L, "c" -> 100000L)
    val kept = Sample.mixture(df, "doc_id", "source", w, seed = "t")
      .select("doc_id", "source").as[(Long, String)].collect()
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("c", 0) === 100) // binding domain: kept whole
    assert(!bySrc.contains("unlisted")) // unlisted domains dropped
    // binomial(1000, 0.45): mean 450, sd ~15.7 — 5 sd tolerance
    assert(math.abs(bySrc("a") - 450) < 80, s"a kept ${bySrc("a")}")
    assert(math.abs(bySrc("b") - 450) < 80, s"b kept ${bySrc("b")}")
    // bit-reproducible: a second run selects the identical rows
    val again = Sample.mixture(df, "doc_id", "source", w, seed = "t")
      .select("doc_id", "source").as[(Long, String)].collect()
    assert(again.toSet === kept.toSet)
    // a different seed selects a different (but same-sized-ish) subset
    val other = Sample.mixture(df, "doc_id", "source", w, seed = "u")
      .select("doc_id").as[Long].collect().toSet
    assert(other !== kept.map(_._1).toSet)
  }

  test("mixtureJoined selects the identical row set through the dim-table join") {
    // same corpus shape as the mixture test, plus a domain the corpus
    // lacks (listed-but-absent must not poison the decimal T derivation)
    val rows = (1 to 1000).map(i => (i.toLong, "a")) ++
      (1 to 1000).map(i => (1000L + i, "b")) ++
      (1 to 100).map(i => (2000L + i, "c")) ++
      (1 to 50).map(i => (3000L + i, "unlisted"))
    val df = rows.toDF("doc_id", "source")
    val w = Map("a" -> 450000L, "b" -> 450000L, "c" -> 100000L,
      "absent" -> 5000L)
    val viaMap = Sample.mixture(df, "doc_id", "source", w, seed = "t")
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    val viaJoin = Sample.mixtureJoined(df, "doc_id", "source",
      w.toSeq.sortBy(_._1).toDF("source", "w_ppm"), seed = "t")
      .select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(viaMap.nonEmpty)
    assert(viaJoin === viaMap)
    // no listed domain present: empty result, not a failure (documented
    // contract difference from mixture's driver require)
    val none = Sample.mixtureJoined(df, "doc_id", "source",
      Seq(("ghost", 1000000L)).toDF("source", "w_ppm"), seed = "t")
    assert(none.count() === 0L)
    // a duplicated domain row would silently duplicate kept rows
    // through the cut join — must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      Sample.mixtureJoined(df, "doc_id", "source",
        Seq(("a", 450000L), ("a", 450000L), ("c", 100000L))
          .toDF("source", "w_ppm"), seed = "t")
    }
    assert(e.getMessage.contains("more than once"))
  }

  test("token budget: two-pass prefix equals brute force; crossing doc included") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 200 docs with varying token counts; budget cuts mid-corpus
    val rows = (1L to 200L).map(i => (i, (0 until (i % 13 + 1).toInt)
      .map(j => s"t$j").mkString(" ")))
    val df = rows.toDF("doc_id", "text")
    val budget = 600L
    // brute force: global hash order, running sum, keep while before < budget
    val ordered = rows.map { case (id, text) =>
      (md5hex(id.toString + "s"), id, text.split(" ").length.toLong)
    }.sortBy(t => (t._1, t._2))
    val expected = ordered.scanLeft(("", 0L, 0L, 0L)) {
      case ((_, _, _, cum), (h, id, n)) => (h, id, n, cum + n)
    }.tail.map { case (_, id, n, cumAfter) => (id, n, cumAfter - n) }
      .filter(_._3 < budget).toSet
    val got = Sample.tokenBudget(df, "doc_id", "text", budget, seed = "s")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
    // greedy-prefix contract: kept mass reaches the budget (the
    // crossing doc is included), and dropping any kept doc stays under
    val keptTokens = got.toSeq.map(_._2).sum
    assert(keptTokens >= budget)
    assert(got.map(_._3).max < budget)
    // deterministic under re-execution
    assert(Sample.tokenBudget(df, "doc_id", "text", budget, seed = "s")
      .as[(Long, Long, Long)].collect().toSet === got)
  }

  test("temperature weights: alpha=1 keeps the whole corpus, alpha=0 is " +
      "uniform, flattening raises the scarcest share") {
    val counts = Map("big" -> 1000L, "mid" -> 250L, "small" -> 10L)
    // alpha = 1000: weights ARE the counts — every domain binds in
    // mixture (t = 10^6 for all), so cut >= 2^32 keeps everything
    assert(Sample.temperatureWeightsPpm(counts, 1000L) === counts)
    val rows = (1 to 1000).map(i => (i.toLong, "big")) ++
      (1 to 250).map(i => (2000L + i, "mid")) ++
      (1 to 10).map(i => (3000L + i, "small"))
    val df = rows.toDF("doc_id", "source")
    val keptAll = Sample.mixture(df, "doc_id", "source",
      Sample.temperatureWeightsPpm(counts, 1000L), seed = "t")
    assert(keptAll.count() === rows.length.toLong)
    // alpha = 0: every weight identical (uniform target shares)
    assert(Sample.temperatureWeightsPpm(counts, 0L).values.toSet.size === 1)
    // flattening: the scarce domain's kept SHARE rises monotonically as
    // alpha drops (it stays whole while big/mid downsample harder)
    def share(alphaPm: Long): Double = {
      val kept = Sample.mixture(df, "doc_id", "source",
        Sample.temperatureWeightsPpm(counts, alphaPm), seed = "t")
        .select("source").as[String].collect()
      kept.count(_ == "small").toDouble / kept.length
    }
    val shares = Seq(1000L, 500L, 0L).map(share)
    assert(shares === shares.sorted, s"not monotone: $shares")
    assert(shares.last > 3 * shares.head, s"no real flattening: $shares")
  }

  test("mixture/temperature fail loudly past the domain-cardinality cap") {
    // web-domain cardinality would blow up the driver map and the
    // OR-chain codegen; the guard turns that into a message
    val tooMany = (1 to Sample.MaxDomains + 1)
      .map(i => s"d$i" -> 1000L).toMap
    val df = Seq((1L, "d1")).toDF("doc_id", "source")
    val e1 = intercept[IllegalArgumentException] {
      Sample.mixture(df, "doc_id", "source", tooMany)
    }
    assert(e1.getMessage.contains("cap"))
    val e2 = intercept[IllegalArgumentException] {
      Sample.temperatureWeightsPpm(tooMany, 500L)
    }
    assert(e2.getMessage.contains("cap"))
  }

  test("sessionize: events are exhaustively partitioned into in-gap sessions") {
    val ev = Tables.events(spark, sf)
    val sess = Sessionize.sessions(ev, "user_id", "ts", "event_id", gapSecs = 1800)
    // every event lands in exactly one session
    assert(sess.agg(sum("n_events")).as[Long].head === ev.count())
    // no session spans more than its events could allow; durations non-negative
    assert(sess.filter($"duration_us" < 0).count() === 0)
    // within a user, sessions are numbered 1..k densely
    val bad = sess.groupBy("user_id")
      .agg(max("session_seq").as("mx"), count(lit(1)).as("k"))
      .filter($"mx" =!= $"k")
    assert(bad.count() === 0)
  }

  test("sessionize: a gap strictly greater than gapSecs splits sessions") {
    val df = Seq(
      (1L, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:29:00")),
      (1L, 3L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00")), // 31 min gap
      (2L, 4L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_id", "ts")
    val s = Sessionize.sessions(df, "user_id", "ts", "event_id", gapSecs = 1800)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events").as[(Long, Long, Long)].collect()
    assert(s.toSeq === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("sessionize agrees with Spark's built-in session_window on bounds and counts") {
    val ev = Tables.events(spark, sf)
    val ours = Sessionize.sessions(ev, "user_id", "ts", "event_id", gapSecs = 1800)
      .select($"user_id", $"start_ts", $"end_ts", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    val builtin = ev.groupBy($"user_id", session_window($"ts", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), min($"ts").as("start_ts"), max($"ts").as("end_ts"))
      .select($"user_id", $"start_ts", $"end_ts", $"n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    assert(ours === builtin)
  }

  test("as-of join: latest at-or-before reference, null when none precedes") {
    val us = 1704067200000000L
    def ts(off: Long) = new java.sql.Timestamp((us + off * 1000000L) / 1000L)
    val ev = Seq(
      (1L, 10L, "purchase", ts(0)),  // before any view -> null
      (2L, 10L, "view", ts(5)),
      (3L, 10L, "purchase", ts(9)),  // -> view@5
      (4L, 10L, "view", ts(9)),      // same ts, HIGHER event_id than 3
      (5L, 10L, "purchase", ts(9)),  // same ts, after 4 in tie order -> view@9
      (6L, 20L, "purchase", ts(50)), // other user: own timeline -> null
      (7L, 20L, "view", ts(60))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessionize.asofLast(ev, "user_id", "ts", "event_id",
        probePred = col("event_type") === "purchase",
        refPred = col("event_type") === "view")
      .select($"event_id", $"asof_lag_us")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === None)            // nothing precedes
    assert(got(3L) === Some(4000000L))  // view@5 -> lag 4 s
    assert(got(5L) === Some(0L))        // tie at same ts: event 4 <= event 5
    assert(got(6L) === None)            // later view does not leak backward
  }

  test("repetition gate: all-identical bigrams score 1.0, all-distinct score near 0") {
    val docs = Seq(
      (1L, Seq.fill(11)("spam").mkString(" ")),       // 10 identical bigrams
      (2L, (1 to 11).map(i => s"w$i").mkString(" ")), // 10 distinct bigrams
      (3L, "solo")                                    // too short: excluded
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(docs, "doc_id", "text")
      .select($"doc_id", $"top_ngram_ratio", $"dup_ngram_ratio")
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r.keySet === Set(1L, 2L))
    assert(r(1L) === ((1.0, 0.9)))  // one bigram repeated 10x: 1 distinct of 10
    assert(r(2L) === ((0.1, 0.0)))  // max count 1 of 10; all distinct
  }

  test("as-of join matches brute force on randomized data with ts collisions") {
    val rnd = new scala.util.Random(42)
    val base = 1704067200000000L
    // small ts range forces collisions, exercising the (ts, id) tie order
    val rows = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(20).toLong,
        if (rnd.nextInt(3) == 0) "view" else if (rnd.nextInt(2) == 0) "purchase" else "other",
        base + rnd.nextInt(40) * 1000000L)
    }
    val df = rows.map { case (id, u, t, us) =>
      (id, u, t, new java.sql.Timestamp(us / 1000L))
    }.toDF("event_id", "user_id", "event_type", "ts")
    val got = Sessionize.asofLast(df, "user_id", "ts", "event_id",
        probePred = col("event_type") === "purchase",
        refPred = col("event_type") === "view")
      .select($"event_id", $"asof_lag_us")
      .as[(Long, Option[Long])].collect().toMap
    // brute force: max view ts among same-user rows at-or-before in
    // (ts, event_id) order
    val expected = rows.filter(_._3 == "purchase").map { case (id, u, _, us) =>
      val refs = rows.filter { case (rid, ru, rt, rus) =>
        ru == u && rt == "view" && (rus < us || (rus == us && rid <= id))
      }
      id -> (if (refs.isEmpty) None else Some(us - refs.map(_._4).max))
    }.toMap
    assert(got === expected)
  }

  test("row-local repetition fold matches the relational explode+groupBy twin") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val local = TextAnalysis.repetition(docs, "doc_id", "text")
      .select($"doc_id", $"n_ngrams", $"n_distinct", $"top_ngram_count")
      .as[(Long, Long, Long, Long)].collect().map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    // relational twin: shuffle every bigram occurrence (what the DuckDB
    // oracle does — here recomputed in Spark itself)
    val relational = docs
      .select($"doc_id", explode(graft.functions.Shingles.shingles(
        split($"text", " "), 2)).as("s"))
      .groupBy($"doc_id", $"s").agg(count(lit(1)).as("cnt"))
      .groupBy($"doc_id")
      .agg(sum($"cnt").as("n_ngrams"), count(lit(1)).as("n_distinct"),
        max($"cnt").as("top_ngram_count"))
      .as[(Long, Long, Long, Long)].collect().map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
    assert(local === relational)
  }

  test("deterministic sample: stable across runs, fraction approximately honored") {
    val docs = Tables.documents(spark, sf)
    val a = Sample.uniform(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    val b = Sample.uniform(docs, "doc_id", 0.2).select("doc_id").as[Long].collect().toSet
    assert(a === b)
    assert(math.abs(a.size - 100) < 40, s"got ${a.size} of 500 at f=0.2")
    // seed changes the sample
    val c = Sample.uniform(docs, "doc_id", 0.2, seed = "v2").select("doc_id").as[Long].collect().toSet
    assert(c !== a)
    // nested property: a smaller fraction is a subset of a larger one
    val small = Sample.uniform(docs, "doc_id", 0.05).select("doc_id").as[Long].collect().toSet
    assert(small.subsetOf(a))
  }

  test("scrub replaces emails and urls; normalize is idempotent") {
    val df = Seq(
      (1L, "Write to bob.smith+x@corp.example.com or see https://a.example/b?q=1 now"),
      (2L, "No pii here!")
    ).toDF("id", "text")
    val out = df.select($"id", TextAnalysis.scrub($"text").as("s"),
        TextAnalysis.normalize($"text").as("n"))
      .orderBy("id").as[(Long, String, String)].collect()
    assert(out(0)._2 === "Write to <EMAIL> or see <URL> now")
    assert(out(1)._3 === "no pii here")
    // idempotence of normalize
    val renorm = df.select(TextAnalysis.normalize(TextAnalysis.normalize($"text")).as("n2"),
      TextAnalysis.normalize($"text").as("n1")).as[(String, String)].collect()
    renorm.foreach { case (n2, n1) => assert(n2 === n1) }
  }

  test("connected components: labels equal min reachable id (vs brute force)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (3L, 4L))
      .toDF("d1", "d2")
    val got = Cluster.components(pairs).orderBy("id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: a deep path graph converges (pointer jumping)") {
    // 60-node chain: plain min-propagation needs 59 rounds; pointer
    // jumping converges inside the default iteration budget
    val chain = (0 until 59).map(i => (i.toLong + 100, i.toLong + 101)).toDF("d1", "d2")
    val got = Cluster.components(chain).orderBy("id").as[(Long, Long)].collect()
    assert(got.length === 60)
    assert(got.forall(_._2 === 100L), got.filter(_._2 != 100L).take(5).mkString(","))
  }

  test("label centroids: centroid of a label matches a hand computation") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.select($"label", Similarity.quantize($"embedding").as("q"))
      .filter($"label" === 0).as[(Int, Array[Int])].collect()
    val n = q.length
    val sum0 = q.map(_._2(0).toLong).sum
    val row = graft.ops.ExtQueries.queries("x10_label_centroid")(spark, sf)
      .filter($"label" === 0 && $"pos" === 1)
      .select("n", "s").as[(Long, Long)].head()
    assert(row === ((n.toLong, sum0)))
  }
}
