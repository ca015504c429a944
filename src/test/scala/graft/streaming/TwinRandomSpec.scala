package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Randomized full-snapshot-equality replay for the newest twins
  * (Keyness, GateRate, KsDrift, SourceDup): a seeded random corpus is
  * split into random batches (empty batches, at-least-once replays,
  * and MID-STREAM STATE FOLDS injected at random), and after every
  * batch, fold, and post-fold replay the twin's snapshot must equal
  * its batch operator over everything ingested — the strongest twin
  * contract, checked across a wider input space than the fixed
  * fixtures (the randomized naive-replay discipline applied to the
  * streaming layer).
  */
class TwinRandomSpec extends SparkSpec {

  import spark.implicits._

  private def randomSplit[T](rnd: scala.util.Random, rows: Seq[T],
                             maxBatches: Int): Seq[Seq[T]] = {
    val cuts = (0 until maxBatches - 1)
      .map(_ => rnd.nextInt(rows.size + 1)).sorted
    (Seq(0) ++ cuts ++ Seq(rows.size)).sliding(2)
      .map { case Seq(a, b) => rows.slice(a, b) }.toSeq
  }

  /** Drive batches through `apply`, injecting replays — and, when the
    * twin is registered for maintenance, random MID-STREAM FOLDS at
    * the watermark the replay discipline proves safe (batch i can
    * still replay, so watermark = i): after every batch AND after
    * every injected fold, `snapshot()` must equal
    * `expected(ingested so far)`.
    */
  private def drive[T](rnd: scala.util.Random, batches: Seq[Seq[T]],
                       apply: (Seq[T], Long) => Unit,
                       snapshot: () => Seq[Any],
                       expected: Seq[T] => Seq[Any],
                       maintainAs: Option[(String, String)] = None)
      : Unit = {
    var seen = Seq.empty[T]
    batches.zipWithIndex.foreach { case (b, i) =>
      apply(b, i.toLong)
      if (rnd.nextInt(3) == 0) apply(b, i.toLong) // at-least-once
      seen = seen ++ b
      assert(snapshot() === expected(seen), s"after batch $i")
      maintainAs.foreach { case (twin, state) =>
        if (rnd.nextInt(3) == 0) {
          StateMaintenance.maintain(spark, state, twin, i.toLong)
          assert(snapshot() === expected(seen), s"after fold at $i")
          // the live batch may still replay over the folded state
          if (rnd.nextBoolean()) {
            apply(b, i.toLong)
            assert(snapshot() === expected(seen),
              s"after post-fold replay at $i")
          }
        }
      }
    }
  }

  test("KeynessStream: random batches + replays keep full snapshot " +
    "equality with dunningKeyness") {
    val rnd = new scala.util.Random(3301)
    val langs = Seq("en", "fr", null)
    val vocab = (1 to 12).map(i => s"w$i")
    val rows: Seq[(String, String)] = (0 until 60).map { _ =>
      (langs(rnd.nextInt(langs.size)),
        if (rnd.nextInt(15) == 0) null
        else (0 until rnd.nextInt(8)).map(_ =>
          vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val state = tmpDir("twin-rnd-key")
    drive[(String, String)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => KeynessStream.applyBatch(state, "lang", "text", 1L)(
        b.toDF("lang", "text"), i),
      () => KeynessStream.latest(spark, state)
        .orderBy("grp", "w").collect().map(_.toSeq).toSeq,
      seen => graft.ops.CorpusStats.dunningKeyness(
          seen.toDF("lang", "text"), "lang", "text", 1L)
        .orderBy("grp", "w").collect().map(_.toSeq).toSeq,
      maintainAs = Some(("KeynessStream", state)))
  }

  test("GateRateStream: random batches + replays keep full snapshot " +
    "equality with wilsonRates over the gate") {
    val rnd = new scala.util.Random(3302)
    def text(): String =
      if (rnd.nextBoolean()) (1 to 8).map(i => s"t${rnd.nextInt(999)}_$i").mkString(" ")
      else Seq.fill(8)("a").mkString(" ")
    val rows: Seq[(String, String)] =
      (0 until 50).map(_ => (s"s${rnd.nextInt(4)}", text()))
    val state = tmpDir("twin-rnd-rate")
    drive[(String, String)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => GateRateStream.applyBatch(state, "source", "text",
        0.5, 0.2)(b.toDF("source", "text"), i),
      () => GateRateStream.latest(spark, state)
        .orderBy("grp").collect().map(_.toSeq).toSeq,
      seen => graft.ops.Eval.wilsonRates(
          graft.ops.Curate.gateSignals(seen.toDF("source", "text"),
            "text").withColumn("hit",
            graft.ops.Curate.gatePass(0.5, 0.2)),
          "source", "hit")
        .orderBy("grp").collect().map(_.toSeq).toSeq,
      maintainAs = Some(("GateRateStream", state)))
  }

  test("GateAttributionStream: random batches + replays keep full " +
    "snapshot equality with gateAttribution") {
    val rnd = new scala.util.Random(3305)
    def text(): String = rnd.nextInt(4) match {
      case 0 => (1 to 8).map(i => s"t${rnd.nextInt(999)}_$i").mkString(" ")
      case 1 => Seq.fill(8)("a").mkString(" ")   // low quality + repetitive
      case 2 => "solo"                            // too_short (0 bigrams)
      case _ => (1 to 6).map(i => s"u$i").mkString(" ")
    }
    val rows: Seq[(String, String)] =
      (0 until 50).map(_ => (s"s${rnd.nextInt(4)}", text()))
    val state = tmpDir("twin-rnd-gas")
    drive[(String, String)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => GateAttributionStream.applyBatch(state, "source",
        "text", 0.5, 0.2)(b.toDF("source", "text"), i),
      () => GateAttributionStream.latest(spark, state)
        .orderBy("src").collect().map(_.toSeq).toSeq,
      seen => graft.ops.Curate.gateAttribution(
          seen.toDF("source", "text"), "source", "text", 0.5, 0.2)
        .orderBy("src").collect().map(_.toSeq).toSeq,
      maintainAs = Some(("GateAttributionStream", state)))
  }

  test("GateAgreementStream: random batches + replays keep full " +
    "snapshot equality with gatePiiAgreement") {
    val rnd = new scala.util.Random(3307)
    def text(): String = rnd.nextInt(4) match {
      case 0 => (1 to 8).map(i => s"t${rnd.nextInt(999)}_$i").mkString(" ")
      case 1 => Seq.fill(8)("a").mkString(" ") // fails the curate gate
      case 2 => null                            // fails both closed
      case _ => (1 to 6).map(i => s"u$i").mkString(" ")
    }
    def aug(): String = rnd.nextInt(3) match {
      case 0 => s"reach u${rnd.nextInt(99)}@example.org now" // PII hit
      case 1 => "clean prose tail"
      case _ => s"node 10.${rnd.nextInt(200)}.0.1 up"        // PII hit
    }
    val rows: Seq[(String, String, String)] =
      (0 until 50).map(_ => (s"s${rnd.nextInt(4)}", text(), aug()))
    val state = tmpDir("twin-rnd-gagr")
    drive[(String, String, String)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => GateAgreementStream.applyBatch(state, "source",
        "text", "aug", 0.5, 0.2)(b.toDF("source", "text", "aug"), i),
      () => GateAgreementStream.latest(spark, state)
        .orderBy("src").collect().map(_.toSeq).toSeq,
      seen => graft.ops.Agreement.gatePiiAgreement(
          seen.toDF("source", "text", "aug"), "source", "text", "aug",
          0.5, 0.2)
        .orderBy("src").collect().map(_.toSeq).toSeq,
      maintainAs = Some(("GateAgreementStream", state)))
  }

  test("KAnonymityStream: random batches + replays keep full " +
    "snapshot equality with kAnonymity") {
    val rnd = new scala.util.Random(3306)
    val langs = Seq("en", "fr", "de", null)
    val sources = Seq("webA", "webB", null)
    // skewed draws so the class-size spectrum spans singletons through
    // healthy classes, and classes HEAL mid-stream as they recur
    val rows: Seq[(String, String)] = (0 until 60).map { _ =>
      (langs(rnd.nextInt(langs.size)),
        sources(math.min(rnd.nextInt(4), sources.size - 1)))
    }
    val state = tmpDir("twin-rnd-kas")
    drive[(String, String)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => KAnonymityStream.applyBatch(state,
        Seq("lang", "source"), 3L)(b.toDF("lang", "source"), i),
      () => KAnonymityStream.latest(spark, state)
        .orderBy("lang", "source").collect().map(_.toSeq).toSeq,
      seen => graft.ops.Pii.kAnonymity(seen.toDF("lang", "source"),
          Seq("lang", "source"), 3L)
        .orderBy("lang", "source").collect().map(_.toSeq).toSeq,
      maintainAs = Some(("KAnonymityStream", state)))
  }

  test("SourceDupStream: random batches + replays keep full snapshot " +
    "equality with sourceDupRate over the batch LSH pairs") {
    val rnd = new scala.util.Random(3304)
    val sources = Seq("sA", "sB", "sC", null)
    // tail-variant template texts collide at jaccard ~0.949; distinct
    // texts never do — a random mix of both per doc
    def template(tail: Int): String =
      (1 to 39).map(i => s"tok$i").mkString(" ") + s" tail$tail"
    def distinct(seed: Int): String =
      (1 to 40).map(i => s"other${seed}_$i").mkString(" ")
    val rows: Seq[(Long, String, String)] = (0 until 30).map { i =>
      (i.toLong,
        if (rnd.nextInt(3) == 0) template(rnd.nextInt(4)) else distinct(i),
        sources(rnd.nextInt(sources.size)))
    }
    val state = tmpDir("twin-rnd-sdr")
    drive[(Long, String, String)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => SourceDupStream.applyBatch(state, "doc_id", "text",
        "source")(b.toDF("doc_id", "text", "source"), i),
      () => SourceDupStream.latest(spark, state)
        .orderBy("src").collect().map(_.toSeq).toSeq,
      seen => {
        val docs = seen.toDF("doc_id", "text", "source")
        graft.ops.Dedup.sourceDupRate(docs,
            graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
              16, 4, 0.8).select("d1", "d2"), "doc_id", "source")
          .orderBy("src").collect().map(_.toSeq).toSeq
      }, maintainAs = Some(("SourceDupStream", state)))
  }

  test("KsDriftStream: random batches + replays keep full snapshot " +
    "equality with ksDrift") {
    val rnd = new scala.util.Random(3303)
    val rows: Seq[(String, Long)] = (0 until 120).map { _ =>
      val g = s"s${rnd.nextInt(4)}"
      (g, if (g == "s2") 30L + rnd.nextInt(15)
          else (1 + rnd.nextInt(25)).toLong)
    }
    val state = tmpDir("twin-rnd-ks")
    drive[(String, Long)](rnd, randomSplit(rnd, rows, 5),
      (b, i) => KsDriftStream.applyBatch(state, "grp", "v")(
        b.toDF("grp", "v"), i),
      () => KsDriftStream.latest(spark, state)
        .orderBy("grp").collect().map(_.toSeq).toSeq,
      seen => graft.ops.CorpusStats.ksDrift(
          seen.toDF("grp", "v"), "grp", "v")
        .orderBy("grp").collect().map(_.toSeq).toSeq,
      maintainAs = Some(("KsDriftStream", state)))
  }
}
