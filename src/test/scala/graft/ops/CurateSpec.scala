package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X15-X19 curation/range-join invariants beyond the DuckDB oracle. */
class CurateSpec extends SparkSpec {
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("splitAssign: exhaustive, deterministic, roughly proportional") {
    val docs = Tables.documents(spark, sf)
    val s = Curate.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1), rest = "test", seed = "s")
    // every row gets exactly one label from the declared set
    assert(s.count() === docs.count())
    val byLabel = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byLabel.keySet.subsetOf(Set("train", "valid", "test")))
    // deterministic: a second run assigns identically
    val again = Curate.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1), rest = "test", seed = "s")
    assert(s.select("doc_id", "split").except(again.select("doc_id", "split")).count() === 0)
    // proportions within loose tolerance at n=50 (hash-uniformity sanity,
    // not a statistical test)
    val n = docs.count().toDouble
    assert(byLabel.getOrElse("train", 0L) / n > 0.6)
    // a different seed re-deals the hands
    val other = Curate.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1), rest = "test", seed = "t")
    assert(s.select("doc_id", "split").except(other.select("doc_id", "split")).count() > 0)
  }

  test("splitAssign: growing the corpus never moves an existing row") {
    val docs = Tables.documents(spark, sf)
    val half = docs.filter($"doc_id" < 25)
    val fromHalf = Curate.splitAssign(half, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1), "test", "s").select("doc_id", "split")
    val fromFull = Curate.splitAssign(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1), "test", "s")
      .filter($"doc_id" < 25).select("doc_id", "split")
    assert(fromHalf.except(fromFull).count() === 0)
    assert(fromFull.except(fromHalf).count() === 0)
  }

  test("domainQuota: two-phase form equals the naive one-phase window") {
    val docs = Tables.documents(spark, sf)
    def naive(quota: Int): Seq[(Long, String, Long)] = {
      val hh = substring(md5(concat($"doc_id".cast("string"), lit("q"))), 1, 8)
      docs.withColumn("hh", hh)
        .withColumn("rnk", row_number().over(
          Window.partitionBy("source").orderBy($"hh", $"doc_id")).cast("bigint"))
        .filter($"rnk" <= quota)
        .select($"doc_id", $"source", $"rnk").as[(Long, String, Long)]
        .collect().sortBy(r => (r._2, r._3)).toSeq
    }
    for (quota <- Seq(1, 2, 5, 100)) {
      val two = Curate.domainQuota(docs, "doc_id", "source", quota, seed = "q")
        .select($"doc_id", $"source", $"rnk").as[(Long, String, Long)]
        .collect().sortBy(r => (r._2, r._3)).toSeq
      assert(two === naive(quota), s"quota=$quota")
    }
  }

  test("domainQuota: exactness guard covers a degenerate prefilter") {
    val docs = Tables.documents(spark, sf)
    // prefilterFactor = 1 keeps ~quota expected survivors — domains
    // routinely come up short and must fall back to full ranking
    val tight = Curate.domainQuota(docs, "doc_id", "source", 3,
      seed = "q", prefilterFactor = 1)
      .select($"doc_id", $"source", $"rnk").as[(Long, String, Long)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    val loose = Curate.domainQuota(docs, "doc_id", "source", 3,
      seed = "q", prefilterFactor = 1000)
      .select($"doc_id", $"source", $"rnk").as[(Long, String, Long)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    assert(tight === loose)
  }

  test("seqPack: spans tile each shard's token stream; chunks consistent") {
    val docs = Tables.documents(spark, sf)
    val p = Curate.seqPack(docs, "doc_id", "text", shards = 4, chunkTokens = 64)
      .orderBy("shard", "doc_id")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    // (doc_id, shard, n_tokens, tok_start, chunk_first, chunk_last, n_chunks)
    p.groupBy(_._2).foreach { case (_, rows) =>
      // spans are contiguous: each doc starts where the previous ended
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._3 === b._4, s"gap after doc ${a._1}")
        case _ =>
      }
      assert(rows.head._4 === 0L)
    }
    p.foreach { r =>
      assert(r._5 === r._4 / 64, s"chunk_first of doc ${r._1}")
      assert(r._6 === (r._4 + r._3 - 1) / 64, s"chunk_last of doc ${r._1}")
      assert(r._7 === r._6 - r._5 + 1)
      assert(r._3 > 0L)
    }
    // every doc present exactly once
    assert(p.length.toLong === docs.count())
  }

  test("banded range join equals naive join+filter, including boundaries") {
    // hand-built: pairs exactly at lag 0, at the window edge, just past
    // it, and across a bucket boundary
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val views = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")),
      (1L, 11L, ts("2024-01-03 23:59:59")), // bucket boundary straddle
      (2L, 12L, ts("2024-01-01 12:00:00"))
    ).toDF("user_id", "view_id", "view_ts")
    val purchases = Seq(
      (1L, 20L, ts("2024-01-01 00:00:00")), // lag 0 (inclusive)
      (1L, 21L, ts("2024-01-08 00:00:00")), // exactly 7d after view 10
      (1L, 22L, ts("2024-01-08 00:00:01")), // 7d + 1s after view 10
      (1L, 23L, ts("2024-01-04 00:00:01")), // next bucket, in band of 11
      (2L, 24L, ts("2024-01-01 11:59:59")), // before the view: excluded
      (3L, 25L, ts("2024-01-01 00:00:00"))  // other user
    ).toDF("user_id", "purchase_id", "purchase_ts")
    val w = 7L * 86400L * 1000000L
    val got = RangeJoin.banded(views, purchases, "user_id",
      "view_ts", "purchase_ts", w)
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    val naive = views.join(purchases, "user_id")
      .filter(unix_micros($"purchase_ts") >= unix_micros($"view_ts") &&
        unix_micros($"purchase_ts") <= unix_micros($"view_ts") + w)
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.contains((10L, 20L)) && got.contains((10L, 21L)))
    assert(!got.contains((10L, 22L)))
    assert(got.contains((11L, 23L)))
    assert(!got.exists(_._2 == 24L) && !got.exists(_._2 == 25L))
  }

  test("banded range join on events equals naive form at sf0.001") {
    val ev = Tables.events(spark, sf)
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
    val w = 7L * 86400L * 1000000L
    val banded = RangeJoin.banded(views, purchases, "user_id",
      "view_ts", "purchase_ts", w)
      .select("view_id", "purchase_id", "lag_us")
      .as[(Long, Long, Long)].collect().toSet
    val naive = views.join(purchases, "user_id")
      .filter(unix_micros($"purchase_ts") >= unix_micros($"view_ts") &&
        unix_micros($"purchase_ts") <= unix_micros($"view_ts") + w)
      .select($"view_id", $"purchase_id",
        (unix_micros($"purchase_ts") - unix_micros($"view_ts")).as("lag_us"))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
    assert(banded.forall { case (_, _, lag) => lag >= 0 && lag <= w })
  }

  test("weighted sampling: exact integer decision, monotone in weight") {
    val docs = Tables.documents(spark, sf)
    val got = Sample.weighted(docs, "doc_id", "n_chars", 0.3, 600, seed = "w")
      .select("doc_id").as[Long].collect().toSet
    // brute-force the decision on the driver with the same arithmetic
    val all = docs.select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val frac = math.floor(0.3 * 4294967296.0).toLong
    val expected = all.filter { case (id, w) =>
      val hv = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id + "w").take(8), 16)
      hv * 600L < frac * math.min(w, 600L)
    }.map(_._1).toSet
    assert(got === expected)
    assert(got.nonEmpty && got.size < all.length)
    // monotone: doubling every weight (clamped) can only ADD rows
    val heavier = Sample.weighted(
      docs.withColumn("n_chars", $"n_chars" * 2), "doc_id", "n_chars",
      0.3, 600, seed = "w").select("doc_id").as[Long].collect().toSet
    assert(got.subsetOf(heavier))
  }

  test("distinct tokens: HLL sketch lands within rsd of the exact count") {
    val docs = Tables.documents(spark, sf)
    val tok = docs.select($"lang", explode(split($"text", " ")).as("token"))
    val exact = tok.groupBy("lang").agg(countDistinct($"token").as("n"))
      .as[(String, Long)].collect().toMap
    val approx = tok.groupBy("lang")
      .agg(approx_count_distinct($"token", rsd = 0.02).as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (lang, n) =>
      val a = approx(lang).toDouble
      assert(math.abs(a - n) / n < 0.1, s"$lang: exact=$n approx=$a")
    }
  }

  test("chunk: overlapping windows tile the token stream, tail clamps") {
    val docs = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = Curate.chunk(docs, "doc_id", "text", size = 4, stride = 2)
      .orderBy("chunk_idx")
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 2L, 4L, "t2 t3 t4 t5"),
      (2L, 4L, 4L, "t4 t5 t6 t7"),
      (3L, 6L, 4L, "t6 t7 t8 t9"),
      (4L, 8L, 2L, "t8 t9"))) // tail window is short, never empty
  }

  test("chunk: stride > size is rejected (silent token gaps)") {
    intercept[IllegalArgumentException] {
      Curate.chunk(Seq((1L, "a b c")).toDF("doc_id", "text"),
        "doc_id", "text", size = 8, stride = 16)
    }
  }

  test("chunk: a doc shorter than one window yields exactly one chunk") {
    val docs = Seq((1L, "only two")).toDF("doc_id", "text")
    val got = Curate.chunk(docs, "doc_id", "text", size = 16, stride = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got.toSeq === Seq((0L, 0L, 2L, "only two")))
  }

  test("split leakage audit flags exactly the boundary-crossing near-dup pairs") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      numSigs = 16, rowsPerBand = 4, threshold = 0.8)
    val splits = Curate.splitAssign(docs, "doc_id",
        Seq("train" -> 0.8, "valid" -> 0.1), rest = "test", seed = "split")
      .select(col("doc_id"), col("split"))
    val leaked = pairs
      .join(splits.select(col("doc_id").as("d1"), col("split").as("split1")), "d1")
      .join(splits.select(col("doc_id").as("d2"), col("split").as("split2")), "d2")
      .filter(col("split1") =!= col("split2"))
    val all = pairs.count()
    val crossing = leaked.count()
    val same = pairs
      .join(splits.select(col("doc_id").as("d1"), col("split").as("split1")), "d1")
      .join(splits.select(col("doc_id").as("d2"), col("split").as("split2")), "d2")
      .filter(col("split1") === col("split2")).count()
    assert(crossing + same === all) // partition of the pair set
    // flagged pairs really cross (re-checked row-wise)
    assert(leaked.filter(col("split1") === col("split2")).count() === 0L)
  }

  test("chunk: stride == size gives a disjoint exact cover of every doc") {
    val docs = Tables.documents(spark, sf)
    val chunks = Curate.chunk(docs, "doc_id", "text", size = 8, stride = 8)
    // disjoint cover: per doc, chunk token counts sum to the doc's count
    // and consecutive starts differ by exactly the stride
    val bad = chunks.groupBy("doc_id")
      .agg(sum("n_tok").as("covered"), count(lit(1)).as("n_chunks"),
        max("start_tok").as("last_start"))
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      .filter(col("covered") =!= col("n_tokens") ||
        col("last_start") =!= (col("n_chunks") - 1) * 8)
    assert(bad.count() === 0L)
  }

  test("seqLenAudit: hand-worked pad/truncate table; boundary docs " +
    "(t == L, t == L+1) land on the exact ceilings") {
    // docs of 4, 8, 9, 20 tokens at L = 8:
    //   pad:      1 + 1 + 2 + 3 = 7 seqs -> waste (56-41)/56
    //   truncate: 4 + 8 + 8 + 8 = 28 kept -> loss (41-28)/41
    val docs = Seq(4, 8, 9, 20).zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(k => s"w$k").mkString(" "))
    }.toDF("doc_id", "text")
    val got = Curate.seqLenAudit(docs, "text", Seq(8L, 64L))
      .orderBy("seq_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got(0) === ((8L, 4L, 41L, 7L,
      (BigInt(56 - 41) * 1000000 / 56).toLong, 28L,
      (BigInt(41 - 28) * 1000000 / 41).toLong)))
    // L = 64 swallows every doc whole: one seq each, zero truncation
    assert(got(1) === ((64L, 4L, 41L, 4L,
      (BigInt(4 * 64 - 41) * 1000000 / (4 * 64)).toLong, 41L, 0L)))
    intercept[IllegalArgumentException] {
      Curate.seqLenAudit(docs, "text", Seq(8L, 8L))
    }
  }
}
