package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100x scale probe for the shared MinHash-LSH pair stage (r18 verdict
  * #2): the stage is the single most-shared artifact in the engine
  * (~10 roster riders) and its claimed scaling is duplicate-density,
  * not corpus². This probe measures it.
  *
  * CONSTRUCTION MATTERS: naively unioning N shifted copies of the
  * corpus (the docs10 pattern used elsewhere in ScaleProbe) grows each
  * document's duplicate SET with N — every doc collides with its N-1
  * verbatim copies, so the pair table grows ~N² for DATA reasons and
  * the probe would measure the synthetic corpus, not the engine. Here
  * each copy k instead rewrites every token t -> "c<k>_t": a bijective
  * per-copy token renaming, so (a) shingle sets within a copy are
  * isomorphic to the originals — every intra-copy pair keeps its exact
  * Jaccard, duplicate density per document is CONSTANT as N grows —
  * and (b) cross-copy shingle sets are disjoint — Jaccard 0, no
  * cross-copy candidates. Under constant duplicate density the pair
  * count must grow ~N and the fitted wall-time exponent is the
  * engine's own: signatures are row-local, bucket sizes stay constant
  * (band keys differ across copies) so the bucket self-join grows ~N,
  * and the verify join touches ~N candidates.
  *
  * Scales 10/32/100 over sf0.1 documents (~5k docs) = 50k/160k/500k
  * docs. Prints per-scale wall seconds + verified-pair and candidate
  * counts, and the fitted log-log exponent between consecutive scales.
  * Same parameters as the roster query x1_minhash_lsh (numSigs 16,
  * rowsPerBand 4, threshold 0.8).
  */
object PairStageProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.engine.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))

    def corpusTimes(n: Int) = (0 until n).map { k =>
      base.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        // bijective per-copy token renaming (see object doc)
        regexp_replace(col("text"), "(\\S+)", s"c${k}_" + "$1").as("text"))
    }.reduce(_ unionByName _)

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val scales = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(10, 32, 100)
    val rows = scales.map { n =>
      val docs = corpusTimes(n)
      val nDocs = docs.count()
      val (cands, tCand) = timed(graft.ops.Dedup.lshCandidates(
        graft.ops.Dedup.docSignatures(docs, "doc_id", "text", 16),
        "doc_id", 16, 4).count())
      val (pairs, tPair) = timed(graft.ops.Dedup.minhashLshPairs(
        docs, "doc_id", "text", numSigs = 16, rowsPerBand = 4,
        threshold = 0.8).count())
      println(f"PAIRSTAGE scale=${n}%d docs=$nDocs%d cands=$cands%d " +
        f"cand_secs=$tCand%.2f pairs=$pairs%d pair_secs=$tPair%.2f")
      (n, nDocs, cands, tCand, pairs, tPair)
    }
    rows.sliding(2).foreach {
      case Seq((n1, _, c1, tc1, p1, tp1), (n2, _, c2, tc2, p2, tp2)) =>
        def ex(a: Double, b: Double) =
          math.log(b / a) / math.log(n2.toDouble / n1)
        println(f"PAIRSTAGE exponent ${n1}x->${n2}x: " +
          f"cand_rows=${ex(c1.toDouble, c2.toDouble)}%.2f " +
          f"cand_time=${ex(tc1, tc2)}%.2f " +
          f"pair_rows=${ex(p1.toDouble, p2.toDouble)}%.2f " +
          f"pair_time=${ex(tp1, tp2)}%.2f")
      case _ =>
    }
    spark.stop()
  }
}
