package graft.ops

import graft.SparkSpec
import graft.engine.Tables
import org.apache.spark.sql.functions.col

/** X51 invariants beyond the DuckDB oracle: the refine stage is exact
  * over its candidate set (degenerate candidate lists recover brute
  * force), and multi-probe LSH degenerates to the single-bucket tier at
  * probeDist 0 and to brute force when every bucket is probed.
  */
class AnnRefineSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val K = 5
  private def emb = Tables.embeddings(spark, dir)
  private def qs = emb.filter(col("vec_id") < 5)

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "cid", "rank", "sim")
      .as[(Long, Long, Int, Double)].collect().toSet

  test("refineExact over an all-pairs candidate list equals brute force") {
    val all = qs.select(col("vec_id").as("qid"))
      .crossJoin(emb.select(col("vec_id").as("cid")))
      .filter(col("qid") =!= col("cid"))
    val refined = canon(
      Similarity.refineExact(emb, qs, "vec_id", "embedding", K, all))
    val brute = canon(
      Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", K))
    assert(refined === brute)
  }

  test("multi-probe at probeDist 0 equals the single-bucket tier") {
    val mp = canon(Similarity.lshMultiProbeTopK(emb, qs, "vec_id",
      "embedding", K, bits = 6, probeDist = 0))
    val single = canon(Similarity.lshTopK(emb, qs, "vec_id",
      "embedding", K, bits = 6))
    assert(mp === single)
  }

  test("multi-probe with every bucket probed equals brute force") {
    val mp = canon(Similarity.lshMultiProbeTopK(emb, qs, "vec_id",
      "embedding", K, bits = 4, probeDist = 4))
    val brute = canon(
      Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", K))
    assert(mp === brute)
  }

  test("refined candidates recover recall the raw ADC ranking loses") {
    val sample = Similarity.collectTrainingSample(emb, "embedding")
    val coarse = Similarity.trainCoarseCentroids(sample, 8)
    val trained = (coarse,
      Similarity.trainResidualCodebook(sample, coarse, 16, 64))
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", K)
      .select("qid", "cid").localCheckpoint(false)
    val raw = Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", K,
      nlist = 8, nprobe = 4, numSub = 16, codes = 64,
      trained = Some(trained))
    val cands = Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 50,
      nlist = 8, nprobe = 6, numSub = 16, codes = 64,
      trained = Some(trained))
    val refined = Similarity.refineExact(emb, qs, "vec_id", "embedding", K,
      cands)
    val audit = Similarity.recallAudit(
      Seq("raw" -> raw, "refined" -> refined), exact)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(audit("refined") >= audit("raw"),
      s"refine must not lose recall: $audit")
  }
}
