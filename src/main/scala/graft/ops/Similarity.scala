package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X2 — similarity search over an embedding column (SURVEY §2.8).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k, query-set broadcast against
  *    the corpus — the correctness baseline. Cost is |Q| x |corpus| dot
  *    products with NO shuffle of the corpus (queries broadcast, per-query
  *    top-k via window on the scored pairs).
  *  - [[lshTopK]]: sign-random-projection buckets (16 bits from the
  *    leading dimensions) prune the corpus to one bucket per query before
  *    scoring — the 100 TB path: the bucket id is computed scan-side, the
  *    join is bucket-equality (hash-partitionable), and only candidates
  *    are scored. Recall versus brute force is asserted in ScalaTest.
  *
  * All scoring uses floor(x*1000) integer quantization: dot products and
  * norms are exact integers (dim 64, |x|<=~2000 => well inside 2^53), so
  * scores are bit-identical regardless of summation order or engine —
  * the property that makes the DuckDB oracle byte-match. (Int8/int16
  * quantization is also the production-realistic memory layout.)
  */
object Similarity {

  /** floor(x * 1000) quantized copy of the embedding, stored as
    * `array<int>` — |x| <= ~2000 fits easily, and the narrower rows halve
    * the bytes materialized per joined pair in all-pairs scoring.
    */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("int"))

  /** Exact integer squared norm of a quantized vector (native codegen'd
    * loop — computed once per row, not per pair).
    */
  def sqNorm(q: Column): Column =
    graft.functions.VectorOps.dot_long(q, q)

  /** Exact integer dot product of two quantized vectors — the per-pair hot
    * path, a native `DotLong` expression instead of interpreted
    * `aggregate(zip_with(...))` (see graft.functions.DotLong).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorOps.dot_long(a, b)

  /** Cosine from quantized ints: dot / (sqrt(n2a) * sqrt(n2b)) — the
    * association is fixed and must match any external verifier's SQL.
    */
  def cosine(dotCol: Column, n2a: Column, n2b: Column): Column =
    dotCol.cast("double") / (sqrt(n2a) * sqrt(n2b))

  private def prepared(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), quantize(col(vecCol)).as("q"))
      .withColumn("n2", sqNorm(col("q")))

  /** Exact top-k: every query row against the full corpus.
    * Ties broken by candidate id for determinism.
    */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val corpus = prepared(emb, idCol, vecCol)
    val qs = prepared(queries, idCol, vecCol)
      .withColumnRenamed(idCol, "qid").withColumnRenamed("q", "qq")
      .withColumnRenamed("n2", "qn2")
    val scored = corpus.join(broadcast(qs), col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** 16-bit sign bucket over the leading dimensions: bit j set iff
    * vec[j] >= 0. Deterministic, computable at scan time, and cheap
    * enough to store alongside the vector at ingest.
    */
  def signBucket(vec: Column, bits: Int = 16): Column =
    (0 until bits).map(j =>
      when(element_at(vec, j + 1) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** IVF-style ANN: a KMeans coarse quantizer (nlist centroids, fixed
    * seed) partitions the corpus into inverted lists; each query probes
    * its `nprobe` nearest centroids and scores only those lists.
    *
    * The scale shape: centroids are broadcast (nlist x dim doubles), the
    * corpus is scanned once to attach its list id (a column you would
    * persist at ingest), and the candidate join is an equi-join on list
    * id — corpus rows shuffle at most once, and only 1/nlist-ish of the
    * corpus is scored per query. Training is the only non-streaming step,
    * run on a sample in production. Results are approximate (ScalaTest
    * asserts recall vs brute force; no SQL oracle — KMeans is not
    * expressible in the oracle engine).
    */
  def ivfTopK(emb: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val asVec = (df: DataFrame) => df.withColumn("__features",
      array_to_vector(transform(col(vecCol), _.cast("double"))))
    // Coarse quantization needs rough Voronoi cells, not convergence:
    // 10 Lloyd iterations is plenty, and the tiny training frame is
    // coalesced so each iteration isn't dominated by task scheduling.
    // (In production: train on a driver-sized sample, broadcast.)
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("__features")
      .fit(asVec(emb).coalesce(8))

    // corpus side: attach inverted-list id once
    val corpus = model.transform(asVec(emb))
      .select(col(idCol), col(vecCol), col("prediction").as("list_id"))
      .select(col(idCol), quantize(col(vecCol)).as("q"), col("list_id"))
      .withColumn("n2", sqNorm(col("q")))

    // query side: nprobe nearest centroids via a tiny broadcast cross join
    val spark = emb.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("list_id", "centroid")
    val qs = queries.select(col(idCol).as("qid"), col(vecCol))
      .withColumn("qq", quantize(col(vecCol)))
      .withColumn("qn2", sqNorm(col("qq")))
    val qDist = qs.crossJoin(broadcast(centroids))
      .withColumn("dist", aggregate(
        zip_with(transform(col(vecCol), _.cast("double")), col("centroid"),
          (a, b) => (a - b) * (a - b)),
        lit(0.0), _ + _))
    val w0 = Window.partitionBy(col("qid")).orderBy(col("dist"), col("list_id"))
    val probes = qDist.withColumn("pr", row_number().over(w0))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qq"), col("qn2"), col("list_id"))

    val scored = corpus.join(broadcast(probes), Seq("list_id"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Bucketed ANN: score only corpus vectors in the query's sign bucket.
    * Recall < 1 by construction; the bucket join replaces the cross
    * product, which is what survives a 100x corpus scale-up.
    */
  def lshTopK(emb: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 16): DataFrame = {
    val corpus = emb.select(col(idCol), quantize(col(vecCol)).as("q"),
        signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("n2", sqNorm(col("q")))
    val qs = queries.select(col(idCol).as("qid"), quantize(col(vecCol)).as("qq"),
        signBucket(col(vecCol), bits).as("bucket"))
      .withColumn("qn2", sqNorm(col("qq")))
    val scored = corpus.join(broadcast(qs), Seq("bucket"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol).as("cid"),
        round(cosine(dot(col("qq"), col("q")), col("qn2"), col("n2")), 6).as("sim"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
