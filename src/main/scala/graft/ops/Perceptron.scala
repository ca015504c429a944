package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** X59 — trained LINEAR quality classifier over hashed features: the
  * field-standard quality gate (a fastText-style linear model on n-gram
  * features — the GPT-3/LLaMA data-curation recipe) on top of the X39
  * hashing-trick featurizer. X42's Naive Bayes is the generative twin
  * (counts → closed form); this is the discriminative half — a model
  * that LEARNS from its mistakes over labeled examples and linearly
  * separates what NB's conditional-independence assumption cannot.
  *
  * Algorithm: batch (epoch-synchronous) multiclass perceptron
  * (Rosenblatt 1958; Collins 2002's structured/averaged variant;
  * McDonald, Hall & Mann 2010 for the distributed epoch-synchronous
  * form). Per epoch e with weight matrix W:
  *   1. score every training doc: s_c = Σ_b x_b · W[c][b];
  *   2. predict argmax_c s_c (ties to the lexicographically smaller
  *      label — the repo-wide argmax convention, x42);
  *   3. for every mistake (pred ≠ y): W[y] += x, W[pred] -= x — all
  *      mistakes of the epoch applied in ONE batched update (the
  *      epoch-synchronous variant; sequential per-example updates
  *      would serialize the corpus through the driver).
  * AVERAGING uses integer snapshot SUMS: the classifier scores with
  * Σ_e W_e rather than (1/E)·Σ_e W_e — argmax is invariant to the
  * positive 1/E scale, so the summed form IS averaged-perceptron
  * prediction with no division and no float anywhere. Every number in
  * train and inference is exact BIGINT arithmetic (features are signed
  * occurrence counts, updates are integer sums), so the full E-epoch
  * training run and every final score replay bit-for-bit in any engine
  * — the oracle re-trains from the raw data alone (x37 discipline).
  *
  * Shape at 100 TB: the train-slice feature matrix is built once
  * ([[TextAnalysis.featureHash]]: one explode + one map-side-combined
  * (doc, bucket) agg) and pinned. Each epoch is ONE broadcast
  * equi-join of that matrix against the dim-row weight table plus TWO
  * aggregations (per-doc k-column score sums; per-bucket k-column
  * mistake deltas — both map-side combined); the corpus is never
  * row-multiplied by k (the k scores are parallel sum columns, the NB
  * pivoted-layout lesson). Weights are dim × k driver-side longs,
  * capped loudly by [[MaxWeightCells]] — the x37/NB bounded-artifact
  * seam (a 2^20-cell linear model is ~8 MB; past that you shard the
  * weight table, a different layout). Inference is one broadcast join
  * + one per-doc aggregation, scan-side.
  */
object Perceptron {

  /** Same pivoted-k-wide-columns bound as [[NaiveBayes.MaxClasses]]. */
  val MaxClasses = 64

  /** Driver-side weight-matrix cap (dim × classes cells). */
  val MaxWeightCells = 1 << 20

  /** Trained model: sorted label vocabulary + summed weight snapshots
    * (`w(i)(b)` = Σ_epochs W_e[label i][bucket b]).
    */
  final case class Model(labels: Seq[String], w: Array[Array[Long]])

  /** Train on `feats` (the (idCol, bucket, weight) sparse matrix, X39
    * layout) restricted to the docs present in `labels` (idCol,
    * labelCol); docs whose features all sign-cancelled away carry no
    * updates (an empty x changes nothing) and are skipped.
    */
  def train(feats: DataFrame, labels: DataFrame, idCol: String,
            labelCol: String, dim: Int, epochs: Int): Model = {
    val spark = feats.sparkSession
    import spark.implicits._
    require(epochs >= 1 && epochs <= 16,
      s"epochs must be in [1, 16]: $epochs — each epoch is a full pass " +
        "over the training features")
    val labeled = labels.filter(col(labelCol).isNotNull)
      .select(col(idCol), col(labelCol).cast("string").as("y"))
    val labs = labeled.select(col("y")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    require(labs.nonEmpty, s"no labels in $labelCol")
    require(labs.size <= MaxClasses,
      s"${labs.size} classes exceeds the $MaxClasses cap — the k-wide " +
        "score layout is built for dozens of classes, not thousands")
    require(dim.toLong * labs.size <= MaxWeightCells,
      s"dim $dim x ${labs.size} classes exceeds the $MaxWeightCells " +
        "driver weight-cell cap — shard the weight table instead")
    val k = labs.size

    // the train feature matrix is pinned once; every epoch re-reads it
    val tf = feats.join(labeled, Seq(idCol))
      .select(col(idCol), col("bucket"), col("weight"), col("y"))
      .localCheckpoint()

    val w = Array.fill(k, dim)(0L) // current weights
    val wSum = Array.fill(k, dim)(0L) // summed snapshots (the average, unscaled)
    for (_ <- 1 to epochs) {
      val wDf = broadcast(
        (0 until dim).map(b => (b.toLong, (0 until k).map(i => w(i)(b))))
          .toDF("bucket", "ws"))
      val scored = tf.join(wDf, Seq("bucket"))
        .groupBy(col(idCol), col("y"))
        .agg(epochScore(0), (1 until k).map(epochScore): _*)
      val pred = withArgmax(scored, labs).filter(col("pred") =!= col("y"))
        .select(col(idCol), col("pred"))
      // one k-wide per-bucket aggregation over the mistakes' features:
      // dw[c][b] = Σ x_b · ([y = c] − [pred = c])
      val delta = pred.join(tf, Seq(idCol))
        .groupBy(col("bucket"))
        .agg(deltaCol(labs, 0), (1 until k).map(i => deltaCol(labs, i)): _*)
        .collect()
      delta.foreach { r =>
        val b = r.getLong(0).toInt
        for (i <- 0 until k) w(i)(b) += r.getLong(i + 1)
      }
      for (i <- 0 until k; b <- 0 until dim) wSum(i)(b) += w(i)(b)
    }
    tf.unpersist()
    Model(labs, wSum)
  }

  private def epochScore(i: Int): Column =
    sum(col("weight") * element_at(col("ws"), i + 1)).as(s"s_$i")

  private def deltaCol(labs: Seq[String], i: Int): Column =
    sum(col("weight") * (when(col("y") === labs(i), 1L).otherwise(0L)
      - when(col("pred") === labs(i), 1L).otherwise(0L))).as(s"d_$i")

  /** Argmax over the k score columns s_0..s_{k-1}: highest score wins,
    * ties to the lexicographically smaller label (the x42 struct-max
    * form). Appends (pred, score).
    */
  private def withArgmax(scored: DataFrame, labs: Seq[String]): DataFrame = {
    val cands = array(labs.indices.map(i =>
      struct(col(s"s_$i").as("score"), lit(-i).as("neg_idx"))): _*)
    val best = array_max(cands)
    scored
      .withColumn("pred",
        element_at(array(labs.map(lit): _*), -best.getField("neg_idx") + 1))
      .withColumn("score", best.getField("score"))
  }

  /** Classify every row of `docs` under a trained model: (idCol, pred,
    * score) with the summed-snapshot integer score. Docs with no
    * surviving feature (all buckets sign-cancelled) score 0 everywhere
    * and take the lexicographically smallest label — the zero-vector
    * argmax, not a dropped row.
    */
  def classify(docs: DataFrame, feats: DataFrame, idCol: String,
               model: Model): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = model.labels.size
    val dim = model.w(0).length
    val wDf = broadcast(
      (0 until dim).map(b => (b.toLong, (0 until k).map(i => model.w(i)(b))))
        .toDF("bucket", "ws"))
    val scored = feats.join(wDf, Seq("bucket"))
      .groupBy(col(idCol))
      .agg(epochScore(0), (1 until k).map(epochScore): _*)
    val dense = docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol) +: (0 until k).map(i =>
        coalesce(col(s"s_$i"), lit(0L)).as(s"s_$i")): _*)
    withArgmax(dense, model.labels).select(col(idCol), col("pred"), col("score"))
  }

  /** The full X59 pipeline: hash features ([[TextAnalysis.featureHash]]),
    * train on the labeled `ref` slice, classify the corpus.
    */
  def classifyTrained(docs: DataFrame, ref: DataFrame, idCol: String,
                      textCol: String, labelCol: String, dim: Int,
                      seed: String, epochs: Int): DataFrame = {
    val feats = TextAnalysis.featureHash(docs, idCol, textCol, dim, seed)
    val model = train(feats, ref.select(col(idCol), col(labelCol)),
      idCol, labelCol, dim, epochs)
    classify(docs, feats, idCol, model)
  }
}
