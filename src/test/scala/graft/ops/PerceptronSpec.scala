package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** X59 averaged perceptron: hand-computed epoch updates, snapshot-sum
  * averaging on a non-convergent dataset, featureless-doc fallback, and
  * end-to-end recovery of separable labels through the hashed features.
  */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed epochs: one mistake trains the separating weight") {
    // doc 1 (class a): x = {bucket 0 -> 2}; doc 2 (class b): {bucket 1 -> 3}
    val feats = Seq((1L, 0L, 2L), (2L, 1L, 3L))
      .toDF("doc_id", "bucket", "weight")
    val labels = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "y")
    val m = Perceptron.train(feats, labels, "doc_id", "y",
      dim = 4, epochs = 3)
    assert(m.labels === Seq("a", "b"))
    // epoch 1: zero weights, both predict 'a' (lex tie-break); doc 2 is
    // the one mistake: W[b][1] += 3, W[a][1] -= 3. Epochs 2-3 are clean
    // (doc 1 ties at 0 -> 'a'; doc 2 scores -9 vs 9 -> 'b'), so the
    // snapshot sum is 3x the epoch-1 matrix.
    assert(m.w(0).toSeq === Seq(0L, -9L, 0L, 0L))
    assert(m.w(1).toSeq === Seq(0L, 9L, 0L, 0L))

    // classify: doc 3 has no features -> zero scores, lex-smallest label
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val got = Perceptron.classify(docs, feats, "doc_id", m)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set((1L, "a", 0L), (2L, "b", 27L), (3L, "a", 0L)))
  }

  test("averaging sums snapshots, not the final epoch") {
    // identical features, opposite labels: the perceptron cycles
    //   e1: both pred a -> W = (a:-1, b:+1)
    //   e2: both pred b -> W = (0, 0)
    //   e3: both pred a -> W = (a:-1, b:+1)
    // snapshot sum = (-2, +2), NOT 3x the final epoch's (-1, +1)
    val feats = Seq((1L, 0L, 1L), (2L, 0L, 1L))
      .toDF("doc_id", "bucket", "weight")
    val labels = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "y")
    val m = Perceptron.train(feats, labels, "doc_id", "y",
      dim = 1, epochs = 3)
    assert(m.w(0).toSeq === Seq(-2L))
    assert(m.w(1).toSeq === Seq(2L))
  }

  test("separable vocabularies are fully recovered end to end") {
    val docs = (0 until 30).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha beta gamma delta", "en")
      else (i.toLong, "un deux trois quatre", "fr")
    }.toDF("doc_id", "text", "lang")
    val got = Perceptron.classifyTrained(docs, docs, "doc_id", "text",
      "lang", dim = 64, seed = "fh", epochs = 3)
      .select(col("doc_id"), col("pred"))
      .as[(Long, String)].collect().toMap
    (0 until 30).foreach { i =>
      assert(got(i.toLong) === (if (i % 2 == 0) "en" else "fr"))
    }
  }

  test("class and weight-cell caps refuse loudly") {
    val feats = Seq((1L, 0L, 1L)).toDF("doc_id", "bucket", "weight")
    val labels = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "y")
    val e = intercept[IllegalArgumentException] {
      Perceptron.train(feats, labels, "doc_id", "y",
        dim = 1 << 20, epochs = 1)
    }
    assert(e.getMessage.contains("weight-cell cap"))
  }
}
