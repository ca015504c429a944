package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases for the native DotLong / Shingles expressions (the oracle
  * covers the happy path end-to-end).
  */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot_long: exact integer dot product, null-safe, prefix on mismatch") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),        // 4+10+18 = 32
      (Seq(1000L, -1000L), Seq(1000L, 1000L))     // 1e6 - 1e6 = 0
    ).toDF("a", "b")
    val got = df.select(VectorOps.dot_long($"a", $"b").as("d")).as[Long].collect()
    assert(got.toSeq === Seq(32L, 0L))
    // null input -> null out
    val n = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(VectorOps.dot_long($"a", $"b")).collect().head
    assert(n.isNullAt(0))
    // length mismatch scores the common prefix
    val p = Seq((Seq(2L, 3L, 9L), Seq(10L, 10L))).toDF("a", "b")
      .select(VectorOps.dot_long($"a", $"b").as("d")).as[Long].collect()
    assert(p.head === 50L)
    // interpreted eval agrees with codegen
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val i = df.select(VectorOps.dot_long($"a", $"b").as("d")).as[Long].collect()
      assert(i.toSeq === Seq(32L, 0L))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("shingles: sliding windows, short and exact-length inputs") {
    val df = Seq(
      Seq("a", "b", "c", "d"), // 2 shingles of 3
      Seq("a", "b", "c"),      // exactly 1
      Seq("a", "b"),           // too short -> empty
      Seq.empty[String]
    ).toDF("ts")
    val got = df.select(Shingles.shingles($"ts", 3).as("s")).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("a b c"))
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq.empty)
  }

  test("shingles matches the declarative HOF formulation") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val ts = split($"text", " ")
    val hof = docs.select($"doc_id", transform(sequence(lit(1), size(ts) - 2), i =>
      concat_ws(" ", element_at(ts, i), element_at(ts, i + 1), element_at(ts, i + 2))).as("s"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    val native = docs.select($"doc_id", Shingles.shingles(ts, 3).as("s"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    assert(hof.toSeq === native.toSeq)
  }

  test("centroid_argmin matches the declarative struct-array argmin on real data") {
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents: Array[Array[Int]] = emb.orderBy("vec_id").limit(7).collect()
      .map(_.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toInt).toArray)
    val q = transform($"embedding", x => floor(x.cast("double") * 1000).cast("int"))
    val base = emb.select($"vec_id", q.as("q"))
      .withColumn("n2", VectorOps.dot_long($"q", $"q"))
    // declarative twin: array_min over struct(dist, list_id) literals
    val structs = array(cents.zipWithIndex.map { case (c, i) =>
      val c2 = c.map(v => v.toLong * v).sum
      struct(
        ($"n2" - lit(2L) * VectorOps.dot_long($"q", typedLit(c.toSeq)) + lit(c2))
          .as("dist"),
        lit(i).as("list_id"))
    }: _*)
    val declarative = base.select($"vec_id",
        array_min(structs).getField("list_id").as("cl"),
        array_min(structs).getField("dist").as("dist"))
      .orderBy("vec_id").as[(Long, Int, Long)].collect()
    val native = base.select($"vec_id",
        VectorOps.centroid_argmin($"q", cents).getField("list_id").as("cl"),
        VectorOps.centroid_argmin($"q", cents).getField("dist").as("dist"))
      .orderBy("vec_id").as[(Long, Int, Long)].collect()
    assert(declarative.toSeq === native.toSeq)
  }

  test("centroid_argmin breaks distance ties toward the lower list id") {
    val df = Seq((1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = transform($"embedding", x => floor(x.cast("double") * 1000).cast("int"))
    // duplicate centroids: identical distances, first index must win
    val cents = Array(Array(0, 0), Array(0, 0), Array(1000, 1000))
    val got = df.select(
        VectorOps.centroid_argmin(q, cents).getField("list_id")).head().getInt(0)
    assert(got === 2) // exact match beats the duplicates...
    val tied = Array(Array(500, 500), Array(500, 500))
    val got2 = df.select(
        VectorOps.centroid_argmin(q, tied).getField("list_id")).head().getInt(0)
    assert(got2 === 0) // ...and a true tie resolves to the lower id
  }

  test("centroid_argmin2: dist matches centroid_argmin and dist2 is " +
    "the true second minimum on real data") {
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cents: Array[Array[Int]] = emb.orderBy("vec_id").limit(5).collect()
      .map(_.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toInt).toArray)
    val q = transform($"embedding", x => floor(x.cast("double") * 1000).cast("int"))
    val base = emb.select($"vec_id", q.as("q"))
      .withColumn("n2", VectorOps.dot_long($"q", $"q"))
    val dists = array(cents.map { c =>
      val c2 = c.map(v => v.toLong * v).sum
      $"n2" - lit(2L) * VectorOps.dot_long($"q", typedLit(c.toSeq)) + lit(c2)
    }: _*)
    // declarative twin: sort the k distances, take positions 1 and 2
    val declarative = base.select($"vec_id",
        element_at(array_sort(dists), 1).as("d1"),
        element_at(array_sort(dists), 2).as("d2"))
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    val native = base.select($"vec_id",
        VectorOps.centroid_argmin2($"q", cents).getField("dist").as("d1"),
        VectorOps.centroid_argmin2($"q", cents).getField("dist2").as("d2"))
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    assert(declarative.toSeq === native.toSeq)
    // and the argmin lane agrees with centroid_argmin
    val ids = base.select(
        VectorOps.centroid_argmin($"q", cents).getField("list_id"),
        VectorOps.centroid_argmin2($"q", cents).getField("list_id"))
      .collect()
    ids.foreach(r => assert(r.getInt(0) === r.getInt(1)))
  }

  test("centroid_argmin2: an exact duplicate centroid makes dist2 " +
    "equal dist (the silhouette-0 boundary case); k < 2 is refused") {
    val df = Seq((1L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = transform($"embedding", x => floor(x.cast("double") * 1000).cast("int"))
    val dup = Array(Array(500, 500), Array(500, 500))
    val r = df.select(VectorOps.centroid_argmin2(q, dup).as("am"))
      .select($"am.list_id", $"am.dist", $"am.dist2").head()
    assert(r.getInt(0) === 0 && r.getLong(1) === r.getLong(2))
    intercept[IllegalArgumentException] {
      VectorOps.centroid_argmin2(q, Array(Array(0, 0)))
    }
  }

  test("centroid_argmin rejects a dimension mismatch loudly") {
    val df = Seq((1L, Seq(1.0f, 1.0f, 1.0f))).toDF("vec_id", "embedding")
    val q = transform($"embedding", x => floor(x.cast("double") * 1000).cast("int"))
    val ex = intercept[Exception] {
      df.select(VectorOps.centroid_argmin(q, Array(Array(0, 0)))).collect()
    }
    assert(ex.getMessage.contains("centroid dim") ||
      ex.getCause != null && ex.getCause.getMessage.contains("centroid dim"))
  }
}
