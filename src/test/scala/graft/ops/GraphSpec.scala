package graft.ops

import graft.SparkSpec

/** X28 PageRank kernel: hand-checkable fixed-point rounds, dangling-mass
  * redistribution (total rank mass conserved), empty-graph guard, and the
  * block-release contract (only the returned rank vector stays pinned —
  * the r6 leak regression).
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def rankMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val r = Graph.pageRank(edges.toDF("src", "dst"), iters)
    val m = r.collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    r.unpersist(true)
    m
  }

  test("one hand-computed round on a 3-node graph") {
    // 1→{2,3}, 2→3, 3→1; n=3, rank0 = Scale div 3 = 333333333333,
    // base = 15*Scale div 300 = 50e9, contribs floored exactly as below
    val got = rankMap(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)), iters = 1)
    assert(got === Map(
      1L -> 333333333333L, // 50e9 + floor(333333333333*85/100)
      2L -> 191666666666L, // 50e9 + floor(333333333333*85/200)
      3L -> 474999999999L)) // 50e9 + both contribs
  }

  test("dangling node: mass redistributed uniformly, total conserved") {
    // single edge 1→2: node 2 is dangling; its mass must not vanish
    val r1 = rankMap(Seq((1L, 2L)), iters = 1)
    // base = 75e9; contrib 1→2 = floor(500e9*85/100) = 425e9;
    // dangling share = floor(500e9*85/(100*2)) = 212.5e9
    assert(r1 === Map(1L -> 287500000000L, 2L -> 712500000000L))
    assert(r1.values.sum === Graph.Scale) // exact conservation here
    // round 2 draws dangling mass from a NON-pinned previous round
    val r2 = rankMap(Seq((1L, 2L)), iters = 2)
    assert(r2 === Map(1L -> 377812500000L, 2L -> 622187500000L))
    assert(r2.values.sum === Graph.Scale)
  }

  test("mass conservation within truncation on a graph with out-edges everywhere") {
    val got = rankMap(Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)), iters = 3)
    // every floor division truncates < 1 unit per (edge, round); with
    // 4 edges * 3 rounds the loss is bounded far below this
    assert(got.values.sum <= Graph.Scale)
    assert(got.values.sum >= Graph.Scale - 100L)
  }

  test("empty edge list yields an empty (node, rank) frame, no divide-by-zero") {
    val r = Graph.pageRank(Seq.empty[(Long, Long)].toDF("src", "dst"), 3)
    assert(r.columns.toSeq === Seq("node", "rank"))
    assert(r.count() === 0L)
  }

  test("only the returned rank vector stays pinned after pageRank") {
    val sc = spark.sparkContext
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val before = sc.getPersistentRDDs.size
    val r = Graph.pageRank(edges, 3)
    assert(sc.getPersistentRDDs.size <= before + 1,
      s"pageRank leaked pinned blocks: $before -> ${sc.getPersistentRDDs.size}")
    r.unpersist(true)
    assert(sc.getPersistentRDDs.size <= before)
  }

  test("TextRank shape (x153): symmetric co-occurrence edges rank the " +
    "hub word first; self-pairs and duplicate bigrams collapse") {
    import spark.implicits._
    // 'hub' is adjacent to every other word; 'rare' appears once.
    // The duplicated 'hub x' bigram and the 'y y' self-pair exercise
    // the DISTINCT and self-loop guards in the x153 edge construction.
    val docs = Seq(
      "hub x hub y hub z",
      "x hub x",
      "y y hub rare").toDF("text")
    val bg = docs
      .select(org.apache.spark.sql.functions.split($"text", " ").as("ts"))
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.expr(
          "zip_with(slice(ts, 1, size(ts)-1), slice(ts, 2, size(ts)-1)," +
            " (a, b) -> struct(a, b))")).as("p"))
      .select($"p.a".as("a"), $"p.b".as("b"))
      .filter($"a" =!= $"b" && $"a" =!= "" && $"b" =!= "")
    val edges = bg.select($"a".as("src"), $"b".as("dst"))
      .union(bg.select($"b".as("src"), $"a".as("dst")))
      .distinct()
    // no self loops survive, and each undirected pair appears exactly twice
    val e = edges.as[(String, String)].collect().toSet
    assert(e.forall { case (s0, d0) => s0 != d0 })
    assert(e.map { case (s0, d0) => Set(s0, d0) }.size * 2 === e.size)
    val top = Graph.pageRank(edges, 3)
      .orderBy(org.apache.spark.sql.functions.col("rank").desc,
        org.apache.spark.sql.functions.col("node"))
      .as[(String, Long)].collect()
    assert(top.head._1 === "hub") // degree-4 hub outranks everything
    assert(top.map(_._1).toSet === Set("hub", "x", "y", "z", "rare"))
  }
}
