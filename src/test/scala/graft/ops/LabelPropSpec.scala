package graft.ops

import graft.SparkSpec

/** X84 label propagation: agreement with a driver-side reference of the
  * deterministic synchronous rounds, community structure on a two-clique
  * graph, isolated-node retention, and the empty-graph guard.
  */
class LabelPropSpec extends SparkSpec {

  import spark.implicits._

  /** Reference: same synchronous min-tie majority rounds. */
  private def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    var labels = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      val adopted = edges.groupBy(_._2).map { case (v, es) =>
        val counts = es.groupBy(e => labels(e._1)).view.mapValues(_.size)
        v -> counts.toSeq.minBy { case (lbl, c) => (-c, lbl) }._1
      }
      labels = nodes.map(v => v -> adopted.getOrElse(v, labels(v))).toMap
    }
    labels
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def undirected(es: (Long, Long)*): Seq[(Long, Long)] =
    es.toSeq ++ es.map(_.swap)

  test("matches the reference on mixed graphs, 1..3 rounds") {
    val g = undirected((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (3L, 4L))
    for (iters <- 1 to 3)
      assert(run(g, iters) === ref(g, iters), s"iters=$iters")
  }

  test("two cliques joined by one bridge resolve to two communities") {
    val g = undirected(
      (1L, 2L), (1L, 3L), (2L, 3L), // clique A
      (10L, 11L), (10L, 12L), (11L, 12L), // clique B
      (3L, 10L)) // bridge
    val got = run(g, 3)
    assert(got === ref(g, 3))
    // each clique is internally uniform
    assert(Set(got(1L), got(2L), got(3L)).size === 1)
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
  }

  test("a node with no in-edges keeps its own label") {
    // directed edge only 1 -> 2: node 1 never receives a vote
    val got = run(Seq((1L, 2L)), 3)
    assert(got(1L) === 1L)
    assert(got(2L) === 1L) // 2 adopts its only in-neighbor's label
  }

  test("empty edge list yields an empty (node, community) frame") {
    val r = Graph.labelPropagation(
      Seq.empty[(Long, Long)].toDF("src", "dst"), 3)
    assert(r.columns.toSeq === Seq("node", "community"))
    assert(r.count() === 0L)
  }
}
