package graft.ops

import graft.SparkSpec

/** X75 HITS kernel: exact agreement with a driver-side BigInt reference
  * of the L1-normalized fixed-point iteration, bipartite hub/authority
  * separation, normalization bounds, and the empty-graph guard.
  */
class HitsSpec extends SparkSpec {

  import spark.implicits._

  /** Reference implementation: the same integer half-rounds in BigInt. */
  private def ref(edges: Seq[(Long, Long)],
                  iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val sc = BigInt(Graph.Scale)
    var hub = nodes.map(_ -> sc / n).toMap
    var auth = nodes.map(_ -> BigInt(0)).toMap
    def normalize(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val t = raw.values.sum
      nodes.map(v => v -> (if (t > 0) raw.getOrElse(v, BigInt(0)) * sc / t
                           else BigInt(0))).toMap
    }
    for (_ <- 1 to iters) {
      auth = normalize(edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map(e => hub(e._1)).sum })
      hub = normalize(edges.groupBy(_._1).map { case (u, es) =>
        u -> es.map(e => auth(e._2)).sum })
    }
    nodes.map(v => v -> (hub(v).toLong, auth(v).toLong)).toMap
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val out = Graph.hits(edges.toDF("src", "dst"), iters)
    val m = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.unpersist(true)
    m
  }

  test("matches the BigInt reference on a bipartite graph, 1..3 iters") {
    // customers 1,2 -> suppliers 10,11: 1 buys from both, 2 from 10 only
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    for (iters <- 1 to 3)
      assert(run(edges, iters) === ref(edges, iters), s"iters=$iters")
  }

  test("matches the reference on a graph with cycles and a sink") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    for (iters <- 1 to 3)
      assert(run(edges, iters) === ref(edges, iters), s"iters=$iters")
  }

  test("bipartite separation: sources are pure hubs, sinks pure authorities") {
    val got = run(Seq((1L, 10L), (1L, 11L), (2L, 10L)), 2)
    assert(got(10L)._1 == 0L && got(11L)._1 == 0L) // suppliers: hub 0
    assert(got(1L)._2 == 0L && got(2L)._2 == 0L) // customers: auth 0
    // best-connected on each side wins
    assert(got(10L)._2 > got(11L)._2)
    assert(got(1L)._1 > got(2L)._1)
    // L1 normalization: each side sums to SCALE within truncation
    assert(got.values.map(_._1).sum <= Graph.Scale)
    assert(got.values.map(_._1).sum >= Graph.Scale - 10L)
    assert(got.values.map(_._2).sum <= Graph.Scale)
    assert(got.values.map(_._2).sum >= Graph.Scale - 10L)
  }

  test("empty edge list yields an empty frame, no divide-by-zero") {
    val r = Graph.hits(Seq.empty[(Long, Long)].toDF("src", "dst"), 3)
    assert(r.columns.toSeq === Seq("node", "hub", "auth"))
    assert(r.count() === 0L)
  }
}
