package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** X93 triangles: hand-checked counts, orientation invariance,
  * self-loop/duplicate hygiene, the bipartite zero, and brute-force
  * agreement on a pseudo-random graph.
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Graph.triangles(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("K4: four triangles, every node in three of them") {
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val got = run(k4)
    assert(got === (0L to 3L).map(_ -> (3L, 3L)).toMap)
  }

  test("triangle with a pendant: the pendant sees zero") {
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)))
    assert(got === Map(1L -> (3L, 1L), 2L -> (2L, 1L),
      3L -> (2L, 1L), 4L -> (1L, 0L)))
  }

  test("orientation, duplicates, and self-loops do not matter") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L),
      (3L, 1L), (2L, 2L))
    assert(run(messy) === Map(1L -> (2L, 1L), 2L -> (2L, 1L),
      3L -> (2L, 1L)))
  }

  test("bipartite graphs have no triangles") {
    val bip = for (i <- 0L to 4L; j <- 10L to 14L) yield (i, j)
    val got = run(bip)
    assert(got.values.forall(_._2 === 0L))
    assert(got.values.forall(_._1 === 5L))
  }

  test("brute-force agreement on a pseudo-random graph") {
    val n = 40L
    val edges = (0L until 200L).map(i =>
      ((i * 13 + 5) % n, (i * i * 7 + i) % n))
      .filter { case (a, b) => a != b }
    val got = run(edges)
    // driver brute force over adjacency sets
    val adj = edges.flatMap { case (a, b) =>
        Seq(math.min(a, b) -> math.max(a, b))
      }.distinct
      .groupBy(identity).keySet
      .foldLeft(Map.empty[Long, Set[Long]].withDefaultValue(Set.empty)) {
        case (m, (a, b)) => m.updated(a, m(a) + b).updated(b, m(b) + a)
      }
    val nodes = adj.keys.toSeq.sorted
    var triTotal = 0L
    val perNode = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      a <- nodes; b <- adj(a) if b > a; c <- adj(a) if c > b
      if adj(b).contains(c)
    } {
      triTotal += 1
      Seq(a, b, c).foreach(x => perNode(x) += 1)
    }
    assert(got.map(_._2._2).sum === triTotal * 3)
    nodes.foreach { x =>
      assert(got(x) === ((adj(x).size.toLong, perNode(x))), s"node $x")
    }
  }
}
