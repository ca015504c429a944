package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X28 — PageRank centrality over an edge list, the graph-quality
  * signal web-scale curation pipelines attach to documents (rank the
  * source graph, weight or gate documents by their host's rank).
  *
  * EXACT FIXED-POINT formulation: ranks are integers in units of
  * 10^-12 (rank0 = SCALE div N; each round
  * rank' = (15*SCALE div (100*N)) + Σ floor(rank_src * 85 / (100*outdeg))),
  * so every iteration is pure BIGINT arithmetic — no float-addition
  * order sensitivity, and a SQL oracle reproduces every rank
  * bit-for-bit by unrolling the same iterations. (Float PageRank sums
  * contributions in shuffle arrival order; two runs can legitimately
  * differ in the last ulp. Fixed-point is how you make an iterative
  * graph kernel oracle-checkable.)
  *
  * Shape at 100 TB: the classic iterative join — each round shuffles
  * the current rank vector (one BIGINT per node) into the
  * edge-partitioned join and re-aggregates per destination with
  * map-side combine. The edge⨝outdeg side is joined ONCE, materialized
  * (`localCheckpoint`), and reused every round, so per-round work is
  * rank-vector-sized, not edge-list-rebuild-sized; lineage stays flat
  * across iterations. Convergence work bounds: fixed iteration count
  * (curation pipelines run PageRank for a fixed budget, not to
  * convergence).
  */
object Graph {

  val Scale = 1000000000000L // 10^12 fixed-point rank mass

  /** Fixed-point PageRank over directed `edges` (columns src, dst),
    * `iters` rounds, damping 0.85. Every node must have out-degree >= 1
    * (make undirected graphs bidirectional first — no dangling-mass
    * redistribution is performed). Returns (node, rank).
    */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // edge topology joined to out-degrees once, reused every round
    val eo = edges.join(outdeg, "src").localCheckpoint(true)
    val base = (15L * Scale) / (100L * n)
    var ranks = nodes.withColumn("rank", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contribs = eo
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"rank * 85L div (outdeg * 100L)").as("contrib"))
        .groupBy(col("node")).agg(sum(col("contrib")).as("inflow"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + coalesce(col("inflow"), lit(0L))).as("rank"))
        .localCheckpoint(true)
    }
    ranks
  }
}
