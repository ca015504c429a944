package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X9 — near-duplicate CLUSTERING: connected components over a pair list
  * (e.g. [[Dedup.minhashLshPairs]] output), labeling each document with
  * the smallest doc id reachable through dup edges — the step that turns
  * pairwise near-dup hits into "keep one per cluster" decisions.
  *
  * Algorithm: min-label propagation with POINTER JUMPING (the
  * large-star/small-star trick GraphX-style CC uses): every node starts
  * labeled with itself; each round a node adopts the minimum label among
  * itself and its neighbors, then labels hop once through themselves
  * (label := label(label)), which doubles the propagation distance per
  * round — convergence in O(log diameter) rounds rather than
  * O(diameter), so even a path graph of 2^maxIters nodes converges.
  * Stop when a round changes nothing. Each round is joins + aggregates
  * on the EDGE list only — the corpus itself is never touched, so the
  * cost scales with duplicate density, not data size. `localCheckpoint`
  * cuts the iterative lineage so plans stay flat.
  */
object Cluster {

  def components(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // undirected: propagate both ways
    val edges = pairs.select(col("d1").as("src"), col("d2").as("dst"))
      .union(pairs.select(col("d2").as("src"), col("d1").as("dst")))
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIters) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("label", "nl"), "dst")
        .groupBy(col("src").as("id")).agg(min(col("nl")).as("cand"))
      val viaNbr = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("cand"), col("label"))).as("label"))
      // pointer jump: label := min(label, label(label))
      val hop = viaNbr.select(col("id").as("label"), col("label").as("ll"))
      val next = viaNbr.join(hop, Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
        .localCheckpoint(true)
      changed = next.join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") < col("old")).count()
      labels = next
      it += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
