package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** X157 — Bradley-Terry source-strength ranking (Bradley & Terry 1952)
  * from pairwise quality wins on SHARED content: every verified
  * cross-source near-duplicate pair is a head-to-head comparison —
  * two sources shipped (nearly) the same document, and the copy with
  * the higher x116 `quality` signal wins. The fixed-point Zermelo /
  * MM iteration (Zermelo 1929; Hunter 2004, "MM algorithms for
  * generalized Bradley-Terry models") turns the win matrix into a
  * strength scale: "when the same content appears in several feeds,
  * whose copy should the keep-one dedup rule keep?" — the
  * principled upgrade of x140's who-copies-whom matrix and x142's
  * token price tag.
  *
  * COMPARISON RULES: same-source pairs carry no preference and are
  * excluded; exact quality ties are excluded (recorded in neither
  * `n_comps` nor `n_wins` — a tie is not a comparison under the BT
  * likelihood). Smoothing: every OBSERVED source pair gets one
  * virtual win each way (w'_ij = w_ij + 1, n'_ij = n_ij + 2) so
  * zero-win sources keep positive strength and the iteration never
  * divides by zero; unobserved pairs stay absent (BT is fit on the
  * comparison graph, not the complete one).
  *
  * ARITHMETIC (scaled-integer fixed point, the [[Graph.pageRank]]
  * discipline — every lane replayed exactly by the oracle):
  *   p_i^(0)  = SCALE (1e6)
  *   denom_i  = Σ_j ⌊n'_ij · SCALE² / (p_i + p_j)⌋   (per-edge floor)
  *   raw_i    = ⌊W'_i · SCALE³ / denom_i⌋            (W'_i = Σ_j w'_ij)
  *   p_i^(t+1)= ⌊raw_i · S · SCALE / Σ_j raw_j⌋      (mean renormalized
  *                                                    to SCALE; S = #sources)
  * All positive, so floor = truncation in every engine.
  *
  * SHAPE AT 100 TB: the pair table is duplicate-density-sized; the
  * quality projection joins it twice by id (the x140 shape); the win
  * matrix folds to source-pair grain (≤ K², sources are dozens) and
  * is the ONLY thing collected — bounded model state, the
  * [[KMeansOp]] centroid discipline. The iteration runs driver-side
  * over that matrix in BigInt; no corpus-scale pass repeats.
  *
  * Output: (src, n_comps, n_wins, strength_micro) — raw (unsmoothed)
  * comparison/win counts, strength on the mean-SCALE scale; sources
  * with no cross-source comparison are absent (no evidence, no rank).
  */
object Preference {

  val Scale = 1000000L

  def bradleyTerry(docs: DataFrame, pairs: DataFrame, idCol: String,
                   srcCol: String, textCol: String,
                   iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val spark = docs.sparkSession
    // the x116 quality signal over the corpus scan (the shared
    // gateSignals seam — one formula, so x157's notion of "better
    // copy" is exactly the gate family's)
    val qual = Curate.gateSignals(docs.filter(col(srcCol).isNotNull)
        .select(col(idCol), col(srcCol), col(textCol)), textCol)
      .select(col(idCol), col(srcCol).as("__s"), col("quality").as("__q"))
    val m = pairs
      .join(qual.select(col(idCol).as("d1"), col("__s").as("s1"),
        col("__q").as("q1")), Seq("d1"))
      .join(qual.select(col(idCol).as("d2"), col("__s").as("s2"),
        col("__q").as("q2")), Seq("d2"))
      .filter(col("s1") =!= col("s2") && col("q1") =!= col("q2"))
    val wins = m.select(
        when(col("q1") > col("q2"), col("s1")).otherwise(col("s2"))
          .as("w"),
        when(col("q1") > col("q2"), col("s2")).otherwise(col("s1"))
          .as("l"))
      .groupBy(col("w"), col("l")).agg(count(lit(1)).as("n_w"))
    // source-pair grain — bounded model state (sources are dozens)
    val winRows = wins.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap

    val ranked = iterate(winRows, iters)
    spark.createDataset(ranked)(Encoders.tuple(Encoders.STRING,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF("src", "n_comps", "n_wins", "strength_micro")
  }

  /** The driver-side Zermelo fixed point over a directed win-count
    * map — exact BigInt, per-edge floors, deterministic iteration
    * order irrelevant (each step is a pure map over sums).
    */
  private[graft] def iterate(winRows: Map[(String, String), Long],
                             iters: Int): Seq[(String, Long, Long, Long)] = {
    if (winRows.isEmpty) return Seq.empty
    val und = winRows.keysIterator
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    def raw(i: String, j: String): Long = winRows.getOrElse((i, j), 0L)
    val srcs = und.toSeq.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val nbr: Map[String, Seq[String]] = srcs.map(i =>
      i -> srcs.filter(j => j != i &&
        und(if (i < j) (i, j) else (j, i)))).toMap
    def wP(i: String, j: String): Long = raw(i, j) + 1L
    def nP(i: String, j: String): Long = raw(i, j) + raw(j, i) + 2L
    val bigW: Map[String, BigInt] =
      srcs.map(i => i -> BigInt(nbr(i).map(wP(i, _)).sum)).toMap
    val S = BigInt(srcs.size)
    val Sc = BigInt(Scale)
    var p: Map[String, BigInt] = srcs.map(_ -> Sc).toMap
    for (_ <- 1 to iters) {
      val rawP: Map[String, BigInt] = srcs.map { i =>
        val denom = nbr(i).map(j =>
          BigInt(nP(i, j)) * Sc * Sc / (p(i) + p(j))).sum
        i -> bigW(i) * Sc * Sc * Sc / denom
      }.toMap
      val tot = rawP.values.sum
      p = rawP.map { case (i, r) => i -> (r * S * Sc / tot) }
    }
    srcs.map(i => (i,
      nbr(i).map(j => raw(i, j) + raw(j, i)).sum,
      nbr(i).map(raw(i, _)).sum,
      p(i).toLong))
  }
}
