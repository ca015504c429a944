package graft.ops

/** The shared 10^-12 fixed-point scale used by every exact-BIGINT kernel
  * (PageRank ranks in [[Graph]], bigram-LM probabilities in
  * [[LangModel]]) AND interpolated into their DuckDB oracle SQL — one
  * constant, so the engine and the oracle can never drift apart
  * independently.
  */
object FixedPoint {
  val Scale: Long = 1000000000000L
}
