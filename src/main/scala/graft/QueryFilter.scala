package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SPARK_GRAFT_ONLY local-iteration filter shared by [[Bench]] and
  * [[Verify]]: a comma-separated allowlist of query names restricting
  * the run. ONE implementation so the two mains cannot drift, and
  * unknown names fail loudly — a typo would otherwise produce a
  * valid-looking empty bench JSON or an empty verify directory with no
  * warning at all.
  */
object QueryFilter {
  def selected(): Map[String, (SparkSession, String) => DataFrame] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    if (only.isEmpty) SparkEntry.queries
    else {
      val unknown = only -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        "SPARK_GRAFT_ONLY names unknown queries: " +
          unknown.toSeq.sorted.mkString(", ") +
          " — check for typos against SparkEntry.queries")
      SparkEntry.queries.filter { case (n, _) => only(n) }
    }
  }
}
