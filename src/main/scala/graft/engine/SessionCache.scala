package graft.engine

import java.lang.ref.SoftReference

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Per-(SparkSession, string key) memo used by the operator caches
  * (LSH pair stage, PQ codebooks, enriched fact).
  *
  * Weak SESSION key + SOFT value indirection: several cached values
  * (DataFrames in particular) strongly reference their own session, so a
  * plain `WeakHashMap[SparkSession, value]` entry would be immortal — the
  * key stays strongly reachable through its own value and nothing is ever
  * collected across many sessions in one JVM. The soft reference breaks
  * that chain: under memory pressure the GC clears the value map, which
  * unpins the session key, and the cost is only a recompute/retrain on
  * the next call.
  */
final class SessionCache[T] {

  private val cache =
    new java.util.WeakHashMap[SparkSession, SoftReference[mutable.Map[String, T]]]()

  def getOrCompute(s: SparkSession, key: String)(f: => T): T =
    cache.synchronized {
      val perSession = Option(cache.get(s)).flatMap(r => Option(r.get)).getOrElse {
        val m = mutable.Map.empty[String, T]
        cache.put(s, new SoftReference(m)); m
      }
      perSession.getOrElseUpdate(key, f)
    }
}
