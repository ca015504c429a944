package graft.sinks

import java.util.concurrent.atomic.LongAdder

/** The live db-store failure policy: COUNTED AND DROPPED — the
  * reference's `checkError` (`/root/reference/data_dbstore.go:150-155`:
  * every store error pushes the G8 `DBStoreErrChan` counter and logs;
  * nothing crashes, nothing retries). The pump must not stall because
  * the analytics store is down: the parquet system of record beside the
  * live sink stays exactly-once, the dropped batches are the counter's
  * business, and ReplacingMergeTree convergence handles the replays
  * that DO reach the store twice.
  *
  * Driver-side state (the live hook runs inside `foreachBatch` on the
  * driver; only the inserts themselves are executor-distributed), like
  * MonitorStream's CounterState.
  */
object LiveSinkErrors {
  private val errors = new LongAdder

  def count: Long = errors.sum()

  /** Test / lifecycle hook: start a fresh window. */
  def reset(): Unit = errors.reset()

  /** Run a live-sink write under the counted-and-dropped policy. */
  def countedAndDropped(body: => Unit): Unit =
    try body
    catch {
      case e if scala.util.control.NonFatal(e) =>
        errors.increment()
        System.err.println(
          s"[pump] live db-store error (counted and dropped, " +
            s"total=${errors.sum()}): ${e.getMessage}")
    }
}
