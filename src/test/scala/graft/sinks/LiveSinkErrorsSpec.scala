package graft.sinks

import org.scalatest.funsuite.AnyFunSuite

/** The counted-and-dropped policy (`data_dbstore.go:150-155` checkError:
  * G8 counter + log, never a crash) — unit contract for the wrapper the
  * live sinks and the monitor's CheckErrors field share.
  */
class LiveSinkErrorsSpec extends AnyFunSuite {

  test("failures are counted and swallowed; successes count nothing") {
    LiveSinkErrors.reset()
    var ran = 0
    LiveSinkErrors.countedAndDropped { ran += 1 }
    assert(ran === 1)
    assert(LiveSinkErrors.count === 0)
    LiveSinkErrors.countedAndDropped {
      throw new java.io.IOException("db down")
    }
    LiveSinkErrors.countedAndDropped {
      throw new RuntimeException("insert refused")
    }
    assert(LiveSinkErrors.count === 2)
    // the pump proceeded: the wrapper never rethrows a NonFatal
    LiveSinkErrors.countedAndDropped { ran += 1 }
    assert(ran === 2)
  }

  test("fatal errors are NOT swallowed (NonFatal only — an OOM must " +
    "surface, not become a counter tick)") {
    LiveSinkErrors.reset()
    intercept[OutOfMemoryError] {
      LiveSinkErrors.countedAndDropped { throw new OutOfMemoryError("test") }
    }
    assert(LiveSinkErrors.count === 0)
  }
}
