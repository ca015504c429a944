package graft.streaming

import java.net.URI
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileStatus, FileUtil, Path, RawLocalFileSystem}

/** A test [[org.apache.hadoop.fs.FileSystem]] with OBJECT-STORE
  * semantics over local disk — the store class the manifest-commit
  * protocol in [[StateMaintenance]] was designed for but that no local
  * spec naturally exercises (LocalFileSystem has atomic rename; S3A
  * does not):
  *
  *  - `rename` is NON-ATOMIC copy+delete, the S3A reality. The copy
  *    half of a single file models an atomic whole-object PUT (full
  *    content appears, or nothing); the delete half is a separate
  *    mutation. A crash BETWEEN them is observable: both src and dst
  *    exist. Directory renames copy per-object, exactly like S3A's
  *    per-key copy loop.
  *  - CRASH POINTS are injectable per rename destination (matched by
  *    path substring, one-shot): before the copy (nothing happened) or
  *    between copy and delete (the half-done window).
  *  - STALE LISTINGS are injectable: a recorded directory listing is
  *    served once in place of the live one (eventual-consistency-style
  *    list-after-delete lag).
  *
  * Registered under scheme `ostore` via
  * `fs.ostore.impl = classOf[ObjectStoreLikeFileSystem].getName`;
  * `ostore:///abs/path` maps onto the local path `/abs/path`, so Spark
  * jobs (parquet read/write, committer renames) run through these
  * semantics end-to-end.
  */
class ObjectStoreLikeFileSystem extends RawLocalFileSystem {
  import ObjectStoreLikeFileSystem._

  override def getUri: URI = URI.create("ostore:///")
  override def getScheme: String = "ostore"

  override def rename(src: Path, dst: Path): Boolean = {
    maybeCrash(BeforeCopy, dst)
    // object stores have no rename-onto-existing semantics worth
    // modeling; every rename under test targets a fresh destination
    if (exists(dst)) return false
    if (!exists(src)) return false
    require(FileUtil.copy(this, src, this, dst,
      false /* deleteSource */, true /* overwrite */, getConf),
      s"ostore copy $src -> $dst failed")
    maybeCrash(AfterCopyBeforeDelete, dst)
    delete(src, true)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val key = f.toUri.getPath
    val stale = staleListings.remove(key)
    if (stale != null) stale else super.listStatus(f)
  }
}

object ObjectStoreLikeFileSystem {
  sealed trait CrashPoint
  /** Crash before any mutation: the rename never started. */
  case object BeforeCopy extends CrashPoint
  /** Crash in the half-done window: dst fully written, src not yet
    * deleted — the state no atomic-rename filesystem can ever show.
    */
  case object AfterCopyBeforeDelete extends CrashPoint

  final class InjectedCrash(msg: String) extends RuntimeException(msg)

  /** One-shot injected crash: (destination-path substring, point).
    * Substrings should include the test's own tmp dir so concurrent
    * suites can never collide.
    */
  @volatile private var crash: Option[(String, CrashPoint)] = None

  def injectCrash(dstSubstring: String, point: CrashPoint): Unit =
    crash = Some((dstSubstring, point))

  def clearCrash(): Unit = crash = None

  private def maybeCrash(point: CrashPoint, dst: Path): Unit =
    crash match {
      case Some((sub, p)) if p == point && dst.toString.contains(sub) =>
        crash = None
        throw new InjectedCrash(s"injected crash: $point at $dst")
      case _ => ()
    }

  /** Listings to serve stale, keyed by directory path (scheme-less),
    * each consumed by the next `listStatus` of that directory.
    */
  private val staleListings =
    new ConcurrentHashMap[String, Array[FileStatus]]()

  /** Serve `statuses` (once) as the next `listStatus(dir)`, regardless
    * of the live state — the ingredient for list-after-delete lag: pass
    * a listing recorded before a mutation (or with ghost entries) and
    * the next reader sees yesterday's directory.
    */
  def serveListing(dir: Path, statuses: Array[FileStatus]): Unit =
    staleListings.put(dir.toUri.getPath, statuses)
}
