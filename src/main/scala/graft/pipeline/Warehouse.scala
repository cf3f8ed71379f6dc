package graft.pipeline

import java.util.UUID

import scala.collection.mutable

import org.apache.spark.sql.SparkSession

/** Shared storage mechanics for the materialized backbones — the TEXT
  * side ([[Backbone]]: fingerprint/band/pair/label tables) and the
  * EMBEDDING side ([[VecBackbone]]: bucket/cell/code/centroid tables)
  * follow one storage discipline, factored here so the two cannot
  * drift:
  *
  *  - root: `graft.backbone.dir` if set (a warehouse path used AS-IS
  *    and REUSED across JVMs — committed state must be findable by the
  *    next night's JVM), else a per-JVM tmp scratch dir reclaimed on
  *    exit;
  *  - build-once: [[ensure]] guards each table path with an in-JVM memo
  *    backed by an on-disk `_graft_built` marker, so a warehouse root
  *    reuses state committed by previous JVMs and a crash mid-build
  *    (no marker) rebuilds over the partial output;
  *  - staleness: [[token]] keys every corpus-derived path by the source
  *    parquet's file-metadata version (count, bytes, max mtime) plus an
  *    md5 of the raw path (injectivity), so a data drop at the same
  *    path gets a fresh subtree instead of a stale marker hit;
  *  - instance keys: [[instanceId]] + [[instanceRoot]] for memo paths
  *    keyed by in-memory table INSTANCES — meaningless across JVMs, so
  *    they never participate in cross-JVM marker reuse.
  */
private[pipeline] object Warehouse {

  private val runId = UUID.randomUUID().toString.take(8)

  private def explicitDir: Option[String] = sys.props.get("graft.backbone.dir")

  def rootDir: String = explicitDir.getOrElse {
    val base = new java.io.File(sys.props("java.io.tmpdir"), "graft-backbone").getPath
    s"$base/$runId"
  }

  // derived data under the DEFAULT tmp base is scoped to this JVM run —
  // reclaim it on exit so repeated bench/test JVMs don't accumulate
  // corpus-scale parquet in /tmp until the disk fills. An explicit
  // `graft.backbone.dir` opts out: that's a warehouse path the operator
  // wants kept.
  locally {
    if (!sys.props.contains("graft.backbone.dir")) {
      val dir = new java.io.File(rootDir)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(dir)
      }, "graft-backbone-cleanup"))
    }
  }

  /** Root for INSTANCE-keyed memo paths. Instance identity is
    * meaningless across JVMs: a restarted JVM's first override instance
    * also gets id 1, so under a shared warehouse root it would resolve
    * to a path a PREVIOUS JVM committed for different in-memory inputs
    * and silently serve stale state through the `_graft_built` marker.
    * Instance-keyed paths therefore always live in a per-JVM subtree;
    * cross-JVM marker reuse is reserved for token-versioned
    * corpus-derived paths. (Default rootDir is already runId-scoped, so
    * no extra nesting there.) */
  def instanceRoot: String =
    if (explicitDir.isDefined) {
      val p = s"$rootDir/jvm_$runId"
      registerCleanup(p) // meaningless to any later JVM — reclaim on exit
      p
    } else rootDir

  // jvm_<runId> subtrees under an EXPLICIT warehouse root hold
  // instance-keyed state no later JVM can address (fresh runId, fresh
  // instance ids) — without cleanup every nightly-chain run would leave
  // corpus-scale parquet behind until the warehouse disk fills.
  private val cleanupRegistered = mutable.Set[String]()
  private def registerCleanup(path: String): Unit = synchronized {
    if (cleanupRegistered.add(path)) {
      val dir = new java.io.File(path)
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(dir)
      }, s"graft-warehouse-jvm-cleanup"))
    }
  }

  /** Lossy sanitize for USER-SUPPLIED tags only — never for corpus
    * dirs, whose token must be injective (see [[token]]). */
  def sanitize(t: String): String = t.replaceAll("[^A-Za-z0-9.]", "_")

  /** Corpus storage/memo token over `$d/$fileName`: readable sanitized
    * path + an md5 of the raw path (injectivity — `/a/my-corpus` and
    * `/a/my_corpus` must not share a subtree) + the parquet's
    * file-metadata version (count, total bytes, max mtime — a data drop
    * at the same path gets a fresh subtree instead of a stale memo
    * hit; this is what makes the warehouse root safe without per-JVM
    * scoping). One driver FS listing per accessor call — negligible
    * next to the query it guards. */
  def token(s: SparkSession, d: String, fileName: String): String = {
    import org.apache.hadoop.fs.{FileStatus, Path}
    val p = new Path(s"$d/$fileName")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    def walk(st: FileStatus): Seq[FileStatus] =
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
      else Seq(st)
    val files = walk(fs.getFileStatus(p))
    val ver = s"${files.length}_${files.map(_.getLen).sum}_" +
      s"${files.map(_.getModificationTime).max}"
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$d|$fileName|$ver".getBytes("UTF-8"))
      .take(5).map("%02x".format(_)).mkString
    s"${sanitize(d)}_$id"
  }

  /** Tables already confirmed built (paths) — per JVM, backed by the
    * on-disk `_graft_built` marker written when a build completes. */
  private val built = mutable.Set[String]()

  /** TEST HOOK: drop the in-JVM built memo so a spec can exercise the
    * cross-JVM path (the on-disk marker) without forking a JVM. */
  private[pipeline] def resetBuiltForTest(): Unit = synchronized {
    built.clear()
  }

  def ensure(s: SparkSession, path: String)(build: => Unit): Unit =
    synchronized {
      if (built.contains(path)) return
      val marker = new org.apache.hadoop.fs.Path(path, "_graft_built")
      val fs = marker.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (!fs.exists(marker)) {
        build
        fs.create(marker, true).close()
      }
      built += path
    }

  /** Stable per-JVM id for a DataFrame INSTANCE, used to key memo paths
    * by which in-memory table a caller passed. Not identityHashCode:
    * that is address-derived, so a collected object's hash can be
    * REUSED by a new one, turning a should-miss into a silent stale hit
    * of the first build's data. The IdentityHashMap pins a strong ref
    * per distinct instance — bounded by the handful of intakes a JVM
    * ever passes, and exact forever. */
  private val instanceIds = new java.util.IdentityHashMap[AnyRef, java.lang.Long]()
  private val instanceSeq = new java.util.concurrent.atomic.AtomicLong()
  def instanceId(o: AnyRef): Long = instanceIds.synchronized {
    val got = instanceIds.get(o)
    if (got != null) got.longValue
    else { val id = instanceSeq.incrementAndGet(); instanceIds.put(o, id); id }
  }
}
