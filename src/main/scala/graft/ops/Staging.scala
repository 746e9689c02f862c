package graft.ops

/** Per-process staging cache for fixture-derived inputs (stream input
  * dirs, duplicate-injected dirs, written indexes). One temp directory
  * per cache key per JVM — Bench runs every query several times; staging
  * must happen once, not per run — removed RECURSIVELY on JVM shutdown.
  * `File.deleteOnExit` can't remove non-empty directories, which is how
  * partitioned-write staging (nested per-partition dirs) would leak.
  */
object Staging {

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Any]()

  // ONE shutdown hook draining every staged root (one Thread per key
  // would pile up hooks and race each other); registered lazily on first
  // staging so library users who never stage pay nothing.
  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      var root = roots.poll()
      while (root != null) { deleteRecursively(root); root = roots.poll() }
    }))

  /** Build-once per (key, JVM): `build` gets a fresh temp directory that
    * is deleted (recursively) at exit; its result is cached.
    *
    * NOT `computeIfAbsent`: `build` runs Spark actions (collects, parquet
    * writes) that must never execute while holding a ConcurrentHashMap
    * bin lock — two concurrent callers whose keys share a hash bin would
    * serialize (or, if a build re-enters Staging, deadlock). Instead the
    * slow path races: both callers may build, `putIfAbsent` picks one
    * winner, and the loser's directory is released immediately. Duplicate
    * build work in the race window is bounded and harmless; a held lock
    * across a Spark job is not.
    */
  def cached[A](key: String)(build: java.nio.file.Path => A): A = {
    val hit = cache.get(key)
    if (hit != null) return hit.asInstanceOf[A]
    missLog.add(key)
    val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
    hookInstalled
    roots.add(tmp)
    val built = build(tmp)
    val prior = cache.putIfAbsent(key, built)
    if (prior != null) {
      // lost the race: drop this build's directory now rather than at exit
      roots.remove(tmp)
      deleteRecursively(tmp)
      prior.asInstanceOf[A]
    } else built
  }

  // Every key that took the build (miss) path, in arrival order — the
  // runtime side of the fixture-classification guard: Bench compares the
  // misses recorded AFTER warmup priming against the primed-fixture set
  // and warns loudly when a heavy stager paid its build inside a timed
  // rep (the r9/r10 watchdog failure mode).
  private val missLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Keys that missed the cache so far this JVM, in order. */
  private[graft] def missedKeys: Seq[String] = {
    import scala.jdk.CollectionConverters._
    missLog.iterator().asScala.toIndexedSeq
  }

  /** Best-effort recursive delete: the walk stream is closed (it holds a
    * directory handle), and a per-path failure — e.g. Spark's own
    * shutdown hooks still touching a file, which would otherwise throw
    * DirectoryNotEmptyException — skips that path instead of aborting
    * the remaining deletions.
    */
  private[graft] def deleteRecursively(root: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(root)) {
      val stream = java.nio.file.Files.walk(root)
      val paths =
        try stream.iterator().asScala.toSeq.reverse
        finally stream.close()
      paths.foreach { p =>
        try java.nio.file.Files.deleteIfExists(p)
        catch { case _: java.io.IOException => () }
      }
    }
  }
}
