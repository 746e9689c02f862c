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

  /** Build-once per (key, JVM): `build` gets a fresh temp directory that
    * is deleted (recursively) at exit; its result is cached.
    */
  def cached[A](key: String)(build: java.nio.file.Path => A): A =
    cache.computeIfAbsent(key, { _ =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_stage")
      removeOnExit(tmp)
      build(tmp)
    }).asInstanceOf[A]

  private def removeOnExit(root: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    }))
}
