package graft.ops

import graft.SparkSpec

/** The r5 contract for the staging cache (r4 postmortem: `computeIfAbsent`
  * held a ConcurrentHashMap bin lock across Spark actions — two concurrent
  * callers whose keys share a hash bin would serialize or deadlock, and a
  * deadlock there is indistinguishable from a bench stall): concurrent
  * builds for DIFFERENT keys must proceed independently, and each key must
  * build exactly once per JVM.
  */
class StagingSpec extends SparkSpec {

  test("concurrent two-key staging: builds overlap instead of serializing, no deadlock") {
    val tag = java.lang.Long.toHexString(System.nanoTime())
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // each build runs a real Spark action AND waits for its sibling at a
      // barrier INSIDE the build — under the old bin-lock design two keys
      // in one bin could never both be mid-build, so this would deadlock;
      // the barrier's own 20 s timeout fails fast instead of hanging CI
      def stage(key: String) = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = Staging.cached(s"spec_${tag}_$key") { dir =>
          spark.range(10).write.mode("overwrite")
            .parquet(dir.resolve("d").toString)
          gate.await(20, java.util.concurrent.TimeUnit.SECONDS)
          dir.toString
        }
      })
      val (a, b) = (stage("a"), stage("b"))
      val dirA = a.get(60, java.util.concurrent.TimeUnit.SECONDS)
      val dirB = b.get(60, java.util.concurrent.TimeUnit.SECONDS)
      assert(dirA != dirB)
      assert(spark.read.parquet(s"$dirA/d").count() == 10)
    } finally pool.shutdownNow()
  }

  test("cached builds once per key and returns the cached value on re-entry") {
    val key = "spec_once_" + java.lang.Long.toHexString(System.nanoTime())
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val first = Staging.cached(key) { dir => builds.incrementAndGet(); dir.toString }
    val second = Staging.cached(key) { dir => builds.incrementAndGet(); dir.toString }
    assert(first == second)
    assert(builds.get() == 1)
  }
}
