package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** String zone maps: prefix-upper-bound arithmetic on bytes, truncated
  * bound validity (prune never wrong under aggressive truncation), and
  * prefix pruning parity on a string-clustered layout.
  */
class StringStatsSpec extends SparkSpec {

  private def rmrf(dir: java.nio.file.Path): Unit =
    Staging.deleteRecursively(dir)

  test("prefixUpperBound: increment-and-drop-tail byte arithmetic") {
    def ub(s: Array[Byte]) = VectorOps.prefixUpperBound(s)
    assert(ub("abc".getBytes("UTF-8")).map(new String(_, "UTF-8"))
      .contains("abd"))
    // trailing 0xFF bytes drop; the last sub-0xFF byte increments
    assert(ub(Array('a'.toByte, 0xff.toByte, 0xff.toByte)).toSeq
      .map(_.toSeq) == Seq(Seq('b'.toByte)))
    // all-0xFF has no finite upper bound
    assert(ub(Array(0xff.toByte, 0xff.toByte)).isEmpty)
    // the bound is strictly above every string with the prefix
    val p = "sr".getBytes("UTF-8")
    val bound = ub(p).get
    for (s <- Seq("sr", "srÿÿ", "srzzzz", "sr"))
      assert(java.util.Arrays.compareUnsigned(
        s.getBytes("UTF-8"), bound) < 0, s"'$s' not under the bound")
  }

  private def stageByKey(tag: String, truncateTo: Int)
      : (java.nio.file.Path, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"strstats_$tag")
    val path = dir.resolve("t").toString
    val rows = (0 until 400).map { i =>
      // keys cluster into 4 contiguous byte ranges across 4 files; some
      // far longer than the truncation width
      val key = f"key_${"abcd".charAt(i / 100)}%c_${i % 100}%03d_padding_way_beyond_truncation"
      (i.toLong, key, i / 100)
    }
    spark.createDataFrame(rows).toDF("id", "k", "centroid")
      .repartition(1)
      .write.partitionBy("centroid").parquet(path)
    VectorOps.writeManifest(spark, path, 1,
      VectorOps.listIndexFiles(spark, path))
    VectorOps.writeStringStats(spark, path, 1, "k", truncateTo)
    (dir, path)
  }

  test("prefix pruning: parity with the exact filter, subset of files " +
      "opened, absent prefix opens zero files") {
    val (dir, path) = stageByKey("parity", truncateTo = 16)
    try {
      val (rows, kept, total) =
        VectorOps.readIndexVersionPrunedPrefix(spark, path, 1, "k", "key_b")
      assert(rows.count() == 100)
      assert(kept >= 1 && kept < total)
      val (absent, keptA, _) =
        VectorOps.readIndexVersionPrunedPrefix(spark, path, 1, "k", "zzz")
      assert(absent.count() == 0 && keptA == 0)
    } finally rmrf(dir)
  }

  test("aggressive truncation loosens bounds but never prunes wrongly: " +
      "a 4-byte sidecar still answers every probe exactly") {
    val (dir, path) = stageByKey("trunc", truncateTo = 4)
    try {
      // 4 bytes = "key_" on every file: bounds collapse to one range —
      // nothing prunable, everything correct
      for (p <- Seq("key_a", "key_c_05", "key_d")) {
        val (rows, kept, total) =
          VectorOps.readIndexVersionPrunedPrefix(spark, path, 1, "k", p)
        val expected = (0 until 400).count { i =>
          f"key_${"abcd".charAt(i / 100)}%c_${i % 100}%03d_padding_way_beyond_truncation"
            .startsWith(p)
        }
        assert(rows.count() == expected, s"probe '$p'")
        assert(kept == total, "4-byte bounds cannot separate key_ files")
      }
      // a probe OUTSIDE the shared 4-byte prefix still prunes to zero
      val (_, keptA, _) =
        VectorOps.readIndexVersionPrunedPrefix(spark, path, 1, "k", "kez")
      assert(keptA == 0)
    } finally rmrf(dir)
  }
}
