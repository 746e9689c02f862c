package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unified commit-time CHECK enforcement: table-level constraints ride
  * the `checks` manifest header (a CarriedKeys member, so every writer
  * inherits them with no per-writer wiring) and EVERY versioned writer
  * validates exactly its new files pre-manifest — append, upsert,
  * merge, binpack compaction, full compaction, recluster. A refused
  * commit leaves no manifest and only unreferenced files.
  */
class ConstraintWritersSpec extends SparkSpec {

  private def embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .filter(col("vec_id") =!= 0)

  private def freshIndex(tag: String)
      : (java.nio.file.Path, String, Array[Array[Double]]) = {
    val idx = VectorOps.ivfIndexDeterministic(embs, "vec_id", "embedding", 4)
    val dir = java.nio.file.Files.createTempDirectory(s"chk_$tag")
    val path = dir.resolve("index").toString
    idx.assigned.repartition(2)
      .write.partitionBy("centroid").mode("overwrite").parquet(path)
    VectorOps.writeManifest(spark, path, 1,
      VectorOps.listIndexFiles(spark, path))
    VectorOps.setTableChecks(spark, path, 1, 2,
      Seq("id_positive" -> "vec_id > 0"))
    (dir, path, idx.centroids)
  }

  private def rmrf(dir: java.nio.file.Path): Unit =
    Staging.deleteRecursively(dir)

  private def negIds(df: org.apache.spark.sql.DataFrame) =
    df.limit(2).select((-col("vec_id")).as("vec_id"), col("embedding"))

  test("upsert: a violating staged batch is refused pre-manifest; a " +
      "valid one lands carrying the checks header") {
    val (dir, path, cents) = freshIndex("ups")
    try {
      val ex = intercept[IllegalStateException] {
        VectorOps.ivfUpsert(spark, path, 2, 3, negIds(embs), cents,
          "vec_id", "embedding")
      }
      assert(ex.getMessage.contains("id_positive"))
      assert(!VectorOps.manifestExists(spark, path, 3))
      VectorOps.ivfUpsert(spark, path, 2, 3, embs.limit(2), cents,
        "vec_id", "embedding")
      assert(VectorOps.readManifestMeta(spark, path, 3).contains("checks"))
    } finally rmrf(dir)
  }

  test("merge: a violating source is refused pre-manifest") {
    val (dir, path, cents) = freshIndex("mrg")
    try {
      val ex = intercept[IllegalStateException] {
        VectorOps.ivfMerge(spark, path, 2, 3, negIds(embs), lit(false),
          cents, "vec_id", "embedding")
      }
      assert(ex.getMessage.contains("id_positive"))
      assert(!VectorOps.manifestExists(spark, path, 3))
    } finally rmrf(dir)
  }

  test("append: commitFilesOcc enforces the head's checks on the " +
      "staged files") {
    val (dir, path, _) = freshIndex("app")
    try {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      negIds(embs).withColumn("centroid", lit(0))
        .coalesce(1).write.parquet(s"$path/_staging/bad")
      val staged = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$path/_staging/bad"))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      fs.rename(staged,
        new org.apache.hadoop.fs.Path(s"$path/centroid=0/bad.parquet"))
      val ex = intercept[IllegalStateException] {
        VectorOps.commitFilesOcc(spark, path, Seq("centroid=0/bad.parquet"))
      }
      assert(ex.getMessage.contains("id_positive"))
      assert(!VectorOps.manifestExists(spark, path, 3))
    } finally rmrf(dir)
  }

  test("append: an OCC retry RE-validates when the conflict-resolved " +
      "head carries a different checks header (ADVICE r12 — the commit " +
      "must never carry a header it did not enforce)") {
    val (dir, path, _) = freshIndex("occ")
    try {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def stage(name: String, df: org.apache.spark.sql.DataFrame): String = {
        df.withColumn("centroid", lit(0))
          .coalesce(1).write.parquet(s"$path/_staging/$name")
        val staged = fs.listStatus(
            new org.apache.hadoop.fs.Path(s"$path/_staging/$name"))
          .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
        fs.rename(staged,
          new org.apache.hadoop.fs.Path(s"$path/centroid=0/$name.parquet"))
        s"centroid=0/$name.parquet"
      }
      // assumeHead=1 validates at entry against v1 (NO checks yet); the
      // first create conflicts with the setcheck commit at v2, and the
      // retry resolves a head whose checks header differs — the staged
      // violation must be caught HERE, not carried silently
      val bad = stage("occbad", negIds(embs))
      val ex = intercept[IllegalStateException] {
        VectorOps.commitFilesOcc(spark, path, Seq(bad),
          assumeHead = Some(1))
      }
      assert(ex.getMessage.contains("id_positive") &&
        ex.getMessage.contains("post-conflict"))
      assert(!VectorOps.manifestExists(spark, path, 3))
      // a VALID batch through the same race revalidates and lands,
      // carrying the checks header it actually enforced
      val good = stage("occgood",
        embs.limit(2).select(col("vec_id"), col("embedding")))
      val c = VectorOps.commitFilesOcc(spark, path, Seq(good),
        assumeHead = Some(1))
      assert(c.version == 3 && c.attempts == 2)
      assert(VectorOps.readManifestMeta(spark, path, 3).contains("checks"))
    } finally rmrf(dir)
  }

  test("compaction and recluster enforce too: a check the existing " +
      "rows violate blocks every rewrite until it is unset " +
      "(enforce-on-write, the Delta model)") {
    val (dir, path, _) = freshIndex("cmp")
    try {
      // v3: a check the CORPUS violates — registering is metadata-only
      // (no history scan), but any rewrite must now refuse to re-commit
      // the violating rows
      VectorOps.setTableChecks(spark, path, 2, 3,
        Seq("impossible" -> "vec_id > 1000000"))
      intercept[IllegalStateException] {
        VectorOps.ivfCompactSmall(spark, path, 3, 4, Long.MaxValue)
      }
      intercept[IllegalStateException] {
        VectorOps.ivfCompactVersioned(spark, path, 3, 4)
      }
      intercept[IllegalStateException] {
        VectorOps.reclusterVersioned(spark, path, 3, 4, "vec_id", 2)
      }
      assert(!VectorOps.manifestExists(spark, path, 4))
      // unset → the same compaction lands
      VectorOps.setTableChecks(spark, path, 3, 4, Seq.empty)
      val (bins, _, _, _) =
        VectorOps.ivfCompactSmall(spark, path, 4, 5, Long.MaxValue)
      assert(bins > 0)
    } finally rmrf(dir)
  }
}
