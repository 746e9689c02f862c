package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental skipping-sidecar maintenance: carried lines verbatim,
  * only the commit's added files harvested, committed bytes identical
  * to a from-scratch rebuild — on all three sidecar kinds, plus the
  * no-prior-sidecar fallback (a full build, honestly audited as one).
  */
class SidecarIncrementalSpec extends SparkSpec {

  /** (vec_id, name, centroid) table at v1, plus one appended file at
    * v2 — the minimal append-shaped manifest diff. */
  private def fixture(tag: String)
      : (java.nio.file.Path, String, Seq[String], Seq[String]) = {
    val dir = java.nio.file.Files.createTempDirectory(s"sideinc_$tag")
    val path = dir.resolve("index").toString
    spark.createDataFrame(
        (1L to 8L).map(i => (i, s"name_$i", (i % 2).toInt)))
      .toDF("vec_id", "name", "centroid")
      .repartition(2).write.partitionBy("centroid").parquet(path)
    VectorOps.writeManifest(spark, path, 1,
      VectorOps.listIndexFiles(spark, path))
    // land one extra file and commit v2 on top
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    spark.createDataFrame(Seq((100L, "zz_extra", 0)))
      .toDF("vec_id", "name", "centroid")
      .coalesce(1).write.parquet(s"$path/_staging/extra")
    val staged = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$path/_staging/extra"))
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.rename(staged,
      new org.apache.hadoop.fs.Path(s"$path/centroid=0/appended.parquet"))
    VectorOps.commitFilesOcc(spark, path, Seq("centroid=0/appended.parquet"))
    (dir, path, VectorOps.readManifest(spark, path, 1),
      VectorOps.readManifest(spark, path, 2))
  }

  private def rmrf(dir: java.nio.file.Path): Unit =
    Staging.deleteRecursively(dir)

  test("colstats: incremental v2 is byte-identical to a full rebuild, " +
      "harvesting only the appended file") {
    val (dir, path, f1, f2) = fixture("cs")
    try {
      VectorOps.writeColStats(spark, path, 1, "vec_id")
      val (carried, harvested) =
        VectorOps.writeColStatsIncremental(spark, path, 2, "vec_id")
      assert(carried == f1.length && harvested == f2.length - f1.length)
      assert(VectorOps.readSidecarLines(spark, path, "v00002.colstats").get
        == VectorOps.colStatsLines(spark, path, f2, Seq("vec_id")))
      // the refreshed zone map serves: the appended id prunes correctly
      val (rows, kept, total) =
        VectorOps.readIndexVersionPruned(spark, path, 2, "vec_id",
          100L, 200L)
      assert(rows.count() == 1 && kept < total)
    } finally rmrf(dir)
  }

  test("strstats: incremental v2 byte-identical, delta-only harvest, " +
      "prefix pruning serves the appended value") {
    val (dir, path, f1, f2) = fixture("ss")
    try {
      VectorOps.writeStringStats(spark, path, 1, "name")
      val (carried, harvested) =
        VectorOps.writeStringStatsIncremental(spark, path, 2, "name")
      assert(carried == f1.length && harvested == f2.length - f1.length)
      assert(VectorOps.readSidecarLines(spark, path, "v00002.strstats").get
        == VectorOps.stringStatsSidecarHeader(16) +:
          VectorOps.stringStatsLines(spark, path, f2, "name"))
      val (rows, kept, total) =
        VectorOps.readIndexVersionPrunedPrefix(spark, path, 2, "name", "zz_")
      assert(rows.count() == 1 && kept < total)
    } finally rmrf(dir)
  }

  test("bloom: no prior sidecar falls back to a full build (audited as " +
      "all-harvested); a second version then carries incrementally") {
    val (dir, path, f1, f2) = fixture("bl")
    try {
      // v2 has no earlier bloom sidecar — fallback builds it in full
      val (c0, h0) =
        VectorOps.writeBloomFilterIncremental(spark, path, 2, "vec_id")
      assert(c0 == 0 && h0 == f2.length)
      assert(VectorOps.readSidecarLines(spark, path,
          "v00002.bloom.vec_id").get
        == VectorOps.bloomSidecarHeader(0.001) +:
          VectorOps.bloomFilterLines(spark, path, f2, "vec_id"))
      // v3: a pure metadata commit (same files) — everything carries
      VectorOps.writeManifest(spark, path, 3, f2, Map("op" -> "noop"))
      val (c1, h1) =
        VectorOps.writeBloomFilterIncremental(spark, path, 3, "vec_id")
      assert(c1 == f2.length && h1 == 0)
      assert(VectorOps.readSidecarLines(spark, path,
          "v00003.bloom.vec_id").get
        == VectorOps.readSidecarLines(spark, path,
          "v00002.bloom.vec_id").get)
    } finally rmrf(dir)
  }

  test("readIndexVersionSemiDist: executor-side probe keeps exactly " +
      "the driver probe's file set, unprunable files included") {
    val (dir, path, _, f2) = fixture("dfp")
    try {
      VectorOps.writeBloomFilter(spark, path, 2, "vec_id")
      val keys = Seq(2L, 100L, 999L)
      val (_, keptDriver, totalD) =
        VectorOps.readIndexVersionSemi(spark, path, 2, "vec_id", keys)
      val dim = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
      val (rows, keptDist, totalX) =
        VectorOps.readIndexVersionSemiDist(spark, path, 2, "vec_id", dim)
      assert(keptDist == keptDriver && totalD == totalX)
      assert(rows.filter(col("vec_id").isin(keys: _*)).count() == 2)
      // a key set matching nothing keeps nothing
      val none = spark.createDataFrame(Seq(Tuple1(987654L))).toDF("k")
      val (_, keptNone, _) =
        VectorOps.readIndexVersionSemiDist(spark, path, 2, "vec_id", none)
      assert(keptNone.isEmpty)
    } finally rmrf(dir)
  }

  test("bloom: a DIFFERENT fpp than the carried sidecar's triggers a " +
      "full rebuild (ADVICE r12 — parameters ride the format header)") {
    val (dir, path, _, f2) = fixture("fpp")
    try {
      VectorOps.writeBloomFilter(spark, path, 1, "vec_id", fpp = 0.001)
      // requesting fpp 1e-6 must NOT carry 0.001-sized filters
      val (c, h) = VectorOps.writeBloomFilterIncremental(
        spark, path, 2, "vec_id", fpp = 1e-6)
      assert(c == 0 && h == f2.length)
      assert(VectorOps.readSidecarLines(spark, path,
          "v00002.bloom.vec_id").get
        == VectorOps.bloomSidecarHeader(1e-6) +:
          VectorOps.bloomFilterLines(spark, path, f2, "vec_id", 1e-6))
    } finally rmrf(dir)
  }

  test("bloom: a pre-header (v1-format) sidecar is REFUSED by readers " +
      "and rebuilt, never carried, by the incremental writer") {
    val (dir, path, _, f2) = fixture("v1fmt")
    try {
      // hand-write a headerless sidecar: unmixed-key-era format
      VectorOps.writeSidecar(spark, path, "v00001.bloom.vec_id",
        VectorOps.bloomFilterLines(spark, path, f2, "vec_id"))
      val ex = intercept[IllegalArgumentException] {
        VectorOps.readBloomFilter(spark, path, 1, "vec_id")
      }
      assert(ex.getMessage.contains("format header"))
      val (c, h) = VectorOps.writeBloomFilterIncremental(
        spark, path, 2, "vec_id")
      assert(c == 0 && h == f2.length) // rebuilt, not carried
      assert(VectorOps.readBloomFilter(spark, path, 2, "vec_id")
        .size == f2.length)
    } finally rmrf(dir)
  }

  test("strstats: a DIFFERENT truncateTo than the carried sidecar's " +
      "triggers a full rebuild") {
    val (dir, path, _, f2) = fixture("trunc")
    try {
      VectorOps.writeStringStats(spark, path, 1, "name", truncateTo = 16)
      val (c, h) = VectorOps.writeStringStatsIncremental(
        spark, path, 2, "name", truncateTo = 4)
      assert(c == 0 && h == f2.length)
      assert(VectorOps.readSidecarLines(spark, path, "v00002.strstats").get
        == VectorOps.stringStatsSidecarHeader(4) +:
          VectorOps.stringStatsLines(spark, path, f2, "name", 4))
      // the truncated bounds still serve prefix pruning
      val (rows, kept, total) =
        VectorOps.readIndexVersionPrunedPrefix(spark, path, 2, "name", "zz_")
      assert(rows.count() == 1 && kept < total)
    } finally rmrf(dir)
  }

  test("refreshSkippingSidecars: one call maintains all requested " +
      "sidecars at delta cost") {
    val (dir, path, f1, f2) = fixture("all")
    try {
      VectorOps.writeColStats(spark, path, 1, "vec_id")
      VectorOps.writeStringStats(spark, path, 1, "name")
      VectorOps.writeBloomFilter(spark, path, 1, "vec_id")
      val (carried, harvested) = VectorOps.refreshSkippingSidecars(
        spark, path, 2, zoneCols = Seq("vec_id"),
        bloomCols = Seq("vec_id"), strCols = Seq("name"))
      assert(carried == 3 * f1.length &&
        harvested == 3 * (f2.length - f1.length))
    } finally rmrf(dir)
  }
}
