package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Carried-state discipline across every versioned writer (the shared
  * `CarriedKeys` list): a commit path that forgets a manifest-header
  * key silently resurrects deleted rows (`deletes`/`dv`) or dropped
  * columns (`coldrop`) — the exact bug class these tests pin shut.
  * Covers: DV survival through binpack compaction / full compaction /
  * MERGE / UPSERT (split-and-apply), DV fold-in on recluster and
  * applyDeletes, DDL carry through renames-after-drops, appends,
  * restores, and the all-rows-deleted metaAgg probe.
  */
class CarriedStateSpec extends SparkSpec {

  private def embs = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .filter(col("vec_id") =!= 0)

  /** IVF index at v1, returning (tmpDir, indexPath, centroids). */
  private def freshIndex(tag: String)
      : (java.nio.file.Path, String, Array[Array[Double]]) = {
    val idx = VectorOps.ivfIndexDeterministic(embs, "vec_id", "embedding", 4)
    val dir = java.nio.file.Files.createTempDirectory(s"carry_$tag")
    val path = dir.resolve("index").toString
    // 3 writer tasks → ~3 files per centroid dir, so compaction paths
    // have something to pack
    idx.assigned.repartition(3)
      .write.partitionBy("centroid").mode("overwrite").parquet(path)
    VectorOps.writeManifest(spark, path, 1,
      VectorOps.listIndexFiles(spark, path))
    (dir, path, idx.centroids)
  }

  /** Tiny synthetic (vec_id, x, centroid) table at v1 — for DDL-carry
    * probes where a second data column matters. */
  private def freshSynth(tag: String): (java.nio.file.Path, String) = {
    val dir = java.nio.file.Files.createTempDirectory(s"carrysyn_$tag")
    val path = dir.resolve("index").toString
    spark.createDataFrame((1L to 8L).map(i => (i, i * 10, (i % 2).toInt)))
      .toDF("vec_id", "x", "centroid")
      .repartition(2).write.partitionBy("centroid").parquet(path)
    VectorOps.writeManifest(spark, path, 1,
      VectorOps.listIndexFiles(spark, path))
    (dir, path)
  }

  private def rmrf(dir: java.nio.file.Path): Unit =
    Staging.deleteRecursively(dir)

  // DV confined to centroid=0 so other partitions stay packable
  private def dvPredCentroid0 = col("centroid") === 0 &&
    col("vec_id") % 3 === 0

  test("ivfCompactSmall on a DV-carrying version: positions are APPLIED " +
      "while packing (the Delta OPTIMIZE behavior) — rows gone from the " +
      "packed bytes themselves, pointer dropped when fully applied") {
    val (dir, path, _) = freshIndex("packdv")
    try {
      val (_, nDv) =
        VectorOps.commitDeletionVector(spark, path, 1, 2, dvPredCentroid0)
      assert(nDv > 0)
      val (bins, _, _, _) =
        VectorOps.ivfCompactSmall(spark, path, 2, 3, Long.MaxValue)
      assert(bins > 0)
      // everything packed → every DV entry applied → no pointer left
      val meta = VectorOps.readManifestMeta(spark, path, 3)
      assert(!meta.contains("dv") && !meta.contains("dvcount"))
      // gone PHYSICALLY — the raw pinned read, no subtraction at all
      assert(VectorOps.readIndexVersion(spark, path, 3)
        .filter(dvPredCentroid0).count() == 0)
      assert(VectorOps.readIndexVersion(spark, path, 3).count() ==
        embs.count() - nDv)
      // pinned v2 still serves the pre-purge bytes MoR-style
      assert(VectorOps.readIndexVersionDv(spark, path, 2).count() ==
        embs.count() - nDv)
    } finally rmrf(dir)
  }

  test("ivfCompactSmall with a DV file too big to pack: its entries " +
      "re-land in the new version's sidecar and stay subtracted") {
    val (dir, path, _) = freshIndex("packdvkeep")
    try {
      val (_, nDv) =
        VectorOps.commitDeletionVector(spark, path, 1, 2, dvPredCentroid0)
      // targetBytes below every file size → nothing packs, everything
      // re-lists → the pointer must carry verbatim
      val (bins, nFrom, nTo, _) =
        VectorOps.ivfCompactSmall(spark, path, 2, 3, 1L)
      assert(bins == 0 && nFrom == nTo)
      val meta = VectorOps.readManifestMeta(spark, path, 3)
      assert(meta.contains("dv") && meta.contains("dvcount"))
      assert(VectorOps.readIndexVersionDv(spark, path, 3).count() ==
        embs.count() - nDv)
    } finally rmrf(dir)
  }

  test("ivfCompactVersioned on a DV-carrying version: positions applied " +
      "in the rewritten partitions, remainder split correctly") {
    val (dir, path, _) = freshIndex("compdv")
    try {
      val (_, nDv) =
        VectorOps.commitDeletionVector(spark, path, 1, 2, dvPredCentroid0)
      val (rewritten, _, _) =
        VectorOps.ivfCompactVersioned(spark, path, 2, 3)
      assert(rewritten > 0)
      // all partitions were multi-file → DV fully applied, pointer gone
      val meta = VectorOps.readManifestMeta(spark, path, 3)
      assert(!meta.contains("dv") && !meta.contains("dvcount"))
      assert(VectorOps.readIndexVersion(spark, path, 3).count() ==
        embs.count() - nDv)
      assert(VectorOps.readIndexVersion(spark, path, 3)
        .filter(dvPredCentroid0).count() == 0)
    } finally rmrf(dir)
  }

  test("ivfMerge on a DV-carrying version: untouched-partition DV rows " +
      "stay deleted, counts exclude DV-hidden rows, an upsert of a " +
      "DV-hidden id resurrects it by intent") {
    val (dir, path, cents) = freshIndex("mergedv")
    try {
      val pred = col("vec_id") % 7 === 1
      val (_, nDv) = VectorOps.commitDeletionVector(spark, path, 1, 2, pred)
      val visibleIds = embs.filter(col("vec_id") % 7 === 2)
        .limit(3).select(col("vec_id")).collect().map(_.getLong(0))
      val hiddenId = embs.filter(pred).limit(1).head().getLong(0)
      val source = embs
        .filter(col("vec_id").isin(visibleIds :+ hiddenId: _*))
        .withColumn("embedding", transform(col("embedding"),
          x => -x)) // distinguishable replacement vectors
      val (_, nUpd, nDel, nIns) = VectorOps.ivfMerge(spark, path, 2, 3,
        source, lit(false), cents, "vec_id", "embedding")
      assert(nUpd == visibleIds.length,
        s"DV-hidden id must not count as updated: $nUpd")
      assert(nDel == 0 && nIns == 1)
      val v3 = VectorOps.readIndexVersionVisible(spark, path, 3, "vec_id")
      assert(v3.filter(col("vec_id") === hiddenId).count() == 1,
        "upserting a DV-hidden id resurrects it by intent")
      assert(v3.filter(pred).count() == 1, // only the resurrected one
        "every other DV-deleted row must stay deleted through the merge")
      assert(v3.count() == embs.count() - nDv + 1)
    } finally rmrf(dir)
  }

  test("ivfUpsert on a DV-carrying version: DV state survives the " +
      "rewrite, visible-replacement count excludes DV-hidden rows") {
    val (dir, path, cents) = freshIndex("upsdv")
    try {
      val pred = col("vec_id") % 7 === 1
      val (_, nDv) = VectorOps.commitDeletionVector(spark, path, 1, 2, pred)
      val upd = embs.filter(col("vec_id") % 7 === 3).limit(2)
      val (_, nReplaced, nStaged) =
        VectorOps.ivfUpsert(spark, path, 2, 3, upd, cents,
          "vec_id", "embedding")
      assert(nReplaced == 2 && nStaged == 2)
      val v3 = VectorOps.readIndexVersionVisible(spark, path, 3, "vec_id")
      assert(v3.filter(pred).count() == 0,
        "DV-deleted rows must stay deleted through the upsert")
      assert(v3.count() == embs.count() - nDv)
    } finally rmrf(dir)
  }

  test("reclusterVersioned folds the DV in physically: pointer dropped, " +
      "rows gone from the new files themselves") {
    val (dir, path, _) = freshIndex("recldv")
    try {
      val pred = col("vec_id") % 5 === 2
      val (_, nDv) = VectorOps.commitDeletionVector(spark, path, 1, 2, pred)
      VectorOps.reclusterVersioned(spark, path, 2, 3, "vec_id", 4)
      val meta = VectorOps.readManifestMeta(spark, path, 3)
      assert(!meta.contains("dv") && !meta.contains("dvcount"))
      // gone PHYSICALLY — the raw pinned read, no subtraction at all
      assert(VectorOps.readIndexVersion(spark, path, 3).count() ==
        embs.count() - nDv)
      assert(VectorOps.readIndexVersion(spark, path, 3)
        .filter(pred).count() == 0)
    } finally rmrf(dir)
  }

  test("applyDeletes folds BOTH kinds — id tombstones and DV positions " +
      "— with an exact physical row delta, DDL untouched") {
    val (dir, path, _) = freshIndex("applyboth")
    try {
      val tombIds = embs.filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"))
      VectorOps.commitDeletes(spark, path, 1, 2, tombIds)
      val pred = col("vec_id") % 7 === 1
      VectorOps.commitDeletionVector(spark, path, 2, 3, pred)
      // both pointers pending at v3 (the cross-carry this round added)
      val m3 = VectorOps.readManifestMeta(spark, path, 3)
      assert(m3.contains("deletes") && m3.contains("dv"))
      val (rewritten, nDeleted) =
        VectorOps.applyDeletes(spark, path, 3, 4, "vec_id")
      assert(rewritten > 0)
      val m4 = VectorOps.readManifestMeta(spark, path, 4)
      assert(!m4.contains("deletes") && !m4.contains("dv") &&
        !m4.contains("dvcount"))
      val survivors = embs
        .filter(!(col("vec_id") % 5 === 0) && !pred).count()
      assert(VectorOps.readIndexVersion(spark, path, 4).count() ==
        survivors)
      assert(nDeleted == embs.count() - survivors)
    } finally rmrf(dir)
  }

  test("rename AFTER drop carries coldrop; delete commits carry each " +
      "other's pointers; appends and restores carry everything") {
    val (dir, path) = freshSynth("ddl")
    try {
      // v2: drop x   v3: rename vec_id -> doc_id (the ADVICE ordering)
      VectorOps.dropColumns(spark, path, 1, 2, Seq("x"))
      VectorOps.renameColumns(spark, path, 2, 3, Map("vec_id" -> "doc_id"))
      assert(VectorOps.droppedColumns(spark, path, 3) == Seq("x"),
        "rename must not resurrect the dropped column")
      val logical = VectorOps.readIndexVersionLogical(spark, path, 3,
        "vec_id")
      assert(logical.columns.contains("doc_id") &&
        !logical.columns.contains("x"))
      // v4: DV delete — must keep colmap AND coldrop
      VectorOps.commitDeletionVector(spark, path, 3, 4,
        col("vec_id") === 3L)
      val m4 = VectorOps.readManifestMeta(spark, path, 4)
      assert(m4.contains("colmap") && m4.contains("coldrop"))
      // v5: tombstone delete — must keep the DV pointer
      VectorOps.commitDeletes(spark, path, 4, 5,
        spark.createDataFrame(Seq(Tuple1(5L))).toDF("vec_id"))
      val m5 = VectorOps.readManifestMeta(spark, path, 5)
      assert(m5.contains("dv") && m5.contains("dvcount") &&
        m5.contains("colmap") && m5.contains("coldrop"))
      assert(VectorOps.readIndexVersionLogical(spark, path, 5, "vec_id")
        .count() == 6) // 8 - DV'd id 3 - tombstoned id 5
      // v6: append — the OCC carry includes every key
      spark.createDataFrame(Seq((100L, 0, 0))).toDF("vec_id", "x", "centroid")
        .coalesce(1).write.parquet(s"$path/_staging/extra")
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val staged = fs.listStatus(
          new org.apache.hadoop.fs.Path(s"$path/_staging/extra"))
        .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
      fs.rename(staged,
        new org.apache.hadoop.fs.Path(s"$path/centroid=0/appended.parquet"))
      VectorOps.commitFilesOcc(spark, path,
        Seq("centroid=0/appended.parquet"))
      val m6 = VectorOps.readManifestMeta(spark, path, 6)
      assert(m6.contains("dv") && m6.contains("dvcount") &&
        m6.contains("deletes") && m6.contains("colmap") &&
        m6.contains("coldrop"))
      assert(VectorOps.readIndexVersionLogical(spark, path, 6, "vec_id")
        .count() == 7)
      // v7: restore to v4 — full logical state of v4, including its DV
      // and colmap, WITHOUT v5's tombstones
      VectorOps.restoreVersion(spark, path, 4)
      val m7 = VectorOps.readManifestMeta(spark, path, 7)
      assert(m7.contains("dv") && m7.contains("colmap") &&
        m7.contains("coldrop") && !m7.contains("deletes"))
      assert(VectorOps.readIndexVersionLogical(spark, path, 7, "vec_id")
        .count() == 7) // 8 - DV'd id 3
    } finally rmrf(dir)
  }

  test("indexChangeRows resolves tombstone preimages from the " +
      "pre-commit snapshot under the flag; the default stays image-free") {
    val (dir, path, _) = freshIndex("cdcpre")
    try {
      VectorOps.writeBloomFilter(spark, path, 1, "vec_id")
      val doomed = embs.filter(col("vec_id") % 9 === 4)
      VectorOps.commitDeletes(spark, path, 1, 2,
        doomed.select(col("vec_id")))
      val ch = VectorOps.indexChangeRows(spark, path, 1, 2,
        "vec_id", "embedding", resolveTombstonePreimages = true)
      val got = ch.filter(col("change_type") === "delete")
        .select(col("vid"), col("vec"))
      val expected = doomed.select(col("vec_id").as("vid"),
        col("embedding").cast("array<double>").as("vec"))
      assert(got.exceptAll(expected).unionByName(expected.exceptAll(got))
        .count() == 0, "every delete row must carry its true preimage")
      // the image-free default contract is unchanged
      val defCh = VectorOps.indexChangeRows(spark, path, 1, 2,
        "vec_id", "embedding")
      assert(defCh.filter(col("change_type") === "delete" &&
        col("vec").isNotNull).count() == 0)
    } finally rmrf(dir)
  }

  test("metaAgg on an all-rows-deleted version: explicit empty verdict, " +
      "never an NPE") {
    val (dir, path) = freshSynth("empty")
    try {
      VectorOps.commitDeletionVector(spark, path, 1, 2, lit(true))
      val m = VectorOps.metaAgg(spark, path, 2, "x", "vec_id")
      assert(m.empty && m.nRows == 0L && !m.servedFromMeta)
    } finally rmrf(dir)
  }

  test("vacuumLog reclaims dropped versions' DV sidecars and every " +
      "v-prefixed sidecar kind; kept pointers survive") {
    val (dir, path) = freshSynth("vac")
    try {
      VectorOps.commitDeletionVector(spark, path, 1, 2,
        col("vec_id") === 2L) // _dv/v2
      VectorOps.commitDeletionVector(spark, path, 2, 3,
        col("vec_id") === 4L) // _dv/v3 (cumulative); v2's sidecar droppable
      VectorOps.writeStringStats(spark, path, 1, "name")
      VectorOps.writeNdvSketch(spark, path, 1, "vec_id")
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      def exists(rel: String) =
        fs.exists(new org.apache.hadoop.fs.Path(s"$path/$rel"))
      assert(exists("_dv/v2") && exists("_dv/v3"))
      VectorOps.vacuumLog(spark, path, keepVersions = Seq(3))
      assert(!exists("_dv/v2"), "dropped version's DV sidecar must go")
      assert(exists("_dv/v3"), "kept manifest's DV pointer must survive")
      assert(!exists("_manifests/v00001.strstats") &&
        !exists("_manifests/v00001.ndv.vec_id"),
        "dropped versions' strstats/ndv sidecars must go")
      // the kept version still reads with its DV applied
      assert(VectorOps.readIndexVersionDv(spark, path, 3).count() == 6)
    } finally rmrf(dir)
  }

  test("physical rewrites refuse a manifest with external " +
      "(clone-inherited) entries — loud, never a silent mis-group") {
    val (srcDir, srcPath) = freshSynth("extsrc")
    val dstDir = java.nio.file.Files.createTempDirectory("carry_extdst")
    try {
      val dst = dstDir.resolve("clone").toString
      VectorOps.cloneIndex(spark, srcPath, dst, 1)
      val ex = intercept[IllegalArgumentException] {
        VectorOps.ivfCompactSmall(spark, dst, 1, 2, Long.MaxValue)
      }
      assert(ex.getMessage.contains("external"))
      intercept[IllegalArgumentException] {
        VectorOps.reclusterVersioned(spark, dst, 1, 2, "vec_id", 2)
      }
      intercept[IllegalArgumentException] {
        VectorOps.ivfCompactVersioned(spark, dst, 1, 2)
      }
      assert(!VectorOps.manifestExists(spark, dst, 2))
      // reads on the clone stay fine
      assert(VectorOps.readIndexVersionMor(spark, dst, 1, "vec_id")
        .count() == 8)
    } finally { rmrf(srcDir); rmrf(dstDir) }
  }

  test("localizeClone materializes inherited bytes and sidecars; " +
      "rewrites then work; the source stays untouched") {
    val (srcDir, srcPath) = freshSynth("locsrc")
    val dstDir = java.nio.file.Files.createTempDirectory("carry_locdst")
    try {
      // a DV on the source so the clone inherits an EXTERNAL dv pointer
      VectorOps.commitDeletionVector(spark, srcPath, 1, 2,
        col("vec_id") === 3L)
      val dst = dstDir.resolve("clone").toString
      VectorOps.cloneIndex(spark, srcPath, dst, 2)
      intercept[IllegalArgumentException] {
        VectorOps.ivfCompactVersioned(spark, dst, 1, 2)
      }
      val (copied, local) = VectorOps.localizeClone(spark, dst, 1, 2)
      assert(copied > 0 && local == 0)
      val m2 = VectorOps.readManifestMeta(spark, dst, 2)
      assert(m2("dv").startsWith("_dv/"),
        "the external DV pointer must localize")
      assert(VectorOps.readManifest(spark, dst, 2).forall(f =>
        !f.contains(":")), "every entry must be local after localize")
      // the deleted row stays deleted (names preserved → DV keys valid)
      assert(VectorOps.readIndexVersionDv(spark, dst, 2).count() == 7)
      // physical rewrites now work — and fold the DV per compaction rules
      val (rewritten, _, _) = VectorOps.ivfCompactVersioned(spark, dst, 2, 3)
      assert(VectorOps.readIndexVersionDv(spark, dst, 3).count() == 7)
      // the source is untouched: still serves its own version
      assert(VectorOps.readIndexVersionDv(spark, srcPath, 2).count() == 7)
    } finally { rmrf(srcDir); rmrf(dstDir) }
  }

  test("ivfCompactSmall crash retry: a leftover binpack file at the " +
      "deterministic destination is reclaimed, not a rename abort") {
    val (dir, path, _) = freshIndex("crash")
    try {
      // simulate a mid-compaction crash: the dst landed, v2 never did
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val parts = VectorOps.readManifest(spark, path, 1)
        .map(_.takeWhile(_ != '/')).distinct.sorted
      parts.foreach { p =>
        val out = fs.create(new org.apache.hadoop.fs.Path(
          s"$path/$p/binpack0-v2.parquet"), true)
        out.write(Array[Byte](0, 1, 2)); out.close()
      }
      val (bins, _, _, _) =
        VectorOps.ivfCompactSmall(spark, path, 1, 2, Long.MaxValue)
      assert(bins > 0)
      assert(VectorOps.readIndexVersionDv(spark, path, 2).count() ==
        embs.count(), "retry must serve the REWRITTEN bytes, not the stub")
    } finally rmrf(dir)
  }
}
