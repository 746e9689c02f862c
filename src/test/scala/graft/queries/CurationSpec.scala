package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Engine-local invariants for the Curation registry batch — the
  * properties the value oracle can't see: kNN-join parity with a
  * window-based brute force, DSIR weight parity with an independent
  * driver-side model, CUSUM parity with the literal sequential
  * recurrence, and the physical-plan shapes the operators are designed
  * around.
  */
class CurationSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ kNN join

  test("q_knn_join equals the window-based brute force per probe") {
    val out = Curation.queries("q_knn_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty, "fixture must yield at least one probe")
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val probes = emb.filter(col("vec_id") % 97 === 1)
      .select(col("vec_id").as("probe_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val brute = emb.filter(col("vec_id") % 97 =!= 1).crossJoin(probes)
      .select(col("probe_id"), col("vec_id"),
        round(graft.ops.VectorOps.cosine(col("embedding"), col("qv")), 4)
          .as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .orderBy(col("probe_id"), col("rank"))
      .select(col("probe_id"), col("rank"), col("vec_id"), col("score"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == brute.toSeq,
      s"kNN aggregate must match the window brute force; " +
        s"first diff: ${out.toSeq.zip(brute.toSeq).find(p => p._1 != p._2)}")
  }

  test("kNN-join probe guard fails loudly past the broadcast bound") {
    val probes = spark.range(10).toDF("probe_id")
    val e = intercept[IllegalArgumentException] {
      Curation.requireProbeBound(probes, bound = 5L)
    }
    assert(e.getMessage.contains("q_knn_join") &&
      e.getMessage.contains("broadcast") &&
      e.getMessage.contains("q_knn_shuffled"),
      s"guard message must name the query and the broadcast layout: ${e.getMessage}")
    // under the bound it is silent — q_knn_join's real probe set passes
    Curation.requireProbeBound(probes, bound = 10L)
  }

  test("q_knn_join plans a broadcast join and the bounded top-k aggregate, no window") {
    val p = Curation.queries("q_knn_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "probe side must broadcast")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no shuffled or cartesian join")
    assert(!p.contains("Window"), "per-probe top-k must be the aggregate, not a window")
  }

  test("q_maxsim_batch equals a driver-side brute-force MaxSim per query bag") {
    val out = Curation.queries("q_maxsim_batch")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty, "fixture must yield at least one query bag")
    // independent algorithm: collect the fixture and fold MaxSim by hand
    val rows = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val qs = rows.filter(_._1 % 25 == 7)
      .map { case (id, v) => (id / 200, v) }.groupBy(_._1)
    val docs = rows.filter { case (id, _) => id >= 5 && id % 25 != 7 }
      .map { case (id, v) => (id / 8, v) }.groupBy(_._1)
    val brute = qs.toSeq.flatMap { case (qid, qtoks) =>
      docs.toSeq.map { case (did, dtoks) =>
        val ms = qtoks.map { case (_, qv) =>
          dtoks.map { case (_, dv) =>
            // HALF_UP away from zero — Spark/DuckDB round(x, 0) semantics
            // (math.round would round -0.5 toward +inf instead)
            BigDecimal(cos(dv, qv) * 1e6)
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          }.max
        }.sum
        (qid, did, ms)
      }.sortBy { case (_, did, ms) => (-ms, did) }.take(5).zipWithIndex
        .map { case ((q, d, ms), i) => (q, i + 1, d, ms) }
    }.sortBy { case (q, r, _, _) => (q, r) }
    assert(out.toSeq == brute,
      s"batched MaxSim must match the brute force; first diff: " +
        s"${out.toSeq.zip(brute).find(p => p._1 != p._2)}")
  }

  // ---------------------------------------------------------- DSIR weights

  test("q_dsir_weights equals an independent driver-side model (exact longs)") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def buckets(text: String): Seq[Int] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      text.trim.split("\\s+").toSeq.map { tok =>
        val hex = md.digest(tok.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val hexChars = "0123456789abcdef"
        (hexChars.indexOf(hex(0)) * 16 + hexChars.indexOf(hex(1))) % 64
      }
    }
    val perDoc = docs.map { case (id, lang, text) => (id, lang, buckets(text)) }
    val cr = new Array[Long](64); val ct = new Array[Long](64)
    perDoc.foreach { case (_, lang, bs) =>
      bs.foreach { b => cr(b) += 1; if (lang == "en") ct(b) += 1 }
    }
    val nr = cr.sum; val nt = ct.sum
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val lrMicro = Array.tabulate(64) { b =>
      halfUp((math.log((ct(b) + 1).toDouble / (nt + 64)) -
        math.log((cr(b) + 1).toDouble / (nr + 64))) * 1e6)
    }
    val expected = perDoc.map { case (id, lang, bs) =>
      (id, lang, bs.size.toLong, bs.map(b => lrMicro(b)).sum)
    }.sortBy { case (id, _, _, w) => (-w, id) }.take(20).toSeq
    val out = Curation.queries("q_dsir_weights")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(out == expected,
      s"first diff: ${out.zip(expected).find(p => p._1 != p._2)}")
  }

  test("q_dsir_weights ranks the target language up: top-20 majority is 'en'") {
    val out = Curation.queries("q_dsir_weights")(spark, sf).collect()
    val en = out.count(_.getString(1) == "en")
    assert(en * 2 > out.length,
      s"target-likeness must dominate the top-20: $en/${out.length} en")
  }

  // ------------------------------------------------------ temperature mix

  test("q_temperature_mix shares sum to ~1e6 and flatten the raw ratios") {
    val rows = Curation.queries("q_temperature_mix")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length >= 2, "fixture has multiple languages")
    val sum = rows.map(_._3).sum
    assert(math.abs(sum - 1000000L) <= rows.length,
      s"micro shares must sum to 1e6 ± rounding, got $sum")
    val byN = rows.sortBy(_._2)
    assert(byN.map(_._3).toSeq == byN.map(_._3).sorted.toSeq,
      "larger corpora must get larger shares (monotone in n)")
    val (lo, hi) = (byN.head, byN.last)
    val countRatio = hi._2.toDouble / lo._2
    val shareRatio = hi._3.toDouble / lo._3
    assert(shareRatio < countRatio,
      s"T=2 must FLATTEN the mixture: share ratio $shareRatio " +
        s"vs count ratio $countRatio")
  }

  // ---------------------------------------------------------------- CUSUM

  test("q_cusum equals the literal sequential recurrence per user") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_id"),
        col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    def halfUp(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    val expected = ev.groupBy(_._1).map { case (u, rows) =>
      val ds = rows.sortBy(r => (r._2, r._3))
        .map(r => halfUp(r._4 * 1e6) - 50000000L)
      var s = 0L; var maxS = 0L
      ds.foreach { d => s = math.max(0L, s + d); maxS = math.max(maxS, s) }
      (u, rows.length.toLong, maxS)
    }.toSeq.sortBy { case (u, _, m) => (-m, u) }.take(20)
    val out = Curation.queries("q_cusum")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected,
      s"closed form must equal the recurrence; first diff: " +
        s"${out.zip(expected).find(p => p._1 != p._2)}")
    assert(out.exists(_._3 > 0), "fixture must show some drift")
  }

  // ------------------------------------------------- cross-corpus near-dup

  test("q_cross_neardup equals the brute-force new×old join") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(graft.ops.TextOps.shingles(col("text"), 3)).as("sh"))
    val brute = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("id_new"), col("sh").as("sa"))
      .crossJoin(docs.filter(col("doc_id") % 4 =!= 0)
        .select(col("doc_id").as("id_old"), col("sh").as("sb")))
      .withColumn("jaccard",
        round(graft.ops.TextOps.jaccard(col("sa"), col("sb")), 4))
      .filter(col("jaccard") >= 0.5)
      .select(col("id_new"), col("id_old"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val out = Curation.queries("q_cross_neardup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == brute,
      s"banded cross join must be lossless at this banding: " +
        s"missing=${(brute -- out).take(5)} extra=${(out -- brute).take(5)}")
    assert(out.nonEmpty, "fixture must contain cross-slice near-duplicates")
  }

  // ---------------------------------------------------- rendezvous sharding

  test("q_consistent_shard: only the new shard's docs move (HRW theorem)") {
    val rows = Curation.queries("q_consistent_shard")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_._2).sum == total, "every doc gets exactly one shard")
    rows.foreach { case (shard, n, moved) =>
      if (shard == 8) assert(moved == n,
        s"every doc landing on the NEW shard moved: $moved of $n")
      else assert(moved == 0,
        s"rendezvous must not move docs between surviving shards: " +
          s"shard $shard moved $moved")
    }
    val newShardN = rows.find(_._1 == 8).map(_._2).getOrElse(0L)
    assert(newShardN > 0 && newShardN < total / 3,
      s"new shard takes ~1/9 of the corpus, got $newShardN/$total")
  }

  // --------------------------------------------------- quality-decile prune

  test("q_quality_prune: contiguous deciles, keep policy honored") {
    val rows = Curation.queries("q_quality_prune")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 10),
      "all ten deciles must be populated on the fixture")
    assert(rows.map(_._2).sum == Tables.documents(spark, sf).count())
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3,
        s"decile quality ranges must be non-decreasing: $lo vs $hi")
    case _ => ()
    }
    rows.filter(_._1 >= 8).foreach { case (d, n, _, _, kept) =>
      assert(kept == n, s"top deciles keep everything: decile $d kept $kept/$n")
    }
    val lowKept = rows.filter(_._1 <= 3).map(_._5).sum.toDouble /
      rows.filter(_._1 <= 3).map(_._2).sum
    assert(lowKept < 0.25, s"bottom deciles must be heavily pruned: $lowKept")
  }

  test("q_quality_prune plans no single-partition window") {
    val p = Curation.queries("q_quality_prune")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      "global decile must come from distributed tiling, not one partition")
  }

  // ------------------------------------------------ join-size estimation

  test("q_join_cardinality: overestimate theorem + within the CMS error bound") {
    val row = Curation.queries("q_join_cardinality")(spark, sf).head()
    val (est, exact) = (row.getLong(0), row.getLong(1))
    assert(row.getBoolean(2) && est >= exact,
      "CMS inner product must never underestimate")
    val na = Tables.events(spark, sf).count()
    val nb = Tables.orders(spark, sf).count()
    // depth-2 min beats Markov's per-row 2·NaNb/w bound w.p. ≥ 3/4; the
    // fixture is fixed, so this is a deterministic regression check
    assert(est - exact <= 2L * na * nb / 1024,
      s"estimate error ${est - exact} exceeds 2·Na·Nb/w = ${2L * na * nb / 1024}")
  }

  test("q_cusum windows stay partitioned by user (no SinglePartition window)") {
    val p = Curation.queries("q_cusum")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("SinglePartition"),
      "CUSUM windows must never collapse to one partition")
    assert(p.contains("TakeOrderedAndProject"), "final top-20 is a TakeOrdered")
  }

  test("budget-curve raw anchors (diagnostic: q_lsh_band_curve pair counts, " +
      "q_ivf_append raw recall) — printed so a future hash-gate red " +
      "diagnoses as fixture-drift vs regression without a rerun") {
    // q_lsh_band_curve gates on (mono_ok, n_pairs_full) and q_ivf_append
    // on threshold booleans — empirical anchors, not theorems (ADVICE r7).
    // The raw values behind them land in the test log on every `sbt test`.
    val docs = Tables.documents(spark, sf)
    val pairCounts = Seq(4, 8, 16).map { b =>
      b -> graft.ops.TextOps.minHashNearDups(docs, "doc_id", "text",
        shingleN = 3, k = 32, bands = b, threshold = 0.5).count()
    }
    info(s"lsh_band_curve raw pairs by band count: $pairCounts")
    assert(pairCounts.map(_._2) == pairCounts.map(_._2).sorted,
      "banded pair counts must be nondecreasing in the band count")

    val (path, cents) = Curation.stageIvfAppend(spark, sf)
    val qv = Registry.queryVec(spark, sf)
    val union = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
    val appended = graft.ops.VectorOps.ivfTopKFromPath(spark, path, cents,
      "vec_id", "embedding", qv, k = 10, nProbe = 7)
    val nHit = graft.ops.VectorOps
      .cosineTopK(union, "vec_id", "embedding", qv, 10)
      .join(appended.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .count()
    info(s"ivf_append raw recall: n_hit=$nHit/10 at nProbe=7 " +
      s"(gate asserts >= 8)")
    assert(nHit >= 8, s"ivf_append recall regressed: $nHit/10")
  }
}
