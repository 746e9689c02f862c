package graft.queries

import graft.{SparkSpec, Tables}
import graft.ops.{Graph, TextOps}
import org.apache.spark.sql.functions._

/** Engine-local invariants for the Mining registry batch — the
  * properties the value oracle can't see: prefix-filter losslessness
  * against the brute-force join, label-propagation convergence on a
  * known topology, projection determinism under repartitioning.
  */
class MiningSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("prefix-filtered similarity join equals the brute-force all-pairs join") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("ws"))
    val a = sets.select(col("doc_id").as("id_a"), col("ws").as("wa"))
    val b = sets.select(col("doc_id").as("id_b"), col("ws").as("wb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("inter"),
        size(array_union(col("wa"), col("wb"))).cast("long").as("uni"))
      .filter(col("inter") * 3 >= col("inter") + col("uni")) // 3i ≥ |A|+|B|
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val pref = Mining.queries("q_simjoin_prefix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(pref == brute, s"prefix filter must be lossless: " +
      s"missing=${(brute -- pref).take(5)} extra=${(pref -- brute).take(5)}")
    assert(pref.nonEmpty, "fixture must contain near-duplicate documents")
  }

  test("PPJoin length+positional filters shrink candidates without losing a true pair") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("ws"))
    def pairs(ppjoin: Boolean) = Mining.simjoinCandidates(sets, ppjoin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairs(ppjoin = false)
    val pruned = pairs(ppjoin = true)
    assert(pruned.subsetOf(plain), "PPJoin filters may only REMOVE candidates")
    assert(pruned.size < plain.size,
      s"filters must prune on this corpus: plain=${plain.size} ppjoin=${pruned.size}")
    val truePairs = Mining.queries("q_simjoin_prefix")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.subsetOf(pruned),
      s"lossless: true pairs missing from candidates: ${(truePairs -- pruned).take(5)}")
  }

  test("containment positional filter shrinks candidates without losing a true pair") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("ws"))
    def pairs(positional: Boolean) = Mining.containmentCandidates(sets, positional)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = pairs(positional = false)
    val pruned = pairs(positional = true)
    assert(pruned.subsetOf(plain), "the positional filter may only REMOVE candidates")
    assert(pruned.size < plain.size,
      s"filter must prune on this corpus: plain=${plain.size} positional=${pruned.size}")
    val truePairs = Mining.queries("q_containment_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truePairs.subsetOf(pruned),
      s"lossless: true pairs missing from candidates: ${(truePairs -- pruned).take(5)}")
  }

  test("containment join equals the brute-force all-pairs directed containment") {
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"),
        array_distinct(TextOps.shingles(col("text"), 3)).as("ws"))
    val a = sets.select(col("doc_id").as("id_a"), col("ws").as("wa"))
    val b = sets.select(col("doc_id").as("id_b"), col("ws").as("wb"))
    val brute = a.crossJoin(b).filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("wa"), col("wb"))).cast("long").as("inter"),
        size(col("wa")).cast("long").as("sz_a"))
      .filter(col("inter") * 5 >= col("sz_a") * 3) // C(A→B) ≥ 3/5
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val pref = Mining.queries("q_containment_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(pref == brute, s"probe-prefix containment must be lossless: " +
      s"missing=${(brute -- pref).take(5)} extra=${(pref -- brute).take(5)}")
    assert(pref.nonEmpty, "fixture must contain contained documents")
  }

  test("label propagation: two disjoint triangles converge to min-id communities") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
      .toDF("s", "d")
    val labels = Graph.labelPropagation(edges, "s", "d", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L), s"got $labels")
  }

  test("label propagation is partitioning-invariant (sync argmax is total-ordered)") {
    val li = Tables.lineitem(spark, sf).limit(2000)
    val e = li.select((col("l_orderkey") % 97).as("s"),
      ((col("l_partkey") * 31 + col("l_linenumber")) % 97).as("d"))
    def run(parts: Int) =
      Graph.labelPropagation(e.repartition(parts), "s", "d", iterations = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("random projection: deterministic under repartitioning, 16 components per vector") {
    val q = Mining.queries("q_random_projection")
    val base = q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val nVecs = base.keys.map(_._1).toSet.size
    assert(base.size == nVecs * 16, "every vector projects to exactly 16 components")
    val again = q(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(base == again)
  }

  test("k-core: K4 survives 3-core peeling, the pendant chain peels away") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node deg 3) + chain 1-5-6 (degs 1-2, peels
    // in cascade: 6 first, then 5)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (1L, 5L), (5L, 6L)).toDF("s", "d")
    val core = Graph.kCore(edges, "s", "d", k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"got $core")
  }

  test("feature hashing: per-doc bucket counts sum to the token count; buckets in [0,64)") {
    val tf = Mining.queries("q_feature_hash")(spark, sf)
    val byDoc = tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("total"), max(col("bucket")).as("mx"),
        min(col("bucket")).as("mn"))
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long")
        .as("n_tokens"))
    val joined = byDoc.join(toks, "doc_id")
      .select(col("total") === col("n_tokens"),
        col("mn") >= 0 && col("mx") < 64)
      .collect()
    assert(joined.nonEmpty && joined.forall(r => r.getBoolean(0) && r.getBoolean(1)))
  }

  test("cuped: variance-reduction fraction is a valid rho^2 and theta matches a recompute") {
    val row = Mining.queries("q_cuped")(spark, sf).collect().head
    val (n, theta, vr) = (row.getLong(0), row.getDouble(3), row.getDouble(4))
    assert(n > 0 && vr >= 0.0 && vr <= 1.0)
    // recompute theta from the per-user frame driver-side
    val cents = round(col("value") * 100).cast("long")
    val u = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(coalesce(sum(when(col("event_type") === "click", cents)), lit(0L)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase", cents)), lit(0L)).as("y"))
      .collect().map(r => (r.getLong(1).toDouble, r.getLong(2).toDouble))
    val nn = u.length.toDouble
    val sx = u.map(_._1).sum; val sy = u.map(_._2).sum
    val sxy = u.map(p => p._1 * p._2).sum; val sxx = u.map(p => p._1 * p._1).sum
    val ref = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    assert(math.abs(theta - ref) < 1e-9, s"theta=$theta ref=$ref")
  }

  test("stream upsert: the 4-micro-batch CDC merge equals the batch latest-per-key") {
    val streamed = Mining.queries("q_stream_upsert")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val ev = Tables.events(spark, sf)
    val batch = graft.ops.Dedup.latestPerKeyAgg(ev, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("event_id"), col("event_type"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("incremental aggregate merge equals the full recompute") {
    val inc = Mining.queries("q_ivm_agg")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val full = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("sum_cents"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(inc == full && inc.nonEmpty)
  }

  test("binned interval join equals the brute-force non-equi join") {
    val binned = Mining.queries("q_interval_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val usDay = 86400000000L
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
      .withColumn("day", expr(s"t div $usDay"))
    val sessions = ev.groupBy(col("user_id"), col("day"))
      .agg(min(col("t")).as("smin"), max(col("t")).as("smax"))
    val windows = sessions.select(col("day").as("wday")).distinct()
      .withColumn("w", explode(sequence(lit(0), lit(2))))
      .select(col("wday"), col("w"),
        (col("wday") * usDay + col("w") * 28800000000L).as("wstart"))
      .withColumn("wend", col("wstart") + 14400000000L)
    // NO day-bin equality on the reference side — only the raw overlap
    // predicate, so this detects a lossy binning (a binned join that
    // dropped cross-bin overlaps would diverge here, not just restate
    // its own predicate)
    val brute = sessions.crossJoin(windows)
      .filter(col("smin") <= col("wend") && col("smax") >= col("wstart"))
      .select(col("user_id"), col("wday").as("day"), col("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(binned == brute && binned.nonEmpty)
  }

  test("simhash Hamming join equals the brute-force all-pairs XOR (banding is lossless)") {
    val banded = Mining.queries("q_simhash_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hex = "0123456789abcdef"
    val pop = "0112122312232334"
    val sig = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.simHashMd5Hex(col("text")).as("sig"))
    def nib(c: org.apache.spark.sql.Column, i: Int) =
      instr(lit(hex), substring(c, i, 1)) - 1
    val dist = (1 to 16).map { i =>
      lit(pop).substr(
        nib(col("sa"), i).bitwiseXOR(nib(col("sb"), i)).cast("int") + 1,
        lit(1)).cast("int")
    }.reduce(_ + _)
    val brute = sig.select(col("doc_id").as("id_a"), col("sig").as("sa"))
      .crossJoin(sig.select(col("doc_id").as("id_b"), col("sig").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", dist).filter(col("dist") <= 3)
      .select(col("id_a"), col("id_b"), col("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded == brute && banded.nonEmpty,
      s"missing=${(brute -- banded).take(5)} extra=${(banded -- brute).take(5)}")
  }

  test("substring dedup matches a driver-side reference on the fixture") {
    // independent reference: same W-window duplicate marking + island
    // merge computed in plain Scala on the collected fixture (sf0.001 is
    // driver-sized by construction)
    val w = 15
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
    val grams = docs.flatMap { case (id, toks) =>
      if (toks.length < w) Seq.empty
      else toks.sliding(w).zipWithIndex.map { case (g, i) =>
        (id, i + 1L, g.mkString(" ")) }.toSeq
    }
    val dup = grams.groupBy(_._3).filter(_._2.length >= 2).keySet
    val hitsByDoc = grams.filter(g => dup(g._3))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val expected = docs.map { case (id, toks) =>
      val hits = hitsByDoc.getOrElse(id, Seq.empty)
      // islands as (start, lastPos, hits); a window at p merges into the
      // open island iff p <= lastPos + w (overlap or adjacency)
      var islands = List.empty[(Long, Long, Long)]
      hits.foreach { p =>
        islands match {
          case (s0, last, h0) :: rest if p <= last + w =>
            islands = (s0, p, h0 + 1) :: rest
          case _ => islands = (p, p, 1L) :: islands
        }
      }
      (id, toks.length.toLong, islands.length.toLong,
        islands.map(i => (i._2 + w) - i._1).sum, islands.map(_._3).sum)
    }.sortBy(_._1).toSeq
    val got = Mining.queries("q_substring_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected,
      s"first diff: ${got.zip(expected).find(p => p._1 != p._2)}")
    assert(got.exists(_._3 > 0), "fixture must contain duplicated substrings")
  }

  test("PQ ANN: rerank recovers exact top-10 with high recall; codes are 16 nibbles") {
    import graft.ops.VectorOps
    val base = Tables.embeddings(spark, sf).filter(col("vec_id") =!= 0)
    val qv = Tables.embeddings(spark, sf).filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    val model = VectorOps.pqTrain(base, "vec_id", "embedding",
      m = 16, dim = 64, k = 16, iters = 3)
    assert(model.m == 16 && model.k == 16 && model.dsub == 4)
    val codes = VectorOps.pqEncode(base, "vec_id", "embedding", model)
    val collected = codes.collect()
    assert(collected.forall(_.getSeq[Int](1).length == 16))
    assert(collected.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 16)))
    // deterministic: retrain + re-encode gives identical codes
    val model2 = VectorOps.pqTrain(base, "vec_id", "embedding",
      m = 16, dim = 64, k = 16, iters = 3)
    val codes2 = VectorOps.pqEncode(base, "vec_id", "embedding", model2)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(collected.forall(r => codes2(r.getLong(0)) == r.getSeq[Int](1)))
    // the registry query's recall boolean must hold
    val row = Mining.queries("q_ann_pq")(spark, sf).head()
    assert(row.getBoolean(3), "ADC shortlist + rerank must reach recall >= 0.8")
  }

  test("shipping priority: top-10, strictly ordered by revenue desc then orderkey") {
    val rows = Mining.queries("q_shipping_priority")(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(r => (r.getLong(3), r.getLong(0)))
    val sorted = revs.sortBy { case (rev, k) => (-rev, k) }.toSeq
    assert(revs.toSeq == sorted, "output must be (revenue desc, orderkey asc)")
    assert(revs.forall(_._1 > 0L))
  }
}
