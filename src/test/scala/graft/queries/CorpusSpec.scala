package graft.queries

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

/** Specs for the corpus-pipeline queries that carry nontrivial local
  * logic: the Gopher repetition fold (checked against brute-force
  * counting — a third algorithm beside the fold and the oracle's
  * explode+GROUP BY) and keep-best dedup's cluster invariants.
  */
class CorpusSpec extends SparkSpec {
  import spark.implicits._

  test("gramRunStats sorted fold == brute-force gram counting on random docs") {
    val rnd = new scala.util.Random(7)
    // tiny vocabulary on purpose: dense collisions exercise run closing,
    // tie-breaks, and the <n-token single-gram fallback
    val docs = (0 until 80).map { i =>
      val n = rnd.nextInt(14) // includes 0- and 1-token docs
      (i.toLong, Seq.fill(n)("t" + rnd.nextInt(4)).mkString(" "))
    }
    def brute(text: String, n: Int): (Int, String, Long) = {
      val toks = text.trim.split("\\s+").toSeq
      val grams = if (toks.size < n) Seq(toks.mkString(" "))
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val cnt = grams.groupBy(identity).view.mapValues(_.size).toMap
      val best = cnt.toSeq.sortBy { case (g, c) => (-c, g) }.head
      val dup = cnt.collect { case (g, c) if c >= 2 => c.toLong * g.length }.sum
      (best._2, best._1, dup)
    }
    for (n <- Seq(2, 5)) {
      val got = docs.toDF("doc_id", "text")
        .select(col("doc_id"),
          Corpus.gramRunStats(TextOps.shingles(col("text"), n)).as("st"))
        .select(col("doc_id"), col("st.best"), col("st.bestg"), col("st.dup"))
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getString(2), r.getLong(3)))).toMap
      docs.foreach { case (id, text) =>
        assert(got(id) == brute(text, n), s"doc $id n=$n text='$text'")
      }
    }
  }

  test("q_gopher_rules: fractions in [0,1], flag consistent with thresholds") {
    val rows = Corpus.queries("q_gopher_rules")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val (t2, d5, pass) = (r.getDouble(1), r.getDouble(2), r.getBoolean(3))
      assert(t2 >= 0.0 && t2 <= 1.0 && d5 >= 0.0 && d5 <= 1.0, r.toString)
      assert(pass == (t2 <= 0.2 && d5 <= 0.15), r.toString)
    }
  }

  test("q_dedup_keep_best: kept doc is a member with max quality, clusters ≥ 2") {
    val sf = "/root/testdata/sf0.001"
    val out = Mining.queries("q_dedup_keep_best")(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute membership + quality independently of the query
    val docs = graft.Tables.documents(spark, sf)
    val pairs = TextOps.minHashNearDups(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.5)
    val clusters = graft.ops.Dedup
      .connectedComponentsAuto(pairs, "id_a", "id_b")
    val q = docs.select(col("doc_id"),
      TextOps.qualityPoints(col("text")).as("qp"))
    val members = clusters.join(q, col("id") === col("doc_id"))
      .select(col("cluster"), col("id"), col("qp"))
      .collect().groupBy(_.getLong(0))
    out.foreach { r =>
      val (cl, n, kept, keptQ) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))
      val mem = members(cl)
      assert(n == mem.length && n >= 2, r.toString)
      val maxQ = mem.map(_.getInt(2)).max
      assert(keptQ == maxQ, s"kept quality $keptQ != cluster max $maxQ")
      // kept = smallest id among max-quality members
      val want = mem.filter(_.getInt(2) == maxQ).map(_.getLong(1)).min
      assert(kept == want, s"kept $kept != argmax-tiebreak $want")
    }
  }
}
