package graft.queries

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class AugmentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("span corruption: sentinel-splice reconstructs the original text") {
    val rows = Augment.queries("q_span_corruption")(spark, sf).collect()
    assert(rows.nonEmpty)
    val originals = Tables.documents(spark, sf)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap
    rows.foreach { r =>
      val (id, corrupted, target, nSpans) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))
      val sentinels = (0L until nSpans).map(k => s"<extra_id_$k>")
      // every sentinel appears exactly once in the corrupted input and
      // once in the target, in order
      sentinels.foreach { sn =>
        assert(corrupted.split(" ").count(_ == sn) == 1, s"$id $sn corrupted")
        assert(target.split(" ").count(_ == sn) == 1, s"$id $sn target")
      }
      // splice the target spans back into the corrupted text → original
      val spans: Map[String, Seq[String]] =
        if (nSpans == 0) Map.empty
        else {
          val parts = target.split(" ").toSeq
          val idx = sentinels.map(parts.indexOf)
          sentinels.zipWithIndex.map { case (sn, i) =>
            val end = if (i + 1 < idx.length) idx(i + 1) else parts.length
            sn -> parts.slice(idx(i) + 1, end)
          }.toMap
        }
      val rebuilt = corrupted.split(" ").toSeq.flatMap(t =>
        spans.getOrElse(t, Seq(t)))
      assert(rebuilt == originals(id),
        s"doc $id splice mismatch:\n$rebuilt\n${originals(id)}")
    }
  }

  test("grouped auc: pairwise concordance replay per source") {
    val rows = Augment.queries("q_grouped_auc")(spark, sf).collect()
    assert(rows.length == 20)
    val sc = Evaluation.scoredForSpec(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")),
        "doc_id")
      .select(col("source"), col("label"), col("score_micro"))
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.getLong(2)))
      .groupBy(_._1)
    rows.foreach { r =>
      val xs = sc(r.getString(0))
      val pos = xs.filter(_._2).map(_._3)
      val neg = xs.filterNot(_._2).map(_._3)
      assert(r.getLong(1) == pos.length && r.getLong(2) == neg.length)
      if (pos.nonEmpty && neg.nonEmpty) {
        // U statistic in half-units: wins + ties/2
        val u2 = pos.map(p =>
          2L * neg.count(_ < p) + neg.count(_ == p)).sum
        val want = u2 * 1000000L / (2L * pos.length * neg.length)
        assert(r.getLong(3) == want,
          s"${r.getString(0)} auc ${r.getLong(3)} want $want")
      } else assert(r.isNullAt(3))
    }
  }

  test("prompt context: five ranked lines, scores descending") {
    val r = Augment.queries("q_prompt_context")(spark, sf).head()
    val prompt = r.getString(0)
    assert(r.getLong(1) == 5)
    assert(prompt.startsWith("Context:\n"))
    assert(prompt.endsWith("\nAnswer using only the context above."))
    val lines = prompt.split("\n").filter(_.matches("\\[\\d\\] .*"))
    assert(lines.length == 5)
    (1 to 5).zip(lines).foreach { case (i, l) =>
      assert(l.startsWith(s"[$i] ("), s"line $i: $l")
    }
    val bps = lines.map(l => l.substring(l.indexOf('(') + 1,
      l.indexOf(" bp")).toLong)
    assert(bps.zip(bps.tail).forall { case (a, b) => a >= b },
      s"scores not descending: ${bps.toSeq}")
  }

  test("source similarity: masks replay; jaccard bounds hold") {
    val rows = Augment.queries("q_source_similarity")(spark, sf).collect()
    assert(rows.length == 190) // C(20,2)
    val masks = Tables.documents(spark, sf)
      .select(col("source"), explode(split(trim(col("text")), "\\s+"))
        .as("tok"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues { ts =>
        ts.map(_._2).distinct.foldLeft(0L) { (m, t) =>
          val h = java.security.MessageDigest.getInstance("MD5")
            .digest(t.getBytes("UTF-8"))
          val hex = h.map("%02x".format(_)).mkString
          val b = (Integer.parseInt(hex.substring(0, 1), 16) * 16 +
            Integer.parseInt(hex.substring(1, 2), 16)) % 64
          m | (1L << b)
        }
      }.toMap
    rows.foreach { r =>
      val (a, b) = (masks(r.getString(0)), masks(r.getString(1)))
      val common = java.lang.Long.bitCount(a & b).toLong
      val union = java.lang.Long.bitCount(a | b).toLong
      assert(r.getLong(2) == common)
      assert(r.getLong(3) == common * 1000000L / union)
    }
  }
}
