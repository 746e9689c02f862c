package graft.pipeline

import graft.SparkSpec
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class IndexSinkSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("index build joins corpus to embeddings with null-free sparse metadata") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val idx = IndexBuild.build(docs, embs)
    assert(idx.columns.toSet == Set("id", "metadata", "embedding"))
    assert(idx.count() == docs.join(embs, col("doc_id") === col("vec_id")).count())
    val m = idx.orderBy("id").head().getMap[String, String](1)
    assert(m.keySet == Set("lang", "source", "n_chars"))
  }

  test("sparse metadata drops null values") {
    val df = Seq((1L, Some("a"), None: Option[String])).toDF("id", "x", "y")
    val m = IndexBuild.sparseMetadata(df, Seq("x", "y"))
      .head().getMap[String, String](3)
    assert(m == Map("x" -> "a"))
  }

  test("writeIndex/writeCsv round-trip through the filesystem") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    IndexBuild.writeIndex(IndexBuild.build(docs, embs), s"$tmp/index")
    assert(spark.read.parquet(s"$tmp/index").count() > 0)
    FoodPipeline.writeCsv(docs.select("doc_id", "lang"), s"$tmp/csv")
    val back = spark.read.option("header", "true").csv(s"$tmp/csv")
    assert(back.count() == docs.count())
    assert(back.columns.toSeq == Seq("doc_id", "lang"))
  }

  test("IVF ANN finds planted near-neighbors") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.filter(col("vec_id") === 0).head().getSeq[Float](1)
    val rng = new scala.util.Random(11)
    val planted = (1 to 10).map { i =>
      (20000L + i, q.map(x => x * 0.95f + rng.nextGaussian().toFloat * 0.05f))
    }.toDF("vec_id", "embedding")
    val corpus = embs.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding")).union(planted)
    val idx = VectorOps.ivfIndex(corpus, "vec_id", "embedding", nCentroids = 16)
    val got = VectorOps.ivfTopK(idx, "vec_id", "embedding", q, k = 10)
      .collect().map(_.getLong(0)).toSet
    // planted cluster lands in one centroid; nProbe=3 must find it
    assert(got.count(_ > 20000L) >= 8, s"IVF recall too low: $got")
  }
}
