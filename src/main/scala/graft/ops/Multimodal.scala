package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder-prompt scope extension): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extract / frame-sample as
  * partition-batched transforms.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeStub` derives a deterministic fake feature vector (a
  * normalized byte histogram) from the payload bytes. Everything around
  * it — schema, batch shape, partition-parallel execution, null
  * handling — is the real Spark plumbing a production codec would plug
  * into (the Scala analogue of a pandas-UDF/`mapInPandas` batch loop:
  * `mapPartitions` over an iterator, one JVM-side batch per partition).
  */
object Multimodal {

  /** Canonical media schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),      // image | audio | video
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("duration_ms", LongType))))))

  /** Deterministic fake decoder: 16-bin byte histogram, L1-normalized.
    * A real implementation replaces ONLY this function (e.g. JPEG decode →
    * pooled CNN features); the signature — bytes in, fixed-dim floats
    * out — is the contract.
    */
  def decodeStub(bytes: Array[Byte], dim: Int = 16): Array[Float] = {
    val hist = new Array[Float](dim)
    if (bytes != null && bytes.nonEmpty) {
      bytes.foreach { b => hist(((b & 0xFF) * dim) / 256) += 1f }
      val n = bytes.length.toFloat
      var i = 0
      while (i < dim) { hist(i) /= n; i += 1 }
    }
    hist
  }

  /** Partition-batched feature extraction over a binary column.
    * `mapPartitions` keeps per-partition setup (a real codec's native
    * context) amortized across the batch — the Scala shape of
    * `mapInPandas`.
    */
  def extractFeatures(df: DataFrame, idCol: String, contentCol: String,
                      dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType)),
      StructField("n_bytes", LongType)))
    val rdd = df.select(col(idCol).cast(LongType), col(contentCol)).rdd
      .mapPartitions { rows =>
        // per-partition setup happens here (codec init in a real system)
        rows.map { r =>
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(r.getLong(0),
            decodeStub(bytes, dim).toSeq,
            if (bytes == null) 0L else bytes.length.toLong)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sampling stub for video payloads: deterministic offsets into
    * the byte stream stand in for decoded frames — the partitioning and
    * explode shape are what a real frame sampler uses.
    */
  def sampleFrames(df: DataFrame, idCol: String, contentCol: String,
                   nFrames: Int = 4): DataFrame = {
    df.select(col(idCol), col(contentCol),
        length(col(contentCol)).as("n_bytes"))
      .withColumn("frame_idx", explode(sequence(lit(0), lit(nFrames - 1))))
      .withColumn("frame_offset",
        (col("frame_idx") * col("n_bytes") / nFrames).cast(LongType))
      .withColumn("frame_byte", // one sampled byte per "frame" (stub decode)
        col(contentCol).substr(col("frame_offset").cast("int") + 1, lit(1)))
      .drop(contentCol)
  }

  /** Resize stub: pools the stub feature histogram down to `outDim` bins
    * (adjacent-bin sums — mass-preserving, like area-averaging an image
    * down). A real implementation swaps the pooling for a pixel resample
    * over the decoded payload; the column contract — array in, smaller
    * array out, meta width/height updated — is what downstream sees.
    */
  def resizeFeatures(df: DataFrame, featuresCol: String, outDim: Int,
                     outCol: String = "features_resized"): DataFrame = {
    val inSize = size(col(featuresCol))
    // integer bin width; the LAST bin absorbs the remainder so every
    // source element is pooled exactly once (mass conservation holds for
    // any inSize >= outDim, not just exact multiples)
    val factor = floor(inSize / lit(outDim)).cast("int")
    df.withColumn(outCol,
      transform(sequence(lit(0), lit(outDim - 1)), b =>
        aggregate(
          slice(col(featuresCol), b * factor + 1,
            when(b === outDim - 1, inSize - factor * (outDim - 1))
              .otherwise(factor)),
          lit(0.0f), (acc, x) => acc + x)))
  }

  /** Adapter for tests/registry: fake a media table from documents (text
    * bytes as payload) so the plumbing is exercised without codecs.
    */
  def fromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      lit("image").as("modality"),
      col("text").cast(BinaryType).as("content"),
      struct(lit("fake").as("format"), lit(64).as("width"),
        lit(64).as("height"), lit(0L).as("duration_ms")).as("meta"))
}
