package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming ANN-index maintenance (SURVEY §2.10 × §2.7): drive
  * [[graft.ops.VectorOps.ivfAppend]] from a micro-batch vector stream —
  * the streaming sibling of the batch upsert the reference runs against
  * its vector index (utils/upload_data_to_pinecone.py:73-83), and the
  * closure of the last static/streaming asymmetry in the engine (every
  * other index/dedup op already has an incremental sibling).
  *
  * Shape: `foreachBatch` is the right tool, not a stateful operator —
  * the index IS the state, it lives in the partitioned parquet layout
  * (restarts free, same argument as [[EventStream.runStreamUpsert]]),
  * and each micro-batch's work is exactly the batch append: assign under
  * the FROZEN coarse quantizer, write only the batch's files into their
  * centroid directories. Because the quantizer is frozen and the append
  * is file-additive, the post-drain index is bit-identical to a batch
  * build over the same rows REGARDLESS of micro-batch boundaries or
  * order — which is what makes it value-oracle-able (q_stream_ivf).
  * At 100 TB/day the file source becomes a real bus; the per-batch plan
  * (one map-side assign + partitioned write, no shuffle) is unchanged.
  */
object IndexStream {

  /** Canonical file-source schema for staged embedding batches. */
  val embeddingsRawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Drain a directory of embedding parquet files as micro-batches
    * (AvailableNow, one file per trigger), appending each batch into the
    * written IVF index at `indexPath` under the frozen `centroids`.
    * Returns the number of micro-batches that ran.
    */
  /** Canonical file-source schema for staged tombstone batches. */
  val tombstoneRawSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType)))

  /** Drain a directory of tombstone-id parquet files as micro-batches
    * (AvailableNow, one file per trigger), committing each as a LOGICAL
    * delete version on the manifest-pinned index at `indexPath` —
    * the delete-side sibling of [[runStreamIvfAppend]], and the live
    * shape of a right-to-be-forgotten queue: each micro-batch costs one
    * id-sized sidecar write plus one manifest create, never a data-file
    * rewrite ([[graft.ops.VectorOps.commitDeletes]] folds the pending
    * tombstones forward, so the final version carries the union no
    * matter how the queue was batched). foreachBatch bodies run
    * sequentially on the stream thread, so version numbers never race.
    * Returns (nBatches, finalVersion).
    */
  def runStreamDeletes(spark: SparkSession, inputDir: String,
                       indexPath: String, fromVersion: Int,
                       queryName: String = "graft_stream_delete")
      : (Int, Int) = {
    val raw = spark.readStream
      .schema(tombstoneRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir)
    val version = new java.util.concurrent.atomic.AtomicInteger(fromVersion)
    val q = raw.writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val v = version.get
        graft.ops.VectorOps.commitDeletes(spark, indexPath, v, v + 1, batch)
        version.incrementAndGet(): Unit
      }
      .start()
    EventStream.awaitDrain(q)
    (version.get - fromVersion, version.get)
  }

  def runStreamIvfAppend(spark: SparkSession, inputDir: String,
                         centroids: Array[Array[Double]], indexPath: String,
                         queryName: String = "graft_stream_ivf"): Int = {
    val raw = spark.readStream
      .schema(embeddingsRawSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(inputDir)
    // counted on the stream thread (foreachBatch bodies run sequentially)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = raw.writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.ops.VectorOps.ivfAppend(batch, centroids, indexPath,
          "vec_id", "embedding")
        nBatches.incrementAndGet(): Unit
      }
      .start()
    EventStream.awaitDrain(q)
    nBatches.get
  }
}
