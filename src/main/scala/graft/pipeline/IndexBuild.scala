package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Vector-index load path (SURVEY §3.2;
  * `utils/upload_data_to_pinecone.py:8-85`): rows → (id, embedding,
  * sparse metadata) → index table.
  *
  * The reference's per-batch embed+upsert with retry is external-sink
  * plumbing; in-engine the index IS a table: join the corpus to its
  * embeddings, shape the sparse metadata payload, write Parquet. A real
  * external sink would swap the write for `foreachPartition` with
  * `grouped(batchSize)` — the dataflow upstream is identical.
  */
object IndexBuild {

  /** Sparse metadata map per row: {column → string value}, null values
    * dropped (`upload_data_to_pinecone.py:16`, A6).
    */
  def sparseMetadata(df: DataFrame, cols: Seq[String]): DataFrame = {
    val names = array(cols.map(lit): _*)
    val values = array(cols.map(c => col(c).cast("string")): _*)
    df.withColumn("metadata",
      map_filter(map_from_arrays(names, values), (_, v) => v.isNotNull))
  }

  /** corpus ⋈ embeddings → (id, embedding, metadata). */
  def build(docs: DataFrame, embeddings: DataFrame,
            docId: String = "doc_id", vecId: String = "vec_id",
            metaCols: Seq[String] = Seq("lang", "source", "n_chars")): DataFrame = {
    sparseMetadata(docs, metaCols)
      .select(col(docId).as("id"), col("metadata"))
      .join(embeddings.select(col(vecId).as("id"), col("embedding")), Seq("id"))
  }

  def writeIndex(index: DataFrame, path: String): Unit =
    index.write.mode(SaveMode.Overwrite).parquet(path)
}
