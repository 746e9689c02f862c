package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.01", "0.1")) {
      val docs = spark.read.parquet(s"/root/testdata/sf$sf/documents.parquet")
      val bk = docs.select(col("doc_id"),
          explode(graft.ops.TextOps.lshBands(
            graft.ops.TextOps.minHashSignature(
              graft.ops.TextOps.shingles(col("text"), 3), 32), 16, 2)).as("bk"))
        .select(col("bk.band").as("band"), col("bk.bucket").as("bucket"))
        .groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
      println(s"sf$sf bucket size histo top:")
      bk.orderBy(col("n").desc).limit(8).collect().foreach(r => println("  " + r))
    }
    spark.stop()
  }
}
