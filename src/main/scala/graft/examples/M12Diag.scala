package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic for the m12 10× cost split (round 12). */
object M12Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val media = graft.queries.ExtensionQueries.shiftedMediaCorpus(spark, "target/scale10")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$tag: $n rows (${(System.nanoTime() - t0) / 1e9}%.1fs)")
    }
    time("media")(media.count())
    val chunks = graft.operators.Multimodal.gearChunks(media, maskBits = 6)
    time("gearChunks")(chunks.count())
    time("m12 full")(graft.operators.Multimodal.gearChunkJaccardPairs(media).count())
    // the pre-r11-fix shape: explode ends, then per-chunk substring+hex
    val ends = graft.functions.NativeFunctions.gearChunkEnds(
      spark, col("payload"), 6, 1, Int.MaxValue)
    val old = media.filter(octet_length(col("payload")) > 0)
      .select(col("doc_id"), col("payload"), ends.as("ends"))
      .select(col("doc_id"), col("payload"), col("ends"),
        posexplode(col("ends")).as(Seq("chunk_no", "en")))
      .withColumn("st", when(col("chunk_no") === 0, lit(1L))
        .otherwise(element_at(col("ends"), col("chunk_no")) + 1))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        hex(substring(col("payload"), col("st").cast("int"),
          (col("en") - col("st") + 1).cast("int"))).as("chunk_hex"))
    time("old shape chunks")(old.count())
    spark.stop()
  }
}
