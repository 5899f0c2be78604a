package graft

import org.apache.spark.sql.SparkSession

/** Measurement companion to [[ScaledCorpus]] (VERDICT r7 #5): runs the
  * embedding-LSH dedup operator over a given corpus dir with an explicit
  * `planesPerTable`, and prints that run's load-independent work metrics as
  * one JSON line.
  *
  * Purpose: the fixed-knob 10× smoke showed d06's DEFAULT 4-bit tables go
  * quadratic in within-bucket pair work (shuffle ×90.8 for data ×10 — bucket
  * count is constant, so occupancy grows ∝N and pairs ∝N²). SCALE.md's
  * documented scale path is to grow bits-per-table with log₂(growth) so
  * expected bucket occupancy stays constant; this main is the instrument
  * that MEASURES that claim instead of asserting it (4 bits at 1× vs
  * 4+log₂(10)≈8 bits at 10× should land within a small factor of the 1×
  * shuffle volume, not 100×).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale10")
    // "exact" = all-pairs ground truth (cap raised for the measurement);
    // otherwise the arg is planesPerTable for the LSH path
    val exact = args.lift(1).contains("exact")
    val planesPerTable = if (exact) 0 else args.lift(1).map(_.toInt).getOrElse(8)
    val tables = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = new WorkMetricsListener
    spark.sparkContext.addSparkListener(work)

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
    val w0 = work.snapshot(spark.sparkContext)
    val t0 = System.nanoTime()
    val pairs =
      if (exact)
        graft.operators.Dedup.embeddingCosinePairs(
          vecs, "vec_id", "embedding", 0.4, crossCheckCap = 1000000L).count()
      else graft.operators.Dedup.embeddingCosinePairsLsh(
        vecs, "vec_id", "embedding", 0.4, planesPerTable, tables).count()
    val sec = (System.nanoTime() - t0) / 1e9
    val w = work.snapshot(spark.sparkContext) - w0
    SessionSweep.sweep(spark, blocking = true)
    spark.stop()
    println(f"""{"dir":"$dir","mode":"${if (exact) "exact" else "lsh"}","planes_per_table":$planesPerTable,"tables":$tables,"pairs":$pairs,"sec":$sec%.2f,"shuffle_read_bytes":${w.shuffleReadBytes},"shuffle_write_bytes":${w.shuffleWriteBytes},"spill_mem_bytes":${w.spillMemBytes},"spill_disk_bytes":${w.spillDiskBytes},"tasks":${w.tasks}}""")
  }
}
