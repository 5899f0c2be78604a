package graft.examples

import org.apache.spark.sql.SparkSession

import graft.streaming.EventsStream

/** Runnable end-to-end streaming example: AvailableNow micro-batch over the
  * events fixture → watermarked 1-hour windowed aggregation → memory sink,
  * top rows printed. Usage: runMain graft.examples.StreamingDemo [sfDir]
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val windowed = EventsStream.windowedCounts(EventsStream.readEvents(spark, dir))
    EventsStream.runAvailableNow(windowed, "demo_windows", outputMode = "complete")
    val out = spark.table("demo_windows")
    println(s"=== streaming windowed agg: ${out.count()} (window x event_type) groups ===")
    out.orderBy("win", "event_type").show(8, truncate = false)
    spark.stop()
  }
}
