package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at
  * `SPARK_GRAFT_SF_DIR` and emits ONE machine-parseable JSON line.
  *
  * The line is BOTH printed to stdout and written to a file — sbt prefixes
  * log lines with `[info]`, which broke the driver's log-scrape parse in
  * round 1 (`BENCH_r01.json` → `parsed: null`), so the file is the durable
  * artifact: `SPARK_GRAFT_BENCH_OUT` if set, else `BENCH.json` in the cwd
  * (the repo root under `sbt run`).
  *
  * Each query is timed `reps` times (default 3 — round 4's official
  * artifact showed min-of-2 cannot reject a machine-load spike spanning
  * both reps) and the MIN is reported (the driver's 72.7s vs a local 29.5s
  * for identical code showed warmup/JIT noise is a third of a single-shot
  * number); all raw timings ship in `"runs"` so the variance stays visible.
  *
  * Self-defense against machine load: every rep also records the JVM's GC
  * time delta (`gc_ms`) and the process CPU time delta (`cpu_ms`) from the
  * management beans. A contended run is then diagnosable from the artifact
  * alone — wall time far above cpu_ms/threads with flat gc_ms means the
  * HOST was busy, not the engine (the r4 artifact overstated the total by
  * 56% with exactly that signature and nothing recorded to prove it).
  */
object Bench {
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
  }
  private def cpuMillis(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getProcessCpuTime / 1000000L
      case _ => -1L
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm shared machinery (parquet reader, codegen compiler, udaf path,
    // shuffle) on sf0.001 so per-query timings measure the query, not
    // whichever query happens to run first paying global JIT warmup.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) {
      try {
        SparkEntry.queries.get("q01_agg_pricing").foreach(_(spark, warmDir).count())
        SparkEntry.queries.get("s01_sim_topk_agg").foreach(_(spark, warmDir).count())
      } catch { case _: Throwable => () }
    }
    val failed = scala.collection.mutable.SortedSet[String]()
    // leak telemetry (VERDICT r3: checkpoint-style RDD blocks leaked across
    // queries invisibly): what each query leaves persisted after its last
    // rep, BEFORE the sweep — nonzero means retained state the next query
    // would have paid for
    val leftRdds = scala.collection.mutable.Map[String, Int]()
    val leftBytes = scala.collection.mutable.Map[String, Long]()
    val gcMs = scala.collection.mutable.Map[String, Seq[Long]]()
    val cpuMs = scala.collection.mutable.Map[String, Seq[Long]]()
    val results: Map[String, Seq[Double]] = SparkEntry.queries.map { case (name, fn) =>
      name -> (0 until reps).map { _ =>
        val (gc0, cpu0) = (gcMillis(), cpuMillis())
        val t0 = System.nanoTime()
        // a failed query must NOT contribute a flattering time-to-failure:
        // record it so the artifact carries an explicit error list
        try { fn(spark, sfDir).count() } catch { case _: Throwable => failed += name }
        val sec = (System.nanoTime() - t0) / 1e9
        gcMs(name) = gcMs.getOrElse(name, Seq.empty) :+ (gcMillis() - gc0)
        cpuMs(name) = cpuMs.getOrElse(name, Seq.empty) :+
          (if (cpu0 < 0) -1L else cpuMillis() - cpu0)
        val (nRdds, bytes) = SessionSweep.storageFootprint(spark)
        leftRdds(name) = nRdds
        leftBytes(name) = bytes
        // free persisted intermediates AFTER the clock stops — BOTH cache
        // layers (SQL catalog + RDD-level persists): queries are timed
        // including their own caching work but never pay for (or benefit
        // from) another query's leftovers. blocking=true so the drop
        // completes before the next clock starts.
        SessionSweep.sweep(spark, blocking = true)
        sec
      }
    }
    // a failed query's time-to-failure must not flow into best/total — the
    // errors array is the only place failures appear
    val best = results.view.filterKeys(!failed.contains(_)).mapValues(_.min).toMap
    val qs = best.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runs = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = if (best.nonEmpty) best.values.sum else 0.0
    val errs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val rddsJson = leftRdds.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val bytesJson = leftBytes.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    def repsJson(m: scala.collection.Map[String, Seq[Long]]): String =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
        .mkString("{", ",", "}")
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"reps":$reps,"errors":$errs,"gc_ms":${repsJson(gcMs)},"cpu_ms":${repsJson(cpuMs)},"persistent_rdds":$rddsJson,"storage_bytes":$bytesJson,"sf":"$sfDir"}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
