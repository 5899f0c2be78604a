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
  * Self-defense against machine load, in two layers. (1) Per rep, the JVM's
  * GC time delta (`gc_ms`) and process CPU time delta (`cpu_ms`) from the
  * management beans. CAVEAT (learned round 5): `cpu_ms` is NOT load-proof —
  * on a contended host, cache thrash inflates cycles-per-instruction, so
  * process CPU itself inflated 13–47× (s12: 87–160s recorded vs 6.8s on an
  * idle host for identical code). `cpu_ms` distinguishes "JVM idle-waiting"
  * from "JVM executing", but cannot alone distinguish "engine burned CPU"
  * from "host thrashed the caches". (2) Therefore, per rep, two
  * engine-INDEPENDENT load signals: the 1-minute `/proc/loadavg` sampled at
  * rep start and end (`loadavg`), and a fixed-work single-threaded spin
  * probe (~60–120ms idle) timed immediately after the rep (`probe_ms`).
  * The probe does constant arithmetic work, so its wall time scales purely
  * with how much CPU the host is willing to give one thread —
  * `calibration_x` = probe_ms / (startup warm-min probe_ms) ≈ the host
  * contention factor. Top-level `"contended": true` is set when any rep's
  * factor exceeds 2× OR any loadavg sample exceeds 1.5× the worker thread
  * count. Raw `probe_baseline_ms` ships too, so a judge replica on an idle
  * host can also compare absolute probe times across runs (a contended
  * STARTUP would inflate the baseline and mask calibration_x — loadavg and
  * the absolute probe floor cover that case).
  *
  * Streaming queries additionally report `micro_batches` (per rep, via a
  * StreamingQueryListener progress count): their wall time includes a
  * per-micro-batch state-store commit floor (SCALE.md "single-node
  * artifacts"), and this field makes the fixed-vs-data cost split visible
  * in the artifact. Batch queries report 0.
  *
  * `SPARK_GRAFT_BENCH_ONLY` (comma-separated query names) re-measures a
  * subset in seconds instead of a full ~122-query run — dispute-resolution
  * path for a suspicious number. The artifact then carries
  * `"filter":"<list>"` and `"partial":true` so a filtered BENCH.json can
  * never masquerade as a full run.
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

  /** 1-minute load average from /proc/loadavg; -1.0 if unreadable. */
  private def loadAvg1(): Double =
    try Files.readString(Paths.get("/proc/loadavg")).split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  // JIT-elimination blackhole for the calibration probe.
  @volatile private var probeSink: Long = 0L

  /** Fixed-work single-thread spin: a constant number of xorshift64 steps.
    * Work is CONSTANT across reps and hosts, so wall time varies only with
    * the CPU share the host grants one thread — an engine-independent
    * contention gauge. ~60–120ms on an idle modern core.
    */
  private def probeMillis(): Double = {
    val t0 = System.nanoTime()
    var x = 0x9e3779b97f4a7c15L
    var i = 0
    val n = 60000000
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    probeSink = x
    (System.nanoTime() - t0) / 1e6
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // dispute-resolution filter: comma-list of query names; empty = all
    val only: Set[String] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // streaming progress counter: each completed micro-batch fires one
    // onQueryProgress; per-rep deltas give n_micro_batches per query
    val mbCounter = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = { mbCounter.incrementAndGet(); () }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
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
    // Probe baseline: warm the probe's JIT, then min of several runs. On an
    // idle host this is the idle floor; if startup itself is contended the
    // baseline inflates (masking calibration_x), which the absolute
    // probe_baseline_ms + loadavg fields expose instead.
    (0 until 3).foreach(_ => probeMillis())
    val probeBaseline = (0 until 5).map(_ => probeMillis()).min
    val failed = scala.collection.mutable.SortedSet[String]()
    // leak telemetry (VERDICT r3: checkpoint-style RDD blocks leaked across
    // queries invisibly): what each query leaves persisted after its last
    // rep, BEFORE the sweep — nonzero means retained state the next query
    // would have paid for
    val leftRdds = scala.collection.mutable.Map[String, Int]()
    val leftBytes = scala.collection.mutable.Map[String, Long]()
    val gcMs = scala.collection.mutable.Map[String, Seq[Long]]()
    val cpuMs = scala.collection.mutable.Map[String, Seq[Long]]()
    val loadAvgs = scala.collection.mutable.Map[String, Seq[Double]]()
    val probeMs = scala.collection.mutable.Map[String, Seq[Double]]()
    val microBatches = scala.collection.mutable.Map[String, Seq[Long]]()
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.isEmpty || only.contains(name)
    }
    val results: Map[String, Seq[Double]] = selected.map { case (name, fn) =>
      name -> (0 until reps).map { _ =>
        val (gc0, cpu0, mb0) = (gcMillis(), cpuMillis(), mbCounter.get())
        val load0 = loadAvg1()
        val t0 = System.nanoTime()
        // a failed query must NOT contribute a flattering time-to-failure:
        // record it so the artifact carries an explicit error list
        try { fn(spark, sfDir).count() } catch { case _: Throwable => failed += name }
        val sec = (System.nanoTime() - t0) / 1e9
        gcMs(name) = gcMs.getOrElse(name, Seq.empty) :+ (gcMillis() - gc0)
        cpuMs(name) = cpuMs.getOrElse(name, Seq.empty) :+
          (if (cpu0 < 0) -1L else cpuMillis() - cpu0)
        microBatches(name) = microBatches.getOrElse(name, Seq.empty) :+ (mbCounter.get() - mb0)
        // load signals AFTER the clock stops: the probe must not be counted
        // in the query's wall time, and end-of-rep loadavg reflects the load
        // the rep actually ran under (1-min EMA lags the start sample)
        loadAvgs(name) = loadAvgs.getOrElse(name, Seq.empty) ++ Seq(load0, loadAvg1())
        probeMs(name) = probeMs.getOrElse(name, Seq.empty) :+ probeMillis()
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
    def repsJson[T](m: scala.collection.Map[String, Seq[T]]): String =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => s"\"" + k + "\":" + v.mkString("[", ",", "]") }
        .mkString("{", ",", "}")
    val calX = probeMs.view.mapValues(_.map(p => p / probeBaseline)).toMap
    def fmtX(v: Double): String = f"$v%.2f"
    val calJson = calX.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v.map(fmtX).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val loadJson = loadAvgs.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v.map(fmtX).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val nThreads = cpus.toDouble
    val contended = calX.values.exists(_.exists(_ > 2.0)) ||
      loadAvgs.values.exists(_.exists(l => l > 1.5 * nThreads))
    val filterFields =
      if (only.isEmpty) "" else s""","filter":"${only.toSeq.sorted.mkString(",")}","partial":true"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"reps":$reps,"errors":$errs,"gc_ms":${repsJson(gcMs)},"cpu_ms":${repsJson(cpuMs)},"micro_batches":${repsJson(microBatches)},"loadavg":$loadJson,"probe_ms":${repsJson(probeMs.view.mapValues(_.map(p => f"$p%.1f")).toMap)},"probe_baseline_ms":${f"$probeBaseline%.1f"},"calibration_x":$calJson,"contended":$contended,"persistent_rdds":$rddsJson,"storage_bytes":$bytesJson,"sf":"$sfDir"$filterFields}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    try Files.writeString(Paths.get(out), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] file write failed: $e") }
    spark.stop()
  }
}
