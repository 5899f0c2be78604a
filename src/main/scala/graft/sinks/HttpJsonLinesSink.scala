package graft.sinks

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, ForeachWriter}

/** Executor-side HTTP sink (SURVEY §2.1-S3 / §4.2 graduation): POSTs
  * newline-delimited JSON in bounded batches from the task that produced it —
  * no driver collect, no single-writer bottleneck, usable from BOTH batch
  * (`postJsonLines`, via `foreachPartition`) and Structured Streaming
  * (`foreachWriter`, via `writeStream.foreach`).
  *
  * Delivery contract: at-least-once (a retried task or micro-batch re-POSTs
  * its rows — the Spark sink contract). Every request carries
  * `X-Graft-Epoch` and `X-Graft-Partition` headers so an idempotent receiver
  * can deduplicate replays, which is the standard recipe for exactly-once
  * effects over an at-least-once channel.
  *
  * The conformance-scale FeatureCollection POST (one collected document per
  * run, exactly the reference's submit) stays in
  * [[FeatureCollectionSink.submit]]; this sink is the 100 TB path.
  */
object HttpJsonLinesSink {

  /** POST `body` to `endpoint`; throws on non-2xx (fail the task → Spark
    * retries → at-least-once). A fresh JDK client per call keeps the helper
    * dependency-free and serializable-safe; connection reuse, if it matters,
    * belongs in a pooled client behind the same signature.
    */
  private[sinks] def post(endpoint: String, body: String,
                          partitionId: Long, epochId: Long): Unit = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .header("Content-Type", "application/x-ndjson")
      .header("X-Graft-Epoch", epochId.toString)
      .header("X-Graft-Partition", partitionId.toString)
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val res = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() / 100 != 2)
      throw new RuntimeException(s"jsonl sink POST failed: HTTP ${res.statusCode()}")
  }

  /** Streaming writer: buffers up to `batchSize` rows per POST. Rows arrive
    * per (partition, epoch); `close` flushes the tail batch only on success —
    * on task failure nothing partial is finalized and Spark replays the
    * epoch's partition (at-least-once).
    */
  def foreachWriter(endpoint: String, batchSize: Int = 500): ForeachWriter[String] =
    new ForeachWriter[String] {
      @transient private var buf: mutable.ArrayBuffer[String] = _
      @transient private var partitionId: Long = _
      @transient private var epochId: Long = _
      override def open(partitionId: Long, epochId: Long): Boolean = {
        this.partitionId = partitionId
        this.epochId = epochId
        buf = new mutable.ArrayBuffer[String]
        true
      }
      override def process(value: String): Unit = {
        require(value != null, "jsonl sink: null row (one non-null JSON document per row)")
        buf += value
        if (buf.size >= batchSize) flush()
      }
      override def close(errorOrNull: Throwable): Unit =
        if (errorOrNull == null && buf != null && buf.nonEmpty) flush()
      private def flush(): Unit = {
        post(endpoint, buf.mkString("\n"), partitionId, epochId)
        buf.clear()
      }
    }

  /** Batch path: each partition POSTs its rows in `batchSize` groups from
    * the executor (epoch −1 marks non-streaming requests).
    */
  def postJsonLines(ds: Dataset[String], endpoint: String,
                    batchSize: Int = 500): Unit =
    ds.foreachPartition { it: Iterator[String] =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      it.grouped(batchSize).foreach { batch =>
        require(!batch.contains(null),
          "jsonl sink: null row (one non-null JSON document per row)")
        post(endpoint, batch.mkString("\n"), pid, -1L)
      }
    }
}
