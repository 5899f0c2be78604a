package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal, Similarity}
import graft.queries.Q.t
import graft.sources.BucketedLake

/** Crash-retry exactly-once contract for EVERY appended standing-index
  * family (VERDICT r19 #1 — the six unguarded appends: shingle, edit,
  * embedding-signature, IVF, MIH, chunk + gear). A fold that is retried
  * after a crash must never double-insert index rows: duplicated
  * shingle/size/code rows would inflate intersection counts and fan out
  * size joins on every later screen, silently (no oracle replays a
  * crashed fold — this spec is the contract's only witness).
  *
  * Per family, one parameterized grade pins both crash windows:
  *  (A) FULL REPLAY — the fold landed and its frontier was recorded, but
  *      the caller lost the acknowledgement and retries: the frontier
  *      gate makes the retry a no-op (row counts and screen output
  *      bit-identical to the single append);
  *  (B) LOST FRONTIER WRITE — the append landed but the crash hit before
  *      the catalog frontier write (the two are not atomic); simulated by
  *      rolling the property back, then retrying the fold: row presence
  *      at the fold's epoch is detected, the append is skipped, and the
  *      property is REPAIRED to the applied epoch.
  *
  * Both scenarios run through the same public append entry points with an
  * EXPLICIT fold epoch — the caller-supplied fold identity is what makes
  * exactly-once possible (the t49/d26 ledger contract, now generic in
  * [[BucketedLake.appendBucketedTableOnce]]).
  */
class AppendReplaySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  /** The parameterized grade: `appendFold` must append the SAME batch at
    * the SAME explicit epoch (1) on every call — that is what a retry of
    * one fold is. `tables` are every table the fold appends into.
    */
  private def gradeReplay(tables: Seq[String],
                          appendFold: () => Unit,
                          probe: () => DataFrame): Unit = {
    appendFold() // the one real application of the fold
    val counts1 = tables.map(n => spark.table(n).count())
    val r1 = probe().collect().toSeq
    assert(r1.nonEmpty,
      "the screen must return rows for the replay grade to mean anything")
    tables.foreach(n => assert(BucketedLake.frontier(spark, n) === Some(1L),
      s"$n frontier must record the applied fold"))
    // (A) full replay: fold applied AND recorded; caller retries anyway
    appendFold()
    assert(tables.map(n => spark.table(n).count()) === counts1,
      "a replayed fold must not re-append rows")
    assert(probe().collect().toSeq === r1,
      "screen output after a replayed fold must equal the single append")
    // (B) crash between append and frontier write: rows landed, property
    // didn't — roll the property back to simulate, then retry the fold
    tables.foreach(n => BucketedLake.setFrontier(spark, n, 0L))
    appendFold()
    assert(tables.map(n => spark.table(n).count()) === counts1,
      "a retry after a lost frontier write must detect the landed rows")
    assert(probe().collect().toSeq === r1,
      "screen output after the crash-window retry must equal the single append")
    tables.foreach(n => assert(BucketedLake.frontier(spark, n) === Some(1L),
      s"$n frontier must be repaired to the applied epoch"))
  }

  test("shingle index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val idx = Dedup.writeShingleIndex(docs.filter(col("doc_id") < 200),
      "doc_id", "text",
      Dedup.ShingleIndex(s"rspec_sh_$n", s"rspec_shsz_$n"))
    val batch = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
    gradeReplay(Seq(idx.shingles, idx.sizes),
      () => Dedup.appendShingleIndex(batch, idx, "doc_id", "text", epoch = 1L),
      () => Dedup.incrementalJaccardPairsIndexed(
        docs.filter(col("doc_id") >= 400), idx, "doc_id", "text")
        .orderBy("fresh_id", "corpus_id"))
  }

  test("embedding-signature index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val idx = Dedup.writeEmbeddingSignatureIndex(
      embs.filter(col("vec_id") % 8 =!= 0 && col("vec_id") % 8 <= 3),
      "vec_id", "embedding", s"rspec_emb_$n")
    val batch = embs.filter(col("vec_id") % 8 >= 4)
    gradeReplay(Seq(idx.signatures, idx.vectors),
      () => Dedup.appendEmbeddingSignatureIndex(batch, idx,
        "vec_id", "embedding", epoch = 1L),
      () => Dedup.incrementalEmbeddingPairsIndexed(
        embs.filter(col("vec_id") % 8 === 0), idx, "vec_id", "embedding", 0.4)
        .orderBy("fresh_id", "corpus_id"))
  }

  test("edit index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val en = t(spark, dir, "documents").filter(col("lang") === "en")
      .select(col("doc_id"), substring(col("text"), 1, 64).as("title"))
    val idx = Dedup.writeEditIndex(
      en.filter(pmod(col("doc_id"), lit(10)).between(1, 5)),
      "doc_id", "title", s"rspec_edit_$n")
    val batch = en.filter(pmod(col("doc_id"), lit(10)) >= 6)
    // fresh batch = near-dups BY CONSTRUCTION (the IndexCompactionSpec
    // fixture): sf0.001 is too small for organic edit-distance pairs
    val fresh = en.filter(pmod(col("doc_id"), lit(10)).between(1, 8))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("title"), lit("x")).as("title"))
    gradeReplay(Seq(idx.prefix, idx.shortPool, idx.strings),
      () => Dedup.appendEditIndex(batch, idx, "doc_id", "title", epoch = 1L),
      () => Dedup.incrementalEditDistancePairsIndexed(
        fresh, idx, "doc_id", "title")
        .orderBy("fresh_id", "corpus_id"))
  }

  test("IVF index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val idx = Similarity.writeIvfIndex(
      embs.filter(pmod(col("vec_id"), lit(4)) =!= 0),
      "vec_id", "embedding", s"rspec_ivf_$n")
    val batch = embs.filter(pmod(col("vec_id"), lit(4)) === 0)
    gradeReplay(Seq(idx.cells),
      () => Similarity.appendIvfIndex(batch, idx, "vec_id", "embedding",
        epoch = 1L),
      () => Similarity.ivfSearchIndexed(
        embs.filter(col("vec_id") < 10), idx, "vec_id", "embedding", 5)
        .orderBy("query_id", "rank"))
  }

  test("MIH index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val idx = Similarity.writeMihIndex(
      embs.filter(col("vec_id") % 8 =!= 0 && col("vec_id") % 8 <= 3),
      "vec_id", "embedding", s"rspec_mih_$n")
    val batch = embs.filter(col("vec_id") % 8 >= 4)
    gradeReplay(Seq(idx.codes),
      () => { Similarity.appendMihIndex(batch, idx, "vec_id", "embedding",
        epoch = 1L); () },
      () => Similarity.mihHammingScreenIndexed(
        embs.filter(col("vec_id") % 8 === 0), idx, "vec_id", "embedding",
        radius = 6)
        .orderBy("fresh_id", "corpus_id"))
  }

  test("gear chunk index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val media = graft.queries.ExtensionQueries.shiftedMediaCorpus(spark, dir)
    val standing = media.filter(col("doc_id") < 100000)
    val idx = Multimodal.writeGearChunkIndex(
      standing.filter(pmod(col("doc_id"), lit(2)) === 0),
      Multimodal.ChunkIndex(s"rspec_gear_d_$n", s"rspec_gear_s_$n"))
    val batch = standing.filter(pmod(col("doc_id"), lit(2)) === 1)
    gradeReplay(Seq(idx.digests, idx.sizes),
      () => { Multimodal.appendGearChunkIndex(batch, idx, epoch = 1L); () },
      () => Multimodal.incrementalGearChunkPairsIndexed(
        media.filter(col("doc_id") >= 100000), idx, threshold = 0.4)
        .orderBy("fresh_id", "corpus_id"))
  }

  test("fixed-chunk index: crash-replayed append == single append") {
    val n = System.nanoTime()
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    val idx = Multimodal.writeChunkIndex(
      media.filter(pmod(col("doc_id"), lit(10)).between(1, 5)),
      Multimodal.ChunkIndex(s"rspec_chunk_d_$n", s"rspec_chunk_s_$n"))
    val batch = media.filter(pmod(col("doc_id"), lit(10)) >= 6)
    // fixed-size chunking shares digests only on ALIGNED identical bytes —
    // the fresh side is corpus docs re-keyed verbatim, so every chunk hits
    val fresh = Multimodal.asMediaTable(
      docs.filter(col("doc_id") < 5 && pmod(col("doc_id"), lit(10)) >= 1)
        .select((col("doc_id") + 100000L).as("doc_id"), col("text")),
      "doc_id", "text")
    gradeReplay(Seq(idx.digests, idx.sizes),
      () => { Multimodal.appendChunkIndex(batch, idx, epoch = 1L); () },
      () => Multimodal.incrementalChunkPairsIndexed(fresh, idx)
        .orderBy("fresh_id", "corpus_id"))
  }
}
