package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.TextFunctions.{tokens, wordShingles}

/** The fresh-vs-corpus near-dup screen as a Structured Streaming query —
  * the d11 "daily ingest" story made literal: fresh documents ARRIVE as a
  * stream, the standing corpus is static, and each micro-batch emits the
  * arriving docs' near-dup pairs against the corpus.
  *
  * Streaming plan restrictions shape the design (joins are not allowed
  * AFTER a streaming aggregation), so every static join happens BEFORE the
  * single stateful operator:
  *
  *  - the fresh doc's own shingle-set size (`size_f`, one Jaccard
  *    denominator) is computed per-row from its `array_distinct` shingle
  *    array at projection time — no fresh-side aggregation exists at all;
  *  - the corpus side arrives pre-joined as (corpus_id, shingle, size_c),
  *    so the stream-static shingle join (stateless) carries the other
  *    denominator into the one streaming groupBy, where both sizes ride as
  *    grouping columns (each is functionally determined by its id);
  *  - `inter` is the only aggregated value; Jaccard + threshold are a
  *    stateless projection after the aggregation.
  *
  * State is O(distinct live (fresh, corpus) candidate pairs) — bucketed
  * candidate generation, never all-pairs, exactly like the batch screen.
  * With an AvailableNow one-shot run in complete mode the emission equals
  * [[graft.operators.Dedup.incrementalJaccardPairs]] on the same split,
  * which is what lets the d11 oracle grade the streaming plan verbatim
  * (e15) and the spec pin batch parity.
  */
object ScreenStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming read of the documents table (layout-tolerant — see
    * [[TableStream]]).
    */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    TableStream.read(spark, dir, "documents", docsSchema)

  /** Build the streaming screen plan. `freshDocs` is a STREAMING frame of
    * arriving documents; `corpusShingles` (`idCol`, shingle) and
    * `corpusSizes` (`idCol`, set_size) are static — a caller can hand the
    * [[graft.operators.Dedup.ShingleIndex]] tables straight in, making
    * this the streaming consumer of the standing index layout.
    */
  def screen(freshDocs: DataFrame, corpusShingles: DataFrame,
             corpusSizes: DataFrame, idCol: String, textCol: String,
             k: Int = 4, threshold: Double = 0.5): DataFrame = {
    val shF = freshDocs
      .select(col(idCol).as("fresh_id"),
        array_distinct(wordShingles(tokens(col(textCol)), k)).as("__sh"))
      .select(col("fresh_id"), size(col("__sh")).cast("long").as("size_f"),
        explode(col("__sh")).as("shingle"))
    val shC = corpusShingles.select(col(idCol).as("corpus_id"), col("shingle"))
      .join(corpusSizes.select(col(idCol).as("corpus_id"),
        col("set_size").as("size_c")), Seq("corpus_id"))
    shF.join(shC, Seq("shingle"))
      .groupBy("fresh_id", "corpus_id", "size_f", "size_c")
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter") / (col("size_f") + col("size_c") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("fresh_id", "corpus_id", "jaccard")
  }

  val embeddingsSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)),
    StructField("label", org.apache.spark.sql.types.IntegerType)))

  /** Streaming read of the embeddings table (same layout-tolerant shape
    * as [[readDocs]]).
    */
  def readEmbeddings(spark: SparkSession, dir: String): DataFrame =
    TableStream.read(spark, dir, "embeddings", embeddingsSchema)

  /** The EMBEDDING ingest screen as a Structured Streaming query — the
    * d15/d16 daily-ingest story live: fresh vectors ARRIVE as a stream and
    * screen against the standing [[graft.operators.Dedup
    * .EmbeddingSignatureIndex]] tables (static side). Same streaming-plan
    * shape as [[screen]]: every static join runs BEFORE the one stateful
    * operator —
    *
    *  - each arriving vector bands in-row via the fused
    *    `hyperplane_signatures` expression with the INDEX'S knob family
    *    (the index value carries it, so stream and standing side can never
    *    band differently), its own norm a per-row projection;
    *  - the (tbl, sig) candidate join and the corpus vector join-back are
    *    stream-static and stateless — the standing tables read through
    *    their bucket layout;
    *  - the exact-cosine verify is a stateless filter, and the one
    *    stateful operator is the final distinct-of-survivors (a groupBy on
    *    the verified pair — cosine rides as a grouping column since the
    *    pair determines it), state O(live VERIFIED pairs), strictly
    *    smaller than e15's candidate-pair state.
    *
    * An AvailableNow complete-mode run equals
    * [[graft.operators.Dedup.incrementalEmbeddingPairsIndexed]] on the
    * same split, so the d15 oracle grades the streaming plan verbatim
    * (e23).
    */
  def screenEmbeddings(freshVecs: DataFrame,
                       index: graft.operators.Dedup.EmbeddingSignatureIndex,
                       idCol: String, vecCol: String,
                       threshold: Double): DataFrame = {
    val spark = freshVecs.sparkSession
    graft.functions.NativeFunctions.register(spark)
    val allSigns = graft.operators.Similarity.hyperplaneSigns(spark,
      index.tables * index.planesPerTable, 0, index.dim)
    val banded = freshVecs
      .select(col(idCol).as("fresh_id"),
        col(vecCol).cast("array<double>").as("v_f"))
      .withColumn("n_f", graft.operators.Similarity.l2norm(col("v_f")))
      .select(col("fresh_id"), col("v_f"), col("n_f"),
        posexplode(graft.functions.NativeFunctions.hyperplaneSignatures(
          spark, col("v_f"), allSigns.flatten,
          index.planesPerTable, index.tables)).as(Seq("tbl", "sig")))
    banded
      .join(spark.table(index.signatures)
        .select(col(idCol).as("corpus_id"), col("tbl"), col("sig")),
        Seq("tbl", "sig"))
      .join(spark.table(index.vectors)
        .select(col(idCol).as("corpus_id"), col("v").as("v_c"),
          col("norm").as("n_c")), Seq("corpus_id"))
      .withColumn("cosine", graft.operators.Similarity.dot(col("v_f"), col("v_c"))
        / (col("n_f") * col("n_c")))
      .filter(col("cosine") >= threshold)
      .groupBy("fresh_id", "corpus_id", "cosine")
      .agg(count(lit(1)).as("__occurrences"))
      .select("fresh_id", "corpus_id", "cosine")
  }

  /** The MEDIA ingest screen as a Structured Streaming query — the
    * m09/m10 daily-ingest story live: fresh blobs ARRIVE as a stream and
    * screen against the standing [[graft.operators.Multimodal.ChunkIndex]]
    * tables. Same plan shape as [[screenEmbeddings]] — every static join
    * before the one stateful operator:
    *
    *  - each arriving blob digests, DEDUPS and sizes its chunk set IN ITS
    *    OWN ROW ([[graft.operators.Multimodal.inRowChunkDigests]] — all of
    *    a blob's chunks live in its row, so no distinct shuffle exists);
    *  - the digest probe join and the corpus-size join are stream-static
    *    and stateless, reading the bucketed tables;
    *  - the one stateful operator is the shared-chunk COUNT per
    *    (fresh, corpus) pair — state O(candidate pairs), each row a few
    *    longs.
    *
    * Emits (fresh_id, corpus_id, inter, sz_f, sz_c) — the serve step
    * computes the Jaccard cut batch-side over the materialized state, and
    * an AvailableNow complete-mode run then equals
    * [[graft.operators.Multimodal.incrementalChunkPairsIndexed]] on the
    * same split (the m09 oracle grades the streaming plan verbatim, e31).
    */
  def screenChunks(freshMedia: DataFrame,
                   index: graft.operators.Multimodal.ChunkIndex,
                   chunkBytes: Int = 64): DataFrame = {
    val spark = freshMedia.sparkSession
    val fresh = graft.operators.Multimodal
      .inRowChunkDigests(freshMedia, chunkBytes)
      .select(col("doc_id").as("fresh_id"), col("sz_f"),
        explode(col("digests")).as("digest"))
    fresh
      .join(spark.table(index.digests)
        .select(col("doc_id").as("corpus_id"), col("digest")), Seq("digest"))
      .join(spark.table(index.sizes)
        .select(col("doc_id").as("corpus_id"), col("sz_c")), Seq("corpus_id"))
      .groupBy("fresh_id", "corpus_id", "sz_f", "sz_c")
      .agg(count(lit(1)).as("inter"))
  }

  /** The GEAR content-defined chunk screen as a Structured Streaming query
    * — m12's daily-ingest shape live (e38), [[screenChunks]]'s CDC
    * counterpart: fresh blobs cut, digest, dedup and size their chunk sets
    * IN-ROW ([[graft.operators.Multimodal.inRowGearChunkDigests]] — all of
    * a blob's chunks live in its row, so no fresh-side shuffle exists),
    * the digest probe and corpus-size joins are stream-static and
    * stateless, and the one stateful operator is the shared-chunk COUNT
    * per (fresh, corpus) pair. Because gear boundaries re-synchronize
    * after an edit, a byte-SHIFTED arriving copy still pairs with its
    * standing original — live — which is exactly the case the fixed-size
    * streaming screen (e31) provably misses. Emits (fresh_id, corpus_id,
    * inter, sz_f, sz_c); the serve step applies the Jaccard cut
    * batch-side, and an AvailableNow complete-mode run then equals
    * [[graft.operators.Multimodal.incrementalGearChunkPairs]] on the same
    * split (the m14 oracle grades the streaming plan verbatim).
    */
  def screenGearChunks(freshMedia: DataFrame, corpusDigests: DataFrame,
                       corpusSizes: DataFrame, maskBits: Int = 6,
                       minSize: Int = 1,
                       maxSize: Int = Int.MaxValue): DataFrame = {
    val fresh = graft.operators.Multimodal
      .inRowGearChunkDigests(freshMedia, maskBits, minSize, maxSize)
      .select(col("doc_id").as("fresh_id"), col("sz_f"),
        explode(col("digests")).as("digest"))
    fresh
      .join(corpusDigests, Seq("digest"))
      .join(corpusSizes, Seq("corpus_id"))
      .groupBy("fresh_id", "corpus_id", "sz_f", "sz_c")
      .agg(count(lit(1)).as("inter"))
  }

  /** The MIH Hamming screen as a Structured Streaming query — s22's code
    * family serving live (e37): fresh vectors ARRIVE as a stream, band-code
    * in their own row (the same [[graft.operators.Similarity.mihCodeArray]]
    * expression the static side was coded with — one definition, stream and
    * corpus can never band differently), and probe the STANDING code table.
    * Same plan shape as [[screenEmbeddings]]:
    *
    *  - the band join is stream-static and stateless (corpus side is the
    *    [[graft.operators.Similarity.mihCodeBands]] layout);
    *  - Hamming + radius cut are one stateless integer projection — NO
    *    vector or norm ever joins (codes only, the screen's whole point);
    *  - the one stateful operator is the distinct-of-survivors groupBy
    *    (hamming rides as a grouping column — the pair determines it),
    *    state O(live pairs within radius), strictly smaller than e23's
    *    verified-pair state because the radius cut runs BEFORE the state.
    *
    * An AvailableNow complete-mode run equals
    * [[graft.operators.Similarity.mihHammingScreen]] on the same split, so
    * one oracle grades batch and stream verbatim.
    */
  def screenMih(freshVecs: DataFrame, corpusCodes: DataFrame,
                idCol: String, vecCol: String,
                signs: Array[Array[Double]], bands: Int, bandBits: Int,
                radius: Int): DataFrame = {
    import graft.operators.Similarity
    graft.functions.NativeFunctions.register(freshVecs.sparkSession)
    val banded = freshVecs
      .select(col(idCol).as("fresh_id"),
        Similarity.mihCodeArray(col(vecCol).cast("array<double>"), signs,
          bands, bandBits).as("f_code"))
      .select(col("fresh_id"), col("f_code"),
        posexplode(col("f_code")).as(Seq("band", "band_val")))
    banded
      .join(corpusCodes, Seq("band", "band_val"))
      .filter(col("fresh_id") =!= col("corpus_id"))
      .withColumn("hamming",
        Similarity.mihHamming(col("f_code"), col("c_code"), bands))
      .filter(col("hamming") <= radius)
      .groupBy("fresh_id", "corpus_id", "hamming")
      .agg(count(lit(1)).as("__occurrences"))
      .select("fresh_id", "corpus_id", "hamming")
  }
}
