package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke corpus builder (VERDICT r7 #5): derive an N×-scaled
  * documents/embeddings set from a driver-provided sf dir, preserving the
  * workload's SHAPE so heavy-family work metrics can be compared across a
  * true 10× step:
  *
  *  - `documents`: each source row becomes `factor` replicas with remapped
  *    ids and every token prefixed `r{rep}_`. Replica groups are therefore
  *    token-DISJOINT — shingles, minhash bands and Jaccard pairs never
  *    cross replicas — so the result behaves like `factor` independent
  *    shards of the same generator: dup fraction, per-source mix and
  *    doc-length distribution all stay constant while volume scales. (A
  *    verbatim copy would instead make every replica a dup of its siblings
  *    and grow pair counts quadratically in `factor` — a different
  *    workload, not a bigger one.) Pair-count linearity is spec-pinned
  *    (`ScaledCorpusSpec`).
  *  - `embeddings`: `factor` replicas with remapped ids and the vector
  *    cyclically shifted by `rep` positions. A shift is a coordinate
  *    permutation, so norms and INTRA-replica dot products are the same
  *    TERMS (summed in a different order — bit-equality is pinned only for
  *    the unshifted replica 0; other replicas are value-equal within float
  *    summation reorder); each replica carries sf-identical similarity
  *    structure, and cross-replica cosines decorrelate like random pairs at
  *    these dimensions.
  *
  * This is a measurement utility for SCALE.md's empirical scaling table,
  * not a pipeline operator: it runs once, writes parquet under the given
  * out dir (inside the repo's target/), and the bench is then pointed at
  * that dir with `SPARK_GRAFT_BENCH_ONLY`.
  */
object ScaledCorpus {

  /** `factor` token-disjoint replicas; ids remapped to `id*factor + rep`. */
  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    val rep = explode(sequence(lit(0), lit(factor - 1))).as("rep")
    docs
      .select(col("*"), rep)
      .select(
        (col("doc_id") * factor + col("rep")).as("doc_id"),
        array_join(
          transform(split(col("text"), " "),
            t => concat(lit("r"), col("rep"), lit("_"), t)), " ").as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  /** `factor` replicas, vector cyclically shifted by `rep`; ids remapped. */
  def scaleEmbeddings(embs: DataFrame, factor: Int): DataFrame = {
    val rep = explode(sequence(lit(0), lit(factor - 1))).as("rep")
    embs
      .select(col("*"), rep)
      .select(
        (col("vec_id") * factor + col("rep")).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          flatten(array(
            slice(col("embedding"), col("rep") + 1,
              size(col("embedding")) - col("rep")),
            slice(col("embedding"), lit(1), col("rep"))))).as("embedding"),
        col("label"))
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("target/scale10")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    scaleDocuments(spark.read.parquet(s"$src/documents.parquet"), factor)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    scaleEmbeddings(spark.read.parquet(s"$src/embeddings.parquet"), factor)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    println(s"""{"scaled":"$out","factor":$factor,"src":"$src"}""")
    spark.stop()
  }
}
