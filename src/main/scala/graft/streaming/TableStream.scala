package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Layout-tolerant streaming read of a `<dir>/<table>.parquet` testdata
  * table. Two layouts exist in practice:
  *
  *   - the driver's testdata shape: `<table>.parquet` is a single FILE
  *     directly in the sf dir. `FileStreamSource` requires a directory,
  *     so the stream reads the sf DIR with a leaf-name glob filter;
  *   - the shape Spark itself writes (ScaledCorpus, any lake table):
  *     `<table>.parquet` is a DIRECTORY of `part-*.parquet` files. Here
  *     the glob-over-dir read is a silent ZERO-ROW stream — pathGlobFilter
  *     matches leaf file names, and no part file is named
  *     `<table>.parquet`. (r13 smoke audit: the first e39/e40 10× smoke
  *     "measured" an empty stream this way and came out 6× faster than
  *     1×.) The stream must read the table directory itself.
  *
  * Every streaming query resolves its source through here so a scaled or
  * lake-shaped corpus measures the same plan the sf dirs do. Layout
  * detection is a local-FS `isDirectory` probe — these entry points are
  * the test/bench harness surface (the driver's sf dirs and the repo's
  * scaled corpora are always local); a production deployment points the
  * stream at its real ingest directory and never resolves through a
  * table-in-sf-dir convention.
  */
object TableStream {

  /** Absolute path of the table under `dir`, and whether it is
    * directory-shaped. The probe goes through the Hadoop FileSystem of the
    * path's own scheme — a local-FS `File.isDirectory` would return false
    * for any `hdfs://`/`s3a://` URI and silently re-enter the
    * glob-over-dir zero-row trap this class exists to close.
    */
  private def resolve(spark: SparkSession, dir: String,
                      table: String): (String, Boolean) = {
    val path = s"$dir/$table.parquet"
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val isDir = try fs.getFileStatus(hp).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
    (path, isDir)
  }

  /** Streaming read with a DECLARED schema (the caller knows the table's
    * contract — no footer probe).
    */
  def read(spark: SparkSession, dir: String, table: String,
           schema: StructType): DataFrame = {
    val (path, isDir) = resolve(spark, dir, table)
    if (isDir) spark.readStream.schema(schema).parquet(path)
    else spark.readStream.schema(schema)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }

  /** Streaming read with the schema PROBED from the parquet footers
    * (metadata-only batch read, no data scan) — for tables whose physical
    * schema varies by sf dir (events' ts encoding, TPC-H column order).
    */
  def readProbed(spark: SparkSession, dir: String, table: String): DataFrame = {
    val (path, isDir) = resolve(spark, dir, table)
    val probed =
      if (isDir) spark.read.parquet(path).schema
      else spark.read.option("pathGlobFilter", s"$table.parquet")
        .parquet(dir).schema
    if (isDir) spark.readStream.schema(probed).parquet(path)
    else spark.readStream.schema(probed)
      .option("pathGlobFilter", s"$table.parquet").parquet(dir)
  }
}
