package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{DotProduct, NativeFunctions}
import graft.operators.Similarity

/** The custom codegen DotProduct expression: bit-equality with the
  * higher-order-function fold (codegen'd path via the registered function,
  * interpreted path via nullSafeEval), null on mismatched dimensions, and
  * NaN-ordering parity between TopKAggregator and SQL ranking.
  */
class NativeFunctionsSpec extends SparkSpec {

  import spark.implicits._

  test("dot_product == HOF fold bit-for-bit on real embeddings (codegen path)") {
    NativeFunctions.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val paired = e.as("a").crossJoin(e.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val diff = paired.select(
      Similarity.dot(col("a.v"), col("b.v")).as("native"),
      Similarity.dotHof(col("a.v"), col("b.v")).as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(diff.count() === 0)
  }

  test("interpreted path (nullSafeEval) matches and nulls mismatched dims") {
    def arr(xs: Double*) = Literal.create(ArrayData.toArrayData(xs.toArray),
      ArrayType(DoubleType))
    val e = DotProduct(arr(1.0, 2.0, 3.0), arr(4.0, 5.0, 6.0))
    assert(e.eval(null) === (4.0 + 10.0 + 18.0))
    val mismatched = DotProduct(arr(1.0, 2.0), arr(1.0, 2.0, 3.0))
    assert(mismatched.eval(null) === null)
  }

  test("mismatched dims are null through SQL too (= HOF zip_with semantics)") {
    NativeFunctions.register(spark)
    val df = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
    val out = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotHof(col("a"), col("b")).as("hof")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }

  test("hyperplane_signatures: fused loop bit-matches the per-plane dot_product form") {
    // real vectors, several (b, L) shapes incl. the adaptive ladder points
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(200)
    for ((b, l) <- Seq((4, 8), (8, 16), (5, 3))) {
      val signs = Similarity.hyperplaneSigns(spark, b * l, 0, 64)
      val perPlane = (0 until l).map { t =>
        Similarity.hyperplaneSignatureFrom(col("v"),
          signs.slice(t * b, (t + 1) * b))
      }
      val diff = e.select(
        NativeFunctions.hyperplaneSignatures(spark, col("v"), signs.flatten, b, l).as("fused"),
        array(perPlane: _*).as("per_plane"))
        .filter(col("fused") =!= col("per_plane"))
      assert(diff.count() === 0, s"signature mismatch at (b=$b, L=$l)")
    }
  }

  test("hyperplane_signatures: interpreted eval matches codegen; nulls on mismatch") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v")).limit(50)
    val signs = Similarity.hyperplaneSigns(spark, 12, 0, 64).flatten
    val viaCodegen = e.select(
      NativeFunctions.hyperplaneSignatures(spark, col("v"), signs, 4, 3).as("s"))
      .collect().map(_.getSeq[Long](0))
    val expr = graft.functions.HyperplaneSignatures(
      org.apache.spark.sql.catalyst.expressions.Literal.create(null,
        ArrayType(DoubleType)), Literal.create(null, ArrayType(DoubleType)), 4, 3)
    assert(expr.eval(null) === null) // null inputs -> null
    // wrong matrix length -> null row, not a crash
    val bad = e.select(NativeFunctions.hyperplaneSignatures(
      spark, col("v"), signs.take(100), 4, 3).as("s")).collect()
    assert(bad.forall(_.isNullAt(0)))
    assert(viaCodegen.nonEmpty && viaCodegen.forall(_.length == 3))
  }

  test("TopKAggregator ranks NaN first, matching SQL NaN-is-largest ordering") {
    val data = Seq((1L, 10L, 0.5), (1L, 11L, Double.NaN), (1L, 12L, 0.9))
      .toDF("query_id", "neighbor_id", "cosine")
    val topk = udaf(new Similarity.TopKAggregator(2),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Similarity.Scored]())
    val got = data.groupBy("query_id")
      .agg(topk(col("neighbor_id"), col("cosine")).as("n"))
      .select(explode(col("n.id")).as("id")).as[Long].collect().toSeq
    assert(got === Seq(11L, 12L)) // NaN first, then 0.9
  }
}
