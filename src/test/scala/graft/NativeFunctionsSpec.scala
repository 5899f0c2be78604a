package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.{DotProduct, NativeFunctions, NearestCentroid}
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

  test("nearest_centroid: fused argmax bit-matches the struct/array_max forest") {
    // the struct(sim, -ci)/array_max reference, in both divisor forms
    def reference(df: org.apache.spark.sql.DataFrame, cents: Array[Array[Double]],
                  useVnorm: Boolean): org.apache.spark.sql.Column = {
      val norms = cents.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
      val structs = cents.indices.map { ci =>
        val sim =
          if (!useVnorm && norms(ci) == 0.0) lit(Double.NegativeInfinity)
          else if (useVnorm)
            Similarity.dot(col("v"), lit(cents(ci))) / (col("v_norm") * lit(norms(ci)))
          else Similarity.dot(col("v"), lit(cents(ci))) / lit(norms(ci))
        struct(sim.as("sim"), lit(-ci).as("ncid"))
      }
      (-array_max(array(structs: _*)).getField("ncid")).cast("long")
    }
    val real = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("v"))
    // adversarial fixtures: a zero vector (cosine sims all NaN — NaN ranks
    // above all doubles in Spark's ordering), exact ties via duplicated
    // centroids (→ lowest ci), and a ragged-dim vector (null sims → ci 0)
    val weird = Seq(
      (9001L, Seq(0.0, 0.0, 0.0, 0.0)),
      (9002L, Seq(1.0, 2.0, 3.0, 4.0)),
      (9003L, Seq(-1.0, -2.0, 3.0, 4.0)),
      (9004L, Seq(1.0, 2.0)) // ragged
    ).toDF("id", "v").select(col("id"), col("v").cast("array<double>").as("v"))
    val centsReal = Similarity.kmeansCentroids(real, "id", "v", 7, 1)
    val centsWeird = Array(
      Array(1.0, 0.0, 0.0, 0.0),
      Array(0.0, 0.0, 0.0, 0.0), // zero-norm centroid (degenerate seed)
      Array(1.0, 0.0, 0.0, 0.0), // duplicate of ci 0 → tie
      Array(0.0, 1.0, 0.0, 0.0))
    // reference-comparable cases: the real corpus (both modes — no
    // degenerate norms) and the weird fixture in iteration mode (its
    // zero-norm guard predates the division). The weird fixture in cosine
    // mode is NOT reference-comparable: under Spark 4's default ANSI mode
    // the struct form THROWS DIVIDE_BY_ZERO on a zero norm, while the
    // fused loop keeps IEEE semantics (NaN/∞) — which is what the DuckDB
    // oracle computes too. Those cases are pinned explicitly below.
    for ((df, cents, useVnorm) <- Seq(
      (real, centsReal, true), (real, centsReal, false), (weird, centsWeird, false))) {
      val norms = cents.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
      val withNorm = df.withColumn("v_norm", Similarity.l2norm(col("v")))
      val diff = withNorm.select(
        NativeFunctions.nearestCentroid(spark, col("v"), cents.flatten, norms,
          useVnorm).as("fused"),
        reference(withNorm, cents, useVnorm).as("ref"))
        .filter(col("fused") =!= col("ref") ||
          col("fused").isNull =!= col("ref").isNull)
      assert(diff.count() === 0, s"argmax drift (useVnorm=$useVnorm)")
    }
    // degenerate cosine semantics, pinned: IEEE division like the oracle —
    // a zero vnorm makes every sim NaN (ties → ci 0); an un-guarded
    // zero-norm CENTROID yields 0/0 = NaN which ranks above every real sim
    // (the documented degenerate-seed hazard — training goes through the
    // guarded iteration form, so this arises only from a genuinely
    // zero-mean cluster); a ragged vector nulls every sim → ci 0.
    val normsW = centsWeird.map(c => math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))
    val got = weird.select(col("id"),
      NativeFunctions.nearestCentroid(spark, col("v"), centsWeird.flatten,
        normsW, useVnorm = true).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(9001L -> 0L, 9002L -> 1L, 9003L -> 1L, 9004L -> 0L))
  }

  test("nearest_centroid nulls a centroid's sim on null norm/component, never unboxes 0.0") {
    // null elements in the SQL-exposed centroid/norm arrays used to flow
    // through getDouble as a silent 0.0 (ADVICE r9); now they null that
    // centroid's sim — it ranks below every real sim, like a null dot
    NativeFunctions.nearestCentroid(spark, col("v"), Array(1.0), Array(1.0),
      useVnorm = true) // registers both SQL names
    // centroid 0 has a null component; centroid 1 matches the vector → 1
    // (under the old unboxing bug ci 0 would score dot = 0·1 + 2·2 = big)
    val nullCent = spark.sql(
      """SELECT nearest_centroid_cos(array(1.0d, 2.0d),
        |  array(CAST(NULL AS DOUBLE), 2.0d, 1.0d, 2.0d),
        |  array(2.23606797749979d, 2.23606797749979d)) AS cid""".stripMargin)
      .head().getLong(0)
    assert(nullCent === 1L)
    // centroid 0 has a null NORM; centroid 1 is real → 1
    val nullNorm = spark.sql(
      """SELECT nearest_centroid_cos(array(1.0d, 2.0d),
        |  array(1.0d, 2.0d, 1.0d, 2.0d),
        |  array(CAST(NULL AS DOUBLE), 2.23606797749979d)) AS cid""".stripMargin)
      .head().getLong(0)
    assert(nullNorm === 1L)
    // all sims null → ci 0 by the ties-to-lowest rule (same as ragged dims)
    val allNull = spark.sql(
      """SELECT nearest_centroid_cos(array(1.0d, 2.0d),
        |  array(CAST(NULL AS DOUBLE), 2.0d, CAST(NULL AS DOUBLE), 2.0d),
        |  array(1.0d, 1.0d)) AS cid""".stripMargin)
      .head().getLong(0)
    assert(allNull === 0L)
    // interpreted path agrees with codegen
    val expr = NearestCentroid(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[java.lang.Double](1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[java.lang.Double](null, 2.0, 1.0, 2.0),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array[java.lang.Double](2.23606797749979, 2.23606797749979),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true)),
      useVnorm = true)
    assert(expr.eval(null) === 1L)
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

  test("SQL builders reject wrong arities with WRONG_NUM_ARGS, never silently drop args") {
    // ADVICE r11: gear_chunk_ends(payload, maskBits, minSize) used to fall
    // into the 2-arg branch and IGNORE minSize; hilbert_key(x, y) threw a
    // bare IndexOutOfBoundsException. Both must name the function and the
    // accepted arities instead.
    // gearChunkEnds/hilbertKey register on first Column-API use
    graft.functions.NativeFunctions.gearChunkEnds(spark, lit(Array[Byte]()), 6)
    graft.functions.Hilbert.register(spark)
    val threeArgGear = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT gear_chunk_ends(CAST('ab' AS BINARY), 6, 64)").collect()
    }
    assert(threeArgGear.getMessage.contains("gear_chunk_ends") &&
      threeArgGear.getMessage.contains("2 or 4"), threeArgGear.getMessage)
    val twoArgHilbert = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hilbert_key(1L, 2L)").collect()
    }
    assert(twoArgHilbert.getMessage.contains("hilbert_key") &&
      twoArgHilbert.getMessage.contains("3"), twoArgHilbert.getMessage)
    // the accepted arities still build
    assert(spark.sql("SELECT size(gear_chunk_ends(CAST('ab' AS BINARY), 6))")
      .head().getInt(0) >= 0)
    assert(spark.sql(
      "SELECT size(gear_chunk_ends(CAST('ab' AS BINARY), 6, 1, 64))")
      .head().getInt(0) >= 0)
    assert(spark.sql("SELECT hilbert_key(1L, 2L, 4)").head().getLong(0) >= 0L)
  }

  test("word_shingles: fused loop bit-matches the HOF form incl. edges") {
    // real corpus + the edge zoo: null text, empty text, exactly-k tokens,
    // fewer-than-k tokens, double spaces (empty tokens from split -1),
    // repeated shingles (distinct NOT folded in — the raw window list)
    val edges = Seq(
      (900001L, null.asInstanceOf[String]), (900002L, ""),
      (900003L, "one two three four"), (900004L, "one two three"),
      (900005L, "a  b c d e"), (900006L, "x x x x x x"),
      (900007L, " leading and trailing "))
      .toDF("doc_id", "text")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).limit(300)
      .unionByName(edges)
    for (k <- Seq(2, 4, 8)) {
      val diff = docs.select(
        NativeFunctions.wordShinglesFused(spark,
          graft.functions.TextFunctions.tokens(col("text")), k).as("fused"),
        graft.functions.TextFunctions.wordShingles(
          graft.functions.TextFunctions.tokens(col("text")), k).as("hof"))
        .filter(col("fused") =!= col("hof") ||
          col("fused").isNull =!= col("hof").isNull)
      assert(diff.count() === 0, s"word_shingles mismatch at k=$k")
    }
    // interpreted path agrees with codegen'd SQL and preserves window order
    NativeFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT word_shingles(split('a b c d', ' ', -1), 2)")
      .head().getSeq[String](0)
    assert(viaSql === Seq("a b", "b c", "c d"))
    val expr = graft.functions.WordShingles(
      Literal.create(Seq("a", "b", "c"),
        ArrayType(org.apache.spark.sql.types.StringType)), 2)
    assert(expr.eval(null).asInstanceOf[ArrayData].numElements() === 2)
  }
}
