package graft

import org.apache.spark.sql.{GraftExtensionsProbe, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.NativeFunctions

class GraftExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects dot_product at session-extension time") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = GraftExtensionsProbe.applyInjections(ext)
    assert(registry.functionExists(FunctionIdentifier("dot_product")))
    val expr = registry.lookupFunction(FunctionIdentifier("dot_product"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0, 4.0))))
    assert(expr.eval(null) === 11.0)
  }

  test("dot_product rejects wrong arity with an analysis error, not an index crash") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = GraftExtensionsProbe.applyInjections(ext)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      registry.lookupFunction(FunctionIdentifier("dot_product"),
        Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0))))
    }
    assert(e.getMessage.contains("dot_product"))
  }

  test("hyperplane_signatures knobs reject non-constant / non-INT args readably") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = GraftExtensionsProbe.applyInjections(ext)
    val vec = org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0, 2.0))
    def build(knob: org.apache.spark.sql.catalyst.expressions.Expression) =
      registry.lookupFunction(FunctionIdentifier("hyperplane_signatures"),
        Seq(vec, vec, knob, org.apache.spark.sql.catalyst.expressions.Literal(1)))
    // a column reference used to surface as an unbound-attribute
    // UnsupportedOperationException; a LONG literal as a ClassCastException
    // (ADVICE r9) — both must now be AnalysisExceptions naming the knob
    val nonConst = intercept[org.apache.spark.sql.AnalysisException] {
      build(org.apache.spark.sql.catalyst.analysis
        .UnresolvedAttribute("some_col"))
    }
    assert(nonConst.getMessage.contains("planesPerTable"))
    val longTyped = intercept[org.apache.spark.sql.AnalysisException] {
      build(org.apache.spark.sql.catalyst.expressions.Literal(2L))
    }
    assert(longTyped.getMessage.contains("planesPerTable"))
    // foldable non-literal INT arithmetic still resolves (1+1 planes)
    val folded = build(org.apache.spark.sql.catalyst.expressions.Literal(2))
    assert(folded.isInstanceOf[graft.functions.HyperplaneSignatures])
    // and the lazy-registration path shares the same guard
    graft.functions.NativeFunctions.hyperplaneSignatures(
      spark, org.apache.spark.sql.functions.col("v"), Array(1.0, 2.0), 1, 1)
    val lazyGuard = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT hyperplane_signatures(array(1.0d), array(1.0d), 2L, 1)")
        .head()
    }
    assert(lazyGuard.getMessage.contains("planesPerTable"))
  }

  test("GraftExtensions injects the bloom runtime-filter pair") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = GraftExtensionsProbe.applyInjections(ext)
    assert(registry.functionExists(FunctionIdentifier("graft_bloom_agg")))
    assert(registry.functionExists(FunctionIdentifier("graft_might_contain")))
  }

  test("bloom sketch round-trips through SQL build + probe") {
    import spark.implicits._
    Seq("a", "b", "c", "d").toDF("s").createOrReplaceTempView("bloom_build")
    val bloom = NativeFunctions.bloomAggBytes(
      spark.table("bloom_build"),
      org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("s")),
      expectedItems = 100L, numBits = 1024L)
    assert(bloom != null)
    val hits = Seq("a", "zz", "b").toDF("s")
      .filter(NativeFunctions.mightContain(spark, bloom,
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.col("s"))))
      .as[String].collect().sorted
    // "a" and "b" MUST hit (no false negatives); "zz" may only slip in as
    // a false positive, impossible here at 1024 bits over 4 items
    assert(hits.toSeq === Seq("a", "b"))
  }

  test("lazy registration is idempotent and SQL-visible") {
    NativeFunctions.register(spark)
    NativeFunctions.register(spark) // second call must be a silent no-op
    val row = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(row.getDouble(0) === 11.0)
  }

  test("registration replaces a same-named foreign function (never computes through it)") {
    spark.udf.register("dot_product",
      (a: Seq[Double], b: Seq[Double]) => -1.0) // an impostor
    try {
      NativeFunctions.register(spark)
      val row = spark.sql(
        "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
      assert(row.getDouble(0) === 11.0, "graft's implementation must win")
    } finally NativeFunctions.register(spark) // leave ours installed
  }
}
