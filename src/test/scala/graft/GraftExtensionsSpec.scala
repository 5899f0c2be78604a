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
