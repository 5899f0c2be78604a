package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the numeric hot path (SURVEY §4.2: custom
  * `Expression` beats UDF). Higher-order-function folds (`aggregate`/
  * `zip_with`) are interpreted per element and allocate an intermediate array;
  * this codegen'd dot product is a primitive loop inside whole-stage codegen —
  * ~10× less per-pair overhead in the all-pairs similarity operators, which
  * dominate the 100 TB profile.
  *
  * Semantics contract: a sequential left-fold `Σ a[i]*b[i]` in array order —
  * bit-identical to the HOF fold and to the DuckDB oracle's list fold.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects two ARRAY<DOUBLE> args, got ${left.dataType.sql} / ${right.dataType.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // Mismatched dimensions or a null element → null, exactly like the HOF
  // fold (zip_with pads with nulls / a null product nulls the aggregate) —
  // corrupt rows surface as missing similarities, never as plausible
  // partial sums. The element null-check is emitted only when the input
  // schema admits null elements.
  override def nullable: Boolean = true

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  })

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val checkNulls = elementsNullable
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elementsNullable)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object NativeFunctions {

  /** Idempotent session registration; exposes `dot_product` to SQL too.
    * Skips only when the registered `dot_product` already RESOLVES TO OURS
    * (avoids the re-registration WARN every operator call would otherwise
    * log) — a same-named foreign function gets replaced, so the similarity
    * operators can never silently compute through someone else's
    * implementation. [[graft.GraftExtensions]] is the config-time
    * alternative.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product")
    val alreadyOurs = registry.functionExists(ident) &&
      (try {
        val probe = org.apache.spark.sql.catalyst.expressions.Literal.create(
          Array(0.0), ArrayType(DoubleType, containsNull = false))
        registry.lookupFunction(ident, Seq(probe, probe)).isInstanceOf[DotProduct]
      } catch { case _: Throwable => false })
    if (!alreadyOurs) {
      registry.createOrReplaceTempFunction(
        "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    }
  }

  def dotProduct(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("dot_product", a, b)
  }

  /** Spark's own runtime-filter primitives — `BloomFilterAggregate` /
    * `BloomFilterMightContain`, the expression pair `InjectRuntimeFilter`
    * plants to prune a shuffle join's probe side — exposed as callable
    * functions (they are not in the public registry). An operator can then
    * apply an EXPLICIT semi-join reduction where the optimizer's heuristic
    * (a selective scan-level filter on the build side, creation-side size
    * thresholds) can never fire: in the dedup screen the "build side" is an
    * entire small table, not a filtered one. Both expressions are
    * codegen-friendly; the sketch rides the plan as a BINARY literal and
    * ships to executors once with the task closure.
    */
  private def registerBloom(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("graft_might_contain")
    val alreadyOurs = registry.functionExists(ident) &&
      (try {
        val bloomProbe = org.apache.spark.sql.catalyst.expressions.Literal.create(
          null, org.apache.spark.sql.types.BinaryType)
        val valueProbe = org.apache.spark.sql.catalyst.expressions.Literal(0L)
        registry.lookupFunction(ident, Seq(bloomProbe, valueProbe))
          .isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]
      } catch { case _: Throwable => false })
    if (!alreadyOurs) {
      registry.createOrReplaceTempFunction("graft_bloom_agg",
        exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
      registry.createOrReplaceTempFunction("graft_might_contain",
        exprs => org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
    }
  }

  /** Build a bloom filter over `hash` (a LONG column, conventionally
    * `xxhash64(...)`) across all rows of `df`, returning the serialized
    * sketch (`BloomFilterImpl` format, the one [[mightContain]] reads).
    * Runs one job over `df` — call it on the SMALL side of a planned
    * reduction. Returns null on empty input (no rows → no sketch).
    *
    * Sizing is a cost knob, never a correctness one: oversizing `numBits`
    * costs sketch bytes, undersizing costs false-positive probe rows that
    * the downstream exact join drops anyway.
    */
  def bloomAggBytes(df: org.apache.spark.sql.DataFrame, hash: Column,
                    expectedItems: Long, numBits: Long): Array[Byte] = {
    registerBloom(df.sparkSession)
    df.select(call_function("graft_bloom_agg", hash,
        lit(expectedItems), lit(numBits)))
      .head().getAs[Array[Byte]](0)
  }

  /** Membership probe against a [[bloomAggBytes]] sketch: true if `hash`
    * might be in the set, false only when it is definitely absent — the
    * no-false-negatives guarantee that makes a bloom prefilter semantics-
    * preserving in front of any exact join. A null `bloom` (empty build
    * side) yields a constant-false filter: nothing can match.
    */
  def mightContain(spark: SparkSession, bloom: Array[Byte], hash: Column): Column =
    if (bloom == null) lit(false)
    else {
      registerBloom(spark)
      call_function("graft_might_contain", lit(bloom), hash)
    }
}
