package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the integer dot product of two
  * `array<bigint>` columns — one fused loop, whole-stage codegen
  * (`doGenCode`), no intermediate array.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the HOF
  * composition allocates a product array per row and evaluates two
  * interpreted lambdas per element — and it sits on the hottest path in
  * the engine, the quantized ANN scan
  * ([[graft.operators.SimilarityOps.sqTopK]]: corpus × queries code
  * dots). Same precedent as [[CosineSimilarity]] (the fused cosine) and
  * HashSketches' MinHashSignature (measured 15× over interpreted HOF
  * lambdas). Integer arithmetic is exact, so the native and composed
  * forms are identical for ANY evaluation order — there is no numeric
  * parity risk at all, only speed.
  *
  * Contract: both arrays the same length (quantized codes always are);
  * extra elements on the longer side are ignored (min-length loop,
  * matching `zip_with`'s non-null prefix).
  */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) {
      dot += x.getLong(i) * y.getLong(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = Math.min($a.numElements(), $b.numElements());
         |long dot = 0L;
         |for (int i = 0; i < n; i++) {
         |  dot += $a.getLong(i) * $b.getLong(i);
         |}
         |${ev.value} = dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDotProduct {
  private val FuncName = "graft_long_dot"

  /** Register once per session (idempotent), exposing the expression to
    * both the Column DSL (via [[dotNative]]) and `spark.sql`.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => LongDotProduct(exprs(0), exprs(1)), "scala_udf")

  /** Column API over the native expression. */
  def dotNative(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function(FuncName, a, b)
  }
}
