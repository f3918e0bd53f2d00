package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Tight-loop kernels shared by interpreted eval and generated code. */
object VectorOps {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }
}

/** `vec_dot(array<double>, array<double>) -> double` — native Catalyst
  * expression with whole-stage-codegen support (SURVEY §7.3: custom
  * Expression for llm/Similarity).
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function form:
  * HOFs evaluate one boxed lambda call per element per row and
  * allocate an intermediate array per evaluation; this kernel is one
  * branch-free primitive loop over the unsafe array data, inlined into
  * the generated stage — ~10× less per-pair cost in the kNN joins.
  * Null elements are treated as 0 contribution (reads raw slots);
  * embeddings are non-null float vectors cast to double upstream.
  *
  * Summation order is left-to-right, matching both the HOF form it
  * replaces and DuckDB's list_dot_product — oracle results are
  * bit-identical.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes
    with Serializable {

  // return type inferred: AbstractDataType is private[sql] in Spark 4
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorOps.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration (the in-process analogue of installing
  * [[GraftExtensions]] via `spark.sql.extensions`).
  */
object VectorFunctions {
  val fnName = "vec_dot"

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(fnName))) {
      registry.registerFunction(
        FunctionIdentifier(fnName),
        new ExpressionInfo(classOf[VecDot].getName, fnName),
        (children: Seq[Expression]) => VecDot(children(0), children(1)))
    }
  }

  /** Column-API entry: `vecDot(a, b)`. */
  def vecDot(a: Column, b: Column): Column = call_function(fnName, a, b)
}
