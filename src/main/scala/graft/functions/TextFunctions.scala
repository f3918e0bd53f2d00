package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level n-gram kernel shared by interpreted eval and codegen. */
object TextOps {
  private val SPACE = UTF8String.fromString(" ")

  /** Distinct word n-grams of a token array, space-joined,
    * first-occurrence order (array_distinct semantics). One virtual
    * call per ROW; the higher-order-function form this replaces pays
    * an interpreted lambda per n-gram per row.
    */
  def wordNgrams(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var k = 0
      while (k < n) { parts(k) = toks.getUTF8String(i + k); k += 1 }
      out.add(UTF8String.concatWs(SPACE, parts: _*))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[AnyRef]]
      .asInstanceOf[Array[Any]])
  }
}

/** `word_ngrams(array<string>, n) -> array<string>` — native codegen
  * Expression building the distinct space-joined word n-grams the
  * MinHash shingling and decontamination stages consume.
  *
  * Replaces `array_distinct(transform(arrays_zip(slice×n), concat_ws))`:
  * that form evaluates an interpreted lambda per gram per row and
  * allocates n slice arrays + a zip array; this kernel is one loop
  * over the unsafe token array with a LinkedHashSet dedupe, inlined
  * into the generated stage. Semantics identical (first-occurrence
  * order, single-space join) — callers keep their `when(size >= n)`
  * whole-text fallback outside.
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(a: Any): Any =
    TextOps.wordNgrams(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object TextFunctions {
  val fnName = "word_ngrams"

  /** SQL builder with analysis-time validation: `n` must be a foldable
    * positive integer. Without the checks a bad call surfaces as an
    * IndexOutOfBounds / ClassCast at resolution time (or a silent
    * `[""]` gram for n <= 0) instead of a proper analysis error.
    */
  private def build(children: Seq[Expression]): Expression = {
    import org.apache.spark.sql.AnalysisException
    if (children.length != 2)
      throw new AnalysisException("WRONG_NUM_ARGS.WITHOUT_SUGGESTION", Map(
        "functionName" -> s"`$fnName`", "expectedNum" -> "2",
        "actualNum" -> children.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
    val nExpr = children(1)
    // INVALID_PARAMETER_VALUE.INTEGER is the closest stock template
    // ("expects an integer literal, but got <invalidValue>"); the
    // free-form invalidValue carries the precise constraint since no
    // built-in class states "positive INT" for an arbitrary parameter.
    def invalidN(invalidValue: String): Nothing =
      throw new AnalysisException("INVALID_PARAMETER_VALUE.INTEGER", Map(
        "parameter" -> "`n`", "functionName" -> s"`$fnName`",
        "invalidValue" -> invalidValue))
    if (!nExpr.foldable)
      throw new AnalysisException("NON_FOLDABLE_ARGUMENT", Map(
        "funcName" -> s"`$fnName`", "paramName" -> "`n`",
        "paramType" -> "\"INT\""))
    val nInt = nExpr.eval() match {
      case null =>
        throw new AnalysisException("INVALID_PARAMETER_VALUE.NULL", Map(
          "parameter" -> "`n`", "functionName" -> s"`$fnName`"))
      case i: Int => i
      case i: Long if i >= Int.MinValue && i <= Int.MaxValue => i.toInt
      case i: Long => invalidN(s"$i (out of INT range)")
      case i: Short => i.toInt
      case i: Byte => i.toInt
      case _ => invalidN(nExpr.sql) // typed but non-integral literal
    }
    if (nInt <= 0) invalidN(s"$nInt (must be >= 1)")
    WordNgrams(children.head, nInt)
  }

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(FunctionIdentifier(fnName))) {
      registry.registerFunction(
        FunctionIdentifier(fnName),
        new ExpressionInfo(classOf[WordNgrams].getName, fnName),
        build _)
    }
  }

  def injection: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(fnName),
      new ExpressionInfo(classOf[WordNgrams].getName, fnName),
      build _)

  /** Column-API entry (n must be a literal). */
  def wordNgrams(tokens: Column, n: Int): Column =
    call_function(fnName, tokens, lit(n))
}
