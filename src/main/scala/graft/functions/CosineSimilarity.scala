package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression: cosine similarity of two float-array columns.
  *
  * Why a custom Expression (SURVEY.md §2.5 ladder): the composable form
  * (`aggregate(zip_with(...))`) allocates two intermediate arrays per row and
  * runs interpreted lambdas; this expression is a single fused loop and
  * participates in WholeStageCodegen via doGenCode — the hot-path shape for
  * 100 TB embedding scans. Accumulation order (index 0..n-1 left fold) is
  * IDENTICAL to the composable form and the DuckDB list_reduce mirror, so the
  * same oracle SQL validates both.
  *
  * Null contract: null if either input is null or either norm is zero.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> inputs, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // Null contract matches the composable zip_with/aggregate form: ragged
    // lengths or any null element poison the result to null.
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Every local must be ctx.freshName'd: two cosine_sim calls in one
      // projection share a codegen scope, and literal names collide
      // (CompileException → silent interpreted fallback for the whole stage).
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val anyNull = ctx.freshName("anyNull")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $anyNull = true; break; }
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  if ($anyNull || $nx == 0.0 || $ny == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  private val cosineInfo = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim",
      "cosine_sim(a, b) - cosine similarity of two float arrays", ""),
    (children: Seq[Expression]) => CosineSimilarity(children.head, children(1)))

  private val polyHashInfo = (
    FunctionIdentifier("poly_hash"),
    new ExpressionInfo(classOf[PolyHash].getName, null, "poly_hash",
      "poly_hash(s, seed, mult) - polynomial rolling hash of the bytes of s mod 1e9+7", ""),
    (children: Seq[Expression]) => PolyHash(children.head, children(1), children(2)))

  private val jaroWinklerInfo = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, null, "jaro_winkler",
      "jaro_winkler(s, t) - Jaro-Winkler similarity in [0,1] (textbook/DuckDB semantics)", ""),
    (children: Seq[Expression]) => JaroWinkler(children.head, children(1)))

  /** Imperative registration for sessions not built with the extension.
    * Covers both custom-function kinds the library ships: the native
    * Catalyst expression (codegen'd) and the typed Aggregator UDAF —
    * after this, `spark.sql("SELECT hhi(qty) ... ")` and
    * `SELECT cosine_sim(a, b)` both resolve.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(cosineInfo._1, cosineInfo._2, cosineInfo._3)
    spark.sessionState.functionRegistry.registerFunction(polyHashInfo._1, polyHashInfo._2, polyHashInfo._3)
    spark.sessionState.functionRegistry.registerFunction(jaroWinklerInfo._1, jaroWinklerInfo._2, jaroWinklerInfo._3)
    spark.udf.register("hhi", org.apache.spark.sql.functions.udaf(HhiAggregator))
  }
}

/** SparkSessionExtensions entry point — the injection mechanism a deployment
  * would use: `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, null, "cosine_sim",
        "cosine_sim(a, b) - cosine similarity of two float arrays", ""),
      (children: Seq[Expression]) => CosineSimilarity(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, null, "poly_hash",
        "poly_hash(s, seed, mult) - polynomial rolling hash of the bytes of s mod 1e9+7", ""),
      (children: Seq[Expression]) => PolyHash(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, null, "jaro_winkler",
        "jaro_winkler(s, t) - Jaro-Winkler similarity in [0,1] (textbook/DuckDB semantics)", ""),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1))))
    // the custom as-of join (plans/AsOfJoin) for extensions-configured
    // deployments; AsOf.join also self-registers via extraStrategies for
    // sessions built without extensions
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
