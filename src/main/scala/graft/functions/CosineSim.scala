package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity over two `array<double>` columns —
  * the fused single-pass form of [[Vec.cosine]] (SURVEY §4.3: a custom
  * `Expression` with `doGenCode` beats a UDF; here it also beats the
  * three-HOF composition by folding dot product and both norms into ONE
  * loop over the arrays instead of three, with no intermediate arrays).
  *
  * Semantics are bit-identical to [[Vec.cosine]] by construction — this
  * is load-bearing for oracle hash parity when swapped into the
  * similarity hot path:
  *  - each accumulator (dot, |a|², |b|²) is a sequential left fold in
  *    element order, exactly like the `aggregate` HOFs it replaces;
  *  - result = dot / (sqrt(na) * sqrt(nb)), the same association;
  *  - null input array, length mismatch (zip_with's null padding), any
  *    null element, or a zero norm product → NULL.
  *
  * Inputs must already be `array<double>` (`AbstractDataType` is
  * sql-private, so implicit coercion isn't available to an external
  * expression); [[CosineSim.register]] and [[Vec.cosineNative]] insert
  * the same widening cast as [[Vec.asDouble]] at the boundary.
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = x.getDouble(i)
      val yv = y.getDouble(i)
      dot += xv * yv
      na += xv * xv
      nb += yv * yv
      i += 1
    }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) null else java.lang.Double.valueOf(dot / nn)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val nn = ctx.freshName("nn")
      val bad = ctx.freshName("bad")
      // ev.isNull was set false by nullSafeCodeGen; re-raise it on the
      // null-producing branches (the documented "resultCode could change
      // nullability" contract).
      s"""
         |final int $n = $a.numElements();
         |if ($n == $b.numElements()) {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    final double $xv = $a.getDouble($i);
         |    final double $yv = $b.getDouble($i);
         |    $dot += $xv * $yv;
         |    $na += $xv * $xv;
         |    $nb += $yv * $yv;
         |  }
         |  final double $nn = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($bad || $nn == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / $nn;
         |  }
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  import org.apache.spark.sql.catalyst.expressions.Cast

  /** Builder with the [[Vec.asDouble]] widening cast on both inputs. */
  def withCast(a: Expression, b: Expression): CosineSim =
    CosineSim(Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))

  /** Register the SQL spelling `cosine_sim(a, b)`, replacing any prior
    * binding of the name. Library operators do NOT resolve through this
    * name (they build the expression via ExprBridge), so registration is
    * purely for user-facing SQL.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => withCast(exprs.head, exprs(1)),
      "scala_udf")
}
