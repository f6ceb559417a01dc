package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Asymmetric-distance PQ scoring (the ADC form of product
  * quantization, Jégou et al., "Product quantization for nearest
  * neighbor search", TPAMI 2011): given a row's M sub-quantizer codes
  * and a QUERY-SPECIFIC flattened lookup table `lut` (M·K doubles —
  * `lut[m·K + c]` = dot(query subvector m, codebook m centroid c)),
  * the approximate inner product is one gather-and-add per subspace:
  *
  *   score = Σ_m lut[m·K + codes[m]]
  *
  * Codegen'd single loop — this is the ANN stage-1 hot path over every
  * probed row, where a UDF or HOF chain would dominate the probe.
  * K is derived per row as `lut.length / codes.length`; a length
  * mismatch (lut not divisible) or null element yields NULL rather
  * than a wrong score.
  */
case class PqAdc(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val codesOk = left.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    }
    val lutOk = right.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (codesOk && lutOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<tinyint>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0 || lut.numElements() % m != 0) return null
    val k = lut.numElements() / m
    var score = 0.0
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      val c = codes.getByte(i) & 0xFF
      if (c >= k) return null
      if (lut.isNullAt(i * k + c)) return null
      score += lut.getDouble(i * k + c)
      i += 1
    }
    java.lang.Double.valueOf(score)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val score = ctx.freshName("score")
      val bad = ctx.freshName("bad")
      s"""
         |final int $m = $codes.numElements();
         |if ($m > 0 && $lut.numElements() % $m == 0) {
         |  final int $k = $lut.numElements() / $m;
         |  double $score = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $m; $i++) {
         |    if ($codes.isNullAt($i)) { $bad = true; break; }
         |    final int $c = $codes.getByte($i) & 0xFF;
         |    if ($c >= $k || $lut.isNullAt($i * $k + $c)) { $bad = true; break; }
         |    $score += $lut.getDouble($i * $k + $c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $score; }
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
