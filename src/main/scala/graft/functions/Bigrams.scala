package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent word pairs of the lowercase alnum tokenization as one native
  * scalar expression: `bigrams(text)` returns
  * `array<struct<w1:string, w2:string>>` — value-identical to
  *
  * {{{
  *   zip_with(slice(t, 1, size(t)-1), slice(t, 2, size(t)-1),
  *            (a, b) => struct(a as w1, b as w2))
  *   where t = array_remove(split(lower(text), "[^a-z0-9]+"), "")
  * }}}
  *
  * which [[graft.ops.Corpus.lmScore]] (bigram-LM scoring, B124)
  * evaluates through an interpreted `zip_with` lambda with two slice
  * copies and a struct allocation per pair, AFTER a lower() copy, the
  * regex split, and an array_remove pass. One compiled loop per row:
  * lower once (the same `UTF8String.toLowerCase` Spark's `lower` calls),
  * one regex split (the same java.util.regex engine Spark's `split`
  * uses), empties skipped in-line, pairs assembled directly. Fewer than
  * two tokens → empty array, so `explode` drops the row exactly as the
  * old `filter(size(t) >= 2)` did. Null text → null. Whole-stage
  * codegen preserved via the static-call doGenCode (the [[MinHashSig]]
  * pattern). CorpusSpec pins parity with the HOF form.
  */
case class Bigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(text: Any): Any =
    Bigrams.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.Bigrams.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): Bigrams =
    copy(child = newChild)

  override def prettyName: String = "bigrams"
}

/** Adjacent pairs of an ALREADY-TOKENIZED array — [[Bigrams]] with the
  * tokenization factored out: `bigrams_arr(toks)` over
  * `toks = array_remove(split(lower(text), "[^a-z0-9]+"), "")` is
  * value-identical to `bigrams(text)` (CorpusSpec pins the parity).
  * Exists for the tokenize-once corpus shape ([[graft.ops.Corpus.lmScore]]
  * over a pinned token table): when the token array is materialized once
  * and read by several passes, re-running the lower + regex-split per
  * pass is pure waste — this assembles the pairs straight from the
  * stored array in one compiled loop. Fewer than two tokens → empty
  * array (explode drops the row); null array → null.
  */
case class ArrayBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(toks: Any): Any =
    ArrayBigrams.compute(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t => s"graft.functions.ArrayBigrams.compute($t)")

  override protected def withNewChildInternal(newChild: Expression): ArrayBigrams =
    copy(child = newChild)

  override def prettyName: String = "bigrams_arr"
}

object ArrayBigrams {
  /** Register as a SQL-callable function: `bigrams_arr(toks)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigrams_arr",
      exprs => ArrayBigrams(exprs.head),
      "scala_udf")

  private val empty = new GenericArrayData(new Array[AnyRef](0))

  /** The whole per-row computation, callable from generated code. */
  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return empty
    val out = new Array[AnyRef](n - 1)
    // clone each token once: getUTF8String over unsafe/columnar input
    // returns a VIEW into a buffer the scanner reuses — the returned
    // array must own its bytes (NgramMd5/Bigrams allocate fresh strings
    // for the same reason)
    var prev = toks.getUTF8String(0).clone()
    var i = 1
    while (i < n) {
      val cur = toks.getUTF8String(i).clone()
      out(i - 1) = new GenericInternalRow(Array[Any](prev, cur))
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }
}

object Bigrams {
  /** Register as a SQL-callable function: `bigrams(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bigrams",
      exprs => Bigrams(exprs.head),
      "scala_udf")

  // The tokenizer's separator class, compiled once. Spark's split()
  // routes through the same java.util.regex engine on the string form,
  // so token boundaries are bit-identical to the HOF pipeline.
  private val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  private val empty = new GenericArrayData(new Array[AnyRef](0))

  /** The whole per-row computation, callable from generated code. */
  def compute(text: UTF8String): ArrayData = {
    // UTF8String.toLowerCase IS Spark's lower(); split(-1) keeps the
    // leading/trailing empties the HOF form array_remove'd — skipped
    // in-line here instead.
    val pieces = sep.split(text.toLowerCase.toString, -1)
    var n = 0
    var i = 0
    while (i < pieces.length) {
      if (!pieces(i).isEmpty) n += 1
      i += 1
    }
    if (n < 2) return empty
    val toks = new Array[UTF8String](n)
    var k = 0
    i = 0
    while (i < pieces.length) {
      if (!pieces(i).isEmpty) { toks(k) = UTF8String.fromString(pieces(i)); k += 1 }
      i += 1
    }
    val out = new Array[AnyRef](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
