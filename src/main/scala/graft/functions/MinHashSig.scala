package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as a single native scalar expression:
  * `minhash_sig(text, n, numPerm)` tokenizes, shingles, hashes, and folds
  * the elementwise min in one compiled loop over the row.
  *
  * Why it exists: the HOF form ([[graft.ops.Dedup.minhashSignature]]) is
  * semantically identical but every shingle pays interpreted
  * lambda-evaluation overhead — a `slice`+`concat_ws` allocation, a
  * `sequence` allocation, and a `zip_with` array allocation per fold
  * step (higher-order functions are not whole-stage-codegen'd). This
  * expression does the same work with one string split, one reused
  * StringBuilder, and one long[numPerm] accumulator.
  *
  * Bit-for-bit parity with the HOF form (asserted in LlmSpec) via the
  * same hash chain: base = xxh64(shingle, 42); seed = xxh64(long base,
  * 42); h_i = xxh64(int i, seed) — i.e. the builtin
  * `xxhash64(xxhash64(s), i)`. Shingling mirrors
  * [[graft.ops.Dedup.shingles]] exactly: words = split on single space
  * (limit -1, empties kept), n-word windows joined by one space, and a
  * document shorter than n words yields the single whole-document
  * shingle.
  *
  * Null text → null signature, matching the HOF chain's null
  * propagation. `n`/`numPerm` arrive as ordinary (in practice literal)
  * int children.
  */
case class MinHashSig(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable

  override protected def nullSafeEval(text: Any, nAny: Any, pAny: Any): Any =
    MinHashSig.compute(text.asInstanceOf[UTF8String],
      nAny.asInstanceOf[Number].intValue(), pAny.asInstanceOf[Number].intValue())

  /** Delegates to the static [[MinHashSig.compute]] so the surrounding
    * stage stays whole-stage-codegen'd (a CodegenFallback here would
    * force the entire projection back to interpreted row-at-a-time).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, p) =>
      s"${ev.value} = graft.functions.MinHashSig.compute($t, $n, $p);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinHashSig =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  /** Register as a SQL-callable function: `minhash_sig(text, n, numPerm)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs.head, exprs(1), exprs(2)),
      "scala_udf")

  /** The whole per-row computation, callable from generated code. */
  def compute(text: UTF8String, n: Int, numPerm: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val acc = Array.fill(numPerm)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    val nShingles = if (words.length < n) 1 else words.length - n + 1
    val width = math.min(n, words.length)
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var w = 0
      while (w < width) {
        if (w > 0) sb.append(' ')
        sb.append(words(s + w))
        w += 1
      }
      val shingle = UTF8String.fromString(sb.toString)
      val base = XxHash64Function.hash(shingle, StringType, 42L)
      val seed = XxHash64Function.hash(base, LongType, 42L)
      var i = 1
      while (i <= numPerm) {
        val h = XxHash64Function.hash(i, IntegerType, seed)
        if (h < acc(i - 1)) acc(i - 1) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(acc)
  }
}
