package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`transform`/`aggregate`)
  * — no UDF in the hot path (SURVEY §2B B61).
  *
  * All arithmetic is done in DOUBLE: the fixture stores float32, and
  * float accumulation is neither engine-stable nor precise enough for
  * oracle parity (DuckDB's list_cosine_similarity stays in float32 and
  * diverges at the 6th decimal — measured).
  */
object Vec {

  /** Engine-stable element type for arithmetic. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Sequential left-fold dot product (deterministic summation order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column =
    sqrt(aggregate(transform(asDouble(a), x => x * x), lit(0.0), (acc, x) => acc + x))

  /** Cosine similarity; null-safe on zero-norm vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, lit(null).cast("double")).otherwise(d / nn)
  }

  /** Cosine rounded for cross-engine hash parity. */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** [[CosineSim]]-backed spelling of [[cosine]]: bit-identical values
    * (spec-pinned in LlmSpec) from ONE fused codegen'd loop instead of
    * three HOF passes. Built DIRECTLY from the expression — no
    * function-registry lookup, so operator results cannot be changed by
    * a same-name user registration ([[CosineSim.register]] remains for
    * the SQL spelling only).
    */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ExprBridge
    ExprBridge.column(CosineSim(
      ExprBridge.expr(asDouble(a)), ExprBridge.expr(asDouble(b))))
  }

  /** Native cosine rounded for cross-engine hash parity. */
  def cosine6Native(a: Column, b: Column): Column = round(cosineNative(a, b), 6)

  /** Symmetric linear int8 quantization: scale = max|x| / 127, codes in
    * [-127, 127]. Returns struct(scale, codes array<int>). At 100 TB this
    * is the 4× storage/bandwidth lever for ANN — codes join + rerank on
    * the float originals.
    */
  def quantizeInt8(v: Column): Column = {
    val d = asDouble(v)
    val maxAbs = array_max(transform(d, x => abs(x)))
    val scale = when(maxAbs === 0.0, lit(1.0)).otherwise(maxAbs / 127.0)
    // zip against array_repeat(scale, n): scale (an O(dim) reduction) is
    // evaluated ONCE per row, not once per element — embedding it in the
    // transform lambda would make this O(dim^2)
    val codes = zip_with(d, array_repeat(scale, size(d)),
      (x, sc) => round(x / sc).cast("int"))
    struct(scale.as("scale"), codes.as("codes"))
  }

  /** Dequantize back to array<double>. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))
}
