package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The catalog's `bucket(n, col)` scalar function (B189): the
  * FunctionCatalog spelling of [[graft.ops.Transforms.Bucket]]'s
  * write-side derivation `pmod(hash(col), n)` — what lets Spark resolve
  * the `bucket` transform a [[GraftScan]] reports in its
  * KeyGroupedPartitioning into a typed TransformExpression, compare the
  * two sides of a join for storage-partitioned compatibility (same
  * canonical name + same bucket count), and — should it ever need to —
  * compute the bucket of a value EXACTLY as the writer did
  * ([[graft.ops.Transforms.bucketValue]], Murmur3 seed 42, the `hash()`
  * SQL function's parameters).
  */
private[catalog] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): the engine's hidden-partition bucket number — pmod(hash(col), n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket(n, col) takes exactly 2 arguments, got ${inputType.length}")
    val srcType = inputType.fields(1).dataType
    new ScalarFunction[Integer] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, srcType)
      override def resultType(): DataType = IntegerType
      override def name(): String = "bucket"
      // canonical identity carries the source type: two sides of a join
      // are co-partitioned only when they hashed the SAME domain
      override def canonicalName(): String = s"graft.bucket(${srcType.catalogString})"
      override def isResultNullable: Boolean = false
      override def produceResult(input: InternalRow): Integer = {
        val n = input.getInt(0)
        val v = input.get(1, srcType)
        graft.ops.Transforms.bucketValue(v, srcType, n)
      }
    }
  }
}
