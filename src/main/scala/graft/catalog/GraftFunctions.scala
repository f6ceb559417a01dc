package graft.catalog

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType, TimestampType}

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
/** The catalog's range-transform scalar functions (B193, round-15):
  * `days`/`months`/`years`/`hours`/`truncate` — the FunctionCatalog
  * spellings of [[graft.ops.Transforms]]' write-side derivations, what
  * lets Spark resolve the range transforms a [[GraftScan]] reports in
  * its KeyGroupedPartitioning (storage-partitioned joins over hidden
  * TEMPORAL grids — two day-partitioned event tables join with zero
  * Exchange, the dominant stream-history shape at 100 TB). Each mirrors
  * the writer's UTC epoch math EXACTLY (same IEEE double floor-divide),
  * and each canonical name carries the source type so only same-domain
  * sides co-partition.
  */
private[catalog] object GraftTemporalFunctions {
  import graft.ops.Transforms.{MicrosPerDay, MicrosPerHour}

  private def utcDay(v: Any, srcType: DataType): Int = srcType match {
    case DateType => v.asInstanceOf[Int]
    case _ => // TimestampType internal = epoch micros
      math.floor(v.asInstanceOf[Long].toDouble / MicrosPerDay.toDouble)
        .toLong.toInt
  }

  /** One UnboundFunction per temporal grid; `eval` maps the UTC epoch
    * day (or raw micros for hours) to the directory value.
    */
  private[catalog] final class Temporal(fname: String,
      dateOk: Boolean, result: DataType,
      eval: (Any, DataType) => Int) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col): the engine's hidden-partition $fname value (UTC epoch math)"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.length == 1,
        s"$fname(col) takes exactly 1 argument, got ${inputType.length}")
      val srcType = inputType.fields(0).dataType
      require(srcType == TimestampType || (dateOk && srcType == DateType),
        s"$fname() needs a timestamp${if (dateOk) "/date" else ""} source, " +
          s"got ${srcType.catalogString}")
      new ScalarFunction[Integer]
        with org.apache.spark.sql.connector.catalog.functions
          .ReducibleFunction[Integer, Integer] {
        override def inputTypes(): Array[DataType] = Array(srcType)
        override def resultType(): DataType = result
        override def name(): String = fname
        override def canonicalName(): String =
          s"graft.$fname(${srcType.catalogString})"
        override def isResultNullable: Boolean = true
        override def produceResult(input: InternalRow): Integer =
          if (input.isNullAt(0)) null
          else eval(input.get(0, srcType), srcType)
        /** A FINER temporal grid reduces to a coarser one over the SAME
          * source domain (round-15): days→months, days→years,
          * months→years — all DATE-valued grids whose coarser value is
          * a pure function of the finer one (calendar floors in UTC).
          * A day-partitioned event table joins a month-partitioned
          * rollup shuffle-free under `allowCompatibleTransforms`.
          */
        override def reducer(other: org.apache.spark.sql.connector.catalog
            .functions.ReducibleFunction[_, _])
            : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] = {
          val otherName = other match {
            case s: ScalarFunction[_] => s.canonicalName()
            case _ => ""
          }
          val dom = s"(${srcType.catalogString})"
          (fname match {
            case "days" if otherName == s"graft.months$dom" => GraftTemporalReducers.MonthFloor
            case "days" if otherName == s"graft.years$dom" => GraftTemporalReducers.YearFloor
            case "months" if otherName == s"graft.years$dom" => GraftTemporalReducers.YearFloor
            case _ => null
          }): org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
        }
      }
    }
  }

  val Days = new Temporal("days", dateOk = true, DateType,
    (v, st) => utcDay(v, st))
  val Months = new Temporal("months", dateOk = true, DateType,
    (v, st) => java.time.LocalDate.ofEpochDay(utcDay(v, st).toLong)
      .withDayOfMonth(1).toEpochDay.toInt)
  val Years = new Temporal("years", dateOk = true, DateType,
    (v, st) => java.time.LocalDate.ofEpochDay(utcDay(v, st).toLong)
      .withDayOfYear(1).toEpochDay.toInt)
  val Hours = new Temporal("hours", dateOk = false, IntegerType,
    (v, _) => math.floor(v.asInstanceOf[Long].toDouble /
      MicrosPerHour.toDouble).toLong.toInt)
}

/** `truncate_<n>(col)` — the WIDTH-IN-THE-NAME spelling of truncate
  * used for storage-partitioned join matching: Spark's SPJ machinery
  * (`KeyGroupedPartitioning.supportsExpressions`) accepts only
  * SINGLE-argument transforms (bucket's literal is special-cased into
  * `numBucketsOpt`), so a two-arg `truncate(n, col)` transform can
  * never drive a shuffle-free join. Encoding the width in the function
  * name makes the transform unary; the canonical name carries width +
  * source type, so only same-width same-domain sides co-partition.
  */
private[catalog] final class GraftTruncateWidthFunction(n: Int)
  extends UnboundFunction {
  override def name(): String = s"truncate_$n"
  override def description(): String =
    s"truncate_$n(col): the engine's hidden-partition truncate($n, col) value"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"truncate_$n(col) takes exactly 1 argument, got ${inputType.length}")
    val srcType = inputType.fields(0).dataType
    require(srcType == StringType || srcType == ByteType ||
      srcType == ShortType || srcType == IntegerType || srcType == LongType,
      s"truncate_$n() needs a string/integral source, got ${srcType.catalogString}")
    new ScalarFunction[Any] {
      override def inputTypes(): Array[DataType] = Array(srcType)
      override def resultType(): DataType = srcType
      override def name(): String = s"truncate_$n"
      override def canonicalName(): String =
        s"graft.truncate_$n(${srcType.catalogString})"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): Any = {
        if (input.isNullAt(0)) return null
        srcType match {
          case StringType => input.getUTF8String(0).substringSQL(1, n)
          case ByteType =>
            val v = input.getByte(0); (v - (((v % n) + n) % n)).toByte
          case ShortType =>
            val v = input.getShort(0); (v - (((v % n) + n) % n)).toShort
          case IntegerType =>
            val v = input.getInt(0); v - (((v % n) + n) % n)
          case LongType =>
            val v = input.getLong(0); v - (((v % n) + n) % n)
          case _ => null // unreachable: bind refused
        }
      }
    }
  }
}

/** `truncate(n, col)` — string prefix / integral width-floor, the
  * [[graft.ops.Transforms.Truncate]] derivation.
  */
private[catalog] object GraftTruncateFunction extends UnboundFunction {
  override def name(): String = "truncate"
  override def description(): String =
    "truncate(n, col): the engine's hidden-partition truncate value"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"truncate(n, col) takes exactly 2 arguments, got ${inputType.length}")
    val srcType = inputType.fields(1).dataType
    require(srcType == StringType || srcType == ByteType ||
      srcType == ShortType || srcType == IntegerType || srcType == LongType,
      s"truncate() needs a string/integral source, got ${srcType.catalogString}")
    new ScalarFunction[Any] {
      override def inputTypes(): Array[DataType] = Array(IntegerType, srcType)
      override def resultType(): DataType = srcType
      override def name(): String = "truncate"
      override def canonicalName(): String =
        s"graft.truncate(${srcType.catalogString})"
      override def isResultNullable: Boolean = true
      override def produceResult(input: InternalRow): Any = {
        if (input.isNullAt(1)) return null
        val n = input.getInt(0)
        srcType match {
          case StringType => input.getUTF8String(1).substringSQL(1, n)
          case ByteType =>
            val v = input.getByte(1); (v - (((v % n) + n) % n)).toByte
          case ShortType =>
            val v = input.getShort(1); (v - (((v % n) + n) % n)).toShort
          case IntegerType =>
            val v = input.getInt(1); v - (((v % n) + n) % n)
          case LongType =>
            val v = input.getLong(1); v - (((v % n) + n) % n)
          case _ => null // unreachable: bind refused
        }
      }
    }
  }
}

private[catalog] object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): the engine's hidden-partition bucket number — pmod(hash(col), n)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket(n, col) takes exactly 2 arguments, got ${inputType.length}")
    val srcType = inputType.fields(1).dataType
    new ScalarFunction[Integer]
      with org.apache.spark.sql.connector.catalog.functions
        .ReducibleFunction[Integer, Integer] {
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
      /** COMPATIBLE bucket counts SPJ without a shuffle (round-15, the
        * Iceberg ReducibleFunction design): when the other side's count
        * DIVIDES ours, this side's bucket values reduce to the coarser
        * grid by `v % otherN` — sound for `pmod(hash, n)` because
        * `pmod(h, kn) % n == pmod(h, n)` (the value is already
        * non-negative and n divides kn). Only the same hash family over
        * the SAME source domain reduces; everything else returns null
        * and Spark falls back to the shuffle. Gated by Spark's
        * `spark.sql.sources.v2.bucketing.allowCompatibleTransforms
        * .enabled`.
        */
      override def reducer(thisNumBuckets: Int,
          otherFunction: org.apache.spark.sql.connector.catalog.functions
            .ReducibleFunction[_, _],
          otherNumBuckets: Int)
          : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] = {
        val sameFamily = otherFunction match {
          case s: ScalarFunction[_] => s.canonicalName() == canonicalName()
          case _ => false
        }
        if (!sameFamily || otherNumBuckets <= 0 ||
            thisNumBuckets == otherNumBuckets ||
            thisNumBuckets % otherNumBuckets != 0) null
        else new GraftBucketReducer(otherNumBuckets)
      }
      /** Spark's TransformExpression.isCompatible/reducers call the
        * 1-ARG reducer(other) on BOTH sides whenever either side's
        * numBucketsOpt is empty — e.g. bucket(n, ts) joined against a
        * days(ts) partitioning under allowCompatibleTransforms. The
        * interface default throws UnsupportedOperationException, which
        * would crash planning instead of falling back to the shuffle;
        * bucket only ever reduces via the 3-arg count-carrying form,
        * so the count-less form is always "no reduction".
        */
      override def reducer(otherFunction: org.apache.spark.sql.connector
          .catalog.functions.ReducibleFunction[_, _])
          : org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer] =
        null
    }
  }
}

/** Calendar-floor reducers for the temporal grids — top-level and
  * Serializable like [[GraftBucketReducer]] (they ship in task
  * closures). Values are DATE ints (epoch days).
  */
private[catalog] object GraftTemporalReducers {
  object MonthFloor
    extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
    with Serializable {
    override def reduce(v: Integer): Integer =
      java.time.LocalDate.ofEpochDay(v.longValue())
        .withDayOfMonth(1).toEpochDay.toInt
  }
  object YearFloor
    extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
    with Serializable {
    override def reduce(v: Integer): Integer =
      java.time.LocalDate.ofEpochDay(v.longValue())
        .withDayOfYear(1).toEpochDay.toInt
  }
}

/** Top-level + Serializable: the reducer ships inside the join's task
  * closure (an anonymous inner class would drag the non-serializable
  * bound function along).
  */
private[catalog] final class GraftBucketReducer(n: Int)
  extends org.apache.spark.sql.connector.catalog.functions.Reducer[Integer, Integer]
  with Serializable {
  override def reduce(v: Integer): Integer = v % n
}
