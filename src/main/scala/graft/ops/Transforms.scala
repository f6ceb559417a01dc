package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hidden partitioning (B161) — Iceberg-style TRANSFORM partition specs:
  * `day(ts)`, `month(ts)`, `year(ts)`, `bucket(n, col)`,
  * `truncate(n, col)`. The table partitions by a DERIVED column the
  * user never sees: writers derive it from the source column on every
  * publish (so it can never go stale — an UPDATE that moves `ts` moves
  * the row's partition too), readers drop it, and
  * [[graft.plans.HiddenPartitionRule]] rewrites predicates on the
  * SOURCE column into predicates on the derived directory column — the
  * "hidden partitioning" contract: users query raw `ts`, the scan
  * prunes `_tp_ts__day=…` directories.
  *
  * Derived columns are SELF-DESCRIBING by name —
  * `_tp_<source>__<tag>` with tag ∈ {day, month, year, b<N>, t<N>} —
  * so the existing partition-spec machinery (the `graft.partition` DDL,
  * version-local `_PSPEC` stamps, metadata-only evolution legs) carries
  * hidden specs with ZERO new metadata: any component holding a
  * partition column list can recover the transform by parsing the name.
  *
  * Derivation expressions and predicate rewrites MUST agree exactly —
  * both live here so the agreement is structural:
  *   day/month/year → UTC calendar date from epoch micros
  *                    (DATE-typed directories; see below)
  *   hour(ts)       → hours since epoch (INT directories, the Iceberg
  *                    encoding — epoch math, timezone-free by nature)
  *   bucket(n)      → `pmod(hash(col), n)` (Murmur3, Spark's `hash`)
  *   truncate(n)    → strings: `substring(col, 1, n)`;
  *                    integrals: `col - pmod(col, n)` (floors negatives)
  *
  * TIMEZONE CONTRACT (round-13): temporal derivations are pinned to
  * UTC, the Iceberg rule. A timestamp's day is computed from its epoch
  * micros (`date_from_unix_date(floor(unix_micros/µs-per-day))`), NEVER
  * through the session timezone — the pre-round-13 `to_date` spelling
  * evaluated under the WRITER's zone while the rule's injected image
  * evaluated under the READER's, so a table written under UTC and read
  * under another zone could silently prune the boundary-day directory
  * holding matching rows. Epoch math makes writer and reader agree by
  * construction whatever either session's `spark.sql.session.timeZone`
  * says (HiddenPartitionSpec flips the zone between write and read and
  * asserts both pruning and results). Existing directories are
  * unchanged: under the UTC sessions every prior version was written
  * in, `to_date` and the epoch-day formula produce identical values.
  */
object Transforms {

  private[graft] val MicrosPerDay = 86400000000L
  private[graft] val MicrosPerHour = 3600000000L

  /** UTC calendar day of a temporal column, timezone-free: epoch-day
    * floor-division on the instant's micros. The rule's literal image
    * ([[graft.plans.HiddenPartitionRule]]) mirrors the same IEEE double
    * `floor(us / µs-per-day)` in JVM arithmetic, so derive and image
    * agree bit-for-bit at every boundary. DATE sources pass through
    * (already a calendar day, no zone involved).
    */
  private def utcDay(c: Column, st: DataType): Column = st match {
    case DateType => c.cast(DateType)
    case _ => date_from_unix_date(
      floor(unix_micros(c) / lit(MicrosPerDay)).cast(IntegerType))
  }

  /** Reserved derived-column prefix. Data columns must never use it —
    * readers hide everything under it ([[requireNoReservedData]]).
    */
  val Prefix = "_tp_"

  sealed trait T {
    def src: String
    /** The derived column's name (`_tp_<src>__<tag>`). */
    def colName: String
    /** The derived column's type given the source's. */
    def dataType(srcType: DataType): DataType
    /** The derivation expression — the write side. */
    def derive(c: Column, srcType: DataType): Column
    /** Human spelling (`day(ts)`), for DESCRIBE/errors. */
    def spec: String
    /** Validate the source type; message on refusal. */
    def check(srcType: DataType): Option[String]
  }

  final case class Day(src: String) extends T {
    val colName = s"$Prefix${src}__day"
    def dataType(st: DataType) = DateType
    def derive(c: Column, st: DataType) = utcDay(c, st)
    def spec = s"day($src)"
    def check(st: DataType) = st match {
      case TimestampType | DateType => None
      case o => Some(s"day() needs a timestamp/date source, got ${o.simpleString}")
    }
  }

  final case class Month(src: String) extends T {
    val colName = s"$Prefix${src}__month"
    def dataType(st: DataType) = DateType
    // trunc is pure DATE arithmetic (proleptic-Gregorian month floor),
    // zone-free once the day is pinned to UTC
    def derive(c: Column, st: DataType) = trunc(utcDay(c, st), "month")
    def spec = s"month($src)"
    def check(st: DataType) = st match {
      case TimestampType | DateType => None
      case o => Some(s"month() needs a timestamp/date source, got ${o.simpleString}")
    }
  }

  final case class Year(src: String) extends T {
    val colName = s"$Prefix${src}__year"
    def dataType(st: DataType) = DateType
    def derive(c: Column, st: DataType) = trunc(utcDay(c, st), "year")
    def spec = s"year($src)"
    def check(st: DataType) = st match {
      case TimestampType | DateType => None
      case o => Some(s"year() needs a timestamp/date source, got ${o.simpleString}")
    }
  }

  /** `hour(ts)` — hours since epoch (Iceberg's encoding): INT
    * directories, epoch floor-division, timezone-free by construction.
    * TIMESTAMP sources only (an hour of a DATE is not meaningful; a
    * TIMESTAMP_NTZ column should be cast to TIMESTAMP by the caller,
    * declaring which instant its wall-clock means).
    */
  final case class Hour(src: String) extends T {
    val colName = s"$Prefix${src}__hour"
    def dataType(st: DataType) = IntegerType
    def derive(c: Column, st: DataType) =
      floor(unix_micros(c) / lit(MicrosPerHour)).cast(IntegerType)
    def spec = s"hour($src)"
    def check(st: DataType) = st match {
      case TimestampType => None
      case o => Some(s"hour() needs a timestamp source, got ${o.simpleString}")
    }
  }

  final case class Bucket(n: Int, src: String) extends T {
    require(n > 0, s"bucket count must be positive, got $n")
    val colName = s"$Prefix${src}__b$n"
    def dataType(st: DataType) = IntegerType
    def derive(c: Column, st: DataType) = pmod(hash(c), lit(n))
    def spec = s"bucket($n, $src)"
    def check(st: DataType) = st match {
      case ByteType | ShortType | IntegerType | LongType |
          StringType | DateType | TimestampType => None
      case o => Some(s"bucket() needs an integral/string/date/timestamp " +
        s"source, got ${o.simpleString}")
    }
  }

  final case class Truncate(n: Int, src: String) extends T {
    require(n > 0, s"truncate width must be positive, got $n")
    val colName = s"$Prefix${src}__t$n"
    def dataType(st: DataType) = st
    def derive(c: Column, st: DataType) = st match {
      case StringType => substring(c, 1, n)
      case _ => c - pmod(c, lit(n).cast(st))
    }
    def spec = s"truncate($n, $src)"
    def check(st: DataType) = st match {
      case StringType | ByteType | ShortType | IntegerType | LongType => None
      case o => Some(s"truncate() needs a string/integral source, got ${o.simpleString}")
    }
  }

  /** Tag parameter as a positive Int, or None. TOTAL by design: parse
    * runs inside [[graft.plans.HiddenPartitionRule]] on every Filter
    * attribute of every session plan — including non-Graft frames the
    * reserved-prefix guard never saw — so a column merely SHAPED like a
    * derived name (`_tp_x__b0`, `_tp_x__b99999999999`) must fall back
    * to "not a transform", never crash an unrelated query's
    * optimization (round-12 advisor finding).
    */
  private def posInt(s: String): Option[Int] =
    if (s.nonEmpty && s.length <= 9 && s.forall(_.isDigit)) {
      val n = s.toInt
      if (n >= 1) Some(n) else None
    } else None

  /** Parse a derived COLUMN NAME back to its transform, or None for a
    * plain (identity) partition column — total: malformed tags return
    * None (see [[posInt]]).
    */
  def parse(name: String): Option[T] = {
    if (!name.startsWith(Prefix)) return None
    val body = name.drop(Prefix.length)
    val i = body.lastIndexOf("__")
    if (i <= 0) return None
    val (src, tag) = (body.substring(0, i), body.substring(i + 2))
    tag match {
      case "day" => Some(Day(src))
      case "month" => Some(Month(src))
      case "year" => Some(Year(src))
      case "hour" => Some(Hour(src))
      case t if t.startsWith("b") => posInt(t.drop(1)).map(Bucket(_, src))
      case t if t.startsWith("t") => posInt(t.drop(1)).map(Truncate(_, src))
      case _ => None
    }
  }

  private val HourSpec = """(?i)^\s*hour\s*\(\s*([^\s(),]+)\s*\)\s*$""".r
  private val DaySpec = """(?i)^\s*day\s*\(\s*([^\s(),]+)\s*\)\s*$""".r
  private val MonthSpec = """(?i)^\s*month\s*\(\s*([^\s(),]+)\s*\)\s*$""".r
  private val YearSpec = """(?i)^\s*year\s*\(\s*([^\s(),]+)\s*\)\s*$""".r
  private val BucketSpec = """(?i)^\s*bucket\s*\(\s*(\d+)\s*,\s*([^\s(),]+)\s*\)\s*$""".r
  private val TruncSpec = """(?i)^\s*truncate\s*\(\s*(\d+)\s*,\s*([^\s(),]+)\s*\)\s*$""".r

  /** Parse a human PARTITION SPEC entry (`day(ts)`, `bucket(16, id)`,
    * `truncate(4, code)`); None for a plain column name (identity).
    * Anything shaped like a call but not a supported transform fails
    * loudly rather than silently becoming an identity column.
    */
  def parseSpec(s: String): Option[T] = s match {
    case HourSpec(c) => Some(Hour(c))
    case DaySpec(c) => Some(Day(c))
    case MonthSpec(c) => Some(Month(c))
    case YearSpec(c) => Some(Year(c))
    // DDL-door parameters fail LOUDLY on out-of-range values (the spec
    // is user input), unlike column-name parse which must stay total
    case BucketSpec(n, c) => Some(Bucket(posInt(n).getOrElse(
      throw new IllegalArgumentException(
        s"bucket count out of range in 'bucket($n, $c)'")), c))
    case TruncSpec(n, c) => Some(Truncate(posInt(n).getOrElse(
      throw new IllegalArgumentException(
        s"truncate width out of range in 'truncate($n, $c)'")), c))
    case other =>
      require(!other.contains("("),
        s"unsupported partition transform '$other' — supported: " +
          "hour(col), day(col), month(col), year(col), bucket(n, col), " +
          "truncate(n, col)")
      None
  }

  /** Split a comma-separated partition-spec LIST on commas OUTSIDE
    * parentheses, so `'bucket(8, id), day(ts)'` tokenizes to
    * `bucket(8, id)` and `day(ts)` — the SQL CALL door's parameter
    * format (round-12 advisor finding: a naive split fragmented every
    * parameterized transform into unparseable halves). Unbalanced
    * parens fail loudly.
    */
  def splitSpecList(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' =>
        depth -= 1
        require(depth >= 0, s"unbalanced ')' in partition spec list: $s")
        cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case ch => cur += ch
    }
    require(depth == 0, s"unbalanced '(' in partition spec list: $s")
    out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Derive (or RE-derive — staleness is impossible by construction)
    * every transform column named in `pcols` from its source column.
    * Identity partition columns pass through untouched. Fails loudly
    * when a source column is missing from the frame.
    */
  def derive(df: DataFrame, pcols: Seq[String]): DataFrame =
    pcols.flatMap(parse).foldLeft(df) { (d, t) =>
      val f = d.schema.find(_.name.equalsIgnoreCase(t.src)).getOrElse(
        throw new IllegalArgumentException(
          s"hidden partition ${t.spec}: source column ${t.src} is not in " +
            s"the frame (${d.columns.mkString(", ")})"))
      d.withColumn(t.colName, t.derive(col(s"`${f.name}`"), f.dataType))
    }

  /** Hidden (derived) column names present in `names`. */
  def hiddenIn(names: Seq[String]): Seq[String] =
    names.filter(n => parse(n).isDefined)

  /** Drop every derived column from a frame — the read-side hiding. */
  def dropHidden(df: DataFrame): DataFrame = {
    val h = hiddenIn(df.columns.toSeq)
    if (h.isEmpty) df else df.drop(h: _*)
  }

  /** The bucket number [[Bucket.derive]] assigns to CATALYST-internal
    * value `v` — the driver-side twin of `pmod(hash(c), n)` (Murmur3,
    * seed 42, the `hash()` SQL function's parameters). Shared by the
    * scan wrapper's implied bucket-equality pushdown and the catalog's
    * `bucket` [[org.apache.spark.sql.connector.catalog.functions
    * .ScalarFunction]], so every spelling of "which bucket is value v
    * in" is the one the writer used. A null value hashes to the seed,
    * matching `hash(NULL)` exactly.
    */
  def bucketValue(v: Any, dt: DataType, n: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(v, dt, 42L).toInt
    ((h % n) + n) % n
  }

  /** Parse a derived-directory VALUE string (the `<v>` of
    * `_tp_…=<v>/`) into the CATALYST-internal value of the transform's
    * result type — what tags a file group with its partition key for
    * storage-partitioned joins (round-15, B193). Spark renders DATE
    * partition values as `yyyy-MM-dd`, integrals as decimal strings,
    * strings Hive-escaped; a null-source directory
    * (`__HIVE_DEFAULT_PARTITION__`) or any unparseable spelling returns
    * None — the caller disables SPJ wholesale rather than mis-group.
    */
  private[graft] def pathValue(raw: String, t: T,
      srcType: DataType): Option[Any] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    if (raw == ExternalCatalogUtils.DEFAULT_PARTITION_NAME) return None
    val s = ExternalCatalogUtils.unescapePathName(raw)
    t.dataType(srcType) match {
      case DateType =>
        scala.util.Try(java.time.LocalDate.parse(s).toEpochDay.toInt).toOption
      case IntegerType => s.toIntOption
      case LongType => s.toLongOption
      case ShortType => s.toShortOption
      case ByteType => s.toByteOption
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(s))
      case _ => None
    }
  }

  /** Refuse DATA columns in the reserved namespace: readers hide
    * everything matching the derived-name shape, so a user column named
    * like one would silently vanish from every read.
    */
  def requireNoReservedData(cols: Seq[String], pcols: Seq[String],
      what: String): Unit = {
    val bad = cols.filter(c => c.startsWith(Prefix) &&
      !pcols.exists(_.equalsIgnoreCase(c)))
    require(bad.isEmpty,
      s"$what: column name(s) ${bad.mkString(", ")} use the reserved " +
        s"'$Prefix' prefix (hidden-partitioning derived columns) — " +
        "rename them")
  }
}
