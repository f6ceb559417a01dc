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
  *   day/month/year → `to_date`/`trunc` (DATE-typed directories)
  *   bucket(n)      → `pmod(hash(col), n)` (Murmur3, Spark's `hash`)
  *   truncate(n)    → strings: `substring(col, 1, n)`;
  *                    integrals: `col - pmod(col, n)` (floors negatives)
  */
object Transforms {

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
    def derive(c: Column, st: DataType) = to_date(c)
    def spec = s"day($src)"
    def check(st: DataType) = st match {
      case TimestampType | DateType => None
      case o => Some(s"day() needs a timestamp/date source, got ${o.simpleString}")
    }
  }

  final case class Month(src: String) extends T {
    val colName = s"$Prefix${src}__month"
    def dataType(st: DataType) = DateType
    def derive(c: Column, st: DataType) = trunc(to_date(c), "month")
    def spec = s"month($src)"
    def check(st: DataType) = st match {
      case TimestampType | DateType => None
      case o => Some(s"month() needs a timestamp/date source, got ${o.simpleString}")
    }
  }

  final case class Year(src: String) extends T {
    val colName = s"$Prefix${src}__year"
    def dataType(st: DataType) = DateType
    def derive(c: Column, st: DataType) = trunc(to_date(c), "year")
    def spec = s"year($src)"
    def check(st: DataType) = st match {
      case TimestampType | DateType => None
      case o => Some(s"year() needs a timestamp/date source, got ${o.simpleString}")
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

  /** Parse a derived COLUMN NAME back to its transform, or None for a
    * plain (identity) partition column.
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
      case t if t.startsWith("b") && t.drop(1).nonEmpty && t.drop(1).forall(_.isDigit) =>
        Some(Bucket(t.drop(1).toInt, src))
      case t if t.startsWith("t") && t.drop(1).nonEmpty && t.drop(1).forall(_.isDigit) =>
        Some(Truncate(t.drop(1).toInt, src))
      case _ => None
    }
  }

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
    case DaySpec(c) => Some(Day(c))
    case MonthSpec(c) => Some(Month(c))
    case YearSpec(c) => Some(Year(c))
    case BucketSpec(n, c) => Some(Bucket(n.toInt, c))
    case TruncSpec(n, c) => Some(Truncate(n.toInt, c))
    case other =>
      require(!other.contains("("),
        s"unsupported partition transform '$other' — supported: " +
          "day(col), month(col), year(col), bucket(n, col), truncate(n, col)")
      None
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
