package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Minimal 64-bit roaring bitmap for deletion vectors (SURVEY §2B B135;
  * the compressed per-file position-set encoding Delta deletion vectors
  * and Iceberg v3 position deletes standardized on — see the public
  * Roaring paper, Chambi et al., "Better bitmap performance with Roaring
  * bitmaps"). Implemented from scratch on the public container design —
  * no external dependency:
  *
  *  - a position (a row index within one parquet file, `>= 0`) splits
  *    into a 48-bit container KEY (`pos >>> 16`) and a 16-bit LOW part;
  *  - each container holds the low parts for one key, as either a
  *    sorted short ARRAY (≤ 4096 entries — ≤ 8 KiB) or a 8 KiB BITSET
  *    (> 4096 entries), whichever is smaller; a container never exceeds
  *    8 KiB, so a vector over a 10M-row file with every row deleted is
  *    ~1.25 MiB instead of 80 MB of (file, row_index) parquet rows;
  *  - serialization is a flat container dump (magic, count, then per
  *    container: key, type, cardinality, payload) — self-contained
  *    bytes safe to store in a parquet BINARY column and OR-merge
  *    without decoding to positions.
  *
  * Deletion vectors only ever GROW within a version lineage (compaction
  * purges by dropping the sidecar wholesale), so union is the only
  * merge operation readers and writers need: a MOR commit appends a
  * delta bitmap per touched file and the read side ORs per file.
  */
object Roaring {

  private val Magic = 0x47524252 // "GRBR"
  private val ArrayMax = 4096

  /** One container: `low` holds sorted unsigned-short low parts when
    * `bits == null`, else `bits` is a 1024-long (8 KiB) bitset and
    * `low` is ignored. `card` is the container cardinality either way.
    */
  private[graft] final class Container(var low: Array[Short], var bits: Array[Long], var card: Int)

  private def newBitset(): Array[Long] = new Array[Long](1024)

  private def toBitset(c: Container): Unit = {
    val b = newBitset()
    var i = 0
    while (i < c.card) { val v = c.low(i) & 0xFFFF; b(v >>> 6) |= (1L << (v & 63)); i += 1 }
    c.bits = b; c.low = null
  }

  /** Mutable build state: insertion-ordered container map (sorted at
    * serialization). Accepts duplicates (idempotent) and unsorted input.
    */
  private final class Builder {
    val containers = new java.util.TreeMap[Long, Container]()

    def add(pos: Long): Unit = {
      require(pos >= 0, s"negative position $pos")
      val key = pos >>> 16
      val low = (pos & 0xFFFF).toInt
      var c = containers.get(key)
      if (c == null) { c = new Container(new Array[Short](8), null, 0); containers.put(key, c) }
      if (c.bits != null) {
        val w = low >>> 6; val m = 1L << (low & 63)
        if ((c.bits(w) & m) == 0L) { c.bits(w) |= m; c.card += 1 }
      } else {
        // binary search in the sorted prefix [0, card)
        var lo = 0; var hi = c.card - 1; var found = false
        while (lo <= hi && !found) {
          val mid = (lo + hi) >>> 1
          val mv = c.low(mid) & 0xFFFF
          if (mv == low) found = true
          else if (mv < low) lo = mid + 1
          else hi = mid - 1
        }
        if (!found) {
          if (c.card == ArrayMax) { toBitset(c); add(pos) }
          else {
            if (c.card == c.low.length) {
              val grown = new Array[Short](math.min(c.low.length * 2, ArrayMax))
              System.arraycopy(c.low, 0, grown, 0, c.card); c.low = grown
            }
            System.arraycopy(c.low, lo, c.low, lo + 1, c.card - lo)
            c.low(lo) = low.toShort; c.card += 1
          }
        }
      }
    }

    def serialize(): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(Magic)
      out.writeByte(1)
      out.writeInt(containers.size)
      containers.forEach { (key, c) =>
        out.writeLong(key)
        // a bitset container that shrank below the threshold never
        // happens (no removal), so the stored form is whatever the
        // build chose — both forms round-trip
        if (c.bits != null) {
          out.writeByte(1); out.writeInt(c.card)
          var i = 0; while (i < 1024) { out.writeLong(c.bits(i)); i += 1 }
        } else {
          out.writeByte(0); out.writeInt(c.card)
          var i = 0; while (i < c.card) { out.writeShort(c.low(i)); i += 1 }
        }
      }
      out.flush(); bos.toByteArray
    }
  }

  /** Encode an iterator of row positions (any order, duplicates folded). */
  def fromPositions(positions: Iterator[Long]): Array[Byte] = {
    val b = new Builder
    positions.foreach(b.add)
    b.serialize()
  }

  def fromPositions(positions: Array[Long]): Array[Byte] =
    fromPositions(positions.iterator)

  private[graft] def readContainers(bytes: Array[Byte]): java.util.TreeMap[Long, Container] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a graft roaring bitmap (bad magic)")
    val ver = in.readByte()
    require(ver == 1, s"unsupported roaring version $ver")
    val n = in.readInt()
    val m = new java.util.TreeMap[Long, Container]()
    var i = 0
    while (i < n) {
      val key = in.readLong()
      val typ = in.readByte()
      val card = in.readInt()
      if (typ == 1) {
        val bits = newBitset()
        var w = 0; while (w < 1024) { bits(w) = in.readLong(); w += 1 }
        m.put(key, new Container(null, bits, card))
      } else {
        val low = new Array[Short](card)
        var j = 0; while (j < card) { low(j) = in.readShort(); j += 1 }
        m.put(key, new Container(low, null, card))
      }
      i += 1
    }
    m
  }

  /** OR-merge any number of serialized bitmaps into one. */
  def unionAll(chunks: Iterator[Array[Byte]]): Array[Byte] = {
    val acc = new java.util.TreeMap[Long, Container]()
    chunks.foreach { bytes =>
      readContainers(bytes).forEach { (key, c) =>
        val prev = acc.get(key)
        if (prev == null) acc.put(key, c)
        else acc.put(key, merge(prev, c))
      }
    }
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(Magic); out.writeByte(1); out.writeInt(acc.size)
    acc.forEach { (key, c) =>
      out.writeLong(key)
      if (c.bits != null) {
        out.writeByte(1); out.writeInt(c.card)
        var i = 0; while (i < 1024) { out.writeLong(c.bits(i)); i += 1 }
      } else {
        out.writeByte(0); out.writeInt(c.card)
        var i = 0; while (i < c.card) { out.writeShort(c.low(i)); i += 1 }
      }
    }
    out.flush(); bos.toByteArray
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    unionAll(Iterator(a, b))

  private def merge(a: Container, b: Container): Container = {
    if (a.bits == null && b.bits == null) {
      // sorted-array merge; promote if the union crosses the threshold
      val outArr = new Array[Short](math.min(a.card + b.card, ArrayMax + 1))
      var i = 0; var j = 0; var k = 0
      var overflow = false
      while ((i < a.card || j < b.card) && !overflow) {
        val av = if (i < a.card) a.low(i) & 0xFFFF else Int.MaxValue
        val bv = if (j < b.card) b.low(j) & 0xFFFF else Int.MaxValue
        val v = math.min(av, bv)
        if (av == v) i += 1
        if (bv == v) j += 1
        if (k == ArrayMax) overflow = true
        else { outArr(k) = v.toShort; k += 1 }
      }
      if (!overflow) new Container(outArr, null, k)
      else {
        val c = new Container(null, newBitset(), 0)
        var card = 0
        val bits = c.bits
        def set(v: Int): Unit = {
          val w = v >>> 6; val m = 1L << (v & 63)
          if ((bits(w) & m) == 0L) { bits(w) |= m; card += 1 }
        }
        var x = 0; while (x < a.card) { set(a.low(x) & 0xFFFF); x += 1 }
        x = 0; while (x < b.card) { set(b.low(x) & 0xFFFF); x += 1 }
        c.card = card; c
      }
    } else {
      val bits = newBitset()
      var card = 0
      def orIn(c: Container): Unit =
        if (c.bits != null) { var w = 0; while (w < 1024) { bits(w) |= c.bits(w); w += 1 } }
        else { var i = 0; while (i < c.card) { val v = c.low(i) & 0xFFFF; bits(v >>> 6) |= (1L << (v & 63)); i += 1 } }
      orIn(a); orIn(b)
      var w = 0; while (w < 1024) { card += java.lang.Long.bitCount(bits(w)); w += 1 }
      new Container(null, bits, card)
    }
  }

  /** Total set bits — O(containers), no position expansion. */
  def cardinality(bytes: Array[Byte]): Long = {
    var total = 0L
    readContainers(bytes).forEach((_, c) => total += c.card)
    total
  }

  /** Membership test without position expansion: container lookup by
    * key, then a bitset probe or binary search in the sorted array —
    * O(log) per call, the per-row cost of the scan-time [[RoaringLookup]]
    * probe.
    */
  /** Membership of the 16-bit value `v` in ONE container. */
  private[graft] def containerContains(c: Container, v: Int): Boolean =
    if (c.bits != null) (c.bits(v >>> 6) & (1L << (v & 63))) != 0L
    else {
      var lo = 0; var hi = c.card - 1; var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        val mv = c.low(mid) & 0xFFFF
        if (mv == v) found = true
        else if (mv < v) lo = mid + 1
        else hi = mid - 1
      }
      found
    }

  private[graft] def containsIn(
      containers: java.util.TreeMap[Long, Container], pos: Long): Boolean = {
    if (pos < 0) return false
    val c = containers.get(pos >>> 16)
    if (c == null) false
    else containerContains(c, (pos & 0xFFFF).toInt)
  }

  /** All positions, ascending. */
  def positions(bytes: Array[Byte]): Iterator[Long] = {
    import scala.jdk.CollectionConverters._
    readContainers(bytes).entrySet().iterator().asScala.flatMap { e =>
      val key = e.getKey; val c = e.getValue
      if (c.bits != null)
        (0 until 65536).iterator
          .filter(v => (c.bits(v >>> 6) & (1L << (v & 63))) != 0L)
          .map(v => (key << 16) | v)
      else (0 until c.card).iterator.map(i => (key << 16) | (c.low(i) & 0xFFFF).toLong)
    }
  }
}

/** Read-side probe over a whole deletion vector: (file key → OR-merged
  * bitmap) entries, shipped once per stage inside the plan's reference
  * objects and lazily parsed per JVM — the zero-join spelling of
  * vector subtraction ([[graft.functions.DvProbe]] calls [[contains]]
  * from generated code, so the membership test stays inside
  * whole-stage codegen). Top-level class (not nested in [[Roaring]])
  * because generated Java must name the type.
  *
  * Keys are pre-hashed as [[UTF8String]] so the per-row lookup does no
  * string conversion; parsing is eager within the lazy init (the vector
  * is metadata-scale — compressed bitmaps, never positions).
  */
final class RoaringLookup(entries: Array[(String, Array[Byte])])
  extends Serializable {

  @transient private lazy val parsed = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String,
      java.util.TreeMap[Long, Roaring.Container]](entries.length * 2 + 1)
    entries.foreach { case (f, b) =>
      m.put(org.apache.spark.unsafe.types.UTF8String.fromString(f),
        Roaring.readContainers(b))
    }
    m
  }

  def isEmpty: Boolean = entries.isEmpty

  def contains(file: org.apache.spark.unsafe.types.UTF8String, pos: Long): Boolean = {
    val cs = parsed.get(file)
    cs != null && Roaring.containsIn(cs, pos)
  }
}
