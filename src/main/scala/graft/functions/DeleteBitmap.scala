package graft.functions

/** Compressed bitmap over row POSITIONS — the in-memory form of a
  * deletion vector (merge-on-read deletes), built on the public
  * Roaring design (Chambi, Lemire, Kaser, Godin — "Better bitmap
  * performance with Roaring bitmaps"; same two-level layout Delta's
  * DVs and Iceberg's position-delete indexes use): positions are
  * partitioned by their high bits (`pos >>> 16`) into 65,536-slot
  * containers; a sparse container stores its low 16 bits as a sorted
  * char array (2 bytes/position, binary-searched), a dense one (over
  * 4,096 entries) flips to a 1,024-word bitset (8 KB flat, O(1)
  * membership). Memory is therefore ≤ 2 bytes/deleted row however the
  * deletes are distributed — vs 8 bytes/row for a sorted Long array —
  * and membership is O(1) on the dense containers that dominate broad
  * deletes.
  *
  * The MANIFEST encoding stays the delta-varint stream the format has
  * always logged ([[graft.plans.SnapshotTable.FileEntry.dvStat]]):
  * this class is the runtime representation readers and writers
  * decode it into. Serializable, so scan factories broadcast it.
  */
final class DeleteBitmap private (
    private val keys: Array[Long],
    private val containers: Array[AnyRef]) extends Serializable {

  def isEmpty: Boolean = keys.length == 0
  def nonEmpty: Boolean = keys.length != 0

  def contains(pos: Long): Boolean = {
    if (pos < 0) return false
    val i = java.util.Arrays.binarySearch(keys, pos >>> 16)
    if (i < 0) false
    else containers(i) match {
      case a: Array[Char] =>
        java.util.Arrays.binarySearch(a, (pos & 0xffffL).toChar) >= 0
      case w: Array[Long] =>
        val low = (pos & 0xffffL).toInt
        (w(low >>> 6) & (1L << (low & 63))) != 0L
    }
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < containers.length) {
      containers(i) match {
        case a: Array[Char] => n += a.length
        case w: Array[Long] =>
          var j = 0
          while (j < w.length) { n += java.lang.Long.bitCount(w(j)); j += 1 }
      }
      i += 1
    }
    n
  }

  /** Ascending iterator over the set positions. */
  def iterator: Iterator[Long] = keys.iterator.zipWithIndex.flatMap {
    case (k, i) =>
      val hi = k << 16
      containers(i) match {
        case a: Array[Char] => a.iterator.map(c => hi | c.toLong)
        case w: Array[Long] =>
          Iterator.range(0, 65536).filter(low =>
            (w(low >>> 6) & (1L << (low & 63))) != 0L).map(low => hi | low)
      }
  }

  def toArray: Array[Long] = {
    val card = cardinality
    // cardinality.toInt silently wraps past 2^31 (reachable only by
    // raising graft.mor.maxDeleteRows) — fail loudly instead
    require(card <= Int.MaxValue,
      s"DeleteBitmap.toArray: $card positions exceed a JVM array; " +
        "use iterator instead")
    val out = new Array[Long](card.toInt)
    var i = 0
    iterator.foreach { p => out(i) = p; i += 1 }
    out
  }

  /** Union — merge of two ascending streams, O(total positions). */
  def union(other: DeleteBitmap): DeleteBitmap =
    if (isEmpty) other
    else if (other.isEmpty) this
    else DeleteBitmap.fromAscending(
      DeleteBitmap.mergeAscending(iterator, other.iterator))

  override def equals(o: Any): Boolean = o match {
    case b: DeleteBitmap =>
      cardinality == b.cardinality && iterator.sameElements(b.iterator)
    case _ => false
  }
  override def hashCode(): Int = java.util.Arrays.hashCode(keys)
}

object DeleteBitmap {

  val empty = new DeleteBitmap(Array.emptyLongArray, Array.empty)

  /** Entries beyond which a container flips from sorted-array to
    * bitset — the Roaring break-even (4,096 chars = the 8 KB bitset). */
  private val ArrayMax = 4096

  def fromSorted(positions: Array[Long]): DeleteBitmap =
    fromAscending(positions.iterator)

  /** Build from an ascending (duplicates tolerated) position stream —
    * one pass, no global materialization beyond the containers. */
  def fromAscending(it: Iterator[Long]): DeleteBitmap = {
    val keys = Array.newBuilder[Long]
    val containers = Array.newBuilder[AnyRef]
    var curKey = -1L
    var buf = new Array[Char](64)
    var n = 0
    var last = -1L
    def seal(): Unit = if (curKey >= 0) {
      keys += curKey
      containers += (
        if (n <= ArrayMax) java.util.Arrays.copyOf(buf, n)
        else {
          val w = new Array[Long](1024)
          var i = 0
          while (i < n) {
            val low = buf(i).toInt
            w(low >>> 6) |= 1L << (low & 63)
            i += 1
          }
          w
        })
    }
    it.foreach { pos =>
      require(pos >= 0 && pos >= last,
        s"positions must be ascending and non-negative, got $pos after $last")
      if (pos != last) {
        last = pos
        val k = pos >>> 16
        if (k != curKey) { seal(); curKey = k; n = 0 }
        if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
        buf(n) = (pos & 0xffffL).toChar
        n += 1
      }
    }
    seal()
    new DeleteBitmap(keys.result(), containers.result())
  }

  /** Merge two ascending iterators into one ascending stream
    * (duplicates may pass through; the builder drops them). */
  def mergeAscending(a: Iterator[Long], b: Iterator[Long]): Iterator[Long] =
    new Iterator[Long] {
      private val pa = a.buffered
      private val pb = b.buffered
      def hasNext: Boolean = pa.hasNext || pb.hasNext
      def next(): Long =
        if (!pb.hasNext) pa.next()
        else if (!pa.hasNext) pb.next()
        else if (pa.head <= pb.head) pa.next()
        else pb.next()
    }
}
