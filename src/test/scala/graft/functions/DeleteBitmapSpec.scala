package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SnapshotTable.FileEntry

/** The Roaring-style deletion-vector bitmap: container flips, O(1)
  * membership, ascending iteration, union, and round-trips through the
  * manifest's delta-varint encoding. */
class DeleteBitmapSpec extends AnyFunSuite {

  test("sparse (array) containers: membership and iteration") {
    val pos = Array(0L, 1L, 65535L, 65536L, 1000000L)
    val bm = DeleteBitmap.fromSorted(pos)
    assert(pos.forall(bm.contains))
    assert(!bm.contains(2L) && !bm.contains(65537L) && !bm.contains(-1L))
    assert(bm.cardinality == 5L)
    assert(bm.toArray.toSeq == pos.toSeq)
  }

  test("dense container: the 4096-entry flip to a bitset keeps every answer") {
    // one 65536-slot span, 10k entries (every 6th) → bitset container
    val pos = (0 until 60000 by 6).map(_.toLong).toArray
    val bm = DeleteBitmap.fromSorted(pos)
    assert(bm.cardinality == pos.length.toLong)
    assert(pos.forall(bm.contains))
    assert((1 until 60000 by 6).forall(p => !bm.contains(p.toLong)))
    assert(bm.toArray.toSeq == pos.toSeq)
  }

  test("duplicates collapse; unsorted input rejected") {
    val bm = DeleteBitmap.fromSorted(Array(3L, 3L, 3L, 9L))
    assert(bm.cardinality == 2L && bm.contains(3L) && bm.contains(9L))
    intercept[IllegalArgumentException](
      DeleteBitmap.fromSorted(Array(5L, 4L)))
    intercept[IllegalArgumentException](
      DeleteBitmap.fromSorted(Array(-1L)))
  }

  test("union merges across container kinds and spans") {
    val sparse = DeleteBitmap.fromSorted(Array(1L, 200000L))
    val dense = DeleteBitmap.fromSorted(
      (0 until 30000 by 3).map(_.toLong).toArray)
    val u = sparse.union(dense)
    assert(u.cardinality == dense.cardinality + 2L) // 1 and 200000 are new
    assert(u.contains(1L) && u.contains(200000L) && u.contains(29999L - 2L))
    assert(u.toArray.toSeq == (Array(1L, 200000L) ++
      (0 until 30000 by 3).map(_.toLong)).distinct.sorted.toSeq)
    // empty identities
    assert(DeleteBitmap.empty.union(sparse) eq sparse)
    assert(sparse.union(DeleteBitmap.empty) eq sparse)
  }

  test("manifest round-trip: varint encode of the iterator decodes to the same bitmap") {
    val pos = (Array(0L, 7L) ++ (100000L until 140000L by 2) ++
      Array(1L << 33)).sorted
    val bm = DeleteBitmap.fromSorted(pos)
    val enc = FileEntry.encodeDvAscending(bm.iterator)
    val back = DeleteBitmap.fromAscending(FileEntry.dvIterator(enc))
    assert(back == bm)
    assert(back.cardinality == pos.distinct.length.toLong)
    assert(back.contains(1L << 33))
  }

  test("compression: a dense 1M-row vector stays ≤ 2 bytes/row in serialized form") {
    val pos = (0L until 2000000L by 2).toArray // 1M deletes over 2M rows
    val bm = DeleteBitmap.fromSorted(pos)
    val enc = FileEntry.encodeDvAscending(bm.iterator)
    // base64 of varint deltas (gap 2 → 1 byte each): ~1.34 B/row
    assert(enc.length < 2 * pos.length,
      s"serialized DV too large: ${enc.length} chars for ${pos.length} rows")
    assert(bm.cardinality == pos.length.toLong)
  }
}
