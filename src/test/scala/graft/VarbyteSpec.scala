package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.Varbyte

/** Property tests for the posting-block codec (SURVEY §5.3) —
  * seeded-random generation (no scalatestplus bridge offline).
  */
class VarbyteSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("varbyte roundtrip: arbitrary non-negative longs") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(300)
      val arr = Array.fill(n)(rnd.nextLong() & Long.MaxValue)
      assert(Varbyte.decode(Varbyte.encode(arr), n).toSeq == arr.toSeq)
    }
  }

  test("varbyte boundary values") {
    val edges = Array(0L, 1L, 127L, 128L, 16383L, 16384L, Int.MaxValue.toLong,
      1L << 35, Long.MaxValue)
    assert(Varbyte.decode(Varbyte.encode(edges), edges.length).toSeq == edges.toSeq)
  }

  test("delta roundtrip: sorted distinct doc ids") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(500)
      val arr = Array.fill(n)(rnd.nextLong() & ((1L << 40) - 1)).distinct.sorted
      if (arr.nonEmpty) {
        val dec = Varbyte.decodeDeltas(Varbyte.encodeDeltas(arr), arr.length)
        assert(dec.toSeq == arr.toSeq)
      }
    }
  }

  test("int roundtrip") {
    for (_ <- 1 to 100) {
      val n = rnd.nextInt(300)
      val arr = Array.fill(n)(rnd.nextInt(Int.MaxValue))
      assert(Varbyte.decodeInts(Varbyte.encodeInts(arr), n).toSeq == arr.toSeq)
    }
  }

  test("dense postings cost ~1 byte per gap") {
    val ids = Array.tabulate(1000)(i => 100L + i)
    val bytes = Varbyte.encodeDeltas(ids)
    assert(bytes.length == 1000) // first value 100 → 1 byte, 999 gaps of 1 → 1 byte each
  }
}
