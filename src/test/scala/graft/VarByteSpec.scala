package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.index.VarByte

class VarByteSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("round-trip: decode(encode(xs)) == xs for non-negative longs") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(200)
      val a = Array.fill(n)(rnd.nextLong() & Long.MaxValue)
      assert(VarByte.decode(VarByte.encode(a), n).toSeq == a.toSeq)
    }
  }

  test("delta round-trip for sorted non-negative longs") {
    for (_ <- 1 to 200) {
      val n = rnd.nextInt(200)
      val sorted = Array.fill(n)(rnd.nextLong() & (Long.MaxValue >> 1)).sorted
      assert(VarByte.decodeDeltas(VarByte.encodeDeltas(sorted), n).toSeq
        == sorted.toSeq)
    }
  }

  test("edge values") {
    for (v <- Seq(0L, 1L, 127L, 128L, 16383L, 16384L, Long.MaxValue)) {
      assert(VarByte.decode(VarByte.encode(Array(v)), 1)(0) == v)
    }
  }

  test("small values take one byte (compression actually compresses)") {
    val xs = Array.tabulate(1000)(i => (i % 128).toLong)
    assert(VarByte.encode(xs).length == 1000)
    // dense sorted ids → gaps of 1 → ~1 byte/posting vs 8 raw
    val ids = Array.tabulate(1000)(i => 1000000L + i)
    assert(VarByte.encodeDeltas(ids).length <= 1003)
  }

  test("negative values rejected") {
    intercept[IllegalArgumentException](VarByte.encode(Array(-1L)))
  }
}

/** Parity of the Scala docId twin with Spark's xxhash64 column. */
class DocIdParitySpec extends SparkSpec {
  import spark.implicits._
  test("docId(url) == xxhash64(url) & MaxValue for random urls") {
    val urls = (0 until 500).map(i => s"https://site${i % 97}.example/p/$i?x=${i * 31}")
    val fromCol = urls.toDF("url")
      .select($"url", graft.index.IndexBuild.docIdCol($"url").as("id"))
      .as[(String, Long)].collect().toMap
    urls.foreach { u =>
      assert(graft.index.IndexBuild.docId(u) == fromCol(u), s"mismatch for $u")
    }
  }
}
