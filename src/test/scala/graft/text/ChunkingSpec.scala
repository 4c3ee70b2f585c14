package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ChunkingSpec extends AnyFunSuite with SparkTestBase {

  private def chunks(size: Int, stride: Int, texts: (Long, String)*)
      : Map[(Long, Long), Seq[String]] = {
    import spark.implicits._
    TextStats.chunk(texts.toDF("doc_id", "text"), size = size,
      stride = stride)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_id")) ->
        r.getSeq[String](2).toSeq)
      .toMap
  }

  test("windows overlap by size - stride and the tail clips") {
    // 10 tokens, size 4, stride 3 -> starts 0,3,6,9
    val m = chunks(4, 3,
      1L -> "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")
    assert(m((1L, 0L)) === Seq("t0", "t1", "t2", "t3"))
    assert(m((1L, 1L)) === Seq("t3", "t4", "t5", "t6"))
    assert(m((1L, 2L)) === Seq("t6", "t7", "t8", "t9"))
    assert(m((1L, 3L)) === Seq("t9")) // clipped tail
    assert(m.size === 4)
  }

  test("short and empty documents") {
    val m = chunks(64, 48,
      1L -> "just three tokens", // one chunk, shorter than size
      2L -> "", // no chunks
      3L -> "x") // one 1-token chunk
    assert(m((1L, 0L)) === Seq("just", "three", "tokens"))
    assert(m((3L, 0L)) === Seq("x"))
    assert(m.keys.map(_._1).toSet === Set(1L, 3L))
  }

  test("stride == size tiles without overlap or gaps") {
    val m = chunks(3, 3, 1L -> "a b c d e f g")
    assert(m((1L, 0L)) === Seq("a", "b", "c"))
    assert(m((1L, 1L)) === Seq("d", "e", "f"))
    assert(m((1L, 2L)) === Seq("g"))
    // concatenation reconstructs the token stream exactly
    assert((0L to 2L).flatMap(i => m((1L, i))) ===
      Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("invalid size/stride rejected") {
    import spark.implicits._
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      TextStats.chunk(df, size = 4, stride = 5) // stride > size: gaps
    }
    intercept[IllegalArgumentException] {
      TextStats.chunk(df, size = 0, stride = 1)
    }
  }
}
