package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Recurrence-proofing for the round-9 regression class: the driver's
  * testdata has shipped `events.ts` as BOTH parquet TIMESTAMP(NANOS)
  * (rounds 1–7) and plain TIMESTAMP(MICROS) (round 8+). The nanos form is
  * unreadable by Spark except through the nanos-as-long escape hatch
  * (SPARK-40819), which surfaces raw nanos in a BIGINT; the micros form
  * read through the same forced-BIGINT schema silently yields MICROS
  * mis-scaled as nanos — the q62 red row (every event collapsed into one
  * 1970 hour). `graft.queries.Tables` must normalize BOTH encodings to
  * the same BIGINT-nanos contract.
  *
  * The two fixture files carry the IDENTICAL five logical timestamps,
  * written once with timestamp[ns] and once with timestamp[us] (pyarrow,
  * parquet 2.6) — binary-committed because Spark itself cannot author a
  * TIMESTAMP(NANOS) file. */
class EventsTsEncodingSpec extends AnyFunSuite with SparkTestBase {

  private def read(name: String): Map[Long, Long] = {
    // Tables special-cases the table name "events"; point it at a temp dir
    // holding the fixture under that name.
    val dir = java.nio.file.Files.createTempDirectory("graft_tsenc")
    val src = getClass.getResource(s"/$name").toURI
    java.nio.file.Files.copy(java.nio.file.Paths.get(src),
      dir.resolve("events.parquet"))
    graft.queries.Tables(spark, dir.toString, "events")
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("nanos- and micros-encoded events normalize to identical " +
      "BIGINT-nanos ts") {
    val nanos = read("events_nanos.parquet")
    val micros = read("events_micros.parquet")
    assert(nanos === micros)
    // spot-pin one absolute value so BOTH paths can't be wrong together:
    // 2024-01-01T00:00:07.179575Z = 1704067207.179575 s since epoch
    assert(nanos(1L) === 1704067207179575000L)
    // and the microsecond digits survive (the mis-scale bug divided them
    // away): 2024-01-01T12:34:56.789012Z
    assert(nanos(2L) % 1000000000L === 789012000L)
  }
}
