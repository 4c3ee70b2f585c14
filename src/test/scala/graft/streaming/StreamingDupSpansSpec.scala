package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streamed duplicated-position set == batch q74 detector's, with the
  * corpus split across micro-batches (gram-count state must persist: a
  * gram seen once in batch 1 and once in batch 2 must flush BOTH
  * positions when the second arrives). */
class StreamingDupSpansSpec extends AnyFunSuite with SparkTestBase {

  test("streamed gram-state duplicated positions == batch dup-hash join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sdspans").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))

    // real duplicated-span structure: sf0.001 documents (the corpus q74
    // runs on), json-staged in two file batches so boilerplate gram pairs
    // land in different micro-batches
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id")).collect()
    def jline(r: org.apache.spark.sql.Row): String = {
      val txt = r.getString(1).replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"doc_id":${r.getLong(0)},"text":"$txt"}"""
    }
    val (first, second) = docs.splitAt(docs.length / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/a.json"),
      first.map(jline).mkString("\n").getBytes)

    val streamDocs = spark.readStream.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val q = StreamingDupSpans
      .duplicatedPositions(StreamingDupSpans.gramPositions(streamDocs))
      .writeStream.format("memory").queryName("sdspans_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    val afterBatch1 =
      try {
        q.processAllAvailable()
        val n1 = spark.table("sdspans_out").count()
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.json"),
          second.map(jline).mkString("\n").getBytes)
        q.processAllAvailable()
        n1
      } finally q.stop()

    val streamed = spark.table("sdspans_out")
      .select(col("docId"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    // exactly-once: every duplicated position emitted in ONE batch only
    assert(streamed.length === streamed.distinct.length,
      "a position was emitted twice")

    // batch truth: q74's duplicated-position set (gram frequency >=2 over
    // the SAME corpus, joined back to positions)
    val batchDocs = spark.read.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val pos = graft.dedup.Dedup.gramPositions(batchDocs).cache()
    val dupH = pos.groupBy(col("hv")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2).select(col("hv"))
    val batch = pos.join(dupH, "hv")
      .select(col("doc_id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    pos.unpersist()

    assert(streamed.toSet === batch)
    assert(batch.nonEmpty, "sf0.001 must contain duplicated spans")
    // the split must actually exercise cross-batch state: some duplicated
    // positions only became duplicated after batch 2 arrived
    assert(afterBatch1 < batch.size,
      s"all $afterBatch1 duplicated positions resolved in batch 1 — " +
        "the corpus split exercises no cross-batch gram state")
  }

  test("idleTtl drops idle grams: state shrinks, straddling duplicates " +
    "lost, fresh duplicates still emitted") {
    // The lifetime-state contract, executed (mirrors the near-dup TTL
    // spec): with idleTtl set, a gram idle past the TTL is forgotten —
    // (a) its state row is removed at the next data trigger, (b) a
    // duplicate pair straddling the idle gap is NOT emitted (its first
    // occurrence was dropped: the documented loss), (c) occurrences
    // arriving within the TTL still flush exactly as without one.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sds_ttl").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def feed(name: String, rows: Seq[(Long, Long, Int)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/in/$name.json"),
        rows.map { case (hv, d, p) => s"""{"hv":$hv,"docId":$d,"pos":$p}""" }
          .mkString("\n").getBytes)

    val ttl = java.time.Duration.ofSeconds(1)
    // no-data batches off: timeouts then fire only on data-triggered
    // batches, so the test is deterministic (see the near-dup TTL spec)
    val prevNoData =
      spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val grams = spark.readStream.schema("hv LONG, docId LONG, pos INT")
      .json(s"$dir/in").as[StreamingDupSpans.GramPos]
    val q = StreamingDupSpans.duplicatedPositions(grams, idleTtl = Some(ttl))
      .writeStream.format("memory").queryName("sds_ttl_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      def emitted(): Set[(Long, Int)] =
        spark.table("sds_ttl_out").select(col("docId"), col("pos"))
          .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

      // batch 1: gram A's first occurrence; keepalive gram K's first
      feed("b1", Seq((100L, 1L, 0), (200L, 10L, 0)))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal === 2)
      assert(emitted() === Set.empty) // both grams below the gate

      // idle gap > TTL, then data only for K: K's second occurrence
      // flushes both of K's positions; A's deadline passed -> removed
      Thread.sleep(2500)
      feed("b2", Seq((200L, 11L, 0)))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal <= 1,
        "idle gram A must be dropped")
      assert(emitted() === Set((10L, 0), (11L, 0)))

      // batch 3: gram A twice in quick succession — its count restarted,
      // so (1,0) (the pre-gap occurrence) is LOST; (2,0)/(3,0) flush
      feed("b3", Seq((100L, 2L, 0), (100L, 3L, 0)))
      q.processAllAvailable()
      assert(emitted() === Set((10L, 0), (11L, 0), (2L, 0), (3L, 0)),
        "straddling position (1,0) must be lost, fresh ones emitted")
    } finally {
      q.stop()
      spark.conf.set(
        "spark.sql.streaming.noDataMicroBatches.enabled", prevNoData)
    }
  }
}
