package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streamed LSH candidate pairs == batch band-key self-join candidates,
  * with duplicates straddling micro-batches (bucket state must persist). */
class StreamingNearDupSpec extends AnyFunSuite with SparkTestBase {

  test("streaming bucket-state candidates == batch band self-join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sneardup").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))

    // real near-dup structure: take sf0.001 documents, json-staged in two
    // file batches so LSH-colliding docs land in different micro-batches
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
    val banded = StreamingNearDup.bandKeys(streamDocs)
      .select(col("bucket"), col("doc_id").as("docId"))
      .as[StreamingNearDup.BucketDoc]
    val q = StreamingNearDup.candidatePairs(banded)
      .writeStream.format("memory").queryName("sneardup_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.json"),
        second.map(jline).mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("sneardup_out")
      .select(col("docA"), col("docB")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // batch truth: same band keys, self-join, distinct pairs
    val batchDocs = spark.read.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val bb = StreamingNearDup.bandKeys(batchDocs).cache()
    val batch = bb.as("x")
      .join(bb.as("y"),
        col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id"), col("y.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed === batch)
    assert(batch.nonEmpty) // sf0.001 has planted near-dups: must collide
  }
}
