package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** The streaming winnowing contract: streamed fingerprint-bucket
  * candidates == the batch fingerprint-collision self-join exactly while
  * every bucket stays below `maxBucket`, and a bounded (overflowing) run
  * emits a strict SUBSET — divergence is the documented hot-bucket bound,
  * never extra pairs. */
class StreamingWinnowSpec extends AnyFunSuite with SparkTestBase {

  private def jline(docId: Long, text: String): String = {
    val t = text.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"doc_id":$docId,"text":"$t"}"""
  }

  private def runStream(dir: String, batches: Seq[Seq[String]],
      maxBucket: Int, name: String): Set[(Long, Long)] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b0.json"),
      batches.head.mkString("\n").getBytes)
    val streamDocs = spark.readStream.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val q = StreamingWinnow
      .candidatePairs(StreamingWinnow.fingerprintBuckets(streamDocs),
        maxBucket = maxBucket)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      batches.zipWithIndex.drop(1).foreach { case (b, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/in/b$i.json"),
          b.mkString("\n").getBytes)
        q.processAllAvailable()
      }
    } finally q.stop()
    spark.table(name)
      .select(col("docA"), col("docB")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def batchPairs(dir: String): Set[(Long, Long)] = {
    val docs = spark.read.schema("doc_id LONG, text STRING").json(s"$dir/in")
    val e = graft.text.TextStats.winnowing(docs)
      .select(col("doc_id"), explode(col("fingerprints")).as("fp")).cache()
    e.as("a")
      .join(e.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("below the bucket bound, streamed candidates == batch " +
      "fingerprint self-join (state persists across micro-batches)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_swinnow").toString
    // real corpus slice (includes planted near-dups), two micro-batches so
    // colliding docs straddle the state boundary; maxBucket above any
    // fingerprint's document frequency in the slice → no overflow
    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
        "documents")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .limit(120).collect()
      .map(r => jline(r.getLong(0), r.getString(1)))
    val (a, b) = docs.splitAt(docs.length / 2)
    val streamed = runStream(dir, Seq(a.toSeq, b.toSeq),
      maxBucket = 100000, name = "swinnow_eq")
    val batch = batchPairs(dir)
    assert(batch.nonEmpty)
    assert(streamed === batch,
      s"missing=${(batch -- streamed).size} extra=${(streamed -- batch).size}")
  }

  test("over the bucket bound, streamed candidates are a strict subset — " +
      "the hot-bucket cap drops pairs, never invents them") {
    val dir = java.nio.file.Files.createTempDirectory("graft_swinnow2").toString
    // six docs sharing ONLY one boilerplate substring (each with a unique
    // prefix): every shared fingerprint is the same hot bucket, so with
    // maxBucket=2 the 4 unstored docs' mutual pairs MUST be missing
    val boiler = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (1L to 6L).map(i =>
      jline(i, s"unique prefix number $i with words ${"x" * i.toInt} " + boiler))
    val streamed = runStream(dir, Seq(docs),
      maxBucket = 2, name = "swinnow_cap")
    val batch = batchPairs(dir)
    assert(batch.size === 15, s"all 15 pairs must share the boilerplate: $batch")
    assert(streamed.subsetOf(batch), s"extras: ${streamed -- batch}")
    assert(streamed.size < batch.size,
      s"cap=2 over 6 docs must drop pairs (got ${streamed.size})")
  }
}
