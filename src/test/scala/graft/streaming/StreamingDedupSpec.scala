package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Streaming exact deduplication: the dedup operators generalize to streams
  * through Structured Streaming's stateful dropDuplicates — digest state per
  * key, same shape as q20's batch hash-groupBy. Asserted equal to batch
  * distinct over the same files. */
class StreamingDedupSpec extends AnyFunSuite with SparkTestBase {

  test("streaming dropDuplicates on content digest == batch distinct") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        String.join("\n", lines: _*).getBytes)
    // 40 docs, 15 distinct texts, duplicates straddling the two batches
    val texts = (0 until 40).map(i => s"""{"id":$i,"text":"doc content ${i % 15}"}""")
    write("in/a.json", texts.take(25))

    val stream = spark.readStream.schema("id LONG, text STRING")
      .json(s"$dir/in")
      .select(col("id"), md5(col("text")).as("digest"))
      .dropDuplicates("digest")
    val q = stream.writeStream.format("memory").queryName("sdedup_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      write("in/b.json", texts.drop(25))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("sdedup_out")
    assert(got.count() === 15)
    assert(got.select("digest").distinct().count() === 15)
    // batch truth: same digest set
    val batch = spark.read.schema("id LONG, text STRING").json(s"$dir/in")
      .select(md5(col("text")).as("digest")).distinct()
    assert(got.select("digest").except(batch).count() === 0)
    assert(batch.except(got.select("digest")).count() === 0)
  }
}
