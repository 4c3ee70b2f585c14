package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.sources.Sources

/** The curation MAP stages (JSONL parse/drop, PII redaction, Gopher
  * gates) are stateless per-row transforms, so the exact same Column
  * expressions must run unchanged over a stream and agree row-for-row
  * with the batch path on the same files — the incremental-ingest shape:
  * documents land as JSONL micro-batches and are parsed, scrubbed, and
  * gated on arrival, no state, no watermark, append output. */
class StreamingCurationSpec extends AnyFunSuite with SparkTestBase {

  private val schema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING")

  /** The shared curation projection — built once, applied to BOTH the
    * batch and the streaming frame (the point of the spec: one
    * definition, two execution modes). */
  private def curate(parsed: DataFrame): DataFrame =
    graft.text.TextStats.gopherGates(parsed, minWords = 5)
      .select(col("doc_id"), col("n_words"), col("pass"),
        md5(graft.text.Redact.redactPii(col("text"))).as("red_digest"))

  test("streamed JSONL ingest + redact + gates == batch, garbage dropped") {
    val dir = java.nio.file.Files.createTempDirectory("graft_scur").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    def jline(id: Long, text: String, lang: String): String = {
      val t = text.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
      s"""{"doc_id":$id,"text":"$t","lang":"$lang"}"""
    }
    def feed(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/in/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))

    // batch 1: real docs from the corpus + planted PII + garbage
    val docs = graft.queries
      .Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"), col("lang"))
      .orderBy(col("doc_id")).limit(40).collect()
    val (first, second) = docs.splitAt(20)
    feed("b1", first.map(r => jline(r.getLong(0),
      r.getString(1) + " mail a@b.io ssn 123-45-6789", r.getString(2))) ++
      Seq("{not json", """{"doc_id":null,"text":"dropme"}"""))

    val q = curate(Sources.readJsonlStream(spark, s"$dir/in", schema,
        requiredCols = Seq("doc_id", "text")))
      .writeStream.format("memory").queryName("scur_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("scur_out").count() === 20) // garbage dropped
      // batch 2: more docs, a phone, more garbage
      feed("b2", second.map(r => jline(r.getLong(0),
        r.getString(1) + " tel (555) 123-4567", r.getString(2))) ++
        Seq("""{"doc_id":"nope","text":"bad id"}"""))
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.table("scur_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getString(3)))
    assert(streamed.length === 40)
    assert(streamed.map(_._1).distinct.length === 40) // append: no dupes

    val batch = curate(Sources.readJsonl(spark, s"$dir/in", schema,
        requiredCols = Seq("doc_id", "text"))).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getString(3)))
    assert(streamed.toSet === batch.toSet)
    assert(batch.length === 40)
    // the redaction stage did real work: the digests differ from the
    // UNredacted texts' digests (every doc carries planted PII)
    val rawDigests = Sources.readJsonl(spark, s"$dir/in", schema,
        requiredCols = Seq("doc_id", "text"))
      .select(col("doc_id"), md5(col("text")).as("d")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    streamed.foreach { case (id, _, _, redDigest) =>
      assert(redDigest !== rawDigests(id), s"doc $id was not redacted")
    }
  }
}
