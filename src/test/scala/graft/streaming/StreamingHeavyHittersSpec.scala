package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SpaceSaving guarantees of the streamed summaries, checked against
  * batch exact counts on real corpus tokens split across micro-batches
  * (shard state must persist between batches). */
class StreamingHeavyHittersSpec extends AnyFunSuite with SparkTestBase {

  private val NShards = 8
  private val K = 16

  test("shardCol (codegen'd pmod(xxhash64)) equals the typed shardOf on " +
      "the corpus vocabulary and adversarial strings (ShardAgreementSpec)") {
    import spark.implicits._
    val vocab = graft.queries.Tables(spark, "/root/testdata/sf0.001",
      "documents")
      .select(explode(graft.dedup.Dedup.tokens(col("text"))).as("token"))
      .distinct().as[String].collect().toSeq
    val extra = Seq("", "a", "µ-unicode", "ÿ", "0", "long" * 100,
      "tab\tnewline\n")
    for (ns <- Seq(1, 4, 8, 31)) {
      val got = (vocab ++ extra).toDF("token")
        .select(col("token"),
          StreamingHeavyHitters.shardCol(col("token"), ns).as("shard"))
        .collect().map(r => r.getString(0) -> r.getInt(1))
      got.foreach { case (t, s) =>
        assert(s === StreamingHeavyHitters.shardOf(t, ns),
          s"disagreement on '$t' at nShards=$ns")
        assert(s >= 0 && s < ns)
      }
    }
  }

  test("streamed shard summaries satisfy the SpaceSaving bounds") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_shh").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))

    val docs = graft.queries.Tables(spark, "/root/testdata/sf0.001",
      "documents").select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    def jline(r: org.apache.spark.sql.Row): String = {
      val txt = r.getString(1).replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"doc_id":${r.getLong(0)},"text":"$txt"}"""
    }
    val (first, second) = docs.splitAt(docs.length / 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/a.json"),
      first.map(jline).mkString("\n").getBytes)

    def tokens(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.dedup.Dedup.tokens(col("text"))).as("token"))
      .select(StreamingHeavyHitters.shardCol(col("token"), NShards)
        .as("shard"), col("token"))

    val streamDocs = spark.readStream.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val q = StreamingHeavyHitters
      .heavyHitters(tokens(streamDocs).as[StreamingHeavyHitters.Tok], k = K)
      .writeStream.format("memory").queryName("shh_out")
      .option("checkpointLocation", s"$dir/_ckpt")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/in/b.json"),
        second.map(jline).mkString("\n").getBytes)
      q.processAllAvailable()
    } finally q.stop()

    // current answer = each shard's max-nProcessed generation
    val rows = spark.table("shh_out").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4))) // (shard, n, token, est, err)
    val maxN = rows.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._2).max
    }
    val latest = rows.filter(r => r._2 == maxN(r._1))
      .map(r => (r._1, r._3) -> (r._2, r._4, r._5)).toMap

    val batchDocs = spark.read.schema("doc_id LONG, text STRING")
      .json(s"$dir/in")
    val exact = tokens(batchDocs).groupBy(col("shard"), col("token"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val shardN = exact.groupBy(_._1._1).map { case (s, m) =>
      s -> m.values.sum
    }

    assert(latest.nonEmpty)
    // (1) est >= true, (2) est - err <= true for every summarized token
    latest.foreach { case ((shard, tok), (_, est, err)) =>
      val truth = exact((shard, tok))
      assert(est >= truth, s"undercount for $tok: $est < $truth")
      assert(est - err <= truth, s"error bound broken for $tok")
    }
    // (3) no false negatives above the n/k threshold
    exact.foreach { case ((shard, tok), c) =>
      if (c > shardN(shard).toDouble / K)
        assert(latest.contains((shard, tok)),
          s"heavy token $tok (count $c of ${shardN(shard)}) missing")
    }
  }
}
