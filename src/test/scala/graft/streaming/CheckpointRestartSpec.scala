package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** SURVEY §5.2 streaming-specific: restart-from-checkpoint resumes
  * identically — no lost and no duplicated alerts across a stop/restart,
  * with the count-window state recovered from the state store. Runs once
  * per state-store backend (default HDFS-backed + RocksDB — see
  * [[StateBackend]]); the provider is recorded in the checkpoint at first
  * start, so each scenario owns its checkpoint dir. */
class CheckpointRestartSpec extends AnyFunSuite with SparkTestBase {

  for (backend <- Seq("default", "rocksdb"))
    test(s"[$backend] stop mid-stream, restart from checkpoint: exact same alert set") {
    import spark.implicits._
    val rnd = new scala.util.Random(21)
    val rows = (0 until 60).map(i =>
      s"""{"key":${i % 2},"seq":${i / 2},"v":${rnd.nextDouble()}}""")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        String.join("\n", lines: _*).getBytes)

    def startQuery() = {
      val ds = spark.readStream.schema("key LONG, seq LONG, v DOUBLE")
        .json(s"$dir/in").as[Sample]
      // durable sink: the memory sink cannot recover from a checkpoint
      CountSlidingWindow.measures(ds, 20)
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/_ckpt")
        .outputMode("append").start()
    }
    def readOut() = spark.read.parquet(s"$dir/out").as[MeasureRow]

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    // explicit per-branch: defensive against any earlier
    // session-conf writer (runToTable now save/restores via
    // StateBackend.withRocksDb), so "default" unsets, not merely not-sets
    if (backend == "rocksdb") StateBackend.useRocksDb(spark)
    else spark.conf.unset(StateBackend.ProviderConfKey)
    val (afterFirst, all) = try {
      write("in/a.json", rows.take(44)) // 22 seqs/key: windows already firing
      val q1 = startQuery()
      q1.processAllAvailable()
      val n1 = readOut().count()
      q1.stop() // hard stop — state must live in the checkpoint, not the JVM

      write("in/b.json", rows.drop(44))
      val q2 = startQuery()
      q2.processAllAvailable()
      q2.stop()
      (n1, readOut().collect())
    } finally if (backend == "rocksdb")
      spark.conf.unset(StateBackend.ProviderConfKey)

    // batch truth over the full input
    val byKey = (0 until 60).map(i => (i % 2, i / 2, rows(i))).groupBy(_._1)
    val expected = (0 until 2).flatMap { k =>
      val vs = (0 until 30).map { s =>
        val json = byKey(k).find(_._2 == s).get._3
        json.split("\"v\":")(1).dropRight(1).toDouble
      }.toArray
      (19 until 30).flatMap(s => graft.measures.MeasuresRef
        .all(vs.slice(s - 19, s + 1)).map { case (stat, m) => (k.toLong, s.toLong, stat, m) })
    }
    assert(afterFirst > 0 && afterFirst < all.length)
    assert(all.length === expected.length, "restart lost or duplicated rows")
    val got = all.map(r => (r.key, r.seq, r.stat) -> r.m).toMap
    assert(got.size === all.length, "duplicate (key,seq,stat) rows after restart")
    expected.foreach { case (k, s, stat, m) =>
      assert(math.abs(got((k, s, stat)) - m) < 1e-9, s"($k,$s,$stat)")
    }
  }
}
