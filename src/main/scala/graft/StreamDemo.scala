package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.min

import graft.streaming._

/** Runnable example of the count-window streaming operator on a real file
  * source with checkpointing: writes sample JSON, streams it in two
  * micro-batches, prints alert counts. Usage: runMain graft.StreamDemo */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("graft-stream-demo")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val rnd = new scala.util.Random(5)
    val rows = (0 until 40).map(i => s"""{"key":1,"seq":$i,"v":${rnd.nextDouble()}}""")
    def write(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name"),
        String.join("\n", lines: _*).getBytes)

    write("part1.json", rows.take(25))
    val ds = spark.readStream.schema("key LONG, seq LONG, v DOUBLE")
      .json(dir).as[Sample]
    val q = CountSlidingWindow.alerts(ds, Map("mean" -> 1e9), 30)
      .writeStream.format("memory").queryName("alerts_out")
      .option("checkpointLocation", s"$dir/_ckpt").outputMode("append").start()
    q.processAllAvailable()
    val afterFirst = spark.table("alerts_out").count()
    write("part2.json", rows.drop(25))
    q.processAllAvailable()
    val afterSecond = spark.table("alerts_out").count()
    q.stop()
    println(s"[demo] alerts after batch1(25 rows)=$afterFirst after batch2(40 rows)=$afterSecond")
    println("[demo] first alert at seq = " +
      spark.table("alerts_out").agg(min("seq")).head().getLong(0))
    spark.stop()
  }
}
