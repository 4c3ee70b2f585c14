package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Local dev harness: run every registry query against a sf dir, print row
  * counts + wall time, fail loudly on errors. Not part of the driver
  * contract. Usage: runMain graft.DevRunner [sfDir] [namePrefix] */
object DevRunner {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = if (args.length > 1) args(1) else ""
    val spark = SparkSession.builder()
      .master("local[8]")
      .withExtensions(new graft.functions.GraftExtensions)
      .appName("graft-dev")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.length > 2 && args(2) == "explain") {
      Registry.all.filter(_.name.startsWith(prefix)).foreach { q =>
        println(s"===== ${q.name}")
        q.run(spark, sfDir).explain("formatted")
      }
      spark.stop()
      return
    }
    var failed = 0
    if (prefix.isEmpty) {
      // driver t1 smoke contract: entry() on sf0.001 must return rows > 0
      val n = SparkEntry.entry(spark).count()
      println(s"[dev] entry() smoke rows=$n ${if (n > 0) "OK" else "FAILED"}")
      if (n == 0) failed += 1
    }
    // "force3": the bench's warm shape — run 3×, print each (first is
    // cold: codegen + session caches; min of the rest ≈ bench min-of-3)
    val reps = if (args.length > 2 && args(2) == "force3") 3 else 1
    Registry.all.filter(_.name.startsWith(prefix)).foreach { q =>
      val t0 = System.nanoTime()
      try {
        val df = q.run(spark, sfDir)
        val n =
          if (args.length > 2 && args(2).startsWith("force")) {
            df.write.format("noop").mode("overwrite").save()
            var r = 1
            while (r < reps) {
              val tr = System.nanoTime()
              q.run(spark, sfDir).write.format("noop")
                .mode("overwrite").save()
              println(f"[dev] ${q.name}%-28s rerun ${(System.nanoTime() - tr) / 1e9}%.2fs")
              r += 1
            }
            -1L
          } else df.count()
        println(f"[dev] ${q.name}%-28s rows=$n%-8d ${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"[dev] ${q.name} FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"[dev] done, failed=$failed")
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
