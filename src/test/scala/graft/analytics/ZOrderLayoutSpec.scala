package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Layout.zorderKey: bit-exactness, and the actual pruning claim — a
  * z-ordered layout bounds EVERY interleaved dimension per partition,
  * where a single-column sort bounds only its own. */
class ZOrderLayoutSpec extends AnyFunSuite with SparkTestBase {

  test("zorderKey reproduces the Morton interleave bit-for-bit") {
    import spark.implicits._
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pts = Seq((5L, 3L), (0L, 0L), (1L, 0L), (0L, 1L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L))
    val out = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.zorderKey(col("x"), col("y")).as("z"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(out((x, y)) === morton(x, y), s"($x, $y)")
    }
    // (5, 3) by hand: x bits 1,0,1 at even positions = 1+0+16,
    // y bits 1,1 at odd positions = 2+8 → 27
    assert(out((5L, 3L)) === 27L)
  }

  test("range-partitioning by zkey bounds vy per partition; sorting by " +
      "ux alone leaves every partition spanning all of vy") {
    // events sf0.001, quantized as q88: ux = user_id, vy = floor(value).
    // value is right-skewed (most rows sit at small vy), so the selective
    // predicate is the tail vy ≥ 128 — on the non-sort dimension of a
    // plain ux sort it must prune most z-partitions and none of the ux
    // ones.
    val ev = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id").bitwiseAND(lit(65535L)).as("ux"),
        floor(col("value")).cast("long").bitwiseAND(lit(65535L)).as("vy"))
      .select(col("ux"), col("vy"),
        Layout.zorderKey(col("ux"), col("vy")).as("zkey"))

    // per-partition vy bounding interval — the file/row-group min/max
    // stats a writer would record after this range partitioning
    def vyBoxes(sortCol: String): Array[(Long, Long)] =
      ev.repartitionByRange(16, col(sortCol))
        .select(spark_partition_id().as("p"), col("vy"))
        .groupBy(col("p"))
        .agg(min(col("vy")).as("lo"), max(col("vy")).as("hi"))
        .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))

    def touched(boxes: Array[(Long, Long)]): Int =
      boxes.count { case (_, hi) => hi >= 128 }

    val zBoxes = vyBoxes("zkey")
    val xBoxes = vyBoxes("ux")
    val (zTouched, xTouched) = (touched(zBoxes), touched(xBoxes))
    // ux-sorted: vy is unconstrained inside every partition — a vy
    // predicate reads ~everything
    assert(xTouched >= 14, s"ux layout: $xTouched of ${xBoxes.length}")
    // z-ordered: the same predicate skips most partitions outright
    assert(zTouched <= 4,
      s"z layout touched $zTouched of ${zBoxes.length}: " +
        zBoxes.sortBy(_._1).mkString(", "))
    assert(zTouched < xTouched)
  }

  test("compactionPlan rewrites small files into ceil(n/target) " +
      "right-sized ones, preserving rows; clusterBy keeps z-locality") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact")
    val frag = s"$dir/fragmented"
    val out = s"$dir/compacted"
    val ev = graft.queries.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("value"))
    ev.repartition(64).write.parquet(frag) // the small-file problem
    def partFiles(p: String) =
      new java.io.File(p).listFiles().count(_.getName.endsWith(".parquet"))
    assert(partFiles(frag) === 64)

    val fragDf = spark.read.parquet(frag)
    val total = fragDf.count()
    val target = (total + 1) / 2 // → exactly 2 output files
    val (planned, n) = Layout.compactionPlan(fragDf, target)
    assert(n === total)
    planned.write.parquet(out)
    assert(partFiles(out) === 2)
    assert(spark.read.parquet(out).count() === total)

    // clustered variant: each output file carries a bounded zkey range
    val zOut = s"$dir/zcompacted"
    val withZ = fragDf.select(col("event_id"),
      Layout.zorderKey(
        col("user_id").bitwiseAND(lit(65535L)),
        floor(col("value")).cast("long").bitwiseAND(lit(65535L))).as("zkey"))
    val (zPlanned, _) = Layout.compactionPlan(withZ, (total + 3) / 4,
      clusterBy = Seq(col("zkey")))
    zPlanned.write.parquet(zOut)
    assert(partFiles(zOut) === 4)
    // files are range-disjoint in zkey — the pruning property compaction
    // must not destroy
    val perFile = spark.read.parquet(zOut)
      .select(input_file_name().as("f"), col("zkey"))
      .groupBy(col("f"))
      .agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, perFile.toSeq)
      case _ =>
    }
  }

  test("compactionGroups assigns files to begins-before-the-cut groups") {
    import spark.implicits._
    // cumulative starts: a=0 b=10 c=30 d=60 e=100; target 50 →
    // groups floor(start/50) = 0,0,0,1,2 (d overshoots group 0's cut:
    // a file is never split, it belongs where it begins)
    val listing = Seq(("a", 10L), ("b", 20L), ("c", 30L), ("d", 40L),
      ("e", 50L)).toDF("file", "bytes")
    val got = Layout
      .compactionGroups(listing, "file", "bytes", targetBytes = 50L)
      .collect().map(r => r.getAs[String]("file") -> r.getAs[Long]("group_id"))
      .toMap
    assert(got === Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 1L,
      "e" -> 2L))
  }
}
