package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.analytics.SkewJoin

class SkewJoinSpec extends AnyFunSuite with SparkTestBase {

  test("salted join == plain join on a hot-key distribution") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    // 90% of rows hit key 0 — the hot-reducer shape
    val big = (1 to 5000).map(i =>
      (if (rnd.nextDouble() < 0.9) 0L else rnd.nextInt(50).toLong, i))
      .toDF("k", "payload")
    val small = (0 until 50).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, "k")
      .select($"k", $"payload", $"name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = SkewJoin.salted(big, small, "k", nSalts = 8,
      saltCols = Seq("payload"))
      .select(big("k"), $"payload", $"name").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted

    assert(salted.length === plain.length)
    assert(salted === plain)
  }

  test("salting evidence: hot key's rows actually spread across reducers") {
    // Execution-level proof (not just result equality) that salting does
    // its job: with one key owning 50% of rows, count the rows each
    // POST-SHUFFLE partition of the join receives (spark_partition_id()
    // evaluated on the join output, before the counting aggregation's own
    // exchange). Unsalted shuffle join → the hot key's partition holds
    // ≥ half of all rows; salted on (k, salt) → the max partition stays
    // within 2× a perfectly even spread. Auto-broadcast is disabled for
    // the measurement — salting exists precisely for the case where the
    // small side cannot broadcast.
    import spark.implicits._
    import org.apache.spark.sql.functions.spark_partition_id
    val total = 20000
    val nKeys = 64
    val big = (1 to total).map(i =>
      (if (i % 2 == 0) 0L else (i % nKeys).toLong, i)).toDF("k", "payload")
    val small = (0 until nKeys).map(k => (k.toLong, s"dim_$k")).toDF("k", "name")

    def partitionCounts(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.groupBy(spark_partition_id().as("pid")).count()
        .collect().map(_.getLong(1))

    // AQE would coalesce this test-sized shuffle into one partition and
    // erase the per-reducer signal; at real scale partitions stay separate,
    // so the measurement runs with static partitioning.
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val unsalted = partitionCounts(big.join(small, "k"))
      val salted = partitionCounts(
        SkewJoin.salted(big, small, "k", nSalts = 32, saltCols = Seq("payload")))
      val evenShare = total / 32.0
      info(f"unsalted max partition = ${unsalted.max} (${unsalted.max * 100.0 / total}%.0f%% of rows)")
      info(f"salted   max partition = ${salted.max} (even share $evenShare%.0f)")
      assert(unsalted.sum === total && salted.sum === total)
      // the hot reducer: at least the hot key's 50% lands on one partition
      assert(unsalted.max >= total / 2, s"expected hot partition, got ${unsalted.max}")
      // salted: a small multiple of the perfectly even share — the salt
      // splits the hot key into equal (key, salt) groups, but WHICH
      // reducer each group hashes to can stack a few together (measured
      // 2.07–2.5x here; 3x bounds that placement variance) — and at
      // least 4x better than the hot reducer
      assert(salted.max <= 3.0 * evenShare,
        s"salting left a hot partition: ${salted.max} > 3.0*$evenShare")
      assert(salted.max * 4 <= unsalted.max,
        s"salting must beat the hot reducer by >=4x: ${salted.max} vs ${unsalted.max}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
