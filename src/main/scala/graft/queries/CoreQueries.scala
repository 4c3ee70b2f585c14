package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY §2.1/§2.2/§2.4): scans, projections,
  * filters, joins (broadcast + multi-way), hash aggregation, distinct, anti
  * join, top-k, histogram binning, parse-with-drop. Each query reads the
  * driver tables from `sfDir` and has a DuckDB oracle.
  *
  * Scale notes baked into the plans:
  *  - dimension tables (region/nation/customer) are broadcast — no shuffle of
  *    the fact side for those joins;
  *  - filters are plain column predicates on scan output → parquet
  *    pushdown/pruning via Catalyst;
  *  - aggregates are partial+final automatically (map-side combine).
  */
object CoreQueries {

  /** O? = reference operator ids from SURVEY §2. */
  val all: Seq[Q] = Seq(
    // TPC-H Q1-style pricing summary: scan + filter + hash agg (P3-scale).
    Q("q01_pricing_summary",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        li.where(col("l_shipdate") < expr("timestamp'2000-01-01'"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg( // round(…, k) on BOTH sides: FP-order determinism (FpAudit)
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
              .as("sum_disc_price"),
            round(avg(col("l_quantity")), 6).as("avg_qty"),
            round(avg(col("l_discount")), 6).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             |  round(avg(l_quantity), 6) AS avg_qty,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '2000-01-01'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // O2 analog: parse + malformed-drop semantics (try_cast, drop on failure).
    Q("q02_parse_extract",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_id"),
            expr("try_cast(regexp_extract(props, '([0-9]+)', 1) AS INT)").as("k"))
          .where(col("k").isNotNull),
      Some("""SELECT event_id,
             |  TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) AS k
             |FROM events
             |WHERE TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS INT) IS NOT NULL""".stripMargin)),

    // O3: weighted projection (pure Catalyst expression, no shuffle).
    Q("q03_weighted_proj",
      (s, dir) =>
        Tables(s, dir, "lineitem").select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
            (lit(1.0) + col("l_tax"))).as("net_price")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_price
             |FROM lineitem""".stripMargin)),

    // Broadcast join (small dim) + aggregation.
    Q("q11_segment_revenue",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val c = Tables(s, dir, "customer")
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(round(sum(col("o_totalprice")), 2).as("total_revenue"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, round(sum(o_totalprice), 2) AS total_revenue,
             |  count(*) AS n_orders
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // TPC-H Q3-style: 3-way join + agg + deterministic top-k (rounded key +
    // orderkey tiebreak so Spark and DuckDB select identical rows).
    Q("q12_top_orders",
      (s, dir) => {
        val c = Tables(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
        val o = Tables(s, dir, "orders")
        val li = Tables(s, dir, "lineitem")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_orderkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(10)
      },
      Some("""SELECT o_orderkey,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM customer
             |JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |GROUP BY o_orderkey
             |ORDER BY revenue DESC, o_orderkey
             |LIMIT 10""".stripMargin)),

    // TPC-H Q5-style: 5-way join, dims broadcast, filter pushed to region scan.
    Q("q13_nation_revenue",
      (s, dir) => {
        val r = Tables(s, dir, "region").where(col("r_name") === "EUROPE")
        val n = Tables(s, dir, "nation")
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders")
        val li = Tables(s, dir, "lineitem")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
             |FROM region
             |JOIN nation ON n_regionkey = r_regionkey
             |JOIN customer ON c_nationkey = n_nationkey
             |JOIN orders ON o_custkey = c_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE r_name = 'EUROPE'
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // P3: group-count aggregation (alert analytics shape).
    Q("q14_event_type_count",
      (s, dir) =>
        Tables(s, dir, "events").groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // P4: 10 equal-width histogram bins (identical float arithmetic both
    // engines: bucket from the exact global min/max).
    Q("q15_value_histogram",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
        val b = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
        ev.crossJoin(broadcast(b))
          .select(least(floor((col("value") - col("mn")) /
            ((col("mx") - col("mn")) / 10.0)).cast("int"), lit(9)).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .orderBy(col("bucket"))
      },
      Some("""WITH b AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
             |SELECT least(CAST(floor((value - mn) / ((mx - mn) / 10.0)) AS INT), 9) AS bucket,
             |  count(*) AS n
             |FROM events, b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Anti join (set-difference shape): customers with no high-value order.
    Q("q16_customers_without_big_orders",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val o = Tables(s, dir, "orders").where(col("o_totalprice") > 400000.0)
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |ORDER BY c_custkey""".stripMargin)),

    // Distinct (shuffle dedup).
    Q("q17_distinct_flags",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_linestatus")).distinct()
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // Rollup (hierarchical aggregation — free in Spark, absent in the
    // reference; SURVEY §2.4 grouping-sets row).
    Q("q34_rollup_pricing",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
             |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY 1, 2""".stripMargin)),

    // Set operations: INTERSECT / EXCEPT / UNION (set semantics).
    Q("q35_set_ops",
      (s, dir) => {
        val rich = Tables(s, dir, "customer")
          .where(col("c_acctbal") > 5000.0).select(col("c_custkey").as("key"))
        val big = Tables(s, dir, "orders")
          .where(col("o_totalprice") > 300000.0).select(col("o_custkey").as("key"))
        def counted(op: String, df: org.apache.spark.sql.DataFrame) =
          df.agg(count(lit(1)).as("n")).select(lit(op).as("op"), col("n"))
        counted("intersect", rich.intersect(big))
          .unionAll(counted("except", rich.except(big)))
          .unionAll(counted("union", rich.union(big).distinct()))
          .orderBy(col("op"))
      },
      Some("""WITH rich AS (SELECT c_custkey AS key FROM customer WHERE c_acctbal > 5000.0),
             |big AS (SELECT o_custkey AS key FROM orders WHERE o_totalprice > 300000.0)
             |SELECT 'intersect' AS op, count(*) AS n FROM (SELECT * FROM rich INTERSECT SELECT * FROM big) t
             |UNION ALL
             |SELECT 'except', count(*) FROM (SELECT * FROM rich EXCEPT SELECT * FROM big) t
             |UNION ALL
             |SELECT 'union', count(*) FROM (SELECT * FROM rich UNION SELECT * FROM big) t
             |ORDER BY op""".stripMargin)),

    // Analytic window functions (lag/delta/rank) — free in Spark, absent in
    // the reference (SURVEY §2.4 window-functions row).
    Q("q36_window_analytics",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        val wByValue = Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))
        Tables(s, dir, "events").select(
          col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"),
          rank().over(wByValue).as("value_rank"))
      },
      Some("""SELECT user_id, event_id, value,
             |  lag(value, 1) OVER w AS prev_value,
             |  value - lag(value, 1) OVER w AS delta,
             |  rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""".stripMargin)),

    // Supplier-side join + distinct aggregation (touches every driver
    // table at least once across the registry).
    Q("q40_supplier_parts",
      (s, dir) => {
        val sup = Tables(s, dir, "supplier")
        val li = Tables(s, dir, "lineitem")
        li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("s_suppkey"))
      },
      Some("""SELECT s_suppkey, s_name,
             |  count(DISTINCT l_partkey) AS distinct_parts,
             |  count(*) AS n_lines
             |FROM supplier JOIN lineitem ON l_suppkey = s_suppkey
             |GROUP BY s_suppkey, s_name ORDER BY s_suppkey""".stripMargin)),

    // JSON extraction (props payload) + distinct aggregation.
    Q("q39_json_props",
      (s, dir) =>
        Tables(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"),
            countDistinct(col("k")).as("distinct_k"),
            count(when(col("k").isNotNull, 1)).as("n_parsed"))
          .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT)) AS distinct_k,
             |  count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL THEN 1 END) AS n_parsed
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Skew-resistant two-stage (salted) aggregation: pre-aggregate on
    // (key, salt) so one hot key spreads over 16 reducers, then combine.
    // Same result as a direct groupBy — the oracle proves it — but the
    // shuffle profile survives a skewed key at 1000×. (AQE skew handling
    // covers joins; salting is the aggregation-side tool.)
    Q("q38_salted_agg",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        val salted = li
          .withColumn("salt", pmod(col("l_orderkey") * 2654435761L, lit(16)))
          .groupBy(col("l_returnflag"), col("salt"))
          .agg(sum(col("l_quantity")).as("part_qty"),
            count(lit(1)).as("part_n"))
        salted.groupBy(col("l_returnflag"))
          .agg(round(sum(col("part_qty")), 2).as("sum_qty"),
            sum(col("part_n")).as("n"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Salted JOIN (graft.analytics.SkewJoin.salted) — q38's two-phase
    // trick applied to a join: the big (skewed) side salts each row
    // deterministically into one of 8 shards, the small side replicates
    // 8×, and the hot key's rows spread across 8 reducers instead of
    // melting one. The oracle is the PLAIN join — salting must be
    // invisible in the result (SkewJoinSpec measures the partition
    // spread; round-4 evidence: unsalted hot reducer held 53% of rows,
    // salted max share 2.07× even). Mechanism demo at this scale (the
    // tier table would broadcast); the shape is for when the small side
    // is too big to broadcast AND a key is hot.
    Q("q84_skew_salted_join",
      (s, dir) => {
        // salt on the unique event_id: a content hash of repeated
        // near-identical (user_id, value) rows would stack the hot key
        // back onto one reducer (the reason saltCols is required)
        val ev = Tables(s, dir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
        val tiers = ev.select(col("user_id")).distinct()
          .select(col("user_id"), (col("user_id") % 5).as("tier"))
        graft.analytics.SkewJoin.salted(ev, tiers, "user_id", nSalts = 8,
            saltCols = Seq("event_id"))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_events"),
            round(sum(col("value")), 6).as("sum_value"))
          .orderBy(col("tier"))
      },
      Some("""WITH t AS (SELECT DISTINCT user_id, user_id % 5 AS tier
             |          FROM events)
             |SELECT tier, count(*) AS n_events,
             |  round(sum(e.value), 6) AS sum_value
             |FROM events e JOIN t USING (user_id)
             |GROUP BY tier ORDER BY tier""".stripMargin)),

    // Tumbling event-time windows (Spark's `window()` operator) — window
    // start emitted as epoch seconds so the oracle reduces to exact
    // integer arithmetic. The same expression drives streaming time
    // windows (readStream + withWatermark).
    Q("q42_tumbling_time_windows",
      (s, dir) => {
        val ts = timestamp_seconds(lit(1700000000L) + col("event_id") * 60)
        Tables(s, dir, "events")
          .groupBy(window(ts, "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"), round(avg(col("value")), 6).as("avg_value"))
          .select(col("w.start").cast("long").as("window_start"),
            col("event_type"), col("n"), col("avg_value"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""SELECT (1700000000 + event_id * 60) // 3600 * 3600 AS window_start,
             |  event_type, count(*) AS n, round(avg(value), 6) AS avg_value
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // HLL sketch distinct counts (no DuckDB oracle — sketches differ across
    // engines; the driver records the weaker rows-only check). The exact
    // distinct twin is q40; at 100 TB the sketch is the one you can afford.
    Q("q43_approx_distinct",
      (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
            count(lit(1)).as("n"))
          .orderBy(col("l_returnflag")),
      None),

    // Left outer join with null-aware counting.
    Q("q45_outer_join",
      (s, dir) => {
        val o = Tables(s, dir, "orders")
        val rich = Tables(s, dir, "customer")
          .where(col("c_acctbal") > 5000.0).select(col("c_custkey"))
        o.join(broadcast(rich), col("o_custkey") === col("c_custkey"), "left")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            count(col("c_custkey")).as("n_rich_customer_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  count(c_custkey) AS n_rich_customer_orders
             |FROM orders LEFT JOIN
             |  (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0) rc
             |  ON o_custkey = rc.c_custkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Semi join (EXISTS).
    Q("q46_semi_join",
      (s, dir) => {
        val c = Tables(s, dir, "customer")
        val big = Tables(s, dir, "orders").where(col("o_totalprice") > 400000.0)
        c.join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
          .orderBy(col("c_mktsegment"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders
             |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
             |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // As-of lookup composed from built-ins (preference (a) of the custom-
    // operator ladder): for every event, the most recent error event at or
    // before it in its user's stream — last_value(... IGNORE NULLS) over an
    // unbounded-preceding frame. No custom operator needed; the plan is one
    // per-key sort, which shards by user at scale.
    Q("q47_asof_last_error",
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)
        Tables(s, dir, "events").select(
          col("user_id"), col("event_id"),
          last(when(col("event_type") === "error", col("event_id")),
            ignoreNulls = true).over(w).as("last_error_id"))
          .withColumn("events_since_error",
            col("event_id") - col("last_error_id"))
      },
      Some("""SELECT user_id, event_id,
             |  last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_id,
             |  event_id - last_value(CASE WHEN event_type = 'error' THEN event_id END IGNORE NULLS)
             |    OVER (PARTITION BY user_id ORDER BY event_id
             |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS events_since_error
             |FROM events""".stripMargin)),

    // Date-range filter pushdown + agg.
    Q("q18_order_priority",
      (s, dir) =>
        Tables(s, dir, "orders")
          .where(col("o_orderdate") >= expr("timestamp'1997-01-01'") &&
            col("o_orderdate") < expr("timestamp'1998-01-01'"))
          .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
          .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))
  )
}
