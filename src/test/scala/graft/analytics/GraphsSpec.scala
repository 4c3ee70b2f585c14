package graft.analytics

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphsSpec extends AnyFunSuite with SparkTestBase {

  private def ranksOf(edges: Seq[(String, String, Double)], iters: Int,
      damping: Double = 0.85): Map[String, Double] = {
    import spark.implicits._
    Graphs.pageRank(edges.toDF("src", "dst", "w"), iters, damping)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("symmetric 2-cycle stays uniform at any damping") {
    val r = ranksOf(Seq(("a", "b", 1.0), ("b", "a", 1.0)), iters = 5)
    assert(math.abs(r("a") - 0.5) < 1e-12)
    assert(math.abs(r("b") - 0.5) < 1e-12)
  }

  test("rank mass is conserved with dangling nodes") {
    // c is dangling (no out-edges): its mass must redistribute, not leak
    val r = ranksOf(Seq(("a", "b", 1.0), ("b", "c", 1.0)), iters = 4)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, s"mass leaked: $r")
    assert(r("c") > r("a"), "sink of the chain must outrank its head")
  }

  test("pageRankLocal matches the distributed loop to 6dp on a " +
      "weighted graph with dangling nodes and a loud overflow bound") {
    import spark.implicits._
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0), ("b", "a", 2.0),
      ("c", "d", 1.0), ("d", "a", 0.5), ("e", "a", 1.0))
    val df = edges.toDF("src", "dst", "w")
    val dist = Graphs.pageRank(df, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val local = Graphs.pageRankLocal(df, iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(dist.keySet == local.keySet)
    dist.foreach { case (k, v) =>
      assert(math.abs(local(k) - v) < 5e-7, s"$k: $v vs ${local(k)}")
    }
    val err = intercept[IllegalArgumentException](
      Graphs.pageRankLocal(df, iters = 1, maxEdges = 3))
    assert(err.getMessage.contains("dimension-bounded"))
  }

  test("one iteration matches the closed form") {
    // star: a -> b, a -> c with weights 3 and 1; b, c dangling.
    // r0 = 1/3 each; dangling mass = r(b)+r(c) = 2/3.
    // r1(b) = 0.15/3 + 0.85*(0.75*1/3 + (2/3)/3)
    val r = ranksOf(Seq(("a", "b", 3.0), ("a", "c", 1.0)), iters = 1)
    val tele = 0.15 / 3
    val dang = (2.0 / 3) / 3
    assert(math.abs(r("a") - (tele + 0.85 * dang)) < 1e-12)
    assert(math.abs(r("b") - (tele + 0.85 * (0.75 / 3 + dang))) < 1e-12)
    assert(math.abs(r("c") - (tele + 0.85 * (0.25 / 3 + dang))) < 1e-12)
  }

  test("weights steer rank: heavier in-edge wins") {
    val r = ranksOf(
      Seq(("a", "b", 9.0), ("a", "c", 1.0), ("b", "a", 1.0),
        ("c", "a", 1.0)), iters = 6)
    assert(r("b") > r("c"))
  }

  // ---- connectedComponents (alternating star contraction) ----

  private def ccLabels(ids: Seq[Long], pairs: Seq[(Long, Long)],
      maxRounds: Int = 30): (Map[Long, Long], Int) = {
    import spark.implicits._
    val (labels, rounds) = Graphs.ccWithRounds(ids.toDF("doc_id"),
      pairs.toDF("a", "b"), "doc_id", maxRounds)
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("cc labels every component by its minimum id") {
    val (m, _) = ccLabels(0L to 9L,
      Seq((1L, 3L), (3L, 5L), (7L, 8L), (2L, 2L)))
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 4L,
      5L -> 1L, 6L -> 6L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("cc matches min-label propagation on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 10
      val ids = (0L until n.toLong)
      val pairs = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = graft.dedup.Dedup.clusters(ids.toDF("doc_id"),
          pairs.toDF("a", "b"), maxRounds = 100)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val (got, _) = ccLabels(ids, pairs)
      assert(got == expected, s"trial $trial diverged from propagation")
    }
  }

  test("cc converges in O(log n) rounds on a diameter-n chain") {
    // a 256-node path: min-label propagation walks the diameter (256
    // rounds — its 20-round default throws); star contraction rewires to
    // neighborhood minima and must land in a handful of rounds.
    import spark.implicits._
    val n = 256L
    val ids = 0L until n
    val chain = (0L until n - 1).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      graft.dedup.Dedup.clusters(ids.toDF("doc_id"),
        chain.toDF("a", "b")).collect()
    }
    val (labels, rounds) = ccLabels(ids, chain)
    assert(labels.values.forall(_ == 0L), "one component rooted at 0")
    assert(rounds <= 12, s"expected ~log₂(256)=8-ish rounds, got $rounds")
  }

  test("cc on an empty edge set is the identity labeling") {
    val (m, rounds) = ccLabels(Seq(4L, 7L), Seq.empty)
    assert(m == Map(4L -> 4L, 7L -> 7L) && rounds == 0)
  }

  // ---- triangleCounts (degree-ordered wedges) ----

  private def tris(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Graphs.triangleCounts(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("ccDelta equals full recompute: bridges, chains of bridges, new " +
      "nodes, new components, untouched components") {
    import spark.implicits._
    // history: components {0,1,2} (root 0), {10,11} (root 10), {20,21}
    // (root 20), isolated 30, 40
    val histEdges = Seq((0L, 1L), (1L, 2L), (10L, 11L), (20L, 21L))
    val histIds = (Seq(0L, 1L, 2L, 10L, 11L, 20L, 21L, 30L, 40L)).toDF("doc_id")
    val labels = Graphs.connectedComponents(histIds,
      histEdges.toDF("a", "b"))
    // delta: bridge {0..2}–{10,11} via members (2,11); chain that merged
    // group onward to isolated 30 via 30–1; NEW node 50 bridges into
    // {20,21}; NEW nodes 60,61 form their own component; 40 untouched
    val deltaEdges = Seq((2L, 11L), (30L, 1L), (50L, 21L), (60L, 61L))
    val allIds = (Seq(0L, 1L, 2L, 10L, 11L, 20L, 21L, 30L, 40L, 50L, 60L,
      61L)).toDF("doc_id")
    val inc = Graphs.ccDelta(labels, deltaEdges.toDF("a", "b"), allIds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Graphs.connectedComponents(allIds,
        (histEdges ++ deltaEdges).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(inc === full)
    // and the expected canonical shape, explicitly
    assert(inc === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 0L, 11L -> 0L,
      30L -> 0L, 20L -> 20L, 21L -> 20L, 50L -> 20L, 40L -> 40L,
      60L -> 60L, 61L -> 60L))
  }

  test("ccDelta canonicalizes string ids by Spark's UTF8 order, not " +
      "Java's UTF-16 code units: supplementary characters agree with " +
      "the batch path") {
    import spark.implicits._
    // U+10000 ("𐀀") vs U+FFFF: Java String.compareTo says
    // U+10000 < U+FFFF (code-unit 0xD800 < 0xFFFF); Spark's UTF8String
    // order says U+FFFF < U+10000 (code points). The delta path must
    // land on the batch path's canonical min.
    val hi = "𐀀"
    val lo = "￿"
    val ids = Seq(hi, lo, "a").toDF("doc_id")
    val labels = Graphs.connectedComponents(ids,
      Seq.empty[(String, String)].toDF("a", "b"))
    val delta = Seq((hi, lo)).toDF("a", "b")
    val inc = Graphs.ccDelta(labels, delta, ids, idCol = "doc_id")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val full = Graphs.connectedComponents(ids, delta)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(inc === full,
      "delta canonical label diverged from the batch min() order")
    assert(inc(hi) === lo, "U+FFFF is the UTF8-order min of the pair")
  }

  test("ccDelta on BINARY ids (digests): value-equal keys unify and " +
      "labels match the batch path") {
    import spark.implicits._
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val ids = Seq(b(2, 2), b(1, 9), b(3, 0), b(7)).toDF("doc_id")
    val labels = Graphs.connectedComponents(ids,
      Seq.empty[(Array[Byte], Array[Byte])].toDF("a", "b"))
    // two delta pairs sharing endpoint [2,2] via DISTINCT array
    // instances — reference-keyed maps would treat them as different
    // nodes and miss the transitive merge
    val delta = Seq((b(2, 2), b(1, 9)), (b(3, 0), b(2, 2)))
      .toDF("a", "b")
    def toMapB(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Array[Byte]](0).toSeq,
        r.getAs[Array[Byte]](1).toSeq)).toMap
    val inc = toMapB(Graphs.ccDelta(labels, delta, ids))
    val full = toMapB(Graphs.connectedComponents(ids, delta))
    assert(inc === full)
    assert(inc(Seq[Byte](3, 0)) === Seq[Byte](1, 9),
      "binary min (lexicographic bytes) must canonicalize the merge")
  }

  test("ccDelta's relabel is a broadcast join: the corpus-sized labels " +
      "pass never shuffles on the remap key") {
    import spark.implicits._
    val ids = (0L until 100L).toDF("doc_id")
    val labels = Graphs.connectedComponents(ids,
      Seq((1L, 2L), (3L, 4L)).toDF("a", "b"))
    val out = Graphs.ccDelta(labels, Seq((2L, 3L)).toDF("a", "b"), ids)
    out.collect() // force planning through AQE
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"relabel should broadcast the remap:\n$plan")
  }

  test("ccDelta on random graphs: any history/delta split of the edge " +
      "set yields the full-graph labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 40L
      val all = Seq.fill(35)(
        (rnd.nextLong(n), rnd.nextLong(n))).filter(p => p._1 != p._2)
      val (hist, delta) = all.partition(_ => rnd.nextBoolean())
      val ids = (0L until n).toDF("doc_id")
      val labels = Graphs.connectedComponents(ids, hist.toDF("a", "b"))
      val inc = Graphs.ccDelta(labels, delta.toDF("a", "b"), ids)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Graphs.connectedComponents(ids, all.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === full, s"trial $trial")
    }
  }

  test("ccRetract equals full recompute on the retained graph: split, " +
      "canonical handoff, vanish, untouched components") {
    import spark.implicits._
    // {0,1,2,3} chain 0-1-2-3 (removing cut vertex 1 SPLITS it into {0}
    // and {2,3}); {10,11,12} triangle (removing canonical min 10 hands
    // off to 11); {20,21} fully removed (VANISHES); {30,31} untouched;
    // isolated 40 untouched
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L), (30L, 31L))
    val ids = Seq(0L, 1L, 2L, 3L, 10L, 11L, 12L, 20L, 21L, 30L, 31L, 40L)
      .toDF("doc_id")
    val labels = Graphs.connectedComponents(ids, edges.toDF("a", "b"))
    val removed = Seq(1L, 10L, 20L, 21L).toDF("doc_id")
    val got = Graphs.ccRetract(labels, edges.toDF("a", "b"), removed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keep = Set(0L, 2L, 3L, 11L, 12L, 30L, 31L, 40L)
    val full = Graphs.connectedComponents(
        ids.where(col("doc_id").isin(keep.toSeq: _*)),
        edges.filter(e => keep(e._1) && keep(e._2)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === full)
    assert(got === Map(0L -> 0L, 2L -> 2L, 3L -> 2L, 11L -> 11L,
      12L -> 11L, 30L -> 30L, 31L -> 30L, 40L -> 40L))
  }

  test("ccRetract on random graphs: any removal set yields the " +
      "retained-graph labels") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    for (trial <- 1 to 3) {
      val n = 40L
      val all = Seq.fill(35)(
        (rnd.nextLong(n), rnd.nextLong(n))).filter(p => p._1 != p._2)
      val ids = (0L until n).toDF("doc_id")
      val removedSet = (0L until n).filter(_ => rnd.nextInt(5) == 0).toSet
      val labels = Graphs.connectedComponents(ids, all.toDF("a", "b"))
      val got = Graphs.ccRetract(labels, all.toDF("a", "b"),
          removedSet.toSeq.toDF("doc_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val keepEdges = all.filter(e =>
        !removedSet(e._1) && !removedSet(e._2))
      val full = Graphs.connectedComponents(
          ids.where(!col("doc_id").isin(removedSet.toSeq: _*)),
          keepEdges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === full, s"trial $trial")
    }
  }

  test("ccRetract falls back to the distributed solve past the " +
      "member bound and stays row-equal: >4000 retained members") {
    import spark.implicits._
    // one 4200-node chain component; removing its head exceeds the
    // small-case member ceiling (4000) — the repair must take the
    // distributed star-contraction path and still hand the canonical
    // label off to the min RETAINED member
    val n = 4200L
    val ids = spark.range(n).select(col("id").as("doc_id"))
    val edges = spark.range(n - 1)
      .select(col("id").as("a"), (col("id") + 1).as("b"))
    val labels = Graphs.connectedComponents(ids, edges)
    val got = Graphs.ccRetract(labels, edges, Seq(0L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === (n - 1).toInt)
    assert(got.values.toSet === Set(1L),
      "the canonical label must hand off to the min retained member")
  }

  test("ccRetract falls back past the EDGE bound (dense component, " +
      "few members) and stays row-equal") {
    import spark.implicits._
    // 120 members but ~7k edges (dense near-dup clique shape): the
    // member probe passes, the edge probe must trip the fallback
    val n = 120
    val dense = for {
      i <- 0 until n; j <- (i + 1) until n
    } yield (i.toLong, j.toLong)
    assert(dense.size > 4000)
    val ids = (0L until n.toLong).toDF("doc_id")
    val labels = Graphs.connectedComponents(ids, dense.toDF("a", "b"))
    val got = Graphs.ccRetract(labels, dense.toDF("a", "b"),
        Seq(0L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n - 1 && got.values.toSet === Set(1L))
  }

  test("counts each triangle once at each corner") {
    // K4 on {1,2,3,4}: 4 triangles, each node in exactly 3; node 9
    // hangs off node 1 and is in none
    val k4 = for {
      i <- 1L to 4L; j <- (i + 1) to 4L
    } yield (i, j)
    assert(tris(k4 :+ (1L -> 9L)) ==
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("duplicate/reversed/self-loop edges do not inflate counts") {
    val noisy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (1L, 2L))
    assert(tris(noisy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("matches brute force on random graphs") {
    val rnd = new scala.util.Random(5)
    for (trial <- 1 to 4) {
      val n = 12
      val pairs = Seq.fill(30)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val canon = pairs.filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
      val expected = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for {
        a <- 0L until n; b <- (a + 1) until n; c <- (b + 1) until n
        if canon((a, b)) && canon((a, c)) && canon((b, c))
        x <- Seq(a, b, c)
      } expected(x) += 1
      assert(tris(pairs) == expected.toMap, s"trial $trial")
    }
  }

  test("flatCheckpoint truncates origin statistics (the compounding " +
      "sizeInBytes defect the mixed-maintenance probe exposed) and " +
      "keeps rows and freeability intact") {
    import spark.implicits._
    val a = (0L until 50L).toDF("x")
    // a join chain whose size estimate is a PRODUCT of its children —
    // the thing that doubles digits per checkpoint generation
    val deep = a.join(a.toDF("y"), col("x") === col("y"))
      .join(a.toDF("z"), col("x") === col("z"))
    val plain = deep.localCheckpoint()
    val flat = Graphs.flatCheckpoint(deep)
    val plainStats =
      plain.queryExecution.optimizedPlan.stats.sizeInBytes
    val flatStats = flat.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(plainStats > flatStats || flatStats ===
      BigInt(spark.sessionState.conf.defaultSizeInBytes),
      s"flatCheckpoint kept origin stats: plain=$plainStats flat=$flatStats")
    // a second, DEEPER lineage lands on the same stats — generation-
    // independent, which is exactly what breaks the compounding
    val deeper = Graphs.flatCheckpoint(
      flat.join(flat.toDF("p", "q", "r"), col("x") === col("p")))
    assert(deeper.queryExecution.optimizedPlan.stats.sizeInBytes
      === flatStats)
    assert(flat.orderBy(col("x")).collect().map(_.getLong(0)).toSeq
      === plain.orderBy(col("x")).collect().map(_.getLong(0)).toSeq)
    Graphs.freeLocalCheckpoint(flat) // must find the LogicalRDD leaf
    Graphs.freeLocalCheckpoint(plain)
  }
}
