package graft.queries

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession

/** Dev measurement harness (not a test): N CONCURRENT SparkSessions of one
  * SparkContext each running the same registry slice — the deployment shape
  * a long-lived embedding actually has, and the thing the session-keyed
  * machinery (`Caches` single-flight, the q185 unique catalog names, the
  * plan-keyed CacheManager notes in `Caches.evict`) exists for but which no
  * artifact had exercised under real queries until this probe.
  *
  * What it proves, written to CONCURRENCY.json (committed as the round's
  * artifact):
  *   1. every concurrent session's result for every slice query is
  *      HASH-EQUAL to the serial baseline (zero cross-session damage);
  *   2. q185's bucketed layout is built exactly ONCE per session even when
  *      the session runs it twice (single-flight within the session), and
  *      the context-global catalog holds one table PAIR per session
  *      (unique names — no cross-session DROP/saveAsTable race);
  *   3. evicting one session drops exactly ITS catalog tables and cache
  *      entries; the other sessions' tables survive and their queries
  *      still return the baseline hashes afterwards.
  *
  * The slice spans every cache family: alerts frame (q10), shingle/band
  * frames (q26/q28), IVF cells (q65–q67), PQ codebooks (q103), the q116
  * pipeline frame, quality/langid frames (q21/q22), SemDeDup lloyd-assign
  * (q144), and the q185 layout memo.
  *
  * Usage: sbt "Test/runMain graft.queries.ConcurrencyProbe [sfDir] [n]"
  */
object ConcurrencyProbe {

  // q222 joined in round 17: it shares trainedCells with q65/q66/q67
  // AND owns the new driftedEmb cache key — concurrent sessions race
  // one more single-flight family, including a maybeSwap retrain whose
  // trigger evaluation collects monitor aggregates per session
  private val SlicePrefixes = Seq("q10_", "q185", "q26_", "q28_", "q65_",
    "q66_", "q67_", "q103_", "q116_", "q21_", "q22_", "q144_", "q222_")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nSessions = if (args.length > 1) args(1).toInt else 4
    val root = SparkSession.builder()
      .master("local[16]")
      .appName("graft-concurrency")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")

    val slice = Registry.all
      .filter(q => SlicePrefixes.exists(q.name.startsWith))
    require(slice.exists(_.name.startsWith("q185")), "slice must hit q185")
    println(s"[conc] slice: ${slice.map(_.name).mkString(", ")}")

    /** Canonical result hash, driver-shaped: columns sorted by name, rows
      * rendered with a field sentinel and sorted, md5 over the block. */
    def hashOf(s: SparkSession, q: Q): String = {
      val df = q.run(s, sfDir)
      val cols = df.columns.sorted
      val rows = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .collect()
        .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString)
          .mkString("\u0001"))
        .sorted
      val md = MessageDigest.getInstance("MD5")
      rows.foreach(r => md.update(r.getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    }

    def g185Tables(s: SparkSession): Seq[String] =
      s.sql("SHOW TABLES").collect().map(_.getString(1))
        .filter(_.startsWith("g185_")).toSeq.sorted

    // ---- serial baseline on its own session -------------------------
    val serialSession = root.newSession()
    val t0 = System.nanoTime()
    val baseline: Map[String, String] =
      slice.map(q => q.name -> hashOf(serialSession, q)).toMap
    println(f"[conc] serial baseline ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val serialTables = g185Tables(root)
    require(serialTables.size == 2,
      s"serial session should have built exactly one layout pair, " +
        s"catalog has: $serialTables")

    // ---- concurrent phase: nSessions threads, one session each ------
    val sessions = (0 until nSessions).map(_ => root.newSession())
    val results = new java.util.concurrent.ConcurrentHashMap[
      (Int, String), String]()
    val errors = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val t1 = System.nanoTime()
    val threads = sessions.zipWithIndex.map { case (s, i) =>
      new Thread(() => {
        try {
          // rotate the order per session so the interleaving differs;
          // run q185 TWICE to prove in-session single-flight under load
          val order = slice.drop(i % slice.size) ++ slice.take(i % slice.size)
          val withRepeat = order ++ order.filter(_.name.startsWith("q185"))
          withRepeat.foreach(q => results.put((i, q.name), hashOf(s, q)))
        } catch {
          case t: Throwable =>
            errors.add(s"session $i: ${t.getClass.getSimpleName}: " +
              s"${t.getMessage}")
        }
      }, s"conc-session-$i")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val concurrentWall = (System.nanoTime() - t1) / 1e9
    println(f"[conc] $nSessions concurrent sessions $concurrentWall%.1f s")
    require(errors.isEmpty, s"concurrent failures:\n  ${
      scala.jdk.CollectionConverters.ListHasAsScala(errors).asScala
        .mkString("\n  ")}")

    // 1. hash equality vs serial
    val mismatches = for {
      i <- 0 until nSessions; q <- slice
      h = results.get((i, q.name))
      if h != baseline(q.name)
    } yield s"session $i ${q.name}: $h != ${baseline(q.name)}"
    require(mismatches.isEmpty,
      s"cross-session result damage:\n  ${mismatches.mkString("\n  ")}")
    println(s"[conc] hash-equal: ${nSessions * slice.size} results match " +
      "the serial baseline")

    // 2. exactly one layout pair per session in the shared catalog
    val allTables = g185Tables(root)
    val expectedPairs = 1 + nSessions // serial + one per concurrent session
    require(allTables.size == 2 * expectedPairs,
      s"expected ${2 * expectedPairs} g185 tables (one pair per session), " +
        s"catalog has ${allTables.size}: $allTables")
    println(s"[conc] catalog: ${allTables.size} g185 tables = one pair per " +
      s"session (in-session single-flight held under a repeated q185)")

    // 3. per-session evict: drops exactly its own tables, leaves the rest
    val tablesBefore = allTables.toSet
    var remaining = tablesBefore
    sessions.zipWithIndex.foreach { case (s, i) =>
      Caches.evict(s)
      val now = g185Tables(root).toSet
      val dropped = remaining -- now
      require(dropped.size == 2,
        s"evict of session $i dropped ${dropped.size} tables: $dropped")
      require(now.subsetOf(remaining),
        s"evict of session $i ADDED tables?! $now vs $remaining")
      require(Caches.liveEntries(s) == 0,
        s"session $i still has ${Caches.liveEntries(s)} cache entries " +
          "after evict")
      // a survivor session still answers with the baseline hash
      if (i + 1 < nSessions) {
        val survivor = sessions(i + 1)
        val q = slice.find(_.name.startsWith("q185")).get
        val h = hashOf(survivor, q)
        require(h == baseline(q.name),
          s"survivor session ${i + 1} broken after evicting session $i")
      }
      remaining = now
    }
    Caches.evict(serialSession)
    require(g185Tables(root).isEmpty,
      s"catalog not clean after all evicts: ${g185Tables(root)}")
    println("[conc] evict: per-session, exact, survivors unharmed, " +
      "catalog clean at the end")

    // ---- artifact ---------------------------------------------------
    val json =
      s"""{"sessions":$nSessions,"slice":[${
        slice.map("\"" + _.name + "\"").mkString(",")}],
         |"results_checked":${nSessions * slice.size},
         |"hash_equal_serial":true,
         |"layout_pairs_expected":$expectedPairs,
         |"layout_pairs_observed":${tablesBefore.size / 2},
         |"in_session_single_flight":"q185 run twice per session, one build",
         |"evict_exact_per_session":true,
         |"concurrent_wall_sec":${f"$concurrentWall%.1f"},
         |"sf_dir":"$sfDir"}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get("CONCURRENCY.json"),
      (json + "\n").getBytes("UTF-8"))
    println(s"[conc] artifact written: CONCURRENCY.json")
    root.stop()
  }
}
