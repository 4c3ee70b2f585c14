package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

/** Takedown for standing keep-first digest indexes ([[Dedup.retractIndex]]
  * / [[Dedup.dedupRetract]]): removing documents must re-elect keepers
  * ONLY for touched digests (handoff to the next occurrence), make
  * fully-removed digests vanish, pass untouched rows through, and be
  * row-equal to rebuilding the index over the retained corpus. */
class DedupRetractSpec extends AnyFunSuite with SparkTestBase {

  test("doc grain: handoff, vanish, untouched; equals retained rebuild") {
    import spark.implicits._
    // digest groups: "aa" {1,4,7} (remove keeper 1 -> handoff to 4),
    // "bb" {2,5} (remove both -> vanish), "cc" {3} untouched,
    // "dd" {6} removed singleton -> vanish
    val corpus = Seq((1L, "aa"), (4L, "aa"), (7L, "aa"), (2L, "bb"),
      (5L, "bb"), (3L, "cc"), (6L, "dd")).toDF("doc_id", "text")
    val index = corpus.groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
    val removals = Seq(1L, 2L, 5L, 6L).toDF("doc_id")
    val got = Dedup.dedupRetract(index, corpus, removals)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rebuilt = corpus.where(!col("doc_id").isin(1L, 2L, 5L, 6L))
      .groupBy(md5(col("text")).as("text_hash"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_copies"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === rebuilt)
    assert(got.values.toSet === Set((4L, 2L), (3L, 1L)),
      "expected handoff aa->4 (2 retained copies) and untouched cc->3")
  }

  test("passage grain: keeper is min (doc, chunk) among retained") {
    import spark.implicits._
    // digest "x" members (2,5), (3,0), (7,1); remove doc 2 -> keeper
    // hands off to (3,0) — doc-then-chunk order, not chunk-first
    val members = Seq(("x", 2L, 5L), ("x", 3L, 0L), ("x", 7L, 1L),
      ("y", 2L, 0L), ("z", 4L, 2L))
      .toDF("unit_hash", "doc_id", "chunk_id")
    val index = members.groupBy(col("unit_hash"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("__kp"),
        count(lit(1)).as("n_occ"))
      .select(col("unit_hash"), col("__kp.doc_id").as("doc_id"),
        col("__kp.chunk_id").as("chunk_id"), col("n_occ"))
    val got = Dedup.retractIndex(index, members, Seq(2L).toDF("doc_id"),
        keyCol = "unit_hash", docCol = "doc_id",
        orderCols = Seq("doc_id", "chunk_id"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got === Map("x" -> ((3L, 0L, 2L)), "z" -> ((4L, 2L, 1L))),
      "x hands off to (3,0) with 2 retained; y vanishes; z untouched")
  }

  test("untouched index rows pass through unread (not recomputed)") {
    import spark.implicits._
    val corpus = Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text")
    // plant a WRONG n_copies on the untouched digest: retraction must
    // pass it through verbatim (proof it never recomputes untouched
    // rows), and only the touched digest is re-derived
    val index = Seq((DigestOf("aa"), 1L, 99L), (DigestOf("bb"), 2L, 1L))
      .toDF("text_hash", "canonical_id", "n_copies")
    val got = Dedup.dedupRetract(index, corpus, Seq(2L).toDF("doc_id"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(DigestOf("aa") -> ((1L, 99L))))
  }

  test("edge-cache retraction equals the full LSH rebuild over the " +
      "retained corpus (per-document stages make it exact, not " +
      "approximate)") {
    import spark.implicits._
    // three near-dup families + singletons; remove one member of a
    // pair (edge dies), one endpoint of a triangle (its two edges die,
    // the third survives), and an isolated doc (no edges touched)
    val body = "the quick brown fox jumps over the lazy dog " +
      "and then runs far away tonight"
    val tri = "data pipelines shuffle partition and aggregate massive " +
      "corpora with care and rigor always every single day"
    val corpus = Seq(
      1L -> body, 2L -> body,                      // pair {1,2}
      10L -> tri, 11L -> tri, 12L -> tri,          // triangle {10,11,12}
      20L -> "completely different words about cooking pasta dinner now",
      21L -> "another unrelated document describing mountain hiking gear"
    ).toDF("doc_id", "text")
    def edges(docs: org.apache.spark.sql.DataFrame) = {
      val g = Dedup.shingles(docs)
      Dedup.jaccardVerify(
          Dedup.lshCandidates(
            Dedup.minhashBands(g, k = 16, rowsPerBand = 4)), g)
        .where(col("jaccard") >= 0.5)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    }
    val cache = edges(corpus).localCheckpoint()
    assert(cache.count() === 4L, "fixture should yield pair + triangle")
    val removals = Seq(2L, 10L, 20L).toDF("doc_id")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = key(Dedup.retractEdges(cache, removals))
    val rebuilt = key(edges(
      corpus.where(!col("doc_id").isin(2L, 10L, 20L))))
    assert(got === rebuilt)
    assert(got === Set((11L, 12L)),
      "only the triangle's far edge should survive")
  }

  private def DigestOf(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }
}
