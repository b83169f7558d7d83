package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Boilerplate census + strip semantics pinned on constructed corpora
  * (the DuckDB gate pins cross-engine parity over the seeded corpus;
  * this pins what the operators MEAN: the distinct-doc threshold, the
  * per-source scope, block alignment, and the strip receipt). */
class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  // one whole 8-token block of template chrome
  private val B = "all rights reserved click here to unsubscribe now"

  private def md5Hex(s: String) =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

  test("census: >= minDocs DISTINCT docs of ONE source; repeats inside a doc count once") {
    val docs = Seq(
      // s1: three distinct docs share block 0 = B → flagged
      (1L, B + " x1 x2", "s1"),
      (2L, B + " y1 y2 y3 y4 y5 y6 y7 y8", "s1"),
      (3L, B, "s1"),
      // s2: only two docs share it → below threshold, silent
      (4L, B, "s2"),
      (5L, B + " z1", "s2"),
      // s3: ONE doc carrying B twice (blocks 0 and 1) counts ONE doc
      (6L, B + " " + B, "s3"),
      (7L, B + " w1", "s3")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.boilerplateCensus(docs, minDocs = 3L).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("s1", B, 3L)))
  }

  test("census is alignment-sensitive: the fixed-block convention, shared with the oracle") {
    // same 8 tokens, but shifted one position in doc 2 — different
    // blocks under the line_dedup slicing, so no census row
    val docs = Seq(
      (1L, B + " t1", "s1"),
      (2L, "pre " + B, "s1"),
      (3L, B + " t2", "s1")
    ).toDF("doc_id", "text", "source")
    val got = Dedup.boilerplateCensus(docs, minDocs = 3L).collect()
    assert(got.isEmpty)
  }

  test("strip: flagged blocks removed per source only; ordered reassembly receipt") {
    val docs = Seq(
      (1L, B + " x1 x2", "s1"),
      (2L, B + " y1 y2 y3 y4 y5 y6 y7 y8", "s1"),
      (3L, B, "s1"),
      // s2 carries the SAME block but its census has no flagged rows —
      // cross-source flags must not leak
      (4L, B + " z1", "s2")
    ).toDF("doc_id", "text", "source")
    val census = Dedup.boilerplateCensus(docs, minDocs = 3L)
    val got = Dedup.boilerplateStrip(docs, census).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(got(1L) == (2L, 1L, md5Hex("x1 x2")))
    assert(got(2L) == (2L, 1L, md5Hex("y1 y2 y3 y4 y5 y6 y7 y8")))
    // every block stripped → the empty-string receipt
    assert(got(3L) == (1L, 1L, md5Hex("")))
    // same bytes, different source → untouched
    assert(got(4L) == (2L, 0L, md5Hex(B + " z1")))
  }

  test("strip with an empty census is a pure reassembly no-op") {
    val docs = Seq((1L, B + " a b c", "s1")).toDF("doc_id", "text", "source")
    val empty = Dedup.boilerplateCensus(docs, minDocs = 99L)
    val got = Dedup.boilerplateStrip(docs, empty).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // 11 tokens → 2 blocks; reassembly re-joins the block seams
    assert(got.toSeq == Seq((1L, 2L, 0L, md5Hex(B + " a b c"))))
  }

  test("gate seeding: headers are 16 tokens, so seeded blocks stay aligned") {
    assert(registry.DedupReg.BpHeader7.split(" ").length == 16)
    assert(registry.DedupReg.BpHeader11.split(" ").length == 16)
    // a seeded doc's own blocks are intact, just shifted two indices
    val plain = Seq((3L, "a1 a2 a3 a4 a5 a6 a7 a8", "s1"))
      .toDF("doc_id", "text", "source")
    val dec = registry.DedupReg.decorateBoilerplate(plain)
      .select(col("text")).as[String].head()
    assert(dec.split(" ").drop(16).mkString(" ") == "a1 a2 a3 a4 a5 a6 a7 a8")
  }
}
