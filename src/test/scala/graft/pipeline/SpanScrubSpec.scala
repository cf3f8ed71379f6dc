package graft.pipeline

import graft.TestSession
import org.scalatest.funsuite.AnyFunSuite

/** Planted-corpus semantics for d_span_scrub (exact-substring removal,
  * Lee et al. 2022 cut semantics): a word position is cut iff some 5-gram
  * window covering it occurs in >= 2 documents. */
class SpanScrubSpec extends AnyFunSuite {
  lazy val spark = TestSession.spark

  private def scrub(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    TextDedup.spanScrub(rows.toDF("doc_id", "text")).orderBy("doc_id").collect()
  }

  test("cuts exactly the positions covered by cross-doc 5-grams") {
    val out = scrub(Seq(
      (1L, "a b c d e f"),    // gram "a b c d e" shared with doc 2
      (2L, "z a b c d e q"),
      (3L, "x y")))           // < 5 words: no grams, untouched
    assert(out(0).getInt(1) == 6 && out(0).getInt(2) == 1)
    assert(out(0).getString(3) == "f")   // words 1-5 covered by start 1
    assert(out(1).getString(3) == "z q") // words 2-6 covered by start 2
    assert(out(2).getString(3) == "x y")
    assert(out(2).getInt(1) == 2 && out(2).getInt(2) == 2)
  }

  test("overlapping shared grams merge their covered spans") {
    // docs share BOTH "a b c d e" and "b c d e f": doc 1 positions 1..6
    // are covered by the union of starts {1, 2}
    val out = scrub(Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f h")))
    assert(out(0).getString(3) == "g")
    assert(out(1).getString(3) == "h")
  }

  test("fully-duplicated doc scrubs to the empty string, not null") {
    val out = scrub(Seq((1L, "p q r s t"), (2L, "p q r s t")))
    assert(out.forall(r => !r.isNullAt(3) && r.getString(3) == ""))
    assert(out.forall(_.getInt(2) == 0))
  }

  test("within-doc repetition alone does not scrub (cross-document only)") {
    val out = scrub(Seq((1L, "m n o p q m n o p q")))
    assert(out(0).getString(3) == "m n o p q m n o p q")
    assert(out(0).getInt(2) == 10)
  }

  test("hashed geometry is output-identical to the exact-string form") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, graft.TestSession.sf)
      .select("doc_id", "text")
    val a = TextDedup.spanScrub(docs).orderBy("doc_id")
      .collect().map(_.toString)
    val b = TextDedup.spanScrubHashed(docs).orderBy("doc_id")
      .collect().map(_.toString)
    assert(a.sameElements(b))
    // and on a planted corpus with shared + unique grams
    val planted = Seq(
      (1L, "a b c d e f"), (2L, "z a b c d e q"), (3L, "x y"),
      (4L, "p q r s t"), (5L, "p q r s t")).toDF("doc_id", "text")
    val pa = TextDedup.spanScrub(planted).orderBy("doc_id").collect().map(_.toString)
    val pb = TextDedup.spanScrubHashed(planted).orderBy("doc_id").collect().map(_.toString)
    assert(pa.sameElements(pb))
  }
}
