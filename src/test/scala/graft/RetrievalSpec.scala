package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Retrieval

/** Retrieval specs: BM25 against a local-loop reimplementation of the
  * published formula (the distributed plan must reproduce the scalar
  * math bit-for-bit), and RRF against hand-computed fusions.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  private val corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian elderberry fig"),
    (4L, "banana banana banana banana")
  ).toDF("doc_id", "text")

  /** The Okapi formula as a scalar loop — the portable oracle. */
  private def bm25Local(docs: Seq[(Long, String)], terms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): Map[Long, Double] = {
    val toks = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
    val n = toks.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val dfm = terms.map { t => t -> toks.count(_._2.contains(t)).toLong }.toMap
    toks.flatMap { case (id, ws) =>
      val dl = ws.size
      val scores = terms.flatMap { t =>
        val tf = ws.count(_ == t)
        if (tf == 0 || dfm(t) == 0) None
        else {
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          Some(r6(idf * (tf * (k1 + 1.0)) /
            (tf + k1 * (1.0 - b + b * dl / avgdl))))
        }
      }
      if (scores.isEmpty) None
      else Some(id -> r6(scores.map(BigDecimal(_)).sum.toDouble))
    }.toMap
  }

  test("bm25 matches the scalar formula exactly; non-matching docs absent") {
    val terms = Seq("apple", "banana")
    val got = Retrieval.bm25(corpus, terms)
      .as[(Long, Double)].collect().toMap
    val want = bm25Local(
      Seq(1L -> "apple banana apple", 2L -> "apple cherry",
        3L -> "durian elderberry fig", 4L -> "banana banana banana banana"),
      terms)
    assert(got == want)
    assert(!got.contains(3L), "doc without query terms must not appear")
    // tf=2 apple (rare-ish) beats tf=1: ranking actually discriminates
    assert(got(1L) > got(2L))
  }

  test("bm25 respects k1/b parameters") {
    val got = Retrieval.bm25(corpus, Seq("apple"), k1 = 0.5, b = 0.0)
      .as[(Long, Double)].collect().toMap
    val want = bm25Local(
      Seq(1L -> "apple banana apple", 2L -> "apple cherry",
        3L -> "durian elderberry fig", 4L -> "banana banana banana banana"),
      Seq("apple"), k1 = 0.5, b = 0.0)
    assert(got == want)
  }

  test("bm25 rejects an empty term list") {
    intercept[IllegalArgumentException] {
      Retrieval.bm25(corpus, Seq.empty)
    }
  }

  test("rrfFuse sums 6dp-rounded 1/(c+rank) per list, counts lists") {
    val la = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val lb = Seq((20L, 1), (30L, 2), (40L, 3)).toDF("doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq(la, lb), c = 60)
      .as[(Long, Double, Long)].collect()
      .map { case (id, s, n) => id -> ((s, n)) }.toMap
    def c(rank: Int) = r6(1.0 / (60 + rank))
    def s(rs: Int*) = r6(rs.map(r => BigDecimal(c(r))).sum.toDouble)
    assert(got == Map(
      10L -> ((s(1), 1L)),
      20L -> ((s(2, 1), 2L)),
      30L -> ((s(3, 2), 2L)),
      40L -> ((s(3), 1L))))
  }
}
