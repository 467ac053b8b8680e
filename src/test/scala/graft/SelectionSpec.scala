package graft

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Selection

/** Selection specs: the bigram-LM score and DSIR weights against scalar
  * reimplementations of the published formulas on fixtures small enough
  * to audit by hand.
  */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r6(x: Double): Double =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  test("bigramLmScore reproduces the smoothed bigram NLL mean; " +
    "sub-2-token docs are absent") {
    // corpus bigram counts: "a b" -> 3, "b a" -> 1; left marginals
    // a -> 3, b -> 1; vocabulary {a, b, c} -> V = 3
    val docs = Seq(
      (1L, "a b a b"),
      (2L, "a b"),
      (3L, "c")
    ).toDF("doc_id", "text")
    val out = Selection.bigramLmScore(docs)
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()

    val nllAb = r6(-math.log((3 + 0.5) / (3 + 0.5 * 3)))
    val nllBa = r6(-math.log((1 + 0.5) / (1 + 0.5 * 3)))
    // exact decimal mean of the 6-dp-rounded per-bigram NLLs
    def mean6(xs: Seq[Double]): Double = r6(
      xs.map(x => new JBigDecimal(x.toString)).reduce(_.add(_))
        .doubleValue / xs.size)

    assert(out.map(_._1).toSeq == Seq(1L, 2L)) // doc 3 has no bigrams
    assert(out(0) == ((1L, 3L, mean6(Seq(nllAb, nllBa, nllAb)))))
    assert(out(1) == ((2L, 1L, mean6(Seq(nllAb)))))
  }

  test("dsirWeights reproduces the hashed-feature log-likelihood ratio") {
    // t1 (target) and r1 (raw) share a text; r2 is raw-only. Bigrams:
    // "x y" (f1, 2 per doc), "y x" (f2, 1 per doc), "z w" (f3).
    val docs = Seq(
      (1L, "x y x y", "src0"),
      (2L, "x y x y", "src1"),
      (3L, "z w", "src1")
    ).toDF("doc_id", "text", "source")

    // precondition, not the assertion: the three bigrams must land in
    // three distinct buckets for the hand-computed counts to apply
    val fs = docs
      .select(explode(graft.ext.TextAnalysis.bigrams(
        split(trim(col("text")), "\\s+"))).as("bg"))
      .select((graft.ext.TextAnalysis.hash60(col("bg")) % 4096).as("f"))
      .distinct().as[Long].collect()
    assert(fs.length == 3, s"bucket collision in fixture: ${fs.toSeq}")

    val out = Selection.dsirWeights(docs, col("source") === "src0")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect()

    // bucket counts: f1 raw 4 / tgt 2, f2 raw 2 / tgt 1, f3 raw 1 / 0;
    // totals raw 7, tgt 3; B = 4096, alpha = 0.5
    def lr(nTgt: Long, nRaw: Long): Double = r6(
      math.log((nTgt + 0.5) / (3 + 0.5 * 4096)) -
        math.log((nRaw + 0.5) / (7 + 0.5 * 4096)))
    def sum6(xs: Seq[Double]): Double = r6(
      xs.map(x => new JBigDecimal(x.toString)).reduce(_.add(_)).doubleValue)

    val w12 = sum6(Seq(lr(2, 4), lr(1, 2), lr(2, 4))) // both 4-token docs
    assert(out.toSeq == Seq(
      (1L, 3L, w12),
      (2L, 3L, w12), // identical text => identical weight, target or not
      (3L, 1L, sum6(Seq(lr(0, 1))))))
    // target-domain text scores above the out-of-domain doc ONCE
    // length-normalized (the raw weight is an occurrence sum, so doc
    // length confounds the raw comparison)
    assert(w12 / 3 > out(2)._3 / 1)
  }

  test("cluster-balanced sample caps every learned cell at the quota, " +
    "keeps whole cells under it, and is deterministic") {
    import graft.ext.{Sampling, Similarity}
    // 40 vectors in two well-separated directions => two dominant cells
    val vecs = (0L until 40L).map { i =>
      val base = Array.fill(4)(0.001f)
      base((i % 2).toInt) = 1.0f + (i % 5) * 0.01f
      (i, base.toSeq)
    }
    val e = vecs.toDF("vec_id", "embedding")
    val cells = Similarity.cellAssignments(e,
      Similarity.trainCentroids(e, nCentroids = 2))
    val out = Sampling.stratifiedSample(cells, col("cell"), col("vec_id"),
      n = 5, salt = "cbal").select("vec_id", "cell", "rn")
    val rows = out.as[(Long, Long, Int)].collect()
    val perCell = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perCell.values.forall(_ <= 5), perCell.toString)
    // both directions survive: neither cell was wiped out by the cap
    assert(perCell.size == 2 && perCell.values.forall(_ == 5))
    // deterministic: a second run returns the identical sample
    val again = Sampling.stratifiedSample(cells, col("cell"), col("vec_id"),
      n = 5, salt = "cbal").select("vec_id", "cell", "rn")
      .as[(Long, Long, Int)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("linearProbe separates a linearly-separable fixture and is " +
    "deterministic") {
    import graft.ext.Selection
    // targets point along +e0, non-targets along -e0 — separable by w
    val vecs = (0L until 20L).map { i =>
      val sign = if (i < 10) 1.0f else -1.0f
      val v = Array(sign * (1.0f + (i % 5) * 0.1f), 0.2f, -0.1f, 0.05f)
      (i, v.toSeq, if (i < 10) 0 else 1)
    }
    val e = vecs.toDF("vec_id", "embedding", "label")
    val out = Selection.linearProbe(e, col("label") === 0, dim = 4)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    val (tgt, rest) = out.partition(_._2 == 1)
    assert(tgt.length == 10 && rest.length == 10)
    // every target scores above every non-target after 3 GD rounds
    assert(tgt.map(_._3).min > rest.map(_._3).max)
    val again = Selection.linearProbe(e, col("label") === 0, dim = 4)
      .as[(Long, Int, Double)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
  }

  test("dsirWeights of a uniformly-target corpus is ~zero everywhere") {
    // when target == raw the two smoothed distributions differ only via
    // their denominators; every per-bucket ratio uses the same constant
    val docs = Seq(
      (1L, "p q r", "src0"),
      (2L, "q r p", "src0")
    ).toDF("doc_id", "text", "source")
    val const = math.log((4 + 0.5 * 4096) / (4 + 0.5 * 4096)) // = 0
    val out = Selection.dsirWeights(docs, col("source") === "src0")
      .as[(Long, Long, Double)].collect()
    assert(out.forall { case (_, n, w) => math.abs(w - n * const) < 1e-9 })
  }
}
