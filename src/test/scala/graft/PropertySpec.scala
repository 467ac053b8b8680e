package graft

import java.time.{LocalDate, Year}

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CoreOps

/** Property tests (SURVEY §5.2-4): Spark expressions vs direct Scala
  * oracles reimplementing the reference's Go semantics. Uses ScalaCheck
  * generators with a fixed seed (no scalatestplus bridge in the offline
  * dependency set), evaluating each property over a generated batch in one
  * Spark job.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  /** Go-semantics oracle for getAge (reference bundle.go:54-60):
    * i:=1; for now.AddDate(-i,0,0).After(bd) {i++}; return i-1 — with
    * `now` a wall-clock instant (time-of-day > midnight), so the birthday
    * itself counts as completed. Go's AddDate normalizes Feb 29 of a
    * non-leap target year to Mar 1 (java.time clamps to Feb 28 — modeled
    * explicitly).
    */
  private def goAddYears(d: LocalDate, minus: Int): LocalDate = {
    val y = d.getYear - minus
    if (d.getMonthValue == 2 && d.getDayOfMonth == 29 && !Year.isLeap(y))
      LocalDate.of(y, 3, 1)
    else d.withYear(y)
  }

  private def goAge(birth: LocalDate, asOf: LocalDate): Int = {
    var i = 1
    // noon "now": shifted date strictly after birth OR equal to it
    while (!goAddYears(asOf, i).isBefore(birth)) i += 1
    i - 1
  }

  private val dateGen: Gen[LocalDate] = Gen
    .choose(
      LocalDate.of(1900, 1, 1).toEpochDay,
      LocalDate.of(2030, 12, 31).toEpochDay)
    .map(LocalDate.ofEpochDay)

  test("ageYears matches the Go getAge loop on arbitrary date pairs") {
    val pairs = sample(
      for { a <- dateGen; b <- dateGen } yield
        if (a.isBefore(b)) (a, b) else (b, a), 500)
    val df = pairs.map { case (b, a) => (b.toString, a.toString) }
      .toDF("b", "a")
    val got = df.select(
      CoreOps.ageYears($"b".cast("date"), $"a".cast("date"))).as[Int].collect()
    val want = pairs.map { case (b, a) => goAge(b, a) }
    assert(got.toSeq == want.toSeq)
  }

  test("distinctSorted equals sorted set semantics of removeDuplicates") {
    val lists = sample(Gen.listOf(Gen.choose(-1000, 1000)), 100)
    val got = lists.toDF("a")
      .select(CoreOps.distinctSorted($"a")).as[Seq[Int]].collect()
    assert(got.toSeq == lists.map(_.distinct.sorted))
  }

  test("jaccard expression equals set-arithmetic oracle") {
    val wordGen = Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h")
    val pairs = sample(
      for {
        x <- Gen.nonEmptyListOf(wordGen)
        y <- Gen.nonEmptyListOf(wordGen)
      } yield (x.distinct, y.distinct), 100)
    val got = pairs.toDF("x", "y")
      .select(graft.ext.TextAnalysis.jaccard($"x", $"y")).as[Double].collect()
    val want = pairs.map { case (xs, ys) =>
      xs.toSet.intersect(ys.toSet).size.toDouble / (xs.toSet ++ ys.toSet).size
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }

  test("zip_with shingle construction equals sliding-window oracle") {
    val wordGen = Gen.oneOf("aa", "b", "ccc", "dd", "e", "ff", "g")
    val docs = sample(Gen.listOf(wordGen), 200) // includes <3-word docs
    val got = docs.map(_.mkString(" ")).toDF("text")
      .select(graft.ext.TextAnalysis.wordShingles($"text", 3).as("sg"))
      .as[Seq[String]].collect()
    val want = docs.map { ws =>
      if (ws.length < 3) Seq.empty[String]
      else ws.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    got.zip(want).zip(docs).foreach { case ((g, w), d) =>
      assert(g == w, s"doc=$d")
    }
  }

  test("rolling winnow equals an independent direct computation") {
    // independent oracle: per-position polynomial via BigInt modpow —
    // no shared code with RollingWinnow.winnow's rolling recurrence
    val M = BigInt(1000000007L)
    def direct(s: String, k: Int, w: Int): Seq[Long] = {
      val n = s.length - k + 1
      if (n < w) return Seq.empty
      val hs = (0 until n).map { i =>
        (0 until k).map { t =>
          BigInt(s.charAt(i + t).toInt) * BigInt(257).modPow(k - 1 - t, M)
        }.sum.mod(M).toLong
      }
      (0 to n - w).map(j => hs.slice(j, j + w).min)
    }
    val charGen = Gen.frequency(
      (8, Gen.alphaNumChar), (2, Gen.oneOf(' ', '.', ',', '!')))
    val strGen = for {
      len <- Gen.choose(0, 80)
      cs <- Gen.listOfN(len, charGen)
    } yield cs.mkString
    sample(strGen, 200).foreach { s =>
      assert(
        graft.functions.RollingWinnow.winnow(s, 8, 4).toSeq ==
          direct(s, 8, 4),
        s"winnow mismatch on ${s.take(40)}… (len ${s.length})")
    }
    // the exact boundary lengths around k and k+w-1
    Seq(0, 7, 8, 10, 11, 12).foreach { len =>
      val s = "abcdefghijklmnop".take(len)
      assert(graft.functions.RollingWinnow.winnow(s, 8, 4).toSeq ==
        direct(s, 8, 4), s"boundary len $len")
    }
  }

  test("text scrub matches an independent JVM regex reference on " +
    "arbitrary strings") {
    import graft.ext.TextAnalysis._
    // the same pass, written directly against java.util.regex — an
    // implementation-independent statement of the scrub contract
    def ref(s: String): String = {
      var t = s.replaceAll(scrubEmail, "<EMAIL>")
      t = t.replaceAll(scrubUrl, "<URL>")
      t = t.replaceAll(scrubNum, "<NUM>")
      t = t.replaceAll(scrubStop, "")
      t.replaceAll("\\s+", " ").trim
    }
    val word = Gen.oneOf("the", "a", "on", "table", "scan42", "42",
      "bob@x.io", "http://a.b/c?d=1", "x.y+z@mail.org", "...", "a1b2")
    val textGen = Gen.listOf(word).map(_.mkString(" "))
    val texts = sample(textGen, 300).distinct
    val got = texts.toDF("text")
      .select(col("text"), scrub(col("text")).as("s"))
      .as[(String, String)].collect().toMap
    texts.foreach { t =>
      assert(got(t) == ref(t), s"scrub mismatch on '$t'")
    }
    // idempotence: a scrubbed document passes through unchanged (the
    // masks contain no scrubbable material)
    val once = got.values.toSeq.distinct
    val twice = once.toDF("text")
      .select(col("text"), scrub(col("text")).as("s"))
      .as[(String, String)].collect().toMap
    once.foreach(s => assert(twice(s) == s, s"not idempotent on '$s'"))
  }

  test("packSequences invariants on random corpora: token conservation, " +
      "dense pack ids, budget-respecting starts") {
    import graft.ext.Export
    val gen = for {
      src <- Gen.oneOf("a", "b", "c")
      nt <- Gen.choose(1, 300)
    } yield (src, nt)
    val rows = sample(gen, 400).zipWithIndex
      .map { case ((src, nt), i) => (src, i.toLong, nt) }
    val df = rows.toDF("source", "doc_id", "nt")
    for (budget <- Seq(64, 128, 1024)) {
      val packs = Export.packSequences(df, $"source", $"doc_id", $"nt",
        budget).as[(String, Long, Long, Long, Long, Long)].collect()
      // conservation: every doc's tokens land in exactly one pack
      val bySrc = rows.groupBy(_._1).view
        .mapValues(rs => (rs.size.toLong, rs.map(_._3.toLong).sum)).toMap
      val packedBySrc = packs.groupBy(_._1).view
        .mapValues(ps => (ps.map(_._3).sum, ps.map(_._4).sum)).toMap
      assert(packedBySrc == bySrc)
      // ids start at 0 and are strictly increasing with doc order; a doc
      // larger than the budget may legitimately SKIP ids (it consumes
      // several budget units), so density is not an invariant
      for ((_, ps) <- packs.groupBy(_._1)) {
        val ordered = ps.sortBy(_._5).map(_._2).toSeq
        assert(ordered.head == 0L)
        assert(ordered == ordered.sorted && ordered.distinct == ordered)
      }
      // oracle replay: sequential offset walk reproduces every pack id
      val expect = rows.groupBy(_._1).view.mapValues { rs =>
        var off = 0L
        rs.sortBy(_._2).map { case (_, id, nt) =>
          val p = off / budget; off += nt; (id, p) }.toMap
      }.toMap
      val gotDocRange = packs.map(p => (p._1, p._2, p._5, p._6))
      for ((src, pid, first, last) <- gotDocRange) {
        assert(expect(src)(first) == pid && expect(src)(last) == pid)
      }
    }
  }

  test("mixtureWeights invariants on random corpora: weights sum to ~1, " +
      "order-preserving in token mass, T→∞ flattens") {
    import graft.ext.Selection
    val gen = for {
      src <- Gen.oneOf("s1", "s2", "s3", "s4")
      words <- Gen.choose(1, 40)
    } yield (src, Seq.fill(words)("w").mkString(" "))
    val rows = sample(gen, 300).zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
    val df = rows.toDF("doc_id", "source", "text")
    for (temp <- Seq(1.0, 2.0, 8.0)) {
      val out = Selection.mixtureWeights(df, temp)
        .as[(String, Long, Long, Double, Double)].collect()
      assert(math.abs(out.map(_._4).sum - 1.0) < 1e-4, s"T=$temp")
      // more tokens → weight at least as large (monotone in mass)
      val byMass = out.sortBy(_._3)
      assert(byMass.map(_._4).toSeq == byMass.map(_._4).sorted.toSeq)
    }
    // higher temperature compresses the weight spread toward uniform
    def spread(t: Double) = {
      val ws = Selection.mixtureWeights(df, t)
        .as[(String, Long, Long, Double, Double)].collect().map(_._4)
      ws.max - ws.min
    }
    assert(spread(8.0) <= spread(2.0) && spread(2.0) <= spread(1.0))
  }

  test("repetitionMetrics bounds on random token streams: fractions " +
      "non-negative, top ≤ dup-inclusive mass, short docs default") {
    import graft.ext.TextAnalysis
    val gen = Gen.listOfN(30, Gen.oneOf("x", "y", "z", "q"))
      .map(_.mkString(" "))
    val rows = sample(gen, 120).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val extra = Seq((9001L, ""), (9002L, "solo"))
    val df = (rows ++ extra).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(df)
      .as[(Long, String, Double, Double, Boolean)].collect()
    assert(out.length == rows.length + extra.length)
    for ((id, top, tbf, dtf, keep) <- out) {
      assert(tbf >= 0.0 && dtf >= 0.0, s"doc $id")
      if (id >= 9001L) {
        assert(top == "" && tbf == 0.0 && dtf == 0.0 && keep)
      } else {
        // a 4-symbol alphabet over 30 tokens always repeats some bigram
        assert(top.nonEmpty && tbf > 0.0)
        assert(keep == (tbf <= 0.2 && dtf <= 0.6))
      }
    }
  }

  test("minhash signature similarity approximates Jaccard") {
    // two near-dup shingle sets vs two unrelated ones
    val base = (1 to 100).map(i => s"sh$i")
    val near = base.drop(5) ++ Seq("x1", "x2", "x3") // j ≈ 0.87
    val far = (1 to 100).map(i => s"zz$i")
    val df = Seq(
      ("a", base), ("b", near), ("c", far)).toDF("id", "sg")
      .withColumn("hv", graft.ext.Dedup.shingleHashes($"sg"))
      .select($"id", graft.ext.Dedup.minhashSignature($"hv", 128).as("sig"))
    val sigs = df.as[(String, Seq[Long])].collect().toMap
    def agree(x: Seq[Long], y: Seq[Long]): Double =
      x.zip(y).count { case (a, b) => a == b }.toDouble / x.length
    assert(agree(sigs("a"), sigs("b")) > 0.7)
    assert(agree(sigs("a"), sigs("c")) < 0.2)
  }
}
