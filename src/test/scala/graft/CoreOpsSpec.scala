package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.CoreOps._

class CoreOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("absentOrFalse keeps null and false, drops true (A1 tri-state)") {
    val df = Seq[(Int, Option[Boolean])](
      (1, None), (2, Some(false)), (3, Some(true))).toDF("id", "dec")
    val kept = df.filter(absentOrFalse($"dec")).select("id")
      .as[Int].collect().sorted
    assert(kept.toSeq == Seq(1, 2))
  }

  test("stripSuffix handles 'Foo Town', 'Townsville', 'Town', exact ' Town'") {
    val df = Seq("Foo Town", "Townsville", "Town", " Town", "Agawam Town Town")
      .toDF("s")
    val out = df.select(stripSuffix($"s", " Town")).as[String].collect().toSeq
    assert(out == Seq("Foo", "Townsville", "Town", "", "Agawam Town"))
  }

  test("sentinel coalesces null to default") {
    val df = Seq[(Int, Option[Int])]((1, Some(7)), (2, None)).toDF("id", "v")
    val out = df.select(sentinel($"v", -999)).as[Int].collect().toSeq
    assert(out == Seq(7, -999))
  }

  test("distinctSorted dedups with set semantics and canonical order") {
    val df = Seq(Seq(3, 1, 3, 2, 1)).toDF("a")
    val out = df.select(distinctSorted($"a")).as[Seq[Int]].collect().head
    assert(out == Seq(1, 2, 3))
  }

  test("ageYears: birthday counts the day it happens; Feb 29 handled") {
    val cases = Seq(
      ("1980-05-15", "2020-05-14", 39), // day before 40th birthday
      ("1980-05-15", "2020-05-15", 40), // on the birthday (Go loop with
      ("1980-05-15", "2020-05-16", 40), // wall-clock now: counts)
      ("2000-02-29", "2019-02-28", 18), // leap birth, non-leap asOf
      ("2000-02-29", "2019-03-01", 19),
      ("2000-02-29", "2020-02-29", 20), // leap-to-leap exact
      ("1955-01-01", "2020-01-01", 65))
    val df = cases.toDF("b", "a", "want")
    val got = df.select(
      ageYears($"b".cast("date"), $"a".cast("date")).as("got"), $"want")
    assert(got.filter($"got" =!= $"want").count() == 0)
  }

  test("explodeGt0 drops empty/null arrays and non-positive elements (A4+A5)") {
    val df = Seq(
      (1, Seq(10, 0, -999)),
      (2, Seq.empty[Int]),
      (3, null.asInstanceOf[Seq[Int]]),
      (4, Seq(5, 6))).toDF("id", "arr")
    val out = explodeGt0(df, "arr", "v").select("id", "v")
      .as[(Int, Int)].collect().toSeq.sorted
    assert(out == Seq((1, 10), (4, 5), (4, 6)))
  }

  test("oneHot under sum aggregates counts") {
    val df = Seq("male", "female", "male", "other").toDF("g")
    val Row(m: Long, f: Long) = df.agg(
      sum(oneHot($"g", "male")), sum(oneHot($"g", "female"))).head
    assert(m == 2 && f == 1)
  }

  test("exactSum is exact on 2-decimal doubles") {
    val df = (1 to 1000).map(i => i + 0.01).toDF("v")
    val got = df.agg(exactSum($"v")).as[Double].head()
    assert(got == 500500.0 + 10.0)
  }

  test("saltedSumCount equals direct groupBy on a skewed key") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "HOT", i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("cnt"), sum($"v").as("sum_v"))
      .orderBy($"k").as[(String, Long, Long)].collect().toSeq
    val salted = saltedSumCount(df, Seq("k"), Seq("v"))
      .orderBy($"k").as[(String, Long, Long)].collect().toSeq
    assert(salted == direct)
  }

  test("asOfJoin: strict excludes equal timestamps, non-strict includes") {
    import graft.ops.AsOfJoin
    val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "pid")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (3L, 10L, "rX"))
      .toDF("k", "t", "rid")
    def run(strict: Boolean) =
      AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), strict)
        .select($"pid", $"rid").as[(String, Option[String])]
        .collect().toMap
    val s = run(strict = true)
    // p1 at t=100: the only right is AT 100 — strict finds nothing
    assert(s == Map("p1" -> None, "p2" -> Some("r150"), "p3" -> None))
    val ns = run(strict = false)
    assert(ns == Map("p1" -> Some("r100"), "p2" -> Some("r150"),
      "p3" -> None))
  }

  test("zorderKey interleaves bits like the reference Morton encode") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }
    val rnd = new scala.util.Random(3)
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L)) ++
      (1 to 50).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val out = rows.toDF("x", "y")
      .select($"x", $"y", zorderKey($"x", $"y", 16).as("z"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (x, y, z) => assert(z == morton(x, y, 16), s"($x,$y)") }
    // locality sanity: the 2x2 block around the origin packs into [0,4)
    val block = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L)).toDF("x", "y")
      .select(zorderKey($"x", $"y", 16)).as[Long].collect().toSet
    assert(block == Set(0L, 1L, 2L, 3L))
  }

  test("asOf and asOfBanded resolve equal-time right duplicates identically") {
    import graft.ops.AsOfJoin
    // two rights at the same timestamp; the match crosses a band boundary
    // so banded takes the carry-in path — both must pick the max payload
    val left = Seq((0L, 700L, "p")).toDF("k", "t", "pid")
    val right = Seq((0L, 499L, "a"), (0L, 499L, "b")).toDF("k", "t", "rid")
    val plain = AsOfJoin.asOf(left, right, "k", "t", Seq("rid"))
      .select($"rid").as[String].head()
    val banded = AsOfJoin.asOfBanded(left, right, "k", "t", Seq("rid"), 500L)
      .select($"rid").as[String].head()
    assert(plain == "b" && banded == "b")
  }

  test("asOfBanded equals asOf under heavy key skew, with bounded bands") {
    import graft.ops.AsOfJoin
    val rnd = new scala.util.Random(13)
    // one hot key holds 50% of all rows; times dense enough that matches
    // regularly cross band boundaries (carry-in path exercised)
    def mk(n: Int) = (1 to n).map { i =>
      val k = if (i % 2 == 0) 0L else 1L + rnd.nextInt(20)
      (k, rnd.nextInt(10000).toLong, s"v$i")
    }
    val left = mk(2000).toDF("k", "t", "pid")
    val right = mk(2000).toDF("k", "t", "rid")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"k", $"t", $"pid", $"rid")
        .as[(Long, Long, String, Option[String])].collect()
        .sortBy(r => (r._1, r._2, r._3)).toSeq
    for (strict <- Seq(true, false)) {
      val plain = canon(AsOfJoin.asOf(left, right, "k", "t", Seq("rid"), strict))
      val banded = canon(AsOfJoin.asOfBanded(
        left, right, "k", "t", Seq("rid"), bandWidth = 500L, strict))
      assert(banded == plain)
    }
    // the banding must actually split the hot key: no (key, band)
    // partition group sees more than a band's worth of rows
    val hotPerBand = left.unionByName(right.withColumnRenamed("rid", "pid"))
      .filter($"k" === 0L)
      .groupBy(floor($"t" / 500L).as("band")).count()
      .agg(max($"count")).as[Long].head()
    val hotTotal = 2000L
    assert(hotPerBand < hotTotal / 4,
      s"hot key should spread over bands, max band=$hotPerBand")
  }

  test("asOfBanded bands exactly for long times beyond double precision") {
    import graft.ops.AsOfJoin
    // epoch-nano scale: 2^60 is far past double's 2^53 exact range, so a
    // double-division band would collapse neighbouring timestamps; the
    // integer floor-div must keep band boundaries exact. Negative times
    // exercise the pmod floor handling.
    val base = 1L << 60
    val left = Seq((0L, base + 24, "pA"), (0L, base + 1024, "pB"),
      (0L, -3L, "pNeg")).toDF("k", "t", "pid")
    val right = Seq((0L, base + 23, "rA"), (0L, base + 1023, "rB"),
      (0L, -500L, "rNeg")).toDF("k", "t", "rid")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"pid", $"rid").as[(String, Option[String])].collect().toMap
    val plain = canon(AsOfJoin.asOf(left, right, "k", "t", Seq("rid")))
    val banded = canon(AsOfJoin.asOfBanded(
      left, right, "k", "t", Seq("rid"), bandWidth = 1000L))
    assert(plain == Map("pA" -> Some("rA"), "pB" -> Some("rB"),
      "pNeg" -> Some("rNeg")))
    assert(banded == plain)
  }

  test("factRollup: pop shape without explode, disease shape with explode") {
    val rs = Seq(
      // (deceased, gender, key, diseases)
      (Some(false), "male", "A", Seq(10, -999, 0)),
      (None, "female", "A", Seq(10)),
      (Some(true), "male", "A", Seq(10)), // dead: excluded
      (None, "male", "B", Seq.empty[Int])) // no diseases: dropped by explode
      .toDF("deceasedboolean", "gender", "cs_fips", "uniquediseases")
    val pop = factRollup(rs, "deceasedboolean", "gender", Seq("cs_fips"))
      .orderBy("cs_fips")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(pop == Seq(("A", 2L, 1L, 1L), ("B", 1L, 1L, 0L)))
    val dis = factRollup(rs, "deceasedboolean", "gender", Seq("cs_fips"),
      explodeCol = Some("uniquediseases"), explodedAs = "disease_id")
      .orderBy("cs_fips", "disease_id")
      .as[(String, Int, Long, Long, Long)].collect().toSeq
    assert(dis == Seq(("A", 10, 2L, 1L, 1L)))
  }
}
