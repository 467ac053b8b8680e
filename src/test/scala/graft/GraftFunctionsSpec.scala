package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Similarity
import graft.functions.VecDot.vec_dot

/** Custom Catalyst expression specs. */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vec_dot is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { _ =>
      (Array.fill(64)(rnd.nextFloat()), Array.fill(64)(rnd.nextFloat()))
    }
    val df = rows.toDF("a", "b")
    val both = df.select(
      vec_dot($"a", $"b").as("fast"),
      Similarity.dotHof($"a", $"b").as("slow"))
      .as[(Double, Double)].collect()
    both.foreach { case (f, s) => assert(f == s) } // exact, not approx
  }

  test("vec_dot null and empty handling") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(3f, 4f))),
      (None, Some(Array(1f))),
      (Some(Array.empty[Float]), Some(Array.empty[Float])))
      .toDF("a", "b")
    val out = df.select(vec_dot($"a", $"b")).as[Option[Double]].collect()
    assert(out.toSeq == Seq(Some(11.0), None, Some(0.0)))
  }

  test("vec_dot rejects non-float-array inputs at analysis") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    intercept[Exception] {
      df.select(vec_dot($"a", $"b")).collect()
    }
  }

  test("minhash_sig is bit-identical to the HOF formulation") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 30).map(_ =>
      Tuple1(Seq.fill(rnd.nextInt(200) + 1)(rnd.nextLong().abs % 2147483647L)))
    val df = rows.toDF("hv")
    val both = df.select(
      graft.ext.Dedup.minhashSignature($"hv", 128).as("fast"),
      graft.ext.Dedup.minhashSignatureHof($"hv", 128).as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    both.foreach { case (f, s) => assert(f == s) }
  }

  test("simhash60 is bit-identical to the HOF formulation") {
    val docs = graft.engine.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200)
    val both = docs.select(
      graft.ext.TextAnalysis.simhash($"text").as("fast"),
      graft.ext.TextAnalysis.simhashHof($"text").as("slow"))
      .as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (f, s) => assert(f == s) }
    // degenerate inputs: no features → all votes 0 → no bits set
    val edge = Seq(Tuple1("solo"), Tuple1("a a a")).toDF("text")
      .select(graft.ext.TextAnalysis.simhash($"text").as("h"),
        graft.ext.TextAnalysis.simhashHof($"text").as("s"))
      .as[(Long, Long)].collect()
    edge.foreach { case (f, s) => assert(f == s) }
  }

  test("hash60 is bit-identical to the composed conv/substring/md5 form") {
    // real file source so the codegen path runs (vec_dot lesson); the
    // portable form is what every DuckDB oracle replicates
    val docs = graft.engine.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .limit(200)
      .select(explode(graft.ext.TextAnalysis.tokens($"text")).as("w"))
    val both = docs.select(
      graft.functions.Hash60.hash60($"w").as("fast"),
      graft.ext.TextAnalysis.hash60Portable($"w").as("slow"))
      .as[(Long, Long)].collect()
    assert(both.length > 1000)
    both.foreach { case (f, s) => assert(f == s) }
    // interpreted path (local relation → constant-folded eval) agrees,
    // including the empty string and multi-byte UTF-8
    val edge = Seq("", "a", "ünïcode ☃", "x" * 5000).toDF("w")
      .select(graft.functions.Hash60.hash60($"w").as("fast"),
        graft.ext.TextAnalysis.hash60Portable($"w").as("slow"))
      .as[(Long, Long)].collect()
    edge.foreach { case (f, s) => assert(f == s) }
    // non-negative by construction (top 60 bits)
    both.foreach { case (f, _) => assert(f >= 0L) }
  }

  test("hyperplane_sketch is bit-identical to the per-bucket composition") {
    val emb = graft.engine.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
    val nbits = 6; val tables = 32
    val both = emb.select(
      graft.functions.HyperplaneSketch
        .hyperplane_sketch($"embedding", 64, nbits, tables).as("fast"),
      array((0 until tables).map(t =>
        Similarity.hyperplaneBucket($"embedding", 64, nbits, t * nbits)): _*)
        .as("slow"))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(both.nonEmpty)
    both.foreach { case (f, s) => assert(f == s) }
  }

  test("extensions register vec_dot and minhash_sig for SQL use") {
    graft.engine.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), " +
        "array(cast(3.0 as float), cast(4.0 as float))) AS d")
      .as[Double].head()
    assert(out == 11.0)
    val sig = spark.sql(
      "SELECT size(minhash_sig(array(1L, 2L, 3L), 16)) AS n")
      .as[Int].head()
    assert(sig == 16)
    // rolling_winnow from SQL equals the Column API on the same input
    val sqlFps = spark.sql(
      "SELECT rolling_winnow('abcdefghijklmno', 8, 4) AS fps")
      .select(col("fps")).as[Seq[Long]].head()
    val colFps = Seq("abcdefghijklmno").toDF("t")
      .select(graft.functions.RollingWinnow.rolling_winnow(col("t"), 8, 4)
        .as("fps")).as[Seq[Long]].head()
    assert(sqlFps == colFps && sqlFps.nonEmpty)
  }

  test("SQL registration rejects wrong arity with a clean error") {
    graft.engine.GraftExtensions.register(spark)
    def messageChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
    val e = intercept[Throwable] {
      spark.sql("SELECT hyperplane_sketch(array(cast(1.0 as float)))")
        .collect()
    }
    assert(messageChain(e).contains("expected 4 arguments"))
    val e2 = intercept[Throwable] {
      spark.sql("SELECT vec_dot(array(cast(1.0 as float)))").collect()
    }
    assert(messageChain(e2).contains("expected 2 arguments"))
  }

  test("pq_encode codes row-equal the relational min_by encode") {
    val rnd = new scala.util.Random(11)
    // includes short vectors so the slice-past-the-end window semantics
    // (empty/truncated subvectors) are pinned against the relational form
    val df = (0L until 40L).map { i =>
      val len = if (i % 13 == 0) 52 else 64
      (i, Array.fill(len)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
    val fast = Similarity.pqCodes(df, sub = 8, m = 8, codebookSize = 16)
      .as[(Long, Int, Long)].collect().toSet
    val slow = Similarity.pqCodesRelational(df, dim = 64, m = 8, codebookSize = 16)
      .as[(Long, Int, Long)].collect().toSet
    assert(fast == slow)
    assert(fast.size == 40 * 8)
  }

  test("rolling_winnow equals the direct per-position polynomial form") {
    import graft.functions.RollingWinnow.{B, M, rolling_winnow}
    val k = 8
    val w = 4
    // direct (non-rolling) HOF reference: hash(i) = Σ code·B^(k-1-t) mod M
    val pows = (0 until k).map { t =>
      var p = 1L; (0 until (k - 1 - t)).foreach(_ => p = p * B % M); p
    }
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaaaaaaaa"),
      (3L, "exactly11ch"), // one window, len = k+w-1
      (4L, "short")) // below k → empty
      .toDF("doc_id", "text")
    val viaExpr = df.select($"doc_id",
      rolling_winnow($"text", k, w).as("mins"))
      .as[(Long, Seq[Long])].collect().toMap
    val hsDf = df.filter(length($"text") >= k)
      .select($"doc_id", $"text",
        transform(sequence(lit(1), length($"text") - (k - 1)),
          i => (0 until k).map(t =>
            ascii($"text".substr(i + t, lit(1))).cast("long") * pows(t))
            .reduce(_ + _) % M).as("hs"))
      .filter(size($"hs") >= w)
      .select($"doc_id",
        transform(sequence(lit(1), size($"hs") - (w - 1)),
          j => array_min(slice($"hs", j, lit(w)))).as("mins"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaExpr(4L).isEmpty)
    assert(viaExpr(3L).length == 1)
    Seq(1L, 2L, 3L).foreach(id => assert(viaExpr(id) == hsDf(id), s"doc $id"))
  }

  test("round6 fast path matches BigDecimal HALF_UP everywhere") {
    def ref(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rnd = new scala.util.Random(3)
    val probes =
      Seq(0.0, 0.1234565, 0.12345649999999999, 1.0000005, 123.4567895,
        9999.9999995, 1e4, 1e7, -0.1234565, -5.5e-7, 2.5e-7) ++
        (1 to 20000).map(_ => rnd.nextDouble() * 200) ++
        // adversarial: values manufactured at the .5 boundary
        (0 to 2000).map(i => i / 2e6) ++
        (0 to 2000).map(i => i / 2e6 + 1e-13)
    probes.foreach { x =>
      assert(graft.functions.PqEncode.round6(x) == ref(x),
        s"round6 mismatch at $x")
    }
    // non-finite inputs pass through (Spark's Round semantics) instead
    // of hitting BigDecimal.valueOf's NumberFormatException
    assert(graft.functions.PqEncode.round6(Double.NaN).isNaN)
    assert(graft.functions.PqEncode.round6(Double.PositiveInfinity)
      == Double.PositiveInfinity)
    assert(graft.functions.PqEncode.round6(Double.NegativeInfinity)
      == Double.NegativeInfinity)
  }

  test("rolling_winnow runs inside whole-stage codegen, equal to eval") {
    // real file source: Seq-based frames are constant-folded by
    // ConvertToLocalRelation and never reach doGenCode (vec_dot lesson)
    import graft.functions.RollingWinnow.rolling_winnow
    val df = graft.engine.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter(length($"text") >= 11)
      .select($"doc_id", rolling_winnow($"text", 8, 4).as("mins"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty)
    val viaCodegen = df.as[(Long, Seq[Long])].collect().toMap
    assert(viaCodegen.nonEmpty)
    // interpreted path on the same rows (local relation → no codegen)
    val local = graft.engine.Tables
      .load(spark, "/root/testdata/sf0.001", "documents")
      .filter(length($"text") >= 11)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
      .toDF("doc_id", "text")
      .select($"doc_id", rolling_winnow($"text", 8, 4).as("mins"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaCodegen == local)
  }

  test("hash60 compiles under whole-stage codegen with fallback disabled") {
    // r20 regression pin: the r19 doGenCode emitted a shift-OR chain that
    // Janino could not parse (CompileException → silent interpreted
    // fallback). With fallback disabled and CODEGEN_ONLY, any codegen
    // failure is a test failure instead of a WARN.
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val df = graft.engine.Tables
        .load(spark, "/root/testdata/sf0.001", "documents")
        .select(explode(graft.ext.TextAnalysis.tokens($"text")).as("w"))
        .select($"w", graft.functions.Hash60.hash60($"w").as("fast"))
      val codegenSpans = df.queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
      assert(codegenSpans.nonEmpty)
      val out = df.select($"fast",
        graft.ext.TextAnalysis.hash60Portable($"w").as("slow"))
        .as[(Long, Long)].collect()
      assert(out.length > 100)
      out.foreach { case (f, s) => assert(f == s) }
    } finally {
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("vec_dot runs inside whole-stage codegen") {
    // needs a real source: projections over a LocalRelation are constant-
    // folded by ConvertToLocalRelation and never reach codegen
    val df = graft.engine.Tables
      .load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(vec_dot($"embedding", $"embedding").as("d"))
    val codegenSpans = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(codegenSpans.nonEmpty)
    assert(df.agg(sum($"d")).as[Double].head() > 0)
  }
}
