package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** Testdata-drift tripwire (VERDICT r8 ask #2).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * changed on-disk types once (`events.ts`: TIMESTAMP(NANOS) →
  * timestamp[us]), which silently broke 11 queries discovered only at
  * bench/correctness time. This spec loads every table through
  * [[Tables.load]] at sf0.001 and pins the POST-LOAD logical schema — names
  * and Spark dtypes — so a regen that shifts any table fails ONE obvious
  * test naming the column, instead of a scatter of analysis errors.
  *
  * Types asserted are the normalized ones the whole query surface is written
  * against (e.g. `events.ts` must surface as TIMESTAMP LTZ whatever the file
  * carries). Integer width may drift benignly (int32 vs int64 parquet
  * writers) so integral columns accept either.
  */
class TablesSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val integral: Set[DataType] = Set(IntegerType, LongType)

  /** expected column -> acceptable Spark types, in declared order */
  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> integral, "r_name" -> Set(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> integral, "n_name" -> Set(StringType),
      "n_regionkey" -> integral),
    "customer" -> Seq(
      "c_custkey" -> integral, "c_name" -> Set(StringType),
      "c_nationkey" -> integral, "c_acctbal" -> Set(DoubleType),
      "c_mktsegment" -> Set(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> integral, "s_name" -> Set(StringType),
      "s_nationkey" -> integral, "s_acctbal" -> Set(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> integral, "p_name" -> Set(StringType),
      "p_brand" -> Set(StringType), "p_type" -> Set(StringType),
      "p_size" -> integral, "p_retailprice" -> Set(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> integral, "o_custkey" -> integral,
      "o_orderstatus" -> Set(StringType), "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set(TimestampType, TimestampNTZType, DateType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> integral, "l_partkey" -> integral,
      "l_suppkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> Set(DoubleType), "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType), "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set(TimestampType, TimestampNTZType, DateType)),
    "events" -> Seq(
      "event_id" -> integral,
      // the whole events query surface does epoch arithmetic on ts; the
      // loader must normalize whatever the file carries to TIMESTAMP LTZ
      "ts" -> Set(TimestampType),
      "user_id" -> integral, "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Seq(
      "doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Seq(
      "vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> integral)
  )

  test("Tables.all covers exactly the expected tables") {
    assert(Tables.all.toSet === expected.keySet)
  }

  test("events ts normalization is wall-clock-preserving under the UTC contract") {
    // Engine↔oracle timezone contract (VERDICT r8 stretch #7): the session
    // tz is pinned UTC, so normalizing a TIMESTAMP_NTZ (or nanos-as-long)
    // file column to TIMESTAMP LTZ must not move any wall-clock instant —
    // otherwise q13's window boundaries drift vs the DuckDB oracle, which
    // reads the same file as tz-less TIMESTAMP.
    import org.apache.spark.sql.functions._
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    val raw = spark.read.parquet(s"$dir/events.parquet")
      .select(date_format(col("ts").cast("timestamp_ntz"),
        "yyyy-MM-dd HH:mm:ss.SSSSSS").as("wall"))
    val norm = Tables.load(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("wall"))
    assert(norm.exceptAll(raw).isEmpty && raw.exceptAll(norm).isEmpty,
      "ts normalization moved at least one instant relative to the " +
        "tz-less file value — engine and DuckDB oracle would disagree")
  }

  for (name <- Tables.all) {
    test(s"testdata table `$name` loads with the pinned logical schema") {
      val schema = Tables.load(spark, dir, name).schema
      val exp = expected(name)
      assert(schema.fieldNames.toSeq === exp.map(_._1),
        s"column set/order drifted for `$name`")
      for (((col, accepted), actual) <- exp.zip(schema.fields)) {
        assert(accepted.contains(actual.dataType),
          s"`$name`.`$col` drifted to ${actual.dataType.simpleString}; " +
            s"accepted: ${accepted.map(_.simpleString).mkString(", ")} — " +
            "the driver regenerated testdata with a new writer; adapt " +
            "graft.engine.Tables (see normalizeEventTs for the pattern)")
      }
    }
  }
}
