package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** At-rest co-location: bucketed tables joined on the bucket key must not
  * shuffle — the storage-level answer to the "reuse a partitioning across
  * stages" requirement at 100 TB (rawstat bucketed by cs_fips feeds all
  * three fact rollups shuffle-free).
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed join on the bucket key plans without a shuffle") {
    // tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    // static conf and cannot be redirected on a live session
    val left = (1 to 1000).map(i => (s"fips${i % 50}", i.toLong))
      .toDF("cs_fips", "v")
    val right = (1 to 500).map(i => (s"fips${i % 50}", s"name$i"))
      .toDF("cs_fips", "nm")
    left.write.mode("overwrite").bucketBy(8, "cs_fips")
      .saveAsTable("graft_bucket_left")
    right.write.mode("overwrite").bucketBy(8, "cs_fips")
      .saveAsTable("graft_bucket_right")
    try {
      // disable auto-broadcast so the join would otherwise shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bucket_left")
        .join(spark.table("graft_bucket_right"), "cs_fips")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() == 10000) // 1000 left × 10 matches each / 50 keys
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_left")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_right")
    }
  }
}
