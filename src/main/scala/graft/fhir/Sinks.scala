package graft.fhir

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Sink/reset abstraction for the reference's external surfaces
  * (SURVEY §2.1 S5–S10): resources go to one collection per type, facts to
  * three relational tables, with truncate/drop reset ops. Tests run
  * against the parquet implementations; the JDBC implementation maps to
  * the reference's Postgres COPY path and only needs a URL to swap in —
  * nothing upstream changes, because both sides consume plain DataFrames.
  * (A MongoDB connector sink drops in the same way via
  * `format("mongodb")`; not linked here because the connector jar is not
  * part of the build environment.)
  */
trait ResourceSink {
  /** S5: per-collection resource write (reference bundle.go:111-120,
    * unordered bulk). `routed` carries a `collection` column.
    */
  def writeResources(routed: DataFrame): Unit

  /** S10: `-reset` — drop all resource collections (db.go:63-75). */
  def reset(): Unit
}

trait FactSink {
  /** S8: append one fact table in its COPY column order (db.go:139/235/330). */
  def writeFacts(table: String, facts: DataFrame): Unit

  /** S9: unconditional fact truncate at startup (db.go:43-59). */
  def clearFactTables(tables: Seq[String]): Unit
}

/** Columnar warehouse implementation — collections become partition
  * directories, facts become parquet tables. Used by tests and FhirMain.
  */
class ParquetSink(warehouseDir: String) extends ResourceSink with FactSink {
  def writeResources(routed: DataFrame): Unit =
    routed.write.mode("append").partitionBy("collection")
      .parquet(s"$warehouseDir/resources")

  def reset(): Unit = {
    val p = java.nio.file.Paths.get(warehouseDir, "resources")
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  def writeFacts(table: String, facts: DataFrame): Unit =
    facts.write.mode("overwrite").parquet(s"$warehouseDir/$table")

  def clearFactTables(tables: Seq[String]): Unit = ()
}

/** The reference's MongoDB resource surface (bundle.go:111-124): one
  * collection per resource type, unordered bulk writes. Uses the
  * DataSource V2 "mongodb" format, which resolves at runtime from the
  * MongoDB Spark connector jar (not part of this build environment — the
  * class compiles and is the documented deployment path; tests exercise
  * the same DataFrames through [[ParquetSink]]).
  *
  * `ordered=false` reproduces the reference's `Bulk().Unordered()`; the
  * per-collection loop mirrors its type routing, with each write a
  * partition-parallel bulk insert.
  */
class MongoResourceSink(uri: String, database: String) extends ResourceSink {

  /** Set by [[reset]]; while pending, the FIRST write touching each
    * collection name uses overwrite (the connector drops + recreates the
    * collection), later writes to the same name append. Keyed per
    * collection, not per call, so a multi-write caller (e.g. a per-batch
    * streaming loop) accumulates correctly: each collection is replaced
    * exactly once after a reset, including collections that first appear
    * in a later batch.
    */
  private var dropPending = false
  private var overwritten: Set[String] = Set.empty

  def writeResources(routed: DataFrame): Unit = {
    // The reference writes every collection it encounters (bundle.go:111-120)
    // — including fallback lower(type)+"s" names for resource types outside
    // the fixed 11 — so the collection list comes from the data, not from
    // Schemas.collections. The distinct is over collection *names* (bounded
    // by the number of resource types, dozens at most), not rows. Callers
    // pass a cached `routed` (FhirMain persists it) so the ingest lineage
    // is not recomputed once per collection.
    val colls = routed.select(col("collection")).distinct()
      .collect().map(_.getString(0)).sorted
    colls.foreach { coll =>
      val mode =
        if (dropPending && !overwritten.contains(coll)) "overwrite"
        else "append"
      routed.filter(col("collection") === coll)
        .select(col("resource.*"))
        .write.format("mongodb")
        .mode(mode)
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", coll)
        .option("ordered", "false")
        .save()
    }
    // marked only after every collection in THIS call wrote: a mid-loop
    // failure marks nothing, so a retried writeResources overwrites the
    // whole call's collections again instead of appending duplicates into
    // the ones that succeeded
    if (dropPending) overwritten ++= colls
  }

  /** S10: the reference drops every collection up front and logs-and-
    * continues on failure (db.go:63-75). The Spark connector exposes no
    * drop on the write path, so reset is realized as overwrite-with-
    * replace on the next write — collections present in the new run end
    * up containing exactly this run's resources, with no mid-run crash
    * after the fact tables were already truncated. Caveat vs the
    * reference: a collection that receives NO resources in the new run
    * is left untouched (the write path never sees it); a full-parity
    * reset of such stragglers needs an admin drop outside Spark.
    */
  def reset(): Unit = { dropPending = true; overwritten = Set.empty }
}

/** Relational implementation of the fact surface — the reference's
  * Postgres path. `reWriteBatchedInserts=true` turns executeBatch into
  * multi-row inserts (the practical COPY-speed JDBC setting); counts are
  * cast to int to match the reference's int32 fact columns (db.go:35-37)
  * at the boundary only. Partition-parallel: each executor partition
  * opens its own connection via the standard `df.write.jdbc`.
  *
  * `schema` qualifies every table name (`schema.table`): the reference
  * truncates/COPYs into the `synth_ma` schema (db.go:45-56), so pointing
  * at a reference-provisioned Postgres must hit the same tables, not
  * create fresh ones on the default search_path.
  */
class JdbcFactSink(url: String, schema: Option[String] = None,
    props: Properties = new Properties)
    extends FactSink {
  props.setProperty("reWriteBatchedInserts", "true")

  private def qualified(table: String): String =
    schema.map(s => s"$s.$table").getOrElse(table)

  def writeFacts(table: String, facts: DataFrame): Unit = {
    val narrowed = facts.columns.foldLeft(facts) { (df, c) =>
      if (Seq("pop", "pop_male", "pop_female").contains(c))
        df.withColumn(c, col(c).cast("int"))
      else df
    }
    narrowed.write.mode("append").jdbc(url, qualified(table), props)
  }

  def clearFactTables(tables: Seq[String]): Unit = {
    val conn = DriverManager.getConnection(url, props)
    try tables.foreach { t =>
      val st = conn.createStatement()
      // undefined-table/schema SQLStates (Postgres 42P01/3F000, Derby
      // 42X05/42Y07, ANSI 42S02): a first run has nothing to truncate —
      // not an error
      try st.executeUpdate(s"TRUNCATE TABLE ${qualified(t)}")
      catch {
        case e: java.sql.SQLException
            if Seq("42P01", "42X05", "42S02", "42Y55", "42Y07", "3F000")
              .contains(e.getSQLState) => ()
      } finally st.close()
    } finally conn.close()
  }
}
