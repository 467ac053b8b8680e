package graft.fhir

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T4: graph-wide cross-reference rewrite (reference bundle.go:173-221).
  *
  * The reference reflects over every nested field of every resource at
  * *runtime*, collecting `*models.Reference` values and replacing those
  * whose string is a refMap key. Spark-first equivalent: walk the declared
  * `StructType` once at *plan-build* time and emit a nested
  * `transform`/`withField` expression that rewrites every Reference-shaped
  * struct through the per-row map. The walk is restricted to subtrees that
  * actually contain a Reference (mirroring the reflection type test at
  * bundle.go:206-207), so expression-tree size stays proportional to the
  * number of reference fields, not schema width (SURVEY §7.4-1). Pure
  * column expressions → whole-stage codegen, no UDF, no shuffle.
  */
object ReferenceRewrite {

  /** A struct is Reference-shaped iff it has a string `reference` field —
    * the structural analogue of `case *models.Reference` in Go.
    */
  def isReferenceShape(st: StructType): Boolean =
    st.fields.exists(f => f.name == "reference" && f.dataType == StringType)

  def containsReference(dt: DataType): Boolean = dt match {
    case st: StructType =>
      isReferenceShape(st) || st.fields.exists(f => containsReference(f.dataType))
    case ArrayType(et, _) => containsReference(et)
    case _ => false
  }

  /** Rewrite one reference string through the per-row map. Handles the
    * modern `"urn:uuid:…"`/`"Type/id"` fullUrl keys (main.go:266-272) and,
    * behind `legacyCid`, the dead-code `cid:` prefix path
    * (bundle.go:127-147). Unmatched references pass through unchanged,
    * like the reference's silent non-replace.
    */
  def rewriteRefString(ref: Column, refMap: Column, legacyCid: Boolean): Column = {
    val direct = try_element_at(refMap, ref)
    val withCid =
      if (legacyCid)
        coalesce(direct,
          when(ref.startsWith("cid:"),
            try_element_at(refMap, ref.substr(lit(5), length(ref)))))
      else direct
    coalesce(withCid, ref)
  }

  /** Recursively rebuild a column so every Reference-shaped struct beneath
    * it has its `reference` string mapped. Null structs/arrays propagate
    * as null, matching the reference's nil-pointer skips.
    *
    * Structs are rebuilt with a single flat `struct(...)` per level, NOT a
    * chain of `withField`s: each `withField` embeds its input expression
    * twice, so a fold over k fields is O(2^k) expression-tree nodes —
    * enough to OOM the analyzer on a realistic schema. The flat rebuild
    * references the parent once per field → linear in schema size
    * (SURVEY §7.4-1).
    */
  def rewriteValue(c: Column, dt: DataType, refMap: Column,
      legacyCid: Boolean = false): Column = dt match {
    case st: StructType if isReferenceShape(st) =>
      rebuildStruct(c, st, f =>
        if (f.name == "reference")
          rewriteRefString(c.getField("reference"), refMap, legacyCid)
        else c.getField(f.name))
    case st: StructType if containsReference(st) =>
      rebuildStruct(c, st, f =>
        rewriteValue(c.getField(f.name), f.dataType, refMap, legacyCid))
    case ArrayType(et, _) if containsReference(et) =>
      transform(c, x => rewriteValue(x, et, refMap, legacyCid))
    case _ => c
  }

  /** Null-preserving flat struct rebuild. */
  private def rebuildStruct(
      c: Column, st: StructType, mk: StructField => Column): Column =
    when(c.isNotNull, struct(st.fields.map(f => mk(f).as(f.name)).toSeq: _*))
      .otherwise(lit(null).cast(st))
}
