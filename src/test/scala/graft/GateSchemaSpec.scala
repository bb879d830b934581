package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Gate-schema guard: the driver's correctness comparator loads each
  * result parquet into pandas and sorts/hashes FLAT columns — an
  * ArrayType/MapType/StructType cell arrives as an unhashable
  * ndarray/dict and crashes `sort_values` (the round-8
  * `text_inverted_index` failure mode: rows/schema/hash all null with a
  * TypeError traceback instead of a verdict). House convention is to
  * string-serialize nested values before they leave a gated query
  * (`array_join(array_sort(...), ",")` — e.g. Pipeline.scala's
  * truncate/chunk queries). This spec builds every gated plan and fails
  * loudly on any nested output column, so that class of gate crash
  * cannot recur no matter which file a future query lands in.
  */
class GateSchemaSpec extends SparkSpec {

  test("no gated query emits a nested (array/map/struct) output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // building the frame is lazy for most queries; the handful of
        // eager ones (iterative loops, streaming AvailableNow runs)
        // execute at fixture scale, same as PlanAuditSpec's full sweep
        val schema = fn(spark, SparkEntry.smokeDir).schema
        Caching.releaseAll()
        spark.catalog.clearCache()
        schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
              f.dataType.isInstanceOf[MapType] ||
              f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
    }
    assert(offenders.isEmpty,
      "nested output columns crash the driver's pandas comparator — " +
        "string-serialize them (array_join / to_json):\n" +
        offenders.mkString("\n"))
  }

  test("every oracle key names a gated query (no orphaned oracle SQL)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }
}
