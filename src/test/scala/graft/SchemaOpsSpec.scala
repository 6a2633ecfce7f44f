package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.model.SchemaOps

/** B4: dotted nested-column existence checks against an entry schema. */
class SchemaOpsSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("incident", StructType(Seq(
      StructField("city", StringType),
      StructField("geo", StructType(Seq(
        StructField("lat", DoubleType))))))),
    StructField("tags", ArrayType(StructType(Seq(
      StructField("name", StringType)))))))

  test("resolve: flat, one-level, deep, through arrays, and misses") {
    assert(SchemaOps.columnExists(schema, "id"))
    assert(SchemaOps.columnExists(schema, "incident.city"))
    assert(SchemaOps.columnExists(schema, "incident.geo.lat")) // beyond ref's 1 level
    assert(SchemaOps.columnExists(schema, "tags.name"))
    assert(!SchemaOps.columnExists(schema, "incident.county"))
    assert(!SchemaOps.columnExists(schema, "id.sub"))
    assert(!SchemaOps.columnExists(schema, ""))
  }

  test("flatten yields dotted leaf paths with types") {
    val flat = SchemaOps.flatten(schema).toMap
    assert(flat("incident.geo.lat") === "double")
    assert(flat("tags.name") === "string")
    assert(flat.size === 4) // id, incident.city, incident.geo.lat, tags.name
  }
}
