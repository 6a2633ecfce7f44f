package graft.model

import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Nested column addressing (SURVEY.md §2 B4; DataCatalogController.py:
  * 333–360).
  *
  * The reference validates dotted `parent.child` tag targets against the
  * entry schema's subcolumns — exactly one level deep (:344–352). This
  * implementation resolves arbitrary depth (SURVEY.md §7 flagged the
  * one-level limit as a reference quirk worth generalizing) and steps
  * through arrays-of-structs the way SQL field access does.
  */
object SchemaOps {

  /** Resolve a dotted path against a schema; None if any segment is
    * missing or a non-struct is dereferenced.
    */
  def resolve(schema: StructType, dottedPath: String): Option[DataType] = {
    def step(dt: DataType, parts: List[String]): Option[DataType] =
      (dt, parts) match {
        case (t, Nil) => Some(t)
        case (s: StructType, p :: rest) =>
          s.fields.find(_.name == p).flatMap(f => step(f.dataType, rest))
        case (ArrayType(elem, _), ps) => step(elem, ps) // arr.field access
        case _ => None
      }
    val parts = dottedPath.split("\\.").toList.filter(_.nonEmpty)
    if (parts.isEmpty) None else step(schema, parts)
  }

  def columnExists(schema: StructType, dottedPath: String): Boolean =
    resolve(schema, dottedPath).isDefined

  /** Flatten a schema to dotted leaf paths — the "schema DataFrame" form
    * used for the existence anti-join at job level.
    */
  def flatten(schema: StructType, prefix: String = ""): Seq[(String, String)] =
    schema.fields.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case s: StructType => flatten(s, name)
        case ArrayType(s: StructType, _) => flatten(s, name)
        case other => Seq(name -> other.simpleString)
      }
    }.toSeq
}
