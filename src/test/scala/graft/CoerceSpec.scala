package graft

import org.apache.spark.sql.functions._
import graft.functions.Coerce

/** §1.2 coercion rules incl. the reference's timestamp length heuristic. */
class CoerceSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("v")).collect()(0).get(0)

  test("bool: only case-insensitive TRUE is true") {
    assert(one(Coerce.bool(lit("TRUE"))) === true)
    assert(one(Coerce.bool(lit("true"))) === true)
    assert(one(Coerce.bool(lit(" True "))) === true)
    assert(one(Coerce.bool(lit("yes"))) === false)
    assert(one(Coerce.bool(lit(""))) === false)
    // NULL → false, not NULL: the reference's str(None).upper() == 'TRUE'
    // chain maps missing values to False; a propagated NULL silently
    // vanishes from any `= false` filter downstream
    assert(one(Coerce.bool(lit(null).cast("string"))) === false)
  }

  test("double: invalid input nulls, not fails (ANSI-safe)") {
    assert(one(Coerce.double(lit("1.5"))) === 1.5)
    assert(one(Coerce.double(lit("bogus"))) === null)
  }

  test("enum: non-member nulls") {
    assert(one(Coerce.enumOf(lit("PROD"), Seq("DEV", "PROD"))) === "PROD")
    assert(one(Coerce.enumOf(lit("QA"), Seq("DEV", "PROD"))) === null)
  }

  test("timestamp heuristic: len 10 → midnight, len 19 → full, else ISO, bad → null") {
    assert(one(Coerce.timestamp(lit("2024-03-27")).cast("string"))
      === "2024-03-27 00:00:00")
    assert(one(Coerce.timestamp(lit("2024-03-27 14:27:13")).cast("string"))
      === "2024-03-27 14:27:13")
    assert(one(Coerce.timestamp(lit("2024-03-27T14:27:13.5")).cast("string"))
      === "2024-03-27 14:27:13.5")
    assert(one(Coerce.timestamp(lit("not a time"))) === null)
  }

  test("richtext joins with <br> and export swaps to comma") {
    assert(one(Coerce.richtext(array(lit("a"), lit("b")))) === "a<br>b")
    assert(one(Coerce.richtextExport(lit("a<br>b"))) === "a, b")
  }
}
