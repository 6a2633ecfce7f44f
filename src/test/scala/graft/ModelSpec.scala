package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.{TagTemplate, TemplateField}

/** B3/E3: template field projection + descending-order application
  * (DataCatalogController.py:152).
  */
class ModelSpec extends AnyFunSuite {
  test("template fields apply in descending order; lookup by id") {
    val t = TagTemplate("gov", Seq(
      TemplateField("a", "string", order = 1),
      TemplateField("b", "bool", order = 3),
      TemplateField("c", "enum", order = 2, enumValues = Seq("X"))))
    assert(t.ordered.map(_.fieldId) === Seq("b", "c", "a"))
    assert(t.byId("c").enumValues === Seq("X"))
  }
}
