package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The set-based rewrite is string surgery over the query_expression
  * surface — every branch (literal masking, quoted-variable binding,
  * FROM-clause correlation, flat classification) needs direct coverage
  * beyond the end-to-end oracles.
  */
class GroupedEvalSpec extends AnyFunSuite {

  test("segments split literals and keep '' escapes inside one literal") {
    val s = GroupedEval.segments("a = 'it''s' and b = 'x'")
    assert(s === Seq(("a = ", false), ("'it''s'", true), (" and b = ", false),
      ("'x'", true)))
  }

  test("segments honor backslash-escaped quotes, matching Spark's parser") {
    // Spark's default parser (escapedStringLiterals=false) treats \' as
    // an escaped quote INSIDE the literal; closing the literal there
    // inverts every later region, so '$dataset' in the tail would be
    // rewritten as a bare identifier instead of staying literal text
    val s = GroupedEval.segments("""x = 'O\'Brien' and d = '$d'""")
    assert(s === Seq(("x = ", false), ("""'O\'Brien'""", true),
      (" and d = ", false), ("'$d'", true)))
    // escaped backslash before a REAL closing quote still closes
    val s2 = GroupedEval.segments("""x = 'a\\' and y""")
    assert(s2 === Seq(("x = ", false), ("""'a\\'""", true), (" and y", false)))
  }

  test("the $table token is case-sensitive on BOTH evaluation paths") {
    // ConfigEval.substitute's literal replace never fires on $Table, so
    // the sharded rewrite must not silently accept it either — a config
    // that evaluates sharded but breaks per-asset would fork the
    // sharded == per-asset equivalence
    val out = GroupedEval.rewriteCorrelated("select count(*) FROM $Table")
    assert(!out.contains("__graft_src"), s"must NOT rewrite \\$$Table: $out")
    // the FROM keyword itself stays case-insensitive (legal SQL)
    val ok = GroupedEval.rewriteCorrelated("select count(*) FROM $table")
    assert(ok.contains("__graft_src"))
  }

  test("rewriteCorrelated binds FROM $table to the correlated slice") {
    val out = GroupedEval.rewriteCorrelated("select count(*) from $table")
    assert(out.contains("FROM (SELECT * FROM __graft_src WHERE " +
      "__graft_src.__graft_shard = __a.`table`)"))
  }

  test("rewriteCorrelated binds quoted and bare variables to asset columns") {
    val out = GroupedEval.rewriteCorrelated(
      "select concat('$dataset', '.', '$table')")
    assert(out === "select concat(__a.dataset, '.', __a.`table`)")
    val mixed = GroupedEval.rewriteCorrelated("select 'env=$project/x'")
    assert(mixed === "select concat('env=', __a.project, '/x')")
  }

  test("keywords inside string literals do not confuse classification") {
    // 'from' inside a literal must not make this look table-reading
    assert(GroupedEval.isConstantQuery("select 'came from $dataset'"))
    assert(!GroupedEval.isConstantQuery("select count(*) from $table"))
    // ...nor break flat classification when in the select list
    assert(GroupedEval.classifyFlat(
      "select concat('from ', count(*)) from $table").isDefined)
  }

  test("classifyFlat extracts select list and where; rejects nesting") {
    val f = GroupedEval.classifyFlat(
      "select count(*) from $table where event_type = 'click'").get
    assert(f.selectList === "count(*)")
    assert(f.where === Some("event_type = 'click'"))
    assert(GroupedEval.classifyFlat(
      "select avg(n) from (select count(*) n from $table group by d)").isEmpty)
    assert(GroupedEval.classifyFlat("select concat('$dataset')").isEmpty)
  }

  test("bindColumn: identifier outside literals, bare name inside them") {
    assert(GroupedEval.bindColumn(
      "select count(distinct $column) from $table", "user_id") ===
      "select count(distinct `user_id`) from $table")
    // inside a literal the NAME text substitutes (the reference's
    // string-substitution semantics), not a quoted identifier
    assert(GroupedEval.bindColumn(
      "select concat('col=$column: ', max($column)) from $table", "value") ===
      "select concat('col=value: ', max(`value`)) from $table")
    // a literal that merely contains the text '$column' is still a
    // substitution target — exactly like the reference's .replace
    assert(GroupedEval.bindColumn("select '$column$column'", "c1") ===
      "select 'c1c1'")
    // $table / $dataset stay untouched for the later correlated rewrite
    assert(GroupedEval.bindColumn("select '$dataset.$column'", "c2") ===
      "select '$dataset.c2'")
  }
}
