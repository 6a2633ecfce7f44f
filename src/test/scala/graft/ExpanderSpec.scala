package graft

import graft.expand.Expander
import graft.model.AssetUri

/** URI algebra + wildcard expansion semantics (Resources.py:165–269). */
class ExpanderSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    ("p", "sales", "orders"), ("p", "sales", "orders_archive"),
    ("p", "salesops", "leads"), ("p", "hr", "people"),
    ("q", "sales", "orders")).toDF("project", "dataset", "table")

  test("exact table uri matches one row") {
    val out = Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/sales/orders"), Nil).collect()
    assert(out.map(_.getString(2)).toSet === Set("orders"))
    assert(out.length === 1)
  }

  test("star wildcard = substring containment of fragments") {
    val out = Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/sales*/orders*"), Nil)
    assert(out.count() === 2) // sales+salesops datasets, orders/orders_archive
  }

  test("project-level uri expands all datasets and tables") {
    assert(Expander.expand(catalog, Seq("bigquery/project/p"), Nil).count() === 4)
  }

  test("dataset wildcard engages ONLY on a trailing star (get_datasets)") {
    // Resources.py:153–158: `dataset.endswith("*")` gates wildcarding and
    // the whole prefix — inner stars included — is ONE substring; a
    // mid-star expression is a literal dataset name that matches nothing
    assert(Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/sal*ops/leads"), Nil).count() === 0)
    assert(Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/*ops/leads"), Nil).count() === 0)
    // trailing star: substring, not prefix — "ales*" matches sales+salesops
    // (orders, orders_archive, leads; hr/people stays out)
    assert(Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/ales*/*"), Nil).count() === 3)
  }

  test("table wildcard fragments match the FULL table id (Resources.py:246)") {
    // the reference tests `substring in table.full_table_id`
    // (project:dataset.table) — a fragment matching the dataset name
    // matches EVERY table in that dataset
    val out = Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/salesops/*ops*"), Nil).collect()
    assert(out.map(_.getString(2)).toSet === Set("leads"),
      "fragment 'ops' hits the dataset part of p:salesops.leads")
    // and an exact (no-star) table expression stays exact on the bare name
    assert(Expander.expand(catalog,
      Seq("bigquery/project/p/dataset/salesops/ops"), Nil).count() === 0)
  }

  test("exclusion removes matching subset") {
    val out = Expander.expand(catalog,
      Seq("bigquery/project/p"), Seq("bigquery/project/p/dataset/hr/*"))
    assert(out.count() === 3)
  }

  test("minusExisting drops already-tagged work (overwrite=false)") {
    val work = Seq(("a", 1), ("b", 2)).toDF("t", "v")
    val tagged = Seq(Tuple1("a")).toDF("t")
    val out = Expander.minusExisting(work, tagged, Seq("t")).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("b"))
  }

  test("AssetUri parse/render round-trips and history path is singular") {
    val u = AssetUri.parseBq("bigquery/project/p/dataset/d/t")
    assert(u.render === "bigquery/project/p/dataset/d/t")
    assert(u.copy(column = Some("c")).historyAssetName === "p/dataset/d/table/t/column/c")
    intercept[IllegalArgumentException](AssetUri.parseBq("nonsense/x"))
  }

  test("fileset and spanner URI shapes parse, render, and history-name") {
    val f = AssetUri.parse("fileset/project/p/entry_group/sakila_eg/staff")
    assert(f.assetType === "fileset" && f.dataset === Some("sakila_eg")
      && f.table === Some("staff"))
    assert(f.render === "fileset/project/p/entry_group/sakila_eg/staff")
    assert(f.historyAssetName === "p/entry_group/sakila_eg/fileset/staff")
    val s = AssetUri.parse("spanner/project/p/instance/prod/database/sales/accounts")
    assert(s.instance === Some("prod") && s.dataset === Some("sales")
      && s.table === Some("accounts"))
    assert(s.render === "spanner/project/p/instance/prod/database/sales/accounts")
    assert(s.historyAssetName === "p/instance/prod/database/sales/table/accounts")
    intercept[IllegalArgumentException](
      AssetUri.parse("spanner/project/p/database/sales"))
  }

  test("renderUri: NULL dataset drops the container segment, matching AssetUri.render") {
    // concat_ws skips only the null VALUE, so an unguarded form emitted a
    // dangling ".../dataset" label for project-level rows — a URI no
    // tag/history key ever renders, so such rows joined nothing
    import org.apache.spark.sql.functions._
    import graft.expand.Expander
    import spark.implicits._
    val rows = Seq(
      ("bigquery", "p", Some("lake"), Some("orders"), None: Option[String]),
      ("bigquery", "p", Some("lake"), None, None),
      ("bigquery", "p", None, None, None),
      ("spanner", "p", Some("salesdb"), Some("accounts"), Some("prod")))
      .toDF("asset_type", "project", "dataset", "table", "instance")
    val got = rows.select(Expander.renderUri(col("asset_type"),
        col("project"), col("dataset"), col("table"), col("instance"))
        .as("uri")).as[String].collect().toSeq
    val want = Seq(
      AssetUri("bigquery", "p", Some("lake"), Some("orders"), None).render,
      AssetUri("bigquery", "p", Some("lake"), None, None).render,
      AssetUri("bigquery", "p", None, None, None).render,
      AssetUri("spanner", "p", Some("salesdb"), Some("accounts"), None,
        Some("prod")).render)
    assert(got === want)
  }
}
