package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expand.Expander
import graft.model.{FieldSpec, TagConfig}

/** Set-based evaluation of dynamic-table configs over a SHARDED asset
  * family — the scale path for the reference's largest demonstrated
  * envelope (examples/load/configs/static_asset_1m.json: 10⁶ assets per
  * config, sharded into 1000-task batches by TaskManager.py:49).
  *
  * The reference evaluates `query_expression` once per asset — 10⁶
  * BigQuery round-trips. A driver-side translation (collect the asset
  * list, build one plan per asset, `unionByName` the lot) explodes the
  * plan tree long before that point. The Spark-first form used here:
  * every per-asset scalar query IS a correlated scalar subquery over the
  * asset key, so the whole config compiles to ONE statement
  *
  * {{{
  *   SELECT __a.asset_uri, (q1') AS f1, …, (qN') AS fN
  *   FROM assets __a
  * }}}
  *
  * where each `qi'` is the field's expression with `from \$table`
  * rewritten to a correlated slice of the shared source
  * (`WHERE src.__graft_shard = __a.table`). Catalyst DECORRELATES the
  * subqueries into plain aggregate+join operators — plan size is
  * O(#fields), independent of asset count, and the heavy lifting is
  * data-side shuffles on the shard key, exactly what survives a
  * 1000-executor cluster. Empty assets keep per-asset scalar semantics
  * (count→0, avg→null) because Spark's scalar-subquery rewrite handles
  * the COUNT-bug case natively.
  *
  * Applicability contract: all assets of the group live in one physical
  * source (a sharded/templated table family — BigQuery `events_YYYYMMDD`
  * style — or a partitioned lake table), and `shardExpr` maps each source
  * row to its asset's table name. Heterogeneous-schema catalogs fall back
  * to [[TagEngine.applyDynamicTableConfig]] (per DISTINCT table, balanced
  * union — bounded by the number of physical tables, which is catalog
  * metadata, not asset cardinality).
  */
object GroupedEval {

  private val SrcView = "__graft_src"
  private val AssetView = "__graft_assets"
  private val OuterAlias = "__a"

  /** Per-call suffix so concurrent configs on one session can't clobber
    * each other's views between registration and statement analysis.
    */
  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0)

  /** Split SQL text into alternating non-literal / single-quoted-literal
    * segments (literals keep their quotes; `''` escapes stay inside one
    * literal).
    */
  private[operators] def segments(sql: String): Seq[(String, Boolean)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    val cur = new StringBuilder
    var inLit = false
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inLit && c == '\'') {
        if (cur.nonEmpty) { out += ((cur.toString, false)); cur.clear() }
        inLit = true; cur.append(c)
      } else if (inLit && c == '\\' && i + 1 < sql.length) {
        // Spark's default parser honors backslash escapes inside string
        // literals (escapedStringLiterals=false), so \' does NOT close
        // the literal — consuming the pair keeps the boundary where the
        // parser puts it (otherwise every later region classifies
        // INVERTED and the $var rewrites misfire on literal text)
        cur.append(c); cur.append(sql.charAt(i + 1)); i += 1
      } else if (inLit && c == '\'') {
        if (i + 1 < sql.length && sql.charAt(i + 1) == '\'') {
          cur.append("''"); i += 1
        } else {
          cur.append(c); out += ((cur.toString, true)); cur.clear(); inLit = false
        }
      } else cur.append(c)
      i += 1
    }
    if (cur.nonEmpty) out += ((cur.toString, inLit))
    out.toSeq
  }

  private def assetRef(v: String): String =
    if (v == "table") s"$OuterAlias.`table`" else s"$OuterAlias.$v"

  /** A quoted literal containing `\$vars` becomes a concat of its constant
    * parts and the asset row's columns: `'\$dataset.x'` →
    * `concat(__a.dataset, '.x')` (the reference substitutes values into
    * the literal text, DataCatalogController.py:1685–1772).
    */
  private def bindLiteral(lit: String): String = {
    val body = lit.substring(1, lit.length - 1)
    if (!body.contains("$")) return lit
    val varPat = "\\$(project|dataset|table|column)".r
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    var last = 0
    for (m <- varPat.findAllMatchIn(body)) {
      if (m.start > last) parts += s"'${body.substring(last, m.start)}'"
      parts += assetRef(m.group(1))
      last = m.end
    }
    if (last < body.length) parts += s"'${body.substring(last)}'"
    if (parts.length == 1) parts.head else parts.mkString("concat(", ", ", ")")
  }

  /** Rewrite one field expression into grouped (correlated) form. The
    * `query_expression` surface (SURVEY.md §2 G) references the asset's
    * data only as `from \$table`; scalar `\$project/\$dataset/\$table`
    * (bare or inside literals) become asset-row columns.
    */
  private[operators] def rewriteCorrelated(expr: String): String = {
    // case-insensitive on the FROM keyword only: the $table TOKEN is
    // case-sensitive everywhere else (ConfigEval.substitute's literal
    // replace), so accepting `$Table` here would make a config evaluate
    // on the sharded path and fail on the per-asset one — breaking the
    // sharded == per-asset equivalence TagEngineSpec pins
    val fromTable = "(?i:\\bfrom\\s+)\\$table\\b".r
    segments(expr).map {
      case (text, true)  => bindLiteral(text)
      case (text, false) =>
        val f = fromTable.replaceAllIn(text,
          _ => s"FROM (SELECT * FROM $SrcView WHERE " +
            s"$SrcView.__graft_shard = ${assetRef("table")})")
        "\\$(project|dataset|table)".r
          .replaceAllIn(f, m => scala.util.matching.Regex
            .quoteReplacement(assetRef(m.group(1))))
    }.mkString
  }

  /** True when the expression reads no table at all (a pure function of
    * the URI, e.g. `select concat('\$dataset','.','\$table')`,
    * DataCatalogController.py:1760–1762) — inlined as a plain projection
    * instead of a scalar subquery.
    */
  private[operators] def isConstantQuery(expr: String): Boolean =
    !segments(expr).exists { case (t, isLit) =>
      !isLit && "(?i)\\bfrom\\b".r.findFirstIn(t).isDefined
    }

  /** Escape a value into a Spark SQL single-quoted string literal. Under
    * the default parser (escapedStringLiterals=false — the same semantics
    * [[segments]] documents) backslash is an escape character INSIDE the
    * literal, so quotes alone are not enough: a value ending in `\` turns
    * the closing quote into an escaped quote (ParseException on benign
    * values, literal-escape injection on crafted ones). Backslashes
    * double first, then quotes. Shared with TagEngine's static-value
    * path so the two escapers cannot fork.
    */
  private[operators] def sq(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

  /** One SELECT item per config field. */
  private[operators] def fieldItem(f: FieldSpec): String = f.queryExpression match {
    case Some(q) if isConstantQuery(q) =>
      val body = rewriteCorrelated(q).trim.replaceAll("(?i)^select\\s+", "")
      s"($body) AS `${f.fieldId}`"
    case Some(q) => s"(${rewriteCorrelated(q)}) AS `${f.fieldId}`"
    case None    => s"${sq(f.fieldValue.getOrElse(""))} AS `${f.fieldId}`"
  }

  /** The expression with literal bodies masked (same length, so match
    * offsets carry back to the original text) — structure probes must not
    * see keywords inside string literals.
    */
  private def maskLiterals(expr: String): String =
    segments(expr).map { case (t, isLit) =>
      if (isLit && t.length >= 2) "'" + "x" * (t.length - 2) + "'" else t
    }.mkString

  /** A "flat" aggregate field: `select <scalar-agg> from \$table
    * [where <pred>]` with no further FROM anywhere. Flat fields sharing a
    * WHERE clause fuse into ONE struct-returning subquery — one scan of
    * the source per distinct filter instead of one per field (the
    * decorrelated subqueries do not merge on their own, and at 100 TB
    * each extra subquery is a full re-scan).
    */
  private[operators] case class Flat(selectList: String, where: Option[String])

  private val FlatPat =
    "(?is)^\\s*select\\s+(.+?)\\s+from\\s+\\$table(?:\\s+where\\s+(.+?))?\\s*$".r

  private[operators] def classifyFlat(expr: String): Option[Flat] = {
    val masked = maskLiterals(expr)
    FlatPat.findFirstMatchIn(masked).flatMap { m =>
      val selMasked = m.group(1)
      val whereMasked = Option(m.group(2))
      val noFrom = !"(?i)\\bfrom\\b".r.findFirstIn(
        selMasked + whereMasked.getOrElse("")).isDefined
      val noTable = !(selMasked + whereMasked.getOrElse("")).contains("$table")
      if (noFrom && noTable)
        Some(Flat(expr.substring(m.start(1), m.end(1)),
          whereMasked.map(_ => expr.substring(m.start(2), m.end(2)))))
      else None
    }
  }

  /** Bind `\$vars` in a scalar fragment (select list / where text): literal
    * bodies via [[bindLiteral]], bare refs to asset columns.
    */
  private def bindScalar(text: String): String =
    segments(text).map {
      case (t, true)  => bindLiteral(t)
      case (t, false) =>
        "\\$(project|dataset|table)".r.replaceAllIn(t,
          m => scala.util.matching.Regex.quoteReplacement(assetRef(m.group(1))))
    }.mkString

  /** Evaluate a dynamic-table config over a sharded family in ONE
    * statement. `catalog` rows are `(project, dataset, table)`; `source`
    * holds every asset's data; `shardExpr` maps a source row to its
    * asset's table name. Output: one row per expanded asset with
    * `asset_uri` + one column per field (pre-melt shape). Scan count is
    * O(#distinct filters among flat fields + #non-flat query fields), not
    * O(#fields).
    */
  def evalSharded(spark: SparkSession, config: TagConfig, catalog: DataFrame,
                  source: DataFrame, shardExpr: Column): DataFrame = {
    // the rewrite machinery emits the BASE view names; register this call's
    // views under unique names and rename in the final SQL text, so two
    // configs evaluating concurrently on one session can't clobber each
    // other between view registration and (eager) statement analysis
    val callId = viewSeq.incrementAndGet()
    val srcView = s"${SrcView}_$callId"
    val assetView = s"${AssetView}_$callId"
    source.withColumn("__graft_shard", shardExpr)
      .createOrReplaceTempView(srcView)
    Expander.expand(catalog, config.includedUris, config.excludedUris)
      .select(col("project"), col("dataset"), col("table"),
        concat_ws("/", lit("bigquery/project"), col("project"),
          lit("dataset"), col("dataset"), col("table")).as("asset_uri"))
      .createOrReplaceTempView(assetView)
    val flatOf: Map[String, Flat] = config.fields.flatMap(f =>
      f.queryExpression.filterNot(isConstantQuery)
        .flatMap(classifyFlat).map(f.fieldId -> _)).toMap
    val flatFields = config.fields.filter(f => flatOf.contains(f.fieldId))
    // group by the BOUND where text: identical filters share one subquery
    val groups = flatFields.zipWithIndex
      .groupBy { case (f, _) => flatOf(f.fieldId).where.map(bindScalar) }
      .toSeq.sortBy(_._2.head._2).map(_._1).zipWithIndex
      .map { case (w, i) => (w, i) }
    val groupIdx = groups.toMap
    val slice = s"(SELECT * FROM $SrcView WHERE " +
      s"$SrcView.__graft_shard = ${assetRef("table")})"
    val groupItems = groups.map { case (where, i) =>
      val members = flatFields.filter(f =>
        flatOf(f.fieldId).where.map(bindScalar) == where)
      // field ids are sq-escaped too: an apostrophe or backslash in a
      // template field id must not break out of the name literal
      val entries = members.map(f =>
        s"${sq(f.fieldId)}, (${bindScalar(flatOf(f.fieldId).selectList)})")
        .mkString(", ")
      s"(SELECT named_struct($entries) FROM $slice" +
        where.map(w => s" WHERE $w").getOrElse("") + s") AS `__g$i`"
    }
    val otherItems = config.fields.filterNot(f => flatOf.contains(f.fieldId))
      .map(fieldItem)
    val innerItems = (groupItems ++ otherItems).mkString(",\n  ")
    val outerItems = config.fields.map { f =>
      flatOf.get(f.fieldId) match {
        case Some(fl) =>
          val g = groupIdx(fl.where.map(bindScalar))
          s"`__g$g`.`${f.fieldId}` AS `${f.fieldId}`"
        case None => s"`${f.fieldId}`"
      }
    }.mkString(",\n  ")
    val assembled =
      s"""SELECT asset_uri,
         |  $outerItems
         |FROM (
         |  SELECT $OuterAlias.asset_uri,
         |  $innerItems
         |  FROM $AssetView $OuterAlias
         |)""".stripMargin
    // Rename base→per-call view names only OUTSIDE single-quoted literals:
    // a user literal that happens to contain '__graft_src' must pass
    // through untouched (segments() is the same splitter the rewrite
    // machinery uses, so literal boundaries agree).
    val stmt = segments(assembled).map {
      case (t, false) => t.replace(SrcView, srcView).replace(AssetView, assetView)
      case (t, true)  => t
    }.mkString
    // Dataset.ofRows analyzes eagerly, so the views are resolved by the
    // time spark.sql returns; drop them in finally so a malformed field
    // expression (AnalysisException) can't leak per-call views into the
    // session catalog across retries.
    try spark.sql(stmt)
    finally {
      spark.catalog.dropTempView(srcView)
      spark.catalog.dropTempView(assetView)
    }
  }

  /** Sharded config → unified tag rows (the set-based replacement for the
    * per-asset loop).
    */
  def applyDynamicTableConfigSharded(spark: SparkSession, config: TagConfig,
                                     catalog: DataFrame, source: DataFrame,
                                     shardExpr: Column): DataFrame =
    TagEngine.meltToTagRows(
      evalSharded(spark, config, catalog, source, shardExpr), config)

  /** Bind `\$column` in a field expression to one CONCRETE column name:
    * outside string literals it becomes the quoted identifier, inside
    * literals the bare name text (the reference substitutes the name into
    * literal text the same way it does `\$table`,
    * DataCatalogController.py:462–476). Runs BEFORE the correlated
    * rewrite, so the remaining `\$project/\$dataset/\$table` tokens still
    * bind to the asset row.
    */
  private[operators] def bindColumn(expr: String, column: String): String =
    segments(expr).map {
      case (t, true)  => t.replace("$column", column)
      case (t, false) => t.replace("$column", s"`$column`")
    }.mkString

  /** Separator for the synthetic (column × field) grid ids — must not
    * collide with user field ids.
    */
  private val GridSep = "__gc__"

  /** Dynamic-COLUMN config over a sharded family, set-based (SURVEY.md §2
    * G + H3 for DYNAMIC_TAG_COLUMN): the reference fans column configs
    * across assets one job per asset like any other config type
    * (main.py:3597–3628), and [[TagEngine.applyDynamicColumnConfig]]
    * evaluates ONE asset per call. Here the whole (asset × column × field)
    * grid compiles to ONE statement: each (column, field) cell is the
    * field expression with `\$column` bound to the concrete identifier
    * ([[bindColumn]]) and `from \$table` correlated to the asset's shard
    * slice — so flat cells sharing a WHERE fuse into one struct-returning
    * subquery per distinct filter ([[Flat]] machinery), scan count is
    * O(#distinct filters), plan width O(#columns × #fields) (bounded by
    * the table's schema width — catalog metadata), and the Spark JOB count
    * is O(1) at ANY asset count (TagEngineSpec pins the invariance).
    *
    * `columns` is the resolved included-column list — the 1-row
    * `included_columns_query` result, driver metadata by the same
    * contract as the reference (:374–377).
    */
  def applyDynamicColumnConfigSharded(spark: SparkSession, config: TagConfig,
                                      catalog: DataFrame, source: DataFrame,
                                      shardExpr: Column,
                                      columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty,
      "applyDynamicColumnConfigSharded: empty column list")
    val gridFields = for {
      (c, i) <- columns.zipWithIndex
      f <- config.fields
    } yield f.copy(fieldId = s"__c$i$GridSep${f.fieldId}",
      queryExpression = f.queryExpression.map(bindColumn(_, c)))
    val gridConfig = config.copy(fields = gridFields)
    val evaluated = evalSharded(spark, gridConfig, catalog, source, shardExpr)
    val cells = for {
      (c, i) <- columns.zipWithIndex
      f <- config.fields
    } yield struct(lit(c).as("column"), lit(f.fieldId).as("field_id"),
      lit(f.fieldType).as("field_type"),
      col(s"__c$i$GridSep${f.fieldId}").cast("string").as("field_value"))
    evaluated.select(col("asset_uri"), explode(array(cells: _*)).as("f"))
      .select(col("asset_uri"), col("f.column"),
        lit(config.templateId).as("template_id"),
        col("f.field_id"), col("f.field_type"), col("f.field_value"))
  }
}
