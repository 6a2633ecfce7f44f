package graft.model

/** Config / template model (SURVEY.md §1.1).
  *
  * The reference stores these as Firestore documents (ConfigType.py:3–12,
  * TagEngineStoreHandler.py:399–448); here they are case classes decoded at
  * job-build time on the driver — per-row data never carries config state.
  */

/** One field of a tag template (DataCatalogController.py:111–131).
  * `fieldType ∈ {bool, string, double, enum, richtext, datetime, timestamp}`.
  */
final case class TemplateField(
    fieldId: String,
    fieldType: String,
    isRequired: Boolean = false,
    order: Int = 0,
    enumValues: Seq[String] = Nil)

final case class TagTemplate(templateId: String, fields: Seq[TemplateField]) {
  /** Template fields are applied in descending `order`
    * (DataCatalogController.py:152).
    */
  def ordered: Seq[TemplateField] = fields.sortBy(-_.order)
  def byId: Map[String, TemplateField] = fields.map(f => f.fieldId -> f).toMap
}

/** One field requested by a config: either a static `fieldValue`
  * (static-asset configs) or a `queryExpression` to evaluate (dynamic
  * configs). Mirrors the per-field dicts at DataCatalogController.py:78–152.
  */
final case class FieldSpec(
    fieldId: String,
    fieldType: String = "string",
    queryExpression: Option[String] = None,
    fieldValue: Option[String] = None)

/** The subset of config attributes the compute engine needs
  * (TagEngineStoreHandler.py:399–448 shapes; FIXTURES.md §1).
  */
final case class TagConfig(
    configType: String,          // DYNAMIC_TAG_TABLE | DYNAMIC_TAG_COLUMN | STATIC_TAG_ASSET | ...
    templateId: String,
    fields: Seq[FieldSpec],
    includedUris: Seq[String] = Nil,
    excludedUris: Seq[String] = Nil,
    includedColumnsQuery: Option[String] = None,
    overwrite: Boolean = true,
    refreshMode: String = "ON_DEMAND", // ON_DEMAND | AUTO
    refreshFrequencyMinutes: Long = 0L,
    tagHistory: Boolean = false,
    // export the written tag instances to the A12 report table on every
    // job (the reference runs export as its own config over already-tagged
    // assets, apply_export_config, DataCatalogController.py:1100–1210;
    // configs that want the report kept in lockstep with the write set it
    // here, and the family/tick terminals land the report rows under the
    // SAME cut as the tags+history they describe)
    exportTags: Boolean = false)
