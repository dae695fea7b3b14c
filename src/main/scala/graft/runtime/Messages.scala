package graft.runtime

/** Locale-routed error-message catalogue.
  *
  * The reference resolves its mapping-error texts through I18n
  * (`lib/ndr_import/non_tabular/column_mapping.rb:50-72`,
  * `lib/ndr_import/non_tabular/table.rb:54`, keys under
  * `mapping.errors.*` supplied by the ndr_support locale bundle). Its
  * tests assert error TYPES, not texts — the types are the semantic
  * contract — but the texts themselves are localisable. This object is
  * the Spark engine's equivalent seam: operator code raises through a
  * message KEY, and a deployment can register additional locales without
  * touching operator code.
  *
  * Templates use the reference's `%{name}` placeholder syntax. Lookup
  * rules: unknown locale falls back to English; a key missing from a
  * registered locale falls back to the English text (partial
  * translations stay usable); a key missing from English fails fast — a
  * typo'd key is a bug, not a translation gap.
  */
object Messages {

  /** JVM-wide locale used by [[apply]] — PROCESS-GLOBAL configuration,
    * not a per-import setting: it exists to mirror the reference's
    * `I18n.locale` seam, and two imports running concurrently in one JVM
    * with different locales would race on it (last write wins for both).
    * Set it once at process start-up; anything finer-grained must pass
    * the locale per call via [[t]]`(locale, key, args)`. */
  @volatile var defaultLocale: String = "en"

  private val en: Map[String, String] = Map(
    "mapping.errors.missing_start_line_pattern" ->
      "This table has no start_line_pattern",
    "mapping.errors.unexpected_tablename_pattern" ->
      "Should not define tablename_pattern",
    "mapping.errors.missing_non_tabular_cell" ->
      "This mapping (%{name}) has no non_tabular_cell",
    "mapping.errors.missing_non_tabular_cell_lines" ->
      "This mapping (%{name}) has no non_tabular_cell lines",
    "mapping.errors.missing_non_tabular_cell_capture" ->
      "This mapping (%{name}) has no non_tabular_cell capture",
    "mapping.errors.start_pattern_before_end" ->
      "Start line pattern matched before the end of the preceding record")

  private val catalogue =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()
  catalogue.put("en", en)

  /** Add (or extend) a locale. Merges over any existing entries for it. */
  def register(locale: String, messages: Map[String, String]): Unit =
    catalogue.merge(locale, messages, (old, add) => old ++ add)

  /** Resolve `key` in the JVM-wide default locale. */
  def apply(key: String, args: (String, String)*): String =
    t(defaultLocale, key, args: _*)

  /** Resolve `key` in `locale` (fallbacks: locale → en → fail fast). */
  def t(locale: String, key: String, args: (String, String)*): String = {
    val base = catalogue.get("en")
    val table = Option(catalogue.get(locale)).getOrElse(base)
    val tmpl = table.getOrElse(key, base.getOrElse(key,
      sys.error(s"unknown message key: $key")))
    args.foldLeft(tmpl) { case (s, (k, v)) => s.replace(s"%{$k}", v) }
  }
}
