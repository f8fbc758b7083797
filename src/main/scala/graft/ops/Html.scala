package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML-to-text normalization — the extraction stage between "crawled
  * bytes" and every text operator in this package (CCNet/RefinedWeb run a
  * trafilatura/jusText-class extractor here; this is the
  * deterministic-core subset: script/style excision, tag stripping,
  * entity decoding, whitespace canonicalization).
  *
  * Everything is `functions._` built-ins (codegen'd, no UDF): regex
  * replaces from the Java-and-RE2-agreeing subset (`(?s)`, non-greedy —
  * the [[Urls]] precedent) plus literal `replace` chains for the
  * entities. Plan shape at 100 TB: a pure narrow projection inside
  * whole-stage codegen — no shuffle, no state; it fuses into whatever
  * scan feeds it.
  *
  * Entity decode order is load-bearing: `&amp;` is decoded LAST, so
  * `&amp;lt;` becomes the literal text `&lt;` rather than double-decoding
  * into `<` (the classic sanitizer-bypass bug, inverted).
  */
object Html {

  // script and style excised by SEPARATE regexes: a single alternation
  // would need a backreference for the closing tag, and RE2 (the DuckDB
  // twin's engine) has none
  private val scriptRe = "(?s)<script\\b[^>]*>.*?</script>"
  private val styleRe = "(?s)<style\\b[^>]*>.*?</style>"
  private val tagRe = "<[^>]+>"
  private val wsRunRe = "[ \\t\\r\\n]+"

  /** Normalized text of an HTML column: block excision -> tag strip ->
    * entity decode -> whitespace collapse -> trim.
    */
  def toText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(html, scriptRe, " "), styleRe, " ")
    val noTags = regexp_replace(noBlocks, tagRe, " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        replace(c, lit(from), lit(to))
      }
    trim(regexp_replace(decoded, wsRunRe, " "))
  }

  /** Per-document normalization verdicts: (idCol, n_raw, n_clean,
    * clean_text). `n_raw - n_clean` is the curation signal (markup-heavy
    * pages score high and get down-weighted).
    */
  def normalize(docs: DataFrame, htmlCol: String = "html",
                idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol),
      length(col(htmlCol)).as("n_raw"),
      length(toText(col(htmlCol))).as("n_clean"),
      toText(col(htmlCol)).as("clean_text"))

  /** Deterministic messy-HTML synthesis for the gate: four variants per
    * doc exercising every rule — plain wrapper tags, attribute-laden tags
    * with entities, a script block that must vanish wholesale, and
    * already-escaped entity text that must decode exactly once. Twin of
    * the CASE inside [[normalizeSql]].
    */
  def syntheticHtml(id: Column, text: Column): Column = {
    val v = pmod(id, lit(4L))
    when(v === 0, concat(lit("<html><body><p>"), text,
        lit("</p></body></html>")))
      .when(v === 1, concat(lit("<div class=\"post\" id='d"), id,
        lit("'>&nbsp;"), text, lit(" <br/>&nbsp;</div>")))
      .when(v === 2, concat(lit("<p>"), text,
        lit("</p>\n<script type=\"text/javascript\">var x = '<p>nope</p>';\n</script>\n<style>p { color: red; }</style>")))
      .otherwise(concat(text,
        lit(" &lt;tag&gt; &quot;quoted&quot; &#39;s &amp;lt;still-escaped&amp;gt;")))
  }

  /** DuckDB twin of the `html_normalize` gate: same synthesis CASE, same
    * replace chain, same regexes (`'g'` flags spelled out — DuckDB
    * replaces only the first match by default, Spark is always global).
    */
  def normalizeSql: String = {
    val synth = """CASE doc_id % 4
    WHEN 0 THEN '<html><body><p>' || text || '</p></body></html>'
    WHEN 1 THEN '<div class="post" id=''d' || doc_id || '''>&nbsp;' || text || ' <br/>&nbsp;</div>'
    WHEN 2 THEN '<p>' || text || '</p>' || chr(10) || '<script type="text/javascript">var x = ''<p>nope</p>'';' || chr(10) || '</script>' || chr(10) || '<style>p { color: red; }</style>'
    ELSE text || ' &lt;tag&gt; &quot;quoted&quot; &#39;s &amp;lt;still-escaped&amp;gt;' END"""
    s"""WITH h AS (SELECT doc_id, $synth AS html FROM documents),
t AS (SELECT doc_id, html,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(html, '(?s)<script\\b[^>]*>.*?</script>', ' ', 'g'),
          '(?s)<style\\b[^>]*>.*?</style>', ' ', 'g'),
        '<[^>]+>', ' ', 'g'),
      '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
      '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
    '[ \\t\\r\\n]+', ' ', 'g')) AS clean_text
  FROM h)
SELECT doc_id, CAST(length(html) AS INTEGER) AS n_raw,
  CAST(length(clean_text) AS INTEGER) AS n_clean, clean_text
FROM t ORDER BY doc_id"""
  }
}
