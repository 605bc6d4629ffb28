package graft.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML→text and <title> extraction — the reference's
  * `Jsoup.parse(content).text()` (/root/reference/src/main/java/searchengine/
  * tools/Lemmatizator.java:1 `getLemmsInPage`) and its title regexp
  * (services/SearchServiceImpl.java:284-296) re-expressed as deterministic
  * codegen'd regex Columns so the exact same extraction runs in the DuckDB
  * oracle (htmlSql* below must stay pattern-identical).
  *
  * Scope: tag/script/style stripping with whitespace collapse. Entity
  * decoding is NOT attempted (a fixed &amp;-style subset would silently
  * corrupt the rest; the corpora here contain no entities). All patterns
  * avoid lookaround so Java-regex (Spark) and RE2 (DuckDB) agree.
  */
object Html {

  val scriptRe = "(?s)<script[^>]*>.*?</script>"
  val styleRe  = "(?s)<style[^>]*>.*?</style>"
  val tagRe    = "<[^>]*>"
  val titleRe  = "(?s)<title>(.*?)</title>"
  /** cheap HTML sniff: document starts with a doctype/html/head/body tag */
  val looksHtmlRe = "(?s)^\\s*<(!doctype|!DOCTYPE|html|HTML|head|HEAD|body|BODY)[\\s>]"

  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, scriptRe, " ")
    val noStyle  = regexp_replace(noScript, styleRe, " ")
    val noTags   = regexp_replace(noStyle, tagRe, " ")
    trim(regexp_replace(noTags, "\\s+", " "))
  }

  def title(html: Column): Column = regexp_extract(html, titleRe, 1)

  def looksHtml(html: Column): Column = html.rlike(looksHtmlRe)

  /** content column normalized for indexing/snippets: extracted text for
    * HTML documents, identity for everything else (code corpora). */
  def textOf(content: Column): Column =
    when(looksHtml(content), extractText(content)).otherwise(content)

  /** title with the reference's fallback: <title> if present, else `path`
    * (the repo's pre-existing path-as-title analog). */
  def titleOf(content: Column, path: Column): Column = {
    val t = title(content)
    when(looksHtml(content) && t =!= "", t).otherwise(path)
  }

  // ---- DuckDB twins (same patterns, RE2 'g' flag spelled explicitly) ----
  def sqlExtractText(expr: String): String =
    s"trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace($expr, " +
      s"'$scriptRe', ' ', 'g'), '$styleRe', ' ', 'g'), '$tagRe', ' ', 'g'), " +
      "'\\s+', ' ', 'g'))"

  def sqlTitle(expr: String): String = s"regexp_extract($expr, '$titleRe', 1)"
}
