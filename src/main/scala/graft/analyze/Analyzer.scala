package graft.analyze

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic text-analysis chain shared (bit-identically) by the Spark
  * engine, the in-memory scalar oracle used in tests, and the DuckDB oracle
  * SQL emitted by [[graft.SparkEntry.oracleSql]].
  *
  * Reference semantics rebuilt here (see /root/repo/SURVEY.md §2.3):
  *   - char normalization + lowercase + split
  *     (reference: tools/Lemmatizator.java:1 `getLemmsInPage`/`getWordsFromText`)
  *   - identifier splitting (camelCase / snake_case) is the code-corpus analog
  *     of the reference's Cyrillic char-class normalization
  *   - stop-token filter per language = the reference's part-of-speech filter
  *     (SearcherPage.java:156-194) re-expressed as a keyword stoplist
  *   - 1→N normal-form expansion via a broadcastable lexicon
  *     (reference: luceneMorph.getNormalForms, Lemmatizator.java:1 `getLemss`)
  *   - words shorter than 2 chars bypass normal-form lookup verbatim
  *     (reference: SearchServiceImpl.java:270-274)
  *
  * Everything is a total function: no exceptions, no locale dependence
  * (explicit Locale.ROOT), no wall-clock.
  */
object Analyzer extends Serializable {

  /** Stop tokens per language. The natural-language set covers the synthetic
    * documents corpus; the code sets are per-`lang` keyword stoplists (the
    * reference's POS stop-filter analog, SURVEY.md §2.2 F7).
    */
  val naturalStop: Set[String] = Set("the", "a")
  val codeStop: Map[String, Set[String]] = Map(
    "scala" -> Set("def", "val", "var", "class", "object", "import", "if", "else", "for", "while", "return", "new"),
    "java"  -> Set("public", "private", "static", "void", "class", "import", "if", "else", "for", "while", "return", "new", "final"),
    "py"    -> Set("def", "class", "import", "from", "if", "else", "for", "while", "return", "pass", "none")
  )
  /** Russian particles/conjunctions/prepositions — the stoplist analog of
    * the reference's part-of-speech filter over Russian morphology
    * (SearcherPage.java:156-194 drops СОЮЗ/МЕЖД/ПРЕДЛ/ЧАСТ). */
  val ruStop: Set[String] = Set("и", "в", "не", "на", "с", "по", "а", "но", "что", "как", "же", "за", "из", "у", "о")

  def stopSet(lang: String): Set[String] =
    if (lang == "ru") ruStop else codeStop.getOrElse(lang, naturalStop)

  // --- identifier splitting (pure) -------------------------------------
  // Order matters and is mirrored exactly in sqlNormalize below:
  //   1. ACRONYMTail -> ACRONYM Tail   ("HTTPServer" -> "HTTP Server")
  //   2. lowerUpper  -> lower Upper    ("fooBar" -> "foo Bar")
  //   3. any non-alphanumeric run -> single space (also kills '_')
  //   4. lowercase, trim
  private val acronymRe = "([A-Z]+)([A-Z][a-z])".r
  private val camelRe   = "([a-z0-9])([A-Z])".r
  private val junkRe    = "[^A-Za-z0-9]+".r

  def normalize(s: String): String = {
    val a = acronymRe.replaceAllIn(s, "$1 $2")
    val b = camelRe.replaceAllIn(a, "$1 $2")
    val c = junkRe.replaceAllIn(b, " ")
    c.toLowerCase(java.util.Locale.ROOT).trim
  }

  def rawTokens(s: String): Seq[String] =
    normalize(s).split(" +").toSeq.filter(_.nonEmpty)

  // --- Russian branch (the reference's ACTUAL language domain) ----------
  // Exact reference chain (tools/Lemmatizator.java:1 getLemmsInPage →
  // getWordsFromText): 1. fold ё→е / Ё→Е  2. strip to [а-яА-ЯёЁ ]
  // 3. toLowerCase  4. trim + split " +". Order preserved verbatim so the
  // two engines (and the DuckDB twin) agree character-for-character.
  def normalizeRu(s: String): String = {
    val folded = s.replace('ё', 'е').replace('Ё', 'Е')
    val stripped = folded.replaceAll("[^а-яА-ЯёЁ ]", " ")
    stripped.toLowerCase(java.util.Locale.ROOT).trim
  }

  def rawTokensRu(s: String): Seq[String] =
    normalizeRu(s).split(" +").toSeq.filter(_.nonEmpty)

  private def rawTokensFor(lang: String, s: String): Seq[String] =
    if (lang == "ru") rawTokensRu(s) else rawTokens(s)

  /** Normal-forms lexicon: surface form -> ALL normal forms (ambiguity
    * preserved, like luceneMorph; reference test LemmatizatorTest.java:10-17
    * expects each surface word to expand to every normal form). Default
    * lexicon is empty => identity, which is the deterministic behavior for
    * the code corpus (identifiers have no morphology).
    */
  type Lexicon = Map[String, Seq[String]]
  val emptyLexicon: Lexicon = Map.empty

  def normalForms(token: String, lexicon: Lexicon): Seq[String] =
    if (token.length < 2) Seq(token) // <2-char bypass (SearchServiceImpl.java:270-274)
    else lexicon.getOrElse(token, Seq(token))

  /** Full chain: normalize -> split -> stop-filter -> normal-forms.
    * `lang = "ru"` routes through the Cyrillic normalizer. */
  def analyze(lang: String, text: String, lexicon: Lexicon = emptyLexicon): Seq[String] = {
    val stops = stopSet(lang)
    rawTokensFor(lang, text).filterNot(stops).flatMap(normalForms(_, lexicon))
  }

  /** Distinct query terms, preserving nothing of order (the reference keeps a
    * Set, SearcherPage.java:32). */
  def queryTerms(lang: String, query: String, lexicon: Lexicon = emptyLexicon): Set[String] =
    analyze(lang, query, lexicon).toSet

  // --- Spark Column form (whole-stage codegen, no UDF) ------------------
  /** Identical chain as a codegen'd Column expression: tokens array. The
    * lexicon step is omitted here (identity lexicon); use a UDF only when a
    * non-empty lexicon is supplied (index-build time cost only).
    */
  def tokensCol(text: Column): Column = {
    val a = regexp_replace(text, "([A-Z]+)([A-Z][a-z])", "$1 $2")
    val b = regexp_replace(a, "([a-z0-9])([A-Z])", "$1 $2")
    val c = regexp_replace(b, "[^A-Za-z0-9]+", " ")
    // filter removes empties produced by leading/trailing spaces
    filter(split(trim(lower(c)), " +"), t => length(t) > 0)
  }

  /** Stop-filtered token array for a constant-per-corpus stop set. */
  def termsCol(text: Column, stops: Set[String]): Column = {
    val arr = tokensCol(text)
    if (stops.isEmpty) arr
    else filter(arr, t => !t.isin(stops.toSeq.map(x => x: Any): _*))
  }

  /** Russian token chain as a codegen'd Column — same four steps as
    * normalizeRu, in the reference's order. */
  def tokensColRu(text: Column): Column = {
    val folded = regexp_replace(regexp_replace(text, "ё", "е"), "Ё", "Е")
    val stripped = regexp_replace(folded, "[^а-яА-ЯёЁ ]", " ")
    filter(split(trim(lower(stripped)), " +"), t => length(t) > 0)
  }

  /** Stop-filtered Russian token array. */
  def termsColRu(text: Column): Column =
    filter(tokensColRu(text), t => !t.isin(ruStop.toSeq.map(x => x: Any): _*))

  /** DuckDB SQL fragment computing the same token stream from a text column.
    * Used to assemble oracle SQL; `col` is the SQL expression for the text.
    * Mirrors normalize()+rawTokens() exactly (RE2 semantics match Java here:
    * plain char classes, no lookaround).
    */
  def sqlTokens(col: String): String =
    s"regexp_split_to_array(trim(lower(regexp_replace(regexp_replace(regexp_replace($col, " +
      raw"'([A-Z]+)([A-Z][a-z])', '\1 \2', 'g'), '([a-z0-9])([A-Z])', '\1 \2', 'g'), " +
      "'[^A-Za-z0-9]+', ' ', 'g'))), ' +')"

  def sqlStopPredicate(termExpr: String, stops: Set[String]): String =
    if (stops.isEmpty) s"$termExpr <> ''"
    else s"$termExpr <> '' AND $termExpr NOT IN (${stops.toSeq.sorted.map(s => s"'$s'").mkString(", ")})"

  /** DuckDB twin of tokensColRu (utf8proc lower() handles Cyrillic; RE2
    * char classes operate on code points, matching Java's BMP behavior
    * here). */
  def sqlTokensRu(col: String): String =
    s"regexp_split_to_array(trim(lower(regexp_replace(regexp_replace(regexp_replace($col, " +
      s"'ё', 'е', 'g'), 'Ё', 'Е', 'g'), '[^а-яА-ЯёЁ ]', ' ', 'g'))), ' +')"
}
