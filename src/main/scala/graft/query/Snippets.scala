package graft.query

import graft.analyze.Analyzer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Result decoration — pure scalar functions applied to the final k rows
  * only (never inside the distributed scoring plan). Rebuilds the
  * reference's snippet pipeline (/root/reference/src/main/java/searchengine/
  * services/SearchServiceImpl.java:135-296):
  *   - sentence split on `[.!?]\s*`                       (:215-221)
  *   - per-sentence query-term match count                 (:241-252)
  *   - argmax sentence, first max wins — we tie-break by sentence index
  *     for determinism                                     (:254-264)
  *   - 30-word window around the first hit                 (:146-187, lengthSnippet=30)
  *   - `<b>` wrap of matched words                         (:189-205)
  */
object Snippets {
  val snippetWords = 30

  private def matches(word: String, terms: Set[String], lang: String): Boolean = {
    val analyzed = Analyzer.analyze(lang, word)
    analyzed.exists(terms.contains)
  }

  def bestSentence(text: String, terms: Set[String], lang: String): String = {
    val sentences = text.split("[.!?]\\s*").toSeq.filter(_.nonEmpty)
    if (sentences.isEmpty) return ""
    // argmax by match count; ties -> lowest sentence index (deterministic)
    sentences.zipWithIndex.map { case (s, i) =>
      val cnt = s.split("[«»“”\\p{Punct}\\s]+").count(w => w.nonEmpty && matches(w, terms, lang))
      (cnt, i, s)
    }.maxBy { case (cnt, i, _) => (cnt, -i) }._3
  }

  def trimAroundFirstHit(sentence: String, terms: Set[String], lang: String): String = {
    val words = sentence.split("\\s+").toSeq.filter(_.nonEmpty)
    if (words.length < snippetWords + 1) return words.mkString(" ")
    val firstHit = words.indexWhere(w => matches(w, terms, lang))
    val start = math.max(0, if (firstHit < 0) 0 else firstHit - snippetWords / 2)
    val stop = math.min(words.length, start + snippetWords)
    words.slice(start, stop).mkString(" ")
  }

  def highlight(snippet: String, terms: Set[String], lang: String): String =
    snippet.split("(?<= )|(?= )").map { w =>
      val bare = w.trim
      if (bare.nonEmpty && matches(bare, terms, lang)) w.replace(bare, s"<b>$bare</b>") else w
    }.mkString

  def makeSnippet(text: String, terms: Set[String], lang: String): String = {
    val s = bestSentence(text, terms, lang)
    highlight(trimAroundFirstHit(s, terms, lang), terms, lang)
  }

  /** UDF factory bound to a fixed (tiny) query-term set — applied after the
    * top-k limit, so it touches at most k rows. */
  def makeSnippetUdf(terms: Set[String]): (Column, Column) => Column = {
    val f = udf((text: String, lang: String) =>
      if (text == null) "" else makeSnippet(text, terms, lang))
    (text, lang) => f(text, lang)
  }

  /** MULTI-FRAGMENT snippet (the "…"-joined highlights every modern SERP
    * shows): the m best-matching sentences by (match count desc, index
    * asc), re-ordered to DOCUMENT order for display, each trimmed and
    * highlighted like the single-fragment path. m = 1 degenerates to
    * [[makeSnippet]] exactly. */
  def makeSnippetMulti(text: String, terms: Set[String], lang: String,
                       m: Int = 2): String = {
    val sentences = text.split("[.!?]\\s*").toSeq.filter(_.nonEmpty)
    if (sentences.isEmpty) return ""
    val scored = sentences.zipWithIndex.map { case (s, i) =>
      val cnt = s.split("[«»“”\\p{Punct}\\s]+").count(w => w.nonEmpty && matches(w, terms, lang))
      (cnt, i, s)
    }
    scored.sortBy { case (cnt, i, _) => (-cnt, i) }.take(m)
      .sortBy(_._2)
      .map { case (_, _, s) => highlight(trimAroundFirstHit(s, terms, lang), terms, lang) }
      .mkString(" … ")
  }

  /** UDF form of [[makeSnippetMulti]] — final-k-rows only, like the rest */
  def makeSnippetMultiUdf(terms: Set[String], m: Int = 2): (Column, Column) => Column = {
    val f = udf((text: String, lang: String) =>
      if (text == null) "" else makeSnippetMulti(text, terms, lang, m))
    (text, lang) => f(text, lang)
  }
}
