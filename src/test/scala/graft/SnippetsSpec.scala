package graft

import graft.query.Snippets
import org.scalatest.funsuite.AnyFunSuite

/** Snippet/highlight goldens (SURVEY.md §2.9/A6/A7): sentence argmax with
  * deterministic tie-break, 30-word trim around the first hit, <b> wrap. */
class SnippetsSpec extends AnyFunSuite {
  val terms = Set("spark", "join")

  test("best sentence = argmax of query-term matches; ties -> first sentence") {
    val text = "Nothing here. spark join spark wins! Also spark appears once. join."
    assert(Snippets.bestSentence(text, terms, "en") == "spark join spark wins")
    // tie: two sentences with one match each -> earlier one
    val tie = "first spark here. second spark there."
    assert(Snippets.bestSentence(tie, terms, "en") == "first spark here")
  }

  test("short sentence returned whole; long sentence trimmed to 30 words around first hit") {
    val short = "spark join"
    assert(Snippets.trimAroundFirstHit(short, terms, "en") == "spark join")
    val words = (1 to 50).map(i => s"w$i").updated(20, "spark")
    val long = words.mkString(" ")
    val out = Snippets.trimAroundFirstHit(long, terms, "en")
    val outWords = out.split(" ")
    assert(outWords.length == Snippets.snippetWords)
    assert(outWords.contains("spark"))
    // window starts 15 before the hit (hit at index 20 -> start 5 -> w6..)
    assert(outWords.head == "w6")
    // hit near the end: window clamps to the tail
    val tail = (1 to 50).map(i => s"w$i").updated(48, "join").mkString(" ")
    val outTail = Snippets.trimAroundFirstHit(tail, terms, "en").split(" ")
    assert(outTail.contains("join") && outTail.length <= Snippets.snippetWords)
  }

  test("highlight wraps every matched word in <b>, leaves others") {
    val out = Snippets.highlight("fast spark query join", terms, "en")
    assert(out == "fast <b>spark</b> query <b>join</b>")
  }

  test("matching is analyzer-aware: camelCase surface forms still match") {
    // the snippet pipeline analyzes each word, so "sparkJoin" matches "spark"
    val out = Snippets.highlight("use sparkJoin here", terms, "en")
    assert(out == "use <b>sparkJoin</b> here")
  }

  test("makeSnippet end-to-end: picks, trims, highlights; empty text safe") {
    val text = "Intro sentence here. the spark join result is great."
    val snip = Snippets.makeSnippet(text, terms, "en")
    assert(snip.contains("<b>spark</b>") && snip.contains("<b>join</b>"))
    assert(!snip.contains("Intro"))
    assert(Snippets.makeSnippet("", terms, "en") == "")
  }

  test("makeSnippetMulti: two best fragments in DOCUMENT order; m=1 == single") {
    // best sentence (2 hits) comes AFTER the runner-up (1 hit) in the text:
    // display order must still be document order, not score order
    val text = "a join appears early. no match here at all. spark join wins late."
    val multi = Snippets.makeSnippetMulti(text, terms, "en", m = 2)
    val frags = multi.split(" … ")
    assert(frags.length == 2, s"got $multi")
    assert(frags(0).contains("<b>join</b>") && frags(0).contains("early"))
    assert(frags(1).contains("<b>spark</b>") && frags(1).contains("late"))
    assert(!multi.contains("no match"))
    // m = 1 degenerates to the single-fragment path exactly
    assert(Snippets.makeSnippetMulti(text, terms, "en", m = 1) ==
      Snippets.makeSnippet(text, terms, "en"))
    // single-sentence doc yields one fragment; empty text safe
    assert(!Snippets.makeSnippetMulti("spark join only", terms, "en").contains("…"))
    assert(Snippets.makeSnippetMulti("", terms, "en") == "")
  }
}
