package graft.analyze

/** The SHIPPED normal-forms lexicon — the analog of the reference's bundled
  * lucene-morphology dictionaries (/root/reference/src/main/java/searchengine/
  * tools/Lemmatizator.java:1 `luceneMorph.getNormalForms`; golden expectations
  * in src/test/java/searchengine/tools/LemmatizatorTest.java:10-17, where one
  * surface word expands to EVERY normal form, ambiguity preserved).
  *
  * The reference ships Russian morphology; this engine's corpus is English/
  * code, so the shipped fixture is a deterministic English inflection table
  * over the data-engineering vocabulary the synthetic corpora draw from,
  * including genuinely ambiguous 1→N entries ("data" → datum|data, "axes" →
  * axis|axe) that exercise the same expansion mechanics the golden test
  * pins. It is a plain committed Map — no model, no I/O, bit-stable — and
  * the DuckDB oracle consumes the SAME map rendered as a VALUES join
  * (SparkEntry.lexCte).
  */
object DefaultLexicon {

  val lexicon: Analyzer.Lexicon = Map(
    // inflections of the synthetic corpus vocabulary
    "joins" -> Seq("join"), "joined" -> Seq("join"), "joining" -> Seq("join"),
    "queries" -> Seq("query"), "queried" -> Seq("query"),
    "filters" -> Seq("filter"), "filtered" -> Seq("filter"),
    "tables" -> Seq("table"), "rows" -> Seq("row"), "keys" -> Seq("key"),
    "groups" -> Seq("group"), "grouped" -> Seq("group"),
    "batches" -> Seq("batch"), "streams" -> Seq("stream"),
    "windows" -> Seq("window"), "scans" -> Seq("scan"), "scanned" -> Seq("scan"),
    "merges" -> Seq("merge"), "merged" -> Seq("merge"),
    "sorts" -> Seq("sort"), "sorted" -> Seq("sort"),
    "orders" -> Seq("order"), "ordered" -> Seq("order"),
    "values" -> Seq("value"), "parts" -> Seq("part"),
    "lines" -> Seq("line"), "vectors" -> Seq("vector"),
    "customers" -> Seq("customer"), "plans" -> Seq("plan"),
    "hashes" -> Seq("hash"), "hashed" -> Seq("hash"),
    "indices" -> Seq("index"), "indexes" -> Seq("index"),
    "slower" -> Seq("slow"), "slowest" -> Seq("slow"),
    "faster" -> Seq("fast"), "fastest" -> Seq("fast"),
    "bigger" -> Seq("big"), "biggest" -> Seq("big"),
    "smaller" -> Seq("small"), "smallest" -> Seq("small"),
    // ambiguous 1→N entries (the LemmatizatorTest-shaped cases): every
    // normal form is indexed, so a query for either form finds the doc
    "data" -> Seq("data", "datum"),
    "axes" -> Seq("axe", "axis"),
    "leaves" -> Seq("leaf", "leave"),
    "building" -> Seq("build", "building"))

  /** Russian fixture lexicon — TRUE reference-domain parity for T4
    * (RussianLuceneMorphology analog). Contains the reference golden's own
    * expansion (LemmatizatorTest.java:10-17: `вчатв` → `вчатва`, `дом` →
    * `дом`) plus classic 1→N ambiguities (`стали` → сталь|стать,
    * `банка` → банк|банка) so the ambiguity-preserving mechanics run on
    * genuine Cyrillic input. Consumed by the DuckDB oracle as a VALUES
    * join (SparkEntry ruLexCte), identically. */
  val russian: Analyzer.Lexicon = Map(
    "вчатв" -> Seq("вчатва"),            // the committed reference golden
    "дома" -> Seq("дом"),
    "стали" -> Seq("сталь", "стать"),    // ambiguous noun/verb
    "банка" -> Seq("банк", "банка"),     // ambiguous genitive/nominative
    "печи" -> Seq("печь"),
    "леса" -> Seq("лес"),
    "елка" -> Seq("елка"),               // post-fold surface of ёлка
    "мыши" -> Seq("мышь"))
}
