package graft.gen

/** The deterministic "reference query set" (FIXTURES.md §2) used by
  * the oracle-parity suite and QueryBench. Covers: hot/mid/rare
  * single terms, multi-term AND/OR, planted needles (the reference's
  * known-relevant-doc regression fixture,
  * `diagnose_semantic_search.py:18-21`), zero-hit terms,
  * stopword-only queries, and threshold variants mirroring the
  * reference's min-score defaults (0.15 `config/config.py:273`,
  * 0.3 `app.py:163`).
  */
object QuerySet {

  case class Q(
      id: String,
      text: String,
      k: Int = 10,
      conjunctive: Boolean = false,
      minScore: Double = 0.0)

  /** Query-phrasing sweep fixture — the port of the reference's
    * `diagnose_semantic_search.py:189-261` `test_query_variations`:
    * four phrasings of the SAME topic (the planted needle-5 document),
    * from verbose prose through bare keywords, mirroring the
    * reference's LONG / SHORT / KEYWORDS / NATURAL variants. The long
    * and natural forms deliberately carry stop words from the
    * reference's own list (prospective, comparison, treatment, ...)
    * and hot competing terms, so the sweep exercises tokenization,
    * idf weighting, and rank stability together. Quality bar = the
    * reference's: the known-relevant doc must rank in the TOP 10
    * under EVERY phrasing (SEMANTIC_SEARCH_IMPROVEMENTS.md:5-10,
    * 269-271); PhrasingSpec asserts it. Declared BEFORE
    * referenceQueries, which folds these in as `phrase-*` entries.
    */
  val phrasingSweep: Seq[(String, String)] = Seq(
    "long" -> ("prospective randomized comparison of needle5alpha and needle5beta " +
      "treatment outcomes with t00000 t00001 measurements during the controlled evaluation"),
    "short" -> "needle5alpha needle5beta",
    "keywords" -> "needle5alpha needle5beta needleshared",
    "natural" -> "what is the effect of needle5alpha versus needle5beta in this corpus")

  /** The phrasing sweep's known-relevant document (needle 5's planted
    * turn): conv [[TranscriptGen.convId]](5), turn 0.
    */
  val phrasingTargetConv: String = TranscriptGen.convId(5L)

  val referenceQueries: Seq[Q] = {
    val hot = Seq(
      Q("hot1", "t00000"),
      Q("hot2", "t00001 t00002"),
      Q("hot3", "t00000 t00001 t00002 t00003", k = 50))
    val mid = Seq(
      Q("mid1", "t00100"),
      Q("mid2", "t00250 t00400"),
      Q("mid3", "t00100 t00500 t01000", k = 25))
    val rare = Seq(
      Q("rare1", "t04900"),
      Q("rare2", "t04500 t04800"),
      Q("rare3", "t03999 t04250 t04750", k = 100))
    val mixed = Seq(
      Q("mix1", "t00000 t04900"),
      Q("mix2", "t00005 t00300 t04000"),
      Q("mix3", "t00010 t01500 t03000 t04500", k = 20))
    val and = Seq(
      Q("and1", "t00000 t00001", conjunctive = true),
      Q("and2", "t00050 t00060 t00070", conjunctive = true, k = 30),
      Q("and3", "t00000 t04900", conjunctive = true),
      Q("and4", "t00000 zzznotaterm", conjunctive = true))
    val needles = (0 until TranscriptGen.NumNeedles).map(i =>
      Q(s"needle$i", s"needle${i}alpha needle${i}beta"))
    val special = Seq(
      Q("shared", "needleshared", k = 30),
      Q("zero", "zzznotaterm qqqmissing"),
      Q("stoponly", "the of and in"), // tokenizes to nothing
      Q("dupterms", "t00007 t00007 t00007"), // distinct-terms contract
      Q("thresh15", "t00020 t00021", minScore = 0.15),
      Q("thresh30", "t00030", minScore = 0.3, k = 100),
      Q("bigk", "t00002 t00040", k = 1000))
    hot ++ mid ++ rare ++ mixed ++ and ++ needles ++ special ++
      phrasingSweep.map { case (kind, text) => Q(s"phrase-$kind", text) }
  }
}
