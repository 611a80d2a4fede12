package graft.text

/** Small rule-based English lemmatizer (reference E16's WordNet-lemmatize
  * step, Hap880_Final_Project.py:309-310). No NLTK on the JVM — this is a
  * suffix-rule engine with an irregular-form exception list (common
  * irregulars, independently typed; the WordNet approach of
  * exception-list-then-detachment-rules is public knowledge).
  *
  * Deterministic, allocation-light, usable from a UDF or per-partition
  * iterator. Goldens pin THIS lemmatizer (SURVEY §7.5.2).
  */
object Lemmatizer {

  private val exceptions: Map[String, String] = Map(
    "children" -> "child", "men" -> "man", "women" -> "woman",
    "feet" -> "foot", "teeth" -> "tooth", "geese" -> "goose",
    "mice" -> "mouse", "people" -> "person", "lives" -> "life",
    "wives" -> "wife", "knives" -> "knife", "leaves" -> "leaf",
    "halves" -> "half", "selves" -> "self",
    "was" -> "be", "were" -> "be", "is" -> "be", "are" -> "be", "been" -> "be",
    "has" -> "have", "had" -> "have",
    "did" -> "do", "done" -> "do", "does" -> "do",
    "went" -> "go", "gone" -> "go",
    "said" -> "say", "made" -> "make", "took" -> "take", "taken" -> "take",
    "came" -> "come", "saw" -> "see", "seen" -> "see", "got" -> "get",
    "gave" -> "give", "given" -> "give", "found" -> "find", "felt" -> "feel",
    "kept" -> "keep", "left" -> "leave", "lost" -> "lose", "met" -> "meet",
    "paid" -> "pay", "ran" -> "run", "sat" -> "sit", "told" -> "tell",
    "thought" -> "think", "wrote" -> "write", "written" -> "write",
    "better" -> "good", "best" -> "good", "worse" -> "bad", "worst" -> "bad"
  )

  private def vowel(c: Char): Boolean = "aeiou".indexOf(c) >= 0

  /** Doubled final consonant that -ed/-ing stemming should undouble
    * ("runn" → "run"), EXCLUDING letters whose doubles are legitimate
    * base-word endings (Porter's l/s/z, plus f): "tell", "pass", "buzz",
    * "stuff" stay whole.
    */
  private def undoubles(stem: String): Boolean =
    stem.length >= 2 && stem.last == stem(stem.length - 2) &&
      !vowel(stem.last) && "lszf".indexOf(stem.last) < 0

  /** Lemmatize one lowercase token. Unknown/short tokens pass through.
    * Exceptions are consulted BEFORE the length guard ("is" → "be").
    */
  def lemma(w: String): String = {
    if (w == null) return w
    if (w.length <= 2 && !exceptions.contains(w)) return w
    exceptions.get(w) match {
      case Some(l) => l
      case None =>
        if (w.endsWith("ies") && w.length > 4) w.dropRight(3) + "y"
        else if (w.endsWith("sses")) w.dropRight(2)
        else if (w.endsWith("xes") || w.endsWith("zes") || w.endsWith("ches") || w.endsWith("shes"))
          w.dropRight(2)
        else if (w.endsWith("ss") || w.endsWith("us") || w.endsWith("is")) w
        else if (w.endsWith("s") && !w.endsWith("es")) w.dropRight(1)
        else if (w.endsWith("es")) w.dropRight(1) // e.g. "makes" -> "make"
        else if (w.endsWith("ing") && w.length > 5) {
          val stem = w.dropRight(3)
          // doubled final consonant: "running" -> "run". Porter's exclusion
          // set (l, s, z; plus f) keeps legitimate double-consonant bases
          // whole: "telling" -> "tell", "passing" -> "pass", not "tel"/"pas"
          if (undoubles(stem)) stem.dropRight(1)
          // CVC stems usually re-add 'e': "making" -> "make"
          else if (stem.length >= 2 && !vowel(stem.last) && vowel(stem(stem.length - 2))) stem + "e"
          else stem
        }
        else if (w.endsWith("ed") && w.length > 4) {
          val stem = w.dropRight(2)
          if (undoubles(stem)) stem.dropRight(1) // "stopped" -> "stop"
          else if (stem.endsWith("i")) stem.dropRight(1) + "y" // "tried" -> "try"
          else stem
        }
        else w
    }
  }

  def lemmatize(tokens: Seq[String]): Seq[String] = tokens.map(lemma)

  // ---- DuckDB oracle rendering -----------------------------------------
  // The rule engine is deterministic string logic, so it can be rendered
  // into SQL exactly — same trick as Similarity.rhpNearDupOracleSql: the
  // SAME driver-side rule data feeds both the Spark plan (via the
  // Lemmatize codegen expression) and the generated oracle, making the
  // full E16 lemmatize path a hash-checked row instead of spec-trusted.

  /** `undoubles(stem)` as SQL over a stem expression of known length
    * expression. Tokens are lowercase a-z (TextOps.tokens), so plain
    * substr/strpos string ops are exact.
    */
  private def undoublesSql(stem: String, len: String): String =
    s"($len >= 2 AND substr($stem, $len, 1) = substr($stem, $len - 1, 1)" +
      s" AND strpos('aeiou', substr($stem, $len, 1)) = 0" +
      s" AND strpos('lszf', substr($stem, $len, 1)) = 0)"

  /** A SQL CASE expression computing `lemma(x)` for a lowercase-token
    * expression `x` — rule-for-rule the Scala chain above, in the same
    * order (exceptions first, then the length guard, then suffix rules).
    */
  def lemmaCaseSql(x: String): String = {
    // exception keys are disjoint, so WHEN order among them is irrelevant;
    // sort for stable generated SQL text
    val exc = exceptions.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN '$k' THEN '$v'" }
      .mkString(" ")
    val ingStem = s"substr($x, 1, length($x) - 3)"
    val ingLen  = s"(length($x) - 3)"
    val ingCase =
      s"CASE WHEN ${undoublesSql(ingStem, ingLen)} THEN substr($ingStem, 1, $ingLen - 1) " +
        s"WHEN $ingLen >= 2 AND strpos('aeiou', substr($ingStem, $ingLen, 1)) = 0" +
        s" AND strpos('aeiou', substr($ingStem, $ingLen - 1, 1)) > 0 THEN $ingStem || 'e' " +
        s"ELSE $ingStem END"
    val edStem = s"substr($x, 1, length($x) - 2)"
    val edLen  = s"(length($x) - 2)"
    val edCase =
      s"CASE WHEN ${undoublesSql(edStem, edLen)} THEN substr($edStem, 1, $edLen - 1) " +
        s"WHEN substr($edStem, $edLen, 1) = 'i' THEN substr($edStem, 1, $edLen - 1) || 'y' " +
        s"ELSE $edStem END"
    s"""CASE $x $exc ELSE
       | CASE
       |  WHEN length($x) <= 2 THEN $x
       |  WHEN $x LIKE '%ies' AND length($x) > 4 THEN substr($x, 1, length($x) - 3) || 'y'
       |  WHEN $x LIKE '%sses' THEN substr($x, 1, length($x) - 2)
       |  WHEN $x LIKE '%xes' OR $x LIKE '%zes' OR $x LIKE '%ches' OR $x LIKE '%shes' THEN substr($x, 1, length($x) - 2)
       |  WHEN $x LIKE '%ss' OR $x LIKE '%us' OR $x LIKE '%is' THEN $x
       |  WHEN $x LIKE '%s' AND NOT ($x LIKE '%es') THEN substr($x, 1, length($x) - 1)
       |  WHEN $x LIKE '%es' THEN substr($x, 1, length($x) - 1)
       |  WHEN $x LIKE '%ing' AND length($x) > 5 THEN $ingCase
       |  WHEN $x LIKE '%ed' AND length($x) > 4 THEN $edCase
       |  ELSE $x
       | END
       |END""".stripMargin
  }

  /** Full oracle for the `t_lemmas` query: tokenize (the TextOps.tokens
    * mirror used by every other text oracle) → lemmatize per token →
    * space-join.
    */
  def oracleSql(table: String, idCol: String, textCol: String): String =
    s"""WITH toks AS (
       |  SELECT $idCol, list_filter(regexp_split_to_array(lower($textCol), '[^a-z]+'), x -> x <> '') AS t
       |  FROM $table
       |)
       |SELECT $idCol,
       |  array_to_string(list_transform(t, x -> ${lemmaCaseSql("x")}), ' ') AS lemmas
       |FROM toks""".stripMargin
}
