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
}
