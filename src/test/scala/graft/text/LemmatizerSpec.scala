package graft.text

import org.scalatest.funsuite.AnyFunSuite

class LemmatizerSpec extends AnyFunSuite {
  test("irregular forms resolve via the exception list") {
    assert(Lemmatizer.lemma("children") == "child")
    assert(Lemmatizer.lemma("were") == "be")
    assert(Lemmatizer.lemma("took") == "take")
  }

  test("suffix rules: plurals") {
    assert(Lemmatizer.lemma("studies") == "study")
    assert(Lemmatizer.lemma("classes") == "class")
    assert(Lemmatizer.lemma("boxes") == "box")
    assert(Lemmatizer.lemma("dogs") == "dog")
    assert(Lemmatizer.lemma("glass") == "glass") // -ss passthrough
  }

  test("suffix rules: -ing and -ed") {
    assert(Lemmatizer.lemma("running") == "run")
    assert(Lemmatizer.lemma("making") == "make")
    assert(Lemmatizer.lemma("jumped") == "jump")
    assert(Lemmatizer.lemma("tried") == "try")
    assert(Lemmatizer.lemma("stopped") == "stop")
  }

  test("undoubling excludes l/s/z/f: legitimate double-consonant bases stay whole") {
    assert(Lemmatizer.lemma("passed") == "pass")
    assert(Lemmatizer.lemma("telling") == "tell")
    assert(Lemmatizer.lemma("missed") == "miss")
    assert(Lemmatizer.lemma("falling") == "fall")
    assert(Lemmatizer.lemma("stuffed") == "stuff")
    assert(Lemmatizer.lemma("buzzing") == "buzz")
    assert(Lemmatizer.lemma("stopping") == "stop") // still undoubles elsewhere
  }

  test("short and unknown tokens pass through") {
    assert(Lemmatizer.lemma("is") == "be")
    assert(Lemmatizer.lemma("ab") == "ab")
    assert(Lemmatizer.lemma("spark") == "spark")
  }
}
