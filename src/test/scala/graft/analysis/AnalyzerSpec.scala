package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer + analysis-chain fixtures (FIXTURES.md §4, §6; reference:
  * backend/src/util/tokenizer.rs:79-85, 18-31).
  */
class AnalyzerSpec extends AnyFunSuite {

  test("tokenizer golden fixtures (tokenizer.rs:79-85)") {
    assert(Analyzer.tokenize("Hello, World!").toSeq == Seq("hello", "world"))
    assert(Analyzer.tokenize("a bb ccc").toSeq == Seq("ccc"))
    assert(Analyzer.tokenize("foo_bar-baz").toSeq == Seq("foo", "bar", "baz"))
    assert(Analyzer.tokenize("C++ is OK x2").toSeq == Seq.empty)
    assert(Analyzer.tokenize("HTTP2 server!!").toSeq == Seq("http2", "server"))
    assert(Analyzer.tokenize("").toSeq == Seq.empty)
    assert(Analyzer.tokenize("   ").toSeq == Seq.empty)
    assert(Analyzer.tokenize(null).toSeq == Seq.empty)
    // non-ASCII letters are separators (regex class is ASCII-only)
    assert(Analyzer.tokenize("żółć naïve").toSeq == Seq.empty)
    assert(Analyzer.tokenize("überfast motor").toSeq == Seq("berfast", "motor"))
    // length floor is > 2 measured on the raw (pre-lowercase) token
    assert(Analyzer.tokenize("ab ABC x=y+z2 a.b_c-1").toSeq == Seq("abc"))
  }

  test("scanner is equivalent to the reference regex split (seeded property)") {
    val re = "[^a-zA-Z0-9]+".r
    def regexTokenize(s: String): Seq[String] =
      re.split(s).toSeq.filter(t => t.nonEmpty && t.length > 2).map(_.toLowerCase)
    val alphabet = "abcXYZ019 .,_-+!żé\n\t"
    val rnd = new scala.util.Random(42)
    (1 to 2000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(40))(alphabet(rnd.nextInt(alphabet.length))).mkString
      assert(Analyzer.tokenize(s).toSeq == regexTokenize(s), s"input=${s.replace("\n", "\\n")}")
    }
  }

  test("analysis chain: tokenize -> stop-filter -> stem (FIXTURES.md §6)") {
    val a = Analyzer(Set("was"), stem = true)
    // "he" dropped by length floor, "was" by stop list, survivors stemmed
    assert(a.analyze("He was running races").toSeq == Seq("run", "race"))
  }

  test("stop filter applies before stemming (tokenizer.rs:21-25)") {
    // "this" is in the stop list; its stem "thi" is not — order matters
    val a = Analyzer(Set("this"), stem = true)
    assert(a.analyze("this thing").toSeq == Seq("thing"))
    // conversely a word whose *stem* is a stop word is NOT dropped
    val b = Analyzer(Set("run"), stem = true)
    assert(b.analyze("running run").toSeq == Seq("run"))
  }

  test("default stop-word list loads and is applied") {
    val a = Analyzer.default
    assert(Analyzer.defaultStopWords.contains("the"))
    assert(a.analyze("the quick brown foxes").toSeq == Seq("quick", "brown", "fox"))
  }

  test("noStem chain skips stemming only") {
    val a = Analyzer.noStem(Set("the"))
    assert(a.analyze("the running rivers").toSeq == Seq("running", "rivers"))
  }
}
