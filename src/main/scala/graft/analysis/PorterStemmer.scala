package graft.analysis

/** Porter (1980) stemmer reproducing the *reference implementation's*
  * semantics (reference: backend/src/util/steming.rs:1-217), including its
  * documented deviations from the canonical paper:
  *
  *  - words of length <= 2 are returned unchanged (steming.rs:203-205);
  *  - step 1c tests `has_vowel` over the whole stem (steming.rs:128);
  *  - step 4's "ion" condition is `s || (t && m > 1)` due to Rust operator
  *    precedence (steming.rs:179-181);
  *  - steps 2/3/4 keep scanning later suffixes when an earlier suffix matches
  *    but its measure condition fails (replace_suffix_condition returns false,
  *    steming.rs:54-70), unlike canonical "longest match then stop".
  *
  * Pure Scala, no Spark dependency: usable inside codegen'd expressions,
  * UDFs and the single-node oracle alike. Thread-safe (no shared state).
  */
object PorterStemmer {

  @inline private def isVowelAt(w: Array[Char], i: Int): Boolean = {
    var j = i
    // 'y' is a vowel iff the previous char is not a vowel (steming.rs:5).
    // Resolve chains of 'y' iteratively instead of recursively.
    var parity = true
    while (j >= 0) {
      w(j) match {
        case 'a' | 'e' | 'i' | 'o' | 'u' => return parity
        case 'y' =>
          if (j == 0) return !parity // leading 'y' is a consonant
          parity = !parity
          j -= 1
        case _ => return !parity
      }
    }
    !parity
  }

  /** m(): count of vowel→consonant transitions over w[0, len) (steming.rs:10-23). */
  private def measure(w: Array[Char], len: Int): Int = {
    var m = 0
    var prevVowel = false
    var i = 0
    while (i < len) {
      val v = isVowelAt(w, i)
      if (prevVowel && !v) m += 1
      prevVowel = v
      i += 1
    }
    m
  }

  private def hasVowel(w: Array[Char], len: Int): Boolean = {
    var i = 0
    while (i < len) { if (isVowelAt(w, i)) return true; i += 1 }
    false
  }

  /** *o: stem ends cvc where the final c is not w/x/y (steming.rs:29-38). */
  private def endsWithCvc(w: Array[Char], len: Int): Boolean = {
    if (len < 3) return false
    val i = len - 3
    val lastC = w(i + 2)
    !isVowelAt(w, i) && isVowelAt(w, i + 1) && !isVowelAt(w, i + 2) &&
      lastC != 'w' && lastC != 'x' && lastC != 'y'
  }

  /** Mutable word buffer: fixed backing array (stems never grow by more than
    * one char past the input since replacements are never longer than the
    * suffix + 1), explicit length.
    */
  private final class Buf(word: String) {
    val a: Array[Char] = new Array[Char](word.length + 2)
    var len: Int = word.length
    word.getChars(0, word.length, a, 0)

    def endsWith(s: String): Boolean = {
      val sl = s.length
      if (len < sl) return false
      var i = 0
      while (i < sl) { if (a(len - sl + i) != s.charAt(i)) return false; i += 1 }
      true
    }
    def replaceSuffix(suffix: String, replacement: String): Boolean = {
      if (!endsWith(suffix)) return false
      len -= suffix.length
      var i = 0
      while (i < replacement.length) { a(len) = replacement.charAt(i); len += 1; i += 1 }
      true
    }
    def replaceSuffixIf(suffix: String, replacement: String)(cond: Int => Boolean): Boolean = {
      if (!endsWith(suffix)) return false
      if (!cond(len - suffix.length)) return false
      replaceSuffix(suffix, replacement)
    }
    def snapshot(): Int = len // only length changes within a step before restore points
    def result: String = new String(a, 0, len)
  }

  // --- steps (steming.rs:72-198) -------------------------------------------

  private def step1a(w: Buf): Unit = {
    if (w.replaceSuffix("sses", "ss")) return
    if (w.replaceSuffix("ies", "i")) return
    if (w.replaceSuffix("ss", "ss")) return
    if (w.endsWith("s") && hasVowel(w.a, w.len - 1)) w.len -= 1
  }

  private def step1b(w: Buf): Unit = {
    if (w.replaceSuffixIf("eed", "ee")(stem => measure(w.a, stem) > 0)) return

    var modified = false
    val originalLen = w.len
    val original = java.util.Arrays.copyOf(w.a, w.len)

    def restore(): Unit = {
      System.arraycopy(original, 0, w.a, 0, originalLen)
      w.len = originalLen
    }

    if (w.replaceSuffix("ed", "") && hasVowel(w.a, w.len)) modified = true
    else restore()

    if (!modified && w.replaceSuffix("ing", "") && hasVowel(w.a, w.len)) modified = true
    else if (!modified) restore()

    if (modified) {
      if (w.replaceSuffix("at", "ate") || w.replaceSuffix("bl", "ble") ||
          w.replaceSuffix("iz", "ize")) return
      if (w.len >= 2) {
        val last = w.a(w.len - 1)
        val prev = w.a(w.len - 2)
        if (last == prev && !isVowelAt(w.a, w.len - 1) &&
            last != 'l' && last != 's' && last != 'z') {
          w.len -= 1
          return
        }
      }
      if (measure(w.a, w.len) == 1 && endsWithCvc(w.a, w.len)) {
        w.a(w.len) = 'e'; w.len += 1
      }
    }
  }

  private def step1c(w: Buf): Unit = {
    if (w.endsWith("y") && hasVowel(w.a, w.len - 1)) w.a(w.len - 1) = 'i'
  }

  private val Step2Suffixes: Array[(String, String)] = Array(
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"),
    ("alli", "al"), ("entli", "ent"), ("eli", "e"),
    ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"))

  private val Step3Suffixes: Array[(String, String)] = Array(
    ("icate", "ic"), ("ative", ""), ("alize", "al"),
    ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""))

  private val Step4Suffixes: Array[String] = Array(
    "al", "ance", "ence", "er", "ic", "able", "ible",
    "ant", "ement", "ment", "ent", "ou", "ism", "ate",
    "iti", "ous", "ive", "ize")

  private def step2(w: Buf): Unit = {
    var i = 0
    while (i < Step2Suffixes.length) {
      val (s, r) = Step2Suffixes(i)
      if (w.replaceSuffixIf(s, r)(stem => measure(w.a, stem) > 0)) return
      i += 1
    }
  }

  private def step3(w: Buf): Unit = {
    var i = 0
    while (i < Step3Suffixes.length) {
      val (s, r) = Step3Suffixes(i)
      if (w.replaceSuffixIf(s, r)(stem => measure(w.a, stem) > 0)) return
      i += 1
    }
  }

  private def step4(w: Buf): Unit = {
    var i = 0
    while (i < Step4Suffixes.length) {
      if (w.replaceSuffixIf(Step4Suffixes(i), "")(stem => measure(w.a, stem) > 1)) return
      i += 1
    }
    // Reference quirk: `s || (t && m > 1)` (steming.rs:179-181).
    w.replaceSuffixIf("ion", "") { stem =>
      (stem >= 1 && w.a(stem - 1) == 's') ||
        ((stem >= 1 && w.a(stem - 1) == 't') && measure(w.a, stem) > 1)
    }
    ()
  }

  private def step5a(w: Buf): Unit = {
    if (w.endsWith("e")) {
      val stem = w.len - 1
      val m = measure(w.a, stem)
      if (m > 1 || (m == 1 && !endsWithCvc(w.a, stem))) w.len -= 1
    }
  }

  private def step5b(w: Buf): Unit = {
    if (measure(w.a, w.len) > 1 && w.endsWith("ll")) w.len -= 1
  }

  /** Stem one word (steming.rs:200-217). Input is lowercased first; words of
    * length <= 2 are returned unchanged (already lowercased).
    */
  def stem(word: String): String = {
    val lower = word.toLowerCase(java.util.Locale.ROOT)
    if (lower.length <= 2) return lower
    val w = new Buf(lower)
    step1a(w); step1b(w); step1c(w)
    step2(w); step3(w); step4(w)
    step5a(w); step5b(w)
    w.result
  }
}
