package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import TextFunctions._

class TextFunctionsSpec extends AnyFunSuite {

  /** Run a scalacheck property and assert it passed. */
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("deaccentLower ascii-folds (non-decomposable chars dropped) and lowers") {
    assert(deaccentLower("Café Ñandú") == "cafe nandu")
    // ß does not NFKD-decompose; the reference's ascii-encode/ignore DROPS it
    assert(deaccentLower("Müller-Straße") == "muller-strae")
    assert(deaccentLower("  Padded  ") == "padded") // reference strips
    assert(deaccentLower(null) == null)
  }

  test("nfc composes combining marks, is idempotent, and passes nulls") {
    assert(nfc("Café") == "Café") // e + acute -> é
    assert(nfc("über") == "über") // u + diaeresis -> ü
    assert(nfc("Café") == "Café") // already composed: unchanged
    assert(nfc(nfc("ÅB́")) == nfc("ÅB́"))
    assert(nfc("") == "" && nfc(null) == null)
    // the dedup motivation: decomposed and composed forms digest apart
    // raw, together after NFC
    assert("Café" != "Café" && nfc("Café") == "Café")
  }

  test("normText (ER _norm) keeps non-decomposable chars as separators") {
    assert(normText("straße") == "stra e") // vs normalize_name's "strae"
    assert(normText("Café-Central!!") == "cafe central")
    assert(normText(null) == "")
  }

  test("normalizeName collapses punctuation and canonicalizes street tokens") {
    assert(normalizeName("Stephansplatz  1!!") == "stephansplatz 1")
    assert(normalizeName("  Caffè--Römer ") == "caffe romer")
    // the str. rule has NO leading word boundary: suffix abbreviations too
    assert(normalizeName("Hauptstr. 5") == "hauptstrasse 5")
    assert(normalizeName("Haupt Str. 5") == "haupt strasse 5")
    // ascii-fold drops ß before the street rule can see "strasse"
    assert(normalizeName("straße") == "strae")
    // the pl. rule DOES keep its leading \b (only str. lacks one):
    // suffix "…pl." is untouched, standalone "Pl." canonicalizes
    assert(normalizeName("Rathauspl. 1") == "rathauspl 1")
    assert(normalizeName("Rathaus Pl. 1") == "rathaus platz 1")
  }

  test("normName mints reference canonical-id slugs (keeps .,:_ / drops accents)") {
    assert(normName("St. Stephen's Cathedral") == "st.-stephens-cathedral")
    assert(normName("Café Central") == "caf-central") // é dropped, not folded
    assert(normName("  Old   Town  ") == "old-town")
    assert(normName("a" * 300).length == 120)
    assert(normName(null) == "")
  }

  test("slug mints stable ids") {
    assert(slug("St. Stephen's Cathedral") == "st-stephen-s-cathedral")
    assert(slug("   --x--   ") == "x")
    assert(slug("a" * 300).length == 120)
  }

  test("stemTokens applies crude plural stemming, min length 3") {
    assert(stemTokens("the berries and cafes in towns") ==
      Seq("the", "berry", "and", "caf", "town"))
    // es-rule fires at len > 3 (reference): "goes" -> "go", "axes" -> "ax"
    assert(stemTokens("goes axes") == Seq("go", "ax"))
    assert(stemTokens("ties") == Seq("ti")) // len 4: es-rule, not ies-rule
  }

  test("content-token pair features match the reference helpers") {
    // stopwords removed, stems applied ("bridges" -es -> "bridg")
    assert(contentTokens("The Old Stone Bridges") == Set("stone", "bridg"))
    assert(contentJaccard("Stone Bridge Park", "Old Stone Bridge") == 2.0 / 3)
    assert(contentJaccard("The Old", "Stone") == 0.0) // empty side -> 0
    assert(hasSubstring("The Rathaus", "Rathaus Tower"))
    assert(!hasSubstring("ab", "ab cd")) // min length 3 on the shorter join
    assert(typeOverlap("Charles Bridge", "Old Bridge Tavern"))
    assert(!typeOverlap("Cafe Central", "Central Cafe")) // no GENERIC token
    assert(isAreal("Main Square") && !isAreal("Cafe Central"))
  }

  // pinned rapidfuzz-parity cases (InDel ratio = 2*LCS/(|a|+|b|))
  test("ratio matches InDel semantics") {
    assert(ratio("abc", "abc") == 1.0)
    assert(ratio("abc", "abd") == 2.0 * 2 / 6) // LCS "ab"
    assert(ratio("", "") == 1.0)
    assert(ratio("a", "") == 0.0)
    assert(math.abs(ratio("new york mets", "new york meats") - 26.0 / 27) < 1e-12)
  }

  test("tokenSortRatio is order-insensitive") {
    assert(tokenSortRatio("york new", "new york") == 1.0)
    assert(tokenSortRatio("a b", "b a") == 1.0)
  }

  test("tokenSetRatio ignores duplicated subset tokens") {
    assert(tokenSetRatio("mets vs braves", "braves vs mets") == 1.0)
    // subset relation with non-empty intersection -> 1.0 (rapidfuzz behavior)
    assert(tokenSetRatio("angels", "los angeles angels") == 1.0)
  }

  test("partialRatio finds best alignment incl. boundary overlaps") {
    assert(partialRatio("abc", "xxabcxx") == 1.0)
    assert(partialRatio("", "") == 1.0)
    assert(partialRatio("ab", "ab") == 1.0)
    // rapidfuzz alignments extend past the ends: the suffix overlap "bc"
    // (window of length 2) scores 2*2/5 = 0.8, beating every full-length
    // window (best "abc" vs "bcd" = 2*2/6)
    assert(partialRatio("bcd", "abc") == 0.8)
    assert(partialRatio("world", "hello world") == 1.0)
  }

  test("nameSimilarity is max of the three ratios over normalized names") {
    assert(nameSimilarity("Café Central", "cafe central") == 1.0)
    assert(nameSimilarity(null, "x") == 0.0)
    assert(nameSimilarity("Stephansdom", "St. Stephen's Cathedral") < 0.86)
  }

  test("erNameSimilarity blends token_set/token_sort/partial over _norm") {
    assert(erNameSimilarity("Explore Powder Tower", "Powder Tower") == 1.0)
    // é NFKD-decomposes, so _norm equalizes these
    assert(erNameSimilarity("Café Central", "Cafe Central") == 1.0)
    // ß does not — _norm yields "stra e" vs "strasse", similar but not equal
    val sZ = erNameSimilarity("straße", "strasse")
    assert(sZ > 0.0 && sZ < 1.0)
  }

  test("acceptPairAndSim applies the reference's banded rule") {
    // cross-source geometry-first band (er.py's own example shape)
    assert(acceptPairAndSim("Explore Powder Tower", "Powder Tower", 60, false)._1)
    // areal boost: type-hit pair accepted at 125 m, rejected past 130 m
    assert(acceptPairAndSim("Stone Bridge Park", "Old Stone Bridge", 125, false)._1)
    assert(!acceptPairAndSim("Stone Bridge Park", "Old Stone Bridge", 135, false)._1)
    // same-source tight bands
    assert(acceptPairAndSim("Hotel Sacher", "Hotel Sacher Wien", 22, true)._1)
    assert(acceptPairAndSim("Hotel Sacher", "Hotel Sacher Wien", 38, true)._1)
    assert(!acceptPairAndSim("Hotel Sacher", "Hotel Sacher Wien", 45, true)._1)
    // dissimilar nearby names never merge
    assert(!acceptPairAndSim("Plachutta", "Cafe Central", 10, true)._1)
    // sim is returned for the links export even on reject
    assert(acceptPairAndSim("Hotel Sacher", "Hotel Sacher Wien", 45, true)._2 == 1.0)
  }

  /** Independent textbook DP, the test's own oracle for levenshteinFast. */
  private def refLev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("levenshteinFast: pinned cases + bit-parallel == DP reference") {
    assert(levenshteinFast("kitten", "sitting") == 3)
    assert(levenshteinFast("", "abc") == 3)
    assert(levenshteinFast("abc", "") == 3)
    assert(levenshteinFast("same", "same") == 0)
    assert(levenshteinFast("straße", "strasse") == 2) // non-latin1 fallback? ß IS latin1 — bit path
    // > 64-char pattern takes the DP fallback
    val long1 = "x" * 70 + "abc"
    val long2 = "x" * 70 + "abd"
    assert(levenshteinFast(long1, long2) == 1)
    // non-latin1 fallback
    assert(levenshteinFast("日本語", "日本") == 1)
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      levenshteinFast(a, b) == refLev(a, b)
    })
    // 64-char boundary patterns (last-bit arithmetic edge)
    check(Prop.forAll(Gen.listOfN(64, Gen.alphaChar).map(_.mkString),
      Gen.listOfN(66, Gen.alphaChar).map(_.mkString)) { (a, b) =>
      levenshteinFast(a, b) == refLev(a, b)
    })
    // latin1 high range (128..255) still takes the bit-parallel path —
    // the Peq table covers it, so it needs its own coverage
    val latin1 = Gen.listOf(Gen.choose(32.toChar, 255.toChar)).map(_.mkString)
    check(Prop.forAll(latin1, latin1) { (a, b) =>
      levenshteinFast(a, b) == refLev(a, b)
    })
  }

  test("ratio properties: symmetry, bounds, identity") {
    check(Prop.forAll(Gen.alphaNumStr, Gen.alphaNumStr) { (a: String, b: String) =>
      val r = ratio(a, b)
      r >= 0.0 && r <= 1.0 && math.abs(r - ratio(b, a)) < 1e-12 &&
        ratio(a, a) == 1.0
    })
  }

  test("tokenSetRatio bounds") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.asciiPrintableStr) { (a, b) =>
      val r = tokenSetRatio(a, b)
      r >= 0.0 && r <= 1.0
    })
  }

  test("kernels match the committed ground-truth fixture " +
    "(independent definitional implementation, 100 pairs)") {
    // src/test/resources/fuzzy_ground_truth.tsv is generated by
    // tools/gen_fuzzy_fixture.py — an LCS-DP / brute-force-window /
    // literal-formula implementation written independently of these
    // kernels, so shared bugs can't self-confirm. Pairs cluster around
    // the ER acceptance bands plus boundary/degenerate shapes.
    val in = getClass.getResourceAsStream("/fuzzy_ground_truth.tsv")
    assert(in != null, "fixture missing from test resources")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().drop(1).toSeq
    assert(lines.size == 100)
    lines.foreach { line =>
      val f = line.split("\t", -1)
      val (a, b) = (f(0), f(1))
      def close(got: Double, want: String, what: String): Unit =
        assert(math.abs(got - want.toDouble) < 1e-9,
          s"$what('$a', '$b') = $got, fixture says $want")
      close(ratio(a, b), f(2), "ratio")
      close(partialRatio(a, b), f(3), "partialRatio")
      close(tokenSortRatio(a, b), f(4), "tokenSortRatio")
      close(tokenSetRatio(a, b), f(5), "tokenSetRatio")
    }
  }
}
