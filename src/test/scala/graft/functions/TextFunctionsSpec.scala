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

  test("deaccentLower strips marks and lowercases") {
    assert(deaccentLower("Café Ñandú") == "cafe nandu")
    assert(deaccentLower("Müller-Straße") == "muller-strasse" ||
      deaccentLower("Müller-Straße") == "muller-straße")
    assert(deaccentLower(null) == null)
  }

  test("normalizeName collapses punctuation and canonicalizes street tokens") {
    assert(normalizeName("Stephansplatz  1!!") == "stephansplatz 1")
    assert(normalizeName("  Caffè--Römer ") == "caffe romer")
  }

  test("slug mints stable ids") {
    assert(slug("St. Stephen's Cathedral") == "st-stephen-s-cathedral")
    assert(slug("   --x--   ") == "x")
    assert(slug("a" * 300).length == 120)
  }

  test("stemTokens applies crude plural stemming, min length 3") {
    assert(stemTokens("the berries and cafes in towns") ==
      Seq("the", "berry", "and", "caf", "town"))
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

  test("partialRatio finds best substring window") {
    assert(partialRatio("abc", "xxabcxx") == 1.0)
    assert(partialRatio("", "") == 1.0)
    assert(partialRatio("ab", "ab") == 1.0)
  }

  test("nameSimilarity is max of the three ratios over normalized names") {
    assert(nameSimilarity("Café Central", "cafe central") == 1.0)
    assert(nameSimilarity(null, "x") == 0.0)
    assert(nameSimilarity("Stephansdom", "St. Stephen's Cathedral") < 0.86)
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
}
