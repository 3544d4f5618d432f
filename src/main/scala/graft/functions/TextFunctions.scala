package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text normalization + similarity kernel.
  *
  * Column-expression forms are preferred (codegen'd); JVM kernels back the
  * few genuinely non-expressible pieces (NFKD deaccent, fuzzy ratios) as
  * UDFs. Re-expresses the reference's text stack:
  * deaccent/normalize `/root/reference/etl/utils.py:12-13,68-77`,
  * slug `/root/reference/etl/er.py:30-34`, tokenizer/stemmer
  * `/root/reference/etl/er.py:54-65`, stopwords `/root/reference/etl/er.py:15-27`,
  * rapidfuzz ratios `/root/reference/etl/utils.py:79-87` +
  * `/root/reference/etl/er.py:92-100`.
  */
object TextFunctions {

  // ---------------------------------------------------------------- kernels

  /** NFKD normalize, strip combining marks, lowercase (reference `_deaccent_lower`). */
  def deaccentLower(s: String): String = {
    if (s == null) return null
    val n = Normalizer.normalize(s, Normalizer.Form.NFKD)
    n.replaceAll("\\p{M}+", "").toLowerCase
  }

  /** Reference `normalize_name` (`etl/utils.py:68-77`): deaccent+lower,
    * German street-token canonicalization, collapse non-alnum runs to single
    * spaces, trim. */
  def normalizeName(s: String): String = {
    if (s == null) return null
    var t = deaccentLower(s)
    t = t.replaceAll("\\bstr\\.", "strasse").replaceAll("\\bpl\\.", "platz")
    t = t.replaceAll("[^a-z0-9]+", " ").trim
    t
  }

  /** Reference `norm_name` ID slug (`etl/er.py:30-34`): lower, runs of
    * non-alnum to '-', trim '-', truncate to 120. */
  def slug(s: String): String = {
    if (s == null) return null
    val t = deaccentLower(s).replaceAll("[^a-z0-9]+", "-")
      .replaceAll("^-+|-+$", "")
    t.substring(0, math.min(120, t.length))
  }

  /** Tokens >= 3 chars with the reference's crude plural stem
    * (`etl/er.py:54-65`): ies->y, es->"", s->"". */
  def stemTokens(s: String): Seq[String] = {
    if (s == null) return Seq.empty
    normalizeName(s).split(" ").iterator.filter(_.length >= 3).map { t =>
      if (t.endsWith("ies") && t.length > 4) t.dropRight(3) + "y"
      else if (t.endsWith("es") && t.length > 4) t.dropRight(2)
      else if (t.endsWith("s") && t.length > 3) t.dropRight(1)
      else t
    }.toSeq
  }

  // ------------------------------------------------- fuzzy similarity kernel

  /** Longest common subsequence length (iterative DP, two rows). */
  private def lcsLen(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val (s, t) = if (a.length >= b.length) (a, b) else (b, a)
    val prev = new Array[Int](t.length + 1)
    val cur = new Array[Int](t.length + 1)
    var i = 0
    while (i < s.length) {
      var j = 0
      while (j < t.length) {
        cur(j + 1) =
          if (s.charAt(i) == t.charAt(j)) prev(j) + 1
          else math.max(prev(j + 1), cur(j))
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, t.length + 1)
      i += 1
    }
    prev(t.length)
  }

  /** rapidfuzz `ratio` semantics: normalized InDel similarity in [0,1].
    * InDel distance = |a|+|b|-2*LCS; ratio = 1 - dist/(|a|+|b|) = 2*LCS/(|a|+|b|). */
  def ratio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val tot = a.length + b.length
    if (tot == 0) return 1.0
    2.0 * lcsLen(a, b) / tot
  }

  /** rapidfuzz `partial_ratio` approximation: best `ratio` of the shorter
    * string against every same-length window of the longer string. */
  def partialRatio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 1.0 else 0.0
    if (s.length == l.length) return ratio(s, l)
    var best = 0.0
    var i = 0
    while (i <= l.length - s.length && best < 1.0) {
      val r = ratio(s, l.substring(i, i + s.length))
      if (r > best) best = r
      i += 1
    }
    best
  }

  private def sortedTokens(s: String): Array[String] =
    normalizeName(s).split(" ").filter(_.nonEmpty).sorted

  /** rapidfuzz `token_sort_ratio`: ratio over space-joined sorted tokens. */
  def tokenSortRatio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    ratio(sortedTokens(a).mkString(" "), sortedTokens(b).mkString(" "))
  }

  /** rapidfuzz `token_set_ratio`: max ratio over
    * (intersection, intersection+restA, intersection+restB) renderings. */
  def tokenSetRatio(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val ta = sortedTokens(a)
    val tb = sortedTokens(b)
    val setA = ta.toSet
    val setB = tb.toSet
    val inter = (setA & setB).toArray.sorted
    val diffA = (setA -- setB).toArray.sorted
    val diffB = (setB -- setA).toArray.sorted
    val s0 = inter.mkString(" ")
    val s1 = (inter ++ diffA).mkString(" ")
    val s2 = (inter ++ diffB).mkString(" ")
    if (s0.nonEmpty && (diffA.isEmpty || diffB.isEmpty)) return 1.0
    math.max(ratio(s0, s1), math.max(ratio(s0, s2), ratio(s1, s2)))
  }

  /** Reference `name_similarity` (`etl/utils.py:79-87`): max of
    * token_set_ratio, QRatio (plain InDel ratio over normalized strings),
    * and token_sort_ratio over normalized names. */
  def nameSimilarity(a: String, b: String): Double = {
    if (a == null || b == null) return 0.0
    val na = normalizeName(a)
    val nb = normalizeName(b)
    if (na.isEmpty || nb.isEmpty) return 0.0
    math.max(tokenSetRatio(na, nb), math.max(tokenSortRatio(na, nb), ratio(na, nb)))
  }

  // ------------------------------------------------------------------ UDFs

  val deaccentLowerUdf = udf(deaccentLower _)
  val normalizeNameUdf = udf(normalizeName _)
  val slugUdf = udf(slug _)
  val stemTokensUdf = udf(stemTokens _)
  val ratioUdf = udf(ratio _)
  val partialRatioUdf = udf(partialRatio _)
  val tokenSortRatioUdf = udf(tokenSortRatio _)
  val tokenSetRatioUdf = udf(tokenSetRatio _)
  val nameSimilarityUdf = udf(nameSimilarity _)

  // ------------------------------------------------- column-expression forms

  /** Simple whitespace tokenizer as a column expr (codegen'd). */
  def tokensCol(c: Column): Column =
    split(trim(regexp_replace(lower(c), "[^a-z0-9]+", " ")), " ")

  /** Jaccard similarity of two array columns (reference `etl/utils.py:95-100`). */
  def jaccardCol(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, 0.0).otherwise(inter / uni)
  }

  /** A cheap, fully-codegen'd name-similarity proxy for oracle-checkable
    * fuzzy joins: 1 - levenshtein/maxlen. (The UDF kernel above carries the
    * rapidfuzz-parity semantics; this column form is used where the plan
    * must stay whole-stage-codegen or the oracle must reproduce it.) */
  def levRatioCol(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b)).cast("double")

  /** SHA1 composite ID over ''-joined parts (reference
    * `etl/reviews_jsonl.py:39-46` — byte-parity with None->"" handled by
    * coalescing inputs before the call). */
  def sha1Id(parts: Column*): Column =
    sha1(concat_ws("\u001f", parts.map(p => coalesce(p, lit(""))): _*))
}
