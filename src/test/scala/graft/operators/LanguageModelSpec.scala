package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Pins the interpolated-KN bigram model against hand-computed
  * probabilities on a tiny corpus, plus the structural contracts the
  * registry rows rely on (short-doc exclusion, OOV totality, bucket
  * labeling, determinism across partitionings). */
class LanguageModelSpec extends SparkTestBase {
  import spark.implicits._

  // Train docs (ids 1..3), test doc (id 4, scored under the model
  // trained on 1..3 — id % 4 != 0 is the registry's split too).
  private val docs = Seq(
    (1L, "the cat sat"),
    (2L, "the cat ran"),
    (3L, "a dog sat"),
    (4L, "the cat sat zz")
  ).toDF("doc_id", "text")

  test("hand-computed KN probabilities on a tiny corpus") {
    // Training bigrams: (the,cat) x2, (cat,sat), (cat,ran), (a,dog),
    // (dog,sat): Ntypes = 5 distinct pairs, V = 7 distinct train tokens
    // {the,cat,sat,ran,a,dog} -> wait: {the,cat,sat,ran,a,dog} = 6.
    // Pcont(w2) = (n1r(w2)+1)/(5+6+1) with n1r: cat<-{the}=1,
    // sat<-{cat,dog}=2, ran<-{cat}=1, dog<-{a}=1.
    val out = LanguageModel.knLogPerplexity(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(4)) =!= 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val D = 0.75
    def pcont(n1r: Long) = (n1r + 1.0) / (5 + 6 + 1)
    // doc 1 "the cat sat": P(cat|the) with c(the,*)=2 rows? c(the)=2,
    // n1f(the)=1; P = (2-D)/2 + D*1/2 * pcont(1)
    val pCatGivenThe = (2 - D) / 2 + D * 1 / 2 * pcont(1)
    // P(sat|cat): c(cat)=2, n1f(cat)=2, c(cat,sat)=1
    val pSatGivenCat = (1 - D) / 2 + D * 2 / 2 * pcont(2)
    val exp1 = math.rint(((-math.log(pCatGivenThe) - math.log(pSatGivenCat)) / 2)
      * 1e6) / 1e6
    assert(math.abs(out(1L) - exp1) < 1e-9)

    // doc 4 "the cat sat zz": zz is OOV -> P(zz|sat): c(sat)=0 (sat is
    // never a context) -> backoff Pcont(zz) = (0+1)/12.
    val pZzGivenSat = pcont(0)
    val exp4 = math.rint((
      (-math.log(pCatGivenThe) - math.log(pSatGivenCat)
        - math.log(pZzGivenSat)) / 3) * 1e6) / 1e6
    assert(math.abs(out(4L) - exp4) < 1e-9)
  }

  test("docs with fewer than 2 tokens emit no row; OOV stays total") {
    val d2 = docs.union(Seq((5L, "solo"), (8L, ""),
      (9L, "zz qq ww")).toDF("doc_id", "text"))
    val out = LanguageModel.knLogPerplexity(d2, "doc_id", "text",
      pmod(col("doc_id"), lit(4)) =!= 0)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(5L) && !ids.contains(8L))
    // all-OOV doc scores finite (every bigram falls to the OOV floor)
    val v9 = out.where(col("doc_id") === 9).select("logppl")
      .as[Double].head()
    assert(!v9.isNaN && !v9.isInfinite && v9 > 0)
  }

  test("buckets: terciles label head/middle/tail monotonically") {
    val scored = (1L to 9L).map(i => (i, i.toDouble)).toDF("doc_id", "logppl")
    val b = LanguageModel.perplexityBuckets(scored)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // cuts at percentile 1/3 and 2/3 of 1..9: t1 = 3.6667 -> docs 1-3
    // head (wait 3 <= 3.667 yes, 4 > 3.667), t2 = 6.333 -> 4..6 middle
    assert((1L to 3L).forall(b(_) == "head"))
    assert((4L to 6L).forall(b(_) == "middle"))
    assert((7L to 9L).forall(b(_) == "tail"))
  }

  test("trigram KN: hand-computed recursive backoff on a tiny corpus") {
    // train (id % 4 != 0): "a b c", "a b d", "x a b c"; test doc 4
    val d3 = Seq((1L, "a b c"), (2L, "a b d"), (3L, "x a b c"),
      (4L, "a b c"), (8L, "q q z")).toDF("doc_id", "text")
    val got = LanguageModel.kn3LogPerplexity(d3, "doc_id", "text",
        pmod(col("doc_id"), lit(4)) =!= 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val D = 0.75
    // model: tc3 (a,b,c)=2 (a,b,d)=1 (x,a,b)=1; cc3(a,b)=(3,2);
    // b2 ckn (b,c)=1 (b,d)=1 (a,b)=1; z2(b)=(2,2) z2(a)=(1,1);
    // bc (a,b)=3 (b,c)=2 (b,d)=1 (x,a)=1 -> ntypes2=4; V=5;
    // cont1: a=1 b=1 c=1 d=1
    def pcont(n1r: Long) = (n1r + 1.0) / (4 + 5 + 1)
    val p2cGivenB = (1 - D) / 2 + D * 2 / 2 * pcont(1)
    val p3 = (2 - D) / 3 + D * 2 / 3 * p2cGivenB
    val exp4 = math.rint(-math.log(p3) * 1e6) / 1e6
    assert(math.abs(got(4L) - exp4) < 1e-9, s"got ${got.get(4L)}, want $exp4")
    // all-OOV trigrams (q,q,z): context (q,q) unseen AND mid q unseen
    // -> pc(z) = (0+1)/10; finite, positive
    val exp8 = math.rint(-math.log(pcont(0)) * 1e6) / 1e6
    assert(math.abs(got(8L) - exp8) < 1e-9, s"got ${got.get(8L)}")
  }

  test("scores are partitioning-invariant") {
    val a = LanguageModel.knLogPerplexity(docs, "doc_id", "text",
      pmod(col("doc_id"), lit(4)) =!= 0).collect().toSet
    val b = LanguageModel.knLogPerplexity(docs.repartition(7), "doc_id",
      "text", pmod(col("doc_id"), lit(4)) =!= 0).collect().toSet
    assert(a.map(r => (r.getLong(0), r.getDouble(1))) ===
      b.map(r => (r.getLong(0), r.getDouble(1))))
  }
}
