package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Product-quantization contracts: deterministic training, exactness on
  * codebook-aligned data, the empty-cell rule, and rank agreement with
  * brute force when quantization is lossless. */
class PqSpec extends SparkTestBase {
  import spark.implicits._

  // 2 subspaces x 4 dims; per subspace 4 prototypes far apart
  private def proto(s: Int, c: Int): Seq[Float] =
    (0 until 4).map(d => (c * 10 + s * 2 + (if (d == c % 4) 1 else 0)).toFloat)

  // corpus vectors sit EXACTLY on prototype combinations; the Latin-
  // square layout makes the seed rows (ids 0..3) cover all 4 prototypes
  // in BOTH subspaces (c1(id) = id for id < 4)
  private val corpus = (0L to 15L).map { id =>
    val c0 = (id % 4).toInt
    val c1 = ((id + id / 4) % 4).toInt
    (id, proto(0, c0) ++ proto(1, c1))
  }

  test("training on codebook-aligned data recovers the prototypes, ADC " +
    "equals exact distance, ranks match brute force") {
    val emb = corpus.toDF("vec_id", "embedding")
    val model = Similarity.pqTrain(emb, "vec_id", "embedding",
      m = 2, kc = 4, iters = 2)
    // every centroid is exactly a prototype (cluster means of identical
    // members), up to the seed-order code labeling
    for (s <- 0 until 2; c <- 0 until 4)
      assert(model(s)(c).toSeq == proto(s, c).map(_.toDouble),
        s"s=$s c=$c got ${model(s)(c).toSeq}")

    // a query OFF the prototypes: ADC vs each corpus vector equals the
    // true squared distance because corpus rows quantize losslessly
    val query = Seq((100L, (0 until 8).map(d => 0.5f + d))).toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(emb, query, "vec_id", "vec_id", "embedding",
        k = 16, m = 2, kc = 4, iters = 2)
      .select("c_id", "adist", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    val qv = (0 until 8).map(d => 0.5 + d)
    val exact = corpus.map { case (id, v) =>
      id -> v.zip(qv).map { case (x, y) => (x - y) * (x - y) }.sum
    }.sortBy { case (id, d) => (d, id) }
    assert(got.map(_._1).toSeq == exact.map(_._1), s"$got vs $exact")
    got.zip(exact).foreach { case ((_, adist, _), (_, d)) =>
      assert(math.abs(adist - d) < 1e-6, s"adist $adist vs exact $d") }
  }

  test("an emptied cell keeps its previous centroid instead of vanishing") {
    // all four seeds share ONE subspace-1 prototype: seeds 1..3 tie with
    // code 0 at distance zero and assign there (smaller code wins), so
    // cells (1,1..3) empty on the refinement — they must keep their seed
    // centroid, not vanish or zero out
    val rows = (0L to 7L).map { id =>
      (id, proto(0, (id % 4).toInt) ++ proto(1, 0))
    }
    val model = Similarity.pqTrain(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", m = 2, kc = 4, iters = 2)
    for (c <- 1 to 3)
      assert(model(1)(c).toSeq == proto(1, 0).map(_.toDouble),
        s"cell (1,$c): ${model(1)(c).toSeq}")
    // subspace 0 trains normally
    for (c <- 0 to 3)
      assert(model(0)(c).toSeq == proto(0, c).map(_.toDouble))
  }

  test("ivfPqTopK: candidates come only from probed cells; residual ADC " +
    "is exact when residuals sit on the codebook; deterministic") {
    import org.apache.spark.sql.DataFrame
    // 2 orthogonal (non-zero — cosine routing needs direction) cells;
    // corpus = cell centroid + a small prototype residual
    val cellVec = Map(
      100L -> (Seq.fill(4)(10f) ++ Seq.fill(4)(0f)),
      101L -> (Seq.fill(4)(0f) ++ Seq.fill(4)(10f)))
    val cents = cellVec.toSeq.map { case (id, v) => (id, v) }
      .toDF("vec_id", "embedding")
    val corpus = (0L to 15L).map { id =>
      val cell = if (id % 2 == 0) 100L else 101L
      val r = proto(0, (id % 4).toInt) ++ proto(1, ((id + id / 4) % 4).toInt)
      (id, cellVec(cell).zip(r).map { case (c, x) => c + x * 0.01f })
    }
    val emb = corpus.toDF("vec_id", "embedding")
    val query = Seq((999L, cellVec(100L).map(_ + 0.5f)))
      .toDF("vec_id", "embedding")
    def run(): Seq[(Long, Long, Double, Int)] =
      Similarity.ivfPqTopK(emb, query, "vec_id", "vec_id", "embedding",
          cents, "vec_id", "embedding",
          k = 16, nProbe = 1, m = 2, kc = 4, iters = 2)
        .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    val got = run()
    // nProbe=1 and the query sits at cell 100: only even ids can appear
    assert(got.nonEmpty && got.forall(_._2 % 2 == 0), got.toString)
    assert(run() == got) // deterministic
  }

  test("ivfPqRerank: final ranks are EXACT cosine over the ADC shortlist, " +
    "candidates stay within probed cells, deterministic") {
    val cellVec = Map(
      100L -> (Seq.fill(4)(10f) ++ Seq.fill(4)(0f)),
      101L -> (Seq.fill(4)(0f) ++ Seq.fill(4)(10f)))
    val cents = cellVec.toSeq.toDF("vec_id", "embedding")
    val corpus = (0L to 15L).map { id =>
      val cell = if (id % 2 == 0) 100L else 101L
      val r = proto(0, (id % 4).toInt) ++ proto(1, ((id + id / 4) % 4).toInt)
      (id, cellVec(cell).zip(r).map { case (c, x) => c + x * 0.01f })
    }
    val emb = corpus.toDF("vec_id", "embedding")
    val qv = cellVec(100L).map(_ + 0.5f)
    val query = Seq((999L, qv)).toDF("vec_id", "embedding")
    def run(): Seq[(Long, Long, Double, Int)] =
      Similarity.ivfPqRerank(emb, query, "vec_id", "vec_id", "embedding",
          cents, "vec_id", "embedding",
          k = 3, shortlist = 6, nProbe = 1, m = 2, kc = 4, iters = 2)
        .as[(Long, Long, Double, Int)].collect().sortBy(_._4).toSeq
    val got = run()
    assert(got.size == 3 && got.forall(_._2 % 2 == 0), got.toString)
    // the contract: top-3 by EXACT cosine over the 6-candidate shortlist
    val short = Similarity.ivfPqTopK(emb, query, "vec_id", "vec_id",
        "embedding", cents, "vec_id", "embedding",
        k = 6, nProbe = 1, m = 2, kc = 4, iters = 2)
      .select("c_id").as[Long].collect().toSet
    val byId = corpus.toMap
    val expect = short.toSeq
      .map(id => id -> Similarity.cosineKernel(byId(id), qv))
      .sortBy { case (id, cos) => (-cos, id) }.take(3)
    got.zip(expect).foreach { case ((_, cid, cos, _), (eid, ecos)) =>
      assert(cid == eid, s"$got vs $expect")
      assert(math.abs(cos - ecos) < 1e-6, s"cos $cos vs $ecos")
    }
    assert(run() == got) // deterministic
  }

  test("pqTopK is deterministic across runs") {
    val emb = corpus.toDF("vec_id", "embedding")
    val query = Seq((100L, (0 until 8).map(_.toFloat))).toDF("vec_id", "embedding")
    def run() = Similarity.pqTopK(emb, query, "vec_id", "vec_id",
        "embedding", k = 5, m = 2, kc = 4, iters = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(run() == run())
  }
}
