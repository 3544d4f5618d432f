package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.operators.Dedup

/** The standing-index maintenance contract: compaction defragments the
  * bucketed index (and optionally ages rows out) WITHOUT changing what a
  * probe sees for the retained population, and the rewritten table keeps
  * the exchange-free probe layout. */
class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private val near = "the quick brown fox jumps over the lazy dog tonight"

  private def canon(tbl: String): Set[(Long, Int, String, String)] =
    spark.table(tbl)
      .select(col("id"), col("band"), col("bucket").cast("string"),
        col("sig").cast("string").as("s"))
      .as[(Long, Int, String, String)].collect().toSet

  private def probePairs(tbl: String): Set[(Long, Long, String)] = {
    val probe = Seq((999L, near)).toDF("doc_id", "text")
    Dedup.incrementalMinHash(spark.table(tbl), probe, "doc_id", "text",
        simThreshold = 0.25)
      .select("a_id", "b_id", "kind")
      .as[(Long, Long, String)].collect().toSet
  }

  test("compactIndex: fragments collapse to <= numBuckets, rows and probe " +
    "results unchanged; TTL drops aged ids from probes; bucketed " +
    "exchange-free layout survives the rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val tbl = "compaction_spec_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val base = Seq(
      (1L, near),
      (2L, "a completely different sentence about spark physical plans"),
      (3L, "the quick brown fox jumps over the lazy dog at dawn"))
      .toDF("doc_id", "text")
    Dedup.writeMinHashIndex(Dedup.minHashIndex(base, "doc_id", "text"),
      tbl, s"$dir/index")

    // four micro-batch appends fragment the table (>= one file per
    // nonempty bucket per append)
    for (k <- 0 until 4) {
      val b = Seq(
        (100L + k, s"filler sentence number $k about nothing in particular"),
        (200L + k, near)).toDF("doc_id", "text")
      IncrementalIngest.ingestBatch(b,
        Dedup.minHashIndex(_, "doc_id", "text"),
        Dedup.incrementalMinHashBuckets(_, _, 16, 0.25),
        tbl, s"$dir/out", k)
    }
    val fragsBefore = IncrementalIngest.indexFragments(spark, tbl)
    assert(fragsBefore > 8, s"fixture should be fragmented: $fragsBefore")
    val rowsBefore = canon(tbl)
    val pairsBefore = probePairs(tbl)
    assert(pairsBefore.exists(_._1 == 200L), pairsBefore.toString)

    // pure compaction: same rows, same probe pairs, <= numBuckets files
    IncrementalIngest.compactIndex(spark, tbl, s"$dir/index_c1")
    val fragsAfter = IncrementalIngest.indexFragments(spark, tbl)
    assert(fragsAfter <= 8 && fragsAfter < fragsBefore,
      s"$fragsBefore -> $fragsAfter")
    assert(canon(tbl) == rowsBefore)
    assert(probePairs(tbl) == pairsBefore)

    // appends still work after the swap (insertInto against the renamed
    // table), and the probe sees them
    IncrementalIngest.ingestBatch(Seq((300L, near)).toDF("doc_id", "text"),
      Dedup.minHashIndex(_, "doc_id", "text"),
      Dedup.incrementalMinHashBuckets(_, _, 16, 0.25),
      tbl, s"$dir/out", 4L)
    assert(probePairs(tbl).exists(_._1 == 300L))

    // TTL compaction: age out every streamed id (>= 100); the retained
    // population probes identically, aged ids never pair again
    IncrementalIngest.compactIndex(spark, tbl, s"$dir/index_c2",
      retain = col("id") < 100)
    val pairsTtl = probePairs(tbl)
    assert(pairsTtl == pairsBefore.filter(_._1 < 100), pairsTtl.toString)
    assert(spark.table(tbl).where(col("id") >= 100).count() == 0)

    // the rewritten table still probes with ZERO exchange on the index
    // side (the dd_incremental_bucketed contract)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      val probe = Dedup.minHashIndex(Seq((999L, near)).toDF("doc_id", "text"),
        "doc_id", "text")
      val joined = spark.table(tbl)
        .select(col("band"), col("bucket"), col("id").as("a_id"))
        .join(probe.select(col("band"), col("bucket"), col("id").as("b_id")),
          Seq("band", "bucket"))
      joined.collect()
      val smj = joined.queryExecution.executedPlan.collectFirst {
        case s: SortMergeJoinExec => s
      }.getOrElse(fail("expected a SortMergeJoin"))
      assert(smj.left.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        smj.left.toString.take(3000))
    }
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("compactIndex path hygiene: refuses the live path, a reused dirty " +
    "path cannot resurrect aged-out rows, and a DROP-to-RENAME crash " +
    "recovers on the next compact or ingest entry") {
    val dir = java.nio.file.Files.createTempDirectory("compact_hy").toString
    val tbl = "compaction_hygiene_index"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val base = Seq((1L, near), (150L, near))
      .toDF("doc_id", "text")
    Dedup.writeMinHashIndex(Dedup.minHashIndex(base, "doc_id", "text"),
      tbl, s"$dir/gen0")
    val rows0 = canon(tbl)

    // the live location is refused up-front, everything intact
    val err = intercept[IllegalArgumentException] {
      IncrementalIngest.compactIndex(spark, tbl, s"$dir/gen0")
    }
    assert(err.getMessage.contains("FRESH"))
    assert(canon(tbl) == rows0)

    // age id 150 out into gen1...
    IncrementalIngest.compactIndex(spark, tbl, s"$dir/gen1",
      retain = col("id") < 100)
    assert(canon(tbl) == rows0.filter(_._1 < 100))
    // ...then compact BACK onto gen0, whose files still hold id 150:
    // the overwrite-mode rewrite must clear them, not merge them in
    IncrementalIngest.compactIndex(spark, tbl, s"$dir/gen0")
    assert(canon(tbl) == rows0.filter(_._1 < 100),
      "stale files at a reused path must not resurrect aged-out rows")

    // crash window: rewrite landed fully in _compacting, live dropped,
    // rename never ran — the next ingest recovers and folds normally
    spark.table(tbl).localCheckpoint(true)
      .write.mode("overwrite").format("parquet")
      .option("path", s"$dir/gen2")
      .bucketBy(8, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(tbl + "_compacting")
    spark.sql(s"DROP TABLE $tbl")
    IncrementalIngest.ingestBatch(Seq((300L, near)).toDF("doc_id", "text"),
      Dedup.minHashIndex(_, "doc_id", "text"),
      Dedup.incrementalMinHashBuckets(_, _, 16, 0.25),
      tbl, s"$dir/out", 0L)
    assert(spark.catalog.tableExists(tbl) &&
      !spark.catalog.tableExists(tbl + "_compacting"))
    assert(probePairs(tbl).exists(_._1 == 300L))
    // a crashed swap found by compactIndex itself just completes the
    // rename (no rewrite happens on the recovery call)
    spark.table(tbl).localCheckpoint(true)
      .write.mode("overwrite").format("parquet")
      .option("path", s"$dir/gen3")
      .bucketBy(8, "band", "bucket").sortBy("band", "bucket")
      .saveAsTable(tbl + "_compacting")
    spark.sql(s"DROP TABLE $tbl")
    IncrementalIngest.compactIndex(spark, tbl, s"$dir/gen4")
    assert(spark.catalog.tableExists(tbl))
    assert(CatalogSwap.tableLocation(spark, tbl).endsWith("gen3"))
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }
}
