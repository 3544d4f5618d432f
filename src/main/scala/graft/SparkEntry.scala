package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.er.EntityResolution
import graft.functions.GeoFunctions
import graft.functions.TextFunctions
import graft.functions.UrlFunctions
import graft.operators._
import graft.sources.Sources
import graft.staging.CityAssignment

/** Driver contract: the full operator inventory of SURVEY.md §2, each
  * re-expressed Spark-first over the driver's synthetic tables, with a
  * DuckDB-equivalent oracle where SQL can express the semantics.
  *
  * Engine-parity discipline (so results hash-match the DuckDB oracle):
  *  - every double output is `round(x, n)`;
  *  - derived randomness comes from md5 (identical in both engines), never
  *    from engine-specific hash functions;
  *  - bit math is div/mod arithmetic (no shift-by-column);
  *  - no doubles cast to strings, no raw timestamps in outputs.
  */
object SparkEntry {

  // ------------------------------------------------------------- utilities

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Shared build-once-per-sf-dir /tmp fixture machinery for
    * [[videoFixture]] / [[knnStanding]]: a VERSION marker guards reuse
    * across JVMs, and the build PUBLISHES ATOMICALLY — it writes into a
    * process-unique temp directory, stamps the marker inside, and
    * renames over the target, so a concurrent Bench/Verify JVM either
    * sees a complete stamped fixture or none (the old overwrite-in-place
    * build could serve a half-written parquet to a racing reader). If a
    * racing builder wins the rename, the loser keeps the winner's copy
    * (same version string ⇒ identical bytes by determinism) and discards
    * its own. */
  private[graft] def buildFixtureOnce(path: String, version: String)
                                     (build: String => Unit): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(path)
    def fresh = {
      val marker = dir.resolve("VERSION")
      Files.exists(marker) && Files.readString(marker) == version
    }
    if (fresh) return
    val tmp = Paths.get(path + ".build." +
      java.util.UUID.randomUUID().toString.take(8))
    build(tmp.toString)
    Files.writeString(tmp.resolve("VERSION"), version)
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (Files.exists(p))
        Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(Files.deleteIfExists(_))
    }
    // re-check: a racing builder of the SAME version may have published
    // while this one built — keep theirs (identical bytes by
    // determinism), never delete a live published fixture
    if (fresh) { rmTree(tmp); return }
    rmTree(dir) // stale layout (old version / legacy in-place build)
    try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileSystemException if fresh => rmTree(tmp)
    }
  }

  /** size+mtime fingerprint of a source table's parquet (file or
    * directory of part files) — folded into fixture version strings so
    * testdata regenerated IN PLACE rebuilds the fixture instead of
    * silently serving state derived from the old data (the oracle would
    * catch that as a confusing hash mismatch; this catches it as a
    * rebuild). */
  private def tableFingerprint(dir: String, table: String): String = {
    val f = new java.io.File(s"$dir/$table.parquet")
    if (f.isDirectory) {
      val parts = f.listFiles()
      s"d${parts.length}:${parts.map(p => p.length + p.lastModified).sum}"
    } else s"f${f.length}:${f.lastModified}"
  }

  /** MJPEG-in-MP4 fixture for mm_video_frames, synthesized ONCE per sf
    * dir into /tmp parquet and read back — a real corpus would arrive on
    * disk, and a parquet fixture (unlike a persisted frame) survives the
    * Bench/Verify blanket cache clears, so steady-state runs measure the
    * sample-table walk + decode, not MP4+JPEG construction. Version =
    * recipe + source-data fingerprint ([[buildFixtureOnce]]). */
  private val videoFixtureDone = scala.collection.mutable.Set.empty[String]
  private def videoFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // keyed by basename AND an absolute-path hash: two corpora whose
    // directories share a basename must never reuse each other's fixture
    val abs = new java.io.File(dir).getAbsolutePath
    val dirTag = f"${new java.io.File(dir).getName}_${abs.hashCode & 0xfffffff}%x"
    val path = s"/tmp/graft_video_fixture_$dirTag"
    videoFixtureDone.synchronized {
      if (!videoFixtureDone.contains(path)) {
        val version = "v2:docs*(jpeg(id+101f) mp4 ts1000 d40) src=" +
          tableFingerprint(dir, "documents")
        buildFixtureOnce(path, version) { tmp =>
          t(s, dir, "documents").select(col("doc_id")).as[Long]
            .map { id =>
              val w = (id % 9 + 4).toInt
              val h = (id % 7 + 4).toInt
              val nf = (id % 3 + 2).toInt
              val frames = (0 until nf).map(f =>
                Jpeg.jpegSynth(id + 101L * f, w, h))
              (id, Mp4.mp4SynthVideo(frames, timescale = 1000,
                frameDur = 40, w = w, h = h))
            }.toDF("doc_id", "payload")
            .write.mode("overwrite").parquet(s"$tmp/data")
        }
        videoFixtureDone += path
      }
    }
    s.read.parquet(s"$path/data")
  }

  /** STANDING kNN state for the incremental-ANN rows (ann_knn_incremental
    * / st_knn_incremental): the structured corpus's NN-Descent graph and
    * SRP bucket index, built ONCE per sf dir into /tmp parquet and read
    * back — a standing index by definition exists on disk before a batch
    * arrives (the r13 verdict's own observation: "real deployments
    * amortize the standing build, which is the operator's entire
    * point"), and the on-disk form survives the Bench/Verify blanket
    * cache clears so steady-state runs time the INCREMENTAL step, not
    * per-row re-synthesis of state whose construction ann_knn_descent*
    * already times as its own row. Values are identical to the inline
    * build (deterministic frames, parquet roundtrip), so the oracle's
    * replayed standing chain is unchanged. */
  // the ONE copy of the standing-build config: the version marker is
  // DERIVED from these, so a parameter edit cannot silently serve a
  // fixture built under the old config (previously a hand-bumped string)
  private val knnStandingK = 5
  private val knnStandingRounds = 2
  private val knnStandingPlanes = 8
  private val knnStandingTables = 4
  private[graft] def knnStandingVersion(dir: String): String =
    s"v2:structuredEmb corpus=id%5!=0 knnDescent(k$knnStandingK," +
      s"r$knnStandingRounds) srp(p$knnStandingPlanes,t$knnStandingTables)" +
      s" src=${tableFingerprint(dir, "embeddings")}"
  private val knnStandingDone = scala.collection.mutable.Set.empty[String]
  private def knnStanding(s: SparkSession,
                          dir: String): (DataFrame, DataFrame) = {
    val abs = new java.io.File(dir).getAbsolutePath
    val dirTag = f"${new java.io.File(dir).getName}_${abs.hashCode & 0xfffffff}%x"
    val path = s"/tmp/graft_knn_standing_$dirTag"
    knnStandingDone.synchronized {
      if (!knnStandingDone.contains(path)) {
        buildFixtureOnce(path, knnStandingVersion(dir)) { tmp =>
          val corpus = structuredEmb(s, dir)
            .where(pmod(col("vec_id"), lit(5)) =!= 0)
          Similarity.knnDescent(corpus, "vec_id", "embedding",
              k = knnStandingK, rounds = knnStandingRounds)
            .write.mode("overwrite").parquet(s"$tmp/graph")
          Similarity.srpBucketed(corpus, "vec_id", "embedding",
              numPlanes = knnStandingPlanes, tables = knnStandingTables)
            .write.mode("overwrite").parquet(s"$tmp/index")
        }
        knnStandingDone += path
      }
    }
    (s.read.parquet(s"$path/graph"), s.read.parquet(s"$path/index"))
  }

  /** Pre-builds the on-disk corpus fixtures for a sf dir (the
    * mm_video_frames MJPEG-in-MP4 corpus and the standing kNN state) so
    * a timed run measures the operators, not one-time corpus/state
    * synthesis — called from Bench's untimed warmup; Verify builds them
    * lazily on first use. */
  def warmFixtures(s: SparkSession, dir: String): Unit = {
    videoFixture(s, dir).count()
    val (g, idx) = knnStanding(s, dir)
    g.count(); idx.count()
  }

  /** Synthetic lattice geometry over customer/supplier keys — gives the geo
    * operators (SURVEY §2 J4/J5, G1-G4, F10-F13) oracle-checkable inputs on
    * the driver's tables. Customers sit on a 97 x 89 grid with 0.002 deg
    * spacing (~222 m lat / ~171 m lon at 40N); suppliers sit 0.0003 deg
    * (~33 m) north of lattice points. */
  private def custPoints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .withColumn("lat", lit(40.0) + (col("c_custkey") % 97).cast("double") * 0.002)
      .withColumn("lon", lit(-75.0) +
        pmod(floor(col("c_custkey") / 97.0), lit(89.0)) * 0.002)

  // NB: e-notation literals force DOUBLE arithmetic in DuckDB (plain
  // decimals like 0.002 become DECIMAL there, diverging from Spark doubles)
  private val custPointsSql =
    """SELECT *, 40e0 + (c_custkey % 97) * 2e-3 AS lat,
      |  -75e0 + (floor(c_custkey / 97e0) % 89e0) * 2e-3 AS lon
      |FROM customer""".stripMargin

  private def suppPoints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .withColumn("lat", lit(40.0003) + (col("s_suppkey") % 97).cast("double") * 0.002)
      .withColumn("lon", lit(-75.0) +
        pmod(floor(col("s_suppkey") / 97.0), lit(89.0)) * 0.002)

  private val suppPointsSql =
    """SELECT *, 4.00003e1 + (s_suppkey % 97) * 2e-3 AS lat,
      |  -75e0 + (floor(s_suppkey / 97e0) % 89e0) * 2e-3 AS lon
      |FROM supplier""".stripMargin

  /** The SPARSIFIED part co-order graph (parts co-occurring in >= 2
    * orders, both directions by construction, w = co-occurrence count)
    * shared by gr_louvain_weighted / gr_kcore_full / gr_coreness and
    * tools.KcoreProbe — ONE copy so the rows and the probe cannot
    * diverge. */
  private[graft] def partCoorderEdges(s: SparkSession,
                                      dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    li.alias("a").join(li.alias("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") =!= col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("src"), col("b.l_partkey").as("dst"))
      .agg(count(lit(1)).as("w")).where(col("w") >= 2)
  }

  /** The symmetrized supplier-proximity graph several gr_* rows share:
    * grid-join pairs within 200 m, both directions materialized. */
  private def suppBidirEdges(s: SparkSession, dir: String): DataFrame = {
    val edges = SpatialJoins.gridSelfJoin(
        suppPoints(s, dir), "s_suppkey", "lat", "lon", radiusM = 200.0)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** DuckDB replay of 3-round label propagation over the bidirectional
    * supplier-proximity graph, as CTEs `sup, e, l0..l3(node, label)` —
    * ONE copy shared by gr_label_prop and gr_modularity so the scored
    * communities cannot drift from the detected ones. */
  private def lpropL3Ctes: String = {
    val iterSql = (k: Int) =>
      s"""cnt$k AS (
         |  SELECT e.dst AS node, l.label, count(*) AS c
         |  FROM e JOIN l${k - 1} l ON e.src = l.node
         |  GROUP BY 1, 2),
         |l$k AS (
         |  SELECT node, min(label) AS label FROM (
         |    SELECT node, label, c, max(c) OVER (PARTITION BY node) AS mx
         |    FROM cnt$k) t
         |  WHERE c = mx GROUP BY node)"""
    s"""sup AS ($suppPointsSql),
       |e AS (
       |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
       |  FROM sup a JOIN sup b
       |    ON a.s_suppkey <> b.s_suppkey
       |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |${(1 to 3).map(iterSql).mkString(",\n")}""".stripMargin
  }

  /** Haversine in DuckDB SQL, mirroring GeoFunctions.haversineM exactly. */
  private def havSql(lat1: String, lon1: String, lat2: String, lon2: String) =
    s"""asin(sqrt(pow(sin((radians($lat2) - radians($lat1)) / 2), 2) +
       |  cos(radians($lat1)) * cos(radians($lat2)) *
       |  pow(sin((radians($lon2) - radians($lon1)) / 2), 2))) * 2 * 6371000.0"""
      .stripMargin

  /** ONE DuckDB replay of the HyperBall register propagation (customer
    * lattice, 3 rounds, p=6: exploded-register max-merge + the
    * hllEstimate correction CASE), shared by gr_hyperball and
    * gr_hyperball_closeness — the two rows fold the SAME per-round
    * ball-size estimates n0..n3, so their oracles must share the chain
    * or the estimates could drift apart. `finalSelect` is the fold. */
  private def hyperBallOracleSql(finalSelect: String): String = {
    val mergeSql = (k: Int) =>
      s"""r$k AS MATERIALIZED (
         |  SELECT node, idx, max(mj) AS mj FROM (
         |    SELECT e.dst AS node, r.idx, r.mj
         |    FROM e JOIN r${k - 1} r ON r.node = e.src
         |    UNION ALL SELECT node, idx, mj FROM r${k - 1})
         |  GROUP BY node, idx)"""
    val estSql = (k: Int) =>
      s"""n$k AS MATERIALIZED (
         |  SELECT node,
         |    CASE WHEN raw <= 160.0 AND v > 0 THEN 64e0 * ln(64e0 / v)
         |         WHEN raw > 4294967296e0 / 30 THEN
         |           -4294967296e0 * ln(1 - raw / 4294967296e0)
         |         ELSE raw END AS est
         |  FROM (
         |    SELECT node,
         |      (0.709e0 * 64e0 * 64e0) / (s_present + (64 - present))
         |        AS raw,
         |      CAST(64 - present AS DOUBLE) AS v
         |    FROM (SELECT node, sum(pow(2e0, -mj)) AS s_present,
         |            count(*) AS present FROM r$k GROUP BY node)))"""
    val hv = h32Sql("CAST(node AS VARCHAR)", "0")
    s"""WITH pts AS MATERIALIZED ($custPointsSql),
       |e AS MATERIALIZED (
       |  SELECT a.c_custkey AS src, b.c_custkey AS dst
       |  FROM pts a JOIN pts b
       |    ON a.c_custkey <> b.c_custkey
       |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
       |r0 AS MATERIALIZED (
       |  SELECT node, hv >> 26 AS idx,
       |    CASE WHEN (hv & 67108863) = 0 THEN 27
       |         ELSE 26 - (length(bin(hv & 67108863)) - 1) END AS mj
       |  FROM (SELECT node, $hv AS hv
       |        FROM (SELECT DISTINCT src AS node FROM e))),
       |${(1 to 3).map(mergeSql).mkString(",\n")},
       |${(0 to 3).map(estSql).mkString(",\n")}
       |$finalSelect""".stripMargin
  }

  private case class Q(name: String,
                       fn: (SparkSession, String) => DataFrame,
                       oracle: Option[String])

  // =================================================================
  // §2.1 scans / sinks
  // =================================================================

  private val scanQueries = Seq(
    // S1/S2: projection + filter pushdown reaching the scan
    Q("s1_pushdown_scan",
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_quantity") >= 45 && col("l_shipdate").isNotNull)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
             |WHERE l_quantity >= 45 AND l_shipdate IS NOT NULL""".stripMargin)),

    // S3: chunkless scan+join (Spark partitions replace manual chunking)
    Q("s3_scan_join",
      (s, dir) => t(s, dir, "orders").join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue")),
      Some("""SELECT c_mktsegment, count(*) AS n_orders,
             |  round(sum(o_totalprice), 2) AS revenue
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_mktsegment""".stripMargin)),

    // S6/K3: CSV sink + schema-forced CSV scan roundtrip
    Q("k3_csv_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_csv_rt_${new java.io.File(dir).getName}"
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
          .write.mode("overwrite").option("header", "true").csv(tmp)
        s.read.option("header", "true")
          .schema("n_nationkey INT, n_name STRING, n_regionkey INT").csv(tmp)
          .groupBy("n_regionkey").agg(count(lit(1)).as("n_nations"),
            min("n_name").as("first_nation"))
      },
      Some("""SELECT n_regionkey, count(*) AS n_nations,
             |  min(n_name) AS first_nation FROM nation GROUP BY n_regionkey"""
        .stripMargin)),

    // S9/K4: JSONL sink + scan roundtrip
    Q("k4_jsonl_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_json_rt_${new java.io.File(dir).getName}"
        t(s, dir, "region").write.mode("overwrite").json(tmp)
        s.read.json(tmp).groupBy().agg(count(lit(1)).as("n_regions"),
          min("r_name").as("first_region"))
      },
      Some("SELECT count(*) AS n_regions, min(r_name) AS first_region FROM region")),

    // K7: ORC sink/source roundtrip (columnar format beside parquet) —
    // full-content identity proven by hashing the read-back rows against
    // the parquet-sourced oracle
    Q("k7_orc_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_orc_rt_${new java.io.File(dir).getName}"
        t(s, dir, "documents").select("doc_id", "source", "lang", "text")
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp).select("doc_id", "source", "lang", "text")
      },
      Some("SELECT doc_id, source, lang, text FROM documents")),

    // K5/A11: nested-doc export — capped per-group sub-arrays rendered as a
    // deterministic JSON string (manual concat: byte-identical cross-engine)
    Q("k5_nested_doc",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val top = c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .withColumn("rn", row_number().over(Window.partitionBy("n_name")
            .orderBy(col("c_acctbal").desc, col("c_custkey").asc)))
          .where(col("rn") <= 3)
        top.groupBy("n_name")
          .agg(concat(lit("{\"nation\":\""), col("n_name"),
            lit("\",\"top\":[\""),
            array_join(transform(
              array_sort(collect_list(struct(col("rn"), col("c_name")))),
              x => x.getField("c_name")), "\",\""),
            lit("\"]}")).as("doc"))
          .select("n_name", "doc")
      },
      Some("""WITH ranked AS (
             |  SELECT n_name, c_name, row_number() OVER (
             |    PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
             |  FROM customer JOIN nation ON c_nationkey = n_nationkey)
             |SELECT n_name, '{"nation":"' || n_name || '","top":["' ||
             |  string_agg(c_name, '","' ORDER BY rn) || '"]}' AS doc
             |FROM ranked WHERE rn <= 3 GROUP BY n_name""".stripMargin)),

    // K8: the reference's EXACT POI-card export doc
    // (`neo4j_cypher/20_export_poi_cards.cypher:7-27`): one JSON card per
    // canonical place with {id, name, city, lat, lon, wv[<=2, 600-char],
    // listings_nearby, popularity_z, sustainability_popularity_flag,
    // quotes[<=4 of {src, txt<=220}]} — non-empty-after-trim review
    // filtering, popularity_z = coalesce(blended_z, listings_z) (cypher 13b
    // only writes blended for places WITH reviews; others fall back to the
    // listings z of cypher 12, which is also what the stored flag was
    // computed from). Customers play canonical places, nations play cities,
    // documents play reviews (dealt deterministically by doc_id), suppliers
    // play listings. JSON is assembled by explicit concatenation with
    // decimal-cast number rendering so the byte layout is engine-neutral;
    // collect order inside wv/quotes is pinned to doc_id (the reference's
    // Cypher collect() order is storage-dependent — deliberate divergence,
    // documented here).
    Q("k8_poi_cards",
      (s, dir) => {
        val esc = (c: Column) => replace(replace(c, lit("\\"), lit("\\\\")),
          lit("\""), lit("\\\""))
        val maxck = t(s, dir, "customer").agg(max("c_custkey").as("maxck"))
        val docs = t(s, dir, "documents")
          .where(trim(col("text")) =!= "")
          .crossJoin(broadcast(maxck))
          // deal into (nCust/15) buckets, ~5 docs per hit place, so the
          // <=2 wv and <=4 quote caps genuinely truncate (a 1:1 deal never
          // exercises them)
          .withColumn("place",
            pmod(col("doc_id") * 37L, expr("(maxck + 1) div 15")))
          .withColumn("src", element_at(
            array(lit("wikivoyage"), lit("yelp"), lit("reddit")),
            (pmod(col("doc_id"), lit(3L)) + 1L).cast("int")))
        val wvr = docs.where(col("src") === "wikivoyage")
          .withColumn("rn", row_number().over(Window.partitionBy("place")
            .orderBy(col("doc_id").asc)))
          .where(col("rn") <= 2)
        val wv = wvr.groupBy("place").agg(
          array_join(transform(array_sort(collect_list(struct(col("rn"),
              concat(lit("\""), esc(substring(col("text"), 1, 600)),
                lit("\"")).as("j")))),
            x => x.getField("j")), ",").as("wv_json"))
        val qr = docs.where(col("src").isin("yelp", "reddit"))
          .withColumn("rn", row_number().over(Window.partitionBy("place")
            .orderBy(col("doc_id").asc)))
          .where(col("rn") <= 4)
        val quotes = qr.groupBy("place").agg(
          array_join(transform(array_sort(collect_list(struct(col("rn"),
              concat(lit("{\"src\":\""), col("src"), lit("\",\"txt\":\""),
                esc(substring(col("text"), 1, 220)), lit("\"}")).as("j")))),
            x => x.getField("j")), ",").as("quotes_json"))
        val near = SpatialJoins.gridWithinJoin(
            custPoints(s, dir), suppPoints(s, dir),
            "c_custkey", "s_suppkey", thresholdM = 300.0)
          .groupBy("c_custkey")
          .agg(countDistinct("s_suppkey").as("listings_nearby"))
        val oc = t(s, dir, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"))
        val base = custPoints(s, dir)
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .join(near, Seq("c_custkey"), "left")
          .join(oc, col("c_custkey") === col("o_custkey"), "left")
          .withColumn("listings_nearby",
            coalesce(col("listings_nearby"), lit(0L)))
          .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
          .withColumn("city",
            regexp_replace(lower(trim(col("n_name"))), "\\s+", "-"))
        val w = Window.partitionBy("c_nationkey")
        def zOf(c0: Column): Column = {
          val mu = avg(c0).over(w)
          val sd = stddev_samp(c0).over(w)
          when(sd === 0 || sd.isNull, 0.0).otherwise((c0 - mu) / sd)
        }
        val zl = zOf(col("listings_nearby").cast("double"))
        val blended = when(col("n_orders") > 0,
          zOf(col("c_acctbal")) * 0.6 + zOf(col("n_orders").cast("double")) * 0.4)
        val scored = base
          .withColumn("pz", round(coalesce(blended, zl), 4) + 0.0)
          .withColumn("zl4", round(zl, 4) + 0.0)
          .withColumn("flag", when(col("zl4") >= 1.0, "high")
            .when(col("zl4") >= 0.0, "medium").otherwise("low"))
        scored
          .join(wv, col("c_custkey") === wv("place"), "left").drop("place")
          .join(quotes, col("c_custkey") === quotes("place"), "left")
          .drop("place")
          .select(col("c_custkey").as("poi_id"),
            concat(lit("{\"id\":\""),
              TextFunctions.normNameUdf(col("c_name")), lit("::"), col("city"),
              lit("\",\"name\":\""), col("c_name"),
              lit("\",\"city\":\""), col("city"),
              lit("\",\"lat\":"), col("lat").cast("decimal(8,4)").cast("string"),
              lit(",\"lon\":"), col("lon").cast("decimal(8,4)").cast("string"),
              lit(",\"wv\":["), coalesce(col("wv_json"), lit("")),
              lit("],\"listings_nearby\":"), col("listings_nearby").cast("string"),
              lit(",\"popularity_z\":"), col("pz").cast("decimal(12,4)").cast("string"),
              lit(",\"sustainability_popularity_flag\":\""), col("flag"),
              lit("\",\"quotes\":["), coalesce(col("quotes_json"), lit("")),
              lit("]}")).as("card"))
      },
      Some(s"""WITH pts AS ($custPointsSql), sup AS ($suppPointsSql),
              |maxck AS (SELECT max(c_custkey) AS m FROM customer),
              |docs AS (
              |  SELECT doc_id, text,
              |    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'wikivoyage'
              |      WHEN 1 THEN 'yelp' ELSE 'reddit' END AS src,
              |    (doc_id * 37) % (SELECT (m + 1) // 15 FROM maxck) AS place
              |  FROM documents WHERE trim(text) <> ''),
              |wvr AS (
              |  SELECT place, text, row_number() OVER (
              |    PARTITION BY place ORDER BY doc_id ASC) AS rn
              |  FROM docs WHERE src = 'wikivoyage'),
              |wv AS (
              |  SELECT place, string_agg('"' ||
              |      replace(replace(left(text, 600), '\\', '\\\\'),
              |        '"', '\\"') || '"', ',' ORDER BY rn) AS wv_json
              |  FROM wvr WHERE rn <= 2 GROUP BY place),
              |qr AS (
              |  SELECT place, src, text, row_number() OVER (
              |    PARTITION BY place ORDER BY doc_id ASC) AS rn
              |  FROM docs WHERE src IN ('yelp', 'reddit')),
              |quotes AS (
              |  SELECT place, string_agg('{"src":"' || src || '","txt":"' ||
              |      replace(replace(left(text, 220), '\\', '\\\\'),
              |        '"', '\\"') || '"}', ',' ORDER BY rn) AS quotes_json
              |  FROM qr WHERE rn <= 4 GROUP BY place),
              |near AS (
              |  SELECT c_custkey, count(DISTINCT s_suppkey) AS listings_nearby
              |  FROM pts JOIN sup
              |    ON ${havSql("pts.lat", "pts.lon", "sup.lat", "sup.lon")} <= 300.0
              |  GROUP BY c_custkey),
              |oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders
              |       GROUP BY o_custkey),
              |base AS (
              |  SELECT p.c_custkey, p.c_name, p.c_nationkey, p.c_acctbal,
              |    p.lat, p.lon,
              |    regexp_replace(lower(trim(n.n_name)), '\\s+', '-', 'g') AS city,
              |    coalesce(nr.listings_nearby, 0) AS listings_nearby,
              |    coalesce(oc.n_orders, 0) AS n_orders
              |  FROM pts p JOIN nation n ON p.c_nationkey = n.n_nationkey
              |  LEFT JOIN near nr ON p.c_custkey = nr.c_custkey
              |  LEFT JOIN oc ON p.c_custkey = oc.o_custkey),
              |z AS (
              |  SELECT *,
              |    CASE WHEN stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w = 0
              |      OR stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w IS NULL
              |      THEN 0.0 ELSE (CAST(listings_nearby AS DOUBLE) -
              |        avg(CAST(listings_nearby AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w END AS zl,
              |    CASE WHEN stddev_samp(c_acctbal) OVER w = 0
              |      OR stddev_samp(c_acctbal) OVER w IS NULL THEN 0.0
              |      ELSE (c_acctbal - avg(c_acctbal) OVER w) /
              |        stddev_samp(c_acctbal) OVER w END AS zbal,
              |    CASE WHEN stddev_samp(CAST(n_orders AS DOUBLE)) OVER w = 0
              |      OR stddev_samp(CAST(n_orders AS DOUBLE)) OVER w IS NULL THEN 0.0
              |      ELSE (CAST(n_orders AS DOUBLE) -
              |        avg(CAST(n_orders AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(n_orders AS DOUBLE)) OVER w END AS zord
              |  FROM base WINDOW w AS (PARTITION BY c_nationkey)),
              |scored AS (
              |  SELECT *,
              |    round(CASE WHEN n_orders > 0 THEN zbal * 0.6 + zord * 0.4
              |      ELSE zl END, 4) + 0e0 AS pz,
              |    round(zl, 4) + 0e0 AS zl4
              |  FROM z)
              |SELECT s.c_custkey AS poi_id,
              |  '{"id":"' ||
              |  regexp_replace(regexp_replace(lower(trim(s.c_name)),
              |    '\\s+', '-', 'g'), '[^a-z0-9\\-:_.,]+', '', 'g') ||
              |  '::' || s.city ||
              |  '","name":"' || s.c_name ||
              |  '","city":"' || s.city ||
              |  '","lat":' || CAST(CAST(s.lat AS DECIMAL(8,4)) AS VARCHAR) ||
              |  ',"lon":' || CAST(CAST(s.lon AS DECIMAL(8,4)) AS VARCHAR) ||
              |  ',"wv":[' || coalesce(w.wv_json, '') ||
              |  '],"listings_nearby":' || CAST(s.listings_nearby AS VARCHAR) ||
              |  ',"popularity_z":' || CAST(CAST(s.pz AS DECIMAL(12,4)) AS VARCHAR) ||
              |  ',"sustainability_popularity_flag":"' ||
              |  CASE WHEN s.zl4 >= 1.0 THEN 'high' WHEN s.zl4 >= 0.0
              |    THEN 'medium' ELSE 'low' END ||
              |  '","quotes":[' || coalesce(q.quotes_json, '') || ']}' AS card
              |FROM scored s
              |LEFT JOIN wv w ON s.c_custkey = w.place
              |LEFT JOIN quotes q ON s.c_custkey = q.place""".stripMargin))
  )

  // =================================================================
  // §2.2 projections / filters
  // =================================================================

  private val filterQueries = Seq(
    Q("p1_project_rename",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey").as("part_id"), col("p_name").as("part_name"),
          round(col("p_retailprice") * 1.1, 2).as("marked_up")),
      Some("""SELECT p_partkey AS part_id, p_name AS part_name,
             |  round(p_retailprice * 1.1, 2) AS marked_up FROM part""".stripMargin)),

    Q("p2_null_drop",
      (s, dir) => t(s, dir, "events")
        .na.drop(Seq("user_id", "value"))
        .where(col("value") > 50)
        .select("event_id", "user_id", "event_type"),
      Some("""SELECT event_id, user_id, event_type FROM events
             |WHERE user_id IS NOT NULL AND value IS NOT NULL AND value > 50"""
        .stripMargin)),

    Q("p3_nonempty_text",
      (s, dir) => t(s, dir, "documents")
        .where(col("text").isNotNull && trim(col("text")) =!= "" &&
          col("n_chars") >= 300)
        .select("doc_id", "lang", "n_chars"),
      Some("""SELECT doc_id, lang, n_chars FROM documents
             |WHERE text IS NOT NULL AND trim(text) <> '' AND n_chars >= 300"""
        .stripMargin)),

    Q("p4_semi_join",
      (s, dir) => t(s, dir, "customer").join(
          t(s, dir, "orders").where(col("o_totalprice") > 400),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer WHERE c_custkey IN
             |  (SELECT o_custkey FROM orders WHERE o_totalprice > 400)"""
        .stripMargin)),

    // P5/P6: per-key bbox containment + distance guard on lattice points
    Q("p5_bbox_filter",
      (s, dir) => custPoints(s, dir)
        .where(GeoFunctions.bboxContains(col("lat"), col("lon"),
          lit(40.02), lit(-74.99), lit(40.06), lit(-74.97)))
        .select("c_custkey", "lat", "lon"),
      Some(s"""SELECT c_custkey, lat, lon FROM ($custPointsSql)
              |WHERE lat >= 40.02 AND lat <= 40.06
              |  AND lon >= -74.99 AND lon <= -74.97""".stripMargin)),

    Q("p6_distance_guard",
      (s, dir) => custPoints(s, dir)
        .withColumn("meters", GeoFunctions.haversineM(col("lat"), col("lon"),
          lit(40.05), lit(-74.95)))
        .where(col("meters") <= 5000.0)
        .select(col("c_custkey"), round(col("meters"), 2).as("meters")),
      Some(s"""SELECT c_custkey,
              |  round(${havSql("lat", "lon", "40.05", "-74.95")}, 2) AS meters
              |FROM ($custPointsSql)
              |WHERE ${havSql("lat", "lon", "40.05", "-74.95")} <= 5000.0"""
        .stripMargin)),

    Q("p8_source_filter",
      (s, dir) => t(s, dir, "documents").where(col("source") === "src1")
        .select("doc_id", "source", "lang"),
      Some("SELECT doc_id, source, lang FROM documents WHERE source = 'src1'")),

    // P9/F3: slug sanitization as pure column expr
    Q("p9_slug_project",
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          regexp_replace(regexp_replace(lower(col("p_name")), "[^a-z0-9]+", "-"),
            "^-+|-+$", "").as("slug")),
      Some("""SELECT p_partkey, regexp_replace(regexp_replace(lower(p_name),
             |  '[^a-z0-9]+', '-', 'g'), '^-+|-+$', '', 'g') AS slug FROM part"""
        .stripMargin))
  )

  // =================================================================
  // §2.3 joins
  // =================================================================

  private val joinQueries = Seq(
    Q("j1_inner_join",
      (s, dir) => t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .where(col("o_orderstatus") === "F")
        .select("o_orderkey", "c_name", "o_totalprice"),
      Some("""SELECT o_orderkey, c_name, o_totalprice
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |WHERE o_orderstatus = 'F'""".stripMargin)),

    Q("j2_left_join",
      (s, dir) => t(s, dir, "lineitem").where(col("l_orderkey") % 100 === 0)
        .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"), "left")
        .select(col("l_orderkey"), col("l_linenumber"),
          coalesce(col("p_name"), lit("unknown")).as("part_name")),
      Some("""SELECT l_orderkey, l_linenumber,
             |  coalesce(p_name, 'unknown') AS part_name
             |FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
             |WHERE l_orderkey % 100 = 0""".stripMargin)),

    // J3: broadcast dimension join (explicit broadcast hint)
    Q("j3_broadcast_dim",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("c_acctbal"), 4).as("avg_bal")),
      Some("""SELECT r_name, count(*) AS n_customers,
             |  round(avg(c_acctbal), 4) AS avg_bal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"""
        .stripMargin)),

    // J4: grid-blocked spatial self-join (the ER candidate join)
    Q("j4_grid_selfjoin",
      (s, dir) => SpatialJoins.gridSelfJoin(
          custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
        .select(col("a_id"), col("b_id"), round(col("meters"), 2).as("meters")),
      Some(s"""WITH pts AS ($custPointsSql)
              |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |  round(${havSql("a.lat", "a.lon", "b.lat", "b.lon")}, 2) AS meters
              |FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0"""
        .stripMargin)),

    // J5: nearest-neighbor join with threshold (k=1)
    Q("j5_nearest_join",
      (s, dir) => {
        val l = custPoints(s, dir)
          .withColumn("blk", pmod(floor(col("c_custkey") / 97.0), lit(89.0)))
        val r = suppPoints(s, dir)
          .withColumn("blk", pmod(floor(col("s_suppkey") / 97.0), lit(89.0)))
        SpatialJoins.nearestJoin(l, r, "c_custkey", "s_suppkey",
            thresholdM = 100.0, blockKeys = Seq("blk"))
          .select(col("c_custkey"), col("s_suppkey"),
            round(col("meters"), 2).as("meters"))
      },
      Some(s"""WITH l AS (SELECT *, floor(c_custkey / 97.0) % 89 AS blk
              |            FROM ($custPointsSql)),
              |r AS (SELECT *, floor(s_suppkey / 97.0) % 89 AS blk
              |      FROM ($suppPointsSql)),
              |cand AS (
              |  SELECT c_custkey, s_suppkey,
              |    ${havSql("l.lat", "l.lon", "r.lat", "r.lon")} AS m,
              |    row_number() OVER (PARTITION BY c_custkey
              |      ORDER BY ${havSql("l.lat", "l.lon", "r.lat", "r.lon")} ASC,
              |        s_suppkey ASC) AS rn
              |  FROM l JOIN r ON l.blk = r.blk
              |  WHERE ${havSql("l.lat", "l.lon", "r.lat", "r.lon")} <= 100.0)
              |SELECT c_custkey, s_suppkey, round(m, 2) AS meters
              |FROM cand WHERE rn = 1""".stripMargin)),

    // J6: fuzzy name join — best >=threshold edit-similarity match per
    // part. Candidates come from MinHash-LSH over name token sets
    // (Dedup.lshCandidatePairs), NOT a natural-language block key: a
    // vocabulary-bounded key like type|first-token makes blocks grow
    // linearly with data (and in-block pairs quadratically), while LSH
    // bucket width is governed by the (bands, rowsPerBand) S-curve at any
    // scale. Recall contract: a candidate pair with name-token-set
    // jaccard j surfaces with p = 1-(1-j^2)^8 (S-curve knee ~0.35);
    // the codegen'd LevRatio verify stage then applies the exact 0.5
    // edit-similarity threshold to the argmax of the surviving pairs.
    // The length-band pre-filter is exact for the threshold (sim >= 0.5
    // implies 2*|len diff| <= greatest(len)), so it only prunes pairs the
    // argmax+threshold would discard anyway — the oracle replays the LSH
    // but not the pre-filter, and still hash-matches.
    Q("j6_fuzzy_name_join",
      (s, dir) => {
        // Distinct-name collapse: every row with the same name has an
        // IDENTICAL minhash signature, so row-level LSH would put whole
        // duplicate-name groups in the same buckets and the candidate join
        // would be quadratic in group size (measured: 76M pairs at sf0.1,
        // where part has 64 distinct names over 20k rows). Instead run
        // LSH + verify over DISTINCT names — sublinear in table size —
        // and rebuild the per-key answer algebraically:
        //   - a part whose name occurs >=2 times best-matches the
        //     smallest OTHER key of its own name group (sim 1.0, since
        //     levRatio(x,x)=1 and distinct names are strictly < 1);
        //   - otherwise its best is the name-level argmax, with the
        //     candidate name's min key as the tiebreak key (matching the
        //     row-level (sim desc, b_key asc) struct order).
        // The per-part side then needs only BROADCAST joins against the
        // tiny name-level frames: the fact table is never shuffled.
        val parts = t(s, dir, "part").select("p_partkey", "p_name")
        val k1s = parts.groupBy("p_name")
          .agg(min("p_partkey").as("k1"), count(lit(1)).as("cnt"))
        val k2s = parts.join(broadcast(k1s.select("p_name", "k1")), "p_name")
          .where(col("p_partkey") > col("k1"))
          .groupBy("p_name").agg(min("p_partkey").as("k2"))
        val stats = k1s.join(k2s, Seq("p_name"), "left")
        val dn = k1s.select(col("p_name").as("nm"))
        val namePairs = Dedup.lshCandidatePairs(dn, "nm", "nm",
            shingleN = 1, bands = 8, rowsPerBand = 2)
          .withColumn("sim", TextFunctions.levRatioCol(col("a_id"), col("b_id")))
        val nameSym = namePairs
          .select(col("a_id").as("a_nm"), col("b_id").as("b_nm"), col("sim"))
          .union(namePairs
            .select(col("b_id").as("a_nm"), col("a_id").as("b_nm"), col("sim")))
        val nameBest = nameSym
          .join(k1s.select(col("p_name").as("b_nm"), col("k1").as("bk1")), "b_nm")
          .groupBy("a_nm")
          .agg(max(struct(col("sim").as("s"), (-col("bk1")).as("nk"))).as("nbest"))
        parts.join(broadcast(stats), "p_name")
          .join(broadcast(nameBest), col("p_name") === col("a_nm"), "left")
          .withColumn("bs", when(col("cnt") >= 2, lit(1.0))
            .otherwise(col("nbest.s")))
          .withColumn("bk", when(col("cnt") >= 2,
            when(col("p_partkey") === col("k1"), col("k2")).otherwise(col("k1")))
            .otherwise(-col("nbest.nk")))
          .where(col("bs") >= 0.5)
          .select(col("p_partkey").as("a_key"), col("bk").as("b_key"),
            round(col("bs"), 4).as("sim"))
      },
      Some("""WITH p AS (
             |  SELECT p_partkey AS id, p_name AS nm,
             |    list_filter(string_split(trim(regexp_replace(lower(p_name),
             |      '[^a-z0-9]+', ' ', 'g')), ' '), x -> len(x) > 0) AS tk
             |  FROM part),
             |h1 AS (
             |  SELECT id, nm, list_transform(
             |    CASE WHEN len(tk) < 1 THEN [''] ELSE list_distinct(tk) END,
             |    s -> ('0x' || substr(md5('0:' || s), 1, 8))::BIGINT) AS h1
             |  FROM p),
             |sig AS (
             |  SELECT id, nm, list_transform(range(0, 16), i ->
             |    list_min(list_transform(h1,
             |      h -> (h * (i * 2 + 3) + i * 12582917) % 4294967291))) AS sig
             |  FROM h1),
             |banded AS (
             |  SELECT id, nm, b AS band,
             |    md5(b::VARCHAR || '_' || sig[b*2+1]::VARCHAR || '_' ||
             |      sig[b*2+2]::VARCHAR) AS bucket
             |  FROM sig, (SELECT unnest(range(0, 8)) AS b)),
             |scored AS (
             |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
             |    1.0 - levenshtein(a.nm, b.nm) /
             |      greatest(length(a.nm), length(b.nm)) AS sim
             |  FROM banded a JOIN banded b
             |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
             |sym AS (
             |  SELECT a_id AS a_key, b_id AS b_key, sim FROM scored
             |  UNION ALL
             |  SELECT b_id, a_id, sim FROM scored),
             |best AS (
             |  SELECT a_key, max({'s': sim, 'nk': -b_key}) AS best
             |  FROM sym GROUP BY a_key)
             |SELECT a_key, -((best).nk) AS b_key, round((best).s, 4) AS sim
             |FROM best WHERE (best).s >= 0.5""".stripMargin)),

    Q("j9_anti_join",
      (s, dir) => t(s, dir, "customer").join(t(s, dir, "orders"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
             |                        WHERE o_custkey IS NOT NULL)""".stripMargin)),

    // J11: multi-hop chain join (graph-pattern shape)
    Q("j11_multihop",
      (s, dir) => t(s, dir, "region")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "supplier"), col("n_nationkey") === col("s_nationkey"))
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"))
        .groupBy("r_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("revenue")),
      Some("""SELECT r_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2)
             |  AS revenue
             |FROM region JOIN nation ON r_regionkey = n_regionkey
             |JOIN supplier ON n_nationkey = s_nationkey
             |JOIN lineitem ON s_suppkey = l_suppkey
             |GROUP BY r_name""".stripMargin)),

    // J12: backward as-of join — each purchase gets the user's most recent
    // prior click within 2h (AsOfJoin union+window formulation; oracle is
    // DuckDB's native ASOF JOIN, an independent implementation).
    Q("j12_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val purchases = ev.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        // one row per (user, ts) so the as-of pick is deterministic
        val clicks = ev.where(col("event_type") === "click")
          .groupBy("user_id", "ts").agg(max("event_id").as("click_id"))
        AsOfJoin.backward(purchases, clicks, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            payload = Seq("click_id" -> "click_id", "ts" -> "click_ts"),
            within = Some((lt, rt) => rt >= lt - expr("INTERVAL 2 HOURS")))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"), col("click_id"),
            (unix_micros(col("ts")) - unix_micros(col("click_ts")))
              .as("gap_us"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, ts AS cts, max(event_id) AS click_id
             |      FROM events WHERE event_type = 'click'
             |      GROUP BY user_id, ts)
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS p_us,
             |  CASE WHEN c.cts >= p.ts - INTERVAL 2 HOUR
             |    THEN c.click_id END AS click_id,
             |  CASE WHEN c.cts >= p.ts - INTERVAL 2 HOUR
             |    THEN epoch_us(p.ts) - epoch_us(c.cts) END AS gap_us
             |FROM p ASOF LEFT JOIN c
             |  ON p.user_id = c.user_id AND p.ts >= c.cts""".stripMargin)),

    // J12b: forward as-of — each click attributed to the user's NEXT
    // purchase within 2h (first(ignoreNulls) over the following frame).
    Q("j14_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.where(col("event_type") === "click")
          .select("event_id", "user_id", "ts")
        val purchases = ev.where(col("event_type") === "purchase")
          .groupBy("user_id", "ts").agg(max("event_id").as("purchase_id"))
        AsOfJoin.forward(clicks, purchases, Seq("user_id"),
            leftTime = "ts", rightTime = "ts",
            payload = Seq("purchase_id" -> "purchase_id",
              "ts" -> "purchase_ts"),
            within = Some((lt, rt) => rt <= lt + expr("INTERVAL 2 HOURS")))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("c_us"), col("purchase_id"),
            (unix_micros(col("purchase_ts")) - unix_micros(col("ts")))
              .as("wait_us"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, ts FROM events
             |           WHERE event_type = 'click'),
             |p AS (SELECT user_id, ts AS pts, max(event_id) AS purchase_id
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY user_id, ts)
             |SELECT c.event_id, c.user_id, epoch_us(c.ts) AS c_us,
             |  CASE WHEN p.pts <= c.ts + INTERVAL 2 HOUR
             |    THEN p.purchase_id END AS purchase_id,
             |  CASE WHEN p.pts <= c.ts + INTERVAL 2 HOUR
             |    THEN epoch_us(p.pts) - epoch_us(c.ts) END AS wait_us
             |FROM c ASOF LEFT JOIN p
             |  ON c.user_id = p.user_id AND c.ts <= p.pts""".stripMargin)),

    // J13: interval range join — clicks inside each purchase's trailing
    // 30-minute window, as a bucketed equi-join (RangeJoin), never a
    // per-key nested loop. Oracle is the naive inequality join.
    Q("j13_range_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("p_us"))
          .withColumn("w_start", col("p_us") - lit(1800000000L))
        val c = ev.where(col("event_type") === "click")
          .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
            col("value"))
        val pairs = RangeJoin.intervalPoint(p, c, Seq("user_id"),
          startCol = "w_start", endCol = "p_us", pointCol = "c_us",
          bucketWidth = 1800000000L)
        val perPurchase = pairs.groupBy("event_id")
          .agg(count(lit(1)).as("n_clicks"),
            (round(sum("value"), 2) + lit(0.0)).as("click_value"))
        p.join(perPurchase, Seq("event_id"), "left")
          .select(col("event_id"), col("user_id"), col("p_us"),
            coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
            (coalesce(col("click_value"), lit(0.0)) + lit(0.0))
              .as("click_value"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS p_us
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_us(ts) AS c_us, value
             |      FROM events WHERE event_type = 'click')
             |SELECT p.event_id, p.user_id, p.p_us,
             |  count(c.c_us) AS n_clicks,
             |  coalesce(round(sum(c.value), 2), 0e0) + 0e0 AS click_value
             |FROM p LEFT JOIN c ON p.user_id = c.user_id
             |  AND c.c_us >= p.p_us - 1800000000 AND c.c_us < p.p_us
             |GROUP BY p.event_id, p.user_id, p.p_us""".stripMargin)),

    // J15: interval x interval OVERLAP join — purchase attribution
    // windows overlapping click activity windows per user. Both sides
    // explode to covered epoch buckets, join as a plain equi-join on
    // (user, bucket), and each pair surfaces exactly once at the first
    // shared bucket (no distinct pass); the exact overlap predicate is
    // re-checked so results equal the naive inequality join. The
    // interval x point sibling is j13.
    Q("j15_interval_overlap",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val p = ev.where(col("event_type") === "purchase")
          .select(col("event_id").as("p_id"), col("user_id"),
            (unix_micros(col("ts")) - lit(1800000000L)).as("p_start"),
            unix_micros(col("ts")).as("p_end"))
        val c = ev.where(col("event_type") === "click")
          .select(col("event_id").as("c_id"), col("user_id"),
            (unix_micros(col("ts")) - lit(600000000L)).as("c_start"),
            (unix_micros(col("ts")) + lit(600000000L)).as("c_end"))
        RangeJoin.intervalOverlap(p, c, Seq("user_id"),
          "p_start", "p_end", "c_start", "c_end",
          bucketWidth = 1800000000L)
          .select("user_id", "p_id", "c_id")
      },
      Some("""SELECT p.user_id, p.event_id AS p_id, c.event_id AS c_id
             |FROM (SELECT event_id, user_id,
             |        epoch_us(ts) - 1800000000 AS ps, epoch_us(ts) AS pe
             |      FROM events WHERE event_type = 'purchase') p
             |JOIN (SELECT event_id, user_id,
             |        epoch_us(ts) - 600000000 AS cs,
             |        epoch_us(ts) + 600000000 AS ce
             |      FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND p.ps <= c.ce AND c.cs <= p.pe""".stripMargin))
  )

  // =================================================================
  // §2.4 aggregations  +  §2.9 windows
  // =================================================================

  private val aggQueries = Seq(
    Q("a1_count_by_key",
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    Q("a2_count_mean",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"),
          round(avg("o_totalprice"), 4).as("avg_price")),
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  round(avg(o_totalprice), 4) AS avg_price
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A3: collect-list per key (rendered as deterministic sorted string)
    Q("a3_collect_per_key",
      (s, dir) => t(s, dir, "documents").groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          array_join(transform(slice(array_sort(collect_list(col("doc_id"))), 1, 5),
            x => x.cast("string")), ",").as("first_ids")),
      Some("""WITH ranked AS (SELECT source, doc_id, row_number() OVER (
             |  PARTITION BY source ORDER BY doc_id) AS rn FROM documents)
             |SELECT source, count(*) AS n_docs,
             |  string_agg(CASE WHEN rn <= 5 THEN CAST(doc_id AS VARCHAR) END,
             |    ',' ORDER BY doc_id) AS first_ids
             |FROM ranked GROUP BY source""".stripMargin)),

    // A4: argmax-by-length canonical pick (max_by semantics w/ tiebreak)
    Q("a4_argmax_pick",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").desc, col("c_name").asc)
        t(s, dir, "customer").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"), col("c_name").as("top_customer"),
            col("c_acctbal").as("top_bal"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (
             |  PARTITION BY c_nationkey
             |  ORDER BY c_acctbal DESC, c_name ASC) AS rn FROM customer)
             |SELECT c_nationkey, c_name AS top_customer, c_acctbal AS top_bal
             |FROM ranked WHERE rn = 1""".stripMargin)),

    Q("a5_dedupe_by_key",
      (s, dir) => t(s, dir, "documents").select("source", "lang")
        .dropDuplicates("source", "lang"),
      Some("SELECT DISTINCT source, lang FROM documents")),

    Q("a6_distinct_count",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(countDistinct("o_custkey").as("n_customers")),
      Some("""SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_customers
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A7: per-group z-score via window avg/stddev_samp with sigma=0 guard
    Q("a7_zscore",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
        val mu = avg("c_acctbal").over(w)
        val sigma = stddev_samp(col("c_acctbal")).over(w)
        t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"),
            (round(when(sigma === 0 || sigma.isNull, 0.0)
              .otherwise((col("c_acctbal") - mu) / sigma), 4) + 0.0).as("z"))
      },
      Some("""SELECT c_custkey, c_nationkey,
             |  round(CASE WHEN stddev_samp(c_acctbal) OVER w = 0
             |    OR stddev_samp(c_acctbal) OVER w IS NULL THEN 0.0
             |    ELSE (c_acctbal - avg(c_acctbal) OVER w) /
             |      stddev_samp(c_acctbal) OVER w END, 4) + 0e0 AS z
             |FROM customer WINDOW w AS (PARTITION BY c_nationkey)""".stripMargin)),

    // A8+G7: blended z-score + popularity flag
    Q("a8_blended_zscore",
      (s, dir) => {
        val oc = t(s, dir, "orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"))
        val c = t(s, dir, "customer").join(oc,
            col("c_custkey") === col("o_custkey"), "left")
          .withColumn("n_orders", coalesce(col("n_orders"), lit(0L)))
        val w = Window.partitionBy("c_nationkey")
        def z(c0: Column): Column = {
          val mu = avg(c0).over(w)
          val sd = stddev_samp(c0).over(w)
          when(sd === 0 || sd.isNull, 0.0).otherwise((c0 - mu) / sd)
        }
        c.withColumn("blend",
            round(z(col("c_acctbal")) * 0.6 + z(col("n_orders").cast("double")) * 0.4, 4) + 0.0)
          .withColumn("flag", when(col("blend") >= 1.0, "high")
            .when(col("blend") >= 0.0, "medium").otherwise("low"))
          .select("c_custkey", "blend", "flag")
      },
      Some("""WITH oc AS (SELECT o_custkey, count(*) AS n_orders FROM orders
             |            GROUP BY o_custkey),
             |c AS (SELECT c_custkey, c_nationkey, c_acctbal,
             |        coalesce(n_orders, 0) AS n_orders
             |      FROM customer LEFT JOIN oc ON c_custkey = o_custkey),
             |z AS (SELECT c_custkey,
             |  CASE WHEN stddev_samp(c_acctbal) OVER w = 0
             |    OR stddev_samp(c_acctbal) OVER w IS NULL THEN 0.0
             |    ELSE (c_acctbal - avg(c_acctbal) OVER w) /
             |      stddev_samp(c_acctbal) OVER w END AS z_bal,
             |  CASE WHEN stddev_samp(CAST(n_orders AS DOUBLE)) OVER w = 0
             |    OR stddev_samp(CAST(n_orders AS DOUBLE)) OVER w IS NULL THEN 0.0
             |    ELSE (CAST(n_orders AS DOUBLE) -
             |      avg(CAST(n_orders AS DOUBLE)) OVER w) /
             |      stddev_samp(CAST(n_orders AS DOUBLE)) OVER w END AS z_ord
             |  FROM c WINDOW w AS (PARTITION BY c_nationkey))
             |SELECT c_custkey, round(z_bal * 0.6 + z_ord * 0.4, 4) + 0e0 AS blend,
             |  CASE WHEN round(z_bal * 0.6 + z_ord * 0.4, 4) + 0e0 >= 1.0 THEN 'high'
             |    WHEN round(z_bal * 0.6 + z_ord * 0.4, 4) + 0e0 >= 0.0 THEN 'medium'
             |    ELSE 'low' END AS flag
             |FROM z""".stripMargin)),

    Q("a9_conditional_count",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_totalprice") > 300, 1)).as("n_big")),
      Some("""SELECT o_orderpriority,
             |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
             |  count(CASE WHEN o_totalprice > 300 THEN 1 END) AS n_big
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A10: priority-cascaded aggregate with coalesce
    Q("a10_priority_cascade",
      (s, dir) => t(s, dir, "customer").groupBy("c_nationkey")
        .agg(round(coalesce(
          avg(when(col("c_mktsegment") === "BUILDING", col("c_acctbal"))),
          avg(when(col("c_mktsegment") === "AUTOMOBILE", col("c_acctbal"))),
          avg(col("c_acctbal"))), 4).as("rep_bal")),
      Some("""SELECT c_nationkey, round(coalesce(
             |  avg(CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END),
             |  avg(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal END),
             |  avg(c_acctbal)), 4) AS rep_bal
             |FROM customer GROUP BY c_nationkey""".stripMargin)),

    // A12: frequency count with threshold + ordering
    Q("a12_freq_threshold",
      (s, dir) => t(s, dir, "events").groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n")).where(col("n") >= 5),
      Some("""SELECT user_id, event_type, count(*) AS n FROM events
             |GROUP BY user_id, event_type HAVING count(*) >= 5""".stripMargin)),

    // A13: global sanity counts (one row)
    Q("a13_global_counts",
      (s, dir) => {
        val li = t(s, dir, "lineitem").agg(count(lit(1)).as("n_lineitem"))
        val o = t(s, dir, "orders").agg(count(lit(1)).as("n_orders"))
        val d = t(s, dir, "documents").agg(count(lit(1)).as("n_documents"))
        li.crossJoin(o).crossJoin(d)
      },
      Some("""SELECT (SELECT count(*) FROM lineitem) AS n_lineitem,
             |  (SELECT count(*) FROM orders) AS n_orders,
             |  (SELECT count(*) FROM documents) AS n_documents""".stripMargin)),

    // A14: exact interpolated quantiles per group. `percentile` is Spark's
    // exact sort-based aggregate — right for bounded group sizes under the
    // oracle; at 100 TB swap in approx_percentile (t-digest, mergeable
    // partials) and accept the documented error bound.
    Q("a14_quantiles",
      (s, dir) => t(s, dir, "orders").groupBy("o_orderpriority")
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99")),
      Some("""SELECT o_orderpriority,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
             |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // A15: rollup (grouping sets) — subtotal lattice in one pass instead
    // of unioned re-aggregations; partials merge map-side per grouping set.
    Q("a15_rollup",
      (s, dir) => t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // A15b: full CUBE lattice — adds the (·, linestatus) cross-slices the
    // rollup hierarchy omits, still one pass with grouping-set partials
    Q("a18_cube",
      (s, dir) => t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
             |  coalesce(l_linestatus, 'ALL') AS linestatus,
             |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)),

    // A16: pivot — wide per-category columns from a long table; Spark's
    // pivot plans as a single aggregate with conditional partials (values
    // list given explicitly so no extra distinct pass is needed).
    Q("a16_pivot",
      (s, dir) => t(s, dir, "events")
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .select(col("user_id"),
          coalesce(col("click"), lit(0L)).as("n_click"),
          coalesce(col("error"), lit(0L)).as("n_error"),
          coalesce(col("purchase"), lit(0L)).as("n_purchase"),
          coalesce(col("signup"), lit(0L)).as("n_signup"),
          coalesce(col("view"), lit(0L)).as("n_view")),
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS n_click,
             |  count(*) FILTER (event_type = 'error') AS n_error,
             |  count(*) FILTER (event_type = 'purchase') AS n_purchase,
             |  count(*) FILTER (event_type = 'signup') AS n_signup,
             |  count(*) FILTER (event_type = 'view') AS n_view
             |FROM events GROUP BY user_id""".stripMargin)),

    // A17: time-RANGE window frame — per-customer trailing-30-day order
    // revenue. A range frame (value-bounded, peer-inclusive) is a
    // different physical window than the row-bounded frames elsewhere in
    // the registry; the frame key is epoch seconds so both engines bound
    // the frame with exact integer arithmetic.
    Q("a17_rolling_window",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("d"))
          .rangeBetween(-30L * 86400, 0)
        t(s, dir, "orders")
          // NTZ parquet date + UTC session tz: cast through TimestampType
          // for epoch seconds identical to DuckDB's naive epoch_ms
          .withColumn("d", col("o_orderdate").cast("timestamp").cast("long"))
          .select(col("o_custkey"), col("o_orderkey"), col("d"),
            round(sum("o_totalprice").over(w), 2).as("roll30"))
      },
      Some("""SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) // 1000 AS d,
             |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             |    ORDER BY epoch_ms(o_orderdate) // 1000
             |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)
             |    AS roll30
             |FROM orders""".stripMargin))
  )

  // =================================================================
  // §2.6 sorts / top-k  +  §2.7 set ops
  // =================================================================

  private val sortSetQueries = Seq(
    Q("t1_multikey_sort",
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_orderkey") <= 200)
        .orderBy(col("l_returnflag").asc, col("l_quantity").desc,
          col("l_orderkey").asc, col("l_linenumber").asc)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
             |FROM lineitem WHERE l_orderkey <= 200
             |ORDER BY l_returnflag ASC, l_quantity DESC, l_orderkey ASC,
             |  l_linenumber ASC LIMIT 100""".stripMargin)),

    Q("t2_topn",
      (s, dir) => t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n_customers"))
        .orderBy(col("n_customers").desc, col("n_name").asc)
        .limit(15),
      Some("""SELECT n_name, count(*) AS n_customers
             |FROM customer JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY n_name ORDER BY n_customers DESC, n_name ASC LIMIT 15"""
        .stripMargin)),

    // T4: argmin via min_by-with-tiebreak
    Q("t4_argmin_pick",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        t(s, dir, "customer").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"), col("c_custkey").as("poorest"),
            col("c_acctbal").as("min_bal"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (
             |  PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC)
             |  AS rn FROM customer)
             |SELECT c_nationkey, c_custkey AS poorest, c_acctbal AS min_bal
             |FROM ranked WHERE rn = 1""".stripMargin)),

    // U1: union by name with a missing column filled
    Q("u1_union_by_name",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(col("c_name").as("name"), col("c_acctbal").as("bal"),
            lit("customer").as("src"))
        val sup = t(s, dir, "supplier")
          .select(col("s_name").as("name"), col("s_acctbal").as("bal"),
            lit("supplier").as("src"))
        c.unionByName(sup).groupBy("src")
          .agg(count(lit(1)).as("n"), round(sum("bal"), 2).as("total_bal"))
      },
      Some("""SELECT src, count(*) AS n, round(sum(bal), 2) AS total_bal FROM (
             |  SELECT c_name AS name, c_acctbal AS bal, 'customer' AS src
             |    FROM customer
             |  UNION ALL
             |  SELECT s_name, s_acctbal, 'supplier' FROM supplier)
             |GROUP BY src""".stripMargin)),

    Q("u2_except",
      (s, dir) => t(s, dir, "customer").select("c_custkey")
        .except(t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))),
      Some("SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders")),

    Q("u3_intersect",
      (s, dir) => t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))),
      Some("""SELECT c_nationkey AS nationkey FROM customer
             |INTERSECT SELECT s_nationkey FROM supplier""".stripMargin)),

    // U5/U6: multiset (ALL) set ops — bag semantics where duplicate
    // multiplicity matters (EXCEPT ALL subtracts occurrence counts;
    // INTERSECT ALL keeps the minimum). Spark plans both as a single
    // count-respecting aggregate join, not a distinct.
    Q("u5_except_all",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"))
        .exceptAll(t(s, dir, "customer")
          .where(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey").as("custkey"))),
      Some("""SELECT o_custkey AS custkey FROM orders
             |EXCEPT ALL
             |SELECT c_custkey FROM customer
             |WHERE c_mktsegment = 'BUILDING'""".stripMargin)),

    Q("u6_intersect_all",
      (s, dir) => t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"))
        .intersectAll(t(s, dir, "lineitem")
          .where(col("l_quantity") >= 45)
          .select(pmod(col("l_orderkey"), lit(1500)).as("custkey"))),
      Some("""SELECT o_custkey AS custkey FROM orders
             |INTERSECT ALL
             |SELECT l_orderkey % 1500 FROM lineitem
             |WHERE l_quantity >= 45""".stripMargin)),

    // U4: unpivot/melt — wide measure columns to (measure, value) rows,
    // the inverse reshape of a16_pivot. Narrow per-row expansion, no
    // shuffle. The oracle spells it as the equivalent UNION ALL.
    Q("u4_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .where(col("l_orderkey") < 1000)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "measure", "value"),
      Some {
        val arms = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(m => s"""SELECT l_orderkey, l_linenumber, '$m' AS measure,
                       |  $m AS value FROM lineitem
                       |WHERE l_orderkey < 1000""".stripMargin)
        arms.mkString("\nUNION ALL\n")
      })
  )

  // =================================================================
  // §2.8 scalar functions
  // =================================================================

  private val functionQueries = Seq(
    // F10/F11: haversine + equirectangular side by side
    Q("f10_geo_distances",
      (s, dir) => custPoints(s, dir).where(col("c_custkey") < 200)
        .select(col("c_custkey"),
          round(GeoFunctions.haversineM(col("lat"), col("lon"),
            lit(40.05), lit(-74.95)), 2).as("hav_m"),
          round(GeoFunctions.equirectM(col("lat"), col("lon"),
            lit(40.05), lit(-74.95)), 2).as("eq_m")),
      Some(s"""SELECT c_custkey,
              |  round(${havSql("lat", "lon", "40.05", "-74.95")}, 2) AS hav_m,
              |  round(sqrt(pow((-74.95 - lon) * (40075000.0 / 360.0) *
              |      cos(radians((lat + 40.05) / 2)), 2) +
              |    pow((40.05 - lat) * 111320.0, 2)), 2) AS eq_m
              |FROM ($custPointsSql) WHERE c_custkey < 200""".stripMargin)),

    // F16: composite content id (md5 for cross-engine parity; the library
    // also ships sha1Id for reference byte-parity)
    Q("f16_hash_id",
      (s, dir) => t(s, dir, "orders").where(col("o_orderkey") < 500)
        .select(col("o_orderkey"),
          md5(concat_ws("|", col("o_orderkey").cast("string"),
            col("o_orderstatus"), col("o_orderpriority"))).as("row_id")),
      Some("""SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR) || '|' ||
             |  o_orderstatus || '|' || o_orderpriority) AS row_id
             |FROM orders WHERE o_orderkey < 500""".stripMargin)),

    // F17/F18: price parsing from dirty strings (synthesized from integer
    // arithmetic so both engines build byte-identical inputs)
    Q("f17_price_parse",
      (s, dir) => {
        val cents = pmod(col("p_partkey") * 7919L, lit(1000000L))
        val dollars = floor(cents / 100.0).cast("long")
        val frac = pmod(cents, lit(100L))
        val grouped = when(dollars >= 1000,
          concat(floor(dollars / 1000.0).cast("long").cast("string"), lit(","),
            lpad(pmod(dollars, lit(1000L)).cast("string"), 3, "0")))
          .otherwise(dollars.cast("string"))
        t(s, dir, "part")
          .withColumn("dirty", concat(lit("$"), grouped, lit("."),
            lpad(frac.cast("string"), 2, "0"), lit(" USD")))
          .select(col("p_partkey"), col("dirty"),
            regexp_replace(regexp_extract(col("dirty"), "([0-9,]+\\.[0-9]+)", 1),
              ",", "").cast("double").as("parsed"))
      },
      Some("""WITH d AS (
             |  SELECT p_partkey, (p_partkey * 7919) % 1000000 AS cents FROM part),
             |d2 AS (
             |  SELECT p_partkey,
             |    CAST(floor(cents / 1e2) AS BIGINT) AS dollars,
             |    cents % 100 AS frac FROM d),
             |d3 AS (
             |  SELECT p_partkey, '$' ||
             |    CASE WHEN dollars >= 1000 THEN
             |      CAST(CAST(floor(dollars / 1e3) AS BIGINT) AS VARCHAR) || ',' ||
             |      lpad(CAST(dollars % 1000 AS VARCHAR), 3, '0')
             |    ELSE CAST(dollars AS VARCHAR) END ||
             |    '.' || lpad(CAST(frac AS VARCHAR), 2, '0') || ' USD' AS dirty
             |  FROM d2)
             |SELECT p_partkey, dirty,
             |  CAST(replace(regexp_extract(dirty, '([0-9,]+\.[0-9]+)', 1), ',', '')
             |    AS DOUBLE) AS parsed
             |FROM d3""".stripMargin)),

    // F19: ID float-tail fix
    Q("f19_id_cleanup",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 300)
        .withColumn("dirty_id", concat(col("c_custkey").cast("string"), lit(".0")))
        .select(col("c_custkey"),
          regexp_replace(trim(col("dirty_id")), "\\.0+$", "").as("clean_id")),
      Some("""SELECT c_custkey, regexp_replace(trim(CAST(c_custkey AS VARCHAR)
             |  || '.0'), '\.0+$', '') AS clean_id
             |FROM customer WHERE c_custkey < 300""".stripMargin)),

    // F22/F23: coalesce fallback + bool decode
    Q("f23_bool_decode",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 400)
        .withColumn("raw_flag",
          element_at(array(lit("t"), lit("True"), lit("1"), lit("TRUE"), lit("f")),
            (pmod(col("c_custkey"), lit(5)) + 1).cast("int")))
        .select(col("c_custkey"), col("raw_flag"),
          col("raw_flag").isin("t", "True", "1", "TRUE").as("decoded")),
      Some("""SELECT c_custkey,
             |  (['t', 'True', '1', 'TRUE', 'f'])[(c_custkey % 5) + 1] AS raw_flag,
             |  (['t', 'True', '1', 'TRUE', 'f'])[(c_custkey % 5) + 1]
             |    IN ('t', 'True', '1', 'TRUE') AS decoded
             |FROM customer WHERE c_custkey < 400""".stripMargin)),

    // F24: timestamp handling — hour-of-day histogram
    Q("f24_time_parts",
      (s, dir) => t(s, dir, "events")
        .groupBy(hour(col("ts")).as("hour_of_day"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value")),
      Some("""SELECT CAST(date_part('hour', ts) AS INT) AS hour_of_day,
             |  count(*) AS n, round(sum(value), 2) AS total_value
             |FROM events GROUP BY 1""".stripMargin)),

    // F25: JSON extraction from the events props column
    Q("f25_json_extract",
      (s, dir) => t(s, dir, "events")
        // events ships as ONE parquet row group, so the scan is one task;
        // rebalance (2 MB shuffle) before the per-row JSON parse or the
        // whole extraction serializes on a single core
        .repartition(col("event_id"))
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), round(avg("k"), 4).as("avg_k")),
      Some("""SELECT event_type, count(*) AS n,
             |  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4)
             |    AS avg_k
             |FROM events GROUP BY event_type""".stripMargin))
  )

  // =================================================================
  // §2.5 graph / ER operators
  // =================================================================

  private val graphQueries = Seq(
    // G1: banded pair-acceptance rule over the grid self-join candidates
    Q("g1_acceptance_rule",
      (s, dir) => {
        val pairs = SpatialJoins.gridSelfJoin(
          custPoints(s, dir).withColumn("name", col("c_name")),
          "c_custkey", "lat", "lon", radiusM = 250.0)
        val withSim = pairs
          .join(t(s, dir, "customer").select(col("c_custkey").as("a_id"),
            col("c_name").as("a_name")), "a_id")
          .join(t(s, dir, "customer").select(col("c_custkey").as("b_id"),
            col("c_name").as("b_name")), "b_id")
          .withColumn("sim", TextFunctions.levRatioCol(col("a_name"), col("b_name")))
        withSim.withColumn("accepted",
            (col("sim") >= 0.9) ||
            (col("sim") >= 0.85 && col("meters") <= 200.0) ||
            (col("sim") >= 0.8 && col("meters") <= 180.0))
          .where(col("accepted"))
          .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"),
            round(col("meters"), 2).as("meters"))
      },
      Some(s"""WITH pts AS ($custPointsSql),
              |pairs AS (
              |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |    a.c_name AS a_name, b.c_name AS b_name,
              |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS meters
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
              |scored AS (SELECT *, 1.0 - levenshtein(a_name, b_name) /
              |  greatest(length(a_name), length(b_name)) AS sim FROM pairs)
              |SELECT a_id, b_id, round(sim, 4) AS sim, round(meters, 2) AS meters
              |FROM scored
              |WHERE sim >= 0.9 OR (sim >= 0.85 AND meters <= 200.0)
              |  OR (sim >= 0.8 AND meters <= 180.0)""".stripMargin)),

    // G2: connected components over near-pair edges (min-label fixpoint)
    Q("g2_connected_components",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        ConnectedComponents.run(edges)
      },
      Some(s"""WITH RECURSIVE pts AS ($custPointsSql),
              |edges AS (
              |  SELECT a.c_custkey AS src, b.c_custkey AS dst
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
              |sym AS (
              |  SELECT src AS u, dst AS v FROM edges
              |  UNION SELECT dst, src FROM edges
              |  UNION SELECT src, src FROM edges
              |  UNION SELECT dst, dst FROM edges),
              |reach AS (
              |  SELECT u, v FROM sym
              |  UNION
              |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u)
              |SELECT u AS node, min(v) AS component FROM reach GROUP BY u"""
        .stripMargin)),

    // G3: canonical-id minting from the longest member name per cluster
    Q("g3_canonical_mint",
      (s, dir) => {
        val w = Window.partitionBy("c_nationkey")
          .orderBy(length(col("c_name")).desc, col("c_name").asc)
        // "St. " prefix exercises norm_name's kept-punctuation class
        // (.,:_ survive; # is dropped) — reference etl/er.py:30-34
        t(s, dir, "customer").withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("c_nationkey"),
            concat(TextFunctions.normNameUdf(concat(lit("St. "), col("c_name"))),
              lit("::"), col("c_nationkey").cast("string")).as("canonical_id"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (
             |  PARTITION BY c_nationkey
             |  ORDER BY length(c_name) DESC, c_name ASC) AS rn FROM customer)
             |SELECT c_nationkey,
             |  regexp_replace(regexp_replace(lower(trim('St. ' || c_name)),
             |    '\s+', '-', 'g'), '[^a-z0-9\-:_.,]+', '', 'g')
             |  || '::' || CAST(c_nationkey AS VARCHAR) AS canonical_id
             |FROM ranked WHERE rn = 1""".stripMargin)),

    // G4: point-in-region assignment cascade, all three geometry rules
    // under the oracle (polygon ray-cast -> bbox -> radius), with the
    // reference's tie-breaks: polygon/bbox by config order (city_id), the
    // radius rule by distance. Each city gets a diamond polygon inside its
    // bbox so points exercise every rule.
    Q("g4_region_cascade",
      (s, dir) => {
        val cities = t(s, dir, "region")
          .select(col("r_regionkey").as("city_id"),
            (lit(40.0) + col("r_regionkey") * 0.04).as("center_lat"),
            lit(-74.95).as("center_lon"))
          .withColumn("min_lat", col("center_lat") - 0.01)
          .withColumn("max_lat", col("center_lat") + 0.01)
          .withColumn("min_lon", col("center_lon") - 0.02)
          .withColumn("max_lon", col("center_lon") + 0.02)
          .withColumn("polygon", array(
            struct((col("center_lat") + 0.008).as("lat"), col("center_lon").as("lon")),
            struct(col("center_lat").as("lat"), (col("center_lon") + 0.016).as("lon")),
            struct((col("center_lat") - 0.008).as("lat"), col("center_lon").as("lon")),
            struct(col("center_lat").as("lat"), (col("center_lon") - 0.016).as("lon"))))
        val pts = custPoints(s, dir)
        val cand = pts.crossJoin(broadcast(cities))
          .withColumn("in_poly", GeoFunctions.pointInPolygonUdf(col("lat"),
            col("lon"), col("polygon")))
          .withColumn("in_bbox", GeoFunctions.bboxContains(col("lat"), col("lon"),
            col("min_lat"), col("min_lon"), col("max_lat"), col("max_lon")))
          .withColumn("center_m", GeoFunctions.haversineM(col("lat"), col("lon"),
            col("center_lat"), col("center_lon")))
          .withColumn("rule", when(col("in_poly"), 1).when(col("in_bbox"), 2)
            .when(col("center_m") <= 3000.0, 3))
          .where(col("rule").isNotNull)
        val w = Window.partitionBy("c_custkey")
          .orderBy(col("rule").asc,
            when(col("rule") === 3, col("center_m"))
              .otherwise(col("city_id").cast("double")).asc,
            col("city_id").asc)
        cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("c_custkey"), col("city_id"), col("rule"),
            round(col("center_m"), 2).as("center_m"))
      },
      Some(s"""WITH cities AS (
              |  SELECT r_regionkey AS city_id,
              |    40e0 + r_regionkey * 4e-2 AS center_lat,
              |    -7.495e1 AS center_lon FROM region),
              |pts AS ($custPointsSql),
              |verts AS (
              |  SELECT city_id, center_lat, center_lon, v,
              |    CASE v WHEN 0 THEN center_lat + 8e-3 WHEN 1 THEN center_lat
              |           WHEN 2 THEN center_lat - 8e-3 ELSE center_lat END AS vy,
              |    CASE v WHEN 0 THEN center_lon WHEN 1 THEN center_lon + 1.6e-2
              |           WHEN 2 THEN center_lon ELSE center_lon - 1.6e-2 END AS vx
              |  FROM cities, (SELECT unnest(range(0, 4)) AS v)),
              |edges AS (
              |  SELECT a.city_id, a.vy AS yi, a.vx AS xi, b.vy AS yj, b.vx AS xj
              |  FROM verts a JOIN verts b
              |    ON a.city_id = b.city_id AND b.v = (a.v + 3) % 4),
              |poly AS (
              |  SELECT p.c_custkey, e.city_id,
              |    sum(CASE WHEN ((xi > p.lon) <> (xj > p.lon)) AND
              |      (p.lat < (yj - yi) * (p.lon - xi) / ((xj - xi) + 1e-12) + yi)
              |      THEN 1 ELSE 0 END) % 2 = 1 AS in_poly
              |  FROM pts p CROSS JOIN edges e GROUP BY p.c_custkey, e.city_id),
              |cand AS (
              |  SELECT p.c_custkey, c.city_id, poly.in_poly,
              |    (lat >= center_lat - 1e-2 AND lat <= center_lat + 1e-2 AND
              |     lon >= center_lon - 2e-2 AND lon <= center_lon + 2e-2) AS in_bbox,
              |    ${havSql("lat", "lon", "center_lat", "center_lon")} AS center_m
              |  FROM pts p CROSS JOIN cities c
              |  JOIN poly ON poly.c_custkey = p.c_custkey
              |    AND poly.city_id = c.city_id),
              |ruled AS (
              |  SELECT *, CASE WHEN in_poly THEN 1 WHEN in_bbox THEN 2
              |    WHEN center_m <= 3e3 THEN 3 END AS rule
              |  FROM cand
              |  WHERE in_poly OR in_bbox OR center_m <= 3e3),
              |ranked AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
              |  ORDER BY rule ASC,
              |    CASE WHEN rule = 3 THEN center_m
              |         ELSE CAST(city_id AS DOUBLE) END ASC,
              |    city_id ASC) AS rn FROM ruled)
              |SELECT c_custkey, city_id, rule, round(center_m, 2) AS center_m
              |FROM ranked WHERE rn = 1""".stripMargin)),

    // G8: ER audit — near pairs in a distance band NOT accepted by G1
    Q("g8_audit_band",
      (s, dir) => {
        val pairs = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .join(t(s, dir, "customer").select(col("c_custkey").as("a_id"),
            col("c_name").as("a_name")), "a_id")
          .join(t(s, dir, "customer").select(col("c_custkey").as("b_id"),
            col("c_name").as("b_name")), "b_id")
          .withColumn("sim", TextFunctions.levRatioCol(col("a_name"), col("b_name")))
        pairs.where(col("meters") >= 150.0 && col("meters") <= 180.0 &&
            col("sim") <= 0.85)
          .select(col("a_id"), col("b_id"), round(col("sim"), 4).as("sim"))
      },
      Some(s"""WITH pts AS ($custPointsSql),
              |pairs AS (
              |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |    a.c_name AS a_name, b.c_name AS b_name,
              |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS meters
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0)
              |SELECT a_id, b_id, round(1.0 - levenshtein(a_name, b_name) /
              |  greatest(length(a_name), length(b_name)), 4) AS sim
              |FROM pairs
              |WHERE meters >= 150.0 AND meters <= 180.0
              |  AND 1.0 - levenshtein(a_name, b_name) /
              |    greatest(length(a_name), length(b_name)) <= 0.85""".stripMargin))
  )

  // =================================================================
  // LLM-data-pipeline operators: dedup / similarity search / text analysis
  // =================================================================

  /** DuckDB fragment: alnum tokens of `rel`.text (mirrors Dedup.tokens). */
  private def toksSqlFrom(rel: String): String =
    s"""SELECT doc_id AS id, text,
       |  list_filter(string_split(trim(regexp_replace(lower(text),
       |    '[^a-z0-9]+', ' ', 'g')), ' '), x -> len(x) > 0) AS tk
       |FROM $rel""".stripMargin
  private val toksSql = toksSqlFrom("documents")

  /** DuckDB fragment: distinct word 3-gram shingles (mirrors Dedup.shingles). */
  private def shinglesSqlFrom(rel: String): String =
    s"""SELECT id, CASE WHEN len(tk) < 3
       |  THEN list_distinct([array_to_string(tk, ' ')])
       |  ELSE list_distinct(list_transform(range(0, len(tk) - 2),
       |    i -> array_to_string(tk[i+1:i+3], ' '))) END AS sh
       |FROM (${toksSqlFrom(rel)})""".stripMargin
  private val shinglesSql = shinglesSqlFrom("documents")

  /** DuckDB Gopher-feature CTE chain over `rel(id, text, tk)`, ending in
    * `gf(doc_id, n_words, mean_word_len, symbol_ratio, frac_alpha_words,
    * stop_hits, frac_bullet_lines, frac_ellipsis_lines)` — mirrors
    * TextAnalysis.gopherKernel. Shared by ta_gopher_rules and
    * pipe_c4_corpus so the rule SQL cannot drift between rows. */
  private def gopherCtes(rel: String): String = {
    val stops = TextAnalysis.gopherStops.map(w => s"'$w'").mkString(", ")
    val ws = "[ \\t\\n\\r\\f\\x0B]"
    val wsNoNl = "[ \\t\\r\\f\\x0B]"
    s"""gfx AS (
       |  SELECT id AS doc_id, text, tk,
       |    list_filter(string_split(regexp_replace(text, '$ws+', ' ', 'g'),
       |      ' '), w_ -> len(w_) > 0) AS words,
       |    string_split(text, chr(10)) AS lines
       |  FROM $rel),
       |gf AS (
       |  SELECT doc_id,
       |    len(words)::BIGINT AS n_words,
       |    round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
       |      ${foldSql("list_transform(words, w_ -> len(w_)::DOUBLE)")} /
       |      len(words) END, 6) AS mean_word_len,
       |    round(CASE WHEN len(words) = 0 THEN 0.0 ELSE (
       |      (length(text) - length(replace(text, '#', ''))) +
       |      (length(text) - length(replace(text, '…', ''))) +
       |      ((length(text) - length(replace(text, '...', ''))) // 3)
       |      )::DOUBLE / len(words) END, 6) AS symbol_ratio,
       |    round(CASE WHEN len(words) = 0 THEN 0.0 ELSE
       |      len(list_filter(words, w_ -> regexp_matches(w_, '[a-zA-Z]')))
       |      ::DOUBLE / len(words) END, 6) AS frac_alpha_words,
       |    len(list_intersect(tk, [$stops]))::BIGINT AS stop_hits,
       |    round(len(list_filter(lines, l_ ->
       |      regexp_matches(l_, '^$wsNoNl*[-*•]')))::DOUBLE / len(lines), 6)
       |      AS frac_bullet_lines,
       |    round(len(list_filter(lines, l_ ->
       |      regexp_matches(l_, '(\\.\\.\\.|…)$wsNoNl*$$')))::DOUBLE /
       |      len(lines), 6) AS frac_ellipsis_lines
       |  FROM gfx)""".stripMargin
  }

  /** The Gopher keep conjunction over gf's columns (thresholds from Rae
    * et al. 2021 Table A1; word-count floor and required-stopword count
    * parameterized like Pipelines.buildC4Corpus). */
  private def gopherKeepSql(minWords: Int, minStopHits: Int): String =
    s"""(n_words >= $minWords AND n_words <= 100000 AND
       |   mean_word_len >= 3e0 AND mean_word_len <= 1e1 AND
       |   symbol_ratio < 1e-1 AND frac_alpha_words >= 8e-1 AND
       |   stop_hits >= $minStopHits AND frac_bullet_lines < 9e-1 AND
       |   frac_ellipsis_lines < 3e-1)""".stripMargin

  /** DuckDB replay of the 4-token-line synthesis + Dedup.lineDedup
    * (minLen=10, maxLines=2^20) over the documents table, ending in
    * `lined_docs(doc_id, text, n_lines, n_dropped)` — shared by
    * dd_line_dedup and pipe_c4_corpus so the line-dedup SQL cannot
    * drift between rows. */
  private def lineDedupCtes: String =
    s"""ldt AS ($toksSql),
       |ldl AS (
       |  SELECT id AS doc_id, i::BIGINT AS line_no,
       |    array_to_string(tk[i*4+1:i*4+4], ' ') AS line
       |  FROM ldt, range(0, 100) AS r(i)
       |  WHERE i < greatest(CAST(ceil(len(tk) / 4e0) AS BIGINT), 1)),
       |ldk AS (SELECT doc_id, line_no, line,
       |      doc_id * 1048576 + line_no AS k FROM ldl),
       |ldf AS (SELECT line, min(k) AS first_k FROM ldk
       |        WHERE length(line) >= 10 GROUP BY line),
       |ldg AS (SELECT ldk.doc_id, ldk.line_no, ldk.line,
       |      (first_k IS NULL OR first_k = ldk.k) AS keep
       |      FROM ldk LEFT JOIN ldf USING (line)),
       |lined_docs AS (
       |  SELECT doc_id,
       |    coalesce(array_to_string(list(line ORDER BY line_no)
       |      FILTER (WHERE keep), chr(10)), '') AS text,
       |    count(*)::BIGINT AS n_lines,
       |    sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped
       |  FROM ldg GROUP BY doc_id)""".stripMargin

  /** DuckDB composite-quality-score expression over (text, token-list)
    * refs — mirrors TextAnalysis.qualityScore exactly (shared by ta_quality
    * and the corpus-cleaning pipeline oracle). */
  private def qualitySql(text: String, tk: String): String = {
    val stop = TextAnalysis.markers("en").map(w => s"'$w'").mkString(", ")
    s"""round(greatest(0e0,
       |    least(len($tk)::DOUBLE / 50.0, 1e0) * 0.4 +
       |    least(round(CASE WHEN len($tk) = 0 THEN 0.0 ELSE
       |      len(list_filter($tk, x_ -> list_contains([$stop], x_)))::DOUBLE /
       |      len($tk) END, 6) * 5.0, 1e0) * 0.4 +
       |    (1e0 - least((round(CASE WHEN length($text) = 0 THEN 0.0 ELSE
       |      (length($text) - length(regexp_replace($text, '[\\.,;:!\\?]', '', 'g')))
       |      ::DOUBLE / length($text) END, 6) +
       |      round(CASE WHEN length($text) = 0 THEN 0.0 ELSE
       |      (length($text) - length(regexp_replace($text, '[0-9]', '', 'g')))
       |      ::DOUBLE / length($text) END, 6)) * 5.0, 1e0)) * 0.2), 6)"""
      .stripMargin
  }

  /** DuckDB language-ID CASE chain over a token-list ref — mirrors
    * TextAnalysis.langId. */
  private def langIdCaseSql(tk: String): String = {
    val langs = TextAnalysis.markers.keys.toSeq.sorted
    def hits(l: String) = {
      val arr = TextAnalysis.markers(l).map(w => s"'$w'").mkString(", ")
      s"len(list_intersect($tk, [$arr]))"
    }
    val chain = langs.map { l =>
      val isMax = langs.filter(_ != l).map(o => s"${hits(l)} >= ${hits(o)}")
        .mkString(" AND ")
      s"WHEN $isMax AND ${hits(l)} > 0 THEN '$l'"
    }.mkString(" ")
    s"CASE $chain ELSE 'und' END"
  }

  /** Deterministic HTML page render for the html-extraction rows: wraps a
    * document's text in the boilerplate a real crawl carries — nav bar,
    * ad unit, title/heading chrome, footer, script/style/comment noise
    * (including a `<div>` inside the script and a bare `<` in its code,
    * which a naive tag-strip would mangle) — with the content
    * entity-escaped and split across two `<p>` blocks. BOTH engines
    * synthesize AND extract independently from the raw documents table,
    * so the oracle checks the whole extraction pipeline, not a replay. */
  private def synthHtmlCol(docId: Column, text: Column): Column = {
    val esc = replace(replace(replace(text,
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    concat(
      lit("<html><head><title>Doc "), docId.cast("string"), lit("</title>"),
      lit("<style>p { margin: 0; } .x > y { color: red; }</style>"),
      lit("<script>if (a < b) { track(\"page\"); } // <div>skip me</div></script>"),
      lit("</head><body>"),
      lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about us</a>" +
        " <a href=\"/contact\">contact</a></nav>"),
      lit("<h1>Entry "), docId.cast("string"), lit("</h1>"),
      lit("<!-- build "), docId.cast("string"), lit(" -->"),
      lit("<p>"), substring(esc, 1, 120), lit("</p><p>"),
      substring(esc, 121, 1000000), lit("</p>"),
      lit("<div class=\"ad\"><a href=\"/buy\">buy now before the offer" +
        " expires</a>&nbsp;today</div>"),
      lit("<footer>&copy; 2026 corpus&nbsp;&amp;&nbsp;co</footer>"),
      lit("</body></html>"))
  }

  /** The DuckDB render of [[synthHtmlCol]] over `documents` columns. */
  private val synthHtmlSql: String = {
    val esc =
      "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    s"""'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) || '</title>' ||
       |'<style>p { margin: 0; } .x > y { color: red; }</style>' ||
       |'<script>if (a < b) { track("page"); } // <div>skip me</div></script>' ||
       |'</head><body>' ||
       |'<nav><a href="/">home</a> <a href="/about">about us</a> <a href="/contact">contact</a></nav>' ||
       |'<h1>Entry ' || CAST(doc_id AS VARCHAR) || '</h1>' ||
       |'<!-- build ' || CAST(doc_id AS VARCHAR) || ' -->' ||
       |'<p>' || substr($esc, 1, 120) || '</p><p>' || substr($esc, 121, 1000000) || '</p>' ||
       |'<div class="ad"><a href="/buy">buy now before the offer expires</a>&nbsp;today</div>' ||
       |'<footer>&copy; 2026 corpus&nbsp;&amp;&nbsp;co</footer>' ||
       |'</body></html>'""".stripMargin
  }

  /** DuckDB replay of [[TextAnalysis.htmlExtract]]: the identical regex
    * spec (script/style/comment strip, block split, tag strip + entity
    * decode + whitespace collapse, `len >= minLen` and
    * `2*linkLen < textLen` keep rules) in RE2/list functions. */
  private def htmlExtractSql(c: String, minLen: Int = 25): String = {
    val stripped =
      s"""regexp_replace(regexp_replace(regexp_replace($c,
         |  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |  '(?s)<!--.*?-->', ' ', 'g')""".stripMargin
    // explicit whitespace class: Java \s includes \x0B, RE2's does not
    def btxt(b: String) =
      s"""trim(regexp_replace(replace(replace(replace(replace(
         |  regexp_replace($b, '<[^>]*>', ' ', 'g'),
         |  '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
         |  '[ \\t\\n\\r\\f\\x0B]+', ' ', 'g'))""".stripMargin
    // coalesce: DuckDB's array_to_string is NULL on an empty list where
    // Spark's array_join is '' — an anchor-free block must score ll=0.
    val link =
      s"coalesce(array_to_string(regexp_extract_all(b_, '(?is)<a[^>]*>(.*?)</a>', 1), ' '), '')"
    s"""coalesce(array_to_string(list_transform(list_filter(
       |  regexp_split_to_array($stripped, '${TextAnalysis.HtmlBlockPattern}'),
       |  b_ -> length(${btxt("b_")}) >= $minLen
       |    AND length(${btxt(link)}) * 2 < length(${btxt("b_")})),
       |  b_ -> ${btxt("b_")}), chr(10)), '')""".stripMargin
  }

  /** DuckDB: md5-derived 32-bit hash under a seed (mirrors Dedup.md5Hash32). */
  private def h32Sql(expr: String, seed: String) =
    s"('0x' || substr(md5(CAST($seed AS VARCHAR) || ':' || $expr), 1, 8))::BIGINT"

  /** DuckDB replay of `Dedup.minHashIndex(rel, "doc_id", "text",
    * shingleN=3, bands=8, rowsPerBand=2)` as a CTE chain `sh -> h1 ->
    * sig -> banded(id, sig, band, bucket)` — the ONE copy of the
    * MinHash banding SQL. Shared (via [[minhashBandedSql]] over
    * `documents`) by dd_minhash_lsh, dd_incremental(+bucketed),
    * st_dedup_index, st_compact_probe, dd_cluster_keep,
    * dd_ngram_jaccard, and dd_blocking_quality, and (via
    * [[lshDropsSqlFrom]]) by the corpus pipelines, so the banding SQL
    * cannot drift between rows. */
  private def minhashBandedSqlFrom(rel: String): String =
    s"""sh AS (${shinglesSqlFrom(rel)}),
       |h1 AS (
       |  SELECT id, list_transform(sh, s -> ${h32Sql("s", "0")}) AS h1
       |  FROM sh),
       |sig AS (
       |  SELECT id, list_transform(range(0, 16), i ->
       |    list_min(list_transform(h1,
       |      h -> (h * (i * 2 + 3) + i * 12582917) % 4294967291))) AS sig
       |  FROM h1),
       |banded AS (
       |  SELECT id, sig, b AS band,
       |    md5(b::VARCHAR || '_' || sig[b*2+1]::VARCHAR || '_' ||
       |      sig[b*2+2]::VARCHAR) AS bucket
       |  FROM sig, (SELECT unnest(range(0, 8)) AS b))""".stripMargin
  private val minhashBandedSql = minhashBandedSqlFrom("documents")

  /** DuckDB replay of connected components over the verified MinHash
    * near-dup pairs (simThreshold = 0.5): CTEs `cand -> pairs -> sym ->
    * reach -> comp(node, component = min reachable id)`, continuing
    * from [[minhashBandedSqlFrom]]'s `banded` under WITH RECURSIVE —
    * ONE copy shared by dd_cluster_keep and ds_split_leakage so the
    * component SQL cannot drift between the dedup and the split. */
  private def lshComponentsSql: String =
    s"""cand AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
       |    a.sig AS a_sig, b.sig AS b_sig
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
       |pairs AS (
       |  SELECT a_id, b_id FROM cand
       |  WHERE list_sum(list_transform(range(1, 17), i ->
       |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
       |    >= 0.5),
       |sym AS (
       |  SELECT a_id AS u, b_id AS v FROM pairs
       |  UNION SELECT b_id, a_id FROM pairs
       |  UNION SELECT a_id, a_id FROM pairs
       |  UNION SELECT b_id, b_id FROM pairs),
       |reach AS (
       |  SELECT u, v FROM sym
       |  UNION
       |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
       |comp AS (SELECT u AS node, min(v) AS component
       |         FROM reach GROUP BY u)""".stripMargin

  /** DuckDB replay of `Dedup.minHashLSH(rel, "doc_id", "text", shingleN=3,
    * bands=8, rowsPerBand=2, simThreshold=0.5)` as a CTE chain ending in
    * `drops(b_id)` — the higher id of every verified near-dup pair.
    * Shared by the corpus-pipeline oracles so the LSH SQL cannot drift
    * between pipe_clean_corpus, pipe_training_corpus, and
    * pipe_html_corpus. */
  private def lshDropsSqlFrom(rel: String): String =
    s"""${minhashBandedSqlFrom(rel)},
       |pairs AS (
       |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
       |    a.sig AS a_sig, b.sig AS b_sig
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
       |drops AS (
       |  SELECT DISTINCT b_id FROM pairs
       |  WHERE list_sum(list_transform(range(1, 17), i ->
       |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
       |    >= 0.5)""".stripMargin

  /** DuckDB: sequential double fold of a list (mirrors Spark `aggregate`). */
  private def foldSql(listExpr: String) =
    s"list_reduce(list_prepend(0e0, $listExpr), (acc_, x_) -> acc_ + x_)"

  /** DuckDB: cosine of two FLOAT[] columns in double, sequential sums. */
  private def cosSql(a: String, b: String) = {
    val dot = foldSql(s"list_transform(range(0, 64), d -> $a[d+1]::DOUBLE * $b[d+1]::DOUBLE)")
    val na = s"sqrt(${foldSql(s"list_transform(range(0, 64), d -> $a[d+1]::DOUBLE * $a[d+1]::DOUBLE)")})"
    val nb = s"sqrt(${foldSql(s"list_transform(range(0, 64), d -> $b[d+1]::DOUBLE * $b[d+1]::DOUBLE)")})"
    s"CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 ELSE $dot / ($na * $nb) END"
  }

  /** 4-token-per-line re-rendering of the documents table — the
    * multi-line corpus behind dd_line_dedup and pipe_c4_corpus (both
    * engines synthesize independently, the htmlPage precedent). The
    * token array materializes ONCE per row before the per-chunk lambda —
    * the SCALE.md HOF rule: slicing an unmaterialized tokens(text)
    * expression re-runs the regex+split per chunk (measured 7.12 ->
    * 4.41 s at sf0.1 for dd_line_dedup). */
  private[graft] def linedDocs(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val tk = col("tk")
    val nCh = ceil(size(tk).cast("double") / 4.0).cast("int")
    t(s, dir, "documents")
      .select(col("doc_id"), Dedup.tokens(col("text")).as("tk"))
      .select(col("doc_id"),
        array_join(transform(
          sequence(lit(0), greatest(nCh, lit(1)) - 1),
          i => concat_ws(" ", slice(tk, i * lit(4) + 1, lit(4)))), "\n")
          .as("text"))
  }

  /** The image-corpus render behind `pipe_image_dedup` (and the scale
    * probe tool `graft.tools.ProbeImagePairs`): one tiny image per doc in
    * three real container formats, where ids 2g/2g+1 form a near-dup pair
    * (a single +1 on the corner pixel). */
  private[graft] def imageCorpus(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val spark = s
    import spark.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long]
      .map { id =>
        val g = id / 2
        val v = (id % 2).toInt
        val gray = Array.tabulate(9 * 8) { i =>
          val x = i % 9; val y = i / 9
          val gm = g % 1000003
          ((x + 9L * y + 1L + gm) * (x + 9L * y + 13L + 2L * gm)
            % 100003L % 200L + 28L).toInt +
            (if (v == 1 && x == 0 && y == 0) 1 else 0)
        }
        val rgb = Array.tabulate(9 * 8 * 3)(i => gray(i / 3).toByte)
        val p = (g % 3).toInt match {
          case 0 => Multimodal.pngEncodeRgb(9, 8, rgb)
          case 1 =>
            val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
            Gif.encodeGif(9, 8, pal, gray.map(_.toByte))
          case _ => Multimodal.bmpEncodeRgb(9, 8, rgb)
        }
        (id, p)
      }.toDF("doc_id", "payload")
  }

  private val pipelineQueries = Seq(
    // Exact dedup by content digest
    Q("dd_exact",
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text"),
      Some("""SELECT md5(text) AS digest, min(doc_id) AS keep_id,
             |  count(*) AS dup_count
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // MinHash + LSH near-dup candidates (16 hashes, 8 bands x 2 rows)
    Q("dd_minhash_lsh",
      (s, dir) => Dedup.minHashLSH(t(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.25),
      Some(s"""WITH $minhashBandedSql,
              |pairs AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
              |    a.sig AS a_sig, b.sig AS b_sig
              |  FROM banded a JOIN banded b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
              |SELECT a_id, b_id,
              |  list_sum(list_transform(range(1, 17), i ->
              |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |    AS sig_sim
              |FROM pairs
              |WHERE list_sum(list_transform(range(1, 17), i ->
              |  CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |  >= 0.25""".stripMargin)),

    // Incremental (append-batch) dedup: every 4th doc is the "new batch",
    // the rest are the already-indexed corpus — batch-vs-index and
    // batch-vs-batch candidates only; the indexed corpus is never paired
    // against itself (the steady-state ingest shape at 100 TB).
    Q("dd_incremental",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val index = Dedup.minHashIndex(
          docs.where(pmod(col("doc_id"), lit(4)) =!= 0), "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2)
        Dedup.incrementalMinHash(index,
          docs.where(pmod(col("doc_id"), lit(4)) === 0), "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.25)
      },
      Some(s"""WITH $minhashBandedSql,
              |old AS (SELECT * FROM banded WHERE id % 4 <> 0),
              |new AS (SELECT * FROM banded WHERE id % 4 = 0),
              |cand AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
              |    'vs_index' AS kind, a.sig AS a_sig, b.sig AS b_sig
              |  FROM old a JOIN new b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id <> b.id
              |  UNION
              |  SELECT DISTINCT a.id, b.id, 'within_batch', a.sig, b.sig
              |  FROM new a JOIN new b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
              |SELECT a_id, b_id, kind,
              |  list_sum(list_transform(range(1, 17), i ->
              |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |    AS sig_sim
              |FROM cand
              |WHERE list_sum(list_transform(range(1, 17), i ->
              |  CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |  >= 0.25""".stripMargin)),

    // The same append-batch probe against a PERSISTED index, bucketed by
    // the probe keys (band, bucket): the standing corpus index pays its
    // layout once at write; each ingest then shuffles only the batch —
    // PlanSpec asserts the index side plans with no exchange. Results
    // are identical to dd_incremental (same oracle).
    //
    // SERIAL-RUN ASSUMPTION (same as the k6/j13 bucketed tables): the
    // table/path is keyed only by the dataset dir tag, so two CONCURRENT
    // runs against the same dataset would race on the overwrite, and the
    // layout persists across runs (which is the point — a standing index
    // is reused, not rebuilt). A multi-tenant deployment would key the
    // path by catalog namespace instead; the bench/verify harness runs
    // queries serially.
    Q("dd_incremental_bucketed",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val tbl = s"graft_mh_index_$tag"
        val docs = t(s, dir, "documents")
        Dedup.writeMinHashIndex(Dedup.minHashIndex(
            docs.where(pmod(col("doc_id"), lit(4)) =!= 0), "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2),
          tbl, s"/tmp/graft_bucketed/${tag}_mh_index")
        Dedup.incrementalMinHash(s.table(tbl),
          docs.where(pmod(col("doc_id"), lit(4)) === 0), "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.25)
      },
      Some(s"""WITH $minhashBandedSql,
              |old AS (SELECT * FROM banded WHERE id % 4 <> 0),
              |new AS (SELECT * FROM banded WHERE id % 4 = 0),
              |cand AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
              |    'vs_index' AS kind, a.sig AS a_sig, b.sig AS b_sig
              |  FROM old a JOIN new b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id <> b.id
              |  UNION
              |  SELECT DISTINCT a.id, b.id, 'within_batch', a.sig, b.sig
              |  FROM new a JOIN new b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
              |SELECT a_id, b_id, kind,
              |  list_sum(list_transform(range(1, 17), i ->
              |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |    AS sig_sim
              |FROM cand
              |WHERE list_sum(list_transform(range(1, 17), i ->
              |  CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |  >= 0.25""".stripMargin)),

    // ST: streaming dedup against the STANDING index — continuous-
    // ingest shape: micro-batches arrive in order, each probes the
    // persisted bucketed index plus all earlier batches, then appends
    // its signatures so later batches dedup against it. The registry
    // row runs DedupStream.ingestFold (the deterministic batch-
    // sequenced path); the foreachBatch streaming path is pinned
    // stream ≡ batch by DedupStreamSpec over a MemoryStream — the
    // st_ohlc gating pattern. B1 x B2 pairs surface as vs_index (B1
    // was already ingested when B2 arrived), NOT within_batch — the
    // semantic difference vs dd_incremental's one-shot batch.
    Q("st_dedup_index",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val tbl = s"graft_mh_stream_$tag"
        val docs = t(s, dir, "documents")
        Dedup.writeMinHashIndex(Dedup.minHashIndex(
            docs.where(pmod(col("doc_id"), lit(4)) =!= 0), "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2),
          tbl, s"/tmp/graft_bucketed/${tag}_stream_index")
        graft.streaming.DedupStream.ingestFold(s.table(tbl),
          Seq(docs.where(pmod(col("doc_id"), lit(8)) === 0),
            docs.where(pmod(col("doc_id"), lit(8)) === 4)),
          "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2,
          simThreshold = 0.25)
      },
      Some(s"""WITH $minhashBandedSql,
              |old AS (SELECT * FROM banded WHERE id % 4 <> 0),
              |b1 AS (SELECT * FROM banded WHERE id % 8 = 0),
              |b2 AS (SELECT * FROM banded WHERE id % 8 = 4),
              |i2 AS (SELECT * FROM old UNION ALL SELECT * FROM b1),
              |cand AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
              |    'vs_index' AS kind, 0 AS batch_id, a.sig AS a_sig,
              |    b.sig AS b_sig
              |  FROM old a JOIN b1 b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id <> b.id
              |  UNION
              |  SELECT DISTINCT a.id, b.id, 'within_batch', 0, a.sig, b.sig
              |  FROM b1 a JOIN b1 b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id
              |  UNION
              |  SELECT DISTINCT a.id, b.id, 'vs_index', 1, a.sig, b.sig
              |  FROM i2 a JOIN b2 b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id <> b.id
              |  UNION
              |  SELECT DISTINCT a.id, b.id, 'within_batch', 1, a.sig, b.sig
              |  FROM b2 a JOIN b2 b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
              |SELECT a_id, b_id, kind,
              |  list_sum(list_transform(range(1, 17), i ->
              |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |    AS sig_sim,
              |  CAST(batch_id AS BIGINT) AS batch_id
              |FROM cand
              |WHERE list_sum(list_transform(range(1, 17), i ->
              |  CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |  >= 0.25""".stripMargin)),

    // ST: standing-index COMPACTION + TTL, oracle-checked end-to-end —
    // the maintenance story that keeps the append-only index operable
    // long-run. Build the bucketed index (3/4 of the corpus), ingest one
    // micro-batch (ids %8==0) through the REAL probe-then-append path
    // (IncrementalIngest.ingestBatch), compact with a retention horizon
    // (age out ids < 100 — the id is the fixture's ingest watermark),
    // then probe the NEXT batch (ids %8==4) against the swapped-in
    // compacted table. The oracle models the retained population
    // directly, so pairs among retained ids are pinned identical to an
    // uncompacted run and pairs against aged-out ids provably absent.
    // CompactionSpec pins the physical side (fragments collapse to one
    // file per bucket, zero-shuffle rewrite, exchange-free probe layout
    // survives the atomic swap); this row pins the ANSWER.
    Q("st_compact_probe",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val tbl = s"graft_mh_ttl_$tag"
        val docs = t(s, dir, "documents")
        Dedup.writeMinHashIndex(Dedup.minHashIndex(
            docs.where(pmod(col("doc_id"), lit(4)) =!= 0), "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2),
          tbl, s"/tmp/graft_bucketed/${tag}_ttl_index")
        graft.streaming.IncrementalIngest.ingestBatch(
          docs.where(pmod(col("doc_id"), lit(8)) === 0),
          Dedup.minHashIndex(_, "doc_id", "text", shingleN = 3, bands = 8,
            rowsPerBand = 2),
          Dedup.incrementalMinHashBuckets(_, _, 16, 0.25),
          tbl, s"/tmp/graft_bucketed/${tag}_ttl_out", 0L)
        // compaction target must be a fresh location (the swap makes the
        // table external there; clear last run's files first)
        val cpath = s"/tmp/graft_bucketed/${tag}_ttl_compacted"
        val hp = new org.apache.hadoop.fs.Path(cpath)
        hp.getFileSystem(s.sparkContext.hadoopConfiguration).delete(hp, true)
        graft.streaming.IncrementalIngest.compactIndex(s, tbl, cpath,
          retain = col("id") >= 100)
        Dedup.incrementalMinHash(s.table(tbl),
          docs.where(pmod(col("doc_id"), lit(8)) === 4), "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.25)
      },
      Some(s"""WITH $minhashBandedSql,
              |idx AS (SELECT * FROM banded
              |        WHERE (id % 4 <> 0 OR id % 8 = 0) AND id >= 100),
              |b2 AS (SELECT * FROM banded WHERE id % 8 = 4),
              |cand AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
              |    'vs_index' AS kind, a.sig AS a_sig, b.sig AS b_sig
              |  FROM idx a JOIN b2 b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id <> b.id
              |  UNION
              |  SELECT DISTINCT a.id, b.id, 'within_batch', a.sig, b.sig
              |  FROM b2 a JOIN b2 b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id)
              |SELECT a_id, b_id, kind,
              |  list_sum(list_transform(range(1, 17), i ->
              |    CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |    AS sig_sim
              |FROM cand
              |WHERE list_sum(list_transform(range(1, 17), i ->
              |  CASE WHEN a_sig[i] = b_sig[i] THEN 1 ELSE 0 END))::DOUBLE / 16
              |  >= 0.25""".stripMargin)),

    // ST: streaming EMBEDDING dedup against a standing SRP-bucket index
    // — DedupStream for vectors: two arrival-ordered batches probe the
    // index (vs_index) and themselves (within_batch), exact cosine
    // verifies, and each batch's buckets join the index for the next.
    // The index is the only state; per-batch cost is O(batch + matching
    // buckets) regardless of history. Oracle replays the identical SRP
    // bucketing and the batch fold.
    Q("st_embed_dedup",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val index = Dedup.embedLshIndex(
          emb.where(pmod(col("vec_id"), lit(4)) =!= 0), "vec_id",
          "embedding", numPlanes = 8, tables = 4)
        graft.streaming.EmbedDedupStream.ingestFold(index,
          Seq(emb.where(pmod(col("vec_id"), lit(8)) === 0),
            emb.where(pmod(col("vec_id"), lit(8)) === 4)),
          "vec_id", "embedding", threshold = 0.3, numPlanes = 8,
          tables = 4)
      },
      Some {
        val buckets = (0 until 4).map(tb =>
          s"SELECT id, v, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM e")
          .mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |b AS ($buckets),
           |old AS (SELECT * FROM b WHERE id % 4 <> 0),
           |b1 AS (SELECT * FROM b WHERE id % 8 = 0),
           |b2 AS (SELECT * FROM b WHERE id % 8 = 4),
           |i2 AS (SELECT * FROM old UNION ALL SELECT * FROM b1),
           |cand AS (
           |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
           |    'vs_index' AS kind, 0 AS batch_id, a.v AS a_v, b.v AS b_v
           |  FROM old a JOIN b1 b
           |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id <> b.id
           |  UNION
           |  SELECT DISTINCT a.id, b.id, 'within_batch', 0, a.v, b.v
           |  FROM b1 a JOIN b1 b
           |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id
           |  UNION
           |  SELECT DISTINCT a.id, b.id, 'vs_index', 1, a.v, b.v
           |  FROM i2 a JOIN b2 b
           |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id <> b.id
           |  UNION
           |  SELECT DISTINCT a.id, b.id, 'within_batch', 1, a.v, b.v
           |  FROM b2 a JOIN b2 b
           |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id)
           |SELECT a_id, b_id, kind,
           |  round(${cosSql("a_v", "b_v")}, 6) AS cosine,
           |  CAST(batch_id AS BIGINT) AS batch_id
           |FROM cand WHERE ${cosSql("a_v", "b_v")} >= 0.3""".stripMargin
      }),

    // ST: FLAG-mode streaming embedding dedup — the scale-safe default
    // (pair emission above stays the opt-in for when pairs ARE the
    // product): each batch COLLAPSES exact-duplicate vectors to a
    // min-id rep before the LSH probe (the semanticDedup collapse —
    // an exact-dup mega-group costs one rep row + n-1 collapse flags,
    // never n^2/2 pairs), probes index + earlier reps, and emits
    // keep flags with a rep-multiplicity audit column. Only REPS'
    // buckets join the index: identical non-reps match later batches
    // through their rep (same vector, same buckets, cosine 1).
    Q("st_embed_dedup_collapse",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        // duplicate-heavy fixture: every 5th vector re-ingested under
        // a shifted id, so the collapse has real groups to collapse
        val dup = emb.where(pmod(col("vec_id"), lit(5)) === 0)
          .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
        val all = emb.unionByName(dup)
        val index = Dedup.embedLshIndex(
          all.where(pmod(col("vec_id"), lit(4)) =!= 0 &&
            col("vec_id") < 100000L),
          "vec_id", "embedding", numPlanes = 8, tables = 4)
        graft.streaming.EmbedDedupStream.ingestFoldCollapse(index,
          Seq(all.where(pmod(col("vec_id"), lit(8)) === 0 ||
              col("vec_id") >= 100000L),
            all.where(pmod(col("vec_id"), lit(8)) === 4 &&
              col("vec_id") < 100000L)),
          "vec_id", "embedding", threshold = 0.3, numPlanes = 8,
          tables = 4)
      },
      Some {
        val buckets = (0 until 4).map(tb =>
          s"SELECT id, v, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM ea")
          .mkString("\nUNION ALL\n")
        def collapseBatch(n: Int, src: String, idx: String) =
          s"""g$n AS (SELECT id, v,
             |  CASE WHEN len(v) = 0
             |      OR list_max(list_transform(v, x_ -> abs(x_))) <= 0
             |    THEN 'u:' || CAST(id AS VARCHAR)
             |    ELSE 'g:' || v::VARCHAR END AS gk
             |  FROM $src),
             |r$n AS (SELECT gk, min(id) AS rep_id, count(*) AS n_rep
             |        FROM g$n GROUP BY gk),
             |w$n AS (SELECT g$n.id, g$n.v, r$n.rep_id, r$n.n_rep
             |        FROM g$n JOIN r$n USING (gk)),
             |rb$n AS (SELECT b.* FROM b
             |         JOIN w$n ON b.id = w$n.id AND w$n.id = w$n.rep_id),
             |d$n AS (
             |  SELECT DISTINCT y.id AS rep_id FROM $idx x JOIN rb$n y
             |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id <> y.id
             |  WHERE ${cosSql("x.v", "y.v")} >= 0.3
             |  UNION
             |  SELECT DISTINCT y.id FROM rb$n x JOIN rb$n y
             |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id < y.id
             |  WHERE ${cosSql("x.v", "y.v")} >= 0.3),
             |f$n AS (SELECT w$n.id, w$n.rep_id,
             |    CAST(w$n.n_rep AS BIGINT) AS n_rep,
             |    CASE WHEN w$n.id <> w$n.rep_id OR d$n.rep_id IS NOT NULL
             |      THEN 0 ELSE 1 END AS keep,
             |    CAST(${n - 1} AS BIGINT) AS batch_id
             |  FROM w$n LEFT JOIN d$n ON w$n.rep_id = d$n.rep_id)"""
        s"""WITH e0 AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |ea AS (SELECT id, v FROM e0
           |       UNION ALL
           |       SELECT id + 100000, v FROM e0 WHERE id % 5 = 0),
           |b AS ($buckets),
           |old AS (SELECT * FROM b WHERE id % 4 <> 0 AND id < 100000),
           |${collapseBatch(1,
              "ea WHERE id % 8 = 0 OR id >= 100000", "old")},
           |i2 AS (SELECT * FROM old UNION ALL SELECT * FROM rb1),
           |${collapseBatch(2,
              "ea WHERE id % 8 = 4 AND id < 100000", "i2")}
           |SELECT id, rep_id, n_rep, keep, batch_id FROM f1
           |UNION ALL
           |SELECT id, rep_id, n_rep, keep, batch_id FROM f2""".stripMargin
      }),

    // ST: FLAG-mode streaming TEXT dedup — st_embed_dedup_collapse's
    // MinHash sibling (one shared IncrementalIngest.foldCollapse
    // skeleton): exact-duplicate texts collapse to a min-id rep by
    // text digest before the probe (identical text = identical
    // signature, so sig_sim is exactly 1 and the collapse is always
    // sound), reps probe the standing index + each other, per-id keep
    // flags + rep multiplicity out, reps-only index growth.
    Q("st_dedup_collapse",
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val dup = docs.where(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
        val all = docs.unionByName(dup)
        val index = Dedup.minHashIndex(
          all.where(pmod(col("doc_id"), lit(4)) =!= 0 &&
            col("doc_id") < 100000L),
          "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2)
        graft.streaming.DedupStream.ingestFoldCollapse(index,
          Seq(all.where(pmod(col("doc_id"), lit(8)) === 0 ||
              col("doc_id") >= 100000L),
            all.where(pmod(col("doc_id"), lit(8)) === 4 &&
              col("doc_id") < 100000L)),
          "doc_id", "text", shingleN = 3, bands = 8, rowsPerBand = 2,
          simThreshold = 0.25)
      },
      Some {
        val sim = """list_sum(list_transform(range(1, 17), i_ ->
                    |  CASE WHEN x.sig[i_] = y.sig[i_] THEN 1 ELSE 0
                    |  END))::DOUBLE / 16""".stripMargin
        def collapseBatch(n: Int, pred: String, idx: String) =
          s"""g$n AS (SELECT doc_id AS id, md5(text) AS gk
             |        FROM da WHERE $pred),
             |r$n AS (SELECT gk, min(id) AS rep_id, count(*) AS n_rep
             |        FROM g$n GROUP BY gk),
             |w$n AS (SELECT g$n.id, r$n.rep_id, r$n.n_rep
             |        FROM g$n JOIN r$n USING (gk)),
             |rb$n AS (SELECT b.* FROM banded b
             |         JOIN w$n ON b.id = w$n.id AND w$n.id = w$n.rep_id),
             |d$n AS (
             |  SELECT DISTINCT y.id AS rep_id FROM $idx x JOIN rb$n y
             |    ON x.band = y.band AND x.bucket = y.bucket
             |      AND x.id <> y.id
             |  WHERE $sim >= 0.25
             |  UNION
             |  SELECT DISTINCT y.id FROM rb$n x JOIN rb$n y
             |    ON x.band = y.band AND x.bucket = y.bucket
             |      AND x.id < y.id
             |  WHERE $sim >= 0.25),
             |f$n AS (SELECT w$n.id, w$n.rep_id,
             |    CAST(w$n.n_rep AS BIGINT) AS n_rep,
             |    CASE WHEN w$n.id <> w$n.rep_id OR d$n.rep_id IS NOT NULL
             |      THEN 0 ELSE 1 END AS keep,
             |    CAST(${n - 1} AS BIGINT) AS batch_id
             |  FROM w$n LEFT JOIN d$n ON w$n.rep_id = d$n.rep_id)"""
        s"""WITH d0 AS (SELECT doc_id, text FROM documents),
           |da AS (SELECT doc_id, text FROM d0
           |       UNION ALL
           |       SELECT doc_id + 100000, text FROM d0
           |       WHERE doc_id % 5 = 0),
           |${minhashBandedSqlFrom("da")},
           |old AS (SELECT * FROM banded
           |        WHERE id % 4 <> 0 AND id < 100000),
           |${collapseBatch(1, "doc_id % 8 = 0 OR doc_id >= 100000",
              "old")},
           |i2 AS (SELECT * FROM old UNION ALL SELECT * FROM rb1),
           |${collapseBatch(2, "doc_id % 8 = 4 AND doc_id < 100000",
              "i2")}
           |SELECT id, rep_id, n_rep, keep, batch_id FROM f1
           |UNION ALL
           |SELECT id, rep_id, n_rep, keep, batch_id FROM f2""".stripMargin
      }),

    // Cluster-level dedup: LSH pair graph -> connected components ->
    // canonical keep (longest text, min-id tiebreak). The transitive-
    // closure policy LLM corpus dedup uses, vs pipe_clean_corpus's
    // pairwise-greedy drop; singleton docs are their own component.
    Q("dd_cluster_keep",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minHashLSH(docs, "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.5)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val cc = ConnectedComponents.run(pairs)
          .withColumnRenamed("node", "doc_id")
        val labeled = docs.join(cc, Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("component"), col("doc_id")))
        val w = Window.partitionBy("component")
          .orderBy(length(col("text")).desc, col("doc_id").asc)
        labeled.withColumn("rn", row_number().over(w))
          .select(col("doc_id"), col("component"),
            (col("rn") === 1).cast("int").as("keep"))
      },
      Some(s"""WITH RECURSIVE $minhashBandedSql,
              |$lshComponentsSql,
              |lab AS (
              |  SELECT d.doc_id, d.text,
              |    coalesce(c.component, d.doc_id) AS component
              |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
              |ranked AS (
              |  SELECT doc_id, component, row_number() OVER (
              |    PARTITION BY component
              |    ORDER BY length(text) DESC, doc_id ASC) AS rn
              |  FROM lab)
              |SELECT doc_id, component,
              |  CASE WHEN rn = 1 THEN 1 ELSE 0 END AS keep
              |FROM ranked""".stripMargin)),

    // SimHash fingerprint near-dup pairs (hamming <= 3, byte-blocked:
    // 4 = maxHamming+1 chunks give pigeonhole-guaranteed recall)
    Q("dd_simhash",
      (s, dir) => Dedup.simHashPairs(t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3),
      Some(s"""WITH toks AS ($toksSql),
              |h AS (SELECT id, list_transform(tk, t -> ${h32Sql("t", "0")}) AS hs
              |      FROM toks),
              |fp AS (SELECT id, COALESCE(list_sum(list_transform(range(0, 32), j ->
              |    CASE WHEN COALESCE(list_sum(list_transform(hs, h ->
              |        CASE WHEN CAST(floor(h / pow(2e0, j)) AS BIGINT) % 2 = 1
              |          THEN 1 ELSE -1 END)), 0) > 0
              |      THEN CAST(pow(2e0, j) AS BIGINT) ELSE 0 END)), 0)::BIGINT AS fp
              |  FROM h),
              |chunked AS (
              |  SELECT id, fp, k AS chunk_idx,
              |    CAST(floor(fp / pow(2e0, k * 8)) AS BIGINT) % 256 AS chunk
              |  FROM fp, (SELECT unnest(range(0, 4)) AS k)),
              |pairs AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id,
              |    a.fp AS a_fp, b.fp AS b_fp
              |  FROM chunked a JOIN chunked b
              |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
              |    AND a.id < b.id)
              |SELECT a_id, b_id,
              |  CAST(bit_count(xor(a_fp, b_fp)) AS BIGINT) AS hamming
              |FROM pairs
              |WHERE bit_count(xor(a_fp, b_fp)) <= 3""".stripMargin)),

    // Exact n-gram jaccard pairs (MinHash-LSH candidate generation,
    // exact-jaccard verify stage — no natural-language blocking key)
    Q("dd_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id",
        "text", shingleN = 3, threshold = 0.03, bands = 8, rowsPerBand = 2),
      Some(s"""WITH $minhashBandedSql,
              |pairs AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
              |  FROM banded a JOIN banded b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
              |j AS (
              |  SELECT p.a_id, p.b_id,
              |    len(list_intersect(ha.h1, hb.h1))::DOUBLE /
              |      len(list_distinct(ha.h1 || hb.h1))::DOUBLE AS jaccard
              |  FROM pairs p JOIN h1 ha ON p.a_id = ha.id
              |               JOIN h1 hb ON p.b_id = hb.id)
              |SELECT a_id, b_id, round(jaccard, 6) AS jaccard
              |FROM j WHERE jaccard >= 0.03""".stripMargin)),

    // EXACT-recall token-set similarity join via prefix filtering
    // (PPJoin family): rarest-first global token order, per-doc
    // (n - ceil(t*n) + 1)-token prefixes, prefix equi-join + length
    // bound, exact intersection verify. Because the filter is LOSSLESS,
    // the oracle is the brute-force all-pairs Jaccard — any missed or
    // extra pair hash-mismatches.
    Q("dd_prefix_jaccard",
      (s, dir) => Dedup.prefixJaccardPairs(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.95),
      Some(s"""WITH toks AS ($toksSql),
              |t AS (SELECT DISTINCT id, unnest(tk) AS tok FROM toks),
              |sz AS (SELECT id, count(*) AS n FROM t GROUP BY id),
              |inter AS (
              |  SELECT a.id AS a_id, b.id AS b_id, count(*) AS o
              |  FROM t a JOIN t b ON a.tok = b.tok AND a.id < b.id
              |  GROUP BY 1, 2),
              |j AS (
              |  SELECT a_id, b_id,
              |    CAST(o AS DOUBLE) / (sa.n + sb.n - o) AS jaccard
              |  FROM inter JOIN sz sa ON a_id = sa.id
              |              JOIN sz sb ON b_id = sb.id)
              |SELECT a_id, b_id, round(jaccard, 6) + 0e0 AS jaccard
              |FROM j WHERE jaccard >= 95e-2""".stripMargin)),

    // Blocking-quality eval — the step a real dedup pipeline runs before
    // trusting a blocking scheme: MinHash-LSH raw candidates (shingle
    // space, simThreshold 0 = pre-verify banding output) scored against
    // the exact-recall prefix-join truth set (token space): pairs
    // completeness (recall of true pairs) and reduction ratio (fraction
    // of the all-pairs space avoided). One row; every count is a 1-row
    // broadcast aggregate, the all-pairs denominator is arithmetic on
    // the doc count — never a cartesian.
    //
    // The measured report IS the point: at sf0.01 completeness is 0.012
    // at reduction 0.9996 — this corpus's token-level near-dups are
    // largely token REORDERS, which order-sensitive 3-gram shingles
    // cannot see. That mismatch (order-insensitive truth vs
    // order-sensitive blocking) is precisely what this eval exists to
    // catch before a 100 TB run trusts its blocking recall.
    Q("dd_blocking_quality",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cand = Dedup.minHashLSH(docs, "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.0)
        val truth = Dedup.prefixJaccardPairs(docs, "doc_id", "text", 0.95)
        Dedup.blockingQuality(cand, truth, docs, "doc_id")
      },
      Some(s"""WITH $minhashBandedSql,
              |cand AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
              |  FROM banded a JOIN banded b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
              |toks AS ($toksSql),
              |tt AS (SELECT DISTINCT id, unnest(tk) AS tok FROM toks),
              |sz AS (SELECT id, count(*) AS n FROM tt GROUP BY id),
              |ov AS (
              |  SELECT a.id AS a_id, b.id AS b_id, count(*) AS o
              |  FROM tt a JOIN tt b ON a.tok = b.tok AND a.id < b.id
              |  GROUP BY 1, 2),
              |truth AS (
              |  SELECT a_id, b_id FROM ov
              |  JOIN sz sa ON a_id = sa.id JOIN sz sb ON b_id = sb.id
              |  WHERE CAST(o AS DOUBLE) / (sa.n + sb.n - o) >= 95e-2),
              |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
              |       FROM documents)
              |SELECT
              |  (SELECT count(*) FROM cand) AS n_candidates,
              |  (SELECT count(*) FROM truth) AS n_truth,
              |  (SELECT count(*) FROM truth JOIN cand USING (a_id, b_id))
              |    AS n_hit,
              |  round(CAST((SELECT count(*) FROM truth JOIN cand
              |      USING (a_id, b_id)) AS DOUBLE) /
              |    (SELECT count(*) FROM truth), 6) + 0e0
              |    AS pairs_completeness,
              |  round(1e0 - CAST((SELECT count(*) FROM cand) AS DOUBLE) /
              |    ((SELECT n FROM nd) * ((SELECT n FROM nd) - 1e0) / 2e0), 6)
              |    + 0e0 AS reduction_ratio""".stripMargin)),

    // Sampled-truth blocking quality — the variant that can actually
    // RUN on the corpus blocking exists to protect. The exact row
    // above computes pairs-completeness against the full-corpus truth
    // set, which is quadratic-OUTPUT work; here exact truth is
    // computed only for pairs touching a seeded fixed sample of docs
    // (id % 13 == 3, lowest 64 — the knnRecallSampled discipline),
    // whose postings broadcast against ONE corpus token scan. The
    // candidate leg and the reduction ratio are unchanged; the
    // completeness column is an unbiased estimate of the exact row's
    // (sampled 0.0172 on 290 truth pairs vs exact 0.0122 on 1887 at
    // sf0.01 — the order-sensitivity mismatch the eval exists to catch
    // reads the same either way; see SCALE.md r14). The exact row
    // stays as the small-sf cross-check.
    Q("dd_blocking_quality_sampled",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val cand = Dedup.minHashLSH(docs, "doc_id", "text",
          shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.0)
        val sample = docs.where(pmod(col("doc_id"), lit(13)) === 3)
          .orderBy(col("doc_id")).limit(64).select("doc_id")
        val truth = Dedup.sampledJaccardTruthPairs(docs, sample,
          "doc_id", "text", 0.95)
        Dedup.blockingQuality(cand, truth, docs, "doc_id")
      },
      Some(s"""WITH $minhashBandedSql,
              |cand AS (
              |  SELECT DISTINCT a.id AS a_id, b.id AS b_id
              |  FROM banded a JOIN banded b
              |    ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
              |toks AS ($toksSql),
              |tt AS (SELECT DISTINCT id, unnest(tk) AS tok FROM toks),
              |sz AS (SELECT id, count(*) AS n FROM tt GROUP BY id),
              |smp AS (SELECT doc_id AS id FROM documents
              |        WHERE doc_id % 13 = 3 ORDER BY doc_id LIMIT 64),
              |st AS (SELECT id, tok FROM tt
              |       WHERE id IN (SELECT id FROM smp)),
              |ov AS (SELECT s.id AS s_id, c.id AS c_id, count(*) AS o
              |       FROM st s JOIN tt c
              |         ON s.tok = c.tok AND s.id <> c.id
              |       GROUP BY 1, 2),
              |truth AS (
              |  SELECT DISTINCT least(s_id, c_id) AS a_id,
              |                  greatest(s_id, c_id) AS b_id
              |  FROM ov JOIN sz sa ON s_id = sa.id
              |          JOIN sz sb ON c_id = sb.id
              |  WHERE CAST(o AS DOUBLE) / (sa.n + sb.n - o) >= 95e-2),
              |nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n
              |       FROM documents)
              |SELECT
              |  (SELECT count(*) FROM cand) AS n_candidates,
              |  (SELECT count(*) FROM truth) AS n_truth,
              |  (SELECT count(*) FROM truth JOIN cand USING (a_id, b_id))
              |    AS n_hit,
              |  round(CAST((SELECT count(*) FROM truth JOIN cand
              |      USING (a_id, b_id)) AS DOUBLE) /
              |    (SELECT count(*) FROM truth), 6) + 0e0
              |    AS pairs_completeness,
              |  round(1e0 - CAST((SELECT count(*) FROM cand) AS DOUBLE) /
              |    ((SELECT n FROM nd) * ((SELECT n FROM nd) - 1e0) / 2e0), 6)
              |    + 0e0 AS reduction_ratio""".stripMargin)),

    // Embedding near-dup pairs (cosine >= 0.3, label-blocked)
    Q("dd_embed_cosine",
      (s, dir) => Dedup.embeddingCosinePairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.3, blockKeyExpr = col("label")),
      Some(s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
              |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              |  round(${cosSql("a.embedding", "b.embedding")}, 6) AS cosine
              |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
              |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.3""".stripMargin)),

    // Embedding near-dup WITHOUT a caller block key: SRP-LSH buckets
    // generate candidates (8 planes x 4 tables), exact cosine verifies.
    // Recall is the documented S-curve of the SRP family; the oracle
    // replays the identical bucketing so the check is exact.
    Q("dd_embed_lsh",
      (s, dir) => Dedup.embeddingLshPairs(t(s, dir, "embeddings"), "vec_id",
        "embedding", threshold = 0.3, numPlanes = 8, tables = 4),
      Some {
        val buckets = (0 until 4).map(tb =>
          s"SELECT id, v, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM e")
          .mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |b AS ($buckets),
           |cand AS (
           |  SELECT DISTINCT x.id AS a_id, y.id AS b_id,
           |    x.v AS a_v, y.v AS b_v
           |  FROM b x JOIN b y
           |    ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.id < y.id)
           |SELECT a_id, b_id, round(${cosSql("a_v", "b_v")}, 6) AS cosine
           |FROM cand WHERE ${cosSql("a_v", "b_v")} >= 0.3""".stripMargin
      }),

    // SemDedup (Abbas et al. 2023): k-means the embedding space, drop
    // near-duplicates WITHIN clusters only — clustering bounds the
    // quadratic pair work to cluster-sized blocks and cross-cluster
    // pairs are never scored. Deterministic end to end (Lloyd with
    // smallest-id seeding, min-id keep), so the oracle replays the
    // identical clustering + pruning.
    // maxBlock = Int.MaxValue pins the UNGUARDED branch explicitly: this
    // row's oracle models unconditional exact all-pairs within clusters,
    // so the impl must never route a cluster onto the SRP sub-blocked
    // path regardless of cluster size or future default changes. The
    // guard itself is hash-checked by dd_semantic_guarded/_oversized.
    Q("dd_semantic",
      (s, dir) => Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, iters = 2, threshold = 0.3,
        maxBlock = Int.MaxValue),
      Some {
        s"""WITH ${kmeansA2Sql()},
           |dropped AS (
           |  SELECT DISTINCT b.vec_id FROM a2 a JOIN a2 b
           |    ON a.cid = b.cid AND a.vec_id < b.vec_id
           |  WHERE ${cosSql("a.v", "b.v")} >= 0.3)
           |SELECT a2.vec_id, CAST(a2.cid AS INT) AS cluster,
           |  CASE WHEN dropped.vec_id IS NULL THEN 1 ELSE 0 END AS keep
           |FROM a2 LEFT JOIN dropped ON a2.vec_id = dropped.vec_id""".stripMargin
      }),

    // SemDedup with the mega-cluster guard ACTIVE: maxBlock=40 pushes the
    // larger clusters (avg size 500/8 ≈ 62 at the gate sf) onto the SRP
    // sub-blocked branch while small clusters keep the exact scan — the
    // oracle replays BOTH branches (kmeans assignment, the exact-duplicate
    // rep collapse — min id per (cluster, vector), zero-norm rows exempt —
    // size split over REPS, exact pairs below the bound, (cluster, table,
    // bucket) SRP candidates + exact-cosine verify above it), so the
    // guarded path itself is hash-checked, not just spec'd.
    Q("dd_semantic_guarded",
      (s, dir) => Dedup.semanticDedup(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, iters = 2, threshold = 0.3,
        maxBlock = 40, numPlanes = 8, tables = 4),
      Some {
        val buckets = (0 until 4).map(tb =>
          s"""SELECT vec_id, v, cid, $tb AS tbl,
             |  ${srpBucketSql("v", tb, 8)} AS bucket FROM bg""".stripMargin)
          .mkString("\nUNION ALL\n")
        s"""WITH ${kmeansA2Sql()},
           |rk AS (
           |  SELECT *, row_number() OVER (
           |    PARTITION BY cid,
           |      CASE WHEN len(v) = 0
           |          OR list_max(list_transform(v, x_ -> abs(x_))) <= 0
           |        THEN vec_id ELSE -1 END, v
           |    ORDER BY vec_id) AS rn
           |  FROM a2),
           |reps AS (SELECT cid, vec_id, v FROM rk WHERE rn = 1),
           |dupdrop AS (SELECT vec_id FROM rk WHERE rn > 1),
           |sz AS (SELECT cid, count(*) AS cl_n FROM reps GROUP BY cid),
           |sm AS (SELECT reps.* FROM reps JOIN sz USING (cid)
           |       WHERE cl_n <= 40),
           |bg AS (SELECT reps.* FROM reps JOIN sz USING (cid)
           |       WHERE cl_n > 40),
           |be AS ($buckets),
           |exdrop AS (
           |  SELECT DISTINCT b.vec_id FROM sm a JOIN sm b
           |    ON a.cid = b.cid AND a.vec_id < b.vec_id
           |  WHERE ${cosSql("a.v", "b.v")} >= 0.3),
           |cand AS (
           |  SELECT DISTINCT a.vec_id AS aid, b.vec_id AS bid,
           |    a.v AS av, b.v AS bv
           |  FROM be a JOIN be b
           |    ON a.cid = b.cid AND a.tbl = b.tbl AND a.bucket = b.bucket
           |      AND a.vec_id < b.vec_id),
           |lshdrop AS (
           |  SELECT DISTINCT bid AS vec_id FROM cand
           |  WHERE ${cosSql("av", "bv")} >= 0.3),
           |dropped AS (SELECT vec_id FROM exdrop
           |            UNION SELECT vec_id FROM lshdrop
           |            UNION SELECT vec_id FROM dupdrop)
           |SELECT a2.vec_id, CAST(a2.cid AS INT) AS cluster,
           |  CASE WHEN dropped.vec_id IS NULL THEN 1 ELSE 0 END AS keep
           |FROM a2 LEFT JOIN dropped ON a2.vec_id = dropped.vec_id""".stripMargin
      }),

    // The guard's no-silent-caps audit row (gr_link_capped precedent):
    // which clusters crossed maxBlock and fell back to SRP recall.
    Q("dd_semantic_oversized",
      (s, dir) => Dedup.semanticDedupOversized(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2, maxBlock = 40,
        threshold = 0.3),
      Some {
        val rep =
          """CASE WHEN len(v) = 0
            |    OR list_max(list_transform(v, x_ -> abs(x_))) <= 0
            |  THEN 'u:' || CAST(vec_id AS VARCHAR)
            |  ELSE 'g:' || v::VARCHAR END""".stripMargin
        s"""WITH ${kmeansA2Sql()}
           |SELECT CAST(cid AS INT) AS cluster, count(*) AS cl_size,
           |  count(DISTINCT $rep) AS n_reps,
           |  CASE WHEN count(DISTINCT $rep) > 40 THEN 1 ELSE 0
           |  END AS oversized
           |FROM a2 GROUP BY cid""".stripMargin
      }),

    // ANN: NN-Descent kNN-GRAPH construction (Dong et al. 2011,
    // deterministic variant) — every node's k nearest, initialized
    // from SRP bucket mates, improved by 2 neighbor-of-neighbor
    // rounds (reverse lists k-capped). The all-nodes graph that
    // SemDedup clustering and graph-ANN serving start from; per-query
    // top-k is the wrong shape when every node is a query. Oracle
    // unrolls init + both rounds (one shared CTE chain with the
    // recall row below).
    Q("ann_knn_descent",
      (s, dir) => Similarity.knnDescent(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 5, rounds = 2),
      Some(s"""WITH $knnDescentCtes
              |SELECT q AS id, c AS nbr_id,
              |  floor(cosine * 1e6 + 5e-1) / 1e6 AS cosine,
              |  CAST(rn AS INT) AS rank
              |FROM l2""".stripMargin)),

    // ANN: recall@5 of the NN-Descent graph against a SEEDED
    // FIXED-SIZE sampled exact truth — the eval that decides whether
    // the approximate builder is usable before anything downstream
    // trusts it (the dd_blocking_quality discipline for the ANN
    // family). Truth = 64 sampled queries x corpus (queries
    // broadcast): linear in the corpus, replacing r12's all-pairs n²
    // truth. Run on the near-random `embeddings` fixture this reads
    // LOW by design (there is no neighborhood structure to exploit;
    // the structured row below shows the operating regime).
    Q("ann_knn_recall",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        knnRecallSampled(emb, Similarity.knnDescent(emb, "vec_id",
          "embedding", k = 5, rounds = 2))
      },
      Some(s"""WITH $knnDescentCtes,
              |$knnRecallSampledSql""".stripMargin)),

    // ANN: NN-Descent in its OPERATING REGIME — the same operator and
    // config over a manifold-structured cluster-mixture fixture
    // (8 tight clusters; see structuredE0Sql). Bucket mates are true
    // neighbors here, so the descent converges to a usable graph —
    // the recall row below gates it.
    Q("ann_knn_descent_structured",
      (s, dir) => Similarity.knnDescent(structuredEmb(s, dir),
        "vec_id", "embedding", k = 5, rounds = 2),
      Some(s"""WITH ${knnDescentCtesOver(structuredE0Sql)}
              |SELECT q AS id, c AS nbr_id,
              |  floor(cosine * 1e6 + 5e-1) / 1e6 AS cosine,
              |  CAST(rn AS INT) AS rank
              |FROM l2""".stripMargin)),

    // ANN: recall@5 of the structured-regime descent graph vs sampled
    // exact truth — the number that demonstrates the builder is USABLE
    // on data with real neighborhood structure (gated >= 0.8 in
    // SimilaritySpec), alongside the honest near-random row above.
    Q("ann_knn_recall_structured",
      (s, dir) => {
        val emb = structuredEmb(s, dir)
        knnRecallSampled(emb, Similarity.knnDescent(emb, "vec_id",
          "embedding", k = 5, rounds = 2))
      },
      Some(s"""WITH ${knnDescentCtesOver(structuredE0Sql)},
              |$knnRecallSampledSql""".stripMargin)),

    // ANN: INCREMENTAL kNN-graph maintenance — the operator a standing
    // embedding pipeline runs per ingest batch, where a from-scratch
    // NN-Descent rebuild re-pays the whole corpus. Standing graph +
    // standing SRP index over ids % 5 != 0; the % 5 == 0 batch
    // arrives: batch nodes take bucket-mate candidates + one bounded
    // descent round, then ONE reverse pass re-ranks only the touched
    // corpus neighborhoods. Output is the delta (new + updated rows);
    // per-batch compute ∝ batch, never corpus (tools/KnnIncProbe
    // measures the growth curve; SCALE.md r14). Oracle unrolls the
    // standing build (shared CTE chain) plus the incremental step.
    Q("ann_knn_incremental",
      (s, dir) => {
        val emb = structuredEmb(s, dir)
        val batch = emb.where(pmod(col("vec_id"), lit(5)) === 0)
        // standing graph + index arrive ON DISK (knnStanding fixture) —
        // the row times the incremental step, which is the operator
        val (g, idx) = knnStanding(s, dir)
        Similarity.knnDescentIncremental(g, idx, batch, "vec_id",
          "embedding", k = 5, rounds = 1)
      },
      Some(knnIncrementalSql)),

    // ST: STREAMING kNN-graph maintenance — the ingest-fold equivalent
    // of the micro-batch path (KnnGraphStream.run): two batches arrive
    // in order, each computes its delta against the standing graph +
    // bucket index AS LEFT BY the previous batch, and the delta folds
    // into the standing state (graph upsert by id, bucket append).
    // The stream ≡ batch discipline every st_* family follows; oracle
    // chains two unrolled incremental steps through the same folded
    // state.
    Q("st_knn_incremental",
      (s, dir) => {
        val emb = structuredEmb(s, dir)
        // standing state from the on-disk knnStanding fixture (see there)
        val (g, idx) = knnStanding(s, dir)
        graft.streaming.KnnGraphStream.ingestFold(g, idx,
          Seq(emb.where(pmod(col("vec_id"), lit(10)) === 0),
            emb.where(pmod(col("vec_id"), lit(10)) === 5)),
          "vec_id", "embedding", k = 5, rounds = 1)
      },
      Some(stKnnIncrementalSql)),

    // Brute-force cosine top-k (5 query vectors vs the rest of the corpus)
    Q("ann_brute_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb.where(col("vec_id") >= 5), emb.where(col("vec_id") < 5),
          "vec_id", "vec_id", "embedding", k = 5)
      },
      Some(s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_v FROM embeddings
              |           WHERE vec_id < 5),
              |c AS (SELECT vec_id AS c_id, embedding AS c_v FROM embeddings
              |      WHERE vec_id >= 5),
              |scored AS (
              |  SELECT q_id, c_id, ${cosSql("c_v", "q_v")} AS cosine,
              |    row_number() OVER (PARTITION BY q_id
              |      ORDER BY ${cosSql("c_v", "q_v")} DESC, c_id ASC) AS rank
              |  FROM c CROSS JOIN q)
              |SELECT q_id, c_id, round(cosine, 6) AS cosine,
              |  CAST(rank AS INT) AS rank
              |FROM scored WHERE rank <= 5""".stripMargin)),

    // ANN: PCA first-component projection — exact d x d covariance by
    // distributed (i, j) partial agg, fixed 10-round power iteration on
    // the collected d^2 scalars (k-means model precedent), map-only
    // sequential-fold projection. The oracle replays the SAME pipeline:
    // covariance in SQL, the iteration unrolled with ORDERED list folds
    // (every inner sum sequential on both engines), projection as the
    // foldSql shape every embedding operator uses.
    Q("ann_pca_project",
      (s, dir) => Similarity.pcaProject(
        t(s, dir, "embeddings"), "vec_id", "embedding", iterations = 10),
      Some {
        def iter(k: Int) =
          s"""w$k AS MATERIALIZED (
             |  SELECT i, ${foldSql(
                  s"list_transform(range(1, 65), k_ -> row_[k_] * v${k - 1}.v[k_])")} AS wi
             |  FROM cl, v${k - 1}),
             |wn$k AS MATERIALIZED (
             |  SELECT sqrt(${foldSql("list_transform(wl, t_ -> t_ * t_)")}) AS s
             |  FROM (SELECT list(wi ORDER BY i) AS wl FROM w$k)),
             |v$k AS MATERIALIZED (
             |  SELECT list_transform(wl, t_ -> t_ / wn$k.s) AS v
             |  FROM (SELECT list(wi ORDER BY i) AS wl FROM w$k), wn$k)"""
        s"""WITH x AS MATERIALIZED (
           |  SELECT vec_id AS id, k_ AS i, embedding[k_]::DOUBLE AS xi
           |  FROM embeddings, (SELECT unnest(range(1, 65)) AS k_)),
           |m AS MATERIALIZED (SELECT i, avg(xi) AS mu FROM x GROUP BY i),
           |cx AS MATERIALIZED (
           |  SELECT id, x.i, xi - mu AS ci FROM x JOIN m ON x.i = m.i),
           |nn AS (SELECT count(*) AS n FROM embeddings),
           |cov AS MATERIALIZED (
           |  SELECT a.i AS i, b.i AS j, sum(a.ci * b.ci) AS s
           |  FROM cx a JOIN cx b ON a.id = b.id GROUP BY 1, 2),
           |cl AS MATERIALIZED (
           |  SELECT i, list(s / (n - 1) ORDER BY j) AS row_
           |  FROM cov, nn GROUP BY i, n),
           |ml AS (SELECT list(mu ORDER BY i) AS mu FROM m),
           |v0 AS (SELECT list_transform(range(1, 65),
           |  k_ -> 1e0 / sqrt(64e0)) AS v),
           |${(1 to 10).map(iter).mkString(",\n")}
           |SELECT e.vec_id, round(${foldSql(
              "list_transform(range(1, 65), k_ -> " +
                "(e.embedding[k_]::DOUBLE - ml.mu[k_]) * v10.v[k_])")}, 4)
           |  + 0e0 AS pc1
           |FROM embeddings e, ml, v10""".stripMargin
      }),

    // ANN: SQ8 scalar quantization + asymmetric-distance scan + exact
    // rerank (the faiss SQ pattern): the corpus lives as 64-byte int8
    // codes (4x smaller at rest/in cache — the 100 TB bandwidth win),
    // every candidate is scored with ADC cosine on dequantized bin
    // centers, the top-16 per query rerank EXACTLY on the original
    // floats, and the exact top-5 ships. Codes/dequant/fold arithmetic
    // is engine-identical, so the oracle replays it bit-for-bit.
    Q("ann_sq_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.sqTopK(
          emb.where(col("vec_id") >= 5), emb.where(col("vec_id") < 5),
          "vec_id", "vec_id", "embedding", k = 5, rerank = 16)
      },
      Some {
        val code = "least(255, greatest(0, " +
          "CAST(floor((x::DOUBLE - (-5e-1)) / 1e0 * 256e0) AS INT)))"
        s"""WITH q AS (SELECT vec_id AS q_id, embedding AS q_v FROM embeddings
           |           WHERE vec_id < 5),
           |c AS (SELECT vec_id AS c_id, embedding AS c_v FROM embeddings
           |      WHERE vec_id >= 5),
           |dq AS (
           |  SELECT c_id, list_transform(c_v, x ->
           |    (-5e-1) + ($code::DOUBLE + 5e-1) * (1e0 / 256e0)) AS dv
           |  FROM c),
           |approx AS (
           |  SELECT q_id, c_id,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY ${cosSql("dv", "q_v")} DESC, c_id ASC) AS arank
           |  FROM dq CROSS JOIN q),
           |cand AS (SELECT q_id, c_id FROM approx WHERE arank <= 16),
           |exact AS (
           |  SELECT q_id, c_id, ${cosSql("c_v", "q_v")} AS cosine,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY ${cosSql("c_v", "q_v")} DESC, c_id ASC) AS rank
           |  FROM cand JOIN c USING (c_id) JOIN q USING (q_id))
           |SELECT q_id, c_id, round(cosine, 6) AS cosine,
           |  CAST(rank AS INT) AS rank
           |FROM exact WHERE rank <= 5""".stripMargin
      }),

    // PQ asymmetric-distance top-k (Jegou et al. 2011) — the quantized
    // scan half of IVF-PQ, the canonical web-scale ANN layout: per-
    // subspace Lloyd codebooks (deterministic: smallest-id seeds, one
    // refinement, empty cells keep their centroid), corpus carried as m
    // codes per row, query-side exact ADC, k-bounded heap top-k. The
    // oracle replays training, encoding, and the subspace-ordered ADC
    // sum, so the approximate METRIC gets an exact CHECK.
    Q("ann_pq_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(emb.where(col("vec_id") >= 21),
          emb.where(col("vec_id") < 5), "vec_id", "vec_id", "embedding",
          k = 5, m = 4, kc = 4, iters = 2)
      },
      Some(pqTopKSql())),

    // Residual IVF-PQ — the FULL canonical layout composed from the two
    // halves above: cosine cell routing (fixed 16-centroid model), PQ
    // codebooks trained on residuals x - centroid(cell), queries probe
    // 2 cells scoring the cell's codes against their own per-cell
    // residual. The oracle replays routing, residuals, training,
    // encoding, and the ADC sum.
    Q("ann_ivfpq_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(emb.where(col("vec_id") >= 21),
          emb.where(col("vec_id") < 5), "vec_id", "vec_id", "embedding",
          emb.where(col("vec_id") >= 5 && col("vec_id") < 21),
          "vec_id", "embedding",
          k = 5, nProbe = 2, m = 4, kc = 4, iters = 2)
      },
      Some(ivfPqTopKSql())),

    // IVF-PQ + exact re-rank — the production recipe end to end: the
    // quantized scan shortlists 15 candidates per query, only those rows'
    // raw vectors are re-read (broadcast semi-join, no corpus shuffle),
    // and exact cosine re-ranks to the final 5. Same fixture as
    // ann_ivfpq_topk; the oracle shares its ADC CTE chain verbatim.
    Q("ann_ivfpq_rerank",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqRerank(emb.where(col("vec_id") >= 21),
          emb.where(col("vec_id") < 5), "vec_id", "vec_id", "embedding",
          emb.where(col("vec_id") >= 5 && col("vec_id") < 21),
          "vec_id", "embedding",
          k = 5, shortlist = 15, nProbe = 2, m = 4, kc = 4, iters = 2)
      },
      Some(ivfPqRerankSql())),

    // IVF-style coarse assignment (every 50th vector is a "centroid")
    Q("ann_ivf_assign",
      (s, dir) => {
        // FIXED centroid count (16), independent of corpus size — IVF's
        // model is a parameter, so the scale probe must measure the
        // production O(rows x k) assignment, not O(rows x centroids)
        // with centroids growing alongside the corpus.
        val emb = t(s, dir, "embeddings")
        Similarity.ivfAssign(emb.where(col("vec_id") >= 16), "vec_id",
          "embedding", emb.where(col("vec_id") < 16), "vec_id", "embedding")
      },
      Some(s"""WITH c AS (SELECT vec_id AS cent_id, embedding AS cent_v
              |           FROM embeddings WHERE vec_id < 16),
              |v AS (SELECT vec_id AS v_id, embedding AS v FROM embeddings
              |      WHERE vec_id >= 16),
              |scored AS (
              |  SELECT v_id, cent_id, ${cosSql("v", "cent_v")} AS cosine,
              |    row_number() OVER (PARTITION BY v_id
              |      ORDER BY ${cosSql("v", "cent_v")} DESC, cent_id ASC) AS rn
              |  FROM v CROSS JOIN c)
              |SELECT v_id, cent_id, round(cosine, 6) AS cosine
              |FROM scored WHERE rn = 1""".stripMargin)),

    // IVF full search: probe the 2 nearest centroids per query, score only
    // those cells — the bounded-candidate ANN scale path completing
    // ann_ivf_assign (assignment) with the search stage.
    Q("ann_ivf_topk",
      (s, dir) => {
        // queries: vec_id<5; FIXED 16-centroid model: 5<=vec_id<21;
        // corpus: the rest. The model never grows with the corpus, so
        // the sf1 probe measures production IVF's O(rows x k).
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb.where(col("vec_id") >= 21),
          emb.where(col("vec_id") < 5),
          "vec_id", "vec_id", "embedding",
          emb.where(col("vec_id") >= 5 && col("vec_id") < 21),
          "vec_id", "embedding",
          k = 5, nProbe = 2)
      },
      Some(ivfTopKOracleSql)),

    // ANN against the STANDING IVF index — the embedding analog of
    // ir_bm25_indexed: cells partitioned at rest by their centroid
    // assignment, the query batch's probed cells prune the scan at the
    // partition level, scoring is unchanged — identical answers (same
    // oracle SQL), the per-batch assignment pass amortized into the
    // one-time build. Same fixture discipline as the search index: the
    // row rebuilds per run; production builds once and queries forever.
    Q("ann_ivf_indexed",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val path = s"/tmp/graft_ivf_index/$tag"
        val emb = t(s, dir, "embeddings")
        Similarity.writeIvfIndex(emb.where(col("vec_id") >= 21),
          "vec_id", "embedding",
          emb.where(col("vec_id") >= 5 && col("vec_id") < 21),
          "vec_id", "embedding", path)
        Similarity.ivfTopKIndexed(s, path, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nProbe = 2)
      },
      Some(ivfTopKOracleSql)),

    // IVF daily ingest: build the standing index over PART of the
    // corpus, append the rest as a batch through the frozen standing
    // model (cell-pruned append — corpus cell files never read), then
    // query. Append-then-query is bit-identical to rebuild-then-query
    // because per-vector assignment is independent — so this row
    // shares ann_ivf_topk's full-corpus oracle verbatim, which IS the
    // equivalence check.
    Q("ann_ivf_incremental",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val path = s"/tmp/graft_ivf_inc/$tag"
        val emb = t(s, dir, "embeddings")
        Similarity.writeIvfIndex(
          emb.where(col("vec_id") >= 21 && pmod(col("vec_id"), lit(3)) =!= 0),
          "vec_id", "embedding",
          emb.where(col("vec_id") >= 5 && col("vec_id") < 21),
          "vec_id", "embedding", path)
        Similarity.appendIvfIndex(s, path,
          emb.where(col("vec_id") >= 21 && pmod(col("vec_id"), lit(3)) === 0),
          "vec_id", "embedding")
        Similarity.ivfTopKIndexed(s, path, emb.where(col("vec_id") < 5),
          "vec_id", "embedding", k = 5, nProbe = 2)
      },
      Some(ivfTopKOracleSql)),

    // IVF centroid-DRIFT audit — the retrain signal appendIvfIndex's
    // frozen-model contract deliberately leaves to the caller: per cell,
    // the corpus's assignment-similarity distribution vs an incoming
    // batch's (one cells scan against stored centroids + one batch
    // argmin pass; model-sized output). Per-row cosines quantize to
    // 1e-6 longs BEFORE aggregation so the cell sums are order-proof
    // integers; the means are floor-quantized (round() diverges at the
    // sum/count midpoints integer quotients land on). The oracle
    // replays assignment, quantization, and both means.
    Q("ann_ivf_drift",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val path = s"/tmp/graft_ivf_drift/$tag"
        val emb = t(s, dir, "embeddings")
        Similarity.writeIvfIndex(emb.where(col("vec_id") >= 21),
          "vec_id", "embedding",
          emb.where(col("vec_id") >= 5 && col("vec_id") < 21),
          "vec_id", "embedding", path)
        Similarity.ivfDriftAudit(s, path, emb.where(col("vec_id") < 5),
          "vec_id", "embedding")
      },
      Some {
        val assignQ = (src: String) =>
          s"""SELECT cent_id, CAST(floor(cos * 1e6 + 5e-1) AS BIGINT) AS q
             |FROM (
             |  SELECT c.cent_id, ${cosSql(s"$src.v", "c.cent_v")} AS cos,
             |    row_number() OVER (PARTITION BY $src.v_id
             |      ORDER BY ${cosSql(s"$src.v", "c.cent_v")} DESC,
             |        c.cent_id ASC) AS rn
             |  FROM $src CROSS JOIN c) WHERE rn = 1"""
        s"""WITH c AS MATERIALIZED (
           |  SELECT vec_id AS cent_id, embedding AS cent_v
           |  FROM embeddings WHERE vec_id >= 5 AND vec_id < 21),
           |corp AS MATERIALIZED (
           |  SELECT vec_id AS v_id, embedding AS v FROM embeddings
           |  WHERE vec_id >= 21),
           |b AS MATERIALIZED (
           |  SELECT vec_id AS v_id, embedding AS v FROM embeddings
           |  WHERE vec_id < 5),
           |ca AS MATERIALIZED (${assignQ("corp")}),
           |ba AS MATERIALIZED (${assignQ("b")}),
           |cs AS (SELECT cent_id, count(*) AS corpus_n,
           |         CAST(sum(q) AS DOUBLE) AS cq FROM ca GROUP BY 1),
           |bs AS (SELECT cent_id, count(*) AS batch_n,
           |         CAST(sum(q) AS DOUBLE) AS bq FROM ba GROUP BY 1)
           |SELECT c.cent_id,
           |  coalesce(cs.corpus_n, 0) AS corpus_n,
           |  floor(cs.cq / cs.corpus_n + 5e-1) / 1e6 AS corpus_mean,
           |  coalesce(bs.batch_n, 0) AS batch_n,
           |  floor(bs.bq / bs.batch_n + 5e-1) / 1e6 AS batch_mean,
           |  floor(bs.bq / bs.batch_n + 5e-1) / 1e6
           |    - floor(cs.cq / cs.corpus_n + 5e-1) / 1e6 AS drift
           |FROM c LEFT JOIN cs ON c.cent_id = cs.cent_id
           |LEFT JOIN bs ON c.cent_id = bs.cent_id""".stripMargin
      }),

    // Lloyd k-means over the embedding corpus: k=8 centroids seeded from
    // the 8 smallest vec_ids, 2 iterations, euclidean assignment
    Q("ann_kmeans",
      (s, dir) => Similarity.kmeans(t(s, dir, "embeddings"), "vec_id",
        "embedding", k = 8, iters = 2),
      Some {
        def sq(a: String, b: String) = foldSql(
          s"list_transform(range(0, 64), d_ -> ($a[d_+1] - $b[d_+1]) * ($a[d_+1] - $b[d_+1]))")
        s"""WITH v AS (SELECT vec_id,
           |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
           |c0 AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < 8),
           |a1 AS (
           |  SELECT vec_id, v, cid FROM (
           |    SELECT v.vec_id, v.v, c0.cid, row_number() OVER (
           |      PARTITION BY v.vec_id
           |      ORDER BY ${sq("v.v", "c0.cv")} ASC, c0.cid ASC) AS rn
           |    FROM v CROSS JOIN c0) WHERE rn = 1),
           |c1 AS (
           |  SELECT cid, list(m ORDER BY d) AS cv FROM (
           |    SELECT a1.cid, d.d, avg(a1.v[d.d+1]) AS m
           |    FROM a1, range(0, 64) AS d(d)
           |    GROUP BY a1.cid, d.d)
           |  GROUP BY cid)
           |SELECT vec_id, CAST(cid AS INT) AS cluster,
           |  round(dist, 6) AS dist FROM (
           |  SELECT v.vec_id, c1.cid, sqrt(${sq("v.v", "c1.cv")}) AS dist,
           |    row_number() OVER (PARTITION BY v.vec_id
           |      ORDER BY ${sq("v.v", "c1.cv")} ASC, c1.cid ASC) AS rn
           |  FROM v CROSS JOIN c1) WHERE rn = 1""".stripMargin
      }),

    // Language-ID heuristic over marker stopword hits
    Q("ta_langid",
      (s, dir) => t(s, dir, "documents")
        .withColumn("pred_lang", TextAnalysis.langId(col("text")))
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n")),
      Some(s"""WITH toks AS ($toksSql),
              |d AS (SELECT documents.lang, toks.tk FROM documents
              |      JOIN toks ON documents.doc_id = toks.id)
              |SELECT lang, ${langIdCaseSql("tk")} AS pred_lang, count(*) AS n
              |FROM d GROUP BY 1, 2""".stripMargin)),

    // LEARNED language/quality classifier — the fastText-filter shape of
    // CCNet-style curation as pure aggregations: multinomial Naive Bayes
    // over hashed unigram buckets, trained on the doc_id%5!=0 split
    // (label = lang), applied to the held-out fifth. The model is
    // labels x 64 rows (broadcast); scoring is one bucket-count shuffle
    // + an argmax. The oracle refits the smoothed model and replays the
    // quantized log posterior (the DSIR ln-parity precedent).
    Q("ta_nb_classifier",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = TextAnalysis.nbTrain(
          docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text", "lang")
        TextAnalysis.nbClassify(docs.where(col("doc_id") % 5 === 0),
            "doc_id", "text", model)
          .join(docs.select(col("doc_id").as("id"), col("lang").as("actual")),
            "id")
          .select(col("id").as("doc_id"), col("actual"), col("pred"),
            col("score"))
      },
      Some(s"""WITH $nbScoredCtes,
              |best AS (
              |  SELECT id, label, score, row_number() OVER (
              |    PARTITION BY id ORDER BY score DESC, label ASC) AS rn
              |  FROM sc)
              |SELECT b.id AS doc_id, d.lang AS actual, b.label AS pred,
              |  floor(b.score * 1e6 + 5e-1) / 1e6 AS score
              |FROM best b JOIN documents d ON d.doc_id = b.id
              |WHERE rn = 1""".stripMargin)),

    // DS: reliability (calibration) audit of the learned NB filter —
    // the check a confidence-gated curation filter needs before its
    // scores gate data: softmax confidence of the predicted class,
    // binned into deciles, each bin's mean confidence vs empirical
    // accuracy (gap = the ECE integrand). Shares the EXACT scored-CTE
    // chain with ta_nb_classifier (the pipelines-share-stages rule).
    Q("ds_calibration",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val model = TextAnalysis.nbTrain(
          docs.where(col("doc_id") % 5 =!= 0), "doc_id", "text", "lang")
        val conf = TextAnalysis.nbConfidences(
          docs.where(col("doc_id") % 5 === 0), "doc_id", "text", model)
        Features.calibrationReport(
          conf.join(docs.select(col("doc_id").as("id"), col("lang")), "id")
            .select(col("conf"),
              (col("pred") === col("lang")).cast("int").as("correct")),
          "conf", "correct")
      },
      Some(s"""WITH $nbScoredCtes,
              |m AS (SELECT id, label AS pred, score AS smax FROM (
              |  SELECT id, label, score, row_number() OVER (
              |    PARTITION BY id ORDER BY score DESC, label ASC) AS rn
              |  FROM sc) WHERE rn = 1),
              |z AS (SELECT sc.id, m.pred,
              |        sum(exp(sc.score - m.smax)) AS z
              |      FROM sc JOIN m USING (id) GROUP BY 1, 2),
              |cf AS (SELECT id, pred, 1e0 / z AS conf FROM z),
              |j AS (SELECT cf.conf,
              |        CASE WHEN cf.pred = d.lang THEN 1e0 ELSE 0e0 END
              |          AS ok
              |      FROM cf JOIN documents d ON d.doc_id = cf.id)
              |SELECT CAST(least(floor(conf * 10), 9) AS INT) AS bin,
              |  count(*) AS n,
              |  floor(avg(conf) * 1e6 + 5e-1) / 1e6 AS mean_conf,
              |  floor(avg(ok) * 1e6 + 5e-1) / 1e6 AS accuracy
              |FROM j GROUP BY 1""".stripMargin)),

    // Quality features + composite score per document
    Q("ta_quality",
      (s, dir) => {
        val d = t(s, dir, "documents")
        // ONE kernel evaluation per row (struct), fields projected after
        val names = Seq("n_chars", "n_tokens", "mean_token_len",
          "punct_ratio", "stopword_ratio", "digit_ratio", "quality")
        d.select(col("doc_id"),
            TextAnalysis.qualityStruct(col("text")).as("q"))
          .select(col("doc_id") +: names.zipWithIndex.map { case (nm, i) =>
            col(s"q._${i + 1}").as(nm) }: _*)
      },
      Some {
        val stop = TextAnalysis.markers("en").map(w => s"'$w'").mkString(", ")
        s"""WITH toks AS ($toksSql)
           |SELECT id AS doc_id,
           |  length(text)::BIGINT AS n_chars,
           |  len(tk)::BIGINT AS n_tokens,
           |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE
           |    ${foldSql("list_transform(tk, x_ -> len(x_)::DOUBLE)")} / len(tk)
           |    END, 6) AS mean_token_len,
           |  round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |    (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))
           |    ::DOUBLE / length(text) END, 6) AS punct_ratio,
           |  round(CASE WHEN len(tk) = 0 THEN 0.0 ELSE
           |    len(list_filter(tk, x_ -> list_contains([$stop], x_)))::DOUBLE /
           |    len(tk) END, 6) AS stopword_ratio,
           |  round(CASE WHEN length(text) = 0 THEN 0.0 ELSE
           |    (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
           |    ::DOUBLE / length(text) END, 6) AS digit_ratio,
           |  ${qualitySql("text", "tk")} AS quality
           |FROM toks""".stripMargin
      }),

    // Gopher rule-based quality filter (Rae et al. 2021, Table A1): the
    // standard pre-training web-corpus gate — word-count bounds, mean
    // word length, symbol-to-word ratio, alpha-word fraction, required
    // stopwords, bullet/ellipsis line fractions — emitted per doc WITH
    // the keep verdict (rows are flags, not a silent filter: the audit
    // is the output, per the no-silent-caps rule). One kernel pass per
    // doc, a narrow map fused onto the scan.
    Q("ta_gopher_rules",
      (s, dir) => {
        val d = t(s, dir, "documents")
        val names = Seq("n_words", "mean_word_len", "symbol_ratio",
          "frac_alpha_words", "stop_hits", "frac_bullet_lines",
          "frac_ellipsis_lines", "keep")
        d.select(col("doc_id"), TextAnalysis.gopherRules(col("text")).as("g"))
          .select(col("doc_id") +: names.zipWithIndex.map { case (nm, i) =>
            col(s"g._${i + 1}").as(nm) }: _*)
      },
      Some(s"""WITH toks AS ($toksSql),
              |${gopherCtes("toks")}
              |SELECT *, ${gopherKeepSql(50, 2)} AS keep
              |FROM gf""".stripMargin)),

    // Token + BPE-ish subword counting
    Q("ta_token_counts",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.subwordCount(col("text")).as("n_subwords")),
      Some(s"""WITH toks AS ($toksSql)
              |SELECT id AS doc_id, len(tk)::BIGINT AS n_tokens,
              |  COALESCE(list_sum(list_transform(tk,
              |    t -> CAST(ceil(len(t) / 4e0) AS BIGINT))), 0)::BIGINT
              |    AS n_subwords
              |FROM toks""".stripMargin)),

    // Corpus TF-IDF: per-document top term under smoothed idf
    Q("ta_tfidf",
      (s, dir) => TextAnalysis.tfidfTop(t(s, dir, "documents"),
        "doc_id", "text"),
      Some(s"""WITH toks AS ($toksSql),
              |tf AS (SELECT id, t_ AS term, count(*) AS tf
              |       FROM (SELECT id, unnest(tk) AS t_ FROM toks)
              |       GROUP BY id, t_),
              |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              |n AS (SELECT count(*) AS n FROM documents),
              |scored AS (
              |  SELECT tf.id, tf.term,
              |    tf.tf * (ln((n.n + 1e0) / (dfreq.df + 1e0)) + 1e0) AS s
              |  FROM tf JOIN dfreq USING (term), n),
              |ranked AS (SELECT *, row_number() OVER (PARTITION BY id
              |    ORDER BY s DESC, term ASC) AS rn FROM scored)
              |SELECT id AS doc_id, term AS top_term, round(s, 4) AS tfidf
              |FROM ranked WHERE rn = 1""".stripMargin)),

    // TA: hashing-trick feature vectorizer — signed token counts folded
    // into a fixed bucket space (Weinberger et al. 2009), the
    // no-dictionary text featurizer. Sparse output; integer-exact
    // md5-prefix hashes on both engines, one partial-agg shuffle.
    Q("ta_hash_features",
      (s, dir) => TextAnalysis.hashFeatures(
          t(s, dir, "documents"), "doc_id", "text", numBuckets = 64)
        .select(col("id").as("doc_id"), col("bucket"), col("feat")),
      Some(s"""WITH toks AS ($toksSql),
              |t AS (SELECT id, unnest(tk) AS tok FROM toks),
              |h AS (
              |  SELECT id,
              |    ${h32Sql("tok", "0")} % 64 AS bucket,
              |    CASE WHEN (${h32Sql("tok", "1")} & 1) = 1
              |      THEN 1 ELSE -1 END AS sign
              |  FROM t)
              |SELECT id AS doc_id, bucket,
              |  CAST(sum(sign) AS BIGINT) AS feat
              |FROM h GROUP BY id, bucket""".stripMargin)),

    // Inverted-index build: per-term document frequency + capped sorted
    // posting head. Distinct (term, doc) pairs partial-aggregate before
    // the per-term shuffle; the collect is capped so no term's posting
    // list materializes unbounded state (same discipline as a3/a11).
    Q("ta_postings",
      (s, dir) => t(s, dir, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("term"),
          col("doc_id"))
        .distinct()
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          array_join(transform(
            slice(array_sort(collect_list(col("doc_id"))), 1, 5),
            x => x.cast("string")), ",").as("posting_head")),
      Some(s"""WITH toks AS ($toksSql),
              |pairs AS (SELECT DISTINCT id, t_ AS term
              |          FROM (SELECT id, unnest(tk) AS t_ FROM toks)),
              |ranked AS (SELECT term, id, row_number() OVER (
              |    PARTITION BY term ORDER BY id) AS rn FROM pairs)
              |SELECT term, count(*) AS df,
              |  string_agg(CASE WHEN rn <= 5 THEN CAST(id AS VARCHAR) END,
              |    ',' ORDER BY id) AS posting_head
              |FROM ranked GROUP BY term""".stripMargin)),

    // Rolling-hash document fingerprint
    Q("ta_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp")),
      Some(s"""WITH toks AS ($toksSql)
              |SELECT id AS doc_id,
              |  list_reduce(list_prepend(CAST(0 AS BIGINT),
              |    list_transform(tk, t -> ${h32Sql("t", "7")})),
              |    (acc_, h_) -> (acc_ * 1000003 + h_) % 2147483647) AS fp
              |FROM toks""".stripMargin)),

    // Token-window document chunking: 64-token windows, 16-token overlap
    // (stride 48), tail kept, one chunk for short/empty docs
    Q("ta_chunk",
      (s, dir) => TextAnalysis.chunk(t(s, dir, "documents"), "doc_id",
        "text", chunkSize = 64, overlap = 16),
      Some(s"""WITH toks AS ($toksSql),
              |c AS (SELECT id, tk, CASE WHEN len(tk) <= 64 THEN 1
              |  ELSE CAST(ceil((len(tk) - 64) / 48e0) AS INT) + 1 END AS nc
              |  FROM toks),
              |e AS (SELECT id, tk, unnest(range(0, nc)) AS i FROM c)
              |SELECT id AS doc_id, i::BIGINT AS chunk_id,
              |  len(tk[i*48+1 : i*48+64])::BIGINT AS n_tokens,
              |  array_to_string(tk[i*48+1 : i*48+64], ' ') AS chunk_text
              |FROM e""".stripMargin)),

    // jusText-shaped HTML main-text extraction — the missing FIRST stage
    // of a real web-corpus pipeline: strip script/style/comments, split
    // on block tags, keep blocks by length + link density, decode
    // entities, join with newlines. The fixture wraps each document in a
    // full synthesized page (nav, ads, chrome, a <div> hidden inside the
    // script) and both engines render AND extract independently — so the
    // check covers the extraction semantics, not a fixture replay. All
    // codegen'd built-ins: one narrow map over the scan, no UDF.
    Q("ta_html_extract",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.htmlExtract(
            synthHtmlCol(col("doc_id"), col("text"))).as("text")),
      Some(s"""WITH h AS (SELECT doc_id, $synthHtmlSql AS html
              |          FROM documents)
              |SELECT doc_id, ${htmlExtractSql("html")} AS text
              |FROM h""".stripMargin)),

    // Deterministic dataset mixing: per-source sampling fractions decided
    // by a seeded key hash — same rows make the cut on any cluster or
    // partitioning (df.sample's per-partition RNG cannot promise that),
    // and the oracle replays the identical integer arithmetic.
    Q("ds_mix_sample",
      (s, dir) => Sampling.mixBySource(t(s, dir, "documents"), "doc_id",
          "source", Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25,
            "src3" -> 0.1), seed = 7)
        .select("doc_id", "source", "lang"),
      Some(s"""SELECT doc_id, source, lang FROM documents
              |WHERE ${h32Sql("doc_id::VARCHAR", "7")} % 1000000 <
              |  CASE source WHEN 'src0' THEN 1000000 WHEN 'src1' THEN 500000
              |    WHEN 'src2' THEN 250000 WHEN 'src3' THEN 100000
              |    ELSE -1 END""".stripMargin)),

    // DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    // bag-of-buckets log-likelihood ratio between a target exemplar
    // class (source = src0) and the raw pool, deterministic top-k keep.
    // The oracle refits both smoothed multinomials and replays the
    // quantized weight + (w desc, id asc) selection.
    Q("ds_dsir_select",
      (s, dir) => Sampling.dsirSelect(t(s, dir, "documents"), "doc_id",
        "text", col("source") === "src0", numBuckets = 64, k = 25),
      Some(s"""WITH toks AS ($toksSql),
              |g AS (
              |  SELECT id, unnest(list_concat(tk,
              |    list_transform(range(0, greatest(len(tk) - 1, 0)),
              |      i -> tk[i+1] || ' ' || tk[i+2]))) AS gram
              |  FROM toks),
              |dc AS (
              |  SELECT g.id, ${h32Sql("gram", "0")} % 64 AS bucket,
              |    count(*) AS c
              |  FROM g GROUP BY 1, 2),
              |lab AS (SELECT doc_id AS id,
              |          CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS tgt
              |        FROM documents),
              |cb AS (SELECT tgt, bucket, sum(c) AS n
              |       FROM dc JOIN lab USING (id) GROUP BY 1, 2),
              |tot AS (SELECT tgt, sum(n) AS nn FROM cb GROUP BY 1),
              |dom AS (SELECT unnest(range(0, 64)) AS bucket),
              |ratio AS (
              |  SELECT dom.bucket,
              |    ln((coalesce(t.n, 0) + 1)::DOUBLE / (tt.nn + 64)) -
              |    ln((coalesce(r.n, 0) + 1)::DOUBLE / (rt.nn + 64)) AS lr
              |  FROM dom
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 1) t
              |    ON dom.bucket = t.bucket
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 0) r
              |    ON dom.bucket = r.bucket,
              |  (SELECT nn FROM tot WHERE tgt = 1) tt,
              |  (SELECT nn FROM tot WHERE tgt = 0) rt),
              |wsum AS (
              |  SELECT dc.id, sum(dc.c * ratio.lr) AS wraw
              |  FROM dc JOIN ratio USING (bucket) GROUP BY dc.id),
              |wq AS (
              |  SELECT d.doc_id,
              |    coalesce(floor(wraw * 1e6 + 5e-1) / 1e6 + 0e0, 0e0) AS w
              |  FROM documents d LEFT JOIN wsum ON d.doc_id = wsum.id),
              |ranked AS (
              |  SELECT doc_id, w, row_number() OVER (
              |    ORDER BY w DESC, doc_id ASC) AS rn
              |  FROM wq)
              |SELECT doc_id, w,
              |  CASE WHEN rn <= 25 THEN 1 ELSE 0 END AS selected
              |FROM ranked""".stripMargin)),

    // DSIR with the paper's actual Gumbel RESAMPLING: selection key =
    // importance weight + seeded-hash Gumbel noise (-ln(-ln(u)), u from
    // the keyedCut integer uniform) — Gumbel-top-k IS sampling without
    // replacement proportional to softmax(w), and the seeded hash keeps
    // it deterministic and oracle-replayable.
    Q("ds_dsir_sample",
      (s, dir) => Sampling.dsirSelect(t(s, dir, "documents"), "doc_id",
        "text", col("source") === "src0", numBuckets = 64, k = 25,
        gumbelSeed = Some(11)),
      Some(s"""WITH toks AS ($toksSql),
              |g AS (
              |  SELECT id, unnest(list_concat(tk,
              |    list_transform(range(0, greatest(len(tk) - 1, 0)),
              |      i -> tk[i+1] || ' ' || tk[i+2]))) AS gram
              |  FROM toks),
              |dc AS (
              |  SELECT g.id, ${h32Sql("gram", "0")} % 64 AS bucket,
              |    count(*) AS c
              |  FROM g GROUP BY 1, 2),
              |lab AS (SELECT doc_id AS id,
              |          CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS tgt
              |        FROM documents),
              |cb AS (SELECT tgt, bucket, sum(c) AS n
              |       FROM dc JOIN lab USING (id) GROUP BY 1, 2),
              |tot AS (SELECT tgt, sum(n) AS nn FROM cb GROUP BY 1),
              |dom AS (SELECT unnest(range(0, 64)) AS bucket),
              |ratio AS (
              |  SELECT dom.bucket,
              |    ln((coalesce(t.n, 0) + 1)::DOUBLE / (tt.nn + 64)) -
              |    ln((coalesce(r.n, 0) + 1)::DOUBLE / (rt.nn + 64)) AS lr
              |  FROM dom
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 1) t
              |    ON dom.bucket = t.bucket
              |  LEFT JOIN (SELECT bucket, n FROM cb WHERE tgt = 0) r
              |    ON dom.bucket = r.bucket,
              |  (SELECT nn FROM tot WHERE tgt = 1) tt,
              |  (SELECT nn FROM tot WHERE tgt = 0) rt),
              |wsum AS (
              |  SELECT dc.id, sum(dc.c * ratio.lr) AS wraw
              |  FROM dc JOIN ratio USING (bucket) GROUP BY dc.id),
              |wq AS (
              |  SELECT d.doc_id,
              |    coalesce(floor(wraw * 1e6 + 5e-1) / 1e6 + 0e0, 0e0) AS w
              |  FROM documents d LEFT JOIN wsum ON d.doc_id = wsum.id),
              |keyed AS (
              |  SELECT doc_id, w,
              |    floor((w - ln(-ln(
              |      ((${h32Sql("doc_id::VARCHAR", "11")} % 1000000)::DOUBLE
              |        + 5e-1) / 1e6))) * 1e6 + 5e-1) / 1e6 + 0e0
              |      AS sel_key
              |  FROM wq),
              |ranked AS (
              |  SELECT doc_id, w, sel_key, row_number() OVER (
              |    ORDER BY sel_key DESC, doc_id ASC) AS rn
              |  FROM keyed)
              |SELECT doc_id, w, sel_key,
              |  CASE WHEN rn <= 25 THEN 1 ELSE 0 END AS selected
              |FROM ranked""".stripMargin)),

    // Curriculum-style quality binning: ntile quartiles over the composite
    // quality score (deterministic tie order by doc_id)
    Q("ds_quality_bins",
      (s, dir) => {
        // exchange barrier: the interpreted quality HOF must materialize
        // BEFORE the global ntile sort, or projection collapse re-evaluates
        // it through the window (measured ~10x on the corpus)
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            TextAnalysis.qualityScore(col("text")).as("quality"))
          .repartition(col("doc_id"))
        // distributed exact ntile: a bare NTILE() OVER (ORDER BY ...) is a
        // single-partition window — the one 100x bottleneck this registry
        // had left; globalNtile keeps the sort range-partitioned
        graft.operators.Ranking.globalNtile(d, 4,
            Seq(col("quality").desc, col("doc_id").asc), "bin")
          .select(col("doc_id"), col("quality"), col("bin"))
      },
      Some(s"""WITH toks AS ($toksSql),
              |q AS (SELECT id AS doc_id, ${qualitySql("text", "tk")} AS quality
              |      FROM toks)
              |SELECT doc_id, quality,
              |  CAST(ntile(4) OVER (ORDER BY quality DESC, doc_id ASC) AS INT)
              |    AS bin
              |FROM q""".stripMargin)),

    // Sequence packing for training: docs fill fixed 512-token bins in
    // doc_id order within each source shard (contiguous greedy fill; a
    // doc belongs to the bin holding its first token). Per-source
    // windows keep the cumulative sum distributed — no global order.
    Q("ds_pack_sequences",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id", expr("(cum - n_tokens) div 512"))
          .select("doc_id", "source", "n_tokens", "seq_id")
      },
      Some(s"""WITH toks AS ($toksSql),
              |d AS (SELECT t.id AS doc_id, doc.source,
              |        len(t.tk)::BIGINT AS n_tokens
              |      FROM toks t JOIN documents doc ON t.id = doc.doc_id),
              |c AS (SELECT doc_id, source, n_tokens,
              |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |          ROWS UNBOUNDED PRECEDING) AS cum
              |      FROM d)
              |SELECT doc_id, source, n_tokens,
              |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id
              |FROM c""".stripMargin)),

    // Benchmark decontamination: docs >= 10 checked against the "benchmark"
    // docs < 10 on shared distinct word 3-grams (>= 2 hits flags a doc)
    Q("dd_decontaminate",
      (s, dir) => {
        val all = t(s, dir, "documents")
        Dedup.ngramContamination(
          all.where(col("doc_id") >= 10), all.where(col("doc_id") < 10),
          "doc_id", "text", shingleN = 3, minHits = 2)
      },
      Some(s"""WITH sh0 AS ($shinglesSql),
              |h AS (
              |  SELECT id, list_transform(sh, s -> ${h32Sql("s", "0")}) AS h1
              |  FROM sh0),
              |d AS (SELECT id AS doc_id, unnest(h1) AS g FROM h WHERE id >= 10),
              |p AS (SELECT id AS probe_id, unnest(h1) AS g FROM h WHERE id < 10)
              |SELECT d.doc_id, p.probe_id, count(*) AS n_hits
              |FROM d JOIN p USING (g)
              |GROUP BY d.doc_id, p.probe_id
              |HAVING count(*) >= 2""".stripMargin)),

    // DD: SEMANTIC decontamination — the paraphrase-robust complement
    // of dd_decontaminate: corpus docs flagged when their embedding
    // sits within cosine 0.3 of ANY probe embedding (a rewritten eval
    // item shares no n-grams but lands next to the original in
    // embedding space; real pipelines run both checks). SRP bucket
    // equi-join candidates, exact cosine verify, per-doc evidence
    // (argmax probe, max cosine, hit count).
    Q("dd_semantic_decontaminate",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Dedup.semanticContamination(
          emb.where(col("vec_id") >= 50), emb.where(col("vec_id") < 50),
          "vec_id", "embedding", threshold = 0.3, numPlanes = 8,
          tables = 4)
      },
      Some {
        val buckets = (0 until 4).map(tb =>
          s"SELECT id, v, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM e")
          .mkString("\nUNION ALL\n")
        s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
           |b AS ($buckets),
           |cand AS (
           |  SELECT DISTINCT d.id AS doc_id, p.id AS probe_id,
           |    d.v AS d_v, p.v AS p_v
           |  FROM b d JOIN b p ON d.tbl = p.tbl AND d.bucket = p.bucket
           |  WHERE d.id >= 50 AND p.id < 50),
           |hits AS (
           |  SELECT doc_id, probe_id, ${cosSql("d_v", "p_v")} AS cosine
           |  FROM cand WHERE ${cosSql("d_v", "p_v")} >= 0.3),
           |agg AS (
           |  SELECT doc_id, max(cosine) AS maxc, count(*) AS n_hits
           |  FROM hits GROUP BY doc_id),
           |best AS (
           |  SELECT h.doc_id, min(h.probe_id) AS probe_id
           |  FROM hits h JOIN agg
           |    ON h.doc_id = agg.doc_id AND h.cosine = agg.maxc
           |  GROUP BY h.doc_id)
           |SELECT agg.doc_id, best.probe_id,
           |  round(agg.maxc, 6) + 0e0 AS max_cosine, agg.n_hits
           |FROM agg JOIN best ON agg.doc_id = best.doc_id""".stripMargin
      }),

    // DD: per-document duplicated-text fraction — the share of each
    // doc's distinct 3-gram shingles that appear in >= 2 docs corpus-
    // wide (the "mostly boilerplate?" filter signal). One shingle-df
    // partial agg + a vocab-keyed join-back; floor(f*1e6+0.5)/1e6
    // quantization because power-of-two shingle counts make decimal
    // midpoints reachable.
    Q("dd_dup_fraction",
      (s, dir) => Dedup.dupShingleFraction(
        t(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH s AS ($shinglesSql),
              |e AS (SELECT id, ${h32Sql("unnest(sh)", "0")} AS g FROM s),
              |d AS (SELECT g, count(*) AS df FROM e GROUP BY g),
              |j AS (SELECT e.id, d.df FROM e JOIN d USING (g))
              |SELECT id AS doc_id, count(*) AS n_shingles,
              |  count(*) FILTER (WHERE df >= 2) AS n_dup,
              |  floor((CAST(count(*) FILTER (WHERE df >= 2) AS DOUBLE) /
              |    CAST(count(*) AS DOUBLE)) * 1e6 + 5e-1) / 1e6 AS dup_frac
              |FROM j GROUP BY id""".stripMargin)),

    // DD: C4-style corpus-wide line dedup — documents are synthesized
    // into 4-token lines (both engines independently, the htmlPage
    // precedent), then any line >= 10 chars occurring more than once
    // keeps only its first (doc, line_no) occurrence and every doc is
    // rebuilt from its surviving lines. Short lines are never candidates.
    Q("dd_line_dedup",
      (s, dir) => Dedup.lineDedup(linedDocs(s, dir), "doc_id", "text",
        minLen = 10),
      Some(s"""WITH $lineDedupCtes
              |SELECT doc_id, text, n_lines, n_dropped
              |FROM lined_docs""".stripMargin)),

    // DD: duplicated-SPAN extraction — the actionable complement of
    // dd_dup_fraction: the maximal token ranges whose every 3-gram is
    // corpus-duplicated (the C4-style "cut the boilerplate passage,
    // keep the document" operator). Positional shingle explode ->
    // shingle df partial agg -> island windows per doc.
    Q("dd_dup_spans",
      (s, dir) => Dedup.dupSpans(t(s, dir, "documents"), "doc_id", "text"),
      Some(s"""WITH toks AS ($toksSql),
              |e AS (
              |  SELECT id,
              |    unnest(range(0, greatest(len(tk) - 2, 1))) AS p,
              |    unnest(CASE WHEN len(tk) < 3
              |      THEN [${h32Sql("array_to_string(tk, ' ')", "0")}]
              |      ELSE list_transform(range(0, len(tk) - 2),
              |        i -> ${h32Sql("array_to_string(tk[i+1:i+3], ' ')", "0")})
              |      END) AS g
              |  FROM toks),
              |d AS (SELECT g, count(*) AS df
              |      FROM (SELECT DISTINCT id, g FROM e) GROUP BY g),
              |dup AS (SELECT e.id, e.p FROM e JOIN d USING (g)
              |        WHERE d.df >= 2),
              |isl AS (SELECT id, p,
              |          p - row_number() OVER (PARTITION BY id ORDER BY p)
              |            AS island
              |        FROM dup)
              |SELECT id AS doc_id, CAST(min(p) AS INT) AS start_tok,
              |  CAST(max(p) + 2 AS INT) AS end_tok,
              |  count(*) AS n_shingles
              |FROM isl GROUP BY id, island""".stripMargin)),

    // DD: exact duplicated substrings with the Lee et al. 2022 minimum
    // CHARACTER length contract (>= 50 chars) — dd_dup_spans' islands
    // lifted to character offsets via offset-preserving tokenization.
    // The oracle rebuilds token char spans from first principles (char
    // classification -> alnum-run islands -> positions), so the whole
    // offset pipeline is independently replayed, not trusted.
    Q("dd_dup_spans_exact",
      (s, dir) => Dedup.dupSpansExact(t(s, dir, "documents"), "doc_id",
          "text", n = 3, minDocs = 2, minChars = 50)
        .select(col("doc_id"), col("start_char"), col("end_char"),
          col("len_chars"), col("n_shingles")),
      Some(s"""WITH ch AS (
              |  SELECT doc_id, i, substring(lower(text), i + 1, 1) AS c
              |  FROM (SELECT doc_id, text,
              |          unnest(range(0, length(text))) AS i
              |        FROM documents)),
              |an AS (SELECT doc_id, i FROM ch
              |       WHERE (c >= 'a' AND c <= 'z')
              |          OR (c >= '0' AND c <= '9')),
              |tki AS (SELECT doc_id, i,
              |          i - row_number() OVER (PARTITION BY doc_id
              |            ORDER BY i) AS isl
              |        FROM an),
              |tk0 AS (SELECT doc_id, isl, min(i) AS s, max(i) + 1 AS e
              |        FROM tki GROUP BY doc_id, isl),
              |tk AS (SELECT doc_id, s, e, row_number() OVER (
              |         PARTITION BY doc_id ORDER BY s) - 1 AS p
              |       FROM tk0),
              |tks AS (SELECT tk.doc_id, p, s, e,
              |          substring(lower(d.text), s + 1, e - s) AS tok
              |        FROM tk JOIN documents d ON tk.doc_id = d.doc_id),
              |cnt AS (SELECT doc_id, count(*) AS nt FROM tks
              |        GROUP BY doc_id),
              |sh AS (
              |  SELECT t0.doc_id, t0.p,
              |    ${h32Sql("t0.tok || ' ' || t1.tok || ' ' || t2.tok", "0")}
              |      AS g,
              |    t0.s AS sc, t2.e AS ec
              |  FROM tks t0
              |  JOIN tks t1 ON t1.doc_id = t0.doc_id AND t1.p = t0.p + 1
              |  JOIN tks t2 ON t2.doc_id = t0.doc_id AND t2.p = t0.p + 2
              |  UNION ALL
              |  SELECT x.doc_id, 0 AS p, ${h32Sql("x.alltok", "0")} AS g,
              |    x.s0 AS sc, x.e1 AS ec
              |  FROM (SELECT doc_id, string_agg(tok, ' ' ORDER BY p)
              |          AS alltok, min(s) AS s0, max(e) AS e1
              |        FROM tks GROUP BY doc_id) x
              |  JOIN cnt ON cnt.doc_id = x.doc_id AND cnt.nt < 3),
              |d AS (SELECT g, count(*) AS df
              |      FROM (SELECT DISTINCT doc_id, g FROM sh) GROUP BY g),
              |dup AS (SELECT sh.doc_id, sh.p, sh.sc, sh.ec
              |        FROM sh JOIN d USING (g) WHERE d.df >= 2),
              |isl2 AS (SELECT doc_id, p, sc, ec,
              |           p - row_number() OVER (PARTITION BY doc_id
              |             ORDER BY p) AS island
              |         FROM dup),
              |sp AS (SELECT doc_id, CAST(min(sc) AS INT) AS start_char,
              |         CAST(max(ec) AS INT) AS end_char,
              |         count(*) AS n_shingles
              |       FROM isl2 GROUP BY doc_id, island)
              |SELECT doc_id, start_char, end_char,
              |  end_char - start_char AS len_chars, n_shingles
              |FROM sp WHERE end_char - start_char >= 50""".stripMargin)),

    // Intra-document repetition signals (Gopher/RefinedWeb-style quality
    // rules): duplicate word-3-gram fraction + most-common-token fraction
    Q("ta_repetition",
      (s, dir) => t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.dupNgramFrac(col("text"), 3).as("dup_3gram_frac"),
        TextAnalysis.topTokenFrac(col("text")).as("top_token_frac")),
      Some(s"""WITH toks AS ($toksSql),
              |sh AS (
              |  SELECT id, tk, CASE WHEN len(tk) < 3
              |    THEN [array_to_string(tk, ' ')]
              |    ELSE list_transform(range(0, len(tk) - 2),
              |      i -> array_to_string(tk[i+1:i+3], ' ')) END AS g
              |  FROM toks)
              |SELECT id AS doc_id,
              |  round(1e0 - len(list_distinct(g))::DOUBLE / len(g), 6)
              |    AS dup_3gram_frac,
              |  round(coalesce(list_max(list_transform(list_distinct(tk),
              |    t -> len(list_filter(tk, x -> x = t))))::DOUBLE
              |    / len(tk), 0e0), 6) AS top_token_frac
              |FROM sh""".stripMargin)),

    // PII scrubbing (training-data pipeline op): per-pattern counts on the
    // raw text + tag-redacted output. Known PII is synthesized into each
    // doc from its id so the redaction provably fires; patterns are
    // lookaround-free so Java regex (Spark) and RE2 (DuckDB) agree.
    Q("ta_pii_redact",
      (s, dir) => {
        val withPii = t(s, dir, "documents").withColumn("txt",
          concat(col("text"), lit(" contact user"),
            col("doc_id").cast("string"),
            lit("@example.com or http://ex.org/p/"),
            col("doc_id").cast("string"), lit(" tel +1 555 01"),
            pmod(col("doc_id"), lit(100L)).cast("string"), lit(" ip 10.0."),
            pmod(col("doc_id"), lit(256L)).cast("string"), lit(".7")))
        withPii.select(
          (col("doc_id") +: TextAnalysis.piiCounts(col("txt"))) :+
            TextAnalysis.redactPii(col("txt")).as("redacted"): _*)
      },
      Some {
        val mk = TextAnalysis.PiiPatterns
        val txt = """text || ' contact user' || doc_id::VARCHAR ||
                    |'@example.com or http://ex.org/p/' || doc_id::VARCHAR ||
                    |' tel +1 555 01' || (doc_id % 100)::VARCHAR ||
                    |' ip 10.0.' || (doc_id % 256)::VARCHAR || '.7'"""
          .stripMargin.replace("\n", " ")
        val counts = mk.map { case (kind, re, _) =>
          s"CAST(len(regexp_extract_all(txt, '$re')) AS INT) AS n_$kind"
        }.mkString(",\n  ")
        val redacted = mk.foldLeft("txt") { case (acc, (_, re, tag)) =>
          s"regexp_replace($acc, '$re', '$tag', 'g')"
        }
        s"""WITH w AS (SELECT doc_id, $txt AS txt FROM documents)
           |SELECT doc_id,
           |  $counts,
           |  $redacted AS redacted
           |FROM w""".stripMargin
      }),

    // TA: URL canonicalization — the C4/CCNet pre-dedup step. Messy URL
    // forms (mixed-case scheme/host, www., default and explicit ports,
    // trailing slashes, shuffled + tracking query params, empty parts,
    // bare '?', fragments) are synthesized per doc_id by the SAME
    // construction in both engines; each engine then canonicalizes
    // INDEPENDENTLY with its own regex/list primitives, so the compare
    // exercises the full normal form, not a shared shortcut.
    // TA: unicode SCRIPT census — the routing signal langId can't give:
    // marker words only exist within a script family, so a multilingual
    // corpus first splits by dominant script (codepoint counts over the
    // BMP script blocks, codegen'd length-diff regexp — no UDF), then
    // runs per-family language ID. Mixed-script text synthesized
    // identically in both engines from chr() codepoints (the url/html
    // synthesis precedent).
    Q("ta_script_mix",
      (s, dir) => {
        val id = col("doc_id")
        def pick(base: Int, n: Int) = element_at(
          array((0 until n).map(i =>
            lit(new String(Character.toChars(base + i)))): _*),
          (pmod(id, lit(n.toLong)) + 1).cast("int"))
        val mixed = t(s, dir, "documents")
          .select(id, col("text"), pick(0x0430, 8).as("gc"),
            pick(0x4E00, 16).as("gk"), pick(0x0627, 4).as("ga"),
            pick(0x03B1, 6).as("gg"))
          .select(id, concat(
            expr("substr(lower(text), 1, CAST(doc_id % 13 AS INT))"),
            expr("repeat(gc, CAST(doc_id % 7 AS INT) * 3)"),
            expr("repeat(gk, CAST(doc_id % 5 AS INT) * 4)"),
            expr("repeat(ga, CAST(doc_id % 3 AS INT) * 5)"),
            expr("repeat(gg, CAST(doc_id % 4 AS INT) * 2)")).as("mtext"))
        val counts = TextAnalysis.scriptCounts(col("mtext"))
          .map { case (n, e) => e.as(n) }
        mixed.select(Seq(id) ++ counts ++ Seq(
          TextAnalysis.dominantScript(col("mtext")).as("dominant"),
          TextAnalysis.nonLatinRatio(col("mtext")).as("non_latin_ratio")): _*)
      },
      Some("""WITH m AS (
             |  SELECT doc_id,
             |    substr(lower(text), 1, (doc_id % 13)::INT) ||
             |    repeat(chr(1072 + (doc_id % 8)::INT),
             |      (doc_id % 7)::INT * 3) ||
             |    repeat(chr(19968 + (doc_id % 16)::INT),
             |      (doc_id % 5)::INT * 4) ||
             |    repeat(chr(1575 + (doc_id % 4)::INT),
             |      (doc_id % 3)::INT * 5) ||
             |    repeat(chr(945 + (doc_id % 6)::INT),
             |      (doc_id % 4)::INT * 2) AS mtext
             |  FROM documents),
             |cnt AS (
             |  SELECT doc_id,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[A-Za-z\x{00C0}-\x{024F}]', '', 'g')) AS n_latin,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{0370}-\x{03FF}]', '', 'g')) AS n_greek,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic,
             |    length(mtext) - length(regexp_replace(mtext,
             |      '[\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}\x{AC00}-\x{D7AF}]',
             |      '', 'g')) AS n_cjk
             |  FROM m)
             |SELECT doc_id, n_latin, n_cyrillic, n_greek, n_arabic, n_cjk,
             |  CASE
             |    WHEN n_latin >= n_cyrillic AND n_latin >= n_greek AND
             |      n_latin >= n_arabic AND n_latin >= n_cjk AND n_latin > 0
             |      THEN 'latin'
             |    WHEN n_cyrillic >= n_latin AND n_cyrillic >= n_greek AND
             |      n_cyrillic >= n_arabic AND n_cyrillic >= n_cjk AND
             |      n_cyrillic > 0 THEN 'cyrillic'
             |    WHEN n_greek >= n_latin AND n_greek >= n_cyrillic AND
             |      n_greek >= n_arabic AND n_greek >= n_cjk AND n_greek > 0
             |      THEN 'greek'
             |    WHEN n_arabic >= n_latin AND n_arabic >= n_cyrillic AND
             |      n_arabic >= n_greek AND n_arabic >= n_cjk AND n_arabic > 0
             |      THEN 'arabic'
             |    WHEN n_cjk >= n_latin AND n_cjk >= n_cyrillic AND
             |      n_cjk >= n_greek AND n_cjk >= n_arabic AND n_cjk > 0
             |      THEN 'cjk'
             |    ELSE 'none' END AS dominant,
             |  CASE WHEN n_latin + n_cyrillic + n_greek + n_arabic + n_cjk
             |      = 0 THEN 0e0
             |    ELSE floor((n_cyrillic + n_greek + n_arabic + n_cjk)::DOUBLE
             |      / (n_latin + n_cyrillic + n_greek + n_arabic + n_cjk)
             |      * 1e6 + 5e-1) / 1e6
             |  END AS non_latin_ratio
             |FROM cnt""".stripMargin)),

    // TA: domain-level curation — the CCNet/RefinedWeb stage a per-doc
    // filter can't express: roll quality and exact-dup evidence up to
    // the REGISTERED DOMAIN and gate whole domains (a spam domain's
    // individually-plausible docs all drop together). URLs synthesized
    // identically in both engines (the ta_url_canon precedent, 23
    // domains); per-doc verdict carries the domain evidence. The stats
    // join is rollup-sized (#domains), AQE broadcasts it.
    Q("ta_domain_filter",
      (s, dir) => {
        val url = concat(lit("https://www.news"),
          pmod(col("doc_id"), lit(23L)).cast("string"),
          lit(".org/p/"), col("doc_id").cast("string"))
        val docs = t(s, dir, "documents")
          .select(col("doc_id"), col("text"),
            UrlFunctions.urlDomain(url).as("domain"))
        val stats = docs.groupBy("domain").agg(
          count(lit(1)).as("domain_docs"),
          (floor((lit(1.0) - countDistinct(md5(col("text"))).cast("double")
            / count(lit(1))) * lit(1e6) + lit(0.5)) / lit(1e6))
            .as("domain_dup_rate"),
          (floor(avg(TextAnalysis.qualityScoreExpr(col("text"))) * lit(1e6)
            + lit(0.5)) / lit(1e6)).as("domain_mean_q"))
        // the quality gate is RELATIVE — at or above the cross-domain
        // median — so it calibrates itself at any scale instead of
        // hard-coding a corpus-specific absolute threshold (23 domains,
        // odd count: the median is an exact element on both engines).
        // Exact percentile buffers all domain means in the final agg
        // task — fine for rollup-sized domain counts; at web-scale
        // domain cardinality (~10^7+) swap in the mergeable
        // Sketches.autoRangeQuantiles bound instead.
        val med = stats.agg(
          expr("percentile(domain_mean_q, 0.5)").as("med_q"))
        docs.join(stats, "domain").crossJoin(broadcast(med))
          .select(col("doc_id"), col("domain"), col("domain_docs"),
            col("domain_dup_rate"), col("domain_mean_q"),
            when(col("domain_dup_rate") <= 0.2 &&
              col("domain_mean_q") >= col("med_q"), 1).otherwise(0)
              .as("keep"))
      },
      Some(s"""WITH toks AS ($toksSql),
              |d AS (SELECT d0.doc_id, d0.text, t.tk,
              |        'news' || (d0.doc_id % 23)::VARCHAR || '.org'
              |          AS domain
              |      FROM documents d0 JOIN toks t ON d0.doc_id = t.id),
              |q AS (SELECT doc_id, domain, text,
              |        ${qualitySql("text", "tk")} AS q
              |      FROM d),
              |st AS (SELECT domain, count(*)::BIGINT AS domain_docs,
              |         floor((1e0 - count(DISTINCT md5(text))::DOUBLE /
              |           count(*)) * 1e6 + 5e-1) / 1e6 AS domain_dup_rate,
              |         floor(avg(q) * 1e6 + 5e-1) / 1e6 AS domain_mean_q
              |       FROM q GROUP BY domain),
              |md AS (SELECT median(domain_mean_q) AS med_q FROM st)
              |SELECT doc_id, q.domain, domain_docs, domain_dup_rate,
              |  domain_mean_q,
              |  CASE WHEN domain_dup_rate <= 2e-1 AND domain_mean_q >= med_q
              |    THEN 1 ELSE 0 END AS keep
              |FROM q JOIN st ON q.domain = st.domain, md""".stripMargin)),

    Q("ta_url_canon",
      (s, dir) => {
        val m = pmod(col("doc_id"), lit(12L))
        val id = col("doc_id").cast("string")
        val qs = when(m % 6 === 0, lit("b=2&a=1&utm_source=feed"))
          .when(m % 6 === 1, lit("a=1&b=2"))
          .when(m % 6 === 2, lit("utm_campaign=x&b=2&a=1"))
          .when(m % 6 === 3, lit("fbclid=ZZ"))
          .when(m % 6 === 4, lit("b=2&&a=1"))
          .otherwise(lit(""))
        val url = concat(
          when(m % 3 === 0, lit("HTTPS")).when(m % 3 === 1, lit("http"))
            .otherwise(lit("https")),
          lit("://"),
          when(m % 2 === 0, lit("WWW.")).otherwise(lit("")),
          lit("News"), pmod(col("doc_id"), lit(7L)).cast("string"),
          lit(".Example.COM"),
          when(m === 0, lit(":443")).when(m === 1, lit(":80"))
            .when(m === 2, lit(":8080")).otherwise(lit("")),
          when(m === 5, lit("")).otherwise(concat(lit("/Articles/"), id,
            when(m % 4 === 0, lit("/")).otherwise(lit("")))),
          when(qs =!= "", concat(lit("?"), qs))
            .when(m === 11, lit("?")).otherwise(lit("")),
          when(m % 2 === 1, concat(lit("#Sec"), id)).otherwise(lit("")))
        t(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"), col("url"),
            UrlFunctions.canonicalUrl(col("url")).as("canonical_url"),
            UrlFunctions.urlHost(col("url")).as("host"),
            UrlFunctions.urlDomain(col("url")).as("domain"))
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |    (CASE (doc_id % 12) % 3 WHEN 0 THEN 'HTTPS'
             |       WHEN 1 THEN 'http' ELSE 'https' END) || '://' ||
             |    (CASE WHEN (doc_id % 12) % 2 = 0 THEN 'WWW.' ELSE '' END) ||
             |    'News' || (doc_id % 7)::VARCHAR || '.Example.COM' ||
             |    (CASE doc_id % 12 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
             |       WHEN 2 THEN ':8080' ELSE '' END) ||
             |    (CASE WHEN doc_id % 12 = 5 THEN ''
             |       ELSE '/Articles/' || doc_id::VARCHAR ||
             |         (CASE WHEN (doc_id % 12) % 4 = 0 THEN '/' ELSE '' END)
             |     END) ||
             |    (CASE (doc_id % 12) % 6
             |       WHEN 0 THEN '?b=2&a=1&utm_source=feed'
             |       WHEN 1 THEN '?a=1&b=2'
             |       WHEN 2 THEN '?utm_campaign=x&b=2&a=1'
             |       WHEN 3 THEN '?fbclid=ZZ'
             |       WHEN 4 THEN '?b=2&&a=1'
             |       ELSE (CASE WHEN doc_id % 12 = 11 THEN '?' ELSE '' END)
             |     END) ||
             |    (CASE WHEN (doc_id % 12) % 2 = 1
             |       THEN '#Sec' || doc_id::VARCHAR ELSE '' END) AS url
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, url,
             |    lower(regexp_extract(url,
             |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
             |    lower(regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)) AS auth,
             |    regexp_extract(url,
             |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS rawpath,
             |    regexp_extract(url, '\?([^#]*)', 1) AS q
             |  FROM u),
             |d AS (
             |  SELECT *, regexp_extract(auth, ':([0-9]+)$', 1) AS port,
             |    regexp_replace(regexp_replace(auth, ':[0-9]+$', ''),
             |      '^www\.', '') AS host
             |  FROM c),
             |e AS (
             |  SELECT *,
             |    host || (CASE WHEN port <> '' AND NOT
             |        ((scheme = 'http' AND port = '80') OR
             |         (scheme = 'https' AND port = '443'))
             |      THEN ':' || port ELSE '' END) AS authority,
             |    (CASE WHEN regexp_replace(rawpath, '/+$', '') = ''
             |      THEN '/' ELSE regexp_replace(rawpath, '/+$', '') END)
             |      AS path,
             |    coalesce(array_to_string(
             |      list_sort(list_filter(string_split(q, '&'),
             |        p -> p <> '' AND NOT regexp_matches(p,
             |          '^(utm_[^=]*|fbclid|gclid|ref)(=|$)'))), '&'), '')
             |      AS cq
             |  FROM d)
             |SELECT doc_id, url,
             |  scheme || '://' || authority || path ||
             |    (CASE WHEN cq = '' THEN '' ELSE '?' || cq END)
             |    AS canonical_url,
             |  host,
             |  (CASE WHEN len(string_split(host, '.')) >= 2
             |    THEN string_split(host, '.')[-2] || '.' ||
             |      string_split(host, '.')[-1]
             |    ELSE host END) AS domain
             |FROM e""".stripMargin)),

    // Multimodal plumbing: opaque binary column + typed metadata
    // extraction, decode REAL end-to-end — payloads are synthesized in
    // five actual container formats (PNG/JPEG/BMP/WAV/GIF), then
    // extractMeta sniffs the magic bytes and reads dimensions from each
    // format's own header structures (CRC-verified PNG IHDR, JPEG SOF
    // walk, BMP/GIF LE descriptors, RIFF chunk walk). The oracle replays
    // the closed form of the synthesis parameters; GIF's LZW-compressed
    // byte length has no closed form, so n_bytes is NULL for gif rows on
    // both sides (dims still checked).
    Q("mm_binary_meta",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p = (id % 5) match {
              case 0 => Multimodal.pngSynth((id % 300 + 1).toInt,
                (id % 200 + 1).toInt)
              case 1 => Multimodal.jpegSynthHeader((id % 500 + 1).toInt,
                (id % 400 + 1).toInt)
              case 2 => Multimodal.bmpSynth((id % 320 + 1).toInt,
                (id % 240 + 1).toInt)
              case 3 => Multimodal.wavSynth(1, 8000,
                (0 until (id % 10 + 1).toInt)
                  .map(i => ((id * 7 + i) % 65536 - 32768).toShort))
              case _ => graft.operators.Gif.gifSynth(id,
                (id % 50 + 1).toInt, (id % 40 + 1).toInt)
            }
            (id, p)
          }.toDF("doc_id", "payload")
        Multimodal.extractMeta(payloads, "doc_id", "payload").toDF()
          .select(col("doc_id"),
            when(col("format") === "gif", lit(null).cast("long"))
              .otherwise(col("n_bytes")).as("n_bytes"),
            col("width"), col("height"), col("format"))
      },
      Some("""SELECT doc_id,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN 45 WHEN 1 THEN 23
             |    WHEN 2 THEN 54 WHEN 3 THEN 44 + (doc_id % 10 + 1) * 2
             |    ELSE NULL END AS BIGINT) AS n_bytes,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN doc_id % 300 + 1
             |    WHEN 1 THEN doc_id % 500 + 1 WHEN 2 THEN doc_id % 320 + 1
             |    WHEN 3 THEN 0 ELSE doc_id % 50 + 1 END AS INT) AS width,
             |  CAST(CASE doc_id % 5 WHEN 0 THEN doc_id % 200 + 1
             |    WHEN 1 THEN doc_id % 400 + 1 WHEN 2 THEN doc_id % 240 + 1
             |    WHEN 3 THEN 0 ELSE doc_id % 40 + 1 END AS INT) AS height,
             |  (['png', 'jpeg', 'bmp', 'wav', 'gif'])[(doc_id % 5) + 1]
             |    AS format
             |FROM documents""".stripMargin)),

    // REAL pixel transform on an uncompressed format: synthesize full
    // 24bpp BMPs (header + padded bottom-up pixel rows), nearest-neighbor
    // resize them to 4x3, re-encode, and checksum the RE-ENCODED bytes —
    // decode -> transform -> encode as pure distributed byte arithmetic.
    // The oracle replays the closed form of source-pixel sampling.
    Q("mm_bmp_resize",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            (id, Multimodal.bmpSynthPixels(
              (id % 6 + 2).toInt, (id % 5 + 2).toInt))
          }.toDF("doc_id", "payload")
        Multimodal.extractBmpResized(payloads, "doc_id", "payload",
            outW = 4, outH = 3).toDF()
          .select("doc_id", "out_w", "out_h", "n_bytes", "pix_sum", "px_last")
      },
      Some("""WITH px AS (
             |  SELECT doc_id, i, j,
             |    (i * (doc_id % 6 + 2)) // 4 AS sx,
             |    (j * (doc_id % 5 + 2)) // 3 AS sy
             |  FROM documents,
             |    (SELECT unnest(range(0, 4)) AS i),
             |    (SELECT unnest(range(0, 3)) AS j)),
             |packed AS (
             |  SELECT doc_id, i, j,
             |    ((sx * 3 + sy * 17 + 11) % 256) * 65536 +
             |    ((sx * 11 + sy * 5 + 7) % 256) * 256 +
             |    ((sx * 7 + sy * 13 + 3) % 256) AS v
             |  FROM px)
             |SELECT doc_id, 4 AS out_w, 3 AS out_h,
             |  CAST(90 AS BIGINT) AS n_bytes,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN i = 3 AND j = 2 THEN v END) AS BIGINT)
             |    AS px_last
             |FROM packed GROUP BY doc_id""".stripMargin)),

    // Magic-byte sniff + REAL header decode roundtrip: payloads are
    // synthesized per doc_id in four container formats (PNG with verified
    // IHDR CRC, JPEG SOF marker walk, BMP little-endian header, RIFF/WAVE
    // chunk walk), then sniffed and measured back; the oracle is the
    // closed form of the synthesis parameters. Full PIXEL decode of the
    // compressed formats is real too — mm_png_decode / mm_jpeg_decode /
    // mm_gif_decode exercise the pure-JVM codecs end to end.
    Q("mm_format_sniff",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p = (id % 4) match {
              case 0 => Multimodal.pngSynth((id % 1000 + 1).toInt,
                (id % 700 + 1).toInt)
              case 1 => Multimodal.jpegSynthHeader((id % 800 + 1).toInt,
                (id % 600 + 1).toInt)
              case 2 => Multimodal.bmpSynth((id % 640 + 1).toInt,
                (id % 480 + 1).toInt)
              case _ => Multimodal.wavSynth(1, 8000,
                (0 until (id % 20 + 1).toInt)
                  .map(i => ((id * 13 + i) % 65536 - 32768).toShort))
            }
            (id, p)
          }.toDF("doc_id", "payload")
        Multimodal.extractSniffedMeta(payloads, "doc_id", "payload").toDF()
      },
      Some("""SELECT doc_id,
             |  CASE doc_id % 4 WHEN 0 THEN 45 WHEN 1 THEN 23 WHEN 2 THEN 54
             |    ELSE 44 + (doc_id % 20 + 1) * 2 END AS n_bytes,
             |  (['png', 'jpeg', 'bmp', 'wav'])[(doc_id % 4) + 1] AS format,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 1000 + 1
             |    WHEN 1 THEN doc_id % 800 + 1 WHEN 2 THEN doc_id % 640 + 1
             |    ELSE 0 END AS INT) AS width,
             |  CAST(CASE doc_id % 4 WHEN 0 THEN doc_id % 700 + 1
             |    WHEN 1 THEN doc_id % 600 + 1 WHEN 2 THEN doc_id % 480 + 1
             |    ELSE 0 END AS INT) AS height,
             |  true AS valid
             |FROM documents""".stripMargin)),

    // MM: REAL MPEG audio frame walk (ISO 11172-3 header arithmetic —
    // sync, bitrate/samplerate tables, per-layer frame lengths) over
    // per-doc synthesized Layer III streams; the oracle is the closed
    // form of the synthesis parameters. Entropy decode is NOT needed
    // for any of these fields — this is the metadata a pipeline routes
    // audio on (duration, bitrate, rate).
    Q("mm_mp3_meta",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p = MpegAudio.mp3SynthFrames((id % 5 + 1).toInt,
              (id % 14 + 1).toInt, (id % 3).toInt)
            MpegAudio.mp3Meta(id, p)
          }.toDF()
      },
      Some("""WITH g AS (
             |  SELECT doc_id, doc_id % 5 + 1 AS n,
             |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
             |      [CAST(doc_id % 14 + 1 AS INT)] AS kbps,
             |    ([44100,48000,32000])[CAST(doc_id % 3 + 1 AS INT)] AS sr
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(n * ((144 * kbps * 1000) // sr) AS BIGINT) AS n_bytes,
             |  CAST(1 AS INT) AS version, CAST(3 AS INT) AS layer,
             |  CAST(kbps AS INT) AS bitrate_kbps,
             |  CAST(sr AS INT) AS sample_rate,
             |  CAST(1 AS INT) AS channels, CAST(n AS INT) AS n_frames,
             |  CAST((n * 1152 * 1000) // sr AS BIGINT) AS duration_ms,
             |  false AS vbr, true AS valid
             |FROM g""".stripMargin)),

    // MM: REAL MPEG-1 Layer I subband decode — bit allocation,
    // scalefactor, and the spec's requantization formula
    // s'' = (2^nb/(2^nb-1)) * (s''' + 2^(1-nb)) — over per-doc
    // synthesized single-subband frames. The oracle replays the exact
    // requantization arithmetic (documented operation order, dyadic
    // constants, power-of-two scalefactors) per sample — 12 rows per
    // doc, bit-exact doubles with NO rounding on either side.
    Q("mm_mp1_subbands",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .flatMap { id =>
            val nb = (id % 14 + 2).toInt
            val sb = (id % 32).toInt
            val frame = MpegAudio.mp1Synth(sb, nb - 1, (3 * (id % 21)).toInt,
              sIdx => ((id * 7 + sIdx * 13) % (1L << nb)).toInt)
            val dec = MpegAudio.decodeLayer1(frame)
            (0 until 12).map(sIdx => (id, sIdx, dec.sub(0)(sb * 12 + sIdx)))
          }.toDF("doc_id", "s", "v")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, CAST(doc_id % 14 + 2 AS INT) AS nb,
             |    doc_id % 21 AS k
             |  FROM documents),
             |e AS (
             |  SELECT doc_id, nb, k, unnest(range(0, 12)) AS s FROM g)
             |SELECT doc_id, CAST(s AS INT) AS s,
             |  ((CAST((doc_id * 7 + s * 13) % (1 << nb) AS DOUBLE) /
             |      CAST(1 << (nb - 1) AS DOUBLE)
             |    - 1e0 + 2e0 / CAST(1 << nb AS DOUBLE))
             |   * (CAST(1 << nb AS DOUBLE) /
             |      (CAST(1 << nb AS DOUBLE) - 1e0)))
             |  * (2e0 / CAST(1 << k AS DOUBLE)) AS v
             |FROM e""".stripMargin)),

    // MM: REAL MPEG-1 Layer II subband decode — the alloc-table (B.2a)
    // variant of the Layer I path: per-subband allocation classes,
    // scfsi scalefactor sharing (scfsi=0 here: three independent
    // per-part scalefactors, all exact powers of two), and 36 samples
    // per subband. The oracle replays the generalized requantization
    // C*(c/2^(nb-1) - 1 + D)*sf per sample — bit-exact doubles, no
    // rounding on either side (IEEE multiplication commutes, so the
    // C-first kernel order and the X-first oracle order agree).
    Q("mm_mp2_subbands",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .flatMap { id =>
            val allocIdx = (id % 15 + 1).toInt
            val nb = allocIdx + 1
            val levels = (1 << nb) - 1
            val sb = (id % 3).toInt // class-0 subband: ungrouped levels
            val sfi = Array((3 * (id % 21)).toInt,
              (3 * ((id + 4) % 21)).toInt, (3 * ((id + 8) % 21)).toInt)
            val frame = MpegAudio.mp2Synth(sb, allocIdx, 0, sfi,
              sIdx => ((id * 7 + sIdx * 13) % levels).toInt)
            val dec = MpegAudio.decodeLayer2(frame)
            (0 until 36).map(sIdx => (id, sIdx, dec.sub(0)(sb * 36 + sIdx)))
          }.toDF("doc_id", "s", "v")
      },
      Some("""WITH g AS (
             |  SELECT doc_id, CAST(doc_id % 15 + 2 AS INT) AS nb
             |  FROM documents),
             |e AS (SELECT doc_id, nb, unnest(range(0, 36)) AS s FROM g),
             |k AS (
             |  SELECT doc_id, nb, s,
             |    CAST((doc_id * 7 + s * 13) % ((1 << nb) - 1) AS DOUBLE)
             |      AS c,
             |    CASE CAST(s // 12 AS INT) WHEN 0 THEN doc_id % 21
             |      WHEN 1 THEN (doc_id + 4) % 21
             |      ELSE (doc_id + 8) % 21 END AS kp
             |  FROM e)
             |SELECT doc_id, CAST(s AS INT) AS s,
             |  ((c / CAST(1 << (nb - 1) AS DOUBLE) - 1e0 +
             |      2e0 / CAST(1 << nb AS DOUBLE))
             |    * (CAST(1 << nb AS DOUBLE) /
             |       CAST((1 << nb) - 1 AS DOUBLE)))
             |  * (2e0 / CAST(1 << kp AS DOUBLE)) AS v
             |FROM k""".stripMargin)),

    // MM: REAL MPEG-1 Layer III SIDE-INFORMATION decode — the fully
    // normative field arithmetic of §2.4.1.7 (main_data_begin/scfsi,
    // then per granule the 12+9+8+4+1 head and either the switched
    // 2+1+2·5+3·3 or the long 3·5+4+3 branch, then preflag/
    // scalefac_scale/count1table). This is the routing metadata a
    // pipeline keys on (block-type mix, reservoir depth, table usage)
    // and needs no entropy tables. Granule 0 synthesizes LONG, granule
    // 1 SWITCHED (block_type 2), so both bitstream branches decode in
    // one row; absent fields report -1, never spec-implied defaults.
    // The entropy decode behind it is the declared refusal in
    // SURVEY_COVERAGE.md (normative Annex B.7 Huffman tables are not
    // derivable and not available in this environment).
    Q("mm_mp3_sideinfo",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .flatMap { id =>
            val g0 = MpegAudio.Mp3Granule(0, (id % 289).toInt,
              (id * 3 % 256).toInt, (id % 16).toInt,
              windowSwitching = false, blockType = 0, mixedBlock = false,
              Array((id % 32).toInt, (id * 3 % 32).toInt, (id * 7 % 32).toInt),
              Array.empty, (id % 16).toInt, (id % 8).toInt,
              (id % 2).toInt, (id / 2 % 2).toInt, (id / 4 % 2).toInt)
            val g1 = MpegAudio.Mp3Granule(0, (id * 5 % 289).toInt,
              (id * 7 % 256).toInt, (id * 3 % 16).toInt,
              windowSwitching = true, blockType = 2,
              mixedBlock = id / 8 % 2 == 1,
              Array((id * 5 % 32).toInt, (id * 11 % 32).toInt),
              Array((id % 8).toInt, (id * 3 % 8).toInt, (id * 5 % 8).toInt),
              -1, -1, (id / 16 % 2).toInt, (id / 32 % 2).toInt,
              (id / 64 % 2).toInt)
            val si = MpegAudio.decodeLayer3Side(MpegAudio.mp3SynthSide(
              (id % 512).toInt, (id % 16).toInt, Array(g0, g1)))
            si.granules.zipWithIndex.map { case (grs, gi) =>
              val g = grs(0)
              (id, gi, si.mainDataBegin, si.scfsi(0), g.bigValues,
                g.globalGain, g.scalefacCompress,
                if (g.windowSwitching) 1 else 0, g.blockType,
                if (g.mixedBlock) 1 else 0,
                g.tableSelect(0), g.tableSelect(1),
                if (g.windowSwitching) -1 else g.tableSelect(2),
                if (g.windowSwitching) g.subblockGain(0) else -1,
                if (g.windowSwitching) g.subblockGain(1) else -1,
                if (g.windowSwitching) g.subblockGain(2) else -1,
                g.region0Count, g.region1Count, g.preflag,
                g.scalefacScale, g.count1Table)
            }
          }.toDF("doc_id", "gr", "main_data_begin", "scfsi", "big_values",
            "global_gain", "scalefac_compress", "window_switching",
            "block_type", "mixed_block", "ts0", "ts1", "ts2", "sbg0",
            "sbg1", "sbg2", "region0", "region1", "preflag",
            "scalefac_scale", "count1table")
      },
      Some("""WITH e AS (
             |  SELECT doc_id, unnest(range(0, 2)) AS gr FROM documents)
             |SELECT doc_id, CAST(gr AS INT) AS gr,
             |  CAST(doc_id % 512 AS INT) AS main_data_begin,
             |  CAST(doc_id % 16 AS INT) AS scfsi,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 289
             |       ELSE doc_id * 5 % 289 END AS INT) AS big_values,
             |  CAST(CASE WHEN gr = 0 THEN doc_id * 3 % 256
             |       ELSE doc_id * 7 % 256 END AS INT) AS global_gain,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 16
             |       ELSE doc_id * 3 % 16 END AS INT) AS scalefac_compress,
             |  CAST(gr AS INT) AS window_switching,
             |  CAST(CASE WHEN gr = 0 THEN 0 ELSE 2 END AS INT) AS block_type,
             |  CAST(CASE WHEN gr = 0 THEN 0
             |       ELSE doc_id // 8 % 2 END AS INT) AS mixed_block,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 32
             |       ELSE doc_id * 5 % 32 END AS INT) AS ts0,
             |  CAST(CASE WHEN gr = 0 THEN doc_id * 3 % 32
             |       ELSE doc_id * 11 % 32 END AS INT) AS ts1,
             |  CAST(CASE WHEN gr = 0 THEN doc_id * 7 % 32
             |       ELSE -1 END AS INT) AS ts2,
             |  CAST(CASE WHEN gr = 0 THEN -1
             |       ELSE doc_id % 8 END AS INT) AS sbg0,
             |  CAST(CASE WHEN gr = 0 THEN -1
             |       ELSE doc_id * 3 % 8 END AS INT) AS sbg1,
             |  CAST(CASE WHEN gr = 0 THEN -1
             |       ELSE doc_id * 5 % 8 END AS INT) AS sbg2,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 16
             |       ELSE -1 END AS INT) AS region0,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 8
             |       ELSE -1 END AS INT) AS region1,
             |  CAST(CASE WHEN gr = 0 THEN doc_id % 2
             |       ELSE doc_id // 16 % 2 END AS INT) AS preflag,
             |  CAST(CASE WHEN gr = 0 THEN doc_id // 2 % 2
             |       ELSE doc_id // 32 % 2 END AS INT) AS scalefac_scale,
             |  CAST(CASE WHEN gr = 0 THEN doc_id // 4 % 2
             |       ELSE doc_id // 64 % 2 END AS INT) AS count1table
             |FROM e""".stripMargin)),

    // MM: REAL ISO-BMFF (MP4) box walk — the VIDEO leg of the
    // multimodal column set (ISO/IEC 14496-12 box grammar: size+type
    // headers, nesting, skip-unknown-by-size). Extracts major brand,
    // mvhd timescale/duration, per-trak hdlr handler + stsd codec
    // fourcc, tkhd 16.16 fixed-point dimensions — the fields a 100 TB
    // ingest routes and budgets video on. Payloads synthesize real
    // nested boxes per doc_id (incl. a free box the walk must skip);
    // the oracle is the closed form of the synthesis parameters.
    Q("mm_mp4_meta",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val ts = Seq(600, 1000, 90000)((id % 3).toInt)
            val vc = Seq("avc1", "hev1", "vp09")((id % 3).toInt)
            val p = Mp4.mp4Synth("isom", ts, id % 5000 + 1, vc,
              (id % 640 + 16).toInt, (id % 360 + 16).toInt,
              withAudio = id % 2 == 1, mdatBytes = (id % 100).toInt)
            Mp4.mp4Meta(id, p)
          }.toDF()
      },
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    ([600, 1000, 90000])[CAST(doc_id % 3 + 1 AS INT)] AS ts,
             |    (['avc1', 'hev1', 'vp09'])[CAST(doc_id % 3 + 1 AS INT)]
             |      AS vc,
             |    doc_id % 5000 + 1 AS dur,
             |    doc_id % 2 = 1 AS with_audio,
             |    doc_id % 100 AS mdat
             |  FROM documents)
             |SELECT doc_id,
             |  -- ftyp 24 + free 14 + moov(8 + mvhd 108 + video trak 221)
             |  -- + mdat hdr 8 = 383 fixed; audio trak adds another 221
             |  CAST(383 + mdat + CASE WHEN with_audio
             |    THEN 221 ELSE 0 END AS BIGINT) AS n_bytes,
             |  'isom' AS major_brand, CAST(ts AS INT) AS timescale,
             |  CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
             |  CAST(1 + CASE WHEN with_audio THEN 1 ELSE 0 END AS INT)
             |    AS n_tracks,
             |  vc AS video_codec,
             |  CASE WHEN with_audio THEN 'mp4a' ELSE '' END AS audio_codec,
             |  CAST(doc_id % 640 + 16 AS INT) AS width,
             |  CAST(doc_id % 360 + 16 AS INT) AS height,
             |  true AS valid
             |FROM g""".stripMargin)),

    // MM: video FRAME SAMPLING — the canonical training-data video op: a
    // 100 TB pipeline never decodes every frame, it samples by index/
    // timestamp, and the ISO-BMFF sample table (stts/stsc/stsz/stco) is
    // what makes that O(kept frames) rather than O(video bytes).
    // Payloads are MJPEG-in-MP4 with REAL sample tables (each sample a
    // complete baseline JPEG from the exact-integer synth); every 2nd
    // frame is resolved by table walk, sliced, and decoded through the
    // full JPEG entropy path. The oracle replays the pixel closed form
    // per (doc, kept frame) with the frame-seeded synthesis id.
    // Synthesis runs ONCE per session into a parquet fixture (the real
    // corpus would arrive on disk too) so repeated runs measure the
    // table walk + decode, not MP4+JPEG construction.
    Q("mm_video_frames",
      (s, dir) => Multimodal.sampleVideoFrames(
        videoFixture(s, dir), "doc_id", "payload", every = 2)
        .toDF(),
      Some("""WITH fr AS (
             |  SELECT doc_id, f,
             |    CAST((doc_id + 101 * f) % 1000 AS INTEGER) AS idi,
             |    CAST(doc_id % 9 + 4 AS INTEGER) AS w,
             |    CAST(doc_id % 7 + 4 AS INTEGER) AS h
             |  FROM documents, (SELECT unnest(range(0, 4)) AS f)
             |  WHERE f < doc_id % 3 + 2 AND f % 2 = 0),
             |px AS (
             |  SELECT doc_id, f, idi, w, h, x, y,
             |    CAST(x // 8 AS INTEGER) AS bx,
             |    CAST(y // 8 AS INTEGER) AS by,
             |    CASE WHEN (x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END AS sx,
             |    CASE WHEN (y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END AS sy
             |  FROM fr,
             |    (SELECT unnest(range(0, 12)) AS x),
             |    (SELECT unnest(range(0, 10)) AS y)
             |  WHERE x < w AND y < h),
             |ycc AS (
             |  SELECT doc_id, f, w, h, x, y,
             |    40 + (bx*29 + by*17 + idi*3) % 176
             |      + ((bx + by + idi) % 7 - 3) * sx
             |      + ((2*bx + by + idi) % 5 - 2) * sy
             |      + ((bx + 2*by + idi) % 3 - 1) * sx * sy AS yv,
             |    70 + (13*bx + 7*by + 5*idi) % 116
             |      + ((bx + idi) % 3 - 1) * sx
             |      + ((by + idi) % 3 - 1) * sy AS cb,
             |    70 + (11*bx + 19*by + 7*idi) % 116
             |      + ((by + idi) % 3 - 1) * sx
             |      + ((bx + 2*idi) % 3 - 1) * sy AS cr
             |  FROM px),
             |rgb AS (
             |  SELECT doc_id, f, w, h, x, y,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv + 1.402e0 * (cr - 128) + 0.5e0) AS INTEGER))) AS r,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv - 0.344136e0 * (cb - 128) - 0.714136e0 * (cr - 128)
             |      + 0.5e0) AS INTEGER))) AS g,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv + 1.772e0 * (cb - 128) + 0.5e0) AS INTEGER))) AS b
             |  FROM ycc),
             |packed AS (
             |  SELECT doc_id, f, w, h, x, y,
             |    r * 65536 + g * 256 + b AS v
             |  FROM rgb)
             |SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
             |  CAST(f * 40 AS BIGINT) AS pts_ms,
             |  max(w) AS width, max(h) AS height,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN x = w - 1 AND y = h - 1 THEN v END)
             |    AS BIGINT) AS px_last,
             |  TRUE AS valid
             |FROM packed GROUP BY doc_id, f""".stripMargin)),

    // PIPE: audio-corpus capstone — synth a mixed audio corpus (MPEG
    // Layer III streams + RIFF/WAVE PCM), sniff the container from
    // magic bytes, dispatch to the matching REAL frame walk
    // (MpegAudio.mp3Meta / Multimodal.wavMeta), and aggregate
    // per-format corpus stats: the route-by-format + duration-budget
    // accounting every audio ingest does before any sample decode.
    // One narrow per-partition pass + a 2-group partial agg.
    Q("pipe_audio_corpus",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val stats = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val p =
              if (id % 2 == 0)
                MpegAudio.mp3SynthFrames((id % 5 + 1).toInt,
                  (id % 14 + 1).toInt, (id % 3).toInt)
              else Multimodal.wavSynth(1, (8000 + (id % 3) * 4000).toInt,
                (0 until (id % 40 + 5).toInt).map(i =>
                  ((id * 13 + i) % 65536 - 32768).toShort))
            val dur = Multimodal.sniffFormat(p) match {
              case "mp3" => MpegAudio.mp3Meta(id, p).duration_ms
              case "wav" => Multimodal.wavMeta(id, p).duration_ms
              case _ => -1L
            }
            (id, Multimodal.sniffFormat(p), p.length.toLong, dur)
          }.toDF("doc_id", "format", "n_bytes", "duration_ms")
        stats.where(col("duration_ms") >= 0)
          .groupBy("format")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_bytes").as("total_bytes"),
            sum("duration_ms").as("total_ms"),
            min("duration_ms").as("min_ms"),
            max("duration_ms").as("max_ms"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'wav' END AS format,
             |    doc_id % 5 + 1 AS n,
             |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
             |      [CAST(doc_id % 14 + 1 AS INT)] AS kbps,
             |    ([44100,48000,32000])[CAST(doc_id % 3 + 1 AS INT)] AS sr,
             |    8000 + (doc_id % 3) * 4000 AS wr,
             |    doc_id % 40 + 5 AS ns
             |  FROM documents),
             |p AS (
             |  SELECT doc_id, format,
             |    CASE WHEN format = 'mp3' THEN n * ((144 * kbps * 1000) // sr)
             |         ELSE 44 + ns * 2 END AS n_bytes,
             |    CASE WHEN format = 'mp3' THEN (n * 1152 * 1000) // sr
             |         ELSE (ns * 1000) // wr END AS duration_ms
             |  FROM g)
             |SELECT format, count(*) AS n_docs,
             |  CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
             |  CAST(sum(duration_ms) AS BIGINT) AS total_ms,
             |  min(duration_ms) AS min_ms, max(duration_ms) AS max_ms
             |FROM p GROUP BY format""".stripMargin)),

    // K6: bucketed co-located join — both sides written bucketBy the join
    // key, so the join plans WITHOUT a shuffle exchange (PlanSpec gate).
    // This is the 100 TB answer for repeated fact-to-fact joins on a
    // stable key: pay the layout once at ingest, never shuffle again.
    Q("k6_bucketed_join",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val (lt, ot) = (s"graft_bkt_lineitem_$tag", s"graft_bkt_orders_$tag")
        // coalesce(8) before the bucketed write: 8 tasks x 8 buckets = 64
        // files instead of numPartitions x 8 tiny ones
        t(s, dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
          .coalesce(8)
          .write.mode("overwrite").format("parquet")
          .option("path", s"/tmp/graft_bucketed/${tag}_lineitem")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(lt)
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
          .coalesce(8)
          .write.mode("overwrite").format("parquet")
          .option("path", s"/tmp/graft_bucketed/${tag}_orders")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(ot)
        s.table(lt).join(s.table(ot),
            col("l_orderkey") === col("o_orderkey"))
          .select("l_orderkey", "l_partkey", "l_quantity", "o_orderpriority")
      },
      Some("""SELECT l_orderkey, l_partkey, l_quantity, o_orderpriority
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
        .stripMargin)),

    // Streaming-shaped windowed aggregation (batch equivalent of the
    // Structured Streaming path in streaming/EventStream.scala)
    Q("st_window_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"),
          countDistinct("user_id").as("n_users"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("n_events"), col("total_value"), col("n_users")),
      Some("""SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
             |  count(*) AS n_events, round(sum(value), 2) AS total_value,
             |  count(DISTINCT user_id) AS n_users
             |FROM events GROUP BY 1""".stripMargin)),

    // Sliding-window aggregation (1h window, 30m slide): every event lands
    // in exactly 2 overlapping windows — the sliding counterpart of
    // st_window_agg's tumbling shape; the oracle replays the window
    // membership by exploding both candidate starts per event
    Q("st_sliding_agg",
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          round(sum("value"), 2).as("total_value"))
        .select(unix_timestamp(col("window.start")).as("win_start"),
          col("n_events"), col("total_value")),
      Some("""WITH e AS (
             |  SELECT value, (epoch_ms(ts) // 1000) // 1800 * 1800
             |    - k.k * 1800 AS win_start
             |  FROM events, (SELECT unnest([0, 1]) AS k) k)
             |SELECT win_start, count(*) AS n_events,
             |  round(sum(value), 2) AS total_value
             |FROM e GROUP BY win_start""".stripMargin)),

    // Streaming attribution operator on its batch path (the stream path —
    // watermarks + state eviction — is pinned by EventStreamSpec's
    // stream/batch parity test; this row puts the join semantics under
    // the DuckDB oracle).
    Q("st_attribution",
      (s, dir) => graft.streaming.EventStream
        .attributedPurchases(t(s, dir, "events")),
      Some("""SELECT p.user_id,
             |  epoch_ms(p.ts) // 1000 AS p_s,
             |  epoch_ms(c.ts) // 1000 AS c_s,
             |  p.value AS p_value
             |FROM events p JOIN events c
             |  ON p.event_type = 'purchase' AND c.event_type = 'click'
             |  AND p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts"""
        .stripMargin)),

    // ST: the LEFT-OUTER attribution — purchases with no click in the
    // window survive with null click columns; streaming mode emits them
    // on watermark expiry (outer stream-stream join state contract),
    // batch mode (checked here) is the plain left interval join.
    Q("st_attribution_outer",
      (s, dir) => graft.streaming.EventStream
        .attributedPurchasesOuter(t(s, dir, "events")),
      Some("""SELECT p.user_id,
             |  epoch_ms(p.ts) // 1000 AS p_s,
             |  epoch_ms(c.ts) // 1000 AS c_s,
             |  p.value AS p_value
             |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
             |  ON p.user_id = c.user_id
             |  AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts"""
        .stripMargin)),

    // ST: watermarked OHLC bars on the batch path (withWatermark is a
    // no-op on batch frames; the streaming path — watermark-bounded
    // state, availableNow — is pinned against this exact frame by
    // EventStreamSpec's parity test). Open/close tie-break is
    // min/max(struct(ts, value)): same ts -> min value opens, max
    // value closes; the oracle replays it with ORDER BY ts, value.
    Q("st_ohlc",
      (s, dir) => graft.streaming.EventStream.ohlcBars(t(s, dir, "events")),
      Some("""WITH b AS (
             |  SELECT event_type, date_trunc('hour', ts) AS bucket,
             |    ts, value
             |  FROM events),
             |r AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts, value) AS rn,
             |    count(*) OVER (PARTITION BY event_type, bucket) AS cnt
             |  FROM b)
             |SELECT CAST(epoch(bucket) AS BIGINT) AS win_start, event_type,
             |  max(CASE WHEN rn = 1 THEN value END) AS open,
             |  max(CASE WHEN rn = cnt THEN value END) AS close,
             |  max(value) AS high, min(value) AS low, count(*) AS n
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // ST: streaming approximate distinct users per hour — the HLL
    // register build AS the streaming aggregation (state = at most 2^p
    // register rows per window/type; max IS the HLL merge, so
    // micro-batch boundaries cannot change the registers — batch parity
    // is exact, which is what this row checks). The estimate fold runs
    // at read time over the emitted registers; the oracle replicates
    // registers + fold + corrections in SQL, joined with the exact
    // count for the accuracy audit.
    Q("st_hll_window",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val est = graft.streaming.EventStream.hllWindowEstimate(
          graft.streaming.EventStream.hllRegisterStream(ev, p = 12), p = 12)
        val exact = ev.groupBy(
            unix_timestamp(date_trunc("hour", col("ts"))).as("win_start"),
            col("event_type"))
          .agg(countDistinct("user_id").as("exact"))
        est.join(exact, Seq("win_start", "event_type"))
          .select(col("win_start"), col("event_type"),
            (round(col("hll_estimate"), 4) + 0.0).as("est"), col("exact"))
      },
      Some {
        val hv = h32Sql("CAST(user_id AS VARCHAR)", "0")
        s"""WITH h AS (
           |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
           |      AS win_start,
           |    event_type, $hv AS hv FROM events),
           |regs AS (
           |  SELECT win_start, event_type, hv >> 20 AS idx,
           |    max(CASE WHEN (hv & 1048575) = 0 THEN 21
           |        ELSE 20 - (length(bin(hv & 1048575)) - 1) END) AS mj
           |  FROM h GROUP BY win_start, event_type, idx),
           |folded AS (
           |  SELECT win_start, event_type, sum(pow(2e0, -mj)) AS s_present,
           |    count(*) AS present FROM regs GROUP BY win_start, event_type),
           |est AS (
           |  SELECT win_start, event_type,
           |    (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
           |      / (s_present + (4096 - present)) AS raw,
           |    CAST(4096 - present AS DOUBLE) AS v
           |  FROM folded),
           |ex AS (
           |  SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT)
           |      AS win_start,
           |    event_type, count(DISTINCT user_id) AS exact
           |  FROM events GROUP BY 1, 2)
           |SELECT win_start, event_type,
           |  round(CASE
           |    WHEN raw <= 2.5 * 4096 AND v > 0 THEN 4096e0 * ln(4096e0 / v)
           |    WHEN raw > 4294967296e0 / 30 THEN
           |      -4294967296e0 * ln(1 - raw / 4294967296e0)
           |    ELSE raw END, 4) + 0e0 AS est,
           |  exact
           |FROM est JOIN ex USING (win_start, event_type)""".stripMargin
      }),

    // S5: template extraction UDTF shape (1 row -> N listing rows)
    Q("s5_template_extract",
      (s, dir) => t(s, dir, "part")
        .withColumn("wikitext", concat(
          lit("{{see|name="), col("p_name"), lit("|lat=4"),
          pmod(col("p_partkey"), lit(10)).cast("string"),
          lit("}} filler {{eat|name="), col("p_brand"), lit("}}")))
        .select(col("p_partkey"),
          explode(expr(
            "regexp_extract_all(wikitext, '\\\\{\\\\{(see|eat)\\\\|name=([^|}]+)', 2)"))
            .as("listing_name")),
      Some("""WITH w AS (
             |  SELECT p_partkey, '{{see|name=' || p_name || '|lat=4' ||
             |    CAST(p_partkey % 10 AS VARCHAR) || '}} filler {{eat|name=' ||
             |    p_brand || '}}' AS wikitext
             |  FROM part)
             |SELECT p_partkey, unnest(regexp_extract_all(wikitext,
             |  '\{\{(see|eat)\|name=([^|}]+)', 2)) AS listing_name
             |FROM w""".stripMargin)),

    // F1: NFKD deaccent UDF vs DuckDB strip_accents
    Q("f1_deaccent",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 200)
        .select(col("c_custkey"),
          TextFunctions.deaccentLowerUdf(
            concat(lit("Café Ñandú "), col("c_name"))).as("clean")),
      Some("""SELECT c_custkey,
             |  lower(strip_accents('Café Ñandú ' || c_name)) AS clean
             |FROM customer WHERE c_custkey < 200""".stripMargin)),

    // F26: unicode NFC normalization — the ingest normal form that makes
    // byte-level digests agree across sources emitting composed vs
    // decomposed text. Fixture builds DECOMPOSED strings (base char +
    // combining mark via compiler/chr() escapes, identically in both
    // engines); both engines then normalize with their own UAX #15
    // implementation, and the composed forms must agree byte-for-byte
    // (lengths shrink by exactly the two combining marks).
    Q("f26_nfc",
      (s, dir) => {
        // the literal is byte-DECOMPOSED (renders composed): "Cafe" +
        // U+0301 combining acute + " u" + U+0308 combining diaeresis
        val dec = concat(lit("Café über "), col("c_name"))
        t(s, dir, "customer").where(col("c_custkey") < 200)
          .select(col("c_custkey"),
            length(dec).cast("long").as("raw_len"),
            TextFunctions.nfcUdf(dec).as("nfc_text"),
            length(TextFunctions.nfcUdf(dec)).cast("long").as("nfc_len"))
      },
      Some("""SELECT c_custkey,
             |  length('Cafe' || chr(769) || ' u' || chr(776) || 'ber '
             |    || c_name)::BIGINT AS raw_len,
             |  nfc_normalize('Cafe' || chr(769) || ' u' || chr(776) ||
             |    'ber ' || c_name) AS nfc_text,
             |  length(nfc_normalize('Cafe' || chr(769) || ' u' ||
             |    chr(776) || 'ber ' || c_name))::BIGINT AS nfc_len
             |FROM customer WHERE c_custkey < 200""".stripMargin)),

    // F7: rapidfuzz-parity similarity kernels over a PINNED pair set. The
    // oracle is a literal VALUES table of scores computed at build time by
    // the same Scala kernels the codegen'd Catalyst expressions invoke —
    // the driver's DuckDB run then hash-verifies expression==kernel parity
    // and cross-engine rounding, closing the former no_oracle gap.
    Q("f7_fuzzy_ratios",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        fuzzPairs.toDF("id", "a", "b").select(col("id"),
          round(graft.plans.FuzzyExpressions.tokenSetRatio(
            col("a"), col("b")), 6).as("token_set"),
          round(graft.plans.FuzzyExpressions.tokenSortRatio(
            col("a"), col("b")), 6).as("token_sort"),
          round(graft.plans.FuzzyExpressions.partialRatio(
            col("a"), col("b")), 6).as("partial_r"),
          round(graft.plans.FuzzyExpressions.erNameSimilarity(
            col("a"), col("b")), 6).as("er_sim"),
          round(graft.plans.FuzzyExpressions.nameSimilarity(
            col("a"), col("b")), 6).as("name_sim"))
      },
      Some {
        import TextFunctions._
        val rows = fuzzPairs.map { case (id, a, b) =>
          s"($id, ${dLit(round6(tokenSetRatio(a, b)))}, " +
            s"${dLit(round6(tokenSortRatio(a, b)))}, " +
            s"${dLit(round6(partialRatio(a, b)))}, " +
            s"${dLit(round6(erNameSimilarity(a, b)))}, " +
            s"${dLit(round6(nameSimilarity(a, b)))})"
        }.mkString(",\n")
        s"SELECT * FROM (VALUES\n$rows\n) " +
          "AS t(id, token_set, token_sort, partial_r, er_sim, name_sim)"
      }),

    // T3: greedy top-k near-duplicate-suppressed selection over a pinned
    // deterministic group set; the oracle VALUES are produced at build time
    // by the reference's scan-everything greedy, so the driver verifies the
    // distributed Aggregator (partial agg + merge across partitions)
    // against the sequential reference semantics.
    Q("t3_topk_distinct",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        t3Docs.toDF("grp", "text")
          .repartition(5) // force multi-partition partial aggregation
          .as[(String, String)].groupByKey(_._1).mapValues(_._2)
          .agg(TopKDistinct.topK(3, 0.9, maxLen = 1200).name("kept"))
          .toDF("grp", "kept")
          .select(col("grp"), size(col("kept")).as("n_kept"),
            array_join(col("kept"), "|").as("kept_join"))
      },
      Some {
        val rows = t3Docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, ds) =>
          val kept = refTopKGreedy(ds.map(_._2), k = 3, thr = 0.9, maxLen = 1200)
          s"('$g', ${kept.size}, '${kept.mkString("|").replace("'", "''")}')"
        }.mkString(",\n")
        s"SELECT * FROM (VALUES\n$rows\n) AS t(grp, n_kept, kept_join)"
      })
  )

  /** Pinned inputs for f7: chosen to exercise token-subset 1.0 shortcuts,
    * boundary-overlap partial windows, deaccent divergence, and plain
    * InDel cases. */
  private lazy val fuzzPairs: Seq[(Int, String, String)] = Seq(
    (1, "International Airport Vienna", "Vienna Intl. Airport"),
    (2, "Cafe Central", "Café Central Wien"),
    (3, "St. Stephen's Cathedral", "Stephansdom"),
    (4, "Hotel Sacher", "Sacher Hotel"),
    (5, "Powder Tower", "Explore Powder Tower"),
    (6, "Charles Bridge", "Karluv most"),
    (7, "abc", "abd"),
    (8, "bcd", "abc"),
    (9, "world", "hello world"),
    (10, "Naschmarkt", "Nasch Markt"),
    (11, "Schönbrunn Palace", "Schoenbrunn"),
    (12, "identical", "identical"))

  /** Spark `round(col, 6)` semantics (BigDecimal HALF_UP) for build-time
    * oracle literals. */
  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).doubleValue

  /** DuckDB double literal via string cast — decimal-literal-safe. */
  private def dLit(v: Double): String = s"'$v'::DOUBLE"

  /** Pinned inputs for t3: one group with a 6-strong near-dup family plus
    * distinct shorter texts (greedy must keep 1 family rep + 2 distinct),
    * one singleton group. */
  private lazy val t3Docs: Seq[(String, String)] = {
    val family = (1 to 6).map(i =>
      s"the grand hotel by the river offers fine rooms and views v$i")
    val distinct = Seq(
      "a completely different museum of modern art",
      "quiet garden cafe serving breakfast daily",
      "night market with street food stalls",
      "tiny bookshop near the square")
    (family ++ distinct).map(("g1", _)) ++
      Seq(("g2", "only one text in this group"))
  }

  /** The reference's sequential greedy (`etl/reviews_jsonl.py:316-325`),
    * identical ordering/threshold semantics to TopKDistinct. */
  private def refTopKGreedy(texts: Seq[String], k: Int, thr: Double,
                            maxLen: Int): Seq[String] = {
    val kept = scala.collection.mutable.ArrayBuffer.empty[String]
    val cands = texts
      .map(t => if (t == null) "" else if (t.length > maxLen) t.substring(0, maxLen) else t)
      .filter(_.nonEmpty).sortBy(s => (-s.length, s))
    for (c <- cands if kept.size < k)
      if (kept.forall(p => TextFunctions.tokenSetRatio(c, p) < thr))
        kept += c
    kept.toSeq
  }

  // =================================================================
  // Coverage-completion queries (P7, F2/F14/F15/F21, J7, A11, G6, ANN-LSH)
  // =================================================================

  /** DuckDB replay of IVF top-k under the registry's fixed 16-centroid
    * model (queries vec_id<5, model 5..20, corpus >=21, nProbe=2, k=5)
    * — ONE oracle for ann_ivf_topk and ann_ivf_indexed: the standing
    * index changes the at-rest layout (cell-partitioned files, pruned
    * scan), not the answer, and the shared SQL pins that contract. */
  private def ivfTopKOracleSql: String =
    s"""WITH cent AS (SELECT vec_id AS cent_id, embedding AS cent_v
       |             FROM embeddings WHERE vec_id >= 5 AND vec_id < 21),
       |c AS (SELECT vec_id AS c_id, embedding AS c_v FROM embeddings
       |      WHERE vec_id >= 21),
       |q AS (SELECT vec_id AS q_id, embedding AS q_v FROM embeddings
       |      WHERE vec_id < 5),
       |cells AS (
       |  SELECT c_id, c_v, cent_id FROM (
       |    SELECT c.c_id, c.c_v, cent.cent_id,
       |      row_number() OVER (PARTITION BY c.c_id
       |        ORDER BY ${cosSql("c_v", "cent_v")} DESC, cent_id ASC)
       |        AS rn
       |    FROM c CROSS JOIN cent) WHERE rn = 1),
       |probes AS (
       |  SELECT q_id, q_v, cent_id FROM (
       |    SELECT q.q_id, q.q_v, cent.cent_id,
       |      row_number() OVER (PARTITION BY q.q_id
       |        ORDER BY ${cosSql("q_v", "cent_v")} DESC, cent_id ASC)
       |        AS rn
       |    FROM q CROSS JOIN cent) WHERE rn <= 2),
       |cand AS (
       |  SELECT probes.q_id, cells.c_id,
       |    ${cosSql("c_v", "q_v")} AS cosine
       |  FROM probes JOIN cells ON probes.cent_id = cells.cent_id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |  ORDER BY cosine DESC, c_id ASC) AS rank FROM cand)
       |SELECT q_id, c_id, round(cosine, 6) AS cosine,
       |  CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5""".stripMargin

  /** The deterministic Lloyd k-means replay (k=8 seeded from the 8
    * smallest vec_ids, 2 iterations, squared-euclidean assignment) as a
    * CTE chain ending in `a2(vec_id, v, cid)` — shared by the SemDedup
    * family's oracles so the clustering SQL cannot drift between the
    * dedup row, the guarded row, and the oversized audit. */
  private def kmeansA2Sql(): String = {
    def sq(a: String, b: String) = foldSql(
      s"list_transform(range(0, 64), d_ -> ($a[d_+1] - $b[d_+1]) * ($a[d_+1] - $b[d_+1]))")
    s"""v AS (SELECT vec_id,
       |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |c0 AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id < 8),
       |a1 AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT v.vec_id, v.v, c0.cid, row_number() OVER (
       |      PARTITION BY v.vec_id
       |      ORDER BY ${sq("v.v", "c0.cv")} ASC, c0.cid ASC) AS rn
       |    FROM v CROSS JOIN c0) WHERE rn = 1),
       |c1 AS (
       |  SELECT cid, list(m ORDER BY d) AS cv FROM (
       |    SELECT a1.cid, d.d, avg(a1.v[d.d+1]) AS m
       |    FROM a1, range(0, 64) AS d(d)
       |    GROUP BY a1.cid, d.d)
       |  GROUP BY cid),
       |a2 AS (
       |  SELECT vec_id, v, cid FROM (
       |    SELECT v.vec_id, v.v, c1.cid, row_number() OVER (
       |      PARTITION BY v.vec_id
       |      ORDER BY ${sq("v.v", "c1.cv")} ASC, c1.cid ASC) AS rn
       |    FROM v CROSS JOIN c1) WHERE rn = 1)""".stripMargin
  }

  /** DuckDB replay of `Similarity.pqTopK(m=4, kc=4, iters=2)` over the
    * registry fixture (corpus vec_id>=21, queries vec_id<5, k=5): per
    * subspace a seed -> assign -> mean (empty code keeps its seed) ->
    * encode chain, then the ADC sum in subspace order and a rank by
    * (adist asc, c_id asc). Double arithmetic matches the JVM kernels:
    * each subspace distance is a sequential fold and subspaces add
    * left-to-right. */
  // final + literal => compile-time constants, safe to reference from
  // the queries val however the object initializes
  private final val PqM = 4
  private final val PqSub = 16
  private final val PqKc = 4

  private def pqSq(a: String, b: String) = foldSql(
    s"list_transform(range(0, $PqSub), d_ -> ($a[d_+1] - $b[d_+1]) * ($a[d_+1] - $b[d_+1]))")

  /** The per-subspace PQ training+encode CTE chains over `rel(vec_id,
    * v)` (v a 64-double list): seeds sd\$s -> assign a\$s -> means m\$s
    * (empty code keeps its seed) -> codebook c\$s -> encode e\$s(vec_id,
    * cv). Shared by the flat-PQ and IVF-PQ oracles. */
  private def pqChainsSql(rel: String): String =
    (0 until PqM).map { s =>
      val lo = s * PqSub
      val sl = s"v[${lo + 1}:${lo + PqSub}]"
      s"""sd$s AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, cv
         |  FROM (SELECT vec_id, $sl AS cv FROM $rel
         |        ORDER BY vec_id LIMIT $PqKc)),
         |a$s AS (
         |  SELECT vec_id, sv, code FROM (
         |    SELECT r.vec_id, r.$sl AS sv, sd.code,
         |      row_number() OVER (PARTITION BY r.vec_id
         |        ORDER BY ${pqSq(s"r.$sl", "sd.cv")} ASC, sd.code ASC) AS rn
         |    FROM $rel r CROSS JOIN sd$s sd) WHERE rn = 1),
         |m$s AS (
         |  SELECT code, list(mu ORDER BY d) AS cv FROM (
         |    SELECT a.code, d.d, avg(a.sv[d.d+1]) AS mu
         |    FROM a$s a, range(0, $PqSub) AS d(d)
         |    GROUP BY a.code, d.d) GROUP BY code),
         |c$s AS (
         |  SELECT sd.code, coalesce(m.cv, sd.cv) AS cv
         |  FROM sd$s sd LEFT JOIN m$s m ON sd.code = m.code),
         |e$s AS (
         |  SELECT vec_id, cv FROM (
         |    SELECT r.vec_id, cc.cv,
         |      row_number() OVER (PARTITION BY r.vec_id
         |        ORDER BY ${pqSq(s"r.$sl", "cc.cv")} ASC, cc.code ASC) AS rn
         |    FROM $rel r CROSS JOIN c$s cc) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")

  private def pqEncJoins: String = (1 until PqM)
    .map(s => s"JOIN e$s ON e$s.vec_id = e0.vec_id").mkString(" ")

  /** DuckDB replay of `Similarity.pqTopK(m=4, kc=4, iters=2)` over the
    * registry fixture (corpus vec_id>=21, queries vec_id<5, k=5). */
  private def pqTopKSql(): String = {
    val dsum = (0 until PqM).map { s =>
      val lo = s * PqSub
      s"(${pqSq(s"q.v[${lo + 1}:${lo + PqSub}]", s"e$s.cv")})"
    }.mkString(" + ")
    s"""WITH vv AS (SELECT vec_id,
       |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |c AS (SELECT * FROM vv WHERE vec_id >= 21),
       |q AS (SELECT * FROM vv WHERE vec_id < 5),
       |${pqChainsSql("c")},
       |adc AS (
       |  SELECT q.vec_id AS q_id, e0.vec_id AS c_id,
       |    $dsum AS adist
       |  FROM q CROSS JOIN e0 $pqEncJoins),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |  ORDER BY adist ASC, c_id ASC) AS rank FROM adc)
       |SELECT q_id, c_id, floor(adist * 1e6 + 5e-1) / 1e6 AS adist,
       |  CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  /** DuckDB replay of `Similarity.ivfPqTopK(nProbe=2, m=4, kc=4,
    * iters=2)` over the registry fixture: cosine cell routing, residual
    * computation, the shared PQ chains over the residual frame, per-
    * (query, cell) query residuals, and the cell-restricted ADC. */
  private def ivfPqTopKSql(): String =
    s"""WITH ${ivfPqRankedCtes()}
       |SELECT q_id, c_id, floor(adist * 1e6 + 5e-1) / 1e6 AS adist,
       |  CAST(rank AS INT) AS rank
       |FROM ranked WHERE rank <= 5""".stripMargin

  /** DuckDB replay of `Similarity.ivfPqRerank(k=5, shortlist=15)`: the
    * shared ADC chain ranks the quantized scan, the top-15 shortlist
    * joins back to the RAW corpus vectors, and exact cosine re-ranks —
    * the same shortlist-then-exact shape as the SQ8 oracle. */
  private def ivfPqRerankSql(): String =
    s"""WITH ${ivfPqRankedCtes()},
       |cand AS (SELECT q_id, c_id FROM ranked WHERE rank <= 15),
       |exact AS (
       |  SELECT cand.q_id, cand.c_id, ${cosSql("c.v", "q.v")} AS cosine,
       |    row_number() OVER (PARTITION BY cand.q_id
       |      ORDER BY ${cosSql("c.v", "q.v")} DESC, cand.c_id ASC) AS rank
       |  FROM cand JOIN c ON c.vec_id = cand.c_id
       |            JOIN q ON q.vec_id = cand.q_id)
       |SELECT q_id, c_id, round(cosine, 6) AS cosine,
       |  CAST(rank AS INT) AS rank
       |FROM exact WHERE rank <= 5""".stripMargin

  /** The IVF-PQ ADC chain CTE body (through `ranked`) shared by the
    * direct top-k and rerank oracles — one SQL spec, two consumers, so
    * the shortlist stage cannot drift from the scored stage. */
  private def ivfPqRankedCtes(): String = {
    val dsum = (0 until PqM).map { s =>
      val lo = s * PqSub
      s"(${pqSq(s"p.qr[${lo + 1}:${lo + PqSub}]", s"e$s.cv")})"
    }.mkString(" + ")
    s"""vv AS (SELECT vec_id,
       |  list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
       |c AS (SELECT * FROM vv WHERE vec_id >= 21),
       |q AS (SELECT * FROM vv WHERE vec_id < 5),
       |cent AS (SELECT vec_id AS cell, v AS cv FROM vv
       |         WHERE vec_id >= 5 AND vec_id < 21),
       |cells AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT c.vec_id, cent.cell,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY ${cosSql("c.v", "cent.cv")} DESC, cent.cell ASC)
       |        AS rn
       |    FROM c CROSS JOIN cent) WHERE rn = 1),
       |res AS (
       |  SELECT c.vec_id, cells.cell,
       |    list_transform(range(0, 64), d -> c.v[d+1] - cent.cv[d+1]) AS v
       |  FROM c JOIN cells USING (vec_id) JOIN cent USING (cell)),
       |${pqChainsSql("res")},
       |probes AS (
       |  SELECT q_id, cell, qr FROM (
       |    SELECT q.vec_id AS q_id, cent.cell,
       |      list_transform(range(0, 64), d -> q.v[d+1] - cent.cv[d+1])
       |        AS qr,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.v", "cent.cv")} DESC, cent.cell ASC)
       |        AS rn
       |    FROM q CROSS JOIN cent) WHERE rn <= 2),
       |adc AS (
       |  SELECT p.q_id, e0.vec_id AS c_id, $dsum AS adist
       |  FROM probes p
       |  JOIN res ON res.cell = p.cell
       |  JOIN e0 ON e0.vec_id = res.vec_id $pqEncJoins),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |  ORDER BY adist ASC, c_id ASC) AS rank FROM adc)""".stripMargin
  }

  /** DuckDB SRP bucket expression for LSH table `t` over vector column
    * `v` — unrolled to mirror Similarity.lshTopK exactly (planeId =
    * p + t*numPlanes, md5-derived +-1 coefficients, 2^p bit packing). */
  private def srpBucketSql(v: String, t: Int, numPlanes: Int): String = {
    val bits = (0 until numPlanes).map { p =>
      val pid = p + t * numPlanes
      val sign = s"""(CASE WHEN ('0x' || substr(md5('$pid:' || d::VARCHAR), 1, 8))
                    |::BIGINT % 2 = 0 THEN 1e0 ELSE -1e0 END)""".stripMargin
      val dot = foldSql(
        s"list_transform(range(0, 64), d -> $v[d+1]::DOUBLE * $sign)")
      s"(CASE WHEN $dot > 0 THEN ${1L << p} ELSE 0 END)"
    }
    s"(${t.toLong * (1L << 40)} + ${bits.mkString(" + ")})"
  }

  /** Shared partsupp PROXY for the TPC-H q2/q11/q16/q20 shapes: the
    * corpus has no partsupp table (the q9 precedent,
    * `/root/reference` ships none either), so the part-supplier
    * relation is the DISTINCT (l_partkey, l_suppkey) pairs observed in
    * lineitem, and supply cost (integer cents, 1.00..10.00) and
    * available quantity (units, 100..10000) are deterministic integer
    * functions of the key pair — identical modular arithmetic in Spark
    * and DuckDB, all operands positive so `%` sign rules cannot
    * diverge. One string feeds BOTH engines. */
  private val psProxySql: String =
    """WITH ps AS (SELECT DISTINCT l_partkey AS ps_partkey,
      |                            l_suppkey AS ps_suppkey FROM lineitem),
      |psc AS (SELECT ps_partkey, ps_suppkey,
      |        CAST((ps_partkey * 31 + ps_suppkey * 7) % 901 + 100
      |          AS BIGINT) AS cost2,
      |        CAST((ps_partkey * 17 + ps_suppkey * 13) % 9901 + 100
      |          AS BIGINT) AS availqty
      |        FROM ps)""".stripMargin

  private val q2Sql: String = psProxySql +
    """
      |, eur AS (
      |  SELECT psc.*, s_name, s_acctbal, n_name FROM psc
      |  JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |       CAST(cost2 AS DOUBLE) / 1e2 AS supplycost
      |FROM eur JOIN part ON p_partkey = ps_partkey
      |JOIN (SELECT ps_partkey AS mpk, min(cost2) AS mc
      |      FROM eur GROUP BY ps_partkey) m
      |  ON mpk = ps_partkey AND cost2 = mc
      |WHERE p_size = 23 AND p_type = 'LARGE'""".stripMargin

  private val q11Sql: String = psProxySql +
    """
      |, val AS (
      |  SELECT ps_partkey, sum(cost2 * availqty) AS v2
      |  FROM psc JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_7', 'NATION_8')
      |  GROUP BY ps_partkey),
      |tot AS (SELECT sum(v2) AS t2 FROM val)
      |SELECT ps_partkey, CAST(v2 AS DOUBLE) / 1e2 AS value
      |FROM val CROSS JOIN tot WHERE v2 * 1000 > t2""".stripMargin

  private val q12Sql: String =
    """SELECT CASE (l_orderkey * 7 + l_linenumber) % 3
      |         WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'TRUCK'
      |       END AS shipmode,
      |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1""".stripMargin

  private val q15Sql: String =
    """WITH rev AS (
      |  SELECT l_suppkey AS supplier_no,
      |         sum(CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
      |           + 5e-1) AS BIGINT)) AS total4
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey),
      |mx AS (SELECT max(total4) AS m4 FROM rev)
      |SELECT s_suppkey, s_name,
      |       floor(CAST(total4 AS DOUBLE) / 1e2 + 5e-1) / 1e2
      |         AS total_revenue
      |FROM rev CROSS JOIN mx
      |JOIN supplier ON s_suppkey = supplier_no
      |WHERE total4 = m4""".stripMargin

  private val q16Sql: String = psProxySql +
    """
      |SELECT p_brand, p_type, p_size,
      |       count(DISTINCT ps_suppkey) AS supplier_cnt
      |FROM psc JOIN part ON p_partkey = ps_partkey
      |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
      |  AND p_size IN (1, 12, 17, 23, 27, 33, 42, 50)
      |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                         WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  private val q20Sql: String = psProxySql +
    """
      |, shipped AS (
      |  SELECT l_partkey AS sp, l_suppkey AS ss,
      |         sum(CAST(l_quantity AS BIGINT)) AS sq
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2)
      |SELECT DISTINCT s_name, n_name
      |FROM psc JOIN part ON p_partkey = ps_partkey
      |JOIN shipped ON sp = ps_partkey AND ss = ps_suppkey
      |JOIN supplier ON s_suppkey = ps_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%rod%' AND availqty > sq * 5
      |  AND n_name IN ('NATION_5', 'NATION_6', 'NATION_7')""".stripMargin

  private val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND n_name IN ('NATION_3', 'NATION_4')
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY s_name""".stripMargin

  private val extraQueries = Seq(
    // P7: geometry re-check guard — recompute the region from coords, keep
    // only rows whose hint agrees (strict anti-leak drop)
    Q("p7_geometry_recheck",
      (s, dir) => {
        val assigned = queriesInternal("g4_region_cascade")(s, dir)
          .select(col("c_custkey"), col("city_id"))
        t(s, dir, "customer")
          .withColumn("hint_city", pmod(col("c_custkey"), lit(5)).cast("int"))
          .join(assigned, Seq("c_custkey"))
          .where(col("city_id") === col("hint_city"))
          .select("c_custkey", "city_id")
      },
      Some(s"""WITH assigned AS (
              |${graphQueries.find(_.name == "g4_region_cascade").get.oracle.get}
              |)
              |SELECT c.c_custkey, a.city_id
              |FROM customer c JOIN assigned a ON c.c_custkey = a.c_custkey
              |WHERE a.city_id = CAST(c.c_custkey % 5 AS INT)""".stripMargin)),

    // F2: name normalization with German street-token canonicalization
    Q("f2_normalize_name",
      // suffix abbreviation "Hauptstr." exercises the boundary-free str.
      // rule (reference utils.py:73 has no leading \b); input is ASCII so
      // the oracle needs no ascii-fold step
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 300)
        .withColumn("raw", concat(lit("Hauptstr. "), col("c_name"), lit("!!")))
        .select(col("c_custkey"),
          TextFunctions.normalizeNameUdf(col("raw")).as("norm")),
      Some("""SELECT c_custkey, trim(regexp_replace(regexp_replace(
             |  regexp_replace(regexp_replace(
             |    lower('Hauptstr. ' || c_name || '!!'),
             |    'str\.|strasse\b', 'strasse', 'g'),
             |    '\bpl\.|platz\b', 'platz', 'g'),
             |  '[^a-z0-9 ]+', ' ', 'g'), '\s+', ' ', 'g')) AS norm
             |FROM customer WHERE c_custkey < 300""".stripMargin)),

    // F14: title -> match-key candidates (full, pre-'/' root, no '(...)')
    Q("f14_title_candidates",
      (s, dir) => t(s, dir, "part").where(col("p_partkey") < 500)
        .withColumn("title", concat(col("p_name"), lit("/district ("),
          col("p_brand"), lit(")")))
        .withColumn("cands", array_distinct(array(
          col("title"),
          regexp_replace(col("title"), "/.*$", ""),
          trim(regexp_replace(col("title"), "\\s*\\([^)]*\\)\\s*$", "")))))
        .select(col("p_partkey"), explode(col("cands")).as("candidate")),
      Some("""WITH w AS (SELECT p_partkey,
             |  p_name || '/district (' || p_brand || ')' AS title
             |  FROM part WHERE p_partkey < 500)
             |SELECT p_partkey, unnest(list_distinct([title,
             |  regexp_replace(title, '/.*$', ''),
             |  trim(regexp_replace(title, '\s*\([^)]*\)\s*$', ''))]))
             |  AS candidate
             |FROM w""".stripMargin)),

    // F15 + F21: wiki markup cleanup + truncation
    Q("f15_wiki_clean",
      (s, dir) => t(s, dir, "part").where(col("p_partkey") < 500)
        .withColumn("marked", concat(lit("[["), col("p_name"), lit("|Alias]] "),
          lit("{{infobox|x=1}} see [[Plain Page]] about "), col("p_type")))
        .select(col("p_partkey"),
          substring(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            col("marked"),
            "\\[\\[[^\\]|]*\\|([^\\]]*)\\]\\]", "$1"),
            "\\[\\[([^\\]]*)\\]\\]", "$1"),
            "\\{\\{[^}]*\\}\\}", ""),
            "\\s+", " "), 1, 40).as("clean")),
      Some("""WITH w AS (SELECT p_partkey, '[[' || p_name ||
             |  '|Alias]] {{infobox|x=1}} see [[Plain Page]] about ' || p_type
             |  AS marked FROM part WHERE p_partkey < 500)
             |SELECT p_partkey, substr(regexp_replace(regexp_replace(
             |  regexp_replace(regexp_replace(marked,
             |  '\[\[[^\]|]*\|([^\]]*)\]\]', '\1', 'g'),
             |  '\[\[([^\]]*)\]\]', '\1', 'g'),
             |  '\{\{[^}]*\}\}', '', 'g'),
             |  '\s+', ' ', 'g'), 1, 40) AS clean
             |FROM w""".stripMargin)),

    // J7: pair-enrichment join — attach attributes to both ends of link pairs
    Q("j7_pair_enrich",
      (s, dir) => {
        val pairs = SpatialJoins.gridSelfJoin(
          custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
        val dim = t(s, dir, "customer")
          .join(broadcast(t(s, dir, "nation")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("n_name"))
        pairs
          .join(dim.select(col("c_custkey").as("a_id"), col("c_name").as("a_name"),
            col("n_name").as("a_nation")), "a_id")
          .join(dim.select(col("c_custkey").as("b_id"), col("c_name").as("b_name"),
            col("n_name").as("b_nation")), "b_id")
          .select(col("a_id"), col("b_id"), col("a_name"), col("b_name"),
            col("a_nation"), col("b_nation"), round(col("meters"), 2).as("meters"))
      },
      Some(s"""WITH pts AS ($custPointsSql),
              |dim AS (SELECT c_custkey, c_name, n_name FROM customer
              |        JOIN nation ON c_nationkey = n_nationkey),
              |pairs AS (
              |  SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |    ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} AS meters
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0)
              |SELECT p.a_id, p.b_id, da.c_name AS a_name, db.c_name AS b_name,
              |  da.n_name AS a_nation, db.n_name AS b_nation,
              |  round(p.meters, 2) AS meters
              |FROM pairs p JOIN dim da ON p.a_id = da.c_custkey
              |JOIN dim db ON p.b_id = db.c_custkey""".stripMargin)),

    // A11 + F21: capped ordered collect with truncation, standalone
    Q("a11_capped_collect",
      (s, dir) => {
        val w = Window.partitionBy("source")
          .orderBy(col("n_chars").asc, col("doc_id").asc)
        t(s, dir, "documents").withColumn("rn", row_number().over(w))
          .where(col("rn") <= 2)
          .groupBy("source")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("doc_id")))),
            x => x.getField("doc_id").cast("string")), ",").as("shortest_ids"),
            substring(min(col("text")), 1, 60).as("snippet"))
      },
      Some("""WITH ranked AS (SELECT *, row_number() OVER (PARTITION BY source
             |  ORDER BY n_chars ASC, doc_id ASC) AS rn FROM documents)
             |SELECT source,
             |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
             |    AS shortest_ids,
             |  substr(min(text), 1, 60) AS snippet
             |FROM ranked WHERE rn <= 2 GROUP BY source""".stripMargin)),

    // G6: lift facts from members to their canonical component
    Q("g6_component_lift",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val comps = ConnectedComponents.run(edges)
          .withColumnRenamed("node", "c_custkey")
        t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(comps, Seq("c_custkey"), "left")
          .withColumn("component", coalesce(col("component"), col("c_custkey")))
          .groupBy("component")
          .agg(count(lit(1)).as("n_orders"),
            round(sum("o_totalprice"), 2).as("revenue"))
      },
      Some(s"""WITH RECURSIVE pts AS ($custPointsSql),
              |edges AS (
              |  SELECT a.c_custkey AS src, b.c_custkey AS dst
              |  FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
              |sym AS (
              |  SELECT src AS u, dst AS v FROM edges
              |  UNION SELECT dst, src FROM edges
              |  UNION SELECT src, src FROM edges
              |  UNION SELECT dst, dst FROM edges),
              |reach AS (
              |  SELECT u, v FROM sym
              |  UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
              |comps AS (SELECT u AS c_custkey, min(v) AS component
              |          FROM reach GROUP BY u)
              |SELECT coalesce(comps.component, c.c_custkey) AS component,
              |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
              |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
              |LEFT JOIN comps ON c.c_custkey = comps.c_custkey
              |GROUP BY 1""".stripMargin)),

    // listings_nearby + popularity: the operator the reference CONSUMES but
    // never ships (SURVEY §3.3 / §7.4.6) — count of NEAR "listings"
    // (suppliers) per "place" (customer) within 300 m, then the per-group
    // z-score + flag pipeline of neo4j_cypher/12.
    Q("g10_listings_nearby",
      (s, dir) => {
        val near = SpatialJoins.gridWithinJoin(
          custPoints(s, dir), suppPoints(s, dir),
          "c_custkey", "s_suppkey", thresholdM = 300.0)
        val counts = t(s, dir, "customer")
          .join(near.groupBy("c_custkey")
            .agg(countDistinct("s_suppkey").as("listings_nearby")),
            Seq("c_custkey"), "left")
          .withColumn("listings_nearby",
            coalesce(col("listings_nearby"), lit(0L)))
        val w = Window.partitionBy("c_nationkey")
        val mu = avg(col("listings_nearby").cast("double")).over(w)
        val sd = stddev_samp(col("listings_nearby").cast("double")).over(w)
        counts.withColumn("z",
            round(when(sd === 0 || sd.isNull, 0.0)
              .otherwise((col("listings_nearby") - mu) / sd), 4) + 0.0)
          .withColumn("flag", when(col("z") >= 1.0, "high")
            .when(col("z") >= 0.0, "medium").otherwise("low"))
          .select("c_custkey", "listings_nearby", "z", "flag")
      },
      Some(s"""WITH pts AS ($custPointsSql), sup AS ($suppPointsSql),
              |near AS (
              |  SELECT c_custkey, count(DISTINCT s_suppkey) AS listings_nearby
              |  FROM pts JOIN sup
              |    ON ${havSql("pts.lat", "pts.lon", "sup.lat", "sup.lon")} <= 300.0
              |  GROUP BY c_custkey),
              |counts AS (
              |  SELECT c.c_custkey, c.c_nationkey,
              |    coalesce(n.listings_nearby, 0) AS listings_nearby
              |  FROM customer c LEFT JOIN near n ON c.c_custkey = n.c_custkey),
              |z AS (
              |  SELECT c_custkey, listings_nearby,
              |    round(CASE WHEN stddev_samp(CAST(listings_nearby AS DOUBLE))
              |        OVER w = 0
              |      OR stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w IS NULL
              |      THEN 0.0
              |      ELSE (CAST(listings_nearby AS DOUBLE) -
              |        avg(CAST(listings_nearby AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w
              |      END, 4) + 0e0 AS z
              |  FROM counts WINDOW w AS (PARTITION BY c_nationkey))
              |SELECT c_custkey, listings_nearby, z,
              |  CASE WHEN z >= 1.0 THEN 'high' WHEN z >= 0.0 THEN 'medium'
              |    ELSE 'low' END AS flag
              |FROM z""".stripMargin)),

    // G9: alias-suggestion shape — unassigned rows vote a label toward
    // their nearest center within 35 km, kept above a min count
    Q("g9_alias_votes",
      (s, dir) => {
        val assigned = queriesInternal("g4_region_cascade")(s, dir)
          .select("c_custkey")
        val cities = t(s, dir, "region")
          .select(col("r_regionkey").as("city_id"),
            (lit(40.0) + col("r_regionkey") * 0.04).as("center_lat"),
            lit(-74.95).as("center_lon"))
        val unassigned = custPoints(s, dir)
          .join(assigned, Seq("c_custkey"), "left_anti")
        val cand = unassigned.crossJoin(broadcast(cities))
          .withColumn("center_m", GeoFunctions.haversineM(col("lat"), col("lon"),
            col("center_lat"), col("center_lon")))
        val w = Window.partitionBy("c_custkey")
          .orderBy(col("center_m").asc, col("city_id").asc)
        cand.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .where(col("center_m") <= 35000.0)
          .groupBy("city_id", "c_mktsegment")
          .agg(count(lit(1)).as("votes"))
          .where(col("votes") >= 5)
      },
      Some(s"""WITH assigned AS (
              |${graphQueries.find(_.name == "g4_region_cascade").get.oracle.get}
              |),
              |cities AS (SELECT r_regionkey AS city_id,
              |  40e0 + r_regionkey * 4e-2 AS center_lat, -7.495e1 AS center_lon
              |  FROM region),
              |unassigned AS (
              |  SELECT * FROM ($custPointsSql) p
              |  WHERE NOT EXISTS (SELECT 1 FROM assigned a
              |                    WHERE a.c_custkey = p.c_custkey)),
              |cand AS (
              |  SELECT u.c_custkey, u.c_mktsegment, c.city_id,
              |    ${havSql("u.lat", "u.lon", "c.center_lat", "c.center_lon")}
              |      AS center_m,
              |    row_number() OVER (PARTITION BY u.c_custkey ORDER BY
              |      ${havSql("u.lat", "u.lon", "c.center_lat", "c.center_lon")}
              |      ASC, c.city_id ASC) AS rn
              |  FROM unassigned u CROSS JOIN cities c)
              |SELECT city_id, c_mktsegment, count(*) AS votes
              |FROM cand WHERE rn = 1 AND center_m <= 35e3
              |GROUP BY 1, 2 HAVING count(*) >= 5""".stripMargin)),

    // TPC-H-shaped SQL through the spark.sql text surface (the engine's
    // declarative plans are the same whether built via DataFrame or SQL)
    Q("q3_shipping_priority",
      (s, dir) => {
        Seq("customer", "orders", "lineitem").foreach(n =>
          t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT l_orderkey,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue,
                 CAST(o_orderdate AS DATE) AS order_date
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
          GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
          ORDER BY revenue DESC, l_orderkey ASC
          LIMIT 10""")
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue,
             |  CAST(o_orderdate AS DATE) AS order_date
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING' AND o_orderstatus = 'O'
             |GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
             |ORDER BY revenue DESC, l_orderkey ASC
             |LIMIT 10""".stripMargin)),

    Q("q10_returned_items",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "nation").foreach(n =>
          t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_custkey, c_name, n_name,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE l_returnflag = 'R'
          GROUP BY c_custkey, c_name, n_name
          HAVING sum(l_extendedprice * (1e0 - l_discount)) > 1000
          ORDER BY revenue DESC, c_custkey ASC
          LIMIT 20""")
      },
      Some("""SELECT c_custkey, c_name, n_name,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, n_name
             |HAVING sum(l_extendedprice * (1e0 - l_discount)) > 1000
             |ORDER BY revenue DESC, c_custkey ASC
             |LIMIT 20""".stripMargin)),

    Q("q1_pricing_summary",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 round(sum(l_quantity), 2) AS sum_qty,
                 round(sum(l_extendedprice), 2) AS sum_base_price,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2)
                   AS sum_disc_price,
                 round(sum(l_extendedprice * (1e0 - l_discount) *
                   (1e0 + l_tax)), 2) AS sum_charge,
                 round(avg(l_quantity), 4) AS avg_qty,
                 round(avg(l_extendedprice), 4) AS avg_price,
                 round(avg(l_discount), 6) AS avg_disc,
                 count(*) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
          GROUP BY l_returnflag, l_linestatus""")
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity), 2) AS sum_qty,
             |  round(sum(l_extendedprice), 2) AS sum_base_price,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2)
             |    AS sum_disc_price,
             |  round(sum(l_extendedprice * (1e0 - l_discount) *
             |    (1e0 + l_tax)), 2) AS sum_charge,
             |  round(avg(l_quantity), 4) AS avg_qty,
             |  round(avg(l_extendedprice), 4) AS avg_price,
             |  round(avg(l_discount), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    Q("q5_local_supplier_volume",
      (s, dir) => {
        Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT n_name,
                 round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
          FROM customer JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON l_orderkey = o_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
            AND c_nationkey = s_nationkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
          GROUP BY n_name""")
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1e0 - l_discount)), 2) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |JOIN lineitem ON l_orderkey = o_orderkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |  AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin)),

    // TPC-H q4 shape: correlated EXISTS decorrelates to a left semi join
    // (late-shipping lines flag their order) — grouped priority counts
    Q("q4_order_priority",
      (s, dir) => {
        Seq("orders", "lineitem")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_orderpriority, count(*) AS order_count
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate < TIMESTAMP '1997-04-01'
            AND EXISTS (SELECT 1 FROM lineitem
                        WHERE l_orderkey = o_orderkey
                          AND l_shipdate > o_orderdate)
          GROUP BY o_orderpriority""")
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-04-01'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate)
             |GROUP BY o_orderpriority""".stripMargin)),

    // TPC-H q14 shape: conditional-aggregate ratio (promo revenue share
    // in one ship month), dim join broadcast-able on part
    Q("q14_promo_share",
      (s, dir) => {
        Seq("lineitem", "part")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT round(1e2 * sum(CASE WHEN p_type LIKE 'PROMO%'
                   THEN l_extendedprice * (1e0 - l_discount) ELSE 0e0 END)
                 / sum(l_extendedprice * (1e0 - l_discount)), 4)
                 AS promo_share,
                 count(*) AS n
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE l_shipdate >= TIMESTAMP '1997-03-01'
            AND l_shipdate < TIMESTAMP '1997-04-01'""")
      },
      Some("""SELECT round(1e2 * sum(CASE WHEN p_type LIKE 'PROMO%'
             |         THEN l_extendedprice * (1e0 - l_discount) ELSE 0e0 END)
             |       / sum(l_extendedprice * (1e0 - l_discount)), 4)
             |       AS promo_share,
             |       count(*) AS n
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-03-01'
             |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)),

    // TPC-H q7 shape (volume shipping): the bidirectional two-nation
    // trade flow by ship year — a 5-join tree where BOTH nation dims
    // enter by broadcast under different aliases and the date-range
    // predicate pushes to the lineitem scan (PlanSpec asserts both).
    Q("q7_nation_volume",
      (s, dir) => {
        Seq("supplier", "lineitem", "orders", "customer", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT supp_nation, cust_nation, l_year,
                 round(sum(volume), 2) AS revenue
          FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(l_shipdate) AS l_year,
                   l_extendedprice * (1e0 - l_discount) AS volume
            FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00') shipping
          GROUP BY supp_nation, cust_nation, l_year""")
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             |       round(sum(volume), 2) AS revenue
             |FROM (
             |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |         year(l_shipdate) AS l_year,
             |         l_extendedprice * (1e0 - l_discount) AS volume
             |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             |      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
             |    AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
             |    AND l_shipdate <= TIMESTAMP '1996-12-31 00:00:00') shipping
             |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)),

    // TPC-H q9 shape (product-type profit): profit by supplier nation
    // and order year for a part-name family. The corpus has no partsupp
    // table, so supply cost is the documented proxy 1% of p_retailprice
    // per unit — the join tree (lineitem against part + supplier +
    // orders + nation, part filtered BEFORE the join) is the point.
    // Profit sums as exact integer ten-thousandths (4-decimal inputs ->
    // amt4 integral; long sums are ORDER-INDEPENDENT, unlike double
    // sums whose engine-specific order left one of 175 groups on a
    // rounding midpoint) and quantizes once at the end with the
    // identical-IEEE-ops floor form.
    Q("q9_product_profit",
      (s, dir) => {
        Seq("part", "supplier", "lineitem", "orders", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT nation, o_year,
                 floor(CAST(sum(amt4) AS DOUBLE) / 1e2 + 5e-1) / 1e2
                   AS sum_profit
          FROM (
            SELECT n_name AS nation, year(o_orderdate) AS o_year,
                   CAST(floor((l_extendedprice * (1e0 - l_discount)
                     - 1e-2 * p_retailprice * l_quantity) * 1e4 + 5e-1)
                     AS BIGINT) AS amt4
            FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_name LIKE '%rod%') profit
          GROUP BY nation, o_year""")
      },
      Some("""SELECT nation, o_year,
             |  floor(CAST(sum(amt4) AS DOUBLE) / 1e2 + 5e-1) / 1e2
             |    AS sum_profit
             |FROM (
             |  SELECT n_name AS nation, year(o_orderdate) AS o_year,
             |         CAST(floor((l_extendedprice * (1e0 - l_discount)
             |           - 1e-2 * p_retailprice * l_quantity) * 1e4 + 5e-1)
             |           AS BIGINT) AS amt4
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  WHERE p_name LIKE '%rod%') profit
             |GROUP BY nation, o_year""".stripMargin)),

    // TPC-H q8 shape (national market share): one nation's share of a
    // region's import volume by order year — the 7-join tree with
    // nation entering TWICE under different roles. Numerator and
    // denominator sum exact integer ten-thousandths (the q9 lesson);
    // the ratio divides once at the end with identical IEEE ops.
    Q("q8_market_share",
      (s, dir) => {
        Seq("part", "lineitem", "supplier", "orders", "customer", "nation",
          "region").foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT o_year,
                 floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN amt4
                     ELSE 0 END) AS DOUBLE) / CAST(sum(amt4) AS DOUBLE)
                   * 1e4 + 5e-1) / 1e4 AS mkt_share
          FROM (
            SELECT year(o_orderdate) AS o_year,
                   CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
                     + 5e-1) AS BIGINT) AS amt4,
                   n2.n_name AS nation
            FROM part JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
              AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00') all_nations
          GROUP BY o_year""")
      },
      Some("""SELECT o_year,
             |  floor(CAST(sum(CASE WHEN nation = 'NATION_3' THEN amt4
             |      ELSE 0 END) AS DOUBLE) / CAST(sum(amt4) AS DOUBLE)
             |    * 1e4 + 5e-1) / 1e4 AS mkt_share
             |FROM (
             |  SELECT year(o_orderdate) AS o_year,
             |    CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
             |      + 5e-1) AS BIGINT) AS amt4,
             |    n2.n_name AS nation
             |  FROM part JOIN lineitem ON p_partkey = l_partkey
             |  JOIN supplier ON s_suppkey = l_suppkey
             |  JOIN orders ON o_orderkey = l_orderkey
             |  JOIN customer ON c_custkey = o_custkey
             |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |  JOIN region ON n1.n_regionkey = r_regionkey
             |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
             |    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
             |    AND o_orderdate <= TIMESTAMP '1996-12-31 00:00:00'
             |  ) all_nations
             |GROUP BY o_year""".stripMargin)),

    // TPC-H q13 shape (customer order-count distribution): LEFT join
    // with a join-level predicate (the filter must NOT drop orderless
    // customers — they are the c_count = 0 bucket), double aggregation.
    Q("q13_customer_distribution",
      (s, dir) => {
        Seq("customer", "orders")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_count, count(*) AS custdist
          FROM (SELECT c_custkey, count(o_orderkey) AS c_count
                FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
                GROUP BY c_custkey) c_orders
          GROUP BY c_count""")
      },
      Some("""SELECT c_count, count(*) AS custdist
             |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
             |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |        AND o_orderpriority <> '1-URGENT'
             |      GROUP BY c_custkey) c_orders
             |GROUP BY c_count""".stripMargin)),

    // TPC-H q17 shape (small-quantity revenue): per-part average
    // quantity as a correlated bound. The below-a-fifth-of-average
    // test runs in EXACT integer arithmetic (qty * 5 * n < sum_qty —
    // quantities are integral), so no engine's division order can
    // flip a boundary row; the one output value quantizes once.
    Q("q17_small_quantity",
      (s, dir) => {
        Seq("lineitem", "part")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT floor(CAST(sum(ext2) AS DOUBLE) / 1e2 / 7e0 * 1e2 + 5e-1)
                   / 1e2 AS avg_yearly
          FROM (
            SELECT CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)
                     AS ext2
            FROM lineitem JOIN part ON p_partkey = l_partkey
            JOIN (SELECT l_partkey AS agg_pk,
                         sum(CAST(l_quantity AS BIGINT)) AS sq,
                         count(*) AS nq
                  FROM lineitem GROUP BY l_partkey) agg
              ON agg_pk = p_partkey
            WHERE p_brand = 'Brand#13'
              AND CAST(l_quantity AS BIGINT) * 5 * nq < sq) small""")
      },
      Some("""SELECT floor(CAST(sum(ext2) AS DOUBLE) / 1e2 / 7e0 * 1e2
             |         + 5e-1) / 1e2 AS avg_yearly
             |FROM (
             |  SELECT CAST(floor(l_extendedprice * 1e2 + 5e-1) AS BIGINT)
             |           AS ext2
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  JOIN (SELECT l_partkey AS agg_pk,
             |               sum(CAST(l_quantity AS BIGINT)) AS sq,
             |               count(*) AS nq
             |        FROM lineitem GROUP BY l_partkey) agg
             |    ON agg_pk = p_partkey
             |  WHERE p_brand = 'Brand#13'
             |    AND CAST(l_quantity AS BIGINT) * 5 * nq < sq) small"""
        .stripMargin)),

    // TPC-H q18 shape (large-volume orders): HAVING-style semi filter
    // on a grouped fact, then enrich with customer + order dims.
    // Quantities are integral so the 300 threshold is exact.
    Q("q18_large_orders",
      (s, dir) => {
        Seq("customer", "orders", "lineitem")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT c_name, c_custkey, o_orderkey, year(o_orderdate) AS o_year,
                 o_totalprice, sum_qty
          FROM (SELECT l_orderkey,
                       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
                         AS sum_qty
                FROM lineitem GROUP BY l_orderkey
                HAVING sum(CAST(l_quantity AS BIGINT)) > 300) big
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey""")
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, year(o_orderdate)
             |         AS o_year,
             |       o_totalprice, sum_qty
             |FROM (SELECT l_orderkey,
             |             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
             |               AS sum_qty
             |      FROM lineitem GROUP BY l_orderkey
             |      HAVING sum(CAST(l_quantity AS BIGINT)) > 300) big
             |JOIN orders ON o_orderkey = l_orderkey
             |JOIN customer ON c_custkey = o_custkey""".stripMargin)),

    // TPC-H q19 shape (disjunctive predicate revenue): three OR'd
    // brand/size/quantity bands — the planner must still push the
    // common p_partkey equi-key and evaluate the disjunction as a
    // post-join filter, never a cartesian.
    Q("q19_disjunct_revenue",
      (s, dir) => {
        Seq("lineitem", "part")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          SELECT floor(CAST(sum(amt4) AS DOUBLE) / 1e4 * 1e2 + 5e-1) / 1e2
                   AS revenue
          FROM (
            SELECT CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
                     + 5e-1) AS BIGINT) AS amt4
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                   AND l_quantity BETWEEN 1 AND 11)
               OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
                   AND l_quantity BETWEEN 10 AND 20)
               OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
                   AND l_quantity BETWEEN 20 AND 30)) matched""")
      },
      Some("""SELECT floor(CAST(sum(amt4) AS DOUBLE) / 1e4 * 1e2 + 5e-1)
             |         / 1e2 AS revenue
             |FROM (
             |  SELECT CAST(floor(l_extendedprice * (1e0 - l_discount) * 1e4
             |           + 5e-1) AS BIGINT) AS amt4
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
             |         AND l_quantity BETWEEN 1 AND 11)
             |     OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
             |         AND l_quantity BETWEEN 10 AND 20)
             |     OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
             |         AND l_quantity BETWEEN 20 AND 30)) matched"""
        .stripMargin)),

    // TPC-H q22 shape (global sales opportunity): above-average-balance
    // customers in selected "country codes" (c_nationkey stands in —
    // the corpus has no phone column) with no URGENT orders (every
    // customer here has SOME order, so the classic no-orders predicate
    // would be vacuous): scalar-subquery threshold + anti join. The above-average test is the exact
    // integer cross-multiplication bal2 * n > s2 — no engine's
    // summation order can flip a boundary customer — and balances are
    // 2-decimal so sum(bal2)/1e2 is one exact division.
    Q("q22_sales_opportunity",
      (s, dir) => {
        Seq("customer", "orders")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql("""
          WITH sel AS (
            SELECT c_custkey, c_nationkey,
                   CAST(floor(c_acctbal * 1e2 + 5e-1) AS BIGINT) AS bal2
            FROM customer WHERE c_nationkey % 5 = 0),
          pos AS (
            SELECT sum(bal2) AS s2, count(*) AS n
            FROM sel WHERE bal2 > 0)
          SELECT c_nationkey AS cntrycode, count(*) AS numcust,
                 CAST(sum(bal2) AS DOUBLE) / 1e2 AS totacctbal
          FROM sel CROSS JOIN pos
          WHERE bal2 * n > s2
            AND NOT EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey
                              AND o_orderpriority = '1-URGENT')
          GROUP BY c_nationkey""")
      },
      Some("""WITH sel AS (
             |  SELECT c_custkey, c_nationkey,
             |         CAST(floor(c_acctbal * 1e2 + 5e-1) AS BIGINT) AS bal2
             |  FROM customer WHERE c_nationkey % 5 = 0),
             |pos AS (
             |  SELECT sum(bal2) AS s2, count(*) AS n
             |  FROM sel WHERE bal2 > 0)
             |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
             |       CAST(sum(bal2) AS DOUBLE) / 1e2 AS totacctbal
             |FROM sel CROSS JOIN pos
             |WHERE bal2 * n > s2
             |  AND NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |GROUP BY c_nationkey""".stripMargin)),

    // TPC-H q2 shape (minimum-cost supplier): the corpus has no
    // partsupp table, so the part-supplier relation is the DISTINCT
    // (l_partkey, l_suppkey) pairs observed in lineitem and supply
    // cost/availqty are deterministic integer functions of the key
    // pair (psProxySql — identical arithmetic in both engines, the
    // q9 proxy-cost precedent). The correlated "cost = regional
    // minimum for this part" subquery decorrelates into a grouped-min
    // join; dims broadcast, the pair scan is the only fact.
    Q("q2_min_cost_supplier",
      (s, dir) => {
        Seq("lineitem", "part", "supplier", "nation", "region")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q2Sql)
      },
      Some(q2Sql)),

    // TPC-H q11 shape (important stock): per-part inventory value over
    // a nation group against a global-total threshold. Values are
    // exact integer cents x units; the fraction test is the exact
    // cross-multiplication v2 * 1000 > total (threshold 1/1000), so
    // no engine's summation order can flip a boundary part. The
    // global total enters by one-row broadcast cross join.
    Q("q11_important_stock",
      (s, dir) => {
        Seq("lineitem", "supplier", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q11Sql)
      },
      Some(q11Sql)),

    // TPC-H q12 shape (shipmode priority counts): the corpus has no
    // l_shipmode/commitdate/receiptdate, so mode is a deterministic
    // 3-way split of the line key and "late" is shipped > 60 days
    // after order date — the shape (fact-fact equi-join, date-window
    // pushdown, CASE'd priority counts) is the point.
    Q("q12_shipmode_priority",
      (s, dir) => {
        Seq("lineitem", "orders")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q12Sql)
      },
      Some(q12Sql)),

    // TPC-H q15 shape (top supplier): quarterly revenue per supplier,
    // global max by one-row broadcast cross join, equality back-join.
    // Revenue accumulates as exact integer ten-thousandths so the
    // max-equality test cannot be split by float summation order;
    // the one output value quantizes once at the end.
    Q("q15_top_supplier",
      (s, dir) => {
        Seq("lineitem", "supplier")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q15Sql)
      },
      Some(q15Sql)),

    // TPC-H q16 shape (parts/supplier count): distinct-supplier counts
    // per brand/type/size over the pair relation, excluding
    // "complaint" suppliers by NOT IN (negative account balance
    // stands in for the comment pattern — the corpus has no
    // s_comment). The NOT IN decorrelates to a null-aware anti join
    // against the 100-row supplier dim.
    Q("q16_supplier_count",
      (s, dir) => {
        Seq("lineitem", "part", "supplier")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q16Sql)
      },
      Some(q16Sql)),

    // TPC-H q20 shape (potential part promotion): suppliers whose
    // proxy availqty exceeds 5x what they actually shipped of a
    // part-name family in a year — nested IN subqueries decorrelated
    // into joins against the grouped-shipment frame; the availqty
    // test is exact integer arithmetic.
    Q("q20_potential_promotion",
      (s, dir) => {
        Seq("lineitem", "part", "supplier", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q20Sql)
      },
      Some(q20Sql)),

    // TPC-H q21 shape (suppliers who kept orders waiting): the
    // EXISTS / NOT EXISTS double-correlated self-join on lineitem.
    // "Late" is shipped > 90 days after order date (the corpus has no
    // commit/receipt dates; lateness correlates the OUTER order's
    // date into the NOT EXISTS branch, preserving the classic
    // other-supplier-was-also-late exclusion shape).
    Q("q21_waiting_suppliers",
      (s, dir) => {
        Seq("lineitem", "orders", "supplier", "nation")
          .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
        s.sql(q21Sql)
      },
      Some(q21Sql)),

    // J4 via the OPTIMIZER RULE: the join is written naively as a radius
    // predicate; SpatialJoinRule (plans/SpatialRewrite) rewrites it into
    // the grid-blocked equi-join — same results as the hand-built j4
    Q("j4_auto_rewrite",
      (s, dir) => {
        graft.plans.GraftExtensions.install(s)
        val a = custPoints(s, dir).select(col("c_custkey").as("a_id"),
          col("lat").as("a_lat"), col("lon").as("a_lon"))
        val b = custPoints(s, dir).select(col("c_custkey").as("b_id"),
          col("lat").as("b_lat"), col("lon").as("b_lon"))
        a.join(b, col("a_id") < col("b_id") &&
            graft.plans.WithinMeters(col("a_lat"), col("a_lon"),
              col("b_lat"), col("b_lon"), 250.0))
          .select(col("a_id"), col("b_id"),
            round(GeoFunctions.haversineM(col("a_lat"), col("a_lon"),
              col("b_lat"), col("b_lon")), 2).as("meters"))
      },
      Some(s"""WITH pts AS ($custPointsSql)
              |SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              |  round(${havSql("a.lat", "a.lon", "b.lat", "b.lon")}, 2) AS meters
              |FROM pts a JOIN pts b ON a.c_custkey < b.c_custkey
              |WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0"""
        .stripMargin)),

    // ANN via SRP-LSH buckets, fully oracle-checked (unrolled SRP SQL)
    Q("ann_lsh_topk",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(
          emb.where(col("vec_id") >= 5), emb.where(col("vec_id") < 5),
          "vec_id", "vec_id", "embedding", k = 5, numPlanes = 8, tables = 2)
          .withColumn("rank", col("rank").cast("int"))
      },
      Some {
        val cBuckets = (0 until 2).map(t =>
          s"SELECT c_id, c_v, $t AS tbl, ${srpBucketSql("c_v", t, 8)} AS bucket FROM c")
          .mkString("\nUNION ALL\n")
        val qBuckets = (0 until 2).map(t =>
          s"SELECT q_id, q_v, $t AS tbl, ${srpBucketSql("q_v", t, 8)} AS bucket FROM q")
          .mkString("\nUNION ALL\n")
        s"""WITH c AS (SELECT vec_id AS c_id, embedding AS c_v FROM embeddings
           |           WHERE vec_id >= 5),
           |q AS (SELECT vec_id AS q_id, embedding AS q_v FROM embeddings
           |      WHERE vec_id < 5),
           |cb AS ($cBuckets),
           |qb AS ($qBuckets),
           |cand AS (SELECT DISTINCT q_id, c_id, q_v, c_v
           |         FROM cb JOIN qb ON cb.tbl = qb.tbl AND cb.bucket = qb.bucket),
           |scored AS (
           |  SELECT q_id, c_id, ${cosSql("c_v", "q_v")} AS cosine,
           |    row_number() OVER (PARTITION BY q_id
           |      ORDER BY ${cosSql("c_v", "q_v")} DESC, c_id ASC) AS rank
           |  FROM cand)
           |SELECT q_id, c_id, round(cosine, 6) AS cosine,
           |  CAST(rank AS INT) AS rank
           |FROM scored WHERE rank <= 5""".stripMargin
      })
  )

  // =================================================================
  // Spec-only-tail closure: S4/S7/K1/K2/F5/F9/F12/F18/F20 under the oracle
  // =================================================================

  /** DuckDB XML entity unescape mirroring Sources.xmlUnescape (literal
    * replaces, &amp; last). */
  private def xmlUnescSql(e: String): String =
    s"replace(replace(replace(replace(replace($e, '&lt;', '<'), " +
      "'&gt;', '>'), '&quot;', '\"'), '&apos;', ''''), '&amp;', '&')"

  /** DuckDB stemmed-token list mirroring TextFunctions.stemTokens over
    * ASCII input (normText = lower + non-alnum collapse there). */
  private def stemSql(expr: String): String =
    s"""list_transform(list_filter(string_split(trim(regexp_replace(
       |  lower($expr), '[^a-z0-9]+', ' ', 'g')), ' '), t_ -> len(t_) >= 3),
       |  t_ -> CASE WHEN t_ LIKE '%ies' AND len(t_) > 4
       |               THEN substr(t_, 1, len(t_) - 3) || 'y'
       |             WHEN t_ LIKE '%es' AND len(t_) > 3
       |               THEN substr(t_, 1, len(t_) - 2)
       |             WHEN t_ LIKE '%s' AND len(t_) > 3
       |               THEN substr(t_, 1, len(t_) - 1)
       |             ELSE t_ END)""".stripMargin

  /** Stop-token SQL list literal (reference _STOP, shared with the Scala
    * kernel so both engines drop the same tokens). */
  private def stopListSql: String =
    TextFunctions.StopTokens.toSeq.sorted.map(w => s"'$w'").mkString("[", ", ", "]")

  /** Sorted-content-token join string (reference _has_substring's A/B). */
  private def contentJoinSql(expr: String): String =
    s"array_to_string(list_sort(list_distinct(list_filter(${stemSql(expr)}, " +
      s"w_ -> NOT list_contains($stopListSql, w_)))), ' ')"

  /** Test polygon for F12 — spans the customer lattice (lat 40..40.192,
    * lon -75..-74.824), irregular so points land on both sides. */
  private lazy val testPolygon: Seq[(Double, Double)] = Seq(
    (40.05, -74.95), (40.12, -74.90), (40.08, -74.82),
    (40.02, -74.85), (40.00, -74.92))

  /** Closed-form oracle for the exact-integer JPEG pixel synthesis —
    * shared by mm_jpeg_decode (baseline) and mm_jpeg_progressive
    * (SOF2): both streams carry the same coefficients, so they decode
    * to identical pixels. */
  private val jpegPixelsOracle: Option[String] = Some(
    """WITH dims AS (
             |  SELECT doc_id, CAST(doc_id % 1000 AS INTEGER) AS idi,
             |    CAST(doc_id % 9 + 4 AS INTEGER) AS w,
             |    CAST(doc_id % 7 + 4 AS INTEGER) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, idi, w, h, x, y,
             |    CAST(x // 8 AS INTEGER) AS bx,
             |    CAST(y // 8 AS INTEGER) AS by,
             |    CASE WHEN (x % 8) IN (0,3,4,7) THEN 1 ELSE -1 END AS sx,
             |    CASE WHEN (y % 8) IN (0,3,4,7) THEN 1 ELSE -1 END AS sy
             |  FROM dims,
             |    (SELECT unnest(range(0, 12)) AS x),
             |    (SELECT unnest(range(0, 10)) AS y)
             |  WHERE x < w AND y < h),
             |ycc AS (
             |  SELECT doc_id, w, h, x, y,
             |    40 + (bx*29 + by*17 + idi*3) % 176
             |      + ((bx + by + idi) % 7 - 3) * sx
             |      + ((2*bx + by + idi) % 5 - 2) * sy
             |      + ((bx + 2*by + idi) % 3 - 1) * sx * sy AS yv,
             |    70 + (13*bx + 7*by + 5*idi) % 116
             |      + ((bx + idi) % 3 - 1) * sx
             |      + ((by + idi) % 3 - 1) * sy AS cb,
             |    70 + (11*bx + 19*by + 7*idi) % 116
             |      + ((by + idi) % 3 - 1) * sx
             |      + ((bx + 2*idi) % 3 - 1) * sy AS cr
             |  FROM px),
             |rgb AS (
             |  SELECT doc_id, w, h, x, y,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv + 1.402e0 * (cr - 128) + 0.5e0) AS INTEGER))) AS r,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv - 0.344136e0 * (cb - 128) - 0.714136e0 * (cr - 128)
             |      + 0.5e0) AS INTEGER))) AS g,
             |    LEAST(255, GREATEST(0, CAST(FLOOR(
             |      yv + 1.772e0 * (cb - 128) + 0.5e0) AS INTEGER))) AS b
             |  FROM ycc),
             |packed AS (
             |  SELECT doc_id, w, h, x, y,
             |    r * 65536 + g * 256 + b AS v
             |  FROM rgb)
             |SELECT doc_id, max(w) AS width, max(h) AS height,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN x = w - 1 AND y = h - 1 THEN v END)
             |    AS BIGINT) AS px_last,
             |  TRUE AS valid
             |FROM packed GROUP BY doc_id""".stripMargin)

  private val tailQueries = Seq(
    // S4: streaming-XML page ingest — the dump is synthesized from table
    // rows, split on the page delimiter exactly as the distributed
    // lineSep-based file reader does, field-extracted and entity-unescaped;
    // ns!=0 and redirect pages are skipped (wikivoyage_xml.py:154-169).
    Q("s4_xml_pages",
      (s, dir) => {
        val pageXml = concat(
          lit("<page><title>"), col("p_name"), lit(" &amp; Co</title>"),
          when(pmod(col("p_partkey"), lit(5)) === 0, lit("<ns>4</ns>"))
            .otherwise(lit("<ns>0</ns>")),
          when(pmod(col("p_partkey"), lit(7)) === 0,
            lit("<redirect title=\"X\"/>")).otherwise(lit("")),
          lit("<revision><text bytes=\"1\">{{see| name="), col("p_name"),
          lit(" | lat=48.2 | long=16.37 | content=&lt;b&gt;"), col("p_type"),
          lit("&lt;/b&gt;}}</text></revision></page>"))
        val dumps = t(s, dir, "part").where(col("p_partkey") < 400)
          .withColumn("grp", pmod(col("p_partkey"), lit(20)))
          .groupBy("grp")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("p_partkey").as("k"),
              pageXml.as("x")))),
            e => e.getField("x")), "").as("dump"))
        val segments = dumps
          .select(explode(split(col("dump"), "</page>")).as("value"))
        graft.sources.Sources.pagesFromSegments(segments)
          .where(col("ns") === 0 && !col("redirect"))
          .select("title", "ns", "text")
      },
      Some(s"""WITH p AS (
              |  SELECT p_partkey, p_partkey % 20 AS grp,
              |    '<page><title>' || p_name || ' &amp; Co</title>' ||
              |    CASE WHEN p_partkey % 5 = 0 THEN '<ns>4</ns>'
              |         ELSE '<ns>0</ns>' END ||
              |    CASE WHEN p_partkey % 7 = 0 THEN '<redirect title="X"/>'
              |         ELSE '' END ||
              |    '<revision><text bytes="1">{{see| name=' || p_name ||
              |    ' | lat=48.2 | long=16.37 | content=&lt;b&gt;' || p_type ||
              |    '&lt;/b&gt;}}</text></revision></page>' AS x
              |  FROM part WHERE p_partkey < 400),
              |d AS (SELECT grp, string_agg(x, '' ORDER BY p_partkey) AS dump
              |      FROM p GROUP BY grp),
              |seg AS (SELECT unnest(string_split(dump, '</page>')) AS value
              |        FROM d),
              |pg AS (
              |  SELECT
              |    ${xmlUnescSql("regexp_extract(value, '(?s)<title>(.*?)</title>', 1)")} AS title,
              |    COALESCE(TRY_CAST(regexp_extract(value, '<ns>(-?\\d+)</ns>', 1)
              |      AS INT), 0) AS ns,
              |    contains(value, '<redirect') AS redirect,
              |    ${xmlUnescSql("regexp_extract(value, '(?s)<text[^>]*>(.*?)</text>', 1)")} AS text
              |  FROM seg WHERE contains(value, '<page>'))
              |SELECT title, ns, text FROM pg
              |WHERE ns = 0 AND NOT redirect""".stripMargin)),

    // S7: CSV repair pre-pass — broken '" ,' quoting and trailing CR are
    // synthesized per row, repaired with the library's repair column, and
    // parsed with from_csv; the oracle repairs and parses the same lines.
    Q("s7_csv_repair",
      (s, dir) => {
        val line = concat(col("c_custkey").cast("string"), lit(",\""),
          col("c_name"), lit(" \" ,"),
          pmod(col("c_custkey") * 7, lit(10000)).cast("string"), lit(".25\r"))
        val schema = "id BIGINT, name STRING, bal DOUBLE"
        t(s, dir, "customer").where(col("c_custkey") < 500)
          .select(graft.sources.Sources.repairCsvValue(line).as("value"))
          .select(from_csv(col("value"),
            org.apache.spark.sql.types.StructType.fromDDL(schema),
            Map.empty[String, String]).as("r"))
          .select(col("r.id"), col("r.name"), col("r.bal"))
      },
      Some("""WITH l AS (
             |  SELECT CAST(c_custkey AS VARCHAR) || ',"' || c_name || ' " ,'
             |    || CAST(c_custkey * 7 % 10000 AS VARCHAR) || '.25'
             |    || chr(13) AS value
             |  FROM customer WHERE c_custkey < 500),
             |r AS (SELECT replace(regexp_replace(value, '\r$', ''),
             |  '" ,', '",') AS value FROM l)
             |SELECT CAST(split_part(value, ',', 1) AS BIGINT) AS id,
             |  trim(split_part(value, ',', 2), '"') AS name,
             |  CAST(split_part(value, ',', 3) AS DOUBLE) AS bal
             |FROM r""".stripMargin)),

    // K1: partitioned parquet sink roundtrip — write partitionBy, read the
    // partitioned layout back, aggregate; must equal the direct aggregate.
    Q("k1_partitioned_sink",
      (s, dir) => {
        val tmp = s"/tmp/graft_k1_${new java.io.File(dir).getName}"
        t(s, dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(tmp)
        s.read.parquet(tmp).groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_orderpriority""".stripMargin)),

    // K2: appending sink — overwrite one half, append the other, read the
    // union back; replaces the reference's read-concat-rewrite append
    // (etl/reviews_jsonl.py:57-73) with the native append mode.
    Q("k2_append_sink",
      (s, dir) => {
        val tmp = s"/tmp/graft_k2_${new java.io.File(dir).getName}"
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        o.where(pmod(col("o_orderkey"), lit(2)) === 0)
          .write.mode("overwrite").parquet(tmp)
        o.where(pmod(col("o_orderkey"), lit(2)) === 1)
          .write.mode("append").parquet(tmp)
        s.read.parquet(tmp).groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // F5: the crude plural stemmer (extra plurals appended so every rule
    // fires: boxes -> box, stories -> story, tiles -> til).
    Q("f5_stem",
      (s, dir) => t(s, dir, "part").where(col("p_partkey") < 500)
        .select(col("p_partkey"), concat_ws(" ", TextFunctions.stemTokensUdf(
          concat(col("p_name"), lit(" boxes stories tiles")))).as("stems")),
      Some(s"""SELECT p_partkey, array_to_string(
              |${stemSql("p_name || ' boxes stories tiles'")}, ' ') AS stems
              |FROM part WHERE p_partkey < 500""".stripMargin)),

    // F9: sorted-content-token substring containment — a name vs itself
    // minus its first token: containment holds iff the dropped token sorts
    // at the boundary, so the output mixes true and false.
    Q("f9_containment",
      (s, dir) => t(s, dir, "part").where(col("p_partkey") < 500)
        .withColumn("shorter", regexp_replace(col("p_name"), "^\\w+ ", ""))
        .select(col("p_partkey"),
          TextFunctions.hasSubstringUdf(col("p_name"), col("shorter"))
            .as("contained")),
      Some(s"""WITH w AS (
              |  SELECT p_partkey,
              |    ${contentJoinSql("p_name")} AS ca,
              |    ${contentJoinSql("regexp_replace(p_name, '^\\w+ ', '')")} AS cb
              |  FROM part WHERE p_partkey < 500)
              |SELECT p_partkey,
              |  CASE WHEN len(ca) <= len(cb)
              |    THEN len(ca) >= 3 AND contains(cb, ca)
              |    ELSE len(cb) >= 3 AND contains(ca, cb) END AS contained
              |FROM w""".stripMargin)),

    // F12: point-in-polygon ray cast over the customer lattice against a
    // pinned polygon; the oracle replays the reference formula edge by edge
    // (crossing-count parity), byte-identical arithmetic incl. the 1e-12
    // guard.
    Q("f12_point_in_polygon",
      (s, dir) => {
        val polyCol = array(testPolygon.map { case (la, lo) =>
          struct(lit(la).as("lat"), lit(lo).as("lon")) }: _*)
        custPoints(s, dir).select(col("c_custkey"),
          GeoFunctions.pointInPolygonUdf(col("lat"), col("lon"), polyCol)
            .as("inside"))
      },
      Some {
        val edges = testPolygon.indices.map { i =>
          val j = (i + testPolygon.length - 1) % testPolygon.length
          val (yi, xi) = testPolygon(i)
          val (yj, xj) = testPolygon(j)
          s"(${dLit(yi)}, ${dLit(xi)}, ${dLit(yj)}, ${dLit(xj)})"
        }.mkString(", ")
        s"""WITH pts AS ($custPointsSql),
           |edges(yi, xi, yj, xj) AS (VALUES $edges),
           |cr AS (
           |  SELECT c_custkey,
           |    sum(CASE WHEN ((xi > lon) <> (xj > lon)) AND
           |      (lat < (yj - yi) * (lon - xi) / ((xj - xi) + 1e-12) + yi)
           |      THEN 1 ELSE 0 END) AS crossings
           |  FROM pts CROSS JOIN edges GROUP BY c_custkey)
           |SELECT c_custkey, crossings % 2 = 1 AS inside FROM cr""".stripMargin
      }),

    // F18: first float-looking token from a dirty string (dirty strings
    // synthesized from integer arithmetic — doubles never round-trip
    // through strings), null when nothing matches.
    Q("f18_dirty_float",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 600)
        .withColumn("raw",
          when(pmod(col("c_custkey"), lit(11)) === 0, lit("no coordinates here"))
            .otherwise(concat(lit("approx "),
              pmod(col("c_custkey") * 13, lit(180)).cast("string"), lit("."),
              pmod(col("c_custkey"), lit(100)).cast("string"),
              lit("°N of map"))))
        .select(col("c_custkey"),
          graft.sources.Sources.dirtyFloatCol(col("raw")).as("val")),
      Some("""WITH w AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 11 = 0 THEN 'no coordinates here'
             |    ELSE 'approx ' || CAST(c_custkey * 13 % 180 AS VARCHAR) ||
             |      '.' || CAST(c_custkey % 100 AS VARCHAR) || '°N of map'
             |    END AS raw
             |  FROM customer WHERE c_custkey < 600)
             |SELECT c_custkey,
             |  CASE WHEN regexp_extract(raw, '-?\d+(\.\d+)?', 0) = '' THEN NULL
             |    ELSE CAST(regexp_extract(raw, '-?\d+(\.\d+)?', 0) AS DOUBLE)
             |  END AS val
             |FROM w""".stripMargin)),

    // End-to-end corpus cleaning — the flagship training-data composition:
    // quality gate -> language filter -> exact dedup (keep min id per
    // digest) -> MinHash-LSH near-dup removal (drop the higher id of every
    // verified pair). One declarative plan over the library operators; the
    // oracle replays every stage.
    Q("pipe_clean_corpus",
      (s, dir) => Pipelines.buildCleanCorpus(t(s, dir, "documents")),
      Some(s"""WITH toks0 AS ($toksSql),
              |scored AS (
              |  SELECT d.doc_id, d.text,
              |    ${qualitySql("d.text", "t.tk")} AS q,
              |    ${langIdCaseSql("t.tk")} AS pred_lang
              |  FROM documents d JOIN toks0 t ON d.doc_id = t.id),
              |gated AS (SELECT * FROM scored
              |          WHERE q >= 0.5 AND pred_lang = 'en'),
              |kept AS (
              |  SELECT doc_id, text, q, pred_lang FROM (
              |    SELECT *, row_number() OVER (PARTITION BY md5(text)
              |      ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1),
              |${lshDropsSqlFrom("kept")}
              |SELECT doc_id, pred_lang, q FROM kept
              |WHERE doc_id NOT IN (SELECT b_id FROM drops)""".stripMargin)),

    // The canonical LLM training-data pipeline as ONE oracle-checked plan:
    // quality + language + repetition gates -> exact dedup -> MinHash-LSH
    // near-dup removal -> benchmark decontamination (vs the doc_id < 10
    // probe set) -> deterministic per-source mixing -> PII-redacted
    // output (md5 of the redacted text proves the scrub end-to-end).
    // Every stage is the library operator; DuckDB replays all of them.
    Q("pipe_training_corpus",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        Pipelines.buildTrainingCorpus(docs,
          probes = docs.where(col("doc_id") < 10),
          mixWeights = (0 until 20).map(i =>
            s"src$i" -> (if (i % 2 == 0) 1.0 else 0.5)).toMap,
          seed = 11)
      },
      Some {
        val mixCase = (0 until 20).map(i =>
          s"WHEN 'src$i' THEN ${if (i % 2 == 0) 1000000 else 500000}")
          .mkString(" ")
        val redacted = TextAnalysis.PiiPatterns
          .foldLeft("text") { case (acc, (_, re, tag)) =>
            s"regexp_replace($acc, '$re', '$tag', 'g')"
          }
        s"""WITH toks0 AS ($toksSql),
           |scored AS (
           |  SELECT d.doc_id, d.text, d.source,
           |    ${qualitySql("d.text", "t.tk")} AS q,
           |    ${langIdCaseSql("t.tk")} AS pred_lang,
           |    round(1e0 - len(list_distinct(CASE WHEN len(t.tk) < 3
           |      THEN [array_to_string(t.tk, ' ')]
           |      ELSE list_transform(range(0, len(t.tk) - 2),
           |        i -> array_to_string(t.tk[i+1:i+3], ' ')) END))::DOUBLE /
           |      len(CASE WHEN len(t.tk) < 3
           |      THEN [array_to_string(t.tk, ' ')]
           |      ELSE list_transform(range(0, len(t.tk) - 2),
           |        i -> array_to_string(t.tk[i+1:i+3], ' ')) END), 6) AS rep
           |  FROM documents d JOIN toks0 t ON d.doc_id = t.id),
           |gated AS (SELECT * FROM scored
           |          WHERE q >= 0.5 AND pred_lang = 'en' AND rep <= 0.2),
           |kept AS (
           |  SELECT doc_id, text, source, q, pred_lang FROM (
           |    SELECT *, row_number() OVER (PARTITION BY md5(text)
           |      ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1),
           |${lshDropsSqlFrom("kept")},
           |psh AS (${shinglesSqlFrom(
              "(SELECT doc_id, text FROM documents WHERE doc_id < 10) prb")}),
           |ph1 AS (
           |  SELECT id, list_transform(sh, s -> ${h32Sql("s", "0")}) AS h1
           |  FROM psh),
           |contam AS (
           |  SELECT DISTINCT doc_id FROM (
           |    SELECT dg.id AS doc_id, pg.id AS probe_id
           |    FROM (SELECT id, unnest(h1) AS g FROM h1) dg
           |    JOIN (SELECT id, unnest(h1) AS g FROM ph1) pg USING (g)
           |    GROUP BY dg.id, pg.id HAVING count(*) >= 2)),
           |clean AS (
           |  SELECT * FROM kept
           |  WHERE doc_id NOT IN (SELECT b_id FROM drops)
           |    AND doc_id NOT IN (SELECT doc_id FROM contam)),
           |mixed AS (
           |  SELECT * FROM clean
           |  WHERE ${h32Sql("doc_id::VARCHAR", "11")} % 1000000 <
           |    CASE source $mixCase ELSE -1 END)
           |SELECT doc_id, source, pred_lang, q,
           |  md5($redacted) AS redacted_md5
           |FROM mixed""".stripMargin
      }),

    // The web-corpus pipeline STARTING FROM HTML — the shape a real crawl
    // feeds: render (fixture) -> jusText-shaped extraction -> quality +
    // language gates over the EXTRACTED text -> exact dedup -> MinHash-LSH
    // near-dup removal. Extraction is a codegen'd map fused into the scan
    // stage, so the front end adds zero shuffles to pipe_clean_corpus's
    // plan; both engines render and extract independently.
    Q("pipe_html_corpus",
      (s, dir) => Pipelines.buildHtmlCorpus(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          synthHtmlCol(col("doc_id"), col("text")).as("html"))),
      Some(s"""WITH hraw AS (SELECT doc_id, source, $synthHtmlSql AS html
              |            FROM documents),
              |hx AS (SELECT doc_id, source,
              |       ${htmlExtractSql("html")} AS text FROM hraw),
              |toks0 AS (${toksSqlFrom("hx")}),
              |scored AS (
              |  SELECT d.doc_id, d.text, d.source,
              |    ${qualitySql("d.text", "t.tk")} AS q,
              |    ${langIdCaseSql("t.tk")} AS pred_lang
              |  FROM hx d JOIN toks0 t ON d.doc_id = t.id),
              |gated AS (SELECT * FROM scored
              |          WHERE q >= 0.5 AND pred_lang = 'en'),
              |kept AS (
              |  SELECT doc_id, text, source, q, pred_lang FROM (
              |    SELECT *, row_number() OVER (PARTITION BY md5(text)
              |      ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1),
              |${lshDropsSqlFrom("kept")}
              |SELECT doc_id, source, pred_lang, q FROM kept
              |WHERE doc_id NOT IN (SELECT b_id FROM drops)""".stripMargin)),

    // The C4-shaped curation recipe end to end over the 4-token-line
    // corpus: corpus-wide line dedup -> Gopher rule gate on the REBUILT
    // text (stopword floor 1: the synthetic vocabulary carries only
    // 'the' from the required list) -> exact dedup -> MinHash-LSH
    // near-dup removal. Every stage is the library operator; the oracle
    // composes the same shared CTE chains the per-stage rows use.
    Q("pipe_c4_corpus",
      (s, dir) => Pipelines.buildC4Corpus(linedDocs(s, dir),
        minLineLen = 10, minWords = 50, minStopHits = 1),
      Some(s"""WITH $lineDedupCtes,
              |c4t AS (${toksSqlFrom("lined_docs")}),
              |${gopherCtes("c4t")},
              |gated AS (
              |  SELECT gf.doc_id, ld.text, ld.n_lines, ld.n_dropped,
              |         gf.n_words
              |  FROM gf JOIN lined_docs ld USING (doc_id)
              |  WHERE ${gopherKeepSql(50, 1)}),
              |kept AS (
              |  SELECT doc_id, text, n_lines, n_dropped, n_words FROM (
              |    SELECT *, row_number() OVER (PARTITION BY md5(text)
              |      ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1),
              |${lshDropsSqlFrom("kept")}
              |SELECT doc_id, n_lines, n_dropped, n_words,
              |       md5(text) AS text_md5
              |FROM kept WHERE doc_id NOT IN (SELECT b_id FROM drops)"""
        .stripMargin)),

    // Multimodal REAL decode roundtrip: per-doc PCM WAV payloads are
    // synthesized from closed-form parameters, decoded by the RIFF header
    // parser (genuine byte-level decode, no codec libs), and the oracle
    // recomputes the parameters arithmetically — decode(synth(p)) == p.
    Q("mm_wav_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val channels = (id % 2 + 1).toInt
            val rate = 8000 + (id % 3).toInt * 4000
            val n = (id % 50 + 10).toInt
            val samples = (0 until n * channels)
              .map(i => (((id * 31 + i * 7) % 65536) - 32768).toShort)
            (id, Multimodal.wavSynth(channels, rate, samples))
          }.toDF("doc_id", "payload")
        Multimodal.extractWavMeta(payloads, "doc_id", "payload").toDF()
          .select("doc_id", "n_bytes", "channels", "sample_rate",
            "bits_per_sample", "n_samples", "duration_ms")
      },
      Some("""SELECT doc_id,
             |  44 + (doc_id % 50 + 10) * (doc_id % 2 + 1) * 2 AS n_bytes,
             |  CAST(doc_id % 2 + 1 AS INT) AS channels,
             |  CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
             |  CAST(16 AS INT) AS bits_per_sample,
             |  doc_id % 50 + 10 AS n_samples,
             |  ((doc_id % 50 + 10) * 1000) // (8000 + (doc_id % 3) * 4000)
             |    AS duration_ms
             |FROM documents""".stripMargin)),

    // REAL audio transform: decimate the synthesized PCM by 2 (keep every
    // other frame, halve the rate), re-encode, and read the metadata +
    // first-channel sample sum back from the RE-ENCODED bytes. Oracle is
    // the closed form of which source samples survive.
    Q("mm_wav_resample",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val channels = (id % 2 + 1).toInt
            val rate = 8000 + (id % 3).toInt * 4000
            val n = (id % 50 + 10).toInt
            val samples = (0 until n * channels)
              .map(i => (((id * 31 + i * 7) % 65536) - 32768).toShort)
            (id, Multimodal.wavSynth(channels, rate, samples))
          }.toDF("doc_id", "payload")
        Multimodal.extractWavDownsampled(payloads, "doc_id", "payload",
            factor = 2).toDF()
          .select("doc_id", "n_bytes", "sample_rate", "n_samples", "ch_sum")
      },
      Some("""SELECT doc_id,
             |  44 + ((doc_id % 50 + 10 + 1) // 2) * (doc_id % 2 + 1) * 2
             |    AS n_bytes,
             |  CAST((8000 + (doc_id % 3) * 4000) // 2 AS INT) AS sample_rate,
             |  (doc_id % 50 + 10 + 1) // 2 AS n_samples,
             |  CAST(list_sum(list_transform(
             |    range(0, (doc_id % 50 + 10 + 1) // 2),
             |    j -> ((doc_id * 31 + 2 * j * (doc_id % 2 + 1) * 7) % 65536)
             |      - 32768)) AS BIGINT) AS ch_sum
             |FROM documents""".stripMargin)),

    // §2.10: gap-based sessionization — the flatMapGroupsWithState
    // operator's batch path, hash-verified against a lag/cumulative-sum
    // sessionizer in SQL (same (ts, event_type) fold order, same ms gap
    // arithmetic; session stats are tie-permutation invariant).
    Q("st_sessionize",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val ev = t(s, dir, "events")
          .selectExpr("user_id", "ts", "event_type", "value")
          .as[graft.streaming.Sessionize.Event]
        graft.streaming.Sessionize.sessionize(ev, gapMs = 60 * 60 * 1000L)
          .toDF()
          .select(col("user_id"),
            unix_timestamp(col("session_start")).as("start_s"),
            unix_timestamp(col("session_end")).as("end_s"),
            col("n_events"),
            round(col("total_value"), 2).as("total_value"))
      },
      Some("""WITH x AS (
             |  SELECT user_id, ts, event_type, value,
             |    CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER
             |        (PARTITION BY user_id ORDER BY ts, event_type) > 3600000
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events),
             |s AS (
             |  SELECT *, sum(brk) OVER (PARTITION BY user_id
             |    ORDER BY ts, event_type ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM x),
             |g AS (SELECT user_id, sid, min(ts) AS t0, max(ts) AS t1,
             |        count(*) AS n, sum(value) AS tv
             |      FROM s GROUP BY user_id, sid)
             |SELECT user_id, epoch_ms(t0) // 1000 AS start_s,
             |  epoch_ms(t1) // 1000 AS end_s, CAST(n AS INT) AS n_events,
             |  round(tv, 2) AS total_value
             |FROM g""".stripMargin)),

    // Skew-handling primitive under the oracle: two-stage salted distinct
    // count — result-identical to countDistinct, but the distinct state is
    // bounded per (key, salt) group instead of per hot key.
    Q("sk_salted_distinct",
      (s, dir) => Skew.saltedDistinctCount(t(s, dir, "lineitem"),
        "l_orderkey", "l_suppkey", saltFactor = 8),
      Some("""SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_distinct
             |FROM lineitem GROUP BY l_orderkey""".stripMargin)),

    // Salted equi-join under the oracle: result-identical to the plain
    // join (the oracle IS the plain join), with the hot-key spread and
    // duplicate-row salt dispersion asserted in SkewSpec.
    Q("sk_salted_join",
      (s, dir) => Skew.saltedJoin(
        t(s, dir, "lineitem").select(col("l_orderkey").as("okey"),
          col("l_partkey"), col("l_quantity")),
        t(s, dir, "orders").select(col("o_orderkey").as("okey"),
          col("o_orderpriority")),
        "okey", saltFactor = 8),
      Some("""SELECT l_orderkey AS okey, l_partkey, l_quantity,
             |  o_orderpriority
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey"""
        .stripMargin)),

    // TPC-H q6 forecast-revenue-change shape through spark.sql
    Q("q6_forecast_revenue",
      (s, dir) => {
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
        s.sql("""
          SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
                 count(*) AS n
          FROM lineitem
          WHERE l_discount >= 5e-2 AND l_discount <= 7e-2
            AND l_quantity < 24""")
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
             |  count(*) AS n
             |FROM lineitem
             |WHERE l_discount >= 5e-2 AND l_discount <= 7e-2
             |  AND l_quantity < 24""".stripMargin)),

    // F20: newline normalization (CRLF/CR -> LF) + line count
    Q("f20_newline_normalize",
      (s, dir) => t(s, dir, "customer").where(col("c_custkey") < 400)
        .withColumn("raw", concat(lit("line1\r\nline2\r"), col("c_name"),
          lit("\nline4")))
        .withColumn("norm", regexp_replace(col("raw"), "\r\n|\r", "\n"))
        .select(col("c_custkey"), col("norm"),
          size(split(col("norm"), "\n", -1)).as("n_lines")),
      Some("""WITH w AS (
             |  SELECT c_custkey, regexp_replace(
             |    'line1' || chr(13) || chr(10) || 'line2' || chr(13) ||
             |      c_name || chr(10) || 'line4',
             |    '\r\n|\r', chr(10), 'g') AS norm
             |  FROM customer WHERE c_custkey < 400)
             |SELECT c_custkey, norm,
             |  CAST(len(string_split(norm, chr(10))) AS INT) AS n_lines
             |FROM w""".stripMargin)),

    // The reference's WHOLE dataflow as ONE oracle-checked plan
    // (`/root/reference/scripts/run_all.py:71-178` staging -> ER -> exports;
    // `neo4j_cypher/11` NEAR edges -> `12` popularity z -> `13b` review
    // lift -> `20` POI cards): city cascade (polygon > bbox > radius, list-
    // order tie-breaks) -> distance guard -> ER candidate pairs -> banded
    // acceptance (the SQL-expressible g1 proxy, so DuckDB can replay it;
    // the rapidfuzz-kernel rule is pinned separately by g1's specs) ->
    // connected components -> canonical mint (norm_name) -> review lift ->
    // listings_nearby counts -> per-city popularity z + flags -> capped
    // nested POI cards. Every stage is the library operator, composed.
    Q("pipe_kg_etl",
      (s, dir) => {
        val cities = t(s, dir, "region")
          .select(col("r_regionkey").cast("string").as("slug"),
            concat(lit("city-"), col("r_regionkey").cast("string")).as("name"),
            (lit(40.0) + col("r_regionkey") * 0.04).as("center_lat"),
            lit(-74.95).as("center_lon"),
            lit(3.0).as("radius_km"),
            col("r_regionkey").cast("long").as("city_order"))
          .withColumn("min_lat", col("center_lat") - 0.01)
          .withColumn("max_lat", col("center_lat") + 0.01)
          .withColumn("min_lon", col("center_lon") - 0.02)
          .withColumn("max_lon", col("center_lon") + 0.02)
          .withColumn("polygon", array(
            struct((col("center_lat") + 0.008).as("lat"), col("center_lon").as("lon")),
            struct(col("center_lat").as("lat"), (col("center_lon") + 0.016).as("lon")),
            struct((col("center_lat") - 0.008).as("lat"), col("center_lon").as("lon")),
            struct(col("center_lat").as("lat"), (col("center_lon") - 0.016).as("lon"))))
        val places = custPoints(s, dir).select(
          col("c_custkey").as("place_id"), col("c_name").as("name"),
          col("lat"), col("lon"))
        // staging: cascade assignment + distance guard (G4/P6)
        val assigned = CityAssignment.assign(places, cities, hintCol = None)
          .where(col("city_slug").isNotNull)
        // members feeds three branches (ER edges, reviews, listings) —
        // materialize once instead of replaying the cascade per branch
        val members = CityAssignment.distanceGuard(assigned, cities, maxKm = 2.5)
          .select("place_id", "name", "lat", "lon", "city_slug")
          .localCheckpoint()
        // ER: grid-blocked candidates, banded acceptance, components, mint
        val pairs = SpatialJoins.gridSelfJoin(members, "place_id", "lat", "lon",
          radiusM = 200.0, extraKeys = Seq("city_slug"))
        val links = pairs
          .join(members.select(col("place_id").as("a_id"),
            col("name").as("a_name")), "a_id")
          .join(members.select(col("place_id").as("b_id"),
            col("name").as("b_name")), "b_id")
          .withColumn("sim", TextFunctions.levRatioCol(col("a_name"), col("b_name")))
          .where(col("sim") >= 0.9 ||
            (col("sim") >= 0.85 && col("meters") <= 200.0) ||
            (col("sim") >= 0.8 && col("meters") <= 180.0))
          // carry the city: both endpoints share it (grid join co-key), and
          // it routes canonicalMapFromLinks onto the single-shuffle
          // per-city union-find instead of the iterative CC fixpoint
          .select(col("a_id").as("a"), col("b_id").as("b"),
            col("a_city_slug").as("city_slug"))
        val cmap = EntityResolution.canonicalMapFromLinks(members, links)
        val memberCanon = members.drop("city_slug")
          .join(cmap, col("place_id") === col("source_place_id"))
          .select(col("place_id"), col("lat"), col("lon"),
            col("canonical_id"), col("canonical_name"), col("city_slug"))
          .localCheckpoint()
        // review lift (G6 / cypher 13b): orders play the review role
        val wq = Window.partitionBy("canonical_id")
          .orderBy(length(col("o_orderpriority")).desc, col("o_orderkey").asc)
        val revAgg = t(s, dir, "orders")
          .join(memberCanon, col("o_custkey") === col("place_id"))
          .withColumn("rn", row_number().over(wq))
          .groupBy("canonical_id")
          .agg(count(lit(1)).as("n_reviews"),
            round(sum("o_totalprice"), 2).as("revenue"),
            array_join(transform(array_sort(collect_list(
              when(col("rn") <= 2, struct(col("rn"),
                substring(col("o_orderpriority"), 1, 120).as("txt"))))),
              x => x.getField("txt")), " | ").as("quotes"))
        // listings_nearby (§3.3 / cypher 11+12): NEAR suppliers per canonical
        val listAgg = SpatialJoins.gridWithinJoin(
            memberCanon, suppPoints(s, dir),
            "place_id", "s_suppkey", thresholdM = 300.0)
          .join(memberCanon.select("place_id", "canonical_id"), "place_id")
          .groupBy("canonical_id")
          .agg(countDistinct("s_suppkey").as("listings_nearby"))
        val base = memberCanon
          .groupBy("canonical_id", "canonical_name", "city_slug")
          .agg(count(lit(1)).as("n_members"))
          .join(revAgg, Seq("canonical_id"), "left")
          .join(listAgg, Seq("canonical_id"), "left")
          .withColumn("n_reviews", coalesce(col("n_reviews"), lit(0L)))
          .withColumn("revenue", coalesce(col("revenue"), lit(0.0)))
          .withColumn("quotes", coalesce(col("quotes"), lit("")))
          .withColumn("listings_nearby", coalesce(col("listings_nearby"), lit(0L)))
        // popularity z + flag per city (cypher 12)
        val wz = Window.partitionBy("city_slug")
        val mu = avg(col("listings_nearby").cast("double")).over(wz)
        val sd = stddev_samp(col("listings_nearby").cast("double")).over(wz)
        base.withColumn("z",
            round(when(sd === 0 || sd.isNull, 0.0)
              .otherwise((col("listings_nearby") - mu) / sd), 4) + 0.0)
          .withColumn("flag", when(col("z") >= 1.0, "high")
            .when(col("z") >= 0.0, "medium").otherwise("low"))
          .select("canonical_id", "canonical_name", "city_slug", "n_members",
            "n_reviews", "revenue", "listings_nearby", "z", "flag", "quotes")
      },
      Some(s"""WITH RECURSIVE
              |cities AS (
              |  SELECT r_regionkey AS city_id,
              |    CAST(r_regionkey AS VARCHAR) AS slug,
              |    40e0 + r_regionkey * 4e-2 AS center_lat,
              |    -7.495e1 AS center_lon FROM region),
              |pts AS ($custPointsSql),
              |verts AS (
              |  SELECT city_id, center_lat, center_lon, v,
              |    CASE v WHEN 0 THEN center_lat + 8e-3 WHEN 1 THEN center_lat
              |           WHEN 2 THEN center_lat - 8e-3 ELSE center_lat END AS vy,
              |    CASE v WHEN 0 THEN center_lon WHEN 1 THEN center_lon + 1.6e-2
              |           WHEN 2 THEN center_lon ELSE center_lon - 1.6e-2 END AS vx
              |  FROM cities, (SELECT unnest(range(0, 4)) AS v)),
              |pedges AS (
              |  SELECT a.city_id, a.vy AS yi, a.vx AS xi, b.vy AS yj, b.vx AS xj
              |  FROM verts a JOIN verts b
              |    ON a.city_id = b.city_id AND b.v = (a.v + 3) % 4),
              |poly AS (
              |  SELECT p.c_custkey, e.city_id,
              |    sum(CASE WHEN ((xi > p.lon) <> (xj > p.lon)) AND
              |      (p.lat < (yj - yi) * (p.lon - xi) / ((xj - xi) + 1e-12) + yi)
              |      THEN 1 ELSE 0 END) % 2 = 1 AS in_poly
              |  FROM pts p CROSS JOIN pedges e GROUP BY p.c_custkey, e.city_id),
              |cand AS (
              |  SELECT p.c_custkey, c.city_id, c.slug, poly.in_poly,
              |    (lat >= center_lat - 1e-2 AND lat <= center_lat + 1e-2 AND
              |     lon >= center_lon - 2e-2 AND lon <= center_lon + 2e-2) AS in_bbox,
              |    ${havSql("lat", "lon", "center_lat", "center_lon")} AS center_m
              |  FROM pts p CROSS JOIN cities c
              |  JOIN poly ON poly.c_custkey = p.c_custkey
              |    AND poly.city_id = c.city_id),
              |ruled AS (
              |  SELECT *, CASE WHEN in_poly THEN 1 WHEN in_bbox THEN 2
              |    WHEN center_m <= 3e3 THEN 3 END AS rule
              |  FROM cand WHERE in_poly OR in_bbox OR center_m <= 3e3),
              |ranked AS (SELECT *, row_number() OVER (PARTITION BY c_custkey
              |  ORDER BY rule ASC,
              |    CASE WHEN rule = 3 THEN center_m ELSE 0e0 END ASC,
              |    city_id ASC) AS rn FROM ruled),
              |members AS (
              |  SELECT r.c_custkey AS place_id, p.c_name AS name,
              |    p.lat, p.lon, r.slug AS city_slug
              |  FROM ranked r JOIN pts p ON r.c_custkey = p.c_custkey
              |  WHERE r.rn = 1 AND r.center_m <= 25e2),
              |links AS (
              |  SELECT a.place_id AS src, b.place_id AS dst
              |  FROM members a JOIN members b
              |    ON a.city_slug = b.city_slug AND a.place_id < b.place_id
              |  WHERE ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0
              |    AND (1.0 - levenshtein(a.name, b.name) /
              |           greatest(length(a.name), length(b.name)) >= 0.9
              |      OR (1.0 - levenshtein(a.name, b.name) /
              |           greatest(length(a.name), length(b.name)) >= 0.85
              |          AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0)
              |      OR (1.0 - levenshtein(a.name, b.name) /
              |           greatest(length(a.name), length(b.name)) >= 0.8
              |          AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 180.0))),
              |sym AS (
              |  SELECT src AS u, dst AS v FROM links
              |  UNION SELECT dst, src FROM links
              |  UNION SELECT src, src FROM links
              |  UNION SELECT dst, dst FROM links),
              |reach AS (
              |  SELECT u, v FROM sym
              |  UNION SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
              |comps AS (SELECT u AS place_id, min(v) AS component
              |          FROM reach GROUP BY u),
              |withcomp AS (
              |  SELECT m.*, coalesce(c.component, m.place_id) AS component
              |  FROM members m LEFT JOIN comps c ON m.place_id = c.place_id),
              |canonpick AS (
              |  SELECT *, row_number() OVER (PARTITION BY component
              |    ORDER BY length(name) DESC, name ASC, place_id ASC) AS rn,
              |    regexp_replace(regexp_replace(lower(trim(name)),
              |      '\\s+', '-', 'g'), '[^a-z0-9\\-:_.,]+', '', 'g') AS nslug
              |  FROM withcomp),
              |canon AS (
              |  SELECT component, name AS canonical_name,
              |    CASE WHEN length(nslug) > 0 AND city_slug IS NOT NULL
              |      THEN nslug || '::' || city_slug END AS canonical_id
              |  FROM canonpick WHERE rn = 1),
              |membercanon AS (
              |  SELECT w.place_id, w.lat, w.lon, w.city_slug,
              |    c.canonical_id, c.canonical_name
              |  FROM withcomp w JOIN canon c ON w.component = c.component),
              |revrn AS (
              |  SELECT mc.canonical_id, o.o_orderpriority, o.o_totalprice,
              |    row_number() OVER (PARTITION BY mc.canonical_id
              |      ORDER BY length(o.o_orderpriority) DESC, o.o_orderkey ASC) AS rn
              |  FROM orders o JOIN membercanon mc ON o.o_custkey = mc.place_id),
              |revagg AS (
              |  SELECT canonical_id, count(*) AS n_reviews,
              |    round(sum(o_totalprice), 2) AS revenue,
              |    string_agg(CASE WHEN rn <= 2 THEN substr(o_orderpriority, 1, 120) END,
              |      ' | ' ORDER BY rn) AS quotes
              |  FROM revrn GROUP BY canonical_id),
              |sup AS ($suppPointsSql),
              |listagg AS (
              |  SELECT mc.canonical_id,
              |    count(DISTINCT s.s_suppkey) AS listings_nearby
              |  FROM membercanon mc JOIN sup s
              |    ON ${havSql("mc.lat", "mc.lon", "s.lat", "s.lon")} <= 300.0
              |  GROUP BY mc.canonical_id),
              |base AS (
              |  SELECT d.canonical_id, d.canonical_name, d.city_slug,
              |    d.n_members,
              |    coalesce(r.n_reviews, 0) AS n_reviews,
              |    coalesce(r.revenue, 0e0) AS revenue,
              |    coalesce(r.quotes, '') AS quotes,
              |    coalesce(l.listings_nearby, 0) AS listings_nearby
              |  FROM (SELECT canonical_id, canonical_name, city_slug,
              |          count(*) AS n_members
              |        FROM membercanon GROUP BY 1, 2, 3) d
              |  LEFT JOIN revagg r ON d.canonical_id = r.canonical_id
              |  LEFT JOIN listagg l ON d.canonical_id = l.canonical_id),
              |zed AS (
              |  SELECT *, round(CASE
              |      WHEN stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w = 0
              |        OR stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w
              |          IS NULL THEN 0.0
              |      ELSE (CAST(listings_nearby AS DOUBLE) -
              |        avg(CAST(listings_nearby AS DOUBLE)) OVER w) /
              |        stddev_samp(CAST(listings_nearby AS DOUBLE)) OVER w
              |      END, 4) + 0e0 AS z
              |  FROM base WINDOW w AS (PARTITION BY city_slug))
              |SELECT canonical_id, canonical_name, city_slug, n_members,
              |  n_reviews, revenue, listings_nearby, z,
              |  CASE WHEN z >= 1.0 THEN 'high' WHEN z >= 0.0 THEN 'medium'
              |    ELSE 'low' END AS flag, quotes
              |FROM zed""".stripMargin)),

    // K9: the reference loader's EXACT Wikivoyage place rows — the
    // name/lat/lon presence gate and the composite place_id mint
    // `wv:{slug(title)}:{slug(name)}:{lat:.5f},{lon:.5f}` of
    // wikivoyage_xml.py:72-76,171-211 (slug: strip/lower, whitespace->'-',
    // drop chars outside [a-z0-9-:_.,], cap 120; 'Café' exercises the
    // accent-drop since slug does NOT deaccent). Listing fields are driven
    // from part columns (the parse step itself is oracle-gated by
    // s4/s5 and kernel-spec'd); every 7th row loses lat -> gated out.
    Q("k9_wv_places",
      (s, dir) => {
        def slugWv(c: Column): Column = substring(
          regexp_replace(regexp_replace(lower(trim(c)), "\\s+", "-"),
            "[^a-z0-9\\-:_.,]+", ""), 1, 120)
        def fmt5(c: Column): Column = format_string("%.5f", c)
        t(s, dir, "part")
          .withColumn("title",
            concat(lit("City "), pmod(col("p_partkey"), lit(25)).cast("string")))
          .withColumn("tpl",
            when(pmod(col("p_partkey"), lit(3)) === 0, lit("see"))
              .when(pmod(col("p_partkey"), lit(3)) === 1, lit("eat"))
              .otherwise(lit("sleep")))
          .withColumn("nm", concat(lit("Café "), col("p_name")))
          .withColumn("lat",
            when(pmod(col("p_partkey"), lit(7)) === 0, lit(null).cast("double"))
              .otherwise(lit(40.0003) +
                (col("p_partkey") % 97).cast("double") * 0.002))
          .withColumn("lon", lit(-75.0) +
            pmod(floor(col("p_partkey") / 97.0), lit(89.0)) * 0.002)
          .where(col("nm").isNotNull && col("nm") =!= "" &&
            col("lat").isNotNull && col("lon").isNotNull)
          .select(
            concat(lit("wv:"), slugWv(col("title")), lit(":"), slugWv(col("nm")),
              lit(":"), fmt5(col("lat")), lit(","), fmt5(col("lon")))
              .as("place_id"),
            lit("wikivoyage").as("source"), col("nm").as("name"),
            col("lat"), col("lon"), col("tpl").as("type"),
            col("title").as("city_hint"))
      },
      Some("""WITH base AS (
             |  SELECT 'City ' || CAST(p_partkey % 25 AS VARCHAR) AS title,
             |    CASE CAST(p_partkey % 3 AS INTEGER) WHEN 0 THEN 'see'
             |      WHEN 1 THEN 'eat' ELSE 'sleep' END AS tpl,
             |    'Café ' || p_name AS nm,
             |    CASE WHEN p_partkey % 7 = 0 THEN NULL
             |      ELSE 4.00003e1 + (p_partkey % 97) * 2e-3 END AS lat,
             |    -75e0 + (floor(p_partkey / 97e0) % 89e0) * 2e-3 AS lon
             |  FROM part),
             |slugged AS (
             |  SELECT *,
             |    substr(regexp_replace(regexp_replace(lower(trim(title)),
             |      '\s+', '-', 'g'), '[^a-z0-9\-:_.,]+', '', 'g'), 1, 120) AS ts,
             |    substr(regexp_replace(regexp_replace(lower(trim(nm)),
             |      '\s+', '-', 'g'), '[^a-z0-9\-:_.,]+', '', 'g'), 1, 120) AS ns
             |  FROM base)
             |SELECT 'wv:' || ts || ':' || ns || ':' || printf('%.5f', lat)
             |    || ',' || printf('%.5f', lon) AS place_id,
             |  'wikivoyage' AS source, nm AS name, lat, lon, tpl AS type,
             |  title AS city_hint
             |FROM slugged
             |WHERE nm IS NOT NULL AND nm <> '' AND lat IS NOT NULL
             |  AND lon IS NOT NULL""".stripMargin)),

    // K12: snapshot diff (CDC extraction) — the inverse of K11's MERGE:
    // recover the added/removed/changed/unchanged delta between two full
    // snapshots with one full-outer key join and a null-safe struct
    // compare. The "new" snapshot drops every 11th key, bumps every 7th
    // balance, and mints keys from every 13th.
    Q("k12_snapshot_diff",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal")
        val newSnap = c.where(pmod(col("c_custkey"), lit(11)) =!= 0)
          .withColumn("c_acctbal",
            when(pmod(col("c_custkey"), lit(7)) === 0,
              col("c_acctbal") + 10.0).otherwise(col("c_acctbal")))
          .unionByName(c.where(pmod(col("c_custkey"), lit(13)) === 0)
            .select((col("c_custkey") + 1000000).as("c_custkey"),
              concat(lit("new-"), col("c_custkey").cast("string"))
                .as("c_name"),
              lit(0.0).as("c_acctbal")))
        Sources.snapshotDiff(c, newSnap, "c_custkey")
      },
      Some("""WITH c AS (
             |  SELECT c_custkey, c_name, c_acctbal FROM customer),
             |n AS (
             |  SELECT c_custkey, c_name,
             |    CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 1e1
             |      ELSE c_acctbal END AS c_acctbal
             |  FROM c WHERE c_custkey % 11 <> 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000,
             |    'new-' || CAST(c_custkey AS VARCHAR), 0e0
             |  FROM c WHERE c_custkey % 13 = 0)
             |SELECT coalesce(n.c_custkey, o.c_custkey) AS c_custkey,
             |  CASE WHEN o.c_custkey IS NULL THEN 'added'
             |    WHEN n.c_custkey IS NULL THEN 'removed'
             |    WHEN o.c_name IS NOT DISTINCT FROM n.c_name
             |      AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal
             |      THEN 'unchanged'
             |    ELSE 'changed' END AS change,
             |  o.c_name AS old_c_name, o.c_acctbal AS old_c_acctbal,
             |  n.c_name AS new_c_name, n.c_acctbal AS new_c_acctbal
             |FROM c o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey"""
        .stripMargin)),

    // K11: copy-on-write MERGE upsert — the reference's Cypher
    // never-clobber-with-null upsert discipline as a batch parquet op
    // (SURVEY G5's extension point): matched keys coalesce per column
    // (the null c_name update must NOT erase the existing name),
    // update-only keys insert, target-only keys carry through.
    // SCD Type-2 dimension versioning — the warehouse history operator
    // completing the merge family (k11 overwrites in place, k12 reports
    // the diff; SCD2 keeps every version). Fixture: the customer dim all
    // open at ts 0, then a backfilled new-key wave (ts 5), a change wave
    // (ts 10), a no-op/revert wave (ts 15 — no-op for keys it leaves
    // unchanged, a REAL new version where it reverts a ts-10 change),
    // and a second change wave (ts 20). One per-key window pass; the
    // oracle replays the lag-based no-op drop and lead-based intervals.
    Q("k13_scd2",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select("c_custkey", "c_nationkey", "c_acctbal")
        val hist = cust
          .withColumn("valid_from", lit(0L))
          .withColumn("valid_to", lit(null).cast("long"))
        def wave(m: Int, dn: Int, ts: Long, shift: Long = 0L) =
          cust.where(pmod(col("c_custkey"), lit(m)) === 0)
            .select((col("c_custkey") + shift).as("c_custkey"),
              (col("c_nationkey") + dn).as("c_nationkey"),
              col("c_acctbal"), lit(ts).as("ts"))
        val updates = wave(9, 0, 5L, shift = 1000000L)
          .unionByName(wave(4, 1, 10L))
          .unionByName(wave(6, 0, 15L))
          .unionByName(wave(8, 2, 20L))
        Sources.scd2Apply(hist, updates, "c_custkey", "ts",
          Seq("c_nationkey", "c_acctbal"))
      },
      Some("""WITH cust AS (
             |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer),
             |allv AS (
             |  SELECT c_custkey, c_nationkey, c_acctbal, 0 AS ts FROM cust
             |  UNION ALL SELECT c_custkey + 1000000, c_nationkey,
             |    c_acctbal, 5 FROM cust WHERE c_custkey % 9 = 0
             |  UNION ALL SELECT c_custkey, c_nationkey + 1, c_acctbal, 10
             |    FROM cust WHERE c_custkey % 4 = 0
             |  UNION ALL SELECT c_custkey, c_nationkey, c_acctbal, 15
             |    FROM cust WHERE c_custkey % 6 = 0
             |  UNION ALL SELECT c_custkey, c_nationkey + 2, c_acctbal, 20
             |    FROM cust WHERE c_custkey % 8 = 0),
             |lg AS (
             |  SELECT *, lag(c_nationkey) OVER w AS pn,
             |    lag(c_acctbal) OVER w AS pa, row_number() OVER w AS rn
             |  FROM allv
             |  WINDOW w AS (PARTITION BY c_custkey
             |               ORDER BY ts, c_nationkey, c_acctbal)),
             |chg AS (
             |  SELECT * FROM lg WHERE rn = 1 OR NOT
             |    (c_nationkey IS NOT DISTINCT FROM pn
             |     AND c_acctbal IS NOT DISTINCT FROM pa)),
             |v AS (
             |  SELECT c_custkey, c_nationkey, c_acctbal,
             |    ts AS valid_from,
             |    lead(ts) OVER (PARTITION BY c_custkey
             |                   ORDER BY ts, c_nationkey, c_acctbal)
             |      AS valid_to
             |  FROM chg)
             |SELECT c_custkey, c_nationkey, c_acctbal,
             |  CAST(valid_from AS BIGINT) AS valid_from,
             |  CAST(valid_to AS BIGINT) AS valid_to,
             |  valid_to IS NULL AS is_current
             |FROM v""".stripMargin)),

    Q("k11_merge_upsert",
      (s, dir) => {
        val base = s"/tmp/graft_merge_base_${new java.io.File(dir).getName}"
        val out = s"/tmp/graft_merge_out_${new java.io.File(dir).getName}"
        val target = t(s, dir, "customer")
          .select("c_custkey", "c_name", "c_acctbal")
        target.write.mode("overwrite").parquet(base)
        val updates = target.where(pmod(col("c_custkey"), lit(10)) === 0)
          .select(col("c_custkey"), lit(null).cast("string").as("c_name"),
            (col("c_acctbal") + 1000.0).as("c_acctbal"))
          .unionByName(target.where(pmod(col("c_custkey"), lit(7)) === 0)
            .select((col("c_custkey") + 1000000L).as("c_custkey"),
              concat(lit("new-"), col("c_custkey").cast("string")).as("c_name"),
              lit(0.0).as("c_acctbal")))
        Sources.mergeParquet(s, base, updates, "c_custkey", out)
        s.read.parquet(out)
      },
      Some("""WITH t AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
             |upd AS (
             |  SELECT c_custkey, CAST(NULL AS VARCHAR) AS c_name,
             |    c_acctbal + 1e3 AS c_acctbal
             |  FROM t WHERE c_custkey % 10 = 0
             |  UNION ALL
             |  SELECT c_custkey + 1000000, 'new-' || CAST(c_custkey AS VARCHAR),
             |    0e0
             |  FROM t WHERE c_custkey % 7 = 0)
             |SELECT coalesce(u.c_custkey, t.c_custkey) AS c_custkey,
             |  coalesce(u.c_name, t.c_name) AS c_name,
             |  coalesce(u.c_acctbal, t.c_acctbal) AS c_acctbal
             |FROM t FULL OUTER JOIN upd u ON t.c_custkey = u.c_custkey"""
        .stripMargin)),

    // DS: deterministic IMPORTANCE sampling — keep probability scales
    // with a per-doc weight (here length-derived, capped), decided by the
    // doc's stable hash bucket, so the sample is reproducible across
    // runs/layouts and appends never resample old docs. The threshold is
    // kept in exact integer space (min(n_chars,2000)*5 of 10000) so both
    // engines compare identical integers — no double boundary rounding.
    Q("ds_weighted_sample",
      (s, dir) => {
        val bucket = pmod(
          Dedup.md5Hash32(col("doc_id").cast("string"), lit(7)), lit(10000L))
        t(s, dir, "documents")
          .withColumn("bucket", bucket)
          .where(col("bucket") < least(col("n_chars"), lit(2000L)) * 5)
          .select(col("doc_id"), col("n_chars"), col("bucket"))
      },
      Some(s"""SELECT doc_id, n_chars,
              |  ${h32Sql("CAST(doc_id AS VARCHAR)", "7")} % 10000 AS bucket
              |FROM documents
              |WHERE ${h32Sql("CAST(doc_id AS VARCHAR)", "7")} % 10000 <
              |  least(n_chars, 2000) * 5""".stripMargin)),

    // MM: FULL PNG pixel decode — payloads are real PNGs (zlib-deflated
    // IDAT, row filters cycling through None/Sub/Up/Average/Paeth since
    // every height >= 5), decoded back through chunk-CRC walk + inflate +
    // unfilter; the checksum reads the DECODED pixels, so the oracle's
    // closed form over the synthesis parameters proves the whole
    // compressed-pixel path. (JPEG entropy decode remains the one
    // declared stub — PNG left the stub this round because zlib ships in
    // the JDK.)
    Q("mm_png_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 6 + 2).toInt
            val h = (id % 5 + 5).toInt
            (id, Multimodal.pngEncodeRgb(w, h, Multimodal.rgbSynthPixels(w, h)))
          }.toDF("doc_id", "payload")
        Multimodal.extractPngPixels(payloads, "doc_id", "payload").toDF()
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, CAST(doc_id % 6 + 2 AS INTEGER) AS w,
             |    CAST(doc_id % 5 + 5 AS INTEGER) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, w, h, i, j FROM dims,
             |    (SELECT unnest(range(0, 8)) AS i),
             |    (SELECT unnest(range(0, 10)) AS j)
             |  WHERE i < w AND j < h),
             |packed AS (
             |  SELECT doc_id, w, h, i, j,
             |    ((i * 3 + j * 17 + 11) % 256) * 65536 +
             |    ((i * 11 + j * 5 + 7) % 256) * 256 +
             |    ((i * 7 + j * 13 + 3) % 256) AS v
             |  FROM px)
             |SELECT doc_id, max(w) AS width, max(h) AS height,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN i = w - 1 AND j = h - 1 THEN v END)
             |    AS BIGINT) AS px_last,
             |  TRUE AS valid
             |FROM packed GROUP BY doc_id""".stripMargin)),

    // MM: FULL baseline JPEG entropy decode — the round-5 retirement of
    // the engine's last image stub. Payloads are complete baseline JPEGs
    // (DQT/SOF0/optimal DHT/SOS + Huffman-coded MCUs, RSTn on every 4th
    // doc) built by the pure-JVM encoder; decode runs the whole entropy
    // path (Huffman -> dequant -> IDCT -> YCbCr->RGB). The synthesis
    // pattern lives in the exact-integer DCT span (constant + the
    // (4,0)/(0,4)/(4,4) half-amplitude cosine basis), so with unit quant
    // tables the lossy codec roundtrips bit-exactly and the oracle
    // replays the closed form — every rounding site is floor(x+0.5) on
    // doubles in both engines (e0 literals keep DuckDB in DOUBLE).
    Q("mm_jpeg_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 9 + 4).toInt
            val h = (id % 7 + 4).toInt
            (id, Jpeg.jpegSynth(id, w, h))
          }.toDF("doc_id", "payload")
        Multimodal.extractJpegPixels(payloads, "doc_id", "payload").toDF()
      },
      jpegPixelsOracle),

    // The SOF2 counterpart of mm_jpeg_decode: the SAME exact-integer
    // planes emitted as a progressive multi-scan stream (spectral bands +
    // successive approximation + restarts) — the decoder reassembles
    // coefficients across scans and must land on the identical pixels,
    // which the shared closed-form oracle checks. Web crawls carry
    // progressive JPEGs at double-digit percentages; this is the row
    // proving the engine decodes them for real.
    Q("mm_jpeg_progressive",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 9 + 4).toInt
            val h = (id % 7 + 4).toInt
            (id, Jpeg.jpegSynthProgressive(id, w, h))
          }.toDF("doc_id", "payload")
        Multimodal.extractJpegPixels(payloads, "doc_id", "payload").toDF()
      },
      jpegPixelsOracle),

    // MM: FULL GIF decode — the LZW sibling of mm_png_decode /
    // mm_jpeg_decode: payloads are real GIF89a streams (dictionary-built
    // LZW with width growth, every 3rd doc interlaced) from the pure-JVM
    // encoder; decode runs sub-block reassembly -> LZW -> palette ->
    // deinterlace. GIF is lossless, so the oracle replays the palette and
    // index closed forms exactly.
    Q("mm_gif_decode",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val w = (id % 11 + 3).toInt
            val h = (id % 8 + 3).toInt
            (id, Gif.gifSynth(id, w, h))
          }.toDF("doc_id", "payload")
        Multimodal.extractGifPixels(payloads, "doc_id", "payload").toDF()
      },
      Some("""WITH dims AS (
             |  SELECT doc_id, CAST(doc_id % 1000 AS INTEGER) AS idi,
             |    CAST(doc_id % 11 + 3 AS INTEGER) AS w,
             |    CAST(doc_id % 8 + 3 AS INTEGER) AS h
             |  FROM documents),
             |px AS (
             |  SELECT doc_id, w, h, x, y,
             |    (x * 7 + y * 13 + idi) % 256 AS ci
             |  FROM dims,
             |    (SELECT unnest(range(0, 13)) AS x),
             |    (SELECT unnest(range(0, 10)) AS y)
             |  WHERE x < w AND y < h),
             |packed AS (
             |  SELECT doc_id, w, h, x, y,
             |    ((ci * 5 + 7) % 256) * 65536 +
             |    ((ci * 11 + 3) % 256) * 256 +
             |    ((ci * 17 + 29) % 256) AS v
             |  FROM px)
             |SELECT doc_id, max(w) AS width, max(h) AS height,
             |  CAST(sum(v) AS BIGINT) AS pix_sum,
             |  CAST(max(CASE WHEN x = w - 1 AND y = h - 1 THEN v END)
             |    AS BIGINT) AS px_last,
             |  TRUE AS valid
             |FROM packed GROUP BY doc_id""".stripMargin)),

    // DD/MM: image near-duplicate pairs over REAL decoded pixels — the
    // capstone tying the codecs into the dedup story. Each doc pair
    // (doc_id//2) renders the same deterministic 9x8 grayscale pattern,
    // the odd variant nudged +1 at (0,0); payloads rotate through the
    // three LOSSLESS encoders (PNG / GIF / BMP) so the decode dispatch
    // is exercised and the oracle closed form holds bit-exactly. dHash
    // + pigeonhole chunk blocking (exact recall at the budget) + a
    // codegen'd bit_count(xor) verify; the oracle recomputes every
    // hash from the formula and all-pairs-joins the bit tables.
    Q("dd_image_phash",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val g = id / 2
            val v = (id % 2).toInt
            // multiplicative-hash mixing makes adjacent-pixel comparisons
            // behave like coin flips, so DIFFERENT groups sit ~32 bits
            // apart (blocking prunes them) while the odd variant's +1
            // nudge at (0,0) moves its pair by at most one bit
            // the QUADRATIC mix matters twice: a wide class space
            // (g % 1000003) keeps groups collision-free at any probe SF,
            // and the product of two affine terms de-linearizes the
            // pixel sequence so dHash bits are unbiased coin flips —
            // an affine rotation made whole hashes near-constant and
            // skewed the chunk buckets into quadratic candidate blowup
            val gray = Array.tabulate(9 * 8) { i =>
              val x = i % 9; val y = i / 9
              val gm = g % 1000003
              ((x + 9L * y + 1L + gm) * (x + 9L * y + 13L + 2L * gm)
                % 100003L % 200L + 28L).toInt +
                (if (v == 1 && x == 0 && y == 0) 1 else 0)
            }
            val rgb = Array.tabulate(9 * 8 * 3)(i => gray(i / 3).toByte)
            val p = (g % 3).toInt match {
              case 0 => Multimodal.pngEncodeRgb(9, 8, rgb)
              case 1 =>
                val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
                Gif.encodeGif(9, 8, pal, gray.map(_.toByte))
              case _ => Multimodal.bmpEncodeRgb(9, 8, rgb)
            }
            (id, p)
          }.toDF("doc_id", "payload")
        Multimodal.imageDHashPairs(payloads, "doc_id", "payload",
          maxHamming = 4)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id // 2 AS g, doc_id % 2 AS v
             |  FROM documents),
             |cell AS (
             |  SELECT doc_id, x, y,
             |    (x + 9 * y + 1 + g % 1000003)
             |      * (x + 9 * y + 13 + 2 * (g % 1000003))
             |      % 100003 % 200 + 28
             |      + CASE WHEN v = 1 AND x = 0 AND y = 0 THEN 1 ELSE 0 END
             |      AS gr
             |  FROM d,
             |    (SELECT unnest(range(0, 9)) AS x),
             |    (SELECT unnest(range(0, 8)) AS y)),
             |bits AS (
             |  SELECT a.doc_id, a.y * 8 + a.x AS k,
             |    CASE WHEN b.gr > a.gr THEN 1 ELSE 0 END AS bit
             |  FROM cell a JOIN cell b
             |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
             |  WHERE a.x < 8),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |    sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
             |  FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT a_id, b_id, CAST(hamming AS INTEGER) AS hamming
             |FROM pairs WHERE hamming <= 4""".stripMargin)),

    // PIPE: the end-to-end IMAGE corpus dedup — the multimodal capstone
    // composing this round's codecs into one plan: render payloads in
    // three formats -> sniff each container's REAL magic bytes ->
    // decode (format-dispatched) -> dHash -> pigeonhole-blocked near-dup
    // pairs -> connected components -> min-id canonical keep. Mirrors
    // pipe_clean_corpus's shape with images instead of text; the oracle
    // replays the hash closed form and closes the pair graph with a
    // recursive CTE.
    Q("pipe_image_dedup",
      (s, dir) => {
        val payloads = imageCorpus(s, dir)
        val formats = Multimodal
          .extractSniffedMeta(payloads, "doc_id", "payload").toDF()
          .select(col("doc_id"), col("format"))
        val pairs = Multimodal.imageDHashPairs(payloads, "doc_id", "payload",
            maxHamming = 4)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val cc = ConnectedComponents.run(pairs)
          .withColumnRenamed("node", "doc_id")
        formats.join(cc, Seq("doc_id"), "left")
          .withColumn("component", coalesce(col("component"), col("doc_id")))
          .select(col("doc_id"), col("component"), col("format"),
            (col("doc_id") === col("component")).cast("int").as("keep"))
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, doc_id // 2 AS g, doc_id % 2 AS v
             |  FROM documents),
             |cell AS (
             |  SELECT doc_id, x, y,
             |    (x + 9 * y + 1 + g % 1000003)
             |      * (x + 9 * y + 13 + 2 * (g % 1000003))
             |      % 100003 % 200 + 28
             |      + CASE WHEN v = 1 AND x = 0 AND y = 0 THEN 1 ELSE 0 END
             |      AS gr
             |  FROM d,
             |    (SELECT unnest(range(0, 9)) AS x),
             |    (SELECT unnest(range(0, 8)) AS y)),
             |bits AS (
             |  SELECT a.doc_id, a.y * 8 + a.x AS k,
             |    CASE WHEN b.gr > a.gr THEN 1 ELSE 0 END AS bit
             |  FROM cell a JOIN cell b
             |    ON a.doc_id = b.doc_id AND a.y = b.y AND b.x = a.x + 1
             |  WHERE a.x < 8),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM bits a JOIN bits b ON a.k = b.k AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2
             |  HAVING sum(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) <= 4),
             |sym AS (
             |  SELECT a_id AS u, b_id AS v FROM pairs
             |  UNION SELECT b_id, a_id FROM pairs
             |  UNION SELECT a_id, a_id FROM pairs
             |  UNION SELECT b_id, b_id FROM pairs),
             |reach AS (
             |  SELECT u, v FROM sym
             |  UNION
             |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
             |comp AS (SELECT u AS node, min(v) AS component
             |         FROM reach GROUP BY u)
             |SELECT d.doc_id,
             |  coalesce(c.component, d.doc_id) AS component,
             |  (['png', 'gif', 'bmp'])[CAST(d.g % 3 AS INTEGER) + 1]
             |    AS format,
             |  CAST(d.doc_id = coalesce(c.component, d.doc_id) AS INTEGER)
             |    AS keep
             |FROM d LEFT JOIN comp c ON d.doc_id = c.node"""
        .stripMargin)),

    // DD: audio near-dup via Haitsma-Kalker fingerprints — the AUDIO leg
    // of the cross-modal dedup set (text shingles / image phash /
    // embedding cosine already covered). Per doc: a 5-frame two-sine PCM
    // clip (variant v=1 shifts the last frame's dominant band one up —
    // the "same recording, slightly different master" case), REAL WAV
    // decode -> per-frame band powers -> 32 time-band delta-sign bits,
    // then pigeonhole bit-chunk blocking at hamming <= 4 (exact recall,
    // never all-pairs). Band powers quantize to integers before the sign
    // so no bit can hinge on a last-ulp trig difference; the oracle
    // replays synthesis, DFT, bits, and (as the oracle may) brute-force
    // hamming.
    Q("dd_audio_fingerprint",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val g = id / 2
            val v = id % 2
            val samples = (0 until 5).flatMap { f =>
              var m1 = ((g * 7 + f * 3) % 9).toInt
              if (v == 1 && f == 4) m1 = (m1 + 1) % 9
              val m2 = ((g * 4 + f) % 7).toInt
              val k1 = 3 * m1 + 2
              val k2 = 3 * m2 + 2
              (0 until 64).map(x => math.floor(
                1000 * math.sin(2 * math.Pi * k1 * x / 64) +
                  400 * math.sin(2 * math.Pi * k2 * x / 64) + 0.5)
                .toInt.toShort)
            }
            (id, Multimodal.wavSynth(1, 8000, samples))
          }.toDF("doc_id", "payload")
        val fps = Multimodal.extractAudioFingerprint(
            payloads, "doc_id", "payload").toDF()
          .where(col("valid"))
          .select(col("doc_id").as("id"), col("fp"))
        Dedup.fingerprintHammingPairs(fps, maxHamming = 4)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, doc_id // 2 AS g, doc_id % 2 AS v
             |  FROM documents),
             |pf AS (
             |  SELECT doc_id, f,
             |    CASE WHEN v = 1 AND f = 4
             |      THEN ((g * 7 + f * 3) % 9 + 1) % 9
             |      ELSE (g * 7 + f * 3) % 9 END AS m1,
             |    (g * 4 + f) % 7 AS m2
             |  FROM d, (SELECT unnest(range(0, 5)) AS f)),
             |samp AS (
             |  SELECT doc_id, f, x,
             |    FLOOR(1000 * sin(2 * pi() * (3 * m1 + 2) * x / 64) +
             |          400 * sin(2 * pi() * (3 * m2 + 2) * x / 64)
             |          + 5e-1) AS s
             |  FROM pf, (SELECT unnest(range(0, 64)) AS x)),
             |dft AS (
             |  SELECT doc_id, f, k,
             |    pow(sum(s * cos(2 * pi() * k * x / 64)), 2) +
             |    pow(sum(s * sin(2 * pi() * k * x / 64)), 2) AS p
             |  FROM samp, (SELECT unnest(range(1, 28)) AS k)
             |  GROUP BY doc_id, f, k),
             |eng AS (
             |  SELECT doc_id, f, (k - 1) // 3 AS m,
             |    CAST(FLOOR(sum(p) / 64 + 5e-1) AS BIGINT) AS eq
             |  FROM dft GROUP BY doc_id, f, (k - 1) // 3),
             |bits AS (
             |  SELECT a.doc_id, (a.f - 1) * 8 + a.m AS idx
             |  FROM eng a
             |  JOIN eng b ON b.doc_id = a.doc_id AND b.f = a.f
             |    AND b.m = a.m + 1
             |  JOIN eng c ON c.doc_id = a.doc_id AND c.f = a.f - 1
             |    AND c.m = a.m
             |  JOIN eng e2 ON e2.doc_id = a.doc_id AND e2.f = a.f - 1
             |    AND e2.m = a.m + 1
             |  WHERE a.f >= 1 AND a.m <= 7
             |    AND (a.eq - b.eq) - (c.eq - e2.eq) > 0),
             |fp AS (
             |  SELECT d.doc_id,
             |    coalesce(sum(CAST(1 AS BIGINT) << idx), 0) AS fp
             |  FROM d LEFT JOIN bits ON d.doc_id = bits.doc_id
             |  GROUP BY d.doc_id)
             |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             |  CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
             |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
             |WHERE bit_count(xor(a.fp, b.fp)) <= 4""".stripMargin)),

    // MM: audio spectral analysis — synthesize one 64-sample 16-bit PCM
    // sine per doc (bin k0 = id%26+3, amplitude 1000, samples
    // floor(1000*sin(2*pi*k0*x/64)+0.5) — a closed form BOTH engines can
    // regenerate), decode, DFT, report the peak bin + its magnitude.
    // The peak magnitude ~ N*A/2 dwarfs the rounding-leakage floor, so
    // the argmax is engine-robust; magnitudes round to 2 decimals
    // (cross-engine double sums differ ~1e-10 relative).
    Q("mm_wav_spectrum",
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val payloads = t(s, dir, "documents").select(col("doc_id")).as[Long]
          .map { id =>
            val k0 = (id % 26 + 3).toInt
            val samples = (0 until 64).map(x => math.floor(
              1000 * math.sin(2 * math.Pi * k0 * x / 64) + 0.5).toInt.toShort)
            (id, Multimodal.wavSynth(1, 8000, samples))
          }.toDF("doc_id", "payload")
        Multimodal.extractWavSpectrum(payloads, "doc_id", "payload").toDF()
      },
      Some("""WITH param AS (
             |  SELECT doc_id, CAST(doc_id % 26 + 3 AS INTEGER) AS k0
             |  FROM documents),
             |samp AS (
             |  SELECT doc_id, k0, x,
             |    FLOOR(1000 * sin(2 * pi() * k0 * x / 64) + 0.5e0) AS s
             |  FROM param, (SELECT unnest(range(0, 64)) AS x)),
             |spec AS (
             |  SELECT doc_id, k,
             |    sqrt(pow(sum(s * cos(2 * pi() * k * x / 64)), 2) +
             |         pow(sum(s * sin(2 * pi() * k * x / 64)), 2)) AS mag
             |  FROM samp, (SELECT unnest(range(0, 33)) AS k)
             |  GROUP BY doc_id, k),
             |best AS (
             |  SELECT doc_id, k, mag, row_number() OVER (
             |    PARTITION BY doc_id ORDER BY mag DESC, k ASC) AS rn
             |  FROM spec)
             |SELECT doc_id, CAST(k AS INTEGER) AS peak_bin,
             |  round(mag, 2) AS peak_mag, TRUE AS valid
             |FROM best WHERE rn = 1""".stripMargin)),

    // TA: corpus BIGRAM surprisal — per-doc mean -ln p(tok | prev) with
    // the conditional estimated from this corpus's own bigram/context
    // counts (the stronger sibling of ta_self_surprisal's unigram
    // model; repetitive boilerplate scores near zero, unusual word
    // orders score high). Positions via posexplode, bigrams via a
    // position self-join on the doc key; counts are two partial-agg
    // shuffles; the count join-back is term-keyed (the documented
    // vocabulary-skew shape — AQE-splittable, broadcastable when the
    // bigram vocabulary fits). Docs with fewer than 2 tokens emit no
    // row, same as the SQL's bigram set being empty.
    Q("ta_bigram_surprisal",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
        val bg = toks.alias("a")
          .join(toks.alias("b"),
            col("a.doc_id") === col("b.doc_id") &&
              col("b.pos") === col("a.pos") + 1)
          .select(col("a.doc_id"), col("a.tok").as("w1"),
            col("b.tok").as("w2"))
        val bigramC = bg.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("bc"))
        val contextC = bg.groupBy(col("w1")).agg(count(lit(1)).as("cc"))
        bg.join(bigramC, Seq("w1", "w2"))
          .join(contextC, Seq("w1"))
          .groupBy(col("doc_id"))
          .agg((round(avg(log(col("cc").cast("double") / col("bc"))), 6)
            + 0.0).as("bigram_surprisal"))
      },
      Some(s"""WITH tk0 AS ($toksSql),
              |tok AS (
              |  SELECT id, unnest(tk) AS tok,
              |    unnest(range(1, len(tk) + 1)) AS pos
              |  FROM tk0),
              |bg AS (
              |  SELECT a.id, a.tok AS w1, b.tok AS w2
              |  FROM tok a JOIN tok b
              |    ON a.id = b.id AND b.pos = a.pos + 1),
              |bc AS (SELECT w1, w2, count(*) AS bc FROM bg GROUP BY 1, 2),
              |cc AS (SELECT w1, count(*) AS cc FROM bg GROUP BY 1)
              |SELECT bg.id AS doc_id,
              |  round(avg(ln(CAST(cc.cc AS DOUBLE) / bc.bc)), 6) + 0e0
              |    AS bigram_surprisal
              |FROM bg JOIN bc USING (w1, w2) JOIN cc USING (w1)
              |GROUP BY bg.id""".stripMargin)),

    // ST: the funnel under a conversion window — each step must land
    // within 48h of the previous step's completion (earliest-completion
    // greedy under the same cascaded min-agg shape).
    Q("st_funnel_windowed",
      (s, dir) => Funnel.funnelDepth(t(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"),
        horizonSeconds = Some(172800L)),
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t0 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS t1
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |    AND e.ts > v.t0 AND e.ts <= v.t0 + INTERVAL 172800 SECONDS
             |  WHERE e.event_type = 'click' GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS t2
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |    AND e.ts > c.t1 AND e.ts <= c.t1 + INTERVAL 172800 SECONDS
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
             |SELECT u.user_id,
             |  (CASE WHEN v.t0 IS NOT NULL THEN 1 ELSE 0 END +
             |   CASE WHEN c.t1 IS NOT NULL THEN 1 ELSE 0 END +
             |   CASE WHEN p.t2 IS NOT NULL THEN 1 ELSE 0 END) AS depth
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN v ON u.user_id = v.user_id
             |LEFT JOIN c ON u.user_id = c.user_id
             |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin)),

    // DS: exact-k deterministic uniform sample — the k docs with the
    // smallest stable hash values (ORDER BY hash LIMIT k in both
    // engines): a fixed-size sample that is reproducible across runs and
    // partitionings, computed distributed as a global top-k (partial
    // per-partition heads), never a full sort to one task.
    Q("ds_exact_k_sample",
      (s, dir) => {
        val h = pmod(
          Dedup.md5Hash32(col("doc_id").cast("string"), lit(99)), lit(1000000L))
        t(s, dir, "documents")
          .select(col("doc_id"), h.as("h"))
          .orderBy(col("h"), col("doc_id")).limit(25)
      },
      Some(s"""SELECT doc_id,
              |  ${h32Sql("CAST(doc_id AS VARCHAR)", "99")} % 1000000 AS h
              |FROM documents ORDER BY h, doc_id LIMIT 25""".stripMargin)),

    // TA: corpus Zipf slope — the log-log linear fit of token frequency
    // against rank, the one-number check that a corpus has natural
    // long-tail token statistics (template/boilerplate corpora flatten
    // it). Frequencies are one partial-agg shuffle; the vocabulary rank is
    // exact-distributed via Ranking.globalRank (range-partitioned sort +
    // per-partition prefix offsets — vocabulary is UNBOUNDED at web scale,
    // 10^8-10^9 distinct tokens, so a bare global window would funnel it
    // through one task); the fit is covar_pop/var_pop in both engines,
    // rounded to 6.
    Q("ta_zipf_slope",
      (s, dir) => {
        val freq = t(s, dir, "documents")
          .select(explode(Dedup.tokens(col("text"))).as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        graft.operators.Ranking
          .globalRank(freq, Seq(col("c").desc, col("tok").asc), "rank")
          .agg((round(
            covar_pop(log(col("rank")), log(col("c"))) /
              var_pop(log(col("rank"))), 6) + 0.0).as("zipf_slope"))
      },
      Some(s"""WITH tk0 AS ($toksSql),
              |tk AS (SELECT unnest(tk) AS tok FROM tk0),
              |freq AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
              |ranked AS (
              |  SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC)
              |    AS rank
              |  FROM freq)
              |SELECT round(
              |  covar_pop(ln(rank), ln(c)) / var_pop(ln(rank)), 6) + 0e0
              |  AS zipf_slope
              |FROM ranked""".stripMargin)),

    // DS: per-stratum exact-k sample — the stratified sibling of
    // ds_exact_k_sample: smallest-k by stable hash WITHIN each source, as
    // a bounded k-heap partial-agg Aggregator (Sampling.SmallestK, the t3
    // shape). A per-stratum window would sort each source's ENTIRE
    // stratum on one task — with a handful of sources that is the whole
    // table through ~n_sources tasks; the aggregator shuffles only
    // k-bounded buffers and is map-side combinable.
    Q("ds_stratified_k",
      (s, dir) => {
        val h = pmod(
          Dedup.md5Hash32(col("doc_id").cast("string"), lit(41)), lit(1000000L))
        graft.operators.Sampling.stratifiedSmallestK(
          t(s, dir, "documents"), col("doc_id"), col("source"), h,
          k = 10, keyOut = "doc_id", stratumOut = "source", hOut = "h")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, source,
              |    ${h32Sql("CAST(doc_id AS VARCHAR)", "41")} % 1000000 AS h
              |  FROM documents)
              |SELECT doc_id, source, h FROM (
              |  SELECT doc_id, source, h, row_number() OVER (
              |    PARTITION BY source ORDER BY h, doc_id) AS rn
              |  FROM t)
              |WHERE rn <= 10""".stripMargin)),

    // DS: per-group winsorization — clamp a heavy-tailed metric at its
    // group's p05/p95 (robust-scaling prep). The cuts frame is one
    // partial-agg percentile pass over tiny group cardinality, broadcast
    // back; the clamp itself is a narrow codegen'd pass. percentile <->
    // quantile_cont interpolation parity is already pinned by a14.
    Q("ds_winsorize",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val cuts = o.groupBy("o_orderpriority").agg(
          expr("percentile(o_totalprice, 0.05)").as("lo"),
          expr("percentile(o_totalprice, 0.95)").as("hi"))
        o.join(broadcast(cuts), Seq("o_orderpriority"))
          .select(col("o_orderkey"), col("o_orderpriority"),
            (round(least(greatest(col("o_totalprice"), col("lo")),
              col("hi")), 2) + 0.0).as("v_winsor"))
      },
      Some("""WITH cuts AS (
             |  SELECT o_orderpriority,
             |    quantile_cont(o_totalprice, 0.05) AS lo,
             |    quantile_cont(o_totalprice, 0.95) AS hi
             |  FROM orders GROUP BY 1)
             |SELECT o_orderkey, o.o_orderpriority,
             |  round(LEAST(GREATEST(o_totalprice, lo), hi), 2) + 0e0
             |    AS v_winsor
             |FROM orders o JOIN cuts USING (o_orderpriority)"""
        .stripMargin)),

    // DS: temperature-scaled stratum mixing (the mT5/UniMax rule:
    // keep-rate (min_size/size_s)^(1-alpha)) — rates are DERIVED on the
    // cluster from one n_strata-row size aggregate and broadcast back,
    // never a driver round-trip; membership is the same seeded integer
    // hash-cut every sampler here uses, so the oracle replays the
    // identical arithmetic (octet_length sizes keep both engines on the
    // same byte counts).
    Q("ds_temperature_mix",
      (s, dir) => {
        val d = t(s, dir, "documents")
          .withColumn("n_bytes", octet_length(col("text")))
        Sampling.temperatureMix(d, "doc_id", "source", "n_bytes",
            alpha = 0.3, seed = 11)
          .select(col("doc_id"), col("source"))
      },
      Some(s"""WITH sz AS (
              |  SELECT source, CAST(sum(strlen(text)) AS DOUBLE) AS s
              |  FROM documents GROUP BY source),
              |r AS (
              |  SELECT source,
              |    pow((SELECT min(s) FROM sz) / s, 1e0 - 3e-1) AS rate
              |  FROM sz)
              |SELECT d.doc_id, d.source
              |FROM documents d JOIN r ON d.source = r.source
              |WHERE ${h32Sql("CAST(d.doc_id AS VARCHAR)", "11")} % 1000000 <
              |  CAST(floor(rate * 1000000) AS BIGINT)""".stripMargin)),

    // DS: weighted sampling without replacement (Efraimidis–Spirakis
    // A-ES): u^(1/w) scores from the seeded hash with byte-length
    // weights, global top-k planned as per-partition heaps + a k-row
    // merge (TakeOrderedAndProject — asserted in PlanSpec, never a
    // global sort).
    Q("ds_weighted_k",
      (s, dir) => Sampling.weightedTopK(t(s, dir, "documents"),
          "doc_id", octet_length(col("text")), k = 20, seed = 17)
        .select(col("doc_id"), col("source")),
      Some(s"""SELECT doc_id, source FROM (
              |  SELECT doc_id, source,
              |    pow((${h32Sql("CAST(doc_id AS VARCHAR)", "17")} % 1000000
              |        + 5e-1) / 1e6,
              |      1e0 / strlen(text)) AS es_key
              |  FROM documents)
              |ORDER BY es_key DESC, doc_id ASC LIMIT 20""".stripMargin)),

    // TA: corpus self-surprisal — per-doc mean unigram -ln p(token) with
    // p estimated from THIS corpus's token counts (the model-free quality
    // signal: boilerplate-heavy docs score low, rare-vocabulary docs
    // high). Token counts are one partial-agg shuffle, the corpus total
    // is a broadcast scalar frame, and the per-doc mean is a second
    // partial agg — no driver-side state.
    Q("ta_self_surprisal",
      (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("tok"))
        val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val total = toks.agg(count(lit(1)).cast("double").as("n_total"))
        toks.join(counts, "tok")
          .crossJoin(broadcast(total))
          .groupBy(col("doc_id"))
          .agg((round(avg(log(col("n_total") / col("c"))), 6) + 0.0)
            .as("surprisal"))
      },
      Some(s"""WITH tk0 AS ($toksSql),
              |tk AS (SELECT id, unnest(tk) AS tok FROM tk0),
              |cnt AS (SELECT tok, count(*) AS c FROM tk GROUP BY tok),
              |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_total FROM tk)
              |SELECT tk.id AS doc_id,
              |  round(avg(ln(tot.n_total / cnt.c)), 6) + 0e0 AS surprisal
              |FROM tk JOIN cnt USING (tok) CROSS JOIN tot
              |GROUP BY tk.id""".stripMargin)),

    // TS: resample to a dense hourly series with forward fill — the
    // gap-fill step downstream time-series consumers assume; per-key grid
    // via sequence/explode (no global-calendar cross join), one running
    // last(ignoreNulls) window per key.
    Q("ts_gap_fill",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") < 4)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        TimeSeries.gapFill(hourly, "user_id", "h", "v", 3600L)
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS h,
             |    round(sum(value), 2) + 0e0 AS v
             |  FROM events WHERE user_id < 4 GROUP BY 1, 2),
             |spans AS (
             |  SELECT user_id, min(h) AS h0, max(h) AS h1
             |  FROM hourly GROUP BY 1),
             |grid AS (
             |  SELECT user_id,
             |    unnest(generate_series(h0, h1, INTERVAL 3600 SECONDS)) AS h
             |  FROM spans),
             |j AS (
             |  SELECT g.user_id, g.h, hourly.v
             |  FROM grid g LEFT JOIN hourly
             |    ON g.user_id = hourly.user_id AND g.h = hourly.h)
             |SELECT user_id, h,
             |  last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
             |    ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS v,
             |  CASE WHEN v IS NULL THEN 1 ELSE 0 END AS was_gap
             |FROM j""".stripMargin)),

    // TS: classical additive seasonal-trend decomposition over the
    // gap-filled hourly series — centered 2x24 moving-average trend
    // (half-weight endpoints, null until a full window), per-(user,
    // hour-of-day-phase) detrended means centered by the user's grand
    // mean, residual closes the identity. The oracle replays grid,
    // forward fill, windows, and phase means term-for-term.
    Q("ts_seasonal",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") < 4)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        val filled = TimeSeries.gapFill(hourly, "user_id", "h", "v", 3600L)
          .select("user_id", "h", "v")
        TimeSeries.seasonalDecompose(filled, "user_id", "h", "v",
          stepSeconds = 3600L, period = 24)
      },
      Some(s"""WITH ${filledSeriesCtes(4)},
             |f2 AS (
             |  SELECT user_id, h, v,
             |    CAST(epoch(h) AS BIGINT) // 3600 % 24 AS phase,
             |    CAST(FLOOR(v * 1e2 + 5e-1) AS BIGINT) AS vc
             |  FROM filled),
             |tr AS (
             |  SELECT user_id, h, v, phase, vc,
             |    sum(vc * 2) OVER (PARTITION BY user_id ORDER BY h
             |      ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
             |    - lag(vc, 12) OVER w - lead(vc, 12) OVER w AS tc
             |  FROM f2
             |  WINDOW w AS (PARTITION BY user_id ORDER BY h)),
             |seas AS (
             |  SELECT user_id, phase,
             |    sum(vc * 48 - tc)::DOUBLE / (4800e0 * count(*)) AS sraw
             |  FROM tr WHERE tc IS NOT NULL GROUP BY 1, 2),
             |grand AS (
             |  SELECT user_id,
             |    list_reduce(list_prepend(0e0, list(sraw ORDER BY phase)),
             |      (acc_, x_) -> acc_ + x_) / count(*) AS smean
             |  FROM seas GROUP BY user_id)
             |SELECT tr.user_id, tr.h, tr.v,
             |  floor(tc::DOUBLE / 4800e0 * 1e4 + 5e-1) / 1e4 + 0e0
             |    AS trend,
             |  floor((sraw - smean) * 1e4 + 5e-1) / 1e4 + 0e0 AS seasonal,
             |  floor((vc::DOUBLE / 1e2 - tc::DOUBLE / 4800e0
             |      - (sraw - smean)) * 1e4 + 5e-1) / 1e4 + 0e0 AS resid
             |FROM tr
             |LEFT JOIN seas ON tr.user_id = seas.user_id
             |  AND tr.phase = seas.phase
             |LEFT JOIN grand ON tr.user_id = grand.user_id""".stripMargin)),

    // TS: OHLC resampling bars — downsample the event stream to hourly
    // open/high/low/close/volume bars per event type. Open/close are
    // value-at-argmin/argmax over (ts, event_id): ONE partial-agg
    // min/max(struct) pass (the a4 argmax discipline — map-side
    // combinable, no per-bucket window sort); the oracle spells the
    // same pick as a row_number window. Raw stored doubles pass
    // through untouched — no arithmetic, no rounding needed.
    Q("ts_ohlc_bars",
      (s, dir) => t(s, dir, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("bucket"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value"))).as("mo"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("mc"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("bucket"),
          col("mo.value").as("open"), col("mc.value").as("close"),
          col("high"), col("low"), col("n")),
      Some("""WITH b AS (
             |  SELECT event_type, date_trunc('hour', ts) AS bucket,
             |    ts, event_id, value
             |  FROM events),
             |r AS (
             |  SELECT *,
             |    row_number() OVER (PARTITION BY event_type, bucket
             |      ORDER BY ts, event_id) AS rn,
             |    count(*) OVER (PARTITION BY event_type, bucket) AS cnt
             |  FROM b)
             |SELECT event_type, bucket,
             |  max(CASE WHEN rn = 1 THEN value END) AS open,
             |  max(CASE WHEN rn = cnt THEN value END) AS close,
             |  max(value) AS high, min(value) AS low, count(*) AS n
             |FROM r GROUP BY 1, 2""".stripMargin)),

    // TS: bounded exponentially-weighted moving average over each user's
    // hourly value series. alpha = 0.5 makes every weight a power of two
    // (exact in doubles), so the smoothed series is bit-reproducible by
    // the oracle evaluating the same left-to-right 8-term sum; the
    // truncated normalizer is the closed-form geometric sum. One window
    // (= one shuffle) regardless of lookback.
    Q("ts_ewma",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") < 4)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        TimeSeries.ewmaBounded(hourly, "user_id", "h", "v", lookback = 8)
      },
      Some(("""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS h,
             |    round(sum(value), 2) + 0e0 AS v
             |  FROM events WHERE user_id < 4 GROUP BY 1, 2)
             |SELECT user_id, h, v,
             |  round((0e0""" +
             (0 until 8).map(i =>
               s"\n             |    + coalesce(lag(v, $i) OVER w, 0e0)" +
               s" * pow(0.5e0, $i)").mkString + """)
             |    / (2e0 - pow(0.5e0,
             |        CAST(least(row_number() OVER w, 8) AS DOUBLE) - 1e0)),
             |    4) + 0e0 AS ewma
             |FROM hourly
             |WINDOW w AS (PARTITION BY user_id ORDER BY h)""").stripMargin)),

    // TS: linear-interpolation resampling — the gap-fill grid, but each
    // missing bucket gets the time-weighted blend of the surrounding
    // observations (held flat after the last one, null before the
    // first). Same scale shape as ts_gap_fill: per-key grid fan-out, one
    // (key, bucket) join, prev/next as two running windows over one
    // shuffle.
    Q("ts_interp",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") % 5 === 2)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        TimeSeries.interpolate(hourly, "user_id", "h", "v", 3600L)
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS h,
             |    round(sum(value), 2) + 0e0 AS v
             |  FROM events WHERE user_id % 5 = 2 GROUP BY 1, 2),
             |spans AS (
             |  SELECT user_id, min(h) AS h0, max(h) AS h1
             |  FROM hourly GROUP BY 1),
             |grid AS (
             |  SELECT user_id,
             |    unnest(generate_series(h0, h1, INTERVAL 3600 SECONDS)) AS h
             |  FROM spans),
             |j AS (
             |  SELECT g.user_id, g.h, hourly.v,
             |    CASE WHEN hourly.user_id IS NOT NULL THEN 1 END AS obs
             |  FROM grid g LEFT JOIN hourly
             |    ON g.user_id = hourly.user_id AND g.h = hourly.h),
             |k AS (
             |  SELECT user_id, h, v, obs,
             |    last_value(v IGNORE NULLS) OVER wb AS pv,
             |    first_value(v IGNORE NULLS) OVER wf AS nv,
             |    last_value(CASE WHEN obs = 1 THEN h END IGNORE NULLS)
             |      OVER wb AS pt,
             |    first_value(CASE WHEN obs = 1 THEN h END IGNORE NULLS)
             |      OVER wf AS nt
             |  FROM j
             |  WINDOW wb AS (PARTITION BY user_id ORDER BY h
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wf AS (PARTITION BY user_id ORDER BY h
             |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT user_id, h,
             |  floor((CASE WHEN obs = 1 THEN v
             |    WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv +
             |      (nv - pv) *
             |      ((CAST(epoch_us(h) AS DOUBLE) -
             |        CAST(epoch_us(pt) AS DOUBLE)) /
             |       (CAST(epoch_us(nt) AS DOUBLE) -
             |        CAST(epoch_us(pt) AS DOUBLE)))
             |    WHEN pv IS NOT NULL THEN pv END) * 1e4 + 0.5e0) / 1e4 AS v,
             |  CASE WHEN obs IS NULL THEN 1 ELSE 0 END AS was_gap
             |FROM k""".stripMargin)),

    // TS: rolling robust anomaly flagging — the Hampel filter: each
    // hourly point judged against the median/MAD of its trailing
    // 9-observation window (a20's robust z-score made ROLLING, so a
    // level shift ages out of the baseline instead of poisoning it
    // forever). One shuffle on the key; median and MAD are array
    // expressions over the bounded window buffer. MAD=0 (flat baseline)
    // flags any departure directly with a null z.
    Q("ts_anomaly",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") < 8)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        TimeSeries.rollingRobustAnomaly(hourly, "user_id", "h", "v",
          window = 9, nSigma = 3.0)
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS h,
             |    round(sum(value), 2) + 0e0 AS v
             |  FROM events WHERE user_id < 8 GROUP BY 1, 2),
             |b AS (SELECT user_id, h, v,
             |        list(v) OVER (PARTITION BY user_id ORDER BY h
             |          ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS buf
             |      FROM hourly),
             |m AS (SELECT user_id, h, v, buf,
             |        CASE WHEN len(buf) = 9
             |          THEN list_sort(buf)[5] END AS med
             |      FROM b),
             |d AS (SELECT user_id, h, v, med,
             |        CASE WHEN med IS NOT NULL THEN list_sort(
             |          list_transform(buf, x -> abs(x - med)))[5]
             |        END AS mad
             |      FROM m)
             |SELECT user_id, h, v, med, mad,
             |  CASE WHEN mad > 0e0 THEN
             |    floor(abs(v - med) / (1.4826e0 * mad) * 1e4 + 5e-1) / 1e4
             |  END AS robust_z,
             |  CASE WHEN med IS NULL THEN 0
             |    WHEN mad > 0e0 THEN
             |      CASE WHEN abs(v - med) > 1.4826e0 * mad * 3e0
             |        THEN 1 ELSE 0 END
             |    ELSE CASE WHEN v != med THEN 1 ELSE 0 END
             |  END AS anomaly
             |FROM d""".stripMargin)),

    // TS: CUSUM change-point detection — sustained level shifts, the
    // complement of ts_anomaly's pointwise Hampel spikes. No sequential
    // fold: the max(0, ·) recurrence is computed as the drawdown
    // identity over deviation prefix sums, so the plan is one keyed
    // shuffle with two running-prefix windows (spill-safe at any
    // series length). Same hourly fixture as ts_anomaly.
    Q("ts_cusum",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") < 8)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        TimeSeries.cusum(hourly, "user_id", "h", "v",
          kappaSigmas = 0.5, hSigmas = 4.0)
      },
      Some("""WITH hourly AS (
             |  SELECT user_id, date_trunc('hour', ts) AS h,
             |    round(sum(value), 2) + 0e0 AS v
             |  FROM events WHERE user_id < 8 GROUP BY 1, 2),
             |st AS (SELECT user_id, avg(v) AS mu,
             |         coalesce(stddev_samp(v), 0e0) AS sigma
             |       FROM hourly GROUP BY user_id),
             |d AS (SELECT hourly.user_id, h, v, mu, sigma,
             |        v - mu - 5e-1 * sigma AS dp,
             |        mu - 5e-1 * sigma - v AS dn
             |      FROM hourly JOIN st USING (user_id)),
             |p AS (SELECT user_id, h, v, sigma,
             |        sum(dp) OVER w AS pp, sum(dn) OVER w AS pn
             |      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY h
             |        ROWS UNBOUNDED PRECEDING)),
             |r AS (SELECT user_id, h, v, sigma, pp, pn,
             |        min(pp) OVER w AS mpp, min(pn) OVER w AS mpn
             |      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY h
             |        ROWS UNBOUNDED PRECEDING))
             |SELECT user_id, h, v,
             |  floor((pp - least(mpp, 0e0)) * 1e4 + 5e-1) / 1e4 AS s_pos,
             |  floor((pn - least(mpn, 0e0)) * 1e4 + 5e-1) / 1e4 AS s_neg,
             |  CASE WHEN pp - least(mpp, 0e0) > 4e0 * sigma
             |    OR pn - least(mpn, 0e0) > 4e0 * sigma
             |  THEN 1 ELSE 0 END AS alarm
             |FROM r""".stripMargin)),

    // DQ: declarative quality-constraint report — every constraint is
    // one aggregate expression inside a single partial-agg pass (one scan
    // no matter how many checks), emitting a tiny violations report.
    Q("dq_constraint_report",
      (s, dir) => DataChecks.checkReport(t(s, dir, "orders"),
        uniqueCols = Seq("o_orderkey"),
        nonNullCols = Seq("o_custkey", "o_orderstatus"),
        ranges = Seq("o_totalprice" -> (0.0, 400000.0))),
      Some("""SELECT 'unique' AS "check", 'o_orderkey' AS "column",
             |  count(o_orderkey) - count(DISTINCT o_orderkey) AS violations
             |FROM orders
             |UNION ALL
             |SELECT 'non_null', 'o_custkey',
             |  count(*) FILTER (WHERE o_custkey IS NULL) FROM orders
             |UNION ALL
             |SELECT 'non_null', 'o_orderstatus',
             |  count(*) FILTER (WHERE o_orderstatus IS NULL) FROM orders
             |UNION ALL
             |SELECT 'range', 'o_totalprice',
             |  count(*) FILTER (WHERE o_totalprice < 0e0 OR o_totalprice > 4e5)
             |FROM orders""".stripMargin)),

    // DQ: quarantine — the actionable complement of the report: the
    // violating ROWS, each carrying which constraints it failed, so the
    // ingest can route them (clean side = anti-join). Fixture mangles
    // every 191st order back in with a NULL custkey, so all three
    // constraint kinds fire: those keys duplicate (both copies flagged),
    // the mangled copies fail non_null, and a tightened price ceiling
    // catches real rows.
    Q("dq_quarantine",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice")
        val base = o.unionByName(
          o.where(col("o_orderkey") % 191 === 0)
            .select(col("o_orderkey"),
              lit(null).cast("long").as("o_custkey"),
              col("o_totalprice")))
        DataChecks.quarantine(base,
            uniqueCols = Seq("o_orderkey"),
            nonNullCols = Seq("o_custkey"),
            ranges = Seq("o_totalprice" -> (0.0, 150000.0)))
          // The operator keeps `failed` as an array (that's the routing
          // payload); the registry row joins it to a scalar because the
          // harness canonicalizer sorts columns and arrays aren't
          // sortable there. Order inside the array is already
          // deterministic (constraint declaration order).
          .select(col("o_orderkey"), col("o_totalprice"),
            array_join(col("failed"), "|").as("failed"), col("n_failed"))
      },
      Some("""WITH base AS (
             |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, NULL, o_totalprice FROM orders
             |  WHERE o_orderkey % 191 = 0),
             |dup AS (SELECT o_orderkey FROM base
             |        GROUP BY 1 HAVING count(*) > 1),
             |f AS (
             |  SELECT b.o_orderkey, b.o_totalprice,
             |    list_filter([
             |      CASE WHEN d.o_orderkey IS NOT NULL
             |        THEN 'unique:o_orderkey' END,
             |      CASE WHEN b.o_custkey IS NULL
             |        THEN 'non_null:o_custkey' END,
             |      CASE WHEN b.o_totalprice IS NOT NULL AND
             |          (b.o_totalprice < 0e0 OR b.o_totalprice > 15e4)
             |        THEN 'range:o_totalprice' END],
             |      x -> x IS NOT NULL) AS failed
             |  FROM base b LEFT JOIN dup d ON b.o_orderkey = d.o_orderkey)
             |SELECT o_orderkey, o_totalprice,
             |  array_to_string(failed, '|') AS failed,
             |  len(failed)::INT AS n_failed
             |FROM f WHERE len(failed) > 0""".stripMargin)),

    // DQ: k-anonymity generalization audit — per row, the smallest
    // suffix-drop generalization of the quasi-identifiers (nation,
    // segment, balance bucket) whose equivalence class reaches k=5, and
    // that class's size. The level histogram is the privacy/utility
    // curve a release decision reads. One group-sized partial agg +
    // keyed join per level, 1-row broadcast for fully-generalized.
    Q("dq_k_anonymity",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"),
          col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
        DataChecks.kAnonymize(c, "c_custkey",
          Seq("c_nationkey", "c_mktsegment", "bal_bucket"), k = 5)
      },
      Some("""WITH b AS (SELECT c_custkey, c_nationkey, c_mktsegment,
             |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket
             |  FROM customer),
             |g0 AS (SELECT c_nationkey, c_mktsegment, bal_bucket,
             |         count(*) AS n
             |       FROM b GROUP BY 1, 2, 3),
             |g1 AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
             |       FROM b GROUP BY 1, 2),
             |g2 AS (SELECT c_nationkey, count(*) AS n FROM b GROUP BY 1),
             |tot AS (SELECT count(*) AS n FROM b)
             |SELECT b.c_custkey,
             |  CASE WHEN g0.n >= 5 THEN 0 WHEN g1.n >= 5 THEN 1
             |    WHEN g2.n >= 5 THEN 2 ELSE 3 END AS level,
             |  (CASE WHEN g0.n >= 5 THEN g0.n WHEN g1.n >= 5 THEN g1.n
             |    WHEN g2.n >= 5 THEN g2.n ELSE tot.n END)::BIGINT
             |    AS group_n
             |FROM b
             |JOIN g0 ON b.c_nationkey = g0.c_nationkey
             |  AND b.c_mktsegment = g0.c_mktsegment
             |  AND b.bal_bucket = g0.bal_bucket
             |JOIN g1 ON b.c_nationkey = g1.c_nationkey
             |  AND b.c_mktsegment = g1.c_mktsegment
             |JOIN g2 ON b.c_nationkey = g2.c_nationkey, tot"""
        .stripMargin)),

    // GR: exact triangle count, oriented two-join formulation — every
    // triangle counted once as a wedge at its (degree, id)-smallest
    // vertex, closed by the oriented third edge. Low-degree-first
    // orientation (round 5) bounds the wedge set by O(m^1.5) on
    // hub-skewed graphs; the oracle's id-oriented SQL counts the same
    // set, so parity is unchanged.
    Q("gr_triangles",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            suppPoints(s, dir), "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        PageRank.closedWedges(edges)
          .agg(count(lit(1)).as("n_triangles"))
      },
      Some(s"""WITH sup AS ($suppPointsSql),
              |e AS (
              |  SELECT a.s_suppkey AS a, b.s_suppkey AS b
              |  FROM sup a JOIN sup b
              |    ON a.s_suppkey < b.s_suppkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0)
              |SELECT count(*) AS n_triangles
              |FROM e e1
              |JOIN e e2 ON e1.b = e2.a
              |JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin)),

    // A19: weekly cohort retention — users cohorted by first-activity
    // week, counted per (cohort, week offset). Two partial-agg shuffles
    // on user + one on the (small) cohort grid; week math is
    // Monday-aligned date_trunc in both engines, offsets via floor to
    // sidestep the engines' different double->int cast rounding.
    Q("a19_cohort_retention",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val cohort = ev.groupBy(col("user_id"))
          .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
        ev.select(col("user_id"), date_trunc("week", col("ts")).as("active_week"))
          .distinct()
          .join(cohort, Seq("user_id"))
          .withColumn("week_offset",
            floor(datediff(col("active_week"), col("cohort_week")) / 7)
              .cast("int"))
          .groupBy(col("cohort_week").cast("date").as("cohort_week"),
            col("week_offset"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH cohort AS (
             |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
             |  FROM events GROUP BY user_id),
             |activity AS (
             |  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
             |  FROM events)
             |SELECT CAST(c.cohort_week AS DATE) AS cohort_week,
             |  CAST(floor(date_diff('day', c.cohort_week, a.active_week) / 7e0)
             |    AS INTEGER) AS week_offset,
             |  count(DISTINCT a.user_id) AS n_users
             |FROM activity a JOIN cohort c ON a.user_id = c.user_id
             |GROUP BY 1, 2""".stripMargin)),

    // A20: robust outlier flagging — median/MAD z-score (the
    // mean/stddev a8 shape is exactly what a heavy-tailed column
    // breaks; median and MAD have 50% breakdown). Two exact-percentile
    // passes (the a14 memory caveat applies per group) + a broadcast-
    // sized join-back per pass; the deviation, MAD, and threshold
    // compose bit-identically in both engines (selection + linear
    // interpolation only — no order-dependent sums), so the outlier
    // COUNT needs no tolerance at all. The deviation frame feeds TWO
    // consumers (the MAD aggregate and the final count), so it persists
    // — PRUNED to its three consumed columns first: persisting the raw
    // join materializes every lineitem column and measures SLOWER than
    // the recompute (A/B in SCALE.md r9); the projected persist wins at
    // both sf0.1 and sf1 (the prefixJaccard/hits multi-consumer
    // discipline, plus explicit pruning at the cache boundary where
    // Catalyst can no longer prune per-consumer).
    Q("a20_robust_outliers",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val med = li.groupBy("l_returnflag")
          .agg(expr("percentile(l_extendedprice, 0.5)").as("med"))
        val dev = li.select("l_returnflag", "l_extendedprice")
          .join(med, "l_returnflag")
          .select(col("l_returnflag"), col("med"),
            abs(col("l_extendedprice") - col("med")).as("adev"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val mad = dev.groupBy("l_returnflag")
          .agg(first("med").as("med"),
            expr("percentile(adev, 0.5)").as("mad"))
        dev.join(mad.select(col("l_returnflag"), col("mad")),
            "l_returnflag")
          .groupBy("l_returnflag")
          .agg(first("med").as("m_"), first("mad").as("d_"),
            count(when(col("adev") > lit(5.0) * lit(1.4826) * col("mad"),
              lit(1))).as("n_outliers"))
          .select(col("l_returnflag"), round(col("m_"), 4).as("med"),
            round(col("d_"), 4).as("mad"), col("n_outliers"))
      },
      Some("""WITH med AS (
             |  SELECT l_returnflag, median(l_extendedprice) AS med
             |  FROM lineitem GROUP BY 1),
             |d AS (
             |  SELECT l.l_returnflag, med,
             |    abs(l_extendedprice - med) AS adev
             |  FROM lineitem l JOIN med USING (l_returnflag)),
             |mad AS (
             |  SELECT l_returnflag, median(adev) AS mad
             |  FROM d GROUP BY 1)
             |SELECT d.l_returnflag, round(any_value(d.med), 4) AS med,
             |  round(any_value(mad.mad), 4) AS mad,
             |  count(CASE WHEN adev > 5e0 * 1.4826e0 * mad.mad
             |    THEN 1 END) AS n_outliers
             |FROM d JOIN mad USING (l_returnflag)
             |GROUP BY d.l_returnflag""".stripMargin)),

    // GR: PageRank over the supplier proximity graph — fixed 5 power
    // iterations (deterministic, oracle-reproducible: no floating-point
    // convergence epsilon), simplified dangling handling (teleport share
    // only). The oracle unrolls the same 5 iterations in SQL; doubles
    // agree because both sides compose the identical expression shapes,
    // and the output rounds to 6 decimals.
    Q("gr_pagerank",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            suppPoints(s, dir), "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = edges.union(
          edges.select(col("dst").as("src"), col("src").as("dst")))
        PageRank.run(bidir, iterations = 5)
          .select(col("node"), (round(col("rank"), 6) + 0.0).as("rank"))
      },
      Some {
        val iterSql = (k: Int) =>
          s"""m$k AS (
             |  SELECT e.dst AS node, sum(r.rank / deg.deg) AS mass
             |  FROM e JOIN r${k - 1} r ON e.src = r.node
             |  JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |r$k AS (
             |  SELECT nd.node,
             |    (1e0 - 85e-2) / nn.n + 85e-2 * coalesce(m$k.mass, 0e0) AS rank
             |  FROM nodes nd CROSS JOIN nn
             |  LEFT JOIN m$k ON nd.node = m$k.node)"""
        s"""WITH sup AS ($suppPointsSql),
           |e AS (
           |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
           |  FROM sup a JOIN sup b
           |    ON a.s_suppkey <> b.s_suppkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
           |nodes AS (SELECT DISTINCT src AS node FROM e),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |r0 AS (SELECT node, 1e0 / nn.n AS rank FROM nodes CROSS JOIN nn),
           |${(1 to 5).map(iterSql).mkString(",\n")}
           |SELECT node, round(rank, 6) + 0e0 AS rank FROM r5""".stripMargin
      }),

    // GR: the standard dangling-mass formulation — the DIRECTED proximity
    // edges (a_id < b_id) leave max-id nodes with no out-edges; their
    // rank mass is redistributed uniformly each round so ranks sum to 1.
    // One extra 1-row aggregate per round (broadcast), state still
    // (node, rank); the oracle unrolls the same 5 rounds with a per-round
    // dangling-mass CTE.
    Q("gr_pagerank_dangling",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            suppPoints(s, dir), "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        PageRank.run(edges, iterations = 5, redistributeDangling = true)
          .select(col("node"), (round(col("rank"), 6) + 0.0).as("rank"))
      },
      Some {
        val iterSql = (k: Int) =>
          s"""m$k AS (
             |  SELECT e.dst AS node, sum(r.rank / deg.deg) AS mass
             |  FROM e JOIN r${k - 1} r ON e.src = r.node
             |  JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |d$k AS (
             |  SELECT coalesce(sum(r.rank), 0e0) AS dm
             |  FROM r${k - 1} r LEFT JOIN deg ON r.node = deg.src
             |  WHERE deg.src IS NULL),
             |r$k AS (
             |  SELECT nd.node,
             |    (1e0 - 85e-2) / nn.n
             |      + 85e-2 * (coalesce(m$k.mass, 0e0) + d$k.dm / nn.n) AS rank
             |  FROM nodes nd CROSS JOIN nn CROSS JOIN d$k
             |  LEFT JOIN m$k ON nd.node = m$k.node)"""
        s"""WITH sup AS ($suppPointsSql),
           |e AS (
           |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
           |  FROM sup a JOIN sup b
           |    ON a.s_suppkey < b.s_suppkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
           |nodes AS (
           |  SELECT src AS node FROM e UNION SELECT dst FROM e),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |r0 AS (SELECT node, 1e0 / nn.n AS rank FROM nodes CROSS JOIN nn),
           |${(1 to 5).map(iterSql).mkString(",\n")}
           |SELECT node, round(rank, 6) + 0e0 AS rank FROM r5""".stripMargin
      }),

    // GR: weighted PageRank — rank splits over out-edges by edge weight
    // (rank * w / weighted out-degree) on the symmetrized proximity
    // graph with the same deterministic integer weights as gr_sssp;
    // 5 unrolled rounds in the oracle, rank rounded to 6 like the other
    // PageRank rows.
    Q("gr_wpagerank",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            suppPoints(s, dir), "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = edges.union(
            edges.select(col("dst").as("src"), col("src").as("dst")))
          .withColumn("w", pmod(col("src") * 31 + col("dst"), lit(7)) + 1)
        PageRank.weighted(bidir, iterations = 5)
          .select(col("node"), (round(col("rank"), 6) + 0.0).as("rank"))
      },
      Some {
        val iterSql = (k: Int) =>
          s"""m$k AS (
             |  SELECT e.dst AS node, sum(r.rank * e.w / wd.wdeg) AS mass
             |  FROM e JOIN r${k - 1} r ON e.src = r.node
             |  JOIN wd ON e.src = wd.src
             |  GROUP BY e.dst),
             |r$k AS (
             |  SELECT nd.node,
             |    (1e0 - 85e-2) / nn.n + 85e-2 * coalesce(m$k.mass, 0e0) AS rank
             |  FROM nodes nd CROSS JOIN nn
             |  LEFT JOIN m$k ON nd.node = m$k.node)"""
        s"""WITH sup AS ($suppPointsSql),
           |e0 AS (
           |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
           |  FROM sup a JOIN sup b
           |    ON a.s_suppkey <> b.s_suppkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
           |e AS (
           |  SELECT src, dst,
           |    CAST((src * 31 + dst) % 7 + 1 AS DOUBLE) AS w
           |  FROM e0),
           |wd AS (SELECT src, sum(w) AS wdeg FROM e GROUP BY src),
           |nodes AS (SELECT DISTINCT src AS node FROM e),
           |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
           |r0 AS (SELECT node, 1e0 / nn.n AS rank FROM nodes CROSS JOIN nn),
           |${(1 to 5).map(iterSql).mkString(",\n")}
           |SELECT node, round(rank, 6) + 0e0 AS rank FROM r5""".stripMargin
      }),

    // GR: personalized PageRank — teleport AND dangling mass restart
    // uniformly over the seed set (s_suppkey % 10 = 1), making rank a
    // proximity-to-seeds measure; directed a<b edges leave real
    // dangling nodes, exercising the seed-return term. Same unrolled
    // oracle as the other PageRank rows with the restart vector as a
    // 0/1 CASE.
    Q("gr_ppr",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            suppPoints(s, dir), "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val seeds = suppPoints(s, dir)
          .where(pmod(col("s_suppkey"), lit(10)) === 1)
          .select(col("s_suppkey").as("node"))
        PageRank.personalized(edges, seeds, iterations = 5)
          .select(col("node"), (round(col("rank"), 6) + 0.0).as("rank"))
      },
      Some {
        val iterSql = (k: Int) =>
          s"""m$k AS (
             |  SELECT e.dst AS node, sum(r.rank / deg.deg) AS mass
             |  FROM e JOIN r${k - 1} r ON e.src = r.node
             |  JOIN deg ON e.src = deg.src
             |  GROUP BY e.dst),
             |d$k AS (
             |  SELECT coalesce(sum(r.rank), 0e0) AS dm
             |  FROM r${k - 1} r LEFT JOIN deg ON r.node = deg.src
             |  WHERE deg.src IS NULL),
             |r$k AS (
             |  SELECT sd.node,
             |    (sd.s / sn.n) * ((1e0 - 85e-2) + 85e-2 * d$k.dm)
             |      + 85e-2 * coalesce(m$k.mass, 0e0) AS rank
             |  FROM sd CROSS JOIN sn CROSS JOIN d$k
             |  LEFT JOIN m$k ON sd.node = m$k.node)"""
        s"""WITH sup AS ($suppPointsSql),
           |e AS (
           |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
           |  FROM sup a JOIN sup b
           |    ON a.s_suppkey < b.s_suppkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
           |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
           |nodes AS (
           |  SELECT src AS node FROM e UNION SELECT dst FROM e),
           |sd AS (SELECT node,
           |  CASE WHEN node % 10 = 1 THEN 1e0 ELSE 0e0 END AS s FROM nodes),
           |sn AS (SELECT sum(s) AS n FROM sd),
           |r0 AS (SELECT sd.node, sd.s / sn.n AS rank FROM sd CROSS JOIN sn),
           |${(1 to 5).map(iterSql).mkString(",\n")}
           |SELECT node, round(rank, 6) + 0e0 AS rank FROM r5""".stripMargin
      }),

    // GR: synchronous label propagation (community detection), 3 fixed
    // rounds, min-label tiebreak — per round one (node, label) count
    // shuffle + one partial-agg argmax (max(struct(c, -label))), no
    // window; the oracle unrolls the same rounds with a windowed argmax.
    Q("gr_label_prop",
      (s, dir) => PageRank.labelPropagation(suppBidirEdges(s, dir),
        iterations = 3),
      Some(s"""WITH $lpropL3Ctes
              |SELECT node, label FROM l3""".stripMargin)),

    // GR: community MODULARITY — the quality metric that makes the
    // label-prop result measurable (the graph analog of ir_eval):
    // per-community q_c = intra/|E| - (deg/|E|)^2 over the same
    // bidirectional proximity graph, oracle sharing the exact l3 chain
    // gr_label_prop replays (lpropL3Ctes) so the scored communities
    // cannot drift from the detected ones.
    Q("gr_modularity",
      (s, dir) => {
        val bidir = suppBidirEdges(s, dir)
        PageRank.modularity(bidir,
          PageRank.labelPropagation(bidir, iterations = 3))
      },
      Some(s"""WITH $lpropL3Ctes,
              |tot AS (SELECT count(*)::DOUBLE AS m2 FROM e),
              |dg AS (SELECT src AS node, count(*) AS d FROM e GROUP BY 1),
              |ag AS (SELECT l.label, count(*)::BIGINT AS n_nodes,
              |         sum(d.d)::BIGINT AS degree_sum
              |       FROM l3 l JOIN dg d ON l.node = d.node
              |       GROUP BY 1),
              |intra AS (SELECT la.label,
              |            count(*)::BIGINT AS intra_edges
              |          FROM e JOIN l3 la ON e.src = la.node
              |                 JOIN l3 lb ON e.dst = lb.node
              |          WHERE la.label = lb.label GROUP BY 1)
              |SELECT ag.label, n_nodes,
              |  coalesce(intra_edges, 0)::BIGINT AS intra_edges, degree_sum,
              |  floor((coalesce(intra_edges, 0) / m2 -
              |    (degree_sum / m2) * (degree_sum / m2)) * 1e6 + 5e-1) / 1e6
              |    AS q_contrib
              |FROM ag LEFT JOIN intra ON ag.label = intra.label, tot"""
        .stripMargin)),

    // GR: multi-source BFS shortest hop distances (3-hop bound) over the
    // symmetrized proximity graph — frontier-only edge join + min-merge
    // per round, (node, dist) state; the oracle is a bounded recursive
    // CTE min-ed per node.
    Q("gr_bfs_dist",
      (s, dir) => {
        val pts = suppPoints(s, dir)
        val edges = SpatialJoins.gridSelfJoin(
            pts, "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = edges.union(
          edges.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = pts.where(pmod(col("s_suppkey"), lit(10)) === 1)
          .select(col("s_suppkey").as("node"))
        PageRank.bfsDistances(bidir, seeds, maxHops = 3)
      },
      Some(s"""WITH RECURSIVE sup AS ($suppPointsSql),
              |e AS (
              |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst
              |  FROM sup a JOIN sup b
              |    ON a.s_suppkey <> b.s_suppkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
              |seeds AS (
              |  SELECT s_suppkey AS node FROM sup WHERE s_suppkey % 10 = 1),
              |walk(node, d) AS (
              |  SELECT node, 0 FROM seeds
              |  UNION ALL
              |  SELECT e.dst, w.d + 1 FROM walk w JOIN e ON e.src = w.node
              |  WHERE w.d < 3)
              |SELECT node, CAST(min(d) AS INTEGER) AS dist
              |FROM walk GROUP BY node""".stripMargin)),

    // GR: bounded weighted shortest paths — frontier-relaxation
    // Bellman-Ford (3 rounds) over the symmetrized proximity graph with
    // deterministic integer edge weights; each round relaxes only the
    // out-edges of nodes the previous round improved, then min-merges
    // into the (node, dist) state. The oracle min-folds a bounded
    // recursive CTE accumulating weight along ≤3-edge walks.
    Q("gr_sssp",
      (s, dir) => {
        val pts = suppPoints(s, dir)
        val e0 = SpatialJoins.gridSelfJoin(
            pts, "s_suppkey", "lat", "lon", radiusM = 200.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
            e0.select(col("dst").as("src"), col("src").as("dst")))
          .withColumn("w", pmod(col("src") * 31 + col("dst"), lit(7)) + 1)
        val seeds = pts.where(pmod(col("s_suppkey"), lit(10)) === 1)
          .select(col("s_suppkey").as("node"))
        PageRank.shortestPaths(bidir, seeds, maxRounds = 3)
      },
      Some(s"""WITH RECURSIVE sup AS ($suppPointsSql),
              |e AS (
              |  SELECT a.s_suppkey AS src, b.s_suppkey AS dst,
              |    (a.s_suppkey * 31 + b.s_suppkey) % 7 + 1 AS w
              |  FROM sup a JOIN sup b
              |    ON a.s_suppkey <> b.s_suppkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 200.0),
              |seeds AS (
              |  SELECT s_suppkey AS node FROM sup WHERE s_suppkey % 10 = 1),
              |walk(node, hops, wt) AS (
              |  SELECT node, 0, CAST(0 AS BIGINT) FROM seeds
              |  UNION ALL
              |  SELECT e.dst, wk.hops + 1, wk.wt + e.w
              |  FROM walk wk JOIN e ON e.src = wk.node
              |  WHERE wk.hops < 3)
              |SELECT node, CAST(min(wt) AS BIGINT) AS dist
              |FROM walk GROUP BY node""".stripMargin)),

    // GR: bounded k-core peeling — 3 synchronous rounds of deleting
    // nodes whose surviving-subgraph degree is < 3 (the fixpoint is the
    // exact 3-core; synchronous removal makes the bounded version
    // order-independent and deterministic). One partial-agg degree
    // count + two semi-joins per round, edge set shrinking
    // monotonically; the oracle unrolls the identical rounds as
    // chained CTE stages.
    Q("gr_kcore",
      (s, dir) => {
        // the customer lattice is a genuine 2-D grid (the supplier strip
        // is near-1-D with max degree 2 — its 3-core is empty); at 250 m
        // lat/lon neighbors connect (222/170 m) but diagonals (280 m)
        // don't, so peeling eats exactly one boundary layer per round
        val pts = custPoints(s, dir)
        val e0 = SpatialJoins.gridSelfJoin(
            pts, "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        PageRank.kCorePeel(bidir, k = 3, rounds = 3)
      },
      Some {
        def peel(i: Int) =
          s"""k$i AS (SELECT src AS node FROM e${i - 1}
             |  GROUP BY src HAVING count(*) >= 3),
             |e$i AS (SELECT e.src, e.dst FROM e${i - 1} e
             |  WHERE e.src IN (SELECT node FROM k$i)
             |    AND e.dst IN (SELECT node FROM k$i))""".stripMargin
        s"""WITH pts AS ($custPointsSql),
           |e0 AS (
           |  SELECT a.c_custkey AS src, b.c_custkey AS dst
           |  FROM pts a JOIN pts b
           |    ON a.c_custkey <> b.c_custkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
           |${(1 to 3).map(peel).mkString(",\n")}
           |SELECT src AS node, count(*) AS deg FROM e3 GROUP BY src"""
          .stripMargin
      }),

    // GR: HITS hubs & authorities over the DIRECTED customer lattice
    // (a_id < b_id — low ids feed high ids, so hub and authority mass
    // genuinely separate; the 2-D grid gives a non-uniform score
    // distribution, unlike the near-1-D supplier strip whose HITS
    // scores collapse to a constant). Fixed 5 rounds, L1 norm per
    // half-step (no sqrt — the oracle composes identical IEEE
    // shapes), output rounds to 6 like the PageRank rows. The oracle
    // CTEs are MATERIALIZED (DuckDB-only hint; this SQL never runs in
    // Spark): without it single-referenced CTEs inline recursively
    // and the unrolled 5-round tree re-evaluates the lattice join
    // 2^rounds times.
    Q("gr_hits",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        PageRank.hits(edges, iterations = 5)
          .select(col("node"), (round(col("hub"), 6) + 0.0).as("hub"),
            (round(col("auth"), 6) + 0.0).as("auth"))
      },
      Some {
        val iterSql = (k: Int) =>
          s"""ar$k AS MATERIALIZED (
             |  SELECT e.dst AS node, sum(h.hub) AS raw
             |  FROM e JOIN h${k - 1} h ON e.src = h.node GROUP BY e.dst),
             |an$k AS MATERIALIZED (SELECT sum(raw) AS s FROM ar$k),
             |a$k AS MATERIALIZED (
             |  SELECT nd.node, coalesce(ar.raw, 0e0) / an.s AS auth
             |  FROM nodes nd CROSS JOIN an$k an
             |  LEFT JOIN ar$k ar ON nd.node = ar.node),
             |hr$k AS MATERIALIZED (
             |  SELECT e.src AS node, sum(a.auth) AS raw
             |  FROM e JOIN a$k a ON e.dst = a.node GROUP BY e.src),
             |hn$k AS MATERIALIZED (SELECT sum(raw) AS s FROM hr$k),
             |h$k AS MATERIALIZED (
             |  SELECT nd.node, coalesce(hr.raw, 0e0) / hn.s AS hub
             |  FROM nodes nd CROSS JOIN hn$k hn
             |  LEFT JOIN hr$k hr ON nd.node = hr.node)"""
        s"""WITH pts AS MATERIALIZED ($custPointsSql),
           |e AS MATERIALIZED (
           |  SELECT a.c_custkey AS src, b.c_custkey AS dst
           |  FROM pts a JOIN pts b
           |    ON a.c_custkey < b.c_custkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
           |nodes AS MATERIALIZED (
           |  SELECT src AS node FROM e UNION SELECT dst FROM e),
           |h0 AS MATERIALIZED (SELECT node, 1e0 AS hub FROM nodes),
           |${(1 to 5).map(iterSql).mkString(",\n")}
           |SELECT h5.node, round(h5.hub, 6) + 0e0 AS hub,
           |  round(a5.auth, 6) + 0e0 AS auth
           |FROM h5 JOIN a5 ON h5.node = a5.node""".stripMargin
      }),

    // GR: EXACT bounded-radius harmonic centrality over the undirected
    // customer lattice — sum of 1/d(u,v) over all u within 3 hops
    // (Boldi & Vigna 2014's recommended geometric centrality). Pair-state
    // multi-source BFS; per-node distance histogram folds as
    // c1/1 + c2/2 + c3/3 in fixed order (exact integer counts, so the
    // double is order-proof). Quadratic pair state by nature — this is
    // the small-graph cross-check that calibrates gr_hyperball, the
    // sketch-state scale path (the dd_blocking_quality exact/sampled
    // pairing applied to centrality).
    Q("gr_harmonic",
      (s, dir) => {
        val e0 = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        PageRank.harmonicExact(bidir, maxHops = 3)
          .select(col("node"),
            (round(col("harmonic"), 6) + 0.0).as("harmonic"))
      },
      Some(s"""WITH RECURSIVE pts AS MATERIALIZED ($custPointsSql),
              |e AS MATERIALIZED (
              |  SELECT a.c_custkey AS src, b.c_custkey AS dst
              |  FROM pts a JOIN pts b
              |    ON a.c_custkey <> b.c_custkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
              |walk(src, node, d) AS (
              |  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM e)
              |  UNION ALL
              |  SELECT w.src, e.dst, w.d + 1
              |  FROM walk w JOIN e ON e.src = w.node WHERE w.d < 3),
              |md AS MATERIALIZED (
              |  SELECT src, node, min(d) AS d FROM walk GROUP BY src, node)
              |SELECT node,
              |  round(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) / 1e0
              |    + sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) / 2e0
              |    + sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) / 3e0, 6) + 0e0
              |    AS harmonic
              |FROM md WHERE d >= 1 GROUP BY node""".stripMargin)),

    // GR: bounded-radius closeness — r/Σd over the ≤3-hop ball, the
    // truncated classic form beside gr_harmonic (one shared pair-BFS
    // helper; integer count and sum, one division per node). The oracle
    // reuses gr_harmonic's walk chain with the closeness fold.
    Q("gr_closeness",
      (s, dir) => {
        val e0 = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        PageRank.closenessExact(bidir, maxHops = 3)
          .select(col("node"),
            (round(col("closeness"), 6) + 0.0).as("closeness"))
      },
      Some(s"""WITH RECURSIVE pts AS MATERIALIZED ($custPointsSql),
              |e AS MATERIALIZED (
              |  SELECT a.c_custkey AS src, b.c_custkey AS dst
              |  FROM pts a JOIN pts b
              |    ON a.c_custkey <> b.c_custkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
              |walk(src, node, d) AS (
              |  SELECT src, src, 0 FROM (SELECT DISTINCT src FROM e)
              |  UNION ALL
              |  SELECT w.src, e.dst, w.d + 1
              |  FROM walk w JOIN e ON e.src = w.node WHERE w.d < 3),
              |md AS MATERIALIZED (
              |  SELECT src, node, min(d) AS d FROM walk GROUP BY src, node)
              |SELECT node,
              |  round(CAST(count(*) AS DOUBLE) / sum(d), 6) + 0e0
              |    AS closeness
              |FROM md WHERE d >= 1 GROUP BY node""".stripMargin)),

    // GR: HyperBall (Boldi & Vigna, ICDMW 2013) — approximate harmonic
    // centrality for EVERY node via HLL registers (p=6, m=64) max-merged
    // along in-edges for 3 rounds; after round h a node's registers ARE
    // the exact HLL sketch of its ball (register max commutes with set
    // union — spec'd as an identity). THE 100 TB centrality path: state
    // is one 64-slot register array per node where the exact row carries
    // a pair row per reachable vertex. Deterministic under the md5
    // parity hash, so even the ESTIMATE is oracle-exact (the sk_hll
    // discipline). Runs the PACKED layout — 3.5x over the exploded
    // register-tuple form at the sf1 probe (fresh-JVM interleaved A/B,
    // SCALE.md r14; bit-identical outputs spec'd, so the oracle replays
    // the exploded form unchanged).
    Q("gr_hyperball",
      (s, dir) => {
        val e0 = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        PageRank.hyperBallPacked(bidir, maxHops = 3, p = 6)
          .select(col("node"),
            (round(col("harmonic_est"), 4) + 0.0).as("harmonic_est"))
      },
      Some(hyperBallOracleSql(
        """SELECT node,
          |  round((n1.est - n0.est) / 1e0 + (n2.est - n1.est) / 2e0
          |    + (n3.est - n2.est) / 3e0, 4) + 0e0 AS harmonic_est
          |FROM n0 JOIN n1 USING (node) JOIN n2 USING (node)
          |  JOIN n3 USING (node)""".stripMargin))),

    // GR: CLOSENESS off the SAME HyperBall register propagation — the
    // sketch-state counterpart gr_closeness lacked (the Boldi-Vigna
    // point: the per-round ball-size estimates support ALL geometric
    // centralities, so this row and gr_hyperball differ only in the
    // final fold): r̂/Σd̂ with r̂ = N̂_3 − N̂_0 and
    // Σd̂ = Σ_h h·(N̂_h − N̂_{h−1}) — the truncated r/Σd gr_closeness
    // computes exactly, with ball sizes replaced by HLL estimates. The
    // quadratic exact leg is now the CALIBRATION tool for both folds.
    Q("gr_hyperball_closeness",
      (s, dir) => {
        val e0 = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        PageRank.hyperBallCloseness(bidir, maxHops = 3, p = 6)
          .select(col("node"),
            (round(col("closeness_est"), 4) + 0.0).as("closeness_est"))
      },
      Some(hyperBallOracleSql(
        """SELECT node,
          |  round((n3.est - n0.est) /
          |    (1e0 * (n1.est - n0.est) + 2e0 * (n2.est - n1.est)
          |      + 3e0 * (n3.est - n2.est)), 4) + 0e0 AS closeness_est
          |FROM n0 JOIN n1 USING (node) JOIN n2 USING (node)
          |  JOIN n3 USING (node)""".stripMargin))),

    // GR: STRONGLY connected components over a DIRECTED customer graph —
    // hash-pivot forward-backward decomposition (Fleischer et al. 2000;
    // ConnectedComponents.scc), the directed counterpart undirected CC
    // over-merges (link-graph curation is SCC-shaped: spam rings are
    // mutual-reachability classes). Graph: every customer points at its
    // nation's hub (min custkey); hubs form a directed ring with a
    // doubling chord (diameter O(log #hubs), so BFS rounds stay flat as
    // customers scale); hubs point back at every 7th member. Truth: one
    // big SCC = all hubs + the %7 members (mutual with their hub), all
    // other customers singletons. The hub frames are model-sized (≤25
    // rows); the member joins are keyed on nationkey. The oracle is an
    // independent exact-closure replay: recursive reachability + the
    // mutual-pair min — no FW-BW logic shared with the engine.
    Q("gr_scc",
      (s, dir) => {
        val cust = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))
        val hubs = cust.groupBy(col("c_nationkey").as("nk"))
          .agg(min("c_custkey").as("hub"))
        val hr = hubs.select(col("hub"),
          row_number().over(Window.orderBy("nk")).cast("long").as("rn"),
          count(lit(1)).over(Window.partitionBy()).as("hcnt"))
        val e1 = cust.join(hubs, col("c_nationkey") === col("nk"))
          .where(col("c_custkey") =!= col("hub"))
          .select(col("c_custkey").as("src"), col("hub").as("dst"))
        val ha = hr.select(col("hub").as("a_hub"), col("rn").as("a_rn"),
          col("hcnt"))
        val hb = hr.select(col("hub").as("b_hub"), col("rn").as("b_rn"))
        val e2a = ha.join(hb,
            col("b_rn") === pmod(col("a_rn"), col("hcnt")) + 1 &&
              col("b_rn") =!= col("a_rn"))
          .select(col("a_hub").as("src"), col("b_hub").as("dst"))
        val e2b = ha.join(hb,
            col("b_rn") === pmod(col("a_rn") * 2, col("hcnt")) + 1 &&
              col("b_rn") =!= col("a_rn"))
          .select(col("a_hub").as("src"), col("b_hub").as("dst"))
        val e3 = cust.join(hubs, col("c_nationkey") === col("nk"))
          .where(pmod(col("c_custkey"), lit(7)) === 0 &&
            col("c_custkey") =!= col("hub"))
          .select(col("hub").as("src"), col("c_custkey").as("dst"))
        ConnectedComponents.scc(
          e1.union(e2a).union(e2b).union(e3).distinct())
      },
      Some("""WITH RECURSIVE hubs AS MATERIALIZED (
             |  SELECT c_nationkey AS nk, min(c_custkey) AS hub
             |  FROM customer GROUP BY 1),
             |hr AS MATERIALIZED (
             |  SELECT hub, row_number() OVER (ORDER BY nk) AS rn,
             |    count(*) OVER () AS hcnt FROM hubs),
             |e AS MATERIALIZED (
             |  SELECT DISTINCT src, dst FROM (
             |    SELECT c.c_custkey AS src, h.hub AS dst
             |    FROM customer c JOIN hubs h ON c.c_nationkey = h.nk
             |    WHERE c.c_custkey <> h.hub
             |    UNION ALL
             |    SELECT a.hub, b.hub FROM hr a JOIN hr b
             |      ON b.rn = (a.rn % a.hcnt) + 1 AND b.rn <> a.rn
             |    UNION ALL
             |    SELECT a.hub, b.hub FROM hr a JOIN hr b
             |      ON b.rn = ((2 * a.rn) % a.hcnt) + 1 AND b.rn <> a.rn
             |    UNION ALL
             |    SELECT h.hub, c.c_custkey
             |    FROM customer c JOIN hubs h ON c.c_nationkey = h.nk
             |    WHERE c.c_custkey % 7 = 0 AND c.c_custkey <> h.hub)),
             |walk(s, d) AS (
             |  SELECT src, dst FROM e
             |  UNION
             |  SELECT w.s, e2.dst FROM walk w JOIN e e2 ON e2.src = w.d),
             |nodes AS MATERIALIZED (
             |  SELECT src AS node FROM e UNION SELECT dst FROM e),
             |mut AS MATERIALIZED (
             |  SELECT a.s AS u, a.d AS v FROM walk a
             |  JOIN walk b ON a.s = b.d AND a.d = b.s)
             |SELECT n.node,
             |  least(n.node, coalesce(min(m.u), n.node)) AS scc
             |FROM nodes n LEFT JOIN mut m ON m.v = n.node
             |GROUP BY n.node""".stripMargin)),

    // GR: bounded-radius sampled-source betweenness (Brandes 2001 with
    // the two standard scale reductions: Brandes-Pich source sampling +
    // a 3-hop path radius). Forward pass counts shortest paths σ
    // integer-exactly; backward pass unrolls dependency accumulation
    // level by level in the fixed shape (σv/σw)·(1+δw), which the
    // oracle replays operation for operation. The source sample size is
    // the cost dial — state is the SAMPLE's ball mass, never all-pairs.
    Q("gr_betweenness",
      (s, dir) => {
        val pts = custPoints(s, dir)
        val e0 = SpatialJoins.gridSelfJoin(
            pts, "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        val bidir = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        val seeds = pts.where(pmod(col("c_custkey"), lit(100)) === 1)
          .select(col("c_custkey").as("node"))
        PageRank.betweennessBounded(bidir, seeds, maxHops = 3)
          .select(col("node"), (round(col("bc"), 6) + 0.0).as("bc"))
      },
      Some {
        val lvl = (h: Int) =>
          s"""d$h AS MATERIALIZED (
             |  SELECT v.s, v.node,
             |    coalesce(sum((CAST(v.sigma AS DOUBLE) / wsig.sigma)
             |      * (1e0 + dw.delta)), 0e0) AS delta
             |  FROM sig v
             |  LEFT JOIN e ON e.src = v.node
             |  LEFT JOIN sig wsig ON wsig.s = v.s AND wsig.node = e.dst
             |    AND wsig.d = ${h + 1}
             |  LEFT JOIN d${h + 1} dw ON dw.s = v.s AND dw.node = e.dst
             |  WHERE v.d = $h
             |  GROUP BY v.s, v.node)"""
        s"""WITH RECURSIVE pts AS MATERIALIZED ($custPointsSql),
           |e AS MATERIALIZED (
           |  SELECT a.c_custkey AS src, b.c_custkey AS dst
           |  FROM pts a JOIN pts b
           |    ON a.c_custkey <> b.c_custkey
           |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
           |seeds AS (SELECT c_custkey AS node FROM pts
           |  WHERE c_custkey % 100 = 1),
           |walk(s, node, d) AS (
           |  SELECT node, node, 0 FROM seeds
           |  UNION ALL
           |  SELECT w.s, e.dst, w.d + 1
           |  FROM walk w JOIN e ON e.src = w.node WHERE w.d < 3),
           |md AS MATERIALIZED (
           |  SELECT s, node, min(d) AS d FROM walk GROUP BY s, node),
           |sig AS MATERIALIZED (
           |  SELECT w.s, w.node, m.d, count(*) AS sigma
           |  FROM walk w JOIN md m
           |    ON w.s = m.s AND w.node = m.node AND w.d = m.d
           |  GROUP BY w.s, w.node, m.d),
           |d3 AS MATERIALIZED (
           |  SELECT s, node, 0e0 AS delta FROM sig WHERE d = 3),
           |${lvl(2)},
           |${lvl(1)}
           |SELECT node, round(sum(delta), 6) + 0e0 AS bc
           |FROM (SELECT s, node, delta FROM d1
           |  UNION ALL SELECT s, node, delta FROM d2
           |  UNION ALL SELECT s, node, delta FROM d3)
           |GROUP BY node""".stripMargin
      }),

    // GR: common-neighbor link prediction over the customer proximity
    // graph — non-adjacent pairs sharing >= 2 neighbors, scored by
    // common-neighbor count, Jaccard, and Adamic-Adar. Wedge enumeration
    // centered on each shared neighbor (degree-capped against hub
    // blow-up); the oracle composes the identical per-wedge 1/ln(d)
    // terms so the doubles agree at 6-decimal rounding.
    Q("gr_link_predict",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        PageRank.linkPredict(edges, minCommon = 2)
      },
      Some(s"""WITH pts AS MATERIALIZED ($custPointsSql),
              |e AS MATERIALIZED (
              |  SELECT a.c_custkey AS a, b.c_custkey AS b
              |  FROM pts a JOIN pts b
              |    ON a.c_custkey < b.c_custkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
              |adj AS MATERIALIZED (
              |  SELECT a AS n, b AS nbr FROM e
              |  UNION ALL SELECT b, a FROM e),
              |deg AS MATERIALIZED (
              |  SELECT n, count(*) AS d FROM adj GROUP BY n),
              |ctr AS MATERIALIZED (
              |  SELECT adj.n, adj.nbr, deg.d FROM adj
              |  JOIN deg ON adj.n = deg.n WHERE deg.d <= 10000),
              |w AS MATERIALIZED (
              |  SELECT c1.nbr AS x, c2.nbr AS y, c1.d
              |  FROM ctr c1 JOIN ctr c2 ON c1.n = c2.n AND c1.nbr < c2.nbr),
              |s AS MATERIALIZED (
              |  SELECT x, y, count(*) AS cn, sum(1e0 / ln(d)) AS aa
              |  FROM w GROUP BY x, y),
              |cand AS (
              |  SELECT * FROM s WHERE cn >= 2 AND NOT EXISTS
              |    (SELECT 1 FROM e WHERE e.a = s.x AND e.b = s.y))
              |SELECT c.x, c.y, c.cn,
              |  round(c.cn / (dx.d + dy.d - c.cn), 6) + 0e0 AS jaccard,
              |  round(c.aa, 6) + 0e0 AS adamic_adar
              |FROM cand c
              |JOIN deg dx ON c.x = dx.n
              |JOIN deg dy ON c.y = dy.n""".stripMargin)),

    // GR: the linkPredict degree-cap AUDIT as a first-class row — the
    // repo's "no silent caps" rule, oracle-checked. The lattice graph's
    // max degree is 4 (E/W 171 m + N/S 222 m neighbors make the 250 m
    // cut, diagonals at 280 m don't), so a cap of 3 flags exactly the
    // interior lattice points.
    Q("gr_link_capped",
      (s, dir) => {
        val edges = SpatialJoins.gridSelfJoin(
            custPoints(s, dir), "c_custkey", "lat", "lon", radiusM = 250.0)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        PageRank.cappedCenterCount(edges, maxCenterDegree = 3)
          .select(col("n_capped_centers"))
      },
      Some(s"""WITH pts AS MATERIALIZED ($custPointsSql),
              |e AS (
              |  SELECT a.c_custkey AS a, b.c_custkey AS b
              |  FROM pts a JOIN pts b
              |    ON a.c_custkey < b.c_custkey
              |    AND ${havSql("a.lat", "a.lon", "b.lat", "b.lon")} <= 250.0),
              |adj AS (
              |  SELECT a AS n FROM e UNION ALL SELECT b FROM e),
              |deg AS (SELECT n, count(*) AS d FROM adj GROUP BY n)
              |SELECT CAST(sum(CASE WHEN d > 3 THEN 1 ELSE 0 END) AS BIGINT)
              |  AS n_capped_centers
              |FROM deg""".stripMargin)),

    // ST: ordered conversion funnel over the event log — earliest-
    // completion greedy matching (step i+1 strictly after the earliest
    // valid completion of step i), one partial-aggregatable shuffle per
    // step, no per-user event list ever materialized.
    Q("st_funnel",
      (s, dir) => Funnel.funnelDepth(t(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase")),
      Some("""WITH v AS (
             |  SELECT user_id, min(ts) AS t0 FROM events
             |  WHERE event_type = 'view' GROUP BY user_id),
             |c AS (
             |  SELECT e.user_id, min(e.ts) AS t1
             |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t0
             |  WHERE e.event_type = 'click' GROUP BY e.user_id),
             |p AS (
             |  SELECT e.user_id, min(e.ts) AS t2
             |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t1
             |  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
             |SELECT u.user_id,
             |  (CASE WHEN v.t0 IS NOT NULL THEN 1 ELSE 0 END +
             |   CASE WHEN c.t1 IS NOT NULL THEN 1 ELSE 0 END +
             |   CASE WHEN p.t2 IS NOT NULL THEN 1 ELSE 0 END) AS depth
             |FROM (SELECT DISTINCT user_id FROM events) u
             |LEFT JOIN v ON u.user_id = v.user_id
             |LEFT JOIN c ON u.user_id = c.user_id
             |LEFT JOIN p ON u.user_id = p.user_id""".stripMargin)),

    // K10: Z-order layout roundtrip — rewrite points clustered on the
    // (lat, lon) Morton curve, read back through a lat band; values must
    // survive the interleave/sort/write/scan unchanged (the pruning WIN
    // is pinned by the OperatorsSpec file-min/max test; this row pins
    // correctness of the layout path end-to-end).
    Q("k10_zorder_roundtrip",
      (s, dir) => {
        val out = s"/tmp/graft_zorder_rt_${new java.io.File(dir).getName}"
        Layout.zorderWrite(custPoints(s, dir).select("c_custkey", "lat", "lon"),
          Seq(("lat", 40.0, 40.2), ("lon", -75.0, -74.8)), out, numFiles = 8)
        s.read.parquet(out)
          .where(col("lat") >= 40.05 && col("lat") < 40.1)
          .agg(count(lit(1)).as("n"), sum("c_custkey").as("key_sum"))
      },
      Some(s"""WITH pts AS ($custPointsSql)
              |SELECT count(*) AS n, CAST(sum(c_custkey) AS BIGINT) AS key_sum
              |FROM pts WHERE lat >= 4.005e1 AND lat < 4.01e1""".stripMargin)),

    // SK: bloom-pruned exact semi join — fact rows are dropped by a
    // compact driver-held sketch BEFORE the join shuffle (Catalyst's
    // runtime-filter pattern as an explicit operator); the exact semi
    // join over survivors makes false positives invisible, so the result
    // is precisely the plain IN-subquery's.
    Q("sk_bloom_prune",
      (s, dir) => Prune.bloomSemiJoin(
          t(s, dir, "lineitem"), "l_partkey",
          t(s, dir, "part").where(col("p_size") >= 48).select("p_partkey"),
          "p_partkey", expectedKeys = 4096, numBits = 1L << 16)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("revenue")),
      Some("""SELECT l_returnflag, count(*) AS n,
             |  round(sum(l_extendedprice), 2) AS revenue
             |FROM lineitem
             |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 48)
             |GROUP BY l_returnflag""".stripMargin)),

    // DS: deterministic train/val/test split — hash the stable doc id (not
    // position, not random()) so membership is reproducible across runs,
    // cluster layouts, and re-partitioning, and survives appends without
    // reshuffling old docs between splits. The md5-derived bucket is the
    // cross-engine-stable randomness rule (SparkEntry header note).
    Q("ds_train_split",
      (s, dir) => {
        val bucket = pmod(
          Dedup.md5Hash32(col("doc_id").cast("string"), lit(42)), lit(100L))
        t(s, dir, "documents")
          .select(col("doc_id"), bucket.as("bucket"))
          .withColumn("split",
            when(col("bucket") < 80, lit("train"))
              .when(col("bucket") < 90, lit("val")).otherwise(lit("test")))
      },
      Some(s"""SELECT doc_id,
              |  ${h32Sql("CAST(doc_id AS VARCHAR)", "42")} % 100 AS bucket,
              |  CASE WHEN ${h32Sql("CAST(doc_id AS VARCHAR)", "42")} % 100 < 80
              |    THEN 'train'
              |    WHEN ${h32Sql("CAST(doc_id AS VARCHAR)", "42")} % 100 < 90
              |    THEN 'val' ELSE 'test' END AS split
              |FROM documents""".stripMargin)),

    // DS: LEAKAGE-SAFE split — ds_train_split's per-doc hash puts
    // ~split-fraction of every near-dup cluster on each side, so test
    // docs have train near-dups (benchmark leakage). Here the split
    // unit is the connected component of the MinHash near-dup graph:
    // cluster members land together by construction, singletons reduce
    // to the per-doc split. The oracle replays candidate generation,
    // verify, components (the dd_cluster_keep chain, shared SQL), and
    // the hash cut.
    Q("ds_split_leakage",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val pairs = Dedup.minHashLSH(docs, "doc_id", "text",
            shingleN = 3, bands = 8, rowsPerBand = 2, simThreshold = 0.5)
          .select(col("a_id").as("src"), col("b_id").as("dst"))
        Sampling.leakageSafeSplit(docs, "doc_id", pairs, seed = 42,
          trainPct = 80, valPct = 10)
      },
      Some {
        val comp = "coalesce(c.component, d.doc_id)"
        val b = s"${h32Sql(s"CAST($comp AS VARCHAR)", "42")} % 100"
        s"""WITH RECURSIVE $minhashBandedSql,
           |$lshComponentsSql
           |SELECT d.doc_id, $comp AS component, $b AS bucket,
           |  CASE WHEN $b < 80 THEN 'train'
           |    WHEN $b < 90 THEN 'val' ELSE 'test' END AS split
           |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node"""
          .stripMargin
      }),

    // DS: deterministic epoch-seeded shard shuffle — the dataloader
    // export: shard = uniform hash, position = rank by an independent
    // second hash within the shard. Same seed replays bit-identically on
    // any cluster layout (resumable training reads the same byte order);
    // a different seed is the next epoch's independent permutation.
    Q("ds_shard_shuffle",
      (s, dir) => Sampling.shardShuffle(
        t(s, dir, "documents"), "doc_id", nShards = 8, seed = 7),
      Some(s"""WITH h AS (SELECT doc_id,
              |  ${h32Sql("CAST(doc_id AS VARCHAR)", "7")} AS h1,
              |  ${h32Sql("CAST(doc_id AS VARCHAR)", "8")} AS h2
              |  FROM documents)
              |SELECT doc_id, CAST(h1 % 8 AS INT) AS shard,
              |  CAST(row_number() OVER (PARTITION BY h1 % 8
              |    ORDER BY h2, doc_id) AS BIGINT) AS pos
              |FROM h""".stripMargin)),

    // SK: HyperLogLog distinct-count sketch (p=12, m=4096 registers) per
    // order priority, next to the exact count it approximates. The whole
    // point at 100 TB: the exact global COUNT DISTINCT shuffles every
    // distinct value, the sketch shuffles <=4096 register rows per group
    // per task (map-side max-combine). Deterministic under the md5 parity
    // hash, leading-zero rank via binary-string length (integer-exact in
    // both engines), register fold sums exact powers of two (order-proof
    // in IEEE double) — so even the ESTIMATE is oracle-exact.
    Q("sk_hll_distinct",
      (s, dir) => {
        val est = Sketches.hllDistinct(
          t(s, dir, "orders"), Seq("o_orderpriority"), "o_custkey", p = 12)
        val exact = t(s, dir, "orders").groupBy("o_orderpriority")
          .agg(countDistinct("o_custkey").as("exact"))
        est.join(exact, Seq("o_orderpriority"))
          .select(col("o_orderpriority"),
            (round(col("hll_estimate"), 4) + 0.0).as("est"), col("exact"))
      },
      Some {
        val hv = h32Sql("CAST(o_custkey AS VARCHAR)", "0")
        s"""WITH h AS (
           |  SELECT o_orderpriority AS grp, $hv AS hv FROM orders),
           |regs AS (
           |  SELECT grp, hv >> 20 AS idx,
           |    max(CASE WHEN (hv & 1048575) = 0 THEN 21
           |        ELSE 20 - (length(bin(hv & 1048575)) - 1) END) AS mj
           |  FROM h GROUP BY grp, idx),
           |folded AS (
           |  SELECT grp, sum(pow(2e0, -mj)) AS s_present,
           |    count(*) AS present FROM regs GROUP BY grp),
           |est AS (
           |  SELECT grp,
           |    (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
           |      / (s_present + (4096 - present)) AS raw,
           |    CAST(4096 - present AS DOUBLE) AS v
           |  FROM folded),
           |ex AS (SELECT o_orderpriority AS grp,
           |       count(DISTINCT o_custkey) AS exact FROM orders GROUP BY grp)
           |SELECT grp AS o_orderpriority,
           |  round(CASE
           |    WHEN raw <= 2.5 * 4096 AND v > 0 THEN 4096e0 * ln(4096e0 / v)
           |    WHEN raw > 4294967296e0 / 30 THEN
           |      -4294967296e0 * ln(1 - raw / 4294967296e0)
           |    ELSE raw END, 4) + 0e0 AS est,
           |  exact
           |FROM est JOIN ex USING (grp)""".stripMargin
      }),

    // SK: MERGEABLE HLL rollup — per-day register tables (the
    // persistable daily sketch a 100 TB pipeline writes at ingest)
    // max-merged across days WITHOUT re-scanning events, then estimated.
    // Register max commutes with sharding, so the merged estimate is
    // bit-identical to the direct one (SketchSpec pins the identity);
    // the oracle computes the direct form, which is the same number by
    // that identity. Merge input is <= m rows per (group, day) — KB of
    // sketch state, never data.
    Q("sk_hll_merge",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .withColumn("day", date_trunc("day", col("ts")))
        val daily = Sketches.hllRegisters(
          ev, Seq("event_type", "day"), "user_id", p = 12)
        val est = Sketches.hllEstimate(
          Sketches.hllMerge(daily, Seq("event_type")), Seq("event_type"),
          p = 12)
        val exact = t(s, dir, "events").groupBy("event_type")
          .agg(countDistinct("user_id").as("exact"))
        val shards = daily.select("event_type", "day").distinct()
          .groupBy("event_type").agg(count(lit(1)).as("n_shards"))
        est.join(exact, Seq("event_type")).join(shards, Seq("event_type"))
          .select(col("event_type"),
            (round(col("hll_estimate"), 4) + 0.0).as("est"),
            col("exact"), col("n_shards"))
      },
      Some {
        val hv = h32Sql("CAST(user_id AS VARCHAR)", "0")
        s"""WITH h AS (
           |  SELECT event_type AS grp, $hv AS hv FROM events),
           |regs AS (
           |  SELECT grp, hv >> 20 AS idx,
           |    max(CASE WHEN (hv & 1048575) = 0 THEN 21
           |        ELSE 20 - (length(bin(hv & 1048575)) - 1) END) AS mj
           |  FROM h GROUP BY grp, idx),
           |folded AS (
           |  SELECT grp, sum(pow(2e0, -mj)) AS s_present,
           |    count(*) AS present FROM regs GROUP BY grp),
           |est AS (
           |  SELECT grp,
           |    (0.7213 / (1 + 1.079 / 4096.0)) * 4096.0 * 4096.0
           |      / (s_present + (4096 - present)) AS raw,
           |    CAST(4096 - present AS DOUBLE) AS v
           |  FROM folded),
           |ex AS (SELECT event_type AS grp,
           |       count(DISTINCT user_id) AS exact FROM events GROUP BY grp),
           |sh AS (SELECT event_type AS grp,
           |       count(DISTINCT date_trunc('day', ts)) AS n_shards
           |       FROM events GROUP BY grp)
           |SELECT grp AS event_type,
           |  round(CASE
           |    WHEN raw <= 2.5 * 4096 AND v > 0 THEN 4096e0 * ln(4096e0 / v)
           |    WHEN raw > 4294967296e0 / 30 THEN
           |      -4294967296e0 * ln(1 - raw / 4294967296e0)
           |    ELSE raw END, 4) + 0e0 AS est,
           |  exact, n_shards
           |FROM est JOIN ex USING (grp) JOIN sh USING (grp)""".stripMargin
      }),

    // SK: mergeable QUANTILE sketch — fixed-range equi-width histogram
    // (1024 buckets over the known price domain) + interpolated
    // quantile read-off. The histogram is the persistable/additive
    // state (histMerge identity spec'd); the cumulative walk is over
    // <= 1024 sketch rows, never data. Deterministic by construction
    // (unlike t-digest/KLL), so the oracle replays it exactly; emitted
    // values use the floor(v*1e4+0.5)/1e4 quantization because dyadic
    // bucket edges make decimal-round midpoints reachable.
    Q("sk_hist_quantile",
      (s, dir) => {
        val hist = Sketches.histogramCounts(
          t(s, dir, "lineitem"), "l_extendedprice",
          lo = 0.0, hi = 122880.0, bins = 1024)
        Sketches.histQuantiles(hist, Seq(0.5, 0.9, 0.99),
          lo = 0.0, hi = 122880.0, bins = 1024)
      },
      Some("""WITH h AS (
             |  SELECT least(1023, greatest(0, CAST(floor(
             |      (l_extendedprice - 0e0) / 122880e0 * 1024e0) AS INT)))
             |    AS bucket, count(*) AS cnt
             |  FROM lineitem GROUP BY 1),
             |c AS (
             |  SELECT bucket, CAST(cnt AS DOUBLE) AS cnt,
             |    CAST(sum(cnt) OVER (ORDER BY bucket) AS DOUBLE) AS cum
             |  FROM h),
             |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM h),
             |q AS (SELECT unnest([5e-1, 9e-1, 99e-2]) AS q),
             |pick AS (
             |  SELECT q, min(bucket) AS bucket
             |  FROM q CROSS JOIN n CROSS JOIN c
             |  WHERE cum >= q * n GROUP BY q),
             |sel AS (
             |  SELECT p.q, c.bucket, c.cnt, c.cum, n.n
             |  FROM pick p JOIN c ON p.bucket = c.bucket CROSS JOIN n)
             |SELECT q,
             |  floor((0e0 + 120e0 * (CAST(bucket AS DOUBLE) +
             |    (q * n - (cum - cnt)) / cnt)) * 1e4 + 5e-1) / 1e4 AS value
             |FROM sel""".stripMargin)),

    // SK: quantiles with NO caller-supplied domain — the two-pass
    // min/max + histogram composition (the deterministic, mergeable
    // alternative to KLL's randomized compaction). Pass 1 is a
    // partial-aggregated global (min, max); pass 2 the histogram sketch
    // under that measured domain. The oracle recomputes both passes.
    Q("sk_auto_quantile",
      (s, dir) => Sketches.autoRangeQuantiles(
        t(s, dir, "lineitem"), "l_extendedprice",
        Seq(0.5, 0.9, 0.99), bins = 1024),
      Some("""WITH vals AS (
             |  SELECT l_extendedprice::DOUBLE AS v FROM lineitem
             |  WHERE l_extendedprice IS NOT NULL),
             |mm AS (SELECT min(v) AS lo, max(v) AS hi FROM vals),
             |h AS (
             |  SELECT least(1023, greatest(0, CAST(floor(
             |      (v - lo) / (hi - lo) * 1024e0) AS INT))) AS bucket,
             |    count(*) AS cnt
             |  FROM vals CROSS JOIN mm GROUP BY 1),
             |c AS (
             |  SELECT bucket, CAST(cnt AS DOUBLE) AS cnt,
             |    CAST(sum(cnt) OVER (ORDER BY bucket) AS DOUBLE) AS cum
             |  FROM h),
             |n AS (SELECT CAST(sum(cnt) AS DOUBLE) AS n FROM h),
             |q AS (SELECT unnest([5e-1, 9e-1, 99e-2]) AS q),
             |pick AS (
             |  SELECT q, min(bucket) AS bucket
             |  FROM q CROSS JOIN n CROSS JOIN c
             |  WHERE cum >= q * n GROUP BY q),
             |sel AS (
             |  SELECT p.q, c.bucket, c.cnt, c.cum, n.n, mm.lo, mm.hi
             |  FROM pick p JOIN c ON p.bucket = c.bucket
             |  CROSS JOIN n CROSS JOIN mm)
             |SELECT q,
             |  floor((lo + (hi - lo) / 1024e0 * (CAST(bucket AS DOUBLE) +
             |    (q * n - (cum - cnt)) / cnt)) * 1e4 + 5e-1) / 1e4 AS value
             |FROM sel""".stripMargin)),

    // SK: count-min frequency sketch (depth 4 x width 1024) over the
    // token multiset, point-queried for a fixed probe list, next to the
    // exact counts. Counter table shuffles at sketch size (<=4096 rows)
    // regardless of corpus size; integer counters make estimate parity
    // exact. est >= exact always (one-sided CMS error).
    Q("sk_cms_freq",
      (s, dir) => {
        val probeToks = Seq("join", "hash", "row", "batch", "scan",
          "customer", "column", "filter", "merge", "vector")
        import s.implicits._
        val toks = t(s, dir, "documents")
          .select(explode(Dedup.tokens(col("text"))).as("tok"))
        val counters = Sketches.cmsBuild(toks, "tok")
        val exact = toks.where(col("tok").isin(probeToks: _*))
          .groupBy("tok").agg(count(lit(1)).as("exact"))
        Sketches.cmsEstimate(counters, probeToks.toDF("tok"), "tok")
          .withColumnRenamed("item", "tok")
          .join(exact, Seq("tok"), "left")
          .select(col("tok"), col("cms_estimate").as("est"),
            coalesce(col("exact"), lit(0L)).as("exact"))
      },
      Some {
        val probeList = "'join', 'hash', 'row', 'batch', 'scan', " +
          "'customer', 'column', 'filter', 'merge', 'vector'"
        s"""WITH toks AS ($toksSql),
           |tok AS (SELECT unnest(tk) AS t_ FROM toks),
           |seeds AS (SELECT unnest([1, 2, 3, 4]) AS seed),
           |counters AS (
           |  SELECT seed, ${h32Sql("t_", "seed")} % 1024 AS bucket,
           |    count(*) AS cnt
           |  FROM tok CROSS JOIN seeds GROUP BY 1, 2),
           |probes AS (SELECT unnest([$probeList]) AS tok),
           |addr AS (SELECT tok, seed, ${h32Sql("tok", "seed")} % 1024 AS bucket
           |         FROM probes CROSS JOIN seeds),
           |est AS (SELECT tok, min(coalesce(cnt, 0)) AS est
           |        FROM addr LEFT JOIN counters USING (seed, bucket)
           |        GROUP BY tok),
           |exact AS (SELECT t_ AS tok, count(*) AS exact FROM tok
           |          WHERE t_ IN ($probeList) GROUP BY 1)
           |SELECT tok, est, coalesce(exact, 0) AS exact
           |FROM est LEFT JOIN exact USING (tok)""".stripMargin
      }),

    // SK: EXACT heavy hitters via sketch-then-verify — phase 1 CMS
    // prefilter (map-side, sketch collected model-sized), phase 2 exact
    // counts over candidate rows only. CMS never underestimates, so the
    // output EQUALS the plain HAVING count >= N query — which is
    // precisely what the oracle states; the sketch phase buys the
    // shuffle reduction, not a different answer.
    Q("sk_heavy_hitters",
      (s, dir) => Sketches.heavyHitters(
        t(s, dir, "documents")
          .select(explode(Dedup.tokens(col("text"))).as("tok")),
        "tok", minCount = 500),
      Some(s"""WITH toks AS ($toksSql),
              |tok AS (SELECT unnest(tk) AS item FROM toks)
              |SELECT item, count(*) AS n
              |FROM tok GROUP BY item HAVING count(*) >= 500""".stripMargin)),

    // SK: heavy-hitters prefilter-selectivity audit — the no-silent-caps
    // rule applied to the sketch: an undersized CMS width degrades the
    // two-phase saving to a full shuffle WITHOUT changing the output
    // (recall is exact either way), so the degradation needs its own
    // oracle-checked row. The oracle replays the CMS addressing and the
    // row-weighted prefilter count.
    Q("sk_hh_selectivity",
      (s, dir) => Sketches.heavyHittersAudit(
        t(s, dir, "documents")
          .select(explode(Dedup.tokens(col("text"))).as("tok")),
        "tok", minCount = 500),
      Some(s"""WITH toks AS ($toksSql),
              |tok AS (SELECT unnest(tk) AS t_ FROM toks),
              |seeds AS (SELECT unnest([1, 2, 3, 4]) AS seed),
              |counters AS (
              |  SELECT seed, ${h32Sql("t_", "seed")} % 1024 AS bucket,
              |    count(*) AS cnt
              |  FROM tok CROSS JOIN seeds GROUP BY 1, 2),
              |cnt AS (SELECT t_ AS item, count(*) AS c FROM tok GROUP BY 1),
              |addr AS (SELECT item, c, seed,
              |    ${h32Sql("item", "seed")} % 1024 AS bucket
              |  FROM cnt CROSS JOIN seeds),
              |est AS (SELECT item, c, min(coalesce(cnt, 0)) AS est
              |        FROM addr LEFT JOIN counters USING (seed, bucket)
              |        GROUP BY item, c)
              |SELECT CAST(sum(c) AS BIGINT) AS total_rows,
              |  CAST(sum(CASE WHEN est >= 500 THEN c ELSE 0 END) AS BIGINT)
              |    AS candidate_rows,
              |  floor(sum(CASE WHEN est >= 500 THEN c ELSE 0 END)::DOUBLE /
              |    sum(c)::DOUBLE * 1e6 + 5e-1) / 1e6 AS selectivity
              |FROM est""".stripMargin)),

    // SK: KMV bottom-k distinct sketch — the fourth mergeable sketch
    // (HLL counts, CMS frequencies, histogram quantiles; KMV adds SET
    // operations). k smallest distinct parity hashes per group; the
    // bounded Aggregator keeps buffers k-sized through partial agg.
    // Deterministic function of the value SET -> the oracle replays
    // the bottom-k with a row_number scan. Groups that never fill k
    // slots report their EXACT distinct count.
    Q("sk_kmv_distinct",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val sk = Sketches.kmvSketch(ev, Seq("event_type"), "user_id", k = 64)
        val exact = ev.groupBy("event_type")
          .agg(countDistinct("user_id").as("exact"))
        sk.select(col("event_type"), size(col("kmv")).as("n_kept"),
            (floor(Sketches.kmvEstimate(col("kmv"), 64) * lit(1e4) +
              lit(0.5)) / lit(1e4)).as("est"))
          .join(exact, "event_type")
      },
      Some(s"""WITH h AS (
              |  SELECT DISTINCT event_type,
              |    ${h32Sql("user_id::VARCHAR", "0")} AS h
              |  FROM events),
              |r AS (
              |  SELECT event_type, h,
              |    row_number() OVER (PARTITION BY event_type ORDER BY h)
              |      AS rn
              |  FROM h),
              |k AS (
              |  SELECT event_type, count(*) AS n_kept,
              |    max(CASE WHEN rn = 64 THEN h END) AS kth
              |  FROM r WHERE rn <= 64 GROUP BY event_type),
              |ex AS (SELECT event_type, count(DISTINCT user_id) AS exact
              |       FROM events GROUP BY 1)
              |SELECT event_type, CAST(n_kept AS INT) AS n_kept,
              |  floor((CASE WHEN n_kept < 64 THEN n_kept::DOUBLE
              |    ELSE 63e0 * 4294967296e0 / kth::DOUBLE END) * 1e4 + 5e-1)
              |    / 1e4 AS est,
              |  exact
              |FROM k JOIN ex USING (event_type)""".stripMargin)),

    // SK: KMV set-operation estimates — union and INTERSECTION
    // cardinality of two groups' value sets from their k-sized
    // sketches alone (the estimator HLL registers cannot provide
    // without inclusion-exclusion error blowup): bottom-k of the
    // combined hashes sketches the union; the share of it present in
    // both inputs estimates Jaccard; intersection = jaccard * union.
    Q("sk_kmv_intersect",
      (s, dir) => {
        val ev = t(s, dir, "events")
          .where(col("event_type").isin("click", "purchase"))
        val sk = Sketches.kmvSketch(ev, Seq("event_type"), "user_id", k = 64)
        val a = sk.where(col("event_type") === "click")
          .select(col("kmv").as("ka"))
        val b = sk.where(col("event_type") === "purchase")
          .select(col("kmv").as("kb"))
        val u = ev.select("user_id").distinct()
          .agg(count(lit(1)).as("exact_union"))
        val i = t(s, dir, "events").groupBy("user_id")
          .agg(countDistinct(when(col("event_type") === "click",
              lit(1))).as("hc"),
            countDistinct(when(col("event_type") === "purchase",
              lit(1))).as("hp"))
          .where(col("hc") > 0 && col("hp") > 0)
          .agg(count(lit(1)).as("exact_inter"))
        val q = (c: Column) => floor(c * lit(1e4) + lit(0.5)) / lit(1e4)
        a.crossJoin(broadcast(b))
          .withColumn("e", Sketches.kmvSetEstimates(col("ka"), col("kb"), 64))
          .crossJoin(broadcast(u)).crossJoin(broadcast(i))
          .select(q(col("e.est_union")).as("est_union"),
            q(col("e.est_inter")).as("est_inter"),
            col("exact_union"), col("exact_inter"))
      },
      Some(s"""WITH h AS (
              |  SELECT DISTINCT event_type,
              |    ${h32Sql("user_id::VARCHAR", "0")} AS h
              |  FROM events WHERE event_type IN ('click', 'purchase')),
              |r AS (
              |  SELECT event_type, h,
              |    row_number() OVER (PARTITION BY event_type ORDER BY h)
              |      AS rn
              |  FROM h),
              |ka AS (SELECT list(h ORDER BY h) AS ks FROM r
              |       WHERE event_type = 'click' AND rn <= 64),
              |kb AS (SELECT list(h ORDER BY h) AS ks FROM r
              |       WHERE event_type = 'purchase' AND rn <= 64),
              |un AS (
              |  SELECT list_sort(list_distinct(ka.ks || kb.ks))[1:64] AS u,
              |    ka.ks AS a, kb.ks AS b
              |  FROM ka CROSS JOIN kb),
              |est AS (
              |  SELECT
              |    CASE WHEN len(u) < 64 THEN len(u)::DOUBLE
              |      ELSE 63e0 * 4294967296e0 / u[64]::DOUBLE END AS eu,
              |    len(list_intersect(list_intersect(u, a), b))::DOUBLE /
              |      len(u)::DOUBLE AS j
              |  FROM un),
              |exu AS (SELECT count(DISTINCT user_id) AS exact_union
              |        FROM events
              |        WHERE event_type IN ('click', 'purchase')),
              |exi AS (
              |  SELECT count(*) AS exact_inter FROM (
              |    SELECT user_id FROM events GROUP BY user_id
              |    HAVING count(DISTINCT CASE WHEN event_type = 'click'
              |        THEN 1 END) > 0
              |      AND count(DISTINCT CASE WHEN event_type = 'purchase'
              |        THEN 1 END) > 0))
              |SELECT floor(eu * 1e4 + 5e-1) / 1e4 AS est_union,
              |  floor((j * eu) * 1e4 + 5e-1) / 1e4 AS est_inter,
              |  exact_union, exact_inter
              |FROM est CROSS JOIN exu CROSS JOIN exi""".stripMargin)),

    // TA: byte-level BPE token statistics under the COMMITTED merges
    // fixture (graft/bpe_merges.txt, trained deterministically by
    // tools.BpeTrain — the public GPT-2 scheme applied per whitespace
    // word). Real token counts, not the word-count proxy: this is what
    // sequence packing and mixture budgeting actually meter. The
    // oracle replays the encode as a recursive CTE over the DISTINCT
    // words (same min-rank merge loop; one leftmost occurrence per
    // step, equivalent for training-consistent tables — see Bpe's
    // scaladoc and BpeSpec).
    Q("ta_bpe_tokens",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.Bpe.tokenStats(col("text")).as("st"))
        .select(col("doc_id"), col("st._1").as("n_words"),
          col("st._2").as("n_tokens")),
      Some(s"""WITH RECURSIVE
              |${graft.functions.Bpe.oracleCtesSql("documents")},
              |agg AS (
              |  SELECT bw.doc_id, count(*) AS n_words, sum(b.n_tok) AS n_tokens
              |  FROM bpe_words bw JOIN bpe b USING (w)
              |  GROUP BY bw.doc_id)
              |SELECT doc.doc_id,
              |  CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
              |  CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
              |FROM documents doc LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    // DS: sequence packing budgeted by REAL BPE token counts (the
    // ds_pack_sequences shape — contiguous greedy fill into 512-token
    // bins per source shard — with the proxy word count replaced by
    // the tokenizer the training run would actually meter with).
    Q("ds_pack_tokens",
      (s, dir) => {
        val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
          graft.functions.Bpe.tokenCount(col("text")).as("n_tokens"))
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.withColumn("cum", sum("n_tokens").over(w))
          .withColumn("seq_id", expr("(cum - n_tokens) div 512"))
          .select("doc_id", "source", "n_tokens", "seq_id")
      },
      Some(s"""WITH RECURSIVE
              |${graft.functions.Bpe.oracleCtesSql("documents")},
              |agg AS (
              |  SELECT bw.doc_id, CAST(sum(b.n_tok) AS BIGINT) AS n_tokens
              |  FROM bpe_words bw JOIN bpe b USING (w)
              |  GROUP BY bw.doc_id),
              |d AS (
              |  SELECT doc.doc_id, doc.source,
              |    CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
              |  FROM documents doc LEFT JOIN agg a USING (doc_id)),
              |c AS (SELECT doc_id, source, n_tokens,
              |        sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              |          ROWS UNBOUNDED PRECEDING) AS cum
              |      FROM d)
              |SELECT doc_id, source, n_tokens,
              |  CAST((cum - n_tokens) // 512 AS BIGINT) AS seq_id
              |FROM c""".stripMargin)),

    // TA: corpus datasheet — the per-(source, lang) curation KPI rollup
    // every dataset card starts from: doc/token/char totals, mean doc
    // length, and the exact-duplicate rate (distinct text digests over
    // docs), with ROLLUP subtotals so the whole-corpus line and the
    // per-source lines come from the same single-pass aggregation. One
    // tokenize scan, one grouping-sets aggregate; the only
    // countDistinct is digest-per-group (the dedup KPI, irreducible).
    // TA: character-level Shannon entropy — the CCNet-style gibberish /
    // boilerplate signal (keyboard mash and padding sit far below
    // natural prose's ~3.5-4.5 bits, base64 blobs far above). One
    // kernel pass per row, histogram never becomes rows; the oracle
    // unnests code points only because DuckDB has no such kernel.
    // floor-quantized (not decimal round) per the midpoint discipline.
    Q("ta_entropy",
      (s, dir) => {
        val h = TextAnalysis.charEntropy(col("text"))
        t(s, dir, "documents")
          .where(col("text").isNotNull && length(col("text")) > 0)
          .select(col("doc_id"),
            (floor(h * lit(1e6) + lit(0.5)) / lit(1e6)).as("ent"))
          .withColumn("low_entropy", col("ent") < 3.0)
      },
      Some("""WITH ch AS (
             |  SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c
             |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
             |cnt AS (SELECT doc_id, c, count(*) AS k
             |        FROM ch GROUP BY doc_id, c),
             |ent AS (
             |  SELECT doc_id,
             |    (ln(sum(k)) - sum(k * ln(k)) / sum(k)) / ln(2) AS h
             |  FROM cnt GROUP BY doc_id)
             |SELECT doc_id, floor(h * 1e6 + 5e-1) / 1e6 AS ent,
             |  (floor(h * 1e6 + 5e-1) / 1e6) < 3.0 AS low_entropy
             |FROM ent""".stripMargin)),

    Q("ta_corpus_stats",
      (s, dir) => t(s, dir, "documents")
        .select(col("source"), col("lang"),
          size(Dedup.tokens(col("text"))).cast("long").as("ntk"),
          col("n_chars"), md5(col("text")).as("dg"))
        .rollup("source", "lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("ntk").as("n_tokens"),
          sum("n_chars").as("n_chars"),
          (floor(sum("ntk").cast("double") / count(lit(1)) * lit(1e4) +
            lit(0.5)) / lit(1e4)).as("mean_tokens"),
          (floor(countDistinct(col("dg")).cast("double") / count(lit(1)) *
            lit(1e4) + lit(0.5)) / lit(1e4)).as("uniq_frac")),
      Some(s"""WITH t0 AS ($toksSql),
              |b AS (SELECT d.source, d.lang, len(t0.tk) AS ntk,
              |        d.n_chars, md5(d.text) AS dg
              |      FROM documents d JOIN t0 ON d.doc_id = t0.id)
              |SELECT source, lang, count(*) AS n_docs,
              |  CAST(sum(ntk) AS BIGINT) AS n_tokens,
              |  CAST(sum(n_chars) AS BIGINT) AS n_chars,
              |  floor(sum(ntk)::DOUBLE / count(*) * 1e4 + 5e-1) / 1e4
              |    AS mean_tokens,
              |  floor(count(DISTINCT dg)::DOUBLE / count(*) * 1e4 + 5e-1)
              |    / 1e4 AS uniq_frac
              |FROM b GROUP BY ROLLUP (source, lang)""".stripMargin))
  )

  // =================================================================
  // IR + chunk dedup: query-time retrieval over the corpus (the query
  // half of the ta_postings index story) and content-defined chunking.
  // Query/phrase fixtures derive from the documents table itself (every
  // ~41st / ~53rd doc under id 5000 contributes its leading tokens) so
  // both engines synthesize them independently; the id cap keeps the
  // query batch FIXED once the corpus passes sf0.1 — the realistic
  // retrieval shape (a growing corpus serves a user-sized query batch,
  // not one that grows with it), and what the sf1 probe measures.
  // =================================================================

  /** The BM25 fixture's query frame: every ~41st doc under id 5000
    * queries with its first 5 tokens (the cap keeps the batch fixed as
    * the corpus grows). Shared by the inline and standing-index rows. */
  private def bm25FixtureQueries(s: SparkSession, dir: String,
                                 cap: Int = 5000): DataFrame =
    t(s, dir, "documents")
      .where(col("doc_id") % 41 === 0 && col("doc_id") < cap)
      .select(col("doc_id").as("q_id"),
        slice(Dedup.tokens(col("text")), 1, 5).as("q_terms"))
      .where(size(col("q_terms")) > 0)

  /** DuckDB replay of BM25 over the fixture queries, as a CTE chain
    * ending in `ranked(q_id, id, score, rn)` — ONE copy for
    * ir_bm25_topk, ir_bm25_indexed (the standing index changes the
    * physical layout, not the answer) and ir_hybrid_rrf's lexical leg
    * (which caps the query batch at the embedding-covered id range). */
  private def bm25RankedCtes(cap: Int): String =
    s"""toks AS ($toksSql),
       |q AS (SELECT id AS q_id, list_distinct(tk[1:5]) AS qts
       |      FROM toks WHERE id % 41 = 0 AND id < $cap
       |        AND len(tk) > 0),
       |qt AS (SELECT DISTINCT q_id, t_ AS term
       |       FROM (SELECT q_id, unnest(qts) AS t_ FROM q)),
       |tf AS (SELECT t_ AS term, id, dl, count(*) AS tf
       |       FROM (SELECT id, len(tk) AS dl, unnest(tk) AS t_
       |             FROM toks)
       |       GROUP BY t_, id, dl),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs,
       |            avg(len(tk)) AS avgdl FROM toks),
       |cand AS (SELECT tf.* FROM tf
       |         WHERE term IN (SELECT DISTINCT term FROM qt)),
       |dfreq AS (SELECT term, count(*) AS df FROM cand GROUP BY term),
       |scored AS (
       |  SELECT qt.q_id, cand.id,
       |    ln(1e0 + (n_docs - df + 5e-1) / (df + 5e-1)) *
       |      (tf * 2.2e0) /
       |      (tf + 1.2e0 * (2.5e-1 + 7.5e-1 * dl / avgdl)) AS part
       |  FROM cand JOIN dfreq USING (term) JOIN qt USING (term),
       |    stats),
       |summed AS (
       |  SELECT q_id, id,
       |    floor(sum(part) * 1e6 + 5e-1) / 1e6 AS score
       |  FROM scored GROUP BY q_id, id),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, id ASC) AS rn FROM summed)""".stripMargin

  private val bm25OracleSql: String =
    s"""WITH ${bm25RankedCtes(5000)}
       |SELECT q_id, id AS doc_id, score, rn::INT AS rank
       |FROM ranked WHERE rn <= 10""".stripMargin

  /** The semantic (exact-cosine) retrieval leg on the embedding-covered
    * id prefix: CTEs `qe, ce, sscored(q_id, c_id, rank)` — shared by
    * ir_hybrid_rrf, ir_eval_ndcg, and pipe_rag_eval. */
  private def irSemCtes: String =
    s"""qe AS (SELECT vec_id AS q_id, embedding AS q_v
       |       FROM embeddings WHERE vec_id % 41 = 0 AND vec_id < 500),
       |ce AS (SELECT vec_id AS c_id, embedding AS c_v
       |       FROM embeddings),
       |sscored AS (
       |  SELECT q_id, c_id, row_number() OVER (PARTITION BY q_id
       |    ORDER BY ${cosSql("c_v", "q_v")} DESC, c_id ASC) AS rank
       |  FROM ce CROSS JOIN qe)""".stripMargin

  /** RRF fusion of the lexical (`ranked`, from [[bm25RankedCtes]]) and
    * semantic (`sscored`, from [[irSemCtes]]) legs: CTEs ending in
    * `rk(q_id, doc_id, rrf, n_legs, rk)` — shared by ir_hybrid_rrf and
    * pipe_rag_eval so the fusion SQL cannot drift. */
  private def irHybridCtes: String =
    s"""lex AS (SELECT q_id, id AS doc_id, rn AS rank
       |        FROM ranked WHERE rn <= 10),
       |sem AS (SELECT q_id, c_id AS doc_id, rank
       |        FROM sscored WHERE rank <= 10),
       |u AS (SELECT * FROM lex UNION ALL SELECT * FROM sem),
       |fused AS (
       |  SELECT q_id, doc_id,
       |    floor(sum(1e0 / (60 + rank)) * 1e9 + 5e-1) / 1e9 AS rrf,
       |    count(*)::BIGINT AS n_legs
       |  FROM u GROUP BY q_id, doc_id),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY rrf DESC, doc_id ASC) AS rk FROM fused)""".stripMargin

  /** Graded truth + eval denominators from the semantic leg: CTEs
    * `qr(q_id, doc_id, rel = 11 - rank), pos, ideal(idcg), nrel(n_rel)`
    * — shared by ir_eval_ndcg and pipe_rag_eval. */
  private def irTruthEvalCtes: String =
    s"""qr AS (SELECT q_id, c_id AS doc_id, (11 - rank)::DOUBLE AS rel
       |       FROM sscored WHERE rank <= 10),
       |pos AS (SELECT q_id, rel, row_number() OVER (
       |    PARTITION BY q_id ORDER BY rel DESC, doc_id ASC) AS pos
       |  FROM qr WHERE rel > 0),
       |ideal AS (
       |  SELECT q_id, sum((pow(2e0, rel) - 1) / ln(pos + 1)) AS idcg
       |  FROM pos WHERE pos <= 10 GROUP BY q_id),
       |nrel AS (SELECT q_id, count(*)::BIGINT AS n_rel
       |         FROM qr WHERE rel > 0 GROUP BY q_id)""".stripMargin

  /** Per-query eval partials of a (q_id, doc_id, rank) relation against
    * `qr`: CTEs `<p>j, <p>per(q_id, hits, first_rel, dcg)`. */
  private def irEvalPerSql(resRel: String, p: String): String =
    s"""${p}j AS (SELECT r.q_id, r.rank, coalesce(qr.rel, 0e0) AS rel
       |      FROM $resRel r LEFT JOIN qr
       |        ON r.q_id = qr.q_id AND r.doc_id = qr.doc_id),
       |${p}per AS (
       |  SELECT q_id,
       |    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::BIGINT AS hits,
       |    min(CASE WHEN rel > 0 THEN rank END) AS first_rel,
       |    sum(CASE WHEN rel > 0
       |      THEN (pow(2e0, rel) - 1) / ln(rank + 1) ELSE 0e0 END)
       |      AS dcg
       |  FROM ${p}j GROUP BY q_id)""".stripMargin

  /** Final per-query metric SELECT over a `<p>per` relation (quantized
    * exactly like Retrieval.evalTopK). */
  private def irEvalMetricsSql(per: String): String =
    s"""SELECT $per.q_id, coalesce(n_rel, 0)::BIGINT AS n_rel, hits,
       |  floor(hits / n_rel * 1e6 + 5e-1) / 1e6 AS recall,
       |  floor(coalesce(1e0 / first_rel, 0e0) * 1e6 + 5e-1) / 1e6
       |    AS rr,
       |  floor(CASE WHEN idcg IS NULL OR idcg = 0 THEN 0e0
       |    ELSE dcg / idcg END * 1e6 + 5e-1) / 1e6 AS ndcg
       |FROM $per LEFT JOIN nrel USING (q_id)
       |  LEFT JOIN ideal USING (q_id)""".stripMargin

  private val retrievalQueries = Seq(
    // BM25 top-k: Lucene-form idf ln(1+(N-df+.5)/(df+.5)), k1=1.2 b=0.75,
    // query-term postings selected by broadcast prefilter, per-query
    // ranking via the bounded-heap TopKPairs aggregation. Scores quantize
    // to 1e-6 BEFORE ranking so rank order is engine-portable.
    Q("ir_bm25_topk",
      (s, dir) => Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id",
        "text", bm25FixtureQueries(s, dir), k = 10),
      Some(bm25OracleSql)),

    // BM25 against the STANDING index: postings partitioned by term-hash
    // bucket at rest, the query batch prunes the scan to its terms'
    // partitions, scoring is the same shared stage — identical answers
    // (same oracle SQL), amortized index cost. The row rebuilds the
    // index per run (fixture discipline: at sf0.01 the build is cheap;
    // production builds once and queries forever).
    Q("ir_bm25_indexed",
      (s, dir) => {
        val tag = new java.io.File(dir).getName.replaceAll("[^A-Za-z0-9]", "_")
        val path = s"/tmp/graft_search_index/$tag"
        Retrieval.writeSearchIndex(t(s, dir, "documents"), "doc_id",
          "text", path)
        Retrieval.bm25TopKIndexed(s, path, bm25FixtureQueries(s, dir),
          k = 10)
      },
      Some(bm25OracleSql)),

    // Hybrid retrieval: BM25 lexical leg + exact-cosine embedding leg,
    // fused by reciprocal rank (RRF, c=60) — the production two-tower
    // shape where neither score scale needs calibrating. Query batch
    // capped at id < 500 so BOTH legs cover every query at every scale
    // (the embeddings table spans a prefix of the doc ids). Each leg is
    // k-bounded before fusion, so fuse + final top-k are query-batch-
    // sized; swap the brute leg for lshTopK/ivfTopK at corpus scale —
    // rrfFuse only sees (q_id, doc_id, rank). n_legs audits which
    // results both towers agree on.
    Q("ir_hybrid_rrf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val lex = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id",
            "text", bm25FixtureQueries(s, dir, cap = 500), k = 10)
          .select(col("q_id"), col("doc_id"), col("rank"))
        val sem = Similarity.bruteForceTopK(emb,
            emb.where(col("vec_id") % 41 === 0 && col("vec_id") < 500),
            "vec_id", "vec_id", "embedding", k = 10)
          .select(col("q_id"), col("c_id").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(Seq(lex, sem), k = 10)
      },
      Some(s"""WITH ${bm25RankedCtes(500)},
              |$irSemCtes,
              |$irHybridCtes
              |SELECT q_id, doc_id, rrf, n_legs, rk::INT AS rank
              |FROM rk WHERE rk <= 10""".stripMargin)),

    // Retrieval evaluation: recall@10 / MRR / nDCG@10 of the lexical
    // BM25 ranking against graded semantic truth (exact-cosine top-10,
    // rel = 11 - rank) — the measurement loop every retrieval/ANN
    // tuning pass needs, here quantifying per-query lexical-semantic
    // agreement on the same fixture the hybrid row fuses. Everything
    // downstream of the two k-bounded legs is query-batch-sized (the
    // idcg window partitions are judgment-sized, never corpus-sized).
    Q("ir_eval_ndcg",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val lex = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id",
            "text", bm25FixtureQueries(s, dir, cap = 500), k = 10)
          .select(col("q_id"), col("doc_id"), col("rank"))
        val qrels = Similarity.bruteForceTopK(emb,
            emb.where(col("vec_id") % 41 === 0 && col("vec_id") < 500),
            "vec_id", "vec_id", "embedding", k = 10)
          .select(col("q_id"), col("c_id").as("doc_id"),
            (lit(11) - col("rank")).as("rel"))
        Retrieval.evalTopK(lex, qrels, k = 10)
      },
      Some(s"""WITH ${bm25RankedCtes(500)},
              |$irSemCtes,
              |res AS (SELECT q_id, id AS doc_id, rn AS rank
              |        FROM ranked WHERE rn <= 10),
              |$irTruthEvalCtes,
              |${irEvalPerSql("res", "")}
              |${irEvalMetricsSql("per")}""".stripMargin)),

    // PIPE: retrieval capstone — the two-tower story end to end in ONE
    // oracle-checked plan: lexical BM25, the semantic leg, RRF fusion,
    // then BOTH systems macro-evaluated against the graded semantic
    // truth. (The hybrid contains the truth-producing leg, so its win
    // over lexical-alone is by construction — the row pins the
    // COMPOSITION: every stage's SQL is the same shared chain its
    // standalone registry row replays.) Both legs are pinned: each
    // feeds the fusion AND an eval/truth consumer.
    Q("pipe_rag_eval",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val lex = Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id",
            "text", bm25FixtureQueries(s, dir, cap = 500), k = 10)
          .select(col("q_id"), col("doc_id"), col("rank"))
          .transform(CacheScope.pin)
        val sem = Similarity.bruteForceTopK(emb,
            emb.where(col("vec_id") % 41 === 0 && col("vec_id") < 500),
            "vec_id", "vec_id", "embedding", k = 10)
          .select(col("q_id"), col("c_id").as("doc_id"), col("rank"))
          .transform(CacheScope.pin)
        val hyb = Retrieval.rrfFuse(Seq(lex, sem), k = 10)
          .select(col("q_id"), col("doc_id"), col("rank"))
        val truth = sem.select(col("q_id"), col("doc_id"),
          (lit(11) - col("rank")).as("rel"))
        def macroEval(res: org.apache.spark.sql.DataFrame, system: String) =
          Retrieval.evalTopK(res, truth, k = 10)
            .agg(count(lit(1)).as("n_queries"),
              (floor(avg("recall") * lit(1e6) + lit(0.5)) / lit(1e6))
                .as("mean_recall"),
              (floor(avg("rr") * lit(1e6) + lit(0.5)) / lit(1e6))
                .as("mean_rr"),
              (floor(avg("ndcg") * lit(1e6) + lit(0.5)) / lit(1e6))
                .as("mean_ndcg"))
            .select(lit(system).as("system"), col("n_queries"),
              col("mean_recall"), col("mean_rr"), col("mean_ndcg"))
        macroEval(lex, "lexical").unionByName(macroEval(hyb, "hybrid"))
      },
      Some(s"""WITH ${bm25RankedCtes(500)},
              |$irSemCtes,
              |$irHybridCtes,
              |hybres AS (SELECT q_id, doc_id, rk AS rank
              |           FROM rk WHERE rk <= 10),
              |$irTruthEvalCtes,
              |${irEvalPerSql("lex", "l")},
              |${irEvalPerSql("hybres", "h")},
              |lm AS (${irEvalMetricsSql("lper")}),
              |hm AS (${irEvalMetricsSql("hper")})
              |SELECT 'lexical' AS system, count(*)::BIGINT AS n_queries,
              |  floor(avg(recall) * 1e6 + 5e-1) / 1e6 AS mean_recall,
              |  floor(avg(rr) * 1e6 + 5e-1) / 1e6 AS mean_rr,
              |  floor(avg(ndcg) * 1e6 + 5e-1) / 1e6 AS mean_ndcg
              |FROM lm
              |UNION ALL
              |SELECT 'hybrid', count(*)::BIGINT,
              |  floor(avg(recall) * 1e6 + 5e-1) / 1e6,
              |  floor(avg(rr) * 1e6 + 5e-1) / 1e6,
              |  floor(avg(ndcg) * 1e6 + 5e-1) / 1e6
              |FROM hm""".stripMargin)),

    // Positional exact-phrase match: candidate starts from the term join,
    // a start is real iff all distinct phrase offsets land on it (robust
    // to repeated terms in the phrase); counts per (phrase, doc).
    Q("ir_phrase_match",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val ph = docs.where(col("doc_id") % 53 === 0 && col("doc_id") < 5000)
          .select(col("doc_id").as("q_id"),
            slice(Dedup.tokens(col("text")), 3, 2).as("terms"))
          .where(size(col("terms")) === 2)
        Retrieval.phraseMatch(docs, "doc_id", "text", ph)
      },
      Some(s"""WITH toks AS ($toksSql),
              |ph AS (SELECT id AS q_id, tk[3:4] AS ph FROM toks
              |       WHERE id % 53 = 0 AND id < 5000 AND len(tk) >= 4),
              |slots AS (SELECT q_id, len(ph) AS plen, i AS off,
              |            ph[i + 1] AS term
              |          FROM (SELECT q_id, ph, unnest(range(0, len(ph))) AS i
              |                FROM ph)),
              |pos AS (SELECT id, i AS pos, tk[i + 1] AS term
              |        FROM (SELECT id, tk, unnest(range(0, len(tk))) AS i
              |              FROM toks)),
              |starts AS (
              |  SELECT q_id, id, plen, pos - off AS start,
              |    count(DISTINCT off) AS hits
              |  FROM pos JOIN slots USING (term)
              |  WHERE pos - off >= 0
              |  GROUP BY q_id, id, plen, start)
              |SELECT q_id, id AS doc_id, count(*) AS n_matches
              |FROM starts WHERE hits = plen
              |GROUP BY q_id, id""".stripMargin)),

    // DD: content-defined chunking dedup — gear-style token-hash cut
    // points (boundary after t iff h32(t) % 16 == 0), per-doc array
    // expressions only (zero shuffles until the final chunk-hash
    // groupBy); duplicated chunks = same md5 in >1 distinct doc. The
    // shift-robustness that motivates CDC over fixed-stride splitting is
    // pinned in RetrievalSpec/OperatorsSpec (edit one token, only the
    // edit's neighborhood re-chunks).
    Q("dd_cdc_chunks",
      (s, dir) => Dedup.cdcDuplicateChunks(
        t(s, dir, "documents"), "doc_id", "text", avgLen = 16),
      Some(s"""WITH toks AS ($toksSql),
              |cut AS (SELECT id, tk,
              |    list_concat(list_concat([0],
              |      list_filter(range(1, len(tk) + 1),
              |        i -> ${h32Sql("tk[i]", "7")} % 16 = 0)),
              |      [len(tk)]) AS cuts
              |  FROM toks),
              |ch AS (SELECT id, tk[cuts[j] + 1 : cuts[j + 1]] AS ch
              |       FROM (SELECT id, tk, cuts,
              |               unnest(range(1, len(cuts))) AS j
              |             FROM cut)),
              |sel AS (SELECT id, len(ch) AS n_toks,
              |          md5(array_to_string(ch, ' ')) AS chunk_hash
              |        FROM ch WHERE len(ch) > 0)
              |SELECT chunk_hash, CAST(max(n_toks) AS BIGINT) AS n_tokens,
              |  count(DISTINCT id) AS n_docs, count(*) AS n_occurrences
              |FROM sel GROUP BY chunk_hash
              |HAVING count(DISTINCT id) > 1""".stripMargin)),

    // TA: Kneser-Ney bigram LM perplexity — the CCNet curation stage:
    // train on the doc_id % 4 != 0 reference slice, score EVERY doc by
    // mean -ln P(w2|w1) under interpolated KN (D=0.75, add-one over the
    // continuation distribution folds all OOV mass into one class). The
    // corpus is scanned twice (train counts, scoring); model frames are
    // bigram-type/vocab-sized and join on term keys; Ntypes/V ride a
    // broadcast 1-row frame. The probability expression is written in
    // one fixed operation order in BOTH engines; per-doc mean rounds to
    // 6 (the ta_bigram_surprisal ln-parity precedent). Docs with < 2
    // tokens emit no row in either engine.
    Q("ta_kn_perplexity",
      (s, dir) => LanguageModel.knLogPerplexity(
        t(s, dir, "documents"), "doc_id", "text",
        pmod(col("doc_id"), lit(4)) =!= 0),
      Some(s"""WITH $knPplCtes
              |SELECT doc_id, logppl FROM kn_scored""".stripMargin)),

    // TA: CCNet head/middle/tail perplexity buckets — tercile cuts of
    // the scored distribution via exact interpolated percentiles (the
    // a14 percentile/quantile_cont parity precedent, rounded to the same
    // 1e-6 grid as the scores), docs labeled by broadcast-joined cuts.
    // No global window: the cuts are a 1-row aggregate.
    Q("ta_ppl_buckets",
      (s, dir) => LanguageModel.perplexityBuckets(
        LanguageModel.knLogPerplexity(t(s, dir, "documents"), "doc_id",
          "text", pmod(col("doc_id"), lit(4)) =!= 0)),
      Some(s"""WITH $knPplCtes,
              |cuts AS (SELECT
              |    round(quantile_cont(logppl, 1e0/3), 6) AS t1,
              |    round(quantile_cont(logppl, 2e0/3), 6) AS t2
              |  FROM kn_scored)
              |SELECT doc_id, logppl,
              |  CASE WHEN logppl <= t1 THEN 'head'
              |       WHEN logppl <= t2 THEN 'middle'
              |       ELSE 'tail' END AS bucket
              |FROM kn_scored CROSS JOIN cuts""".stripMargin)),

    // TA: BPE tokenizer TRAINING (Sennrich 2016) — learn the first 6
    // merges from the corpus word-frequency dictionary. The corpus is
    // scanned ONCE (word counts); each round is vocab-sized with one
    // (pair,count) row of driver traffic (the k-means precedent). Ties
    // break (count desc, lhs, rhs); greedy merge application is pinned
    // by BpeTrainerSpec and replayed by the oracle as run-start parity
    // (overlaps exist only when lhs == rhs — every other position of
    // each maximal run merges, provably the greedy scan's choice set).
    Q("ta_bpe_train",
      (s, dir) => BpeTrainer.bpeTrain(t(s, dir, "documents"),
        "text", nMerges = 6),
      Some(bpeTrainSql(6))),

    // DQ: l-diversity — the release audit dq_k_anonymity is incomplete
    // without: a k-sized class whose rows all share one SENSITIVE value
    // still discloses it. Two stacked partial-agg shuffles (class+value
    // counts, then class rollup with the one-pass entropy identity
    // H = ln N - Σ n·ln n / N); output is class-count-sized.
    Q("dq_l_diversity",
      (s, dir) => DataChecks.lDiversity(
        t(s, dir, "customer").select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"),
          col("c_mktsegment")),
        Seq("c_nationkey", "bal_bucket"), "c_mktsegment", l = 3),
      Some("""WITH b AS (SELECT c_nationkey,
             |    CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
             |    c_mktsegment
             |  FROM customer),
             |sv AS (SELECT c_nationkey, bal_bucket, c_mktsegment,
             |         count(*) AS n
             |       FROM b GROUP BY 1, 2, 3)
             |SELECT c_nationkey, bal_bucket,
             |  CAST(sum(n) AS BIGINT) AS group_n,
             |  count(*) AS n_sensitive,
             |  round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS max_frac,
             |  round(ln(CAST(sum(n) AS DOUBLE)) - sum(n * ln(n)) / sum(n), 6)
             |    + 0e0 AS entropy,
             |  count(*) >= 3 AS diverse
             |FROM sv GROUP BY 1, 2""".stripMargin)),

    // K14: ORC roundtrip — the columnar format Spark ships besides
    // parquet (same pushdown/pruning machinery; ORC's own row-group
    // stats drive skipping). Write, read back, aggregate; must equal
    // the direct parquet aggregate.
    Q("k14_orc_roundtrip",
      (s, dir) => {
        val tmp = s"/tmp/graft_k14_${new java.io.File(dir).getName}"
        t(s, dir, "part").select("p_partkey", "p_type", "p_retailprice")
          .write.mode("overwrite").orc(tmp)
        s.read.orc(tmp).where(col("p_retailprice") > 950)
          .groupBy("p_type")
          .agg(count(lit(1)).as("n"),
            round(sum("p_retailprice"), 2).as("total"))
      },
      Some("""SELECT p_type, count(*) AS n,
             |  round(sum(p_retailprice), 2) AS total
             |FROM part WHERE p_retailprice > 950
             |GROUP BY p_type""".stripMargin)),

    // DD: asymmetric shingle containment (Broder 1997) —
    // |Sh(A)∩Sh(B)|/|Sh(A)| ≥ 0.9 finds docs whose passages appear
    // inside others, which resemblance Jaccard scores near zero (union
    // dominated by the container). One-sided PPJoin prefix on the
    // CONTAINED side only (exact recall — o ≥ t·n_a), container side
    // joins full postings; 3-gram SHINGLE space deliberately (the
    // token space of this corpus is 31 words — token postings make
    // every prefix bucket corpus-sized; shingles stay Zipf-sparse,
    // 27k at sf0.1, and the truth set stays linear: 505 pairs at
    // sf0.1 vs 8.3M for bag-of-words containment, both measured).
    // Oracle is the brute-force shingle truth.
    Q("dd_containment",
      (s, dir) => Dedup.containmentPairs(t(s, dir, "documents"),
        "doc_id", "text", threshold = 0.9),
      Some(s"""WITH sh0 AS ($shinglesSql),
              |t AS (SELECT id, unnest(list_distinct(list_transform(sh,
              |    s_ -> ('0x' || substr(md5(s_), 1, 15))::BIGINT))) AS h
              |  FROM sh0),
              |sz AS (SELECT id, count(*) AS n FROM t GROUP BY id),
              |inter AS (
              |  SELECT a.id AS a_id, b.id AS b_id, count(*) AS o
              |  FROM t a JOIN t b ON a.h = b.h AND a.id <> b.id
              |  GROUP BY 1, 2),
              |c AS (SELECT a_id, b_id, CAST(o AS DOUBLE) / sa.n
              |        AS containment
              |      FROM inter JOIN sz sa ON a_id = sa.id)
              |SELECT a_id, b_id, round(containment, 6) + 0e0
              |  AS containment
              |FROM c WHERE containment >= 9e-1""".stripMargin)),

    // DS: K-fold leakage-safe target encoding — each row's category
    // becomes the OTHER folds' smoothed target mean, so its own label
    // never leaks into its feature. Everything derives from one
    // (category, fold) partial agg; fold/global frames are
    // nFolds-row broadcasts; 0/1 target makes every sum exact so the
    // single rounded division carries no tolerance.
    Q("ds_target_encode",
      (s, dir) => Features.targetEncode(
        t(s, dir, "orders").select(col("o_orderkey"),
          col("o_orderpriority"), col("o_orderstatus")),
        "o_orderpriority",
        when(col("o_orderstatus") === "F", 1.0).otherwise(0.0),
        pmod(col("o_orderkey"), lit(5)), smoothing = 20.0)
        .select("o_orderkey", "fold", "enc"),
      Some("""WITH b AS (SELECT o_orderkey, o_orderpriority AS cat,
             |    CAST(o_orderkey % 5 AS INTEGER) AS fold,
             |    CASE WHEN o_orderstatus = 'F' THEN 1e0 ELSE 0e0 END AS t
             |  FROM orders),
             |cf AS (SELECT cat, fold, sum(t) AS s_cf, count(*) AS n_cf
             |       FROM b GROUP BY 1, 2),
             |c AS (SELECT cat, sum(s_cf) AS s_c,
             |        CAST(sum(n_cf) AS BIGINT) AS n_c
             |      FROM cf GROUP BY 1),
             |f AS (SELECT fold, sum(s_cf) AS s_f,
             |        CAST(sum(n_cf) AS BIGINT) AS n_f
             |      FROM cf GROUP BY 1),
             |g AS (SELECT sum(s_f) AS s_g, CAST(sum(n_f) AS BIGINT) AS n_g
             |      FROM f)
             |SELECT b.o_orderkey, b.fold,
             |  round((c.s_c - cf.s_cf
             |      + 20e0 * ((g.s_g - f.s_f) / (g.n_g - f.n_f)))
             |    / (c.n_c - cf.n_cf + 20e0), 6) + 0e0 AS enc
             |FROM b JOIN cf ON b.cat IS NOT DISTINCT FROM cf.cat
             |  AND b.fold = cf.fold
             |JOIN c ON b.cat IS NOT DISTINCT FROM c.cat
             |JOIN f ON b.fold = f.fold CROSS JOIN g""".stripMargin)),

    // TS: dominant-period detection — the ACF argmax over lags 2..48 on
    // the gap-filled hourly series (the question ts_seasonal's period
    // parameter begs). Lag pairs via ONE expression-equi-join (b.i =
    // a.i + L, L exploded — never a range join); moments are exact
    // integer sums per the seasonalDecompose unit-lift discipline, each
    // ACF one fixed-order double expression quantized to 1e-6; argmax
    // is a max-of-struct aggregate (acf desc, then the SHORTEST lag).
    Q("ts_period",
      (s, dir) => {
        val hourly = t(s, dir, "events").where(col("user_id") < 8)
          .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
          .agg((round(sum("value"), 2) + 0.0).as("v"))
        val filled = TimeSeries.gapFill(hourly, "user_id", "h", "v", 3600L)
          .select("user_id", "h", "v")
        TimeSeries.acfDominantPeriod(filled, "user_id", "h", "v",
          stepSeconds = 3600L, minLag = 2, maxLag = 48)
      },
      Some(s"""WITH ${filledSeriesCtes(8)},
              |d AS (SELECT user_id AS k,
              |    CAST(epoch(h) AS BIGINT) // 3600 AS i,
              |    CAST(floor(v * 1e2 + 5e-1) AS BIGINT) AS x
              |  FROM filled),
              |km AS (SELECT k, CAST(sum(x) AS BIGINT) AS s, count(*) AS n,
              |         CAST(sum(x * x) AS BIGINT) AS sxx
              |       FROM d GROUP BY 1),
              |lg AS (
              |  SELECT a.k, l.L, CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
              |    CAST(sum(a.x) AS BIGINT) AS sa,
              |    CAST(sum(b.x) AS BIGINT) AS sb, count(*) AS nl
              |  FROM d a
              |  CROSS JOIN (SELECT unnest(range(2, 49)) AS L) l
              |  JOIN d b ON b.k = a.k AND b.i = a.i + l.L
              |  GROUP BY 1, 2),
              |acf AS (
              |  SELECT lg.k, L, km.n,
              |    floor((sxy - (CAST(s AS DOUBLE) / n) * (sa + sb)
              |        + nl * (CAST(s AS DOUBLE) / n)
              |          * (CAST(s AS DOUBLE) / n))
              |      / (sxx - 2e0 * (CAST(s AS DOUBLE) / n) * s
              |        + n * (CAST(s AS DOUBLE) / n)
              |          * (CAST(s AS DOUBLE) / n))
              |      * 1e6 + 5e-1) / 1e6 AS a
              |  FROM lg JOIN km ON lg.k = km.k
              |  WHERE (sxx - 2e0 * (CAST(s AS DOUBLE) / n) * s
              |    + n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
              |    > 0),
              |r AS (SELECT *, row_number() OVER (
              |        PARTITION BY k ORDER BY a DESC, L ASC) AS rn
              |      FROM acf)
              |SELECT k AS user_id, CAST(L AS INTEGER) AS period,
              |  a + 0e0 AS acf, n
              |FROM r WHERE rn = 1""".stripMargin)),

    // J13: bucketed co-located join — the 100 TB join lever the
    // standing indexes use for SCANS, demonstrated for JOINS: both
    // sides written bucketBy(8) + sortBy on the join key, the join
    // re-reads them and runs SHUFFLE-FREE (no Exchange in the plan —
    // PlanSpec-gated; the merge hint keeps AQE from hiding the
    // demonstration behind a broadcast). At 100 TB this is the
    // difference between re-shuffling both fact tables per join and
    // reading co-located buckets.
    Q("j13_bucketed_join",
      (s, dir) => {
        val sfx = new java.io.File(dir).getName.replace(".", "_")
        val base = s"/tmp/graft_j13_$sfx"
        t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", s"$base/orders")
          .saveAsTable(s"graft_j13_orders_$sfx")
        t(s, dir, "customer").select("c_custkey", "c_mktsegment")
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "c_custkey").sortBy("c_custkey")
          .option("path", s"$base/customer")
          .saveAsTable(s"graft_j13_customer_$sfx")
        s.table(s"graft_j13_orders_$sfx").hint("merge")
          .join(s.table(s"graft_j13_customer_$sfx"),
            col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
      },
      Some("""SELECT c_mktsegment, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |GROUP BY 1""".stripMargin)),

    // J14: dynamic partition pruning — the fact side is partitioned on
    // the join key at rest; the dim side's selective filter is turned
    // into a runtime partition filter on the fact SCAN (dynamicpruning
    // subquery in the plan, PlanSpec-gated), so only the matching
    // partitions are read. The Spark-native form of the reference's
    // manual partition-slug routing, and the main reason a 100 TB
    // star-schema scan reads 2 partitions instead of all of them.
    Q("j14_dpp",
      (s, dir) => {
        val sfx = new java.io.File(dir).getName.replace(".", "_")
        val p = s"/tmp/graft_j14_$sfx"
        t(s, dir, "orders")
          .select("o_orderkey", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(p)
        val dim = t(s, dir, "orders").select("o_orderpriority").distinct()
          .where(col("o_orderpriority") < "3")
        s.read.parquet(p).join(dim, "o_orderpriority")
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"),
            round(sum("o_totalprice"), 2).as("total"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  round(sum(o_totalprice), 2) AS total
             |FROM orders WHERE o_orderpriority < '3'
             |GROUP BY 1""".stripMargin)),

    // S11: corrupt-record routing on JSON ingest — PERMISSIVE parse
    // with a _corrupt_record column, good rows projected, bad rows
    // COUNTED (never silently dropped — the quarantine rule applied to
    // the parser itself). The fixture corrupts every 7th line by
    // truncation, so the oracle derives the same routing from the
    // corruption rule both engines share.
    Q("s11_json_corrupt",
      (s, dir) => {
        val raw = t(s, dir, "orders").select(
          when(pmod(col("o_orderkey"), lit(7)) === 0,
            concat(lit("{\"k\":"), col("o_orderkey").cast("string")))
            .otherwise(concat(lit("{\"k\":"), col("o_orderkey").cast("string"),
              lit(",\"p\":\""), col("o_orderpriority"), lit("\"}")))
            .as("line"))
        val opts = new java.util.HashMap[String, String]
        opts.put("mode", "PERMISSIVE")
        opts.put("columnNameOfCorruptRecord", "_corrupt_record")
        val parsed = raw.select(from_json(col("line"),
          "k LONG, p STRING, _corrupt_record STRING", opts).as("j"))
        parsed.select(col("j.k"), col("j.p"), col("j._corrupt_record"))
          .agg(
            count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
            count(when(col("_corrupt_record").isNotNull, 1)).as("n_bad"),
            sum(when(col("_corrupt_record").isNull, col("k"))).as("sum_good"),
            countDistinct(when(col("_corrupt_record").isNull, col("p")))
              .as("n_priorities"))
      },
      Some("""SELECT
             |  count(*) FILTER (o_orderkey % 7 <> 0) AS n_good,
             |  count(*) FILTER (o_orderkey % 7 = 0) AS n_bad,
             |  CAST(sum(o_orderkey) FILTER (o_orderkey % 7 <> 0) AS BIGINT)
             |    AS sum_good,
             |  count(DISTINCT o_orderpriority)
             |    FILTER (o_orderkey % 7 <> 0) AS n_priorities
             |FROM orders""".stripMargin)),

    // K15: right-to-be-forgotten deletion — rewrite ONLY the partitions
    // containing deleted keys (dynamic overwrite scoped to the writer;
    // fully-emptied partitions dropped explicitly — dynamic overwrite
    // would silently leave them). The oracle derives the same audit
    // from the deletion rule; n_rows_after is RE-READ from disk by the
    // impl, so a partition the rewrite missed would hash-mismatch.
    Q("k15_delete_propagation",
      (s, dir) => {
        val sfx = new java.io.File(dir).getName.replace(".", "_")
        val p = s"/tmp/graft_k15_$sfx"
        t(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_totalprice",
            "o_orderpriority")
          .write.mode("overwrite").partitionBy("o_orderpriority").parquet(p)
        val deletes = t(s, dir, "customer")
          .select(col("c_custkey").as("o_custkey"))
          .where(pmod(col("o_custkey"), lit(97)) === 0)
        Sources.deletePropagate(s, p, "o_orderpriority", "o_custkey",
          deletes)
      },
      Some("""WITH del AS (
             |  SELECT o_orderpriority AS p, count(*) AS nd
             |  FROM orders WHERE o_custkey % 97 = 0 GROUP BY 1),
             |tot AS (
             |  SELECT o_orderpriority AS p, count(*) AS n
             |  FROM orders GROUP BY 1)
             |SELECT CAST(coalesce(sum(nd), 0) AS BIGINT) AS n_deleted,
             |  CAST(count(*) FILTER (nd < n) AS BIGINT)
             |    AS n_parts_rewritten,
             |  CAST(count(*) FILTER (nd = n) AS BIGINT) AS n_parts_dropped,
             |  CAST((SELECT count(*) FROM orders) - coalesce(sum(nd), 0)
             |    AS BIGINT) AS n_rows_after
             |FROM del JOIN tot USING (p)""".stripMargin)),

    // DQ: key-skew audit — the measure-before-you-salt diagnostic for
    // a prospective join/aggregation key: top-5 heaviest values with
    // share and skew ratio (count / uniform per-key expectation). One
    // key-count-sized partial agg + 1-row broadcast + k-bounded
    // TakeOrdered.
    Q("dq_skew_audit",
      (s, dir) => Skew.skewReport(t(s, dir, "events"), "user_id", topK = 5),
      Some("""WITH c AS (
             |  SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
             |s AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_rows,
             |        count(*) AS n_keys
             |      FROM c)
             |SELECT user_id, cnt, total_rows, n_keys,
             |  round(CAST(cnt AS DOUBLE) / total_rows, 6) + 0e0 AS share,
             |  round(CAST(cnt AS DOUBLE) * n_keys / total_rows, 6) + 0e0
             |    AS skew_ratio
             |FROM c CROSS JOIN s
             |ORDER BY cnt DESC, user_id ASC LIMIT 5""".stripMargin)),

    // TA: trigram interpolated Kneser-Ney — the full recursive KN of
    // Chen & Goodman 1998 (raw counts at the top, continuation counts
    // in the middle, the bigram add-one continuation base; each unseen
    // level falls through), pushing the CCNet curation stage from the
    // ta_kn_perplexity bigram to the production n-gram depth. Same
    // scale shape: two corpus scans, term-keyed model joins, one
    // broadcast scalar row. Docs with < 3 tokens emit no row.
    Q("ta_kn3_perplexity",
      (s, dir) => LanguageModel.kn3LogPerplexity(
        t(s, dir, "documents"), "doc_id", "text",
        pmod(col("doc_id"), lit(4)) =!= 0),
      Some(s"""WITH $kn3PplCtes
              |SELECT doc_id, logppl FROM kn3_scored""".stripMargin)),

    // TA: apply the LEARNED merges — close the tokenizer loop: train 6
    // BPE merges on the corpus, re-tokenize every doc under them, and
    // report per-doc subword/word counts. The merge table is collected
    // (model-sized) into a kernel UDF; the oracle reuses the SAME
    // training CTE chain and reads each word's subword count off the
    // final symbolized dictionary (words segment independently, so the
    // dict IS the tokenizer).
    Q("ta_bpe_apply_learned",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        BpeTrainer.subwordCounts(docs, "doc_id", "text",
          BpeTrainer.bpeTrain(docs, "text", nMerges = 6))
      },
      Some(s"""WITH ${bpeTrainCtes(6)},
              |wl AS (SELECT word, len(sy) AS nsub FROM bpe_s6),
              |tokd AS (SELECT id, unnest(tk) AS word FROM tk0)
              |SELECT id AS doc_id,
              |  CAST(sum(nsub) AS BIGINT) AS n_subwords,
              |  count(*) AS n_words
              |FROM tokd JOIN wl USING (word)
              |GROUP BY id""".stripMargin)),

    // The pretraining-corpus CAPSTONE: C4 line dedup -> Gopher gate on
    // the rebuilt text -> exact dedup -> MinHash-LSH near-dup removal
    // -> an interpolated-KN LM trained on the SURVIVORS' reference
    // split scores every survivor and the tail perplexity tercile is
    // dropped (the CCNet stage). Every stage is the library operator
    // behind its own oracle-checked row, and this oracle composes the
    // SAME shared CTE chains (lineDedupCtes, gopherCtes,
    // lshDropsSqlFrom, knPplCtesFrom) — the pipeline cannot drift from
    // its stages.
    Q("pipe_pretrain_corpus",
      (s, dir) => Pipelines.buildPretrainCorpus(linedDocs(s, dir),
        minLineLen = 10, minWords = 50, minStopHits = 1),
      Some(s"""WITH $lineDedupCtes,
              |c4t AS (${toksSqlFrom("lined_docs")}),
              |${gopherCtes("c4t")},
              |gated AS (
              |  SELECT gf.doc_id, ld.text, gf.n_words
              |  FROM gf JOIN lined_docs ld USING (doc_id)
              |  WHERE ${gopherKeepSql(50, 1)}),
              |kept AS (
              |  SELECT doc_id, text, n_words FROM (
              |    SELECT *, row_number() OVER (PARTITION BY md5(text)
              |      ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1),
              |${lshDropsSqlFrom("kept")},
              |surv AS (SELECT doc_id, text, n_words FROM kept
              |         WHERE doc_id NOT IN (SELECT b_id FROM drops)),
              |${knPplCtesFrom("surv")},
              |cuts AS (SELECT
              |    round(quantile_cont(logppl, 1e0/3), 6) AS t1,
              |    round(quantile_cont(logppl, 2e0/3), 6) AS t2
              |  FROM kn_scored),
              |lab AS (SELECT s.doc_id, s.n_words, k.logppl,
              |    CASE WHEN k.logppl <= t1 THEN 'head'
              |         WHEN k.logppl <= t2 THEN 'middle'
              |         ELSE 'tail' END AS bucket
              |  FROM surv s JOIN kn_scored k USING (doc_id)
              |  CROSS JOIN cuts)
              |SELECT doc_id, n_words, logppl, bucket FROM lab
              |WHERE bucket <> 'tail'""".stripMargin)),

    // The capstone CLOSED through its own trained tokenizer (v2): the
    // same five curation stages, then a BPE merge table LEARNED from
    // the kept corpus meters every kept doc and packs it into
    // 512-subword bins per (bucket, source) shard — the token budget
    // reported is the one the training run would meter with. Oracle
    // composes the SAME shared CTE chains as pipe_pretrain_corpus plus
    // the bpeTrainCtesFrom chain over the kept text (subword counts
    // read off the final dictionary state — the ta_bpe_apply_learned
    // equivalence).
    Q("pipe_pretrain_tokenized",
      (s, dir) => Pipelines.buildPretrainCorpusTokenized(linedDocs(s, dir),
        t(s, dir, "documents").select(col("doc_id"), col("source")),
        minLineLen = 10, minWords = 50, minStopHits = 1),
      Some(s"""WITH $lineDedupCtes,
              |c4t AS (${toksSqlFrom("lined_docs")}),
              |${gopherCtes("c4t")},
              |gated AS (
              |  SELECT gf.doc_id, ld.text, gf.n_words
              |  FROM gf JOIN lined_docs ld USING (doc_id)
              |  WHERE ${gopherKeepSql(50, 1)}),
              |kept AS (
              |  SELECT doc_id, text, n_words FROM (
              |    SELECT *, row_number() OVER (PARTITION BY md5(text)
              |      ORDER BY doc_id) AS rn FROM gated) WHERE rn = 1),
              |${lshDropsSqlFrom("kept")},
              |surv AS (SELECT doc_id, text, n_words FROM kept
              |         WHERE doc_id NOT IN (SELECT b_id FROM drops)),
              |${knPplCtesFrom("surv")},
              |cuts AS (SELECT
              |    round(quantile_cont(logppl, 1e0/3), 6) AS t1,
              |    round(quantile_cont(logppl, 2e0/3), 6) AS t2
              |  FROM kn_scored),
              |lab AS (SELECT s.doc_id, s.text, s.n_words, k.logppl,
              |    CASE WHEN k.logppl <= t1 THEN 'head'
              |         WHEN k.logppl <= t2 THEN 'middle'
              |         ELSE 'tail' END AS bucket
              |  FROM surv s JOIN kn_scored k USING (doc_id)
              |  CROSS JOIN cuts),
              |fin AS MATERIALIZED (
              |  SELECT doc_id, text, n_words, logppl, bucket
              |  FROM lab WHERE bucket <> 'tail'),
              |btk AS MATERIALIZED (${toksSqlFrom("fin")}),
              |${bpeTrainCtesFrom(6, "btk")},
              |wl AS (SELECT word, len(sy) AS nsub FROM bpe_s6),
              |tokd AS (SELECT id, unnest(tk) AS word FROM btk),
              |met AS (SELECT id AS doc_id,
              |          CAST(sum(nsub) AS BIGINT) AS n_subwords
              |        FROM tokd JOIN wl USING (word) GROUP BY id),
              |pk AS (SELECT f.doc_id, d.source, f.n_words, f.logppl,
              |    f.bucket, m.n_subwords,
              |    sum(m.n_subwords) OVER (
              |      PARTITION BY f.bucket, d.source ORDER BY f.doc_id
              |      ROWS UNBOUNDED PRECEDING) AS cum
              |  FROM fin f JOIN met m USING (doc_id)
              |  JOIN documents d USING (doc_id))
              |SELECT doc_id, source, n_words, logppl, bucket, n_subwords,
              |  CAST((cum - n_subwords) // 512 AS BIGINT) AS seq_id
              |FROM pk""".stripMargin)),

    // DS: deterministic hard-negative sampling for contrastive
    // training — 4 seeded pseudo-random negatives per anchor, with
    // exact-duplicate pairs EXCLUDED before ranking (a near-dup
    // sampled as a negative is a false negative). Each slot draws one
    // rank off its seeded candidate bucket's (anchor, candidate)-hash
    // permutation (never the full corpus; same-bucket slots take
    // distinct ranks, so an anchor's negatives are distinct by
    // construction); n_bucket audits the population each slot drew
    // from (no silent caps). Buckets AUTO-SIZE to ~256 candidates each
    // (nBuckets = 0) — the production shape; the oracle replays the
    // same count-derived bucket count, so the fixture measures what a
    // corpus-scale run would execute (the ann_ivf_topk fixture lesson).
    Q("ds_negative_sample",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val dg = docs.select(col("doc_id"), md5(col("text")).as("dg"))
        val avoid = dg.alias("x")
          .join(dg.alias("y"), col("x.dg") === col("y.dg") &&
            col("x.doc_id") =!= col("y.doc_id"))
          .select(col("x.doc_id"), col("y.doc_id"))
        Sampling.negativeSample(
          docs.where(pmod(col("doc_id"), lit(20)) === 0), docs,
          "doc_id", k = 4, avoid = avoid, nBuckets = 0, seed = 7)
      },
      Some(s"""WITH nb AS (
              |  SELECT greatest(1, count(*) // 256) AS b FROM documents),
              |a AS (
              |  SELECT doc_id FROM documents WHERE doc_id % 20 = 0),
              |cand AS (SELECT doc_id AS neg_id,
              |    ${h32Sql("CAST(doc_id AS VARCHAR)", "7")}
              |      % (SELECT b FROM nb) AS bucket
              |  FROM documents),
              |slots AS (SELECT a.doc_id, s.slot,
              |    ${h32Sql(
                     "CAST(a.doc_id AS VARCHAR) || ':' || CAST(s.slot AS VARCHAR)",
                     "8")} % (SELECT b FROM nb) AS bucket
              |  FROM a, (SELECT unnest(range(0, 4)) AS slot) s),
              |sr AS (SELECT doc_id, slot, bucket,
              |    row_number() OVER (PARTITION BY doc_id, bucket
              |      ORDER BY slot) AS rs
              |  FROM slots),
              |dgx AS (SELECT doc_id, md5(text) AS dg FROM documents),
              |av AS (SELECT x.doc_id, y.doc_id AS neg_id
              |       FROM dgx x JOIN dgx y
              |         ON x.dg = y.dg AND x.doc_id <> y.doc_id),
              |sc AS (SELECT sl.doc_id, sl.bucket, c.neg_id,
              |    ${h32Sql(
                     "CAST(sl.doc_id AS VARCHAR) || ':' || CAST(c.neg_id AS VARCHAR)",
                     "9")} AS score
              |  FROM (SELECT DISTINCT doc_id, bucket FROM slots) sl
              |  JOIN cand c USING (bucket)
              |  WHERE c.neg_id <> sl.doc_id
              |    AND NOT EXISTS (SELECT 1 FROM av
              |      WHERE av.doc_id = sl.doc_id
              |        AND av.neg_id = c.neg_id)),
              |r AS (SELECT doc_id, bucket, neg_id,
              |    count(*) OVER (PARTITION BY doc_id, bucket) AS n_bucket,
              |    row_number() OVER (PARTITION BY doc_id, bucket
              |      ORDER BY score, neg_id) AS rn
              |  FROM sc)
              |SELECT sr.doc_id, CAST(sr.slot AS INT) AS slot, r.neg_id,
              |  CAST(r.n_bucket AS BIGINT) AS n_bucket
              |FROM sr JOIN r ON sr.doc_id = r.doc_id
              |  AND sr.bucket = r.bucket AND sr.rs = r.rn""".stripMargin)),

    // GR: one synchronized Louvain local-move round over the detected
    // communities — the modularity-ASCENT refinement label propagation
    // lacks; gr_modularity then scores the result. Oracle shares the
    // exact l3 chain (lpropL3Ctes) and replays the gain formula in the
    // same operation order; ties break to the smallest target label.
    Q("gr_louvain_step",
      (s, dir) => {
        val bidir = suppBidirEdges(s, dir)
        PageRank.louvainMoveRound(bidir,
          PageRank.labelPropagation(bidir, iterations = 3))
      },
      Some(s"""WITH $lpropL3Ctes,
              |tot AS (SELECT count(*)::DOUBLE AS m2 FROM e),
              |dg AS (SELECT src AS node, count(*) AS ki FROM e GROUP BY 1),
              |ds AS (SELECT l.label, CAST(sum(d.ki) AS BIGINT) AS dc
              |       FROM l3 l JOIN dg d ON l.node = d.node GROUP BY 1),
              |kic0 AS (SELECT e.src AS node, lb.label AS c,
              |           count(*) AS kic
              |         FROM e JOIN l3 lb ON e.dst = lb.node GROUP BY 1, 2),
              |cands AS (SELECT node, c, CAST(sum(kic) AS BIGINT) AS kic
              |  FROM (SELECT node, c, kic FROM kic0
              |        UNION ALL SELECT node, label AS c, 0 FROM l3)
              |  GROUP BY 1, 2),
              |kown AS (SELECT cands.node, kic AS kown
              |         FROM cands JOIN l3
              |           ON cands.node = l3.node AND cands.c = l3.label),
              |gg AS (SELECT cd.node, l3.label AS a, cd.c,
              |    CASE WHEN cd.c = l3.label THEN 0e0 ELSE
              |      2e0 * (cd.kic - kown.kown) / m2
              |      - 2e0 * dg.ki * (dt.dc - da.dc + dg.ki) / (m2 * m2)
              |    END AS gn
              |  FROM cands cd JOIN l3 ON cd.node = l3.node
              |  JOIN dg ON cd.node = dg.node
              |  JOIN ds dt ON cd.c = dt.label
              |  JOIN ds da ON l3.label = da.label
              |  JOIN kown ON cd.node = kown.node, tot),
              |r AS (SELECT node, a, c, gn, row_number() OVER (
              |        PARTITION BY node ORDER BY gn DESC, c ASC) AS rn
              |      FROM gg)
              |SELECT node, a AS old_label,
              |  CAST(CASE WHEN gn > 0 THEN c ELSE a END AS BIGINT)
              |    AS new_label,
              |  (CASE WHEN gn > 0 THEN floor(gn * 1e9 + 5e-1) / 1e9
              |    ELSE 0e0 END) + 0e0 AS gain
              |FROM r WHERE rn = 1""".stripMargin)),

    // GR: multi-level Louvain over a GENUINELY WEIGHTED graph — the
    // part co-order graph with co-occurrence counts as edge weights
    // (affinity graphs are where weighted ΔQ earns its keep: a pair
    // co-ordered 5 times pulls 5x harder than a one-off). Identity
    // start labels; same 2-level x 2-round unrolled oracle schedule as
    // gr_louvain_multi, seeded with the input's own weights.
    Q("gr_louvain_weighted",
      (s, dir) => {
        val e = partCoorderEdges(s, dir)
        val labels0 = e.select(col("src").as("node")).distinct()
          .select(col("node"), col("node").as("label"))
        PageRank.louvainMultiWeighted(e.select("src", "dst", "w"),
          labels0, maxRounds = 2, maxLevels = 2)
      },
      Some(s"""WITH ew AS MATERIALIZED (
              |  SELECT a.l_partkey AS src, b.l_partkey AS dst,
              |    CAST(count(*) AS BIGINT) AS w
              |  FROM lineitem a JOIN lineitem b
              |  ON a.l_orderkey = b.l_orderkey
              |    AND a.l_partkey <> b.l_partkey
              |  GROUP BY 1, 2 HAVING count(*) >= 2),
              |l0w AS MATERIALIZED (
              |  SELECT DISTINCT src AS node, src AS label FROM ew),
              |${louvainWRoundCtes("q1", "ew", "l0w", "wv1a", 1)},
              |${louvainWRoundCtes("q2", "ew", "wv1a", "wv1", 2)},
              |${louvainContractCtes("ew", "wv1", "we2", "wi0")},
              |${louvainWRoundCtes("q3", "we2", "wi0", "wv2a", 1)},
              |${louvainWRoundCtes("q4", "we2", "wv2a", "wv2", 2)}
              |SELECT m.node, f.label
              |FROM wv1 m JOIN wv2 f ON m.label = f.node""".stripMargin)),

    // GR: deterministic truncated RANDOM WALKS over the co-order graph
    // — the DeepWalk/node2vec data-prep operator: the walk corpus a
    // skip-gram embedding trains on. Step s of walk (node, j) moves to
    // the md5(node:j:s)-th neighbor (neighbors ranked by id), so the
    // corpus is a pure function of (graph, seed) and the oracle
    // unrolls the 4 steps exactly.
    Q("gr_random_walks",
      (s, dir) => PageRank.randomWalks(
        partCoorderEdges(s, dir).select("src", "dst"),
        walksPerNode = 2, length = 4, seed = 11),
      Some {
        def step(k: Int) =
          s"""s$k AS MATERIALIZED (
             |  SELECT c.node, c.walk, CAST($k AS INT) AS step,
             |    nb.dst AS visited
             |  FROM s${k - 1} c JOIN nb ON nb.src = c.visited
             |  WHERE nb.rn = ${h32Sql(
                 "CAST(c.node AS VARCHAR) || ':' || " +
                   s"CAST(c.walk AS VARCHAR) || ':$k'", "11")}
             |    % nb.deg)"""
        s"""WITH e AS MATERIALIZED (
           |  SELECT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |  ON a.l_orderkey = b.l_orderkey
           |    AND a.l_partkey <> b.l_partkey
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |nb AS MATERIALIZED (
           |  SELECT src, dst,
           |    row_number() OVER (PARTITION BY src ORDER BY dst) - 1
           |      AS rn,
           |    count(*) OVER (PARTITION BY src) AS deg FROM e),
           |s0 AS MATERIALIZED (
           |  SELECT node, CAST(wj AS INT) AS walk, CAST(0 AS INT)
           |    AS step, node AS visited
           |  FROM (SELECT DISTINCT src AS node FROM e),
           |    (SELECT unnest(range(0, 2)) AS wj)),
           |${(1 to 4).map(step).mkString(",\n")}
           |SELECT node, walk, step, visited FROM s0
           |UNION ALL SELECT node, walk, step, visited FROM s1
           |UNION ALL SELECT node, walk, step, visited FROM s2
           |UNION ALL SELECT node, walk, step, visited FROM s3
           |UNION ALL SELECT node, walk, step, visited FROM s4""".stripMargin
      }),

    // GR: the CONVERGED 3-core of the part CO-ORDER graph (parts
    // co-occurring in at least 2 orders — the co-purchase graph,
    // sparsified so the peel has real structure: 1892 -> 1055 nodes
    // over 8 rounds at the gate sf) — gr_kcore's bounded 3-round peel
    // run to the FIXPOINT with within-core degrees out. Oracle unrolls
    // 9 peel rounds (matching maxRounds; a no-drop round replays as a
    // no-op, the louvainMulti replayability contract) and reads the
    // degrees off the final survivor set.
    Q("gr_kcore_full",
      (s, dir) => PageRank.kCore(
        partCoorderEdges(s, dir).select("src", "dst"),
        k = 3, maxRounds = 9),
      Some {
        def round(n: Int) = {
          val prev = if (n == 1) "ks0" else s"ks${n - 1}"
          s"""kd$n AS (SELECT e.src AS node, count(*) AS d
             |  FROM e JOIN $prev a ON e.src = a.node
             |  JOIN $prev b ON e.dst = b.node GROUP BY 1),
             |ks$n AS MATERIALIZED (SELECT node FROM kd$n WHERE d >= 3)"""
        }
        s"""WITH e AS MATERIALIZED (
           |  SELECT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |  ON a.l_orderkey = b.l_orderkey
           |    AND a.l_partkey <> b.l_partkey
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |ks0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
           |${(1 to 9).map(round).mkString(",\n")}
           |SELECT node, CAST(d AS BIGINT) AS core_deg FROM (
           |  SELECT e.src AS node, count(*) AS d
           |  FROM e JOIN ks9 a ON e.src = a.node
           |  JOIN ks9 b ON e.dst = b.node GROUP BY 1)""".stripMargin
      }),

    // GR: full CORENESS decomposition of the same co-order graph via
    // the H-index iteration (Lü et al. 2016: c0 = degree, c_{t+1}(v) =
    // H of neighbors' c_t; the fixpoint IS the coreness) — converges
    // in 7 rounds at the gate sf; the oracle unrolls 8 (no-change
    // rounds replay as no-ops). Cross-checked against gr_kcore by
    // spec: {coreness >= 3} == the 3-core.
    Q("gr_coreness",
      (s, dir) => PageRank.coreness(
        partCoorderEdges(s, dir).select("src", "dst"), maxRounds = 8)
        .select(col("node"), col("core").as("coreness")),
      Some {
        def round(n: Int) =
          s"""cr$n AS (SELECT e.src AS node, c.core AS nc
             |  FROM e JOIN core${n - 1} c ON e.dst = c.node),
             |hx$n AS (SELECT node, max(least(nc, rn)) AS h FROM (
             |  SELECT node, nc, row_number() OVER (
             |    PARTITION BY node ORDER BY nc DESC) AS rn
             |  FROM cr$n) GROUP BY node),
             |core$n AS MATERIALIZED (
             |  SELECT node, CAST(h AS BIGINT) AS core FROM hx$n)"""
        s"""WITH e AS MATERIALIZED (
           |  SELECT a.l_partkey AS src, b.l_partkey AS dst
           |  FROM lineitem a JOIN lineitem b
           |  ON a.l_orderkey = b.l_orderkey
           |    AND a.l_partkey <> b.l_partkey
           |  GROUP BY 1, 2 HAVING count(*) >= 2),
           |core0 AS MATERIALIZED (
           |  SELECT src AS node, CAST(count(*) AS BIGINT) AS core
           |  FROM e GROUP BY 1),
           |${(1 to 8).map(round).mkString(",\n")}
           |SELECT node, core AS coreness FROM core8""".stripMargin
      }),

    // GR: weighted modularity of the CONTRACTED community graph under
    // its identity labeling — by the contraction convention (intra
    // weight on the self-loop, degrees preserved) these q_contribs
    // EQUAL gr_modularity's on the original graph (the invariance
    // spec), so the row pins the convention end to end with its own
    // oracle replay of contraction + weighted scoring.
    Q("gr_modularity_contracted",
      (s, dir) => {
        val bidir = suppBidirEdges(s, dir)
        val labels = PageRank.labelPropagation(bidir, iterations = 3)
        PageRank.modularityWeighted(
          PageRank.contract(bidir.withColumn("w", lit(1L)), labels),
          labels.select(col("label").as("node"), col("label")).distinct())
      },
      Some(s"""WITH $lpropL3Ctes,
              |ew AS (SELECT src, dst, CAST(1 AS BIGINT) AS w FROM e),
              |${louvainContractCtes("ew", "l3", "e2", "i0")},
              |tot AS (SELECT sum(w)::DOUBLE AS m2 FROM e2),
              |dg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS d
              |       FROM e2 GROUP BY 1),
              |dl AS (SELECT i0.label, count(*) AS n_nodes,
              |         CAST(sum(dg.d) AS BIGINT) AS degree_sum
              |       FROM i0 JOIN dg ON i0.node = dg.node GROUP BY 1),
              |iw AS (SELECT la.label AS label,
              |         CAST(sum(e2.w) AS BIGINT) AS intra_w
              |       FROM e2 JOIN i0 la ON e2.src = la.node
              |       JOIN i0 lb ON e2.dst = lb.node
              |       WHERE la.label = lb.label GROUP BY 1)
              |SELECT dl.label, dl.n_nodes,
              |  CAST(coalesce(iw.intra_w, 0) AS BIGINT) AS intra_w,
              |  dl.degree_sum,
              |  floor((coalesce(iw.intra_w, 0) / m2 -
              |    (dl.degree_sum / m2) * (dl.degree_sum / m2)) * 1e6
              |    + 5e-1) / 1e6 AS q_contrib
              |FROM dl LEFT JOIN iw USING (label), tot""".stripMargin)),

    // GR: MULTI-LEVEL Louvain (both Blondel phases) — local-move rounds
    // to a fixpoint, communities CONTRACTED to super-nodes (intra
    // weight on a self-loop, parallel edges summed), move rounds
    // re-run on the coarsened graph, labels unfolded. The oracle
    // UNROLLS the exact (2 levels x 2 rounds) schedule — round CTEs
    // generated by the same template, contraction replayed — which the
    // impl's replayability contract guarantees matches its early-exit
    // behavior (it only exits early in provable no-op states).
    Q("gr_louvain_multi",
      (s, dir) => {
        val bidir = suppBidirEdges(s, dir)
        PageRank.louvainMulti(bidir,
          PageRank.labelPropagation(bidir, iterations = 3),
          maxRounds = 2, maxLevels = 2)
      },
      Some(s"""WITH $lpropL3Ctes,
              |ew AS MATERIALIZED (
              |  SELECT src, dst, CAST(1 AS BIGINT) AS w FROM e),
              |l3m AS MATERIALIZED (SELECT node, label FROM l3),
              |${louvainWRoundCtes("r1", "ew", "l3m", "lv1a", 1)},
              |${louvainWRoundCtes("r2", "ew", "lv1a", "lv1", 2)},
              |${louvainContractCtes("ew", "lv1", "e2", "i0")},
              |${louvainWRoundCtes("r3", "e2", "i0", "lv2a", 1)},
              |${louvainWRoundCtes("r4", "e2", "lv2a", "lv2", 2)}
              |SELECT m.node, f.label
              |FROM lv1 m JOIN lv2 f ON m.label = f.node""".stripMargin))
  )

  /** DuckDB replay of ONE PARITY-GATED weighted Louvain move round
    * over edge CTE `e` (src, dst, w) and label CTE `l` (node, label),
    * emitting label CTE `out`(node, label) —
    * PageRank.louvainMoveRoundWeighted term for term (weighted degrees,
    * self-loops excluded from k_ic, smallest-label ties, same operation
    * order so doubles match bit-for-bit), with round `r`'s move gate
    * (md5(node:r) % 2 == 0) applied to the winning move exactly as
    * PageRank.fixpointWeighted applies it. Internal CTE names carry
    * prefix `x` so unrolled rounds don't collide. */
  private def louvainWRoundCtes(x: String, e: String, l: String,
                                out: String, r: Int): String =
    s"""${x}tot AS (SELECT sum(w)::DOUBLE AS m2 FROM $e),
       |${x}dg AS (SELECT src AS node, CAST(sum(w) AS BIGINT) AS ki
       |           FROM $e GROUP BY 1),
       |${x}ds AS (SELECT l.label, CAST(sum(d.ki) AS BIGINT) AS dc
       |           FROM $l l JOIN ${x}dg d ON l.node = d.node GROUP BY 1),
       |${x}kic AS (SELECT e.src AS node, lb.label AS c,
       |             CAST(sum(e.w) AS BIGINT) AS kic
       |           FROM $e e JOIN $l lb ON e.dst = lb.node
       |           WHERE e.src <> e.dst GROUP BY 1, 2),
       |${x}cd AS (SELECT node, c, CAST(sum(kic) AS BIGINT) AS kic
       |  FROM (SELECT node, c, kic FROM ${x}kic
       |        UNION ALL SELECT node, label AS c, 0 FROM $l)
       |  GROUP BY 1, 2),
       |${x}ko AS (SELECT cd.node, cd.kic AS kown
       |           FROM ${x}cd cd JOIN $l l
       |             ON cd.node = l.node AND cd.c = l.label),
       |${x}gg AS (SELECT cd.node, l.label AS a, cd.c,
       |    CASE WHEN cd.c = l.label THEN 0e0 ELSE
       |      2e0 * (cd.kic - ko.kown) / m2
       |      - 2e0 * dg.ki * (dt.dc - da.dc + dg.ki) / (m2 * m2)
       |    END AS gn
       |  FROM ${x}cd cd JOIN $l l ON cd.node = l.node
       |  JOIN ${x}dg dg ON cd.node = dg.node
       |  JOIN ${x}ds dt ON cd.c = dt.label
       |  JOIN ${x}ds da ON l.label = da.label
       |  JOIN ${x}ko ko ON cd.node = ko.node, ${x}tot),
       |$out AS MATERIALIZED (SELECT node,
       |    CAST(CASE WHEN gn > 0 AND
       |        ${h32Sql(s"CAST(node AS VARCHAR) || ':$r'", "0")} % 2 = 0
       |      THEN c ELSE a END AS BIGINT) AS label
       |  FROM (SELECT node, a, c, gn, row_number() OVER (
       |          PARTITION BY node ORDER BY gn DESC, c ASC) AS rn
       |        FROM ${x}gg)
       |  WHERE rn = 1)""".stripMargin

  /** DuckDB replay of PageRank.contract: communities of label CTE `l`
    * collapse to super-nodes in `outE`(src, dst, w) — the full directed
    * intra weight lands on the (c, c) self-loop row — and `outL` is the
    * identity labeling of the contracted nodes. */
  private def louvainContractCtes(e: String, l: String, outE: String,
                                  outL: String): String =
    s"""$outE AS MATERIALIZED (SELECT la.label AS src, lb.label AS dst,
       |    CAST(sum(e.w) AS BIGINT) AS w
       |  FROM $e e JOIN $l la ON e.src = la.node
       |  JOIN $l lb ON e.dst = lb.node
       |  GROUP BY 1, 2),
       |$outL AS MATERIALIZED (SELECT DISTINCT label AS node, label FROM $l)"""
      .stripMargin

  /** DuckDB replay of `LanguageModel.kn3LogPerplexity` (train split
    * doc_id % 4 != 0, D = 0.75) as CTEs ending in
    * `kn3_scored(doc_id, logppl)` — the full recursive interpolated-KN
    * chain: raw trigram counts at the top, continuation counts
    * N1+(·,w2,w3) in the middle, the bigram add-one continuation
    * unigram at the base; each unseen level falls through. Probability
    * expressions mirror the Spark operators term for term in the same
    * operation order. */
  private def kn3PplCtes: String = {
    val pcSql = "(coalesce(kn3_cont1.n1r1, 0) + 1e0)" +
      " / (kn3_sc.ntypes2 + kn3_sc.v + 1)"
    val p2Sql =
      s"""CASE WHEN kn3_z2.z2 IS NOT NULL THEN
         |      greatest(coalesce(kn3_b2.ckn, 0) - 0.75e0, 0e0) / kn3_z2.z2
         |      + 0.75e0 * kn3_z2.n1f2k / kn3_z2.z2 * ($pcSql)
         |    ELSE ($pcSql) END""".stripMargin
    s"""tk0 AS ($toksSql),
       |tok AS (SELECT id, unnest(tk) AS tok,
       |          unnest(range(1, len(tk) + 1)) AS pos
       |        FROM tk0),
       |tg AS (SELECT a.id, a.tok AS w1, b.tok AS w2, c.tok AS w3
       |       FROM tok a JOIN tok b ON a.id = b.id AND b.pos = a.pos + 1
       |       JOIN tok c ON a.id = c.id AND c.pos = a.pos + 2),
       |bg3 AS (SELECT a.id, a.tok AS w1, b.tok AS w2
       |        FROM tok a JOIN tok b
       |          ON a.id = b.id AND b.pos = a.pos + 1),
       |kn3_bc AS (SELECT w1, w2, count(*) AS bc FROM bg3
       |           WHERE id % 4 <> 0 GROUP BY 1, 2),
       |kn3_cont1 AS (SELECT w2 AS w3, count(*) AS n1r1
       |              FROM kn3_bc GROUP BY 1),
       |kn3_sc AS (SELECT (SELECT count(*) FROM kn3_bc) AS ntypes2,
       |    (SELECT count(DISTINCT tok) FROM tok WHERE id % 4 <> 0) AS v),
       |kn3_tc AS (SELECT w1, w2, w3, count(*) AS tc3 FROM tg
       |           WHERE id % 4 <> 0 GROUP BY 1, 2, 3),
       |kn3_cc AS (SELECT w1, w2, sum(tc3) AS cc3, count(*) AS n1f3
       |           FROM kn3_tc GROUP BY 1, 2),
       |kn3_b2 AS (SELECT w2, w3, count(*) AS ckn
       |           FROM kn3_tc GROUP BY 1, 2),
       |kn3_z2 AS (SELECT w2, sum(ckn) AS z2, count(*) AS n1f2k
       |           FROM kn3_b2 GROUP BY 1),
       |kn3_p AS (SELECT tg.id,
       |    CASE WHEN kn3_cc.cc3 IS NOT NULL THEN
       |      greatest(coalesce(kn3_tc.tc3, 0) - 0.75e0, 0e0) / kn3_cc.cc3
       |      + 0.75e0 * kn3_cc.n1f3 / kn3_cc.cc3 * ($p2Sql)
       |    ELSE ($p2Sql) END AS prob
       |  FROM tg LEFT JOIN kn3_tc USING (w1, w2, w3)
       |  LEFT JOIN kn3_cc USING (w1, w2)
       |  LEFT JOIN kn3_b2 USING (w2, w3)
       |  LEFT JOIN kn3_z2 USING (w2)
       |  LEFT JOIN kn3_cont1 USING (w3) CROSS JOIN kn3_sc),
       |kn3_scored AS (SELECT id AS doc_id,
       |    round(avg(-ln(prob)), 6) + 0e0 AS logppl
       |  FROM kn3_p GROUP BY id)""".stripMargin
  }

  /** The hourly gap-filled event series as CTEs ending in
    * `filled(user_id, h, v)` — the regular-series front end shared by
    * ts_seasonal and ts_period so the grid/forward-fill SQL cannot
    * drift between the decomposition and the period detector.
    * Mirrors `TimeSeries.gapFill` over hourly round-2 value sums for
    * `user_id < userBound`. */
  private def filledSeriesCtes(userBound: Int): String =
    s"""hourly AS (
       |  SELECT user_id, date_trunc('hour', ts) AS h,
       |    round(sum(value), 2) + 0e0 AS v
       |  FROM events WHERE user_id < $userBound GROUP BY 1, 2),
       |spans AS (
       |  SELECT user_id, min(h) AS h0, max(h) AS h1
       |  FROM hourly GROUP BY 1),
       |grid AS (
       |  SELECT user_id,
       |    unnest(generate_series(h0, h1, INTERVAL 3600 SECONDS)) AS h
       |  FROM spans),
       |filled AS (
       |  SELECT g.user_id, g.h,
       |    last_value(hourly.v IGNORE NULLS) OVER (
       |      PARTITION BY g.user_id ORDER BY g.h
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
       |  FROM grid g LEFT JOIN hourly
       |    ON g.user_id = hourly.user_id AND g.h = hourly.h)""".stripMargin

  /** The interpolated-KN scoring chain as CTEs ending in
    * `kn_scored(doc_id, logppl)` — ONE copy shared by ta_kn_perplexity,
    * ta_ppl_buckets, and pipe_pretrain_corpus so the model SQL cannot
    * drift between the score row, the bucket row, and the pipeline.
    * Mirrors `LanguageModel.knLogPerplexity` (train split doc_id % 4
    * != 0, D = 0.75, add-one continuation smoothing) term for term in
    * the same operation order. `rel` must expose (doc_id, text). */
  private def knPplCtes: String = knPplCtesFrom("documents")

  private def knPplCtesFrom(rel: String): String =
    s"""kn_tk0 AS (${toksSqlFrom(rel)}),
       |kn_tok AS (SELECT id, unnest(tk) AS tok,
       |          unnest(range(1, len(tk) + 1)) AS pos
       |        FROM kn_tk0),
       |kn_bg AS (SELECT a.id, a.tok AS w1, b.tok AS w2
       |       FROM kn_tok a JOIN kn_tok b
       |         ON a.id = b.id AND b.pos = a.pos + 1),
       |kn_tr AS (SELECT * FROM kn_bg WHERE id % 4 <> 0),
       |kn_bc AS (SELECT w1, w2, count(*) AS bc FROM kn_tr GROUP BY 1, 2),
       |kn_cc AS (SELECT w1, sum(bc) AS cc, count(*) AS n1f
       |          FROM kn_bc GROUP BY 1),
       |kn_cont AS (SELECT w2, count(*) AS n1r FROM kn_bc GROUP BY 1),
       |kn_sc AS (SELECT (SELECT count(*) FROM kn_bc) AS ntypes,
       |    (SELECT count(DISTINCT tok) FROM kn_tok WHERE id % 4 <> 0) AS v),
       |kn_p AS (SELECT kn_bg.id,
       |    CASE WHEN kn_cc.cc IS NOT NULL THEN
       |      greatest(coalesce(kn_bc.bc, 0) - 0.75e0, 0e0) / kn_cc.cc
       |      + 0.75e0 * kn_cc.n1f / kn_cc.cc *
       |        ((coalesce(kn_cont.n1r, 0) + 1e0)
       |          / (kn_sc.ntypes + kn_sc.v + 1))
       |    ELSE (coalesce(kn_cont.n1r, 0) + 1e0)
       |      / (kn_sc.ntypes + kn_sc.v + 1) END AS prob
       |  FROM kn_bg LEFT JOIN kn_bc USING (w1, w2)
       |  LEFT JOIN kn_cc USING (w1)
       |  LEFT JOIN kn_cont USING (w2) CROSS JOIN kn_sc),
       |kn_scored AS (SELECT id AS doc_id,
       |    round(avg(-ln(prob)), 6) + 0e0 AS logppl
       |  FROM kn_p GROUP BY id)""".stripMargin

  /** DuckDB replay of `Similarity.knnDescent(k=5, rounds=2)` over the
    * embeddings table: SRP-bucket init, then two
    * neighbor-of-neighbor rounds (reverse lists k-capped, candidates
    * deduped, union with the current list, exact-cosine re-rank) —
    * CTEs ending in `l2(q, c, cosine, rn)`, ONE copy shared by
    * ann_knn_descent and ann_knn_recall. */
  private def knnDescentCtes: String = knnDescentCtesOver(
    "SELECT vec_id AS id, embedding AS v FROM embeddings")

  /** 64-dim cluster-mixture fixture body (DuckDB side): 8 tight
    * clusters — a spike of 8 on dimension (vec_id % 8) plus small
    * id-derived jitter. Every term is an exact dyadic (k/16 + m/32 on
    * top of 8.0), so the double arithmetic and the FLOAT cast are
    * exact in both engines and the Spark/DuckDB arrays are
    * bit-identical; pattern period lcm(8,29,23) = 5336 > corpus size,
    * so all vectors are distinct. This is NN-Descent's OPERATING
    * REGIME (manifold-structured data, where bucket mates are true
    * neighbors), in contrast to the near-random `embeddings` fixture
    * where any k-NN structure is noise. */
  private def structuredE0Sql: String =
    """SELECT vec_id AS id,
      |  list_transform(range(0, 64), i -> (
      |    (CASE WHEN i = vec_id % 8 THEN 8e0 ELSE 0e0 END)
      |    + ((vec_id * 131 + i * 31) % 29 - 14) / 16e0
      |    + ((vec_id * 17 + i * 13) % 23 - 11) / 32e0)::FLOAT) AS v
      |FROM embeddings""".stripMargin

  /** Spark twin of [[structuredE0Sql]] — identical exact-dyadic
    * arithmetic, one expression string audited against the SQL above. */
  private def structuredEmb(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings").select(col("vec_id"),
      expr("""transform(sequence(0, 63), i -> CAST(
        (CASE WHEN i = vec_id % 8 THEN 8.0 ELSE 0.0 END)
        + ((vec_id * 131 + i * 31) % 29 - 14) / 16.0
        + ((vec_id * 17 + i * 13) % 23 - 11) / 32.0 AS FLOAT))""")
        .as("embedding"))

  /** Recall@5 of a kNN graph `g` against a SEEDED FIXED-SIZE sampled
    * exact truth: the 64 lowest ids with id % 13 == 3 (13 is coprime
    * to the structured fixture's 8 clusters, so the sample spans
    * clusters). Truth = sample x corpus brute force with the sample
    * BROADCAST — linear in the corpus, unlike the all-pairs truth this
    * replaces (n² was the one plan-level scale-killer of r12). The
    * estimate is deterministic (fixed sample, fixed tie-break), so the
    * DuckDB replay is exact. */
  private def knnRecallSampled(emb: DataFrame, g: DataFrame): DataFrame = {
    val v = emb.select(col("vec_id").as("id"), col("embedding").as("v"))
    val q = v.where(pmod(col("id"), lit(13)) === 3)
      .orderBy(col("id")).limit(64)
      .select(col("id").as("q_id"), col("v").as("q_v"))
    val scored = v.select(col("id").as("c_id"), col("v").as("c_v"))
      .crossJoin(broadcast(q))
      .where(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"),
        Similarity.cosineCol(col("q_v"), col("c_v")).as("cosine"))
    Similarity.topKPerQuery(scored, "cosine", 5)
      .join(g.select(col("id").as("q_id"), col("nbr_id").as("c_id"))
        .withColumn("hit", lit(1)), Seq("q_id", "c_id"), "left")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"),
        (floor(sum(coalesce(col("hit"), lit(0))).cast("double") /
          count(lit(1)) * 1e6 + 0.5) / 1e6).as("recall"))
  }

  /** Oracle twin of [[knnRecallSampled]]: truth over the sampled
    * queries only, graph rows read from the chain's `l2`. */
  private def knnRecallSampledSql: String =
    s"""qs AS (SELECT id, v FROM e0 WHERE id % 13 = 3
       |       ORDER BY id LIMIT 64),
       |truth AS (
       |  SELECT q_id, c_id FROM (
       |    SELECT x.id AS q_id, y.id AS c_id,
       |      row_number() OVER (PARTITION BY x.id
       |        ORDER BY ${cosSql("x.v", "y.v")} DESC, y.id ASC)
       |        AS rn
       |    FROM qs x JOIN e0 y ON x.id <> y.id)
       |  WHERE rn <= 5)
       |SELECT count(*) AS n_truth,
       |  CAST(sum(CASE WHEN l2.q IS NOT NULL THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hit,
       |  floor(sum(CASE WHEN l2.q IS NOT NULL THEN 1e0 ELSE 0e0
       |    END) / count(*) * 1e6 + 5e-1) / 1e6 AS recall
       |FROM truth LEFT JOIN l2
       |  ON truth.q_id = l2.q AND truth.c_id = l2.c""".stripMargin

  /** DuckDB replay of `Similarity.knnDescentIncremental` over the
    * structured fixture split id % 5 != 0 (standing corpus) / == 0
    * (batch): the shared descent chain builds the standing graph
    * (`l2`) and standing bucket index (`bk`), then the incremental
    * step unrolls — batch buckets, init candidates, one descent
    * round, reverse pass re-ranking affected corpus nodes. Every
    * ranking comparison happens on the same 1e-6-quantized cosine the
    * Spark side uses. */
  private def knnIncrementalSql: String =
    s"""WITH ${knnDescentCtesOver(
        s"SELECT id, v FROM ($structuredE0Sql) WHERE id % 5 <> 0")},
       |gq0 AS (SELECT q, c, floor(cosine * 1e6 + 5e-1) / 1e6 AS cosine,
       |        rn FROM l2),
       |bk0 AS (SELECT id, tbl, bucket FROM bk),
       |av0 AS (SELECT id, v FROM e0),
       |bv1 AS MATERIALIZED (
       |  SELECT id, v FROM ($structuredE0Sql) WHERE id % 5 = 0),
       |${knnIncStepSql(1)}
       |SELECT q AS id, c AS nbr_id, cosine, CAST(rn AS INT) AS rank,
       |  kind FROM delta1""".stripMargin

  /** One unrolled `knnDescentIncremental` step (batch `s`), consuming
    * the chain state CTEs `gq{s-1}` (standing graph, QUANTIZED
    * cosines), `bk{s-1}` (standing bucket index), `av{s-1}` (standing
    * id→vector relation) and the batch CTE `bv$s`; emits `delta$s`
    * (q, c, cosine, rn, kind) plus the folded next state `gq$s` /
    * `bk$s` / `av$s` — so [[knnIncrementalSql]] (one batch) and
    * [[stKnnIncrementalSql]] (batch-sequenced fold) replay the same
    * Spark operator through the same SQL. */
  private def knnIncStepSql(s: Int): String = {
    val (g, bk, av) = (s"gq${s - 1}", s"bk${s - 1}", s"av${s - 1}")
    val bv = s"bv$s"
    def qcos(a: String, b: String) =
      s"floor(${cosSql(a, b)} * 1e6 + 5e-1) / 1e6"
    def keepQ(cand: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT q, c, cosine, rn FROM (
         |  SELECT cd.q, cd.c, ${qcos("x.v", "y.v")} AS cosine,
         |    row_number() OVER (PARTITION BY cd.q
         |      ORDER BY ${qcos("x.v", "y.v")} DESC, cd.c ASC) AS rn
         |  FROM $cand cd JOIN avx$s x ON cd.q = x.id
         |  JOIN avx$s y ON cd.c = y.id) WHERE rn <= 5)"""
    val bbk = (0 until 4).map(tb =>
      s"SELECT id, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM $bv")
      .mkString("\nUNION ALL\n")
    s"""bbk$s AS MATERIALIZED ($bbk),
       |avx$s AS MATERIALIZED (
       |  SELECT id, v FROM $av UNION ALL SELECT id, v FROM $bv),
       |ic0_$s AS (
       |  SELECT a.id AS q, b.id AS c FROM bbk$s a JOIN $bk b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  UNION
       |  SELECT a.id, b.id FROM bbk$s a JOIN bbk$s b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id <> b.id),
       |${keepQ(s"ic0_$s", s"nl0_$s")},
       |ilists$s AS (SELECT q AS n, c FROM nl0_$s
       |             UNION ALL SELECT q AS n, c FROM $g),
       |icd1_$s AS (
       |  SELECT x.q, y.c FROM nl0_$s x JOIN ilists$s y ON x.c = y.n
       |  WHERE x.q <> y.c
       |  UNION SELECT q, c FROM nl0_$s),
       |${keepQ(s"icd1_$s", s"nl1_$s")},
       |irev$s AS MATERIALIZED (
       |  SELECT b.id AS q, a.id AS c FROM bbk$s a JOIN $bk b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket
       |  UNION SELECT c AS q, q AS c FROM nl1_$s
       |  WHERE c NOT IN (SELECT id FROM $bv)),
       |irs$s AS (
       |  SELECT rv.q, rv.c, ${qcos("x.v", "y.v")} AS cosine
       |  FROM irev$s rv JOIN avx$s x ON rv.q = x.id
       |  JOIN $bv y ON rv.c = y.id),
       |imerged$s AS (
       |  SELECT q, c, cosine FROM irs$s
       |  UNION ALL
       |  SELECT g.q, g.c, g.cosine FROM $g g
       |  WHERE g.q IN (SELECT q FROM irev$s)),
       |iupd$s AS (SELECT q, c, cosine, rn FROM (
       |  SELECT q, c, cosine, row_number() OVER (PARTITION BY q
       |    ORDER BY cosine DESC, c ASC) AS rn
       |  FROM imerged$s) WHERE rn <= 5),
       |delta$s AS MATERIALIZED (
       |  SELECT q, c, cosine, rn, 'new' AS kind FROM nl1_$s
       |  UNION ALL
       |  SELECT q, c, cosine, rn, 'updated' AS kind FROM iupd$s),
       |gq$s AS (
       |  SELECT q, c, cosine, rn FROM $g
       |  WHERE q NOT IN (SELECT DISTINCT q FROM delta$s)
       |  UNION ALL
       |  SELECT q, c, cosine, rn FROM delta$s),
       |bk$s AS (SELECT id, tbl, bucket FROM $bk
       |         UNION ALL SELECT id, tbl, bucket FROM bbk$s),
       |av$s AS (SELECT id, v FROM avx$s)""".stripMargin
  }

  /** DuckDB replay of `KnnGraphStream.ingestFold` — the standing
    * build, then TWO chained incremental steps (ids % 10 == 0, then
    * % 10 == 5), each folding its delta into the graph/index/vector
    * state the next step consumes, exactly as the Spark fold does. */
  private def stKnnIncrementalSql: String =
    s"""WITH ${knnDescentCtesOver(
        s"SELECT id, v FROM ($structuredE0Sql) WHERE id % 5 <> 0")},
       |gq0 AS (SELECT q, c, floor(cosine * 1e6 + 5e-1) / 1e6 AS cosine,
       |        rn FROM l2),
       |bk0 AS (SELECT id, tbl, bucket FROM bk),
       |av0 AS (SELECT id, v FROM e0),
       |bv1 AS MATERIALIZED (
       |  SELECT id, v FROM ($structuredE0Sql) WHERE id % 10 = 0),
       |${knnIncStepSql(1)},
       |bv2 AS MATERIALIZED (
       |  SELECT id, v FROM ($structuredE0Sql) WHERE id % 10 = 5),
       |${knnIncStepSql(2)},
       |deltas AS (
       |  SELECT q, c, cosine, rn, kind, 0 AS batch_id FROM delta1
       |  UNION ALL
       |  SELECT q, c, cosine, rn, kind, 1 AS batch_id FROM delta2)
       |SELECT q AS id, c AS nbr_id, cosine, CAST(rn AS INT) AS rank,
       |  kind, CAST(batch_id AS BIGINT) AS batch_id FROM deltas""".stripMargin

  /** [[knnDescentCtes]] parameterized by the corpus CTE body, so the
    * same chain replays the descent over the real embeddings AND the
    * structured fixture. */
  private def knnDescentCtesOver(e0Body: String): String = {
    val buckets = (0 until 4).map(tb =>
      s"SELECT id, $tb AS tbl, ${srpBucketSql("v", tb, 8)} AS bucket FROM e0")
      .mkString("\nUNION ALL\n")
    def keep(cand: String, out: String) =
      s"""$out AS MATERIALIZED (SELECT q, c, cosine, rn FROM (
         |  SELECT cd.q, cd.c, ${cosSql("x.v", "y.v")} AS cosine,
         |    row_number() OVER (PARTITION BY cd.q
         |      ORDER BY ${cosSql("x.v", "y.v")} DESC, cd.c ASC) AS rn
         |  FROM $cand cd JOIN e0 x ON cd.q = x.id
         |  JOIN e0 y ON cd.c = y.id) WHERE rn <= 5)"""
    def round(r: Int) =
      s"""rv$r AS (SELECT nq AS q, nc AS c FROM (
         |  SELECT l.c AS nq, l.q AS nc, row_number() OVER (
         |    PARTITION BY l.c ORDER BY l.cosine DESC, l.q ASC) AS krn
         |  FROM l${r - 1} l) WHERE krn <= 5),
         |ud$r AS (SELECT q AS a, c AS b FROM l${r - 1}
         |         UNION SELECT q, c FROM rv$r),
         |cd$r AS (SELECT DISTINCT x.a AS q, y.b AS c
         |         FROM ud$r x JOIN ud$r y ON x.b = y.a
         |         WHERE x.a <> y.b
         |         UNION SELECT q, c FROM l${r - 1}),
         |${keep(s"cd$r", s"l$r")}"""
    s"""e0 AS MATERIALIZED (
       |$e0Body),
       |bk AS MATERIALIZED ($buckets),
       |c0 AS (SELECT DISTINCT a.id AS q, b.id AS c FROM bk a JOIN bk b
       |       ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id <> b.id),
       |${keep("c0", "l0")},
       |${round(1)},
       |${round(2)}""".stripMargin
  }

  /** DuckDB replay of the hashed-unigram Naive Bayes train + score
    * (TextAnalysis.nbTrain/nbScores: doc_id%5!=0 split, lang label,
    * 64 buckets, add-one smoothing) as CTEs ending in
    * `sc(id, label, score)` — ONE copy shared by ta_nb_classifier and
    * ds_calibration so the scored distribution cannot drift between
    * the classifier row and its calibration audit. */
  private def nbScoredCtes: String =
    s"""toks AS ($toksSql),
       |trb AS (
       |  SELECT d.lang AS label, ${h32Sql("tok", "0")} % 64 AS bucket
       |  FROM (SELECT id, unnest(tk) AS tok FROM toks) t
       |  JOIN documents d ON d.doc_id = t.id
       |  WHERE d.doc_id % 5 <> 0),
       |cnt AS (SELECT label, bucket, count(*) AS n FROM trb
       |        GROUP BY 1, 2),
       |tot AS (SELECT label, count(*) AS nn FROM trb GROUP BY 1),
       |nd AS (SELECT lang AS label, count(*) AS docs FROM documents
       |       WHERE doc_id % 5 <> 0 GROUP BY 1),
       |ntot AS (SELECT count(*) AS total FROM documents
       |         WHERE doc_id % 5 <> 0),
       |grid AS (SELECT label, b AS bucket
       |         FROM tot, (SELECT unnest(range(0, 64)) AS b)),
       |model AS (
       |  SELECT g.label, g.bucket,
       |    ln((coalesce(cnt.n, 0) + 1)::DOUBLE / (tot.nn + 64))
       |      AS logp,
       |    ln(nd.docs::DOUBLE / ntot.total) AS logprior
       |  FROM grid g
       |  LEFT JOIN cnt ON g.label = cnt.label AND g.bucket = cnt.bucket
       |  JOIN tot ON g.label = tot.label
       |  JOIN nd ON g.label = nd.label CROSS JOIN ntot),
       |db AS (
       |  SELECT id, ${h32Sql("tok", "0")} % 64 AS bucket,
       |    count(*) AS c
       |  FROM (SELECT id, unnest(tk) AS tok FROM toks) t
       |  WHERE id % 5 = 0 GROUP BY 1, 2),
       |sc AS MATERIALIZED (
       |  SELECT db.id, m.label,
       |    sum(db.c * m.logp) + max(m.logprior) AS score
       |  FROM db JOIN model m ON db.bucket = m.bucket
       |  GROUP BY db.id, m.label)""".stripMargin

  /** DuckDB replay of `BpeTrainer.bpeTrain(nMerges = iters)`: the word-
    * frequency dictionary, then per round — pair counts, the (count
    * desc, lhs, rhs) argmax, and greedy merge application expressed as
    * run-start parity (merge position i iff marked and (i - runStart)
    * even; overlapping marks require lhs == rhs, where the greedy scan
    * takes every other position of each maximal run). Assumes the
    * corpus yields at least `iters` mergeable pairs (true for the
    * documents fixture; the impl stops early otherwise). */
  private def bpeTrainSql(iters: Int): String =
    s"""WITH ${bpeTrainCtes(iters)}
       |${bpeMergesOutSql(iters)}""".stripMargin

  private def bpeMergesOutSql(iters: Int): String =
    (1 to iters).map(r =>
      s"SELECT CAST($r AS INTEGER) AS rank, a AS lhs, b AS rhs, cnt AS pair_count FROM bpe_b$r")
      .mkString("\nUNION ALL\n")

  private def bpeTrainCtes(iters: Int): String =
    s"""tk0 AS ($toksSql),
       |${bpeTrainCtesFrom(iters, "tk0")}""".stripMargin

  /** [[bpeTrainCtes]] parameterized over the token CTE (id, tk) the
    * dictionary builds from — the capstone v2 trains on its own kept
    * corpus, not the raw documents table. */
  private def bpeTrainCtesFrom(iters: Int, tokCte: String): String = {
    val rounds = (1 to iters).map { r =>
      val prev = s"bpe_s${r - 1}"
      s"""bpe_p$r AS (
         |  SELECT pa AS a, pb AS b, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, sy[i] AS pa, sy[i + 1] AS pb
         |        FROM (SELECT freq, sy, unnest(range(1, len(sy))) AS i
         |              FROM $prev))
         |  GROUP BY 1, 2),
         |bpe_b$r AS (SELECT a, b, cnt FROM bpe_p$r
         |            ORDER BY cnt DESC, a ASC, b ASC LIMIT 1),
         |bpe_x$r AS (
         |  SELECT word, freq, i, sy[i] AS s_i,
         |    CASE WHEN i < len(sy) AND sy[i] = bpe_b$r.a
         |           AND sy[i + 1] = bpe_b$r.b THEN 1 ELSE 0 END AS m
         |  FROM (SELECT word, freq, sy,
         |          unnest(range(1, len(sy) + 1)) AS i
         |        FROM $prev)
         |  CROSS JOIN bpe_b$r),
         |bpe_g$r AS (
         |  SELECT word, freq, i, s_i,
         |    m = 1 AND (i - min(i) OVER (PARTITION BY word, grp)) % 2 = 0
         |      AS merged
         |  FROM (SELECT *, CASE WHEN m = 1 THEN i - row_number()
         |          OVER (PARTITION BY word, m ORDER BY i)
         |          ELSE NULL END AS grp
         |        FROM bpe_x$r)),
         |bpe_y$r AS (
         |  SELECT word, freq, i,
         |    CASE WHEN merged THEN s_i || lead_s ELSE s_i END AS sym,
         |    lag(merged, 1, FALSE) OVER (PARTITION BY word ORDER BY i)
         |      AS consumed
         |  FROM (SELECT *, lead(s_i) OVER (PARTITION BY word ORDER BY i)
         |          AS lead_s
         |        FROM bpe_g$r)),
         |bpe_s$r AS MATERIALIZED (
         |  SELECT word, freq, list(sym ORDER BY i) AS sy
         |  FROM bpe_y$r WHERE NOT consumed GROUP BY word, freq)"""
        .stripMargin
    }.mkString(",\n")
    s"""bpe_s0 AS MATERIALIZED (
       |  SELECT word, count(*) AS freq, string_split(word, '') AS sy
       |  FROM (SELECT unnest(tk) AS word FROM $tokCte) GROUP BY word),
       |$rounds""".stripMargin
  }

  // =================================================================
  // Assembled registry
  // =================================================================

  private def registry: Seq[Q] =
    scanQueries ++ filterQueries ++ joinQueries ++ aggQueries ++
      sortSetQueries ++ functionQueries ++ graphQueries ++ pipelineQueries ++
      extraQueries ++ tailQueries ++ retrievalQueries

  /** Internal lookup usable while the registry is being built (for queries
    * that compose other queries, e.g. p7 over g4). */
  private def queriesInternal: Map[String, (SparkSession, String) => DataFrame] =
    (scanQueries ++ filterQueries ++ joinQueries ++ aggQueries ++
      sortSetQueries ++ functionQueries ++ graphQueries ++ pipelineQueries)
      .map(q => q.name -> q.fn).toMap

  // ------------------------------------------------------------ contract

  /** Flagship query on sf=0.001: region revenue rollup through the full
    * join chain (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    t(spark, dir, "region")
      .join(t(spark, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
      .join(t(spark, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
      .join(t(spark, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
  }

  /** The raw registry name list BEFORE the map dedup — `queries` keeps
    * the last entry per name, so a duplicate silently shadows an older
    * row (it happened: a second gr_kcore unregistered the first);
    * RegistrySchemaSpec gates uniqueness through this. */
  def registryNames: Seq[String] = registry.map(_.name)

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
