package graft.functions

import scala.io.Source

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Byte-parity pins for the composite sha1 ids against
  * `src/test/resources/sha1_fixture.json`, generated INDEPENDENTLY by
  * `tools/gen_sha1_fixture.py` (python hashlib replicating the reference
  * loops of `etl/reviews_jsonl.py:39-46`, `etl/airbnb/reviews_jsonl.py:10-16`
  * and `etl/reviews.py:32-36` — including the trailing separator after the
  * LAST part, the None->"" guard of the 0x1f variant, the absent guard of
  * the "|" variant, and codepoint-counted 512/256/120 truncation). */
class Sha1ParitySpec extends SparkTestBase {
  import spark.implicits._

  // minimal JSON reader via Spark itself (no extra deps): load the fixture
  // file as a one-row json dataset
  private lazy val fixture = {
    val path = getClass.getResource("/sha1_fixture.json").getPath
    val txt = {
      val src = Source.fromFile(path, "UTF-8")
      try src.mkString finally src.close()
    }
    spark.read.json(Seq(txt).toDS)
  }

  private def one(c: Column): String =
    fixture.select(c.as("v")).head().getString(0)

  test("raw _sha1_id parts incl. nulls, unicode, embedded separator") {
    val rows = fixture.select(explode($"raw_sha1").as("r"))
      .select($"r.parts", $"r.digest").collect()
    assert(rows.length == 10)
    rows.foreach { row =>
      val parts = row.getSeq[String](0)
      val expected = row.getString(1)
      val cols = parts.map {
        case null => lit(null).cast("string")
        case s => lit(s)
      }
      val got = fixture.select(TextFunctions.sha1Id(cols: _*).as("d"))
        .head().getString(0)
      assert(got == expected, s"sha1Id(${parts.mkString(",")})")
    }
  }

  test("raw _hash_id pipe variant: None -> the literal string None") {
    val rows = fixture.select(explode($"raw_pipe").as("r"))
      .select($"r.parts", $"r.digest").collect()
    assert(rows.length == 4)
    rows.foreach { row =>
      val parts = row.getSeq[String](0)
      val expected = row.getString(1)
      // replicate python str(None) == "None" for the no-guard variant
      val cols = parts.map {
        case null => lit("None")
        case s => lit(s)
      }
      val got = fixture.select(TextFunctions.sha1IdPipe(cols: _*).as("d"))
        .head().getString(0)
      assert(got == expected, s"sha1IdPipe(${parts.mkString(",")})")
    }
  }

  test("yelp/reddit review ids: normalize, 512-codepoint cap, prefix") {
    val rows = fixture.select(explode($"review_id").as("r")).select("r.*")
    val got = rows.select($"id".as("expected"),
      TextFunctions.reviewId($"source", $"place_id", $"scraped_at",
        coalesce($"text", lit(""))).as("got")).collect()
    assert(got.length == 5)
    got.foreach(r => assert(r.getString(1) == r.getString(0)))
  }

  test("airbnb synthesized ids: 256-codepoint cap, no prefix") {
    val rows = fixture.select(explode($"airbnb_id").as("r")).select("r.*")
    val got = rows.select($"id".as("expected"),
      TextFunctions.airbnbReviewId($"listing_id", $"date", $"reviewer_id",
        $"text").as("got")).collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getString(1) == r.getString(0)))
  }

  test("reviews.py pipe ids: raw text, 120-codepoint cap") {
    val rows = fixture.select(explode($"pipe_id").as("r")).select("r.*")
    val got = rows.select($"id".as("expected"),
      concat($"source", lit(":"), TextFunctions.sha1IdPipe($"place_id",
        $"scraped_at", substring(coalesce($"text", lit("")), 1, 120)))
        .as("got")).collect()
    assert(got.length == 2)
    got.foreach(r => assert(r.getString(1) == r.getString(0)))
  }
}
