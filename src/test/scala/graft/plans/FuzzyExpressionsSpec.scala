package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.TextFunctions

class FuzzyExpressionsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val pairs = Seq(
    ("Cafe Central", "cafe central wien"),
    ("Hotel Sacher", "Sacher Hotel"),
    ("Plachutta", "Figlmüller"),
    (null, "x"),
    ("", "")
  ).toDF("a", "b")

  test("codegen'd expressions agree with the kernel and the UDF") {
    val out = pairs.select(
      FuzzyExpressions.tokenSetRatio(col("a"), col("b")).as("set_e"),
      FuzzyExpressions.tokenSortRatio(col("a"), col("b")).as("sort_e"),
      FuzzyExpressions.nameSimilarity(col("a"), col("b")).as("name_e"),
      TextFunctions.tokenSetRatioUdf(col("a"), col("b")).as("set_u"),
      TextFunctions.tokenSortRatioUdf(col("a"), col("b")).as("sort_u"),
      TextFunctions.nameSimilarityUdf(col("a"), col("b")).as("name_u"))
      .collect()
    out.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1) && r.isNullAt(2)) // null input
      else {
        assert(r.getDouble(0) == r.getDouble(3))
        assert(r.getDouble(1) == r.getDouble(4))
        assert(r.getDouble(2) == r.getDouble(5))
      }
    }
    // direct kernel spot check through the expression path
    val direct = Seq(("mets vs braves", "braves vs mets")).toDF("a", "b")
      .select(FuzzyExpressions.tokenSetRatio(col("a"), col("b"))).as[Double].head
    assert(direct == 1.0)
  }

  test("LevRatio expression equals the built-in levenshtein column form") {
    val df = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
      .select(col("p_name").as("a"),
        concat(col("p_type"), lit(" "), col("p_name")).as("b"))
    val out = df.select(
      FuzzyExpressions.levRatio(col("a"), col("b")).as("fast"),
      (lit(1.0) - levenshtein(col("a"), col("b")).cast("double") /
        greatest(length(col("a")), length(col("b"))).cast("double"))
        .as("builtin"))
      .where(col("fast") =!= col("builtin"))
    assert(out.count() == 0)
  }

  test("extensions expose the expressions as SQL functions") {
    GraftExtensions.install(spark)
    val r = spark.sql(
      """SELECT round(token_set_ratio('mets vs braves', 'braves vs mets'), 4) AS a,
        |  round(token_sort_ratio('york new', 'new york'), 4) AS b,
        |  round(name_similarity('Café Central', 'cafe central'), 4) AS c""".stripMargin)
      .head
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0)
    val cos = spark.sql(
      "SELECT cosine_sim(array(3.0F, 4.0F), array(4.0F, 3.0F)) AS c")
      .head.getDouble(0)
    assert(math.abs(cos - 24.0 / 25.0) < 1e-12, cos.toString)
    // a fresh session built WITH the extensions class also resolves them
    val ext = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").withExtensions(new GraftExtensions).getOrCreate()
    assert(ext.sql("SELECT token_set_ratio('a b', 'b a') AS s").head.getDouble(0) == 1.0)
  }

  test("the expression stays inside whole-stage codegen") {
    // local relations constant-fold; a parquet scan exercises real codegen
    val df = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .limit(50)
      .select(FuzzyExpressions.nameSimilarity(col("c_name"),
        concat(col("c_name"), lit(" X"))).as("s"))
      .where(col("s") >= 0.0)
    assert(df.count() == 50)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(1500)) // codegen stage marker
  }
}
