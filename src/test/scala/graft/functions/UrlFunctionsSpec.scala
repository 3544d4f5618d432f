package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class UrlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url")
      .select(UrlFunctions.canonicalUrl(col("url"))).as[String].collect().toSeq

  test("canonicalUrl normalizes case, www, ports, paths, params, fragments") {
    assert(canon(
      "HTTPS://WWW.Example.COM:443/A/1/?b=2&a=1&utm_source=x#frag",
      "http://example.com:80/A/1?a=1&b=2",
      "https://example.com:8080/A/1?a=1&b=2", // non-default port kept
      "http://www.Example.com",               // empty path -> /
      "https://example.com/p?",               // bare ? dropped
      "https://example.com/p?fbclid=Z&gclid=Y&ref=r&utm_x=1", // all tracking
      "https://example.com/p?b=2&&a=1",       // empty part dropped
      "http://sub.www-like.org/x//"           // only TRAILING slashes strip
    ) == Seq(
      "https://example.com/A/1?a=1&b=2",
      "http://example.com/A/1?a=1&b=2",
      "https://example.com:8080/A/1?a=1&b=2",
      "http://example.com/",
      "https://example.com/p",
      "https://example.com/p",
      "https://example.com/p?a=1&b=2",
      "http://sub.www-like.org/x"))
  }

  test("host and domain extraction") {
    val r = Seq("HTTPS://WWW.News3.Example.COM:8443/x", "http://localhost/x")
      .toDF("url")
      .select(UrlFunctions.urlHost(col("url")),
        UrlFunctions.urlDomain(col("url"))).as[(String, String)].collect()
    assert(r(0) == (("news3.example.com", "example.com")))
    assert(r(1) == (("localhost", "localhost")))
  }

  test("canonicalUrl is idempotent on its own output") {
    val messy = Seq(
      "HTTPS://WWW.Example.COM:443/A/1/?b=2&a=1&utm_source=x#frag",
      "http://example.com:80/A/1?a=1&b=2",
      "https://example.com:8080//x//?z=1&y=2#s")
    val once = canon(messy: _*)
    assert(canon(once: _*) == once)
  }
}
