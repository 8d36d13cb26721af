package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .as[String].collect().toSeq

  test("scheme/host lowercase, www and default port strip, fragment drop") {
    assert(canon("HTTPS://WWW.Example.COM:443/Path#frag") ===
      Seq("https://example.com/Path"))
    assert(canon("http://www.example.com:80/x") ===
      Seq("http://example.com/x"))
    // non-default port survives; path case survives
    assert(canon("https://example.com:8080/A/B") ===
      Seq("https://example.com:8080/A/B"))
    // :80 is NOT default for https (and vice versa)
    assert(canon("https://example.com:80/x") ===
      Seq("https://example.com:80/x"))
  }

  test("path normalization: duplicate slashes, trailing slash, root") {
    assert(canon("https://e.com//a///b/") === Seq("https://e.com/a/b"))
    assert(canon("https://e.com/") === Seq("https://e.com/"))
    assert(canon("https://e.com") === Seq("https://e.com/"))
    assert(canon("https://e.com#f") === Seq("https://e.com/"))
  }

  test("query: tracking params drop, survivors sort, empty query folds") {
    assert(canon("https://e.com/p?utm_source=x&b=2&a=1") ===
      Seq("https://e.com/p?a=1&b=2"))
    assert(canon("https://e.com/p?fbclid=1&gclid=2&msclkid=3&ref=r") ===
      Seq("https://e.com/p"))
    assert(canon("https://e.com/p?") === Seq("https://e.com/p"))
    // utm_ match is prefix-anchored: a param NAMED 'utm' (no underscore)
    // or one merely containing 'ref' survives
    assert(canon("https://e.com/p?utm=1&pref=2") ===
      Seq("https://e.com/p?pref=2&utm=1"))
  }

  test("variants of one logical URL collapse; distinct URLs stay apart") {
    val variants = Seq(
      "https://www.e.com/a/1?utm_source=f&b=2&a=1#sec",
      "HTTPS://E.COM:443/a//1/?a=1&b=2",
      "https://e.com/a/1?b=2&utm_campaign=9&a=1",
      "https://e.com/a/1/?fbclid=7&a=1&b=2")
    assert(canon(variants: _*).distinct === Seq("https://e.com/a/1?a=1&b=2"))
    // scheme and query identity are preserved distinctions
    assert(canon("http://e.com/a/1?a=1&b=2", "https://e.com/a/1").distinct
      .size === 2)
  }
}
