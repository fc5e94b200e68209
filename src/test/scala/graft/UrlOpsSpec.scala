package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.UrlOps

/** Table-driven cases for the RFC 3986 §6 canonicalizer — each row pins
 * one normalization (or a deliberate non-normalization). */
class UrlOpsSpec extends AnyFunSuite {
  import TestSpark.spark

  private val cases: Seq[(String, String)] = Seq(
    // case normalization: scheme + host only, never path or query
    ("HTTP://WWW.Example.COM/Path?Q=V", "http://www.example.com/Path?Q=V"),
    // default ports stripped per scheme
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    // non-default (and cross-scheme "default") ports kept
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),
    // empty path → root; root slash itself is kept
    ("http://example.com", "http://example.com/"),
    ("http://example.com/", "http://example.com/"),
    // trailing slash dropped on non-root paths only — ALL of them, so
    // doubled-slash wire forms still collide (and stay idempotent)
    ("http://example.com/a/b/", "http://example.com/a/b"),
    ("http://example.com/a//", "http://example.com/a"),
    ("http://example.com//", "http://example.com/"),
    // query params sorted bytewise; empty query keeps no '?'
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?a=1&b=2", "http://example.com/a?a=1&b=2"),
    // percent-encoding normalization (RFC 3986 §6.2.2.2): unreserved
    // decodes regardless of hex case; the three wire forms collide
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/%7euser", "http://example.com/~user"),
    ("http://example.com/~user", "http://example.com/~user"),
    // ALPHA / DIGIT / '-' '.' '_' all decode
    ("http://example.com/%41%62%30%2D%2E%5F", "http://example.com/Ab0-._"),
    // reserved octets stay ENCODED, hex uppercased ('/' must not
    // materialize — it would change the path structure)
    ("http://example.com/a%2fb?x=%3d", "http://example.com/a%2Fb?x=%3D"),
    // non-ASCII stays encoded, uppercased
    ("http://example.com/%c3%a9", "http://example.com/%C3%A9"),
    // malformed percent runs kept verbatim
    ("http://example.com/100%zz", "http://example.com/100%zz"),
    ("http://example.com/50%", "http://example.com/50%"),
    // everything at once
    ("HTTPS://Example.Com:443/x/?z=1&y=2", "https://example.com/x?y=2&z=1"))

  test("canonicalizeUrl: each normalization fires exactly as specified") {
    import spark.implicits._
    val got = cases.map(_._1).toDF("raw")
      .select(col("raw"), UrlOps.canonicalizeUrl(col("raw")).as("canon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (raw, want) =>
      assert(got(raw) === want, s"raw '$raw'")
    }
  }

  test("hostOf strips scheme, port, path, and case") {
    import spark.implicits._
    val got = Seq("HTTP://WWW.Site.COM:8080/a/b?q=1").toDF("u")
      .select(UrlOps.hostOf(col("u"))).head.getString(0)
    assert(got === "www.site.com")
  }

  test("registeredDomain: longest suffix wins, fallbacks are identity") {
    import spark.implicits._
    val suffixes = Seq(("com", 1), ("co.uk", 2), ("jp", 1), ("ac.jp", 2))
      .toDF("suffix", "n_labels")
    val hosts = Seq(
      (1L, "a.blog.example.com"),   // multi-subdomain → example.com
      (2L, "b.example.com"),        // same registered domain
      (3L, "x.shop.co.uk"),         // multi-label suffix → shop.co.uk
      (4L, "e3.ac.jp"),             // ac.jp must beat jp (longest match)
      (5L, "plain.jp"),             // single-label suffix
      (6L, "ac.jp"),                // host IS a suffix → identity
      (7L, "weird.internal"))       // no suffix matches → identity
      .toDF("doc_id", "host")
    val got = UrlOps.withRegisteredDomain(hosts, "doc_id", "host", suffixes)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("reg_domain"))
      .toMap
    assert(got === Map(1L -> "example.com", 2L -> "example.com",
      3L -> "shop.co.uk", 4L -> "e3.ac.jp", 5L -> "plain.jp",
      6L -> "ac.jp", 7L -> "weird.internal"))
  }

  test("normalizePercent: engine equals a driver replay and is idempotent " +
      "on adversarial percent strings") {
    import spark.implicits._
    // pseudo-random strings over a charset rich in '%', hex digits, and
    // unreserved/reserved decode targets — naked percents, half
    // triplets, doubled percents, triplets at string end all arise
    val charset = "%%af7E25~/.z09AF_-"
    val rng = new Lcg(424242L)
    val strs = (0 until 500).map { _ =>
      (0 until (1 + rng.next(12))).map(_ => charset(rng.next(charset.length)))
        .mkString
    }.distinct
    // independent replay of RFC 3986 §6.2.2.2 over the split-on-%
    // segments (the construction the engine unrolls in columns)
    def replay(s: String): String = {
      val parts = s.split("%", -1)
      parts.head + parts.tail.map { x =>
        val hh = x.take(2).toUpperCase
        if (hh.length == 2 && hh.forall(c => c.isDigit || (c >= 'A' && c <= 'F'))) {
          val code = Integer.parseInt(hh, 16)
          val unreserved = (code >= 48 && code <= 57) ||
            (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
            Set(45, 46, 95, 126)(code)
          if (unreserved) code.toChar.toString + x.drop(2)
          else "%" + hh + x.drop(2)
        } else "%" + x
      }.mkString
    }
    val got = strs.toDF("s")
      .select(col("s"), UrlOps.normalizePercent(col("s")).as("n1"))
      .select(col("s"), col("n1"),
        UrlOps.normalizePercent(col("n1")).as("n2"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    strs.foreach { s =>
      val (n1, n2) = got(s)
      assert(n1 === replay(s), s"replay mismatch on '$s'")
      assert(n2 === n1, s"not idempotent on '$s' → '$n1' → '$n2'")
    }
  }

  test("canonicalization is idempotent over the p127 URL family") {
    import spark.implicits._
    val raws = (0L until 300L).toDF("doc_id")
      .select(expr("""concat(
        CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'HTTP'
             WHEN 1 THEN 'https' ELSE 'http' END, '://',
        CASE WHEN doc_id % 2 = 0
             THEN concat('WWW.Site', CAST(doc_id % 7 AS STRING), '.COM')
             ELSE concat('www.site', CAST(doc_id % 7 AS STRING), '.com') END,
        CASE WHEN doc_id % 5 = 0
             THEN (CASE WHEN doc_id % 3 = 1 THEN ':443' ELSE ':80' END)
             WHEN doc_id % 11 = 0 THEN ':8080' ELSE '' END,
        concat('/page/', CAST(doc_id % 25 AS STRING),
          CASE CAST(doc_id % 25 % 5 AS INT)
            WHEN 0 THEN (CASE WHEN doc_id % 2 = 0
                         THEN '%7Euser' ELSE '%7euser' END)
            WHEN 1 THEN (CASE WHEN doc_id % 2 = 0
                         THEN '~user' ELSE '%7Euser' END)
            WHEN 2 THEN (CASE WHEN doc_id % 2 = 0
                         THEN '%2fdl' ELSE '%2Fdl' END)
            WHEN 3 THEN (CASE WHEN doc_id % 2 = 0
                         THEN '%41' ELSE 'A' END)
            ELSE '%zz' END,
          CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END),
        CASE CAST(doc_id % 6 AS INT) WHEN 0 THEN '?b=2&a=1'
             WHEN 1 THEN '?a=1&b=2' WHEN 2 THEN '?a=1' ELSE '' END)""")
        .as("raw"))
    val twice = raws
      .select(UrlOps.canonicalizeUrl(col("raw")).as("c1"))
      .select(col("c1"), UrlOps.canonicalizeUrl(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2")).count()
    assert(twice === 0L)
  }
}
