package graft

import graft.functions.WebOps
import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Web-corpus hygiene invariants: URL decomposition edge cases, the
  * registrable-domain blocklist equi-join (subdomain evasion), and the
  * fixed-order PII redaction pass.
  */
class WebOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(url: String): (String, String, String) = {
    val r = Seq(url).toDF("url")
      .select(WebOps.urlHost(col("url")).as("h"), WebOps.urlPath(col("url")).as("p"))
      .withColumn("d", WebOps.registrableDomain(col("h")))
      .head()
    (r.getAs[String]("h"), r.getAs[String]("p"), r.getAs[String]("d"))
  }

  test("urlHost/urlPath parse scheme, userinfo, port, and path") {
    assert(one("https://www.Example.COM/a/b?q=1#f") == ("www.example.com", "/a/b", "example.com"))
    assert(one("http://user:pw@ads.evil.org:8080/x") == ("ads.evil.org", "/x", "evil.org"))
    assert(one("ftp://files.example.net") == ("files.example.net", "/", "example.net"))
    assert(one("https://localhost:9000/health") == ("localhost", "/health", "localhost"))
  }

  test("non-absolute strings yield NULL host (fail-closed input to the filter)") {
    val r = Seq("not a url", "/relative/path", "www.nodot.example/x")
      .toDF("url").select(WebOps.urlHost(col("url")).as("h"))
    assert(r.collect().forall(_.isNullAt(0)))
  }

  test("domainBlocklistFilter drops blocked registrable domains including subdomains") {
    val docs = Seq(
      (1L, "https://good.example.com/a"),
      (2L, "https://evil.org/b"),
      (3L, "https://ads.tracker.evil.org/c"), // subdomain of blocked
      (4L, "https://evil.org.safe.net/d"), // NOT evil.org (registrable = safe.net)
      (5L, "garbage") // unparseable → dropped (fail closed)
    ).toDF("doc_id", "url")
    val blocked = Seq("evil.org").toDF("domain")
    val kept = Curation.domainBlocklistFilter(docs, "url", blocked)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
  }

  test("redactPii masks email → ip → phone and counts from the original text") {
    val df = Seq(
      (1L, "mail a.b+c@sub.example.co or call 555-123-4567 from 10.0.0.42"),
      (2L, "no pii here at all"),
      (3L, "dotted phone 555.123.4567 and 192.168.0.1 twice 192.168.0.1")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(df).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "mail [EMAIL] or call [PHONE] from [IP]")
    assert((out(0).getLong(2), out(0).getLong(3), out(0).getLong(4)) == (1L, 1L, 1L))
    assert(out(1).getAs[String]("text") == "no pii here at all")
    assert((out(1).getLong(2), out(1).getLong(3), out(1).getLong(4)) == (0L, 0L, 0L))
    // dotted phone is NOT an IPv4 (needs 3 dots); repeated IP masks globally
    assert(out(2).getAs[String]("text") == "dotted phone [PHONE] and [IP] twice [IP]")
    assert((out(2).getLong(2), out(2).getLong(3), out(2).getLong(4)) == (0L, 1L, 2L))
  }

  test("redaction leaves NULL text NULL and counts NULL (not 0)") {
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = Curation.redactPii(df).head()
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
  }
}
