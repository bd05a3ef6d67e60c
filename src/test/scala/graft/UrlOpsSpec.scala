package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.UrlOps

/** URL canonicalization / registered-domain / URL-dedup (text.UrlOps):
  * hand-pinned canonical forms, public-suffix domain extraction, and the
  * keep-one-per-canonical-URL rule on a frame where raw strings differ
  * inside every canonical group.
  */
class UrlOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.canonicalize(col("url")))
      .collect().map(_.getString(0)).toSeq

  test("canonicalize: case, default port, www, utm params, fragments, " +
    "trailing slashes — hand-pinned") {
    assert(canon(
      "HTTPS://WWW.Site3.co.uk:443/Articles/7/?utm_source=feed&id=2#x",
      "https://news.site0.com/a/",
      "http://Example.ORG/Path?utm_source=x",
      "https://site1.org/p?id=4&utm_campaign=Spring",
      "https://www.site9.com:443/") == Seq(
      // slash before a query is NOT a trailing slash; path case preserved
      "https://site3.co.uk/Articles/7/?id=2",
      "https://news.site0.com/a",
      "http://example.org/Path",
      "https://site1.org/p?id=4",
      "https://site9.com"))
  }

  test("malformed / scheme-less inputs pass through unchanged — never " +
    "unified under a '://'-prefixed empty scheme") {
    val weird = Seq("site0.com/a", "not a url", "", "//no-scheme/x",
      "ftp:/missing-slash")
    assert(canon(weird: _*) == weird)
    // two distinct malformed strings must stay distinct canonical keys
    val df = Seq((1L, "site0.com/x"), (2L, "other.org/x"))
      .toDF("doc_id", "url")
    val keeps = UrlOps.dedupByUrl(df, "url", "doc_id")
      .where(col("keep")).count()
    assert(keeps == 2, "malformed URLs must not collapse together")
  }

  test("canonicalize is idempotent on its own output") {
    val raw = Seq(
      "HTTPS://WWW.Site3.co.uk:443/Articles/7/?utm_source=feed&id=2#x",
      "https://news.site0.com/a/", "http://Example.ORG/Path?utm_source=x")
    assert(canon(canon(raw: _*): _*) == canon(raw: _*))
  }

  test("registered domain: last two labels, three under a second-level " +
    "public suffix") {
    val doms = Seq("news.site1.co.uk", "site0.com", "a.b.c.org",
      "deep.sub.site2.com.au")
      .toDF("h").select(UrlOps.registeredDomain(col("h")))
      .collect().map(_.getString(0)).toSeq
    assert(doms == Seq("site1.co.uk", "site0.com", "c.org",
      "site2.com.au"))
  }

  test("dedupByUrl keeps exactly the min-id row per canonical URL, and " +
    "unifies raw variants exact string dedup cannot") {
    val rows = Seq(
      (0L, "HTTPS://WWW.Site1.com/a?utm_source=feed&id=1#top"),
      (1L, "https://site1.com/a?id=1"),
      (2L, "https://www.site1.com:443/a?id=1"),
      (3L, "https://site2.org/b/"),
      (4L, "https://site2.org/b"),
      (5L, "https://site2.org/c")).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(rows, "url", "doc_id")
      .select("doc_id", "canon_url", "keep")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      .sortBy(_._1)
    // three raw variants collapse to one canonical; keeper is min id
    assert(out.filter(_._2 == "https://site1.com/a?id=1").map(_._1).toSeq
      == Seq(0L, 1L, 2L))
    assert(out.filter(_._3).map(_._1).toSeq == Seq(0L, 3L, 5L))
    // exact string dedup would have kept all 6
    assert(rows.select("url").distinct().count() == 6)
  }

  test("q_url_dedup derivation: every doc_id % 50 content group has " +
    "EXACTLY ONE canonical URL, and raw presentation varies within " +
    "groups") {
    val df = QueriesText.queries("q_url_dedup")(spark,
      "/root/testdata/sf0.001")
    val byK = df.withColumn("k", col("doc_id") % 50)
      .groupBy("k")
      .agg(countDistinct(col("canon_url")).as("n_canon"),
        countDistinct(col("url")).as("n_raw"),
        count(lit(1)).as("n"))
      .collect()
    assert(byK.forall(_.getLong(1) == 1L), "a content group split")
    assert(byK.count(r => r.getLong(2) > 1) > 25,
      "presentation noise did not vary inside groups")
    // exactly one keeper per canonical group
    val keepers = df.where(col("keep")).count()
    assert(keepers == df.select("canon_url").distinct().count())
  }
}
