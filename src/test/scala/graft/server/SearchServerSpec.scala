package graft.server

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drives the HTTP surface end-to-end against the sf0.001 corpus: /search
  * agrees with the engine, /stats reports the build counters, /document
  * round-trips and 404s.
  */
class SearchServerSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def http(method: String, url: String, body: Option[String] = None): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(StandardCharsets.UTF_8))
    }
    val code = conn.getResponseCode
    val is = if (code < 400) conn.getInputStream else conn.getErrorStream
    val out = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    (code, out)
  }

  test("HTTP surface: /search, /stats, /document") {
    val srv = new SearchServer(spark, "/root/testdata/sf0.001", 0)
    srv.start()
    val base = s"http://localhost:${srv.boundPort}"
    try {
      val (c1, hits) = http("POST", s"$base/search",
        Some("""{"query": "table scan merge", "limit": 5}"""))
      assert(c1 == 200)
      val ids = """"id":(\d+)""".r.findAllMatchIn(hits).map(_.group(1).toLong).toSeq
      assert(ids.size == 5)
      // must agree with the engine directly
      val direct = new graft.index.PostingIndex(spark,
        graft.index.IndexCache.dirFor(spark, "/root/testdata/sf0.001", stem = true))
        .search("table scan merge", 5).collect().map(_.getLong(0)).toSeq
      assert(ids == direct)

      val (c2, stats) = http("GET", s"$base/stats")
      assert(c2 == 200 && stats.contains("\"document_count\":500"))

      val (c3, doc) = http("GET", s"$base/document/42")
      assert(c3 == 200 && doc.contains("\"id\":42"))
      val (c4, _) = http("GET", s"$base/document/999999")
      assert(c4 == 404)
      val (c5, _) = http("GET", s"$base/document/notanid")
      assert(c5 == 400)

      // result rows carry the reference UI contract fields (App.tsx:6-11)
      assert(hits.contains("\"title\":") && hits.contains("\"url\":\"graft://"))

      // JSON escapes in the query string must decode before analysis:
      // "table scan\tmerge" == "table scan\tmerge" -> same results
      val (cEsc, escHits) = http("POST", s"$base/search",
        Some("{\"query\": \"table\\u0020scan\\tmerge\", \"limit\": 5}"))
      assert(cEsc == 200)
      val escIds = """"id":(\d+)""".r.findAllMatchIn(escHits).map(_.group(1).toLong).toSeq
      assert(escIds == direct)

      // degenerate query: all stop words -> empty array, not an error
      val (c6, empty) = http("POST", s"$base/search", Some("""{"query": "the a of"}"""))
      assert(c6 == 200 && empty == "[]")

      // conjunctive mode
      val (c7, _) = http("POST", s"$base/search",
        Some("""{"query": "table scan", "conjunctive": true, "limit": 3}"""))
      assert(c7 == 200)

      // boolean mode: must/must_not clauses with `query` as should —
      // must agree with the engine's boolean search directly
      val idxH = graft.index.PostingIndex.forDir(spark,
        graft.index.IndexCache.dirFor(spark, "/root/testdata/sf0.001", stem = true))
      val (c8, boolHits) = http("POST", s"$base/search",
        Some("""{"query": "merge scan", "must": "table", "must_not": "stream", "limit": 5}"""))
      assert(c8 == 200)
      val boolIds = """"id":(\d+)""".r.findAllMatchIn(boolHits).map(_.group(1).toLong).toSeq
      val boolDirect = idxH.searchBooleanRounded("table", "merge scan", "stream", 5)
        .collect().map(_.getLong(0)).toSeq
      assert(boolIds == boolDirect)

      // search_after pagination: page 2 via page 1's last row as cursor
      val page1 = idxH.searchRounded("table scan merge", 5).collect()
      val last = page1.last
      val (c9, p2Hits) = http("POST", s"$base/search",
        Some(s"""{"query": "table scan merge", "limit": 5, """ +
          s""""after_score": ${last.getDouble(1)}, "after_doc": ${last.getLong(0)}}"""))
      assert(c9 == 200)
      val p2Ids = """"id":(\d+)""".r.findAllMatchIn(p2Hits).map(_.group(1).toLong).toSeq
      val p2Direct = idxH.searchAfterRounded("table scan merge", 5,
        last.getDouble(1), last.getLong(0)).collect().map(_.getLong(0)).toSeq
      assert(p2Ids == p2Direct && p2Ids.nonEmpty)
      assert(p2Ids.toSet.intersect(page1.map(_.getLong(0)).toSet).isEmpty)
    } finally srv.stop()
  }
}
