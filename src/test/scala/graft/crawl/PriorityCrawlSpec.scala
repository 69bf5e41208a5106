package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.HostGraph

class PriorityCrawlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("priority schedule: distinct pops, bounded rounds, round 1 is the roots by host rank") {
    val rows = PriorityCrawl.schedule(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("rank"), r.getAs[String]("url")))
    assert(rows.nonEmpty)
    // a url is fetched at most once, ever
    assert(rows.map(_._3).distinct.length == rows.length)
    // per round: ranks dense from 1, size bounded by the pop budget
    rows.groupBy(_._1).foreach { case (round, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1L to rs.length).toSeq, s"round $round ranks")
      assert(rs.length <= PriorityCrawl.PopPerRound)
    }
    // round 1 pops exactly the seed roots, ordered by (host pagerank desc, url)
    val pr = HostGraph.hostPageRank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val round1 = rows.filter(_._1 == 1L).sortBy(_._2).map(_._3)
    assert(round1.forall(_.matches("^https?://[^/]+/$")))
    val expected = round1.sortBy { u =>
      val host = u.replaceFirst("^https?://", "").takeWhile(_ != '/')
      (-pr.getOrElse(host, 0L), u)
    }
    assert(round1.toSeq == expected.toSeq)
    // later rounds exist and fill their budget at this corpus size
    assert(rows.map(_._1).max >= 2L)
  }
}
