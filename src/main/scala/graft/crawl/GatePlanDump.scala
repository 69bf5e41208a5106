package graft.crawl

import org.apache.spark.sql.SparkSession



/** Dump the physical plans of the host-keyed gate TABLE joins (trap
  * blocklist / RFC 9309 rules) in both regimes — small table (broadcast
  * hint attached) and above-threshold (hint dropped → shuffled join) —
  * the plan evidence for the round-6 gates refactor.
  */
object GatePlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val links = Seq(
      ("http://host0.test/articles/page-1", "host0.test", 0L, 0),
      ("http://host0.test/misc/page-33", "host0.test", 0L, 1))
      .toDF("url", "host", "parent_seq", "pos")
    val trapDf = Seq(("host0.test", "/misc/page-N")).toDF("host", "template")
    val rulesByHost = Seq(("host0.test", Seq((0L, "disallow", "/misc"))))
      .toDF("host", "rules")

    println("========== trap_gate_small (hinted) ==========")
    WaveCrawler.trapAntiJoin(links, trapDf, trapRows = 1L).explain("formatted")
    println("========== robots9309_gate_small (hinted) ==========")
    WaveCrawler.robots9309GateJoin(links, rulesByHost, rulesRows = 1L).explain("formatted")

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println("========== trap_gate_large (hint dropped) ==========")
    WaveCrawler.trapAntiJoin(links, trapDf,
      trapRows = WaveCrawler.RobotsBroadcastMaxRows + 1).explain("formatted")
    println("========== robots9309_gate_large (hint dropped) ==========")
    WaveCrawler.robots9309GateJoin(links, rulesByHost,
      rulesRows = WaveCrawler.RobotsBroadcastMaxRows + 1).explain("formatted")
    spark.stop()
  }
}
