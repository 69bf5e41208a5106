package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump formatted physical plans for selected queries — the review loop for
  * pushdown / column pruning / join strategy (builder prompt: iterate until
  * it's the plan you'd want, not the first one that passed).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_join_agg", "q_anti_join", "q_topk", "mm_blob_meta",
        "dd_token_count", "crawl_link_extract", "ann_topk")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
