package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** The three LSH bucket-cap sites (minhash bands, simhash blocks, embedding
  * LSH buckets) bound degenerate buckets with a `row_number <= K` rank
  * window BEFORE the groupBy. Spark 4 compiles that shape to a
  * WindowGroupLimit — a per-partition streaming top-K that never sorts or
  * materializes a whole bucket — which is exactly the property that makes
  * the cap safe at a 10^7-row boilerplate bucket. Pin it in the physical
  * plan so a refactor that silently loses the WindowGroupLimit (e.g.
  * collect_list-then-slice) fails here.
  */
class CapPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def assertWindowGroupLimit(df: org.apache.spark.sql.DataFrame, label: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"$label: bucket cap not compiled to WindowGroupLimit:\n$plan")
  }

  test("minhash LSH bucket cap plans as WindowGroupLimit") {
    assertWindowGroupLimit(Dedup.minhashPairs(spark, sf), "minhashPairs")
  }

  test("simhash block cap plans as WindowGroupLimit") {
    assertWindowGroupLimit(Dedup.simhashPairs(spark, sf), "simhashPairs")
  }

  test("embedding LSH bucket cap plans as WindowGroupLimit") {
    assertWindowGroupLimit(Similarity.embeddingDupPairs(spark, sf), "embeddingDupPairs")
  }
}
