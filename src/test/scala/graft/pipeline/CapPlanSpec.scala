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

  test("gopher quality plans as one narrow native scan (no shuffle, no UDF)") {
    // (not asserted: WholeStageCodegen — Spark evaluates higher-order array
    // functions like filter(…, lambda) as interpreted expressions outside
    // codegen; the scan is still a single narrow stage)
    val qe = TextAnalysis.qualityGopher(spark, sf).queryExecution
    val plan = qe.executedPlan.toString()
    assert(!plan.contains("Exchange"),
      s"per-row quality gates must not shuffle:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !qe.analyzed.toString.contains("ScalaUDF"),
      s"gates must stay native column expressions:\n$plan")
  }

  test("dup clustering never plans a nested-loop or cartesian join") {
    // 6 hash-min iterations over id-keyed tables: every join must stay an
    // equi-join (broadcast or shuffled hash/SMJ) — a cartesian here would be
    // quadratic at 10^10 docs
    val plan = Dedup.dupClusters(spark, sf).queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), s"cartesian in cluster plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in cluster plan:\n$plan")
  }

  test("contamination plans the bench side as a broadcast semi-join") {
    val plan = Dedup.contamination(spark, sf).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"bench gram set must broadcast (it is ~10^5 grams in production):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in contamination plan:\n$plan")
  }

  test("train manifest composes with id-keyed joins only (text never shuffles)") {
    val plan = Dedup.trainManifest(spark, sf).queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in manifest plan:\n$plan")
  }

  test("nb scoring joins the broadcast model BEFORE the per-doc aggregation") {
    // the V-row weight table must broadcast into the token stream so only
    // vocabulary hits reach the sum — at 100 TB a shuffle join here would
    // move the whole token stream by word
    val plan = NbQuality.nbQuality(spark, sf).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"non-equi join in nb plan:\n$plan")
  }

  test("len deciles never plan a global sort (histogram rank math only)") {
    // the whole point of the histogram+cumsum shape: no rangepartitioning
    // exchange (global sort) of the row set anywhere
    val plan = TextAnalysis.lenDeciles(spark, sf).queryExecution.executedPlan.toString()
    assert(!plan.contains("rangepartitioning"),
      s"global sort in deciles plan:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"cartesian in deciles plan (the 9-row decile table must broadcast):\n$plan")
  }

  test("boilerplate clean broadcasts the flagged-line table") {
    val plan = Dedup.boilerplateClean(spark, sf).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"boilerplate table (source-count-bounded) must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian in clean plan:\n$plan")
  }
}
