package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.pipeline.Dedup

class SimhashExprSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private val samples = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "", "   ", "ümläut tökens über alles",
    "a", "punct!!! lots??? of... punct",
    (1 to 200).map(i => s"w$i").mkString(" "),
    null)

  test("expression output equals the Scala kernel on every sample (null = empty = 0)") {
    val spark2 = spark
    import spark2.implicits._
    val got = samples.toDF("text")
      .select(SimhashExpr.simhash(col("text")).as("h"))
      .collect().map(_.getLong(0))
    val want = samples.map(s => Dedup.simhash64(if (s == null) "" else s))
    assert(got.toSeq == want)
    assert(Dedup.simhash64(null) == 0L && Dedup.simhash64("") == 0L)
  }

  test("the plan is a codegen'd projection: no ScalaUDF, inside WholeStageCodegen") {
    // over a real scan — a local relation constant-folds the expression away
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), SimhashExpr.simhash(col("text")).as("h"))
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("UDF"), plan.toString)
    val inCodegen = plan.collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.contains("simhash64"))
    assert(inCodegen, s"simhash64 not inside a WholeStageCodegen span:\n$plan")
  }

  test("registered in the session function registry: SQL text resolves it") {
    val r = spark.sql("SELECT simhash64('the quick brown fox') AS h")
      .collect()(0).getLong(0)
    assert(r == Dedup.simhash64("the quick brown fox"))
  }
}
