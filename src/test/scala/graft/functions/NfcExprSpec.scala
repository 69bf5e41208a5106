package graft.functions

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class NfcExprSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  // decomposed (combining marks), precomposed, mixed, ASCII, empty, null
  private val samples = Seq(
    "café", "café", "naïve mix café café",
    "plain ascii", "", "́leading mark", null)

  test("expression output equals java.text.Normalizer NFC on every sample") {
    val spark2 = spark
    import spark2.implicits._
    val got = samples.toDF("text")
      .select(NfcExpr.nfcCol(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    val want = samples.map(s => if (s == null) null else
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    // composition really happens: decomposed and precomposed converge
    assert(NfcExpr.nfc("café") == "café")
    assert(NfcExpr.nfc("café") == "café")
    // the fast path returns the SAME reference for normalized input
    val ascii = "already normalized"
    assert(NfcExpr.nfc(ascii) eq ascii)
  }

  test("the plan is a codegen'd projection: no ScalaUDF, inside WholeStageCodegen") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), NfcExpr.nfcCol(col("text")).as("n"))
    val plan = df.queryExecution.executedPlan
    assert(!plan.toString.contains("UDF"), plan.toString)
    val inCodegen = plan.collect { case w: WholeStageCodegenExec => w }
      .exists(_.toString.contains("nfc"))
    assert(inCodegen, s"nfc not inside a WholeStageCodegen span:\n$plan")
  }

  test("registered in the session function registry: SQL text resolves it") {
    val r = spark.sql("SELECT nfc('café') AS n").collect()(0).getString(0)
    assert(r == "café")
  }

  test("textNfc: only the decomposed class changes, and it shrinks") {
    val rows = graft.pipeline.TextAnalysis.textNfc(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, changed, raw, nfc) =>
      if (id % 4 == 2) {
        assert(changed == 1L && nfc == raw - 2, s"doc $id") // two marks compose away
      } else {
        assert(changed == 0L && nfc == raw, s"doc $id")
      }
    }
  }
}
