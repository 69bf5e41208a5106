package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke-run of the driver contract surfaces: SparkEntry.entry (flagship,
  * sf0.001, rows>0) exactly as the driver invokes it.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    println(s"entry rows: $n schema: ${df.schema.fieldNames.mkString(",")}")
    assert(n > 0, "driver smoke requires rows > 0")
    spark.stop()
  }
}
