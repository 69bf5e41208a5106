package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Largest-remainder (Hamilton) apportionment — the exact-integer way to
  * split a budget K over weighted rows: base = ⌊K·w/W⌋ leaves
  * L = K − Σbase < n slots, which go to the L largest remainders (total
  * order, ties by the caller's key columns). Guarantees Σalloc ≡ K and
  * each alloc ∈ {⌊quota⌋, ⌊quota⌋+1} — the conservation a scheduler's or
  * sampler's budget arithmetic must have; proportional floats don't sum.
  *
  * Scale shape: one 1-row broadcast total and one GLOBAL rank window —
  * callers apply it to stratum- or host-level tables (dozens to ~10^5
  * rows), never row-scale data; both call sites document that bound.
  */
object Apportion {

  /** Adds `alloc` to `df` (which must carry a Long `weight` column),
    * apportioning `budget` by largest remainder; `tieCols` must totally
    * order equal remainders for partition-independence.
    */
  def largestRemainder(df: DataFrame, budget: Long, tieCols: Seq[String]): DataFrame = {
    val total = df.agg(sum(col("weight")).as("w_total"))
    val q = df.crossJoin(broadcast(total))
      .withColumn("base", expr(s"($budget * weight) div w_total"))
      .withColumn("rem", expr(s"($budget * weight) % w_total"))
    val wAll = Window.partitionBy()
    val rk = Window.partitionBy()
      .orderBy(col("rem").desc +: tieCols.map(col(_).asc): _*)
    q.withColumn("leftover", lit(budget) - sum(col("base")).over(wAll))
      .withColumn("rk", row_number().over(rk))
      .withColumn("alloc",
        col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .drop("w_total", "base", "rem", "leftover", "rk")
  }
}
