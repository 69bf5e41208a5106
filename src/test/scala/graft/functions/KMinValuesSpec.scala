package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{Encoders, functions => F}
import graft.SparkTestBase

/** The KMV sketch must equal `distinct.sorted.take(k)` under ANY insert
  * order, partitioning, and partial-merge tree — that invariance is what
  * makes `graph_host_distinct_kmv` oracle-checkable.
  */
class KMinValuesSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark

  private def reference(xs: Seq[Long], k: Int): Seq[Long] =
    xs.distinct.sorted.take(k)

  test("insert/merge fuzz: sketch == distinct.sorted.take(k) on random multisets") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val k = 2 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      val xs = Seq.fill(n)(rnd.nextInt(30).toLong)
      // sequential inserts
      val seq = xs.foldLeft(Array.emptyLongArray)((b, v) => KMinValues.insert(b, v, k))
      assert(seq.toSeq == reference(xs, k), s"trial $trial inserts")
      // random split + merge (the partial-aggregate path)
      val (l, r) = xs.splitAt(rnd.nextInt(n + 1))
      val bl = l.foldLeft(Array.emptyLongArray)((b, v) => KMinValues.insert(b, v, k))
      val br = r.foldLeft(Array.emptyLongArray)((b, v) => KMinValues.insert(b, v, k))
      assert(KMinValues.mergeSorted(bl, br, k).toSeq == reference(xs, k),
        s"trial $trial merge")
    }
  }

  test("insert avoids allocation on duplicates and beyond-capacity values") {
    val b = Array(1L, 3L, 5L)
    assert(KMinValues.insert(b, 3L, 3) eq b)
    assert(KMinValues.insert(b, 9L, 3) eq b)
    assert(KMinValues.insert(b, 0L, 3).toSeq == Seq(0L, 1L, 3L))
  }

  test("udaf: result is invariant to partitioning; estimator lands near exact") {
    val spark2 = spark
    import spark2.implicits._
    val k = 64
    val kmin = F.udaf(new KMinValues(k), Encoders.scalaLong)
    // 2000 distinct 56-bit hashes via the engine's md5-prefix recipe
    val base = (0 until 2000).map(i => s"http://big.test/p$i").toDF("url")
      .select(F.expr("CAST(conv(substring(md5(url), 1, 14), 16, 10) AS BIGINT)").as("hv"))
    val sketches = Seq(1, 7, 32).map { p =>
      base.repartition(p).agg(kmin(F.col("hv"))).head.getSeq[Long](0).toSeq
    }
    assert(sketches.distinct.length == 1, "sketch depends on partitioning")
    val mins = sketches.head
    assert(mins.length == k)
    val est = (k - 1).toLong * (1L << 56) / mins(k - 1)
    // stderr ~ 1/sqrt(k-2) ~ 12.7%; assert within 4 sigma of 2000
    assert(math.abs(est - 2000L) < 2000L / 2,
      s"KMV estimate $est implausibly far from 2000")
  }
}
