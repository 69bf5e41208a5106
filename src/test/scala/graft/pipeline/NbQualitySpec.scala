package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** NbQuality: the distributed naive-Bayes train+score pipeline equals a
  * plain-Scala local reference on sf0.001, and the weak-label split is
  * non-degenerate (both classes present) so the priors actually train.
  */
class NbQualitySpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokenize(text: String): Array[String] =
    text.toLowerCase.split("\\W+").filter(_.nonEmpty)

  test("nb classifier: distributed result equals a local reference, both classes trained") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = TextAnalysis.qualityGopher(spark, sf)
      .select("doc_id", "pass").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val trainIds = docs.keys.filter(_ % NbQuality.TrainMod == 0).toSeq
    val trainPass = trainIds.count(labels(_) == 1L)
    val trainFail = trainIds.count(labels(_) == 0L)
    assert(trainPass > 0 && trainFail > 0,
      s"degenerate weak-label split: pass=$trainPass fail=$trainFail")

    // local reference: same vocab rule, same add-1 Q16 log-odds
    val df = scala.collection.mutable.HashMap.empty[String, Int]
    trainIds.foreach(id => tokenize(docs(id)).distinct.foreach(w =>
      df(w) = df.getOrElse(w, 0) + 1))
    val vocab = df.toSeq.sortBy { case (w, d) => (-d, w) }
      .take(NbQuality.VocabSize).map(_._1).toSet
    val cp = scala.collection.mutable.HashMap.empty[String, Long]
    val cf = scala.collection.mutable.HashMap.empty[String, Long]
    trainIds.foreach { id =>
      val tgt = if (labels(id) == 1L) cp else cf
      tokenize(docs(id)).filter(vocab).foreach(w => tgt(w) = tgt.getOrElse(w, 0L) + 1)
    }
    val v = vocab.size.toLong
    val tp = cp.values.sum + v
    val tf = cf.values.sum + v
    val bias = Lm.log2fix(trainPass + 1L) - Lm.log2fix(trainFail + 1L)
    val wt = vocab.map { w =>
      w -> ((Lm.log2fix(cp.getOrElse(w, 0L) + 1) - Lm.log2fix(tp)) -
        (Lm.log2fix(cf.getOrElse(w, 0L) + 1) - Lm.log2fix(tf)))
    }.toMap

    val expected = docs.map { case (id, text) =>
      val hits = tokenize(text).filter(vocab)
      val s = bias + hits.map(wt).sum
      id -> ((hits.length.toLong, s, if (s >= 0) 1L else 0L))
    }

    val got = NbQuality.nbQuality(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == expected.keySet)
    val bad = expected.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(3)}")
    // the vocab rule caps at VocabSize but the sf0.001 soup has fewer
    // distinct tokens — the realized size must be the rule's min, and the
    // model must be discriminative (docs land on each side of the boundary)
    assert(vocab.size == math.min(NbQuality.VocabSize, df.size))
    val preds = got.values.map(_._3).toSet
    assert(preds == Set(0L, 1L), s"degenerate predictions: $preds")
  }
}
