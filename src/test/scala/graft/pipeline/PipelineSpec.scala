package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

/** Training-data pipeline operators over the sf0.001 tables: exact/near
  * dedup, similarity search, text analysis, multimodal plumbing.
  */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------ primitives

  test("shingle sets: jaccard 1.0 on identical text, high on near-dup, low on unrelated") {
    val a = Dedup.shingleSet("the quick brown fox jumps over the lazy dog again and again today")
    val a2 = Dedup.shingleSet("the quick brown fox jumps over the lazy dog again and again today")
    val b = Dedup.shingleSet("the quick brown fox jumps over the lazy cat again and again today")
    val c = Dedup.shingleSet("completely different words that share nothing at all with the others")
    assert(Dedup.jaccard(a, a2) == 1.0)
    assert(Dedup.jaccard(a, b) > 0.5 && Dedup.jaccard(a, b) < 1.0)
    assert(Dedup.jaccard(a, c) < 0.2)
  }

  test("minhash signature approximates jaccard") {
    val a = Dedup.shingleSet((1 to 60).map(i => s"word$i").mkString(" "))
    val b = Dedup.shingleSet(((1 to 55).map(i => s"word$i") ++ Seq("x", "y", "z", "w", "v")).mkString(" "))
    val sa = Dedup.minhashSig(a)
    val sb = Dedup.minhashSig(b)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / Dedup.NumHashes
    val real = Dedup.jaccard(a, b)
    assert(math.abs(est - real) < 0.25, s"est=$est real=$real")
  }

  test("simhash: identical text → distance 0; near text → small distance") {
    val h1 = Dedup.simhash64("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val h2 = Dedup.simhash64("alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val h3 = Dedup.simhash64("alpha beta gamma delta epsilon zeta eta theta iota lambda")
    val far = Dedup.simhash64("one two three four five six seven eight nine ten")
    assert(java.lang.Long.bitCount(h1 ^ h2) == 0)
    assert(java.lang.Long.bitCount(h1 ^ h3) < java.lang.Long.bitCount(h1 ^ far))
  }

  test("cosine: orthogonal → 0, identical direction → 1") {
    assert(Similarity.cosine(Array(1f, 0f), Array(0f, 1f)) == 0.0)
    assert(math.abs(Similarity.cosine(Array(1f, 2f), Array(2f, 4f)) - 1.0) < 1e-12)
  }

  test("language id heuristic") {
    assert(TextAnalysis.langIdOf("the cat is on the mat and it is happy") == "en")
    assert(TextAnalysis.langIdOf("der Hund ist nicht auf der Matte und das ist gut") == "de")
    assert(TextAnalysis.langIdOf("これは日本語のテキストです。猫がマットの上にいます。") == "ja")
  }

  test("winnowing fingerprint is deterministic, banded, and dedups runs") {
    val t = "some reasonably long text for fingerprinting purposes here"
    val f1 = TextAnalysis.fingerprintRowsOf(t)
    val f2 = TextAnalysis.fingerprintRowsOf(t)
    assert(f1 == f2 && f1.nonEmpty)
    assert(f1.map(_._1) == f1.map(_._1).sorted) // bands ascending
    f1.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a != b) // consecutive mins collapsed
      case _                   =>
    }
    assert(TextAnalysis.fingerprintRowsOf("tiny").isEmpty)
  }

  test("decodeOne sniffs magic bytes and never throws on garbage") {
    val junk = Multimodal.decodeOne(1L, Array[Byte](0x7f, 1, 2, 3, 4, 5))
    assert(junk.kind == "unknown" && junk.n_bytes == 6)
    val nul = Multimodal.decodeOne(2L, null)
    assert(nul.kind == "unknown" && nul.n_bytes == 0)
    // BM magic but truncated headers → graceful unknown, not an exception
    val truncated = Multimodal.decodeOne(3L, "BMxxxx".getBytes)
    assert(truncated.kind == "unknown")
    val riffJunk = Multimodal.decodeOne(4L, "RIFFxxxxJUNK".getBytes)
    assert(riffJunk.kind == "unknown")
  }

  // ------------------------------------------------------- Spark operators

  test("exact dedup finds exactly the injected duplicate groups") {
    val groups = Dedup.exactGroups(spark, sf)
    val dups = groups.filter("cnt > 1").collect()
    val nInjected = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id % 10 = 0").count()
    assert(dups.length == nInjected)
    assert(dups.forall(_.getLong(1) == 2))
  }

  test("minhash LSH recovers injected exact+near duplicates") {
    import spark.implicits._
    val pairs = Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val exactIds = docs.filter("doc_id % 10 = 0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // every injected exact duplicate must be found (jaccard 1 ≥ 0.8)
    exactIds.foreach { id =>
      assert(pairs.contains((id, id + 2000000L)), s"missing exact pair for doc $id")
    }
    // every reported pair must truly have jaccard ≥ 0.8 (the documents table
    // itself contains template near-dups, so cross-document pairs are real)
    val byId = Dedup.docsWithDups(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    pairs.foreach { case (a, b) =>
      val j = Dedup.jaccard(Dedup.shingleSet(byId(a)), Dedup.shingleSet(byId(b)))
      assert(j >= 0.8, s"pair ($a,$b) has true jaccard $j < 0.8")
    }
  }

  test("simhash blocking finds the injected exact duplicates") {
    val pairs = Dedup.simhashPairs(spark, sf).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    val exactIds = spark.read.parquet(s"$sf/documents.parquet")
      .filter("doc_id % 10 = 0").select("doc_id").collect().map(_.getLong(0)).toSet
    exactIds.foreach { id =>
      assert(pairs.contains((id, id + 2000000L)), s"missing simhash pair for doc $id")
    }
  }

  test("brute-force topk matches a local exhaustive oracle") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val queries = vecs.sortBy(_._1).take(20)
    val expected = queries.flatMap { case (qid, qv) =>
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (id, Similarity.cosine(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(10).zipWithIndex
        .map { case ((id, _), i) => (qid, (i + 1).toLong, id) }
    }.toSet
    val got = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("lsh topk: sane shape and nonzero recall on uniform-random vectors") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = Similarity.lshTopK(spark, sf).collect()
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSet == (1L to rs.length).toSet) // dense ranks
      assert(rs.length <= 10)
    }
    val recall = (exact intersect approx).size.toDouble / exact.size
    // uniform-random embeddings have no cluster structure — LSH recall is
    // inherently weak here; the dup-pairs test below pins the high-cosine case
    assert(recall > 0.02, s"recall=$recall")
  }

  test("pq topk: dense ranks, monotone integer distances, recall above random") {
    val rows = Similarity.pqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"query $qid ranks")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 < b._4 || (a._4 == b._4 && a._3 < b._3), s"query $qid order")
        case _ =>
      }
      assert(sorted.forall(_._4 >= 0L))
      assert(!sorted.exists(_._3 == qid), s"query $qid contains itself")
    }
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = rows.map(r => (r._1, r._3)).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 64 dims → 4 codes of 4 bits is aggressive compression over
    // uniform-random vectors; anything clearly above chance passes (the
    // planted-control pattern pins the high-cosine case elsewhere)
    assert(recall > 0.05, s"recall=$recall")
  }

  test("ivf topk: dense ranks, bounded size, recall above random") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = Similarity.ivfTopK(spark, sf).collect()
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSet == (1L to rs.length).toSet)
      assert(rs.length <= 10)
    }
    // probing 4/16 lists scans ~25% of the corpus; on clusterless random
    // vectors recall ≈ the scan fraction — assert we beat random-10
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.1, s"recall=$recall")
  }

  test("ivf kmeans topk: dense ranks, recall above random, partitioning-independent") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rows = Similarity.ivfKmeansTopK(spark, sf).collect()
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).toSet == (1L to rs.length).toSet)
      assert(rs.length <= 10)
    }
    val approx = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.1, s"recall=$recall")
    // the refinement must be bit-reproducible across runs (integer-sum
    // centroids): a second run over the same session yields the exact rows —
    // this is the property the DuckDB oracle replay depends on
    val again = Similarity.ivfKmeansTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("kmeans quantization: floor semantics and exact integer sums") {
    // floor, not round: round-half-away vs round-half-even would diverge
    // between engines on exact .5 boundaries (float × 2^20 is exact in
    // double, so boundaries DO occur)
    assert(Similarity.quantize(Array(1.5f / 1048576f)).head == 1L)
    assert(Similarity.quantize(Array(-1.5f / 1048576f)).head == -2L)
    assert(Similarity.quantize(Array(0.0f)).head == 0L)
    // cosineQ is scale-aware: mean centroid vs raw quantized vector
    val m = Array(2.0, 4.0, 6.0)
    val q = Array(1L, 2L, 3L)
    assert(math.abs(Similarity.cosineQ(m, q) - 1.0) < 1e-12)
  }

  test("repeated ngrams: exact dups share every window; coverage is bounded") {
    import spark.implicits._
    val rep = Dedup.repeatedNgrams(spark, sf).collect()
    assert(rep.nonEmpty)
    rep.foreach { r => assert(r.getLong(1) >= 2) } // n_docs >= 2 by contract
    // an exact dup (id+2M) repeats EVERY window of its base doc → coverage
    // for those docs must be 100%
    val cov = Dedup.spanCoverage(spark, sf)
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val exactDupIds = cov.keys.filter(_ >= 2000000L)
    assert(exactDupIds.nonEmpty)
    exactDupIds.foreach { id =>
      val (w, r) = cov(id)
      assert(w == r, s"exact dup $id should be fully covered: $r of $w")
      val (bw, br) = cov(id - 2000000L)
      assert(bw == br, s"its base ${id - 2000000L} too: $br of $bw")
    }
    // coverage is well-formed everywhere
    cov.values.foreach { case (w, r) => assert(r <= w && w > 0) }
  }

  test("host pagerank: deterministic, mass-ordered by in-link weight") {
    import spark.implicits._
    val pr = HostGraph.hostPageRank(spark, sf).as[(String, Long)].collect().toMap
    assert(pr.nonEmpty)
    // every host keeps at least the damping floor
    pr.values.foreach(v => assert(v >= 15L * HostGraph.PrScale / 100))
    // other.example is a pure sink fed by one cross-host noise link per page
    // — it must rank strictly below the hosts that also receive tree mass
    val hostRanks = pr.filter(_._1.startsWith("host"))
    assert(hostRanks.values.max > pr("other.example"))
    // bit-reproducible (integer arithmetic): a second run is identical
    val again = HostGraph.hostPageRank(spark, sf).as[(String, Long)].collect().toMap
    assert(again == pr)
  }

  test("corpus assembly: exact local replay of the per-stratum budget cut") {
    val got = Dedup.corpusAssembly(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val langOf = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val mani = Dedup.trainManifest(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("bucket")))
    // local largest-remainder replay of the per-stratum allocations
    val budget = Dedup.AssemblyBudgetTokens
    val totals = mani.map { case (id, n, b) => ((langOf(id), b), n) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    val weights = totals.map { case (s, t) => s -> math.sqrt(t.toDouble).toLong }
    val wTotal = weights.values.sum
    val base = weights.map { case (s, w) => s -> budget * w / wTotal }
    val leftover = budget - base.values.sum
    val ranked = weights.toSeq
      .sortBy { case ((l, b), w) => (-(budget * w % wTotal), l, b) }
      .map(_._1).zipWithIndex.toMap
    val alloc = base.map { case (s, v) =>
      s -> (v + (if (ranked(s) < leftover) 1L else 0L))
    }
    assert(alloc.values.sum == budget) // Σalloc ≡ K
    def h(id: Long) = TextAnalysis.hexOf(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    val expected = mani.map { case (id, n, b) => (id, langOf(id), b, n) }
      .groupBy(t => (t._2, t._3)).toSeq.flatMap { case (s, g) =>
        val a = alloc.getOrElse(s, 0L)
        var prior = 0L
        g.sortBy(t => (h(t._1), t._1)).takeWhile { t =>
          val in = prior < a; prior += t._4; in
        }.toSeq
      }.toSet
    assert(got == expected)
    // the cut engages: some stratum holds more tokens than its allocation
    val stratumTotals = mani.map { case (id, n, b) => ((langOf(id), b), n) }
      .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
    assert(stratumTotals.exists { case (s, t) => t > alloc.getOrElse(s, 0L) })
    assert(got.nonEmpty && got.size < mani.length)
  }

  test("dup rate by source: totals and rates consistent with the cluster output") {
    val rows = Dedup.dupRateBySource(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup_losers"),
          r.getAs[Long]("loser_rate_q16")))).toMap
    val nDocs = Dedup.docsWithDups(spark, sf).count()
    val losers = Dedup.dupClusters(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") =!=
        org.apache.spark.sql.functions.col("keeper_id")).count()
    assert(rows.values.map(_._1).sum == nDocs)
    assert(rows.values.map(_._2).sum == losers)
    rows.foreach { case (src, (n, l, q)) =>
      assert(l <= n && q == l * 65536L / n, src)
    }
    // dedup losses actually land in the report
    assert(rows.values.exists(_._2 > 0L))
    // every source of the base table appears
    val srcs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(rows.keySet == srcs)
  }

  test("personalized pagerank: exact local replay, seed host dominates") {
    val got = HostGraph.hostPersonalizedPr(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val edges = HostGraph.hostEdges(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outw = edges.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val n = hosts.length
    var pr = hosts.map(_ -> HostGraph.PrScale).toMap
    for (_ <- 1 to HostGraph.PageRankIters) {
      val m = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
      for ((s, d, w) <- edges) m(d) += pr(s) * w / outw(s)
      val dm = hosts.filterNot(outw.contains).map(pr).sum
      pr = hosts.map { h =>
        val tel = if (h == HostGraph.PprSeedHost) 15L * HostGraph.PrScale / 100 * n else 0L
        val dmh = if (h == HostGraph.PprSeedHost) dm else 0L
        h -> (tel + 85L * (m(h) + dmh) / 100)
      }.toMap
    }
    assert(got == pr)
    // the whole teleport mass lands on the seed: it must rank first
    assert(got.maxBy(_._2)._1 == HostGraph.PprSeedHost)
    // non-seed hosts still hold flow-through mass (graph is connected)
    assert(got.filterNot(_._1 == HostGraph.PprSeedHost).values.exists(_ > 0L))
  }

  test("cap-drop audit: zero at live caps, non-zero on a degenerate bucket") {
    import spark.implicits._
    val live = Dedup.capDropStats(spark, sf)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(live.keySet == Set("minhash_lsh", "simhash_block", "emb_lsh"))
    // sf0.001 buckets are far below the live caps: nothing is dropped today
    live.foreach { case (site, (b, r)) =>
      assert(b == 0L && r == 0L, s"unexpected live drops at $site: $b buckets/$r rows")
    }
    // cap 1 makes every ≥2-occupancy bucket degenerate (the injected dup
    // families guarantee such buckets exist at all three sites) — the audit
    // must SEE the truncation, not report zero
    val forced = Dedup.capDropStats(spark, sf, minhashCap = 1, simhashCap = 1, embCap = 1)
      .as[(String, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    forced.foreach { case (site, (b, r)) =>
      assert(b > 0L && r > 0L, s"forced overflow invisible at $site")
      assert(r >= b, s"$site: fewer rows than overflowed buckets")
    }
  }

  test("dup clusters: every injected dup family lands in one cluster") {
    import spark.implicits._
    val clusters = Dedup.dupClusters(spark, sf)
      .as[(Long, Long)].collect().toMap
    assert(clusters.nonEmpty)
    // keeper is a member of its own cluster and is the cluster minimum
    clusters.foreach { case (id, k) =>
      assert(clusters.get(k).forall(_ == k), s"keeper $k of $id not a root")
      assert(k <= id)
    }
    // injected families (Dedup.docsWithDups): id%10==0 → {id, id+1M, id+2M};
    // id%5==0 only → {id, id+1M}. Every member present in the pair graph
    // must share its family's keeper.
    val baseIds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect()
    var familiesChecked = 0
    baseIds.filter(_ % 5 == 0).foreach { b =>
      val fam = Seq(b, b + 1000000L) ++ (if (b % 10 == 0) Seq(b + 2000000L) else Nil)
      val present = fam.filter(clusters.contains)
      if (present.size > 1) {
        familiesChecked += 1
        val keepers = present.map(clusters).toSet
        assert(keepers.size == 1, s"family of $b split across keepers $keepers")
      }
    }
    assert(familiesChecked > 0, "no dup family appeared in the pair graph")
  }

  test("pointer doubling: a path of diameter 50 converges in 6 rounds, not in 3") {
    import spark.implicits._
    // Chain 0-1-2-…-50: diameter 50. Plain hash-min needs 50 iterations;
    // with the pointer-doubling shortcut reach after k rounds is 2^k − 1,
    // so ClusterIters=6 (reach 63) must collapse the whole chain to label 0
    // while 3 rounds (reach 7) must NOT — pinning the doubling math from
    // both sides on a graph wider than anything the corpus injects.
    val chain = (0L until 50L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val full = Dedup.hashMinComponents(chain, Dedup.ClusterIters)
      .as[(Long, Long)].collect().toMap
    assert(full.size == 51)
    assert(full.values.forall(_ == 0L), s"unconverged labels: ${full.values.toSet}")
    val partial = Dedup.hashMinComponents(chain, 3)
      .as[(Long, Long)].collect().toMap
    assert(partial.values.exists(_ != 0L),
      "3 rounds already converged a diameter-50 path — reach bound is wrong")
    // reach 2^3 − 1 = 7: nodes within 7 hops of 0 must already hold label 0
    (0L to 7L).foreach(i => assert(partial(i) == 0L, s"node $i past reach bound"))
  }

  test("dup clusters reach a true fixed point: every pair edge is label-monochrome") {
    import spark.implicits._
    // If any edge still crossed two labels, another hash-min iteration would
    // change them — monochrome edges prove ClusterIters covers this corpus's
    // component diameters (the documented bound), not just the injected
    // families the membership test walks.
    val clusters = Dedup.dupClusters(spark, sf).as[(Long, Long)].collect().toMap
    val pairs = Dedup.minhashPairs(spark, sf).select("doc_a", "doc_b")
      .unionByName(Dedup.simhashPairs(spark, sf).select("doc_a", "doc_b"))
      .as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b),
        s"edge ($a,$b) crosses labels ${clusters(a)}/${clusters(b)} — ClusterIters too small")
    }
  }

  test("planted-cluster LSH recall is high where uniform-corpus recall is low") {
    import spark.implicits._
    val planted = Similarity.annRecallPlanted(spark, sf)
      .as[(Long, Long)].collect()
    assert(planted.length > 0)
    val meanPlanted = planted.map(_._2).sum.toDouble / planted.length
    // same kernel, same bits, same probes — clustered geometry must recover
    // most of the exact top-10 (uniform vectors measure ≈1 of 10 in
    // ann_recall; a planted mean this high is impossible by chance)
    assert(meanPlanted >= 7.0, s"planted LSH recall $meanPlanted < 7 of 10")
    // every query's own cluster dominates: hits can never exceed k
    planted.foreach { case (q, h) => assert(h >= 0 && h <= 10, s"q$q hits=$h") }
  }

  test("pii scrub: injected docs counted and fully redacted, others untouched") {
    import spark.implicits._
    val rows = TextAnalysis.piiScrub(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, em, ip, ph, scrubbed) =>
      if (id % 4 == 1) {
        assert(em == 1 && ip == 1 && ph == 1, s"doc $id counts ($em,$ip,$ph)")
        assert(scrubbed.contains("<EMAIL>") && scrubbed.contains("<IP>")
          && scrubbed.contains("<PHONE>"), s"doc $id not redacted")
        assert(!scrubbed.contains("@example.com") && !scrubbed.contains("+1555"),
          s"doc $id leaked PII")
      } else {
        assert(em == 0 && ip == 0 && ph == 0, s"clean doc $id flagged")
        assert(!scrubbed.contains("<EMAIL>"))
      }
    }
  }

  test("contamination: every benchmark-source doc is flagged") {
    import spark.implicits._
    val hits = Dedup.contamination(spark, sf).as[(Long, Long)].collect().toMap
    assert(hits.nonEmpty)
    val benchSources = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "size(filter(split(lower(text), '\\\\W+'), w -> w <> '')) AS n")
      .as[(Long, Int)].collect()
      .filter { case (id, n) => id % 25 == 7 && n >= 13 }
      .map(_._1)
    assert(benchSources.nonEmpty, "corpus too small for a bench set")
    benchSources.foreach { id =>
      assert(hits.get(id).exists(_ >= 1L), s"bench-source doc $id not flagged")
    }
    hits.values.foreach(h => assert(h >= 1L))
  }

  test("profile language ID: 100% on marker-injected docs, en/und on raw soup") {
    import spark.implicits._
    val rows = TextAnalysis.langIdProfile(spark, sf)
      .as[(Long, String, String)].collect()
    assert(rows.nonEmpty)
    val (inj, raw) = rows.partition(_._1 % 3 != 0)
    assert(inj.nonEmpty && raw.nonEmpty)
    inj.foreach { case (id, lang, pred) =>
      assert(pred == lang, s"doc $id labeled $lang predicted $pred")
    }
    assert(inj.map(_._2).toSet.size >= 4, "injected set should span the languages")
    raw.foreach { case (id, _, pred) =>
      assert(pred == "en" || pred == "und", s"raw doc $id predicted $pred")
    }
  }

  test("stratified sample: every stratum lands at its budget, deterministically") {
    import spark.implicits._
    val picked = TextAnalysis.stratifiedSample(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(picked.nonEmpty)
    val byLang = picked.groupBy(_._2)
    byLang.foreach { case (lang, rows) =>
      val tok = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      // running-prior rule: total ≥ budget is reached (unless the stratum is
      // exhausted) and overshoot is bounded by one document
      assert(tok < TextAnalysis.SampleTokenBudget + maxDoc,
        s"$lang overshoot: $tok tokens")
    }
    // determinism: a second evaluation picks the identical set
    val again = TextAnalysis.stratifiedSample(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(picked.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("two-pass scalable sampler picks the identical set as the window spec") {
    import spark.implicits._
    val spec = TextAnalysis.stratifiedSample(spark, sf)
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    // several partition counts, including more partitions than strata and a
    // single partition (degenerate offsets)
    Seq(1, 3, 8).foreach { p =>
      val scalable = TextAnalysis.stratifiedSampleScalable(spark, sf, parts = p)
        .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      assert(scalable == spec, s"two-pass sampler diverged at parts=$p")
    }
  }

  test("host pagerank conserves total mass within integer-floor slack") {
    import spark.implicits._
    val pr = HostGraph.hostPageRank(spark, sf).as[(String, Long)].collect()
    val n = pr.length.toLong
    val nEdges = HostGraph.hostEdges(spark, sf).count()
    val total = pr.map(_._2).sum
    val ideal = n * HostGraph.PrScale
    // the corpus HAS a dangling host (other.example, a pure sink): without
    // redistribution its whole rank would leak every iteration — assert the
    // sink actually holds mass above the bare damping floor
    val sink = pr.toMap.apply("other.example")
    assert(sink > 15L * HostGraph.PrScale / 100,
      "dangling host should receive redistributed mass, not just the floor")
    // floors only ever LOSE sub-unit mass: < 1 per edge contribution, < N
    // across the dm//N split, < 1 per host for the 85//100 damp — so per
    // iteration the loss is < nEdges + 2N and mass never exceeds N·Scale
    val slack = HostGraph.PageRankIters * (nEdges + 2L * n)
    assert(total <= ideal, s"mass created: $total > $ideal")
    assert(total >= ideal - slack, s"mass leaked: $total vs $ideal (slack $slack)")
  }

  test("embedding dup pairs finds the injected perturbed vectors") {
    val pairs = Similarity.embeddingDupPairs(spark, sf).collect()
      .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1)))).toSet
    val injected = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter("vec_id % 4 = 0").select("vec_id").collect().map(_.getLong(0)).toSet
    injected.foreach { id =>
      assert(pairs.contains((id, id + 100000L)), s"missing dup pair for vec $id")
    }
    pairs.foreach { case (a, b) => assert(b - a == 100000L, s"false positive: $a,$b") }
  }

  test("token counts match a local recount") {
    import spark.implicits._
    val got = TextAnalysis.tokenCounts(spark, sf).as[(Long, Long)].collect().toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    docs.foreach { case (id, text) =>
      val n = if (text.trim.isEmpty) 0L else text.trim.split("\\s+").length.toLong
      assert(got(id) == n)
    }
  }

  test("blob meta + features run over the corpus binary column") {
    import graft.corpus.CorpusGen
    val meta = Multimodal.blobMeta(spark, sf)
    // empty-HTML corpus pages (P8 fixtures) sniff as non-html
    val spec = CorpusGen.specFor(sf)
    val nonEmpty = (0 until spec.nHosts).map(h =>
      (0 until spec.hostSizes(h)).count(i => !CorpusGen.isEmptyPage(spec, h, i))).sum
    assert(meta.count() > 0)
    assert(meta.filter("is_html = 1").count() == nonEmpty.toLong)
  }

  test("real blob decode reproduces the generator's encode-side ground truth") {
    import graft.corpus.CorpusGen
    val dir = CorpusGen.ensureFor(spark, sf)
    val feats = Multimodal.blobFeatures(spark, sf)
    val truth = spark.read.parquet(s"$dir/blob_meta.parquet")
    assert(feats.count() == CorpusGen.blobCount(CorpusGen.specFor(sf)))
    // engine features must equal the encode-side truth row-for-row
    val cols = Seq("blob_id", "kind", "width", "height", "sum_r", "sum_g", "sum_b",
      "sample_rate", "n_samples", "amp_sum", "n_bytes")
      .map(org.apache.spark.sql.functions.col)
    assert(feats.select(cols: _*).exceptAll(truth.select(cols: _*)).count() == 0)
    assert(truth.select(cols: _*).exceptAll(feats.select(cols: _*)).count() == 0)
    // all three kinds present: real BMPs, real WAVs, and corrupt payloads
    val kinds = feats.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("bmp", "wav", "unknown"))
    assert(kinds.values.forall(_ > 0))
  }

  test("search: scores are exact integer sums, ties break by doc_id, zero-hit query empty") {
    val rows = Search.searchTopK(spark, sf).collect()
    // the zero-hit query returns nothing
    assert(!rows.exists(_.getAs[Long]("query_id") == 4L))
    // per-query: ranks dense from 1, scores non-increasing, <= TopK rows
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.length <= Search.TopK)
      val scores = sorted.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, s"query $qid not sorted")
    }
    // recompute one query's scores locally from the raw docs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val terms = Search.Queries.toMap.apply(5L).split(" ")
    val df_ = terms.map(t => t -> docs.count(_._2.contains(t)).toLong).toMap
    val expected = docs.flatMap { case (id, ws) =>
      val s = terms.map(t => ws.count(_ == t).toLong * (Search.WeightScale / df_(t))).sum
      if (s > 0) Some(id -> s) else None
    }.sortBy { case (id, s) => (-s, id) }.take(Search.TopK)
    val got = rows.filter(_.getAs[Long]("query_id") == 5L).sortBy(_.getAs[Long]("rank"))
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score")).toSeq
    assert(got == expected.toSeq)
  }

  test("rrf fusion: scores equal a local fold over the three rankers' outputs") {
    val outs = Seq(Search.searchTopK(spark, sf), Search.bm25TopK(spark, sf),
      Search.qlDirichletTopK(spark, sf))
      .map(_.collect().map(r => (r.getAs[Long]("query_id"),
        r.getAs[Long]("rank"), r.getAs[Long]("doc_id"))))
    val fusedLocal = outs.flatten
      .groupBy(t => (t._1, t._3))
      .map { case ((q, d), g) =>
        (q, d, g.map(t => 65536L / (Search.RrfK + t._2)).sum, g.length.toLong)
      }
    val expected = fusedLocal.groupBy(_._1).flatMap { case (q, g) =>
      g.toSeq.sortBy(t => (-t._3, t._2)).take(Search.TopK)
        .zipWithIndex.map { case ((_, d, s, n), i) => (q, i + 1L, d, s, n) }
    }.toSet
    val got = Search.rrfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_q16"),
        r.getAs[Long]("n_lists"))).toSet
    assert(got == expected)
    // fusion is non-trivial: some doc is retrieved by more than one list
    assert(got.exists(_._5 >= 2L))
  }

  test("search snippets: first-hit positions and windows equal a local recompute") {
    val rows = Search.searchSnippets(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        ((r.getAs[Long]("rank"), r.getAs[Long]("pos"), r.getAs[String]("snippet"))))
      .toMap
    val top = Search.searchTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    assert(rows.size == top.length) // one snippet per result row
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
      .toMap
    for ((qid, rank, did) <- top) {
      val terms = Search.Queries.toMap.apply(qid).split(" ").toSet
      val wl = docs(did)
      val pos = wl.indexWhere(terms.contains) + 1 // 1-based; must exist
      assert(pos >= 1, s"q$qid d$did")
      val lo = math.max(1, pos - Search.SnippetRadius)
      val hi = math.min(wl.length, pos + Search.SnippetRadius)
      val snippet = wl.slice(lo - 1, hi).mkString(" ")
      assert(rows((qid, did)) == ((rank, pos.toLong, snippet)), s"q$qid d$did")
    }
    // clamping engages somewhere: some window is shorter than 2r+1 tokens
    assert(rows.values.exists(_._3.split(" ").length < 2 * Search.SnippetRadius + 1) ||
      rows.values.forall(_._2 > Search.SnippetRadius))
  }

  test("ranker eval: full grid, OOV zeros, metrics equal a local recount over each ranker's output") {
    val rows = Search.rankerEval(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Long]("query_id")) ->
        ((r.getAs[Long]("n_rel"), r.getAs[Long]("n_ret"),
          r.getAs[Long]("hits_at_10"), r.getAs[Long]("first_rel_rank"),
          r.getAs[Long]("rr_q16")))).toMap
    assert(rows.size == 3 * Search.Queries.length)
    // the fully-OOV query is all-zero on every ranker
    for (rk <- Seq("tf", "bm25", "ql"))
      assert(rows((rk, 4L)) == ((0L, 0L, 0L, 0L, 0L)))
    // local relevance: docs containing every query term
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty).toSet)
    val rel = Search.Queries.map { case (qid, q) =>
      qid -> docs.filter { case (_, ws) => q.split(" ").forall(ws.contains) }
        .map(_._1).toSet
    }.toMap
    val outs = Map(
      "tf" -> Search.searchTopK(spark, sf),
      "bm25" -> Search.bm25TopK(spark, sf),
      "ql" -> Search.qlDirichletTopK(spark, sf))
      .map { case (n, df) =>
        n -> df.collect().map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
      }
    for ((rk, out) <- outs; (qid, _) <- Search.Queries) {
      val ret = out.filter(_._1 == qid)
      val hitRanks = ret.filter(t => rel(qid).contains(t._3)).map(_._2)
      val fr = if (hitRanks.isEmpty) 0L else hitRanks.min
      val expect = (rel(qid).size.toLong, ret.length.toLong,
        hitRanks.length.toLong, fr, if (fr == 0L) 0L else 65536L / fr)
      assert(rows((rk, qid)) == expect, s"$rk q$qid")
    }
    // the audit discriminates: some ranker/query pair retrieves a relevant
    // doc, and at least one pair misses one it could have had
    assert(rows.values.exists(_._3 > 0L))
  }

  test("dirichlet QL: scores equal a direct local replay (validates the present/absent rewrite)") {
    val rows = Search.qlDirichletTopK(spark, sf).collect()
    // the fully-OOV query has no in-corpus terms, hence no candidates
    assert(!rows.exists(_.getAs[Long]("query_id") == 4L))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val bigT = docs.map(_._2.length.toLong).sum
    val cf = docs.flatMap(_._2).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    for (qid <- Seq(1L, 5L, 7L)) {
      val terms = Search.Queries.toMap.apply(qid).split(" ").filter(cf.contains)
      val exp = docs.filter { case (_, ws) => terms.exists(ws.contains) }
        .map { case (id, ws) =>
          val dl = ws.length.toLong
          // the DIRECT per-term log-prob sum, not the engine's rewrite
          val s = terms.map { t =>
            val tf = ws.count(_ == t).toLong
            Lm.log2fix(tf * bigT + Search.QlMu * cf(t)) -
              Lm.log2fix(bigT) - Lm.log2fix(dl + Search.QlMu)
          }.sum
          (id, s)
        }.sortBy { case (id, s) => (-s, id) }.take(Search.TopK)
        .zipWithIndex.map { case ((id, s), i) => (i + 1L, id, s) }
      val got = rows.filter(_.getAs[Long]("query_id") == qid)
        .sortBy(_.getAs[Long]("rank"))
        .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("score_q16"))).toSeq
      assert(got == exp.toSeq, s"query $qid")
      assert(got.forall(_._3 < 0L)) // log-probs are negative
    }
  }

  test("unigram entropy: Q16 values equal a local log2fix replay, bounds hold") {
    val rows = TextAnalysis.unigramEntropy(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val expected = docs.map { case (id, ws) =>
      if (ws.isEmpty) id -> ((0L, 0L, 0L))
      else {
        val tf = ws.groupBy(identity).values.map(_.length.toLong)
        val dl = ws.length.toLong
        val s = tf.map(t => t * (Lm.log2fix(dl) - Lm.log2fix(t))).sum
        id -> ((dl, tf.size.toLong, s / dl))
      }
    }.toMap
    val got = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    // 0 ≤ H ≤ log2(n_tokens), and the corpus spans non-degenerate values
    assert(got.values.forall { case (dl, _, e) =>
      e >= 0L && (dl == 0L || e <= Lm.log2fix(dl)) })
    assert(got.values.exists(_._3 > 0L))
  }

  test("more-like-this: rarest-term selection + scores equal a full local replay") {
    val rows = Search.moreLikeThis(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val tf = docs.map { case (id, ws) =>
      id -> ws.groupBy(identity).map { case (w, g) => w -> g.length.toLong }
    }.toMap
    val df_ = docs.flatMap(_._2.distinct).groupBy(identity)
      .map { case (w, g) => w -> g.length.toLong }
    val expected = Search.MltDocs.flatMap { qid =>
      val sel = tf(qid).toSeq
        .map { case (w, tq) => (df_(w), w, tq) }.sorted.take(Search.MltTerms)
      docs.flatMap { case (id, _) =>
        if (id == qid) None
        else {
          val s = sel.map { case (dfw, w, tq) =>
            tf(id).getOrElse(w, 0L) * tq * (Search.WeightScale / dfw)
          }.sum
          if (s > 0) Some((qid, id, s)) else None
        }
      }.sortBy { case (_, id, s) => (-s, id) }.take(Search.TopK)
        .zipWithIndex.map { case ((q, id, s), i) => (q, i + 1L, id, s) }
    }.toSet
    val got = rows.map(r => (r.getAs[Long]("query_doc"), r.getAs[Long]("rank"),
      r.getAs[Long]("doc_id"), r.getAs[Long]("score"))).toSet
    assert(got == expected)
    // every probe retrieves a full page of neighbours at this corpus size
    assert(Search.MltDocs.forall(q => got.count(_._1 == q) == Search.TopK))
  }

  test("more-like-this: broadcast probe-term prune reaches the plan before the tf agg") {
    val plan = Search.moreLikeThis(spark, sf).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast prune:\n$plan")
  }

  test("search: the broadcast query-term prune reaches the plan before the tf aggregation") {
    val plan = Search.searchTopK(spark, sf).queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast prune:\n$plan")
    // the full-corpus postings build must NOT appear: every HashAggregate
    // keyed by (doc_id, w) sits above the broadcast join in this plan, so
    // a zero-hit workload aggregates nothing
    val rowsPhrase = Search.phraseTopK(spark, sf).collect()
    assert(!rowsPhrase.exists(_.getAs[Long]("phrase_id") == 4L)) // zero-hit phrase
    assert(rowsPhrase.nonEmpty)
  }

  test("phrase search: positional index, docs never cross-joined, token semantics") {
    // the docs table must not be scanned per phrase: no cartesian /
    // nested-loop join anywhere in the physical plan
    val df0 = Search.phraseTopK(spark, sf)
    val plan = df0.queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), s"cartesian in phrase plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop in phrase plan:\n$plan")
    // local token-level recount of every phrase over the raw docs
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val got = df0.collect()
      .groupBy(_.getAs[Long]("phrase_id"))
      .map { case (pid, rs) =>
        pid -> rs.sortBy(_.getAs[Long]("rank"))
          .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occurrences")).toSeq
      }
    Search.Phrases.foreach { case (pid, ph) =>
      val terms = ph.split(" ")
      val expected = docs.flatMap { case (id, ws) =>
        val n = ws.indices.count(i => i + terms.length <= ws.length &&
          terms.indices.forall(j => ws(i + j) == terms(j))).toLong
        if (n > 0) Some(id -> n) else None
      }.sortBy { case (id, n) => (-n, id) }.take(Search.TopK).toSeq
      assert(got.getOrElse(pid, Seq.empty) == expected, s"phrase $pid")
    }
  }

  test("bpe: incremental pair-count trainer equals a local full-recount greedy") {
    val got = Bpe.trainMerges(spark, sf)
    // local reference: full recount per step over the collected vocabulary
    var vocab = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.split("\\W+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.length.toLong
      }.toVector
    val expected = Seq.newBuilder[(Int, String, String)]
    for (k <- 1 to Bpe.NumMerges) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((a, b), _) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        expected += ((k, a, b))
        vocab = vocab.map { case (syms, f) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2 // greedy left-to-right, overlaps skip
            } else { out += syms(i); i += 1 }
          }
          out.result() -> f
        }
      }
    }
    assert(got == expected.result())
  }

  test("log2fix: exact at powers of two, within one Q16 ulp-cluster elsewhere") {
    (0 to 40).foreach { k =>
      assert(Lm.log2fix(1L << k) == k.toLong << 16, s"2^$k")
    }
    val probe = Seq(3L, 5L, 7L, 10L, 100L, 12345L, 999983L, (1L << 40) + 12345L)
    probe.foreach { m =>
      val approx = Lm.log2fix(m).toDouble / 65536.0
      val exact = math.log(m.toDouble) / math.log(2.0)
      // truncation iteration only ever undershoots, by < ~2^-14
      assert(approx <= exact + 1e-9 && exact - approx < 1e-3, s"log2fix($m)=$approx vs $exact")
    }
    // monotone over a dense range (ties allowed at Q16 resolution)
    val vs = (1L to 5000L).map(Lm.log2fix)
    assert(vs.zip(vs.tail).forall { case (a, b) => a <= b })
  }

  test("lm score: negative totals, transition counts match a local recount") {
    val rows = Lm.lmScore(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
      .toMap
    assert(rows.length == docs.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = math.max(0, docs(id).length - 1).toLong
      assert(r.getAs[Long]("n_transitions") == n, s"doc $id")
      // every transition's score is a log of a probability < 1 → negative
      if (n > 0) assert(r.getAs[Long]("lm_score_q16") < 0L, s"doc $id score")
    }
  }

  test("lm buckets: exact per-language terciles, rank = local sort position") {
    val rows = Lm.lmBuckets(spark, sf).collect()
    assert(rows.nonEmpty)
    // rebuild the expected ranking locally: per-token score desc, doc_id asc
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (lang, rs) =>
      val n = rs.length
      assert(rs.forall(_.getAs[Long]("n_lang") == n.toLong), s"$lang n_lang")
      val sorted = rs.sortBy(r =>
        (-r.getAs[Long]("tok_score_q16"), r.getAs[Long]("doc_id")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val rank = i + 1L
        assert(r.getAs[Long]("lang_rank") == rank,
          s"$lang doc ${r.getAs[Long]("doc_id")} rank")
        val expect = if (rank * 3 <= n) "head"
        else if (rank * 3 <= 2L * n) "middle" else "tail"
        assert(r.getAs[String]("bucket") == expect, s"$lang rank $rank bucket")
      }
      // tercile sizes: |head| = floor(n/3), |head|+|middle| = floor(2n/3)
      assert(rs.count(_.getAs[String]("bucket") == "head") == n / 3, s"$lang head")
      assert(rs.count(_.getAs[String]("bucket") != "tail") == 2 * n / 3, s"$lang mid")
    }
    // manifest carries the bucket column and only ranked-or-tail values
    val mf = Dedup.trainManifest(spark, sf).collect()
    val bucketOf = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("bucket")).toMap
    mf.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("bucket") == bucketOf.getOrElse(id, "tail"), s"manifest doc $id")
    }
  }

  test("dsir: scores match a full local recount; en target scores higher") {
    val rows = Dsir.dsirWeights(spark, sf).collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.split("\\W+").filter(_.nonEmpty).toSeq))
    assert(rows.length == docs.length)
    // local replay: sha256-hex bucket, add-1 histograms, Q16 log ratios
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def bucket(w: String): Int = {
      val d = md.digest(w.getBytes("UTF-8"))
      (d(0).toInt & 0xff) // first two hex chars == first byte
    }
    val rawc = new Array[Long](Dsir.NumBuckets)
    val tgtc = new Array[Long](Dsir.NumBuckets)
    docs.foreach { case (_, lang, ws) =>
      ws.foreach { w =>
        val b = bucket(w)
        rawc(b) += 1
        if (lang == "en") tgtc(b) += 1
      }
    }
    val rt = rawc.sum + Dsir.NumBuckets
    val tt = tgtc.sum + Dsir.NumBuckets
    val wq = (0 until Dsir.NumBuckets).map { b =>
      (Lm.log2fix(tgtc(b) + 1) - Lm.log2fix(tt)) -
        (Lm.log2fix(rawc(b) + 1) - Lm.log2fix(rt))
    }
    val expect = docs.map { case (id, _, ws) =>
      id -> (ws.map(w => wq(bucket(w))).sum, ws.length.toLong)
    }.toMap
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (s, n) = expect(id)
      assert(r.getAs[Long]("dsir_score_q16") == s, s"doc $id score")
      assert(r.getAs[Long]("n_feats") == n, s"doc $id n_feats")
    }
    // directional sanity: the mean per-token importance of target-language
    // docs exceeds the non-target mean (the weights favor the target dist)
    def meanPerTok(sel: String => Boolean): Double = {
      val sub = rows.filter(r => sel(r.getAs[String]("lang")) &&
        r.getAs[Long]("n_feats") > 0)
      sub.map(r => r.getAs[Long]("dsir_score_q16").toDouble /
        r.getAs[Long]("n_feats")).sum / sub.length
    }
    assert(meanPerTok(_ == "en") > meanPerTok(_ != "en"))
  }

  test("hits: sum-normalized mass conserved within floor slack; scores sane") {
    val rows = HostGraph.hostHits(spark, sf).collect()
      .map(r => (r.getAs[String]("host"), r.getAs[Long]("hub_q"), r.getAs[Long]("auth_q")))
    assert(rows.nonEmpty)
    val n = rows.length
    // each normalize emits (m·S) div T per host, so Σ ∈ (S − n, S]
    val hubSum = rows.map(_._2).sum
    val authSum = rows.map(_._3).sum
    assert(hubSum <= HostGraph.PrScale && hubSum > HostGraph.PrScale - n, s"hub mass $hubSum")
    assert(authSum <= HostGraph.PrScale && authSum > HostGraph.PrScale - n, s"auth mass $authSum")
    assert(rows.forall(r => r._2 >= 0L && r._3 >= 0L))
    // the graph is connected enough that something scores on both axes
    assert(rows.exists(_._2 > 0L) && rows.exists(_._3 > 0L))
  }

  test("dsir sample: ranks are a permutation, kept = top quarter by per-token score") {
    val rows = Dsir.dsirSample(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("per_tok_q16"),
        r.getAs[Long]("sel_rank"), r.getAs[Long]("kept")))
    assert(rows.nonEmpty)
    val n = rows.length.toLong
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq, "ranks not a permutation")
    assert(rows.count(_._4 == 1L).toLong == n / Dsir.SampleKeepDen)
    // rank order respects (per_tok desc, doc_id): every kept row's per_tok
    // >= every dropped row's per_tok
    val keptMin = rows.filter(_._4 == 1L).map(_._2).min
    val dropMax = rows.filter(_._4 == 0L).map(_._2).max
    assert(keptMin >= dropMax, s"selection not score-monotone: $keptMin < $dropMax")
    // the floor division must match exact math (offset trick correctness)
    val weights = Dsir.dsirWeights(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("dsir_score_q16"), r.getAs[Long]("n_feats"))).toMap
    rows.foreach { case (id, pt, _, _) =>
      val (s, nf) = weights(id)
      assert(pt == Math.floorDiv(s, nf), s"doc $id per_tok floor drift")
    }
  }

  test("url templates: digit collapse, trap flag fires on page mills only") {
    // threshold 50 so the sf0.001 corpus's per-section page mills flag
    val rows = graft.queries.CrawlQueries.urlTemplates(spark, sf, threshold = 50L)
      .collect()
      .map(r => (r.getAs[String]("dst_host"), r.getAs[String]("path_template"),
        r.getAs[Long]("n_urls"), r.getAs[Long]("n_links"), r.getAs[Long]("is_trap")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, t, nu, nl, trap) =>
      assert(!t.exists(_.isDigit), s"template $t still carries digits")
      assert(nl >= nu && nu >= 1)
      assert(trap == (if (nu >= 50L) 1L else 0L))
    }
    // a page mill must flag; single-url host roots must not
    assert(rows.exists(_._5 == 1L), "no trap template found")
    rows.filter(_._2 == "/").foreach { r =>
      assert(r._5 == 0L, s"host root flagged as trap: $r")
    }
  }

  test("C4 rules: each injected variant lands on its documented outcome") {
    val rows = TextAnalysis.qualityC4(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val pass = r.getAs[Long]("pass")
      (id % 5) match {
        case 0 => // clean: 3 sentences appended, no lorem/brace
          assert(pass == 1L, s"doc $id should pass")
          assert(r.getAs[Long]("has_lorem") == 0L && r.getAs[Long]("has_brace") == 0L)
          assert(r.getAs[Long]("n_sentences") >= 3L)
        case 1 => // lorem ipsum page drop
          assert(pass == 0L && r.getAs[Long]("has_lorem") == 1L)
        case 2 => // curly-brace page drop
          assert(pass == 0L && r.getAs[Long]("has_brace") == 1L)
        case 3 => // javascript + unpunctuated lines dropped → < 3 sentences
          assert(pass == 0L)
          assert(r.getAs[Long]("n_lines") == 4L)
          assert(r.getAs[Long]("n_kept_lines") == 2L, s"doc $id kept ${r.getAs[Long]("n_kept_lines")}")
          assert(r.getAs[Long]("n_sentences") == 2L)
        case _ => // no terminal punctuation at all → nothing kept
          assert(pass == 0L)
          assert(r.getAs[Long]("n_kept_lines") == 0L && r.getAs[String]("cleaned") == "")
      }
    }
  }

  test("line dedup: boilerplate survives only at its first corpus occurrence") {
    val rows = Dedup.lineDedup(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"), r.getAs[String]("cleaned")))
      .toMap
    assert(rows.size == 500)
    // doc 0 (lowest id, % 3 == 0) owns both boilerplate lines
    val (n0, k0, c0) = rows(0L)
    assert(n0 == 4L && c0.contains(Dedup.LineBoiler) && c0.contains(Dedup.LineBoiler3))
    // every OTHER doc lost the cookie line; % 3 == 0 docs also lost the
    // subscribe line — kept is at most the doc's own content lines
    rows.foreach { case (id, (nLines, nKept, cleaned)) =>
      if (id != 0L) {
        assert(!cleaned.contains(Dedup.LineBoiler), s"doc $id kept the cookie line")
        assert(!cleaned.contains(Dedup.LineBoiler3), s"doc $id kept the subscribe line")
        val expectedLines = if (id % 3 == 0) 4L else 3L
        assert(nLines == expectedLines)
        assert(nKept <= expectedLines - (if (id % 3 == 0) 2 else 1))
      }
      // kept lines reappear verbatim, in order, inside the cleaned text
      assert(nKept == (if (cleaned.isEmpty) 0L else cleaned.split("\n", -1).length.toLong))
    }
    // the cookie line exists exactly once across the whole cleaned corpus
    val cookieTotal = rows.values.map(_._3.split("\n", -1).count(_ == Dedup.LineBoiler)).sum
    assert(cookieTotal == 1)
  }

  test("semdedup: injected near-identical copies drop, originals survive") {
    val rows = Similarity.semDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cid"), r.getAs[Long]("kept")))
    assert(rows.length == 625) // 500 + 125 injected
    val byId = rows.map(r => r._1 -> r).toMap
    // every injected copy (vec_id ≥ 100000) shares its base's cluster and
    // is dropped by the lower-id rule; every base survives (uniform
    // corpus pairs never reach the 0.95 threshold)
    rows.filter(_._1 >= 100000L).foreach { case (id, cid, kept) =>
      val base = byId(id - 100000L)
      assert(cid == base._2, s"copy $id landed in cluster $cid, base in ${base._2}")
      assert(kept == 0L, s"copy $id was kept")
    }
    rows.filter(_._1 < 100000L).foreach { case (id, _, kept) =>
      assert(kept == 1L, s"original $id was dropped")
    }
    // clusters are non-trivial: more than one cid in play
    assert(rows.map(_._2).distinct.length > 1)
  }

  test("bm25: broadcast prune in the plan; one (query, doc) score recounted exactly") {
    val bm = Search.bm25TopK(spark, sf)
    val plan = bm.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast prune:\n$plan")
    // local replay of the full integer formula for query 1 ("spark")
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).toLowerCase.split("\\W+").filter(_.nonEmpty))
    val n = texts.length.toLong
    val t = texts.map(_._2.length.toLong).sum
    val term = "spark"
    val df = texts.count(_._2.contains(term)).toLong
    assert(df > 0, "corpus must contain the probe term")
    val idf = Lm.log2fix(2 * n + 2) - Lm.log2fix(2 * df + 1)
    import Search.{Q16, Q16K1, Q16B}
    val expected = texts.filter(_._2.contains(term)).map { case (id, ws) =>
      val tf = ws.count(_ == term).toLong
      val dl = ws.length.toLong
      val tfn = (tf * (Q16K1 + Q16) * Q16) /
        (tf * Q16 + Q16K1 * ((Q16 - Q16B) + (Q16B * dl * n) / t))
      id -> (idf * tfn) / Q16
    }.toMap
    val got = bm.collect().filter(_.getAs[Long]("query_id") == 1L)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_q16")).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, s) => assert(s == expected(id), s"doc $id: $s != ${expected(id)}") }
  }

  test("source overlap: every mirrored source pairs with its base, nothing else") {
    val rows = Dedup.sourceOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, shared, na, nb) =>
      // only (mirrorsrcK, srcK) pairs exist ('m' < 's') — base texts unique
      assert(a == s"mirror$b", s"unexpected overlap pair ($a, $b)")
      assert(shared == na, s"mirror $a should share ALL its texts with $b")
      assert(nb > na, s"base $b should hold more texts than its partial mirror")
    }
    // 3 is coprime with the 20-source round-robin: EVERY source pairs once
    assert(rows.map(_._2).distinct.length == rows.length)
    assert(rows.length == 20)
  }

  test("source overlap: the per-hash source cap engages and is audited, never silent") {
    import spark.implicits._
    // live cap sees no drops on this corpus (≤ 2 sources share any hash)
    val live = Dedup.sourceOverlapCapStats(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(live.length == 1 && live.head._1 == "source_overlap")
    assert(live.head._2 == 0L && live.head._3 == 0L, s"unexpected live drops: $live")
    // cap 1 keeps one source per hash → the pair join yields NOTHING (the
    // n² fan-out is bounded at the source, before the join), and the audit
    // reports exactly the mirrored hashes' second members as dropped
    assert(Dedup.sourceOverlap(spark, sf, maxSources = 1).count() == 0L)
    val forced = Dedup.sourceOverlapCapStats(spark, sf, maxSources = 1)
      .as[(String, Long, Long)].collect().head
    assert(forced._2 > 0L && forced._3 > 0L, "forced overflow invisible")
    assert(forced._3 >= forced._2)
  }

  test("semdedup: cluster-cap overflow rows stay in the output as kept=1") {
    // maxCluster=1 makes EVERY non-first member of every cluster overflow:
    // nothing is compared, so nothing may be dropped — and critically no
    // vector may vanish from the output (the old filter dropped them)
    val rows = Similarity.semDedup(spark, sf, maxCluster = 1).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("kept")))
    assert(rows.length == 625, s"capped semdedup lost vectors: ${rows.length}")
    assert(rows.map(_._1).distinct.length == 625)
    assert(rows.forall(_._2 == 1L), "an uncompared overflow row was dropped")
  }

  test("bm25f: full output matches an exact local replay on a hand-built corpus") {
    import spark.implicits._
    // p1: "home" only in anchors (3 in-links); p2: "home" only in body;
    // p3: no hits; anchors to a non-page url must be ignored
    val body = Seq(
      ("http://h.test/", "welcome page welcome start"),
      ("http://h.test/a", "home sweet home text body words here"),
      ("http://h.test/b", "unrelated filler tokens")).toDF("url", "markdown")
    val anchors = Seq(
      ("http://h.test/a", "http://h.test/", 0L, "Home"),
      ("http://h.test/b", "http://h.test/", 0L, "home link"),
      ("http://h.test/", "http://h.test/a", 0L, "deep page"),
      ("http://h.test/", "http://x.test/ghost", 1L, "home home home"))
      .toDF("src_url", "dst_url", "pos", "anchor_text")
    val got = Search.bm25fTopK(spark, body, anchors).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[String]("url"), r.getAs[Long]("score_q16")))

    import Search.{Q16, Q16K1, Q16B, WBody, WAnchor}
    val bodyTok = Map(
      "http://h.test/" -> Seq("welcome", "page", "welcome", "start"),
      "http://h.test/a" -> Seq("home", "sweet", "home", "text", "body", "words", "here"),
      "http://h.test/b" -> Seq("unrelated", "filler", "tokens"))
    val anchTok = Map( // ghost dst dropped; per-link first-anchor tokens
      "http://h.test/" -> Seq("home", "home", "link"),
      "http://h.test/a" -> Seq("deep", "page"))
    val n = 3L
    val tB = bodyTok.values.map(_.length.toLong).sum
    val tA = anchTok.values.map(_.length.toLong).sum
    def score(term: String, url: String): Long = {
      val tfb = bodyTok(url).count(_ == term).toLong
      val tfa = anchTok.getOrElse(url, Nil).count(_ == term).toLong
      if (tfb + tfa == 0) return -1L // no hit row at all
      val dlb = bodyTok(url).length.toLong
      val dla = anchTok.getOrElse(url, Nil).length.toLong
      val df = bodyTok.keys.count(u => bodyTok(u).contains(term) ||
        anchTok.getOrElse(u, Nil).contains(term)).toLong
      val idf = Lm.log2fix(2 * n + 2) - Lm.log2fix(2 * df + 1)
      val tfnb = (tfb * Q16 * Q16) / ((Q16 - Q16B) + (Q16B * dlb * n) / tB)
      val tfna = (tfa * Q16 * Q16) / ((Q16 - Q16B) + (Q16B * dla * n) / tA)
      val tft = WBody * tfnb + WAnchor * tfna
      val sat = (tft * Q16) / (Q16K1 + tft)
      (idf * sat) / Q16
    }
    // query 1 = "home": root (anchor-only, 3× weight) must outrank /a
    // (body-only) despite tf 2 in a longer body field
    val q1 = got.filter(_._1 == 1L).sortBy(_._2)
    assert(q1.map(_._3).toSeq ==
      Seq("http://h.test/", "http://h.test/a"), s"q1 order: ${q1.toSeq}")
    assert(q1.map(_._4).toSeq ==
      Seq(score("home", "http://h.test/"), score("home", "http://h.test/a")))
    // query 5 (zero-hit) returns nothing; every score replays exactly
    assert(!got.exists(_._1 == 5L))
    got.filter(r => Search.QueriesF.toMap.apply(r._1).split(" ").length == 1)
      .foreach { case (qid, _, url, s) =>
        val term = Search.QueriesF.toMap.apply(qid)
        assert(s == score(term, url), s"$qid/$url: $s != ${score(term, url)}")
      }
  }

  test("bm25: ranks contiguous, scores non-increasing, zero-hit query empty") {
    val rows = Search.bm25TopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("score_q16")))
    assert(rows.nonEmpty)
    // query 4 ("quantum chromodynamics") hits nothing
    assert(!rows.exists(_._1 == 4L))
    rows.groupBy(_._1).foreach { case (qid, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"query $qid ranks")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 > b._4 || (a._4 == b._4 && a._3 < b._3), s"query $qid tie order")
        case _ =>
      }
      assert(sorted.forall(_._4 > 0L), s"query $qid nonpositive score")
    }
  }

  test("len deciles: histogram rank math equals a local sort-based percentile_disc") {
    val rows = TextAnalysis.lenDeciles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val bySource = docs.groupBy(_._1).map { case (s, vs) => s -> vs.map(_._2).sorted }
    val expected = bySource.flatMap { case (s, vs) =>
      (1 to 9).map { k =>
        // percentile_disc: the value at 1-indexed position ceil(k·n/10)
        val pos = (k * vs.length + 9) / 10
        (s, k.toLong) -> vs(pos - 1)
      }
    }
    assert(rows == expected)
    assert(rows.keys.map(_._1).toSet == bySource.keySet)
  }

  test("source boilerplate: class thresholds fire correctly, clean drops exactly the flagged lines") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val bySource = docs.groupBy(_._2).map { case (s, vs) => s -> vs.map(_._1) }

    val bp = Dedup.sourceBoilerplate(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    bySource.foreach { case (src, ids) =>
      val n = ids.length.toLong
      // footer: on every doc → always boilerplate
      assert(bp((src, s"(c) $src syndication network")) == ((n, 1L)))
      // rights: a hash-split ~half; flagged exactly when 2·count ≥ n
      val evens = ids.count(id => (id * 2654435761L) % 100 < 50).toLong
      if (evens >= 2)
        assert(bp((src, s"All rights reserved by $src")) ==
          ((evens, if (2 * evens >= n) 1L else 0L)))
      // subscribe: ~a third — never reaches the majority here
      val thirds = ids.count(_ % 3 == 0).toLong
      if (thirds >= 2) {
        val (cnt, flag) = bp((src, s"Subscribe to $src updates today"))
        assert(cnt == thirds && flag == (if (2 * thirds >= n) 1L else 0L))
        assert(flag == 0L, s"$src subscribe unexpectedly boilerplate")
      }
    }
    // both threshold sides occur across sources (the %2 boundary case)
    val rightsFlags = bp.collect {
      case ((s, l), (_, f)) if l.startsWith("All rights") => f
    }.toSet
    assert(rightsFlags == Set(0L, 1L), s"rights flags: $rightsFlags")

    val clean = Dedup.boilerplateClean(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    docs.foreach { case (id, src) =>
      val n = bySource(src).length.toLong
      val evens = bySource(src).count(x => (x * 2654435761L) % 100 < 50).toLong
      val hasRights = (id * 2654435761L) % 100 < 50
      val injected = 1L + (if (hasRights) 1L else 0L) + (if (id % 3 == 0) 1L else 0L)
      val expectRemoved = 1L + (if (hasRights && 2 * evens >= n) 1L else 0L)
      val (nLines, nRemoved, cleaned) = clean(id)
      assert(nLines == 1L + injected, s"doc $id")
      assert(nRemoved == expectRemoved, s"doc $id")
      assert(!cleaned.contains("syndication network"), s"doc $id")
      assert(cleaned.nonEmpty)
    }
  }

  test("filter funnel: stages chain monotonically and agree with the operators") {
    val rows = Dedup.filterFunnel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(rows.map(_._2).toSeq ==
      Seq("gopher", "dedup", "decontam", "nb_quality", "ppl_tail"))
    rows.foreach { case (_, st, in, dropped, out) =>
      assert(out == in - dropped && dropped >= 0, st)
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._5, s"stage ${b._2} n_in chain")
      case _           =>
    }
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.head._3 == nDocs)
    // stage 1 equals the independently-run gopher gate
    val g = TextAnalysis.qualityGopher(spark, sf).filter("pass = 1").count()
    assert(rows.head._5 == g)
    // the final survivor count is positive and below the input
    assert(rows.last._5 > 0 && rows.last._5 < nDocs)
  }

  test("shard manifest: totals conserved, assignment spread across shards") {
    val rows = Dedup.shardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val mani = Dedup.trainManifest(spark, sf)
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum("n_tokens")).collect()(0)
    assert(rows.map(_._2).sum == mani.getLong(0))
    assert(rows.map(_._3).sum == mani.getLong(1))
    assert(rows.forall(r => r._1 >= 0 && r._1 < Dedup.NumShards))
    // the hash spreads: more than half the shards are non-empty at this sf
    assert(rows.count(_._2 > 0) > Dedup.NumShards / 2)
  }

  test("mix budget: exact conservation, head share flattened vs raw share") {
    val rows = Dedup.mixBudget(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._5).sum == Dedup.MixBudgetTokens)
    val totTok = rows.map(_._3).sum.toDouble
    val top = rows.maxBy(_._3)
    // sqrt flattening: the biggest stratum's allocated share is strictly
    // below its raw token share
    assert(top._5 / Dedup.MixBudgetTokens.toDouble < top._3 / totTok)
  }

  test("count-min sketch: never underestimates, overestimate within the eps*N bound") {
    val rows = CountMin.inlinkCmsAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, exact, est) => est >= exact },
      "CMS must never underestimate")
    // CM guarantee: P[est > exact + (e/w)*N] <= e^-d per key — with the
    // fixed md5 hashes this either passes forever or the bound is
    // genuinely broken
    val dir = graft.corpus.CorpusGen.ensureFor(spark, sf)
    val n = spark.read.parquet(s"$dir/xlinks.parquet").count()
    val bound = (math.E / CountMin.CmsW * n).toLong + 1
    assert(rows.forall { case (_, exact, est) => est - exact <= bound },
      s"overestimate past eps*N=$bound")
  }
}
