package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over
  * `embeddings(vec_id, embedding: array<float>, label)`.
  *
  * Scale design: brute-force top-k is the exact baseline — one narrow
  * mapPartitions emitting per-partition top-k per query (bounded heaps, no
  * cross join materialization), then a tiny global merge. The LSH variant
  * (random-hyperplane signatures, multi-probe) is the 100 TB path: candidate
  * sets come from bucket joins, distance evaluation only touches candidates.
  * Queries are broadcast (they are always ≪ the corpus).
  */
object Similarity {

  import scala.jdk.CollectionConverters._

  private def emb(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Exact top-k cosine neighbors for the query vectors (the `nQueries`
    * smallest vec_ids), excluding self. Two-phase: per-partition heaps →
    * global merge of ≤ parts×k rows per query.
    */
  def bruteForceTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    bruteForceTopKOver(spark,
      emb(spark, sfDir).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])], nQueries, k)
  }

  /** [[bruteForceTopK]] over an arbitrary (vec_id, embedding) source —
    * shared by the parquet table and the planted-cluster view.
    */
  def bruteForceTopKOver(spark: SparkSession,
      all: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val queries = all.orderBy(col("vec_id")).limit(nQueries).collect()
    val bcQ = spark.sparkContext.broadcast(queries)

    val partial = all.mapPartitions { it =>
      val qs = bcQ.value
      // one bounded min-heap per query
      val heaps = qs.map(_ => new java.util.PriorityQueue[(Double, Long)](
        k + 1, Ordering.by[(Double, Long), (Double, Long)](t => (t._1, -t._2))))
      it.foreach { case (id, vec) =>
        var qi = 0
        while (qi < qs.length) {
          val (qid, qv) = qs(qi)
          if (qid != id) {
            val c = cosine(qv, vec)
            val h = heaps(qi)
            h.add((c, id))
            if (h.size > k) h.poll(): Unit
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        val qid = qs(qi)._1
        h.iterator().asScala.map { case (c, id) => (qid, id, c) }
      }
    }.toDF("query_id", "neighbor_id", "cos")

    // global merge: tiny (#parts × nQueries × k rows)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    partial
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  // 8 hyperplanes → 256 buckets. Deliberately coarse: the driver-generated
  // embeddings are uniform-random (no cluster structure), so finer signatures
  // leave every bucket nearly empty and recall collapses; real embedding
  // spaces cluster and tolerate 16-64 bits with multiple tables.
  val LshBits = 8

  /** Dimensionality of the driver-generated embeddings.parquet vectors. The
    * Spark kernels derive dims from the data at runtime; SQL oracles that
    * must enumerate dimensions (k-means CTEs, plane literals) interpolate
    * THIS constant so a corpus dim change cannot silently diverge the two.
    */
  val EmbDims = 64

  /** Deterministic pseudo-random hyperplane component for (bit, dim). */
  @inline def plane(bit: Int, dim: Int): Double = {
    val h = TextAnalysis.mix64(bit.toLong * 0x9e3779b97f4a7c15L ^ dim.toLong * 0xc2b2ae3d27d4eb4fL)
    (h.toDouble / Long.MaxValue.toDouble) // in [-1, 1]
  }

  /** The hyperplane for one signature bit as a DuckDB list literal —
    * Double.toString round-trips exactly, so the oracle evaluates the SAME
    * planes and reproduces the signatures bit-for-bit.
    */
  def planeSqlList(bit: Int, dims: Int): String =
    (0 until dims).map(d => plane(bit, d).toString).mkString("[", ", ", "]")

  def lshSig(vec: Array[Float]): Int = {
    var sig = 0
    var b = 0
    while (b < LshBits) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += plane(b, d) * vec(d); d += 1 }
      if (dot >= 0) sig |= (1 << b)
      b += 1
    }
    sig
  }

  /** ANN top-k via random-hyperplane LSH with multi-probe (flip each single
    * bit): candidates share a (possibly 1-bit-off) signature bucket with the
    * query; exact cosine ranks the candidates. Recall < 1 by construction —
    * the scale path for 100 TB where brute force is off the table.
    */
  def lshTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    lshTopKOver(spark,
      emb(spark, sfDir).select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])], nQueries, k)
  }

  /** [[lshTopK]] over an arbitrary (vec_id, embedding) source. */
  def lshTopKOver(spark: SparkSession,
      all: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val queries = all.orderBy(col("vec_id")).limit(nQueries).collect()
    // query probe set: own bucket + all 1-bit flips
    val probes: Map[Int, Seq[Long]] = queries
      .flatMap { case (qid, qv) =>
        val s = lshSig(qv)
        (s +: (0 until LshBits).map(b => s ^ (1 << b))).map(sig => (sig, qid))
      }
      .groupBy(_._1).map { case (sig, xs) => sig -> xs.map(_._2).toSeq }
    val bcProbes = spark.sparkContext.broadcast(probes)
    val bcQ = spark.sparkContext.broadcast(queries.toMap)

    val scored = all.mapPartitions { it =>
      val pr = bcProbes.value
      val qm = bcQ.value
      it.flatMap { case (id, vec) =>
        pr.getOrElse(lshSig(vec), Nil).iterator
          .filter(_ != id)
          .map(qid => (qid, id, cosine(qm(qid), vec)))
      }
    }.toDF("query_id", "neighbor_id", "cos")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** IVF-Flat ANN: coarse quantizer of [[IvfLists]] centroids (the lowest
    * vec_ids, deterministic — a production build k-means-refines them, the
    * dataflow is identical), inverted lists = vectors grouped by
    * nearest-centroid (cosine, ties to the lower centroid id), queries probe
    * their [[IvfProbes]] nearest lists. The 100-TB shape: assignment is a
    * narrow map over a broadcast centroid table; candidate evaluation
    * touches only the probed lists — the corpus is never scanned per query.
    */
  val IvfLists = 16
  val IvfProbes = 4

  def ivfTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val all = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val centroids = all.filter(_._1 < IvfLists).collect().sortBy(_._1)
    val bcC = spark.sparkContext.broadcast(centroids)

    def nearest(v: Array[Float], cs: Array[(Long, Array[Float])]): Long = {
      var best = -1L
      var bestC = Double.NegativeInfinity
      cs.foreach { case (cid, cv) =>
        val c = cosine(cv, v)
        if (c > bestC) { bestC = c; best = cid }
      }
      best
    }

    // queries probe their IvfProbes nearest lists
    val queries = all.orderBy(col("vec_id")).limit(nQueries).collect()
    val probeOf: Map[Long, Seq[Long]] = queries.map { case (qid, qv) =>
      qid -> centroids.map { case (cid, cv) => (cid, cosine(cv, qv)) }
        .sortBy { case (cid, c) => (-c, cid) }.take(IvfProbes).map(_._1).toSeq
    }.toMap
    val listToQueries: Map[Long, Seq[Long]] = probeOf.toSeq
      .flatMap { case (q, ls) => ls.map(_ -> q) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    val bcProbes = spark.sparkContext.broadcast(listToQueries)
    val bcQ = spark.sparkContext.broadcast(queries.toMap)

    val scored = all.mapPartitions { it =>
      val cs = bcC.value
      val lq = bcProbes.value
      val qm = bcQ.value
      it.flatMap { case (id, vec) =>
        lq.getOrElse(nearest(vec, cs), Nil).iterator
          .filter(_ != id)
          .map(qid => (qid, id, cosine(qm(qid), vec)))
      }
    }.toDF("query_id", "neighbor_id", "cos")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  // ---- k-means-refined IVF ------------------------------------------------

  /** Lloyd iterations for the IVF coarse quantizer. Deliberately small: the
    * sandbox corpus is uniform-random (centroids barely move); the point is
    * the DATAFLOW — per-iteration cost is one narrow assignment map over a
    * broadcast K×D centroid table plus one (cid, dim) integer-sum shuffle of
    * K×D rows, exactly the shape that scales to 10^10 vectors.
    */
  val KmeansIters = 3

  /** Quantization scale for k-means arithmetic. Components are quantized to
    * floor(x · 2^20) BEFORE any aggregation so every centroid is derived from
    * exact integer sums — integer addition commutes, so the result is
    * independent of partitioning/aggregation order AND bit-reproducible by
    * the DuckDB oracle (float summation order would differ between engines).
    */
  val KmeansScale = 1048576.0

  def quantize(v: Array[Float]): Array[Long] = {
    val q = new Array[Long](v.length)
    var i = 0
    while (i < v.length) { q(i) = math.floor(v(i).toDouble * KmeansScale).toLong; i += 1 }
    q
  }

  /** Cosine between a centroid mean (exact-integer-derived doubles) and a
    * quantized vector — the assignment metric both engines evaluate
    * identically in practice. Caveat on "bit-reproducible": the INPUTS are
    * exact (integer-sum centroids), but this formula (dot/sqrt(na·nb)) and
    * DuckDB's list_cosine_similarity may differ in the last ulp; a
    * divergent assignment/rank needs two similarities within ~1 ulp, which
    * continuous random embeddings hit with negligible probability (the same
    * already-proven assumption behind the four other ANN oracles).
    */
  def cosineQ(m: Array[Double], q: Array[Long]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(m.length, q.length)
    while (i < n) {
      val a = m(i); val b = q(i).toDouble
      dot += a * b; na += a * a; nb += b * b
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Nearest centroid by [[cosineQ]], ties to the lower cid. */
  private def nearestQ(cs: Array[Array[Double]], q: Array[Long]): Int = {
    var best = 0
    var bestC = Double.NegativeInfinity
    var c = 0
    while (c < cs.length) {
      val s = cosineQ(cs(c), q)
      if (s > bestC) { bestC = s; best = c }
      c += 1
    }
    best
  }

  /** IVF-Flat with a k-means-refined coarse quantizer (the production form of
    * [[ivfTopK]]'s lowest-vec_id seeding). Lloyd's algorithm, [[KmeansIters]]
    * rounds, seeded from the [[IvfLists]] lowest vec_ids:
    *
    *   assign  — narrow map over a broadcast K×D centroid table (K·D doubles;
    *             at K=2^16, D=1024 still ≤ 0.5 GB — broadcastable)
    *   update  — per-partition partial (cid, dim) → sum/count rows, combined
    *             by an integer groupBy-sum (map-side combine, K×D result
    *             rows), collected to the driver (K×D, not O(n))
    *
    * All arithmetic the centroids derive from is exact-integer ([[quantize]]:
    * sums of floor(x·2^20) longs; the mean's single long→double rounding and
    * division are IEEE-deterministic), so the refinement is partitioning-
    * independent and the DuckDB oracle replays it bit-for-bit — empty
    * clusters deterministically keep their previous centroid. Final search =
    * [[ivfTopK]]'s probe shape over the refined lists.
    */
  /** Lloyd's centroid refinement over any (vec_id, embedding) dataset —
    * the [[ivfKmeansTopK]] training loop, factored out so [[semDedup]]
    * clusters with the identical (oracle-replayable) arithmetic. Seeds are
    * the quantized vectors of the [[IvfLists]] lowest vec_ids;
    * [[KmeansIters]] rounds of broadcast-assign + exact-integer partial
    * sums (driver holds K×D only, never O(n)).
    */
  def trainKmeans(spark: SparkSession,
      all: org.apache.spark.sql.Dataset[(Long, Array[Float])]): Array[Array[Double]] = {
    val spark2 = spark
    import spark2.implicits._
    // seed: quantized vectors of the K lowest vec_ids (count-1 means)
    var centroids: Array[Array[Double]] = all.filter(_._1 < IvfLists).collect()
      .sortBy(_._1).map { case (_, v) => quantize(v).map(_.toDouble) }
    val dims = centroids.head.length

    for (_ <- 1 to KmeansIters) {
      val bcC = spark.sparkContext.broadcast(centroids)
      // per-partition partial sums: (cid, dim, partial_sum, partial_cnt);
      // dim = -1 carries the count (cnt is per-cid, replicated per dim rows
      // would shuffle D× more). Integer sums → order-independent.
      val partials = all.mapPartitions { it =>
        val cs = bcC.value
        val sums = Array.fill(cs.length)(new Array[Long](dims))
        val cnts = new Array[Long](cs.length)
        it.foreach { case (_, v) =>
          val q = quantize(v)
          val c = nearestQ(cs, q)
          cnts(c) += 1
          var d = 0
          while (d < dims) { sums(c)(d) += q(d); d += 1 }
        }
        (0 until cs.length).iterator.flatMap { c =>
          if (cnts(c) == 0) Iterator.empty
          else Iterator.single((c, -1, cnts(c))) ++
            (0 until dims).iterator.map(d => (c, d, sums(c)(d)))
        }
      }.toDF("cid", "dim", "s")
      val rows = partials.groupBy($"cid", $"dim").agg(sum($"s").as("s"))
        .as[(Int, Int, Long)].collect()
      val cnts = new Array[Long](IvfLists)
      val sums = Array.fill(IvfLists)(new Array[Long](dims))
      rows.foreach { case (c, d, s) => if (d == -1) cnts(c) = s else sums(c)(d) = s }
      centroids = Array.tabulate(IvfLists) { c =>
        if (cnts(c) == 0) centroids(c) // empty cluster keeps its centroid
        else sums(c).map(_.toDouble / cnts(c))
      }
    }
    centroids
  }

  def ivfKmeansTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val all = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val centroids = trainKmeans(spark, all)
    val bcC = spark.sparkContext.broadcast(centroids)
    val queries = all.orderBy(col("vec_id")).limit(nQueries).collect()
    val probeOf: Map[Long, Seq[Int]] = queries.map { case (qid, qv) =>
      val q = quantize(qv)
      qid -> centroids.zipWithIndex
        .map { case (m, cid) => (cid, cosineQ(m, q)) }
        .sortBy { case (cid, s) => (-s, cid) }.take(IvfProbes).map(_._1).toSeq
    }.toMap
    val listToQueries: Map[Int, Seq[Long]] = probeOf.toSeq
      .flatMap { case (q, ls) => ls.map(_ -> q) }
      .groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    val bcProbes = spark.sparkContext.broadcast(listToQueries)
    val bcQ = spark.sparkContext.broadcast(queries.toMap)

    val scored = all.mapPartitions { it =>
      val cs = bcC.value
      val lq = bcProbes.value
      val qm = bcQ.value
      it.flatMap { case (id, vec) =>
        lq.getOrElse(nearestQ(cs, quantize(vec)), Nil).iterator
          .filter(_ != id)
          .map(qid => (qid, id, cosine(qm(qid), vec)))
      }
    }.toDF("query_id", "neighbor_id", "cos")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
  }

  /** Measured recall of the three approximate ANN paths against the exact
    * [[bruteForceTopK]] baseline: per query, the integer count of each
    * method's top-k neighbors that appear in the exact top-k. Exact
    * arithmetic end-to-end (set intersections of id lists), so the SQL
    * oracle reproduces it bit-for-bit — this turns the documented
    * "recall < 1 by construction" of the bucketed/probed paths into a
    * number the driver checks every round.
    */
  def annRecall(spark: SparkSession, sfDir: String): DataFrame = {
    val exact = bruteForceTopK(spark, sfDir)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    def hits(approx: DataFrame, name: String): DataFrame =
      approx.select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as(name))
    exact.select(col("query_id")).distinct()
      .join(hits(lshTopK(spark, sfDir), "lsh_hits"), Seq("query_id"), "left")
      .join(hits(ivfTopK(spark, sfDir), "ivf_hits"), Seq("query_id"), "left")
      .join(hits(ivfKmeansTopK(spark, sfDir), "ivf_kmeans_hits"), Seq("query_id"), "left")
      .join(hits(pqTopK(spark, sfDir), "pq_hits"), Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("lsh_hits"), lit(0L)).as("lsh_hits"),
        coalesce(col("ivf_hits"), lit(0L)).as("ivf_hits"),
        coalesce(col("ivf_kmeans_hits"), lit(0L)).as("ivf_kmeans_hits"),
        coalesce(col("pq_hits"), lit(0L)).as("pq_hits"))
  }

  // ------------------------------------------ planted-cluster recall audit

  /** Number of planted centroids in [[plantedEmb]]. */
  val PlantedClusters = 16

  /** Centroid component for (cluster, dim): a mix64-derived integer in
    * [-32, 32] over 64. Every value is a dyadic rational with denominator
    * 64, exact in BOTH float32 and float64 — the SQL oracle interpolates
    * these as double literals and reproduces the vectors bit-for-bit.
    */
  @inline def plantedCentroid(c: Int, d: Int): Double = {
    val h = TextAnalysis.mix64(
      (c.toLong + 1L) * 0x9e3779b97f4a7c15L ^ (d.toLong + 1L) * 0xc2b2ae3d27d4eb4fL)
    (Math.floorMod(h, 65L) - 32L).toDouble / 64.0
  }

  /** Per-(vec_id, dim) planted jitter: ((id·37 + d·11) mod 13 − 6) / 1024 —
    * plain modular integers over a power-of-two denominator, so the sum
    * centroid + jitter has denominator 1024 and magnitude < 1: still exact
    * in float32. Both engines evaluate the identical arithmetic.
    */
  @inline def plantedJitter(id: Long, d: Int): Double =
    ((id * 37L + d.toLong * 11L) % 13L - 6L).toDouble / 1024.0

  /** The planted centroid matrix as a DuckDB list-of-lists literal
    * (PlantedClusters × EmbDims doubles), 1-indexed as SQL lists are.
    */
  def plantedCentroidSqlList: String =
    (0 until PlantedClusters).map { c =>
      (0 until EmbDims).map(d => plantedCentroid(c, d).toString)
        .mkString("[", ", ", "]")
    }.mkString("[", ", ", "]")

  /** Deterministic CLUSTERED embedding view over the same vec_id set as
    * embeddings.parquet: vec_id's vector = centroid(vec_id mod
    * [[PlantedClusters]]) + tiny per-dimension jitter. The driver-generated
    * table is uniform-random — the one geometry where signature LSH cannot
    * beat chance (measured by [[annRecall]]: ≈1 of 10) — so this view
    * plants the cluster structure real embedding spaces have, letting the
    * recall audit show the SAME LSH kernel recovering it. Narrow map over
    * vec_id only; the parquet embedding column is never read.
    */
  def plantedEmb(spark: SparkSession, sfDir: String): org.apache.spark.sql.Dataset[(Long, Array[Float])] = {
    val spark2 = spark
    import spark2.implicits._
    emb(spark, sfDir).select(col("vec_id")).as[Long].map { id =>
      val c = (id % PlantedClusters).toInt
      val v = new Array[Float](EmbDims)
      var d = 0
      while (d < EmbDims) {
        v(d) = (plantedCentroid(c, d) + plantedJitter(id, d)).toFloat
        d += 1
      }
      (id, v)
    }.toDF("vec_id", "embedding").as[(Long, Array[Float])]
  }

  /** LSH recall on the planted-cluster view: per query, how many of the LSH
    * top-k appear in the exact top-k over the SAME vectors. The structural
    * counterpart to [[annRecall]]'s lsh_hits column — low there (uniform
    * vectors), high here (clustered vectors) — pinning that the audit
    * measures the DATA's geometry, not a kernel defect.
    */
  def annRecallPlanted(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val planted = plantedEmb(spark, sfDir).localCheckpoint(true)
    val exact = bruteForceTopKOver(spark, planted, nQueries, k)
      .select(col("query_id"), col("neighbor_id")).localCheckpoint(true)
    val lsh = lshTopKOver(spark, planted, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))
    exact.select(col("query_id")).distinct()
      .join(
        lsh.join(exact, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("lsh_hits")),
        Seq("query_id"), "left")
      .select(col("query_id"), coalesce(col("lsh_hits"), lit(0L)).as("lsh_hits"))
  }

  /** The driver-generated embeddings are random (max pairwise cosine ≈ 0.37
    * at sf0.01), so near-dup detection runs over a deterministic
    * duplicate-injected view: every 4th vector appended with tiny
    * per-dimension perturbation (cosine ≈ 0.9999, id + 100000). The
    * perturbation is double arithmetic on plain modular integers, rounded
    * to float — the exact op sequence the SQL oracle replays.
    */
  def embWithDups(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val base = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
    val perturb = udf { (id: Long, v: Seq[Float]) =>
      v.zipWithIndex.map { case (x, i) =>
        (x.toDouble + 0.001 * (((id * 131 + i) % 1000) / 1000.0)).toFloat
      }
    }
    base.unionByName(
      base.filter(col("vec_id") % 4 === 0)
        .select((col("vec_id") + 100000L).as("vec_id"),
          perturb(col("vec_id"), col("embedding")).as("embedding")))
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, LSH-bucketed so no
    * all-pairs comparison happens (bucket + 1-bit neighbors catch high-cosine
    * pairs with high probability).
    */
  /** Bucket cap for the embedding-LSH dup site (see Dedup.capDropStats). */
  val EmbDupMaxBucket = 500

  /** The embedding-LSH candidate keying (own signature + 1-bit flips) —
    * shared by [[embeddingDupPairs]] and the cap-drop audit.
    */
  private[pipeline] def embKeyed(spark: SparkSession, sfDir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    embWithDups(spark, sfDir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, v) =>
        val s = lshSig(v)
        (s +: (0 until LshBits).map(b => s ^ (1 << b))).map(key => (key, id, v))
      }.toDF("key", "vec_id", "embedding")
  }

  def embeddingDupPairs(spark: SparkSession, sfDir: String,
      threshold: Double = 0.95): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val keyed = embKeyed(spark, sfDir)
    // cap bounds the aggregation itself (see Dedup.minhashPairs): rank
    // window before the group — full vectors never pile up un-capped in a
    // single collect_list task
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("vec_id"))
    val grouped = keyed
      .withColumn("rn", row_number().over(wb))
      .filter(col("rn") <= EmbDupMaxBucket)
      .groupBy(col("key"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("embedding")))).as("members"))
      .filter(size(col("members")) > 1)
    grouped.select(col("members")).as[Seq[(Long, Array[Float])]]
      .flatMap { ms =>
        for {
          i <- ms.indices.iterator
          j <- (i + 1) until ms.length
          if cosine(ms(i)._2, ms(j)._2) >= threshold
        } yield (ms(i)._1, ms(j)._1)
      }
      .toDF("vec_a", "vec_b")
      .distinct()
  }

  // --------------------------------------------------------- SemDeDup

  /** Cosine of two quantized vectors — double accumulation over the exact
    * Long components, the value DuckDB's list_cosine_similarity computes
    * on CAST(q AS DOUBLE[]) (same ulp caveat as [[cosineQ]]; the injected
    * dups sit at ≈ 0.9999 and uniform pairs at ≈ 0, so the 0.95 threshold
    * is never within float noise of a pair).
    */
  def cosineQQ(a: Array[Long], b: Array[Long]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Per-cluster member cap for [[semDedup]] (the Dedup.capDropStats
    * pattern: bounds the one collect_list so a degenerate cluster cannot
    * blow up a task; at K·cap ≥ N it never engages).
    */
  val SemMaxCluster = 5000

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication" — public): k-means the
    * embedding space, then compare pairs ONLY within a cluster and drop
    * all but one member of each semantic-duplicate relation. Clustering
    * is what makes web-scale semantic dedup tractable — pairwise work is
    * (N/K)² per cluster, never N².
    *
    * Deterministic keeper rule: a vector is dropped iff a LOWER vec_id in
    * its cluster is within the cosine threshold (the paper elects by
    * distance-to-centroid; that comparison sits inside float noise for
    * near-identical copies, so this engine uses the id total order — same
    * dataflow, tie-free in both engines). Runs over the dup-injected view
    * ([[embWithDups]]); training/assignment reuse [[trainKmeans]]'s
    * exact-integer arithmetic, so the DuckDB oracle replays the clusters
    * bit-for-bit. Returns (vec_id, cid, kept).
    *
    * Scale shape: assignment is a narrow map over broadcast K×D; the only
    * wide op is one cid-keyed aggregation whose groups the cap bounds.
    */
  def semDedup(spark: SparkSession, sfDir: String,
      threshold: Double = 0.95, maxCluster: Int = SemMaxCluster): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val all = embWithDups(spark, sfDir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val centroids = trainKmeans(spark, all)
    val bcC = spark.sparkContext.broadcast(centroids)
    val assigned = all.map { case (id, v) =>
      val q = quantize(v)
      (id, nearestQ(bcC.value, q), q)
    }.toDF("vec_id", "cid", "q")
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cid")).orderBy(col("vec_id"))
    val ranked = assigned.withColumn("rn", row_number().over(wb))
    // rows past the cap are UNCOMPARED, not dropped: a skewed cluster must
    // degrade recall (kept=1 for its overflow), never lose vectors from the
    // output — the cap exists to bound the one collect_list below
    val overflow = ranked.filter(col("rn") > maxCluster)
      .select(col("vec_id"), col("cid").cast("long").as("cid"), lit(1L).as("kept"))
    ranked
      .filter(col("rn") <= maxCluster)
      .groupBy(col("cid"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("q")))).as("members"))
      .select(col("cid"), col("members")).as[(Int, Seq[(Long, Array[Long])])]
      .flatMap { case (cid, ms) =>
        ms.indices.iterator.map { i =>
          val (id, qi) = ms(i)
          var dup = false
          var j = 0
          while (j < i && !dup) {
            if (cosineQQ(ms(j)._2, qi) >= threshold) dup = true
            j += 1
          }
          (id, cid.toLong, if (dup) 0L else 1L)
        }
      }
      .toDF("vec_id", "cid", "kept")
      .unionByName(overflow)
  }

  // ------------------------------------ product-quantization (PQ) ANN

  /** PQ layout (Jégou et al. 2011, "Product Quantization for Nearest
    * Neighbor Search" — public): [[EmbDims]] splits into [[PqSubspaces]]
    * contiguous subspaces of [[PqSubDims]] dims; each learns a
    * [[PqK]]-entry codebook, so a vector compresses to 4 small codes and
    * query scoring is table lookups (ADC) instead of full-vector math.
    */
  val PqSubspaces = 4
  val PqSubDims: Int = EmbDims / PqSubspaces
  val PqK = 16
  val PqIters = 4

  /** Squared L2 between quantized subvector `q[off..off+n)` and codebook
    * row `m` — pure Long arithmetic (components ≤ 2^21 ⇒ the 16-term sum
    * ≤ 2^48, overflow-safe).
    */
  def pqDist(q: Array[Long], off: Int, m: Array[Long]): Long = {
    var s = 0L
    var i = 0
    while (i < m.length) {
      val d = q(off + i) - m(i)
      s += d * d
      i += 1
    }
    s
  }

  private def pqNearest(book: Array[Array[Long]], q: Array[Long], off: Int): Int = {
    var best = 0
    var bestD = Long.MaxValue
    var c = 0
    while (c < book.length) {
      val d = pqDist(q, off, book(c))
      if (d < bestD) { bestD = d; best = c } // strict < ⇒ ties keep lower cid
      c += 1
    }
    best
  }

  /** Per-subspace integer Lloyd: seeds are the [[PqK]] lowest vec_ids'
    * quantized subvectors; assignment is exact integer squared-L2 (ties to
    * the lower centroid id); the update floors the exact integer
    * component sums (`s div cnt`), so every codebook entry stays a Long
    * and the whole training run is bit-replayable by the oracle's
    * unrolled SQL — the ivf-k-means integer-oracle pattern with division
    * moved INSIDE the loop (centroids re-quantize every round instead of
    * staying rational). All [[PqSubspaces]] books train in the same
    * [[PqIters]] distributed passes (subspace is just another key of the
    * partial-sum aggregation). Returns [sub][cid][dim].
    */
  def trainPqCodebooks(spark: SparkSession,
      all: org.apache.spark.sql.Dataset[(Long, Array[Float])]): Array[Array[Array[Long]]] = {
    val spark2 = spark
    import spark2.implicits._
    val m = PqSubspaces
    val sd = PqSubDims
    var books: Array[Array[Array[Long]]] = {
      val seeds = all.filter(_._1 < PqK).collect().sortBy(_._1)
        .map { case (_, v) => quantize(v) }
      Array.tabulate(m)(s => seeds.map(q => q.slice(s * sd, (s + 1) * sd)))
    }
    for (_ <- 1 to PqIters) {
      val bcB = spark.sparkContext.broadcast(books)
      val rows = all.mapPartitions { it =>
        val bs = bcB.value
        val sums = Array.fill(m, PqK)(new Array[Long](sd))
        val cnts = Array.fill(m)(new Array[Long](PqK))
        it.foreach { case (_, v) =>
          val q = quantize(v)
          var s = 0
          while (s < m) {
            val c = pqNearest(bs(s), q, s * sd)
            cnts(s)(c) += 1
            var d = 0
            while (d < sd) { sums(s)(c)(d) += q(s * sd + d); d += 1 }
            s += 1
          }
        }
        (for (s <- (0 until m).iterator; c <- (0 until PqK).iterator
              if cnts(s)(c) > 0)
          yield Iterator.single((s, c, -1, cnts(s)(c))) ++
            (0 until sd).iterator.map(d => (s, c, d, sums(s)(c)(d)))).flatten
      }.toDF("sub", "cid", "dim", "s")
        .groupBy($"sub", $"cid", $"dim").agg(sum($"s").as("s"))
        .as[(Int, Int, Int, Long)].collect()
      val cnts = Array.fill(m)(new Array[Long](PqK))
      val sums = Array.fill(m, PqK)(new Array[Long](sd))
      rows.foreach { case (s, c, d, v) =>
        if (d == -1) cnts(s)(c) = v else sums(s)(c)(d) = v
      }
      books = Array.tabulate(m, PqK) { (s, c) =>
        if (cnts(s)(c) == 0) books(s)(c) // empty cluster keeps its codeword
        else sums(s)(c).map(x => Math.floorDiv(x, cnts(s)(c)))
      }
    }
    books
  }

  /** PQ top-k by asymmetric distance (ADC): every vector is encoded ONCE
    * to [[PqSubspaces]] codes against the broadcast codebooks; each query
    * precomputes its [[PqSubspaces]]×[[PqK]] distance table; a candidate's
    * score is [[PqSubspaces]] table lookups summed — exact integers end to
    * end, ranked (distance asc, vec_id asc), self excluded. Scale shape:
    * the model is (M·K·subdims) longs broadcast; the scan touches codes,
    * not vectors; per-partition bounded heaps → tiny global merge, the
    * bruteForceTopK shell with lookups replacing the dot products.
    */
  def pqTopK(spark: SparkSession, sfDir: String,
      nQueries: Int = 20, k: Int = 10): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val all = emb(spark, sfDir).select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
    val books = trainPqCodebooks(spark, all)
    val queries = all.orderBy(col("vec_id")).limit(nQueries).collect()
    val dts: Array[(Long, Array[Array[Long]])] = queries.map { case (qid, qv) =>
      val q = quantize(qv)
      qid -> Array.tabulate(PqSubspaces, PqK)((s, c) =>
        pqDist(q, s * PqSubDims, books(s)(c)))
    }
    val bcB = spark.sparkContext.broadcast(books)
    val bcDt = spark.sparkContext.broadcast(dts)

    val partial = all.mapPartitions { it =>
      val bs = bcB.value
      val qs = bcDt.value
      // bounded max-heaps: evict the largest distance (ties: larger id)
      val heaps = qs.map(_ => new java.util.PriorityQueue[(Long, Long)](
        k + 1, Ordering.by[(Long, Long), (Long, Long)](t => (-t._1, -t._2))))
      it.foreach { case (id, vec) =>
        val q = quantize(vec)
        val codes = Array.tabulate(PqSubspaces)(s => pqNearest(bs(s), q, s * PqSubDims))
        var qi = 0
        while (qi < qs.length) {
          val (qid, dt) = qs(qi)
          if (qid != id) {
            var d = 0L
            var s = 0
            while (s < PqSubspaces) { d += dt(s)(codes(s)); s += 1 }
            val h = heaps(qi)
            h.add((d, id))
            if (h.size > k) h.poll(): Unit
          }
          qi += 1
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        import scala.jdk.CollectionConverters._
        val qid = qs(qi)._1
        h.iterator().asScala.map { case (d, id) => (qid, id, d) }
      }
    }.toDF("query_id", "neighbor_id", "dist")

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("dist").asc, col("neighbor_id").asc)
    partial
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("dist").as("dist_q"))
  }
}
