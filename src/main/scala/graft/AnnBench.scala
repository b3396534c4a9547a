package graft

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ANN recall/cost evidence (VERDICT r4 #4): recall@k of the LSH-bucketed
  * top-k against the exact brute-force baseline on the real embeddings
  * table, plus the SCALE-relevant cost measure — candidate pairs scored.
  *
  * Wall time at a 2k-row corpus is scheduling noise; what decides the
  * 100 TB story is how many cosine evaluations the bucket join admits
  * versus brute force's |Q|×|C|. `candidate_frac` is that ratio: the
  * fraction of the exact cross product the LSH plan actually scores
  * (bucket-join hits before dedup, per the multi-table explode).
  *
  * Run `sbt "runMain graft.AnnBench sweep"` to re-derive the tuned
  * (planes, tables) point; the defaults in [[Similarity.lshTopK]] are the
  * recorded sweep's knee (recall ≥ 0.9 at the lowest candidate_frac).
  */
object AnnBench {

  final case class Point(planes: Int, tables: Int, recall: Double,
                         candidateFrac: Double, scoredFrac: Double,
                         secLsh: Double)

  def measure(spark: SparkSession, sfDir: String, k: Int,
              nQueries: Int, planes: Int, tables: Int): Point =
    measureDf(spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")), k, nQueries, planes, tables)

  def measureDf(embIn: org.apache.spark.sql.DataFrame, k: Int,
                nQueries: Int, planes: Int, tables: Int): Point = {
    val emb = embIn
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)
    val brute = Similarity.bruteForceTopK(emb, queries, "embedding", "vec_id", k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val t0 = System.nanoTime()
    val lsh = Similarity.lshTopK(emb, queries, "embedding", "vec_id", k,
      numPlanes = planes, numTables = tables)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val secLsh = (System.nanoTime() - t0) / 1e9

    // candidate pairs the bucket join ADMITS (pre-dedup row traffic) and
    // the DISTINCT pairs actually scored (cosine evaluations after the
    // pre-score dedup — since r6 lshTopK distincts ids BEFORE the cosine,
    // so a pair co-hitting in many of the L tables is scored once) — both
    // vs brute force's |Q| × (|C|-1) scored pairs
    val candidates = Similarity.lshCandidates(emb, queries,
      "embedding", "vec_id", planes, tables)
    val scoredPairs = Similarity.lshScoredPairs(emb, queries,
      "embedding", "vec_id", planes, tables)
    val bruteCost = brute.map(_._1).size.toLong * (n - 1)
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    emb.unpersist()
    Point(planes, tables, recall, candidates.toDouble / bruteCost,
      scoredPairs.toDouble / bruteCost, secLsh)
  }

  // ---- clustered-regime corpus (deterministic, no external data) ----------
  //
  // The sf embeddings are near-isotropic (measured top-10 neighbor cosine
  // ≈ 0.35 vs ~0.5/plane collision for random pairs), the worst case for
  // sign-LSH — no sublinear method separates neighbors there, and recall
  // ≥ 0.9 costs candidate_frac ≥ 1 (brute force is simply the right
  // operator at that geometry and scale; bruteForceTopK is the labeled
  // baseline for exactly this reason). The regime lshTopK EXISTS for is a
  // corpus with genuine near-neighbor structure (near-dup embeddings,
  // cluster structure): this synthesizes one — unit cluster centers with
  // 11 members each at pairwise cosine ≈ 0.90 — where recall ≥ 0.9 is
  // reachable at ~5% of brute cost, the sublinear story that scales.

  /** Deterministic pseudo-gaussian (sum of 4 hashed uniforms, Irwin-Hall
    * scaled to unit variance). */
  private def g(seed: Long, i: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < 4) {
      val h = graft.core.XxHash64.hashLong(seed, i.toLong * 4 + j + 0x51bdL)
      s += java.lang.Long.remainderUnsigned(h, 1000000L) / 1000000.0 - 0.5
      j += 1
    }
    s * math.sqrt(3.0)
  }

  /** Member `member` of cluster `cluster`: unit center + σ·unit-noise,
    * σ=0.33 ⇒ member-member cosine ≈ 1/(1+σ²) ≈ 0.90. */
  def clusteredVec(cluster: Long, member: Int, dim: Int): Array[Float] = {
    val c = Array.tabulate(dim)(d => g(cluster, d))
    val z = Array.tabulate(dim)(d => g(cluster * 131071L + member + 7L, d))
    val cn = math.sqrt(c.map(x => x * x).sum)
    val zn = math.sqrt(z.map(x => x * x).sum)
    Array.tabulate(dim)(d => (c(d) / cn + 0.33 * z(d) / zn).toFloat)
  }

  /** The clustered-regime block: 50k vectors in 11-member clusters, so a
    * query's true top-10 are exactly its siblings. */
  def clusteredJson(spark: SparkSession): String = {
    val dim = 64; val m = 11; val nClusters = 4546; val nQ = 50; val k = 10
    val planes = 8; val tables = 12
    val vecUdf = udf((id: Long) => clusteredVec(id / m, (id % m).toInt, dim))
    val emb = spark.range(m.toLong * nClusters)
      .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
    val p = measureDf(emb, k, nQ, planes, tables)
    s"""{"n":${m * nClusters},"dim":$dim,"cluster_size":$m,""" +
      s""""sibling_cos":0.90,"planes":$planes,"tables":$tables,""" +
      s""""recall_at_$k":${f"${p.recall}%.3f"},""" +
      s""""candidate_frac_vs_brute":${f"${p.candidateFrac}%.4f"},""" +
      s""""scored_frac_vs_brute":${f"${p.scoredFrac}%.4f"}}"""
  }

  /** ANN growth curve (VERDICT r6 #4): the clustered-regime corpus at 1×
    * and 10×, fixed 50 queries — candidates, scored pairs, recall and
    * wall at both sizes, so the "never O(n²)" claim for similarity
    * search is measured, not argued. With fixed queries, brute cost is
    * linear in the corpus by definition; the LSH path's candidate and
    * scored counts must track it near-linearly (the *_frac_vs_brute
    * ratios staying flat IS ≤-linear growth). */
  def scalingJson(spark: SparkSession): String = {
    val dim = 64; val m = 11; val nQ = 50; val k = 10
    val planes = 8; val tables = 12
    def at(nClusters: Int): Point = {
      val vecUdf = udf((id: Long) => clusteredVec(id / m, (id % m).toInt, dim))
      val emb = spark.range(m.toLong * nClusters)
        .select(col("id").as("vec_id"), vecUdf(col("id")).as("embedding"))
      measureDf(emb, k, nQ, planes, tables)
    }
    val small = at(455)   //  5 005 vectors
    val big = at(4550)    // 50 050 vectors
    // frac ratios vs the linear brute baseline: ~1.0 = linear candidates
    val candRatio = big.candidateFrac / small.candidateFrac
    val scoredRatio = big.scoredFrac / small.scoredFrac
    s"""{"n":[${m * 455},${m * 4550}],"queries":$nQ,"planes":$planes,""" +
      s""""tables":$tables,""" +
      s""""recall_at_$k":[${f"${small.recall}%.3f"},${f"${big.recall}%.3f"}],""" +
      s""""candidate_frac_vs_brute":[${f"${small.candidateFrac}%.4f"},${f"${big.candidateFrac}%.4f"}],""" +
      s""""scored_frac_vs_brute":[${f"${small.scoredFrac}%.4f"},${f"${big.scoredFrac}%.4f"}],""" +
      s""""frac_ratio_10x":{"candidates":${f"$candRatio%.2f"},""" +
      s""""scored":${f"$scoredRatio%.2f"}},""" +
      s""""lsh_sec":[${f"${small.secLsh}%.1f"},${f"${big.secLsh}%.1f"}],""" +
      s""""note":"brute cost is linear in corpus at fixed queries; flat frac = <=linear candidate growth"}"""
  }

  /** One JSON block for the bench: the tuned default point + the brute
    * baseline time, on the given sf dir. */
  def json(spark: SparkSession, sfDir: String): String = {
    val k = 10
    val nQ = 50
    val t0 = System.nanoTime()
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < nQ)
    val nBrute = Similarity.bruteForceTopK(
      emb, queries, "embedding", "vec_id", k).count()
    val secBrute = (System.nanoTime() - t0) / 1e9
    val p = measure(spark, sfDir, k, nQ,
      Similarity.DefaultPlanes, Similarity.DefaultTables)
    val real =
      s"""{"k":$k,"queries":$nQ,"brute_pairs_sec":${f"$secBrute%.2f"},""" +
        s""""brute_rows":$nBrute,"planes":${p.planes},"tables":${p.tables},""" +
        s""""recall_at_$k":${f"${p.recall}%.3f"},""" +
        s""""candidate_frac_vs_brute":${f"${p.candidateFrac}%.4f"},""" +
        s""""scored_frac_vs_brute":${f"${p.scoredFrac}%.4f"},""" +
        s""""lsh_sec":${f"${p.secLsh}%.2f"},""" +
        s""""note":"near-isotropic corpus (neighbor cos ~0.35): recall>=0.9 costs frac>=1 here; brute is the right operator at this geometry+scale"}"""
    s"""{"real":$real,"clustered":${clusteredJson(spark)},""" +
      s""""ann_scaling":${scalingJson(spark)}}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-annbench")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.headOption.contains("sweep")) {
      // optional grid override: sweep <planesCsv> <tablesCsv>
      val planesGrid = args.lift(1).map(_.split(',').map(_.toInt).toSeq)
        .getOrElse(Seq(3, 4, 5, 6, 8))
      val tablesGrid = args.lift(2).map(_.split(',').map(_.toInt).toSeq)
        .getOrElse(Seq(4, 8, 16, 24))
      for {
        planes <- planesGrid
        tables <- tablesGrid
      } {
        val p = measure(spark, sfDir, k = 10, nQueries = 50, planes, tables)
        println(f"[ann] planes=$planes%2d tables=$tables%2d " +
          f"recall=${p.recall}%.3f cand_frac=${p.candidateFrac}%.4f " +
          f"scored_frac=${p.scoredFrac}%.4f sec=${p.secLsh}%.1f")
      }
    } else println(json(spark, sfDir))
    spark.stop()
  }
}
