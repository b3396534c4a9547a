package graft.frontier

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The seen-filter sharded by url_hash range — the north-rule capacity
  * path ("sustains a 10^10-entry frontier by sharding the seen-filter
  * across executors and merging deltas at round boundaries").
  *
  * A single Bloom tops out near 1.8e9 expected items (fpp 1%) at the JVM's
  * 2 GB array limit; 10^10 needs ~12 GB of filter. The sharded layout is
  * S = 2^k independent [[BloomSeen]] filters, each owning one RANGE of the
  * unsigned url_hash space (shard = top k bits), so:
  *
  *  - capacity scales to any S × shard size;
  *  - the per-round delta build is ONE distributed aggregation grouped by
  *    the shard key (S final rows, built map-side combined on executors —
  *    the driver only ever sees S finished bitsets, never raw hashes);
  *  - round-boundary merge is a per-shard bitwise OR;
  *  - the probe ships as one broadcast of the shard array and reads
  *    exactly one shard's cache lines per row (native codegen'd
  *    expression, same as the single-filter probe);
  *  - on a real cluster each executor holds the full (broadcast) shard
  *    array once; a memory-constrained deployment can instead map shard →
  *    executor affinity by repartitioning probes on the shard key — the
  *    layout supports it because shard id is a pure function of the hash.
  *
  * S = 1 degenerates to exactly the single-filter engine (same geometry,
  * same file format), so local runs and existing snapshots are unchanged.
  */
object ShardedBloom {

  /** Per-shard filter size cap. Default 256 MB (a comfortable broadcast);
    * the system property exists so tests can force multi-shard geometry
    * at tiny scale. */
  val DefaultMaxShardBytes: Long = 256L << 20
  def maxShardBytes: Long = sys.props.get("graft.bloom.maxShardBytes")
    .map(_.toLong).getOrElse(DefaultMaxShardBytes)

  /** Smallest power-of-two shard count whose per-shard filter fits
    * [[maxShardBytes]]. */
  def numShardsFor(expectedItems: Long, fpp: Double = 0.01): Int = {
    val (bits, _) = BloomSeen.geometry(expectedItems, fpp)
    val bytes = 8L + bits / 8
    var s = 1
    while (bytes / s > maxShardBytes) s *= 2
    s
  }

  @inline def shardOf(h: Long, numShards: Int): Int =
    if (numShards == 1) 0
    else (h >>> (64 - Integer.numberOfTrailingZeros(numShards))).toInt

  def perShardExpected(expectedItems: Long, numShards: Int): Long =
    math.max(1L, expectedItems / numShards)

  def empty(expectedItems: Long, fpp: Double = 0.01,
            numShards: Int = 1): Array[Array[Byte]] =
    Array.fill(numShards)(
      BloomSeen.empty(perShardExpected(expectedItems, numShards), fpp))

  def put(shards: Array[Array[Byte]], v: Long): Unit =
    BloomSeen.put(shards(shardOf(v, shards.length)), v)

  def mightContain(shards: Array[Array[Byte]], v: Long): Boolean =
    BloomSeen.mightContain(shards(shardOf(v, shards.length)), v)

  /** In-place per-shard OR-merge (same shard count + geometry required). */
  def mergeInto(acc: Array[Array[Byte]],
                other: Array[Array[Byte]]): Array[Array[Byte]] = {
    require(acc.length == other.length,
      s"shard count mismatch: ${acc.length} vs ${other.length}")
    var i = 0
    while (i < acc.length) { BloomSeen.mergeInto(acc(i), other(i)); i += 1 }
    acc
  }

  /** Shard id as column algebra over the hash column (must agree with
    * [[shardOf]]). */
  def shardCol(hashCol: org.apache.spark.sql.Column,
               numShards: Int): org.apache.spark.sql.Column =
    if (numShards == 1) lit(0)
    else shiftrightunsigned(hashCol,
      64 - Integer.numberOfTrailingZeros(numShards)).cast("int")

  /** Distributed build: ONE aggregation grouped by shard (partial
    * map-side build per shard per partition, tree-merged), plus the row
    * count in the same job. Absent shards come back as empty filters with
    * identical geometry so merges stay well-defined. */
  def buildShardsWithCount(df: DataFrame, hashColName: String,
                           expectedItems: Long, numShards: Int,
                           fpp: Double = 0.01): (Array[Array[Byte]], Long) = {
    val agg = BloomSeen.bloomBuildUdaf(
      perShardExpected(expectedItems, numShards), fpp)
    val rows = df
      .groupBy(shardCol(col(hashColName), numShards).as("s"))
      .agg(agg(col(hashColName)).as("b"), count(lit(1)).as("n"))
      .collect()
    val out = empty(expectedItems, fpp, numShards)
    var total = 0L
    rows.foreach { r =>
      if (!r.isNullAt(1)) out(r.getInt(0)) = r.getAs[Array[Byte]](1)
      total += r.getLong(2)
    }
    (out, total)
  }

  /** Probe column: native codegen'd expression over the broadcast shard
    * array — see [[graft.expressions.UrlExpressions.ShardedBloomMightContain]]. */
  def mightContainCol(
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]],
      hashCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.expressions.UrlExpressions.shardedBloomProbe(bc, hashCol)
}
