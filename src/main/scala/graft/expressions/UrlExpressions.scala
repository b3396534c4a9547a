package graft.expressions

import graft.core.{UrlCanon, XxHash64}
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the engine's hottest scalar kernels —
  * the per-link url/host hashing on the frontier-expansion path. A Scala
  * UDF here pays per-row encoder boxing and breaks WholeStageCodegen; a
  * native `UnaryExpression` with `doGenCode` emits a direct static call
  * inside the generated loop (SURVEY.md §2.10 preference order: built-in >
  * native Expression > UDF).
  *
  * All three delegate to the same pure-Scala kernels
  * ([[graft.core.XxHash64]], [[graft.core.UrlCanon]]) used by the oracle
  * simulator, so engine/oracle identity is preserved bit-for-bit.
  */
object UrlExpressions {

  /** xxhash64 of the UTF-8 string — `url_hash`'s definition. */
  case class UrlHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    // Spark 4: null-intolerance is a method, not a marker trait
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_url_hash"

    // single kernel shared with interpreted eval and codegen
    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(
        XxHash64.hash(v.asInstanceOf[UTF8String].getBytes))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.core.XxHash64.hash($c.getBytes(), 0L)")

    override protected def withNewChildInternal(c: Expression): UrlHash64 =
      copy(child = c)
  }

  /** Second, independent 64-bit url hash (`url_hash2`): xxhash64 of the
    * UTF-8 string under a fixed non-zero seed. The seen-confirm join
    * matches on the (url_hash, url_hash2) PAIR — at the 10^10-URL design
    * point a single 64-bit key expects ~2.7 collisions (each one a novel
    * URL silently "confirmed seen" and never crawled); the 128-bit pair
    * pushes that to ~10^-19. Only `seen_delta` carries the extra column —
    * the frontier schema is unchanged.
    *
    * The ~10^-19 figure assumes the two hashes are independent, which
    * holds for RANDOM/ORGANIC url bytes but not adversarial ones: XXH64's
    * seed only perturbs the initial accumulators, and seed-independent
    * collisions are known to be constructible. A crawl whose threat model
    * includes attacker-crafted colliding URLs should derive url_hash2
    * from a structurally different hash (e.g. SipHash with a secret key)
    * — a one-line swap here; the non-adversarial assumption is the
    * documented default. */
  val Hash2Seed: Long = 0x9E3779B97F4A7C15L

  case class UrlHash64B(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_url_hash2"

    override def nullSafeEval(v: Any): Any =
      java.lang.Long.valueOf(
        XxHash64.hash(v.asInstanceOf[UTF8String].getBytes, Hash2Seed))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.core.XxHash64.hash($c.getBytes(), ${Hash2Seed}L)")

    override protected def withNewChildInternal(c: Expression): UrlHash64B =
      copy(child = c)
  }

  /** Lower-cased host of a URL (frontier `host` column). */
  case class UrlHost(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_url_host"

    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(UrlCanon.host(v.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        "org.apache.spark.unsafe.types.UTF8String.fromString(" +
          s"graft.core.UrlCanon.host($c.toString()))")

    override protected def withNewChildInternal(c: Expression): UrlHost =
      copy(child = c)
  }

  /** Host bucket of a URL (0..numBuckets-1): the frontier/pages co-location
    * key. Folds the former hostBucketUdf into the native-expression family
    * so the pages-side bucket derivation stays inside WholeStageCodegen. */
  case class UrlHostBucket(child: Expression, numBuckets: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_host_bucket"

    override def nullSafeEval(v: Any): Any =
      java.lang.Integer.valueOf(
        UrlCanon.hostBucket(v.asInstanceOf[UTF8String].toString, numBuckets))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.core.UrlCanon.hostBucket($c.toString(), $numBuckets)")

    override protected def withNewChildInternal(c: Expression): UrlHostBucket =
      copy(child = c)
  }

  /** robots.txt gate as a native expression (T3): prefix-match of the
    * url's path+query against the host's Disallow rules. The rule map is a
    * plan-level reference object (shipped once per task in the codegen
    * references, not per row) — replaces the per-row Scala UDF the round
    * used to put on the hottest path. A rules TABLE too large for the plan
    * would become a broadcast join instead; the reference's rule sets are
    * per-host handfuls. */
  case class RobotsAllowed(child: Expression,
                           byHost: Map[String, Vector[String]])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_robots_allowed"

    override def nullSafeEval(v: Any): Any =
      java.lang.Boolean.valueOf(
        graft.core.Robots.isAllowed(byHost, v.asInstanceOf[UTF8String].toString))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val mapRef = ctx.addReferenceObj("robotsByHost", byHost,
        "scala.collection.immutable.Map")
      defineCodeGen(ctx, ev, c =>
        s"graft.core.Robots.isAllowed($mapRef, $c.toString())")
    }

    override protected def withNewChildInternal(c: Expression): RobotsAllowed =
      copy(child = c)
  }

  /** Bloom-filter probe against a TorrentBroadcast-shipped filter as a
    * native expression. This sits on the two hottest per-row paths in the
    * engine — every discovered link (seen pre-filter) and the above-gate
    * pages scan (selected-slice runtime filter) — where the former Scala
    * UDF paid per-row boxing and broke WholeStageCodegen. The broadcast
    * handle rides in the codegen references (shipped once per executor by
    * TorrentBroadcast, never per task binary); the byte[] is unwrapped
    * once per task into mutable state, so the per-row cost is exactly the
    * k probe loads. */
  case class BloomMightContain(
      child: Expression,
      bloomBc: org.apache.spark.broadcast.Broadcast[Array[Byte]])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_bloom_might_contain"

    override def nullSafeEval(v: Any): Any =
      java.lang.Boolean.valueOf(
        graft.frontier.BloomSeen.mightContain(
          bloomBc.value, v.asInstanceOf[Long]))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("graftBloomBc", bloomBc,
        "org.apache.spark.broadcast.Broadcast")
      val bytes = ctx.addMutableState("byte[]", "graftBloomBytes",
        v => s"$v = (byte[]) $bcRef.value();")
      defineCodeGen(ctx, ev, c =>
        s"graft.frontier.BloomSeen.mightContain($bytes, $c)")
    }

    override protected def withNewChildInternal(c: Expression): BloomMightContain =
      copy(child = c)
  }

  /** Column wrapper for [[BloomMightContain]]. Goes through
    * `classic.ExpressionUtils.column` directly (not the function registry):
    * the probe binds to a specific broadcast per call site, and one round
    * holds two live blooms at once (selected-slice filter + cumulative
    * seen), so name-based registration would race plan analysis. */
  def bloomProbe(bloomBc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
                 hashCol: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      BloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hashCol),
        bloomBc))

  /** [[BloomMightContain]]'s sharded sibling: probes the url_hash-range
    * shard array ([[graft.frontier.ShardedBloom]]) — one shard-index
    * computation + k probe loads per row, inside WholeStageCodegen. */
  case class ShardedBloomMightContain(
      child: Expression,
      shardsBc: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]])
      extends UnaryExpression {
    override def dataType: DataType = BooleanType
    override def nullIntolerant: Boolean = true
    override def prettyName: String = "graft_sharded_bloom_might_contain"

    override def nullSafeEval(v: Any): Any =
      java.lang.Boolean.valueOf(
        graft.frontier.ShardedBloom.mightContain(
          shardsBc.value, v.asInstanceOf[Long]))

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("graftShardsBc", shardsBc,
        "org.apache.spark.broadcast.Broadcast")
      val shards = ctx.addMutableState("byte[][]", "graftBloomShards",
        v => s"$v = (byte[][]) $bcRef.value();")
      defineCodeGen(ctx, ev, c =>
        s"graft.frontier.ShardedBloom.mightContain($shards, $c)")
    }

    override protected def withNewChildInternal(c: Expression): ShardedBloomMightContain =
      copy(child = c)
  }

  def shardedBloomProbe(
      shardsBc: org.apache.spark.broadcast.Broadcast[Array[Array[Byte]]],
      hashCol: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ShardedBloomMightContain(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(hashCol),
        shardsBc))

  // Column-API wrappers (Spark 4: Column.apply over an expression goes
  // through the internal API; expr-string via session registry is the
  // public route, so we register and call by name)
  def urlHash(c: Column): Column =
    org.apache.spark.sql.functions.expr(s"graft_url_hash(${c.toString})")

  /** Register into a session's function registry (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_url_hash",
      exprs => UrlHash64(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_url_hash2",
      exprs => UrlHash64B(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_url_host",
      exprs => UrlHost(exprs.head), "scala_udf")
  }

  /** Register the host-bucket function for a given bucket count. */
  def registerHostBucket(spark: SparkSession, numBuckets: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_host_bucket", exprs => UrlHostBucket(exprs.head, numBuckets),
      "scala_udf")

  /** Register the robots gate bound to this run's rule map. */
  def registerRobots(spark: SparkSession,
                     byHost: Map[String, Vector[String]]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_robots_allowed", exprs => RobotsAllowed(exprs.head, byHost),
      "scala_udf")
}

/** Session extension: injects the engine's native functions at session
  * build time (`.withExtensions(new GraftExtensions)`) so plain SQL can
  * call them — the SparkSessionExtensions integration point for the
  * engine's custom-expression surface. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_url_hash"),
      new ExpressionInfo(classOf[UrlExpressions.UrlHash64].getName,
        "graft_url_hash"),
      (exprs: Seq[Expression]) => UrlExpressions.UrlHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_url_host"),
      new ExpressionInfo(classOf[UrlExpressions.UrlHost].getName,
        "graft_url_host"),
      (exprs: Seq[Expression]) => UrlExpressions.UrlHost(exprs.head)))
  }
}
