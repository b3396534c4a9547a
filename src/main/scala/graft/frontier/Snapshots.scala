package graft.frontier

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-style snapshot layout over Parquet (SURVEY.md §7.0: no Iceberg
  * jars ship in this sandbox, so we implement the same *semantics* — atomic
  * snapshot commit, parent lineage, time-travel to round k, resumability —
  * as a directory protocol; swapping in real Iceberg is a sink change):
  *
  * {{{
  * warehouse/
  *   snap-00000/
  *     frontier/      pending FrontierEntry rows (Parquet)
  *     seen_delta/    url hashes first enqueued this round (Parquet)
  *     posts/ replies/ comments/ tieba_names/ fetch_log/   per-round item deltas
  *     bloom.bin      cumulative Bloom bytes as of this round
  *     manifest.json  COMMIT MARKER — written last; a snapshot without a
  *                    manifest is invisible (aborted round ⇒ clean resume)
  * }}}
  *
  * Item tables and the seen set are stored as per-round DELTAS: the full
  * table at round k = union of deltas 0..k. At the 10^10-URL design point
  * this keeps each commit O(round output), never O(total crawl state).
  */
object Snapshots {

  /** Physical per-round tables. `fetched` is the round's working set (url,
    * lineage columns, extracted `out` struct, text_match); item tables are
    * derived VIEWS over it at read time — one write per round instead of
    * five, O(1) jobs per round. The frontier is TIERED (TieredFrontier):
    * `head`/`host_state` are small full-state tables, `backlog_add`/
    * `backlog_rm`/`backlog_base` are delta segments. */
  val PhysicalTables: Seq[String] =
    Seq("head", "backlog_add", "backlog_rm", "backlog_base", "host_state",
      "seen_delta", "fetched", "misses")

  /** Logical tables exposed to readers (`frontier` = head ∪ pending
    * backlog). */
  val Tables: Seq[String] =
    Seq("frontier", "seen_delta", "fetched", "misses", "posts", "replies",
      "comments", "tieba_names", "fetch_log")

  def snapDir(warehouse: String, round: Int): String =
    f"$warehouse/snap-$round%05d"

  final case class Manifest(round: Int, parent: Int, frontierCount: Long,
                            seenDeltaCount: Long, fetched: Long, errors: Long,
                            deduped: Long, lineage: Seq[PartitionLineage],
                            headCount: Long = 0L, backlogPending: Long = 0L,
                            backlogPhysRows: Long = 0L, baseRound: Int = -1)

  def writeManifest(warehouse: String, m: Manifest): Unit = {
    val lineageJson = m.lineage.map(l =>
      s"""{"round":${l.round},"partition_id":${l.partition_id},"fetched":${l.fetched},"deduped":${l.deduped},"errors":${l.errors}}""")
      .mkString("[", ",", "]")
    val json =
      s"""{"round":${m.round},"parent":${m.parent},"frontier_count":${m.frontierCount},"seen_delta_count":${m.seenDeltaCount},"fetched":${m.fetched},"errors":${m.errors},"deduped":${m.deduped},"head_count":${m.headCount},"backlog_pending":${m.backlogPending},"backlog_phys_rows":${m.backlogPhysRows},"base_round":${m.baseRound},"lineage":$lineageJson}"""
    val dir = Paths.get(snapDir(warehouse, m.round))
    Files.createDirectories(dir)
    val tmp = dir.resolve("manifest.json.tmp")
    Files.writeString(tmp, json)
    // atomic publish: the rename IS the commit
    Files.move(tmp, dir.resolve("manifest.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  private def extractLong(json: String, key: String): Long = {
    val re = ("\"" + key + "\":(-?\\d+)").r
    re.findFirstMatchIn(json).map(_.group(1).toLong)
      .getOrElse(sys.error(s"manifest missing $key"))
  }

  def readManifest(warehouse: String, round: Int): Option[Manifest] = {
    val p = Paths.get(snapDir(warehouse, round), "manifest.json")
    if (!Files.exists(p)) None
    else {
      val json = Files.readString(p)
      val lineageRe =
        """\{"round":(\d+),"partition_id":(-?\d+),"fetched":(\d+),"deduped":(\d+),"errors":(\d+)\}""".r
      val lineage = lineageRe.findAllMatchIn(json.dropWhile(_ != '[')).map(m =>
        PartitionLineage(m.group(1).toInt, m.group(2).toInt, m.group(3).toLong,
          m.group(4).toLong, m.group(5).toLong)).toSeq
      Some(Manifest(extractLong(json, "round").toInt,
        extractLong(json, "parent").toInt,
        extractLong(json, "frontier_count"),
        extractLong(json, "seen_delta_count"), extractLong(json, "fetched"),
        extractLong(json, "errors"), extractLong(json, "deduped"), lineage,
        extractLong(json, "head_count"), extractLong(json, "backlog_pending"),
        extractLong(json, "backlog_phys_rows"),
        extractLong(json, "base_round").toInt))
    }
  }

  private val SnapDirPattern = "snap-(\\d+)".r

  /** Highest committed round, i.e. max snap-k having a manifest. Stray
    * non-numeric snap-* entries are ignored; the listing stream is closed
    * (this runs every round and per reader — ADVICE r1). */
  def latestCommittedRound(warehouse: String): Option[Int] = {
    val w = Paths.get(warehouse)
    if (!Files.exists(w)) return None
    val stream = Files.list(w)
    try {
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case SnapDirPattern(k) => k.toInt }
        .filter(r => Files.exists(Paths.get(snapDir(warehouse, r), "manifest.json")))
        .maxOption
    } finally stream.close()
  }

  def writeBloom(warehouse: String, round: Int, bloom: Array[Byte]): Unit = {
    val dir = Paths.get(snapDir(warehouse, round))
    Files.createDirectories(dir)
    Files.write(dir.resolve("bloom.bin"), bloom)
  }

  def readBloom(warehouse: String, round: Int): Array[Byte] =
    Files.readAllBytes(Paths.get(snapDir(warehouse, round), "bloom.bin"))

  /** Sharded seen-filter persistence ([[ShardedBloom]]): S = 1 keeps the
    * single `bloom.bin` (existing snapshots stay readable); S > 1 writes
    * one `bloom-%03d.bin` per url_hash-range shard — at the 10^10 design
    * point the cumulative filter (~12 GB) cannot be one file or one JVM
    * array anyway, and per-shard files let a sharded reader fetch only
    * the shards it owns. */
  def writeBloomShards(warehouse: String, round: Int,
                       shards: Array[Array[Byte]]): Unit =
    if (shards.length == 1) writeBloom(warehouse, round, shards(0))
    else {
      val dir = Paths.get(snapDir(warehouse, round))
      Files.createDirectories(dir)
      shards.zipWithIndex.foreach { case (b, i) =>
        Files.write(dir.resolve(f"bloom-$i%03d.bin"), b)
      }
    }

  def readBloomShards(warehouse: String, round: Int): Array[Array[Byte]] = {
    val dir = Paths.get(snapDir(warehouse, round))
    val single = dir.resolve("bloom.bin")
    if (Files.exists(single)) Array(Files.readAllBytes(single))
    else {
      val stream = Files.list(dir)
      val names = try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.startsWith("bloom-") && n.endsWith(".bin"))
        .toSeq
      finally stream.close()
      require(names.nonEmpty, s"no bloom files in $dir")
      // place by the PARSED shard index, never lexicographic filename
      // order — at ≥1000 shards the %03d padding overflows and a sort
      // would put shards at wrong indices (probe reads the wrong range
      // ⇒ Bloom false negatives ⇒ re-crawled URLs)
      val byIdx = names
        .map(n => n.stripPrefix("bloom-").stripSuffix(".bin").toInt -> n)
        .sortBy(_._1)
      require(byIdx.map(_._1) == byIdx.indices.toList,
        s"bloom shard files not contiguous in $dir: ${byIdx.map(_._1)}")
      byIdx.map { case (_, n) => Files.readAllBytes(dir.resolve(n)) }.toArray
    }
  }

  def tablePath(warehouse: String, round: Int, table: String): String =
    s"${snapDir(warehouse, round)}/$table"

  private def existingDeltaPaths(warehouse: String, table: String,
                                 upToRound: Int): Seq[String] =
    (0 to upToRound).map(r => tablePath(warehouse, r, table))
      .filter(p => Files.exists(Paths.get(p)))

  /** Fixed schemas for the simple physical tables: supplying them skips
    * the per-read footer-inference job (serial driver time in the round
    * loop). `fetched` stays inferred — its nested `out` struct follows
    * the extractor's item types. */
  private val StaticSchemas: Map[String, org.apache.spark.sql.types.StructType] =
    Map(
      "head" -> TieredFrontier.feSchema,
      "backlog_add" -> TieredFrontier.backlogSchema,
      "backlog_base" -> TieredFrontier.backlogSchema,
      "host_state" -> TieredFrontier.hostStateSchema,
      "seen_delta" -> org.apache.spark.sql.types.StructType.fromDDL(
        "url_hash BIGINT, url_hash2 BIGINT"),
      "backlog_rm" -> org.apache.spark.sql.types.StructType.fromDDL(
        "url_hash BIGINT, host_hash BIGINT"),
      "misses" -> org.apache.spark.sql.types.StructType.fromDDL(
        "round INT, url STRING, url_hash BIGINT, host STRING, depth INT"))

  private def readPhysical(spark: SparkSession, warehouse: String,
                           table: String, upToRound: Int): Option[DataFrame] = {
    val paths = existingDeltaPaths(warehouse, table, upToRound)
    if (paths.isEmpty) None
    else StaticSchemas.get(table) match {
      case Some(s) => Some(spark.read.schema(s).parquet(paths: _*))
      case None    => Some(spark.read.parquet(paths: _*))
    }
  }

  /** Full logical table at round k = union of committed deltas 0..k.
    * Item tables and the fetch log are derived from `fetched`/`misses`.
    * `frontier` is NOT a delta table — each round writes the full pending
    * state — so it reads only the latest dir ≤ k (ADVICE r1). */
  def readTable(spark: SparkSession, warehouse: String, table: String,
                upToRound: Int): Option[DataFrame] = {
    import org.apache.spark.sql.functions._
    def fetched = readPhysical(spark, warehouse, "fetched", upToRound)
    table match {
      case "frontier" =>
        val baseRound = readManifest(warehouse, upToRound)
          .map(_.baseRound).getOrElse(-1)
        TieredFrontier.readPending(spark, warehouse, upToRound, baseRound)
      case "posts" => fetched.map(
        _.select(explode(col("out.posts")).as("p")).select(col("p.*")))
      case "replies" => fetched.map(
        _.select(explode(col("out.replies")).as("r")).select(col("r.*")))
      case "comments" => fetched.map(
        _.select(explode(col("out.comments")).as("c")).select(col("c.*")))
      case "tieba_names" => fetched.map(
        _.select(col("url").as("user_url"),
          explode(col("out.tieba_names")).as("tieba")))
      case "fetch_log" =>
        val f = fetched.map(_.select(col("round"), col("url"),
          col("url_hash"), col("host"), col("depth"),
          lit("fetched").as("status"), col("text_match")))
        val m = readPhysical(spark, warehouse, "misses", upToRound)
          .map(_.select(col("round"), col("url"), col("url_hash"),
            col("host"), col("depth"), lit("miss").as("status"),
            lit(false).as("text_match")))
        (f, m) match {
          case (Some(a), Some(b)) => Some(a.unionByName(b))
          case (a, b) => a.orElse(b)
        }
      case _ => readPhysical(spark, warehouse, table, upToRound)
    }
  }

  def readLatestTable(spark: SparkSession, warehouse: String,
                      table: String): Option[DataFrame] =
    latestCommittedRound(warehouse)
      .flatMap(r => readTable(spark, warehouse, table, r))
}
