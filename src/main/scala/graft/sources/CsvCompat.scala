package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's CSV storage surface (S6/S8/S9/S10), byte-compatible
  * with Python's `csv.writer` "excel" dialect (reference:
  * /root/reference/webcrawler/webcrawler/pipelines.py:25-34 writes
  * headerless positional rows; /root/reference/main/tieba_processing/
  * tieba_processing.py:265-269 reads them back with pandas `header=None`).
  *
  * Encoding contract (python csv, QUOTE_MINIMAL, lineterminator "\r\n"):
  *  - a field is quoted iff it contains the delimiter, a double quote, or
  *    either line-terminator character;
  *  - quotes are escaped by doubling;
  *  - every row — including the last — ends with CRLF.
  * The quoting is pure column algebra (codegen'd), no UDF; the byte
  * contract is pinned against REAL python-generated fixtures in
  * CsvCompatSpec.
  *
  * Scale note: the single-file writer (coalesce(1) + rename) exists for
  * the reference's per-crawl-task artifacts and golden tests, which are
  * small by construction; the engine's scalable item sink remains the
  * parquet snapshot layout (frontier/Snapshots.scala). For a large table,
  * [[csvLines]] composes with a normal distributed `.write.text`.
  *
  * Row order: the reference appends rows in crawl-emission order (a
  * concurrency-nondeterministic order); the engine pins each table's
  * canonical key order (SURVEY.md §4.4 determinism contract).
  */
object CsvCompat {

  /** Pure-Scala reference encoder for one row (python csv.writer "excel"
    * dialect) — the byte oracle the column-algebra path is tested against
    * (which is in turn pinned to REAL python output fixtures). */
  def encodeRowPy(fields: Seq[String]): String =
    fields.map { f =>
      if (f.exists(c => c == ',' || c == '"' || c == '\n' || c == '\r'))
        "\"" + f.replace("\"", "\"\"") + "\""
      else f
    }.mkString(",") + "\r\n"

  /** Python-csv QUOTE_MINIMAL field encoding as column algebra. */
  def pyCsvField(c: Column): Column = {
    val s = coalesce(c.cast("string"), lit(""))
    when(s.rlike("[,\"\n\r]"),
      concat(lit("\""), regexp_replace(s, "\"", "\"\""), lit("\"")))
      .otherwise(s)
  }

  /** One encoded CSV row per input row; ends with '\r' so the text sink's
    * '\n' completes the python CRLF terminator. */
  def csvLines(cols: Seq[Column]): Column =
    concat(concat_ws(",", cols.map(pyCsvField): _*), lit("\r"))

  /** Write `df` as ONE headerless CSV file at `dest` (python-byte-compat),
    * rows in `order`. coalesce(1) after a global sort concatenates the
    * range-partitioned output in partition order, preserving the sort. */
  def writeSingleCsv(df: DataFrame, cols: Seq[Column], order: Seq[Column],
                     dest: String): Unit = {
    val tmp = Files.createTempDirectory("graft-csv")
    try {
      df.orderBy(order: _*).select(csvLines(cols).as("value"))
        .coalesce(1).write.mode("overwrite").text(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(_.getFileName.toString.startsWith("part-"))
          .findFirst().orElseThrow()
        finally listing.close()
      val destPath = Paths.get(dest)
      Option(destPath.getParent).foreach(Files.createDirectories(_))
      Files.move(part, destPath, StandardCopyOption.REPLACE_EXISTING)
    } finally
      scala.reflect.io.Path(tmp.toFile).deleteRecursively()
  }

  // ---- S6: the four item-table writers (pipelines.py:25-67) --------------

  def writePosts(posts: DataFrame, dest: String): Unit =
    writeSingleCsv(posts,
      Seq(col("post_id"), col("title"), col("reply_num")),
      Seq(col("post_id")), dest)

  def writeReplies(replies: DataFrame, dest: String): Unit =
    writeSingleCsv(replies,
      Seq(col("post_id"), col("reply_id"), col("content"), col("comment_num")),
      Seq(col("post_id"), col("reply_id")), dest)

  def writeComments(comments: DataFrame, dest: String): Unit =
    writeSingleCsv(comments,
      Seq(col("post_id"), col("reply_id"), col("content")),
      Seq(col("post_id"), col("reply_id"), col("content")), dest)

  /** tieba_count.csv: python dict insertion order pinned to name asc. */
  def writeTiebaCount(counts: DataFrame, dest: String): Unit =
    writeSingleCsv(counts, Seq(col("tieba"), col("cnt")),
      Seq(col("tieba")), dest)

  // ---- S8/S9: explicit-schema positional readers --------------------------
  // (the reference infers with pandas header=None / csv.DictReader with
  // supplied headers; Spark gets explicit schemas — SURVEY S8/S9)

  private def readCsv(spark: SparkSession, schema: String,
                      path: String): DataFrame = {
    val df = spark.read.schema(StructType.fromDDL(schema))
      // escape = quote char ⇒ RFC4180 doubled-quote decoding (python compat);
      // multiLine so quoted embedded newlines parse (single-task per file —
      // fine for the per-task artifacts this surface serves)
      .option("quote", "\"").option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)
    // python csv has no null: an empty unquoted field IS the empty string
    // (Spark's reader decodes it as null, which would change downstream
    // na.drop row counts vs the reference)
    df.select(df.schema.fields.map { f =>
      if (f.dataType == org.apache.spark.sql.types.StringType)
        coalesce(col(f.name), lit("")).as(f.name)
      else col(f.name)
    }.toSeq: _*)
  }

  def readPosts(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, "post_id STRING, title STRING, reply_num STRING", path)

  def readReplies(spark: SparkSession, path: String): DataFrame =
    readCsv(spark,
      "post_id STRING, reply_id STRING, content STRING, comment_num STRING",
      path)

  def readComments(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, "post_id STRING, reply_id STRING, content STRING", path)

  def readTiebaCount(spark: SparkSession, path: String): DataFrame =
    readCsv(spark, "tieba STRING, cnt INT", path)

  // ---- S10 + analysis read-back: the 4-artifact analysis bundle ----------
  // (tieba_processing.py:117-171: summary/keywords/sentiments/stats CSVs
  // written after a crawl, read back for the chart API)

  final case class AnalysisBundle(summary: DataFrame, keywords: DataFrame,
                                  sentiments: DataFrame, stats: DataFrame)

  def writeAnalysisBundle(dir: String, summary: DataFrame,
                          keywords: DataFrame, sentiments: DataFrame,
                          stats: DataFrame): Unit = {
    writeSingleCsv(summary,
      Seq(col("summary"), col("post_id"), col("reply_id")),
      Seq(col("post_id"), col("reply_id"), col("summary")),
      s"$dir/summary.csv")
    writeSingleCsv(keywords, Seq(col("keyword"), col("cnt")),
      Seq(col("cnt").desc, col("keyword")), s"$dir/keywords.csv")
    // reference order: positive, negative, neutral (tieba_processing.py:196)
    val sentOrder = when(col("label") === "positive", 0)
      .when(col("label") === "negative", 1).otherwise(2)
    writeSingleCsv(sentiments, Seq(col("label"), col("cnt")),
      Seq(sentOrder), s"$dir/sentiments.csv")
    writeSingleCsv(stats, Seq(col("key"), col("value")),
      Seq(col("key")), s"$dir/stats.csv")
  }

  /** Read-back of the bundle (read_analysis_from_csv,
    * tieba_processing.py:131-171). The reference re-reads summary.csv with
    * `quotechar='|'` — a quirk that leaves real quotes embedded; we read
    * with the standard dialect (the write side never emits '|') and
    * document the deviation. */
  def readAnalysisBundle(spark: SparkSession, dir: String): AnalysisBundle =
    AnalysisBundle(
      summary = readCsv(spark,
        "summary STRING, post_id STRING, reply_id STRING",
        s"$dir/summary.csv"),
      keywords = readCsv(spark, "keyword STRING, cnt BIGINT",
        s"$dir/keywords.csv"),
      sentiments = readCsv(spark, "label STRING, cnt BIGINT",
        s"$dir/sentiments.csv"),
      stats = readCsv(spark, "key STRING, value STRING", s"$dir/stats.csv"))
}
