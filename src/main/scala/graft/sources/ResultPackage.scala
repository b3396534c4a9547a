package graft.sources

import java.nio.file.{Files, Path, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import scala.jdk.CollectionConverters._

/** S14: result packaging — zips a finished task's artifact directory for
  * download (reference: /root/reference/main/general_processing/
  * general_processing.py:6-12 `create_zip`, driven by
  * /root/reference/main/tieba_processing/tieba_processing.py:224-253
  * `process_download_folder`).
  *
  * Semantics mirrored from the reference:
  *  - only the directory's top-level FILES are packaged (os.listdir,
  *    non-recursive), entry names are bare filenames;
  *  - the zip is written inside the directory itself as `<name>.zip`
  *    (the listing is taken before the zip is created, so it never
  *    contains itself);
  *  - an empty directory is removed and `None` returned.
  *
  * Determinism deviations (documented, SURVEY.md §5.1): entries are
  * written in sorted-name order (os.listdir order is fs-arbitrary) with a
  * fixed epoch timestamp, so the archive bytes are reproducible and
  * golden-testable. Driver-side util by design — per-task artifact
  * directories are small by construction (same contract as
  * [[CsvCompat.writeSingleCsv]]); the scalable sink is the parquet
  * snapshot layout.
  */
object ResultPackage {

  /** `create_zip`: package `dir`'s top-level files as `dir/<zipName>`.
    * Returns the zip path. */
  def createZip(dir: String, zipName: String): Path = {
    val base = Paths.get(dir)
    val files = Files.list(base)
    val entries =
      try files.iterator().asScala.filter(Files.isRegularFile(_)).toVector
      finally files.close()
    val dest = base.resolve(zipName)
    val zos = new ZipOutputStream(Files.newOutputStream(dest))
    try entries.sortBy(_.getFileName.toString).foreach { p =>
      val e = new ZipEntry(p.getFileName.toString)
      e.setTime(0L) // fixed mtime: reproducible archive bytes
      zos.putNextEntry(e)
      zos.write(Files.readAllBytes(p))
      zos.closeEntry()
    } finally zos.close()
    dest
  }

  /** `process_download_folder`: zip a non-empty task directory and return
    * its name; remove an empty one and return None. (The reference's
    * `process_scraped_content` analytics step is the caller's concern —
    * [[graft.analytics.TiebaAnalytics]] + [[CsvCompat.writeAnalysisBundle]].) */
  def processDownloadFolder(resultsPath: String, folderName: String): Option[String] = {
    val dir = Paths.get(resultsPath, folderName)
    if (!Files.isDirectory(dir)) return None
    val files = Files.list(dir)
    val nonEmpty = try files.iterator().hasNext finally files.close()
    if (nonEmpty) {
      createZip(dir.toString, folderName + ".zip")
      Some(folderName)
    } else {
      Files.delete(dir)
      None
    }
  }

  /** Directory-listing catalog of downloadable zips (S15 flavor of
    * views.py:261-265 `csvdownload` / `get_history`): sorted names of
    * `*.zip` under resultsPath. */
  def listDownloads(resultsPath: String): Seq[String] = {
    val base = Paths.get(resultsPath)
    if (!Files.isDirectory(base)) return Nil
    val s = Files.walk(base, 2)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".zip"))
      .map(base.relativize(_).toString).toVector.sorted
    finally s.close()
  }
}
