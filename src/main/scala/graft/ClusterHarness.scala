package graft

import org.apache.spark.sql.SparkSession

/** Real multi-executor sessions inside the sandbox: `local-cluster[n,c,m]`
  * boots the standalone Master/Worker in-process and launches each
  * executor as its OWN JVM — the honest analog of "spark-submit at two
  * cluster sizes (N and 4N executors)" (north rule) on one machine, and
  * the measurement mode the r3 scaling work showed matters: a single JVM
  * running 8 task threads loses ~35% CPU-seconds to intra-JVM contention
  * that four separate 2-core executor JVMs do not pay.
  */
object ClusterHarness {

  /** Executor JVMs need the app classes on their classpath. Resolve from
    * wherever THIS class actually loaded: a jar (spark-submit launch) is
    * used directly; a classes directory (sbt runMain launch) is packaged
    * into a temp jar once per process. */
  lazy val appJar: String = {
    val loc = new java.io.File(getClass.getProtectionDomain
      .getCodeSource.getLocation.toURI)
    if (loc.isFile) loc.getAbsolutePath // already a jar
    else {
      require(loc.isDirectory,
        s"${loc.getPath} missing — compile before running the bench")
      val out = java.nio.file.Files.createTempFile("graft-app", ".jar")
      val jos = new java.util.jar.JarOutputStream(
        java.nio.file.Files.newOutputStream(out))
      def walk(dir: java.io.File, prefix: String): Unit =
        dir.listFiles().sortBy(_.getName).foreach { f =>
          if (f.isDirectory) walk(f, prefix + f.getName + "/")
          else {
            jos.putNextEntry(new java.util.zip.ZipEntry(prefix + f.getName))
            java.nio.file.Files.copy(f.toPath, jos)
            jos.closeEntry()
          }
        }
      walk(loc, "")
      jos.close()
      out.toString
    }
  }

  /** A session on `local-cluster[nExecutors, coresPerExecutor, memMb]`.
    * Requires SPARK_HOME + SPARK_SCALA_VERSION in the environment (set by
    * build.sbt for forked runs) so the Worker can build executor
    * commands; `spark.test.home` covers the in-process Worker itself. */
  def clusterSession(nExecutors: Int, coresPerExecutor: Int, memMb: Int,
                     appName: String): SparkSession = {
    System.setProperty("spark.test.home", "/opt/spark")
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val totalCores = nExecutors * coresPerExecutor
    val s = SparkSession.builder()
      .master(s"local-cluster[$nExecutors,$coresPerExecutor,$memMb]")
      .appName(appName)
      // local-cluster's third parameter is WORKER capacity, not executor
      // heap — without this line every executor launches at the 1 GB
      // spark.executor.memory default regardless of memMb (found when the
      // 24k-forum corpus OOM'd "16 GB" executors that were really 1 GB)
      .config("spark.executor.memory", s"${memMb}m")
      .config("spark.jars", "file://" + appJar)
      .config("spark.sql.shuffle.partitions", totalCores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      // fat html rows overflow the vectorized reader's 4096-row default
      // batch on the bench corpus (measured: 31 MB contiguous request)
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
