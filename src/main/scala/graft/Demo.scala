package graft

import org.apache.spark.sql.SparkSession

/** Manual end-to-end driver: runs the flagship crawl ([[SparkEntry.entry]])
  * and prints the crawled tables — the library exercised through a real
  * JVM entry point (`sbt "runMain graft.Demo"` or spark-submit). */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[4]"))
      .appName("graft-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val posts = SparkEntry.entry(spark)
    println(s"[demo] flagship crawl posts rows = ${posts.count()}")
    posts.show(10, truncate = false)
    spark.stop()
  }
}
