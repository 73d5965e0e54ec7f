package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

trait SparkSpecBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpecBase.session
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Write a frame as ONE flat parquet file `dir/name` — the file-stream
    * source tails flat files, not per-chunk write directories, so streaming
    * tests stage arrival-ordered chunks through this.
    */
  def writeFlatParquet(df: org.apache.spark.sql.DataFrame, dir: String,
      name: String): Unit = {
    import java.nio.file.{Files, Paths}
    val tmp = s"$dir/.tmp-$name"
    df.coalesce(1).write.parquet(tmp)
    val part = { val s = Files.list(Paths.get(tmp))
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.find(_.getFileName.toString.endsWith(".parquet")).get
      } finally s.close() }
    Files.move(part, Paths.get(s"$dir/$name"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }
}

object SparkSpecBase {
  // One session for the whole forked test JVM.
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
