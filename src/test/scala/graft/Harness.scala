package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One Hive-enabled session for the whole forked test JVM (static confs
  * like catalogImplementation cannot change between sessions in one JVM,
  * so the Hive round-trip suite shares it). Derby metastore + warehouse
  * live under /tmp so the repo stays clean. */
object TestSpark {
  val sf = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-test").toString
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$tmp/warehouse")
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$tmp/metastore;create=true")
      .enableHiveSupport()
      .getOrCreate()
  }
}

/** Base suite: shared session + a temp dir per suite. */
abstract class GraftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  lazy val sf: String = TestSpark.sf
  lazy val tmpDir: String =
    java.nio.file.Files.createTempDirectory(suiteName.toLowerCase).toString

  /** Recursive temp-dir cleanup for try/finally blocks — shared here
    * (round-18 review) so every suite that makes its own scratch dirs
    * uses one definition. */
  protected def deleteTree(p: java.io.File): Unit = {
    // listFiles returns null on IO error or a concurrently-removed dir;
    // this runs inside finally blocks, where an NPE would mask the
    // original test failure (round-18 advice)
    if (p.isDirectory) Option(p.listFiles).foreach(_.foreach(deleteTree))
    p.delete()
  }
}
