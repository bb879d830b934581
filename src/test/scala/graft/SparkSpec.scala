package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the suite — same canonical config as the
  * Verify/Bench harnesses. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        TempLayouts.tracked("graft-warehouse").toString)
      // Hardened local FS: RawLocalFileSystem.setPermission shells out to
      // `chmod` without native hadoop libs, which a subprocess-denying
      // sandbox turns into aborted streaming-checkpoint epochs (round-15
      // driver: ChecksumCheckpointFileManager.createAtomic -> Shell.run).
      // These wrappers make setPermission best-effort on both FS layers.
      .config("spark.hadoop.fs.file.impl",
        classOf[NoChmodLocalFileSystem].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        classOf[NoChmodLocalFs].getName)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
