package graft

import org.apache.hadoop.fs.{FileContext, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission

/** Pins the sandbox-hardened local FS wiring: the shared test session must
  * route `file:` through the NoChmod wrappers on BOTH Hadoop layers (the
  * FileSystem API and the FileContext/AbstractFileSystem API the default
  * streaming-checkpoint manager uses), and a failing chmod must never
  * propagate (it aborts streaming-checkpoint epochs in subprocess-denying
  * sandboxes otherwise).
  */
class NoChmodFsSpec extends SparkSpec {

  test("file: FileSystem is the NoChmod wrapper") {
    val fs = FileSystem.get(
      java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[NoChmodLocalFileSystem], fs.getClass.getName)
  }

  test("file: AbstractFileSystem (FileContext path) is the NoChmod wrapper") {
    val fc = FileContext.getFileContext(
      java.net.URI.create("file:///"), spark.sparkContext.hadoopConfiguration)
    val afs = fc.getDefaultFileSystem
    assert(afs.isInstanceOf[NoChmodLocalFs], afs.getClass.getName)
  }

  test("setPermission failure is swallowed, not propagated") {
    // chmod on a nonexistent path fails on every platform; through the
    // wrapper that failure must be silent (best-effort permissions).
    val raw = new NoChmodRawLocalFileSystem
    raw.initialize(java.net.URI.create("file:///"),
      spark.sparkContext.hadoopConfiguration)
    raw.setPermission(new Path("/graft-definitely-missing-xyz"),
      new FsPermission("640")) // group != other: always the exec path
  }

  test("streaming checkpoint machinery works through the wrappers") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nochmod-ckpt")
    val in = MemoryStream[Int]
    val q = in.toDF().groupBy("value").count()
      .writeStream.format("memory").queryName("nochmod_out")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("complete").start()
    try {
      in.addData(1, 2, 2)
      q.processAllAvailable()
      assert(spark.table("nochmod_out").count() === 2)
    } finally q.stop()
  }
}
