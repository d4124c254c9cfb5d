package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** One OVERWRITING-rename primitive for the tiny metadata files the
  * streaming layer maintains (applied-LSN watermark, consumer
  * registrations): a reader must never observe the destination absent
  * (rules out delete-then-rename), and CONCURRENT writers must both
  * survive with one of their values winning (rules out Hadoop
  * FileContext on the local filesystem, whose Rename.OVERWRITE is
  * delete+rename underneath — two racing writers both pass the delete
  * and the loser dies with FileAlreadyExistsException; measured in
  * ConcurrentMirrorsSpec with two mirrors sharing one store).
  *
  * Local paths take `java.nio` ATOMIC_MOVE + REPLACE_EXISTING — POSIX
  * rename(2), atomic replace, race-safe. Non-local filesystems take
  * FileContext's Rename.OVERWRITE, which IS atomic where it matters
  * (HDFS implements it natively); single-writer-per-file deployments
  * are the norm there.
  */
private[streaming] object AtomicFiles {

  def overwriteRename(spark: SparkSession, tmp: Path, dest: Path): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val scheme = Option(tmp.toUri.getScheme)
      .orElse(Option(org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).getScheme))
    if (scheme.forall(_ == "file")) {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(dest.toUri.getPath),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      org.apache.hadoop.fs.FileContext.getFileContext(tmp.toUri, conf)
        .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Write `body` to `dest` atomically via a caller-unique tmp +
    * [[overwriteRename]]. */
  def writeAtomically(spark: SparkSession, dest: Path, body: String): Unit = {
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dest.getParent,
      s".${dest.getName}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    overwriteRename(spark, tmp, dest)
  }
}
