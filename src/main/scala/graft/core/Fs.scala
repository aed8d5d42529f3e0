package graft.core

import java.sql.Timestamp

import org.apache.hadoop.fs.{FileSystem, Path, RemoteIterator}
import org.apache.spark.sql.SparkSession

/** Object-store-safe filesystem access: every existence / delete / listing
  * check goes through the Hadoop FileSystem API resolved FROM THE PATH, so
  * lake/warehouse/watermark roots can be `file://`, `hdfs://` or `s3a://`
  * without code changes (the reference is S3-native —
  * `s3_file_explorer.py:31-51`; `java.io.File` would silently break on any
  * non-local root).
  */
object Fs {

  def resolve(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  def exists(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = resolve(spark, path)
    fs.exists(p)
  }

  def deleteRecursively(spark: SparkSession, path: String): Unit = {
    val (fs, p) = resolve(spark, path)
    fs.delete(p, true): Unit
  }

  /** Content fingerprint of a directory's FILE LISTING (names, sizes,
    * modification times) — one listing RPC stream, no Spark job. Cheap
    * staleness detection for derived layouts (a bucketed table staged
    * from a zone dir is stale the moment the dir's listing changes);
    * deliberately listing-level, not content-level — rewriting a file
    * in place changes its mtime, and that is exactly the signal.
    */
  def fingerprint(spark: SparkSession, dir: String): String = {
    val (fs, p) = resolve(spark, dir)
    if (!fs.exists(p)) return "absent"
    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    val it: RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile)
        parts += s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.sorted.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Newest file modification time under a directory (recursive) — one
    * listing RPC stream, no Spark job. Drives the lake→warehouse load
    * watermark (reference Q2 `max(file_modified_date)`,
    * `s3_to_db_import_status_dao.py:40-79`).
    */
  def latestModification(spark: SparkSession, dir: String): Option[Timestamp] = {
    val (fs, p) = resolve(spark, dir)
    if (!fs.exists(p)) return None
    var maxMs = Long.MinValue
    val it: RemoteIterator[org.apache.hadoop.fs.LocatedFileStatus] = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.isFile && s.getModificationTime > maxMs) maxMs = s.getModificationTime
    }
    if (maxMs == Long.MinValue) None else Some(new Timestamp(maxMs))
  }
}
