package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** ARCHIVE EXTRACTION as an ingest source: web crawls, data drops, and
  * vendor exports arrive as container files (zip/tar/WARC) holding many
  * member documents; the engine must explode each archive into member
  * rows WITHOUT a driver-side unpack — each task opens its archives from
  * the binary column and streams entries out. This is the zip member of
  * that family, on real `java.util.zip` containers (central directory,
  * deflate entries), with the same partition-batched shape as the media
  * decoders: archives dominate row size, so the member projection drops
  * the payload as early as possible.
  *
  * The fixture synthesizes a real multi-entry zip per document with
  * formula-known member names and contents, so the oracle verifies the
  * full extraction — names, sizes, and content hashes — in SQL.
  */
object Archives {

  private[ops] def memberContent(id: Long, t: Int): String =
    s"entry $t of document $id\n" * (t + 1)

  /** One real zip per document, `(id % 3) + 1` deflate-compressed text
    * members. */
  def zipPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val zos = new java.util.zip.ZipOutputStream(bos)
          val n = (id % 3).toInt + 1
          var t = 0
          while (t < n) {
            zos.putNextEntry(new java.util.zip.ZipEntry(s"doc${id}_$t.txt"))
            zos.write(memberContent(id, t).getBytes("UTF-8"))
            zos.closeEntry()
            t += 1
          }
          zos.close()
          (id, bos.toByteArray)
        }
      }
  }

  /** Distributed extraction: every archive explodes into member rows
    * (name, size, content hash) inside its task — entries must be
    * materialized per archive before the stream closes. */
  def extractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    zipPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          val zis = new java.util.zip.ZipInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val out = scala.collection.mutable.ArrayBuffer[(Long, String, Long, String)]()
          var e = zis.getNextEntry
          while (e != null) {
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](4096)
            var n = zis.read(tmp)
            while (n >= 0) { buf.write(tmp, 0, n); n = zis.read(tmp) }
            val content = buf.toByteArray
            val md = java.security.MessageDigest.getInstance("MD5")
            val hash = md.digest(content).map("%02x".format(_)).mkString
            out += ((id, e.getName, content.length.toLong, hash))
            e = zis.getNextEntry
          }
          out
        }
      }
      .toDF("doc_id", "entry_name", "n_bytes", "content_md5")
  }

  val extractOracle: String =
    """SELECT doc_id,
      |       'doc' || CAST(doc_id AS VARCHAR) || '_' || CAST(t AS VARCHAR) || '.txt' AS entry_name,
      |       CAST(length(repeat('entry ' || CAST(t AS VARCHAR) || ' of document ' || CAST(doc_id AS VARCHAR) || chr(10), CAST(t + 1 AS INT))) AS BIGINT) AS n_bytes,
      |       md5(repeat('entry ' || CAST(t AS VARCHAR) || ' of document ' || CAST(doc_id AS VARCHAR) || chr(10), CAST(t + 1 AS INT))) AS content_md5
      |FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS INT))) u(t)
      |""".stripMargin
}
