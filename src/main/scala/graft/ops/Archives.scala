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

  // ---------------------------------------------------------------- WARC

  /** The markup each crawled page carries, BY FORMULA over the document
    * text (same construction as [[TextPrep.htmlExtract]]'s fixture), so
    * the oracle rebuilds the exact page in SQL. */
  private def htmlOf(id: Long, text: String): String =
    s"<html><head><title>doc $id</title></head><body><h1>Doc $id</h1><p>" +
      text.replace(" ", "</p><p>") + "</p></body></html>"

  private val WarcDate = "2024-06-01T00:00:00Z"

  private def gzipMember(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(b); gz.close()
    bos.toByteArray
  }

  /** One uncompressed WARC record (ISO 28500 layout: version line,
    * named headers, Content-Length, blank line, payload, two CRLFs). */
  private def warcRecord(typ: String, extraHeaders: Seq[(String, String)],
                         payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.0\r\n")
    sb.append(s"WARC-Type: $typ\r\n")
    sb.append(s"WARC-Date: $WarcDate\r\n")
    extraHeaders.foreach { case (k, v) => sb.append(s"$k: $v\r\n") }
    sb.append(s"Content-Length: ${payload.length}\r\n\r\n")
    sb.toString.getBytes("UTF-8") ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
  }

  /** GZIP-MEMBER WARC files — the container an LLM crawl pipeline
    * actually reads (Common-Crawl layout: every record its own gzip
    * member, members concatenated). Per document: a `warcinfo` record
    * followed by a `response` record whose payload is a full HTTP/1.1
    * response carrying the formula-built HTML page. */
  def warcPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val html = htmlOf(id, text).getBytes("UTF-8")
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
            s"Content-Length: ${html.length}\r\n\r\n").getBytes("UTF-8") ++ html
          val info = warcRecord("warcinfo",
            Seq("WARC-Filename" -> s"crawl-$id.warc.gz"),
            "software: graft-crawler/1.0\r\n".getBytes("UTF-8"))
          val resp = warcRecord("response",
            Seq("WARC-Target-URI" -> s"http://example.com/doc/$id",
                "Content-Type" -> "application/http; msgtype=response"),
            http)
          (id, gzipMember(info) ++ gzipMember(resp))
        }
      }
  }

  /** Streaming WARC record walk over the (multi-member) gzip bytes:
    * `java.util.zip.GZIPInputStream` consumes concatenated members
    * natively; records are delimited by their own Content-Length, so the
    * walk is one pass, no regex over the payload. Returns
    * (headers, payload) per record; malformed containers end the walk
    * (rejects side-channel contract). */
  private[graft] def warcRecordsOf(bytes: Array[Byte])
      : Seq[(Map[String, String], Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(Map[String, String], Array[Byte])]()
    try {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val all = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      var n = gz.read(tmp)
      while (n >= 0) { all.write(tmp, 0, n); n = gz.read(tmp) }
      val b = all.toByteArray
      var p = 0
      def line(): String = {
        val start = p
        while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
        val s = new String(b, start, p - start, "UTF-8")
        p = math.min(p + 2, b.length)
        s
      }
      while (p < b.length) {
        // skip inter-record padding
        while (p + 1 < b.length && b(p) == '\r' && b(p + 1) == '\n') p += 2
        if (p >= b.length) return out.toSeq
        val version = line()
        if (!version.startsWith("WARC/")) return out.toSeq
        var headers = Map.empty[String, String]
        var h = line()
        while (h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0) headers += (h.take(i).trim.toLowerCase -> h.drop(i + 1).trim)
          h = line()
        }
        val len = headers.getOrElse("content-length", "0").toInt
        if (len < 0 || p + len > b.length) return out.toSeq
        out += ((headers, java.util.Arrays.copyOfRange(b, p, p + len)))
        p += len
      }
    } catch { case _: java.io.IOException => () }
    out.toSeq
  }

  /** WARC INGESTION: explode response records out of the gzip-member
    * containers in-task (url, date, HTTP status, content type, body),
    * then strip the HTML with the same codegen'd regex pipeline as
    * [[TextPrep.htmlExtract]] — scan-shaped decode, no driver unpack,
    * no UDF past the member walk. The oracle rebuilds every field by
    * formula from the documents table. */
  def warcExtractQuery(spark: SparkSession, dir: String): DataFrame =
    warcExtractFrom(warcPayloads(spark, dir).toDF("doc_id", "payload"))

  /** The extraction itself over any `(doc_id, payload BINARY)` frame —
    * shared verbatim by the batch query and the streaming ingest, which
    * is what makes the stream twin provably the same computation. */
  def warcExtractFrom(payloads: DataFrame): DataFrame = {
    val spark = payloads.sparkSession
    import spark.implicits._
    payloads.select(col("payload")).as[Array[Byte]]
      .mapPartitions { rows =>
        rows.flatMap { bytes =>
          warcRecordsOf(bytes).iterator
            .filter(_._1.get("warc-type").contains("response"))
            .map { case (hdr, payload) =>
              val s = new String(payload, "UTF-8")
              val cut = s.indexOf("\r\n\r\n")
              val head = s.take(math.max(cut, 0))
              val body = if (cut >= 0) s.drop(cut + 4) else ""
              val status = head.linesIterator.nextOption()
                .map(_.split(" ")(1).toInt).getOrElse(0)
              val ctype = head.linesIterator
                .find(_.toLowerCase.startsWith("content-type:"))
                .map(_.split(":", 2)(1).trim).getOrElse("")
              (hdr.getOrElse("warc-target-uri", ""),
                hdr.getOrElse("warc-date", ""), status, ctype, body)
            }
        }
      }
      .toDF("url", "warc_date", "status", "content_type", "html")
      .withColumn("doc_id",
        regexp_extract(col("url"), "/doc/(\\d+)$", 1).cast("long"))
      .withColumn("clean", trim(regexp_replace(
        regexp_replace(col("html"), lit("<[^>]*>"), lit(" ")),
        lit("\\s+"), lit(" "))))
      .select(col("doc_id"), col("url"), col("warc_date"), col("status"),
        col("content_type"),
        length(col("html")).cast("long").as("n_bytes"),
        md5(col("clean")).as("text_md5"))
  }

  /** STREAMING WARC ingest: crawl containers arrive as a stream of
    * `(doc_id, payload)` rows (the object-store-notification shape);
    * each micro-batch runs the IDENTICAL [[warcExtractFrom]] extraction
    * and lands in warehouse history via the idempotent
    * (day, batch_id) publish — at-least-once foreachBatch upgraded to
    * exactly-once by the epoch-keyed overwrite (Round8OpsSpec's
    * crash-window law). Spec proves stream == batch across
    * micro-batches. */
  def warcStream(stream: DataFrame, warehouse: graft.connect.Warehouse,
                 entity: String, checkpoint: String,
                 runDate: graft.core.RunDate)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (!batch.isEmpty) {
          warehouse.appendHistoryBatch(
            graft.ops.Exp.stampDayDt(warcExtractFrom(batch), runDate),
            entity, epochId)
        }
      }

  val warcExtractOracle: String =
    s"""WITH h AS (
       |  SELECT doc_id, text,
       |         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
       |         '</title></head><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
       |         '</h1><p>' || replace(text, ' ', '</p><p>') ||
       |         '</p></body></html>' AS html
       |  FROM documents)
       |SELECT doc_id,
       |       'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url,
       |       '$WarcDate' AS warc_date,
       |       200 AS status,
       |       'text/html' AS content_type,
       |       CAST(length(html) AS BIGINT) AS n_bytes,
       |       md5(trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
       |                               '\\s+', ' ', 'g'))) AS text_md5
       |FROM h
       |""".stripMargin
}
