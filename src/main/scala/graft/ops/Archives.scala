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
    Tables.docIds(spark, dir)
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

  // ----------------------------------------------------------------- tar

  /** One POSIX ustar header block (512 bytes): name, octal size/mtime,
    * the space-initialized checksum convention, regular-file typeflag. */
  private def tarHeader(name: String, size: Int): Array[Byte] = {
    val h = new Array[Byte](512)
    // Each copy is bounded by its ustar field width and must fit --
    // oversized values fail loudly rather than produce a corrupt header.
    def put(at: Int, s: String, width: Int): Unit = {
      val b = s.getBytes("US-ASCII")
      require(b.length <= width,
        s"tar field at offset $at: ${b.length} bytes exceeds width $width")
      System.arraycopy(b, 0, h, at, b.length)
    }
    put(0, name, 100)                            // name (ustar 100-byte limit)
    put(100, "0000644\u0000", 8)                 // mode
    put(108, "0000000\u0000", 8); put(116, "0000000\u0000", 8) // uid/gid
    put(124, f"$size%011o" + "\u0000", 12)       // size, octal
    put(136, "00000000000\u0000", 12)            // mtime
    h(156) = '0'                                 // typeflag: regular file
    put(257, "ustar\u0000" + "00", 8)            // magic + version
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum field = spaces
    val sum = h.map(_ & 0xff).sum
    put(148, f"$sum%06o" + "\u0000 ", 8)
    h
  }

  /** One real POSIX tar per document, the same `(id % 3) + 1`
    * formula-content members as the zip fixture — so the tar walk is
    * gated by the SAME oracle as [[extractQuery]]. */
  def tarPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val bos = new java.io.ByteArrayOutputStream()
          val n = (id % 3).toInt + 1
          var t = 0
          while (t < n) {
            val content = memberContent(id, t).getBytes("UTF-8")
            bos.write(tarHeader(s"doc${id}_$t.txt", content.length))
            bos.write(content)
            val pad = (512 - content.length % 512) % 512
            bos.write(new Array[Byte](pad))
            t += 1
          }
          bos.write(new Array[Byte](1024)) // end-of-archive: two zero blocks
          (id, bos.toByteArray)
        }
      }
  }

  /** In-task tar member walk: 512-byte ustar headers, octal sizes,
    * 512-rounded data blocks. Hostile-input contract: a non-octal size,
    * a size past the buffer, or a truncated header ends the walk with
    * the members already read (rejects side-channel, the
    * [[warcRecordsOf]] discipline). */
  private[graft] def tarMembersOf(bytes: Array[Byte])
      : Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer[(String, Array[Byte])]()
    var p = 0
    while (p + 512 <= bytes.length) {
      if (bytes(p) == 0) return out.toSeq // end-of-archive zero block
      var nameEnd = p
      while (nameEnd < p + 100 && bytes(nameEnd) != 0) nameEnd += 1
      val name = new String(bytes, p, nameEnd - p, "US-ASCII")
      val sizeStr = new String(bytes, p + 124, 12, "US-ASCII")
        .takeWhile(c => c >= '0' && c <= '7')
      if (sizeStr.isEmpty) return out.toSeq
      val size = java.lang.Long.parseLong(sizeStr, 8)
      if (size < 0 || p + 512L + size > bytes.length.toLong) return out.toSeq
      if (bytes(p + 156) == '0' || bytes(p + 156) == 0)
        out += ((name, java.util.Arrays.copyOfRange(
          bytes, p + 512, p + 512 + size.toInt)))
      p += 512 + ((size.toInt + 511) / 512) * 512
    }
    out.toSeq
  }

  /** Distributed tar extraction — same output contract as the zip
    * [[extractQuery]], gated by the same formula oracle. */
  def tarExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    tarPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          tarMembersOf(bytes).iterator.map { case (name, content) =>
            val md = java.security.MessageDigest.getInstance("MD5")
            val hash = md.digest(content).map("%02x".format(_)).mkString
            (id, name, content.length.toLong, hash)
          }
        }
      }
      .toDF("doc_id", "entry_name", "n_bytes", "content_md5")
  }

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
    // Decompress under its own guard: a truncated or corrupt trailing
    // gzip member must not discard the records already decompressed from
    // earlier members — keep the partial bytes and parse what arrived
    // (the Content-Length bounds check drops any half-record tail).
    val all = new java.io.ByteArrayOutputStream()
    try {
      val gz = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val tmp = new Array[Byte](8192)
      var n = gz.read(tmp)
      while (n >= 0) { all.write(tmp, 0, n); n = gz.read(tmp) }
    } catch { case _: java.io.IOException => () }
    try {
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
        // Hostile-input contract: a missing Content-Length (mandatory
        // per ISO 28500 — absence means a truncated header block), a
        // non-numeric value, or a near-Int.MaxValue value must end the
        // walk (rejects side-channel), never escape as
        // NumberFormatException or pass the bounds check via Int
        // overflow — so parse as Long and bound in Long space before
        // narrowing.
        val len = headers.get("content-length")
          .flatMap(_.toLongOption).getOrElse(-1L)
        if (len < 0L || p.toLong + len > b.length.toLong) return out.toSeq
        out += ((headers, java.util.Arrays.copyOfRange(b, p, p + len.toInt)))
        p += len.toInt
      }
    } catch { case _: java.io.IOException => () }
    out.toSeq
  }

  // ------------------------------------------------------------- charset

  private def charsetOf(name: String): Option[java.nio.charset.Charset] =
    try Some(java.nio.charset.Charset.forName(name))
    catch { case scala.util.control.NonFatal(_) => None }

  private val CharsetAttr =
    java.util.regex.Pattern.compile(
      "(?i)charset\\s*=\\s*[\"']?([A-Za-z0-9_.:\\-]+)")

  /** Charset of an HTTP-response body, resolved the way a crawl pipeline
    * must: byte-order mark first (authoritative), then the Content-Type
    * header's `charset=` parameter, then an ASCII-superset scan of the
    * leading bytes for an HTML `<meta … charset=…>` declaration, then the
    * UTF-8 fallback. Unknown or unsupported charset names fall through to
    * the next source rather than failing the task. */
  private[graft] def sniffCharset(contentType: String, body: Array[Byte])
      : java.nio.charset.Charset = {
    import java.nio.charset.StandardCharsets._
    def at(i: Int): Int = if (i < body.length) body(i) & 0xFF else -1
    val bom =
      if (at(0) == 0xEF && at(1) == 0xBB && at(2) == 0xBF) Some(UTF_8)
      else if (at(0) == 0xFF && at(1) == 0xFE) Some(UTF_16LE)
      else if (at(0) == 0xFE && at(1) == 0xFF) Some(UTF_16BE)
      else None
    def fromString(s: String): Option[java.nio.charset.Charset] = {
      val m = CharsetAttr.matcher(s)
      if (m.find()) charsetOf(m.group(1)) else None
    }
    def meta: Option[java.nio.charset.Charset] =
      fromString(new String(body, 0, math.min(body.length, 1024), ISO_8859_1))
    bom.orElse(fromString(contentType)).orElse(meta).getOrElse(UTF_8)
  }

  /** Decode a response body with [[sniffCharset]], dropping a decoded
    * byte-order-mark character so the text is BOM-free regardless of the
    * source encoding. */
  private[graft] def decodeBody(contentType: String, body: Array[Byte]): String = {
    val s = new String(body, sniffCharset(contentType, body))
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
  }

  /** Index of the first CRLFCRLF head/body cut at the byte level — the
    * split must happen BEFORE charset decode or a UTF-16 body would
    * mangle the ASCII head. */
  private[graft] def headBodyCut(payload: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < payload.length) {
      if (payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') return i
      i += 1
    }
    -1
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
              // Byte-level head/body cut: the HTTP head is ASCII by RFC
              // 7230, the body's charset is whatever the page declares —
              // decoding the whole payload as one string would corrupt
              // non-UTF-8 bodies before the charset is even known.
              val cut = headBodyCut(payload)
              val head = new String(payload, 0,
                if (cut >= 0) cut else payload.length,
                java.nio.charset.StandardCharsets.ISO_8859_1)
              val bodyBytes =
                if (cut >= 0)
                  java.util.Arrays.copyOfRange(payload, cut + 4, payload.length)
                else Array.empty[Byte]
              // Hostile-input contract: a malformed status line yields
              // status 0 (rejects side-channel), never an exception that
              // fails the task.
              val status = head.linesIterator.nextOption()
                .flatMap { l =>
                  val parts = l.split(" ")
                  if (parts.length >= 2) parts(1).toIntOption else None
                }.getOrElse(0)
              val ctype = head.linesIterator
                .find(_.toLowerCase.startsWith("content-type:"))
                .map(_.split(":", 2)(1).trim).getOrElse("")
              (hdr.getOrElse("warc-target-uri", ""),
                hdr.getOrElse("warc-date", ""), status, ctype,
                decodeBody(ctype, bodyBytes))
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

  // ------------------------------------------ HTTP content encodings

  /** SHA-1 payload digest in the WARC convention (RFC 4648 base32,
    * uppercase — 20 bytes → exactly 32 chars, no padding), the value
    * `WARC-Payload-Digest: sha1:...` carries. */
  private[graft] def sha1Base32(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1").digest(b)
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val out = new StringBuilder(32)
    var acc = 0L
    var nbits = 0
    d.foreach { byte =>
      acc = (acc << 8) | (byte & 0xff)
      nbits += 8
      while (nbits >= 5) {
        out.append(alphabet(((acc >> (nbits - 5)) & 31).toInt))
        nbits -= 5
      }
    }
    out.toString // 160 bits / 5 = 32 symbols exactly
  }

  /** WARC REVISIT dedup resolution — how real crawls (the Common Crawl
    * layout) express payload dedup: a later fetch of identical content
    * is stored as a `revisit` record carrying `WARC-Payload-Digest:
    * sha1:<base32>` + `WARC-Refers-To-Target-URI`, with NO body. Per
    * doc: one `response` (full HTTP body) plus doc_id%3 revisit
    * records referring to it; the walk recomputes the response's
    * payload digest (over the HTTP body, not the record) and checks
    * every revisit resolves — digest match AND refers-to URI match.
    * Map-only per doc; at corpus scale the digest is the join key
    * that collapses refetches without touching bodies. */
  def warcRevisitQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.flatMap { case (id, text) =>
          val html = htmlOf(id, text).getBytes("UTF-8")
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
            s"Content-Length: ${html.length}\r\n\r\n").getBytes("UTF-8") ++
            html
          val digest = "sha1:" + sha1Base32(html)
          val uri = s"http://example.com/doc/$id"
          val resp = warcRecord("response",
            Seq("WARC-Target-URI" -> uri,
                "WARC-Payload-Digest" -> digest,
                "Content-Type" -> "application/http; msgtype=response"),
            http)
          val headOnly = ("HTTP/1.1 200 OK\r\nContent-Type: text/html" +
            "\r\n\r\n").getBytes("UTF-8")
          val revisits = (0 until (id % 3).toInt).map { r =>
            warcRecord("revisit",
              Seq("WARC-Target-URI" -> s"$uri?refetch=$r",
                "WARC-Refers-To-Target-URI" -> uri,
                "WARC-Payload-Digest" -> digest,
                "WARC-Profile" ->
                  "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                "Content-Type" -> "application/http; msgtype=response"),
              headOnly)
          }
          val warc = gzipMember(resp) ++
            revisits.map(gzipMember).fold(Array.emptyByteArray)(_ ++ _)
          // ---- read side: recompute + resolve
          val recs = warcRecordsOf(warc)
          var respDigest: String = null
          var respUri: String = null
          var nResp = 0
          var nRev = 0
          var digestOk = true
          var refersOk = true
          recs.foreach { case (headers, payload) =>
            def h(k: String): Option[String] = headers.get(k.toLowerCase)
            h("WARC-Type").getOrElse("") match {
              case "response" =>
                nResp += 1
                val cut = headBodyCut(payload)
                if (cut < 0) digestOk = false
                else {
                  val body = java.util.Arrays.copyOfRange(payload,
                    cut + 4, payload.length)
                  respDigest = "sha1:" + sha1Base32(body)
                  respUri = h("WARC-Target-URI").orNull
                  // the record's own declared digest must match too
                  if (!h("WARC-Payload-Digest").contains(respDigest))
                    digestOk = false
                }
              case "revisit" =>
                nRev += 1
                if (!h("WARC-Payload-Digest").contains(respDigest))
                  digestOk = false
                if (!h("WARC-Refers-To-Target-URI").contains(respUri))
                  refersOk = false
              case _ =>
            }
          }
          Some((id, nResp, nRev, digestOk, refersOk))
        }
      }
      .toDF("doc_id", "n_responses", "n_revisits", "digest_ok", "refers_ok")
      .select(col("doc_id"),
        col("n_responses").cast("int").as("n_responses"),
        col("n_revisits").cast("int").as("n_revisits"),
        col("digest_ok"), col("refers_ok"))
  }

  val warcRevisitOracle: String =
    """SELECT doc_id,
      |       CAST(1 AS INT) AS n_responses,
      |       CAST(doc_id % 3 AS INT) AS n_revisits,
      |       TRUE AS digest_ok,
      |       TRUE AS refers_ok
      |FROM documents
      |""".stripMargin

  /** Gzip MEMBER boundaries of a multi-member .warc.gz: (offset,
    * compressedLength) per member, in file order — the geometry a CDX
    * index records so a consumer can range-request one record without
    * reading the file. Parses each member header (RFC 1952: magic,
    * FLG-driven optional fields), then inflates raw deflate to find
    * the compressed end via `Inflater.getBytesRead`, plus the 8-byte
    * CRC/ISIZE trailer. Truncated or hostile input ends the walk with
    * the members found so far (rejects side-channel, like
    * [[warcRecordsOf]]); total inflated bytes gated at 2^26. */
  private[graft] def gzipMemberSpans(b: Array[Byte]): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var p = 0
    var totalOut = 0L
    while (p + 10 <= b.length && (b(p) & 0xff) == 0x1f &&
      (b(p + 1) & 0xff) == 0x8b && b(p + 2) == 8) {
      val flg = b(p + 3) & 0xff
      var q = p + 10
      if ((flg & 4) != 0) { // FEXTRA
        if (q + 2 > b.length) return out.toSeq
        val xlen = (b(q) & 0xff) | ((b(q + 1) & 0xff) << 8)
        q += 2 + xlen
      }
      if ((flg & 8) != 0) { // FNAME, NUL-terminated
        while (q < b.length && b(q) != 0) q += 1
        q += 1
      }
      if ((flg & 16) != 0) { // FCOMMENT
        while (q < b.length && b(q) != 0) q += 1
        q += 1
      }
      if ((flg & 2) != 0) q += 2 // FHCRC
      if (q >= b.length) return out.toSeq
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, q, b.length - q)
        val buf = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          totalOut += n
          if (totalOut > (1L << 26)) return out.toSeq
          if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
            return out.toSeq // truncated / FDICT: refuse, never hang
        }
        val end = q + inf.getBytesRead.toInt + 8 // + CRC32 + ISIZE
        if (end > b.length) return out.toSeq
        out += ((p, end - p))
        p = end
      } catch {
        case _: java.util.zip.DataFormatException => return out.toSeq
      } finally inf.end()
    }
    out.toSeq
  }

  /** CDX INDEX GENERATION (`q_warc_cdx`) — the Common Crawl CDX-JSON
    * line per indexable record (responses + revisits; warcinfo is
    * container metadata): `urlkey` (SURT via
    * [[graft.ops.UrlOps.surtKey]] — LAWED against the same in-plan
    * `canonicalizeUrl` every URL query uses), 14-digit timestamp from
    * WARC-Date, original URL, HTTP status parsed from the stored
    * payload, mime (`warc/revisit` for revisits, per convention), the
    * warcinfo filename, and the record's gzip-member geometry proven
    * by CONSUMPTION: `slice_ok` re-decompresses ONLY the
    * [offset, offset+length) slice — the range request a CDX consumer
    * issues — and checks it re-parses to the same record (type, URI,
    * digest); `digest_ok` recomputes the response payload sha1-base32
    * and resolves every revisit against it. Fixture URLs are messy
    * (upper-case scheme/host, default port, tracking params, fragment)
    * so the urlkey column exercises canonicalization; id%11==5 docs
    * carry a real non-default port that SURT must keep; id%9==4 docs
    * return 404. Map-only decode + one codegen'd projection for the
    * key: at 100 TB this is the scan-shaped indexing pass CC runs. */
  def warcCdxQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { docs =>
        docs.flatMap { case (id, text) =>
          // ---- fixture: one .warc.gz per doc (warcinfo + response +
          // id%3 revisits, every record its own gzip member)
          val g = id % 7
          val port = if (id % 11 == 5) ":8080" else ":80"
          val url = s"HTTP://WWW.Example$g.COM$port/doc/$id" +
            "?utm_source=x&b=2&a=1#frag"
          val statusLine = if (id % 9 == 4) "404 Not Found" else "200 OK"
          val html = htmlOf(id, text).getBytes("UTF-8")
          val http = (s"HTTP/1.1 $statusLine\r\nContent-Type: text/html" +
            s"\r\nContent-Length: ${html.length}\r\n\r\n")
            .getBytes("UTF-8") ++ html
          val digest = "sha1:" + sha1Base32(html)
          val info = warcRecord("warcinfo",
            Seq("WARC-Filename" -> s"crawl-$id.warc.gz"),
            "software: graft-crawler/1.0\r\n".getBytes("UTF-8"))
          val resp = warcRecord("response",
            Seq("WARC-Target-URI" -> url,
              "WARC-Payload-Digest" -> digest,
              "Content-Type" -> "application/http; msgtype=response"),
            http)
          val headOnly = ("HTTP/1.1 200 OK\r\nContent-Type: text/html" +
            "\r\n\r\n").getBytes("UTF-8")
          val revisits = (0 until (id % 3).toInt).map { _ =>
            warcRecord("revisit",
              Seq("WARC-Target-URI" -> url,
                "WARC-Refers-To-Target-URI" -> url,
                "WARC-Payload-Digest" -> digest,
                "WARC-Profile" ->
                  "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                "Content-Type" -> "application/http; msgtype=response"),
              headOnly)
          }
          val warc = (Seq(info, resp) ++ revisits).map(gzipMember)
            .fold(Array.emptyByteArray)(_ ++ _)
          // ---- index: member spans + sequential record walk
          val spans = gzipMemberSpans(warc)
          val recs = warcRecordsOf(warc)
          if (spans.length != recs.length) Iterator.empty
          else {
            var filename = ""
            var respDigest = ""
            var seq = 0
            spans.zip(recs).iterator.flatMap { case ((off, clen), (hs, payload)) =>
              def h(k: String): Option[String] = hs.get(k.toLowerCase)
              val typ = h("WARC-Type").getOrElse("")
              // consumption proof: the slice alone must re-parse to
              // the same record
              val slice = java.util.Arrays.copyOfRange(warc, off, off + clen)
              val re = warcRecordsOf(slice)
              val sliceOk = re.length == 1 &&
                re.head._1.get("warc-type").contains(typ) &&
                re.head._1.get("warc-target-uri") == h("WARC-Target-URI") &&
                re.head._1.get("warc-payload-digest") == h("WARC-Payload-Digest") &&
                java.util.Arrays.equals(re.head._2, payload)
              typ match {
                case "warcinfo" =>
                  filename = h("WARC-Filename").getOrElse("")
                  if (!sliceOk) filename = "" // poisons every row's filename
                  None
                case "response" =>
                  val cut = headBodyCut(payload)
                  val status = new String(payload, 0,
                    math.max(0, math.min(payload.length, 12)), "UTF-8")
                    .split(" ").lift(1).getOrElse("-")
                  val body = if (cut < 0) Array.emptyByteArray
                  else java.util.Arrays.copyOfRange(payload, cut + 4,
                    payload.length)
                  respDigest = "sha1:" + sha1Base32(body)
                  val digestOk = cut >= 0 &&
                    h("WARC-Payload-Digest").contains(respDigest)
                  val row = (id, seq, "response",
                    h("WARC-Target-URI").getOrElse(""),
                    h("WARC-Date").getOrElse(""), status, "text/html",
                    filename, sliceOk, digestOk)
                  seq += 1
                  Some(row)
                case "revisit" =>
                  val status = new String(payload, 0,
                    math.max(0, math.min(payload.length, 12)), "UTF-8")
                    .split(" ").lift(1).getOrElse("-")
                  val digestOk =
                    h("WARC-Payload-Digest").contains(respDigest) &&
                      h("WARC-Refers-To-Target-URI") == h("WARC-Target-URI")
                  val row = (id, seq, "revisit",
                    h("WARC-Target-URI").getOrElse(""),
                    h("WARC-Date").getOrElse(""), status, "warc/revisit",
                    filename, sliceOk, digestOk)
                  seq += 1
                  Some(row)
                case _ => None
              }
            }
          }
        }
      }
      .toDF("doc_id", "seq", "rec_type", "url", "warc_date", "status",
        "mime", "filename", "slice_ok", "digest_ok")
    rows.select(col("doc_id"), col("seq").cast("int").as("seq"),
      col("rec_type"),
      graft.ops.UrlOps.surtKey(col("url")).as("urlkey"),
      col("url"),
      date_format(to_timestamp(col("warc_date"),
        "yyyy-MM-dd'T'HH:mm:ssX"), "yyyyMMddHHmmss").as("ts"),
      col("status"), col("mime"), col("filename"),
      col("slice_ok"), col("digest_ok"))
  }

  val warcCdxOracle: String =
    """WITH t AS (
      |  SELECT doc_id, s
      |  FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS INT))) u(s))
      |SELECT doc_id, CAST(s AS INT) AS seq,
      |       CASE WHEN s = 0 THEN 'response' ELSE 'revisit' END AS rec_type,
      |       'com,example' || CAST(doc_id % 7 AS VARCHAR) ||
      |         CASE WHEN doc_id % 11 = 5 THEN ':8080' ELSE '' END ||
      |         ')/doc/' || CAST(doc_id AS VARCHAR) || '?a=1&b=2' AS urlkey,
      |       'HTTP://WWW.Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
      |         CASE WHEN doc_id % 11 = 5 THEN ':8080' ELSE ':80' END ||
      |         '/doc/' || CAST(doc_id AS VARCHAR) ||
      |         '?utm_source=x&b=2&a=1#frag' AS url,
      |       '20240601000000' AS ts,
      |       CASE WHEN s > 0 THEN '200'
      |            WHEN doc_id % 9 = 4 THEN '404' ELSE '200' END AS status,
      |       CASE WHEN s = 0 THEN 'text/html'
      |            ELSE 'warc/revisit' END AS mime,
      |       'crawl-' || CAST(doc_id AS VARCHAR) || '.warc.gz' AS filename,
      |       TRUE AS slice_ok,
      |       TRUE AS digest_ok
      |FROM t
      |""".stripMargin

  /** HTTP `Transfer-Encoding: chunked` decode (RFC 9112 §7.1) — the
    * step BEFORE Content-Encoding: raw-capture WARCs store response
    * bodies exactly as sent, and HTTP/1.1 responses are routinely
    * chunked. Chunk-size lines are hex (either case) with optional
    * `;ext` chunk extensions dropped; each chunk body ends in CRLF;
    * the 0-size last chunk may carry trailer fields (ignored) up to
    * the final empty line — tolerated missing on truncated captures
    * after a complete 0-chunk. Hostile/malformed → None, never
    * throws; output gated at 2^26 bytes. */
  private[graft] def dechunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    def readLine(): String = {
      val start = p
      while (p + 1 < body.length &&
        !(body(p) == '\r' && body(p + 1) == '\n')) {
        p += 1
        if (p - start > 1024) return null // hostile long line
      }
      if (p + 1 >= body.length) return null
      val s = new String(body, start, p - start,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      p += 2
      s
    }
    while (true) {
      val line = readLine()
      if (line == null) return None
      val sizeStr = line.takeWhile(_ != ';').trim
      if (sizeStr.isEmpty ||
        !sizeStr.forall(c => Character.digit(c, 16) >= 0)) return None
      if (sizeStr.length > 7) return None // > 2^28: hostile
      val size = Integer.parseInt(sizeStr, 16)
      if (size == 0) {
        // trailer section: fields until the empty line (or clean EOF)
        var t = readLine()
        while (t != null && t.nonEmpty) t = readLine()
        return Some(out.toByteArray)
      }
      if (p + size + 2 > body.length) return None
      out.write(body, p, size)
      p += size
      if (!(body(p) == '\r' && body(p + 1) == '\n')) return None
      p += 2
      if (out.size > (1 << 26)) return None
    }
    None // unreachable
  }

  /** Chunked-framing writer (fixture side): varying chunk sizes, an
    * uppercase-hex arm, a chunk extension, and a trailer field — the
    * parser surface real origins exercise. */
  private[graft] def chunkFrame(body: Array[Byte], seed: Long): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit =
      out.write(s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    var p = 0
    var i = 0
    while (p < body.length) {
      val n = math.min(body.length - p,
        Seq(777, 1, 4096, 63)((i + seed.toInt % 4).abs % 4))
      val hexStr = if (i % 2 == 0) n.toHexString else n.toHexString.toUpperCase
      val ext = if (i == 1) ";graft=1" else ""
      w(s"$hexStr$ext\r\n")
      out.write(body, p, n)
      w("\r\n")
      p += n
      i += 1
    }
    w("0\r\n")
    if (seed % 2 == 0) w("X-Trailer: graft\r\n")
    w("\r\n")
    out.toByteArray
  }

  /** HTTP `Content-Encoding` dispatch — the decode step between a WARC
    * response and its body that a crawl pipeline runs on every record:
    * identity, gzip (multi-member tolerated), deflate (zlib-wrapped,
    * with the raw-deflate fallback real servers force on clients), and
    * brotli via [[graft.functions.BrotliCodec]]. Unknown codings or
    * hostile payloads → None; output gated at 2^26 bytes. */
  private[graft] def decodeContentEncoding(enc: String,
                                           body: Array[Byte])
      : Option[Array[Byte]] =
    enc.trim.toLowerCase match {
      case "" | "identity" => Some(body)
      case "gzip" | "x-gzip" =>
        try {
          val gz = new java.util.zip.GZIPInputStream(
            new java.io.ByteArrayInputStream(body))
          val out = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](8192)
          var n = gz.read(tmp)
          while (n >= 0 && out.size <= (1 << 26)) {
            out.write(tmp, 0, n); n = gz.read(tmp)
          }
          if (out.size > (1 << 26)) None else Some(out.toByteArray)
        } catch { case _: java.io.IOException => None }
      case "deflate" =>
        def inflateWith(raw: Boolean): Option[Array[Byte]] = {
          val inf = new java.util.zip.Inflater(raw)
          try {
            inf.setInput(body)
            val out = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!inf.finished() && out.size <= (1 << 26)) {
              val n = inf.inflate(tmp)
              // n == 0 while unfinished: truncated input, or a zlib
              // FDICT stream demanding a preset dictionary we don't
              // have — both are refusals, never a spin
              if (n == 0 && (inf.needsInput() || inf.needsDictionary()))
                return None
              out.write(tmp, 0, n)
            }
            if (out.size > (1 << 26)) None else Some(out.toByteArray)
          } catch {
            case _: java.util.zip.DataFormatException => None
          } finally inf.end()
        }
        inflateWith(raw = false).orElse(inflateWith(raw = true))
      case "br" => graft.functions.BrotliCodec.decode(body)
      case _ => None
    }

  /** WARC responses across the four real web content-codings: per doc
    * one response whose body is the formula page under identity / gzip
    * / deflate, or (every 4th doc) a REFERENCE-encoder brotli stream
    * from [[graft.functions.BrotliCliFixtures]] — the full pipeline
    * shape: gzip-member container → WARC record → HTTP head/body cut →
    * Content-Encoding dispatch → bytes. Map-only. */
  def warcContentEncodingQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.BrotliCliFixtures
    val nFix = BrotliCliFixtures.all.length
    Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { case (id, text) =>
          val enc = Seq("identity", "gzip", "deflate", "br")((id % 4).toInt)
          val html = htmlOf(id, text).getBytes("UTF-8")
          val body: Array[Byte] = enc match {
            case "identity" => html
            case "gzip" => gzipMember(html)
            case "deflate" =>
              val d = new java.util.zip.Deflater()
              d.setInput(html); d.finish()
              val out = new java.io.ByteArrayOutputStream()
              val tmp = new Array[Byte](8192)
              while (!d.finished()) out.write(tmp, 0, d.deflate(tmp))
              d.end()
              out.toByteArray
            case _ => BrotliCliFixtures.all(((id / 4) % nFix).toInt).stream
          }
          val encHeader =
            if (enc == "identity") "" else s"Content-Encoding: $enc\r\n"
          // every other doc ships Transfer-Encoding: chunked on top of
          // the content coding (RFC order: dechunk FIRST) — chunked
          // responses carry no Content-Length
          val chunked = id % 2 == 0
          val wire = if (chunked) chunkFrame(body, id) else body
          val framing =
            if (chunked) "Transfer-Encoding: chunked\r\n"
            else s"Content-Length: ${body.length}\r\n"
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
            encHeader + framing + "\r\n")
            .getBytes("UTF-8") ++ wire
          val resp = warcRecord("response",
            Seq("WARC-Target-URI" -> s"http://example.com/doc/$id",
                "Content-Type" -> "application/http; msgtype=response"),
            http)
          val warc = gzipMember(resp)
          // ---- the read side
          warcRecordsOf(warc).flatMap { case (_, payload) =>
            val cut = headBodyCut(payload)
            if (cut < 0) None
            else {
              val head = new String(payload, 0, cut, "ISO-8859-1")
              def header(name: String): Option[String] = head.linesIterator
                .find(_.toLowerCase.startsWith(name + ":"))
                .map(_.split(":", 2)(1).trim)
              val ce = header("content-encoding").getOrElse("identity")
              val te = header("transfer-encoding")
                .exists(_.toLowerCase.contains("chunked"))
              val raw = java.util.Arrays.copyOfRange(payload, cut + 4,
                payload.length)
              val deframed = if (te) dechunk(raw) else Some(raw)
              deframed.flatMap(decodeContentEncoding(ce, _)).map { content =>
                (id, ce, te, content.length.toLong,
                  md.digest(content).map("%02x".format(_)).mkString)
              }
            }
          }
        }
      }
      .toDF("doc_id", "encoding", "chunked", "content_len", "content_md5")
  }

  val warcContentEncodingOracle: String = {
    val fx = graft.functions.BrotliCliFixtures.all
    val rows = fx.zipWithIndex
      .map { case (f, v) => s"($v, ${f.outLen}, '${f.outMd5}')" }
      .mkString(",\n        ")
    s"""WITH exp(variant, content_len, content_md5) AS (VALUES
       |        $rows),
       |h AS (
       |  SELECT doc_id,
       |         '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) ||
       |         '</title></head><body><h1>Doc ' || CAST(doc_id AS VARCHAR) ||
       |         '</h1><p>' || replace(text, ' ', '</p><p>') ||
       |         '</p></body></html>' AS html
       |  FROM documents)
       |SELECT h.doc_id,
       |       CASE h.doc_id % 4 WHEN 0 THEN 'identity' WHEN 1 THEN 'gzip'
       |            WHEN 2 THEN 'deflate' ELSE 'br' END AS encoding,
       |       h.doc_id % 2 = 0 AS chunked,
       |       CASE WHEN h.doc_id % 4 = 3 THEN e.content_len
       |            ELSE CAST(length(html) AS BIGINT) END AS content_len,
       |       CASE WHEN h.doc_id % 4 = 3 THEN e.content_md5
       |            ELSE md5(html) END AS content_md5
       |FROM h LEFT JOIN exp e
       |  ON h.doc_id % 4 = 3 AND e.variant = CAST((h.doc_id // 4) % ${fx.length} AS INT)
       |""".stripMargin
  }

  /** WOFF2 web-font census — header + directory + reference-brotli
    * blob over the embedded [[graft.functions.Woff2Fixtures]] (the
    * container ships no font tooling, so fixtures carry reference-
    * compressed blobs the way [[zstdCliQuery]]'s frames do): per doc
    * one fixture, reporting the table count, whether the blob
    * decompresses to the directory's exact length sum, and the
    * extracted `name` table's md5. Map-only. */
  def woff2CensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Woff2Codec, Woff2Fixtures}
    val nFix = Woff2Fixtures.all.length
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.flatMap { id =>
          val v = (id % nFix).toInt
          val f = Woff2Fixtures.all(v)
          for {
            m <- Woff2Codec.census(f.bytes)
            name <- Woff2Codec.extractTable(f.bytes, "name")
          } yield (id, v, m.numTables, m.blobOk, m.blobLen,
            md.digest(name).map("%02x".format(_)).mkString)
        }
      }
      .toDF("doc_id", "variant", "n_tables", "blob_ok", "blob_len",
        "name_md5")
      .select(col("doc_id"), col("variant").cast("int").as("variant"),
        col("n_tables").cast("int").as("n_tables"), col("blob_ok"),
        col("blob_len"), col("name_md5"))
  }

  val woff2CensusOracle: String = {
    val fx = graft.functions.Woff2Fixtures.all
    val rows = fx.zipWithIndex
      .map { case (f, v) => s"($v, ${f.nTables}, ${f.blobLen}, '${f.nameMd5}')" }
      .mkString(",\n        ")
    s"""WITH exp(variant, n_tables, blob_len, name_md5) AS (VALUES
       |        $rows)
       |SELECT d.doc_id,
       |       CAST(e.variant AS INT) AS variant,
       |       CAST(e.n_tables AS INT) AS n_tables,
       |       TRUE AS blob_ok,
       |       CAST(e.blob_len AS BIGINT) AS blob_len,
       |       e.name_md5
       |FROM documents d
       |JOIN exp e ON e.variant = CAST(d.doc_id % ${fx.length} AS INT)
       |""".stripMargin
  }

  /** TRANSFORMED-glyf reconstruction census (round 13): each doc is a
    * WOFF2 whose glyf/loca use transform version 0 — woff2_compress's
    * default — so extraction must run the spec §5.1 reconstruction
    * (triplet coordinates, 255UInt16 point counts, bbox bitmap,
    * composite passthrough, loca resynthesis). Features are counted
    * from the REBUILT TrueType tables and are formula-predictable per
    * doc id. Map-only. */
  def woff2GlyfQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{Woff2Codec, Woff2Fixtures}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val shortLoca = id % 2 == 0
          val woff = Woff2Fixtures.writeTransformedWoff2(id, shortLoca,
            overlapBitmap = id % 5 == 0, withHmtx = true)
          for {
            glyf <- Woff2Codec.extractTable(woff, "glyf")
            loca <- Woff2Codec.extractTable(woff, "loca")
            f <- Woff2Codec.glyfFeatures(glyf, loca, shortLoca)
            hmtx <- Woff2Codec.extractTable(woff, "hmtx")
          } yield {
            // sum of reconstructed advance widths (hmtx transform v1)
            val nh = f.nGlyphs - 1
            var adv = 0L
            var i = 0
            while (i < nh) {
              adv += ((hmtx(4 * i) & 0xff) << 8) | (hmtx(4 * i + 1) & 0xff)
              i += 1
            }
            (id, f.nGlyphs, f.nContours, f.nPoints.toLong,
              f.nComposites, f.nEmpty, adv)
          }
        }
      }
      .toDF("doc_id", "n_glyphs", "n_contours", "n_points",
        "n_composites", "n_empty", "adv_sum")
      .select(col("doc_id"), col("n_glyphs").cast("int").as("n_glyphs"),
        col("n_contours").cast("int").as("n_contours"), col("n_points"),
        col("n_composites").cast("int").as("n_composites"),
        col("n_empty").cast("int").as("n_empty"), col("adv_sum"))
  }

  val woff2GlyfOracle: String =
    """WITH g AS (
      |  SELECT doc_id, gi
      |  FROM documents,
      |       unnest(generate_series(0, CAST(3 + doc_id % 3 AS INT))) t(gi))
      |SELECT doc_id,
      |       CAST(4 + doc_id % 3 AS INT) AS n_glyphs,
      |       CAST(SUM(CASE WHEN gi % 4 = 1 THEN 1
      |                     WHEN gi % 4 = 2 THEN 2 ELSE 0 END) AS INT)
      |         AS n_contours,
      |       CAST(SUM(CASE WHEN gi % 4 = 1 THEN 3 + (doc_id + gi) % 4
      |                     WHEN gi % 4 = 2 THEN 6 ELSE 0 END) AS BIGINT)
      |         AS n_points,
      |       CAST(SUM(CASE WHEN gi % 4 = 3 THEN 1 ELSE 0 END) AS INT)
      |         AS n_composites,
      |       CAST(SUM(CASE WHEN gi % 4 = 0 THEN 1 ELSE 0 END) AS INT)
      |         AS n_empty,
      |       CAST(500 * (3 + doc_id % 3) +
      |            10 * (2 + doc_id % 3) * (3 + doc_id % 3) // 2 AS BIGINT)
      |         AS adv_sum
      |FROM g GROUP BY doc_id
      |""".stripMargin

  // -------------------------------------------------- charset round-trip

  /** Per-mode non-ASCII marker text (unicode escapes, NOT literals, so
    * the Scala source encoding can never drift from the oracle's chr()
    * construction): each token contains characters that only decode
    * correctly under the declared charset — € (euro) is 0x80 in
    * windows-1252 and absent from latin-1; ☃ (snowman) needs a
    * 2-byte encoding. */
  private[graft] def charsetToken(mode: Int): String = mode match {
    case 0 => "na\u00efve caf\u00e9"                               // UTF-8, declared by <meta>
    case 1 => "caf\u00e9 r\u00e9sum\u00e9"                          // ISO-8859-1 via Content-Type
    case 2 => "price \u20ac99 \u2013 now"                          // windows-1252 via <meta http-equiv>
    case _ => "snow \u2603 unicode"                               // UTF-16LE, BOM-sniffed
  }

  /** MIXED-ENCODING crawl fixture: one response record per document,
    * whose HTML body is encoded per `doc_id % 4` as UTF-8 / ISO-8859-1 /
    * windows-1252 / BOM'd UTF-16LE, with the charset declared exactly
    * where real pages declare it (meta tag, Content-Type parameter, or
    * only the BOM). Real crawls are majority non-UTF-8 in exactly these
    * three families; hardcoded UTF-8 decode turns them into mojibake
    * shingles. */
  def warcCharsetPayloads(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val mode = (id % 4).toInt
          val token = charsetToken(mode)
          val meta = mode match {
            case 0 => "<meta charset=\"utf-8\">"
            case 2 => "<meta http-equiv=\"Content-Type\" content=\"text/html; charset=windows-1252\">"
            case _ => ""
          }
          val html = s"<html><head>$meta</head><body><p>doc $id :: $token</p></body></html>"
          val (ctypeHdr, bodyBytes) = mode match {
            case 0 => ("text/html", html.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            case 1 => ("text/html; charset=ISO-8859-1",
              html.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
            case 2 => ("text/html", html.getBytes("windows-1252"))
            case _ => ("text/html",
              Array(0xFF.toByte, 0xFE.toByte) ++
                html.getBytes(java.nio.charset.StandardCharsets.UTF_16LE))
          }
          val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $ctypeHdr\r\n" +
            s"Content-Length: ${bodyBytes.length}\r\n\r\n").getBytes("UTF-8") ++ bodyBytes
          val resp = warcRecord("response",
            Seq("WARC-Target-URI" -> s"http://example.com/doc/$id",
                "Content-Type" -> "application/http; msgtype=response"),
            http)
          (id, gzipMember(resp))
        }
      }
  }

  /** CHARSET-AWARE extraction gate: runs the identical [[warcExtractFrom]]
    * over the mixed-encoding fixture; the md5 only matches when every
    * body was transcoded to the right unicode text before the HTML strip
    * (the oracle builds the expected UTF-8 text by formula). */
  def warcCharsetQuery(spark: SparkSession, dir: String): DataFrame =
    warcExtractFrom(warcCharsetPayloads(spark, dir).toDF("doc_id", "payload"))
      .select(col("doc_id"), col("status"), col("content_type"), col("text_md5"))

  val warcCharsetOracle: String =
    """SELECT doc_id,
      |       200 AS status,
      |       CASE WHEN doc_id % 4 = 1 THEN 'text/html; charset=ISO-8859-1'
      |            ELSE 'text/html' END AS content_type,
      |       md5('doc ' || CAST(doc_id AS VARCHAR) || ' :: ' ||
      |           CASE CAST(doc_id % 4 AS INT)
      |             WHEN 0 THEN 'na' || chr(239) || 've caf' || chr(233)
      |             WHEN 1 THEN 'caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233)
      |             WHEN 2 THEN 'price ' || chr(8364) || '99 ' || chr(8211) || ' now'
      |             ELSE 'snow ' || chr(9731) || ' unicode'
      |           END) AS text_md5
      |FROM documents
      |""".stripMargin

  // -------------------------------------------------- zstd frame layer

  /** Zstd raw/RLE frame extraction — modern pipelines ship payloads
    * zstd-framed, and the engine must at minimum census ANY frame's
    * block structure and fully decode the entropy-free shapes
    * (RFC 8878 raw + RLE blocks). The fixture frames carry a
    * formula-known text with a planted RLE run, so content length,
    * digest, and the block census are all oracle-predicted. Map-only
    * per-payload walk, scan-shaped at 100 TB. */
  def zstdExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.ZstdCodec
    import graft.functions.ZstdCodec.{RawPart, RlePart}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val frame = ZstdCodec.writeFrame(Seq(
            RawPart(s"zstd doc $id ".getBytes("UTF-8")),
            RlePart('A'.toByte, 10 + (id % 50).toInt),
            RawPart(" end".getBytes("UTF-8"))))
          (id, frame)
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, frame) =>
          for {
            m <- graft.functions.ZstdCodec.census(frame)
            c <- graft.functions.ZstdCodec.extract(frame)
          } yield (id, new String(c, "UTF-8"), m.nBlocks, m.nRle,
            m.contentSize)
        }
      }
      .toDF("doc_id", "content", "n_blocks", "n_rle", "content_size")
      .select(col("doc_id"),
        length(col("content")).cast("int").as("content_len"),
        md5(col("content")).as("content_md5"),
        col("n_blocks").cast("int").as("n_blocks"),
        col("n_rle").cast("int").as("n_rle"),
        col("content_size").cast("long").as("content_size"))
  }

  val zstdExtractOracle: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         'zstd doc ' || CAST(doc_id AS VARCHAR) || ' '
      |           || repeat('A', CAST(10 + doc_id % 50 AS INT))
      |           || ' end' AS content
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(length(content) AS INT) AS content_len,
      |       md5(content) AS content_md5,
      |       CAST(3 AS INT) AS n_blocks,
      |       CAST(1 AS INT) AS n_rle,
      |       CAST(length(content) AS BIGINT) AS content_size
      |FROM c
      |""".stripMargin

  /** Entropy-coded zstd round trip: per document a three-block
    * Compressed frame — Huffman literals (1-stream on even ids,
    * 4-stream on odd), an RLE-mode sequence whose match copy OVERLAPS
    * its own output (cyclic window repetition), a treeless second
    * block whose sequence uses repeat-offset 1 carried over from block
    * one, and a literals-only third block; checksum on every third
    * doc. The decoded content is formula-predictable, so the oracle
    * replays literal construction + both match copies in SQL. The
    * encode+decode both run in-plan (map-only, scan-shaped at
    * 100 TB); the reference-CLI agreement for both directions is
    * spec-gated in Round10ZstdSpec. */
  def zstdEntropyQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.ZstdCodec
    import graft.functions.ZstdCodec.{CompBlock, Lit1Stream, Lit4Stream, LitTreeless, Seqn}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val p = 8 + (id % 5).toInt
          val pat = "abcdefghijkl".take(p)
          val l1 = s"zstd doc $id mid " + pat
          val l2 = " mid " + pat
          val l3 = s" tail $id end."
          val mode1 = if (id % 2 == 0) Lit1Stream else Lit4Stream
          val mode2 = if (id % 3 == 0) Lit1Stream else LitTreeless
          val (frame, _) = ZstdCodec.writeCompressedFrame(Seq(
            CompBlock(l1.getBytes("US-ASCII"),
              Seq(Seqn(ll = l1.length, ml = 2 * p + 3, offset = p)), mode1),
            CompBlock(l2.getBytes("US-ASCII"),
              Seq(Seqn(ll = l2.length, ml = p + (id % 3).toInt + 3, repCode = 1)), mode2),
            CompBlock(l3.getBytes("US-ASCII"), Nil)),
            checksum = id % 3 == 0)
          for {
            m <- ZstdCodec.census(frame)
            c <- ZstdCodec.extract(frame)
          } yield (id, new String(c, "US-ASCII"), m.nBlocks, m.nCompressed)
        }
      }
      .toDF("doc_id", "content", "n_blocks", "n_compressed")
      .select(col("doc_id"),
        length(col("content")).cast("int").as("content_len"),
        md5(col("content")).as("content_md5"),
        col("n_blocks").cast("int").as("n_blocks"),
        col("n_compressed").cast("int").as("n_compressed"))
  }

  val zstdEntropyOracle: String =
    """WITH c AS (
      |  SELECT doc_id,
      |         left('abcdefghijkl', CAST(8 + doc_id % 5 AS INT)) AS pat,
      |         CAST(8 + doc_id % 5 AS INT) AS p
      |  FROM documents),
      |built AS (
      |  SELECT doc_id,
      |         'zstd doc ' || CAST(doc_id AS VARCHAR) || ' mid ' || pat
      |           || left(repeat(pat, 4), 2 * p + 3)
      |           || ' mid ' || pat
      |           || left(repeat(pat, 4), p + CAST(doc_id % 3 AS INT) + 3)
      |           || ' tail ' || CAST(doc_id AS VARCHAR) || ' end.' AS content
      |  FROM c)
      |SELECT doc_id,
      |       CAST(length(content) AS INT) AS content_len,
      |       md5(content) AS content_md5,
      |       CAST(3 AS INT) AS n_blocks,
      |       CAST(3 AS INT) AS n_compressed
      |FROM built
      |""".stripMargin

  /** Decode the eight embedded reference-CLI zstd frames (entropy-coded
    * by the real `zstd` binary at level 3: FSE sequence tables, 4-stream
    * Huffman literals, repeat offsets, content checksums) — each doc
    * selects one by id. The oracle carries the fixture-generation-time
    * lengths and md5s as constants, so the gate proves this decoder
    * reproduces the reference encoder's content exactly. */
  def zstdCliQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{ZstdCliFixtures, ZstdCodec}
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.flatMap { id =>
          val v = (id % 8).toInt
          val frame = ZstdCliFixtures.frames(v)
          for {
            m <- ZstdCodec.census(frame)
            c <- ZstdCodec.extract(frame)
          } yield (id, v, c.length,
            md.digest(c).map("%02x".format(_)).mkString, m.nCompressed)
        }
      }
      .toDF("doc_id", "variant", "content_len", "content_md5", "n_compressed")
      .select(col("doc_id"), col("variant").cast("int").as("variant"),
        col("content_len").cast("int").as("content_len"), col("content_md5"),
        col("n_compressed").cast("int").as("n_compressed"))
  }

  val zstdCliOracle: String = {
    val rows = graft.functions.ZstdCliFixtures.expected
      .map { case (v, n, h, nc) => s"($v, $n, '$h', $nc)" }.mkString(",\n        ")
    s"""WITH exp(variant, content_len, content_md5, n_compressed) AS (VALUES
       |        $rows)
       |SELECT d.doc_id,
       |       CAST(e.variant AS INT) AS variant,
       |       CAST(e.content_len AS INT) AS content_len,
       |       e.content_md5,
       |       CAST(e.n_compressed AS INT) AS n_compressed
       |FROM documents d
       |JOIN exp e ON e.variant = CAST(d.doc_id % 8 AS INT)
       |""".stripMargin
  }

  /** Brotli extraction over REFERENCE-ENCODER streams: each doc picks
    * one of the embedded [[graft.functions.BrotliCliFixtures]] streams
    * (brotli 1.2.0 output at qualities 1-11 over text / binary / UTF-8
    * payloads, incl. static-dictionary words, transforms, and context
    * maps) and fully decodes it with [[graft.functions.BrotliCodec]] —
    * the oracle carries the reference lengths and md5s. Map-only. */
  def brotliExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.{BrotliCliFixtures, BrotliCodec}
    val nFix = BrotliCliFixtures.all.length
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.flatMap { id =>
          val v = (id % nFix).toInt
          val f = BrotliCliFixtures.all(v)
          BrotliCodec.decode(f.stream).map { c =>
            (id, v, c.length, md.digest(c).map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF("doc_id", "variant", "content_len", "content_md5")
      .select(col("doc_id"), col("variant").cast("int").as("variant"),
        col("content_len").cast("int").as("content_len"), col("content_md5"))
  }

  val brotliExtractOracle: String = {
    val fx = graft.functions.BrotliCliFixtures.all
    val rows = fx.zipWithIndex
      .map { case (f, v) => s"($v, ${f.outLen}, '${f.outMd5}')" }
      .mkString(",\n        ")
    s"""WITH exp(variant, content_len, content_md5) AS (VALUES
       |        $rows)
       |SELECT d.doc_id,
       |       CAST(e.variant AS INT) AS variant,
       |       CAST(e.content_len AS INT) AS content_len,
       |       e.content_md5
       |FROM documents d
       |JOIN exp e ON e.variant = CAST(d.doc_id % ${fx.length} AS INT)
       |""".stripMargin
  }

  // ------------------------------------------------ OOXML (docx) layer

  /** Build a minimal valid .docx: a zip with [Content_Types].xml and
    * word/document.xml carrying one w:t run per paragraph. */
  private def writeDocx(paras: Seq[String]): Array[Byte] = {
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""" +
        paras.map(p => s"<w:p><w:r><w:t>${p}</w:t></w:r></w:p>").mkString +
        "</w:body></w:document>"
    val types =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/></Types>"""
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("[Content_Types].xml"))
    z.write(types.getBytes("UTF-8")); z.closeEntry()
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(doc.getBytes("UTF-8")); z.closeEntry()
    z.close()
    bos.toByteArray
  }

  /** OOXML text extraction — office documents are a standard corpus
    * source, and a .docx is a zip whose word/document.xml carries the
    * text in w:t runs. The walk is the container discipline the other
    * archive ops use (bounded member read, malformed zip -> skip), and
    * the XML text pull is the same regexp device as the HTML layer:
    * real container in, plain text out. Per-payload local, map-only. */
  def docxExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.map { id =>
          val n = 1 + (id % 4).toInt
          val paras = (0 until n).map(k => s"Paragraph $k of doc $id")
          (id, writeDocx(paras))
        }
      }
      .mapPartitions { rows =>
        rows.flatMap { case (id, docx) =>
          try {
            val zis = new java.util.zip.ZipInputStream(
              new java.io.ByteArrayInputStream(docx))
            var xml: String = null
            var nEntries = 0
            var e = zis.getNextEntry
            while (e != null) {
              nEntries += 1
              if (e.getName == "word/document.xml") {
                val buf = new java.io.ByteArrayOutputStream()
                val tmp = new Array[Byte](4096)
                var n = zis.read(tmp)
                while (n > 0 && buf.size <= (1 << 22)) {
                  buf.write(tmp, 0, n); n = zis.read(tmp)
                }
                xml = new String(buf.toByteArray, "UTF-8")
              }
              e = zis.getNextEntry
            }
            if (xml == null) None else Some((id, nEntries, xml))
          } catch {
            case _: java.io.IOException => None
            case _: RuntimeException => None
          }
        }
      }
      .toDF("doc_id", "n_entries", "xml")
      .select(col("doc_id"), col("n_entries").cast("int").as("n_entries"),
        size(regexp_extract_all(col("xml"),
          lit("<w:t>(.*?)</w:t>"), lit(1))).cast("int").as("n_paras"),
        md5(array_join(regexp_extract_all(col("xml"),
          lit("<w:t>(.*?)</w:t>"), lit(1)), "\n")).as("text_md5"))
  }

  val docxExtractOracle: String =
    """WITH t AS (
      |  SELECT doc_id,
      |         array_to_string(list_transform(
      |           generate_series(0, doc_id % 4),
      |           k -> 'Paragraph ' || CAST(k AS VARCHAR) || ' of doc '
      |                || CAST(doc_id AS VARCHAR)), chr(10)) AS text
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(2 AS INT) AS n_entries,
      |       CAST(doc_id % 4 + 1 AS INT) AS n_paras,
      |       md5(text) AS text_md5
      |FROM t
      |""".stripMargin

  // ------------------------------------------------ OOXML (xlsx) layer

  /** Build a minimal valid .xlsx: [Content_Types].xml, xl/workbook.xml,
    * xl/sharedStrings.xml (deduplicated `si/t` entries) and
    * xl/worksheets/sheet1.xml. Cells are Left(string) — emitted as a
    * shared string when `shared`, else inline (`t="inlineStr"`) — or
    * Right(number) value cells. */
  def writeXlsx(rows: Seq[Seq[Either[String, Double]]],
                shared: Int => Boolean = _ % 2 == 0): Array[Byte] = {
    def colName(c: Int): String = { // 1-based -> A, B, ..., Z, AA...
      var n = c; val sb = new StringBuilder
      while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]()
    val sb = new StringBuilder
    sb.append("""<sheetData>""")
    var k = 0
    rows.zipWithIndex.foreach { case (cells, r0) =>
      val r = r0 + 1
      sb.append(s"""<row r="$r">""")
      cells.zipWithIndex.foreach { case (cell, c0) =>
        val ref = colName(c0 + 1) + r
        cell match {
          case Left(s) =>
            if (shared(k)) {
              val idx = strings.getOrElseUpdate(s, { val i = strings.size; i })
              sb.append(s"""<c r="$ref" t="s"><v>$idx</v></c>""")
            } else
              sb.append(s"""<c r="$ref" t="inlineStr"><is><t>${esc(s)}</t></is></c>""")
            k += 1
          case Right(v) =>
            val txt = if (v == v.floor && !v.isInfinite) v.toLong.toString else v.toString
            sb.append(s"""<c r="$ref"><v>$txt</v></c>""")
            k += 1
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData>")
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        sb.toString + "</worksheet>"
    val sst =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        s"""<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${strings.size}" uniqueCount="${strings.size}">""" +
        strings.keys.map(s => s"<si><t>${esc(s)}</t></si>").mkString +
        "</sst>"
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"/></sheets></workbook>"""
    val types =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/></Types>"""
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    entry("[Content_Types].xml", types)
    entry("xl/workbook.xml", workbook)
    entry("xl/sharedStrings.xml", sst)
    entry("xl/worksheets/sheet1.xml", sheet)
    z.close()
    bos.toByteArray
  }

  // ------------------------------------------------ OOXML (pptx) layer

  /** Build a minimal valid .pptx: [Content_Types].xml plus one
    * ppt/slides/slideN.xml per slide, each carrying one a:t run per
    * paragraph (DrawingML text bodies). */
  def writePptx(slides: Seq[Seq[String]]): Array[Byte] = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/></Types>""")
    slides.zipWithIndex.foreach { case (paras, i) =>
      val body =
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
          """<p:sld xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main" """ +
          """xmlns:a="http://schemas.openxmlformats.org/drawingml/2006/main"><p:cSld><p:spTree>""" +
          paras.map(t =>
            s"<p:sp><p:txBody><a:p><a:r><a:t>${esc(t)}</a:t></a:r></a:p></p:txBody></p:sp>").mkString +
          "</p:spTree></p:cSld></p:sld>"
      entry(s"ppt/slides/slide${i + 1}.xml", body)
    }
    z.close()
    bos.toByteArray
  }

  private val SlideNumRe = java.util.regex.Pattern.compile(
    "^ppt/slides/slide(\\d+)\\.xml$")
  private val AtRe = java.util.regex.Pattern.compile("(?s)<a:t>(.*?)</a:t>")

  /** PPTX slide-text extraction: walks the zip for ppt/slides/slideN.xml
    * members, pulls every a:t run in document order per slide. Returns
    * (slideNumber, runs) sorted by slide number; None for malformed
    * zips or decks with no slide members. */
  def pptxSlides(pptx: Array[Byte]): Option[Seq[(Int, Seq[String])]] =
    try {
      val zis = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(pptx))
      val out = scala.collection.mutable.ArrayBuffer[(Int, Seq[String])]()
      var e = zis.getNextEntry
      while (e != null) {
        val m = SlideNumRe.matcher(e.getName)
        if (m.matches()) {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          var n = zis.read(tmp)
          while (n > 0 && buf.size <= (1 << 22)) { buf.write(tmp, 0, n); n = zis.read(tmp) }
          val xml = new String(buf.toByteArray, "UTF-8")
          val runs = scala.collection.mutable.ArrayBuffer[String]()
          val am = AtRe.matcher(xml)
          while (am.find()) runs += unescXml(am.group(1))
          out += ((m.group(1).toInt, runs.toSeq))
        }
        e = zis.getNextEntry
      }
      if (out.isEmpty) None else Some(out.sortBy(_._1).toSeq)
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** PPTX extraction query: per-doc deck with (id%3)+1 slides, each
    * slide carrying (slide + id%2 + 1) formula paragraphs; one row per
    * slide with run count and joined-text md5. */
  def pptxExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        val md = java.security.MessageDigest.getInstance("MD5")
        ids.flatMap { id =>
          val nSlides = (id % 3).toInt + 1
          val slides = (1 to nSlides).map(s =>
            (0 until s + (id % 2).toInt).map(k =>
              s"slide $s para $k of deck $id"))
          val pptx = writePptx(slides)
          pptxSlides(pptx).toSeq.flatten.map { case (sn, runs) =>
            val text = runs.mkString("\n")
            (id, sn, runs.size,
              md.digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString)
          }
        }
      }
      .toDF("doc_id", "slide_id", "n_runs", "text_md5")
      .select(col("doc_id"), col("slide_id").cast("int").as("slide_id"),
        col("n_runs").cast("int").as("n_runs"), col("text_md5"))
  }

  val pptxExtractOracle: String =
    """WITH s AS (
      |  SELECT doc_id, sn
      |  FROM documents,
      |       unnest(generate_series(1, CAST(doc_id % 3 + 1 AS INT))) u(sn)),
      |t AS (
      |  SELECT doc_id, sn,
      |         array_to_string(list_transform(
      |           generate_series(0, sn + doc_id % 2 - 1),
      |           k -> 'slide ' || CAST(sn AS VARCHAR) || ' para ' ||
      |                CAST(k AS VARCHAR) || ' of deck ' ||
      |                CAST(doc_id AS VARCHAR)), chr(10)) AS text,
      |         CAST(sn + doc_id % 2 AS INT) AS n_runs
      |  FROM s)
      |SELECT doc_id, CAST(sn AS INT) AS slide_id, n_runs, md5(text) AS text_md5
      |FROM t
      |""".stripMargin

  /** One extracted spreadsheet cell. `kind` is `shared`, `inline`, or
    * `number`. */
  final case class XlsxCell(row: Int, col: Int, kind: String, value: String)

  private val CellRe = java.util.regex.Pattern.compile(
    """(?s)<c\s+r="([A-Z]+)(\d+)"([^>]*)>(.*?)</c>""")
  private val VRe = java.util.regex.Pattern.compile("(?s)<v>(.*?)</v>")
  private val IsRe = java.util.regex.Pattern.compile("(?s)<t[^>]*>(.*?)</t>")
  private val SiRe = java.util.regex.Pattern.compile(
    "(?s)<si>\\s*<t[^>]*>(.*?)</t>\\s*</si>")

  private def unescXml(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")

  /** Cell-level .xlsx extraction: walks the zip for xl/sharedStrings.xml
    * and xl/worksheets/sheet1.xml, resolves A1-style refs to (row, col)
    * and `t="s"` cells through the shared-string table. Shared-string
    * indexes out of range, or a sheet with `t="s"` cells but no
    * sharedStrings member, reject the document (None) — silent blanks
    * would corrupt downstream tables. Malformed zips return None. */
  def xlsxCells(xlsx: Array[Byte]): Option[Seq[XlsxCell]] =
    try {
      val zis = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(xlsx))
      var sheet: String = null
      var sst: String = null
      var e = zis.getNextEntry
      var any = false
      while (e != null) {
        any = true
        def readAll(): String = {
          val buf = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          var n = zis.read(tmp)
          while (n > 0 && buf.size <= (1 << 22)) { buf.write(tmp, 0, n); n = zis.read(tmp) }
          new String(buf.toByteArray, "UTF-8")
        }
        if (e.getName == "xl/worksheets/sheet1.xml") sheet = readAll()
        else if (e.getName == "xl/sharedStrings.xml") sst = readAll()
        e = zis.getNextEntry
      }
      if (!any || sheet == null) return None
      val sharedTab = scala.collection.mutable.ArrayBuffer[String]()
      if (sst != null) {
        val m = SiRe.matcher(sst)
        while (m.find()) sharedTab += unescXml(m.group(1))
      }
      val out = scala.collection.mutable.ArrayBuffer[XlsxCell]()
      val cm = CellRe.matcher(sheet)
      while (cm.find()) {
        val colLetters = cm.group(1)
        val row = cm.group(2).toInt
        val attrs = cm.group(3)
        val body = cm.group(4)
        var col = 0
        colLetters.foreach(c => col = col * 26 + (c - 'A' + 1))
        if (attrs.contains("t=\"s\"")) {
          val vm = VRe.matcher(body)
          if (!vm.find()) return None
          val idxOpt = vm.group(1).trim.toIntOption
          if (idxOpt.isEmpty) return None
          val idx = idxOpt.get
          if (idx < 0 || idx >= sharedTab.size) return None
          out += XlsxCell(row, col, "shared", sharedTab(idx))
        } else if (attrs.contains("t=\"inlineStr\"")) {
          val im = IsRe.matcher(body)
          if (!im.find()) return None
          out += XlsxCell(row, col, "inline", unescXml(im.group(1)))
        } else {
          val vm = VRe.matcher(body)
          if (vm.find()) out += XlsxCell(row, col, "number", vm.group(1).trim)
        }
      }
      Some(out.toSeq)
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** XLSX extraction query: a formula grid per document — row r /
    * column c cells rotate shared-string, inline-string, and numeric
    * spellings, with shared strings DEDUPLICATED across cells (every
    * doc repeats one common string so the sst index path is load
    * bearing). Oracle replays the grid, refs, kinds, and values. */
  def xlsxExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val nr = 2 + (id % 3).toInt
          val nc = 2 + (id % 2).toInt
          val grid: Seq[Seq[Either[String, Double]]] =
            (1 to nr).map(r => (1 to nc).map { c =>
              (r + c) % 3 match {
                case 0 => Left(if (c == 1) s"common $id" else s"cell $r $c of $id")
                case 1 => Left(s"inline $r $c")
                case _ => Right((r * 100 + c).toDouble)
              }
            })
          // the writer's `shared` predicate sees every cell's ordinal k;
          // kind by (r+c)%3: 0 -> shared string, 1 -> inline, 2 -> number
          val kinds = (1 to nr).flatMap(r => (1 to nc).map(c => (r + c) % 3))
          val sharedAt: Int => Boolean = { k => kinds(k) == 0 }
          val xlsx = writeXlsx(grid, sharedAt)
          xlsxCells(xlsx).toSeq.flatten.map(cl =>
            (id, cl.row, cl.col, cl.kind, cl.value))
        }
      }
      .toDF("doc_id", "row_id", "col_id", "kind", "value")
      .select(col("doc_id"), col("row_id").cast("int").as("row_id"),
        col("col_id").cast("int").as("col_id"), col("kind"), col("value"))
  }

  val xlsxExtractOracle: String =
    """WITH g AS (
      |  SELECT doc_id, r, c
      |  FROM documents,
      |       unnest(generate_series(1, CAST(2 + doc_id % 3 AS INT))) ur(r),
      |       unnest(generate_series(1, CAST(2 + doc_id % 2 AS INT))) uc(c))
      |SELECT doc_id,
      |       CAST(r AS INT) AS row_id,
      |       CAST(c AS INT) AS col_id,
      |       CASE (r + c) % 3 WHEN 0 THEN 'shared'
      |                        WHEN 1 THEN 'inline'
      |                        ELSE 'number' END AS kind,
      |       CASE (r + c) % 3
      |         WHEN 0 THEN CASE WHEN c = 1
      |           THEN 'common ' || CAST(doc_id AS VARCHAR)
      |           ELSE 'cell ' || CAST(r AS VARCHAR) || ' ' ||
      |                CAST(c AS VARCHAR) || ' of ' || CAST(doc_id AS VARCHAR) END
      |         WHEN 1 THEN 'inline ' || CAST(r AS VARCHAR) || ' ' || CAST(c AS VARCHAR)
      |         ELSE CAST(r * 100 + c AS VARCHAR) END AS value
      |FROM g
      |""".stripMargin

  // --------------------------------------------------------------- EPUB
  //
  // The remaining common zip+XML document container after DOCX/XLSX/PPTX:
  // a `mimetype` member (STORED, first), META-INF/container.xml pointing
  // at the OPF package file, the OPF's manifest (id → href) and spine
  // (reading order by idref), and XHTML content members. Extraction
  // resolves the chain for real — container → OPF → spine order →
  // relative-href members — because real EPUBs list manifest items in
  // arbitrary order and nest content under subdirectories.

  private def escXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Build a minimal valid EPUB: mimetype stored first (the spec's
    * magic-sniffing requirement), container.xml, OPF under OEBPS/ with
    * the manifest deliberately in REVERSE spine order (proves the
    * reader follows the spine, not member order), chapters under a
    * `text/` subdirectory (proves relative-href resolution). */
  def writeEpub(chapters: Seq[(String, String)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val mime = "application/epub+zip".getBytes("US-ASCII")
    val me = new java.util.zip.ZipEntry("mimetype")
    me.setMethod(java.util.zip.ZipEntry.STORED)
    me.setSize(mime.length)
    val crc = new java.util.zip.CRC32(); crc.update(mime)
    me.setCrc(crc.getValue)
    zos.putNextEntry(me); zos.write(mime); zos.closeEntry()
    def entry(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("META-INF/container.xml",
      """<?xml version="1.0"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |  <rootfiles>
        |    <rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/>
        |  </rootfiles>
        |</container>""".stripMargin)
    val manifest = chapters.indices.reverse.map(k =>
      s"""<item id="ch$k" href="text/ch$k.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString("\n    ")
    val spine = chapters.indices.map(k => s"""<itemref idref="ch$k"/>""")
      .mkString("\n    ")
    entry("OEBPS/content.opf",
      s"""<?xml version="1.0"?>
         |<package version="3.0" xmlns="http://www.idpf.org/2007/opf" unique-identifier="id">
         |  <metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
         |    <dc:identifier id="id">graft-fixture</dc:identifier>
         |    <dc:title>${escXml(chapters.headOption.map(_._1).getOrElse("untitled"))}</dc:title>
         |  </metadata>
         |  <manifest>
         |    $manifest
         |  </manifest>
         |  <spine>
         |    $spine
         |  </spine>
         |</package>""".stripMargin)
    for ((k, (title, body)) <- chapters.indices.zip(chapters))
      entry(s"OEBPS/text/ch$k.xhtml",
        s"""<?xml version="1.0" encoding="UTF-8"?>
           |<html xmlns="http://www.w3.org/1999/xhtml">
           |<head><title>${escXml(title)}</title></head>
           |<body><h1>${escXml(title)}</h1><p>${escXml(body)}</p></body>
           |</html>""".stripMargin)
    zos.close()
    bos.toByteArray
  }

  private def attrOf(tag: String, attr: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile(attr + "\\s*=\\s*\"([^\"]*)\"").matcher(tag)
    if (m.find()) Some(m.group(1)) else None
  }

  /** Resolve `href` against the directory of `base` (handles `../`). */
  private[graft] def resolveHref(base: String, href: String): String = {
    val dir = base.lastIndexOf('/') match {
      case -1 => ""
      case i => base.substring(0, i + 1)
    }
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    (dir + href).split('/').foreach {
      case "" | "." => ()
      case ".." => if (parts.nonEmpty) parts.remove(parts.length - 1)
      case p => parts += p
    }
    parts.mkString("/")
  }

  /** EPUB chapter walk: mimetype gate → container.xml rootfile → OPF
    * manifest/spine → spine-ordered (index, href, xhtml) members.
    * Hostile containers (wrong mimetype, missing chain links, oversized
    * members) return None → rejects. */
  def epubChapters(b: Array[Byte]): Option[Seq[(Int, String, String)]] =
    try {
      val members = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
      val zis = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b))
      var e = zis.getNextEntry
      while (e != null && members.size < 4096) {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = zis.read(tmp)
        while (n > 0 && buf.size <= (1 << 22)) { buf.write(tmp, 0, n); n = zis.read(tmp) }
        members(e.getName) = buf.toByteArray
        e = zis.getNextEntry
      }
      val mime = members.get("mimetype")
        .map(m => new String(m, "US-ASCII").trim)
      if (!mime.contains("application/epub+zip")) return None
      val container = members.get("META-INF/container.xml")
        .map(new String(_, "UTF-8")).getOrElse(return None)
      val rootM = java.util.regex.Pattern
        .compile("<rootfile\\b[^>]*>").matcher(container)
      if (!rootM.find()) return None
      val opfPath = attrOf(rootM.group(0), "full-path").getOrElse(return None)
      val opf = members.get(opfPath).map(new String(_, "UTF-8"))
        .getOrElse(return None)
      // manifest id → href
      val hrefs = scala.collection.mutable.HashMap[String, String]()
      val itemM = java.util.regex.Pattern
        .compile("<item\\b[^>]*>").matcher(opf)
      while (itemM.find()) {
        val tag = itemM.group(0)
        for (id <- attrOf(tag, "id"); href <- attrOf(tag, "href"))
          hrefs(id) = href
      }
      // spine order
      val out = Seq.newBuilder[(Int, String, String)]
      val refM = java.util.regex.Pattern
        .compile("<itemref\\b[^>]*>").matcher(opf)
      var idx = 0
      while (refM.find()) {
        val idref = attrOf(refM.group(0), "idref").getOrElse(return None)
        val href = hrefs.getOrElse(idref, return None)
        val path = resolveHref(opfPath, href)
        val xhtml = members.get(path).map(new String(_, "UTF-8"))
          .getOrElse(return None)
        out += ((idx, path, xhtml))
        idx += 1
      }
      if (idx == 0) None else Some(out.result())
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** EPUB TEXT EXTRACTION: one row per spine chapter in reading order,
    * body text pulled from the XHTML with codegen'd column regexes
    * (same zero-UDF shape as the DOCX/PPTX queries). The fixture's
    * reversed manifest and `text/` subdirectory make the chain
    * resolution load-bearing, not decorative. */
  def epubExtractQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val n = (id % 3).toInt + 1
          val chapters = (0 until n).map(k =>
            (s"Chapter $k", s"Chapter $k body of doc $id"))
          epubChapters(writeEpub(chapters)).toSeq.flatten.map {
            case (idx, href, xhtml) => (id, idx, href, xhtml)
          }
        }
      }
      .toDF("doc_id", "spine_idx", "href", "xhtml")
      .select(col("doc_id"), col("spine_idx").cast("int").as("spine_idx"),
        col("href"),
        regexp_extract(col("xhtml"), "<title>(.*?)</title>", 1).as("title"),
        md5(regexp_extract(col("xhtml"), "<p>(.*?)</p>", 1)).as("body_md5"))
  }

  val epubExtractOracle: String =
    """SELECT doc_id,
      |       CAST(k AS INT) AS spine_idx,
      |       'OEBPS/text/ch' || CAST(k AS VARCHAR) || '.xhtml' AS href,
      |       'Chapter ' || CAST(k AS VARCHAR) AS title,
      |       md5('Chapter ' || CAST(k AS VARCHAR) || ' body of doc '
      |           || CAST(doc_id AS VARCHAR)) AS body_md5
      |FROM documents, unnest(generate_series(0, CAST(doc_id % 3 AS INT))) u(k)
      |""".stripMargin

  /** EPUB metadata census — the document-container twin of the
    * EXIF/ID3/OggTags privacy censuses: Dublin Core fields from the
    * OPF (title, creator = the identity PII, language for routing,
    * identifier) plus spine length. Same chain resolution as
    * [[epubChapters]]; books whose OPF chain is broken route to
    * rejects (None). */
  def epubMeta(b: Array[Byte]): Option[(String, String, String, String, Int)] =
    try {
      val members = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
      val zis = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(b))
      var e = zis.getNextEntry
      while (e != null && members.size < 4096) {
        val buf = new java.io.ByteArrayOutputStream()
        val tmp = new Array[Byte](4096)
        var n = zis.read(tmp)
        while (n > 0 && buf.size <= (1 << 22)) { buf.write(tmp, 0, n); n = zis.read(tmp) }
        members(e.getName) = buf.toByteArray
        e = zis.getNextEntry
      }
      if (!members.get("mimetype").map(m => new String(m, "US-ASCII").trim)
        .contains("application/epub+zip")) return None
      val container = members.get("META-INF/container.xml")
        .map(new String(_, "UTF-8")).getOrElse(return None)
      val rootM = java.util.regex.Pattern
        .compile("<rootfile\\b[^>]*>").matcher(container)
      if (!rootM.find()) return None
      val opfPath = attrOf(rootM.group(0), "full-path").getOrElse(return None)
      val opf = members.get(opfPath).map(new String(_, "UTF-8"))
        .getOrElse(return None)
      def dc(tag: String): String = {
        val m = java.util.regex.Pattern
          .compile(s"(?s)<dc:$tag\\b[^>]*>(.*?)</dc:$tag>").matcher(opf)
        if (m.find()) unescXml(m.group(1).trim) else ""
      }
      var spine = 0
      val refM = java.util.regex.Pattern
        .compile("<itemref\\b[^>]*>").matcher(opf)
      while (refM.find()) spine += 1
      Some((dc("title"), dc("creator"), dc("language"), dc("identifier"),
        spine))
    } catch {
      case _: java.io.IOException => None
      case _: RuntimeException => None
    }

  /** Fixture: [[writeEpub]] plus a full Dublin Core block. */
  def writeEpubWithMeta(chapters: Seq[(String, String)], creator: String,
                        language: String, identifier: String): Array[Byte] = {
    val plain = writeEpub(chapters)
    // rewrite the OPF metadata block in a fresh container (zip members
    // are immutable once written, so rebuild with the enriched OPF)
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(plain))
    var e = zis.getNextEntry
    while (e != null) {
      val buf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](4096)
      var n = zis.read(tmp)
      while (n > 0) { buf.write(tmp, 0, n); n = zis.read(tmp) }
      val body =
        if (e.getName == "OEBPS/content.opf") {
          val opf = new String(buf.toByteArray, "UTF-8")
          opf.replace("</metadata>",
            s"""  <dc:creator>${escXml(creator)}</dc:creator>
               |    <dc:language>${escXml(language)}</dc:language>
               |  </metadata>""".stripMargin)
            .replace(">graft-fixture</dc:identifier>",
              s">${escXml(identifier)}</dc:identifier>")
            .getBytes("UTF-8")
        } else buf.toByteArray
      if (e.getName == "mimetype") {
        val me = new java.util.zip.ZipEntry("mimetype")
        me.setMethod(java.util.zip.ZipEntry.STORED)
        me.setSize(body.length)
        val crc = new java.util.zip.CRC32(); crc.update(body)
        me.setCrc(crc.getValue)
        zos.putNextEntry(me)
      } else zos.putNextEntry(new java.util.zip.ZipEntry(e.getName))
      zos.write(body)
      zos.closeEntry()
      e = zis.getNextEntry
    }
    zos.close()
    bos.toByteArray
  }

  /** EPUB METADATA CENSUS query: title/creator/language/identifier +
    * spine length per document — creator is the identity column a
    * privacy scrub routes on, language the corpus-mix column. */
  def epubMetaQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.docIds(spark, dir)
      .mapPartitions { ids =>
        ids.flatMap { id =>
          val n = (id % 3).toInt + 1
          val chapters = (0 until n).map(k =>
            (s"Chapter $k", s"Chapter $k body of doc $id"))
          val epub = writeEpubWithMeta(chapters,
            creator = s"Author ${id % 17}",
            language = Seq("en", "de", "fr", "ja")((id % 4).toInt),
            identifier = s"urn:graft:$id")
          epubMeta(epub).map { case (t, c, l, i, spine) =>
            (id, t, c, l, i, spine)
          }
        }
      }
      .toDF("doc_id", "title", "creator", "language", "identifier", "n_spine")
      .select(col("doc_id"), col("title"), col("creator"), col("language"),
        col("identifier"), col("n_spine").cast("int").as("n_spine"))
  }

  val epubMetaOracle: String =
    """SELECT doc_id,
      |       'Chapter 0' AS title,
      |       'Author ' || CAST(doc_id % 17 AS VARCHAR) AS creator,
      |       CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'en' WHEN 1 THEN 'de'
      |         WHEN 2 THEN 'fr' ELSE 'ja' END AS language,
      |       'urn:graft:' || CAST(doc_id AS VARCHAR) AS identifier,
      |       CAST(doc_id % 3 + 1 AS INT) AS n_spine
      |FROM documents
      |""".stripMargin

  // ---------------------------------------- zip central directory + zip64
  //
  // The streaming extractors above read local headers front-to-back; at
  // 100 TB the INDEXING pass wants the central directory instead — read
  // the EOCD from the tail, jump straight to the member list, and never
  // touch payload bytes. That walk is also where zip64 lives: archives
  // past 4 GiB (or 65535 members) stash the real counts in the zip64
  // EOCD record behind a locator, and per-entry 64-bit sizes/offsets in
  // the 0x0001 extra field. Inconsistent records reject.

  final case class ZipCentralEntry(name: String, method: Int,
                                   compSize: Long, uncompSize: Long,
                                   localOffset: Long)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong) | (u16(b, i + 2).toLong << 16)
  private def u64(b: Array[Byte], i: Int): Long =
    u32(b, i) | (u32(b, i + 4) << 32)

  /** Central-directory walk with zip64 support: returns the entries and
    * whether zip64 records were engaged. None on any inconsistency. */
  def zipCentralMembers(b: Array[Byte])
      : Option[(Seq[ZipCentralEntry], Boolean)] =
    try {
      // EOCD: scan back over the (≤64 KiB) comment span
      var eocd = -1
      var i = b.length - 22
      val stop = math.max(0, b.length - 22 - 65535)
      while (i >= stop && eocd < 0) {
        if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6)
          eocd = i
        i -= 1
      }
      if (eocd < 0) return None
      var total = u16(b, eocd + 10).toLong
      var cdSize = u32(b, eocd + 12)
      var cdOff = u32(b, eocd + 16)
      var zip64 = false
      if (total == 0xffffL || cdSize == 0xffffffffL || cdOff == 0xffffffffL) {
        // zip64 EOCD locator directly precedes the EOCD
        val loc = eocd - 20
        if (loc < 0 || b(loc) != 'P' || b(loc + 1) != 'K' ||
          b(loc + 2) != 6 || b(loc + 3) != 7) return None
        if (u32(b, loc + 4) != 0L || u32(b, loc + 16) != 1L) return None
        val e64 = u64(b, loc + 8)
        if (e64 < 0 || e64 + 56 > loc) return None
        val p = e64.toInt
        if (b(p) != 'P' || b(p + 1) != 'K' || b(p + 2) != 6 || b(p + 3) != 6)
          return None
        if (u32(b, p + 16) != 0L || u32(b, p + 20) != 0L) return None // disks
        if (u64(b, p + 24) != u64(b, p + 32)) return None // this-disk ≠ total
        total = u64(b, p + 32)
        cdSize = u64(b, p + 40)
        cdOff = u64(b, p + 48)
        zip64 = true
      }
      if (total < 0 || total > 100000 || cdOff < 0 ||
        cdOff + cdSize > b.length) return None
      val out = Seq.newBuilder[ZipCentralEntry]
      var p = cdOff.toInt
      var n = 0L
      while (n < total) {
        if (p + 46 > b.length || b(p) != 'P' || b(p + 1) != 'K' ||
          b(p + 2) != 1 || b(p + 3) != 2) return None
        val method = u16(b, p + 10)
        var comp = u32(b, p + 20)
        var uncomp = u32(b, p + 24)
        val nameLen = u16(b, p + 28)
        val extraLen = u16(b, p + 30)
        val commentLen = u16(b, p + 32)
        var localOff = u32(b, p + 42)
        if (p + 46 + nameLen + extraLen + commentLen > b.length) return None
        val name = new String(b, p + 46, nameLen, "UTF-8")
        // zip64 extra field 0x0001: only the 0xFFFFFFFF fields appear,
        // in uncomp / comp / offset order
        var x = p + 46 + nameLen
        val xEnd = x + extraLen
        while (x + 4 <= xEnd) {
          val tag = u16(b, x)
          val len = u16(b, x + 2)
          if (x + 4 + len > xEnd) return None
          if (tag == 0x0001) {
            var q = x + 4
            if (uncomp == 0xffffffffL) {
              if (q + 8 > x + 4 + len) return None
              uncomp = u64(b, q); q += 8
            }
            if (comp == 0xffffffffL) {
              if (q + 8 > x + 4 + len) return None
              comp = u64(b, q); q += 8
            }
            if (localOff == 0xffffffffL) {
              if (q + 8 > x + 4 + len) return None
              localOff = u64(b, q); q += 8
            }
            zip64 = true
          }
          x += 4 + len
        }
        if (comp == 0xffffffffL || uncomp == 0xffffffffL ||
          localOff == 0xffffffffL) return None
        if (localOff > b.length) return None
        out += ZipCentralEntry(name, method, comp, uncomp, localOff)
        p += 46 + nameLen + extraLen + commentLen
        n += 1
      }
      if (p != (cdOff + cdSize).toInt) return None // span mismatch
      Some((out.result(), zip64))
    } catch {
      case _: IndexOutOfBoundsException => None
    }

  /** ZIP CENSUS from the central directory alone — the tail-read
    * indexing pass a 100 TB archive lake runs before any extraction
    * (member counts and byte volume without touching payloads). */
  def zipCensusQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    zipPayloads(spark, dir)
      .mapPartitions { rows =>
        rows.flatMap { case (id, bytes) =>
          zipCentralMembers(bytes).map { case (entries, z64) =>
            (id, entries.length, entries.map(_.uncompSize).sum, z64)
          }
        }
      }
      .toDF("doc_id", "n_entries", "total_uncompressed", "zip64")
      .select(col("doc_id"), col("n_entries").cast("int").as("n_entries"),
        col("total_uncompressed"), col("zip64"))
  }

  val zipCensusOracle: String =
    """SELECT doc_id,
      |       CAST(doc_id % 3 + 1 AS INT) AS n_entries,
      |       -- member t is the 21+len(id)-char line repeated t+1 times;
      |       -- sum over t = 0..n-1 is the triangular count
      |       CAST((21 + length(CAST(doc_id AS VARCHAR)))
      |            * ((doc_id % 3 + 1) * (doc_id % 3 + 2) / 2) AS BIGINT)
      |         AS total_uncompressed,
      |       FALSE AS zip64
      |FROM documents
      |""".stripMargin
}
