package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-7 operators: Bloom-prefiltered exact dedup probe, daily-revenue
  * autocorrelation, and the join-blowup preflight. */
class Round7OpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  /** Plain exact probe (no Bloom) — the semantics bloomClassify must
    * reproduce bit-for-bit. */
  private def exactProbe(batch: DataFrame, corpus: DataFrame): Set[(Long, String, Option[Long])] = {
    val fpOf = (d: DataFrame) => d.select(col("doc_id"),
      md5(concat_ws(" ", split(trim(lower(col("text"))), "\\s+"))).as("fp"))
    val conf = fpOf(batch).join(
        fpOf(corpus).withColumnRenamed("doc_id", "idx"), Seq("fp"))
      .groupBy("doc_id").agg(min("idx").as("dup_of"))
    batch.select("doc_id").join(conf, Seq("doc_id"), "left")
      .collect().map { r =>
        val d = if (r.isNullAt(1)) None else Some(r.getLong(1))
        (r.getLong(0), if (d.isDefined) "exact_dup" else "new", d)
      }.toSet
  }

  private def bloomResult(batch: DataFrame, corpus: DataFrame,
                          expected: Long): Set[(Long, String, Option[Long])] =
    ops.IncrementalDedup.bloomClassify(spark, batch,
        ops.IncrementalDedup.buildIndex(spark, corpus).fingerprints, expected)
      .collect().map { r =>
        (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))
      }.toSet

  test("bloomClassify equals the plain exact probe (dups and non-dups)") {
    val corpus = docs(1L -> "alpha beta gamma", 2L -> "delta epsilon",
      3L -> "  ALPHA   beta GAMMA ")
    val batch = docs(10L -> "alpha beta gamma", 11L -> "zeta eta",
      12L -> "delta  epsilon", 13L -> "theta iota kappa")
    val got = bloomResult(batch, corpus, expected = 100L)
    assert(got === exactProbe(batch, corpus))
    // normalization folds case/whitespace: 10 matches the min doc (1)
    assert(got.contains((10L, "exact_dup", Some(1L))))
    assert(got.contains((13L, "new", None)))
  }

  test("bloom false positives are removed by the confirm join") {
    // a deliberately undersized filter (expectedItems=1 at the 1 MiB
    // floor for 200 indexed docs) raises the fp rate; the confirm join
    // must still produce the exact answer
    val corpus = docs((1L to 200L).map(i => i -> s"corpus doc number $i"): _*)
    val batch = docs((1000L to 1100L).map(i => i -> s"probe doc number $i"): _*)
    assert(bloomResult(batch, corpus, expected = 1L) ===
      exactProbe(batch, corpus))
  }

  test("acfOf returns exactly 1.0 at every lag for a linear series") {
    val series = (0 until 40).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        BigDecimal(100 + 7 * i))
    }.toDF("day", "rev")
      .select(col("day"), col("rev").cast("decimal(38,0)").as("rev"))
    val rows = ops.TimeSeries.acfOf(series, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1, 2, 3))
    // n_pairs shrinks by one per lag on a dense series
    assert(rows.map(_._2).toSeq === Seq(39L, 38L, 37L))
    assert(rows.forall(_._3 === 1.0))
  }

  test("acfOf detects period-2 alternation: acf(1) < 0 < acf(2)") {
    val series = (0 until 30).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2020, 1, 1).plusDays(i)),
        BigDecimal(if (i % 2 == 0) 1000 else 10))
    }.toDF("day", "rev")
      .select(col("day"), col("rev").cast("decimal(38,0)").as("rev"))
    val byLag = ops.TimeSeries.acfOf(series, 2)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(byLag(1) < -0.9)
    assert(byLag(2) > 0.9)
  }

  test("joinPreflight computes exact per-key and total estimates") {
    val left = Seq("a", "a", "a", "b", "d").toDF("k")
    val right = Seq("a", "a", "c", "c", "c", "c", "c", "d").toDF("k")
    val rows = ops.Skew.joinPreflight(left, "k", right, "k", topK = 10)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .sortBy(_._1)
    // matching keys: a (3×2=6), d (1×1=1); est_total=7, rows_left=4
    // (only keys present on both sides enter the profile)
    assert(rows.map(t => (t._1, t._2, t._5)).toSeq ===
      Seq((1, "a", 6L), (2, "d", 1L)))
    val a = rows.head
    assert((a._3, a._4) === (3L, 2L))
    assert(a._6 === 6L * 1000000L / 7L)   // share_ppm
    assert(a._7 === 7L)                   // est_total
    assert(a._8 === 7L * 1000L / 4L)      // amp vs matched left rows
  }

  test("vocabCoverage: monotone in k, exact at full vocabulary") {
    val rows = ops.TextAnalysis.vocabCoverage(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    core.Caches.release(spark)
    assert(rows.map(_._1).toSeq === Seq(100L, 1000L, 10000L))
    // coverage never decreases with k, never exceeds 1e6 ppm
    assert(rows.sliding(2).forall { case Array(a, b) => a._5 <= b._5 })
    assert(rows.forall(_._5 <= 1000000L))
    // a k that swallows the whole vocabulary covers every token exactly
    rows.filter(r => r._2 < r._1).foreach { r =>
      assert(r._3 === r._4); assert(r._5 === 1000000L)
    }
  }

  test("lengthMatch: only downsamples, keeps everything at-or-under target") {
    val rows = ops.Sampling.lengthMatch(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, bkt, nDocs, target, quota, kept) =>
      val cell = s"($src, $bkt)"
      assert(kept <= nDocs, cell)
      assert(quota <= 10000L, cell)
      // a cell already at/below its target keeps every document
      if (target >= nDocs) { assert(quota === 10000L, cell)
                             assert(kept === nDocs, cell) }
    }
    // per-source doc counts reconcile against the raw table
    val bySrc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val raw = core.Tables.documents(spark, sf)
      .groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.toMap === raw)
  }

  test("qualityQuantileNorm: one shared edge table, monotone per source") {
    val rows = ops.TextAnalysis.qualityQuantileNorm(spark, sf)
      .collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    core.Caches.release(spark)
    assert(rows.nonEmpty)
    // the bucket -> normalized-score mapping is GLOBAL: every source's
    // bucket b lands on the same edge value
    val edgeOf = rows.groupBy(_._3).view.mapValues(_.map(_._4).distinct)
    edgeOf.foreach { case (b, vs) => assert(vs.size === 1, s"bucket $b") }
    // and the mapping is monotone in the bucket index
    val edges = edgeOf.toSeq.sortBy(_._1).map(_._2.head)
    assert(edges.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
    // within a source, a higher raw score never gets a lower bucket
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      assert(sorted.sliding(2).forall(p => p.length < 2 || p(0)._3 <= p(1)._3),
        src)
    }
  }

  test("trendSlopeBy recovers an exact linear trend per group") {
    // synthetic check through the same moment algebra the query uses:
    // revenue = 500 + 3*x cents/day must yield slope exactly 3
    val df = (0 until 50).flatMap(i => Seq(("g1", i, 500L + 3L * i),
        ("g2", i, 10000L - 7L * i)))
      .toDF("g", "x", "cents")
      .select(col("g"), col("x").cast("decimal(38,0)").as("xd"),
        col("cents").cast("decimal(38,0)").as("y"))
    val m = df.groupBy(col("g"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("xd")).as("sx"), sum(col("y")).as("sy"),
        sum(col("xd") * col("xd")).as("sxx"),
        sum(col("xd") * col("y")).as("sxy"))
      .select(col("g"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
          .as("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("g1") === 3.0)
    assert(m("g2") === -7.0)
  }

  test("productQuantize: 4 codes per vector, bounded codebook, d2 >= 0") {
    val rows = ops.Embeddings.productQuantize(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    core.Caches.release(spark)
    val nVecs = core.Tables.embeddings(spark, sf).count()
    assert(rows.length === 4 * nVecs)
    // every (vec, sub) cell appears exactly once
    assert(rows.map(r => (r._1, r._2)).distinct.length === rows.length)
    assert(rows.forall(r => r._2 >= 0 && r._2 < 4))
    assert(rows.forall(r => r._3 >= 0 && r._3 < 8))
    // squared residuals: non-negative up to float round-off
    assert(rows.forall(_._4 >= -1e-6))
    // the trained codebook stays within its 4x8 budget
    assert(rows.map(r => (r._2, r._3)).distinct.length <= 32)
  }

  test("labelNoise flags a planted mislabel, spares clean points") {
    // two tight clusters of 8; one point in cluster A carries a wrong
    // label — its whole neighborhood votes against it
    def jitter(base: Array[Double], i: Int): Seq[Double] =
      base.zipWithIndex.map { case (x, d) => x + 0.001 * ((i + d) % 3) }.toSeq
    val a = Array(1.0, 0.0, 0.0, 0.0)
    val b = Array(0.0, 1.0, 0.0, 0.0)
    val rows =
      (0 until 8).map(i => (i.toLong, if (i == 3) 9 else 0, jitter(a, i))) ++
      (8 until 16).map(i => (i.toLong, 1, jitter(b, i)))
    val df = rows.toDF("vec_id", "label", "v")
      .select(col("vec_id"), col("label"),
        col("v").cast("array<double>").as("v"))
    val out = ops.Similarity.labelNoiseOf(df, k = 10)
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(3L) === true)          // the planted mislabel
    assert(out.count(_._2) === 1)     // and nothing else
  }

  test("shufflePreflight conserves totals and exposes a planted hot key") {
    // 900 rows of one hot key + 100 singleton keys across 32 partitions
    val df = ((0 until 900).map(_ => 7777L) ++ (1L to 100L)).toDF("k")
    val rows = ops.Skew.shufflePreflight(df, col("k"), 32)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(_._3).sum === 1000L)          // every row lands somewhere
    assert(rows.map(_._2).sum === 101L)           // every key lands once
    assert(rows.forall(r => r._1 >= 0 && r._1 < 32))
    // the hot key's partition carries >=90% of the load: load_x1000 is
    // rows*32*1000/total >= 0.9*32000
    assert(rows.map(_._5).max >= 28000L)
    // and the profile is deterministic across runs
    val again = ops.Skew.shufflePreflight(df, col("k"), 32)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(again === rows.map(r => (r._1, r._3)).toSet)
  }

  test("entity resolution: transitive chain clusters, longest name survives") {
    // n1-n2 and n2-n3 are within distance 2, n1-n3 only transitively;
    // all share the (first2, last2) block. n10 is an unrelated singleton.
    val recs = Seq(
      (1L, "mnop qrstu"),   // longest -> canonical
      (2L, "mnp qrstu"),
      (3L, "mn qrstu"),
      (10L, "beta gamma"))
      .toDF("record_id", "name")
    val out = ops.EntityResolution.resolve(recs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    core.Caches.release(spark)
    val byId = out.map(t => t._1 -> t).toMap
    // the chain collapses to one entity labeled by the minimum id
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).distinct === Seq(1L))
    assert(Seq(1L, 2L, 3L).forall(id => byId(id)._3 == "mnop qrstu"))
    assert(byId(1L)._4 === 3L)
    // the unrelated record stays its own entity
    assert(byId(10L)._2 === 10L && byId(10L)._4 === 1L)
  }

  test("png decoder reverses all five row filters") {
    import graft.functions.ImageCodec
    // reference raster from the filter-0 writer; then re-encode the same
    // raster with each PNG filter type applied to every row and assert
    // the decoder reproduces it
    val (w, h) = (7, 5)
    def f(x: Int, y: Int): Int = ((x * 37 + y * 91) % 256) * 0x010101 + x
    val ref = ImageCodec.decodePixels(ImageCodec.writePngPixels(w, h, f)).get
    val stride = 3 * w
    for (filter <- 1 to 4) {
      val raw = new Array[Byte](h * (1 + stride))
      def out(y: Int, i: Int): Int = ref.rgb(y * stride + i) & 0xff
      for (y <- 0 until h) {
        raw(y * (1 + stride)) = filter.toByte
        for (i <- 0 until stride) {
          val x = out(y, i)
          val left = if (i >= 3) out(y, i - 3) else 0
          val up = if (y > 0) out(y - 1, i) else 0
          val ul = if (y > 0 && i >= 3) out(y - 1, i - 3) else 0
          val paeth = {
            val p = left + up - ul
            val (pa, pb, pc) =
              (math.abs(p - left), math.abs(p - up), math.abs(p - ul))
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
          }
          val enc = filter match {
            case 1 => x - left
            case 2 => x - up
            case 3 => x - ((left + up) >> 1)
            case 4 => x - paeth
          }
          raw(y * (1 + stride) + 1 + i) = enc.toByte
        }
      }
      // wrap the filtered scanlines in a real container by splicing the
      // deflated body into the writer's framing
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(raw); deflater.finish()
      val buf = new Array[Byte](raw.length + 64)
      val bos = new java.io.ByteArrayOutputStream()
      while (!deflater.finished()) bos.write(buf, 0, deflater.deflate(buf))
      val plain = ImageCodec.writePngPixels(w, h, f)
      // rebuild: signature + IHDR (8..33) + our IDAT chunk + IEND; CRCs
      // are not validated by the decoder (content equality is the check)
      val idatData = bos.toByteArray
      val lenBytes = java.nio.ByteBuffer.allocate(4).putInt(idatData.length).array()
      val idat = lenBytes ++ "IDAT".getBytes ++ idatData ++ Array[Byte](0, 0, 0, 0)
      val iend = Array[Byte](0, 0, 0, 0) ++ "IEND".getBytes ++ Array[Byte](0, 0, 0, 0)
      val png = plain.take(33) ++ idat ++ iend
      val got = ImageCodec.decodePixels(png)
      assert(got.isDefined, s"filter $filter failed to decode")
      assert(got.get.rgb.toSeq === ref.rgb.toSeq, s"filter $filter wrong pixels")
    }
  }

  test("perceptual grid is resolution-invariant for cell-aligned content") {
    import graft.functions.ImageCodec
    def img(id: Long, scale: Int) = {
      val w = (9 + 3 * (id % 4).toInt) * scale
      val h = (9 + 3 * (id % 3).toInt) * scale
      def g(x: Int, y: Int): Int = {
        val v = (((id >> (4 * ((y / (h / 3)) * 3 + x / (w / 3)))) & 15L)
          .toInt * 16 + 8)
        v * 0x010101
      }
      ImageCodec.decodePixels(ImageCodec.writePngPixels(w, h, g)).get
    }
    for (id <- Seq(1L, 7L, 42L, 999L)) {
      val g1 = ImageCodec.sampleGrid9x8(img(id, 1))
      val g2 = ImageCodec.sampleGrid9x8(img(id, 2))
      val g5 = ImageCodec.sampleGrid9x8(img(id, 5))
      assert(g1.toSeq === g2.toSeq)
      assert(g1.toSeq === g5.toSeq)
      assert(ImageCodec.dHash64(g1) === ImageCodec.dHash64(g2))
    }
    // distinct ids produce distinct grids (the oracle's uniqueness claim)
    assert(ImageCodec.sampleGrid9x8(img(1L, 1)).toSeq !==
      ImageCodec.sampleGrid9x8(img(2L, 1)).toSeq)
  }

  test("png metadata scrub: drops every ancillary chunk, idempotent") {
    import graft.functions.ImageCodec
    val base = ImageCodec.writePngPixels(9, 9, (x, y) => x * 29 + y)
    val tagged = ImageCodec.withTextChunk(
      ImageCodec.withTextChunk(base, "gps", "51.5,-0.1"), "auth", "someone")
    assert(ImageCodec.pngChunkTypes(tagged) ===
      Seq("IHDR", "tEXt", "tEXt", "IDAT", "IEND"))
    val scrubbed = ImageCodec.stripAncillary(tagged).get
    assert(ImageCodec.pngChunkTypes(scrubbed) === Seq("IHDR", "IDAT", "IEND"))
    // pixels untouched, and scrubbing a clean file is the identity
    assert(ImageCodec.decodePixels(scrubbed).get.rgb.toSeq ===
      ImageCodec.decodePixels(base).get.rgb.toSeq)
    assert(ImageCodec.stripAncillary(scrubbed).get.toSeq === scrubbed.toSeq)
    assert(ImageCodec.stripAncillary("nope".getBytes).isEmpty)
  }

  test("zip extraction round-trips entry names, sizes, and hashes") {
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new java.util.zip.ZipOutputStream(bos)
    val entries = Seq("a.txt" -> "hello", "b/c.txt" -> "world world")
    entries.foreach { case (n, c) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    zos.close()
    val zis = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val got = Iterator.continually(zis.getNextEntry).takeWhile(_ != null)
      .map { e =>
        val b = new Array[Byte](64)
        val n = zis.read(b)
        e.getName -> new String(b, 0, n, "UTF-8")
      }.toList
    assert(got === entries.toList)
  }

  test("rowGroups audit: footer row counts reconcile with the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft_rg").toString
    (1L to 5000L).toDF("id").repartition(3).write.mode("overwrite").parquet(dir)
    val audit = ops.Layout.rowGroups(spark, dir).collect()
    assert(audit.nonEmpty)
    assert(audit.map(_.getLong(2)).sum === 5000L)
    // compression is real: compressed <= uncompressed, both positive
    audit.foreach { r =>
      assert(r.getLong(3) > 0 && r.getLong(3) <= r.getLong(4))
    }
    // the audit names exactly the data files on disk
    val parts = new java.io.File(dir).list().filter(_.endsWith(".parquet")).toSet
    assert(audit.map(_.getString(0)).toSet === parts)
  }

  test("streaming image classify equals the batch probe (foreachBatch twin)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // index: base images of ids 1..6; stream: twins of 1..10 in two batches
    val payloads = ops.Multimodal.imageVariantPayloads(spark, sf)
    val index = ops.Multimodal.imageSignatures(
      payloads.filter(p => p._1 < 7L && p._1 >= 1L)).collect()
    val indexDf = spark.createDataFrame(
      spark.sparkContext.parallelize(index.toSeq), index.head.schema)
    val twins = ops.Multimodal.imageSignatures(
      payloads.filter(p => p._1 >= 1000000000L && p._1 <= 1000000010L))
      .collect().sortBy(_.getLong(0))
    core.Caches.release(spark)
    val input = MemoryStream[Long]
    val sink = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Option[Long])]()
    val twinsById = twins.map(r => r.getLong(0) -> r).toMap
    val q = input.toDS().writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Long], _: Long) =>
        val ids = batch.collect()
        if (ids.nonEmpty) {
          val sigs = spark.createDataFrame(
            spark.sparkContext.parallelize(ids.toSeq.map(twinsById)),
            twins.head.schema)
          ops.Multimodal.classifyImages(sigs, indexDf).collect().foreach { r =>
            sink.add((r.getLong(0), r.getString(1),
              if (r.isNullAt(2)) None else Some(r.getLong(2))))
          }
        }
        ()
      }
      .start()
    try {
      input.addData(twins.map(_.getLong(0)).take(5): _*)
      q.processAllAvailable()
      input.addData(twins.map(_.getLong(0)).drop(5): _*)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = sink.toArray(Array.empty[(Long, String, Option[Long])]).toSet
    val batchRes = ops.Multimodal.classifyImages(
        spark.createDataFrame(
          spark.sparkContext.parallelize(twins.toSeq), twins.head.schema),
        indexDf)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(streamed === batchRes)
    // and the classification itself is right: indexed bases -> dup
    assert(batchRes.forall { case (id, st, d) =>
      val base = id - 1000000000L
      if (base >= 1L && base < 7L) st == "dup" && d.contains(base)
      else st == "new" && d.isEmpty
    })
  }

  test("html extraction is lossless on text content") {
    // recovered clean text must equal title + heading + body text in
    // document order (whitespace-normalized) -- checked against the RAW
    // text column, independently of the markup synthesis chain
    val expected = md5(concat(
      lit("doc "), col("doc_id"), lit(" Doc "), col("doc_id"), lit(" "),
      trim(regexp_replace(col("text"), lit("\\s+"), lit(" ")))))
    val diff = ops.TextPrep.htmlExtract(spark, sf)
      .join(core.Tables.documents(spark, sf), Seq("doc_id"))
      .filter(col("clean_md5") =!= expected)
      .count()
    assert(diff === 0L)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // evidence for the standing scale claim that AQE absorbs moderate
    // join skew without manual salting: one hot key with ~90% of the
    // left side, thresholds tuned so the skew handler fires at spec
    // scale, then the executed plan must carry the skew=true marker
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled" -> conf.get("spark.sql.adaptive.enabled", "true"),
      "spark.sql.autoBroadcastJoinThreshold" -> conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256MB"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB"),
      "spark.sql.adaptive.coalescePartitions.enabled" -> conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true"))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      import spark.implicits._
      // incompressible pad: shuffle sizes are measured on COMPRESSED
      // blocks, so a constant pad would deflate under any threshold
      val left = ((1 to 60000).map(_ => 0L) ++ (1 to 2000).map(_.toLong))
        .toDF("k")
        .withColumn("pad", md5(concat(col("k"), monotonically_increasing_id())))
      val right = (0 to 2000).map(_.toLong).toDF("k")
      val joined = left.join(right, "k")
      // execute THROUGH joined's own QueryExecution: count() builds a
      // separate aggregate plan and the inspected one would stay
      // isFinalPlan=false with no skew decision recorded
      assert(joined.collect().length === 62000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "AQE must mark the skewed SMJ partition for runtime split")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("padding waste: sorted batching never loses to arrival order") {
    val rows = ops.Packing.paddingWaste(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    core.Caches.release(spark)
    val (a, s) = (rows("arrival"), rows("sorted"))
    assert(a._1 === s._1)              // same batch count
    assert(a._2 === s._2)              // same real tokens
    // length-sorted contiguous batching minimizes sum-of-batch-maxima
    // among equal-size batchings (exchange argument), so it can never
    // pad more than the arrival assignment
    assert(s._3 <= a._3)
    assert(s._4 <= a._4)
    assert(s._3 >= s._2)               // padded >= real always
  }

  test("abTest: arms partition the users, z finite") {
    val r = ops.Stats.abTest(spark, sf).head()
    val users = core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.getLong(0) + r.getLong(2) === users)
    assert(r.getLong(1) <= r.getLong(0) && r.getLong(3) <= r.getLong(2))
    assert(!r.getDouble(6).isNaN && !r.getDouble(6).isInfinite)
  }

  test("neymanAllocation: budget conserved, variance drives the split") {
    val rows = ops.Stats.neymanAllocation(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    // floors can under-spend but never over-spend the budget
    assert(rows.map(_._4).sum <= 2000L)
    assert(rows.forall(_._4 >= 0L))
    // a stratum with more mass-times-spread never gets fewer samples
    val byWeight = rows.sortBy(r => r._2 * r._3)
    assert(byWeight.sliding(2).forall(p => p.length < 2 || p(0)._4 <= p(1)._4 + 1))
  }

  test("join preflight estimate equals the real join's output count") {
    val li = core.Tables.lineitem(spark, sf).select("l_partkey")
    val est = ops.Skew.joinPreflightQuery(spark, sf)
      .select("est_total").head().getLong(0)
    val actual = li.join(li.withColumnRenamed("l_partkey", "k"),
      col("l_partkey") === col("k")).count()
    assert(est === actual)
    core.Caches.release(spark)
  }
}
