package graft

import org.apache.spark.sql.functions._
import graft.ops.{Retail, TimeSeries}

/** Retail-analytics operators checked against independent driver-side
  * recomputations (plain Scala over collected rows — a different
  * evaluation path from the Spark plans), plus a planted-mismatch
  * fixture for the order-consistency audit. */
class RetailSpec extends SparkSpec {
  import spark.implicits._

  private def cents(v: Double): Long =
    BigDecimal(v * 100).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // ------------------------------------------------- order consistency
  test("orderConsistency: planted match, mismatch, and itemless order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_oc").toString
    // order 1: 100.00 · (1−0.05) · (1+0.10) = 104.50 — consistent
    // order 2: stated 50.00 but items total 100.00 — mismatch
    // order 3: stated 10.00 with no line items — itemless AND mismatch
    Seq((1L, "OK", 104.50), (2L, "OK", 50.00), (3L, "NOITEMS", 10.00))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 100.00, 0.05, 0.10), (2L, 100.00, 0.00, 0.00))
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_tax")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Retail.orderConsistency(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got("OK") == ((2L, 0L, 1L, 5000L * 100000000L)))
    assert(got("NOITEMS") == ((1L, 1L, 1L, 1000L * 100000000L)))
  }

  // ------------------------------------------------------- ABC / Pareto
  test("abcPareto equals a driver-side sorted cumulative classification") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_extendedprice").as[(Long, Double)].collect()
    val rev = li.groupBy(_._1).map { case (p, xs) =>
      p -> xs.map(x => cents(x._2)).sum
    }.toSeq.sortBy { case (p, r) => (-r, p) }
    val total = rev.map(_._2).sum
    var cum = 0L
    val want = rev.map { case (p, r) =>
      cum += r
      val cls = if (cum * 100 <= total * 80) "A"
                else if (cum * 100 <= total * 95) "B" else "C"
      p -> ((r, round6(cum.toDouble / total), cls))
    }.toMap
    val got = Retail.abcPareto(spark, sf)
      .as[(Long, Long, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.size == want.size)
    got.foreach { case (p, (r, share, cls)) =>
      val (wr, wshare, wcls) = want(p)
      assert(r == wr && cls == wcls, s"part $p: got ($r,$cls) want ($wr,$wcls)")
      assert(math.abs(share - wshare) < 1e-9, s"part $p share")
    }
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------------ streaks
  test("streaks equals a driver-side gaps-and-islands recomputation") {
    // Tables.events normalizes ts across snapshot physical types (nanos
    // long vs timestamp[us]); reading the file raw here would re-encode
    // one of them and break on the other
    val days = graft.core.Tables.events(spark, sf)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("d"))
      .distinct().as[(Long, Int)].collect()
    val want = days.groupBy(_._1).map { case (u, xs) =>
      val ds = xs.map(_._2).distinct.sorted
      val lens = scala.collection.mutable.ListBuffer.empty[Long]
      var cur = 0L
      var prev = Long.MinValue
      ds.foreach { d =>
        if (d.toLong == prev + 1) cur += 1 else { if (cur > 0) lens += cur; cur = 1 }
        prev = d.toLong
      }
      if (cur > 0) lens += cur
      u -> ((ds.size.toLong, lens.max, lens.size.toLong))
    }
    val got = TimeSeries.streaks(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == want.toMap)
    assert(got.valuesIterator.exists(_._2 > 1), "fixture has a real streak")
  }

  // ------------------------------------------------------- basket rules
  test("basketRules equals brute-force co-occurrence at minSupport=2") {
    val op = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect().distinct
    val byOrder = op.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCnt = byOrder.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    val itemCnt = op.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val n = op.map(_._1).distinct.length.toLong
    val got = Retail.basketRules(spark, sf, minSupport = 2L)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
    assert(got.nonEmpty, "sf0.001 has co-occurring pairs at support 2")
    assert(got.map(r => (r._1, r._2)).toSet == pairCnt.keySet)
    got.foreach { case (p1, p2, pairs, p1o, p2o, conf, lift) =>
      assert(pairs == pairCnt((p1, p2)))
      assert(p1o == itemCnt(p1) && p2o == itemCnt(p2))
      assert(math.abs(conf - round6(pairs.toDouble / p1o)) < 1e-9)
      assert(math.abs(lift - round6((pairs * n).toDouble / (p1o * p2o))) < 1e-9)
    }
    spark.catalog.clearCache()
  }

  // ------------------------------------------------------ prefix min
  test("globalPrefixMin equals the single-window running min on real data") {
    import graft.ops.Rnk
    // part has a UNIQUE key — the operator (like globalRank/globalCumsum)
    // requires a tie-free total order; lineitem's planted duplicate rows
    // would make the exclusive prefix order-dependent
    val p = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_size").cast("long").as("v"))
    val got = Rnk.globalPrefixMin(p, Seq(col("p_partkey").asc), col("v"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    val rows = p.as[(Long, Long)].collect().sortBy(_._1)
    var run = Long.MaxValue
    rows.foreach { case (k, v) =>
      assert(got(k) == run, s"part $k")
      run = math.min(run, v)
    }
    assert(got(rows.head._1) == Long.MaxValue, "first row sees the identity")
    spark.catalog.clearCache()
  }

  // --------------------------------------------------------- skyline
  test("skylineParts equals brute-force Pareto domination") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"),
        col("p_size")).as[(Long, Long, Int)].collect()
    val want = parts.filter { case (_, pc, sz) =>
      !parts.exists { case (_, bpc, bsz) =>
        (bpc > pc && bsz <= sz) || (bpc >= pc && bsz < sz)
      }
    }.map(_._1).toSet
    val got = Retail.skylineParts(spark, sf)
      .as[(Long, Long, Int)].collect().map(_._1).toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < parts.length)
    spark.catalog.clearCache()
  }

  // ---------------------------------------------------- open backlog
  test("openOrdersDaily equals a driver-side sweep; conserves to zero") {
    // keep orders as ROWS, not a map — the corpus plants duplicate
    // orderkeys (q_validate_dups counts them) and each row is an order
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("d0"))
      .as[(Long, Int)].collect().toSeq
    val d1 = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(max(datediff(to_date(col("l_shipdate")), lit("1970-01-01"))).as("d1"))
      .as[(Long, Int)].collect().toMap
    val spans = o.map { case (k, s) => (s, math.max(s, d1.getOrElse(k, s))) }
    val got = Retail.openOrdersDaily(spark, sf)
      .select(datediff(col("day"), lit("1970-01-01")), col("open_orders"))
      .as[(Int, Long)].collect().toMap
    val lo = spans.map(_._1).min
    val hi = spans.map(_._2).max + 1
    (lo to hi).foreach { d =>
      val open = spans.count { case (s, e) => s <= d && d <= e }
      assert(got(d) == open.toLong, s"day $d")
    }
    assert(got(hi) == 0L, "every order eventually closes")
    spark.catalog.clearCache()
  }

  // -------------------------------------------------------- RFM buckets
  test("rfmSegments: buckets follow the explicit rank formula") {
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01")).as("d"),
        col("o_totalprice")).as[(Long, Int, Double)].collect()
    val cust = o.groupBy(_._1).map { case (c, xs) =>
      (c, xs.map(_._2).max, xs.size.toLong, xs.map(x => cents(x._3)).sum)
    }.toSeq
    val dmax = cust.map(_._2).max
    val n = cust.size.toLong
    def buckets(ranked: Seq[Long]): Map[Long, Int] =
      ranked.zipWithIndex.map { case (c, i) =>
        c -> (1 + (i.toLong * 5 / n)).toInt
      }.toMap
    val rB = buckets(cust.sortBy { case (c, last, _, _) => (dmax - last, c) }.map(_._1))
    val fB = buckets(cust.sortBy { case (c, _, f, _) => (-f, c) }.map(_._1))
    val mB = buckets(cust.sortBy { case (c, _, _, m) => (-m, c) }.map(_._1))
    val got = Retail.rfmSegments(spark, sf)
      .as[(Long, Int, Long, Long, Int, Int, Int, Int)].collect()
    assert(got.length == cust.size)
    got.foreach { case (c, rec, f, m, rb, fb, mb, code) =>
      val (_, last, wf, wm) = cust.find(_._1 == c).get
      assert(rec == dmax - last && f == wf && m == wm, s"cust $c metrics")
      assert(rb == rB(c) && fb == fB(c) && mb == mB(c), s"cust $c buckets")
      assert(code == rb * 100 + fb * 10 + mb)
    }
    assert(got.map(_._5).distinct.sorted.sameElements(1 to 5),
      "all five recency buckets occur")
    spark.catalog.clearCache()
  }
}
