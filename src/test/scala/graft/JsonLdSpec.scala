package graft

/** JSON-LD extraction laws: block multiplicity (none/one/two), typed
  * field extraction incl. the bracket-notation `@type` path, and
  * Product-only price presence. */
class JsonLdSpec extends SparkSpec {

  test("jsonld extraction honors block multiplicity and field typing") {
    import spark.implicits._
    val rows = graft.ops.TextAnalysis.jsonLdQuery(spark, sf)
      .as[(Long, Int, String, String, Option[Int])].collect()
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect()
    val want = ids.map { id =>
      if (id % 5 == 3) 0 else if (id % 7 == 0) 2 else 1
    }.sum
    assert(rows.length == want)
    assert(ids.filter(_ % 5 == 3).forall(id => !rows.exists(_._1 == id)))
    rows.foreach { case (id, t, typ, name, price) =>
      val fid = id * 4 + t
      val wantType = Seq("Product", "Article", "Recipe")(((id + t) % 3).toInt)
      assert(typ == wantType && name == s"Item$fid", s"doc $id block $t")
      if (wantType == "Product") assert(price.contains((fid % 100).toInt))
      else assert(price.isEmpty)
    }
  }
}
