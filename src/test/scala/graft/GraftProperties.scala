package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.{Exp, Jnr}
import graft.reconcile.Reconcile
import graft.validate.{DuplicateException, Validator}

/** Property-based invariants (SURVEY §5.2): duplicate-gate soundness,
  * reconcile identity, anti/semi-join complementarity, null-patch
  * idempotence — over generated data including nulls and empty strings. */
object GraftProperties extends Properties("graft") {

  private lazy val spark = SparkSpec.session
  import spark.implicits._

  // keep Spark-job counts modest: small collections, few samples
  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  private val keyGen: Gen[List[Int]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0, 1000)))

  property("duplicate gate passes iff keys are distinct") =
    forAll(keyGen) { keys =>
      val df = keys.zipWithIndex.toDF("k", "v")
      val hasDups = keys.distinct.size != keys.size
      val threw =
        try { Validator.requireUnique(df, Seq("k")); false }
        catch { case _: DuplicateException => true }
      threw == hasDups
    }

  private val rowGen: Gen[List[(Int, Option[String])]] =
    Gen.chooseNum(1, 10).flatMap { n =>
      Gen.listOfN(n, for {
        k <- Gen.chooseNum(0, 50)
        v <- Gen.option(Gen.oneOf("", "x", "yy", "null"))
      } yield (k, v))
    }.map(_.distinctBy(_._1))

  property("reconcile identity: diff(df, df) is empty") =
    forAll(rowGen) { rows =>
      val df = rows.toDF("id", "v")
      val d = Reconcile.diff(df, df, Seq("id"))
      d.cellMismatches.isEmpty && d.sourceOnly.isEmpty && d.targetOnly.isEmpty
    }

  property("semi ∪ anti partitions the source exactly") =
    forAll(keyGen, keyGen) { (src, tgt) =>
      val s = src.distinct.toDF("k")
      val t = tgt.toDF("k")
      val semi = Jnr.semiByKey(s, t, Seq("k")).as[Int].collect().toSet
      val anti = Jnr.antiByKey(s, t, Seq("k")).as[Int].collect().toSet
      Prop(semi.intersect(anti).isEmpty) :| "disjoint" &&
        Prop(semi.union(anti) == src.distinct.toSet) :| "covering"
    }

  property("patchNulls is idempotent and total") =
    forAll(rowGen) { rows =>
      val df = rows.toDF("id", "v")
      val once = Exp.patchNulls(df, Map("v" -> "dflt"))
      val twice = Exp.patchNulls(once, Map("v" -> "dflt"))
      val a = once.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      val b = twice.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      a == b && a.forall(_._2 != null)
    }
}
