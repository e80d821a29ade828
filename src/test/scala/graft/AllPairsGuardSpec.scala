package graft

import graft.plans.AllPairsViolation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The runtime all-pairs guard (graft.plans.AllPairsGuard, injected by
  * GraftExtensions): armed, it fails cross joins / equality-free join
  * conditions at optimization time; disarmed (the default), everything
  * behaves exactly as stock Spark. */
class AllPairsGuardSpec extends AnyFunSuite with SparkFixture {

  import spark.implicits._

  private lazy val a = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
  private lazy val b = Seq((1L, 10.0), (3L, 30.0)).toDF("id", "v")

  private def armed[T](f: => T): T = {
    spark.conf.set("spark.graft.blockAllPairs", "true")
    try f finally spark.conf.unset("spark.graft.blockAllPairs")
  }

  test("disarmed (default): cross joins run as stock Spark") {
    assert(a.crossJoin(b).count() == 4)
  }

  test("armed: CROSS join fails at optimization time (typed AllPairsViolation), no tasks launch") {
    val e = intercept[AllPairsViolation] { armed(a.crossJoin(b).count()) }
    assert(e.getMessage.contains("all-pairs guard"))
  }

  test("armed: equality-free join condition (nested-loop shape) fails; " +
    "a <> b alone does not count as a key") {
    val e = intercept[AllPairsViolation] {
      armed(a.join(b, a("id") =!= b("id")).count())
    }
    assert(e.getMessage.contains("no equality conjunct"))
  }

  test("armed: keyed joins pass — equality conjunct present, extra " +
    "range conjuncts welcome") {
    armed {
      assert(a.join(b, Seq("id")).count() == 1)
      assert(a.join(b, a("id") === b("id") && b("v") > 5.0).count() == 1)
    }
  }

  test("armed: the gated suite's flagship keyed plans still build " +
    "(the guard never fires on equi-join pipelines)") {
    armed {
      val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
        .toDF("doc_id", "text")
      val pairs = graft.ops.DedupOps
        .jaccardPairs(docs, "doc_id", "text", 2, 0.1).count()
      Caches.clear()
      assert(pairs >= 0)
    }
  }
}
