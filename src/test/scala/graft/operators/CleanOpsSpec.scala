package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** P1/P2 cleaning semantics (`procedure_code.py:721-723`). */
class CleanOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("null-coercion + drop matches the reference semantics") {
    val in = Seq("12345", "  ", "false", "FALSE", " False ", null, " A123 ")
      .toDF("code")
    val out = CleanOps.cleanCodes(in).as[String].collect().toSeq
    assert(out == Seq("12345", "A123")) // kept codes come out trimmed
  }

  test("cleaning is idempotent") {
    val in = Seq("x", " y ", "false", null).toDF("code")
    val once = CleanOps.cleanCodes(in)
    val twice = CleanOps.cleanCodes(once)
    assert(once.as[String].collect().toSeq == twice.as[String].collect().toSeq)
  }

  test("empty input stays empty with schema intact") {
    val in = Seq.empty[String].toDF("code")
    val out = CleanOps.cleanCodes(in)
    assert(out.columns.toSeq == Seq("code") && out.isEmpty)
  }
}
