package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Runtime validation of the JDBC surface (S3/S4, K4-K6) against the
  * embedded Derby engine Spark already ships — an in-process
  * `jdbc:derby:memory:` database, so the read/write/DDL/transaction
  * paths run for real with no external server.
  */
class JdbcSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val url = "jdbc:derby:memory:graft;create=true"

  test("executeDdl creates a table; writeAppend + readQuery round-trip rows") {
    Jdbc.executeDdl(url,
      "CREATE TABLE codes (code VARCHAR(16) NOT NULL, n INT)")
    import spark.implicits._
    val df = Seq(("A0001", 1), ("A0002", 2), ("A0003", 3)).toDF("code", "n")
    Jdbc.writeAppend(df, url, "codes")

    val back = Jdbc.readQuery(spark, url,
      "SELECT code, n FROM codes WHERE n >= 2")
    assert(back.orderBy("code").collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      == Seq(("A0002", 2), ("A0003", 3)))
  }

  test("writeAppend appends (does not replace) existing rows") {
    Jdbc.executeDdl(url, "CREATE TABLE appends (v INT)")
    import spark.implicits._
    Jdbc.writeAppend(Seq(1, 2).toDF("v"), url, "appends")
    Jdbc.writeAppend(Seq(3).toDF("v"), url, "appends")
    val n = Jdbc.readQuery(spark, url, "SELECT v FROM appends").count()
    assert(n == 3)
  }

  test("executeTransaction commits all statements atomically") {
    Jdbc.executeDdl(url, "CREATE TABLE txn_ok (v INT)")
    Jdbc.executeTransaction(url, Seq(
      "INSERT INTO txn_ok VALUES (1)",
      "INSERT INTO txn_ok VALUES (2)"))
    assert(Jdbc.readQuery(spark, url, "SELECT v FROM txn_ok").count() == 2)
  }

  test("executeTransaction rolls back every statement on failure") {
    Jdbc.executeDdl(url, "CREATE TABLE txn_rb (v INT NOT NULL)")
    intercept[Exception] {
      Jdbc.executeTransaction(url, Seq(
        "INSERT INTO txn_rb VALUES (1)",
        "INSERT INTO txn_rb VALUES (NULL)")) // violates NOT NULL
    }
    // first insert must have rolled back with the failed one
    assert(Jdbc.readQuery(spark, url, "SELECT v FROM txn_rb").count() == 0)
  }

  test("readQuery pushes computation to the database (aggregate query)") {
    Jdbc.executeDdl(url, "CREATE TABLE aggsrc (k VARCHAR(4), v INT)")
    Jdbc.executeTransaction(url, Seq(
      "INSERT INTO aggsrc VALUES ('a', 1)",
      "INSERT INTO aggsrc VALUES ('a', 2)",
      "INSERT INTO aggsrc VALUES ('b', 5)"))
    val agg = Jdbc.readQuery(spark, url,
      "SELECT k, CAST(SUM(v) AS BIGINT) AS s FROM aggsrc GROUP BY k")
    val got = agg.orderBy("k").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 5L)))
  }
}
