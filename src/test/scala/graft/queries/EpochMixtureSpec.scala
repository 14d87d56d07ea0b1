package graft.queries

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** dp18's clamp edges on a corpus built to hit them: the testdata
  * corpus only exercises epochs 1–3 (BASELINE.md round 11), so this
  * spec writes a synthetic documents.parquet where one language is tiny
  * (its equal share implies far more than 4 passes — the cap must
  * engage) and one dominates (target below its size — exactly 1 epoch,
  * planned capped at target, not c_tok).
  */
class EpochMixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("epoch cap engages for tiny languages; big languages stay at 1 epoch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dp18").toString
    // 'aa': ~10 tokens total; 'bb': ~990 tokens. B = 1.5*1000 = 1500,
    // share = 750 each. aa: ceil(750/10) = 75 -> capped at 4, planned
    // 40. bb: ceil(750/990) = 1 -> 1 epoch, planned min(750, 990) = 750.
    val docs =
      (0 until 2).map(i => (i.toLong, "aa", "w1 w2 w3 w4 w5", 15L)) ++
      (2 until 101).map(i => (i.toLong, "bb",
        (1 to 10).map(j => s"t$j").mkString(" "), 30L))
    docs.toDF("doc_id", "lang", "text", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val q = Catalog.all.find(_.name == "dp18_epoch_mixture").get
    val out = q.fn(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val (aaTok, aaTarget, aaEpochs, aaPlanned) = out("aa")
    val (bbTok, _, bbEpochs, bbPlanned) = out("bb")
    assert(aaTok == 10L && bbTok == 990L)
    assert(aaTarget == 750L)
    assert(aaEpochs == 4L, s"cap must engage: $out")
    assert(aaPlanned == 40L, s"planned = c_tok * cappedEpochs: $out")
    assert(bbEpochs == 1L && bbPlanned == 750L, s"big lang: $out")
  }
}
