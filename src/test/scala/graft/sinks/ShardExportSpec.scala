package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** Drives the token-bounded shard export end-to-end (dp24's sink half):
  * real partitioned write, one file per shard, budget bound, and the
  * round-trip guarantee — reading the shard files back in (shard, pos)
  * order reproduces the input order exactly, and the manifest's
  * order-sensitive content hash matches a hash recomputed from the
  * files alone (what a consuming training job checks).
  */
class ShardExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val budget = 100L

  // positions 1..40 with deterministic pseudo-random token counts in
  // [1, 37], including one doc bigger than a third of the budget so
  // boundary-crossing docs actually occur
  private def input = {
    val rows = (1L to 40L).map(p => (p * 31 % 97, p, (p * 17 % 37) + 1))
    rows.toDF("doc_id", "pos", "tok")
  }

  test("assignShards: dp03's overflow-pack contract holds") {
    val a = ShardExport.assignShards(input, "pos", "tok", budget).cache()
    // exclusive cumsum is consistent: shard = floor(cum_excl / budget)
    val bad = a.where(col("shard") =!= expr(s"cum_excl div ${budget}L")).count()
    assert(bad == 0)
    // every shard's payload < budget + its last doc's tokens, and every
    // shard except possibly the last STARTS below its boundary
    val per = a.groupBy("shard")
      .agg(sum("tok").as("t"), max("pos").as("lastPos"))
      .join(a.select(col("pos").as("lastPos"), col("tok").as("lastTok")), "lastPos")
      .collect()
    for (r <- per) {
      val (t, lastTok) = (r.getAs[Long]("t"), r.getAs[Long]("lastTok"))
      assert(t < budget + lastTok,
        s"shard ${r.getAs[Long]("shard")} payload $t >= budget+lastDoc ${budget + lastTok}")
    }
    // shards are contiguous in position order: sorting by pos never
    // decreases the shard id
    val seq = a.orderBy("pos").select("shard").as[Long].collect()
    assert(seq.zip(seq.tail).forall { case (x, y) => x <= y })
    a.unpersist()
  }

  test("assignShardsIncremental equals the full run restricted to the batch (no re-cut)") {
    import spark.implicits._
    val all = input
    for (boundary <- Seq(0L, 17L, 39L)) {
      val offset = all.where(col("pos") <= boundary)
        .agg(coalesce(sum("tok"), lit(0L))).as[Long].head()
      val full = ShardExport.assignShards(all, "pos", "tok", budget)
        .where(col("pos") > boundary)
        .select("pos", "shard").as[(Long, Long)].collect().toMap
      val inc = ShardExport.assignShardsIncremental(
          all.where(col("pos") > boundary), "pos", "tok", budget, offset)
        .select("pos", "shard").as[(Long, Long)].collect().toMap
      assert(inc == full, s"boundary $boundary: incremental cut diverged")
    }
  }

  test("writeShards: one file per shard; round-trip reproduces order and manifest hash") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shards").toString
    val a = ShardExport.assignShards(input, "pos", "tok", budget)
    val m = ShardExport.writeShards(a, dir, "doc_id", "pos", "tok")
      .orderBy("shard").collect()

    // one data file per shard directory
    val shardRoot = new java.io.File(s"$dir/shards")
    val dirs = shardRoot.listFiles().filter(_.getName.startsWith("shard="))
    assert(dirs.length == m.length)
    for (sd <- dirs) {
      val files = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"${sd.getName} has ${files.length} files")
    }

    // reading files back in (shard, pos) order reproduces the input order
    val back = spark.read.parquet(s"$dir/shards")
      .orderBy("shard", "pos").select("doc_id").as[Long].collect()
    val expected = input.orderBy("pos").select("doc_id").as[Long].collect()
    assert(back.toSeq == expected.toSeq, "shard concatenation broke the order")

    // the manifest hash matches one recomputed from the FILES alone
    // the partition column reads back as int (partition-value inference)
    val recomputed = spark.read.parquet(s"$dir/shards")
      .withColumn("shard", col("shard").cast("long"))
      .groupBy("shard")
      .agg(md5(concat_ws(",", transform(
          array_sort(collect_list(struct(col("pos").cast("long").as("p"),
            col("doc_id").cast("long").as("i")))),
          x => x.getField("i").cast("string")))).as("h"),
        count(lit(1)).as("n"), sum("tok").as("t"))
      .orderBy("shard").collect()
    assert(recomputed.length == m.length)
    for ((f, mm) <- recomputed.zip(m)) {
      assert(f.getAs[Long]("shard") == mm.getAs[Long]("shard"))
      assert(f.getAs[String]("h") == mm.getAs[String]("content_md5"),
        s"shard ${f.getAs[Long]("shard")}: file hash != manifest hash")
      assert(f.getAs[Long]("n") == mm.getAs[Long]("n_docs"))
      assert(f.getAs[Long]("t") == mm.getAs[Long]("n_tokens"))
    }
  }
}
