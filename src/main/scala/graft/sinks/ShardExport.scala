package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.PrefixSumOps

/** Token-bounded training-shard export — the pipeline's last mile
  * (VERDICT r12 #4): take a globally-ordered corpus (dp20's mixture
  * interleave is the canonical order), cut it into shards at a token
  * budget, write one file per shard, and emit the MANIFEST a training
  * job actually consumes: per-shard doc count, token count, position
  * range, and an order-sensitive content hash.
  *
  * Shard cut contract (dp03's overflow-pack convention): `shard =
  * floor(exclusive_token_cumsum / budget)`. Documents are never split;
  * the document that crosses a budget boundary belongs to the shard it
  * STARTED in, so every shard's payload is < budget + its last
  * document's tokens, and shard boundaries depend only on the prefix of
  * the order — appending data never re-cuts existing shards. The cumsum
  * is the two-phase distributed prefix sum
  * ([[PrefixSumOps.exclusiveRunningSum]]), NOT a single-reducer global
  * window.
  *
  * Scale shape: assignment is one prefix-sum pass; the manifest is one
  * hash agg over shard keys whose per-shard state is bounded by the
  * budget (a shard holds ≤ budget/min_doc_tokens docs — the content
  * hash's collect_list is budget-bounded by construction, never
  * corpus-bounded); the write is one shuffle on the shard key so each
  * shard lands as exactly one file.
  */
object ShardExport {

  /** Assign each row to its token-bounded shard: input +
    * [cum_excl, shard]. `posCol` must be a non-negative unique global
    * position (dp20's `global_pos`); `tokCol` the row's token count.
    */
  def assignShards(df: DataFrame, posCol: String, tokCol: String,
      tokenBudget: Long): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    PrefixSumOps.exclusiveRunningSumAuto(df, Seq(), posCol, tokCol, "cum_excl")
      .withColumn("shard", expr(s"cum_excl div ${tokenBudget}L"))
  }

  /** INCREMENTAL shard assignment (the daily-append mode): continue
    * cutting from a running token offset — the total tokens of
    * everything already exported — touching ONLY the new batch
    * (O(batch), the dd08/dd18 incremental discipline). Because the cut
    * rule is `shard = floor(exclusive_cumsum / budget)` and the
    * exclusive cumsum of a batch row equals `offsetTokens` + its
    * batch-local cumsum, the incremental assignment is IDENTICAL to
    * what a full re-run over history+batch would give the batch rows —
    * appends never re-cut existing shards, by construction (dp25
    * proves this cross-engine: its oracle runs the full computation
    * and restricts to the batch suffix).
    *
    * @param offsetTokens sum of `tokCol` over all previously exported
    *                     rows (one number — the manifest's running
    *                     total, not a scan of history)
    */
  def assignShardsIncremental(df: DataFrame, posCol: String, tokCol: String,
      tokenBudget: Long, offsetTokens: Long): DataFrame = {
    require(tokenBudget > 0, "tokenBudget must be positive")
    require(offsetTokens >= 0, "offsetTokens must be non-negative")
    PrefixSumOps.exclusiveRunningSumAuto(df, Seq(), posCol, tokCol, "_se_batch")
      .withColumn("cum_excl", col("_se_batch") + lit(offsetTokens))
      .withColumn("shard", expr(s"cum_excl div ${tokenBudget}L"))
      .drop("_se_batch")
  }

  /** The manifest relation over an [[assignShards]] result: one row per
    * shard — [shard, n_docs, n_tokens, first_pos, last_pos,
    * content_md5]. The content hash is md5 over the comma-joined doc
    * ids in position order (order-SENSITIVE: a reordered shard is a
    * different artifact), so a consumer can verify a shard file against
    * the manifest without trusting the writer.
    */
  def manifest(assigned: DataFrame, idCol: String, posCol: String,
      tokCol: String): DataFrame =
    assigned.groupBy("shard").agg(
      count(lit(1)).as("n_docs"),
      sum(col(tokCol)).cast("long").as("n_tokens"),
      min(col(posCol)).cast("long").as("first_pos"),
      max(col(posCol)).cast("long").as("last_pos"),
      md5(concat_ws(",",
        transform(
          array_sort(collect_list(struct(col(posCol).cast("long").as("p"),
            col(idCol).cast("long").as("i")))),
          x => x.getField("i").cast("string")))).as("content_md5"))

  /** Write the shards (one parquet file per shard, under
    * `outDir/shards/shard=N/`) plus the manifest
    * (`outDir/manifest/`), and return the manifest. The repartition on
    * the shard key puts each shard's rows in exactly one task, so the
    * partitioned write emits exactly one file per shard directory; rows
    * are sorted by position within the file so a sequential reader sees
    * the training order.
    */
  def writeShards(assigned: DataFrame, outDir: String, idCol: String,
      posCol: String, tokCol: String): DataFrame = {
    assigned
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col(posCol))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards")
    val m = manifest(assigned, idCol, posCol, tokCol)
    m.coalesce(1).write.mode("overwrite").parquet(s"$outDir/manifest")
    m
  }
}
