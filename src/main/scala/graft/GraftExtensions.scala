package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.CosineSimilarity

/** Session-extension entry point: lets a deployment enable this engine's
  * native functions via configuration —
  * `--conf spark.sql.extensions=graft.GraftExtensions` — instead of
  * programmatic registration. The programmatic path
  * ([[graft.functions.CosineSimilarity.register]]) registers per-session;
  * this injects at session build, which is what a shared cluster (thrift
  * server, notebook service) needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "graft_cosine_similarity"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(exprs(0), exprs(1))))
    // conf-gated (spark.graft.binnedRangeJoin.width); a no-op otherwise
    ext.injectOptimizerRule(_ => graft.plans.BinnedRangeJoinRule)
  }
}
