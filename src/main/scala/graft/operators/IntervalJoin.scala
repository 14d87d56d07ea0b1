package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval joins with an equi-join execution shape.
  *
  * A naive `points JOIN intervals ON p BETWEEN s AND e` has no equi-key,
  * so Spark plans a broadcast-nested-loop join — O(|points| × |intervals|)
  * comparisons and a hard broadcast-size ceiling on the interval side. At
  * 100 TB neither survives. Binning restores an equi-key: every interval
  * is replicated to each fixed-width bin it overlaps, every point hashes
  * to the one bin that contains it, the join runs on the bin key (hash
  * shuffle — AQE-splittable, no broadcast ceiling), and the true
  * containment predicate runs as a residual filter.
  *
  * Each (point, interval) pair can only meet in the point's own bin, so
  * the join produces no duplicates and needs no post-dedup. Replication
  * factor is `ceil(span/binWidth)+1` per interval — pick `binWidth` near
  * the typical interval span so replication stays ~2× while each bin's
  * candidate population stays bounded.
  */
object IntervalJoin {

  /** Join each point row to every interval row whose `[startCol, endCol]`
    * (inclusive) contains `pointCol`. All three columns must be numeric
    * (cast dates to epoch days / timestamps to epoch micros first).
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binnedIntervals = intervals.withColumn("_bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    val binnedPoints = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    binnedPoints.join(binnedIntervals, Seq("_bin"))
      .where(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }
}
