package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-prior) join and run-length analytics over event
  * streams.
  *
  * Scale posture: the as-of join is NOT a pairwise join — both sides
  * union into one stream, shuffle once by key, and a running max carries
  * the latest left-side row forward (max() skips nulls, giving
  * "last non-null" without IGNORE NULLS support). O(n log n) per key,
  * single exchange, works at any key cardinality.
  */
object AsOf {

  /** Sortable packed key: zero-padded (ts_us, id) — running max over
    * strings == running max over (ts, id) tuples, and the encoding is
    * exactly reproducible in any engine. */
  def packKey(tsUs: Column, id: Column): Column =
    concat(lpad(tsUs.cast("string"), 20, "0"), lpad(id.cast("string"), 10, "0"))

  /** For each `right` event, the most recent prior `left` event of the
    * same key (strictly before by (ts_us, id) order, same-instant left
    * rows first). Emits right rows having a match. */
  def asofPrior(events: DataFrame, keyCol: String, idCol: String, tsUsCol: String,
      isLeft: Column, isRight: Column): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsUsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("_lkey", when(isLeft, packKey(col(tsUsCol), col(idCol))))
      .withColumn("_prior", max(col("_lkey")).over(w))
      .filter(isRight && col("_prior").isNotNull)
      .select(col(keyCol), col(idCol), col(tsUsCol),
        substring(col("_prior"), 1, 20).cast("long").as("prior_ts_us"),
        substring(col("_prior"), 21, 10).cast("long").as("prior_id"))
      .withColumn("gap_us", col(tsUsCol) - col("prior_ts_us"))
  }

  /** Longest run of rows matching `flag` per key (gaps-and-islands via
    * double row_number; one shuffle, window-only). */
  def longestStreak(events: DataFrame, keyCol: String, idCol: String,
      tsUsCol: String, flag: Column): DataFrame = {
    val all = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(idCol))
    val flagged = Window.partitionBy(col(keyCol), col("_is"))
      .orderBy(col(tsUsCol), col(idCol))
    events
      .withColumn("_is", flag.cast("int"))
      .withColumn("_grp", row_number().over(all) - row_number().over(flagged))
      .filter(col("_is") === 1)
      .groupBy(col(keyCol), col("_grp"))
      .agg(count(lit(1)).as("_len"))
      .groupBy(col(keyCol))
      .agg(max(col("_len")).as("max_streak"), count(lit(1)).as("n_streaks"))
  }
}
