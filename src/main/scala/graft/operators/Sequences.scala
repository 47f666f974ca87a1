package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence mining primitives shared by the monitoring and
  * streaming domains.
  */
object Sequences {

  /** Per-user sorted-timeline event-type trigrams with sequential
    * 1-based positions: (user_id, pos, trigram). Within-timeline order
    * is total — (ts_us, event_id) — so the output is deterministic.
    *
    * ONE copy of the oracle-gated construction (m50_seq_trigrams'
    * global counts and st16_stream_seq's positional emission both fold
    * over exactly this expression; two inline copies were a drift risk
    * — round-7 advisor finding). Scale shape: one user_id exchange
    * (the st14 fold-template shape — never a window sort of the fact);
    * trigrams built by zip-of-slices on the sorted type array, OUTSIDE
    * any lambda (the §6 transform-recompute trap), then posexploded.
    */
  def userTypeTrigrams(events: DataFrame): DataFrame =
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("ts_us"), col("event_id"),
        col("event_type")))).as("tl"))
      .withColumn("types", expr("transform(tl, x -> x.event_type)"))
      .withColumn("tri", expr(
        "CASE WHEN size(types) >= 3 THEN transform(" +
        "arrays_zip(slice(types, 1, size(types) - 2), " +
        "slice(types, 2, size(types) - 2), slice(types, 3, size(types) - 2)), " +
        "x -> concat_ws(' ', x.`0`, x.`1`, x.`2`)) ELSE array() END"))
      .select(col("user_id"), posexplode(col("tri")).as(Seq("pos0", "trigram")))
      .select(col("user_id"), (col("pos0") + 1).cast("long").as("pos"),
        col("trigram"))
}
