package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Monitoring-domain operators: the reference's health/replication
  * computations (chStats.py getDataHealth / getDataReplicationHealth)
  * re-expressed as declarative DataFrame combinators. Every aggregate is
  * partial-agg friendly (no UDAFs), dims are broadcast, and ratios use
  * exact integer arithmetic with a single final division so results are
  * reproducible across engines and partitionings.
  */
object Monitoring {

  /** round(x*100) as long — exact cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Truncate a ratio to 2 decimals deterministically (floor-based;
    * avoids cross-engine round-half ambiguity on binary doubles). */
  def ratio2(c: Column): Column = floor(c * 100) / 100.0

  /** Per-node health snapshot: activity counts and an integer health pct
    * — `replicasOnlinePct = int(active/total*100)` (chStats.py:97-98). */
  def healthSnapshot(events: DataFrame): DataFrame = {
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"))
      .withColumn("health_pct",
        floor((col("n_total") - col("n_error")) * 100 / col("n_total")).cast("int"))
  }

  /** Per-node replication lag vs the freshest node (absoluteDelay /
    * queueSize analog, chStats.py:92-96). Global max is a 1-row
    * broadcast, not a window over all data. */
  def replicationLag(events: DataFrame): DataFrame = {
    val perNode = events.groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("queue_size"))
    val global = perNode.agg(max(col("last_us")).as("global_us"))
    perNode.crossJoin(broadcast(global))
      .select(col("user_id"), (col("global_us") - col("last_us")).as("lag_us"),
        col("queue_size"))
  }

  /** Storage metrics in the shape of the reference's system.parts query
    * (chStats.py:158-168): sum/sum ratios truncated to 2 decimals. */
  def partsMetrics(lineitem: DataFrame): DataFrame = {
    lineitem.groupBy(col("l_returnflag").as("part_group"))
      .agg(sum(cents(col("l_extendedprice"))).as("disk_cents"),
        sum(cents(col("l_quantity"))).as("row_cents"),
        count(lit(1)).as("n_parts"))
      .select(col("part_group"),
        ratio2(col("disk_cents") / col("row_cents")).as("avg_event_size"),
        ratio2(col("disk_cents") / 100.0 / 1000000.0).as("gb_on_disk"),
        col("n_parts"))
  }

  /** Bloat percentage: inactive bytes / total bytes * 100, truncated
    * (chStats.py:163-165). */
  def bloatPct(events: DataFrame): DataFrame = {
    events.groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "error", cents(col("value"))).otherwise(0L))
        .as("inactive_cents"),
        sum(cents(col("value"))).as("total_cents"))
      .select(col("user_id"),
        ratio2(col("inactive_cents") * 100.0 / col("total_cents")).as("bloat_pct"))
  }

  /** Two-level rollup node→shard (results_by_shard, chStats.py:119-123):
    * per-shard node count, replica total, and worst node. */
  def shardRollup(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame = {
    val perNode = customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), col("n_name"))
      .agg(count(lit(1)).as("n_replicas"))
    perNode
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("shard"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("n_replicas")).as("total_replicas"),
        max(col("n_replicas")).as("max_node_replicas"))
  }

  /** Directory enrichment with fallback naming (getHostName,
    * chStats.py:43-61): broadcast dim join; unresolved ids get a
    * synthesized name. */
  def enrich(events: DataFrame, customer: DataFrame): DataFrame = {
    events.join(broadcast(customer), col("user_id") === col("c_custkey"), "left")
      .withColumn("device_name",
        coalesce(col("c_name"), concat(lit("node-"), col("user_id"))))
  }

  /** Fixed-interval time bucketing (the reference's 3/5/30-minute job
    * cadence): epoch-aligned buckets, no session state. */
  def timeBucket(ts: Column, minutes: Int): Column = {
    val us = minutes.toLong * 60L * 1000000L
    // exact integer arithmetic (no double division) — epoch-aligned floor
    timestamp_micros(unix_micros(ts) - pmod(unix_micros(ts), lit(us)))
  }

  /** Per-client latency/traffic stats (getKeeperStats cons lines,
    * chStats.py:279-294: recved/sent/minlat/avglat/maxlat). */
  def clientStats(events: DataFrame): DataFrame = {
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("recved"),
        min(col("value")).as("minlat"),
        (sum(cents(col("value"))) / 100.0 / count(lit(1))).as("avglat"),
        max(col("value")).as("maxlat"))
  }

  /** Top-N entities by traffic volume; plans as TakeOrderedAndProject. */
  def topTalkers(events: DataFrame, n: Int): DataFrame = {
    events.groupBy(col("user_id"))
      .agg((sum(cents(col("value"))) / 100.0).as("traffic"), count(lit(1)).as("n_events"))
      .orderBy(col("traffic").desc, col("user_id"))
      .limit(n)
  }
}
