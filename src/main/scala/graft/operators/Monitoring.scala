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

  /** Nested DATA_NODE_HEALTH document assembly (getDataHealth,
    * chStats.py:82-123): replica rows → per-node replica arrays →
    * per-shard node arrays → one JSON document per shard (the shape
    * uploadEvents consumes). Scale notes: the fact table collapses to
    * directory-cardinality partial aggregates BEFORE any collect_list,
    * so assembly state is bounded by the node directory (nodes × tables),
    * never the event volume; arrays are sorted so document bytes are
    * deterministic under any partitioning. */
  def nestedHealthDoc(events: DataFrame): DataFrame = {
    val replicas = events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("queue_size"),
        max(unix_micros(col("ts"))).as("last_us"),
        sum(cents(col("value"))).as("v_cents"))
    val nodes = replicas
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        col("event_type").as("db_table"), col("queue_size"),
        col("last_us"), col("v_cents")))).as("replicas"))
      .select(col("user_id"),
        concat(lit("node-"), col("user_id")).as("device_name"),
        concat(lit("10.0."), (col("user_id") / 256).cast("long"), lit("."),
          pmod(col("user_id"), lit(256))).as("device_ip"),
        col("replicas"))
    nodes
      .groupBy((pmod(col("user_id"), lit(4)) + 1).as("shard"))
      .agg(array_sort(collect_list(struct(col("device_name"),
        col("device_ip"), col("replicas")))).as("nodes"))
      .select(col("shard"), to_json(struct(col("shard"), col("nodes"))).as("doc"))
  }

  /** Schema of a nested health document (for from_json). */
  val healthDocSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      "shard BIGINT, nodes ARRAY<STRUCT<device_name: STRING, " +
      "device_ip: STRING, replicas: ARRAY<STRUCT<db_table: STRING, " +
      "queue_size: BIGINT, last_us: BIGINT, v_cents: BIGINT>>>>")

  /** Flatten nested health documents back to per-replica rows — the
    * reference's handle_dataHealth/handle_replicas path
    * (chStats.py:405-422): each replica record is re-joined with its
    * node's identity and its shard. Inverse of [[nestedHealthDoc]]. */
  def flattenHealthDoc(docs: DataFrame): DataFrame =
    docs.select(from_json(col("doc"), healthDocSchema).as("d"))
      .select(col("d.shard").as("shard"), explode(col("d.nodes")).as("node"))
      .select(col("shard"), col("node.device_name").as("device_name"),
        col("node.device_ip").as("device_ip"),
        explode(col("node.replicas")).as("r"))
      .select(col("shard"), col("device_name"), col("device_ip"),
        col("r.db_table").as("db_table"), col("r.queue_size").as("queue_size"),
        col("r.last_us").as("last_us"), col("r.v_cents").as("v_cents"))

  /** Absent/erroring-node records (chStats.py:213-221, 266-271, 319-325):
    * nodes present in the directory but silent in the reporting stream get
    * an error payload with fallback identity fields. The reporting set is
    * a distinct-key aggregate (directory cardinality), so the anti join
    * broadcasts it — the directory itself is never shuffled. */
  def absentNodes(directory: DataFrame, events: DataFrame,
      dirKey: String): DataFrame = {
    val reporting = events.select(col("user_id")).distinct()
    directory.join(broadcast(reporting), col(dirKey) === col("user_id"),
      "left_anti")
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
