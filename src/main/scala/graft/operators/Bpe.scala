package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge LEARNING (Sennrich et al. 2016) — the
  * tokenizer-training op every LLM data pipeline runs before anything
  * else can count a token. t3/t8 consume a tokenizer's output; this is
  * the pass that produces one.
  *
  * Semantics (classic word-internal BPE, no end-of-word marker —
  * documented choice): the corpus collapses to its whitespace-token
  * vocabulary with counts; each word starts as its character sequence;
  * each iteration counts ADJACENT symbol pairs weighted by word count
  * (overlapping occurrences each count: "aaa" yields (a,a) twice —
  * Sennrich's counting), merges the argmax pair (tie-break: count
  * desc, then left, then right — total order, both engines agree),
  * and re-segments every word by the standard GREEDY left-to-right
  * non-overlapping replace ("aaaa" + merge (a,a) → [aa][aa], never
  * [aa][a][a]).
  *
  * Scale shape: ONE corpus scan builds the vocabulary aggregate —
  * everything after runs on |V| rows (vocab ≪ corpus at any SF; a
  * 100 TB crawl's distinct-word vocab is millions of rows — a few
  * executors' worth). The argmax pair is a 1-row aggregate broadcast
  * back (never collected to the driver); iterations are
  * driver-composed like s10's PageRank with localCheckpoint breaking
  * lineage between rounds (the checkpointed frame is vocab-sized).
  * Per-word state is the symbol array — bounded by word length.
  *
  * The greedy re-segmentation is ONE aggregate() HOF fold per word
  * (the st14/m48 sequential-fold pattern): acc ends with `left` and
  * the next symbol is `right` → replace the tail with the merged
  * symbol, else append. The DuckDB oracle expresses the same fold as
  * a recursive CTE walking symbol positions (list_reduce is broken
  * for varying lengths — CLAUDE.md round-7 finding) with every
  * reused stage MATERIALIZED (the CTE-inlining lesson).
  *
  * Output: one row per merge iteration — iter, left_sym, right_sym,
  * merged, pair_cnt (corpus occurrences of the pair at merge time),
  * syms_after (total corpus symbol count after applying the merge —
  * the compression curve a tokenizer trainer actually watches). */
object Bpe {

  def learnMerges(docs: DataFrame, textCol: String, n: Int): DataFrame =
    run(docs, textCol, n)._2

  /** Final per-word segmentation after `n` learned merges:
    * (w, cnt, syms) — the apply half (t22) joins this vocab-sized
    * frame back to the exploded corpus, so the expensive merge loop
    * runs once on |V| rows and never touches corpus-sized data. */
  def segmentVocab(docs: DataFrame, textCol: String, n: Int): DataFrame =
    run(docs, textCol, n)._1

  private def run(docs: DataFrame, textCol: String, n: Int)
      : (DataFrame, DataFrame) = {
    require(n >= 1, s"need at least one merge iteration (got $n)")
    var segs = docs
      .select(explode(split(trim(col(textCol)), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))
      .localCheckpoint()
    var outs = Seq.empty[DataFrame]
    var it = 0
    var exhausted = false
    while (it < n && !exhausted) {
      it += 1
      val best = segs
        .select(col("cnt"), explode(expr(
          "IF(size(syms) < 2, array(), transform(sequence(0, size(syms) - 2), " +
          "j -> named_struct('l', syms[j], 'r', syms[j + 1])))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("pair_cnt"))
        .orderBy(col("pair_cnt").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint()
      // degenerate corpus (every word already one symbol, or n exceeds
      // the available merges): best is EMPTY and crossJoin(broadcast)
      // would silently empty segs and every later iteration — stop
      // instead, matching the oracle's recursive walk which keeps
      // single-symbol words. 1-row probe on a checkpointed frame (the
      // d9 convergence-probe pattern), never a label collect.
      if (best.isEmpty) { exhausted = true }
      else {
      segs = segs.crossJoin(broadcast(best))
        .withColumn("syms", expr(
          "aggregate(syms, slice(syms, 1, 0), (acc, x) -> " +
          "IF(size(acc) > 0 AND element_at(acc, -1) = l AND x = r, " +
          "concat(slice(acc, 1, size(acc) - 1), array(concat(l, r))), " +
          "concat(acc, array(x))))"))
        .drop("l", "r", "pair_cnt")
        .localCheckpoint()
      val after = segs.agg(
        sum(col("cnt") * size(col("syms"))).as("syms_after"))
      outs = outs :+ best.crossJoin(broadcast(after))
        .select(lit(it).as("iter"), col("l").as("left_sym"),
          col("r").as("right_sym"), concat(col("l"), col("r")).as("merged"),
          col("pair_cnt"), col("syms_after"))
      }
    }
    val merges =
      if (outs.isEmpty)
        docs.sparkSession.emptyDataFrame
          .withColumn("iter", lit(0))
          .withColumn("left_sym", lit("")).withColumn("right_sym", lit(""))
          .withColumn("merged", lit(""))
          .withColumn("pair_cnt", lit(0L)).withColumn("syms_after", lit(0L))
          .limit(0)
      else outs.reduce(_ unionByName _).orderBy(col("iter"))
    (segs, merges)
  }
}
