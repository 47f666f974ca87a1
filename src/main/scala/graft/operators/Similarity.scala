package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions._
import graft.operators.Relational

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Scale posture: the query set is the small side and is broadcast; the
  * corpus streams. Brute force is the correctness baseline (still a
  * broadcast-nested-loop, no corpus shuffle); sign-LSH bucketing is the
  * scale path — bucket equi-join bounds each query's candidate set so
  * compared-pairs grow ~n/2^bits per query instead of n.
  */
object Similarity {

  /** Top-k cosine neighbors by brute force. Deterministic ranking:
    * round(cos,6) desc, then neighbor id. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val cand = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"))
    val sims = cand.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    rankTopK(sims, k)
  }

  /** Reduce candidate (query_id, neighbor_id, sim) rows to ranked top-k
    * per query via the custom TopNPerKey operator: per-partition partial
    * heaps mean the shuffle carries at most queries*k rows — windowing
    * the full candidate set would shuffle ALL of them. The row_number
    * then runs over the tiny survivor set. */
  private def rankTopK(sims: DataFrame, k: Int): DataFrame = {
    val top = Relational.topNPerGroupFast(sims, k, Seq("query_id"),
      Seq(("sim", false), ("neighbor_id", true)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Sign-LSH bucket id: one bit per leading dimension's sign. A
    * dimension past the vector's length counts as positive
    * (try_element_at + coalesce) so short vectors bucket rather than
    * throw under ANSI — the DuckDB mirror is `coalesce(e[i+1], 1)`,
    * list_extract past the end being NULL there. */
  def signBucket(vecCol: String, bits: Int): Column = expr(
    s"aggregate(transform(sequence(0, ${bits - 1}), i -> " +
    s"CASE WHEN coalesce(try_element_at($vecCol, i + 1), CAST(1.0 AS FLOAT)) >= 0 " +
    s"THEN shiftleft(1, i) ELSE 0 END), " +
    "0, (acc, x) -> acc + x)")

  /** Hierarchical block refinement: assign every vector an effective
    * block key — the base block when its population is within `cap`,
    * else the base extended with `bits1` (then `bits2`) sign-LSH bits.
    * Only when even the finest sub-block exceeds `cap` (identical sign
    * patterns — e.g. exact-duplicate vectors, which sign bits cannot
    * separate) is the row dropped, the irreducible final guard. This is
    * the scale fix for cap-by-drop: at 100× corpus an over-cap block
    * sub-splits and still produces pairs/neighbors instead of silently
    * vanishing from the result.
    *
    * Scale shape: ONE corpus pass builds the finest census
    * (groupBy(base, fine-bucket) partial agg — the exchange carries one
    * narrow row per occupied sub-block, never vectors); the coarser
    * censuses re-aggregate that tiny result. All three join back as
    * broadcasts, so the refinement adds zero corpus shuffles. Level
    * choice is per-block deterministic (population is a function of the
    * key), so both engines agree exactly.
    *
    * Output: input columns + `_base` / `_lvl` / `_sub` (the composite
    * effective key — join on all three) + `_bn` (effective population;
    * singleton blocks are dropped since they cannot pair). */
  def subSplitBlocks(vectors: DataFrame, vecCol: String, blockCol: Column,
      cap: Int, bits1: Int, bits2: Int): DataFrame = {
    require(bits1 < bits2, "bits1 must refine coarser than bits2")
    val mask1 = (1 << bits1) - 1
    val base = vectors.withColumn("_base", blockCol)
      .withColumn("_sbf", signBucket(vecCol, bits2))
    val cf = base.groupBy(col("_base"), col("_sbf"))
      .agg(count(lit(1)).as("_nf"))
    val cm = cf.groupBy(col("_base"), col("_sbf").bitwiseAND(lit(mask1)).as("_sbm"))
      .agg(sum(col("_nf")).as("_nm"))
    val c0 = cm.groupBy(col("_base")).agg(sum(col("_nm")).as("_n0"))
    base
      .withColumn("_sbm", col("_sbf").bitwiseAND(lit(mask1)))
      .join(broadcast(c0), Seq("_base"))
      .join(broadcast(cm), Seq("_base", "_sbm"))
      .join(broadcast(cf), Seq("_base", "_sbf"))
      .withColumn("_lvl",
        when(col("_n0") <= cap, lit(0))
          .when(col("_nm") <= cap, lit(1))
          .when(col("_nf") <= cap, lit(2)))
      .withColumn("_sub",
        when(col("_lvl") === 0, lit(-1))
          .when(col("_lvl") === 1, col("_sbm"))
          .otherwise(col("_sbf")))
      .withColumn("_bn",
        when(col("_lvl") === 0, col("_n0"))
          .when(col("_lvl") === 1, col("_nm"))
          .otherwise(col("_nf")))
      .filter(col("_lvl").isNotNull && col("_bn") >= 2)
      .drop("_sbf", "_sbm", "_n0", "_nm", "_nf")
  }

  /** Top-k within the query's sign bucket (scale path). Queries whose
    * bucket holds no other vectors produce no rows. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, bits: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      signBucket(vecCol, bits).as("bucket"))
    val cand = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      signBucket(vecCol, bits).as("bucket"))
    val sims = cand.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    rankTopK(sims, k)
  }

  /** Contrastive TRIPLET mining — the embedding-model training-data
    * op (anchor, hardest positive, hardest negative): for each anchor,
    * the most-similar same-label vector and the most-similar
    * DIFFERENT-label vector within its sign-LSH bucket, plus the
    * triplet margin sim_neg − sim_pos (margin ≥ 0 flags the violated
    * triplets a trainer actually wants — where an impostor outranks
    * the nearest true neighbor). Differs from lshTopKFiltered in kind:
    * the label predicate is an INEQUALITY for the negative side, so it
    * cannot ride the equi-key — both sides score off ONE bucket-bounded
    * broadcast probe and split by a pos/neg tag AFTER the hash join
    * (still never a corpus×corpus pair set). Top-1 per (anchor, side)
    * goes through TopNPerKey partial heaps — the shuffle carries ≤
    * 2 rows per anchor. Anchors missing either side in their bucket
    * drop (inner join — a triplet needs both legs; documented).
    * Margin is a subtraction of two round-6 doubles — IEEE subtraction
    * is correctly rounded, so cross-engine exact on identical inputs. */
  def tripletMine(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, bits: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(labelCol).as("q_label"), signBucket(vecCol, bits).as("bucket"))
    val cand = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      col(labelCol).as("n_label"), signBucket(vecCol, bits).as("bucket"))
    val scored = cand.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("side",
        when(col("n_label") === col("q_label"), "pos").otherwise("neg"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("side"), col("neighbor_id"), col("sim"))
    val top1 = Relational.topNPerGroupFast(scored, 1,
      Seq("query_id", "side"), Seq(("sim", false), ("neighbor_id", true)))
    val pos = top1.filter(col("side") === "pos").select(col("query_id"),
      col("neighbor_id").as("pos_id"), col("sim").as("sim_pos"))
    val neg = top1.filter(col("side") === "neg").select(col("query_id"),
      col("neighbor_id").as("neg_id"), col("sim").as("sim_neg"))
    pos.join(neg, Seq("query_id"))
      .withColumn("margin", round(col("sim_neg") - col("sim_pos"), 6))
  }

  /** FILTERED ANN — metadata-predicate vector search (the "only
    * neighbors with my tenant/language/license" production shape). The
    * filter attribute becomes part of the LSH equi-join key
    * (bucket, attr), so non-qualifying candidates are dropped by the
    * hash probe MAP-SIDE — they are never cosine-scored and never reach
    * the ranking. The alternative, POST-filtering an unfiltered top-k,
    * both wastes the score work and silently under-fills k (a query
    * whose true same-attr neighbors rank below k cross-attr ones
    * returns fewer than k rows); pre-filter keeps k genuine
    * within-predicate neighbors. Cost is the same one broadcast hash
    * join as lshTopK — the composite key only SHRINKS each probe's
    * candidate set (bucket∩attr instead of bucket). */
  def lshTopKFiltered(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, filterCol: String, bits: Int, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      col(filterCol), signBucket(vecCol, bits).as("bucket"))
    val cand = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"),
      col(filterCol), signBucket(vecCol, bits).as("bucket"))
    val sims = cand.join(broadcast(q), Seq("bucket", filterCol))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col(filterCol), col("neighbor_id"), col("sim"))
    val top = Relational.topNPerGroupFast(sims, k, Seq("query_id"),
      Seq(("sim", false), ("neighbor_id", true)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    top.withColumn("rank", row_number().over(w))
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("sim"),
        col(filterCol))
  }

  /** Nearest-centroid assignment. Argmax via max_by (map-side partial
    * aggregate): the ×|centroids| fan-out collapses per input partition
    * BEFORE the shuffle — a row_number window would instead shuffle and
    * sort every (vector, centroid) pair. Tie-break = lowest centroid
    * id, encoded as max over (csim, -cent_id). `cents` must have
    * (cent_id, c_vec) and is always broadcast. */
  /** r16 shape: centroids fold into ONE broadcast array row and the
    * argmax runs MAP-SIDE (array_max over (sim, -cent_id) structs) —
    * the old form crossJoined every corpus row ×|cells| and shuffled
    * the whole corpus (vector payload included) through a
    * groupBy(outId) max_by to undo the explode. Same round(cosine, 6),
    * same max-sim/min-cent_id tie-break (struct ordering is NaN-aware
    * both ways), zero exchange. */
  private def nearestCell(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, outId: String, outVec: String): DataFrame =
    df.select(col(idCol).as(outId), col(vecCol).as(outVec))
      .crossJoin(broadcast(cents.groupBy().agg(
        array_sort(collect_list(struct(col("cent_id"), col("c_vec")))).as("_cbs"))))
      .withColumn("cell", expr(
        // opaque(): anti-inlining barrier (see assignPq / OpaqueBarrier)
        s"opaque(array_max(transform(_cbs, cb -> named_struct(" +
        s"'sim', round(cosine_sim($outVec, cb.c_vec), 6), " +
        s"'nid', -cb.cent_id))).nid * -1)"))
      .select(col(outId), col(outVec), col("cell"))

  /** Public nearest-centroid assignment: (id, cell) per corpus vector.
    * Broadcast codebook + max_by partial-agg argmax — one hash shuffle
    * carrying one row per vector, never a per-vector window sort. */
  def assignCells(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec"))
    nearestCell(corpus, cents, idCol, vecCol, "vec_id", "_v")
      .select(col("vec_id"), col("cell"))
  }

  /** Public (id, vec, cell) assignment keeping the vector — the
    * MATERIALIZED-INDEX row shape: what an IVF index persists so that
    * serving never re-runs the argmax over the corpus (s15 writes this
    * as a layout; the nightly delta is the only thing ever assigned
    * again). Column names pass through unchanged so the output can be
    * written and unioned with later batches. */
  def indexWithCells(corpus: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec"))
    nearestCell(corpus, cents, idCol, vecCol, idCol, vecCol)
  }

  /** Cell-partitioned search over PRE-ASSIGNED rows (both sides carry
    * a `cell` column): the serving half of IVF, split out so a
    * materialized index (indexWithCells written to disk) can be
    * searched without re-assignment. Queries broadcast; ranking rides
    * TopNPerKey bounded heaps. */
  def searchAssigned(corpusCells: DataFrame, queryCells: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val cand = corpusCells.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("n_vec"), col("cell"))
    val q = queryCells.select(col(idCol).as("query_id"),
      col(vecCol).as("q_vec"), col("cell"))
    // `cell` may be nearestCell's argmax fold — the opaque() barrier
    // keeps the join from inlining it into probe keys and inferred
    // filters (a left-join dodge does NOT work here: the =!= filter
    // above null-rejects, so EliminateOuterJoin converts it back)
    val sims = cand.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    rankTopK(sims, k)
  }

  /** IVF-style ANN: assign every vector to its nearest centroid cell
    * (broadcast centroid set), then search only within the query's cell.
    * `centroids` is the codebook — a fixed seed set, or the output of
    * `trainIvfCodebook`. Deterministic assignment: max cosine, centroid
    * id as tie-break. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    searchAssigned(indexWithCells(corpus, centroids, idCol, vecCol),
      indexWithCells(queries, centroids, idCol, vecCol), idCol, vecCol, k)

  /** Multi-probe IVF — the recall knob a production IVF index always
    * exposes (nprobe): the corpus keeps ONE cell per vector, but each
    * query searches its `nprobe` NEAREST cells instead of only the
    * first, recovering neighbors that fell just across a Voronoi
    * boundary. Cost scales linearly in nprobe (each probe cell's
    * population), never back toward brute force. The query side stays
    * tiny: queries×|centroids| scored rows reduce through TopNPerKey
    * bounded heaps to queries×nprobe (cell, vector) rows, which
    * broadcast onto the cell-partitioned corpus — the corpus is
    * assigned and joined exactly as in ivfTopK. A corpus vector can
    * match a query at most once: its single cell equals at most one of
    * the query's distinct probe cells. */
  def ivfTopKMultiProbe(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String, nprobe: Int,
      k: Int): DataFrame = {
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec"))
    val corpusCells = nearestCell(corpus, cents, idCol, vecCol, "neighbor_id", "n_vec")
    val qScored = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("_csim", round(cosine(col("q_vec"), col("c_vec")), 6))
      .select(col("query_id"), col("q_vec"), col("cent_id"), col("_csim"))
    val qCells = Relational.topNPerGroupFast(qScored, nprobe,
        Seq("query_id"), Seq(("_csim", false), ("cent_id", true)))
      .select(col("query_id"), col("q_vec"), col("cent_id").as("cell"))
    val sims = corpusCells.join(broadcast(qCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    rankTopK(sims, k)
  }

  /** Probe-sweep recall eval — the tuning curve behind multi-probe's
    * `nprobe` knob: for every probe level in `probes`, recall@k of
    * multi-probe IVF against brute-force truth, per query. The sweep is
    * ONE index search, not |probes|: the corpus is assigned and scored
    * once against the UNION probe set (max nprobe), each candidate
    * tagged with the probe rank `arn` of the query cell that reached
    * it; the nprobe=p result is then the arn≤p slice re-ranked — a
    * probe-level explode over the already-bounded candidate rows (the
    * corpus is scanned and cosine-scored exactly once). Every
    * (nprobe, query) pair emits, including empty-candidate ones
    * (recall 0 — what an index tuner must see). Integer recall
    * (n_hits*100 div k); all ranking deterministic (round(·,6) +
    * id tie-breaks). */
  def probeSweepRecall(corpus: DataFrame, queries: DataFrame,
      centroids: DataFrame, idCol: String, vecCol: String,
      probes: Seq[Int], k: Int): DataFrame = {
    val maxP = probes.max
    val probesArr = array(probes.map(lit): _*)
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec"))
    val corpusCells = indexWithCells(corpus, centroids, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"), col("cell"))
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("_csim").desc, col("cent_id"))
    val qCells = queries
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
      .crossJoin(broadcast(cents))
      .withColumn("_csim", round(cosine(col("q_vec"), col("c_vec")), 6))
      .withColumn("arn", row_number().over(qw))
      .filter(col("arn") <= maxP)
      .select(col("query_id"), col("q_vec"), col("cent_id").as("cell"), col("arn"))
    val cand = corpusCells.join(broadcast(qCells), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("arn"))
    val leveled = cand.select(col("query_id"), col("neighbor_id"), col("sim"),
      explode(filter(probesArr, p => p >= col("arn"))).as("nprobe"))
    val lw = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    val top = leveled.withColumn("rnk", row_number().over(lw))
      .filter(col("rnk") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"))
    val truth = bruteForceTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val hits = top.join(truth, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("nprobe"), col("query_id"))
      .agg(count(lit(1)).as("n_hits"))
    val base = queries.select(col(idCol).as("query_id"))
      .select(col("query_id"), explode(probesArr).as("nprobe"))
    base.join(hits, Seq("nprobe", "query_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("recall_pct", expr(s"CAST(n_hits * 100 div $k AS INT)"))
      .select(col("nprobe"), col("query_id"), col("n_hits"), col("recall_pct"))
  }

  /** Two-stage retrieval: coarse top-`coarseK` over int8-quantized
    * vectors (the 4×-memory-bandwidth scan a production index does),
    * then exact full-precision rerank of ONLY the coarse survivors down
    * to top-`k`. The candidate set (queries × coarseK rows) broadcasts
    * back onto the full-precision corpus — the expensive float cosine
    * runs on coarseK rows per query, never the corpus. Both stages are
    * deterministic: integer-exact coarse sims, round(·,6) + neighbor-id
    * tie-break in both rankings. */
  def rerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, coarseK: Int, k: Int): DataFrame = {
    val quant = expr(s"transform($vecCol, x -> " +
      "cast(greatest(-127.0D, least(127.0D, floor(cast(x as double) * 127.0D + 0.5D))) as float))")
    val cand = bruteForceTopK(corpus.withColumn(vecCol, quant),
        queries.withColumn(vecCol, quant), idCol, vecCol, coarseK)
      .select(col("query_id"), col("neighbor_id"))
    val full = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("n_vec"))
    val qFull = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val sims = full.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(qFull), Seq("query_id"))
      .withColumn("sim", round(cosine(col("q_vec"), col("n_vec")), 6))
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    rankTopK(sims, k)
  }

  /** Lloyd's k-means over INTEGER-quantized vectors — the trained-
    * codebook path for ivfTopK. Input vectors must hold integer-valued
    * components (s4's int8 quantization); the centroid update is then
    * exact integer arithmetic — per-dimension scaled floor-division
    * `(scale * sum) fdiv n` — so training is bit-identical on any
    * engine and any partitioning (no float-sum order drift), the same
    * reason production PQ/IVF codebooks ship quantized.
    *
    * Scale shape: the codebook is k rows and stays broadcast; each
    * Lloyd iteration is one map-side broadcast assign (no corpus
    * shuffle) + one groupBy(cell) with dim sum COLUMNS (partial agg:
    * k×(dim+1) rows per partition reach the exchange — the
    * one-pass-k-columns shape, not a ×dim explode). Centroids never
    * visit the driver; `iters` chains tiny plan segments instead.
    * Empty cells drop out of the codebook (standard Lloyd's). */
  def trainIvfCodebook(vectors: DataFrame, idCol: String, vecCol: String,
      dim: Int, k: Int, iters: Int, scale: Int = 64): DataFrame = {
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long") // floor div, exact: |a| << 2^53
    var cents = vectors.filter(col(idCol) < k)
      .select(col(idCol).cast("long").as("cent_id"), col(vecCol).as("c_vec"))
    (1 to iters).foreach { _ =>
      val assigned = nearestCell(vectors, cents, idCol, vecCol, "_vid", "_v")
      val sums = (1 to dim).map(i =>
        sum(element_at(col("_v"), i).cast("long")).as(s"_s$i"))
      cents = assigned.groupBy(col("cell").as("cent_id"))
        .agg(count(lit(1)).as("_n"), sums: _*)
        .select(col("cent_id"),
          array((1 to dim).map(i =>
            fdiv(lit(scale.toLong) * col(s"_s$i"), col("_n")).cast("float")): _*)
            .as("c_vec"))
    }
    cents.select(col("cent_id").as(idCol), col("c_vec").as(vecCol))
  }

  // ------------------------------------------------------ product quant

  /** PQ subvector rows: (_vid, s, sv) where sv is the s-th width-dim
    * slice of the vector after int8 quantization ×64 — every component
    * a small exact long, so assignment (integer L2), centroid update
    * (floor-div), and ADC dots are bit-identical on any partitioning
    * and in DuckDB. The ×8 projection-collapse recompute of the
    * element-wise quantization is deliberate: it is 64 cheap arithmetic
    * ops, far below the cost of materializing through a shuffle. */
  def pqSubRows(vectors: DataFrame, idCol: String, vecCol: String,
      subs: Int, width: Int, keep: Seq[String] = Nil): DataFrame =
    vectors
      .withColumn("_v64", expr(s"transform($vecCol, x -> " +
        "CAST(greatest(-127.0D, least(127.0D, floor(CAST(x AS DOUBLE) * 127.0D + 0.5D))) " +
        "AS BIGINT) * 64)"))
      .select(col(idCol).cast("long").as("_vid") +: keep.map(col) :+ explode(expr(
        s"transform(sequence(0, ${subs - 1}), s -> " +
        s"struct(s AS s, slice(_v64, s * $width + 1, $width) AS sv))")).as("p"): _*)
      .select(col("_vid") +: keep.map(col) :+ col("p.s").as("s") :+
        col("p.sv").as("sv"): _*)

  /** Nearest-centroid assignment per (vector, subspace): exact integer
    * L2, deterministic tie-break on cent_id, centroids broadcast
    * (subs·k rows). Returns (_vid, s, sv, cell).
    *
    * r16 shape: the per-subspace codebook is folded into ONE array row
    * (k structs, cent_id-ascending) and the argmin runs MAP-SIDE as an
    * array_min over per-centroid distances — the old form exploded
    * every sub-row ×k through the broadcast join and shuffled all 8N
    * rows back through a groupBy(_vid, s) to undo it. min of
    * (d, cent_id) structs ≡ the old min(struct(_d, cent_id)): same
    * distance, same tie-break, zero exchange. */
  def assignPq(subRows: DataFrame, cents: DataFrame,
      keep: Seq[String] = Nil): DataFrame =
    subRows.join(broadcast(cents.groupBy(col("s")).agg(
        array_sort(collect_list(struct(col("cent_id"), col("c")))).as("_cbs"))),
        Seq("s"))
      .withColumn("cell", expr(
        // opaque(): anti-inlining barrier — downstream joins key on
        // `cell`, and without it the whole fold tree is substituted
        // into the probe key and inferred isnotnull filters (3
        // evaluations/row, probed; OpaqueBarrier scaladoc)
        "opaque(array_min(transform(_cbs, cb -> named_struct(" +
        "'d', aggregate(zip_with(sv, cb.c, (x, y) -> (x - y) * (x - y)), " +
        "CAST(0 AS BIGINT), (acc, t) -> acc + t), " +
        "'id', cb.cent_id))).id)"))
      .select(col("_vid") +: col("s") +: col("sv") +:
        col("cell") +: keep.map(col): _*)

  /** Per-subspace integer k-means (`subs` independent codebooks trained
    * in ONE partitioned dataframe): exact integer L2 assignment +
    * floor-div centroid update at scale 64 — training is bit-identical
    * on any partitioning, and centroids never touch the driver. */
  def trainPqCodebooks(subRows: DataFrame, width: Int, k: Int,
      iters: Int): DataFrame = {
    def fdiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long") // floor div, exact: |a| << 2^53
    var cents = subRows.filter(col("_vid") < k)
      .select(col("s"), col("_vid").as("cent_id"), col("sv").as("c"))
    (1 to iters).foreach { _ =>
      val sums = (1 to width).map(i => sum(element_at(col("sv"), i)).as(s"_s$i"))
      cents = assignPq(subRows, cents)
        .groupBy(col("s"), col("cell").as("cent_id"))
        .agg(count(lit(1)).as("_n"), sums: _*)
        .select(col("s"), col("cent_id"),
          array((1 to width).map(i => fdiv(col(s"_s$i"), col("_n"))): _*).as("c"))
    }
    cents
  }

  /** ADC (asymmetric distance computation) top-k: vectors live as
    * `subs` one-byte codes; each query dots its subvectors against the
    * broadcast codebook ONCE (queries·subs·k lookup rows), and scoring
    * a vector is `subs` table lookups + an integer sum — the
    * compressed-domain scan that makes a 100-TB ANN index fit in
    * memory (8 bytes/vector instead of 256). Candidate PRUNING is
    * orthogonal (IVF, s3/s6); like s1/s4 this baseline scans all
    * codes. Exact long arithmetic end to end. */
  def pqTopK(codes: DataFrame, queryRows: DataFrame, cents: DataFrame,
      k: Int): DataFrame = {
    val lut = queryRows.join(broadcast(cents), Seq("s"))
      .select(col("_vid").as("query_id"), col("s"), col("cent_id"),
        expr("aggregate(zip_with(sv, c, (x, y) -> x * y), " +
          "CAST(0 AS BIGINT), (acc, t) -> acc + t)").as("dot"))
    val scores = codes
      .join(broadcast(lut), Seq("s", "cent_id"))
      .groupBy(col("query_id"), col("_vid").as("vec_id"))
      .agg(sum(col("dot")).as("score"))
      .filter(col("vec_id") =!= col("query_id"))
    val top = graft.operators.Relational.topNPerGroupFast(scores, k,
      Seq("query_id"), Seq(("score", false), ("vec_id", true)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** Composed IVF×PQ retrieval — the production 100-TB ANN serving
    * shape (prune-then-ADC): every vector gets an IVF cell (broadcast
    * centroid argmax, the s3 path) AND `subs` one-byte PQ codes (the
    * s11 path); a query then ADC-scores ONLY vectors in its own cell.
    * The broadcast LUT carries each query's cell, so the
    * (s, cent_id, ivf_cell) hash probe drops other-cell code rows
    * MAP-SIDE — the score aggregate receives same-cell pairs only,
    * ~1/|cells| of s11's all-pairs input, and non-matching corpus rows
    * never reach a shuffle. No corpus⋈corpus shuffle join anywhere:
    * cell assignment is the one argmax groupBy, the codes ride the same
    * sub-row frame (the cell column travels with the rows instead of
    * joining back on id), and both the codebook and the LUT broadcast.
    *
    * `queryPred` selects query sub-rows by `_vid`. Scoring is exact
    * long arithmetic end to end; ranking is score desc, vec_id asc. */
  def ivfPqTopK(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryPred: Column, subs: Int, width: Int,
      pqK: Int, iters: Int, k: Int): DataFrame = {
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec"))
    // unlike s11's cheap re-derivable scan lineage, this prefix holds
    // the argmax shuffle — checkpoint so four downstream uses (2 train
    // iterations, encode, queries) don't re-run the assignment
    val assigned = nearestCell(vectors, cents, idCol, vecCol, "_aid", "_v")
      .withColumnRenamed("cell", "ivf_cell")
      .localCheckpoint()
    val sub = pqSubRows(assigned, "_aid", "_v", subs, width, keep = Seq("ivf_cell"))
    val book = trainPqCodebooks(sub, width, pqK, iters).localCheckpoint()
    val codes = assignPq(sub, book, keep = Seq("ivf_cell"))
      .select(col("s"), col("cell").as("cent_id"), col("_vid"), col("ivf_cell"))
    val lut = sub.filter(queryPred).join(broadcast(book), Seq("s"))
      .select(col("_vid").as("query_id"), col("ivf_cell"), col("s"), col("cent_id"),
        expr("aggregate(zip_with(sv, c, (x, y) -> x * y), " +
          "CAST(0 AS BIGINT), (acc, t) -> acc + t)").as("dot"))
    val scores = codes
      .join(broadcast(lut), Seq("s", "cent_id", "ivf_cell"))
      .filter(col("_vid") =!= col("query_id"))
      .groupBy(col("query_id"), col("_vid").as("vec_id"))
      .agg(sum(col("dot")).as("score"))
    val top = Relational.topNPerGroupFast(scores, k,
      Seq("query_id"), Seq(("score", false), ("vec_id", true)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** BUILD half of the persisted IVF-PQ serving index (s27 — the
    * build/serve split s12 lacks: s12 re-trains codebooks inside every
    * query; production builds ONCE and serves many query batches).
    * Returns the three tables a serving index persists: IVF centroids
    * (cent_id, c_vec), trained PQ codebooks (s, cent_id, c), and the
    * compressed corpus codes (s, cent_id, _vid, ivf_cell) — 8 one-byte
    * code ids + one cell id per vector, the only corpus-sized artifact.
    * Training math identical to ivfPqTopK (same centroids, same Lloyd
    * iterations), so serving through the artifact answers exactly what
    * the in-query build answers (PipelineSpec pins the parity). */
  def ivfPqIndex(vectors: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, subs: Int, width: Int, pqK: Int, iters: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val cents = centroids.select(col(idCol).as("cent_id"), col(vecCol).as("c_vec"))
    val assigned = nearestCell(vectors, cents, idCol, vecCol, "_aid", "_v")
      .withColumnRenamed("cell", "ivf_cell")
      .localCheckpoint()
    val sub = pqSubRows(assigned, "_aid", "_v", subs, width, keep = Seq("ivf_cell"))
    val book = trainPqCodebooks(sub, width, pqK, iters)
    val codes = assignPq(sub, book, keep = Seq("ivf_cell"))
      .select(col("s"), col("cell").as("cent_id"), col("_vid"), col("ivf_cell"))
    (cents, book, codes)
  }

  /** SERVE half (s27): answer a FRESH query batch from the persisted
    * index. The only raw-vector compute is the query batch's own cell
    * assignment + sub-vector quantization (O(|batch|), broadcast
    * centroids); the corpus is touched ONLY through the codes table —
    * the broadcast LUT carries each query's cell so other-cell code
    * rows drop at the map-side hash probe, and the score aggregate sees
    * ~1/|cells| of the codes. At 100 TB the index is built nightly and
    * this path is the per-request cost. */
  def ivfPqServe(queries: DataFrame, idCol: String, vecCol: String,
      ivfCents: DataFrame, book: DataFrame, codes: DataFrame,
      subs: Int, width: Int, k: Int): DataFrame = {
    val qAssigned = nearestCell(queries, ivfCents, idCol, vecCol, "_aid", "_v")
      .withColumnRenamed("cell", "ivf_cell")
    val qsub = pqSubRows(qAssigned, "_aid", "_v", subs, width,
      keep = Seq("ivf_cell"))
    val lut = qsub.join(broadcast(book), Seq("s"))
      .select(col("_vid").as("query_id"), col("ivf_cell"), col("s"),
        col("cent_id"),
        expr("aggregate(zip_with(sv, c, (x, y) -> x * y), " +
          "CAST(0 AS BIGINT), (acc, t) -> acc + t)").as("dot"))
    val scores = codes
      .join(broadcast(lut), Seq("s", "cent_id", "ivf_cell"))
      .filter(col("_vid") =!= col("query_id"))
      .groupBy(col("query_id"), col("_vid").as("vec_id"))
      .agg(sum(col("dot")).as("score"))
    val top = Relational.topNPerGroupFast(scores, k,
      Seq("query_id"), Seq(("score", false), ("vec_id", true)))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    top.withColumn("rnk", row_number().over(w))
      .select(col("query_id"), col("rnk"), col("vec_id"), col("score"))
  }

  /** Embedding near-duplicate pairs, blocked by a key (label, cluster,
    * or LSH bucket) to avoid the full cross product.
    *
    * Skew guard (the fixed version of Dedup.lshCandidates' maxBucket): a
    * block of B vectors fans out to B(B-1)/2 pairs, so one degenerate
    * block (a catch-all label) goes quadratic at corpus scale. Blocks
    * larger than `maxBlock` SUB-SPLIT on `splitBits` sign-LSH bits via
    * subSplitBlocks — pairs within an over-cap block are still found
    * among sign-compatible vectors instead of the block silently
    * dropping out of the result. Only a block whose members share one
    * sign pattern even at `splitBits._2` bits (exact-dup pile) is
    * dropped as the final guard. The census joins are broadcasts of
    * narrow aggregates — the guard never shuffles the vectors. */
  def cosineDupPairs(vectors: DataFrame, idCol: String, vecCol: String,
      blockCol: String, threshold: Double, maxBlock: Int = 1024,
      splitBits: (Int, Int) = (4, 8)): DataFrame = {
    val blocked = subSplitBlocks(vectors, vecCol, col(blockCol), maxBlock,
      splitBits._1, splitBits._2)
    val v = blocked.select(col("_base"), col("_lvl"), col("_sub"),
      col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val u = blocked.select(col("_base"), col("_lvl"), col("_sub"),
      col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    v.join(u, Seq("_base", "_lvl", "_sub"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(cosine(col("vec_a"), col("vec_b")), 6))
      .filter(col("sim") > threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
