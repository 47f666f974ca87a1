package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.functions.TextFunctions

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()

  private def vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 0.0f)),   // bucket: dims 0,1 >= 0
      (1L, Array(1.0f, 0.2f, 0.0f, 0.0f)),   // same orthant as 0
      (2L, Array(-1.0f, -0.2f, 0.0f, 0.0f))  // opposite orthant
    ).toDF("vec_id", "embedding")
  }

  test("sign-LSH search only sees same-bucket candidates") {
    import spark.implicits._
    val q = vecs.filter($"vec_id" === 0)
    val r = Similarity.lshTopK(vecs, q, "vec_id", "embedding", bits = 2, k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(r == Set(1L)) // vec 2 lives in a different sign bucket
  }

  test("IVF search assigns to nearest centroid cell and searches within it") {
    import spark.implicits._
    val cents = vecs.filter($"vec_id" =!= 1) // centroids: 0 and 2
    val q = vecs.filter($"vec_id" === 1)
    val r = Similarity.ivfTopK(vecs, q, cents, "vec_id", "embedding", k = 5)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(r == Set(0L)) // 1 maps to cell of centroid 0; 2 is in the other cell
  }

  test("trainIvfCodebook: integer centroids, partitioning-invariant") {
    import spark.implicits._
    // integer-valued 4-dim vectors in two obvious clusters
    val data = Seq(
      (0L, Array(100f, 2f, 0f, 0f)), (1L, Array(90f, -3f, 1f, 0f)),
      (2L, Array(95f, 0f, -2f, 1f)), (3L, Array(-1f, 88f, 3f, 0f)),
      (4L, Array(2f, 101f, -1f, 1f)), (5L, Array(0f, 97f, 2f, -2f))
    )
    def train(parts: Int) = Similarity.trainIvfCodebook(
      spark.createDataset(data).toDF("vec_id", "embedding").repartition(parts),
      "vec_id", "embedding", dim = 4, k = 2, iters = 2)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toList))
      .sortBy(_._1).toList
    val book = train(1)
    assert(book.length == 2 && book.forall(_._2.length == 4))
    // every component is an exact integer (quantized training)
    assert(book.forall(_._2.forall(x => x == math.rint(x))))
    // the centroids migrate to the two cluster axes — one dominated by
    // dim 0, the other by dim 1 (seed→cluster mapping is an argmax
    // detail, so assert the pair, not the order)
    val doms = book.map(b => b._2.indexOf(b._2.max)).toSet
    assert(doms == Set(0, 1), s"expected one centroid per cluster axis, got $book")
    // exact integer arithmetic ⇒ bit-identical under any partitioning
    assert(train(7) == book)
  }

  test("filtered ANN: pre-filter fills k with within-predicate neighbors a post-filter loses") {
    import spark.implicits._
    // one sign bucket, two langs: the two MOST similar neighbors of the
    // query are 'fr', the only 'en' neighbor ranks below them
    val data = Seq(
      (0L, Array(1.0f, 0.10f, 0f, 0f), "en"), // query
      (1L, Array(1.0f, 0.11f, 0f, 0f), "fr"),
      (2L, Array(1.0f, 0.12f, 0f, 0f), "fr"),
      (3L, Array(0.9f, 0.50f, 0f, 0f), "en")
    ).toDF("vec_id", "embedding", "lang")
    val q = data.filter($"vec_id" === 0)
    val filtered = Similarity.lshTopKFiltered(data, q, "vec_id", "embedding",
      "lang", bits = 2, k = 2).collect()
    // pre-filter: the en neighbor IS found, and nothing cross-lang leaks
    assert(filtered.map(_.getAs[Long]("neighbor_id")).toSet == Set(3L))
    assert(filtered.forall(_.getAs[String]("lang") == "en"))
    // post-filter of the unfiltered top-k at the same k: both slots are
    // burned on 'fr' rows, so the qualifying neighbor vanishes entirely
    val post = Similarity.lshTopK(data, q, "vec_id", "embedding", bits = 2, k = 2)
      .join(data.select($"vec_id".as("neighbor_id"), $"lang"), Seq("neighbor_id"))
      .filter($"lang" === "en").collect()
    assert(post.isEmpty)
  }

  test("PQ: codebooks partitioning-invariant; identical vectors share codes; self is ADC argmax") {
    import spark.implicits._
    // deterministic pseudo-random 64-dim floats in [-0.5, 0.5); vec 30
    // duplicates vec 7 exactly
    def vec(seed: Long): Array[Float] =
      Array.tabulate(64)(i => (((seed * 73 + i * 37) % 101) - 50) / 100.0f)
    val data = (0L until 30L).map(id => (id, vec(id))) :+ (30L, vec(7L))
    def subsOf(parts: Int) = Similarity.pqSubRows(
      spark.createDataset(data).toDF("vec_id", "embedding").repartition(parts),
      "vec_id", "embedding", subs = 8, width = 8)
    def train(parts: Int) = Similarity.trainPqCodebooks(subsOf(parts), width = 8,
        k = 16, iters = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Long](2).toList))
      .sortBy(t => (t._1, t._2)).toList
    val book = train(1)
    assert(book.forall(_._3.length == 8))
    // exact integer arithmetic ⇒ bit-identical under any partitioning
    assert(train(5) == book)
    // identical vectors encode to identical codes
    val sub = subsOf(3)
    val bookDf = Similarity.trainPqCodebooks(sub, 8, 16, 2).localCheckpoint()
    val codes = Similarity.assignPq(sub, bookDf)
      .select(col("_vid"), col("s"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert((0 until 8).forall(s => codes((7L, s)) == codes((30L, s))))
    // the exact duplicate is vec 7's ADC top hit
    val qs = sub.filter(col("_vid") === 7L)
    val codesDf = Similarity.assignPq(sub, bookDf)
      .select(col("s"), col("cell").as("cent_id"), col("_vid"))
    val top = Similarity.pqTopK(codesDf, qs, bookDf, k = 1).collect()
    assert(top.length == 1 && top.head.getLong(2) == 30L,
      s"expected the exact duplicate as top-1, got ${top.mkString}")
  }

  test("ivfPqTopK: partitioning-invariant, prunes to the query's cell, finds the exact duplicate") {
    import spark.implicits._
    // same deterministic fixture as the PQ test: vec 30 duplicates vec 7
    def vec(seed: Long): Array[Float] =
      Array.tabulate(64)(i => (((seed * 73 + i * 37) % 101) - 50) / 100.0f)
    val data = (0L until 30L).map(id => (id, vec(id))) :+ (30L, vec(7L))
    def run(parts: Int) = {
      val df = spark.createDataset(data).toDF("vec_id", "embedding").repartition(parts)
      Similarity.ivfPqTopK(df, "vec_id", "embedding",
          df.filter($"vec_id" < 4), col("_vid") === 7L,
          subs = 8, width = 8, pqK = 16, iters = 2, k = 3)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toList
    }
    val r1 = run(1)
    // integer-exact end to end ⇒ bit-identical on any partitioning
    assert(run(5) == r1, s"partitioning changed the result: $r1 vs ${run(5)}")
    // the exact duplicate shares vec 7's cell AND codes: it must be top-1
    assert(r1.nonEmpty && r1.head._3 == 30L, s"expected the duplicate first, got $r1")
    // pruning semantics: every returned neighbor is in the query's cell
    val df = spark.createDataset(data).toDF("vec_id", "embedding")
    val cells = Similarity.assignCells(df, df.filter($"vec_id" < 4), "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1.forall { case (_, _, n, _) => cells(n) == cells(7L) },
      s"neighbor outside the query's IVF cell: $r1 / $cells")
  }

  test("ivfPqTopK composes with a TRAINED codebook (s6's integer Lloyd) — same contract, learned cells") {
    import spark.implicits._
    def vec(seed: Long): Array[Float] =
      Array.tabulate(64)(i => (((seed * 73 + i * 37) % 101) - 50) / 100.0f)
    val data = (0L until 30L).map(id => (id, vec(id))) :+ (30L, vec(7L))
    val df = spark.createDataset(data).toDF("vec_id", "embedding")
    // int8-quantize (trainIvfCodebook's input contract), train 4 cells
    val quant = expr("transform(embedding, x -> " +
      "cast(greatest(-127.0D, least(127.0D, floor(cast(x as double) * 127.0D + 0.5D))) as float))")
    val qdf = df.withColumn("embedding", quant)
    val book = Similarity.trainIvfCodebook(qdf, "vec_id", "embedding",
      dim = 64, k = 4, iters = 2).localCheckpoint()
    val r = Similarity.ivfPqTopK(qdf, "vec_id", "embedding", book,
        col("_vid") === 7L, subs = 8, width = 8, pqK = 16, iters = 2, k = 3)
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getLong(2)))
    // the exact duplicate lands in the same learned cell and same codes
    assert(r.nonEmpty && r.head._3 == 30L, s"expected the duplicate top-1, got ${r.toList}")
  }

  test("s27: serving through the PERSISTED index == s12's in-query build (recall parity by construction)") {
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val vecs = graft.sources.Tables.embeddings(spark, sfDir)
    val cents = vecs.filter(col("vec_id") < 8)
    // in-query build on s12's own query set
    val inQuery = Similarity.ivfPqTopK(vecs, "vec_id", "embedding", cents,
        pmod(col("_vid"), lit(50)) === 0, subs = 8, width = 8,
        pqK = 16, iters = 2, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    // build the artifact, round-trip it through parquet, serve the SAME
    // query batch — identical answers, zero retraining at serve time
    val dir = java.nio.file.Files.createTempDirectory("graft_s27_spec").toString
    val (ivfCents, book, codes) = Similarity.ivfPqIndex(
      vecs, "vec_id", "embedding", cents, subs = 8, width = 8, pqK = 16, iters = 2)
    ivfCents.write.parquet(s"$dir/cents")
    book.write.parquet(s"$dir/book")
    codes.write.parquet(s"$dir/codes")
    val served = Similarity.ivfPqServe(
        vecs.filter(pmod(col("vec_id"), lit(50)) === 0), "vec_id", "embedding",
        spark.read.parquet(s"$dir/cents"), spark.read.parquet(s"$dir/book"),
        spark.read.parquet(s"$dir/codes"), subs = 8, width = 8, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(served == inQuery,
      s"serve-through-artifact diverged: ${served.take(5)} vs ${inQuery.take(5)}")
  }

  test("multi-probe IVF: recall(nprobe=2) >= recall(nprobe=1) against brute-force truth") {
    import spark.implicits._
    // real fixture: the sf0.001 embeddings with s3's query/centroid split
    val vecs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = vecs.filter(pmod($"vec_id", lit(50)) === 0)
    val cents = vecs.filter($"vec_id" < 8)
    def hitSet(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hitSet(Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3))
    val probe1 = hitSet(Similarity.ivfTopK(vecs, q, cents, "vec_id", "embedding", k = 3))
    val probe2 = hitSet(Similarity.ivfTopKMultiProbe(vecs, q, cents, "vec_id", "embedding",
      nprobe = 2, k = 3))
    val r1 = (truth & probe1).size
    val r2 = (truth & probe2).size
    assert(r2 >= r1, s"2-probe recall $r2 must not trail 1-probe $r1 (truth ${truth.size})")
    // the knob must MATTER on this fixture: strictly more truth recovered
    assert(r2 > r1, s"fixture shows no cross-boundary neighbors (r1=$r1 r2=$r2) — weaken to >= only with evidence")
  }

  test("probeSweepRecall: per-query monotone in nprobe and consistent with the standalone operators") {
    import spark.implicits._
    val vecs = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = vecs.filter(pmod($"vec_id", lit(50)) === 0)
    val cents = vecs.filter($"vec_id" < 8)
    val sweep = Similarity.probeSweepRecall(vecs, q, cents, "vec_id", "embedding",
        probes = Seq(1, 2, 4), k = 3)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val queries = sweep.keys.map(_._2).toSet
    // monotone: more probes never lose truth hits for ANY query
    for (qid <- queries) {
      val h = Seq(1, 2, 4).map(p => sweep((p, qid)))
      assert(h(0) <= h(1) && h(1) <= h(2),
        s"query $qid recall not monotone across probes: $h")
    }
    // the sweep's nprobe=1 / nprobe=2 slices equal what the standalone
    // single-probe and multi-probe operators recover (same truth set)
    def hitTotal(df: org.apache.spark.sql.DataFrame): Long = {
      val truth = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
        .select($"query_id", $"neighbor_id")
      df.select($"query_id", $"neighbor_id")
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
    }
    val p1 = hitTotal(Similarity.ivfTopK(vecs, q, cents, "vec_id", "embedding", k = 3))
    val p2 = hitTotal(Similarity.ivfTopKMultiProbe(vecs, q, cents, "vec_id", "embedding",
      nprobe = 2, k = 3))
    assert(sweep.collect { case ((1, _), h) => h }.sum == p1,
      "sweep nprobe=1 total hits != standalone ivfTopK hits")
    assert(sweep.collect { case ((2, _), h) => h }.sum == p2,
      "sweep nprobe=2 total hits != standalone ivfTopKMultiProbe hits")
  }

  test("s25: a tombstoned top-1 neighbor is replaced by the next-best, never returned") {
    import spark.implicits._
    // one cell (single centroid): query 10's brute order is 11 > 12 > 13
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.99f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(0.9f, 0.3f, 0.0f, 0.0f)),
      (13L, Array(0.7f, 0.7f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = corpus.filter($"vec_id" === 10L)
    val indexed = Similarity.indexWithCells(corpus, cents, "vec_id", "embedding")
    val q = indexed.filter($"vec_id" === 10L)
    def top(ix: org.apache.spark.sql.DataFrame) =
      Similarity.searchAssigned(ix, q, "vec_id", "embedding", k = 2)
        .orderBy($"rank").collect().map(_.getAs[Long]("neighbor_id")).toSeq
    assert(top(indexed) == Seq(11L, 12L))
    val tomb = Seq(11L).toDF("vec_id")
    val masked = indexed.join(broadcast(tomb), Seq("vec_id"), "left_anti")
    // deleted vector gone, next-best promoted — and the masked serve
    // equals a rebuild without the vector
    assert(top(masked) == Seq(12L, 13L))
    val rebuilt = Similarity.indexWithCells(
      corpus.filter($"vec_id" =!= 11L), cents, "vec_id", "embedding")
    assert(top(rebuilt) == top(masked))
  }

  test("cosineDupPairs respects blocking and threshold") {
    import spark.implicits._
    val df = Seq(
      (0L, 0, Array(1.0f, 0.0f)), (1L, 0, Array(1.0f, 0.01f)),
      (2L, 1, Array(1.0f, 0.0f)) // identical direction but different block
    ).toDF("vec_id", "label", "embedding")
    val pairs = Similarity.cosineDupPairs(df, "vec_id", "embedding", "label", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("langId tie-breaks deterministically en > de > fr") {
    import spark.implicits._
    val r = Seq((1, 1, 1), (0, 2, 2), (0, 0, 0)).toDF("en", "de", "fr")
      .select(TextFunctions.langId($"en", $"de", $"fr").as("lang"))
      .collect().map(_.getString(0)).toSeq
    assert(r == Seq("en", "de", "und"))
  }

  test("s20: fused RRF recall STRICTLY exceeds every single channel (the hybrid claim)") {
    // the three-rounds-pending assertion (r7-r9 Next #1): with two
    // genuinely complementary channels — width-32 hashed-tf projections
    // with independent collision patterns — fusion beats each channel
    // alone against exact tf-cosine truth. Deterministic: every number
    // is md5/integer-derived, so these are fixed properties of the
    // sf0.001 corpus, not statistical luck. The zero-signal lexical
    // channel is priced in the same output (the measured reason it is
    // excluded from the fusion).
    val rows = graft.SparkEntry.queries("s20_hybrid_complement")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("variant") -> r.getAs[Long]("recall_bp"))
      .toMap
    assert(rows.keySet == Set("fused", "hash_a", "hash_b", "lexical"))
    val fused = rows("fused")
    val singles = Seq("hash_a", "hash_b", "lexical").map(rows)
    assert(singles.forall(fused > _),
      s"fused=$fused must strictly exceed every channel: $rows")
  }

  test("s22: beam-search recall is monotone in hops and the walk actually finds neighbors") {
    val rows = SparkEntry.queries("s22_graph_ann")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[Int]("hop") -> r.getAs[Long]("recall_bp")).toMap
    assert(rows.keySet == Set(1, 2, 3))
    // another hop may only ADD reachable candidates (the beam re-ranks
    // a superset) — recall never regresses, and 3 hops must strictly
    // beat the entry neighborhood alone
    assert(rows(2) >= rows(1) && rows(3) >= rows(2), rows.toString)
    assert(rows(3) > rows(1), s"the walk found nothing beyond hop 1: $rows")
  }

  test("s23: the Pareto table prices pruning — brute is the ceiling, pruned paradigms score less") {
    val rows = SparkEntry.queries("s23_index_pareto")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getAs[String]("variant") ->
        (r.getAs[Long]("n_scored"), r.getAs[Long]("recall_bp"))).toMap
    assert(rows.keySet == Set("brute", "lsh", "ivf", "graph"))
    // brute IS the truth: perfect recall at maximum cost
    assert(rows("brute")._2 == 10000L, rows.toString)
    Seq("lsh", "ivf", "graph").foreach { v =>
      assert(rows(v)._1 < rows("brute")._1,
        s"$v must score strictly fewer candidates than brute: $rows")
      assert(rows(v)._2 <= 10000L && rows(v)._2 >= 0L)
    }
  }

  test("s21: triplet mining picks hardest pos/neg within bucket, drops one-legged anchors") {
    import spark.implicits._
    val data = Seq(
      // anchor + bucket-15 candidates (all dims >= 0)
      (0L, "A", Array(1.0f, 1.0f, 1.0f, 1.0f)),
      (1L, "A", Array(1.0f, 1.0f, 1.0f, 0.9f)),  // hardest pos: cos≈0.99902
      (2L, "A", Array(1.0f, 0.1f, 0.1f, 0.1f)),  // weaker pos: cos≈0.64046
      (3L, "B", Array(1.0f, 1.0f, 0.1f, 0.1f)),  // hardest IN-bucket neg: cos≈0.77396
      // bucket-14 impostor (dim0 < 0): cos≈0.86312 > id3's — would win
      // the neg slot if the LSH bucket bound were broken
      (4L, "B", Array(-0.01f, 1.0f, 1.0f, 1.0f)),
      // anchor alone in bucket 0: no candidate legs at all → dropped
      (5L, "C", Array(-1.0f, -1.0f, -1.0f, -1.0f))
    ).toDF("vec_id", "label", "embedding")
    val q = data.filter(col("vec_id").isin(0L, 5L))
    val out = Similarity.tripletMine(data, q, "vec_id", "embedding", "label", bits = 4)
      .collect()
    assert(out.length == 1, s"anchor 5 has no legs and must drop: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("query_id") == 0L)
    assert(r.getAs[Long]("pos_id") == 1L)
    assert(r.getAs[Long]("neg_id") == 3L, "out-of-bucket impostor 4 must never score")
    assert(r.getAs[Double]("margin") < 0.0, "pos outranks neg here: margin < 0")
  }

  test("map-side argmin/argmax assignment ≡ explode+min(struct) reference (r16 rewrite)") {
    import spark.implicits._
    // r16 replaced assignPq's broadcast-explode + groupBy argmin and
    // nearestCell's crossJoin + max_by with map-side folds over a
    // collected centroid array. This pins value equivalence (including
    // tie-breaks) against the old formulation computed inline.
    def vec(seed: Long): Array[Float] =
      Array.tabulate(64)(i => (((seed * 73 + i * 37) % 101) - 50) / 100.0f)
    val data = (0L until 25L).map(id => (id, vec(id))) :+ (25L, vec(3L))
    val df = spark.createDataset(data).toDF("vec_id", "embedding").repartition(4)
    val sub = Similarity.pqSubRows(df, "vec_id", "embedding", subs = 8, width = 8)
    val book = Similarity.trainPqCodebooks(sub, 8, 16, 1).localCheckpoint()
    val got = Similarity.assignPq(sub, book)
      .select(col("_vid"), col("s"), col("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val ref = sub.join(broadcast(book), Seq("s"))
      .withColumn("_d", expr(
        "aggregate(zip_with(sv, c, (x, y) -> (x - y) * (x - y)), " +
        "CAST(0 AS BIGINT), (acc, t) -> acc + t)"))
      .groupBy(col("_vid"), col("s"))
      .agg(min(struct(col("_d"), col("cent_id"))).as("_m"))
      .select(col("_vid"), col("s"), col("_m.cent_id").as("cell")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == ref, "assignPq fold diverged from the explode+min reference")
    // nearestCell via the public assignCells face, vs crossJoin + max_by
    val cents = df.filter(col("vec_id") < 4)
    val gotCells = Similarity.assignCells(df, cents, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val refCells = df.crossJoin(broadcast(
        cents.select(col("vec_id").as("cent_id"), col("embedding").as("c_vec"))))
      .withColumn("_csim",
        round(expr("cosine_sim(embedding, c_vec)"), 6))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cent_id"), struct(col("_csim"), (-col("cent_id")).as("_nc"))).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCells == refCells, "nearestCell fold diverged from the crossJoin+max_by reference")
  }
}
