package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants of the sampling/packing family (p1-p6). The
  * DuckDB oracle proves value-equality; these prove the SEMANTICS a
  * pipeline relies on: splits cover disjointly, per-group samples are
  * exactly sized, packing conserves tokens, chunking covers every
  * token, rebalancing hits the target exactly.
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local()
  val sf = "/root/testdata/sf0.01"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("p23: FFD packs a hand-checked fixture optimally where next-fit fragments") {
    import spark.implicits._
    import graft.sources.Tables
    // one (lang, blk) group, cap 256, arrival 130,130,126,126:
    //   next-fit: [130] [130,126] [126]            -> 3 bins
    //   ffd:      [130,126] [130,126]              -> 2 bins
    // the fold result must equal a brute-force scala simulation, and
    // ffd <= nextfit must hold on every real-corpus shard
    val docs = Seq(
      (0L, Seq.fill(130)("w").mkString(" "), "xx"),
      (1L, Seq.fill(130)("w").mkString(" "), "xx"),
      (2L, Seq.fill(126)("w").mkString(" "), "xx"),
      (3L, Seq.fill(126)("w").mkString(" "), "xx")
    ).toDF("doc_id", "text", "lang")
    // run the key's fold logic against a scala reference implementation
    def ffdRef(items: Seq[Long], cap: Long = 256L): Int = {
      val loads = scala.collection.mutable.ArrayBuffer[Long]()
      items.sorted(Ordering[Long].reverse).foreach { t =>
        loads.indexWhere(_ + t <= cap) match {
          case -1 => loads += t
          case i  => loads(i) += t
        }
      }
      loads.length
    }
    def nfRef(items: Seq[Long], cap: Long = 256L): Int = {
      var bins = 0; var cur = 0L
      items.foreach { t =>
        if (bins == 0) { bins = 1; cur = t }
        else if (cur + t <= cap) cur += t
        else { bins += 1; cur = t }
      }
      bins
    }
    val lens = Seq(130L, 130L, 126L, 126L)
    // the local dir is ignored by this fixture path: call the fold via
    // a temp view of the fixture through the real query body
    val tmp = java.nio.file.Files.createTempDirectory("ffdfix").toString
    docs.select(col("doc_id"), col("text"), col("lang"),
        length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("p23_ffd_pack")(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("bins_ffd") == ffdRef(lens))
    assert(out.head.getAs[Int]("bins_nextfit") == nfRef(lens))
    assert(ffdRef(lens) < nfRef(lens),
      "fixture must exercise the case where FFD strictly wins")
    // on the real corpus the inequality holds in every shard
    val real = run("p23_ffd_pack").collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Int]("bins_ffd") <= r.getAs[Int]("bins_nextfit"),
        s"FFD must never pack worse than next-fit: $r")
    }
  }

  test("p16: the Horvitz–Thompson corpus-size estimate from kept rows lands near truth") {
    val kept = run("p16_importance_sample").collect()
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    // every kept row carries 1/p ×10⁴; Σ(1/p) over kept rows is an
    // unbiased estimator of N — deterministic here (fixed md5 draws),
    // measured 484 vs 500 at sf0.01; assert the 10% band so a weight
    // formula regression (wrong floor, wrong scale) fails loudly
    val ht = kept.map(_.getAs[Long]("inv_w_sc")).sum / 10000.0
    assert(math.abs(ht - corpus) <= corpus * 0.10, s"HT estimate $ht vs corpus $corpus")
    // the sampler must actually downsample (not pass everything through)
    assert(kept.length < corpus, s"kept ${kept.length} of $corpus")
  }

  test("p17: cluster-keyed split straddles ZERO clusters; the naive split provably leaks") {
    val rows = run("p17_split_leakage").collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(1), r.getLong(2))).toMap
    val (clusterStraddle, _, multi) = rows("cluster")
    val (naiveStraddle, _, _) = rows("naive")
    assert(clusterStraddle == 0L, s"cluster-keyed split must never straddle, got $clusterStraddle")
    assert(multi > 0L, "fixture must contain multi-doc clusters or the test is vacuous")
    assert(naiveStraddle > 0L, "naive split should demonstrably leak on this corpus")
  }

  test("p1: splits disjointly cover the corpus at roughly the configured rates") {
    val splits = run("p1_hash_split").collect()
    val total = splits.map(_.getAs[Long]("n_docs")).sum
    val corpus = graft.sources.Tables.documents(spark, sf).count()
    assert(total == corpus, "every doc lands in exactly one split")
    val test = splits.filter(_.getString(0) == "test").map(_.getAs[Long]("n_docs")).sum
    val valN = splits.filter(_.getString(0) == "val").map(_.getAs[Long]("n_docs")).sum
    // thresholds '1a'/'33' ≈ 10.2% / 9.8%; md5 is uniform enough that
    // 500 draws land within ±6 points
    assert(test >= corpus * 4 / 100 && test <= corpus * 16 / 100, s"test=$test")
    assert(valN >= corpus * 4 / 100 && valN <= corpus * 16 / 100, s"val=$valN")
  }

  test("p3: per-group sample is exactly n for every group with >= n docs") {
    // groups smaller than n legitimately return their whole membership —
    // assert against min(n, corpus count) so a small language class in
    // future testdata doesn't fail the suite spuriously
    val corpusCounts = graft.sources.Tables.documents(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = run("p3_group_sample").groupBy("lang").count().collect()
    assert(counts.nonEmpty)
    counts.foreach { r =>
      val expected = math.min(20L, corpusCounts(r.getString(0)))
      assert(r.getLong(1) == expected, r.toString)
    }
  }

  test("p4: packing conserves tokens per shard (no doc lost or double-packed)") {
    import spark.implicits._
    val packed = run("p4_token_pack")
      .groupBy("lang").agg(sum($"bin_tokens").as("packed"), sum($"n_docs").as("docs"))
    val direct = graft.sources.Tables.documents(spark, sf)
      .withColumn("n_tokens", size(split(trim($"text"), "\\s+")))
      .groupBy("lang").agg(sum($"n_tokens").as("direct"), count(lit(1)).as("n"))
    val joined = packed.join(direct, "lang").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("packed") == r.getAs[Long]("direct"), r.toString)
      assert(r.getAs[Long]("docs") == r.getAs[Long]("n"), r.toString)
    }
  }

  test("p5: chunks cover every token with the configured overlap shape") {
    import spark.implicits._
    val chunks = run("p5_chunk_overlap")
    val bad = chunks.filter($"chunk_tokens" < 1 || $"chunk_tokens" > 40).count()
    assert(bad == 0, "chunk sizes bounded by the chunk length")
    // chunk count per doc = ceil(nw / stride); verify against the corpus
    val perDoc = chunks.groupBy("doc_id").count()
    val expected = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split(trim($"text"), "\\s+")).as("nw"))
      .withColumn("exp", expr("CAST((nw - 1) div 30 AS LONG) + 1"))
    val mismatch = perDoc.join(expected, "doc_id")
      .filter($"count" =!= $"exp").count()
    assert(mismatch == 0)
  }

  test("p6: every class is rebalanced to exactly the majority count") {
    val out = run("p6_balanced_resample").groupBy("lang").count().collect()
    val target = out.map(_.getLong(1)).max
    assert(out.length >= 2)
    out.foreach(r => assert(r.getLong(1) == target, r.toString))
    // copies of one doc are distinct rows, indexed from 1
    val dup = run("p6_balanced_resample")
      .groupBy("doc_id").agg(count(lit(1)).as("n"), max(col("copy_idx")).as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(dup == 0, "copy_idx must enumerate 1..n_copies")
  }

  test("p7: mixture epochs are dense 1..n and bounded by weight div 16 + 1") {
    val out = run("p7_weighted_mix")
    val perDoc = out.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), min(col("epoch")).as("mn"), max(col("epoch")).as("mx"))
    assert(perDoc.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0,
      "epochs must enumerate 1..n_copies")
    // n_copies ∈ {w div 16, w div 16 + 1} for the doc's source weight
    val bad = perDoc
      .withColumn("w64", expr("(CAST(substring(source, 4, 10) AS INT) * 37) % 64"))
      .filter(col("n") < expr("w64 div 16") || col("n") > expr("w64 div 16 + 1"))
    assert(bad.count() == 0, "copy count must match the source weight")
    // zero-weight sources (w64 < 16, failed draw) are absent — but some
    // source must have made it through the fractional draw
    assert(out.select("source").distinct().count() >= 10)
  }

  test("p18: temperature T=3/4 mixture — closed form, largest-source-once, cap") {
    import spark.implicits._
    // on the real corpus: the largest source runs EXACTLY once per doc
    // (r = 1.0 exactly → 256 div 256 = 1 full epoch, zero fractional)
    val docs = graft.sources.Tables.documents(spark, sf)
    val srcMass = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val maxSrc = srcMass.maxBy { case (s, m) => (m, s) }._1
    val out = run("p18_temperature_mix")
    val maxCopies = out.filter(col("source") === maxSrc)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    assert(maxCopies.filter(col("n") =!= 1).count() == 0,
      "largest source must materialize exactly one epoch per doc")
    // epochs dense 1..n per doc (same contract as p7)
    val perDoc = out.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), min(col("epoch")).as("mn"), max(col("epoch")).as("mx"))
    assert(perDoc.filter(col("mn") =!= 1 || col("mx") =!= col("n")).count() == 0)
    // skewed fixture proves the closed form: mass ratio 100 →
    // r = 100^(1/4) = 3.1622..., r256 = floor(809.54) = 809 →
    // 3 full epochs + draw < 41; and ratio 100000 → r ≈ 17.8,
    // far past the declared cap of 8
    val fix = Seq(
      (1L, "big", 1000000L), (2L, "small", 10000L), (3L, "tiny", 10L)
    ).toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
    val parts = fix.groupBy(col("source")).agg(sum(col("n_chars")).as("m"))
      .crossJoin(broadcast(fix.agg(max(lit(1000000L)).as("m_max"))))
      .select(col("source"), expr(
        "CAST(floor(sqrt(sqrt(CAST(m_max AS DOUBLE) / CAST(m AS DOUBLE))) * 256) AS BIGINT)")
        .as("r256"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts("big") == 256L)   // anchor: exactly 1.0
    assert(parts("small") == 809L) // 100^(1/4)*256 = 809.54 → 3 epochs + 41/256
    assert(parts("small") / 256 == 3L && parts("small") % 256 == 41L)
    assert(parts("tiny") / 256 >= 8L, "a 100000x-smaller source must hit the cap")
  }

  test("p19: padding waste matches the closed form; partial batches pad to own size") {
    import spark.implicits._
    // 10 docs, one lang, batch size 8. Arrival lengths 10,1,10,1,10,1,
    // 10,1,5,5: batch0 (8 docs, max 10) = 80 slots, partial batch1
    // (2 docs, max 5) = 10 → padded 90, tokens 54, waste 4000 bp.
    // Length-sorted: 1,1,1,1,5,5,10,10 | 10,10 → 80 + 20 = 100, waste
    // 4600 bp — sorted LOSES here (the tail lands in the partial
    // batch), which is exactly why the eval exists: the answer is
    // data-dependent, so it must be priced, not assumed.
    val dir = java.nio.file.Files.createTempDirectory("graft_p19").toString
    val lens = Seq(10, 1, 10, 1, 10, 1, 10, 1, 5, 5)
    lens.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, "en", Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("p19_pad_efficiency")(spark, dir)
      .collect().map(r => r.getAs[String]("scheme") ->
        (r.getAs[Long]("n_batches"), r.getAs[Long]("sum_tokens"),
          r.getAs[Long]("padded_slots"), r.getAs[Long]("waste_bp"))).toMap
    assert(out("arrival") == ((2L, 54L, 90L, 4000L)), out.toString)
    assert(out("length_sorted") == ((2L, 54L, 100L, 4600L)), out.toString)
  }

  test("p20: point-in-time features never see the label row or the future") {
    val byUser = run("p20_pit_features").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("label_ts_us"),
        r.getAs[Long]("label_event_id"), r.getAs[Long]("prior_events"),
        r.getAs[Long]("prior_errors")))
      .groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (uid, rows0) =>
      val rows = rows0.sortBy(r => (r._2, r._3))
      rows.zipWithIndex.foreach { case ((_, _, _, pe, perr), k) =>
        // the k-th purchase (0-indexed) has at least the k earlier
        // purchases in its frame — and the frame is exclusive, so the
        // label itself never counts
        assert(pe >= k, s"user $uid purchase #$k prior_events=$pe")
        assert(perr >= 0 && perr <= pe, s"user $uid errors exceed frame")
      }
      // cumulative frames only grow along the label sequence
      rows.map(_._4).sliding(2).foreach {
        case Array(a, b) => assert(b > a, s"user $uid prior_events must strictly grow")
        case _           => ()
      }
    }
  }
}
