package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Bpe
import graft.sources.Tables

/** One-off measurement main (round-12 verdict #8): quantify the batched
  * BPE's documented deviation from strictly-sequential Sennrich at the
  * t27 operating point. Prints the rank-position divergence between
  * learnMergesBatched(rounds=8, batchMax=16) and the batchMax=1
  * sequential reference producing the same number of merges. */
object BpeDeviation {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    def merges(schedule: Seq[Int]): (Seq[String], Long) = {
      val rows = Bpe.learnMergesScheduled(docs, "text", schedule)
        .orderBy(col("round"), col("rnk"))
        .select(col("merged"), col("syms_after")).collect()
      (rows.map(_.getString(0)).toSeq, rows.last.getLong(1))
    }
    def compare(tag: String, variant: Seq[String], symsV: Long,
        sequential: Seq[String], symsS: Long): Unit = {
      val n = math.min(variant.length, sequential.length)
      val firstDiff = (0 until n).find(i => variant(i) != sequential(i))
      val nPosDiff = (0 until n).count(i => variant(i) != sequential(i))
      val setV = variant.take(n).toSet
      val setS = sequential.take(n).toSet
      println(s"[bpedev] dir=$dir variant=$tag merges=${variant.length} " +
        s"merges_seq=${sequential.length} first_diff_pos=${firstDiff.getOrElse(-1)} " +
        s"rank_positions_differing=$nPosDiff " +
        s"only_in_variant=${(setV -- setS).size} only_in_seq=${(setS -- setV).size} " +
        s"jaccard_pct=${100 * (setV & setS).size / (setV ++ setS).size} " +
        s"syms_after_variant=$symsV syms_after_seq=$symsS")
    }
    val (batched, symsB) = merges(Seq.fill(8)(16))
    val (sequential, symsS) = merges(Seq.fill(batched.length)(1))
    compare("flat16x8", batched, symsB, sequential, symsS)
    // the round-12 hybrid suggestion at the SAME 8-round budget: decay
    // toward sequential as the near-tied tail approaches
    val decay = Seq(16, 16, 16, 16, 8, 4, 4, 2)
    val (decayed, symsD) = merges(decay)
    compare(s"decay${decay.mkString("_")}", decayed, symsD,
      sequential.take(decayed.length), symsS)
    spark.stop()
  }
}
