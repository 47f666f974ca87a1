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
    def merges(rounds: Int, batchMax: Int): (Seq[String], Long) = {
      val rows = Bpe.learnMergesBatched(docs, "text", rounds, batchMax)
        .orderBy(col("round"), col("rnk"))
        .select(col("merged"), col("syms_after")).collect()
      (rows.map(_.getString(0)).toSeq, rows.last.getLong(1))
    }
    val (batched, symsB) = merges(8, 16)
    val (sequential, symsS) = merges(batched.length, 1)
    val n = math.min(batched.length, sequential.length)
    val firstDiff = (0 until n).find(i => batched(i) != sequential(i))
    val nPosDiff = (0 until n).count(i => batched(i) != sequential(i))
    val setB = batched.take(n).toSet
    val setS = sequential.take(n).toSet
    println(s"[bpedev] dir=$dir merges_batched=${batched.length} " +
      s"merges_seq=${sequential.length} first_diff_pos=${firstDiff.getOrElse(-1)} " +
      s"rank_positions_differing=$nPosDiff " +
      s"only_in_batched=${(setB -- setS).size} only_in_seq=${(setS -- setB).size} " +
      s"jaccard_pct=${100 * (setB & setS).size / (setB ++ setS).size} " +
      s"syms_after_batched=$symsB syms_after_seq=$symsS")
    spark.stop()
  }
}
