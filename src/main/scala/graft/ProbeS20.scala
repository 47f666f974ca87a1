package graft

// TEMPORARY probe for s20 channel-width selection — deleted before commit.
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

object ProbeS20 {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.configure(SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val isQ = (c: org.apache.spark.sql.Column) =>
      pmod(c, lit(50)) === 0 && c < 100000000L
    val docs = Tables.documents(spark, dir)
    val termTf = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf_w"))
      .localCheckpoint()
    val en2 = termTf.groupBy(col("doc_id")).agg(sum(expr("tf_w * tf_w")).as("n2"))
    val eq = termTf.filter(isQ(col("doc_id")))
      .select(col("doc_id").as("query_id"), col("w"), col("tf_w").as("qtf"))
    val eDots = termTf.join(broadcast(eq), Seq("w"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id")).agg(sum(expr("tf_w * qtf")).as("dot"))
    val eSims = eDots
      .join(broadcast(en2.select(col("doc_id").as("query_id"), col("n2").as("qn2"))), Seq("query_id"))
      .join(en2, Seq("doc_id"))
      .withColumn("sim", round(col("dot") / sqrt(col("qn2")) / sqrt(col("n2")), 6))
    val truth = eSims.withColumn("rnk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("rnk") <= 5).select("query_id", "doc_id").localCheckpoint()
    val nQ = truth.select("query_id").distinct().count()
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"),
        explode(graft.operators.Dedup.shingles("text")).as("term"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .crossJoin(broadcast(nDocs)).filter(col("df") * 10 <= col("n_docs"))
      .select("doc_id", "term").localCheckpoint()
    val qTerms = terms.filter(isQ(col("doc_id"))).withColumnRenamed("doc_id", "query_id")
    val overlap = terms.join(qTerms, "term").filter(col("doc_id") =!= col("query_id"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("inter"))
    val lexTop = overlap.withColumn("lex_rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("inter").desc, col("doc_id"))))
      .filter(col("lex_rank") <= 20).select("query_id", "doc_id", "lex_rank")
      .localCheckpoint()
    def recall(cand: DataFrame): Long =
      truth.join(cand, Seq("query_id", "doc_id"), "left_semi").count()
    val lexR = recall(lexTop.filter(col("lex_rank") <= 5))
    println(s"[probe] dir=$dir nQ=$nQ truthRows=${nQ * 5} lex_hits=$lexR")
    for (w <- Seq(16, 32, 64, 128)) {
      val tf = termTf.withColumn("bucket",
          expr(s"CAST(((instr('0123456789abcdef', substring(md5(w), 1, 1)) - 1) + " +
            s"16 * (instr('0123456789abcdef', substring(md5(w), 2, 1)) - 1)) % $w AS INT)"))
        .groupBy(col("doc_id"), col("bucket")).agg(sum(col("tf_w")).as("tf"))
      val n2 = tf.groupBy(col("doc_id")).agg(sum(expr("tf * tf")).as("n2"))
      val qTf = tf.filter(isQ(col("doc_id")))
        .select(col("doc_id").as("query_id"), col("bucket"), col("tf").as("qtf"))
      val dots = tf.join(broadcast(qTf), Seq("bucket"))
        .filter(col("doc_id") =!= col("query_id"))
        .groupBy("query_id", "doc_id").agg(sum(expr("tf * qtf")).as("dot"))
      val sims = dots
        .join(broadcast(n2.select(col("doc_id").as("query_id"), col("n2").as("qn2"))), Seq("query_id"))
        .join(n2, Seq("doc_id"))
        .withColumn("sim", round(col("dot") / sqrt(col("qn2")) / sqrt(col("n2")), 6))
      val vecTop = sims.withColumn("vec_rank", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("doc_id"))))
        .filter(col("vec_rank") <= 20).select("query_id", "doc_id", "vec_rank")
        .localCheckpoint()
      val fused = vecTop.join(lexTop, Seq("query_id", "doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(expr("CAST(1000000000 AS BIGINT) div (60 + vec_rank)"), lit(0L)) +
          coalesce(expr("CAST(1000000000 AS BIGINT) div (60 + lex_rank)"), lit(0L)))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))))
        .filter(col("rnk") <= 5).select("query_id", "doc_id")
      val vecR = recall(vecTop.filter(col("vec_rank") <= 5))
      val fusR = recall(fused)
      println(s"[probe] width=$w vec_hits=$vecR lex_hits=$lexR fused_hits=$fusR")
    }
    spark.stop()
  }
}
