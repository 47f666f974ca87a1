package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.configure(SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      val stats = Seq(
        "Exchange" -> "Exchange ".r.findAllIn(p).size,
        "SMJ" -> "SortMergeJoin".r.findAllIn(p).size,
        "BHJ" -> "BroadcastHashJoin".r.findAllIn(p).size,
        "BNLJ" -> "BroadcastNestedLoopJoin".r.findAllIn(p).size,
        "CART" -> "CartesianProduct".r.findAllIn(p).size,
        "Sort" -> "Sort \\[".r.findAllIn(p).size,
        "TOP" -> "TakeOrderedAndProject".r.findAllIn(p).size)
        .filter(_._2 > 0).map{case(k,v)=>s"$k=$v"}.mkString(" ")
      println(f"$name%-22s $stats")
    }
    spark.stop()
  }
}
