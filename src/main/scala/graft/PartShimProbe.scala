package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the r18 partitioning-preserving checkpoint shim
  * (VERDICT r17 #3): prints the leaf partitioning a checkpointed frame
  * claims under both spellings, and whether a downstream groupBy/join
  * keyed the same way still plans an Exchange above the leaf. Not part
  * of any query path — measurement harness only, like ProbeCalib. */
object PartShimProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.range(0, 100000)
      .select(col("id").as("node"), (col("id") % 977).as("grp"),
        (col("id") * 31 % 1013).as("v"))
      .repartition(col("node"))

    def leafLine(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD =>
          lr.outputPartitioning.toString
      }.mkString("; ")

    val stock = base.localCheckpoint(true)
    println(s"STOCK leaf partitioning: ${leafLine(stock)}")
    val shim = org.apache.spark.sql.GraftShims
      .localCheckpointKeepPartitioning(base)
    println(s"SHIM  leaf partitioning: ${leafLine(shim)}")

    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      "(?<!Reused)Exchange".r.findAllIn(plan).length
    }
    // groupBy on the claimed key: stock should pay 1 exchange, shim 0.
    val aggStock = stock.groupBy("node").agg(sum("v").as("s"))
    val aggShim = shim.groupBy("node").agg(sum("v").as("s"))
    println(s"agg exchanges stock=${exchanges(aggStock)} shim=${exchanges(aggShim)}")

    // join keyed on node against a shuffled side: the shim side should
    // not re-exchange.
    val other = spark.range(0, 100000)
      .select(col("id").as("node"), (col("id") % 7).as("w"))
    val jStock = stock.join(other, Seq("node"))
      .agg(count(lit(1)), sum(col("v") * col("w")))
    val jShim = shim.join(other, Seq("node"))
      .agg(count(lit(1)), sum(col("v") * col("w")))
    println(s"join exchanges stock=${exchanges(jStock)} shim=${exchanges(jShim)}")

    // correctness: identical rows both ways
    val a = aggStock.orderBy("node").collect().toSeq
    val b = aggShim.orderBy("node").collect().toSeq
    println(s"agg rows equal: ${a == b} (${a.length} rows)")
    val ja = stock.join(other, Seq("node")).orderBy("node").collect().toSeq
    val jb = shim.join(other, Seq("node")).orderBy("node").collect().toSeq
    println(s"join rows equal: ${ja == jb} (${ja.length} rows)")
    spark.stop()
  }
}
