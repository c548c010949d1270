package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: drive a named library operator that is not part of the
  * SparkEntry.queries contract, from the command line.
  *
  *   sbt 'runMain graft.tools.Drive simhashPairs /root/testdata/sf0.01'
  */
object Drive {
  def main(args: Array[String]): Unit = {
    val Array(op, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = op match {
      case "simhashPairs"   => graft.ops.Dedup.simhashPairs(spark, sfDir)
      case "predictWindows" => graft.ops.Predict.predictAllWindows(spark, sfDir)
      case "ticksJson"      => graft.gen.Ticks.asJson(graft.gen.Ticks.generate(spark))
      case "statefulPredict" => graft.streaming.Pipeline.statefulPredictions(spark, sfDir)
      case other            => sys.error(s"unknown op: $other")
    }
    df.printSchema()
    df.show(20, truncate = false)
    println(s"ROWS=${df.count()}")
    spark.stop()
  }
}
