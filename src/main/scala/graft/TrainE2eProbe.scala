package graft
object TrainE2eProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local()
    val out = java.nio.file.Files.createTempDirectory("train-probe").toString
    val t0 = System.nanoTime()
    val r = graft.pipeline.TrainPipeline.run(spark, dir, out)
    println(s"PROBE ${(System.nanoTime()-t0)/1e9}s $r")
    spark.stop()
  }
}
