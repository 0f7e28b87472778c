package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
/** Dev probe: per-job wall times of one gated query (args(0)), warm run. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val name = args(0)
    val fn = graft.SparkEntry.queries(name)
    fn(spark, d).count() // warm-up run
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val l = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (System.nanoTime(), e.stageInfos.size))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = jobs.get(e.jobId)
        if (st != null) done.add((e.jobId, System.nanoTime() - st._1, st._2))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(-1L)
        stages.add((si.stageId, ms, si.numTasks + "t " + si.name.take(60)))
      }
    }
    spark.sparkContext.addSparkListener(l)
    val t0 = System.nanoTime()
    fn(spark, d).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val rows = done.toArray(Array.empty[(Int, Long, Int)]).sortBy(_._1)
    println(f"[jobprobe] $name total=$total%.2f s, jobs=${rows.length}, stages=${rows.map(_._3).sum}")
    rows.foreach { case (id, ns, nst) => println(f"[jobprobe] job=$id%3d t=${ns / 1e9}%6.2f stages=$nst") }
    stages.toArray(Array.empty[(Int, Long, String)]).sortBy(-_._2).take(25).foreach {
      case (id, ms, nm) => println(f"[stageprobe] stage=$id%4d ${ms / 1e3}%6.2fs $nm")
    }
    spark.stop()
  }
}
