package graft

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Measurement utility (optimization rounds): run named SparkEntry
  * queries once through the noop sink with a stage-level listener and
  * print, per query, the top stages by summed task run time plus the
  * job/stage counts — the local-mode stand-in for the Spark UI's stage
  * table (spark.ui is off in GraftSession). Usage:
  *   runMain graft.StageProbe <nameSubstr>[,<nameSubstr>...] [runs]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val runs = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    case class St(var taskMs: Long = 0L, var tasks: Int = 0,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L,
                  var name: String = "")
    val stages = mutable.Map[Int, St]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val st = stages.getOrElseUpdate(s.stageInfo.stageId, St())
        st.name = s.stageInfo.name
        st.tasks += s.stageInfo.numTasks
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          st.taskMs += m.executorRunTime
          st.shufRead += m.shuffleReadMetrics.totalBytesRead
          st.shufWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => names.exists(name.contains) }
      .foreach { case (name, fn) =>
        (1 to runs).foreach { r =>
          stages.clear(); jobs = 0
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val wall = (System.nanoTime() - t0) / 1e9
          graft.Pins.release(); spark.catalog.clearCache()
          // let the listener bus drain before reading the aggregates
          // (listenerBus is private[spark]; a short sleep suffices for
          // a measurement tool)
          Thread.sleep(300)
          val top = stages.toSeq.sortBy(-_._2.taskMs).take(14)
          println(f"[probe] $name run$r wall=$wall%.2fs jobs=$jobs stages=${stages.size}")
          top.foreach { case (id, st) =>
            println(f"[probe]   stage$id%-5d task=${st.taskMs}%6dms n=${st.tasks}%3d " +
              f"sr=${st.shufRead / 1024}%7dKB sw=${st.shufWrite / 1024}%7dKB  ${st.name.take(110)}")
          }
        }
      }
    spark.stop()
  }
}
