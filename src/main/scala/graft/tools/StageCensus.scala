package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

import graft.{GraftSession, SparkEntry}

/** Scale diagnostic: run one catalog entry and print every completed
  * stage's task count, wall time, and summed executor CPU — the direct
  * answer to "which stage underparallelizes at scale", measured instead
  * of inferred from thread dumps.
  *
  * Usage: runMain graft.tools.StageCensus <sfDir> <entryName>
  */
object StageCensus {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, entry) = args.take(2)
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark, sfDir)
    val stages = mutable.ArrayBuffer.empty[(Int, String, Int, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60),
            i.numTasks, wall, i.taskMetrics.executorCpuTime / 1000000L))
        }
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries(entry)(spark, sfDir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000) // let the listener bus drain
    println(f"[census] $entry total ${sec}%.1f s; stages by cpu:")
    stages.sortBy(-_._5).take(20).foreach { case (id, name, n, wall, cpu) =>
      println(f"[census] stage $id%4d tasks=$n%3d wall=${wall / 1000.0}%8.1fs " +
        f"cpu=${cpu / 1000.0}%8.1fs  $name")
    }
    spark.stop()
  }
}
