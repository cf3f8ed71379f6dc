package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Diagnostic main: per-query JOB/STAGE attribution
  * (`ProfileQueries <sfDir> q1 q2 ...`). TimeQueries gives one wall
  * number per key; this listener breakdown says where it went — how many
  * sequential jobs an operator runs, which stage holds the time, and how
  * parallel that stage was (tasks, max task ms). The optimization rounds
  * use it to find single-task stages, double evaluations and
  * stage-count bloat that plan text alone hides (guide §1.1/§7.1 without
  * a live UI). Runs each query TWICE and reports the second (warm) run
  * so codegen/JIT doesn't masquerade as stage cost. */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProfileQueries <sfDir> <query>...")
    val sf = args.head
    val unknown = args.tail.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark: SparkSession = EngineSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-profile")

    final case class StageAgg(var name: String = "", var tasks: Int = 0,
                              var taskMs: Long = 0, var maxTaskMs: Long = 0,
                              var shufWrite: Long = 0, var shufRead: Long = 0,
                              var input: Long = 0, var ops: String = "",
                              var deserMs: Long = 0, var runMs: Long = 0,
                              var gcMs: Long = 0, var cpuMs: Long = 0)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, StageAgg]()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Seq[Int])]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.put(e.jobId, (e.time, -1L, e.stageIds))
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val prev = jobs.get(e.jobId)
        if (prev != null) jobs.put(e.jobId, (prev._1, e.time, prev._3))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val a = stages.computeIfAbsent(e.stageInfo.stageId, _ => StageAgg())
        a.name = e.stageInfo.name.takeWhile(_ != '(').trim
        // operator attribution: the RDD scope names inside the stage
        // (WholeStageCodegen ids, Exchange, InMemoryTableScan...) — the
        // only per-stage signal that maps back to plan operators without
        // a live UI
        a.ops = e.stageInfo.rddInfos.sortBy(_.id)
          .map(r => r.scope.map(_.name).getOrElse(r.name))
          .distinct.mkString(">")
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val a = stages.computeIfAbsent(e.stageId, _ => StageAgg())
        val ms = e.taskInfo.duration
        a.synchronized {
          a.tasks += 1; a.taskMs += ms
          if (ms > a.maxTaskMs) a.maxTaskMs = ms
          val m = e.taskMetrics
          if (m != null) {
            a.shufWrite += m.shuffleWriteMetrics.bytesWritten
            a.shufRead += m.shuffleReadMetrics.totalBytesRead
            a.input += m.inputMetrics.bytesRead
            a.deserMs += m.executorDeserializeTime
            a.runMs += m.executorRunTime
            a.gcMs += m.jvmGCTime
            a.cpuMs += m.executorCpuTime / 1000000L
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    args.tail.foreach { q =>
      // cold run (JIT/codegen) — discarded
      SparkEntry.queries(q)(spark, sf).count()
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // let straggling listener events drain
      Thread.sleep(200)
      println(f"[prof] ==== $q  wall=$wall%.3f s  rows=$n ====")
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      println(f"[prof] jobs=${js.size}  " +
        f"jobWallSum=${js.map { case (_, (s, e, _)) => math.max(0L, e - s) }.sum / 1e3}%.3f s")
      js.foreach { case (id, (s, e, stageIds)) =>
        val dur = if (e > 0) (e - s) / 1e3 else -1.0
        val parts = stageIds.sorted.flatMap(sid => Option(stages.get(sid)).map(a =>
          f"s$sid:${a.name}%s t=${a.tasks} ms=${a.taskMs} max=${a.maxTaskMs}"))
        println(f"[prof] job $id%3d  $dur%7.3f s  ${parts.mkString(" | ")}")
      }
      val heavy = stages.asScala.toSeq.sortBy(-_._2.taskMs).take(8)
      heavy.foreach { case (sid, a) =>
        println(f"[prof]   stage $sid%4d ${a.name}%-28s tasks=${a.tasks}%4d " +
          f"taskMs=${a.taskMs}%7d max=${a.maxTaskMs}%6d " +
          f"in=${a.input / 1024}%8dK sw=${a.shufWrite / 1024}%6dK sr=${a.shufRead / 1024}%6dK")
        println(s"[prof]     ops: ${a.ops.take(300)}")
        println(f"[prof]     deser=${a.deserMs} run=${a.runMs} " +
          f"cpu=${a.cpuMs} gc=${a.gcMs}")
      }
    }
    spark.stop()
  }
}
