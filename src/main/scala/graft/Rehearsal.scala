package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import scala.collection.concurrent.TrieMap
import scala.collection.mutable.ArrayBuffer

/** SCALE-REHEARSAL runner: execute each named gate ONCE at the given
  * fixture dir with a task-level SKEW listener attached, so a 10×-data
  * run answers the two questions plan-shape audits can't — does each
  * gate's wall time scale ~linearly, and do any stages develop
  * straggler partitions (the Spark-UI "task summary" check, captured
  * programmatically: per stage, max successful-task duration over the
  * median, reported for the worst stage with ≥ 8 tasks; 2-4× is normal
  * scheduling noise on local[32], ≥ ~8× on a large stage is a skewed
  * key or a mis-sized partition).
  *
  * Usage: runMain graft.Rehearsal <sfDir> <name,name,...>
  * One JSON line per query + a final `{"rehearsal":...}` summary line
  * (same tail-parse discipline as Bench). */
object Rehearsal {
  private class SkewListener extends SparkListener {
    val stages = TrieMap.empty[Int, ArrayBuffer[Long]]
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null && te.taskInfo.successful)
        stages.getOrElseUpdate(te.stageId, ArrayBuffer.empty)
          .synchronized { stages(te.stageId) += te.taskInfo.duration }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark =
      Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
        "graft-rehearsal")
    val listener = new SkewListener
    spark.sparkContext.addSparkListener(listener)
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // one fixed warm-up absorbs JVM/codegen startup (the Canary recipe)
    try SparkEntry.queries("f03_q1_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    finally Caches.clear()
    val out = names.map { n =>
      listener.stages.clear()
      val t0 = System.nanoTime()
      val rows =
        try SparkEntry.queries(n)(spark, sfDir).count()
        catch { case e: Throwable =>
          println(s"""{"q":"$n","error":"${e.getClass.getSimpleName}"}""")
          -1L }
        finally Caches.clear()
      val sec = (System.nanoTime() - t0) / 1e9
      // worst straggler ratio over stages large enough to mean anything
      val (skew, skewTasks, maxTaskSec) = {
        val sts = listener.stages.values.map(_.toSeq).filter(_.size >= 8)
        val maxT = listener.stages.values
          .flatMap(_.toSeq).foldLeft(0L)(math.max) / 1e3
        if (sts.isEmpty) (1.0, 0, maxT)
        else {
          val worst = sts.maxBy(d => d.max.toDouble /
            math.max(1L, d.sorted.apply(d.size / 2)))
          (worst.max.toDouble / math.max(1L, worst.sorted.apply(worst.size / 2)),
            worst.size, maxT)
        }
      }
      println(s"""{"q":"$n","sec":${r3(sec)},"rows":$rows,""" +
        s""""skew":${r3(skew)},"skewStageTasks":$skewTasks,""" +
        s""""maxTaskSec":${r3(maxTaskSec)}}""")
      (n, sec, skew)
    }
    try {
      spark.streams.active.foreach(q => try q.stop() catch {
        case _: Throwable => () })
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    } catch { case _: Throwable => () }
    println(s"""{"rehearsal":"$sfDir","queries":""" +
      out.map { case (n, s, _) => s""""$n":${r3(s)}""" }
        .mkString("{", ",", "}") +
      s""","total":${r3(out.map(_._2).sum)},""" +
      s""""worstSkew":${r3(out.map(_._3).foldLeft(1.0)(math.max))}}""")
    spark.stop()
  }
}
