package graft

import org.apache.spark.sql.functions._

/** Temporary profiling main — not part of the shipped surface.
  * Current experiment: streaming-gate fixed-cost anatomy (e12 shape).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = Sessions.local("32", "graft-scratch")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val rows = Tables.events(spark, d).select("ts", "user_id").collect()
      .map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
    println(s"[scratch] fixture rows = ${rows.length}")

    def runE12(parts: Int, mergedSentinels: Boolean,
               label: String): Unit = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      try {
        for (pass <- 1 to 3) {
          val t0 = System.nanoTime()
          val input = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(java.sql.Timestamp, Long)]
          val name = s"graft_scr_${System.nanoTime()}"
          val q = graft.streaming.StreamOps
            .sessionizeNativeStream(input.toDF().toDF("ts", "user_id"),
              1800L, "0 seconds")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
          val tStart = System.nanoTime()
          try {
            input.addData(rows: _*)
            q.processAllAvailable()
            val tData = System.nanoTime()
            if (mergedSentinels) {
              input.addData(
                (java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L),
                (java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), -1L))
              q.processAllAvailable()
            } else {
              input.addData(
                (java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L))
              q.processAllAvailable()
              input.addData(
                (java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), -1L))
              q.processAllAvailable()
            }
            val tSent = System.nanoTime()
            val n = spark.table(name)
              .filter(col("user_id") >= 0).count()
            println(f"[scratch] $label%-24s pass=$pass start=${(tStart - t0) / 1e9}%5.2f data=${(tData - tStart) / 1e9}%5.2f sent=${(tSent - tData) / 1e9}%5.2f total=${(tSent - t0) / 1e9}%5.2f rows=$n")
          } finally q.stop()
          spark.catalog.dropTempView(name)
        }
      } finally spark.conf.set(key, prev)
    }

    def runChunked(parts: Int, chunks: Int, label: String): Unit = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      try {
        for (pass <- 1 to 3) {
          val t0 = System.nanoTime()
          val input = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(java.sql.Timestamp, Long)]
          val name = s"graft_scr_${System.nanoTime()}"
          val q = graft.streaming.StreamOps
            .sessionizeNativeStream(input.toDF().toDF("ts", "user_id"),
              1800L, "0 seconds")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
          try {
            val sz = math.max(1, (rows.length + chunks - 1) / chunks)
            rows.grouped(sz).foreach(g => input.addData(g: _*))
            q.processAllAvailable()
            val tData = System.nanoTime()
            input.addData(
              (java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L),
              (java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), -1L))
            q.processAllAvailable()
            val tSent = System.nanoTime()
            val n = spark.table(name)
              .filter(col("user_id") >= 0).count()
            println(f"[scratch] $label%-24s pass=$pass data=${(tData - t0) / 1e9}%5.2f sent=${(tSent - tData) / 1e9}%5.2f total=${(tSent - t0) / 1e9}%5.2f rows=$n")
          } finally q.stop()
          spark.catalog.dropTempView(name)
        }
      } finally spark.conf.set(key, prev)
    }

    def runOneShot(parts: Int, label: String): Unit = {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, parts.toString)
      try {
        for (pass <- 1 to 3) {
          val t0 = System.nanoTime()
          val input = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(java.sql.Timestamp, Long)]
          val name = s"graft_scr_${System.nanoTime()}"
          val q = graft.streaming.StreamOps
            .sessionizeNativeStream(input.toDF().toDF("ts", "user_id"),
              1800L, "0 seconds")
            .writeStream.format("memory").queryName(name)
            .outputMode("append").start()
          try {
            input.addData(rows: _*)
            input.addData(
              (java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), -1L),
              (java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), -1L))
            q.processAllAvailable()
            val tData = System.nanoTime()
            val n = spark.table(name)
              .filter(col("user_id") >= 0).count()
            println(f"[scratch] $label%-24s pass=$pass total=${(tData - t0) / 1e9}%5.2f rows=$n")
          } finally q.stop()
          spark.catalog.dropTempView(name)
        }
      } finally spark.conf.set(key, prev)
    }

    runE12(8, mergedSentinels = true, "p8_merged")
    runOneShot(8, "p8_oneshot")
    runOneShot(4, "p4_oneshot")
    spark.stop()
  }
}
