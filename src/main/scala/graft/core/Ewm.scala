package graft.core

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Distributed exponentially-weighted moving aggregates
  * (pandas `ewm(alpha=..., adjust=True).mean()` / `.var(bias=False)`),
  * global index order.
  *
  * The recurrence `y_t = x_t + (1−α)·y_(t−1)` is irreducibly sequential —
  * it has no partial+final Spark aggregate, and the textbook scaled-prefix
  * rewrite (Σ x_i·w^(−i), then multiply by w^t) overflows doubles past a
  * few thousand rows. But it FACTORIZES across range buckets exactly like
  * cumsum: each bucket's decayed partial sums depend only on its own rows,
  * and the cross-bucket carry is the previous total decayed by w^count —
  * all factors ≤ 1, numerically stable at any depth. So:
  *
  *   1. bucket rows by the shared [[GlobalWindows]] index coordinate
  *      (numeric / string / date / timestamp all work);
  *   2. ONE keyed exchange + per-partition external sort, then a
  *      streaming per-bucket scan (mapPartitions with O(1) state — the
  *      sanctioned imperative-per-partition case: nothing declarative
  *      expresses a first-order recurrence) emits per-row within-bucket
  *      decayed partials (num, den, num², Σw²) and the 0-based bucket
  *      position;
  *   3. per-bucket last partials (one small agg) fold SEQUENTIALLY on the
  *      driver — `buckets` rows of state, like every offsets job here —
  *      into exclusive carries, scaled by w^count per fold step;
  *   4. carries broadcast-join back; each row adds carry·w^(pos+1) to its
  *      partials and closes the pandas formulas.
  *
  * Weights follow pandas defaults: adjust=True (normalizing denominator
  * Σw_i), ignore_na=False (decay counts EVERY row, so gaps widen the
  * effective distance), var debiased by (Σw)²/((Σw)²−Σw²) — null rows
  * output the running value unchanged (both num and den scale by w, so
  * ratios are invariant), leading rows before any observation are null,
  * and a single observation has null variance.
  */
final class Ewm private[graft] (s: Series, alpha: Double, buckets: Int) {
  require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
  require(buckets >= 1, "buckets must be >= 1")

  private val w = 1.0 - alpha
  private val idxName = s.indexName
  private val valName = s.name

  import Ewm._

  /** One-pass (idx, ewm_mean, ewm_var) frame — the shared plan behind
    * [[mean]] / [[varUnbiased]] / [[std]]. */
  lazy val stats: DataFrame = {
    val d = s.base.select(s.index.as(idxName),
      s.values.cast("double").as(valName))
    val idxDt = d.schema(idxName).dataType
    val bounds = d.agg(min(col(idxName)), max(col(idxName))).head()
    val (coord, lo, hi) = GlobalWindows.indexCoord(idxDt, col(idxName), bounds)
    val bkt =
      if (lo.isNaN || hi.isNaN || !(hi > lo)) lit(0L)
      else GlobalWindows.bucketExpr(col(idxName), coord, lo, hi, buckets)
    val keyed = d.withColumn(BktCol, bkt)

    // one keyed exchange; each bucket lands whole in one partition, rows
    // stream through the external sort in (bucket, index) order
    val width = d.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = keyed.repartition(width, col(BktCol))
      .sortWithinPartitions(col(BktCol).asc, col(idxName).asc_nulls_first)

    val outSchema = StructType(Seq(
      StructField(idxName, idxDt, nullable = true),
      StructField(BktCol, LongType, nullable = false),
      StructField(PosCol, LongType, nullable = false),
      StructField(NumCol, DoubleType, nullable = false),
      StructField(DenCol, DoubleType, nullable = false),
      StructField(Num2Col, DoubleType, nullable = false),
      StructField(Den2Col, DoubleType, nullable = false)))
    val wLoc = w // avoid capturing `this` in the task closure
    val w2Loc = w * w
    val parts = graft.Caches.track(sorted.mapPartitions { it =>
      // a hash partition can hold SEVERAL buckets (sorted contiguously);
      // state resets at each bucket change — O(1) memory, streaming
      var cur = Long.MinValue
      var pos = -1L
      var pn, pd, pn2, pd2 = 0.0
      it.map { r =>
        // input layout: (idx, value, bkt) — the select order above
        val b = r.getLong(2)
        if (b != cur) { cur = b; pos = -1L; pn = 0; pd = 0; pn2 = 0; pd2 = 0 }
        pos += 1
        pn *= wLoc; pd *= wLoc; pn2 *= wLoc; pd2 *= w2Loc
        if (!r.isNullAt(1)) {
          val x = r.getDouble(1)
          pn += x; pd += 1.0; pn2 += x * x; pd2 += 1.0
        }
        Row(r.get(0), b, pos, pn, pd, pn2, pd2)
      }
    }(Encoders.row(outSchema)).persist(StorageLevel.MEMORY_AND_DISK))

    // per-bucket closing partials (`buckets` rows of driver state), folded
    // sequentially into EXCLUSIVE carries — the previous total decayed by
    // w^count, every factor <= 1
    val lastRows = parts.groupBy(col(BktCol)).agg(
      count(lit(1)).as("__cnt"),
      max_by(struct(col(NumCol), col(DenCol), col(Num2Col), col(Den2Col)),
        col(PosCol)).as("__last"))
      .collect().sortBy(_.getLong(0))
    var cN, cD, cN2, cD2 = 0.0
    val carryRows = lastRows.map { r =>
      val out = Row(r.getLong(0), cN, cD, cN2, cD2)
      val cnt = r.getLong(1)
      val lastS = r.getStruct(2)
      val dk = math.pow(w, cnt.toDouble)
      val dk2 = math.pow(w * w, cnt.toDouble)
      cN = lastS.getDouble(0) + dk * cN
      cD = lastS.getDouble(1) + dk * cD
      cN2 = lastS.getDouble(2) + dk * cN2
      cD2 = lastS.getDouble(3) + dk2 * cD2
      out
    }
    val carrySchema = StructType(Seq(
      StructField(BktCol, LongType, nullable = false),
      StructField("__ew_cn", DoubleType, nullable = false),
      StructField("__ew_cd", DoubleType, nullable = false),
      StructField("__ew_cn2", DoubleType, nullable = false),
      StructField("__ew_cd2", DoubleType, nullable = false)))
    val carries = d.sparkSession.createDataFrame(
      java.util.Arrays.asList(carryRows: _*), carrySchema)

    val dk = pow(lit(w), col(PosCol) + 1)
    val dk2 = pow(lit(w * w), col(PosCol) + 1)
    val num = col(NumCol) + col("__ew_cn") * dk
    val den = col(DenCol) + col("__ew_cd") * dk
    val num2 = col(Num2Col) + col("__ew_cn2") * dk
    val den2 = col(Den2Col) + col("__ew_cd2") * dk2
    val mean = when(den > 0.0, num / den)
    val denom = den * den - den2
    val varU = when(den > 0.0 && denom > 0.0,
      (num2 / den - (num / den) * (num / den)) * den * den / denom)
    parts.join(broadcast(carries), Seq(BktCol), "left")
      .select(col(idxName), mean.as(MeanCol), varU.as(VarCol))
  }

  def mean(): Series = Series.fromKeyed(
    stats.select(col(idxName), col(MeanCol).as(valName)), valName, idxName)

  /** pandas ewm().var(bias=False). */
  def varUnbiased(): Series = Series.fromKeyed(
    stats.select(col(idxName), col(VarCol).as(valName)), valName, idxName)

  def std(): Series = Series.fromKeyed(
    stats.select(col(idxName), sqrt(col(VarCol)).as(valName)),
    valName, idxName)
}

private[graft] object Ewm {
  /** Keyed ewm (pandas groupby(by).ewm(alpha).mean()/.var(bias=False)):
    * each group is an independent recurrence, so no bucket fold or carry
    * is needed at all — ONE hash exchange on the key, a per-partition
    * (key, idx) external sort, and a streaming scan that resets state at
    * every key change (several keys share a partition; each key's rows
    * are contiguous after the sort). Output: (idx, key, ewm_mean,
    * ewm_var). Same pandas weight semantics as the global [[Ewm]]. */
  def statsBy(s: Series, by: Column, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, s"alpha must be in (0, 1), got $alpha")
    val w = 1.0 - alpha
    val idxName = s.indexName
    val d = s.base.select(s.index.as(idxName),
      s.values.cast("double").as("__ew_x"), by.as("key"))
    val width = d.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = d.repartition(width, org.apache.spark.sql.functions.col("key"))
      .sortWithinPartitions(
        org.apache.spark.sql.functions.col("key"),
        org.apache.spark.sql.functions.col(idxName).asc_nulls_first)
    val outSchema = StructType(Seq(
      StructField(idxName, d.schema(idxName).dataType, nullable = true),
      StructField("key", d.schema("key").dataType, nullable = true),
      StructField(MeanCol, DoubleType, nullable = true),
      StructField(VarCol, DoubleType, nullable = true)))
    val wL = w
    val w2L = w * w
    sorted.mapPartitions { it =>
      var started = false
      var cur: Any = null
      var pn, pd, pn2, pd2 = 0.0
      it.map { r =>
        // input layout: (idx, x, key)
        val k = r.get(2)
        if (!started || k != cur) {
          started = true; cur = k; pn = 0; pd = 0; pn2 = 0; pd2 = 0
        }
        pn *= wL; pd *= wL; pn2 *= wL; pd2 *= w2L
        if (!r.isNullAt(1)) {
          val x = r.getDouble(1)
          pn += x; pd += 1.0; pn2 += x * x; pd2 += 1.0
        }
        val m: Any = if (pd > 0) pn / pd else null
        val dd = pd * pd - pd2
        val v: Any =
          if (pd > 0 && dd > 0) (pn2 / pd - (pn / pd) * (pn / pd)) * pd * pd / dd
          else null
        Row(r.get(0), k, m, v)
      }
    }(Encoders.row(outSchema))
  }

  val BktCol = "__ew_bkt"
  val PosCol = "__ew_pos"
  val NumCol = "__ew_num"
  val DenCol = "__ew_den"
  val Num2Col = "__ew_num2"
  val Den2Col = "__ew_den2"
  val MeanCol = "ewm_mean"
  val VarCol = "ewm_var"
}
