package graft.rel

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Distributed lag-1 over a TOTAL order — the scalable replacement for
  * `Window.orderBy(...)` with no partition spec, which moves the entire
  * dataset through ONE task (Spark's WindowExec warns exactly this).
  *
  * Shape: range-repartition on the sort key (parallel sampling + shuffle),
  * sort within partitions (parallel), collect one boundary row per
  * partition to the driver (P rows — trivially small), then a second
  * partition-parallel pass pairs each row with its predecessor, seeding
  * partition i with the last row of the nearest non-empty partition before
  * it. Two jobs, all heavy work partition-parallel; the only driver data is
  * the P boundary rows. At 100 TB this is the standard "sessionize a total
  * order" pattern; the single-partition window form stays correct but
  * serializes the feed through one core.
  *
  * Output contract: the input columns plus `prev_<c>` (nullable) for each
  * requested lag column — exactly `lag(c, 1) OVER (ORDER BY sortCols)`.
  * Ordering of OUTPUT ROWS is not part of the contract (downstream
  * consumers aggregate or re-sort, as with any shuffle output).
  */
object OrderedLag {
  def withLag1(df: DataFrame, sortCols: Seq[String], lagCols: Seq[String],
               numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val p = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(p, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      // pin the partitioning: the range sampler is not deterministic across
      // jobs, and the boundary pass and the pairing pass MUST see identical
      // partitions
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val lagIdx = lagCols.map(c => df.schema.fieldIndex(c))
      // job 1: last row of every partition (only the lag columns travel)
      val lasts: Map[Int, Seq[Any]] = sorted.rdd
        .mapPartitionsWithIndex { (i, it) =>
          var last: Row = null
          while (it.hasNext) last = it.next()
          if (last == null) Iterator.empty
          else Iterator((i, lagIdx.map(last.get)))
        }.collect().toMap
      // seed for partition i = last row of the nearest non-empty partition
      // before it
      val seeds: Map[Int, Seq[Any]] = (0 until p).flatMap { i =>
        val prior = (i - 1) to 0 by -1
        prior.collectFirst { case j if lasts.contains(j) => i -> lasts(j) }
      }.toMap
      val bSeeds = spark.sparkContext.broadcast(seeds)
      val outSchema = StructType(df.schema.fields ++
        lagCols.map(c => df.schema(c).copy(name = s"prev_$c", nullable = true)))
      val outRdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
        var prev: Seq[Any] = bSeeds.value.getOrElse(i, null)
        it.map { r =>
          val out = Row.fromSeq(r.toSeq ++ (if (prev == null) lagCols.map(_ => null) else prev))
          prev = lagIdx.map(r.get)
          out
        }
      }
      // materialize (lineage-truncated) before unpersisting the sorted
      // input the pairing pass read from
      spark.createDataFrame(outRdd, outSchema).localCheckpoint(eager = true)
    } finally sorted.unpersist(blocking = false)
  }
}
