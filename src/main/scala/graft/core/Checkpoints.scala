package graft.core

import org.apache.spark.sql.DataFrame

/**
 * How an iterative operator cuts each round's frame from its lineage.
 * The cut itself is load-bearing for ANY strategy (iterative plans grow
 * exponentially under reuse — see [[graft.ext.Dedup.connectedComponents]]);
 * the strategy only decides where the cut's data lives:
 *
 *  - [[CheckpointStrategy.Local]] — `localCheckpoint()`: blocks on the
 *    executors' storage, no extra I/O round-trip. The single-machine /
 *    harness default; an executor loss loses the round.
 *  - [[CheckpointStrategy.Reliable]] — `checkpoint()` to a durable
 *    directory (HDFS/object store on a cluster): each round survives
 *    executor loss, which is the setting a multi-hour 100 TB clustering
 *    job actually runs with. The directory is set once per session via
 *    `SparkContext.setCheckpointDir`.
 */
sealed trait CheckpointStrategy {
  /** Materialize `df` and return a frame whose plan is cut from the
    * lineage that produced it (eager in both strategies). */
  def cut(df: DataFrame): DataFrame
}

object CheckpointStrategy {

  case object Local extends CheckpointStrategy {
    override def cut(df: DataFrame): DataFrame = df.localCheckpoint()
  }

  final case class Reliable(dir: String) extends CheckpointStrategy {
    override def cut(df: DataFrame): DataFrame = {
      val sc = df.sparkSession.sparkContext
      if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
      df.checkpoint()
    }
  }
}
