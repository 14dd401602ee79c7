package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Typed access to session SQL conf values that the public string-keyed
  * `conf.get` surface returns raw: `spark.sql.shuffle.partitions` may be
  * set to a non-numeric value (e.g. "auto" on platforms with an
  * auto-coalescing shim), so `conf.get(...).toInt` throws where the
  * internal resolved `numShufflePartitions` is already an Int
  * (round-15 advice on Similarity.cosineTopK).
  */
object SessionConf {
  def numShufflePartitions(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions
}
