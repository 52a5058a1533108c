package org.apache.spark.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Same-package(-tree) bridge to `private[spark]` core utilities.
  * `SerializableConfiguration` is the canonical carrier for shipping the
  * driver's hadoop conf (spark.hadoop.*, filesystem credentials) into
  * task closures — every built-in datasource uses it; an extension
  * library reaching the same filesystems needs the identical mechanism. */
object GraftCoreShim {
  def broadcastHadoopConf(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  def confOf(bc: Broadcast[SerializableConfiguration]): Configuration =
    bc.value.value
}
