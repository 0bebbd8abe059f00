package org.apache.spark.sql.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Serializable Hadoop Configuration carrier for task closures.
  *
  * Bridge to Spark's `SerializableConfiguration` (private[spark], so the
  * library cannot name the type directly — same shim pattern as
  * [[GraftDataset]]). The hand-rolled IO writers (ArrowIO / AvroIO /
  * ExcelIO) must resolve their part-file paths against the SESSION's
  * hadoopConfiguration inside each task: a bare `new Configuration()`
  * there silently resolves schemeless paths against the classpath default
  * (file:///) and drops conf-carried credentials — on a cluster whose
  * fs.defaultFS differs from the executor default, the tasks would write
  * to executor-local disk and the driver's part-file listing would see
  * nothing (silent data loss into an empty-but-valid directory).
  */
final class SerConf(@transient private val conf: Configuration)
    extends Serializable {
  private val inner = new SerializableConfiguration(conf)
  def value: Configuration = inner.value
}
