package graft.ops

import org.apache.spark.sql.DataFrame

/** Machine-checked contract for the deliberate small-frame exact-parity
  * variants (q_roc, q_qcut, q_quality_classifier): each keeps a
  * single-partition global window for point-exact reference parity
  * (sklearn ROC points / polars qcut rank ties / exact Mann-Whitney
  * ranks), which serializes the whole frame through ONE task — correct on
  * frames that fit a task, a silent stall at 100 TB.
  *
  * The guard refuses an input whose Catalyst-estimated size exceeds
  * `spark.graft.exactVariantMaxBytes` (default 1 GiB) and names the
  * registered scale twin to reach for instead. The estimate is the
  * optimizer's `sizeInBytes` (file-size based for scans) — free to read;
  * enforcing the guard runs NO job, in particular never a count() over
  * the very frame that is too big to window.
  */
object SmallFrame {
  val ConfKey = "spark.graft.exactVariantMaxBytes"
  val DefaultMaxBytes: Long = 1L << 30

  /** Returns `df` unchanged if its estimated size fits under the conf;
    * otherwise throws, naming the exact variant and its scale twin. */
  def require(df: DataFrame, exactName: String, twinName: String): DataFrame = {
    val max = df.sparkSession.conf.getOption(ConfKey)
      .map(_.toLong).getOrElse(DefaultMaxBytes)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    scala.Predef.require(est <= max,
      s"$exactName is the small-frame exact-parity variant (single-partition " +
        s"global window): input estimated at $est bytes exceeds $ConfKey=$max. " +
        s"Use the scale twin $twinName, or raise the conf if the frame truly " +
        "fits one task.")
    df
  }
}
