package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/**
 * Pipeline observability via Spark's `Observation` API — per-stage
 * row/cost accounting that rides the job itself instead of re-counting.
 *
 * At 100 TB a curation pipeline cannot afford a `count()` per stage:
 * every count is another full scan (and another evaluation of every
 * upstream stage). `Dataset.observe` attaches aggregate metrics to the
 * EXISTING plan — they are computed incrementally by the same tasks that
 * produce the output, cost ~zero, and arrive on the driver when the one
 * real action finishes. This is the difference between "the pipeline ran
 * and wrote N rows" and "stage 3 dropped 97% of rows" without a second
 * pass.
 *
 * Usage shape (one [[stage]] per filter-like step, one terminal action):
 * {{{
 *   val (s1, afterDedup) = Observe.stage(docs, "dedup_in")
 *   val deduped = Dedup.dropExactDuplicates(afterDedup, ...)
 *   val (s2, afterQuality) = Observe.stage(deduped, "quality_in",
 *     costCol = Some("est_tokens"))
 *   ...write/collect...
 *   Observe.report(Seq(s1, s2))  // Map(stage -> (rows, cost))
 * }}}
 *
 * Caveats baked into the contract: metrics materialize only after an
 * ACTION completes on the observed plan (get blocks until then), each
 * `Observation` instance is single-use, and streaming queries need
 * `observe` with a listener instead ([[stageStreaming]] returns the
 * plain observed frame for that path).
 */
object Observe {

  /** Attach a named row/cost observation to `df`. Returns the observation
   *  handle and the SAME logical frame (pass-through — zero plan change
   *  beyond the CollectMetrics node). `costCol` adds a summed cost metric
   *  (tokens, bytes) next to the row count. */
  def stage(
      df: DataFrame,
      name: String,
      costCol: Option[String] = None): (Observation, DataFrame) = {
    val obs = Observation(name)
    val metrics: Seq[Column] = count(lit(1)).as("rows") +:
      costCol.map(c => sum(col(c)).as("cost")).toSeq
    (obs, df.observe(obs, metrics.head, metrics.tail: _*))
  }

  /** The streaming-safe variant: names the metrics node so a
   *  `StreamingQueryListener` can read them per micro-batch from
   *  `progress.observedMetrics(name)`; returns just the frame. */
  def stageStreaming(
      df: DataFrame,
      name: String,
      costCol: Option[String] = None): DataFrame = {
    val metrics: Seq[Column] = count(lit(1)).as("rows") +:
      costCol.map(c => sum(col(c)).as("cost")).toSeq
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Collect finished observations into `stage -> (rows, cost)` (cost 0
   *  when the stage tracked none). Call AFTER the action completes —
   *  `Observation.get` blocks until its plan has run. */
  def report(stages: Seq[Observation]): Map[String, (Long, Long)] =
    stages.map { o =>
      val m = o.get
      o.name -> (m.getOrElse("rows", 0L).asInstanceOf[Long],
        m.get("cost").map {
          case l: java.lang.Long => l.longValue
          case d: java.lang.Double => d.toLong
          case x => x.toString.toDouble.toLong
        }.getOrElse(0L))
    }.toMap
}
