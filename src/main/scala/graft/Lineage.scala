package graft

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution}
import org.apache.spark.sql.util.QueryExecutionListener

/** Query-level lineage/audit trail — the observability layer a shared
  * production engine runs: every completed action records what it read
  * (source paths off the physical scan leaves), how long it took, how
  * many rows the root operator produced, and whether it failed. Capture
  * happens in a `QueryExecutionListener` — driver-side, after the
  * action, zero cost on the executors — and the buffered records
  * surface as a DataFrame for writing to an audit table.
  */
final class LineageListener extends QueryExecutionListener {

  final case class Record(
      action: String, durationMs: Long, inputPaths: Seq[String],
      outputRows: Option[Long], error: Option[String])

  private val buf = new ConcurrentLinkedQueue[Record]()

  private def inputsOf(qe: QueryExecution): Seq[String] =
    qe.executedPlan.collectLeaves().collect {
      case s: FileSourceScanExec =>
        s.relation.location.rootPaths.map(_.toString)
    }.flatten.distinct.sorted

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    buf.add(Record(funcName, durationNs / 1000000,
      inputsOf(qe),
      qe.executedPlan.metrics.get("numOutputRows").map(_.value),
      None))

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    buf.add(Record(funcName, -1L, inputsOf(qe), None,
      Some(exception.toString.take(200))))

  def records: Seq[Record] = buf.asScala.toSeq

  def clear(): Unit = buf.clear()
}

object Lineage {

  /** Attach a fresh listener to the session; caller keeps the handle. */
  def attach(spark: SparkSession): LineageListener = {
    val l = new LineageListener
    spark.listenerManager.register(l)
    l
  }

  def detach(spark: SparkSession, l: LineageListener): Unit =
    spark.listenerManager.unregister(l)

  /** The buffered audit trail as a DataFrame (write it to the audit
    * table of your choice).
    */
  def report(spark: SparkSession, l: LineageListener): DataFrame = {
    import spark.implicits._
    l.records
      .map(r => (r.action, r.durationMs, r.inputPaths, r.outputRows, r.error))
      .toDF("action", "duration_ms", "input_paths", "output_rows", "error")
  }
}
