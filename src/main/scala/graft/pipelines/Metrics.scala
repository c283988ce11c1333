package graft.pipelines

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query timing instrumentation (SURVEY O9): the reference logs
  * wall-clock around its extraction and total run
  * (`SELECT.py:152,190-199,241-242`); the engine equivalent hooks
  * Spark's QueryExecutionListener so every materialized action is
  * timed with its success/failure, no manual clocks in job code. */
final class TimingListener extends QueryExecutionListener {

  final case class Timing(action: String, durationMs: Long,
      failed: Boolean, error: Option[String])

  private val recs = new ConcurrentLinkedQueue[Timing]()

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    recs.add(Timing(funcName, durationNs / 1000000, failed = false, None))

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    recs.add(Timing(funcName, -1, failed = true,
      Some(exception.getMessage)))

  def snapshot: Seq[Timing] = recs.iterator().asScala.toSeq
  def clear(): Unit = recs.clear()
}

object TimingListener {
  /** Attach a fresh listener to the session and return it. */
  def attach(spark: SparkSession): TimingListener = {
    val l = new TimingListener
    spark.listenerManager.register(l)
    l
  }
}
