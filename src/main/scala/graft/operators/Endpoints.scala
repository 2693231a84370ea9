package graft.operators

import org.apache.spark.TaskContext

/** External-endpoint selection inside partition-batched operators
  * (SURVEY §2.3 C7: the reference's HA interleave / round-robin
  * dispatcher collapses to task parallelism — each partition pins to
  * `endpoints(partitionId % n)`, giving the same load spreading with
  * zero coordination).
  */
object Endpoints {

  /** The endpoint this task should use; call inside mapPartitions. */
  def forPartition(endpoints: Seq[String]): String = {
    require(endpoints.nonEmpty, "no endpoints configured")
    val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(0)
    endpoints(pid % endpoints.length)
  }

  /** Retry helper for transient external-service failures: the
    * reference's 5-attempt exponential backoff
    * (`utils/consumer_utils.py:73-103`) — retries stay INSIDE the
    * task; Spark's own task retry handles total failures. */
  def withRetries[T](attempts: Int = 5, baseMs: Long = 2000,
      sleep: Long => Unit = Thread.sleep)(f: => T): T = {
    var last: Throwable = null
    var i = 0
    while (i < attempts) {
      try return f
      catch {
        case e: Throwable =>
          last = e
          if (i < attempts - 1) sleep(baseMs * (1L << i))
      }
      i += 1
    }
    throw last
  }
}
