package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval range join — probe row ⋈ build rows whose
  * event time falls in `[probe.t + lowerUs, probe.t + upperUs]`
  * (inclusive), per equality key.
  *
  * Shape (the 100 TB posture): Spark plans a raw inequality join as
  * BroadcastNestedLoopJoin / CartesianProduct — a per-key O(n·m)
  * scan. Bucketing time at the window width w = upper − lower makes
  * the match condition an EQUALITY on (key, bucket): every build row
  * lands in one bucket, every probe interval of width exactly w
  * covers two consecutive buckets (explode of 2 ids), and the exact
  * range predicate filters the equi-join's output. Each build row
  * joins a probe copy through its own bucket only, so no pair is
  * emitted twice. The pair count that remains is the OUTPUT's own
  * size — inherent to the semantics, not the plan — and skewed keys
  * ride the normal shuffle-join machinery (AQE skew split), which a
  * nested-loop scan would forfeit.
  *
  * Times are integer microseconds (`unix_micros`) — the engine's
  * convention for exact time arithmetic (never float epoch seconds).
  */
object RangeJoin {

  /** Exact integer floor division (negative-safe): pmod is always
    * non-negative, so (x − pmod(x, w)) / w floors toward −∞ — double
    * division would wobble at bucket boundaries. */
  private def bucketOf(t: Column, w: Long): Column =
    ((t - pmod(t, lit(w))) / w).cast("long")

  /** @param probe    left side; all columns survive
    * @param build    right side; `payloadCols` attach as `r_<name>`
    * @param keys     equality keys present on both sides
    * @param probeUs  probe-side long-microsecond time column
    * @param buildUs  build-side long-microsecond time column
    * @param lowerUs  window start offset (inclusive), may be negative
    * @param upperUs  window end offset (inclusive), > lowerUs */
  def rangeJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeUs: String, buildUs: String, lowerUs: Long, upperUs: Long,
      payloadCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "range join needs at least one equality key")
    require(upperUs > lowerUs, "empty window")
    val w = upperUs - lowerUs
    // [t+lower, t+lower+w] always straddles exactly two buckets
    // (floor((x+w)/w) = floor(x/w) + 1)
    val lo = bucketOf(col(probeUs) + lowerUs, w)
    val p = probe.withColumn("_bkt", explode(array(lo, lo + 1)))
    val b = build.select(
      (keys.map(col) :+ bucketOf(col(buildUs), w).as("_bkt")) ++
        (buildUs +: payloadCols).distinct
          .map(c => col(c).as(s"r_$c")): _*)
    val joined = p.join(b, keys :+ "_bkt")
      .filter(col(s"r_$buildUs").between(
        col(probeUs) + lowerUs, col(probeUs) + upperUs))
      .drop("_bkt")
    if (payloadCols.contains(buildUs)) joined
    else joined.drop(s"r_$buildUs")
  }
}
