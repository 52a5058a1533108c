package graft.operators

/** Deadline-guarded read of a [[org.apache.spark.sql.Observation]]
  * metric that rode an EAGER action (the cpWithGbs / convergence-count
  * pattern: the metric is observed on a relation whose eager
  * `localCheckpoint` has already returned by the time the value is
  * read). Eager checkpoints execute under `withAction`, so
  * `SQLExecutionEnd` fires and the observation completes before the
  * action returns — a Spark 4.x guarantee the full gate run validates.
  * `Observation.get` trusts that unconditionally and blocks forever if
  * a future Spark stops holding it; this reads the observation's
  * completion future with a deadline instead, so an upgrade fails
  * LOUDLY rather than hanging a fixpoint loop (ADVICE r17). The fast
  * path is one already-completed future read.
  */
private[operators] object Observe {
  def value(obs: org.apache.spark.sql.Observation, key: String,
            timeoutSec: Int = 300): Any = {
    val row =
      try scala.concurrent.Await.result(obs.future,
        scala.concurrent.duration.Duration(timeoutSec.toLong, "s"))
      catch {
        case _: java.util.concurrent.TimeoutException =>
          throw new IllegalStateException(
            s"observed metric '$key' did not complete within ${timeoutSec}s: " +
              "the observed action no longer completes the observation " +
              "(withAction contract) — failing loudly instead of blocking")
      }
    row.getAs[Any](key)
  }
}
