package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** The reference consumer's delivery budget (`max_deliver: 3`,
  * `/root/reference/src/nats.rs:74`): a message redelivered past the
  * budget stops being delivered instead of poisoning the stream forever.
  * Spark's checkpoint replay is our redelivery — a micro-batch whose
  * write fails is re-run with the same batchId on every restart,
  * UNBOUNDED unless someone counts. This ledger counts: one tiny file
  * next to the query's checkpoint holding `(batchId, attempts)` for the
  * batch currently in flight. Only the in-flight batch needs tracking —
  * batches commit in order, and a committed batch is never redelivered.
  *
  * The attempt is recorded BEFORE the write runs (NATS counts
  * deliveries, not completions), so a crash mid-batch still consumes
  * budget. Driver-side, metadata-scale: one read + one atomic
  * write-rename per micro-batch, regardless of data volume. */
final class RedeliveryBudget(conf: Configuration, ledgerPath: String,
                             val maxDeliver: Int) {
  require(maxDeliver >= 1, s"maxDeliver must be >= 1, got $maxDeliver")
  private val path = new Path(ledgerPath)

  /** Record one delivery attempt of `batchId`; returns the attempt
    * number (1 = first delivery). A batch exceeds its budget when the
    * returned value is > maxDeliver — it has already failed maxDeliver
    * times and must be dead-lettered, not retried. */
  def attempt(batchId: Long): Int = {
    val f = path.getFileSystem(conf)
    val prev: Option[(Long, Int)] =
      if (!f.exists(path)) None
      else {
        val in = f.open(path)
        try {
          val Array(b, n) =
            scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.split("\t")
          Some((b.toLong, n.toInt))
        } catch {
          // an unreadable ledger (partial write on a crash exactly between
          // create and close) restarts the count — over-delivering by one
          // round beats wedging ingest on a corrupt counter
          case _: Exception => None
        } finally in.close()
      }
    val n = prev match {
      case Some((b, k)) if b == batchId => k + 1
      case _                            => 1
    }
    val tmp = new Path(path.getParent, path.getName + ".tmp")
    val out = f.create(tmp, true)
    try out.write(s"$batchId\t$n\n".getBytes("UTF-8")) finally out.close()
    if (f.exists(path) && !f.delete(path, false))
      throw new java.io.IOException(s"redelivery ledger: cannot replace $path")
    if (!f.rename(tmp, path))
      throw new java.io.IOException(s"redelivery ledger: cannot publish $tmp")
    n
  }
}
