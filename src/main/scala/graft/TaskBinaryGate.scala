package graft

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Standing gate on DRIVER EGRESS via task binaries. Every stage's
  * serialized (RDD, closure) pair is broadcast to all executors; Spark
  * warns past 1000 KiB (`TaskSetManager.TASK_SIZE_TO_WARN_KIB`) —
  * at 1000 executors a 1 MiB task binary is a gigabyte of driver egress
  * PER STAGE, and the r6 root cause (AQE runtime Bloom filters sized by
  * a stats-less default embedding ~1 MB ScalarSubquery results per
  * referencing task) showed the class regresses silently: the WARN
  * scrolls by in a bench tail. This appender turns the WARN into a
  * counted, asserted artifact field: [[Bench]] reports
  * `task_binary_warns` + max size in the committed line, and
  * [[ShuffleProbe]] FAILS (exit 1) on any occurrence, the same
  * discipline as its superlinearity gate.
  *
  * Threshold: Spark's own 1000 KiB warn line — the gate asserts ZERO
  * such warnings across the run (measured r6 steady state: largest
  * plans ~100 KB, 10× under the line).
  */
object TaskBinaryGate {
  private val warns = new AtomicLong(0)
  private val maxKib = new AtomicReference[java.lang.Double](0.0)
  @volatile private var installed = false

  /** Idempotently attach the counting appender to the root logger (the
    * warn comes from DAGScheduler; root catches it at any level the
    * session sets ≥ WARN). */
  def install(): Unit = synchronized {
    if (installed) return
    val appender = new AbstractAppender(
        "graft-task-binary-gate", null, null, true, null) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit = {
        val msg = e.getMessage.getFormattedMessage
        if (msg.contains("Broadcasting large task binary with size")) {
          warns.incrementAndGet()
          parseKib(msg).foreach { k =>
            maxKib.updateAndGet(m => if (k > m) k else m)
          }
          System.err.println(s"[task-binary-gate] $msg")
        }
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    ctx.getConfiguration.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    installed = true
  }

  /** "… with size 1103.4 KiB" / "2.1 MiB" → KiB. */
  private[graft] def parseKib(msg: String): Option[Double] = {
    val m = raw"size\s+([0-9.]+)\s+(B|KiB|MiB|GiB)".r.findFirstMatchIn(msg)
    m.flatMap { g =>
      val v = g.group(1).toDoubleOption
      val mult = g.group(2) match {
        case "B" => 1.0 / 1024; case "KiB" => 1.0
        case "MiB" => 1024.0;  case _ => 1024.0 * 1024
      }
      v.map(_ * mult)
    }
  }

  def warnCount: Long = warns.get()
  def maxSeenKib: Double = maxKib.get()
}
