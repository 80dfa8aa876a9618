package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Codegen-health gate: counts ERROR events from Catalyst's code
  * generators so a silent compile-failure-plus-interpreted-fallback
  * (correct results, wrong plan — e.g. a `private` encoder case class
  * whose accessors Janino cannot reach) fails the run instead of
  * shipping. Installed by [[graft.Bench]], [[graft.Verify]] and the
  * test session; `assertHealthy` throws / `check` returns the count.
  *
  * Catalyst logs every fallback as
  * `ERROR CodeGenerator: failed to compile: ... CompileException ...`
  * on logger `org.apache.spark.sql.catalyst.expressions.codegen.*`, so
  * an appender on the root logger config filtered to ERROR + a
  * codegen logger name sees exactly the failures and nothing else.
  */
object CodegenGuard {
  private val count = new AtomicInteger(0)
  private val firstMessages = new ConcurrentLinkedQueue[String]()
  @volatile private var installed = false

  private object Listener extends AbstractAppender(
      "graft-codegen-guard", null, null, false, Property.EMPTY_ARRAY) {
    override def append(event: LogEvent): Unit = {
      val logger = event.getLoggerName
      if (event.getLevel.isMoreSpecificThan(Level.ERROR) &&
          (logger.contains(".codegen.") || logger.endsWith("CodeGenerator"))) {
        val n = count.incrementAndGet()
        if (n <= 3) {
          val msg = String.valueOf(event.getMessage.getFormattedMessage)
          firstMessages.add(s"[$logger] ${msg.linesIterator.take(3).mkString(" | ").take(500)}")
        }
      }
    }
  }

  /** Idempotent; attaches to the log4j2 root logger config at ERROR level
    * (codegen failure logs always reach root — graft never narrows that
    * logger), so it survives `setLogLevel("ERROR")`. */
  def install(): Unit = synchronized {
    if (!installed) {
      LogManager.getContext(false) match {
        case ctx: LoggerContext =>
          Listener.start()
          ctx.getConfiguration.getRootLogger.addAppender(Listener, Level.ERROR, null)
          ctx.updateLoggers()
          installed = true
        case _ => // non-core LoggerContext (shouldn't happen with Spark's log4j2)
      }
    }
  }

  def failureCount: Int = count.get

  def failureSummary: String =
    s"$failureCount codegen compile failure(s); first: " +
      firstMessages.toArray.mkString(" || ")

  /** Zero the counter (for specs that scope the check to one pipeline). */
  def reset(): Unit = { count.set(0); firstMessages.clear() }

  /** Throws if any codegen compile failure was recorded since install/reset. */
  def assertHealthy(context: String): Unit =
    if (failureCount > 0)
      throw new IllegalStateException(
        s"[codegen-guard] $context: $failureSummary")
}
