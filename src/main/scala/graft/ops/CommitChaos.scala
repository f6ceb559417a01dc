package graft.ops

import java.nio.file.Path

/** Fault-injecting [[CommitProtocol]] binding (round-14, B129's proving
  * harness): wraps a real binding and injects the failure modes an
  * object-store port will actually meet, per a DETERMINISTIC schedule —
  * so the whole commit matrix (publishes, linked appends, MOR commits,
  * multi-table transactions) can be re-run through simulated storage
  * weather and asserted to hold its invariants BEFORE any real port.
  *
  * Three injected modes, the conditional-PUT failure taxonomy:
  *
  *  - `FailBefore` — the operation throws WITHOUT applying (a 412
  *    precondition loss, a throttle, a connection that died before the
  *    request landed). The commit must abort cleanly: pointer
  *    unchanged, previous version fully readable, no staging debris a
  *    vacuum can't sweep.
  *  - `ApplyThenFail` — the operation APPLIES and then throws (the
  *    request landed but the response was lost — the classic duplicate-
  *    retry ambiguity). A publish-step loss leaves a crash orphan above
  *    the pointer (documented recoverable state: allocation probes past
  *    it); a flip-step loss leaves the commit VISIBLE while the caller
  *    sees failure — the retry must then observe the truth (OCC reports
  *    CME; streaming writers dedupe via their `_BATCHID` stamps).
  *  - `Duplicate` — the operation applies TWICE (a timed-out request
  *    retried by a lower layer after the first actually landed). Both
  *    pointer writes are full-content PUTs, so idempotence must hold.
  *
  * The schedule is a caller-supplied map from (step, 1-based invocation
  * index within this binding instance) to a mode — no randomness, so a
  * failing sequence is replayable verbatim in a spec. Out-of-schedule
  * invocations pass straight through. Scoped by table-root prefix like
  * CommitProtocolSpec's FailAt: the binding is process-global and
  * sibling suites commit their own tables concurrently.
  */
final class ChaosCommit(inner: CommitProtocol, scope: String,
    schedule: Map[(String, Int), ChaosCommit.Mode]) extends CommitProtocol {
  import ChaosCommit._

  private val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  /** Injected faults actually fired, in order — spec observability. */
  val fired = new java.util.concurrent.CopyOnWriteArrayList[String]()

  private def modeFor(step: String, inScope: Boolean): Option[Mode] = {
    if (!inScope) return None
    val n = counts.merge(step, 1, (a, b) => a + b)
    val m = schedule.get((step, n))
    m.foreach(mm => fired.add(s"$step#$n:$mm"))
    m
  }

  override def readPointer(root: String): Option[Long] = inner.readPointer(root)
  override def versionExists(root: String, v: Long): Boolean =
    inner.versionExists(root, v)

  override def publishVersionDir(stage: Path, dest: Path): Unit =
    modeFor("publish", dest.toString.startsWith(scope)) match {
      case Some(FailBefore) =>
        throw new ChaosFault("publish failed before applying (precondition/throttle)")
      case Some(ApplyThenFail) =>
        inner.publishVersionDir(stage, dest)
        throw new ChaosFault("publish applied but the response was lost")
      case Some(Duplicate) =>
        // a duplicate version-dir PUT cannot literally re-run on the
        // local binding (the stage moved) — the retry-after-success
        // shape IS ApplyThenFail followed by the caller's retry, which
        // the spec drives; treat as apply-then-succeed
        inner.publishVersionDir(stage, dest)
      case None => inner.publishVersionDir(stage, dest)
    }

  override def flipPointer(root: String, v: Long): Unit =
    modeFor("flip", root.startsWith(scope)) match {
      case Some(FailBefore) =>
        throw new ChaosFault("flip failed before applying (precondition/throttle)")
      case Some(ApplyThenFail) =>
        inner.flipPointer(root, v)
        throw new ChaosFault("flip applied but the response was lost")
      case Some(Duplicate) =>
        inner.flipPointer(root, v)
        inner.flipPointer(root, v) // full-content PUT retried — idempotent
      case None => inner.flipPointer(root, v)
    }

  override def withCommitLock[T](root: String)(body: => T): T =
    inner.withCommitLock(root)(body)
}

object ChaosCommit {
  sealed trait Mode
  case object FailBefore extends Mode
  case object ApplyThenFail extends Mode
  case object Duplicate extends Mode

  /** The injected-failure type — retriable by construction (the fault
    * is the STORE's, not the commit's).
    */
  final class ChaosFault(msg: String) extends RuntimeException(msg)
}
