package graft.llm

/** Run independent Spark actions from a small thread pool (guide §2.6 —
  * "Overlap independent jobs"): actions are only sequential because the
  * driver calls them sequentially, so two independent sinks (e.g. the
  * bands and shingles appends of a near-dup index) can overlap each
  * other's planning, write tail and commit. Job descriptions/groups are
  * thread-local in Spark, so concurrently submitted jobs stay correctly
  * labelled. The pool is sized to the task count (callers pass 2-3
  * independent sinks — enough to fill the tail, never enough to fight
  * for executors) and ALWAYS joins before returning: callers sequence
  * any contractual ordering (blooms-before-keys, keys-last, manifest
  * last) around the call, never inside it. The first failure propagates
  * with its original exception (unwrapped from ExecutionException) so
  * crash-replay semantics see the same loud error the sequential code
  * produced. */
private[graft] object Concur {
  def runAll(tasks: Seq[() => Unit]): Unit = {
    if (tasks.sizeIs <= 1) { tasks.foreach(_.apply()); return }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = t()
        }))
      // collect every failure (a second sink must not be silently
      // cancelled mid-write), rethrow the first
      val errors = futures.flatMap(f =>
        try { f.get(); None }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Some(Option(e.getCause).getOrElse(e))
          case e: Throwable => Some(e)
        })
      errors.headOption.foreach(throw _)
    } finally pool.shutdown()
  }
}
