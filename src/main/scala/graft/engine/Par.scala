package graft.engine

/** Overlap independent Spark actions from the driver (guide §2.6):
  * Spark's scheduler happily runs several jobs at once inside one
  * application — the at-rest index lifecycles (dedup pairs/prefix/
  * clusters, knn edges/cells) issue 2–3 INDEPENDENT writes and an
  * iterative CC fixpoint strictly sequentially, so each action's tail
  * leaves most cores idle while the next waits on the driver. r20
  * profiling: the lifecycle queries' wall is dominated by serial
  * sequencing of ~30–60 small jobs (x121: 46 jobs, job-sum 4.6 s, but
  * ~6 s wall).
  *
  * `all` runs the branches on daemon threads and waits for EVERY
  * branch before returning — even when one fails — so a crashed branch
  * can never leave a sibling racing a follow-up rebuild's overwrite;
  * the first failure is then rethrown (the at-rest stamp protocols
  * treat any throw inside a stampless mutation window as "rebuild on
  * next entry"). Branches must be independent: no shared session-conf
  * windows, no write targets in common.
  */
object Par {

  private lazy val pool = java.util.concurrent.Executors.newCachedThreadPool(
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      override def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"graft-par-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    })

  def all(tasks: (() => Unit)*): Unit = {
    if (tasks.size <= 1) { tasks.foreach(_()); return }
    val futures = tasks.map(t =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = t()
      }))
    // await every branch before surfacing the first failure
    val results = futures.map(f => scala.util.Try(f.get()))
    results.collectFirst { case scala.util.Failure(e) =>
      throw (e match {
        case ee: java.util.concurrent.ExecutionException
            if ee.getCause != null => ee.getCause
        case other => other
      })
    }
    ()
  }
}
