package graft.engine

import org.apache.spark.sql.DataFrame

/** Materialization seam for corpus-scale intermediates (banded LSH
  * relations, winnow fingerprint indexes, CC label tables): every site
  * that must cut lineage and evaluate once routes through [[materialize]],
  * and ONE config picks the durability/cost point:
  *
  *   - `spark.graft.checkpoint.mode=local` (default):
  *     `localCheckpoint` — executor-local blocks, no write to stable
  *     storage. The fast path, and correct on local[32]; at 1000
  *     executors a lost executor loses its blocks and fails the job,
  *     which for short-lived batch stages is usually the right trade
  *     (rerun beats paying distributed-FS writes on every run).
  *   - `spark.graft.checkpoint.mode=reliable`:
  *     `checkpoint` to `spark.graft.checkpoint.dir` (or the context's
  *     checkpoint dir if already set) — blocks survive executor loss, the
  *     production lever for long multi-stage pipelines at cluster scale
  *     where re-deriving a banded corpus relation costs more than the
  *     stable write (SCALE.md "checkpoint durability").
  *
  * Both modes are EAGER: the relation is computed by exactly one action
  * at the materialize point, preserving the one-action-per-iteration
  * contract the CC loop's Observation convergence test rides on.
  */
object Checkpoints {

  val ModeKey = "spark.graft.checkpoint.mode"
  val DirKey = "spark.graft.checkpoint.dir"

  def materialize(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeKey, "local") match {
      case "reliable" =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty) {
          val dir = df.sparkSession.conf.getOption(DirKey).getOrElse {
            // a driver-local tmpdir default is only correct when
            // executors share the driver's filesystem — on a real
            // cluster each executor would write ReliableCheckpointRDD
            // blocks to its OWN local disk and downstream tasks on other
            // executors would FileNotFound, silently defeating the
            // durability the mode exists for. Fail fast instead.
            require(sc.isLocal,
              s"$ModeKey=reliable on a cluster needs $DirKey (or an " +
                "already-set SparkContext checkpoint dir) on shared storage")
            // per-application subdir, deleted on JVM exit: Spark never
            // removes ReliableCheckpointRDD data itself (absent
            // spark.cleaner.referenceTracking.cleanCheckpoints), so a
            // shared fixed dir would grow tmp without bound across runs.
            // Only the SELF-ASSIGNED fallback is cleaned — a user-set
            // $DirKey or context checkpoint dir is the user's to manage.
            val d = new java.io.File(
              new java.io.File(sys.props("java.io.tmpdir"),
                "graft-checkpoints"), sc.applicationId)
            Runtime.getRuntime.addShutdownHook(new Thread(() => {
              def rm(x: java.io.File): Unit = {
                Option(x.listFiles()).foreach(_.foreach(rm))
                x.delete(): Unit
              }
              rm(d)
            }))
            d.toString
          }
          sc.setCheckpointDir(dir)
        }
        df.checkpoint()
      case "local" => df.localCheckpoint()
      case other => throw new IllegalArgumentException(
        s"$ModeKey must be 'local' or 'reliable', got '$other'")
    }

  /** `df.materialized` — chaining form of [[materialize]]. */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Checkpoints.materialize(df)
  }
}
