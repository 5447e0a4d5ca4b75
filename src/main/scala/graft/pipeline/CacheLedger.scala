package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Session-scoped ledger of the engine's INTERNAL cached intermediates.
  *
  * Several lazy scoring/pair functions (`knTrigramScore`, `domainKl`,
  * `vocabDrift`, `hammingPairsIncremental`, the LM family) persist a
  * token/type relation that multiple branches of the returned plan
  * consume. The returned frame is lazy, so the function itself has no
  * "after the terminal action" point at which to unpersist — and
  * Spark's CacheManager pins an entry until someone explicitly
  * unpersists it, so a long multi-query session (the Verify dump, a
  * notebook, a recurring-crawl loop) would otherwise accumulate every
  * intermediate it ever cached until executors spill.
  *
  * `track` replaces those bare `.persist()` calls: the frame is
  * persisted AND remembered here. A host that has finished consuming a
  * result calls `drain()` to release everything the engine pinned
  * since the last drain ([[graft.Verify]] drains after each query's
  * parquet dump). Draining is always SAFE, never wrong: an undrained
  * plan that is re-executed later simply recomputes — results are
  * unaffected, only the cache warmth.
  *
  * Eagerly `localCheckpoint`-ing inside the functions was rejected:
  * it would collapse every registered query's logical plan to an RDD
  * scan, destroying both laziness for callers and the PlanShapeSpec
  * sweep that proves the plans cartesian/UDF-free.
  */
object CacheLedger {
  private val frames =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  // innermost-first stack of active [[scoped]] buffers on this thread;
  // plan construction is driver-side and single-threaded per call
  private val scopes =
    new ThreadLocal[List[scala.collection.mutable.ArrayBuffer[DataFrame]]] {
      override def initialValue()
          : List[scala.collection.mutable.ArrayBuffer[DataFrame]] = Nil
    }

  /** Persist `df` and remember it — in the innermost active [[scoped]]
    * block if one is open (released at scope exit), else globally for
    * the next [[drain]].
    */
  def track(df: DataFrame): DataFrame =
    track(df, org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** [[track]] at an explicit storage level — the backfill screens
    * route their batch-side barriers to disk-backed levels so a
    * memory-tight executor spills instead of evicting-and-recomputing
    * the batch prep (the round-10 24 GiB footgun).
    */
  def track(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame = {
    val p = df.persist(level)
    scopes.get() match {
      case head :: _ => head += p
      case Nil       => frames.add(p)
    }
    p
  }

  /** Run `body` with its tracked persists scoped: everything tracked
    * inside is unpersisted when the block exits. For the SELF-CLEANING
    * eager wrappers (per-batch screens that `localCheckpoint` their
    * result before returning): the checkpoint materializes while the
    * barriers are warm, then the block releases them, so a per-batch
    * ingestion loop retains at most its checkpointed results.
    */
  def scoped[T](body: => T): T = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    scopes.set(buf :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get().tail)
      buf.foreach { f =>
        try f.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
    }
  }

  /** Unpersist every frame tracked since the last drain (non-blocking).
    * Plans derived from them stay valid — they recompute if re-run.
    */
  def drain(): Unit = {
    var f = frames.poll()
    while (f != null) {
      try f.unpersist(blocking = false)
      catch { case _: Throwable => () } // a stopped session: nothing to free
      f = frames.poll()
    }
  }

  /** Frames currently pinned (visible for tests). */
  def pinned: Int = frames.size()

  /** `df.persistTracked()` — drop-in for `.persist()` at the internal
    * barrier sites, so call shapes stay readable.
    */
  implicit class TrackedPersist(private val df: DataFrame) extends AnyVal {
    def persistTracked(): DataFrame = track(df)
    def persistTracked(
        level: org.apache.spark.storage.StorageLevel): DataFrame =
      track(df, level)
  }
}
