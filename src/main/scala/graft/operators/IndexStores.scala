package graft.operators

/** Per-JVM memoization of at-rest index-store builds — THE one home of
  * the contract the four stored-probe families (p41 IVF cells, p100
  * video frames, p110 audio segments, p111 text LSH signatures) share:
  * the first invocation for a dataset pays the one-pass store build
  * into a fresh temp directory (no cross-dataset collisions, no races
  * between harness JVMs), every later probe reads the steady-state
  * pruned layout — exactly what a deployed index serves.
  *
  * Staleness assumption, deliberate and shared: the cache keys on the
  * dataset DIRECTORY, so regenerating that directory's contents within
  * one JVM session would answer probes from the stale store (and the
  * temp dirs live until JVM exit). That is the bench-harness contract —
  * test datasets are immutable per session; a long-lived service would
  * key the memo on a content fingerprint (e.g. the source files'
  * (path, mtime, size) digest) and evict on mismatch.
  */
private[graft] object IndexStores {

  private val stores =
    new java.util.concurrent.ConcurrentHashMap[(String, String), String]()

  /** The store path for (`family`, `datasetDir`), building it via
    * `build(tempDir)` on first use. `family` names the index kind
    * (also the temp-dir prefix), so one dataset can carry several
    * stores without collisions.
    */
  def of(family: String, datasetDir: String)(build: String => Unit): String =
    stores.computeIfAbsent((family, datasetDir), _ => {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft_${family}_").toString
      build(p)
      p
    })
}
