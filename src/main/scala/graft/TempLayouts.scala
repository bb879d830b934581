package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap

/** Lifecycle management for derived on-disk layouts (partitioned/bucketed
  * table copies, streaming sink directories) that must OUTLIVE the call
  * that builds them — the returned DataFrame scans them lazily — but must
  * not outlive the JVM.
  *
  * Before this object existed, every invocation of a layout-building query
  * (`events_dpp_daily`, `q27_join_bucketed`, the nine streaming drains)
  * leaked a fresh temp directory: the round-10 opener found 2,691
  * accumulated `/tmp` artifacts (1,613 streaming sinks, 130 DPP layouts,
  * 244 bucketed layouts) measurably slowing short-query benchmarks
  * (BASELINE.md round-10 adjudication). Two remedies, both here:
  *
  *  - [[tracked]]: register a fresh temp dir for recursive deletion at JVM
  *    exit — the floor every layout gets.
  *  - [[cached]]: additionally memoize the layout per (prefix, key) so
  *    repeated invocations within one JVM (a 3-sweep bench run executes
  *    each gated query 4+ times; GateSchemaSpec builds every plan) reuse
  *    one write instead of re-deriving the identical bytes. Safe because
  *    a layout is a pure function of its key — callers key on the source
  *    dataset path, and fixture paths are content-immutable for the life
  *    of a JVM (driver corpora are read-only; test fixtures write to
  *    fresh temp dirs, never in place).
  *
  * Deletion runs in a shutdown hook, not `deleteOnExit` (which cannot
  * handle non-empty directories and registers per-file bookkeeping for
  * thousands of parquet part-files). */
object TempLayouts {
  private val cache = new ConcurrentHashMap[String, Path]()
  private val owned = java.util.Collections.newSetFromMap(
    new ConcurrentHashMap[Path, java.lang.Boolean]())

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    owned.forEach(p => deleteRecursively(p.toFile))
  }, "graft-temp-layout-cleanup"))

  /** A fresh temp directory deleted recursively at JVM exit. */
  def tracked(prefix: String): Path = {
    val p = Files.createTempDirectory(prefix)
    owned.add(p)
    p
  }

  /** The memoized layout for (prefix, key): built once per JVM by `build`
    * (invoked with the new directory before any other caller can observe
    * it — `computeIfAbsent` is atomic), deleted at JVM exit. `key` must
    * identify the layout's full content (callers use the source dataset
    * path; see class doc for the immutability contract). */
  def cached(prefix: String, key: String)(build: Path => Unit): Path =
    cache.computeIfAbsent(s"$prefix|$key", { _ =>
      val p = tracked(prefix)
      build(p)
      p
    })

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete(): Unit
  }
}
