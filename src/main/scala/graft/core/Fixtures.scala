package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-JVM cache of DETERMINISTIC trained artifacts shared by the
  * declared persist-and-serve lifecycle queries (r10 verdict #2).
  *
  * Rationale: every lifecycle query is self-contained — it trains its
  * model, writes the artifact, reads it back, and serves — so one
  * bench sweep used to re-train the same IVFADC index six times
  * (~19 s, ~14% of the r10 sweep) and leak one temp dir per
  * invocation (r10 ADVICE #4). Training here is deterministic by
  * construction (integer-grid arithmetic, fixed seeds), so two builds
  * with the same (data, variant) produce bit-identical artifacts and
  * serving from a cached build is invisible to the oracle hash — the
  * IndexServeSpec equality, applied as a cache. Deployment reading:
  * the cache hit IS the deployment shape (train once, serve many).
  * Measurement accounting, stated precisely: under graft.Bench the
  * UNTIMED warmup pass builds every fixture, so the committed
  * artifact's timed readings price SERVING only — the build cost
  * joins JIT/codegen in the deliberately-excluded warmup category.
  * The train+write cost is priced separately and explicitly: the
  * ScaleProbe `trained` rows (ivfpq_write_index et al.) and every
  * TimeProbe COLD reading include it, and graft.Verify pays it live
  * (no warmup pass there).
  *
  * Keys carry the SF dir's content fingerprint (name|size|mtime — the
  * bench's data_fp), so a mid-session testdata regeneration misses
  * the cache instead of serving a stale model. Artifacts live under
  * temp dirs removed by a JVM shutdown hook — no leaked dirs, and no
  * cross-process reuse (each harness entry point retrains once,
  * keeping every run self-contained).
  */
object Fixtures {

  private val dirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val frames =
    new java.util.concurrent.ConcurrentHashMap[String, (org.apache.spark.sql.types.StructType, java.util.List[org.apache.spark.sql.Row])]()

  /** One temp root for all fixtures of this JVM, swept at shutdown. */
  private lazy val root: java.nio.file.Path = {
    val r = java.nio.file.Files.createTempDirectory("graft-fixtures")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(q => java.nio.file.Files.deleteIfExists(q))
      finally s.close()
    }

  private def key(sfDir: String, variant: String): String =
    s"$sfDir|${graft.Bench.dataFingerprint(sfDir)}|$variant"

  /** A cached ARTIFACT DIRECTORY: `build(dir)` runs once per
    * (sf data, variant) and must leave the artifact under `dir`;
    * subsequent calls return the same path untouched. Callers that
    * MUTATE the artifact (compaction tests) must [[copyInto]] a fresh
    * dir first — the fixture is shared.
    */
  def artifactDir(sfDir: String, variant: String)(build: String => Unit): String =
    dirs.computeIfAbsent(key(sfDir, variant), { _ =>
      val d = java.nio.file.Files.createTempDirectory(root, variant).toString + "/a"
      build(d)
      d
    })

  /** A cached MODEL-SIZED FRAME: `build` runs once per (sf data,
    * variant), its result is collected driver-side (callers must only
    * pass bounded, model-sized frames — centroid tables, codebooks),
    * and every call materializes it back as a LocalTableScan — the
    * same broadcast-friendly shape the trainer's driver-side codebook
    * already produces. Row ORDER inside the cache is whatever the
    * collect returned; downstream consumers must not depend on it
    * (joins/aggregates don't, and every declared query orders its
    * output explicitly).
    */
  def modelFrame(spark: SparkSession, sfDir: String, variant: String)(
      build: => DataFrame): DataFrame = {
    val (schema, rows) = frames.computeIfAbsent(key(sfDir, variant), { _ =>
      val df = build
      (df.schema, java.util.Arrays.asList(df.collect(): _*))
    })
    spark.createDataFrame(rows, schema)
  }

  /** Recursive copy of a fixture artifact into a fresh caller-owned
    * temp dir (under the same shutdown-swept root) — for lifecycle
    * queries that mutate the artifact (compact, balance, prune) and
    * must not dirty the shared fixture.
    */
  def copyInto(srcDir: String, variant: String): String = {
    val src = java.nio.file.Paths.get(srcDir)
    val dst = java.nio.file.Files.createTempDirectory(root, variant).resolve("a")
    val s = java.nio.file.Files.walk(src)
    try s.forEach { p =>
      val q = dst.resolve(src.relativize(p).toString)
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(q)
      else {
        java.nio.file.Files.createDirectories(q.getParent)
        java.nio.file.Files.copy(p, q)
      }
    } finally s.close()
    dst.toString
  }
}
