package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** ONE deployment cron (r12 verdict stretch #9): chain every artifact
  * family's maintenance in its safe order and return a UNIFIED report,
  * instead of hand-scheduling [[VectorOps.maintainIndex]],
  * [[Dedup.maintainDedupState]], and the folded-count-store prunes
  * separately — the single entry a deployment actually puts in cron.
  *
  * Families are optional (pass only what the deployment runs). A
  * family's failure is REPORTED, never thrown: one sick store must not
  * block every other store's scheduled maintenance window — the failed
  * row carries the error text (a refused maintenance lease, an
  * unhealed delete, a torn partition's replay recipe) and the cron's
  * monitor alerts on `ok = false`. Order inside each family is the
  * family's own documented safe order; ACROSS families there is no
  * ordering dependency (disjoint state roots), so sequence is
  * arbitrary and each holds only its own root's maintenance lease.
  */
object Maintain {

  /** An IVFADC index family: the state dir, the everything-ingested
    * embeddings frame ([[VectorOps.rebalanceIvfPqIndex]]'s retrain
    * contract), and the recall probe-panel predicate (hash-sample it
    * at scale — the q_ann_recall_sampled protocol).
    */
  case class IndexFamily(dir: String, embeddings: DataFrame,
      queryPred: Column => Column)

  def maintainAll(spark: SparkSession,
      dedupStates: Seq[String] = Nil,
      indexes: Seq[IndexFamily] = Nil,
      foldedStores: Seq[String] = Nil,
      keepFoldedVersions: Int = 1): DataFrame = {
    import spark.implicits._
    def reportOf(df: DataFrame): String = {
      val r = df.collect().head
      r.schema.fieldNames.zip(r.toSeq)
        .map { case (k, v) => s"$k=$v" }.mkString(" ")
    }
    def attempt(family: String, dir: String)(
        body: => String): (String, String, Boolean, String) =
      try { (family, dir, true, body) }
      // NonFatal only: an OOM/interrupt must propagate and stop the
      // cron, not become a report row on a compromised JVM
      catch { case scala.util.control.NonFatal(e) =>
        (family, dir, false,
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    val rows =
      dedupStates.map(st => attempt("dedup_state", st) {
        reportOf(Dedup.maintainDedupState(spark, st))
      }) ++
      indexes.map(ix => attempt("ivfpq_index", ix.dir) {
        reportOf(VectorOps.maintainIndex(spark, ix.dir, ix.embeddings,
          ix.queryPred))
      }) ++
      foldedStores.map(dir => attempt("folded_counts", dir) {
        // prune superseded fold versions; the absorbed markers carry,
        // so replay safety never depends on prune timing
        val fs = new org.apache.hadoop.fs.Path(dir)
          .getFileSystem(spark.sessionState.newHadoopConf())
        val before = graft.core.Artifacts.versionDirs(fs, dir).size
        graft.core.Artifacts.pruneFoldedStore(spark, dir, keepFoldedVersions)
        val after = graft.core.Artifacts.versionDirs(fs, dir).size
        s"versions_before=$before versions_after=$after"
      })
    rows.toDF("family", "dir", "ok", "report")
  }
}
