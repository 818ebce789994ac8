package graft

import org.apache.spark.sql.DataFrame

/** Content-aware memo keys for per-corpus index artifacts (LSH centering
  * means, IVF k-means models, hierarchy closures), or None when the
  * corpus has no stable content identity and the caller must recompute.
  *
  * The canonicalized analyzed plan alone is NOT collision-free for
  * driver-local corpora: two same-schema `LocalRelation`s print
  * identically, and every localCheckpoint'd plan prints
  * `LogicalRDD [cols], false` regardless of which RDD backs it — so a
  * plan-string key would serve a foreign/stale artifact for in-memory or
  * checkpointed corpora (exactly the mutated-snapshot case the memo must
  * distinguish). The key therefore appends a per-leaf content
  * discriminator: the RDD id for `LogicalRDD` (each checkpoint mints a
  * fresh id) and the root paths PLUS a listing fingerprint
  * (path/length/modTime per file) for file scans — so overwriting a
  * table in place mints a fresh key instead of serving the stale
  * artifact. A leaf we cannot name
  * (`LocalRelation`, anything unknown) yields None — no memoization.
  * File-backed corpora (the at-scale shape) always memoize.
  */
object PlanKeys {
  def planKey(df: DataFrame): Option[String] = {
    import org.apache.spark.sql.execution.LogicalRDD
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    val plan = df.queryExecution.analyzed
    val tags = plan.collectLeaves().map {
      case r: LogicalRDD => Some(s"rdd:${r.rdd.id}")
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation =>
          // Paths alone would serve a STALE artifact after the files are
          // overwritten in place (write.mode("overwrite"), external
          // regeneration): a fresh read lists fresh FileStatuses, so
          // folding each file's (path, length, modificationTime) into
          // the tag makes the overwritten table miss the memo. Fallback
          // when the index isn't listing-capable: total size + count.
          val loc = fs.location
          val content = loc match {
            case p: org.apache.spark.sql.execution.datasources
                .PartitioningAwareFileIndex =>
              val h = java.security.MessageDigest.getInstance("SHA-256")
              p.allFiles().foreach { f =>
                h.update((f.getPath.toString + ":" + f.getLen + ":" +
                  f.getModificationTime + ";").getBytes("UTF-8"))
              }
              java.util.Base64.getEncoder.encodeToString(h.digest())
            case _ => s"sz${loc.sizeInBytes}:n${loc.inputFiles.length}"
          }
          Some(s"files:${loc.rootPaths.mkString(",")}:$content")
        case _ => None
      }
      case r: DataSourceV2Relation =>
        // Versioned v2 tables (Iceberg/Delta) keep their NAME across
        // overwrites/appends, so a name-only tag would serve a stale
        // artifact after the table moves — the same staleness class the
        // file-scan branch fingerprints away. Key on the snapshot id when
        // the table exposes one (Iceberg publishes current-snapshot-id in
        // its Spark table properties); a v2 table with no determinable
        // version does not memoize.
        Option(r.table.properties.get("current-snapshot-id"))
          .map(snap => s"v2:${r.table.name}@$snap")
      case _ => None // LocalRelation etc: no content identity — don't memoize
    }
    if (tags.forall(_.isDefined))
      // applicationId scopes every memo to the SparkContext that built the
      // artifact: cached DataFrames/checkpointed RDDs are bound to their
      // context, so a key surviving a session restart (or shared across
      // sessions of different contexts) would serve a DataFrame whose
      // backing blocks belong to a dead/foreign context and fail at
      // execution.
      Some(df.sparkSession.sparkContext.applicationId + "|" +
        plan.canonicalized.toString + "|" + tags.flatten.mkString("|"))
    else None
  }
}
