package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing (the daily CDC step of a corpus pipeline):
  * given yesterday's and today's snapshot of an id-keyed table, classify
  * every id as `added` / `removed` / `changed` / `unchanged` by comparing
  * content fingerprints under a FULL OUTER equi-join on the id.
  *
  * At 100 TB this is the canonical shuffle-join-by-design: both sides
  * partition by the id key (and when the snapshots live in
  * [[BucketedLayout]] bucketed tables on that id, the join plans with no
  * exchange at all — the two layouts compose). The fingerprint is
  * computed scan-side on each snapshot BEFORE the join, so the join
  * carries (id, fp) only, never the payload.
  *
  * Downstream consumers: `added ∪ changed` is exactly the delta batch
  * the incremental dedup screen ([[graft.streaming.IngestDedup]]) and
  * the ANN index updaters take; `removed` drives retention deletes.
  *
  * No counterpart in the reference (it has no storage/ingest surface);
  * LLM-data-pipeline extension (SURVEY.md §7.6).
  */
object SnapshotDiff {

  /** Classify every id across two snapshots.
    * @param fp content fingerprint expression, evaluated against each
    *           snapshot's columns (e.g. `md5(col("text"))`). Must be
    *           built from UNBOUND `col(...)` references — the same
    *           expression resolves by name against BOTH snapshots, so a
    *           DataFrame-bound column (e.g. `oldSnap("text")`) would
    *           carry old-plan attribute ids and mis-resolve or fail
    *           analysis on the new side.
    * @return (idCol, status, old_fp, new_fp) — one row per id present in
    *         either snapshot
    */
  def diff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
      fp: Column): DataFrame = {
    val o = oldSnap.select(col(idCol), fp.as("old_fp"))
    val n = newSnap.select(col(idCol), fp.as("new_fp"))
    o.join(n, Seq(idCol), "full_outer")
      .withColumn("status",
        when(col("old_fp").isNull, "added")
          .when(col("new_fp").isNull, "removed")
          .when(col("old_fp") === col("new_fp"), "unchanged")
          .otherwise("changed"))
  }

  /** Merge-on-read CDC apply (the Hudi/Iceberg MOR shape): resolve a
    * base snapshot plus an append-only delta log to the LATEST row per
    * id at read time — upserts win by version, `deleteOp` rows
    * tombstone the id — without ever rewriting the base. Parquet has no
    * upsert; at 100 TB the answer is exactly this: deltas append (cheap,
    * idempotent), readers resolve with ONE map-side-combined groupBy
    * (`max(struct(version, op, payload…))` — partials collapse each
    * task's versions before the exchange, so the shuffle carries one
    * candidate row per (task, id), and compaction via
    * [[BucketedLayout.compact]] folds the log back into the base on
    * whatever cadence the log-to-base ratio warrants.
    *
    * Determinism on version ties: the struct max compares
    * (version, op-RANK, op, payload…) lexicographically, where the rank
    * is `delete → 0, anything else → 1` — so an upsert always beats a
    * same-version delete REGARDLESS of how the ops are spelled (with the
    * raw op string in that slot, a deleteOp that happened to sort above
    * its upsert op, e.g. "X" vs "U", would silently flip the
    * precedence). Remaining ties resolve by op string then payload —
    * engine-exact and order-free (callers should still issue unique
    * versions; the rule just makes collisions reproducible rather than
    * undefined).
    *
    * Base rows enter as (version 0, upsert); delta payload columns must
    * match the base's.
    */
  def resolveLatest(base: DataFrame, deltas: DataFrame, idCol: String,
      versionCol: String, opCol: String,
      deleteOp: String = "D"): DataFrame = {
    val payload = base.columns.filter(_ != idCol).toSeq
    require(deltas.columns.toSet ==
      (base.columns.toSet + versionCol + opCol),
      "delta schema must be base + version + op")
    val all = base
      .withColumn(versionCol, lit(0L))
      .withColumn(opCol, lit("U"))
      .unionByName(deltas)
    val opRank = when(col(opCol) === deleteOp, 0).otherwise(1)
      .as("__oprank")
    val m = all.groupBy(col(idCol))
      .agg(max(struct(col(versionCol) +: opRank +:
          (opCol +: payload).map(col): _*))
        .as("__m"))
    m.select(col(idCol) +: (versionCol +: opCol +: payload)
        .map(c => col(s"__m.$c").as(c)): _*)
      .where(col(opCol) =!= deleteOp)
      .drop(opCol)
  }
}
