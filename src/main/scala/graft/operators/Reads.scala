package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Read-path operators: scans, projections, filters, top-K recency,
  * pagination, the validity predicate, and the dashboard join
  * (SURVEY.md §2.3, §2.4).
  *
  * All are pure `DataFrame => DataFrame`; predicates reach the parquet
  * scan via Catalyst pushdown (verified with `.explain` — see
  * PLANS.md), so a point lookup at 100 TB touches only row groups
  * whose min/max straddle the key.
  */
object Reads {

  /** Point lookup by primary key, ≤1 row expected.
    * Reference R1 `internal/db/activities.go:187-200`, R9
    * `user_api_keys.go:94-109`.
    */
  def byKey(df: DataFrame, key: String, value: Long): DataFrame =
    df.filter(col(key) === lit(value))

  /** Equality lookup on a unique or FK column (R4-R7, R10:
    * `internal/db/user.go:56-108`, `strava.go:195-220`,
    * `user_api_keys.go:174-186`).
    */
  def byColumn(df: DataFrame, c: String, value: Column): DataFrame =
    df.filter(col(c) === value)

  /** Top-K by recency: `SELECT * ORDER BY start_date DESC LIMIT n`
    * (R2 `internal/db/activities.go:202-214`). Physical plan is
    * `TakeOrderedAndProject` — per-partition top-K then a K-row merge
    * on the driver; no global sort, safe at any scale.
    */
  def latest(df: DataFrame, ts: String, key: String, n: Int): DataFrame =
    df.orderBy(col(ts).desc, col(key).desc).limit(n)

  /** Offset pagination (R3, intended semantics of
    * `internal/api/api.go:206-236`, SURVEY §0.1 D1): rows
    * [offset+1, offset+limit] of the recency ordering. Uses the native
    * global-limit-with-offset (Spark ≥3.4) — still a driver-side skip
    * of `offset` rows, fine for UI pages; at 100 TB with deep offsets
    * use keyset pagination ([[pageAfter]]) instead.
    */
  def page(df: DataFrame, ts: String, key: String, limit: Int, offset: Int): DataFrame =
    df.orderBy(col(ts).desc, col(key).desc).offset(offset).limit(limit)

  /** Keyset pagination — the scale-safe variant of [[page]]: resume
    * strictly after cursor `(ts, key)`. The predicate pushes down to
    * the scan, so cost is independent of page depth.
    */
  def pageAfter(df: DataFrame, ts: String, key: String,
                cursorTs: Column, cursorKey: Long, limit: Int): DataFrame =
    df.filter(col(ts) < cursorTs ||
        (col(ts) === cursorTs && col(key) < lit(cursorKey)))
      .orderBy(col(ts).desc, col(key).desc)
      .limit(limit)

  /** Incremental-sync predicate: activities with `start ≥ after`
    * (reference `internal/strava/strava.go:54-58`, `api.go:325-332`).
    */
  def since(df: DataFrame, ts: String, after: Column): DataFrame =
    df.filter(col(ts) >= after)

  /** API-key validity (R8 `internal/db/user_api_keys.go:35-57`):
    * active AND (no expiry OR expiry in the future). The reference
    * evaluates the second conjunct in Go with zero-time-as-null
    * semantics; here it is one pushed-down Column predicate with
    * explicit NULL handling.
    */
  def valid(df: DataFrame, active: Column, expiresAt: Column, now: Column): DataFrame =
    df.filter(active && (expiresAt.isNull || expiresAt > now))

  /** Dashboard read (SURVEY §2.4): the app-side two-query join
    * `GetUserByID` + `GetAPIKeysForUser`
    * (`internal/api/api.go:123-134`) as an explicit left equi-join
    * users ⟕ api_keys. The keys side is broadcast (a left-outer join
    * can only build/broadcast its right side); api_keys is a few rows
    * per user, so this stays a zero-shuffle broadcast hash join at any
    * user count. If the right side ever outgrows the broadcast
    * threshold, AQE falls back to a shuffle join automatically.
    */
  def dashboard(users: DataFrame, keys: DataFrame, userKey: String, fk: String): DataFrame =
    users.join(broadcast(keys), col(userKey) === col(fk), "left")

  /** Snapshot reconciliation: FULL OUTER join two versions of a keyed
    * table and emit only the differences — `removed` (key left-only),
    * `added` (right-only), `changed` (both, value differs). The report
    * a nightly store audit ships; identical rows are filtered out so
    * the output is diff-sized, not table-sized. Both sides shuffle on
    * the key once (the unavoidable full-outer exchange); at 100 TB
    * pre-bucketed snapshots on the key make this a zero-exchange
    * sort-merge.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   key: String, valueCol: String): DataFrame = {
    // Presence is marked explicitly per side (lit(true)), never inferred
    // from the value column's nullness: a key present on both sides with
    // a NULL value is "same"/"changed" — not a phantom add/remove — even
    // when the diffed column is nullable.
    val l = before.select(col(key), col(valueCol).as("__old"),
      lit(true).as("__in_old"))
    val r = after.select(col(key), col(valueCol).as("__new"),
      lit(true).as("__in_new"))
    l.join(r, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__in_new").isNull, lit("removed"))
          .when(col("__in_old").isNull, lit("added"))
          .when(!(col("__old") <=> col("__new")), lit("changed"))
          .otherwise(lit("same")))
      .filter(col("status") =!= "same")
      .select(col(key), col("status"),
        col("__old").as("old_value"), col("__new").as("new_value"))
      .orderBy(col(key))
  }
}
