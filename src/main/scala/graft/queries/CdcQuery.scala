package graft.queries

import org.apache.spark.sql.functions._

/** CDC merge/upsert ([[graft.ops.MergeStore]]): the events stream
  * replayed as a change log onto a keyed store — every event upserts its
  * user's row (last-writer-wins by event time), `error` events delete
  * the key (tombstoned). The query drives THREE sequential merge batches
  * through the real bucket-partitioned store machinery (hash-pruned
  * reads, partial partition rewrites, tombstones) and returns the final
  * live table; the oracle replays the lattice directly — LWW is
  * associative, so the final state is one `MAX(struct(seq, …))` per key
  * regardless of batching — making the hash-match a proof that the
  * incremental store converges to the declarative answer.
  */
object CdcQuery {

  private val nBuckets = 8

  val cdcMerge = Q(
    "q_cdc_merge",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
        // keys must be non-null; a change without a timestamp cannot be
        // ordered — both excluded, stated on both sides
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        // vn: explicit null-rank so a (seq, is_delete) tie between a
        // null and a non-null value never reaches a NULL comparison
        // inside the struct max — Spark orders null struct fields
        // smallest, DuckDB largest, so without it the engines could
        // disagree on the winner
        .select(col("user_id"), tsMicros.as("seq"),
          (col("event_type") === "error").as("is_delete"),
          col("value").isNull.as("vn"), col("value"),
          col("event_id"))
      val path = java.nio.file.Files
        .createTempDirectory("cdc_merge_store").toString + "/t"
      (0L until 3L).foreach { b =>
        graft.ops.MergeStore.merge(s, path,
          ev.filter(pmod(col("event_id"), lit(3L)) === b)
            .drop("event_id"),
          "user_id", nBuckets)
      }
      graft.ops.MergeStore.readOrEmpty(s, path, ev.drop("event_id"))
        .select(col("user_id"), col("seq").as("last_us"), col("value"))
        .orderBy("user_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS seq,
                     event_type = 'error' AS is_delete,
                     value IS NULL AS vn, value
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            w AS (
              SELECT user_id,
                     MAX(struct_pack(seq := seq, is_delete := is_delete,
                                     vn := vn, value := value)) AS w
              FROM ev GROUP BY user_id)
            SELECT user_id, w.seq AS last_us, w.value AS value
            FROM w WHERE NOT w.is_delete
            ORDER BY user_id"""),
    bench = true)

  /** SCD type-2 history: the same change log materialized as a VERSIONED
    * table — every upsert opens a version row valid [valid_from,
    * valid_to); the next change (upsert or delete) closes it; deletes
    * close without opening, so a key whose last change is a delete has
    * no current row. Changes first dedupe to one winner per (key, seq)
    * under the same LWW tie lattice as [[cdcMerge]], then one
    * per-key-partitioned `lead` window derives the validity interval —
    * the window is keyed, so it scales with per-key history, never with
    * table width.
    */
  val scd2History = Q(
    "q_scd2_history",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), tsMicros.as("seq"),
          (col("event_type") === "error").as("is_delete"),
          col("value").isNull.as("vn"), col("value"))
      // one explicit user_id exchange serves BOTH the (user_id, seq)
      // dedupe aggregate (clustering by a subset of the grouping keys
      // satisfies its distribution requirement) and the per-user lead
      // window — without it Spark plans two back-to-back shuffles
      val changes = ev.repartition(col("user_id"))
        .groupBy("user_id", "seq")
        .agg(max(struct(col("is_delete"), col("vn"), col("value")))
          .as("w"))
        .select(col("user_id"), col("seq"),
          col("w.is_delete").as("is_delete"), col("w.value").as("value"))
      val win = Window.partitionBy("user_id").orderBy("seq")
      changes
        .withColumn("valid_to", lead(col("seq"), 1).over(win))
        .filter(!col("is_delete"))
        .select(col("user_id"), col("seq").as("valid_from"),
          col("valid_to"), col("value"),
          col("valid_to").isNull.as("is_current"))
        .orderBy("user_id", "valid_from")
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS seq,
                     event_type = 'error' AS is_delete,
                     value IS NULL AS vn, value
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            ch AS (
              SELECT user_id, seq,
                     MAX(struct_pack(is_delete := is_delete, vn := vn,
                                     value := value)) AS w
              FROM ev GROUP BY user_id, seq),
            v AS (
              SELECT user_id, seq AS valid_from,
                     LEAD(seq) OVER (PARTITION BY user_id ORDER BY seq)
                       AS valid_to,
                     w.is_delete AS is_delete, w.value AS value
              FROM ch)
            SELECT user_id, valid_from, valid_to, value,
                   valid_to IS NULL AS is_current
            FROM v WHERE NOT is_delete
            ORDER BY user_id, valid_from"""))

  /** Point-in-time dimension join — the fact-to-SCD2 lookup every
    * warehouse needs: each purchase (fact) is joined to the profile
    * version that was LIVE at purchase time, where the profile dimension
    * is built from `signup` upserts and `error` deletes under the same
    * (key, seq) LWW lattice as [[cdcMerge]]. Expressed as an AS-OF join
    * of facts against the deduped CHANGE log ([[graft.ops.AsOfJoin]] —
    * one key shuffle, no interval expansion: matching the latest change
    * ≤ t and nulling tombstones is equivalent to probing the derived
    * [valid_from, valid_to) intervals, without materializing them or
    * paying a range join). Purchases before any profile change, and
    * purchases whose latest change is a delete, both surface as
    * `has_dim = false` — the rows a naive inner range-join silently
    * drops. The oracle runs DuckDB's native ASOF LEFT JOIN over the
    * identically-deduped change log.
    */
  val pitJoin = Q(
    "q_pit_join",
    (s, dir) => {
      val ev = tbl(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), tsMicros.as("tus"), col("event_type"),
          (col("event_type") === "error").as("is_delete"),
          col("value").isNull.as("vn"), col("value"), col("event_id"))
      val changes = ev
        .filter(col("event_type").isin("signup", "error"))
        .groupBy("user_id", "tus")
        .agg(max(struct(col("is_delete"), col("vn"), col("value")))
          .as("w"))
        .select(col("user_id"), col("tus"), col("tus").as("vseq"),
          col("w.is_delete").as("is_delete"), col("w.value").as("value"))
      val facts = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "tus")
      val live = col("asof_vseq").isNotNull && !col("asof_is_delete")
      graft.ops.AsOfJoin.asOf(facts, changes, key = "user_id",
          ts = "tus", rightCols = Seq("vseq", "is_delete", "value"))
        .select(col("event_id"), col("user_id"), col("tus"),
          when(live, col("asof_vseq")).otherwise(lit(-1L)).as("dim_seq"),
          when(live, round(col("asof_value"), 6)).as("dim_value"),
          live.as("has_dim"))
        .orderBy("event_id")
    },
    Some("""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS tus, event_type,
                     event_type = 'error' AS is_delete,
                     value IS NULL AS vn, value, event_id
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
            ch AS (
              SELECT user_id, tus,
                     MAX(struct_pack(is_delete := is_delete, vn := vn,
                                     value := value)) AS w
              FROM ev WHERE event_type IN ('signup', 'error')
              GROUP BY user_id, tus),
            chf AS (
              SELECT user_id, tus AS seq, w.is_delete AS is_delete,
                     w.value AS value
              FROM ch),
            f AS (
              SELECT event_id, user_id, tus FROM ev
              WHERE event_type = 'purchase')
            SELECT f.event_id, f.user_id, f.tus,
                   CASE WHEN c.seq IS NOT NULL AND NOT c.is_delete
                        THEN c.seq ELSE -1 END AS dim_seq,
                   CASE WHEN c.seq IS NOT NULL AND NOT c.is_delete
                        THEN ROUND(c.value, 6) END AS dim_value,
                   c.seq IS NOT NULL AND NOT c.is_delete AS has_dim
            FROM f ASOF LEFT JOIN chf c
              ON f.user_id = c.user_id AND f.tus >= c.seq
            ORDER BY f.event_id"""))

  /** AS-OF snapshot (time travel): the dimension table exactly as it
    * stood at 2024-01-15T00:00Z — the table-format `VERSION AS OF` read,
    * derived from the SCD2 history instead of a transaction log: the
    * version live at T is the row with `valid_from ≤ T < valid_to`
    * (open version = null valid_to). Deletes need no special case — a
    * key deleted before T has a closed last version and simply has no
    * row at T. Cost: the history derivation plus a map-side filter; no
    * extra shuffle over [[scd2History]].
    */
  private val asOfUs = 1705276800000000L // 2024-01-15T00:00:00Z, µs

  val scd2AsOf = Q(
    "q_scd2_asof",
    (s, dir) =>
      scd2History.spark(s, dir)
        .filter(col("valid_from") <= asOfUs &&
          (col("valid_to").isNull || col("valid_to") > asOfUs))
        .select(col("user_id"), col("valid_from"), col("value"))
        .orderBy("user_id"),
    Some(s"""WITH h AS (${scd2History.oracle.get.replaceAll(
        "ORDER BY user_id, valid_from\\s*$", "")})
            SELECT user_id, valid_from, value
            FROM h
            WHERE valid_from <= $asOfUs
              AND (valid_to IS NULL OR valid_to > $asOfUs)
            ORDER BY user_id"""))

  val all: Seq[Q] = Seq(cdcMerge, scd2History, pitJoin, scd2AsOf)
}
