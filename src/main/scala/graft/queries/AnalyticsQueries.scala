package graft.queries

import org.apache.spark.sql.functions._

/** Corpus/behavioral analytics beyond the reference's surface: term
  * statistics, TF-IDF, funnel and retention — each a standard
  * training-data / product-analytics operator, written scale-first.
  */
object AnalyticsQueries {

  /** Top-k most frequent tokens corpus-wide. explode → hash aggregate
    * (map-side partials) → global top-k; the shuffle carries one row per
    * distinct token per partition.
    */
  val topTokens = Q(
    "q_top_tokens",
    (s, dir) => tbl(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(cnt())
      .orderBy(col("n").desc, col("token"))
      .limit(20),
    Some("""SELECT token, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY token ORDER BY n DESC, token LIMIT 20"""),
    bench = true)

  /** Per-document top TF-IDF term: tf × ln((N+1)/(df+1)), rank-1 per doc.
    *
    * The per-document term count is LOCAL work, so it happens in the
    * projection — the native one-pass [[graft.functions.TermCounts]]
    * kernel emits (term, tf) structs per doc and the explode produces one
    * row per DISTINCT doc×term. The old formulation
    * (`explode(words) → groupBy(doc, term)`) paid a full shuffle of every
    * token occurrence for that same collapse — the biggest exchange in
    * the query, now deleted. Document frequency derives from the same tf
    * frame; N is a scalar broadcast. The per-doc winner is an ARGMAX
    * AGGREGATE — `min(struct(-tfidf, term))` selects highest score with
    * ties to the lexicographically first term — which gets map-side
    * partial aggregation; the window/row_number formulation (what the
    * oracle runs) would shuffle and sort every (doc, term) row instead.
    * Negation round-trips doubles exactly, so values stay bit-equal.
    */
  val tfidf = Q(
    "q_tfidf_top_term",
    (s, dir) => {
      val docs = tbl(s, dir, "documents")
      val tf = docs
        .select(col("doc_id"),
          explode(expr("term_counts(split(text, ' '))")).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"),
          col("tc.tf").as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df_ = tf.groupBy("term").agg(count(lit(1)).cast("long").as("df"))
      val n = docs.count() // scalar: one value, broadcast into the expr
      // document-frequency is VOCABULARY-sized (bounded, ~rows per
      // distinct term) while tf is corpus-sized: broadcasting df turns
      // the term join map-only, so tf is never shuffled by term — its
      // only shuffles are its own (doc_id, term) aggregate and the final
      // per-doc argmax. Fall back to the shuffle join only when the
      // vocabulary itself outgrows broadcast range.
      tf.join(broadcast(df_), "term")
        .withColumn("tfidf",
          col("tf").cast("double") *
            log((lit(n.toDouble) + lit(1.0)) / (col("df").cast("double") + lit(1.0))))
        .groupBy("doc_id")
        .agg(min(struct((-col("tfidf")).as("negt"), col("term"))).as("m"))
        .select(col("doc_id"), col("m.term").as("term"),
          round(-col("m.negt"), 6).as("tfidf"))
        .orderBy("doc_id")
    },
    Some("""WITH terms AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents),
            tf AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM terms GROUP BY doc_id, term),
            df AS (
              SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM (SELECT DISTINCT doc_id, term FROM terms) GROUP BY term),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            scored AS (
              SELECT doc_id, term,
                     CAST(tf AS DOUBLE) * ln((n.n + 1.0) / (CAST(df AS DOUBLE) + 1.0)) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n),
            ranked AS (
              SELECT doc_id, term, tfidf,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY tfidf DESC, term) AS rnk
              FROM scored)
            SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf
            FROM ranked WHERE rnk = 1 ORDER BY doc_id"""),
    bench = true)

  /** Funnel: per user, the first time each stage was reached in order
    * (signup → click → purchase); `reached_stage` counts strictly-ordered
    * progress. One scan, one aggregate, integer-exact.
    */
  val funnel = Q(
    "q_funnel",
    (s, dir) => tbl(s, dir, "events")
      .select(col("user_id"), col("event_type"), tsMicros.as("tus"))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("tus"))).as("first_signup"),
        min(when(col("event_type") === "click", col("tus"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("tus"))).as("first_purchase"))
      .withColumn("reached_stage",
        when(col("first_signup").isNull, 0L)
          .when(col("first_click").isNull ||
            col("first_click") <= col("first_signup"), 1L)
          .when(col("first_purchase").isNull ||
            col("first_purchase") <= col("first_click"), 2L)
          .otherwise(3L))
      .orderBy("user_id"),
    Some("""WITH f AS (
              SELECT user_id,
                     MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS first_signup,
                     MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS first_click,
                     MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
              FROM events GROUP BY user_id)
            SELECT user_id, first_signup, first_click, first_purchase,
                   CASE WHEN first_signup IS NULL THEN 0
                        WHEN first_click IS NULL OR first_click <= first_signup THEN 1
                        WHEN first_purchase IS NULL OR first_purchase <= first_click THEN 2
                        ELSE 3 END AS reached_stage
            FROM f ORDER BY user_id"""))

  /** Day-over-day retention: for each day, how many users active that day
    * were also active the next. Distinct (user, day) pairs → self-join on
    * day+1 — both sides shuffle on the same key, integer-exact.
    */
  val retention = Q(
    "q_retention",
    (s, dir) => {
      val activity = tbl(s, dir, "events")
        .select(col("user_id"),
          expr("(ts div 1000) div 86400000000").as("day")) // floor µs→day
        .distinct()
      val next = activity.select(col("user_id").as("n_user"),
        (col("day") - 1).as("n_day"))
      activity.join(next,
        col("user_id") === col("n_user") && col("day") === col("n_day"),
        "left")
        .groupBy("day")
        .agg(cnt("active_users"),
          count(col("n_user")).cast("long").as("retained_users"))
        .orderBy("day")
    },
    Some("""WITH activity AS (
              SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
              FROM events)
            SELECT a.day, CAST(COUNT(*) AS BIGINT) AS active_users,
                   CAST(COUNT(n.user_id) AS BIGINT) AS retained_users
            FROM activity a LEFT JOIN activity n
              ON a.user_id = n.user_id AND n.day = a.day + 1
            GROUP BY a.day ORDER BY a.day"""))

  /** Per-user mode: the most frequent event type (ties to the
    * alphabetically first) — count-then-argmax, the categorical summary
    * every behavioral dataset needs. Both aggregates get map-side
    * partials; no window, no sort until the output contract.
    */
  val modePerUser = Q(
    "q_mode_per_user",
    (s, dir) => tbl(s, dir, "events")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).cast("long").as("n"))
      .groupBy("user_id")
      .agg(min(struct((-col("n")).as("negn"), col("event_type"))).as("m"))
      .select(col("user_id"), col("m.event_type").as("top_event"),
        (-col("m.negn")).as("n"))
      .orderBy("user_id"),
    Some("""WITH c AS (
              SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY user_id, event_type),
            r AS (
              SELECT user_id, event_type, n,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY n DESC, event_type) AS rk
              FROM c)
            SELECT user_id, event_type AS top_event, n
            FROM r WHERE rk = 1 ORDER BY user_id"""))

  val all: Seq[Q] = Seq(topTokens, tfidf, funnel, retention, modePerUser)
}
