package graft

/** DuckDB oracle SQL — event-time operators (as-of, range join, sessionize, funnel, ...).
  * Split verbatim out of SparkEntry.baseOracleSql in r14; graded
  * against the Spark queries by the driver's sorted-column hash.
  */
private[graft] object OraclesTemporalQ {
  import OracleDsl._

  val sql: Map[String, String] = Map(
    "events_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts::TIMESTAMP) AS tus FROM events),
         m AS (SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
                 OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
                 THEN 1 ELSE 0 END AS is_new FROM e),
         s AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq FROM m)
         SELECT user_id, session_seq::BIGINT AS session_seq, count(*) AS n_events,
           round(sum(value), 2) AS session_value
         FROM s GROUP BY user_id, session_seq""",

    "asof_join_forward" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus, value
                    FROM events),
         p AS (SELECT event_id, user_id, tus, value FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS click_event_id, tus AS click_tus FROM e
               WHERE event_type = 'click'),
         u AS (
           SELECT user_id AS k, tus AS t, 1 AS side, 0::BIGINT AS tie,
                  event_id, tus, value, NULL::BIGINT AS click_event_id, NULL::BIGINT AS click_tus
           FROM p
           UNION ALL
           SELECT user_id, click_tus, 0, click_event_id,
                  NULL, NULL, NULL, click_event_id, click_tus
           FROM c),
         m AS (SELECT *,
                 first_value(click_event_id IGNORE NULLS) OVER win AS m_id,
                 first_value(click_tus IGNORE NULLS) OVER win AS m_tus
               FROM u
               WINDOW win AS (PARTITION BY k ORDER BY t, side DESC, tie
                              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_id, k AS user_id, tus, value, m_id AS click_event_id,
           m_tus AS click_tus, m_tus - tus AS gap_us
         FROM m WHERE side = 1""",

    "asof_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus, value
                    FROM events),
         p AS (SELECT event_id, user_id, tus, value FROM e WHERE event_type = 'purchase'),
         c AS (SELECT user_id, event_id AS click_event_id, tus AS click_tus FROM e
               WHERE event_type = 'click'),
         u AS (
           SELECT user_id AS k, tus AS t, 1 AS side, 0::BIGINT AS tie,
                  event_id, tus, value, NULL::BIGINT AS click_event_id, NULL::BIGINT AS click_tus
           FROM p
           UNION ALL
           SELECT user_id, click_tus, 0, click_event_id,
                  NULL, NULL, NULL, click_event_id, click_tus
           FROM c),
         m AS (SELECT *,
                 last_value(click_event_id IGNORE NULLS) OVER win AS m_id,
                 last_value(click_tus IGNORE NULLS) OVER win AS m_tus
               FROM u
               WINDOW win AS (PARTITION BY k ORDER BY t, side, tie
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, k AS user_id, tus, value, m_id AS click_event_id,
           m_tus AS click_tus, tus - m_tus AS gap_us
         FROM m WHERE side = 1""",

    "range_join_bands" ->
      """SELECT band, count(*) AS n_events, round(sum(value), 2) AS sum_value
         FROM events e
         JOIN (VALUES ('low', 0.0, 50.0), ('mid', 40.0, 200.0), ('high', 150.0, 500.0))
           AS b(band, lo, hi)
           ON e.value >= b.lo AND e.value < b.hi
         GROUP BY band""",

    "window_time_range" ->
      """WITH e AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS tus,
                      CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events)
         SELECT event_id, user_id, tus,
           count(*) OVER win AS trailing_n,
           CAST(sum(cents) OVER win AS BIGINT) AS trailing_cents
         FROM e
         WINDOW win AS (PARTITION BY user_id ORDER BY tus
                        RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",

    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS tus FROM events),
         s0 AS (SELECT user_id, min(tus) AS t0 FROM e
                WHERE event_type = 'view' GROUP BY user_id),
         s1 AS (SELECT s0.user_id, min(e.tus) AS t1 FROM s0 JOIN e USING (user_id)
                WHERE e.event_type = 'click' AND e.tus >= s0.t0 GROUP BY s0.user_id),
         s2 AS (SELECT s1.user_id, min(e.tus) AS t2 FROM s1 JOIN e USING (user_id)
                WHERE e.event_type = 'purchase' AND e.tus >= s1.t1 GROUP BY s1.user_id)
         SELECT 0::BIGINT AS step_idx, 'view' AS step, (SELECT count(*) FROM s0) AS n_users
         UNION ALL
         SELECT 1, 'click', (SELECT count(*) FROM s1)
         UNION ALL
         SELECT 2, 'purchase', (SELECT count(*) FROM s2)""",

    "events_json" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(json_extract_string(props, '$.k')::BIGINT) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type""",

    "events_retention" ->
      """WITH ud AS (SELECT DISTINCT user_id,
             epoch_us(ts::TIMESTAMP) // 86400000000 AS day FROM events),
         f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id),
         j AS (SELECT DISTINCT ud.user_id, f.cohort_day // 7 AS cohort_week,
                 (ud.day - f.cohort_day) // 7 AS week_offset
               FROM ud JOIN f USING (user_id))
         SELECT cohort_week, week_offset, count(*) AS n_users
         FROM j GROUP BY 1, 2""",

    "event_daily_anomaly" ->
      """WITH d AS (SELECT event_type, epoch_us(ts::TIMESTAMP) // 86400000000 AS day,
                      count(*) AS n_events
                    FROM events GROUP BY 1, 2),
         st AS (SELECT event_type, count(*) AS n_days, sum(n_events)::BIGINT AS s1,
                  sum(n_events * n_events)::BIGINT AS s2 FROM d GROUP BY 1),
         j AS (SELECT d.event_type, day, n_events,
                 s1::DOUBLE / n_days AS mean,
                 (s2::DOUBLE - s1::DOUBLE * s1 / n_days) / n_days AS variance
               FROM d JOIN st USING (event_type))
         SELECT event_type, day, n_events,
           floor((n_events::DOUBLE - mean) / sqrt(variance) * 10000 + 0.5) / 10000 AS z
         FROM j WHERE variance > 0
           AND abs((n_events::DOUBLE - mean) / sqrt(variance)) >= 2.0""",

    "events_dedup_window" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
                      epoch_us(ts::TIMESTAMP) AS tus FROM events),
         m AS (SELECT *, (lag(tus) OVER (PARTITION BY user_id, event_type
                 ORDER BY tus, event_id) IS NULL
               OR tus - lag(tus) OVER (PARTITION BY user_id, event_type
                 ORDER BY tus, event_id) > 60000000) AS keep FROM e)
         SELECT event_type, count(*)::BIGINT AS n_total,
           sum(CASE WHEN keep THEN 1 ELSE 0 END)::BIGINT AS n_kept,
           sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_dropped
         FROM m GROUP BY 1""",

    "events_gap_stats" ->
      """WITH e AS (SELECT user_id, event_id,
                      epoch_us(ts::TIMESTAMP) AS tus FROM events),
         m AS (SELECT user_id,
                 tus - lag(tus) OVER (PARTITION BY user_id
                   ORDER BY tus, event_id) AS gap FROM e)
         SELECT user_id, count(*)::BIGINT AS n_events,
           count(gap)::BIGINT AS n_gaps,
           min(gap) AS min_gap_us, max(gap) AS max_gap_us,
           floor(sum(gap) / greatest(count(gap), 1))::BIGINT AS avg_gap_us
         FROM m GROUP BY 1""",

  )
}
