package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.EventOps

/** Round-9 session-6, batch 9: intraday cycle readout and lexical
  * diversity.
  */
object R30Queries {

  val all: Seq[Q] = Seq(

    Q("ev_hourly",
      "Hour-of-day profile per event type (UTC) - ev_seasonality's " +
        "intraday companion: volume and within-type share for each of " +
        "the 24 hours. One map-side combined (hour, type) aggregate " +
        "(<= 24*|types| rows) + a broadcast totals join; the share is " +
        "one division of two exact longs.",
      (s, d) => {
        val ev = Tables.events(s, d)
        val cells = ev
          .groupBy(hour(col("ts")).cast("long").as("hod"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val totals = cells.groupBy(col("event_type"))
          .agg(sum(col("n")).as("__tot"))
        cells.join(broadcast(totals), Seq("event_type"))
          .select(col("hod"), col("event_type"), col("n"),
            (col("n").cast("double") / col("__tot").cast("double"))
              .as("share"))
          .orderBy(col("hod"), col("event_type"))
      },
      Some("""WITH c AS (
             |  SELECT hour(ts) AS hod, event_type, count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
             |      FROM c GROUP BY 1)
             |SELECT CAST(c.hod AS BIGINT) AS hod, c.event_type, c.n,
             |  CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS share
             |FROM c JOIN t USING (event_type)
             |ORDER BY hod, c.event_type""".stripMargin)),

    Q("ta_ttr",
      "Type-token ratio per source - the lexical-diversity readout " +
        "beside ta_vocab's corpus curve: distinct tokens over total " +
        "tokens per slice (low TTR = templated/repetitive feed). One " +
        "tokenize scan, one (source, token) distinct for the types, " +
        "one token count - the ratio is one division of exact longs.",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("source"),
            explode(split(trim(lower(col("text"))), "\\s+")).as("__t"))
          .filter(col("__t") =!= "")
        val types = toks.select(col("source"), col("__t")).distinct()
          .groupBy(col("source")).agg(count(lit(1)).as("n_types"))
        val total = toks.groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"))
        total.join(types, Seq("source"))
          .select(col("source"), col("n_tokens"), col("n_types"),
            (col("n_types").cast("double") / col("n_tokens").cast("double"))
              .as("ttr"))
          .orderBy(col("source"))
      },
      Some("""WITH toks AS (
             |  SELECT source,
             |    unnest(string_split_regex(trim(lower(text)), '\s+'))
             |      AS t
             |  FROM documents),
             |f AS (SELECT source, t FROM toks WHERE t <> ''),
             |ty AS (SELECT source, count(DISTINCT t) AS n_types
             |       FROM f GROUP BY source),
             |tot AS (SELECT source, count(*) AS n_tokens
             |        FROM f GROUP BY source)
             |SELECT tot.source, tot.n_tokens, ty.n_types,
             |  CAST(ty.n_types AS DOUBLE) / CAST(tot.n_tokens AS DOUBLE)
             |    AS ttr
             |FROM tot JOIN ty USING (source)
             |ORDER BY source""".stripMargin)),

    Q("ev_attribution_first",
      "FIRST-touch attribution - ev_attribution's discovery-credit " +
        "complement (which channel ACQUIRED the user vs which closed): " +
        "the earliest qualifying touch strictly before each conversion " +
        "takes full credit, over the same deterministic (ts, event_id) " +
        "frame and one user exchange; only the window function changes " +
        "(first non-null instead of last).",
      (s, d) => EventOps.firstTouchAttribution(Tables.events(s, d),
        "user_id", "ts", "event_type", "event_id",
        touchTypes = Seq("click", "view", "signup"),
        conversionType = "purchase", valueCol = "value"),
      Some("""WITH attr AS (
             |  SELECT event_type, value,
             |    coalesce(first_value(CASE WHEN event_type IN
             |        ('click', 'view', 'signup') THEN event_type END
             |        IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING
             |              AND 1 PRECEDING),
             |      '(direct)') AS channel
             |  FROM events)
             |SELECT channel, count(*) AS n_conversions,
             |  cast(sum(cast(value AS DECIMAL(28,8))) AS DOUBLE)
             |    AS revenue
             |FROM attr
             |WHERE event_type = 'purchase'
             |GROUP BY channel
             |ORDER BY channel""".stripMargin)))
}
