package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.{EventOps, Profile, UrlOps}

/** Round-9 session-5: experiment analysis (A/B chi-square readout),
  * order-invariant dataset fingerprinting, and URL canonicalization +
  * URL-keyed dedup — the crawl pipeline's first dedup stage.
  */
object R21Queries {

  /** Deterministic synthetic URL per document (the fixtures carry no
    * URL column): six variants by doc_id — casing, explicit default
    * port, `www.`, duplicate slashes, trailing slash, tracking params
    * (`utm_*`/`fbclid`), fragments — so every canonicalization rule is
    * exercised, and variants 0/1/2/5 of the same (source, doc_id%40)
    * cell collapse to ONE canonical URL.
    */
  private def syntheticUrl(): org.apache.spark.sql.Column = {
    val k = (col("doc_id") % 40).cast("string")
    val id = col("doc_id").cast("string")
    val m = col("doc_id") % 6
    when(m === 0, concat(lit("https://www."), col("source"),
        lit(".example.com/a/"), k, lit("?utm_source=feed&b=2&a=1#sec")))
      .when(m === 1, concat(lit("HTTPS://"), upper(col("source")),
        lit(".Example.COM:443/a//"), k, lit("/?a=1&b=2")))
      .when(m === 2, concat(lit("https://"), col("source"),
        lit(".example.com/a/"), k, lit("?b=2&utm_campaign="), id,
        lit("&a=1")))
      .when(m === 3, concat(lit("http://www."), col("source"),
        lit(".example.com:80/a/"), k, lit("?a=1&b=2")))
      .when(m === 4, concat(lit("https://www."), col("source"),
        lit(".example.com:443//a/"), k, lit("#x")))
      .otherwise(concat(lit("https://"), col("source"),
        lit(".example.com/a/"), k, lit("/?fbclid="), id, lit("&a=1&b=2")))
  }

  /** Oracle CTE: the same synthetic URLs (`u`) and their canonical
    * forms (`canon`), restating UrlOps.canonicalizeUrl step by step.
    * DuckDB regexp_replace is first-match-only, hence the explicit 'g'
    * on the slash-collapse; replacement backrefs are `\1` (RE2) where
    * Spark writes `$1` — same pattern, dialect replacement syntax.
    */
  private val urlCtes: String =
    """u AS (
      |  SELECT doc_id, n_chars,
      |    CASE CAST(doc_id % 6 AS INT)
      |      WHEN 0 THEN 'https://www.' || source || '.example.com/a/' ||
      |        CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&b=2&a=1#sec'
      |      WHEN 1 THEN 'HTTPS://' || upper(source) ||
      |        '.Example.COM:443/a//' || CAST(doc_id % 40 AS VARCHAR) ||
      |        '/?a=1&b=2'
      |      WHEN 2 THEN 'https://' || source || '.example.com/a/' ||
      |        CAST(doc_id % 40 AS VARCHAR) || '?b=2&utm_campaign=' ||
      |        CAST(doc_id AS VARCHAR) || '&a=1'
      |      WHEN 3 THEN 'http://www.' || source || '.example.com:80/a/' ||
      |        CAST(doc_id % 40 AS VARCHAR) || '?a=1&b=2'
      |      WHEN 4 THEN 'https://www.' || source || '.example.com:443//a/' ||
      |        CAST(doc_id % 40 AS VARCHAR) || '#x'
      |      ELSE 'https://' || source || '.example.com/a/' ||
      |        CAST(doc_id % 40 AS VARCHAR) || '/?fbclid=' ||
      |        CAST(doc_id AS VARCHAR) || '&a=1&b=2'
      |    END AS url
      |  FROM documents),
      |pu AS (
      |  SELECT doc_id, n_chars, url,
      |    regexp_replace(url, '#.*$', '') AS nf
      |  FROM u),
      |pp AS (
      |  SELECT doc_id, n_chars, url,
      |    lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
      |      AS scheme,
      |    regexp_replace(
      |      lower(regexp_extract(nf,
      |        '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1)),
      |      '^www\.', '') AS bare,
      |    regexp_extract(nf,
      |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1) AS rest
      |  FROM pu),
      |pq AS (
      |  SELECT doc_id, n_chars, url, scheme,
      |    CASE WHEN scheme = 'https' THEN regexp_replace(bare, ':443$', '')
      |         WHEN scheme = 'http' THEN regexp_replace(bare, ':80$', '')
      |         ELSE bare END AS host,
      |    regexp_replace(
      |      regexp_replace(regexp_extract(rest, '^([^?]*)', 1),
      |        '/{2,}', '/', 'g'),
      |      '(.+)/$', '\1') AS path0,
      |    coalesce(array_to_string(list_sort(list_filter(
      |      string_split(regexp_extract(rest, '\?(.*)$', 1), '&'),
      |      x -> NOT regexp_matches(x,
      |        '^(utm_[^=]*|fbclid|gclid|msclkid|ref)=') AND x <> '')),
      |      '&'), '') AS kept
      |  FROM pp),
      |canon AS (
      |  SELECT doc_id, n_chars, url,
      |    scheme || '://' || host ||
      |    (CASE WHEN path0 = '' THEN '/' ELSE path0 END) ||
      |    (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS canonical
      |  FROM pq)""".stripMargin

  /** Shared by ev_abtest and stream_abtest (stream == batch): the full
    * 2×2 experiment readout in exact arithmetic.
    */
  private val abtestSql: String =
    """WITH uu AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS expo,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS conv
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |e AS (SELECT user_id % 2 AS v, conv FROM uu WHERE expo = 1),
      |c AS (
      |  SELECT
      |    CAST(coalesce(sum(CASE WHEN v = 0 THEN 1 END), 0)
      |      AS BIGINT) AS n_a,
      |    CAST(coalesce(sum(CASE WHEN v = 0 THEN conv END), 0)
      |      AS BIGINT) AS conv_a,
      |    CAST(coalesce(sum(CASE WHEN v <> 0 THEN 1 END), 0)
      |      AS BIGINT) AS n_b,
      |    CAST(coalesce(sum(CASE WHEN v <> 0 THEN conv END), 0)
      |      AS BIGINT) AS conv_b
      |  FROM e),
      |x AS (
      |  SELECT n_a, conv_a, n_b, conv_b,
      |    CAST(conv_a AS DECIMAL(38,0)) AS a,
      |    CAST(n_a - conv_a AS DECIMAL(38,0)) AS b,
      |    CAST(conv_b AS DECIMAL(38,0)) AS c2,
      |    CAST(n_b - conv_b AS DECIMAL(38,0)) AS d2,
      |    CAST(n_a + n_b AS DECIMAL(38,0)) AS nn
      |  FROM c)
      |SELECT n_a, conv_a, n_b, conv_b,
      |  CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS rate_a,
      |  CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS rate_b,
      |  CASE WHEN (a+b)*(c2+d2)*(a+c2)*(b+d2) > 0 THEN
      |    CAST(nn AS DOUBLE) *
      |    CAST((a*d2 - b*c2)*(a*d2 - b*c2) AS DOUBLE) /
      |    CAST((a+b)*(c2+d2)*(a+c2)*(b+d2) AS DOUBLE)
      |  ELSE 0e0 END AS chi2
      |FROM x""".stripMargin

  val all: Seq[Q] = Seq(

    Q("ev_abtest",
      "A/B experiment readout over the event log: variant = user_id " +
        "parity (a pure function of the id — reproducible assignment), " +
        "exposure = any 'view' event, conversion = any 'purchase'. Per " +
        "variant the exposed/converted counts and conversion rate, plus " +
        "the Pearson chi-square of the 2x2 table. ONE user-keyed " +
        "map-side-combined aggregate is the only data-sized pass; the " +
        "2x2 arithmetic stays integer (DECIMAL(38,0) cross terms) with " +
        "a fixed double(N)*double(num)/double(den) finish both engines " +
        "replay literally.",
      (s, d) => EventOps.abTest(Tables.events(s, d), "user_id",
        "event_type", "view", "purchase"),
      Some(abtestSql)),

    Q("stream_abtest",
      "Structured Streaming runs the A/B EXPERIMENT MONITOR: even-id " +
        "events bootstrap batch 0's per-user exposure/conversion " +
        "flags, each micro-batch appends its own users' flags under " +
        "the commit-marker machinery (per-batch cost = one user " +
        "aggregate of the new files; flags are max-MERGEABLE), and " +
        "serving merges committed flags by per-user max into the " +
        "shared 2x2 readout. Stream == batch: the same oracle as " +
        "ev_abtest.",
      (s, d) => graft.streaming.EventStream.runAbTestStream(s, d,
        sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_stream_abtest_" + d.replaceAll("[^A-Za-z0-9.]", "_")),
      Some(abtestSql)),

    Q("dq_checksum",
      "Order-invariant table fingerprint of lineitem's exact-typed " +
        "columns: row count + sum/xor/max digests of a 60-bit " +
        "md5-derived row hash. Sum, xor, and max are all commutative- " +
        "associative, so partitioning, partition order, and AQE " +
        "re-plans can never change the answer — the 'did the rewrite " +
        "preserve the data' audit that at 100 TB must not sort. ONE " +
        "scan, one 4-cell map-side-combined aggregate. Doubles are " +
        "excluded by contract (engine-specific shortest-repr " +
        "formatting); the date pre-formats to yyyy-MM-dd.",
      (s, d) => Profile.tableChecksum(
        Tables.lineitem(s, d).select(
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day")),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus", "ship_day")),
      Some("""WITH h AS (
             |  SELECT CAST(('0x' || substring(md5(
             |    CAST(l_orderkey AS VARCHAR) || chr(1) ||
             |    CAST(l_partkey AS VARCHAR) || chr(1) ||
             |    CAST(l_suppkey AS VARCHAR) || chr(1) ||
             |    CAST(l_linenumber AS VARCHAR) || chr(1) ||
             |    l_returnflag || chr(1) || l_linestatus || chr(1) ||
             |    strftime(l_shipdate, '%Y-%m-%d')), 1, 15)) AS BIGINT)
             |    AS hh
             |  FROM lineitem)
             |SELECT count(*) AS n_rows,
             |  CAST(CAST(sum(hh) AS DECIMAL(38,0)) AS VARCHAR)
             |    AS checksum_sum,
             |  bit_xor(hh) AS checksum_xor,
             |  max(hh) AS checksum_max
             |FROM h""".stripMargin)),

    Q("ta_urlnorm",
      "URL canonicalization — the crawl pipeline's first dedup key: " +
        "lowercase scheme/host, strip www./default port/fragment, " +
        "collapse duplicate slashes, strip trailing slash, drop " +
        "tracking params (utm_*/fbclid/gclid/msclkid/ref) and sort the " +
        "survivors. Six deterministic URL variants per doc exercise " +
        "every rule. Pure codegen'd scan-stage string expressions — " +
        "no UDF, no shuffle beyond the final presentation sort.",
      (s, d) => Tables.documents(s, d)
        .withColumn("url", syntheticUrl())
        .select(col("doc_id"), col("url"),
          UrlOps.canonicalizeUrl(col("url")).as("canonical"))
        .orderBy("doc_id"),
      Some(s"""WITH $urlCtes
              |SELECT doc_id, url, canonical
              |FROM canon ORDER BY doc_id""".stripMargin)),

    Q("dedup_url",
      "URL-keyed exact dedup on the canonical form: variants 0/1/2/5 " +
        "of each (source, doc_id%40) cell collapse to one canonical " +
        "URL; the survivor is the longest document (tie: lowest " +
        "doc_id) via a per-key struct-argmax — one canonical-keyed " +
        "exchange, no global sort, the survivor-policy shape " +
        "dedup_survivor proved at 10x.",
      (s, d) => Tables.documents(s, d)
        .withColumn("url", syntheticUrl())
        .withColumn("canonical", UrlOps.canonicalizeUrl(col("url")))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n_dups"),
          max(struct(col("n_chars"), (-col("doc_id")).as("negid")))
            .as("__best"))
        .select(col("canonical"), col("n_dups"),
          (-col("__best").getField("negid")).as("survivor_id"),
          col("__best").getField("n_chars").as("survivor_chars"))
        .orderBy("canonical"),
      Some(s"""WITH $urlCtes,
              |r AS (
              |  SELECT canonical, n_chars, doc_id,
              |    row_number() OVER (PARTITION BY canonical
              |      ORDER BY n_chars DESC, doc_id ASC) AS rn,
              |    count(*) OVER (PARTITION BY canonical) AS n_dups
              |  FROM canon)
              |SELECT canonical, n_dups, doc_id AS survivor_id,
              |  n_chars AS survivor_chars
              |FROM r WHERE rn = 1 ORDER BY canonical""".stripMargin)),

    Q("dq_checksum_by",
      "Per-slice table fingerprint (reconciliation drill-down): the " +
        "same sum/xor/max row-hash digests as dq_checksum, grouped by " +
        "ship month — when two table versions' global fingerprints " +
        "disagree, one scan locates WHICH slice diverged. The key " +
        "groups but does not enter the row hash, so slice fingerprints " +
        "compare across physical layouts; digests are commutative-" +
        "associative (order/partitioning-invariant by algebra).",
      (s, d) => Profile.tableChecksumByKey(
        Tables.lineitem(s, d).select(
          date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
          col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_linenumber"), col("l_returnflag"), col("l_linestatus"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_day")),
        Some("ship_month"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus", "ship_day")),
      Some("""WITH h AS (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
             |    CAST(('0x' || substring(md5(
             |    CAST(l_orderkey AS VARCHAR) || chr(1) ||
             |    CAST(l_partkey AS VARCHAR) || chr(1) ||
             |    CAST(l_suppkey AS VARCHAR) || chr(1) ||
             |    CAST(l_linenumber AS VARCHAR) || chr(1) ||
             |    l_returnflag || chr(1) || l_linestatus || chr(1) ||
             |    strftime(l_shipdate, '%Y-%m-%d')), 1, 15)) AS BIGINT)
             |    AS hh
             |  FROM lineitem)
             |SELECT ship_month, count(*) AS n_rows,
             |  CAST(CAST(sum(hh) AS DECIMAL(38,0)) AS VARCHAR)
             |    AS checksum_sum,
             |  bit_xor(hh) AS checksum_xor,
             |  max(hh) AS checksum_max
             |FROM h GROUP BY ship_month ORDER BY ship_month""".stripMargin)),

    Q("ta_heavyhitters_by",
      "Per-language heavy hitters: tokens with in-group frequency > " +
        "0.2% of that LANGUAGE's token stream, via one Misra-Gries " +
        "summary per (group, partition) — O(k x groups) memory, no " +
        "shuffle — then an exact recount of the broadcast candidates. " +
        "The per-group undercount bound makes the candidate set " +
        "provably complete per group, so the plain per-group GROUP BY " +
        "/ HAVING oracle hash-matches the sketched plan.",
      (s, d) => graft.ops.Frequent.heavyHittersByKey(
        Tables.documents(s, d)
          .select(col("lang"),
            explode(split(trim(col("text")), "\\s+")).as("token"))
          .filter(col("token") =!= ""),
        "lang", "token", threshold = 0.002, k = 1024),
      Some("""WITH toks AS (
             |  SELECT d.lang AS grp, t.tok AS item
             |  FROM documents d,
             |       unnest(string_split_regex(trim(d.text), '\s+')) AS t(tok)
             |  WHERE t.tok <> '' AND d.lang IS NOT NULL),
             |n AS (SELECT grp, count(*) AS n FROM toks GROUP BY grp)
             |SELECT t.grp, t.item, count(*) AS cnt,
             |  CAST(count(*) AS DOUBLE) / n.n AS share
             |FROM toks t JOIN n USING (grp)
             |GROUP BY t.grp, t.item, n.n
             |HAVING count(*) > 0.002 * n.n
             |ORDER BY grp, cnt DESC, item""".stripMargin)),

    Q("ev_cohort_ltv",
      "Cohort LTV triangle: users cohorted by first-activity week; per " +
        "(cohort, week offset) the active users, cell revenue, " +
        "cohort-cumulative revenue and LTV (cumulative / cohort size). " +
        "Revenue stays DECIMAL(28,8)-exact through the cumulative " +
        "window (which runs on the weeks^2-bounded cell relation); one " +
        "user-keyed exchange is the only data-sized work — the same " +
        "exchange ev_retention pays.",
      (s, d) => EventOps.cohortLtv(Tables.events(s, d), "user_id", "ts",
        "value"),
      Some("""WITH ev AS (
             |  SELECT user_id,
             |    epoch_us(CAST(date_trunc('week', ts) AS TIMESTAMP)) AS wk,
             |    CAST(value AS DECIMAL(28,8)) AS v
             |  FROM events WHERE user_id IS NOT NULL),
             |f AS (SELECT user_id, min(wk) AS cohort FROM ev
             |      GROUP BY user_id),
             |cells AS (
             |  SELECT cohort,
             |    (wk - cohort) // 604800000000 AS week_offset,
             |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
             |    coalesce(sum(v), CAST(0 AS DECIMAL(28,8))) AS rev
             |  FROM ev e JOIN f USING (user_id)
             |  GROUP BY 1, 2),
             |c2 AS (
             |  SELECT cohort, week_offset, n_active, rev,
             |    sum(rev) OVER (PARTITION BY cohort ORDER BY week_offset)
             |      AS cum,
             |    max(CASE WHEN week_offset = 0 THEN n_active END)
             |      OVER (PARTITION BY cohort) AS sz
             |  FROM cells)
             |SELECT strftime(make_timestamp(cohort), '%Y-%m-%d')
             |    AS cohort_week,
             |  week_offset, n_active,
             |  CAST(rev AS DOUBLE) AS revenue,
             |  CAST(cum AS DOUBLE) AS cum_revenue,
             |  CAST(cum AS DOUBLE) / CAST(sz AS DOUBLE) AS ltv
             |FROM c2 ORDER BY cohort_week, week_offset""".stripMargin)),

    Q("ml_kappa",
      "Cohen's kappa between two deterministic annotators (md5 stand-in " +
        "classifiers, annotator B forced to agree with A on 3/4 of docs " +
        "by a third hash) — the inter-annotator agreement audit label " +
        "pipelines report. Chance-corrected via the all-integer " +
        "rearrangement (N*A - B)/(N^2 - B), DECIMAL(38,0)-staged, ONE " +
        "double division; the (16x16)-bounded confusion relation is the " +
        "only thing past the scan.",
      (s, d) => {
        val a = OracleCompat.md5Label(concat(lit("a:"), col("text")))
        val noise = conv(substring(md5(concat(lit("n:"), col("text"))),
          1, 1), 16, 10).cast("long") % 4
        val b = when(noise === 0,
          OracleCompat.md5Label(concat(lit("b:"), col("text"))))
          .otherwise(a)
        graft.ops.RankEval.cohenKappa(
          Tables.documents(s, d).select(a.as("ann_a"), b.as("ann_b")),
          "ann_a", "ann_b")
      },
      Some("""WITH lab AS (
             |  SELECT
             |    (instr('0123456789abcdef',
             |      substring(md5('a:' || text), 1, 1)) - 1) % 16 AS la,
             |    CASE WHEN (instr('0123456789abcdef',
             |        substring(md5('n:' || text), 1, 1)) - 1) % 4 = 0
             |      THEN (instr('0123456789abcdef',
             |        substring(md5('b:' || text), 1, 1)) - 1) % 16
             |      ELSE (instr('0123456789abcdef',
             |        substring(md5('a:' || text), 1, 1)) - 1) % 16
             |    END AS lb
             |  FROM documents WHERE text IS NOT NULL),
             |cells AS (SELECT la, lb, count(*) AS n FROM lab
             |          GROUP BY la, lb),
             |tot AS (
             |  SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS n,
             |    CAST(coalesce(sum(CASE WHEN la = lb THEN n ELSE 0 END),
             |      0) AS BIGINT) AS n_agree
             |  FROM cells),
             |r AS (SELECT la, sum(n) AS rn FROM cells GROUP BY la),
             |c AS (SELECT lb, sum(n) AS cn FROM cells GROUP BY lb),
             |b AS (
             |  SELECT CAST(coalesce(sum(CAST(rn AS DECIMAL(38,0)) *
             |    CAST(cn AS DECIMAL(38,0))), 0) AS DECIMAL(38,0)) AS bb
             |  FROM r JOIN c ON r.la = c.lb)
             |SELECT n, n_agree,
             |  CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
             |  CAST(bb AS DOUBLE) / CAST(CAST(n AS DECIMAL(38,0)) *
             |    CAST(n AS DECIMAL(38,0)) AS DOUBLE) AS pe,
             |  CASE WHEN CAST(n AS DECIMAL(38,0)) *
             |      CAST(n AS DECIMAL(38,0)) - bb > 0 THEN
             |    CAST(CAST(n AS DECIMAL(38,0)) *
             |      CAST(n_agree AS DECIMAL(38,0)) - bb AS DOUBLE) /
             |    CAST(CAST(n AS DECIMAL(38,0)) *
             |      CAST(n AS DECIMAL(38,0)) - bb AS DOUBLE)
             |  ELSE 0e0 END AS kappa
             |FROM tot, b""".stripMargin)),

    Q("q30_unpivot",
      "Relational melt: four lineitem measures unpivot to long format " +
        "in ONE scan (Spark plans Expand — each row emits 4 tuples " +
        "map-side; the UNION-ALL restatement the oracle runs would " +
        "scan four times), then a per-metric exact-decimal rollup.",
      (s, d) => Tables.lineitem(s, d)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "val")
        .groupBy(col("metric"))
        .agg(count(col("val")).as("n"), OracleCompat.dsum(col("val"))
          .as("total"))
        .orderBy(col("metric")),
      Some("""WITH m AS (
             |  SELECT 'l_quantity' AS metric, l_quantity AS val
             |  FROM lineitem
             |  UNION ALL SELECT 'l_extendedprice', l_extendedprice
             |  FROM lineitem
             |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
             |SELECT metric, count(val) AS n,
             |  CAST(sum(CAST(val AS DECIMAL(28,8))) AS DOUBLE) AS total
             |FROM m GROUP BY metric ORDER BY metric""".stripMargin)),

    Q("ev_abtest_value",
      "A/B readout for a CONTINUOUS metric: purchase revenue per " +
        "exposed user (intent-to-treat — non-converters count at 0), " +
        "per-variant mean/variance and the Welch t statistic. Per-user " +
        "totals and both variant sums stage in exact decimals (rev^2 " +
        "squared at DECIMAL(18,8) so the (37,16) product stays under " +
        "both engines' 38-digit cap); the mean/var/t tail is a FIXED " +
        "double chain replayed literally. One user-keyed aggregate, " +
        "then a 2-cell relation.",
      (s, d) => EventOps.abTestValue(Tables.events(s, d), "user_id",
        "event_type", "view", "purchase", "value"),
      Some("""WITH uu AS (
             |  SELECT user_id,
             |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             |      AS expo,
             |    coalesce(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(value AS DECIMAL(28,8)) END),
             |      CAST(0 AS DECIMAL(28,8))) AS rev
             |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
             |e AS (SELECT user_id % 2 = 0 AS va, rev FROM uu
             |      WHERE expo = 1),
             |c AS (
             |  SELECT va, CAST(count(*) AS BIGINT) AS n, sum(rev) AS s,
             |    sum(CAST(rev AS DECIMAL(19,8)) *
             |        CAST(rev AS DECIMAL(18,8))) AS q
             |  FROM e GROUP BY va),
             |f AS (
             |  SELECT
             |    CAST(coalesce(max(CASE WHEN va THEN n END), 0)
             |      AS BIGINT) AS n_a,
             |    coalesce(max(CASE WHEN va THEN
             |      CAST(CAST(s AS VARCHAR) AS DOUBLE) END), 0e0) AS s_a,
             |    coalesce(max(CASE WHEN va THEN
             |      CAST(CAST(q AS VARCHAR) AS DOUBLE) END), 0e0) AS q_a,
             |    CAST(coalesce(max(CASE WHEN NOT va THEN n END), 0)
             |      AS BIGINT) AS n_b,
             |    coalesce(max(CASE WHEN NOT va THEN
             |      CAST(CAST(s AS VARCHAR) AS DOUBLE) END), 0e0) AS s_b,
             |    coalesce(max(CASE WHEN NOT va THEN
             |      CAST(CAST(q AS VARCHAR) AS DOUBLE) END), 0e0) AS q_b
             |  FROM c)
             |SELECT n_a, n_b,
             |  s_a / CAST(n_a AS DOUBLE) AS mean_a,
             |  s_b / CAST(n_b AS DOUBLE) AS mean_b,
             |  (q_a - s_a * s_a / CAST(n_a AS DOUBLE)) /
             |    (CAST(n_a AS DOUBLE) - 1e0) AS var_a,
             |  (q_b - s_b * s_b / CAST(n_b AS DOUBLE)) /
             |    (CAST(n_b AS DOUBLE) - 1e0) AS var_b,
             |  CASE WHEN n_a > 1 AND n_b > 1 THEN
             |    (s_a / CAST(n_a AS DOUBLE) - s_b / CAST(n_b AS DOUBLE)) /
             |    sqrt((q_a - s_a * s_a / CAST(n_a AS DOUBLE)) /
             |      (CAST(n_a AS DOUBLE) - 1e0) / CAST(n_a AS DOUBLE) +
             |      (q_b - s_b * s_b / CAST(n_b AS DOUBLE)) /
             |      (CAST(n_b AS DOUBLE) - 1e0) / CAST(n_b AS DOUBLE))
             |  ELSE 0e0 END AS t_stat
             |FROM f""".stripMargin)),

    Q("ta_vocab_overlap",
      "Pairwise vocabulary overlap between sources: per unordered " +
        "source pair the distinct-token intersection, per-source " +
        "vocabulary sizes, and Jaccard — the cross-corpus repetition " +
        "diagnostic behind mixture and dedup decisions. One (source, " +
        "token) DISTINCT is the only corpus-sized pass; the token " +
        "self-join fans out <= |sources|^2 pairs per token (sources " +
        "bounded), sizes join back broadcast.",
      (s, d) => graft.ops.TextAnalysis.vocabOverlap(
        Tables.documents(s, d), "source", "text"),
      Some("""WITH st AS (
             |  SELECT DISTINCT d.source AS s, t.tok AS tok
             |  FROM documents d,
             |       unnest(string_split_regex(trim(d.text), '\s+'))
             |         AS t(tok)
             |  WHERE t.tok <> '' AND d.source IS NOT NULL),
             |sz AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM st
             |       GROUP BY s),
             |inter AS (
             |  SELECT a.s AS slice_a, b.s AS slice_b,
             |    CAST(count(*) AS BIGINT) AS n_common
             |  FROM st a JOIN st b ON a.tok = b.tok
             |  WHERE a.s < b.s
             |  GROUP BY 1, 2)
             |SELECT slice_a, slice_b, sa.n AS n_a, sb.n AS n_b, n_common,
             |  CAST(n_common AS DOUBLE) /
             |    CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
             |FROM inter
             |JOIN sz sa ON sa.s = slice_a
             |JOIN sz sb ON sb.s = slice_b
             |ORDER BY slice_a, slice_b""".stripMargin))
  )
}
