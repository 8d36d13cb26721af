package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, LmSignals, Similarity, TextAnalysis, WebFilters}

/** The COMPLETE Gopher repetition table (Rae et al. 2021 A1.1) under the
  * DuckDB gate: top 2/3/4-gram char fractions, duplicate 5…10-gram char
  * fractions, and the duplicate-paragraph rules. The fixture text is a
  * single line, so — the ta_gopher precedent — it is first RESHAPED
  * deterministically in BOTH engines: 8-word lines ('.' every third
  * line), then a BLANK line after every second line, giving the
  * paragraph rules real structure. Every signal stays a pure scan-stage
  * expression (sorted-run folds inside the row, no explode), so at
  * 100 TB the full eleven-rule table is one codegen'd projection.
  */
object R7dQueries {

  /** 8-word lines, '.' every 3rd line, a blank line after every 2nd
    * line — deterministic paragraph structure from flat fixture text.
    */
  private def chunkParas(text: Column): Column = {
    val ws = filter(split(trim(text), "\\s+"), w => w =!= "")
    val n = size(ws)
    val lines = transform(sequence(lit(0), (ceil(n / lit(8.0)) - 1).cast("int")),
      i => concat(
        array_join(slice(ws, i * lit(8) + 1, lit(8)), " "),
        when(i % 3 === 0, lit(".")).otherwise(lit(""))))
    val nl = size(lines)
    when(n === 0, lit("")).otherwise(
      array_join(
        transform(sequence(lit(0), (ceil(nl / lit(2.0)) - 1).cast("int")),
          j => array_join(slice(lines, j * lit(2) + 1, lit(2)), "\n")),
        "\n\n"))
  }

  /** The identical reshaping in DuckDB, plus the word array and
    * normalized char count every n-gram rule divides by.
    */
  private val ParaCtes =
    s"""w0 AS (
       |  SELECT doc_id,
       |    list_filter(string_split_regex(trim(text), '\\s+'),
       |                x -> x <> '') AS ws
       |  FROM documents),
       |ln AS (
       |  SELECT doc_id, ws,
       |    list_transform(
       |      generate_series(0, CAST(ceil(len(ws) / 8.0) AS INT) - 1),
       |      i -> array_to_string(ws[i*8+1 : i*8+8], ' ') ||
       |           CASE WHEN i % 3 = 0 THEN '.' ELSE '' END) AS lines
       |  FROM w0),
       |lined AS (
       |  SELECT doc_id,
       |    CASE WHEN len(ws) = 0 THEN '' ELSE
       |      array_to_string(
       |        list_transform(
       |          generate_series(0, CAST(ceil(len(lines) / 2.0) AS INT) - 1),
       |          j -> array_to_string(lines[j*2+1 : j*2+2], chr(10))),
       |        chr(10) || chr(10)) END AS t
       |  FROM ln),
       |wl AS (
       |  SELECT doc_id, t,
       |    list_filter(string_split_regex(trim(t), '\\s+'),
       |                x -> x <> '') AS w
       |  FROM lined),
       |nc AS (
       |  SELECT doc_id,
       |    length(array_to_string(w, ' '))::BIGINT AS chars
       |  FROM wl)""".stripMargin

  /** Per-n CTEs: the n-gram relation, and either the top-gram coverage
    * (count × chars of the best gram under the count-desc, len-desc,
    * gram-asc total order) or the duplicated-gram coverage.
    */
  private def gramCte(n: Int): String =
    s"""g$n AS (
       |  SELECT doc_id, array_to_string(w[i : i+${n - 1}], ' ') AS g
       |  FROM (SELECT doc_id, w,
       |          unnest(generate_series(1, len(w) - ${n - 1})) AS i
       |        FROM wl WHERE len(w) >= $n))""".stripMargin

  private def topCte(n: Int): String =
    s"""t$n AS (
       |  SELECT doc_id, c * length(g) AS cov FROM (
       |    SELECT doc_id, g, count(*) AS c,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY count(*) DESC, length(g) DESC, g ASC) AS rn
       |    FROM g$n GROUP BY doc_id, g)
       |  WHERE rn = 1)""".stripMargin

  private def dupCte(n: Int): String =
    s"""d$n AS (
       |  SELECT doc_id, sum(c * length(g))::BIGINT AS cov FROM (
       |    SELECT doc_id, g, count(*) AS c
       |    FROM g$n GROUP BY doc_id, g HAVING count(*) >= 2)
       |  GROUP BY doc_id)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("ta_gopher_rep",
      "The complete Gopher repetition-rule table (Rae et al. 2021 A1.1 " +
        "rules the quality suite ta_gopher leaves to this query): top " +
        "2/3/4-gram character fractions (thresholds .20/.18/.16), " +
        "duplicate 5..10-gram character fractions (.15 down to .10), " +
        "duplicate-paragraph and duplicate-paragraph-char fractions " +
        "(.30/.20), and the combined keep decision. All eleven signals " +
        "are computed INSIDE their row — the nine n-gram fractions by " +
        "ONE codegen'd expression pass (GopherRepetitionFracs), no " +
        "explode: at 100 TB this is a projection on the corpus scan with " +
        "zero shuffles, where the unnest+groupBy formulation the oracle " +
        "uses would shuffle every n-gram of the corpus nine times. " +
        "Duplicate " +
        "coverage counts each occurrence's full width (documented " +
        "approximation of the paper's char marking; identical in both " +
        "engines).",
      (s, d) => {
        // Stage each expensive expression ONCE (the chunked text, the
        // nine-fraction struct, the two paragraph fracs) and derive the
        // published columns + keep decision by field reference — the
        // optimizer keeps multiply-referenced non-trivial aliases staged
        // rather than inlining them, so nothing evaluates twice (the
        // pre-round-10 formulation re-evaluated every signal inside
        // rep_keep).
        val fracs = graft.functions.GopherRepetition.allFracs(col("__t"))
        Tables.documents(s, d)
          .select(col("doc_id"), chunkParas(col("text")).as("__t"))
          .select(col("doc_id"), fracs.as("__g"),
            WebFilters.dupParagraphFrac(col("__t")).as("dup_para_frac"),
            WebFilters.dupParagraphCharFrac(col("__t"))
              .as("dup_para_char_frac"))
          .select(
            col("doc_id"),
            col("__g.top2").as("top2_frac"),
            col("__g.top3").as("top3_frac"),
            col("__g.top4").as("top4_frac"),
            col("__g.dup5").as("dup5_frac"),
            col("__g.dup6").as("dup6_frac"),
            col("__g.dup7").as("dup7_frac"),
            col("__g.dup8").as("dup8_frac"),
            col("__g.dup9").as("dup9_frac"),
            col("__g.dup10").as("dup10_frac"),
            col("dup_para_frac"), col("dup_para_char_frac"),
            (col("__g.top2") < 0.20 && col("__g.top3") < 0.18 &&
              col("__g.top4") < 0.16 && col("__g.dup5") < 0.15 &&
              col("__g.dup6") < 0.14 && col("__g.dup7") < 0.13 &&
              col("__g.dup8") < 0.12 && col("__g.dup9") < 0.11 &&
              col("__g.dup10") < 0.10 &&
              col("dup_para_frac") < 0.3 &&
              col("dup_para_char_frac") < 0.2).as("rep_keep")
          ).orderBy("doc_id")
      },
      Some {
        val grams = (2 to 10).map(gramCte).mkString(",\n")
        val tops = (2 to 4).map(topCte).mkString(",\n")
        val dups = (5 to 10).map(dupCte).mkString(",\n")
        val topCols = (2 to 4).map(n =>
          s"  coalesce(CASE WHEN nc.chars > 0 THEN t$n.cov::DOUBLE / nc.chars END, 0.0) AS top${n}_frac").mkString(",\n")
        // coalesce the coverage BEFORE least(): DuckDB's least() skips
        // NULL arguments, so least(1.0, NULL/chars) is 1.0, not NULL —
        // a doc with no duplicated n-grams would read as fully duplicated
        val dupCols = (5 to 10).map(n =>
          s"  CASE WHEN nc.chars > 0 THEN least(1.0::DOUBLE, coalesce(d$n.cov, 0)::DOUBLE / nc.chars) ELSE 0.0::DOUBLE END AS dup${n}_frac").mkString(",\n")
        val joins = (2 to 4).map(n => s"LEFT JOIN t$n ON t$n.doc_id = wl.doc_id")
          .mkString(" ") + " " +
          (5 to 10).map(n => s"LEFT JOIN d$n ON d$n.doc_id = wl.doc_id")
            .mkString(" ")
        s"""WITH $ParaCtes,
           |$grams,
           |$tops,
           |$dups,
           |paras AS (
           |  SELECT doc_id,
           |    list_filter(
           |      list_transform(string_split(t, chr(10) || chr(10)),
           |                     p -> trim(p)),
           |      p -> p <> '') AS ps
           |  FROM lined),
           |pf AS (
           |  SELECT doc_id,
           |    CASE WHEN len(ps) = 0 THEN 0.0::DOUBLE ELSE
           |      1.0 - len(list_distinct(ps))::DOUBLE / len(ps) END
           |      AS dup_para_frac,
           |    CASE WHEN len(ps) = 0 OR
           |        list_aggregate(list_transform(ps, p -> length(p)),
           |                       'sum') = 0
           |      THEN 0.0::DOUBLE ELSE
           |      CAST(list_aggregate(list_transform(ps, p -> length(p)),
           |             'sum') -
           |           list_aggregate(list_transform(list_distinct(ps),
           |             p -> length(p)), 'sum') AS DOUBLE) /
           |      list_aggregate(list_transform(ps, p -> length(p)), 'sum')
           |      END AS dup_para_char_frac
           |  FROM paras)
           |SELECT wl.doc_id,
           |$topCols,
           |$dupCols,
           |  pf.dup_para_frac, pf.dup_para_char_frac,
           |  (coalesce(CASE WHEN nc.chars > 0 THEN t2.cov::DOUBLE / nc.chars END, 0.0) < 0.20 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN t3.cov::DOUBLE / nc.chars END, 0.0) < 0.18 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN t4.cov::DOUBLE / nc.chars END, 0.0) < 0.16 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN coalesce(d5.cov, 0)::DOUBLE / nc.chars END, 0.0) < 0.15 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN coalesce(d6.cov, 0)::DOUBLE / nc.chars END, 0.0) < 0.14 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN coalesce(d7.cov, 0)::DOUBLE / nc.chars END, 0.0) < 0.13 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN coalesce(d8.cov, 0)::DOUBLE / nc.chars END, 0.0) < 0.12 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN coalesce(d9.cov, 0)::DOUBLE / nc.chars END, 0.0) < 0.11 AND
           |   coalesce(CASE WHEN nc.chars > 0 THEN coalesce(d10.cov, 0)::DOUBLE / nc.chars END, 0.0) < 0.10 AND
           |   pf.dup_para_frac < 0.3 AND pf.dup_para_char_frac < 0.2)
           |    AS rep_keep
           |FROM wl JOIN nc ON nc.doc_id = wl.doc_id
           |JOIN pf ON pf.doc_id = wl.doc_id
           |$joins
           |ORDER BY wl.doc_id""".stripMargin
      }),

    Q("doc_ccnet_buckets",
      "CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020 " +
        "S4.3) — the corpus partition most pretraining recipes consume. " +
        "Tercile thresholds are fit on a BOUNDED deterministic sample " +
        "(the 300 docs with the smallest md5(id): orderBy(md5).limit = " +
        "TakeOrderedAndProject, k rows to the driver at ANY corpus " +
        "size, the way CCNet fits its percentiles on a per-language " +
        "sample), then ONE narrow projection assigns buckets by literal " +
        "cut values — no global sort anywhere. Scores are the ta_lmscore " +
        "bigram-LM means (head = fluent); a doc scoring exactly a cut " +
        "lands in the better bucket.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        LmSignals.ccnetBuckets(docs, "doc_id", "text",
            docs.filter(col("lang") === "en"), "text",
            minCount = 2L, sampleK = 300)
          .orderBy("doc_id")
      },
      Some(
        """WITH w AS (
          |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS ws
          |  FROM documents),
          |refuni AS (
          |  SELECT word, count(*) AS c1 FROM (
          |    SELECT unnest(ws) AS word FROM w WHERE lang = 'en')
          |  WHERE word <> '' GROUP BY word),
          |vocab AS (SELECT count(*) AS v FROM refuni),
          |refbi AS (
          |  SELECT big, count(*) AS c2 FROM (
          |    SELECT ws[i] || ' ' || ws[i+1] AS big FROM (
          |      SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
          |      FROM w WHERE lang = 'en'))
          |  GROUP BY big HAVING count(*) >= 2),
          |docbi AS (
          |  SELECT doc_id, ws[i] AS prefix, ws[i] || ' ' || ws[i+1] AS big
          |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws) - 1)) AS i
          |        FROM w)),
          |scored AS (
          |  SELECT doc_id, count(*) AS n_bigrams,
          |    cast(sum(cast((coalesce(c2, 0) + 1)::DOUBLE /
          |      (coalesce(c1, 0) + v)::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)
          |      / count(*) AS lm_score
          |  FROM docbi
          |  LEFT JOIN refbi USING (big)
          |  LEFT JOIN refuni ON docbi.prefix = refuni.word
          |  CROSS JOIN vocab
          |  GROUP BY doc_id),
          |allscored AS (
          |  SELECT d.doc_id, coalesce(n_bigrams, 0) AS n_bigrams,
          |         coalesce(lm_score, 0.0::DOUBLE) AS lm_score
          |  FROM documents d LEFT JOIN scored USING (doc_id)),
          |samp AS (
          |  SELECT lm_score FROM allscored
          |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 300),
          |ranked AS (
          |  SELECT lm_score, row_number() OVER (ORDER BY lm_score DESC) AS rn,
          |         count(*) OVER () AS m
          |  FROM samp),
          |thr AS (
          |  SELECT max(CASE WHEN rn = (m + 2) // 3 THEN lm_score END) AS t_hi,
          |         max(CASE WHEN rn = (2 * m + 2) // 3 THEN lm_score END) AS t_lo
          |  FROM ranked)
          |SELECT a.doc_id, a.n_bigrams, a.lm_score,
          |  CASE WHEN a.lm_score >= t_hi THEN 'head'
          |       WHEN a.lm_score >= t_lo THEN 'middle'
          |       ELSE 'tail' END AS bucket
          |FROM allscored a CROSS JOIN thr
          |ORDER BY a.doc_id""".stripMargin)),

    Q("sim_ivf_probe_batch",
      "Batch serving from the at-rest IVF layout — the shape a training " +
        "job actually uses (one index scan per anchor BATCH, not a " +
        "probe per anchor): per-anchor nprobe shortlists against the " +
        "PERSISTED centroids on the tiny clusters x anchors relation, " +
        "the scan pruned to the UNION of probed cluster partitions, " +
        "each row scored only against the anchors probing its cluster " +
        "(broadcast shortlist + TopKByKey, <=k rows per task-anchor " +
        "cross the exchange). Oracle replays the unrolled Lloyd chain, " +
        "all four shortlists and the per-anchor rankings.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val path = sys.props.getOrElse("java.io.tmpdir", "/tmp") +
          "/graft_ivf_pbatch_" + d.replaceAll("[^A-Za-z0-9.]", "_")
        Similarity.ivfWriteLayout(emb, "vec_id", "embedding", path,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.ivfProbeLayoutBatch(s, path, Seq(0L, 1L, 2L, 3L),
            k = 10, nprobe = 2)
          .orderBy("anchor_id", "rank")
      },
      Some {
        val aFinal = s"a${R5Queries.ITERS + 1}"
        def dotSql(a: String, b: String): String =
          s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings")},
           |anchors AS (
           |  SELECT vec_id AS anchor_id, embedding AS ae FROM embeddings
           |  WHERE vec_id IN (0, 1, 2, 3)),
           |na AS (
           |  SELECT anchor_id, greatest(sqrt(${dotSql("ae", "ae")}), 1e-30) AS nrm
           |  FROM anchors, generate_series(1, 64) g(i) GROUP BY anchor_id),
           |ne AS (
           |  SELECT vec_id,
           |    greatest(sqrt(${dotSql("embedding", "embedding")}), 1e-30) AS nrm
           |  FROM embeddings, generate_series(1, 64) g(i) GROUP BY vec_id),
           |adots AS (
           |  SELECT a.anchor_id, e.vec_id, ${dotSql("e.embedding", "a.ae")} AS dot
           |  FROM embeddings e CROSS JOIN anchors a,
           |       generate_series(1, 64) g(i)
           |  GROUP BY a.anchor_id, e.vec_id),
           |cdot AS (
           |  SELECT a.anchor_id, c.cluster,
           |    cast(sum(cast(c.c * a.ae[c.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE) AS dot,
           |    sqrt(cast(sum(cast(c.c * c.c AS DECIMAL(38,14))) AS DOUBLE)) AS cn
           |  FROM c${R5Queries.ITERS} c CROSS JOIN anchors a
           |  GROUP BY a.anchor_id, c.cluster),
           |short AS (
           |  SELECT anchor_id, cluster FROM cdot JOIN na USING (anchor_id)
           |  QUALIFY row_number() OVER (PARTITION BY anchor_id
           |    ORDER BY dot / (cn * na.nrm) DESC, cluster) <= 2)
           |SELECT anchor_id, rank, vec_id, cos_sim FROM (
           |  SELECT d.anchor_id, d.vec_id,
           |    d.dot / (ne.nrm * na.nrm) AS cos_sim,
           |    row_number() OVER (PARTITION BY d.anchor_id
           |      ORDER BY d.dot / (ne.nrm * na.nrm) DESC, d.vec_id) AS rank
           |  FROM adots d JOIN ne USING (vec_id) JOIN na USING (anchor_id)
           |       JOIN $aFinal ass USING (vec_id)
           |       JOIN short s ON s.anchor_id = d.anchor_id
           |                  AND s.cluster = ass.cluster)
           |WHERE rank <= 10
           |ORDER BY anchor_id, rank""".stripMargin
      }),

    Q("stream_ivf",
      "Structured Streaming maintains the at-rest IVF layout: the base " +
        "slice (vec_id % 4 <> 1) bootstraps the quantizer and batch 0; " +
        "the embedding file stream then appends the held-out quarter " +
        "via foreachBatch + ivfAppendLayout, assigned with the " +
        "PERSISTED centroids under the micro-batch id. Streaming " +
        "replays a failed micro-batch under the SAME id and the append " +
        "retry rewrites exactly its own batch subtree — exactly-once " +
        "index maintenance, the stream_index contract on the vector " +
        "side. Serving the streamed layout == one assignment pass over " +
        "the union, so the sim_ivf_append oracle applies verbatim.",
      (s, d) => {
        val path = graft.streaming.EventStream.runIvfIngestStream(
          s, d,
          sys.props.getOrElse("java.io.tmpdir", "/tmp") +
            "/graft_stream_ivf_" + d.replaceAll("[^A-Za-z0-9.]", "_"),
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        val q = Similarity.vectorOf(Tables.embeddings(s, d),
          "vec_id", "embedding", 0L)
        Similarity.ivfProbeLayout(s, path, q, k = 10, nprobe = 2)
      },
      Some(
        s"""WITH tr AS (
           |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 <> 1),
           |${R5Queries.kmeansCtesOn("tr")},
           |${R5Queries.ivfProbeCtes(nprobe = 2)}
           |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne USING (vec_id)
           |     JOIN a${R5Queries.ITERS + 1} ass USING (vec_id), nq
           |WHERE ass.cluster IN (SELECT cluster FROM short)
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin)),

    Q("dedup_survivor",
      "Survivor-selection POLICY over near-dup clusters: when a MinHash " +
        "cluster collapses, keep the HIGHEST-QUALITY copy (ties to the " +
        "lowest id) instead of the min-id default — the RefinedWeb/" +
        "FineWeb keep-best convention. Same candidate pairs and " +
        "connected components as dedup_cluster; the ranking window " +
        "partitions by CLUSTER (width bounded by cluster size, never " +
        "the corpus) and the quality join is id-keyed. Oracle: the " +
        "recursive-CTE components + the ta_quality score + row_number.",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
          Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
        Dedup.survivorsByScore(cc, docs, "doc_id",
            TextAnalysis.qualityScore(col("text")))
          .orderBy("doc_id")
      },
      Some(
        s"""WITH RECURSIVE ${ExtQueries.minhashPairCtes},
           |edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION SELECT id_b, id_a FROM pairs),
           |reach AS (
           |  SELECT src AS id, src AS lab FROM edges
           |  UNION
           |  SELECT e.dst AS id, r.lab FROM reach r JOIN edges e ON e.src = r.id),
           |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id),
           |sc AS (
           |  SELECT cc.id, cc.cluster,
           |    ${R7Queries.qualitySql("d.text")} AS score
           |  FROM cc JOIN documents d ON d.doc_id = cc.id)
           |SELECT id AS doc_id, cluster, score,
           |  row_number() OVER (PARTITION BY cluster
           |    ORDER BY score DESC, id) = 1 AS is_survivor
           |FROM sc ORDER BY doc_id""".stripMargin)),

    Q("doc_soft_sample",
      "Quality-weighted SOFT sampling (the FineWeb/DCLM soft filter): " +
        "every doc keeps with probability minRate + (maxRate-minRate) x " +
        "clamp(quality, 0, 1) — low-quality text is DOWNSAMPLED rather " +
        "than erased, high-quality capped at maxRate. The coin is the " +
        "deterministic md5 hash bucket (doc_sample's), the rate pure " +
        "+/x arithmetic on the score (no pow: libm exponent drift could " +
        "flip a boundary decision) — the whole decision is a pushed-" +
        "down scan filter at any corpus size.",
      (s, d) => Curation.qualityWeightedSample(Tables.documents(s, d),
          "doc_id", TextAnalysis.qualityScore(col("text")),
          minRate = 0.1, maxRate = 0.9)
        .select("doc_id", "lang", "rate")
        .orderBy("doc_id"),
      Some(
        s"""WITH r AS (
           |  SELECT doc_id, lang,
           |    0.1::DOUBLE + (0.9::DOUBLE - 0.1::DOUBLE) *
           |      least(greatest(${R7Queries.qualitySql("text")},
           |                     0.0::DOUBLE), 1.0::DOUBLE) AS rate
           |  FROM documents)
           |SELECT doc_id, lang, rate FROM r
           |WHERE ('0x' || substring(md5(doc_id::VARCHAR), 1, 4))::BIGINT
           |      < rate * 65536
           |ORDER BY doc_id""".stripMargin)),

    Q("sim_ivf_filtered",
      "Metadata-FILTERED ANN (every production vector store's WHERE " +
        "clause): top-k among only the rows passing a predicate " +
        "(label = 3), probed through the SAME trained quantizer as " +
        "sim_ivf_trained — one index serves every predicate, and the " +
        "filter PRE-restricts the candidate set (never post-truncates " +
        "a ranked list). The predicate is an ordinary Catalyst filter " +
        "pushed below the shortlist semi-join; on the at-rest layout " +
        "it lands in the SAME scan as the partition pruning (nprobe " +
        "dirs opened, label as a parquet PushedFilter inside them — " +
        "spec-pinned). Oracle: sim_ivf_trained's unrolled-Lloyd CTE " +
        "chain plus the label restriction.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.ivfTrainedTopKFiltered(emb, "vec_id", "embedding",
          col("label") === 3, q, k = 10, nprobe = 2,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
      },
      Some(
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings")},
           |${R5Queries.ivfProbeCtes(nprobe = 2)}
           |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne USING (vec_id)
           |     JOIN a${R5Queries.ITERS + 1} ass USING (vec_id)
           |     JOIN embeddings e ON e.vec_id = d.vec_id, nq
           |WHERE ass.cluster IN (SELECT cluster FROM short)
           |  AND e.label = 3
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin)),

    Q("sim_recall_filtered",
      "Recall@10 gate for the FILTERED probe: exact brute force over " +
        "the pre-filtered corpus (label = 3) vs the filtered " +
        "nprobe = 2 probe, intersected. This is the trade-off the " +
        "filtered-ANN doc names made measurable: a selective predicate " +
        "thins the probed clusters, and this number tells callers " +
        "whether to raise nprobe. The oracle replays the unrolled-" +
        "Lloyd chain, both filtered rankings, and the intersection — " +
        "the same shared CTE helpers as sim_ivf_filtered, so the gate " +
        "and the gated query can never drift.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        val exact = Similarity.bruteForceTopK(
          emb.filter(col("label") === 3), "vec_id", "embedding", q, 10)
        val approx = Similarity.ivfTrainedTopKFiltered(emb, "vec_id",
          "embedding", col("label") === 3, q, k = 10, nprobe = 2,
          kClusters = R5Queries.K, iters = R5Queries.ITERS)
        Similarity.recallAtK(exact, approx, "vec_id", 10)
      },
      Some(
        s"""WITH ${R5Queries.kmeansCtesOn("embeddings")},
           |${R5Queries.ivfProbeCtes(nprobe = 2)},
           |exact AS (
           |  SELECT d.vec_id
           |  FROM dots d JOIN ne USING (vec_id)
           |       JOIN embeddings e ON e.vec_id = d.vec_id, nq
           |  WHERE e.label = 3
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10),
           |approx AS (
           |  SELECT d.vec_id
           |  FROM dots d JOIN ne USING (vec_id)
           |       JOIN a${R5Queries.ITERS + 1} ass USING (vec_id)
           |       JOIN embeddings e ON e.vec_id = d.vec_id, nq
           |  WHERE ass.cluster IN (SELECT cluster FROM short)
           |    AND e.label = 3
           |  ORDER BY d.dot / (ne.nrm * nq.nrm) DESC, d.vec_id LIMIT 10)
           |SELECT CAST(10 AS BIGINT) AS k,
           |  count(*) AS hits,
           |  CASE WHEN (SELECT count(*) FROM exact) > 0
           |    THEN CAST(count(*) AS DOUBLE) /
           |         (SELECT count(*) FROM exact)
           |    ELSE 0.0 END AS recall
           |FROM approx JOIN exact USING (vec_id)""".stripMargin))
  )
}
