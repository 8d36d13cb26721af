package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.{Curation, Dedup, Similarity, TextAnalysis}

/** Round-5 session queries: the trained k-means coarse quantizer and the
  * IVF probe that runs on it (VERDICT r3 ask #2 — previously `sim_ivf`
  * borrowed the fixture `label` column as its cluster id; these close the
  * "trained partitioner" half of the 100 TB similarity-search claim).
  *
  * Oracle strategy: Lloyd's has a FIXED iteration count and deterministic
  * seeds/tie-breaks, so the whole algorithm unrolls into a WITH chain —
  * seed centroids → (distance → argmin → mean) per iteration → final
  * assignment — with every sum decimal-exact, making the cluster ids (not
  * just aggregate shapes) bit-comparable across engines.
  */
object R5Queries {

  private[queries] val K = 4      // clusters
  private[queries] val ITERS = 2  // Lloyd updates
  private[queries] val DIMS = 64

  /** DuckDB restatement of Dedup.dotExact over index i (1-based). */
  private[queries] def dotSql(a: String, b: String): String =
    s"cast(sum(cast($a[i]::DOUBLE * $b[i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)"

  /** The unrolled Lloyd chain: seeds (min-id vectors) → c0 (per-dim
    * centroid rows) → for each iteration n: d{n} (decimal-exact squared
    * L2 per vector×cluster), a{n} (argmin, ties to lowest cluster),
    * u{n} (decimal-exact per-dim means), c{n} (carry previous centroid
    * forward for clusters that lost all members — mirrors
    * [[Similarity.kmeansCentroids]]). Exposes c$ITERS (final centroids)
    * and the final assignment a${ITERS+1}.
    *
    * `trainRel` is the relation Lloyd's trains on — seeds, per-iteration
    * assignments and means all read it; the FINAL assignment pass runs
    * over `assignRel`, defaulting to the full `embeddings` table (the
    * [[Similarity.kmeansAssign]] `train=` contract: train on a sample,
    * assign the corpus). Callers training on a SLICED sub-relation
    * (e.g. a 16-dim subspace) must pass `assignRel` explicitly — the
    * default's 64-dim rows against sliced centroids would silently
    * compute prefix distances (list indexing past a short list reads
    * NULL, no SQL error) if the final-assignment CTE were referenced.
    * That contract is ENFORCED, not just documented: a sliced chain
    * (dims ≠ $DIMS) refuses the `embeddings` default at construction
    * time — sliced callers must name their assignment relation.
    */
  private[queries] def kmeansCtesOn(trainRel: String, k: Int = K,
                                    prefix: String = "", iters: Int = ITERS,
                                    assignRel: String = "",
                                    dims: Int = DIMS): String = {
    require(assignRel.nonEmpty || dims == DIMS,
      s"kmeansCtesOn(dims=$dims): a sliced chain cannot default its " +
        s"final-assignment relation to the $DIMS-dim `embeddings` table " +
        "(prefix-distance hazard) — pass assignRel explicitly")
    val assignRelResolved = if (assignRel.nonEmpty) assignRel else "embeddings"
    val seed =
      s"""${prefix}seeds AS (
         |  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cluster,
         |         embedding
         |  FROM (SELECT vec_id, embedding FROM $trainRel ORDER BY vec_id LIMIT $k)),
         |${prefix}c0 AS (
         |  SELECT cluster, i, embedding[i]::DOUBLE AS c
         |  FROM ${prefix}seeds, generate_series(1, $dims) g(i))""".stripMargin
    def step(n: Int, withUpdate: Boolean): String = {
      val prev = s"${prefix}c${n - 1}"
      // training iterations assign the training relation; the final
      // (no-update) pass assigns the full corpus
      val rel = if (withUpdate) trainRel else assignRelResolved
      val dist =
        s"""${prefix}d$n AS (
           |  SELECT e.vec_id, c.cluster,
           |    cast(sum(cast((e.embedding[c.i]::DOUBLE - c.c) * (e.embedding[c.i]::DOUBLE - c.c)
           |         AS DECIMAL(38,14))) AS DOUBLE) AS d
           |  FROM $rel e, $prev c
           |  GROUP BY e.vec_id, c.cluster),
           |${prefix}a$n AS (
           |  SELECT vec_id, cluster FROM ${prefix}d$n
           |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cluster) = 1)""".stripMargin
      if (!withUpdate) dist
      else dist + "," + System.lineSeparator() +
        s"""${prefix}u$n AS (
           |  SELECT a.cluster, g.i,
           |    cast(sum(cast(e.embedding[g.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE)
           |      / count(*) AS c
           |  FROM $trainRel e JOIN ${prefix}a$n a USING (vec_id),
           |       generate_series(1, $dims) g(i)
           |  GROUP BY a.cluster, g.i),
           |${prefix}c$n AS (
           |  SELECT p.cluster, p.i, coalesce(u.c, p.c) AS c
           |  FROM $prev p LEFT JOIN ${prefix}u$n u ON u.cluster = p.cluster AND u.i = p.i)""".stripMargin
    }
    (seed +: (1 to iters + 1).map(n => step(n, withUpdate = n <= iters)))
      .mkString("," + System.lineSeparator())
  }

  private val kmeansCtes: String = kmeansCtesOn("embeddings")

  /** The IVF probe as CTEs over the trained chain (expects the
    * [[kmeansCtesOn]] CTEs in scope): query vector + norm, centroid
    * cosines against the final iteration's centroids, the nprobe
    * shortlist, per-vector norms and query dots. Shared by
    * sim_ivf_trained's oracle and R6b's sim_recall so the probe math can
    * never drift between the two restatements.
    */
  private[queries] def ivfProbeCtes(nprobe: Int): String =
    s"""q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |nq AS (
       |  SELECT sqrt(${dotSql("qe", "qe")}) AS nrm
       |  FROM q, generate_series(1, $DIMS) g(i)),
       |cdot AS (
       |  SELECT c.cluster,
       |    cast(sum(cast(c.c * q.qe[c.i]::DOUBLE AS DECIMAL(38,14))) AS DOUBLE) AS dot,
       |    sqrt(cast(sum(cast(c.c * c.c AS DECIMAL(38,14))) AS DOUBLE)) AS cn
       |  FROM c$ITERS c, q GROUP BY c.cluster),
       |short AS (
       |  SELECT cluster FROM cdot, nq
       |  ORDER BY dot / (cn * nq.nrm) DESC, cluster LIMIT $nprobe),
       |ne AS (
       |  SELECT vec_id, sqrt(${dotSql("embedding", "embedding")}) AS nrm
       |  FROM embeddings, generate_series(1, $DIMS) g(i) GROUP BY vec_id),
       |dots AS (
       |  SELECT e.vec_id, ${dotSql("e.embedding", "q.qe")} AS dot
       |  FROM embeddings e, q, generate_series(1, $DIMS) g(i)
       |  GROUP BY e.vec_id)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("sim_kmeans",
      "Trained k-means coarse quantizer (Lloyd's as DataFrame ops): " +
        s"min-id seeds, $ITERS fixed iterations, decimal-exact distances " +
        "and means, argmin ties to the lowest cluster, empty clusters " +
        "carry forward. Each iteration = one narrow assignment map " +
        "(centroids ride as literals) + one k·dims aggregate; the oracle " +
        "replays every iteration unrolled in SQL, so the cluster ids " +
        "themselves hash-match.",
      (s, d) => Similarity.kmeansAssign(Tables.embeddings(s, d),
          "vec_id", "embedding", K, ITERS, outCol = "cluster")
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id"),
      Some(
        s"""WITH $kmeansCtes
           |SELECT vec_id, cluster FROM a${ITERS + 1} ORDER BY vec_id""".stripMargin)),

    Q("sim_ivf_trained",
      "IVF ANN over the TRAINED quantizer: rank the k-means centroids by " +
        "cosine to the query, probe the top-nprobe clusters via a " +
        "broadcast semi-join on the trained assignment — at 100 TB the " +
        "assignment is a write-time partition column and this probe " +
        "prunes partitions at the scan.",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val q = Similarity.vectorOf(emb, "vec_id", "embedding", 0L)
        Similarity.ivfTrainedTopK(emb, "vec_id", "embedding", q,
          k = 10, nprobe = 2, kClusters = K, iters = ITERS)
      },
      Some(
        s"""WITH $kmeansCtes,
           |${ivfProbeCtes(nprobe = 2)}
           |SELECT d.vec_id, d.dot / (ne.nrm * nq.nrm) AS cos_sim
           |FROM dots d JOIN ne USING (vec_id)
           |     JOIN a${ITERS + 1} ass USING (vec_id), nq
           |WHERE ass.cluster IN (SELECT cluster FROM short)
           |ORDER BY cos_sim DESC, d.vec_id
           |LIMIT 10""".stripMargin)),

    Q("dedup_embedding_trained",
      "Embedding near-dup pairs blocked by the TRAINED k-means cluster " +
        "instead of the fixture label — the blocker a real corpus uses " +
        "(there is no label column at 100 TB). Only intra-cluster pairs " +
        "are scored; the oracle replays the full Lloyd chain and then " +
        "the blocked pairwise cosine.",
      (s, d) => Dedup.embeddingNearDups(
          Similarity.kmeansAssign(Tables.embeddings(s, d),
            "vec_id", "embedding", K, ITERS, outCol = "kb"),
          "vec_id", "embedding", "kb", threshold = 0.4)
        .orderBy("id_a", "id_b"),
      Some(
        s"""WITH $kmeansCtes,
           |nrm AS (
           |  SELECT e.vec_id, a.cluster AS blk, e.embedding,
           |         sqrt(${dotSql("e.embedding", "e.embedding")}) AS nrm
           |  FROM embeddings e JOIN a${ITERS + 1} a USING (vec_id),
           |       generate_series(1, $DIMS) g(i)
           |  GROUP BY e.vec_id, a.cluster, e.embedding),
           |pairs AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |         a.embedding AS ea, b.embedding AS eb, a.nrm AS na, b.nrm AS nb
           |  FROM nrm a JOIN nrm b ON a.blk = b.blk AND a.vec_id < b.vec_id),
           |dots AS (
           |  SELECT id_a, id_b, ${dotSql("ea", "eb")} AS dot, na, nb
           |  FROM pairs, generate_series(1, $DIMS) g(i)
           |  GROUP BY id_a, id_b, na, nb)
           |SELECT id_a, id_b, dot / (na * nb) AS cos_sim
           |FROM dots
           |WHERE dot / (na * nb) >= 0.4
           |ORDER BY id_a, id_b""".stripMargin)),

    Q("ta_repetition",
      "Gopher-style repetition quality signals: duplicate-word fraction " +
        "and most-frequent-adjacent-bigram fraction, both computed INSIDE " +
        "each row (pure expressions over the scan — no explode/shuffle to " +
        "derive a per-row statistic). The oracle recomputes both via " +
        "unnest + per-doc aggregation and must land on the identical " +
        "doubles.",
      (s, d) => Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.dupWordFrac(col("text")).as("dup_word_frac"),
          TextAnalysis.topBigramFrac(col("text")).as("top_bigram_frac"))
        .orderBy("doc_id"),
      Some(
        """WITH wl AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          |  FROM documents WHERE trim(text) <> ''),
          |st AS (SELECT doc_id, len(w) AS n, len(list_distinct(w)) AS nd FROM wl),
          |bg0 AS (
          |  SELECT doc_id, w, unnest(generate_series(1, len(w) - 1)) AS i
          |  FROM wl WHERE len(w) >= 2),
          |bg AS (SELECT doc_id, w[i] || ' ' || w[i+1] AS b FROM bg0),
          |bgm AS (
          |  SELECT doc_id, max(c) AS mc FROM (
          |    SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b)
          |  GROUP BY doc_id)
          |SELECT d.doc_id,
          |  coalesce(CAST(1 AS DOUBLE) - s.nd::DOUBLE / s.n,
          |           CAST(0 AS DOUBLE)) AS dup_word_frac,
          |  coalesce(CASE WHEN s.n >= 2 THEN m.mc::DOUBLE * 2 / s.n END,
          |           CAST(0 AS DOUBLE)) AS top_bigram_frac
          |FROM documents d
          |LEFT JOIN st s USING (doc_id) LEFT JOIN bgm m USING (doc_id)
          |ORDER BY d.doc_id""".stripMargin)),

    Q("ta_chunk",
      "Overlapping token-window chunking (32-token windows, stride 24 — " +
        "the RAG/pretraining ingest chunker): windows built inside the " +
        "scan projection as one array per doc, exploded only at the " +
        "output; the final window pins to the document end so no suffix " +
        "is ever dropped. Oracle rebuilds every window with " +
        "list_slice + row_number.",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(Curation.chunkTokens(col("text"), size = 32, stride = 24))
            .as(Seq("p", "chunk_text")))
        .select(col("doc_id"), (col("p") + 1).cast("long").as("chunk_id"),
          col("chunk_text"))
        .orderBy("doc_id", "chunk_id"),
      Some(
        """WITH wl AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
          |  FROM documents WHERE trim(text) <> ''),
          |starts AS (
          |  SELECT doc_id, w,
          |    unnest(list_sort(list_distinct(list_append(
          |      generate_series(1, greatest(len(w) - 31, 1), 24),
          |      greatest(len(w) - 31, 1))))) AS s
          |  FROM wl)
          |SELECT doc_id,
          |  row_number() OVER (PARTITION BY doc_id ORDER BY s) AS chunk_id,
          |  array_to_string(list_slice(w, s, s + 31), ' ') AS chunk_text
          |FROM starts
          |ORDER BY doc_id, chunk_id""".stripMargin)),

    Q("ta_linededup",
      "Cross-document duplicated-line removal (RefinedWeb boilerplate " +
        "filter): the fixture text is first broken into 3-word lines " +
        "(the fixtures are single-line), then every line appearing in " +
        "≥3 distinct docs is dropped and survivors re-join in original " +
        "order. Shuffles group on the line's md5 fingerprint (bounded " +
        "width), the boilerplate dictionary anti-join co-partitions on " +
        "the same key, and order restores from the posexplode index — " +
        "no global sort anywhere.",
      (s, d) => Dedup.dedupLines(
          Tables.documents(s, d).withColumn("text",
            regexp_replace(col("text"), "(\\S+ \\S+ \\S+) ", "$1\n")),
          "doc_id", "text", minDocs = 3)
        .orderBy("doc_id"),
      Some(
        """WITH src AS (
          |  SELECT doc_id,
          |         regexp_replace(text, '(\S+ \S+ \S+) ', '\1' || chr(10), 'g') AS t
          |  FROM documents),
          |la AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM src),
          |lines AS (
          |  SELECT doc_id, unnest(ls) AS line,
          |         unnest(generate_series(1, len(ls))) AS pos
          |  FROM la),
          |dup AS (
          |  SELECT md5(line) AS h FROM lines WHERE len(line) >= 1
          |  GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
          |kept AS (SELECT * FROM lines WHERE md5(line) NOT IN (SELECT h FROM dup))
          |SELECT s.doc_id,
          |  coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS clean_text,
          |  CAST(len(string_split(s.t, chr(10))) - count(k.line) AS BIGINT)
          |    AS n_removed
          |FROM src s LEFT JOIN kept k USING (doc_id)
          |GROUP BY s.doc_id, s.t
          |ORDER BY s.doc_id""".stripMargin)),

    Q("doc_mixture",
      "Temperature-weighted source mixture (the training-mix sampler): " +
        "source i gets probability ∝ n_i^0.5, realized as a per-source " +
        "hash-threshold keep rate min(1, targetFrac·N·p_i/n_i). One tiny " +
        "count shuffle + a broadcast rate dim; the corpus side is never " +
        "shuffled and every row decision is md5-deterministic. Weights " +
        "sum through DECIMAL(38,14) so the total is order-independent; " +
        "the rate itself is fixed-order IEEE double ops, so the oracle's " +
        "rates are bit-identical.",
      (s, d) => Curation.temperatureMixture(Tables.documents(s, d),
          "source", "doc_id", alpha = 0.5, targetFrac = 0.25)
        .select("doc_id", "source", "lang")
        .orderBy("doc_id"),
      Some(
        """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
          |t AS (SELECT cast(sum(n) AS DOUBLE) AS nn,
          |             cast(sum(cast(sqrt(cast(n AS DOUBLE)) AS DECIMAL(38,14)))
          |                  AS DOUBLE) AS wsum
          |      FROM c),
          |r AS (SELECT c.source,
          |             least(CAST(1 AS DOUBLE),
          |                   0.25 * t.nn * sqrt(cast(c.n AS DOUBLE)) / t.wsum
          |                     / cast(c.n AS DOUBLE)) AS rate
          |      FROM c, t)
          |SELECT d.doc_id, d.source, d.lang
          |FROM documents d JOIN r USING (source)
          |WHERE ('0x' || substring(md5(d.doc_id::VARCHAR), 1, 4))::BIGINT
          |  < r.rate * 65536
          |ORDER BY d.doc_id""".stripMargin)),

    Q("ta_html",
      "C4-style markup stripping: script/style blocks dropped first " +
        "(stray `<` comparisons inside would break a naive tag regex), " +
        "tags stripped, entities decoded (&amp; last — double-decode " +
        "guard), whitespace collapsed — one RE2-safe projection over the " +
        "scan. The query wraps the fixture text in real markup so the " +
        "oracle exercises every pass and must recover text + ' & more'.",
      (s, d) => {
        val wrapped = concat(
          lit("<html><body class=\"x\"><p id='t'>"), col("text"),
          lit(" &amp; more</p><script>if (1 < 2) alert(\"hi\");</script>" +
            "<style>p { color: red; }</style></body></html>"))
        Tables.documents(s, d)
          .select(col("doc_id"), Curation.stripMarkup(wrapped).as("clean_text"))
          .orderBy("doc_id")
      },
      Some(
        """SELECT doc_id, trim(regexp_replace(
          |  replace(replace(replace(replace(replace(replace(
          |    regexp_replace(
          |      regexp_replace(
          |        regexp_replace(
          |          '<html><body class="x"><p id=''t''>' || text ||
          |          ' &amp; more</p><script>if (1 < 2) alert("hi");</script>' ||
          |          '<style>p { color: red; }</style></body></html>',
          |          '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
          |        '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
          |      '(?s)<[^>]+>', ' ', 'g'),
          |    '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'),
          |    '&quot;', '"'), '&#39;', ''''), '&amp;', '&'),
          |  '\s+', ' ', 'g')) AS clean_text
          |FROM documents
          |ORDER BY doc_id""".stripMargin))
  )
}
