package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Similarity

/** Round-12: the sampled-moments PCA gate — the 100 TB variant of
  * sim_pca (moments on a deterministic sample instead of the corpus,
  * mirroring the k-means train/assign split), hash-gated against a
  * double eigensolve replay: full-corpus chain + sample chain + the
  * Rayleigh cross-score of the sampled axis on the full covariance.
  */
object R32Queries {

  private val Dims = 64
  private val Iters = 8
  /** Deterministic sample predicate, identical in both engines. */
  private val SampleWhere = "vec_id % 4 = 0"
  private val EvDeltaBound = 0.02

  /** One full PCA chain (exact decimal moment pass + unrolled power
    * iteration), every CTE suffixed `_$x` so two chains coexist in one
    * query — the same arithmetic as sim_pca's oracle (R17Queries).
    */
  private def pcaChain(x: String, where: String): String = {
    val iterCtes = (1 to Iters).map { k =>
      s"""w${k}_$x AS (
         |  SELECT c.i,
         |    list_reduce(list(c.c * v.x ORDER BY c.j),
         |      (a, b) -> a + b) AS w
         |  FROM covf_$x c JOIN v${k - 1}_$x v ON v.i = c.j
         |  GROUP BY c.i),
         |n${k}_$x AS (
         |  SELECT sqrt(list_reduce(list(w * w ORDER BY i),
         |    (a, b) -> a + b)) AS nn
         |  FROM w${k}_$x),
         |v${k}_$x AS (SELECT i, w / nn AS x FROM w${k}_$x, n${k}_$x)""".stripMargin
    }.mkString(",\n")
    s"""e_$x AS (SELECT embedding AS v FROM embeddings $where),
       |nn0_$x AS (SELECT count(*) AS n FROM e_$x),
       |mu_$x AS (
       |  SELECT i,
       |    cast(sum(cast(v[i]::DOUBLE * 1125899906842624.0
       |        AS DECIMAL(38,0))) AS DOUBLE)
       |      / n / 1125899906842624.0 AS mu
       |  FROM e_$x, nn0_$x, generate_series(1, $Dims) g(i)
       |  GROUP BY i, n),
       |s2_$x AS (
       |  SELECT gi.i, gj.j,
       |    cast(sum(
       |      cast(v[gi.i]::DOUBLE * 1125899906842624.0
       |        AS DECIMAL(19,0)) *
       |      cast(v[gj.j]::DOUBLE * 1125899906842624.0
       |        AS DECIMAL(19,0))) AS DOUBLE) AS sxy
       |  FROM e_$x, generate_series(1, $Dims) gi(i),
       |       generate_series(1, $Dims) gj(j)
       |  WHERE gj.j >= gi.i
       |  GROUP BY gi.i, gj.j),
       |cov_$x AS (
       |  SELECT s2.i, s2.j,
       |    sxy / n / 1267650600228229401496703205376.0
       |      - (mi.mu * mj.mu) AS c
       |  FROM s2_$x s2, nn0_$x
       |  JOIN mu_$x mi ON mi.i = s2.i
       |  JOIN mu_$x mj ON mj.i = s2.j),
       |covf_$x AS (
       |  SELECT i, j, c FROM cov_$x
       |  UNION ALL SELECT j AS i, i AS j, c FROM cov_$x WHERE i <> j),
       |v0_$x AS (SELECT i, 1.0::DOUBLE AS x
       |       FROM generate_series(1, $Dims) g(i)),
       |$iterCtes,
       |cvf_$x AS (
       |  SELECT c.i,
       |    list_reduce(list(c.c * v.x ORDER BY c.j),
       |      (a, b) -> a + b) AS w
       |  FROM covf_$x c JOIN v${Iters}_$x v ON v.i = c.j
       |  GROUP BY c.i),
       |lam_$x AS (
       |  SELECT list_reduce(list(cv.w * v.x ORDER BY i),
       |    (a, b) -> a + b) AS l
       |  FROM cvf_$x cv JOIN v${Iters}_$x v USING (i)),
       |tr_$x AS (SELECT list_reduce(list(c ORDER BY i),
       |         (a, b) -> a + b) AS t
       |       FROM cov_$x WHERE i = j)""".stripMargin
  }

  val all: Seq[Q] = Seq(

    Q("sim_pca_sampled",
      "Sampled-moments PCA gate — the 100 TB path for sim_pca " +
        "(Similarity.pcaSampleGate): at scale the dims²-cell moment " +
        "pass runs on a deterministic sample (here vec_id % 4 = 0), " +
        "not the corpus, mirroring the k-means train/assign split. " +
        "The query fits pc1 on the full relation AND on the sample, " +
        "then scores the sampled axis on the FULL covariance " +
        "(Rayleigh quotient v_s'·C·v_s): ev_sample_on_full vs ev_full " +
        "is the fraction of true corpus variance the cheap axis " +
        "explains, and ev_ok gates |delta| <= " + EvDeltaBound + ". " +
        "pc1_align (|v_s·v_f|) rides along as a diagnostic — in a " +
        "flat spectrum the top DIRECTION is genuinely unstable while " +
        "the explained fraction is not, and whitening decisions " +
        "consume the fraction. Every double is the same decimal-" +
        "staged moments + ordered-fold arithmetic as sim_pca, so the " +
        "whole two-fit comparison is hash-gated against the oracle's " +
        "doubled CTE replay.",
      (s, d) => Similarity.pcaSampleGate(Tables.embeddings(s, d),
        expr(SampleWhere), "embedding", dims = Dims, iters = Iters,
        evDeltaBound = EvDeltaBound),
      Some(s"""WITH ${pcaChain("f", "")},
              |${pcaChain("s", s"WHERE $SampleWhere")},
              |ray AS (
              |  SELECT list_reduce(list(w.w * v.x ORDER BY w.i),
              |    (a, b) -> a + b) AS r
              |  FROM (SELECT c.i,
              |          list_reduce(list(c.c * v.x ORDER BY c.j),
              |            (a, b) -> a + b) AS w
              |        FROM covf_f c JOIN v${Iters}_s v ON v.i = c.j
              |        GROUP BY c.i) w
              |  JOIN v${Iters}_s v ON v.i = w.i),
              |al AS (
              |  SELECT abs(list_reduce(list(f.x * s.x ORDER BY f.i),
              |    (a, b) -> a + b)) AS a
              |  FROM v${Iters}_f f JOIN v${Iters}_s s ON s.i = f.i),
              |fin AS (
              |  SELECT lam_f.l / tr_f.t AS ev_full,
              |         ray.r / tr_f.t AS ev_s
              |  FROM lam_f, tr_f, ray)
              |SELECT ev_full, ev_s AS ev_sample_on_full,
              |  abs(ev_full - ev_s) AS ev_delta, al.a AS pc1_align,
              |  (abs(ev_full - ev_s) <= $EvDeltaBound) AS ev_ok
              |FROM fin, al""".stripMargin))
  )
}
