package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Dedup

/** Round-3 session queries. */
object R4Queries {

  val all: Seq[Q] = Seq(

    Q("dedup_cluster_star",
      "The dedup endgame on the ADVERSARIAL-graph algorithm: the same " +
        "MinHash-LSH pairs → connected components, but via alternating " +
        "small-star/large-star edge rewriting (Kiveris et al.) instead of " +
        "label propagation — the state is the shrinking edge list, and " +
        "each round quadruples distance-to-min reach on chain graphs. " +
        "Same cluster/survivor output contract as dedup_cluster, same " +
        "recursive-CTE oracle: two independent algorithms, one answer.",
      (s, d) => {
        val pairs = Dedup.minhashCandidates(Tables.documents(s, d),
          "doc_id", "text", Dedup.Shingler.words(5), bandsN = 2, rowsPerBand = 3)
        val cc = Dedup.connectedComponentsStar(pairs, "id_a", "id_b")
        val w = Window.partitionBy("cluster")
        cc.select(col("id"), col("label").as("cluster"))
          .withColumn("cluster_size", count(lit(1)).over(w))
          .withColumn("is_survivor", col("id") === col("cluster"))
          .orderBy("id")
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
           |cc AS (SELECT id, min(lab) AS cluster FROM reach GROUP BY id)
           |SELECT id, cluster,
           |       count(*) OVER (PARTITION BY cluster) AS cluster_size,
           |       id = cluster AS is_survivor
           |FROM cc ORDER BY id""".stripMargin)))
}
