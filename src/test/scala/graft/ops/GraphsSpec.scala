package graft.ops

import graft.SparkSpec

class GraphsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: star center dominates; mass conserved; symmetric " +
      "pair ranks equal") {
    // star 1-2, 1-3, 1-4 plus an isolated pair 5-6
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val r = Graphs.pageRank(pairs, "id_a", "id_b", damping = 0.85,
        iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.size == 6)
    // the star center collects three leaves' full mass each round
    assert(r(1L) > r(2L) && r(1L) > r(5L))
    // leaves are symmetric
    assert(r(2L) == r(3L) && r(3L) == r(4L))
    assert(r(5L) == r(6L))
    // total mass stays ~1 (no dangling nodes in a symmetrized graph)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: a 2-regular ring is already stationary — ranks stay " +
      "uniform at every iteration count") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    for (it <- Seq(1, 4)) {
      val r = Graphs.pageRank(ring, "a", "b", damping = 0.85, iters = it)
        .collect().map(_.getDouble(1))
      assert(r.forall(v => math.abs(v - 1.0 / 3) < 1e-12),
        s"ring must stay uniform at iters=$it: ${r.toList}")
    }
  }
}
