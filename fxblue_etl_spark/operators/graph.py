"""Connected components for dedup clustering.

Near-dup pair generation (MinHash / SimHash / embedding-LSH in
`operators/dedup.py` and `operators/similarity.py`) yields an edge
list; turning "pairs" into "keep one doc per duplicate *cluster*"
needs the transitive closure — A~B and B~C must land A, B, C in one
group even though (A, C) was never emitted as a pair. That closure is
connected components, implemented here as iterative min-label
propagation:

* state: one ``(id, label)`` row per vertex, label initialized to id;
* step: every vertex takes the min of its own and its neighbors'
  labels — one equi-join + one groupBy (two key shuffles) per round;
* convergence: no label changed (checked with a per-round count
  action); bounded by the cluster diameter, which for near-dup
  graphs is tiny (dup clusters are dense).

The driver-side loop is the idiomatic Spark shape for iterative graph
algorithms (GraphX/Pregel does the same superstep loop under the
hood); ``localCheckpoint`` cuts lineage each round so plans don't
grow with iteration count. At 100 TB the same code runs with the
edge list hash-partitioned on ``id`` — each superstep is shuffle-
aligned on the same key, so AQE reuses the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import release_local_checkpoint
from ..session import tune


#: edge-count ceiling for the driver-side union-find fast path; above
#: it the distributed superstep loop runs (a near-dup pair graph is
#: orders of magnitude smaller than its corpus, but "smaller" can
#: still exceed driver memory at 100 TB — hence a bound, not a bet)
DRIVER_CC_MAX_EDGES = 1_000_000


def _driver_union_find(spark: SparkSession, edge_rows) -> DataFrame:
    """Min-label union-find over a collected edge list: O(E α(V)),
    one pass, zero extra Spark jobs."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in edge_rows:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min label so the root IS the component id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(v, find(v)) for v in parent]
    return spark.createDataFrame(rows, "id long, component long")


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return ``(id, component)`` for every vertex in ``edges``, where
    ``component`` is the minimum vertex id reachable over the
    undirected graph. Raises if not converged within ``max_iter``
    supersteps (near-dup graphs converge in a handful).

    Two physical strategies behind one contract:

    * **small graphs** (≤ DRIVER_CC_MAX_EDGES edges, checked with one
      count action): collect the edge list and run union-find on the
      driver — the closure of a bounded pair graph is not worth k
      supersteps × 2 shuffles of scheduler latency;
    * **large graphs**: the iterative min-label propagation loop.
      Each superstep checkpoint supersedes the previous round's; the
      superseded blocks (and the edge list, on return) are released
      eagerly — an unreleased checkpoint per round is a storage leak
      in any shared, long-lived session."""
    slim = edges.select(
        F.col(src).cast("long").alias("s"), F.col(dst).cast("long").alias("d")
    )
    # limit()+collect bounds driver transfer even before the count:
    # fetch at most MAX+1 edges to learn which side of the bound we're on
    probe = slim.limit(DRIVER_CC_MAX_EDGES + 1).collect()
    if len(probe) <= DRIVER_CC_MAX_EDGES:
        return _driver_union_find(edges.sparkSession, [(r.s, r.d) for r in probe])
    sym = (
        edges.select(F.col(src).alias("id"), F.col(dst).alias("nbr"))
        .unionByName(edges.select(F.col(dst).alias("id"), F.col(src).alias("nbr")))
        .distinct()
        .localCheckpoint()
    )
    labels = sym.select("id").distinct().withColumn("label", F.col("id"))
    prev_ckpt: DataFrame | None = None
    for _ in range(max_iter):
        nbr_labels = sym.join(
            labels.withColumnRenamed("id", "nbr"), "nbr"
        ).select("id", "label")
        new_labels = (
            labels.unionByName(nbr_labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        # `changed` was the last reader of the previous round's blocks
        if prev_ckpt is not None:
            release_local_checkpoint(prev_ckpt)
        prev_ckpt = labels = new_labels
        if changed == 0:
            release_local_checkpoint(sym)
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters over the embedding near-dup pair graph:
    every clustered vector labeled with its component (min vec_id
    reachable) — the grouping a dedup pipeline keeps one canonical
    document per."""
    from .similarity import embedding_near_dup

    tune(spark)
    pairs = embedding_near_dup(spark, sf_dir).select("vec_a", "vec_b")
    return connected_components(pairs, src="vec_a", dst="vec_b").select(
        F.col("id").alias("vec_id"), "component"
    )


# Transitive closure via recursive SQL over the SAME pair predicate
# the Spark side uses (see similarity.NEAR_DUP_ORACLE for the base).
def _near_dup_pairs_sql() -> str:
    from .similarity import NEAR_DUP_ORACLE

    return NEAR_DUP_ORACLE.strip().rstrip(";")


DEDUP_COMPONENTS_ORACLE = f"""
WITH RECURSIVE pairs AS ({_near_dup_pairs_sql()}),
edges(s, d) AS (
  SELECT vec_a, vec_b FROM pairs
  UNION
  SELECT vec_b, vec_a FROM pairs),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
closure AS (
  SELECT s, d FROM reach UNION SELECT s, s FROM edges)
SELECT s AS vec_id, min(d) AS component
FROM closure
GROUP BY s
"""


def dedup_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the near-dup pair graph: how many vectors
    have k near-duplicates. The shape QA reads before trusting a
    dedup pass — a fat tail here means one template document glued
    half the corpus into a single cluster.

    Plan: pair edges symmetrized (row-count doubling union, no
    shuffle), one groupBy per node, one vocab-small groupBy per
    degree — scale-linear in edges."""
    from .similarity import embedding_near_dup

    tune(spark)
    pairs = embedding_near_dup(spark, sf_dir).select("vec_a", "vec_b")
    sym = pairs.unionByName(
        pairs.select(
            F.col("vec_b").alias("vec_a"), F.col("vec_a").alias("vec_b")
        )
    )
    return (
        sym.groupBy("vec_a")
        .agg(F.count("*").alias("degree"))
        .groupBy("degree")
        .agg(F.count("*").alias("n_vecs"))
    )


DEGREE_HIST_ORACLE = f"""
WITH pairs AS ({_near_dup_pairs_sql()}),
sym AS (
  SELECT vec_a, vec_b FROM pairs
  UNION ALL
  SELECT vec_b, vec_a FROM pairs),
deg AS (
  SELECT vec_a, count(*) AS degree FROM sym GROUP BY 1)
SELECT degree, count(*) AS n_vecs
FROM deg GROUP BY 1
"""


def dedup_component_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram of the near-dup cluster graph: how
    many duplicate clusters have k members (the dedup yield curve —
    sum over (size-1)·n is exactly the number of rows a
    keep-one-per-cluster pass deletes)."""
    return (
        dedup_components(spark, sf_dir)
        .groupBy("component")
        .agg(F.count("*").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count("*").alias("n_components"))
    )


COMPONENT_SIZE_HIST_ORACLE = f"""
WITH RECURSIVE pairs AS ({_near_dup_pairs_sql()}),
edges(s, d) AS (
  SELECT vec_a, vec_b FROM pairs
  UNION
  SELECT vec_b, vec_a FROM pairs),
reach(s, d) AS (
  SELECT s, d FROM edges
  UNION
  SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s),
closure AS (
  SELECT s, d FROM reach UNION SELECT s, s FROM edges),
comp AS (
  SELECT s AS vec_id, min(d) AS component FROM closure GROUP BY s),
sizes AS (
  SELECT component, count(*) AS component_size FROM comp GROUP BY 1)
SELECT component_size, count(*) AS n_components
FROM sizes GROUP BY 1
"""


def dedup_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup pair graph — the clustering-
    coefficient numerator that distinguishes tight duplicate cliques
    (template families) from chainy false-positive paths.

    Plan: the oriented-edge join — edges stored (u<v), joined
    (u,v)⋈(v,w) then closed against (u,w) — the standard distributed
    triangle count: two equi-joins on the edges-sized pair graph,
    never touching the corpus. Orientation by node id bounds each
    join's fan-out by the max out-degree."""
    from .similarity import embedding_near_dup

    tune(spark)
    e = embedding_near_dup(spark, sf_dir).select(
        F.col("vec_a").alias("u"), F.col("vec_b").alias("v")
    )
    ab = e.alias("ab")
    bc = e.alias("bc")
    ac = e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.v") == F.col("bc.u"))
        .join(
            ac,
            (F.col("ac.u") == F.col("ab.u")) & (F.col("ac.v") == F.col("bc.v")),
        )
        .select(
            F.col("ab.u").alias("a"),
            F.col("ab.v").alias("b"),
            F.col("bc.v").alias("c"),
        )
    )
    return tri.agg(
        F.count("*").alias("n_triangles"),
        F.countDistinct("a", "b", "c").alias("n_distinct"),
        F.min(F.col("a") * 1000000 + F.col("b")).alias("first_edge_key"),
    )


TRIANGLES_ORACLE = f"""
WITH pairs AS ({_near_dup_pairs_sql()}),
e AS (SELECT vec_a AS u, vec_b AS v FROM pairs),
tri AS (
  SELECT ab.u AS a, ab.v AS b, bc.v AS c
  FROM e ab
  JOIN e bc ON ab.v = bc.u
  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v)
SELECT count(*) AS n_triangles,
       count(DISTINCT (a, b, c)) AS n_distinct,
       CAST(min(a * 1000000 + b) AS BIGINT) AS first_edge_key
FROM tri
"""


QUERIES = {
    "dedup_components": dedup_components,
    "dedup_degree_hist": dedup_degree_hist,
    "dedup_component_size_hist": dedup_component_size_hist,
    "dedup_triangles": dedup_triangles,
}

ORACLES = {
    "dedup_components": DEDUP_COMPONENTS_ORACLE,
    "dedup_degree_hist": DEGREE_HIST_ORACLE,
    "dedup_component_size_hist": COMPONENT_SIZE_HIST_ORACLE,
    "dedup_triangles": TRIANGLES_ORACLE,
}
