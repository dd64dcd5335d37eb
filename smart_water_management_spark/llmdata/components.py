"""Connected components over near-duplicate pairs → dedup GROUPS.

MinHash/LSH (dedup.py) emits *pairs*; the deliverable for corpus dedup is
the *group*: every transitively-connected set of near-dups collapses to
one canonical document (keep the min doc_id, drop the rest). Pairs a-b
and b-c must yield the single group {a, b, c} — a pairwise pass alone
would keep c.

Algorithm: iterative label propagation (the dataflow form of
union-find). Each node starts labeled with itself; each round every node
adopts the minimum label in its closed neighborhood; converged when no
label changes. Rounds = graph diameter ≤ O(log n) for the short chains
near-dup clusters form in practice.

Scale posture: state is one (node, label) row per node; each round is
one join + one aggregate on node id — all shuffle-partitioned, nothing
driver-side except the loop counter and the convergence flag (a count on
a boolean filter). ``localCheckpoint`` truncates the growing lineage each
round, the standard pattern for iterative DataFrame algorithms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table
from .dedup import lsh_candidate_pairs, minhash_signatures, verify_jaccard

MAX_ROUNDS = 20


def connected_components(pairs: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(doc_a, doc_b) undirected edges → (doc_id, component) labels.

    Components are labeled by their minimum member id. Isolated nodes
    (documents in no pair) are the caller's concern — join the result
    back to the corpus with a coalesce to the doc's own id.
    """
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    n_changed = 0
    for _ in range(max_rounds):
        # min label among each node's neighbors
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("changed"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("changed").eqNullSafe(True)).count()
        labels = updated.select("id", "label")
        if n_changed == 0:
            break
    if n_changed != 0:
        # silently returning partial labels would split real dup groups
        # into several components and keep extra "canonical" duplicates
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds "
            f"({n_changed} labels still changing) — the pair graph has a "
            f"longer chain than expected; raise max_rounds"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("component"))


def dedup_corpus(
    docs: DataFrame, threshold: float = 0.5, sigs: DataFrame | None = None
) -> DataFrame:
    """Full near-dup dedup: LSH pairs → components → canonical per group.

    Returns the corpus with ``component`` (group id) and ``is_canonical``
    (keep flag: the minimum doc_id of its group). Documents in no group
    are their own singleton component. Pass ``sigs`` to reuse an
    already-pinned signature table (x15 shares x08/x52's); by default the
    signatures are computed from ``docs``.
    """
    if sigs is None:
        sigs = minhash_signatures(docs).persist()
    pairs = verify_jaccard(docs, lsh_candidate_pairs(sigs), threshold)
    comps = connected_components(pairs)
    out = docs.join(comps, "doc_id", "left").withColumn(
        "component", F.coalesce("component", "doc_id")
    )
    return out.withColumn("is_canonical", F.col("doc_id") == F.col("component"))


def _x15_oracle() -> str:
    """Recursive-closure twin of the label-propagation components: the
    x08 pair chain (now engine-exact, dedup._x08_cte) feeds a WITH
    RECURSIVE reachability closure; each node's component is the MIN
    reachable id — precisely the fixpoint min-label propagation
    converges to. Tiny closure: only docs that appear in a verified
    pair participate."""
    from .dedup import _x08_cte

    return f"""
    WITH RECURSIVE {_x08_cte()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM verified
    ),
    reach(a, b) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    closure AS (
      SELECT a, b FROM reach
      UNION
      SELECT DISTINCT src AS a, src AS b FROM edges
    ),
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a)
    SELECT component,
           COUNT(*) AS n_members,
           MIN(doc_id) AS canonical_doc_id,
           CAST(SUM(CASE WHEN doc_id = component THEN 1 ELSE 0 END)
                AS BIGINT) AS n_canonical
    FROM comp GROUP BY component
    """


@register(
    "x15_dedup_groups",
    oracle=_x15_oracle(),
    doc="near-dup GROUPS: LSH pairs closed under transitivity via iterative "
    "label propagation; one canonical doc per component. The oracle closes "
    "the same (engine-exact) pair set with WITH RECURSIVE reachability — "
    "the iterative dataflow and the recursive SQL must agree exactly",
)
def x15_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import pinned_corpus_signatures

    docs = load_table(spark, sf_dir, "documents")
    deduped = dedup_corpus(docs, sigs=pinned_corpus_signatures(spark, sf_dir))
    return (
        deduped.groupBy("component")
        .agg(
            F.count("*").alias("n_members"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sum(F.col("is_canonical").cast("int")).alias("n_canonical"),
        )
        .filter(F.col("n_members") > 1)
        .orderBy("component")
    )
