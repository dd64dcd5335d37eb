"""Connected components over near-duplicate pairs → dedup GROUPS.

MinHash/LSH (dedup.py) emits *pairs*; the deliverable for corpus dedup is
the *group*: every transitively-connected set of near-dups collapses to
one canonical document (keep the min doc_id, drop the rest). Pairs a-b
and b-c must yield the single group {a, b, c} — a pairwise pass alone
would keep c.

Algorithm: iterative label propagation (the dataflow form of
union-find) with POINTER JUMPING: each round every node first adopts the
minimum label in its closed neighborhood, then additionally adopts its
current label-node's label (path compression — label := label(label)).
The jump makes convergence O(log diameter) instead of O(diameter), so a
2000-node mutual-kNN graph with a 100-hop chain (observed at sf0.1 —
plain propagation blew the round budget) still converges in ~7 rounds,
and a billion-node graph stays within the same small budget.

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
    # init label = min(id, min neighbor): the symmetric edge list names
    # every node as src, so this is round 0's propagation fused into the
    # init aggregate — one full propagate/checkpoint/count round saved
    labels = (
        edges.groupBy(F.col("src").alias("id"))
        .agg(F.min("dst").alias("nbr"))
        .select(
            "id", F.least(F.col("id"), F.col("nbr")).alias("label")
        )
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
        # carry the round-start label as ``prev`` so convergence is a
        # join-free filter over the checkpointed result (r11: the old
        # per-round count re-joined two label snapshots — one extra
        # shuffle + hash build per round for a number derivable in place)
        cand = labels.join(
            neighbor_min, labels.id == neighbor_min.src, "left"
        ).select(
            "id",
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
            F.col("label").alias("prev"),
        )
        # pointer jump (path compression): label := min(label, label's own
        # label). Same min-label fixpoint, but long chains collapse
        # geometrically — O(log diameter) rounds instead of O(diameter).
        # (r11 note: variants with extra jumps were measured and lost —
        # un-checkpointed self-join jumps double plan AND execution per
        # jump, and jumps against the stale round-start labels do not
        # speed convergence on neighbor-propagation-bound graphs.)
        ptr = cand.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        updated = (
            cand.join(ptr, cand.label == ptr.pid, "left")
            .select(
                "id",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("plabel"), F.col("label")),
                ).alias("label"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        n_changed = updated.filter(F.col("label") != F.col("prev")).count()
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
    docs: DataFrame,
    threshold: float = 0.5,
    sigs: DataFrame | None = None,
    cache_key: str | None = None,
) -> DataFrame:
    """Full near-dup dedup: LSH pairs → components → canonical per group.

    Returns the corpus with ``component`` (group id) and ``is_canonical``
    (keep flag: the minimum doc_id of its group). Documents in no group
    are their own singleton component. Pass ``sigs`` to reuse an
    already-pinned signature table (x15 shares x08/x52's); by default the
    signatures are computed from ``docs``.

    With ``cache_key`` (the dataset identity, e.g. sf_dir) the COMPONENT
    table is pinned per session via ``pin_derived`` — the r11 sweep
    measured the label-propagation rounds as the dominant cost of nine
    consumers (x15/x109/x114/x115/x122/x132/x158/x161/d03, ~3-10 s
    each), every one closing the SAME pair graph; the same
    build-once-serve-many contract as ``ivf_index``. First use per
    session still computes everything from the parquet inputs.
    """
    if sigs is None:
        sigs = minhash_signatures(docs).persist()

    def build() -> DataFrame:
        pairs = verify_jaccard(docs, lsh_candidate_pairs(sigs), threshold)
        return connected_components(pairs)

    if cache_key is not None:
        from ..sources.catalog import pin_derived

        comps = pin_derived(
            docs.sparkSession,
            cache_key,
            f"dedup_components_t{threshold}",
            build,
        )
    else:
        comps = build()
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
    deduped = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    )
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


# --- x69: canonical selection by graph centrality ----------------------------

X69_PR_ITERS = 5
X69_PR_DAMP = 0.85


def _x69_oracle() -> str:
    """x08's pair chain → symmetric edges → degree-normalized PageRank
    (5 unrolled rounds, x60's decimal-exact recipe, but with VARIABLE
    out-degrees) → recursive-closure components → per-component argmax.
    Every stage is deterministic, so the centrality-chosen canonical is
    oracle-exact."""
    from .dedup import _x08_cte

    sql = f"""
    WITH RECURSIVE {_x08_cte()},
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM verified
    ),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
    r0 AS (SELECT doc_id, 1.0 / n AS r FROM nodes CROSS JOIN nn)
    """
    prev = "r0"
    for i in range(1, X69_PR_ITERS + 1):
        sql += f""",
    c{i} AS (
      SELECT e.dst AS doc_id,
             CAST(SUM(CAST(ROUND(p.r / g.d, 12) AS DECIMAL(27,12)))
                  AS DOUBLE) AS contrib
      FROM edges e
      JOIN {prev} p ON e.src = p.doc_id
      JOIN deg g ON e.src = g.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nodes.doc_id,
             ROUND((1.0 - {X69_PR_DAMP}) / nn.n
                   + {X69_PR_DAMP} * COALESCE(c.contrib, 0.0), 12) AS r
      FROM nodes CROSS JOIN nn
      LEFT JOIN c{i} c ON nodes.doc_id = c.doc_id
    )"""
        prev = f"r{i}"
    sql += f""",
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    scored AS (
      SELECT comp.component, comp.doc_id, pr.r,
             ROW_NUMBER() OVER (PARTITION BY comp.component
                                ORDER BY pr.r DESC, comp.doc_id) AS rk
      FROM comp JOIN {prev} pr ON comp.doc_id = pr.doc_id
    )
    SELECT component,
           COUNT(*) AS n_members,
           MIN(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc_id,
           ROUND(MIN(CASE WHEN rk = 1 THEN r END), 9) AS canonical_pagerank
    FROM scored GROUP BY component
    """
    return sql


@register(
    "x69_canonical_by_pagerank",
    oracle=_x69_oracle(),
    doc="canonical selection by centrality: the x08 near-dup graph's "
    "PageRank (degree-normalized, 5 decimal-exact rounds) picks each "
    "dedup group's most-connected member as canonical — the quality "
    "signal x32 derives from rules, derived instead from graph "
    "structure (a central doc is the one most of its cluster "
    "duplicates). Components and ranks share the same bounded pair "
    "graph; the oracle unrolls the iteration AND closes the "
    "transitivity recursively, so the chosen canonicals are hash-exact",
)
def x69_canonical_by_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import pinned_corpus_signatures

    docs = load_table(spark, sf_dir, "documents")
    pairs = verify_jaccard(
        docs, lsh_candidate_pairs(pinned_corpus_signatures(spark, sf_dir))
    ).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .distinct()
        # persisted for its three construction-time consumers (deg, ed,
        # nodes); the frame re-joined inside every PR round is `ed` below
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # r11 (guide §1.2): attach the (static) out-degree to the edge table
    # ONCE instead of re-joining deg inside every PageRank round — one
    # join + one deg re-aggregation fewer per round, same r/d arithmetic.
    ed = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("doc_id")).distinct().persist()
    n = nodes.count()  # bounded driver scalar (graph size)
    ranks = nodes.select("doc_id", (F.lit(1.0) / n).alias("r"))
    for _ in range(X69_PR_ITERS):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["doc_id"])
            .select(
                F.col("dst"),
                F.round(F.col("r") / F.col("d"), 12)
                .cast("decimal(27,12)")
                .alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").cast("double").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, nodes["doc_id"] == contrib["dst"], "left")
            .select(
                "doc_id",
                F.round(
                    (1.0 - X69_PR_DAMP) / n
                    + X69_PR_DAMP * F.coalesce("contrib", F.lit(0.0)),
                    12,
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    # r11: the component labels close the SAME pinned-signature pair
    # graph every dedup_corpus consumer closes (symmetrize-then-close
    # equals close-directly — connected_components symmetrizes
    # internally), so share the session pin under the same key instead
    # of re-running the label propagation
    from ..sources.catalog import pin_derived

    comp = pin_derived(
        spark,
        sf_dir,
        "dedup_components_t0.5",
        lambda: connected_components(pairs),
    )
    wr = W.partitionBy("component").orderBy(F.desc("r"), F.asc("doc_id"))
    scored = comp.join(ranks, "doc_id").withColumn("rk", F.row_number().over(wr))
    out = scored.groupBy("component").agg(
        F.count("*").alias("n_members"),
        F.min(F.when(F.col("rk") == 1, F.col("doc_id"))).alias(
            "canonical_doc_id"
        ),
        F.round(
            F.min(F.when(F.col("rk") == 1, F.col("r"))), 9
        ).alias("canonical_pagerank"),
    )
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    ed.unpersist()
    nodes.unpersist()
    return out


# --- x95: group-aware train/val/test split assignment ------------------------

# Percent cut points of the md5 hash of the GROUP key (not the doc key):
# assigning whole dedup groups keeps near-duplicates out of the eval
# splits — the remedy for the leakage x44 measures.
SPLIT_CUTS = (80, 90)


def _x95_oracle() -> str:
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    alldocs AS (
      SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
             len(string_split(lower(d.text), ' ')) AS n_tok
      FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    assigned AS (
      SELECT doc_id, component, n_tok,
             CASE WHEN h < {SPLIT_CUTS[0]} THEN 'train'
                  WHEN h < {SPLIT_CUTS[1]} THEN 'val'
                  ELSE 'test' END AS split
      FROM (
        SELECT *, CAST(('0x' || substr(md5(CAST(component AS VARCHAR)),
                                       1, 8)) AS BIGINT) % 100 AS h
        FROM alldocs)
    ),
    straddle AS (
      SELECT component FROM assigned
      GROUP BY component HAVING COUNT(DISTINCT split) > 1
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT component) AS BIGINT) AS n_groups,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST((SELECT COUNT(*) FROM straddle) AS BIGINT)
             AS n_straddling_groups,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM documents) AS doc_share
    FROM assigned GROUP BY split
    """


@register(
    "x95_group_split_assign",
    oracle=_x95_oracle(),
    doc="x95 (ext.): group-integral train/val/test assignment — every "
    "doc inherits its dedup GROUP's split (md5 of the component id, "
    f"{SPLIT_CUTS[0]}/{SPLIT_CUTS[1] - SPLIT_CUTS[0]}/"
    f"{100 - SPLIT_CUTS[1]} percent cuts), so near-duplicate pairs can "
    "never straddle train and eval — the constructive remedy for the "
    "contamination x44 measures, with the straddle count reported as a "
    "zero-by-construction audit column. Split assignment is pure "
    "hashing (reproducible, no RNG state, stable under corpus "
    "append). Exactness: counts are exact integers; doc_share is one "
    "IEEE quotient. Scale shape: reuses x15's pinned signatures + "
    "label-propagation components (per-round join + agg, "
    "localCheckpoint-truncated lineage), then one hash-bucket "
    "projection and a 3-row agg with the straddle audit broadcast "
    "back. Reference analog: none in the reference — BASELINE.json "
    "extension surface (split hygiene for training corpora)",
)
def x95_group_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import pinned_corpus_signatures
    from .text import tokens

    docs = load_table(spark, sf_dir, "documents")
    deduped = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    )
    h = F.conv(
        F.substring(F.md5(F.col("component").cast("string")), 1, 8), 16, 10
    ).cast("long") % 100
    assigned = deduped.select(
        "doc_id",
        "component",
        F.size(tokens("text")).alias("n_tok"),
        F.when(h < SPLIT_CUTS[0], "train")
        .when(h < SPLIT_CUTS[1], "val")
        .otherwise("test")
        .alias("split"),
    )
    straddle = (
        assigned.groupBy("component")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .agg(F.count("*").cast("bigint").alias("n_straddling_groups"))
    )
    total = assigned.agg(F.count("*").alias("n_total"))
    return (
        assigned.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.countDistinct("component").cast("bigint").alias("n_groups"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
        )
        .crossJoin(F.broadcast(straddle))
        .crossJoin(F.broadcast(total))
        .select(
            "split",
            "n_docs",
            "n_groups",
            "n_tokens",
            "n_straddling_groups",
            (F.col("n_docs").cast("double") / F.col("n_total")).alias(
                "doc_share"
            ),
        )
    )


# --- x109: dedup token-savings report ---------------------------------------------


def _x109_oracle() -> str:
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    marked AS (
      SELECT d.source,
             len(string_split(lower(d.text), ' ')) AS n_tokens,
             (d.doc_id = COALESCE(c.component, d.doc_id)) AS kept
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN kept THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE n_tokens END) AS BIGINT)
             AS dup_tokens,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE n_tokens END) AS DOUBLE)
             / SUM(n_tokens) AS savings_frac
    FROM marked GROUP BY source
    """


@register(
    "x109_dedup_token_savings",
    oracle=_x109_oracle(),
    doc="x109: dedup token-savings report — per source, the tokens the "
    "x15 component collapse removes (duplicates' tokens) vs keeps "
    "(canonicals'), and the savings fraction. The 'what did dedup buy "
    "us' line every curation run reports next to x90's funnel: "
    "token savings is what actually moves the training bill, not doc "
    "counts. Scale: reuses the pinned signature table and the "
    "pointer-jumped components (bounded pair graph, never all-pairs); "
    "one left join of the corpus against the component map + one "
    "map-combined per-source aggregate. Exactness: integer token "
    "counts, one IEEE quotient",
)
def x109_dedup_token_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import pinned_corpus_signatures
    from .text import tokens

    docs = load_table(spark, sf_dir, "documents")
    marked = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    ).select(
        "source",
        F.size(tokens("text")).alias("n_tokens"),
        F.col("is_canonical").alias("kept"),
    )
    return marked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("kept").cast("int")).cast("bigint").alias("n_kept"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("kept"), F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("kept_tokens"),
        F.sum(F.when(F.col("kept"), 0).otherwise(F.col("n_tokens")))
        .cast("bigint")
        .alias("dup_tokens"),
        (
            F.sum(F.when(F.col("kept"), 0).otherwise(F.col("n_tokens")))
            .cast("double")
            / F.sum("n_tokens")
        ).alias("savings_frac"),
    )


# --- x114: dedup survivorship-bias audit --------------------------------------------


def _x114_oracle() -> str:
    from .curation import sql_gopher_metrics
    from .dedup import _x08_cte

    passes = sql_gopher_metrics("string_split(lower(text), ' ')")["passes"]
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    marked AS (
      SELECT CASE WHEN d.doc_id = COALESCE(c.component, d.doc_id)
                  THEN 'kept' ELSE 'removed' END AS disposition,
             len(string_split(lower(d.text), ' ')) AS n_tokens,
             CASE WHEN {passes} THEN 1 ELSE 0 END AS q
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT disposition,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           (CAST(SUM(CAST(n_tokens AS DECIMAL(27,6))) AS DOUBLE)
              / COUNT(*)) AS mean_tokens,
           quantile_cont(CAST(n_tokens AS DOUBLE), 0.5) AS median_tokens,
           CAST(SUM(q) AS BIGINT) AS n_quality_pass,
           CAST(SUM(q) AS DOUBLE) / COUNT(*) AS quality_pass_rate
    FROM marked GROUP BY disposition
    """


@register(
    "x114_dedup_survivorship_audit",
    oracle=_x114_oracle(),
    doc="x114: dedup survivorship-bias audit — length and quality "
    "profile of the docs the x15 component collapse KEEPS vs REMOVES "
    "(count, mean/median tokens, Gopher pass rate). Dedup is supposed "
    "to remove copies, not a systematically different slice of the "
    "corpus; a kept-vs-removed quality gap means the min-id canonical "
    "policy is biased and x32's quality-aware selection should run "
    "instead. Scale: reuses the pinned pair graph + pointer-jumped "
    "components; ONE corpus scan with a 2-group aggregate. Exactness: "
    "integer counts, decimal-moment mean, exact interpolated median",
)
def x114_dedup_survivorship_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .curation import gopher_metrics
    from .dedup import pinned_corpus_signatures
    from .text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    marked = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    ).select(
        F.when(F.col("is_canonical"), "kept")
        .otherwise("removed")
        .alias("disposition"),
        F.size(tk).alias("n_tokens"),
        gopher_metrics(tk)["passes"].cast("int").alias("q"),
    )
    return marked.groupBy("disposition").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum(F.col("n_tokens").cast("decimal(27,6)")).cast("double")
            / F.count("*")
        ).alias("mean_tokens"),
        F.percentile(F.col("n_tokens").cast("double"), 0.5).alias(
            "median_tokens"
        ),
        F.sum("q").cast("bigint").alias("n_quality_pass"),
        (F.sum("q").cast("double") / F.count("*")).alias(
            "quality_pass_rate"
        ),
    )


# --- x118: dedup idempotence audit ---------------------------------------------------


def _x118_oracle() -> str:
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    canon AS (
      SELECT d.doc_id FROM documents d
      LEFT JOIN comp c ON c.doc_id = d.doc_id
      WHERE d.doc_id = COALESCE(c.component, d.doc_id)
    ),
    second_pass AS (
      SELECT v.doc_a, v.doc_b FROM verified v
      JOIN canon ca ON ca.doc_id = v.doc_a
      JOIN canon cb ON cb.doc_id = v.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM canon) AS BIGINT) AS n_canonical,
           CAST((SELECT COUNT(*) FROM verified) AS BIGINT)
             AS first_pass_pairs,
           CAST((SELECT COUNT(*) FROM second_pass) AS BIGINT)
             AS residual_pairs,
           ((SELECT COUNT(*) FROM second_pass) = 0) AS idempotent
    """


@register(
    "x118_dedup_idempotence",
    oracle=_x118_oracle(),
    doc="x118: dedup idempotence audit — re-probe the verified near-dup "
    "pair set against the CANONICAL survivors: a second dedup pass "
    "over the deduped corpus must find zero pairs (components place "
    "every verified pair inside one group, so at most one endpoint "
    "survives). residual_pairs > 0 means the component closure is "
    "broken (the exact failure x87/x88's non-convergence would have "
    "caused — here it's a standing, driver-checkable invariant, not "
    "just a unit test). Scale: reuses the banded pair set and the "
    "pointer-jumped components; the audit itself is two semi-joins "
    "and a scalar row",
)
def x118_dedup_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import pinned_corpus_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = pinned_corpus_signatures(spark, sf_dir)
    pairs = verify_jaccard(docs, lsh_candidate_pairs(sigs)).persist()
    # r11: same pinned-signature pair graph as every dedup_corpus
    # consumer — share the session-pinned component table
    from ..sources.catalog import pin_derived

    comps = pin_derived(
        spark,
        sf_dir,
        "dedup_components_t0.5",
        lambda: connected_components(pairs.select("doc_a", "doc_b")),
    )
    canon = (
        docs.join(comps, "doc_id", "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
        .filter(F.col("doc_id") == F.col("component"))
        .select("doc_id")
    )
    second = pairs.join(
        canon.withColumnRenamed("doc_id", "doc_a"), "doc_a"
    ).join(canon.withColumnRenamed("doc_id", "doc_b"), "doc_b")
    n_canon = canon.agg(F.count("*").cast("bigint").alias("n_canonical"))
    n_first = pairs.agg(
        F.count("*").cast("bigint").alias("first_pass_pairs")
    )
    n_resid = second.agg(
        F.count("*").cast("bigint").alias("residual_pairs")
    )
    return (
        n_canon.crossJoin(F.broadcast(n_first))
        .crossJoin(F.broadcast(n_resid))
        .select(
            "n_canonical",
            "first_pass_pairs",
            "residual_pairs",
            (F.col("residual_pairs") == 0).alias("idempotent"),
        )
    )


# --- x122: final training-mix manifest ------------------------------------------------


def _x122_oracle() -> str:
    from .curation import sql_gopher_metrics
    from .dedup import _x08_cte

    passes = sql_gopher_metrics("string_split(lower(d.text), ' ')")["passes"]
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    marked AS (
      SELECT d.source,
             len(string_split(lower(d.text), ' ')) AS n_tokens,
             CASE WHEN d.doc_id = COALESCE(c.component, d.doc_id)
                   AND ({passes}) THEN 1 ELSE 0 END AS eligible
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    src AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(eligible) AS BIGINT) AS n_eligible,
             CAST(SUM(CASE WHEN eligible = 1 THEN n_tokens ELSE 0 END)
                  AS BIGINT) AS elig_tokens
      FROM marked GROUP BY source
    ),
    tot AS (
      SELECT CAST(FLOOR(CAST(SUM(elig_tokens) AS DOUBLE) * 3 / 5)
                  AS BIGINT) AS b,
             COUNT(*) AS s
      FROM src
    ),
    scan AS (
      SELECT source, n_docs, n_eligible, elig_tokens,
             ROW_NUMBER() OVER (ORDER BY elig_tokens, source) AS rn,
             COALESCE(SUM(elig_tokens) OVER (ORDER BY elig_tokens, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prefix
      FROM src
    ),
    lvl AS (
      SELECT (t.b - sc.prefix) / (t.s - sc.rn + 1) AS level
      FROM scan sc, tot t
      WHERE (t.b - sc.prefix) / (t.s - sc.rn + 1) <= sc.elig_tokens
      ORDER BY sc.rn LIMIT 1
    )
    SELECT sc.source, sc.n_docs, sc.n_eligible, sc.elig_tokens,
           LEAST(CAST(sc.elig_tokens AS DOUBLE),
                 COALESCE(l.level, CAST('inf' AS DOUBLE)))
             AS alloc_tokens,
           CASE WHEN sc.elig_tokens > 0 THEN
             LEAST(CAST(sc.elig_tokens AS DOUBLE),
                   COALESCE(l.level, CAST('inf' AS DOUBLE)))
               / sc.elig_tokens END AS fill_frac,
           t.b AS budget
    FROM scan sc LEFT JOIN lvl l ON TRUE, tot t
    """


@register(
    "x122_training_mix_manifest",
    oracle=_x122_oracle(),
    doc="x122: the FINAL training-mix manifest — x103's water-filling "
    "budget allocation computed over the CURATED corpus (docs that "
    "survive both the x15 dedup collapse AND the x21 quality bank), "
    "per source: raw docs, eligible docs, eligible tokens, allocated "
    "tokens, fill fraction, budget. The capstone composition: "
    "dedup (components) -> quality (Gopher) -> mixing (waterfill) in "
    "one plan — the artifact a data-curation run actually hands to "
    "training. Scale: each stage is its own bounded machinery "
    "(banded pairs, one corpus scan, source-table waterfill); "
    "nothing new shuffles. Exactness: integer counts, exact-decimal "
    "level search, IEEE quotients",
)
def x122_training_mix_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from .curation import gopher_metrics
    from .dedup import pinned_corpus_signatures
    from .text import tokens

    docs = load_table(spark, sf_dir, "documents")
    tk = tokens("text")
    marked = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    ).select(
        "source",
        F.size(tk).alias("n_tokens"),
        (F.col("is_canonical") & gopher_metrics(tk)["passes"])
        .cast("int")
        .alias("eligible"),
    )
    src = marked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("eligible").cast("bigint").alias("n_eligible"),
        F.sum(F.when(F.col("eligible") == 1, F.col("n_tokens")).otherwise(0))
        .cast("bigint")
        .alias("elig_tokens"),
    )
    tot = src.agg(
        F.floor(F.sum("elig_tokens").cast("double") * 3 / 5)
        .cast("bigint")
        .alias("b"),
        F.count("*").alias("s"),
    )
    order = [F.col("elig_tokens").asc(), F.col("source").asc()]
    wr = W.orderBy(*order)
    wp = W.orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    scan = src.select(
        "source",
        "n_docs",
        "n_eligible",
        "elig_tokens",
        F.row_number().over(wr).alias("rn"),
        F.coalesce(F.sum("elig_tokens").over(wp), F.lit(0)).alias("prefix"),
    )
    cand = (
        scan.crossJoin(F.broadcast(tot))
        .withColumn(
            "level",
            (F.col("b") - F.col("prefix")) / (F.col("s") - F.col("rn") + 1),
        )
        .filter(F.col("level") <= F.col("elig_tokens"))
        .orderBy("rn")
        .limit(1)
        .select("level")
    )
    alloc = F.least(
        F.col("elig_tokens").cast("double"),
        F.coalesce(F.col("level"), F.lit(float("inf"))),
    )
    return (
        scan.join(F.broadcast(cand), F.lit(True), "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_eligible",
            "elig_tokens",
            alloc.alias("alloc_tokens"),
            F.when(
                F.col("elig_tokens") > 0, alloc / F.col("elig_tokens")
            ).alias("fill_frac"),
            F.col("b").alias("budget"),
        )
    )


# --- x132: leakage-free train/test split (component-atomic assignment) --------------

_X132_TEST_HEX = "1a"  # test if md5(component) first 2 hex < '1a' (~10.2%)


def _x132_oracle() -> str:
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    assigned AS (
      SELECT d.doc_id,
             COALESCE(c.component, d.doc_id) AS component,
             CASE WHEN substr(md5(CAST(COALESCE(c.component, d.doc_id)
                                       AS VARCHAR)), 1, 2)
                       < '{_X132_TEST_HEX}'
                  THEN 'test' ELSE 'train' END AS split
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id, CAST(component AS BIGINT) AS component, split,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT)
             AS component_size
    FROM assigned
    """


@register(
    "x132_leakage_free_split",
    # The CONSTRUCTIVE counterpart of x44's split-leakage audit: assign
    # whole near-dup COMPONENTS (x15's transitive closure; singletons =
    # the doc itself) to train or test by an md5 draw on the component
    # id — a near-dup pair can never straddle the split, by
    # construction rather than by post-hoc filtering. The draw is the
    # standard md5-threshold device, so both engines agree on every
    # assignment.
    oracle=_x132_oracle(),
    doc="x132: leakage-free train/test split — every doc inherits its "
    "near-dup component's deterministic md5 split draw (~10% test), "
    "so contaminated eval examples are impossible by construction "
    "(x44 AUDITS leakage after the fact; x132 prevents it; x121/x129 "
    "measure the n-gram analog). Scale: rides x08's banded candidate "
    "generation and x15's label-propagation components — the only "
    "additions are one md5 per component and a hash join back to "
    "docs; the split never scans text again. Exactness: the closure "
    "is the recursive-SQL twin of the iterative propagation; the "
    "draw is pure string comparison on md5 hex",
)
def x132_leakage_free_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import pinned_corpus_signatures

    docs = load_table(spark, sf_dir, "documents")
    assigned = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    ).select(
        "doc_id",
        "component",
        F.when(
            F.substring(F.md5(F.col("component").cast("string")), 1, 2)
            < _X132_TEST_HEX,
            "test",
        )
        .otherwise("train")
        .alias("split"),
    )
    return assigned.select(
        "doc_id",
        F.col("component").cast("bigint").alias("component"),
        "split",
        F.count("*")
        .over(W.partitionBy("component"))
        .cast("bigint")
        .alias("component_size"),
    )


# --- d03: golden-record survivorship merge over dup components ------------------------


def _d03_oracle() -> str:
    """x15's recursive-closure components + per-component survivorship:
    longest text wins, modal language (lexicographic min on ties),
    canonical id = min member."""
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    members AS (
      SELECT c.component, d.doc_id, d.n_chars, d.lang, d.source
      FROM comp c JOIN documents d USING (doc_id)
    ),
    lang_counts AS (
      SELECT component, lang, COUNT(*) AS cl FROM members
      GROUP BY component, lang
    ),
    lang_mode AS (
      SELECT component, lang AS survivor_lang FROM (
        SELECT component, lang,
               ROW_NUMBER() OVER (PARTITION BY component
                                  ORDER BY cl DESC, lang) AS rn
        FROM lang_counts
      ) WHERE rn = 1
    )
    SELECT m.component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(m.doc_id) AS canonical_doc_id,
           CAST(MAX(m.n_chars) AS BIGINT) AS survivor_text_len,
           CAST(SUM(m.n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT m.source) AS BIGINT) AS n_sources,
           MIN(lm.survivor_lang) AS survivor_lang
    FROM members m JOIN lang_mode lm USING (component)
    GROUP BY m.component
    HAVING COUNT(*) > 1
    """


@register(
    "d03_golden_record",
    oracle=_d03_oracle(),
    doc="d03: golden-record survivorship merge — for every near-dup "
    "component (x15's LSH pairs closed under transitivity), the MDM "
    "survivorship rules build one merged record: canonical id = "
    "minimum member, text length = longest member (the keep-richest "
    "rule), language = modal value with lexicographic tie-break, plus "
    "source spread and total volume. The step AFTER dedup detection: "
    "x15 finds the groups, d02 normalizes keys, d03 decides what the "
    "surviving row looks like. Scale: components via pointer-jump "
    "label propagation (O(log diameter) rounds); survivorship is two "
    "hash aggregates and one 1-row-per-component mode window. "
    "Exactness: integers and strings only. Ref parity: the "
    "reference's sensor golden-record merge "
    "(src/enhanced_ingestion.py:460-485)",
)
def d03_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import pinned_corpus_signatures

    docs = load_table(spark, sf_dir, "documents")
    merged = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    )
    members = merged.select("component", "doc_id", "n_chars", "lang", "source")
    lang_mode = (
        members.groupBy("component", "lang")
        .agg(F.count("*").alias("cl"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("component").orderBy(F.desc("cl"), F.asc("lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("component", F.col("lang").alias("survivor_lang"))
    )
    return (
        members.groupBy("component")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.max("n_chars").cast("bigint").alias("survivor_text_len"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .filter(F.col("n_members") > 1)
        .join(lang_mode, "component")
        .select(
            "component", "n_members", "canonical_doc_id",
            "survivor_text_len", "total_chars", "n_sources", "survivor_lang",
        )
    )


# --- x145: soft-dedup loss weights (count-based downweighting) -------------------------


def _x145_oracle() -> str:
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
    comp AS (SELECT a AS doc_id, MIN(b) AS component FROM closure GROUP BY a),
    member AS (
      SELECT d.doc_id, d.source,
             COALESCE(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    ),
    sized AS (
      SELECT m.doc_id, m.source, s.csize
      FROM member m JOIN (
        SELECT component, CAST(COUNT(*) AS BIGINT) AS csize
        FROM member GROUP BY component
      ) s ON s.component = m.component
    )
    SELECT source, csize AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(1 AS DOUBLE) / csize AS weight_per_doc,
           CAST(COUNT(*) AS DOUBLE) / csize AS effective_docs
    FROM sized GROUP BY source, csize
    """


@register(
    "x145_soft_dedup_weights",
    # Soft dedup: instead of DROPPING near-duplicates (d01/x122's hard
    # tier), keep every doc but train at loss weight 1/|cluster| so a
    # 40-way boilerplate family contributes one document's worth of
    # gradient. Emits the (source, cluster_size) weight table — each
    # row carries ONE exact integer-pair division, so there is no
    # cross-row double sum to make order-dependent.
    oracle=_x145_oracle(),
    doc="x145: soft-dedup loss weights — count-based downweighting "
    "(w = 1/|near-dup cluster| from the x15 verified-pair "
    "components) as the gentler alternative to dropping: repeated "
    "boilerplate keeps coverage but stops dominating the gradient. "
    "Per (source, cluster-size) the doc count, the per-doc weight "
    "and the effective (weighted) doc mass. Composes the banded "
    "MinHash pair machinery + pointer-jumped components d03/x118 "
    "already exercise; output is bounded by sources x distinct "
    "cluster sizes. Exactness: integer counts, one division per "
    "double, no cross-row float accumulation. Ref parity: none in "
    "reference — LLM-data extension per brief",
)
def x145_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import pinned_corpus_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = pinned_corpus_signatures(spark, sf_dir)
    pairs = verify_jaccard(docs, lsh_candidate_pairs(sigs))
    # r11: same pinned-signature pair graph as every dedup_corpus
    # consumer — share the session-pinned component table
    from ..sources.catalog import pin_derived

    comps = pin_derived(
        spark,
        sf_dir,
        "dedup_components_t0.5",
        lambda: connected_components(pairs.select("doc_a", "doc_b")),
    )
    member = (
        docs.join(comps, "doc_id", "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
        .select("doc_id", "source", "component")
    )
    sizes = member.groupBy("component").agg(
        F.count("*").cast("bigint").alias("csize")
    )
    sized = member.join(sizes, "component")
    return sized.groupBy("source", F.col("csize").alias("cluster_size")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (F.lit(1).cast("double") / F.col("csize")).alias("weight_per_doc"),
        (F.count("*").cast("double") / F.col("csize")).alias("effective_docs"),
    )


# --- x158: semantic cross-split contamination audit ------------------------------------


def _x158_oracle() -> str:
    # x132's full assignment as a nested-CTE subquery (DuckDB scopes a
    # WITH RECURSIVE inside a parenthesized derived table), joined into
    # x11's label-blocked cosine pairs, keeping each TEST doc's single
    # nearest TRAIN neighbor (ties broken by train id).
    from .similarity import _SQL_DOT, _SQL_SQNORM

    cos = (
        f"{_SQL_DOT.format(a='a.embedding', b='b.embedding')}"
        f" / (SQRT({_SQL_SQNORM.format(a='a.embedding')})"
        f" * SQRT({_SQL_SQNORM.format(a='b.embedding')}))"
    )
    return f"""
    WITH assigned AS (
      SELECT doc_id, split FROM ({_x132_oracle()})
    ),
    scored AS (
      SELECT a.vec_id AS test_doc, b.vec_id AS train_twin,
             a.label AS label, {cos} AS cos_sim
      FROM embeddings a
      JOIN assigned sa ON sa.doc_id = a.vec_id AND sa.split = 'test'
      JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
      JOIN assigned sb ON sb.doc_id = b.vec_id AND sb.split = 'train'
    )
    SELECT test_doc, train_twin, label,
           ROUND(cos_sim, 6) AS cos_sim,
           cos_sim >= 0.9 AS is_contaminated
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY test_doc
                 ORDER BY cos_sim DESC, train_twin) AS rn
      FROM scored
    ) WHERE rn = 1
    """


@register(
    "x158_semantic_split_contamination",
    # x132 makes LEXICAL near-dup train/test straddle impossible by
    # construction — but its closure only sees MinHash-verified n-gram
    # overlap. x158 audits the channel it cannot see: for EVERY test
    # document, the single nearest train document by embedding cosine
    # within its label block — the paraphrase/translation/re-render
    # twin a lexical closure misses. The ranked list (highest cosine
    # first) is what an eval pipeline reviews before reporting
    # numbers; the is_contaminated flag pins the standard 0.9 bar.
    # Scale: x11's label-blocked pair generation (never all-pairs),
    # two hash joins against the split assignment, one window per
    # test doc; the split build rides x08/x15's banded machinery.
    # Exactness: ordered-fold cosine (x10's device), md5-draw splits,
    # deterministic tie-break, ROUND(,6) output only.
    oracle=_x158_oracle(),
    doc="x158: semantic cross-split contamination — each TEST doc's "
    "nearest TRAIN doc by label-blocked embedding cosine under "
    "x132's leakage-free split: the dense-channel leakage audit a "
    "lexical closure cannot perform, emitted as the ranked "
    "quarantine list (test doc, train twin, similarity, 0.9 flag). "
    "Completes the contamination matrix: x44 audits lexical "
    "straddle, x121/x129 n-gram overlap, x23 benchmark grams, x158 "
    "the dense channel. Scale: blocked pairs + two hash joins + one "
    "per-test-doc window — no all-pairs, no text rescan. No "
    "reference analog — extension per brief",
)
def x158_semantic_split_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import pinned_corpus_signatures
    from .similarity import _dbl, cosine_prenorm, norm_col

    docs = load_table(spark, sf_dir, "documents")
    assigned = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    ).select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("component").cast("string")), 1, 2)
            < _X132_TEST_HEX,
            "test",
        )
        .otherwise("train")
        .alias("split"),
    )
    # r11: carry per-row norms so only the dot fold is pairwise
    # (cosine_prenorm, bit-identical — guide §1.2). A fan_out of the
    # embeddings scan was measured (interleaved min-of-4 A/B) at
    # 0.82 s -> 1.00 s and rejected: the pairwise stage runs AFTER the
    # label shuffle, which is already wide.
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _dbl("embedding").alias("e")
    )
    test = em.join(
        assigned.filter(F.col("split") == "test").select("doc_id"),
        em.vec_id == F.col("doc_id"),
    ).select(
        F.col("vec_id").alias("test_doc"), "label",
        F.col("e").alias("ea"),
        norm_col(F.col("e")).alias("na"),
    )
    train = em.join(
        assigned.filter(F.col("split") == "train").select("doc_id"),
        em.vec_id == F.col("doc_id"),
    ).select(
        F.col("vec_id").alias("train_twin"),
        F.col("label").alias("label_b"),
        F.col("e").alias("eb"),
        norm_col(F.col("e")).alias("nb"),
    )
    scored = (
        test.join(train, test.label == train.label_b)
        .filter(F.col("test_doc") != F.col("train_twin"))
        .select(
            "test_doc", "train_twin", "label",
            cosine_prenorm(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cs"),
        )
    )
    w = W.partitionBy("test_doc").orderBy(
        F.desc("cs"), F.asc("train_twin")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "test_doc", "train_twin", "label",
            F.round("cs", 6).alias("cos_sim"),
            (F.col("cs") >= 0.9).alias("is_contaminated"),
        )
    )


# --- x161: IVF-routed semantic contamination (x158's scale path, recall-audited) --------


def _x161_oracle() -> str:
    from .similarity import IVF_DET_CELLS, N_PROBE, _SQL_DOT, _SQL_SQNORM

    def cos(a: str, b: str) -> str:
        return (
            f"{_SQL_DOT.format(a=a, b=b)}"
            f" / (SQRT({_SQL_SQNORM.format(a=a)})"
            f" * SQRT({_SQL_SQNORM.format(a=b)}))"
        )

    return f"""
    WITH assigned AS (
      SELECT doc_id, split FROM ({_x132_oracle()})
    ),
    te AS (
      SELECT e.vec_id AS test_doc, e.label, e.embedding AS ea
      FROM embeddings e
      JOIN assigned s ON s.doc_id = e.vec_id AND s.split = 'test'
    ),
    tr AS (
      SELECT e.vec_id AS train_twin, e.label AS label_b,
             e.embedding AS eb
      FROM embeddings e
      JOIN assigned s ON s.doc_id = e.vec_id AND s.split = 'train'
    ),
    exact AS (
      SELECT test_doc, label, train_twin AS exact_twin,
             cos_sim AS exact_cos
      FROM (
        SELECT t.test_doc, t.label, r.train_twin,
               {cos('t.ea', 'r.eb')} AS cos_sim,
               ROW_NUMBER() OVER (PARTITION BY t.test_doc
                 ORDER BY {cos('t.ea', 'r.eb')} DESC, r.train_twin) AS rn
        FROM te t JOIN tr r
          ON t.label = r.label_b AND t.test_doc <> r.train_twin
      ) WHERE rn = 1
    ),
    cent AS (
      SELECT rn AS cell, embedding AS cv FROM (
        SELECT vec_id, embedding,
               ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        FROM embeddings
      ) WHERE rn <= {IVF_DET_CELLS}
    ),
    ascore AS (
      SELECT e.vec_id, c.cell,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY {cos('e.embedding', 'c.cv')} DESC, c.cell) AS arn
      FROM embeddings e CROSS JOIN cent c
    ),
    tr_cells AS (
      SELECT r.train_twin, r.label_b, r.eb, a.cell
      FROM tr r JOIN (SELECT vec_id, cell FROM ascore WHERE arn = 1) a
        ON a.vec_id = r.train_twin
    ),
    te_probe AS (
      SELECT t.test_doc, t.label, t.ea, a.cell
      FROM te t
      JOIN (SELECT vec_id, cell FROM ascore WHERE arn <= {N_PROBE}) a
        ON a.vec_id = t.test_doc
    ),
    ivf AS (
      SELECT test_doc, train_twin AS ivf_twin, cos_sim AS ivf_cos
      FROM (
        SELECT p.test_doc, c.train_twin,
               {cos('p.ea', 'c.eb')} AS cos_sim,
               ROW_NUMBER() OVER (PARTITION BY p.test_doc
                 ORDER BY {cos('p.ea', 'c.eb')} DESC, c.train_twin) AS rn
        FROM te_probe p JOIN tr_cells c
          ON p.cell = c.cell AND p.label = c.label_b
         AND p.test_doc <> c.train_twin
      ) WHERE rn = 1
    ),
    g AS (
      SELECT e.label, e.test_doc, e.exact_twin, e.exact_cos,
             i.ivf_twin, i.ivf_cos
      FROM exact e LEFT JOIN ivf i USING (test_doc)
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN ivf_twin IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_routed,
           CAST(SUM(CASE WHEN ivf_twin = exact_twin THEN 1 ELSE 0 END)
                AS BIGINT) AS n_twin_match,
           ROUND(CAST(SUM(CASE WHEN ivf_twin = exact_twin
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS twin_recall,
           CAST(SUM(CASE WHEN COALESCE(ivf_cos >= 0.9, FALSE)
                              = (exact_cos >= 0.9)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_agree,
           CASE WHEN SUM(CASE WHEN ivf_cos IS NOT NULL
                         THEN 1 ELSE 0 END) > 0 THEN
             ROUND(CAST(SUM(CASE WHEN ivf_cos IS NOT NULL THEN
                     CAST(ROUND(exact_cos - ivf_cos, 6)
                          AS DECIMAL(18,6))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                   / SUM(CASE WHEN ivf_cos IS NOT NULL
                         THEN 1 ELSE 0 END), 6)
           END AS mean_cos_gap
    FROM g GROUP BY label
    """


@register(
    "x161_ivf_semantic_contamination",
    # x158 answers "which test docs have a train twin" EXACTLY with a
    # label-blocked all-pairs join — correct, but quadratic in the
    # per-label corpus (its own 30x probe replays at 900x the 1x
    # work). x161 is the SCALE PATH for the same question: route each
    # test doc through x86's deterministic IVF (md5-seeded centroids,
    # argmax-cosine cells, nprobe=2) and search only train docs whose
    # cell matches — candidate count is bounded by cell occupancy, not
    # the corpus — then GRADE the route against x158's exact twin per
    # label (twin recall, 0.9-flag agreement, mean cosine gap). The
    # audit needs the exact arm (x86's pattern: recall is measured
    # against ground truth at fixture scale); production runs route
    # only. Exactness: ordered-fold cosines, deterministic md5
    # centroids + tie-broken ranks, once-rounded gap terms summed as
    # DECIMAL.
    oracle=_x161_oracle(),
    doc="x161: IVF-routed semantic cross-split contamination — x158's "
    "nearest-train-twin audit rerouted through the deterministic IVF "
    "index (8 md5-seeded cells, nprobe 2): per label, the routed "
    "twin, its recall against the exact twin, agreement on the 0.9 "
    "contamination flag, and the mean cosine gap. The cell-bounded "
    "candidate join is the 100 TB shape (per-cell occupancy bounds "
    "pair work; the exact arm exists to GRADE it, fixture-scale "
    "only, exactly like x86's recall audit). Completes the "
    "contamination family with its scale path: x158 exact, x161 "
    "routed + self-grading. No reference analog — extension per "
    "brief",
)
def x161_ivf_semantic_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from .dedup import pinned_corpus_signatures
    from .similarity import (
        IVF_DET_CELLS,
        N_PROBE,
        _dbl,
        cosine,
        cosine_prenorm,
        norm_col,
    )

    docs = load_table(spark, sf_dir, "documents")
    assigned = dedup_corpus(
        docs, sigs=pinned_corpus_signatures(spark, sf_dir), cache_key=sf_dir
    ).select(
        "doc_id",
        F.when(
            F.substring(F.md5(F.col("component").cast("string")), 1, 2)
            < _X132_TEST_HEX,
            "test",
        )
        .otherwise("train")
        .alias("split"),
    )
    # r11: per-row norms for the two pairwise stages (see x158; the
    # fan_out variant measured 1.96 s -> 2.21 s and was rejected)
    em = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _dbl("embedding").alias("e")
    )
    te = em.join(
        assigned.filter(F.col("split") == "test").select("doc_id"),
        em.vec_id == F.col("doc_id"),
    ).select(
        F.col("vec_id").alias("test_doc"), "label",
        F.col("e").alias("ea"),
        norm_col(F.col("e")).alias("na"),
    )
    tr = em.join(
        assigned.filter(F.col("split") == "train").select("doc_id"),
        em.vec_id == F.col("doc_id"),
    ).select(
        F.col("vec_id").alias("train_twin"),
        F.col("label").alias("label_b"),
        F.col("e").alias("eb"),
        norm_col(F.col("e")).alias("nb"),
    )
    wq = W.partitionBy("test_doc").orderBy(
        F.desc("cs"), F.asc("train_twin")
    )
    exact = (
        te.join(tr, te.label == tr.label_b)
        .filter(F.col("test_doc") != F.col("train_twin"))
        .select(
            "test_doc", "label", "train_twin",
            cosine_prenorm(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            "test_doc", "label",
            F.col("train_twin").alias("exact_twin"),
            F.col("cs").alias("exact_cos"),
        )
    )
    cent = (
        em.withColumn("hx", F.md5(F.col("vec_id").cast("string")))
        .orderBy("hx", "vec_id")
        .limit(IVF_DET_CELLS)
        .select(
            F.row_number().over(W.orderBy("hx", "vec_id")).alias("cell"),
            F.col("e").alias("cv"),
        )
    )
    ascore = em.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cell",
        F.row_number()
        .over(
            W.partitionBy("vec_id").orderBy(
                F.desc(cosine(F.col("e"), F.col("cv"))), F.asc("cell")
            )
        )
        .alias("arn"),
    )
    tr_cells = tr.join(
        ascore.filter(F.col("arn") == 1).select("vec_id", "cell"),
        tr.train_twin == F.col("vec_id"),
    ).select("train_twin", "label_b", "eb", "nb", "cell")
    te_probe = te.join(
        ascore.filter(F.col("arn") <= N_PROBE).select("vec_id", "cell"),
        te.test_doc == F.col("vec_id"),
    ).select("test_doc", "label", "ea", "na", "cell")
    ivf = (
        te_probe.join(
            tr_cells,
            (te_probe.cell == tr_cells.cell)
            & (te_probe.label == tr_cells.label_b),
        )
        .filter(F.col("test_doc") != F.col("train_twin"))
        .select(
            "test_doc", "train_twin",
            cosine_prenorm(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cs"),
        )
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select(
            "test_doc",
            F.col("train_twin").alias("ivf_twin"),
            F.col("cs").alias("ivf_cos"),
        )
    )
    g = exact.join(ivf, "test_doc", "left")
    return g.groupBy("label").agg(
        F.count("*").cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("ivf_twin").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_routed"),
        F.sum(
            F.when(F.col("ivf_twin") == F.col("exact_twin"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_twin_match"),
        F.round(
            F.sum(
                F.when(
                    F.col("ivf_twin") == F.col("exact_twin"), 1
                ).otherwise(0)
            ).cast("double")
            / F.count("*"),
            6,
        ).alias("twin_recall"),
        F.sum(
            F.when(
                F.coalesce(F.col("ivf_cos") >= 0.9, F.lit(False))
                == (F.col("exact_cos") >= 0.9),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_flag_agree"),
        F.when(
            F.sum(
                F.when(F.col("ivf_cos").isNotNull(), 1).otherwise(0)
            )
            > 0,
            F.round(
                F.sum(
                    F.when(
                        F.col("ivf_cos").isNotNull(),
                        F.round(
                            F.col("exact_cos") - F.col("ivf_cos"), 6
                        ).cast("decimal(18,6)"),
                    ).otherwise(F.lit(0).cast("decimal(18,6)"))
                ).cast("double")
                / F.sum(
                    F.when(F.col("ivf_cos").isNotNull(), 1).otherwise(0)
                ),
                6,
            ),
        ).alias("mean_cos_gap"),
    )
