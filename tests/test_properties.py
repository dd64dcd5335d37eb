"""Property-based tests (hypothesis): equivalences that must hold for ANY
input, not just the fixtures — the strongest form of the engine's
"optimized plan ≡ naive plan" claims.

Each property runs a bounded number of examples (Spark jobs are not
microseconds) over small generated datasets; the properties themselves
are scale-free, so passing here certifies the algebra, and the physical
plan tests certify the execution strategy.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from smart_water_management_spark.llmdata.components import connected_components
from smart_water_management_spark.operators.skew import salted_sum_count
from smart_water_management_spark.plans.scd import scd2_merge

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

finite_values = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), finite_values),
        min_size=1,
        max_size=60,
    )
)
def test_salted_agg_equals_plain_agg(spark, rows):
    """Salting must never change the aggregate: sum/count per key identical
    to the single-phase groupBy for arbitrary keys and values."""
    df = spark.createDataFrame(rows, "k string, v double")
    salted = {
        r.k: (r.total_value, r.n_rows)
        for r in salted_sum_count(df, "k", "v", n_salts=4).collect()
    }
    plain = {
        r.k: (float(r.s), r.c)
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(27,6)")).cast("double").alias("s"),
            F.count("*").alias("c"),
        )
        .collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert math.isclose(salted[k][0], plain[k][0], rel_tol=0, abs_tol=1e-6)


@SETTINGS
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_connected_components_match_union_find(spark, edges):
    """Distributed label propagation must agree with a driver union-find
    on arbitrary graphs (self-loops dropped, as in the LSH pair output)."""
    edges = [(a, b) for a, b in edges if a != b]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == expected


@SETTINGS
@given(
    updates=st.dictionaries(
        st.integers(1, 20),
        st.tuples(st.sampled_from(["X", "Y", "Z"]), st.integers(0, 3)),
        max_size=12,
    )
)
def test_scd2_invariants_hold_for_any_update_batch(spark, updates):
    """For ANY incoming batch: exactly one current row per key, closed
    rows have end dates, unchanged re-sends create no new versions."""
    base = [(k, "X", float(k)) for k in range(1, 21)]
    current = spark.createDataFrame(
        [(k, s, v, "2024-01-01", None, True) for k, s, v in base],
        "c_custkey long, c_mktsegment string, c_acctbal double, "
        "effective_date string, end_date string, is_current boolean",
    ).select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.col("effective_date").cast("date").alias("effective_date"),
        F.col("end_date").cast("date").alias("end_date"),
        "is_current",
    )
    incoming = spark.createDataFrame(
        [(k, seg, float(bal)) for k, (seg, bal) in updates.items()]
        or [(999, "X", 999.0)],
        "c_custkey long, c_mktsegment string, c_acctbal double",
    )
    merged = scd2_merge(
        current, incoming, "c_custkey", ["c_mktsegment", "c_acctbal"], "2024-06-01"
    ).collect()

    by_key: dict[int, list] = {}
    for r in merged:
        by_key.setdefault(r.c_custkey, []).append(r)
    for k, rows in by_key.items():
        currents = [r for r in rows if r.is_current]
        assert len(currents) == 1, f"key {k}: {len(currents)} current rows"
        for r in rows:
            assert r.is_current == (r.end_date is None)
        changed = k in updates and updates[k] != ("X", k) and (
            updates[k][0] != "X" or float(updates[k][1]) != float(k)
        )
        if k <= 20:
            assert len(rows) == (2 if changed else 1), (k, updates.get(k), rows)


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2000)),  # (user, second)
        min_size=2,
        max_size=40,
        unique=True,
    )
)
def test_bucketized_range_join_equals_naive(spark, rows):
    """The bucketized equi-join rewrite must count exactly the same
    neighbors as the naive quadratic theta join, for any event layout —
    including events straddling bucket boundaries."""
    from smart_water_management_spark.operators.joins import (
        bucketized_neighbor_counts,
    )

    data = [(i, u, s) for i, (u, s) in enumerate(rows)]
    df = spark.createDataFrame(data, "event_id long, user_id long, sec long").select(
        "event_id", "user_id", F.timestamp_seconds("sec").alias("ts")
    )
    window = 60
    fast = {
        r.event_id: r.n_nearby
        for r in bucketized_neighbor_counts(df, df, window).collect()
    }
    naive: dict[int, int] = {}
    for i, u, s in data:
        n = sum(
            1
            for j, v, t in data
            if j != i and v == u and abs(t - s) <= window
        )
        if n:
            naive[i] = n
    assert fast == naive


@pytest.mark.parametrize("n_parts", [4, 32])
def test_stratified_sample_partition_stability(spark, n_parts):
    """x22/p05's md5-threshold sampler claims partition-layout
    independence (each row's keep decision is a pure function of the row,
    never of rand() or partition position). Prove it: the sampled doc_id
    set must be IDENTICAL under different repartitionings — the property
    that makes the sample reproducible when a 100 TB input's split count
    changes between runs."""
    from smart_water_management_spark.llmdata import curation
    from smart_water_management_spark.sources.catalog import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    baseline = {
        r.doc_id for r in curation.stratified_sample_rows(docs).collect()
    }
    repartitioned = docs.repartition(n_parts)
    sampled = {
        r.doc_id
        for r in curation.stratified_sample_rows(repartitioned).collect()
    }
    assert sampled == baseline
    assert 0 < len(baseline) < docs.count()


@SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),          # by-key
            st.integers(min_value=0, max_value=50),  # left time
        ),
        min_size=1,
        max_size=25,
    ),
    anchors=st.lists(
        st.tuples(
            st.sampled_from(["u1", "u2"]),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=999),  # payload
        ),
        min_size=0,
        max_size=15,
        unique_by=lambda a: (a[0], a[1]),  # one anchor per (key, time)
    ),
)
def test_asof_join_matches_bruteforce(spark, rows, anchors):
    """The union+carry as-of join must equal the brute-force definition
    (max right time <= left time per key, payload of that row) for ANY
    inputs — including keys with no anchors and duplicate left times."""
    from smart_water_management_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(rows)], "id long, k string, t long"
    )
    right = spark.createDataFrame(anchors, "k string, t long, payload long")
    out = asof_join(left, right, on="t", by="k", right_cols=["payload"]).collect()
    # exactly one output row per left row (a set compare alone would hide
    # duplicate emissions)
    assert len(out) == len(rows)
    got = {(r["id"], r["payload"]) for r in out}
    want = set()
    for i, (k, t) in enumerate(rows):
        cands = [(at, p) for (ak, at, p) in anchors if ak == k and at <= t]
        want.add((i, max(cands)[1] if cands else None))
    assert got == want


@pytest.mark.parametrize("n_parts", [4, 32])
def test_source_cap_partition_stability_and_audit(spark, n_parts):
    """x47's md5-rank cap claims the same partition-layout independence as
    x22 (rank is a pure function of doc_id within its source). The kept
    set must be identical under repartitioning, respect the cap, and
    reconcile exactly with the registered audit aggregate."""
    from smart_water_management_spark.llmdata.curation import (
        CAP_PER_SOURCE,
        source_cap_rows,
        x47_source_cap_sample,
    )
    from smart_water_management_spark.sources.catalog import load_table

    from .conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    baseline = {r.doc_id for r in source_cap_rows(docs).collect()}
    kept = {
        r.doc_id for r in source_cap_rows(docs.repartition(n_parts)).collect()
    }
    assert kept == baseline

    per_source = {}
    for r in source_cap_rows(docs).collect():
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert max(per_source.values()) <= CAP_PER_SOURCE

    audit = {
        r.source: (r.n_total, r.n_kept)
        for r in x47_source_cap_sample(spark, SF_DIR).collect()
    }
    for src, (n_total, n_kept) in audit.items():
        assert n_kept == min(n_total, CAP_PER_SOURCE)
        assert per_source.get(src, 0) == n_kept


@SETTINGS
@given(
    vals=st.lists(finite_values, min_size=1, max_size=40),
)
def test_rolling_median_equals_naive(spark, vals):
    """w17's percentile(0.5) window must equal the literal sorted-middle
    (interpolated) median of each 7-row trailing slice for arbitrary
    doubles."""
    from pyspark.sql import Window as W

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i long, v double")
    w = W.orderBy("i").rowsBetween(-6, 0)
    got = {
        r.i: r.med
        for r in df.select(
            "i", F.percentile("v", F.lit(0.5)).over(w).alias("med")
        ).collect()
    }
    for i in range(len(vals)):
        window = sorted(vals[max(0, i - 6) : i + 1])
        n = len(window)
        if n % 2:
            exp = window[n // 2]
        else:
            exp = (window[n // 2 - 1] + window[n // 2]) / 2.0
        assert got[i] == pytest.approx(exp, rel=1e-12, abs=1e-12), (i, vals)


@SETTINGS
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=2, max_size=8
        ),
        min_size=1,
        max_size=6,
    )
)
def test_bigram_counts_equal_naive(spark, docs):
    """x50's index-transform bigram extraction must produce exactly the
    adjacent-pair multiset a per-doc python loop produces."""
    naive: dict[tuple[str, str], int] = {}
    for d in docs:
        for a, b in zip(d, d[1:]):
            naive[(a, b)] = naive.get((a, b), 0) + 1

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    pairs = (
        df.select(F.split(F.lower("text"), " ").alias("tk"))
        .select(
            F.explode(
                F.expr(
                    "transform(slice(tk, 1, size(tk)-1), "
                    "(w, i) -> struct(w AS w1, tk[i+1] AS w2))"
                )
            ).alias("bg")
        )
        .groupBy("bg.w1", "bg.w2")
        .count()
    )
    got = {(r.w1, r.w2): r["count"] for r in pairs.collect()}
    assert got == naive


@SETTINGS
@given(
    uids=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=300),
    n_slices=st.integers(min_value=1, max_value=6),
)
def test_kmv_merge_equals_direct_for_any_slicing(uids, n_slices):
    """The exact-reaggregation law behind a24/t14, as pure math over ANY
    multiset and ANY partitioning: merging per-slice k-min sets (dedupe,
    re-top-k) always equals the k smallest distinct hashes computed
    directly. This is the property that lets sketch partials be built
    per-day/per-shard/per-micro-batch interchangeably."""
    import hashlib

    from smart_water_management_spark.operators.aggregations import (
        _KMV_HEX,
        KMV_K,
    )

    def h(u):
        return hashlib.md5(str(u).encode()).hexdigest()[:_KMV_HEX]

    direct = sorted({h(u) for u in uids})[:KMV_K]
    slices = [uids[i::n_slices] for i in range(n_slices)]
    partials = [sorted({h(u) for u in s})[:KMV_K] for s in slices if s]
    merged = sorted(set().union(*partials))[:KMV_K] if partials else []
    assert merged == direct


def test_a42_kendall_tau_matches_bruteforce(spark):
    """a42's cell-grid tau-b must equal the O(n^2) textbook definition
    computed directly over the raw (quantity, discount) rows."""
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    got = _REGISTRY["a42_kendall_tau"].fn(spark, SF_DIR).collect()[0]
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_quantity", "l_discount"
    ).collect()
    x = np.array([int(r.l_quantity) for r in li], dtype=np.int64)
    y = np.array([int(round(r.l_discount * 100)) for r in li], dtype=np.int64)
    n = len(x)
    conc = disc = 0
    # chunked sign comparison (n ~ 6k at sf0.001 -> 36M pairs, fine)
    for i in range(0, n, 512):
        xi = x[i : i + 512][:, None]
        yi = y[i : i + 512][:, None]
        sx = np.sign(x[None, :] - xi)
        sy = np.sign(y[None, :] - yi)
        prod = sx * sy
        conc += int((prod > 0).sum())
        disc += int((prod < 0).sum())
    conc //= 2
    disc //= 2
    assert got.concordant == conc and got.discordant == disc
    tx = sum(c * (c - 1) // 2 for c in np.bincount(x))
    ty = sum(c * (c - 1) // 2 for c in np.bincount(y))
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / np.sqrt(float(n0 - tx) * float(n0 - ty))
    assert abs(got.tau_b - round(tau, 9)) <= 1e-9


def test_m29_kaplan_meier_curve_properties(spark):
    """KM invariants: survival starts <= 1, is non-increasing in d, is
    positive while anyone remains at risk, and at-risk counts strictly
    decrease as duration grows."""
    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    rows = sorted(
        _REGISTRY["m29_kaplan_meier"].fn(spark, SF_DIR).collect(),
        key=lambda r: r.d_hours,
    )
    assert rows
    prev_s, prev_n = 1.0 + 1e-12, None
    for r in rows:
        # survival may legitimately reach exactly 0.0 when the LAST
        # at-risk user converts (factor 1 - 1/1); never negative
        assert 0.0 <= r.survival <= prev_s + 1e-12, r
        if r.n_at_risk > r.n_events:
            assert r.survival > 0.0, r
        assert r.n_at_risk >= 1 and r.n_events >= 0, r
        if prev_n is not None:
            assert r.n_at_risk < prev_n, r
        prev_s, prev_n = r.survival, r.n_at_risk


def test_x135_apportionment_exactness(spark):
    """Hamilton-method invariants: quotas sum exactly to the budget, and
    every source is within one seat of its exact proportional share."""
    from smart_water_management_spark.llmdata.curation import _X135_N
    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    rows = _REGISTRY["x135_eval_quota_apportionment"].fn(
        spark, SF_DIR
    ).collect()
    total = sum(r.n_docs for r in rows)
    assert sum(r.quota for r in rows) == _X135_N
    for r in rows:
        exact = _X135_N * r.n_docs / total
        assert abs(r.quota - exact) < 1.0, (r.source, r.quota, exact)
        assert r.quota in (r.quota_floor, r.quota_floor + 1)


def test_a43_wilson_interval_properties(spark):
    """Wilson bounds always bracket the rate inside [0, 1], and the
    interval is nonempty for every finite n."""
    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    for r in _REGISTRY["a43_wilson_intervals"].fn(spark, SF_DIR).collect():
        assert 0.0 <= r.wilson_lo <= r.rate <= r.wilson_hi <= 1.0, r
        assert r.wilson_hi > r.wilson_lo, r


def test_a48_doubled_u_matches_bruteforce_pairs(spark):
    """The a48 grid fold must equal the pairwise DEFINITION of the
    doubled U statistic (2 per O>F pair, 1 per tie) — an independent
    check of the value-domain device itself, not shared with the DuckDB
    oracle's formula strings."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(l_quantity AS BIGINT) AS v, l_linestatus AS s "
        f"FROM '{SF_DIR}/lineitem.parquet' WHERE l_linestatus IN ('O','F')"
    ).df()
    con.close()
    qo = np.sort(df[df.s == "O"].v.values)
    qf = np.sort(df[df.s == "F"].v.values)
    # for each O value: #F strictly below and #F equal, via searchsorted
    lo = np.searchsorted(qf, qo, side="left")
    hi = np.searchsorted(qf, qo, side="right")
    u2_brute = int(2 * lo.sum() + (hi - lo).sum())
    (row,) = _REGISTRY["a48_mann_whitney"].fn(spark, SF_DIR).collect()
    assert row.u2_o == u2_brute
    assert row.n_o == len(qo) and row.n_f == len(qf)


def test_a49_doubled_j_matches_bruteforce_pairs(spark):
    """The a49 grid-pair self-join must equal the pairwise DEFINITION of
    the doubled Jonckheere J (2 per increasing pair across ordered year
    groups, 1 per tie)."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr, "
        "CAST(l_quantity AS BIGINT) AS v "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).df()
    con.close()
    groups = {
        yr: np.sort(sub.v.values) for yr, sub in df.groupby("yr")
    }
    years = sorted(groups)
    j2_brute = 0
    for i, ya in enumerate(years):
        for yb in years[i + 1 :]:
            a, b = groups[ya], groups[yb]
            lo = np.searchsorted(b, a, side="left")
            hi = np.searchsorted(b, a, side="right")
            # pairs with b-value ABOVE a-value count 2; ties count 1
            j2_brute += int(2 * (len(b) - hi).sum() + (hi - lo).sum())
    (row,) = (
        _REGISTRY["a49_jonckheere_terpstra"].fn(spark, SF_DIR).collect()
    )
    assert row.j2 == j2_brute
    assert row.n_groups == len(years)


def test_a51_pair_counts_match_bruteforce(spark):
    """a51's grid self-join C/D and the marginal tie folds must equal
    the pairwise DEFINITIONS (concordant/discordant/tied-on-V-only over
    all row pairs with distinct years) — independent of the oracle's
    formula strings."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr, "
        "CAST(l_quantity AS BIGINT) AS v "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).df()
    con.close()
    groups = {yr: np.sort(sub.v.values) for yr, sub in df.groupby("yr")}
    years = sorted(groups)
    c_brute = d_brute = tv_only2_brute = 0
    for i, ya in enumerate(years):
        for yb in years[i + 1 :]:
            a, b = groups[ya], groups[yb]
            lo = np.searchsorted(b, a, side="left")
            hi = np.searchsorted(b, a, side="right")
            c_brute += int((len(b) - hi).sum())   # b strictly above a
            d_brute += int(lo.sum())              # b strictly below a
            tv_only2_brute += 2 * int((hi - lo).sum())  # tied on v, years differ
    (row,) = _REGISTRY["a51_gamma_somers_tauc"].fn(spark, SF_DIR).collect()
    assert row.c_pairs == c_brute
    assert row.d_pairs == d_brute
    assert row.tied_v_only2 == tv_only2_brute
    assert row.n_years == len(years)
    # gamma/somers/tau_c bracket sanity on the ratios themselves
    assert -1.0 <= row.tau_c <= row.somers_d <= row.gamma <= 1.0 or (
        -1.0 <= row.gamma <= row.somers_d <= row.tau_c <= 1.0
    )


def test_a52_median_and_split_match_bruteforce(spark):
    """a52's sort-free grand median and per-flag above-median counts
    must equal the naive sorted-array computation."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(l_quantity AS BIGINT) AS v, l_returnflag AS g "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).df()
    con.close()
    vs = np.sort(df.v.values)
    n = len(vs)
    med = int(vs[(n - 1) // 2])  # lower median == MIN(v): 2*cum(<=v) >= N
    (row,) = _REGISTRY["a52_mood_median_test"].fn(spark, SF_DIR).collect()
    assert row.median_v == med
    for flag, ncol, acol in (
        ("A", "n_a", "a_a"), ("N", "n_n", "a_n"), ("R", "n_r", "a_r")
    ):
        sub = df[df.g == flag].v.values
        assert getattr(row, ncol) == len(sub)
        assert getattr(row, acol) == int((sub > med).sum())
    assert row.chi2_stat >= 0.0


def test_a53_ab_statistic_matches_bruteforce_ranks(spark):
    """a53's grid fold must equal the textbook Ansari-Bradley statistic
    computed from explicit midranks on the pooled sorted sample
    (doubled to stay integer)."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(l_quantity AS BIGINT) AS v, l_linestatus AS s "
        f"FROM '{SF_DIR}/lineitem.parquet' WHERE l_linestatus IN ('O','F')"
    ).df()
    con.close()
    pooled = np.sort(df.v.values)
    n = len(pooled)
    # doubled midrank of value v: 2*cum(<v) + count(v) + 1
    uniq, counts = np.unique(pooled, return_counts=True)
    cum_lt = np.concatenate(([0], np.cumsum(counts)[:-1]))
    dr = 2 * cum_lt + counts + 1
    ds = np.minimum(dr, 2 * (n + 1) - dr)
    score = dict(zip(uniq.tolist(), ds.tolist()))
    qo = df[df.s == "O"].v.values
    ab2_brute = int(sum(score[v] for v in qo.tolist()))
    (row,) = _REGISTRY["a53_ansari_bradley"].fn(spark, SF_DIR).collect()
    assert row.ab2_stat == ab2_brute
    assert row.n_o == len(qo)
    assert row.n_rows == n


def test_x157_bound_is_sound_and_prunes(spark):
    """Cauchy-Schwarz soundness end-to-end: no top-k member may fall
    under the kth-score bound (violations must be zero for EVERY query),
    and the bound must actually prune something on real data."""
    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    rows = _REGISTRY["x157_norm_bound_prune_audit"].fn(
        spark, SF_DIR
    ).collect()
    assert rows, "no query rows"
    for r in rows:
        assert r.n_bound_violations == 0, r
        assert 0 <= r.n_prunable <= r.n_candidates, r
        assert abs(r.prune_rate - round(r.n_prunable / r.n_candidates, 6)) < 1e-9
    assert sum(r.n_prunable for r in rows) > 0, "bound never pruned"


def test_a55_t_matches_bruteforce_ecdf(spark):
    """The a55 grid fold must equal the ECDF DEFINITION of the
    two-sample Cramér-von Mises T = nm/N^2 * sum over all observations
    of (F_n - G_m)^2 — an independent numpy check of the value-domain
    device, not shared with the DuckDB oracle's formula strings."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(l_quantity AS BIGINT) AS v, l_linestatus AS s "
        f"FROM '{SF_DIR}/lineitem.parquet' WHERE l_linestatus IN ('O','F')"
    ).df()
    con.close()
    qo = np.sort(df[df.s == "O"].v.values)
    qf = np.sort(df[df.s == "F"].v.values)
    allv = np.concatenate([qo, qf])
    n, m = len(qo), len(qf)
    fn = np.searchsorted(qo, allv, side="right") / n
    gm = np.searchsorted(qf, allv, side="right") / m
    t_brute = n * m / (n + m) ** 2 * ((fn - gm) ** 2).sum()
    (row,) = _REGISTRY["a55_cramer_von_mises"].fn(spark, SF_DIR).collect()
    assert row.n_o == n and row.n_f == m
    # the engine rounds per-cell terms at 12 dp; the brute-force sum is
    # unrounded, so compare to the statistic's own display precision
    assert abs(row.t_cvm - t_brute) < 5e-7, (row.t_cvm, t_brute)


def test_a56_l_matches_bruteforce_ranks(spark):
    """The a56 window fold must equal the rank DEFINITION of Page's
    L = sum_j j * R_j over complete Monday-anchored weeks, with
    scipy-style midranks — doubled to match the engine's L2."""
    import duckdb as _dd

    import pandas as pd

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    daily = con.execute(
        "SELECT event_type, "
        "CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)"
        " / 86400.0) AS BIGINT) AS day, "
        "CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS xm "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2"
    ).df()
    con.close()
    daily["wk"] = daily.day // 7
    daily["dow"] = daily.day % 7
    want = {}
    for et, sub in daily.groupby("event_type"):
        l2, n = 0, 0
        for _, blk in sub.groupby("wk"):
            if len(blk) != 7:
                continue
            n += 1
            r = blk.xm.rank(method="average")  # midranks
            l2 += int(round((2 * r * (blk.dow + 1)).sum()))
        if n:
            want[et] = (n, l2)
    got = {
        r.event_type: (r.n_weeks, r.l2_stat)
        for r in _REGISTRY["a56_page_trend_test"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_m44_u_matches_bruteforce_pairs(spark):
    """The m44 difference-array device must equal the pairwise
    DEFINITION of Pettitt's U_t and K = max|U_t| — brute-force over the
    daily grid in numpy."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    daily = con.execute(
        "SELECT event_type, "
        "CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)"
        " / 86400.0) AS BIGINT) AS day, "
        "CAST(SUM(CAST(value AS DECIMAL(27,6))) * 1000000 AS BIGINT) AS xm "
        f"FROM '{SF_DIR}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).df()
    con.close()
    want = {}
    for et, sub in daily.groupby("event_type"):
        x = sub.xm.values
        days = sub.day.values
        t_n = len(x)
        if t_n < 2:
            continue
        sgn = np.sign(x[None, :] - x[:, None])  # sgn(x_j - x_i)
        u = np.array(
            [sgn[: t + 1, t + 1:].sum() for t in range(t_n - 1)]
        )
        k = int(np.abs(u).max())
        cp = int(days[int(np.argmax(np.abs(u)))])
        want[et] = (t_n, k, cp)
    got = {
        r.event_type: (r.n_days, r.k_stat, r.change_day)
        for r in _REGISTRY["m44_pettitt_test"].fn(spark, SF_DIR).collect()
    }
    assert got == want


def test_m43_runs_matches_bruteforce_sequence(spark):
    """The m43 lag-window fold must equal a direct python scan of the
    residual sign sequence (runs = number of maximal same-sign blocks)."""
    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    rows = _REGISTRY["m43_runs_test"].fn(spark, SF_DIR).collect()
    # rebuild the sign sequences exactly as m41/m43 define them, via the
    # engine itself but through the independent m41 residual path
    import duckdb as _dd

    con = _dd.connect()
    seq = con.execute(
        """
        WITH hourly AS (
          SELECT event_type,
                 CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) - 1704067200)
                            / 3600.0) AS BIGINT) AS h,
                 SUM(CAST(value AS DECIMAL(27,6))) AS hv
          FROM events GROUP BY 1, 2
        ),
        t AS (SELECT event_type, CAST(h AS DOUBLE) AS x,
                     CAST(hv AS DOUBLE) AS y, h FROM hourly),
        m AS (SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                     SUM(x*x) AS sxx, SUM(x*y) AS sxy
              FROM t GROUP BY event_type),
        r AS (SELECT t.event_type, t.h,
                     t.y - ((m.sy - (m.n*m.sxy - m.sx*m.sy)
                             / (m.n*m.sxx - m.sx*m.sx) * m.sx) / m.n
                            + (m.n*m.sxy - m.sx*m.sy)
                              / (m.n*m.sxx - m.sx*m.sx) * t.x) AS e
              FROM t JOIN m USING (event_type) WHERE m.n > 2)
        SELECT event_type, h, e FROM r ORDER BY event_type, h
        """.replace("FROM events", f"FROM '{SF_DIR}/events.parquet'")
    ).df()
    con.close()
    for row in rows:
        sub = seq[seq.event_type == row.event_type]
        signs = [1 if e > 1e-9 else 0 for e in sub.e.values]
        runs = 1 + sum(
            1 for a, b in zip(signs, signs[1:]) if a != b
        )
        n1 = sum(signs)
        # the brute path recomputes residuals in float (not the engine's
        # micro-quantization), so signs can flip only for residuals
        # within a micro of zero; counts must still agree
        assert abs(row.runs - runs) <= 2, row
        assert abs(row.n_pos - n1) <= 2, row


def test_a58_a2_matches_bruteforce_midranks(spark):
    """The a58 doubled-integer grid fold must equal the Scholz-Stephens
    midrank DEFINITION of the two-sample A2_akN computed directly in
    numpy over distinct values (the same form scipy's anderson_ksamp
    uses with midrank=True)."""
    import duckdb as _dd
    import numpy as np

    from smart_water_management_spark.registry import _REGISTRY

    from .conftest import SF_DIR

    con = _dd.connect()
    df = con.execute(
        "SELECT CAST(l_quantity AS BIGINT) AS v, l_linestatus AS s "
        f"FROM '{SF_DIR}/lineitem.parquet' WHERE l_linestatus IN ('O','F')"
    ).df()
    con.close()
    vals = np.sort(df.v.unique())
    co = np.array([(df[(df.v == v) & (df.s == "O")]).shape[0] for v in vals])
    cf = np.array([(df[(df.v == v) & (df.s == "F")]).shape[0] for v in vals])
    l = co + cf
    n, m = co.sum(), cf.sum()
    N = n + m
    cum_less = np.concatenate([[0], np.cumsum(l)[:-1]])
    cumo_less = np.concatenate([[0], np.cumsum(co)[:-1]])
    B = cum_less + l / 2.0  # midrank combined cumulative
    M = cumo_less + co / 2.0
    denom = B * (N - B) - N * l / 4.0
    ok = denom > 0
    t1 = (l[ok] / N * (N * M[ok] - n * B[ok]) ** 2 / denom[ok]).sum()
    a2_brute = (N - 1) / N * (1.0 / n + 1.0 / m) * t1
    (row,) = _REGISTRY["a58_anderson_darling"].fn(spark, SF_DIR).collect()
    assert row.n_o == n and row.n_f == m
    # engine rounds per-cell terms at 12 dp; compare at display precision
    assert abs(row.a2_stat - a2_brute) < 5e-7, (row.a2_stat, a2_brute)
