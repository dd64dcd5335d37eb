#!/usr/bin/env python
"""Regenerate OPERATORS.md: the registry index (name, oracle status, doc).

Usage: python tools/dump_operators.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
import smart_water_management_spark as swm  # noqa: F401  (registry side effects)
from smart_water_management_spark.registry import _REGISTRY

GROUPS = [
    ("s", "Sources / sinks (SURVEY §2.1)"),
    ("p", "Projections / filters / predicates / pipeline (§2.2, §3.1)"),
    ("j", "Joins (§2.3 + as-of/range extensions)"),
    ("a", "Aggregations (§2.4)"),
    ("w", "Window functions (§2.5)"),
    ("o", "Sorts / top-k (§2.6)"),
    ("u", "Set operations (§2.7)"),
    ("f", "Scalar functions & UDF tiers (§2.8, §2.12)"),
    ("v", "Data-quality validation (§2.9)"),
    ("m", "ML analytics (§2.10)"),
    ("t", "Streaming / incremental (§2.11)"),
    ("c", "Warehouse / catalog (§2.13)"),
    ("q", "Dashboard SQL suite (§2.14)"),
    ("k", "Skew & layout patterns (§4.4)"),
    ("d", "Dedup primitives"),
    ("x", "LLM-data extensions (dedup, similarity, text, multimodal)"),
]


def main() -> None:
    lines = [
        "# OPERATORS — registry index",
        "",
        "Every implemented operator, auto-generated from the query registry",
        "(`tools/dump_operators.py`). *oracle* = exact DuckDB cross-check at",
        "sf0.01 (the driver's correctness gate); *rows-only* = executes with",
        "invariants asserted in tests instead (hash-seeded / ML / streaming-",
        "state results that no portable SQL reproduces).",
        "",
    ]
    total = with_oracle = 0
    for prefix, title in GROUPS:
        names = sorted(n for n in _REGISTRY if n.startswith(prefix))
        if not names:
            continue
        lines += [f"## {title}", "", "| query | check | what it proves |", "|---|---|---|"]
        for n in names:
            spec = _REGISTRY[n]
            total += 1
            with_oracle += spec.oracle is not None
            check = "oracle" if spec.oracle is not None else "rows-only"
            doc = " ".join(spec.doc.split())
            lines.append(f"| `{n}` | {check} | {doc} |")
        lines.append("")
    lines[7:7] = ["", f"**{total} queries, {with_oracle} oracle-checked.**"]
    with open("OPERATORS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote OPERATORS.md ({total} queries, {with_oracle} oracles)")


if __name__ == "__main__":
    main()
