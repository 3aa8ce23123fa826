"""Generated capability → query map (docs/registry.md).

The registry (g_etl_spark/queries) is the engine's declared operator
inventory; with ~300 named queries across 10 modules a user needs an
index. This module renders one markdown table per query module from
the registered functions' docstrings (first paragraph = the
capability summary, by house convention), plus per-module and total
counts and the oracle-gating status.

Regenerate after adding queries:

    python -m g_etl_spark.registry_doc        # rewrites docs/registry.md

tests/test_registry_doc.py asserts the committed file matches the
rendered output, so a new query without a doc refresh fails CI.
"""

from __future__ import annotations

import re
from pathlib import Path

_HEADER = """# Query registry index

<!-- GENERATED FILE — do not edit by hand.
     Regenerate with: python -m g_etl_spark.registry_doc -->

Every operator the engine implements is a named query in
`g_etl_spark/queries/` — a Spark callable `(spark, sf_dir) ->
DataFrame` plus (where SQL-expressible) a DuckDB oracle the
correctness gate hash-compares against at two scale factors.  This
index maps capability to query name, grouped by module.  "gated"
means the query has a DuckDB oracle (full value-hash compare);
"rows-only" means the driver records a weaker row-count check
(reserved for genuinely non-SQL-expressible operators).
"""

_MODULE_BLURBS = {
    "dedup": "Deduplication & linkage — exact/fingerprint/MinHash-LSH/"
    "SimHash/n-gram/embedding dedup, clustering, entity resolution, "
    "graph analytics, decontamination, golden records",
    "grid": "Spatial grid index — polyfill, polygon serving, heatmaps, "
    "tiles, hotspot clustering, spatial scan",
    "multimodal": "Multimodal binary columns — decode manifests, keyframe "
    "fan-out, resize plumbing",
    "relational": "Relational core — TPC-H shapes, window/agg/join "
    "surfaces, statistics, experimentation, forecasting",
    "sampling": "Sampling & mixtures — deterministic/stratified/weighted "
    "sampling, domain mixtures, splits",
    "similarity": "Embedding similarity — ANN (brute/SRP/IVF/PQ/int8), "
    "SemDeDup, embedding QA, PCA/gram/quantile transforms",
    "sketches": "Mergeable sketches — HLL, KMV, Bloom, Count-Min, "
    "log-histogram quantiles, capture-recapture",
    "streaming_equiv": "Structured Streaming — real readStream pipelines "
    "hash-gated against batch oracles (sessionization, watermark "
    "dedup, stream-static joins, restarts)",
    "text": "Text analysis — quality/langid/token stats, C4/Gopher "
    "filters, BM25/TF-IDF retrieval, chunking, tokenizer audits",
    "windows": "Window & time-series — as-of/range joins, sessionization, "
    "retention, anomaly/changepoint, survival, uplift/Qini",
}


def _summary(doc: str | None) -> str:
    """First docstring paragraph, whitespace-collapsed, sentence-cut
    at ~200 chars so the table stays scannable."""
    if not doc:
        return "(undocumented)"
    para = doc.strip().split("\n\n", 1)[0]
    text = re.sub(r"\s+", " ", para).strip()
    if len(text) <= 200:
        return text
    cut = text[:200]
    # prefer a sentence boundary, else a word boundary
    dot = cut.rfind(". ")
    if dot > 80:
        return cut[: dot + 1]
    return cut[: cut.rfind(" ")] + " …"


def _qnum(name: str) -> tuple[int, str]:
    m = re.match(r"q(\d+)", name)
    return (int(m.group(1)) if m else 10**9, name)


def render() -> str:
    import g_etl_spark.queries as Q

    Q.load_all()
    by_module: dict[str, list[tuple[str, str, str]]] = {}
    n_gated = 0
    for name, (fn, oracle) in Q._REGISTRY.items():
        module = fn.__module__.rsplit(".", 1)[-1]
        status = "gated" if oracle else "rows-only"
        n_gated += oracle is not None
        by_module.setdefault(module, []).append((name, status, _summary(fn.__doc__)))

    lines = [_HEADER]
    total = sum(len(v) for v in by_module.values())
    lines.append(
        f"**{total} queries / {n_gated} oracle-gated / "
        f"{total - n_gated} rows-only, across {len(by_module)} modules.**\n"
    )
    for module in sorted(by_module):
        rows = sorted(by_module[module], key=lambda r: _qnum(r[0]))
        blurb = _MODULE_BLURBS.get(module, "")
        lines.append(f"\n## {module} ({len(rows)})\n")
        if blurb:
            lines.append(f"{blurb}.\n")
        lines.append("| Query | Oracle | Capability |")
        lines.append("|---|---|---|")
        for name, status, summary in rows:
            summary = summary.replace("|", "\\|")
            lines.append(f"| `{name}` | {status} | {summary} |")
    return "\n".join(lines) + "\n"


_OPS_HEADER = """# Operators API index

<!-- GENERATED FILE — do not edit by hand.
     Regenerate with: python -m g_etl_spark.registry_doc -->

`g_etl_spark/operators/` is the REUSABLE surface beneath the query
registry: functions a user calls directly on their own DataFrames
(the qNN queries are oracle-gated exercises of these plus inline
plans). One table per module, one row per public function/class with
its signature and first docstring sentence.
"""


def _first_sentence(doc: str | None) -> str:
    if not doc:
        return "(undocumented)"
    text = re.sub(r"\s+", " ", doc.strip().split("\n\n", 1)[0]).strip()
    dot = text.find(". ")
    return text[: dot + 1] if 0 < dot < 240 else (text[:240] if len(text) > 240 else text)


def render_operators() -> str:
    import importlib
    import inspect
    import pkgutil

    import g_etl_spark.operators as ops_pkg

    lines = [_OPS_HEADER]
    modules = sorted(
        m.name for m in pkgutil.iter_modules(ops_pkg.__path__) if not m.name.startswith("_")
    )
    for modname in modules:
        mod = importlib.import_module(f"g_etl_spark.operators.{modname}")
        pub = [
            (n, obj)
            for n, obj in vars(mod).items()
            if not n.startswith("_")
            and (inspect.isfunction(obj) or inspect.isclass(obj))
            and getattr(obj, "__module__", None) == mod.__name__
        ]
        if not pub:
            continue
        blurb = _first_sentence(mod.__doc__)
        lines.append(f"\n## operators.{modname}\n")
        lines.append(f"{blurb}\n")
        lines.append("| Symbol | Signature | Does |")
        lines.append("|---|---|---|")
        for n, obj in sorted(pub):
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = "(…)"
            sig = re.sub(r"\s+", " ", sig)
            if len(sig) > 110:
                sig = sig[:107] + "…"
            doc = _first_sentence(obj.__doc__).replace("|", "\\|")
            lines.append(f"| `{n}` | `{sig}` | {doc} |")
    return "\n".join(lines) + "\n"


def main() -> None:
    docs = Path(__file__).resolve().parents[1] / "docs"
    out = docs / "registry.md"
    out.write_text(render())
    print(f"wrote {out}")
    ops_out = docs / "operators.md"
    ops_out.write_text(render_operators())
    print(f"wrote {ops_out}")


if __name__ == "__main__":
    main()
