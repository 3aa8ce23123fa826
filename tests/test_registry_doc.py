"""docs/registry.md is generated from the registry — keep it in sync.

A new registered query (or a docstring edit to an existing one) must
be followed by `python -m g_etl_spark.registry_doc`; this test fails
otherwise, so the capability index can never drift from `queries()`.
"""

from pathlib import Path

from g_etl_spark import registry_doc

DOC = Path(__file__).resolve().parents[1] / "docs" / "registry.md"


def test_registry_doc_in_sync():
    assert DOC.exists(), "docs/registry.md missing — run python -m g_etl_spark.registry_doc"
    assert DOC.read_text() == registry_doc.render(), (
        "docs/registry.md is stale — regenerate with "
        "python -m g_etl_spark.registry_doc"
    )


def test_registry_doc_covers_every_query():
    import g_etl_spark.queries as Q

    Q.load_all()
    text = DOC.read_text()
    missing = [n for n in Q._REGISTRY if f"`{n}`" not in text]
    assert not missing, f"queries absent from docs/registry.md: {missing}"
