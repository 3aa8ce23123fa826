"""Field-mapping mini-language → Column compiler.

The reference compiles each ``field_mapping`` entry into a SQL
expression (sql_generator.py:259-269,399-440; config/readme.md:47-63):

- ``$col``    → ``COALESCE(s.col::VARCHAR, '')``  (column reference)
- ``literal`` → ``'literal'``                      (string literal)
- empty/None  → ``''``
- ``data_1..data_5`` always exist, defaulting to ``''``
- unknown keys pass through as extra ``{key}_expr`` variables

Here each entry compiles to a pyspark Column — Catalyst inlines them
exactly like the reference's string substitution, but with real
expression objects (escaping bugs impossible by construction).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# The normalized output contract (≙ aab_ext_restr/001:10-28).
STANDARD_KEYS = ("klass", "grupp", "typ", "leverantor")
DATA_KEYS = tuple(f"data_{i}" for i in range(1, 6))


def compile_value(value: str | None) -> Column:
    """Compile one field_mapping value to a Column."""
    if value is None or value == "":
        return F.lit("")
    if isinstance(value, str) and value.startswith("$"):
        col = value[1:]
        return F.coalesce(F.col(col).cast("string"), F.lit(""))
    return F.lit(str(value))


def compile_mapping(field_mapping: dict[str, str | None]) -> dict[str, Column]:
    """Compile a full field_mapping into named Columns.

    Returns every standard key, data_1..data_5, the source-id
    expression under ``source_id`` (from ``source_id_column``), and
    any unknown keys verbatim (≙ ``{key}_expr`` passthrough,
    sql_generator.py:422-432).
    """
    fm = dict(field_mapping or {})
    out: dict[str, Column] = {}

    source_id = fm.pop("source_id_column", None)
    out["source_id"] = compile_value(source_id)

    for key in STANDARD_KEYS:
        out[key] = compile_value(fm.pop(key, None))
    for key in DATA_KEYS:
        out[key] = compile_value(fm.pop(key, None))

    for key, value in fm.items():  # unknown keys pass through
        out[key] = compile_value(value)
    return out
