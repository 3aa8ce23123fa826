"""Core expression functions — the reference's ``g_*`` macro layer
(sql/migrations/003_db_makros.sql:98-131) as Column builders.

These are compositions of Spark built-ins: Catalyst inlines them
(same property as DuckDB macro expansion), everything stays inside
whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def clean_text(c: Column) -> Column:
    """≙ g_clean_text (003:98-102): TRIM + collapse whitespace runs."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def empty_to_null(c: Column) -> Column:
    """≙ g_empty_to_null (003:104-109)."""
    return F.when(F.trim(c) == "", F.lit(None).cast("string")).otherwise(c)


def format_date_iso(c: Column) -> Column:
    """≙ g_format_date_iso (003:127-131): strftime '%Y-%m-%d'."""
    return F.date_format(c, "yyyy-MM-dd")


def generate_id(seed: Column) -> Column:
    """≙ g_generate_id (003:124-125): md5(seed || now).

    NONDETERMINISTIC by construction (like the reference macro) —
    excluded from oracle checks; prefer source_id_md5 for stable ids.
    """
    return F.md5(F.concat(seed.cast("string"), F.current_timestamp().cast("string")))


def classification(grupp: Column, typ: Column) -> Column:
    """≙ the classification concat (aab_ext_restr/002:16):
    COALESCE(NULLIF(grupp,''),'-') || '.' || COALESCE(NULLIF(typ,''),'-')."""
    return F.concat_ws(
        ".",
        F.coalesce(F.nullif(grupp, F.lit("")), F.lit("-")),
        F.coalesce(F.nullif(typ, F.lit("")), F.lit("-")),
    )


def source_id_md5(id_col: Column) -> Column:
    """≙ `_source_id_md5 = MD5(CAST(id AS VARCHAR))` (004:40, 003:111-115)."""
    return F.md5(id_col.cast("string"))


def attr_md5(*cols: Column) -> Column:
    """≙ `_attr_md5 = MD5(to_json(s))` (004:38) — canonical '|' concat
    instead of JSON so the hash is engine-independent (SURVEY §7 #3)."""
    return F.md5(F.concat_ws("|", *[c.cast("string") for c in cols]))


def json_data(struct_cols: dict[str, Column], include_nulls: bool = False) -> Column:
    """≙ `_json_data = to_json(s)` minus the geometry key (004:39).

    Built directly from the non-geometry columns instead of
    regex-stripping the key out of a serialized blob (the reference's
    approach, 003:117-118) — same result, structurally safe.

    ``include_nulls=True`` emits ``"k":null`` entries like DuckDB's
    ``to_json`` does — required for byte-compat with the reference
    export format (tests/test_export_streaming.py pins the hash
    equality); the default omits null keys (Spark's native behavior,
    what the internal pipeline stores).
    """
    struct = F.struct(*[c.alias(name) for name, c in struct_cols.items()])
    if include_nulls:
        return F.to_json(struct, {"ignoreNullFields": "false"})
    return F.to_json(struct)


def area_to_hectares(area_m2: Column) -> Column:
    """≙ g_area_ha (003:32-36)."""
    return F.round(area_m2 / F.lit(10000.0), 2)


def numeric_cleanup(c: Column, decimals: int) -> Column:
    """≙ `round(TRY_CAST(x AS FLOAT), n)` (aaa_avdelning/001:18-19).

    Cast to DOUBLE rather than FLOAT: same NULL-on-failure semantics,
    but the rounded value is actually representable (float32 can't
    hold most 2-decimal values exactly)."""
    return F.round(c.cast("string").try_cast("double"), decimals)
