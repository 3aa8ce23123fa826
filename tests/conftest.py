"""Shared fixtures — ≙ reference tests/conftest.py:10-80.

Deterministic geo fixtures modeled on FIXTURES.md A1-A4: SWEREF99 TM
coordinates, geometry column under varying names, ~2% invalid bowtie
polygons, ~2% NULL geometries, Swedish chars in attributes.
"""

from __future__ import annotations

import random

import pytest

from g_etl_spark.functions import geo
from g_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Test fixtures are tiny (≤ a few hundred rows; sf0.001 where real
    # data is read), so 32 executor slots and 32 shuffle partitions are
    # pure scheduling overhead here — a fixed 50-test slice measured
    # 154 s at local[32]/32 vs 112 s at local[8]/8 vs 132 s at
    # local[4]/4 (r16; the suite must fit the external verify window).
    # Test-session-only: bench.py and the driver entry honor
    # $SPARK_GRAFT_CPUS unchanged, and query results are partition-
    # count independent (the whole registry is oracle-hash-gated).
    s = get_spark("g_etl_spark_tests", master="local[8]")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    yield s


BBOX = (400000.0, 900000.0, 6200000.0, 7500000.0)  # ≙ FIXTURES.md A1


def _quad(rng: random.Random, size: float = 2000.0):
    x = rng.uniform(BBOX[0], BBOX[1] - size)
    y = rng.uniform(BBOX[2], BBOX[3] - size)
    return [
        (x, y),
        (x + size, y),
        (x + size, y + size),
        (x, y + size),
        (x, y),
    ]


def polygon_rows(n: int = 120, seed: int = 42) -> list[dict]:
    """≙ A1 geo_polygons (models sksbiotopskydd)."""
    rng = random.Random(seed)
    biotyper = ["Aspskog", "Barrskog", "Kalkmark", "Lövbränna", None]
    rows = []
    for i in range(n):
        ring = _quad(rng)
        if i % 50 == 3:  # bowtie: swap two vertices -> self-intersection
            ring = [ring[0], ring[2], ring[1], ring[3], ring[0]]
        geom = None if i % 40 == 7 else geo.to_wkb(("Polygon", [ring]))
        rows.append(
            {
                "beteckn": None if i % 97 == 5 else f"BK-{i:06d}",
                "Biotyp": biotyper[i % len(biotyper)],
                "areal_ha": round(rng.uniform(0.1, 500.0), 2),
                "kommun": ["Umeå", "Växjö", "Örebro"][i % 3],
                "geometry": geom,  # alias name exercises normalization
            }
        )
    return rows


def point_rows(n: int = 80, seed: int = 7) -> list[dict]:
    """≙ A2 geo_points (naturminnen)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x = rng.uniform(BBOX[0], BBOX[1])
        y = rng.uniform(BBOX[2], BBOX[3])
        rows.append(
            {
                "NVRID": f"NVR{i:05d}",
                "NAMN": f"  Naturminne   nr {i}  ",  # exercises clean_text
                "geom": geo.to_wkb(("Point", (x, y))),
            }
        )
    return rows


def line_rows(n: int = 40, seed: int = 11) -> list[dict]:
    """≙ A3 geo_lines (column named 'shape')."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        x = rng.uniform(BBOX[0], BBOX[1] - 5000)
        y = rng.uniform(BBOX[2], BBOX[3] - 5000)
        pts = [(x, y)]
        for _ in range(rng.randint(1, 4)):
            x += rng.uniform(100, 2000)
            y += rng.uniform(-1000, 1000)
            pts.append((x, y))
        rows.append(
            {
                "Objektnr": f"OBJ{i:04d}",
                "Typ": ["stig", "mur", "dike"][i % 3],
                "shape": geo.to_wkb(("LineString", pts)),
            }
        )
    return rows


def avdelning_rows(n: int = 60, seed: int = 13) -> list[dict]:
    """≙ A4 numeric-as-string with unparseable values."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        ring = _quad(rng, 1000.0)
        rows.append(
            {
                "BETECKNING": f"AVD-{i:04d}",
                "NETTOHA": "oklart" if i % 15 == 4 else f"{rng.uniform(0.5, 80):.3f}",
                "M3FUB_HA": f"{rng.uniform(10, 400):.1f}",
                "geom": geo.to_wkb(("Polygon", [ring])),
            }
        )
    return rows


POLYGON_SCHEMA = "beteckn string, Biotyp string, areal_ha double, kommun string, geometry binary"
POINT_SCHEMA = "NVRID string, NAMN string, geom binary"
LINE_SCHEMA = "Objektnr string, Typ string, shape binary"
AVDELNING_SCHEMA = "BETECKNING string, NETTOHA string, M3FUB_HA string, geom binary"
