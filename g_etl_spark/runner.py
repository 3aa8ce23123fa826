"""Pipeline orchestration — ≙ src/g_etl/services/pipeline_runner.py
(SURVEY §3.1).

The reference parallelizes ACROSS datasets with asyncio + thread
executors and a temp DuckDB file per dataset (to dodge file locking,
architecture.md:44-53). On Spark the scheduler owns parallelism
WITHIN each dataset's job; a thread pool still submits datasets
concurrently so independent jobs overlap (same shape as the
reference's extract/transform concurrency, settings.py:89-90) — but
there is no temp-DB machinery to replicate: all jobs share one
SparkSession and write to disjoint warehouse paths.

Run phases (≙ architecture.md:7-42):
  1. extract    plugin → raw/{id}
  2. transform  raw → staging_transform → normalize → mart explode +
                compact (template chain, sql_generator.py:206-255)
  3. merge      implicit (shared warehouse layout)
  4. post-merge grid_stats rollup (≙ 100_mart_h3_index_merged.sql)
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from g_etl_spark import sources, stages, warehouse as wh
from g_etl_spark.config import DatasetConfig
from g_etl_spark.state import StateStore

MAX_CONCURRENT_DATASETS = max(2, (os.cpu_count() or 4) // 2)  # ≙ settings.py:90

# Pipeline → normalize() configuration (≙ the pipeline template dirs:
# aab_ext_restr vs aaa_avdelning with its numeric extra columns)
PIPELINE_NUMERIC_EXTRAS: dict[str, dict[str, int]] = {
    "ext_restr": {},
    "avdelning": {"area": 2, "volym": 0},
}


@dataclass
class RunResult:
    dataset_id: str
    status: str  # "ok" | "skipped" | "error"
    rows: int = 0
    error: str | None = None


@dataclass
class PipelineRunner:
    spark: SparkSession
    warehouse_dir: str
    state: StateStore | None = None
    max_workers: int = field(default=MAX_CONCURRENT_DATASETS)
    _state_lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, compare=False
    )

    def _state(self) -> StateStore:
        # run() calls this from pool threads: without the lock, two
        # threads could both see None and build SEPARATE StateStore
        # instances whose full-dict _save()s then clobber each
        # other's applied entries (observed as a flaky skip-test —
        # one dataset's state row lost on a parallel first run)
        with self._state_lock:
            if self.state is None:
                self.state = StateStore(
                    os.path.join(self.warehouse_dir, "_state.json")
                )
            return self.state

    def _config_fingerprint(self, cfg: DatasetConfig) -> str:
        return repr(
            (cfg.id, cfg.plugin, cfg.pipeline, cfg.url, cfg.layer, cfg.encoding,
             sorted((cfg.field_mapping or {}).items()),
             cfg.options.get("cell_index"))  # index switch => full reindex
        )

    def run_dataset(self, cfg: DatasetConfig, force: bool = False) -> RunResult:
        """extract + transform one dataset end-to-end (≙ the per-
        dataset task in run_parallel_transform, pipeline_runner.py:
        745-926, minus the temp-DB choreography Spark doesn't need)."""
        state = self._state()
        fp = self._config_fingerprint(cfg)
        if not force and state.is_applied("pipeline", cfg.id, fp):
            return RunResult(cfg.id, "skipped")
        try:
            raw = sources.extract(self.spark, cfg)
            raw = stages.normalize_geometry_column(raw)
            wh.write_table(raw, self.warehouse_dir, "raw", cfg.id)

            cell_index = cfg.options.get("cell_index")  # None -> quadtree
            staged = stages.staging_transform(
                wh.read_table(self.spark, self.warehouse_dir, "raw", cfg.id),
                index=cell_index,
            )
            wh.write_table(staged, self.warehouse_dir, "staging", cfg.id)

            staged = wh.read_table(self.spark, self.warehouse_dir, "staging", cfg.id)
            normalized = stages.normalize(
                staged,
                cfg.field_mapping,
                PIPELINE_NUMERIC_EXTRAS.get(cfg.pipeline, {}),
            )
            exploded = stages.explode_cells(normalized)
            wh.write_table(
                exploded, self.warehouse_dir, "mart", cfg.id + wh.GRID_SUFFIX
            )
            # object table with geometry — serves the exact-refine
            # phase of polygon queries (≙ the reference's staging-
            # geometry join, H3_POLYGON_ANALYSIS.md:325-355)
            wh.write_table(
                normalized.select(
                    "id", "source_id", "klass", "leverantor", "geom", "centerpoint"
                ),
                self.warehouse_dir,
                "mart",
                cfg.id + wh.OBJECTS_SUFFIX,
            )
            compact = stages.compact_cells_stage(
                normalized.select(
                    "id", "source_id", "klass", "leverantor",
                    normalized["grid_cells"],
                ),
                index=cell_index,
            )
            wh.write_table(
                compact, self.warehouse_dir, "mart", cfg.id + "_grid_compact"
            )
            n = exploded.count()
            state.mark_applied("pipeline", cfg.id, fp)
            return RunResult(cfg.id, "ok", rows=n)
        except Exception as e:  # noqa: BLE001 - per-dataset isolation
            return RunResult(cfg.id, "error", error=f"{type(e).__name__}: {e}")

    def run(self, datasets: list[DatasetConfig], force: bool = False) -> list[RunResult]:
        """Thread-pooled multi-dataset run + post-merge rollup
        (≙ run_parallel_transform + run_merged_sql)."""
        with ThreadPoolExecutor(max_workers=self.max_workers) as ex:
            results = list(ex.map(lambda c: self.run_dataset(c, force), datasets))
        if any(r.status == "ok" for r in results):
            wh.write_grid_stats(self.spark, self.warehouse_dir)
        return results
