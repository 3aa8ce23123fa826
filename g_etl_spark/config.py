"""Dataset configuration loader.

Same YAML surface as the reference (config/datasets.yml;
src/g_etl/config_loader.py:16-47,80-91): a ``pipelines`` list of
``{id, datasets: [...]}`` groups — flattened with the pipeline id
injected into each dataset — or the legacy flat ``datasets`` list.
Filtering by id/type/enabled mirrors the CLI (pipeline.py:128-150).

YAML parsing is import-try gated (pyyaml may be absent); configs can
also be passed as already-parsed dicts, which is what tests and
programmatic users do.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any


@dataclass
class DatasetConfig:
    """One dataset flowing through the pipeline (≙ reference
    DatasetConfig, config_loader.py)."""

    id: str
    plugin: str = "parquet"
    pipeline: str = "ext_restr"
    enabled: bool = True
    url: str | None = None
    layer: str | None = None
    encoding: str | None = None
    field_mapping: dict[str, str] = field(default_factory=dict)
    options: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, d: dict[str, Any], pipeline: str | None = None) -> "DatasetConfig":
        known = {f for f in cls.__dataclass_fields__}
        kwargs = {k: v for k, v in d.items() if k in known}
        extra = {k: v for k, v in d.items() if k not in known}
        if extra:
            kwargs.setdefault("options", {}).update(extra)
        if pipeline is not None:
            kwargs["pipeline"] = pipeline
        return cls(**kwargs)


def flatten_config(cfg: dict[str, Any]) -> list[DatasetConfig]:
    """Flatten pipelines-format (or accept legacy flat) config.

    pipelines: [{id: ext_restr, datasets: [{id: a, ...}, ...]}, ...]
      -> [DatasetConfig(id=a, pipeline=ext_restr), ...]
    datasets: [{id: a, pipeline: p, ...}] -> unchanged (legacy).
    """
    out: list[DatasetConfig] = []
    if "pipelines" in cfg:
        for grp in cfg["pipelines"]:
            pid = grp["id"]
            for ds in grp.get("datasets", []):
                out.append(DatasetConfig.from_dict(ds, pipeline=pid))
    elif "datasets" in cfg:
        for ds in cfg["datasets"]:
            out.append(DatasetConfig.from_dict(ds))
    else:
        raise ValueError("config must contain 'pipelines' or 'datasets'")
    return out


def load_datasets_config(path: str) -> list[DatasetConfig]:
    """Load + flatten datasets YAML from disk (requires pyyaml)."""
    try:
        import yaml
    except ImportError as e:  # pragma: no cover - env without pyyaml
        raise ImportError("pyyaml not available; pass parsed dicts to flatten_config") from e
    with open(path, encoding="utf-8") as f:
        return flatten_config(yaml.safe_load(f))


def filter_datasets(
    datasets: list[DatasetConfig],
    ids: list[str] | None = None,
    plugin: str | None = None,
    enabled_only: bool = True,
) -> list[DatasetConfig]:
    """CLI-style dataset selection (≙ pipeline.py:128-150)."""
    out = datasets
    if enabled_only:
        out = [d for d in out if d.enabled]
    if ids:
        wanted = set(ids)
        out = [d for d in out if d.id in wanted]
    if plugin:
        out = [d for d in out if d.plugin == plugin]
    return out
