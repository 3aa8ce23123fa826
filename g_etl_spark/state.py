"""Incremental-run state tracking — ≙ src/g_etl/migrations/migrator.py.

The reference records applied (template, dataset) pairs with an md5
checksum in a ``_migrations`` table and skips unchanged work on
re-runs (migrator.py:81,102-112,488-507; pipeline_runner.py:637-643).
Same semantics here: a JSON state file keyed ``stage:dataset`` with a
checksum; content change → re-run, unchanged → skip.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
from datetime import datetime, timezone


class StateStore:
    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        self._state: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                self._state = json.load(f)

    @staticmethod
    def checksum(content: str) -> str:
        return hashlib.md5(content.encode()).hexdigest()

    def _key(self, stage: str, dataset_id: str) -> str:
        return f"{stage}:{dataset_id}"

    def is_applied(self, stage: str, dataset_id: str, content: str) -> bool:
        """≙ migrator.py:497-507: applied AND checksum unchanged."""
        entry = self._state.get(self._key(stage, dataset_id))
        return bool(entry) and entry["checksum"] == self.checksum(content)

    def mark_applied(self, stage: str, dataset_id: str, content: str) -> None:
        with self._lock:
            self._state[self._key(stage, dataset_id)] = {
                "checksum": self.checksum(content),
                "applied_at": datetime.now(timezone.utc).isoformat(),
            }
            self._save()

    def applied_keys(self, stage: str) -> list[str]:
        """Dataset ids with an applied entry for ``stage`` (the admin
        dashboard's 'what has run' list)."""
        prefix = f"{stage}:"
        return [k[len(prefix):] for k in self._state if k.startswith(prefix)]

    def reset(self, stage: str | None = None, dataset_id: str | None = None) -> None:
        with self._lock:
            keys = [
                k
                for k in self._state
                if (stage is None or k.startswith(f"{stage}:"))
                and (dataset_id is None or k.endswith(f":{dataset_id}"))
            ]
            for k in keys:
                del self._state[k]
            self._save()

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(self._state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)
