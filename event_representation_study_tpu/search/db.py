"""BO-history persistence — the equivalent of gryffin's database_handler/
(sqlite/json/pickle writers for the optimization history;
gryffin.py:479-491 db persistence hooks).

One handler, three formats. Every ``log_observations`` call appends the new
observation dicts (parameters + objective) with a monotonically increasing
``iteration`` stamp; ``load`` returns the full history.
"""
from __future__ import annotations

import json
import pathlib
import pickle
import sqlite3
from typing import Dict, List, Sequence


class DatabaseHandler:
    """``format`` in {"json", "sqlite", "pickle"} (database_handler/)."""

    def __init__(self, path, format: str = "json"):
        if format not in ("json", "sqlite", "pickle"):
            raise ValueError(f"unknown db format: {format}")
        self.path = pathlib.Path(path)
        self.format = format
        self.path.parent.mkdir(parents=True, exist_ok=True)
        if format == "sqlite":
            with sqlite3.connect(self.path) as conn:
                conn.execute(
                    "CREATE TABLE IF NOT EXISTS observations ("
                    "iteration INTEGER, data TEXT)"
                )

    # -- write ---------------------------------------------------------
    def log_observations(self, observations: Sequence[Dict]):
        existing = self.load()
        start = len(existing)
        stamped = [
            dict(o, iteration=start + i) for i, o in enumerate(observations)
        ]
        if self.format == "sqlite":
            with sqlite3.connect(self.path) as conn:
                conn.executemany(
                    "INSERT INTO observations VALUES (?, ?)",
                    [(o["iteration"], json.dumps(o, default=float)) for o in stamped],
                )
        elif self.format == "json":
            all_obs = existing + stamped
            self.path.write_text(json.dumps(all_obs, indent=1, default=float))
        else:
            all_obs = existing + stamped
            with open(self.path, "wb") as f:
                pickle.dump(all_obs, f)

    # -- read ----------------------------------------------------------
    def load(self) -> List[Dict]:
        if not self.path.exists():
            return []
        if self.format == "sqlite":
            with sqlite3.connect(self.path) as conn:
                rows = conn.execute(
                    "SELECT data FROM observations ORDER BY iteration"
                ).fetchall()
            return [json.loads(r[0]) for r in rows]
        if self.format == "json":
            return json.loads(self.path.read_text())
        with open(self.path, "rb") as f:
            return pickle.load(f)
