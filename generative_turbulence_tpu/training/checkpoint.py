"""Orbax checkpointing with an embedded config blob.

Like the reference's ``ConfigInCheckpoint`` + ``WandbModelCheckpoint``
(save-last + top-1 on the monitored metric), every checkpoint directory
carries the full resolved config JSON so evaluation scripts are self-contained
(``turbdiff/callbacks.py:15-16``, ``turbdiff/utils/callbacks.py:16-23``).

Layout:
    <dir>/last/        latest state
    <dir>/best/        best state on the monitor
    <dir>/config.json  resolved config
    <dir>/index.json   {step, best_step, best_value}
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: Path, config_json: Optional[str] = None):
        self.dir = Path(directory).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.checkpointer = ocp.StandardCheckpointer()
        if config_json is not None:
            (self.dir / "config.json").write_text(config_json)
        self._index = self._read_index()

    def _read_index(self) -> Dict[str, Any]:
        f = self.dir / "index.json"
        if f.is_file():
            return json.loads(f.read_text())
        return {"step": None, "best_step": None, "best_value": None}

    def _write_index(self):
        (self.dir / "index.json").write_text(json.dumps(self._index))

    def _save_to(self, name: str, state):
        path = self.dir / name
        if path.exists():
            shutil.rmtree(path)
        self.checkpointer.save(path, state)
        self.checkpointer.wait_until_finished()

    def save_last(self, state, step: int):
        self._save_to("last", state)
        self._index["step"] = int(step)
        self._write_index()

    def save_best(self, state, step: int, value: float):
        prev = self._index.get("best_value")
        if prev is None or value < prev:
            self._save_to("best", state)
            self._index["best_step"] = int(step)
            self._index["best_value"] = float(value)
            self._write_index()
            return True
        return False

    def restore(self, target, which: str = "last"):
        """Restore into the structure of ``target`` (an abstract or concrete
        state pytree)."""
        path = self.dir / which
        if not path.exists():
            raise FileNotFoundError(f"No checkpoint at {path}")
        try:
            return self.checkpointer.restore(path, target=target)
        except Exception as e:
            raise RuntimeError(
                f"Checkpoint at {path} does not match the current train-state "
                "structure (it may have been written by an older framework "
                "version, e.g. before EMA support). Re-train or restore with "
                "a matching config."
            ) from e

    @property
    def config_json(self) -> Optional[str]:
        f = self.dir / "config.json"
        return f.read_text() if f.is_file() else None

    @property
    def last_step(self) -> Optional[int]:
        return self._index.get("step")
