"""Experiment sandbox: timestamped result directories with config + metadata.

Behavioral parity with the reference Sandbox (Utility/Sandbox.py:56-170): every
run gets a directory containing ``metadata.yaml`` (time, git SHA, argv), a
``config.yaml`` written lazily when assigned, hierarchical child sandboxes via
``children.txt``, and optional atexit auto-removal. Run artifacts written here:
``poses.npy``, ``tensor_map.npz``, ``ref_poses.npy``, ``elapsed_time.json``.
"""

from __future__ import annotations

import atexit
import datetime
import shutil
import subprocess
import sys
from pathlib import Path
from typing import Any, IO

import yaml

from .config import namespace_to_dict


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True, timeout=5
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


class Sandbox:
    def __init__(self, folder: Path) -> None:
        self.folder = Path(folder)
        self._config: Any = None
        self._autoremove = False

    # -- construction ----------------------------------------------------
    @classmethod
    def create(cls, root: str | Path, project_name: str) -> "Sandbox":
        stamp = datetime.datetime.now().strftime("%m_%d_%H%M%S")
        folder = Path(root) / project_name / stamp
        idx = 0
        while folder.exists():
            idx += 1
            folder = Path(root) / project_name / f"{stamp}_{idx}"
        folder.mkdir(parents=True)
        box = cls(folder)
        with open(folder / "metadata.yaml", "w") as f:
            yaml.safe_dump(
                {
                    "time": datetime.datetime.now().isoformat(),
                    "git_sha": _git_sha(),
                    "argv": sys.argv,
                },
                f,
            )
        return box

    @classmethod
    def load(cls, folder: str | Path) -> "Sandbox":
        folder = Path(folder)
        if not folder.exists():
            raise FileNotFoundError(f"Sandbox folder does not exist: {folder}")
        return cls(folder)

    # -- config proxy ----------------------------------------------------
    @property
    def config(self) -> Any:
        if self._config is None and (self.folder / "config.yaml").exists():
            from .config import load_config

            self._config, _ = load_config(self.folder / "config.yaml")
        return self._config

    @config.setter
    def config(self, value: Any) -> None:
        self._config = value
        with open(self.folder / "config.yaml", "w") as f:
            yaml.safe_dump(namespace_to_dict(value), f, sort_keys=False)

    # -- paths -----------------------------------------------------------
    def path(self, name: str) -> Path:
        return self.folder / name

    def open(self, name: str, mode: str = "r") -> IO:
        return open(self.folder / name, mode)

    def __contains__(self, name: str) -> bool:
        return (self.folder / name).exists()

    # -- hierarchy -------------------------------------------------------
    def new_child(self, name: str) -> "Sandbox":
        child_folder = self.folder / name
        child_folder.mkdir(parents=True, exist_ok=True)
        with open(self.folder / "children.txt", "a") as f:
            f.write(name + "\n")
        return Sandbox(child_folder)

    def get_children(self) -> list["Sandbox"]:
        listing = self.folder / "children.txt"
        if not listing.exists():
            return []
        names = [ln.strip() for ln in listing.read_text().splitlines() if ln.strip()]
        return [Sandbox(self.folder / n) for n in names]

    def get_leaves(self) -> list["Sandbox"]:
        """All descendant sandboxes without children (reference:
        Sandbox.get_leaves, used by the plot/eval CLIs' --recursive)."""
        children = self.get_children()
        if not children:
            return [self]
        out: list[Sandbox] = []
        for c in children:
            out.extend(c.get_leaves())
        return out

    # -- cleanup ---------------------------------------------------------
    def set_autoremove(self) -> None:
        if not self._autoremove:
            self._autoremove = True
            atexit.register(self._remove)

    def _remove(self) -> None:
        if self._autoremove and self.folder.exists():
            shutil.rmtree(self.folder, ignore_errors=True)
