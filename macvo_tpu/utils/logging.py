"""Singleton logger + table helpers (reference: Utility/PrettyPrint.py:90-137)."""

from __future__ import annotations

import csv
import logging
import sys
from pathlib import Path
from typing import Any, Iterable

try:
    from rich.console import Console
    from rich.logging import RichHandler
    from rich.table import Table

    _HAS_RICH = True
except Exception:  # pragma: no cover - rich is baked in, guard anyway
    _HAS_RICH = False


def _build_logger() -> logging.Logger:
    logger = logging.getLogger("macvo_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    if _HAS_RICH:
        handler: logging.Handler = RichHandler(rich_tracebacks=True, show_path=False)
    else:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("[%(levelname)s] %(message)s"))
    logger.addHandler(handler)
    logger.propagate = False
    return logger


Logger = _build_logger()


def print_as_table(headers: list[str], rows: Iterable[list[Any]], title: str | None = None) -> None:
    rows = list(rows)
    if _HAS_RICH:
        table = Table(title=title)
        for h in headers:
            table.add_column(str(h))
        for row in rows:
            table.add_row(*[str(c) for c in row])
        Console().print(table)
    else:
        print(title or "")
        print("\t".join(headers))
        for row in rows:
            print("\t".join(str(c) for c in row))


def save_as_csv(headers: list[str], rows: Iterable[list[Any]], path: str | Path) -> None:
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(headers)
        writer.writerows(rows)
