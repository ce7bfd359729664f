"""Structured JSONL logging (SURVEY §5.5 build target) — replaces the
reference's bare ``print`` of formatted scalars (``train.py:234-236``)."""

from __future__ import annotations

import json
import sys
import time
from typing import IO, Optional


class JsonlLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = True):
        self._fh: Optional[IO] = open(path, "a") if path else None
        self._echo = echo
        self._t0 = time.time()

    def __call__(self, record: dict):
        record = {"t": round(time.time() - self._t0, 3), **record}
        line = json.dumps(record, default=float)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        if self._echo:
            print(line, file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
