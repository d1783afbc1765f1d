"""Progress reporting (src/util/Progressifier.{h,cpp}): timestamped
percentage line printed every >= 5% of total work."""

from __future__ import annotations

import datetime
import sys


class Progressifier:
    def __init__(self, total: int, min_delta_pct: float = 5.0, stream=None):
        self.total = max(int(total), 1)
        self.min_delta = min_delta_pct
        self.last_pct = -1e9
        self.stream = stream or sys.stderr

    def update(self, done: int) -> None:
        pct = 100.0 * done / self.total
        if pct - self.last_pct >= self.min_delta or done == self.total:
            ts = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            print(f"[{ts}] {pct:.0f}% ({done}/{self.total})", file=self.stream)
            self.last_pct = pct
