"""Simple stage timing with forced host readback.

The reference's perf drivers use std::chrono + CUDA events (reference:
test/performance/timing.cuh). On this backend, completion must be forced
with a host transfer (block_until_ready is unreliable on the loopback
relay), so Timer.stage reads back one element of its result.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import numpy as np

__all__ = ["Timer"]


class Timer:
    def __init__(self):
        self.times: Dict[str, float] = {}

    def stage(self, name: str, fn: Callable, *args, **kwargs) -> Any:
        t0 = time.time()
        out = fn(*args, **kwargs)
        # force completion through one leaf
        leaf = jax.tree_util.tree_leaves(out)
        if leaf:
            np.asarray(leaf[0])
        self.times[name] = self.times.get(name, 0.0) + (time.time() - t0)
        return out

    def report(self) -> str:
        total = sum(self.times.values())
        lines = [f"{k}: {v*1000:.1f} ms" for k, v in self.times.items()]
        lines.append(f"total: {total*1000:.1f} ms")
        return "\n".join(lines)
