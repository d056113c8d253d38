#!/usr/bin/env python
"""Fixed single-thread CPU reference for BASELINE epoch notes: the same
integer loop every round, so a box-speed drift (shared-host neighbors,
frequency caps) is measurable instead of argued.  Prints seconds —
LOWER is faster.  Compare against the values recorded in BASELINE.md
before treating a fleet-wide bench inflation as a code regression."""
import time

t0 = time.perf_counter()
s = 0
for i in range(20_000_000):
    s += i * i
print(f"{time.perf_counter() - t0:.3f}")
