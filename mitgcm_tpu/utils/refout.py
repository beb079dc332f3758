"""Parser for reference STDOUT logs (verification/*/results/output*.txt).

Extracts the `%MON` statistic time series and the cg2d residual lines —
the same signals the reference's testreport greps (verification/testreport
`testoutput_var`, :125-191) — so our tests digit-compare directly against
the committed reference outputs.
"""

from __future__ import annotations

import re
from typing import Dict, List

_MON_RE = re.compile(
    r"%MON\s+(\S+)\s*=\s*([-+0-9.ED]+)")
_CG_RE = re.compile(
    r"cg2d_init_res\s*=\s*([-+0-9.ED]+)")
_CG_ITERS_RE = re.compile(
    r"cg2d_iters\(min,last\)\s*=\s*(-?\d+)\s+(\d+)")


def _f(tok: str) -> float:
    return float(tok.replace("D", "E"))


def parse_monitor_series(path: str) -> List[Dict[str, float]]:
    """Return one dict per monitor event, keyed by stat name, in order.

    Events are delimited by `%MON time_tsnumber` lines; cg2d_init_res lines
    between events are attached to the FOLLOWING event (the reference
    prints the solver residual of step N just before the monitor block of
    step N — solve_for_pressure.F:338 then forward_step.F tail MONITOR).
    """
    events: List[Dict[str, float]] = []
    cur: Dict[str, float] = {}
    pending_cg: Dict[str, float] = {}
    with open(path, errors="replace") as f:
        for line in f:
            mcg = _CG_RE.search(line)
            if mcg:
                pending_cg["cg2d_init_res"] = _f(mcg.group(1))
                continue
            mit = _CG_ITERS_RE.search(line)
            if mit:
                pending_cg["cg2d_iters"] = int(mit.group(2))
                continue
            m = _MON_RE.search(line)
            if not m:
                continue
            name, val = m.group(1), _f(m.group(2))
            if name == "time_tsnumber":
                if cur:
                    events.append(cur)
                cur = {"iter": int(val)}
                cur.update(pending_cg)
                pending_cg = {}
            elif cur:
                cur[name] = val
    if cur:
        events.append(cur)
    return events


def matching_digits(a: float, b: float) -> int:
    """Significant-digit agreement, mirroring testreport:125-191 semantics."""
    if a == b:
        return 16
    if a == 0.0 or b == 0.0:
        return 0
    denom = 0.5 * (abs(a) + abs(b))
    rel = abs(a - b) / denom
    if rel == 0.0:
        return 16
    import math
    return max(0, int(-math.log10(rel)))
