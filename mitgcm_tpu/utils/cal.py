"""Calendar package (reference: pkg/cal).

Supports TheCalendar = 'gregorian' (cal_set.F, cal_isleap.F — proper
Gregorian leap rules) and 'model' (360-day year, twelve 30-day months).
The model clock maps myTime [s] to dates via the run start date
(CAL_NML startDate_1/startDate_2, cal_fulldate.F).

All arithmetic is host-side integer seconds; the month-climatology
time-interpolation knots (cal_getmonthsrec.F: month midpoints at
ndaymonth*86400/2 past the month start) are precomputed as absolute
model times so the in-jit forcing interpolation is a plain piecewise
linear lookup that reproduces the reference weights bit-for-bit.
"""

from __future__ import annotations

import calendar as _pycal
from dataclasses import dataclass

_SPD = 86400
_MDAYS = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


@dataclass
class Cal:
    kind: str            # 'gregorian' | 'model' | 'noleap'
    y0: int              # run start date
    m0: int
    d0: int
    s0: int              # seconds within start day

    @classmethod
    def from_namelist(cls, group: dict):
        kind = str(group.get("thecalendar", "model")).strip().lower()
        sd1 = int(group.get("startdate_1", 10101))
        sd2 = int(group.get("startdate_2", 0))
        y, m, d = sd1 // 10000, (sd1 // 100) % 100, sd1 % 100
        s = (sd2 // 10000) * 3600 + ((sd2 // 100) % 100) * 60 + sd2 % 100
        return cls(kind, y, m, d, s)

    # -- calendar primitives ------------------------------------------
    def ndaymonth(self, month: int, year: int) -> int:
        if self.kind == "model":
            return 30
        n = _MDAYS[month - 1]
        if month == 2 and self.kind == "gregorian" \
                and _pycal.isleap(year):
            n = 29
        return n

    def _days_from_epoch(self, y: int, m: int, d: int) -> int:
        """Days since the run start date (can be negative)."""
        if self.kind == "model":
            return ((y - self.y0) * 360 + (m - self.m0) * 30
                    + (d - self.d0))
        if self.kind == "noleap":
            off = (sum(_MDAYS[:m - 1]) + d) - (sum(_MDAYS[:self.m0 - 1])
                                               + self.d0)
            return (y - self.y0) * 365 + off
        import datetime
        return (datetime.date(y, m, d)
                - datetime.date(self.y0, self.m0, self.d0)).days

    def date_to_time(self, yyyymmdd: int, hhmmss: int = 0) -> float:
        """Model time [s] of a date (cal_timepassed.F + cal_toseconds.F)."""
        y, m, d = yyyymmdd // 10000, (yyyymmdd // 100) % 100, yyyymmdd % 100
        s = ((hhmmss // 10000) * 3600 + ((hhmmss // 100) % 100) * 60
             + hhmmss % 100)
        return float(self._days_from_epoch(y, m, d) * _SPD + s - self.s0)

    def month_start_time(self, year: int, month: int) -> float:
        return self.date_to_time(year * 10000 + month * 100 + 1, 0)

    # -- month-climatology knots (cal_getmonthsrec.F) -----------------
    def month_mid_knots(self, t_beg: float, t_end: float):
        """[(mid_time, year, month)] for every month whose midpoint may
        bound the interval [t_beg, t_end]: reference fac interpolates
        linearly between consecutive month midpoints, where the
        midpoint is month start + ndaymonth*86400/2 seconds."""
        # find the month containing t_beg, step back 2 for margin
        y, m = self.y0, self.m0
        # walk backward until month_start <= t_beg
        while self.month_start_time(y, m) > t_beg:
            m -= 1
            if m == 0:
                y, m = y - 1, 12
        for _ in range(2):
            m -= 1
            if m == 0:
                y, m = y - 1, 12
        out = []
        while True:
            mid = (self.month_start_time(y, m)
                   + self.ndaymonth(m, y) * _SPD // 2)
            out.append((float(mid), y, m))
            if mid > t_end + 35 * _SPD:
                break
            m += 1
            if m == 13:
                y, m = y + 1, 1
        return out
