"""Presentation-layer number formatting (SURVEY.md §2.8 F12).

Reproduces the reference UI's ``format()`` (reference
web/js/app.js:43-51): null → '-', non-finite → its JS string form,
otherwise ≤2 fraction digits (ECMA-402 default "halfExpand" rounding,
i.e. half away from zero), trailing zeros dropped, and the integer
part grouped with SPACES ("1 234 567.89").

Driver-side by design — the reference formats client-side, and report
rendering is the only consumer; the engine's query outputs stay
numeric. Kept here so a reference user migrating their report layer
gets identical strings.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal


def format_number(num: object) -> str:
    """Format a number exactly as the reference UI does."""
    if num is None:
        return "-"
    try:
        value = float(num)
    except (TypeError, ValueError):
        return str(num)
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    # ICU (and therefore JS toLocaleString) rounds the double's
    # SHORTEST decimal representation, not its exact binary expansion:
    # 2.675 (binary ...74999) formats as "2.68". Python repr() is the
    # same shortest round-trip decimal, so quantize from that, half
    # away from zero (ECMA-402 "halfExpand").
    q = Decimal(repr(value)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    # Sign from the INPUT (not the quantized value): -0.004 → "-0",
    # matching JS.
    sign = "-" if math.copysign(1.0, value) < 0 else ""
    int_part, _, frac = str(abs(q)).partition(".")
    frac = frac.rstrip("0")
    grouped = f"{int(int_part):,}".replace(",", " ")
    return f"{sign}{grouped}.{frac}" if frac else f"{sign}{grouped}"
