"""Presentation-layer number formatting (SURVEY.md §2.8 F12).

Reproduces the reference UI's ``format()`` (reference
web/js/app.js:43-51): null → '-', non-finite → its JS string form,
otherwise ≤2 fraction digits (ECMA-402 default "halfExpand" rounding,
i.e. half away from zero), trailing zeros dropped, and the integer
part grouped with SPACES ("1 234 567.89").

Driver-side by design — the reference formats client-side, and report
rendering is the only consumer; the engine's query outputs stay
numeric. Kept here so a reference user migrating their report layer
gets identical strings, including for string-typed inputs (JS
``Number()`` coercion: '' → 0, hex literals parse, 'inf' does NOT)
and extreme magnitudes (ICU expands the double's shortest decimal
repr to fixed notation even at 1e308).
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal, localcontext

# JS Number() decimal grammar (after trimming): optional sign,
# digits with optional fraction OR bare fraction, optional exponent.
_JS_DECIMAL = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
_JS_INFINITY = re.compile(r"^[+-]?Infinity$")


def _js_number(s: str) -> float:
    """JS ``Number(string)`` semantics (the cases Python's float()
    gets wrong: '' and whitespace are 0, hex/octal/binary literals
    parse, 'inf'/'nan' do NOT — only the exact 'Infinity' token)."""
    t = s.strip()
    if t == "":
        return 0.0
    if _JS_INFINITY.match(t):
        return float("-inf") if t.startswith("-") else float("inf")
    if re.match(r"^0[xX][0-9a-fA-F]+$", t):
        return float(int(t, 16))
    if re.match(r"^0[oO][0-7]+$", t):
        return float(int(t, 8))
    if re.match(r"^0[bB][01]+$", t):
        return float(int(t, 2))
    if _JS_DECIMAL.match(t):
        return float(t)
    return float("nan")


def format_number(num: object) -> str:
    """Format a number exactly as the reference UI does."""
    if num is None:
        return "-"
    if isinstance(num, str):
        value = _js_number(num)
        if not math.isfinite(value):
            # JS: non-finite coercions fall through to String(num) of
            # the ORIGINAL input — format(' Infinity ') keeps the
            # padding; only non-string inputs normalize below.
            return num
    else:
        try:
            value = float(num)
        except (TypeError, ValueError):
            return str(num)
        except OverflowError:
            # int too large for a double: JS Number() gives ±Infinity
            value = float("-inf") if num < 0 else float("inf")  # type: ignore[operator]
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    # ICU (and therefore JS toLocaleString) rounds the double's
    # SHORTEST decimal representation, not its exact binary expansion:
    # 2.675 (binary ...74999) formats as "2.68". Python repr() is the
    # same shortest round-trip decimal, so quantize from that, half
    # away from zero (ECMA-402 "halfExpand"). Doubles reach ~1e308 →
    # the default 28-digit context would overflow; widen it.
    with localcontext() as ctx:
        ctx.prec = 350
        q = Decimal(repr(value)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    # Sign from the INPUT (not the quantized value): -0.004 → "-0",
    # matching JS. copy_abs() is context-free — plain abs() would
    # re-round a >28-digit coefficient to the default precision.
    sign = "-" if math.copysign(1.0, value) < 0 else ""
    int_part, _, frac = str(q.copy_abs()).partition(".")
    frac = frac.rstrip("0")
    grouped = f"{int(int_part):,}".replace(",", " ")
    return f"{sign}{grouped}.{frac}" if frac else f"{sign}{grouped}"
