"""Hex color literal parsing (``#RRGGBBAA`` and friends).

Matches ``ext_parse_color`` (glava/glsl_ext.c:88-122): an optional
``0x`` prefix, then up to 8 hex chars consumed in 2-char components
mapped to [0, 1]; missing components keep defaults (r=g=b=0, a=1);
a trailing incomplete component is ignored.
"""

from __future__ import annotations

_HEX = "0123456789abcdefABCDEF"


def parse_color(text: str) -> tuple[float, float, float, float] | None:
    """Return (r, g, b, a) floats in [0, 1], or None if invalid."""
    if text.startswith(("0x", "0X")):
        text = text[2:]
    out = [0.0, 0.0, 0.0, 1.0]
    comp = 0
    i = 0
    text = text[:8]
    for ch in text:
        if ch not in _HEX:
            return None
    while i + 1 < len(text) and comp < 4:
        out[comp] = int(text[i : i + 2], 16) / 255.0
        comp += 1
        i += 2
    return tuple(out)
