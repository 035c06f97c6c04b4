#!/usr/bin/env python
"""Rank top-level instructions of a compiled interpreted-module step by
HBM traffic (output + operand bytes), to locate the interpreter's
residual plane traffic.  CPU lowering as proxy.

Usage: python scripts/cost_hlo_rank.py <module> [top_n]
"""

import re
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from cost_interp import build  # noqa: E402

DT_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "u8": 1, "f64": 8,
            "s64": 8, "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1}

SHAPE_RE = re.compile(r"(f32|s32|u32|pred|u8|f64|s64|bf16|f16|s16|u16|s8)"
                      r"\[([\d,]*)\]")


def shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(s):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def main() -> None:
    module = sys.argv[1] if len(sys.argv) > 1 else "circle"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    name, knobs = (("graph", "#define ANTI_ALIAS 1\n")
                   if module == "graph_aa" else (module, ""))
    r = build(name, knobs, True)

    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, r.cfg.bufsize)).astype(np.float32) * 0.3)

    def step(state, snap):
        s, fr = r.step(state, snap, True, jnp.float32(0.0), jnp.float32(1.0),
                       jnp.float32(0.05), {})
        return s, fr.sum()

    st = r.init_state()
    compiled = jax.jit(step).lower(st, snap).compile()
    txt = compiled.as_text()

    # entry computation only: lines between "ENTRY" and its closing brace.
    # Optimized HLO prints operands as bare names — resolve operand bytes
    # by looking up each named operand's own output shape.
    entry = txt[txt.index("ENTRY"):]
    parsed = []
    out_bytes: dict[str, int] = {}
    for line in entry.splitlines()[1:]:
        line = line.strip()
        if line == "}":
            break
        m = re.match(r"(?:ROOT )?(%?[\w.\-]+) = (.*)", line)
        if not m:
            continue
        lhs, rhs = m.groups()
        # leading output shape: a single shape token, or a
        # parenthesized tuple shape for multi-output instructions
        if rhs[0] == "(":
            depth = 0
            for j, ch in enumerate(rhs):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    break
            shape_s, rest = rhs[:j + 1], rhs[j + 1:].lstrip()
        else:
            shape_s, _, rest = rhs.partition(" ")
        out_b = shape_bytes(shape_s)
        out_bytes[lhs.lstrip("%")] = out_b
        if not rest.strip():
            continue
        op = rest.split("(")[0].strip() if "(" in rest else rest.split()[0]
        # operand list: the first (...) after the op name
        args = ""
        paren = rhs.find("(", rhs.index(rest) + len(op))
        if paren >= 0:
            depth, j = 0, paren
            for j in range(paren, len(rhs)):
                depth += rhs[j] == "("
                depth -= rhs[j] == ")"
                if depth == 0:
                    break
            args = rhs[paren + 1:j]
        operands = re.findall(r"%([\w.\-]+)", args)
        parsed.append((lhs, op, out_b, operands))

    rows = []
    for lhs, op, out_b, operands in parsed:
        in_b = sum(out_bytes.get(o, 0) for o in operands)
        rows.append((out_b + in_b, op, lhs, out_b, in_b))

    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"entry total (out+in) = {total/1e6:.1f} MB over "
          f"{len(rows)} instructions")
    for t, op, lhs, ob, ib in rows[:top_n]:
        print(f"{t/1e6:9.1f} MB  out={ob/1e6:7.1f} in={ib/1e6:7.1f}  "
              f"{op:<28} {lhs[:70]}")


if __name__ == "__main__":
    main()
