"""glava-tpu-config: the glava-config capability as a CLI + REPL.

Covers the scriptable subcommands (module discovery, knob docs,
get/set round-trip, resolved-config dump, request schema, profiles)
and the interactive session (reference glava-config/main.lua:47-54's
module browser + option editing, as a terminal REPL)."""

import io

import pytest

from glava_tpu import config_tool


def run(capsys, *argv):
    rc = config_tool.main(list(argv))
    out = capsys.readouterr()
    return rc, out.out, out.err


def test_modules_lists_native_modules(capsys):
    rc, out, _ = run(capsys, "modules")
    assert rc == 0
    for m in ("bars", "radial", "graph", "wave", "circle"):
        assert m in out


def test_requests_schema(capsys):
    rc, out, _ = run(capsys, "requests")
    assert rc == 0
    assert "#request setgeometry int int int int" in out
    assert "#request mod string" in out


def test_knobs_set_get_roundtrip(tmp_path, capsys):
    rc, out, _ = run(capsys, "--config-dir", str(tmp_path),
                     "set", "bars", "BAR_WIDTH", "8")
    assert rc == 0 and "BAR_WIDTH" in out
    rc, out, _ = run(capsys, "--config-dir", str(tmp_path),
                     "get", "bars", "BAR_WIDTH")
    assert rc == 0 and out.strip() == "8"
    # user override wins and is labelled in the knob listing
    rc, out, _ = run(capsys, "--config-dir", str(tmp_path), "knobs", "bars")
    assert rc == 0
    assert "BAR_WIDTH = 8   [user]" in out
    # unknown knob: clear error, nonzero exit
    rc, _, err = run(capsys, "--config-dir", str(tmp_path),
                     "get", "bars", "NO_SUCH_KNOB")
    assert rc == 1 and "not found" in err


def test_show_dumps_resolved_config(capsys):
    rc, out, _ = run(capsys, "show")
    assert rc == 0
    assert "bufsize = " in out and "sample_rate = " in out


def test_profile_new_and_list(tmp_path, capsys):
    rc, out, _ = run(capsys, "--config-dir", str(tmp_path),
                     "profile", "new", "work")
    assert rc == 0 and "work" in out
    assert (tmp_path / "profiles" / "work" / "rc.glsl").is_file()
    rc, out, _ = run(capsys, "--config-dir", str(tmp_path),
                     "profile", "list")
    assert rc == 0 and "work" in out


def test_interactive_session(tmp_path, capsys):
    """A piped interactive session: select a module, edit a knob,
    read it back; unknown commands and argparse errors must not kill
    the session."""
    script = io.StringIO(
        "help\n"
        "modules\n"
        "use bars\n"
        "set BAR_WIDTH 9\n"
        "get BAR_WIDTH\n"
        "bogus\n"
        "knobs\n"
        "quit\n"
    )

    class Args:
        config_dir = str(tmp_path)

    rc = config_tool.cmd_interactive(Args(), stdin=script)
    out = capsys.readouterr()
    assert rc == 0
    assert "commands:" in out.out          # help
    assert "bars" in out.out               # modules
    assert "set BAR_WIDTH = 9" in out.out  # set echo
    assert "\n9\n" in out.out              # get
    assert "unknown command 'bogus'" in out.err
    assert "BAR_WIDTH = 9   [user]" in out.out  # knobs sees the edit


def test_interactive_requires_module_for_get(capsys):
    rc = config_tool.cmd_interactive(
        type("A", (), {"config_dir": None})(),
        stdin=io.StringIO("get BAR_WIDTH\nquit\n"))
    out = capsys.readouterr()
    assert rc == 0
    assert "no module selected" in out.err


def test_interactive_entry_via_main(tmp_path, capsys, monkeypatch):
    """`glava-tpu-config interactive` wires through argparse."""
    monkeypatch.setattr("sys.stdin", io.StringIO("quit\n"))
    rc = config_tool.main(["--config-dir", str(tmp_path), "interactive"])
    assert rc == 0
    assert "interactive config" in capsys.readouterr().out
