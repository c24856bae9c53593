"""CLI plugin discovery + top-level runner exit-code contract.

Mirrors the reference's plugin loader and runner semantics (ref:
python/src/ouster/cli/core/__init__.py:106-236): plugins under the
plugins namespace auto-import at startup, a plugin that raises on import
warns and is skipped (traceback shown only with --traceback), and run()
maps exception classes to the documented exit codes.
"""

import sys
import textwrap

import click
import pytest

import ouster_sdk_tpu.cli.plugins as plugins_pkg
from ouster_sdk_tpu.cli import cli, find_plugins, run
from ouster_sdk_tpu.cli.runner import SourceArgsException


@pytest.fixture
def plugin_dir(tmp_path):
    """Extend the plugins namespace with a tmpdir and clean up imported
    plugin modules afterwards."""
    plugins_pkg.__path__.append(str(tmp_path))
    before = set(sys.modules)
    try:
        yield tmp_path
    finally:
        plugins_pkg.__path__.remove(str(tmp_path))
        for name in set(sys.modules) - before:
            if name.startswith(plugins_pkg.__name__ + "."):
                del sys.modules[name]


def test_good_plugin_registers_command(plugin_dir, capsys):
    (plugin_dir / "goodplug.py").write_text(textwrap.dedent("""\
        from ouster_sdk_tpu.cli import cli
        import click

        @cli.command("goodplug-hello")
        def hello():
            click.echo("hello from plugin")
    """))
    mods = find_plugins()
    names = [m.name for m in mods]
    assert plugins_pkg.__name__ + ".goodplug" in names
    assert "goodplug-hello" in cli.commands
    # command actually runs
    from click.testing import CliRunner
    res = CliRunner().invoke(cli, ["goodplug-hello"])
    assert res.exit_code == 0 and "hello from plugin" in res.output
    del cli.commands["goodplug-hello"]


def test_bad_plugin_warns_and_skips(plugin_dir, capsys):
    (plugin_dir / "badplug.py").write_text(
        "raise ImportError('synthetic plugin failure')\n")
    (plugin_dir / "okplug.py").write_text("OK = True\n")
    mods = find_plugins()
    err = capsys.readouterr().err
    assert "Failed to load plugin" in err
    assert "badplug" in err and "synthetic plugin failure" in err
    assert "--traceback for debug output" in err
    # traceback suppressed by default
    assert "Traceback (most recent call last)" not in err
    # the good plugin still loaded
    assert any(m.name.endswith(".okplug") for m in mods)


def test_bad_plugin_traceback_flag(plugin_dir, capsys):
    (plugin_dir / "badplug2.py").write_text(
        "raise RuntimeError('boom with detail')\n")
    find_plugins(show_traceback=True)
    err = capsys.readouterr().err
    assert "Traceback (most recent call last)" in err
    assert "boom with detail" in err


def test_plugin_subpackage_modules_load(plugin_dir):
    pkg = plugin_dir / "subpkg"
    pkg.mkdir()
    (pkg / "__init__.py").write_text("")
    (pkg / "inner.py").write_text("LOADED = True\n")
    mods = find_plugins()
    assert any(m.name.endswith("subpkg.inner") for m in mods)
    mod = sys.modules[plugins_pkg.__name__ + ".subpkg.inner"]
    assert mod.LOADED


def _run_code(args, tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))  # invocation log sandbox
    with pytest.raises(SystemExit) as exc:
        run(args=args)
    return exc.value.code


def test_run_exit_code_usage_error(tmp_path, monkeypatch, capsys):
    # click.UsageError carries exit_code 2 (ref exit contract:
    # ClickException -> e.exit_code)
    code = _run_code(["source"], tmp_path, monkeypatch)
    assert code == 2
    assert "Usage:" in capsys.readouterr().err


def test_run_exit_code_client_error(tmp_path, monkeypatch, capsys,
                                    plugin_dir):
    (plugin_dir / "clienterr.py").write_text(textwrap.dedent("""\
        from ouster_sdk_tpu.cli import cli
        from ouster_sdk_tpu.sensor import ClientError

        @cli.command("raise-client-error")
        def rce():
            raise ClientError("no sensor here")
    """))
    code = _run_code(["raise-client-error"], tmp_path, monkeypatch)
    assert code == 2
    assert "Client error: no sensor here" in capsys.readouterr().err
    del cli.commands["raise-client-error"]


def test_run_exit_code_source_args(tmp_path, monkeypatch, capsys,
                                   plugin_dir):
    (plugin_dir / "srcargs.py").write_text(textwrap.dedent("""\
        import click
        from ouster_sdk_tpu.cli import cli
        from ouster_sdk_tpu.cli.runner import SourceArgsException

        @cli.command("raise-source-args",
                     context_settings=dict(ignore_unknown_options=True,
                                           allow_extra_args=True))
        @click.pass_context
        def rsa(ctx):
            raise SourceArgsException(ctx)
    """))
    code = _run_code(["raise-source-args", "bogus", "extra"],
                     tmp_path, monkeypatch)
    assert code == 3
    out = capsys.readouterr().out
    assert "unexpected extra arguments" in out
    assert "bogus extra" in out
    del cli.commands["raise-source-args"]


def test_run_internal_error_traceback(tmp_path, monkeypatch, capsys,
                                      plugin_dir):
    (plugin_dir / "internal.py").write_text(textwrap.dedent("""\
        from ouster_sdk_tpu.cli import cli

        @cli.command("raise-internal")
        def ri():
            raise ValueError("internal boom")
    """))
    # without --traceback: error printed, hint shown, exit code 0
    # (reference quirk: exit_code only set to 4 under --traceback,
    # ref: cli/core/__init__.py:215-225)
    code = _run_code(["raise-internal"], tmp_path, monkeypatch)
    captured = capsys.readouterr()
    assert code == 0
    assert "ERROR: internal boom" in captured.out
    assert "--traceback" in captured.out
    # with --traceback: full trace + exit code 4
    code = _run_code(["--traceback", "raise-internal"], tmp_path,
                     monkeypatch)
    captured = capsys.readouterr()
    assert code == 4
    assert "Traceback" in captured.err
    del cli.commands["raise-internal"]


def test_version_lists_plugins(plugin_dir):
    (plugin_dir / "verplug.py").write_text("X = 1\n")
    from click.testing import CliRunner
    res = CliRunner().invoke(cli, ["--version"])
    assert res.exit_code == 0
    assert "ouster-cli, version" in res.output
    assert "Plugins provided:" in res.output
    assert "verplug" in res.output


def test_source_args_exception_api():
    ctx = click.Context(click.Command("dummy"))
    ctx.args = ["a", "b"]
    e = SourceArgsException(ctx)
    assert e.get_unexpected_args() == ["a", "b"]
    assert isinstance(e.get_usage(), str)
