"""Layered settings precedence: defaults < .env file < environ < CLI
(reference config.py:32-65 + main.py:119-179 semantics)."""

from __future__ import annotations

from gcp_datalake_utils_spark import settings


def test_defaults():
    eff = settings.resolve(environ={})
    assert eff["OUTPUT_FORMAT"] == "mermaid"
    assert eff["TABLE_LAYOUT"] == "auto"
    assert eff["OUTPUT_FILE"] is None


def test_env_file_over_defaults(tmp_path):
    f = tmp_path / ".env"
    f.write_text("# comment\nOUTPUT_FORMAT=plantuml\n"
                 "OUTPUT_FILE='out.puml'\nUNRELATED=x\n")
    eff = settings.resolve(env_file=str(f), environ={})
    assert eff["OUTPUT_FORMAT"] == "plantuml"
    assert eff["OUTPUT_FILE"] == "out.puml"
    assert "UNRELATED" not in eff


def test_environ_over_env_file(tmp_path):
    f = tmp_path / ".env"
    f.write_text("OUTPUT_FORMAT=plantuml\n")
    eff = settings.resolve(env_file=str(f),
                           environ={"OUTPUT_FORMAT": "drawio"})
    assert eff["OUTPUT_FORMAT"] == "drawio"


def test_cli_over_everything(tmp_path):
    f = tmp_path / ".env"
    f.write_text("OUTPUT_FORMAT=plantuml\nTABLE_LAYOUT=grid\n")
    eff = settings.resolve(
        cli={"OUTPUT_FORMAT": "mermaid", "TABLE_LAYOUT": None},
        env_file=str(f), environ={"OUTPUT_FORMAT": "drawio"})
    assert eff["OUTPUT_FORMAT"] == "mermaid"   # CLI wins
    assert eff["TABLE_LAYOUT"] == "grid"       # None CLI does not override


def test_parse_bool():
    assert settings.parse_bool("TRUE") and settings.parse_bool("1")
    assert settings.parse_bool("on") and settings.parse_bool("Yes")
    assert not settings.parse_bool("false")
    assert not settings.parse_bool(None)
    assert settings.parse_bool(None, default=True)


def test_cli_dry_run(tmp_path, capsys):
    from gcp_datalake_utils_spark import erd
    f = tmp_path / ".env"
    f.write_text("TABLE_LAYOUT=force\n")
    rc = erd.main(["--dry-run", "--env-file", str(f),
                   "--format", "plantuml"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "OUTPUT_FORMAT=plantuml" in out
    assert "TABLE_LAYOUT=force" in out
