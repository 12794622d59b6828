"""Layered runtime settings for the CLI (reference ``config.py:32-65`` +
``main.py:119-179`` semantics, without the dotenv dependency).

Precedence, lowest to highest:

1. built-in defaults
2. ``.env`` file (``KEY=VALUE`` lines; never overrides a variable already
   present in the process environment — ``load_dotenv`` behavior)
3. process environment variables
4. explicit CLI flags

Setting names mirror the reference's environment contract
(``OUTPUT_FORMAT``, ``OUTPUT_FILE``, ``TABLE_LAYOUT``, ...); booleans
accept the same forms (``true/1/yes/on``, case-insensitive).
"""

from __future__ import annotations

import os

DEFAULTS: dict[str, str | None] = {
    "OUTPUT_FORMAT": "mermaid",
    "TABLE_LAYOUT": "auto",
    "OUTPUT_FILE": None,
    "PATTERN_CONFIG": None,
    "INCLUDE_VIEWS": "false",
    "INCLUDE_EXTERNAL_TABLES": "false",
    # display toggles (reference main.py:49-63 / config.py:53-56):
    # column-type and nullable markers default ON, theme "default"
    "SHOW_COLUMN_TYPES": "true",
    "SHOW_COLUMN_NULLABLE": "true",
    "DRAWIO_THEME": "default",
    "LOG_LEVEL": "ERROR",
}

DRAWIO_THEMES = ("default", "dark", "minimal")

_TRUE = {"true", "1", "yes", "on"}


def parse_bool(v: str | bool | None, default: bool = False) -> bool:
    if v is None:
        return default
    if isinstance(v, bool):
        return v
    return v.strip().lower() in _TRUE


def parse_env_file(path: str) -> dict[str, str]:
    """Parse a ``.env`` file: ``KEY=VALUE`` per line, ``#`` comments and
    blank lines ignored, optional surrounding quotes stripped."""
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            v = v.strip()
            if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
                v = v[1:-1]
            out[k.strip()] = v
    return out


def resolve(cli: dict[str, str | None] | None = None,
            env_file: str | None = None,
            environ: dict[str, str] | None = None) -> dict[str, str | None]:
    """Resolve the effective settings with the documented precedence.

    ``cli`` maps setting name -> value; ``None`` values mean "flag not
    given" and do not override. ``environ`` defaults to ``os.environ``."""
    environ = os.environ if environ is None else environ
    eff: dict[str, str | None] = dict(DEFAULTS)
    if env_file and os.path.exists(env_file):
        for k, v in parse_env_file(env_file).items():
            if k in eff and k not in environ:  # dotenv never overrides env
                eff[k] = v
    for k in eff:
        if k in environ:
            eff[k] = environ[k]
    for k, v in (cli or {}).items():
        if v is not None:
            eff[k] = v
    return eff
