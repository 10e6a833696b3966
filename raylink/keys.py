"""Provider API-key installers (SURVEY.md §2.1 S3; reference
``R/openai_api_key.R:34-72`` and its three copy-paste clones for
mistral/anthropic/openrouter).

The reference appends ``PROVIDER_API_KEY='…'`` lines to ``~/.Renviron``
with backup/overwrite handling. Here one parameterized function covers all
providers, writing ``KEY=value`` lines to an env file (default
``~/.raylink_env``) and exporting into the current process. No network use —
pure config plumbing for the pluggable HTTP oracle/embedder seams.
"""

from __future__ import annotations

import os
import re

PROVIDERS = {
    "openai": "OPENAI_API_KEY",
    "mistral": "MISTRAL_API_KEY",
    "anthropic": "ANTHROPIC_API_KEY",
    "openrouter": "OPENROUTER_API_KEY",
}


def install_api_key(
    provider: str,
    key: str,
    env_path: str | None = None,
    overwrite: bool = False,
    install: bool = True,
) -> str:
    """Persist (and export) an API key for ``provider``.

    Mirrors the reference semantics: error if the variable already exists
    in the env file and ``overwrite`` is False; with ``install=False`` only
    the current process environment is set (the reference's non-install
    branch just prints instructions)."""
    var = PROVIDERS.get(provider)
    if var is None:
        raise ValueError(f"unknown provider {provider!r}; one of {sorted(PROVIDERS)}")
    os.environ[var] = key
    if not install:
        return var
    path = env_path or os.path.join(os.path.expanduser("~"), ".raylink_env")
    lines: list[str] = []
    if os.path.exists(path):
        with open(path) as f:
            lines = f.read().splitlines()
        pattern = re.compile(rf"^{var}=")
        if any(pattern.match(ln) for ln in lines):
            if not overwrite:
                raise ValueError(
                    f"{var} already exists in {path}; pass overwrite=True to replace it"
                )
            # backup then drop the old line (reference backs up ~/.Renviron)
            with open(path + ".bak", "w") as f:
                f.write("\n".join(lines) + "\n")
            lines = [ln for ln in lines if not pattern.match(ln)]
    lines.append(f"{var}={key}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return var


def load_env(env_path: str | None = None) -> dict[str, str]:
    """Read the env file into os.environ (returns what was loaded)."""
    path = env_path or os.path.join(os.path.expanduser("~"), ".raylink_env")
    out: dict[str, str] = {}
    if not os.path.exists(path):
        return out
    with open(path) as f:
        for ln in f.read().splitlines():
            name, sep, val = ln.partition("=")
            if sep and name:
                out[name] = val
                os.environ.setdefault(name, val)
    return out
