import os

import pytest

from raylink.keys import install_api_key, load_env


def test_install_and_load(tmp_path):
    p = str(tmp_path / "env")
    install_api_key("openai", "sk-test-1", env_path=p)
    assert os.environ["OPENAI_API_KEY"] == "sk-test-1"
    with pytest.raises(ValueError):
        install_api_key("openai", "sk-test-2", env_path=p)  # no overwrite
    install_api_key("openai", "sk-test-2", env_path=p, overwrite=True)
    assert os.path.exists(p + ".bak")
    install_api_key("anthropic", "ak-1", env_path=p)
    os.environ.pop("OPENAI_API_KEY")
    loaded = load_env(p)
    assert loaded["OPENAI_API_KEY"] == "sk-test-2"
    assert loaded["ANTHROPIC_API_KEY"] == "ak-1"


def test_unknown_provider(tmp_path):
    with pytest.raises(ValueError):
        install_api_key("nope", "x", env_path=str(tmp_path / "env"))
