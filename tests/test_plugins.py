"""Plugin registry: env-var method/dataparser discovery and CLI pickup.

Covers the behavior of nerfstudio/plugins/registry.py:34-71 and
registry_dataparser.py:40-61 (entry points are exercised implicitly by the
same code path; the env channel is what tests can drive hermetically).
"""

import warnings

import pytest

from nerf_emitter_tpu.plugins.registry import (
    DATAPARSER_ENV_VAR,
    METHOD_ENV_VAR,
    discover_dataparsers,
    discover_methods,
)


def test_discover_methods_from_env(monkeypatch):
    monkeypatch.setenv(
        METHOD_ENV_VAR,
        "plugin-nerfacto=plugin_fixture:method_spec,"
        "plugin-factory=plugin_fixture:factory_spec",
    )
    methods, descriptions = discover_methods()
    assert set(methods) >= {"plugin-nerfacto", "plugin-factory"}
    cfg = methods["plugin-nerfacto"]()
    assert cfg.method_name == "plugin-nerfacto" and cfg.seed == 1234
    # factory-style specs are called fresh each time
    a, b = methods["plugin-factory"](), methods["plugin-factory"]()
    assert a is not b and a.seed == 99
    assert descriptions["plugin-nerfacto"] == "fixture method registered by tests"


def test_builtins_win_over_plugin_shadow(monkeypatch):
    monkeypatch.setenv(METHOD_ENV_VAR, "shadow=plugin_fixture:shadow_spec")
    from nerf_emitter_tpu.configs.methods import all_method_configs

    methods, _ = all_method_configs()
    cfg = methods["sdf-nerfacto"]()
    assert cfg.seed != -1  # the built-in config, not the shadow


def test_bad_definitions_fail_soft(monkeypatch):
    monkeypatch.setenv(
        METHOD_ENV_VAR,
        "broken=missing_module:spec,notaspec=plugin_fixture:not_a_spec,"
        "good=plugin_fixture:method_spec",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        methods, _ = discover_methods()
    assert "plugin-nerfacto" in methods
    assert "broken" not in methods and "notaspec" not in methods
    assert len(w) >= 2  # one warning per bad definition


def test_train_cli_picks_up_plugin_method(monkeypatch, tmp_path):
    monkeypatch.setenv(
        METHOD_ENV_VAR, "plugin-nerfacto=plugin_fixture:method_spec"
    )
    from nerf_emitter_tpu.scripts.train import build_parser

    parser = build_parser()
    args = parser.parse_args(
        ["plugin-nerfacto", "--datacfg.data", str(tmp_path)]
    )
    assert args.method == "plugin-nerfacto"
    assert args.seed == 1234  # the plugin's defaults flow into the parser


def test_discover_dataparsers_from_env(monkeypatch):
    monkeypatch.setenv(
        DATAPARSER_ENV_VAR, "toy-data=plugin_fixture:dataparser_spec"
    )
    parsers = discover_dataparsers()
    assert "toy-data" in parsers
    parse = parsers["toy-data"].setup({"marker": True})
    out = parse("train")
    assert out.split == "train" and out.datacfg == {"marker": True}


def test_no_env_is_empty(monkeypatch):
    monkeypatch.delenv(METHOD_ENV_VAR, raising=False)
    monkeypatch.delenv(DATAPARSER_ENV_VAR, raising=False)
    methods, _ = discover_methods()
    parsers = discover_dataparsers()
    assert methods == {} or all(
        not n.startswith("plugin-") for n in methods
    )
    assert "toy-data" not in parsers


def test_get_method_config_unknown_raises(monkeypatch):
    monkeypatch.delenv(METHOD_ENV_VAR, raising=False)
    from nerf_emitter_tpu.configs.methods import get_method_config

    with pytest.raises(KeyError):
        get_method_config("definitely-not-a-method")
