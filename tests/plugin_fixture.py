"""Fixture module for plugin-discovery tests (imported via the
NERF_EMITTER_TPU_*_CONFIGS env vars in test_plugins.py)."""

import dataclasses

from nerf_emitter_tpu.configs.methods import ExperimentConfig
from nerf_emitter_tpu.plugins import (
    DataParserSpecification,
    MethodSpecification,
)

method_spec = MethodSpecification(
    config=ExperimentConfig(method_name="plugin-nerfacto", seed=1234),
    description="fixture method registered by tests",
)


def _factory():
    return ExperimentConfig(method_name="plugin-factory", seed=99)


factory_spec = MethodSpecification(
    config=_factory, description="fixture factory method"
)

# a spec that tries to shadow a built-in method name; built-ins must win
shadow_spec = MethodSpecification(
    config=ExperimentConfig(method_name="sdf-nerfacto", seed=-1),
    description="attempted shadow of a built-in",
)


@dataclasses.dataclass
class _ToyOutputs:
    split: str
    datacfg: object


def _toy_setup(datacfg):
    def parse(split):
        return _ToyOutputs(split=split, datacfg=datacfg)

    return parse


dataparser_spec = DataParserSpecification(
    name="toy-data", setup=_toy_setup, description="fixture dataparser"
)

not_a_spec = object()
