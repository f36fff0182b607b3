"""Config system: YAML with ``!include`` plus a small model registry.

Behavioral parity target: the reference loads YAML configs with a custom
``!include`` constructor (reference ``src/utils/utils.py:7-17``) and keeps the
authoritative model hyper-parameters in ``ckpts/*.yml``.  We mirror the file
format exactly so reference config files load unchanged, but hand back an
attribute-accessible ``ConfigDict`` for ergonomic use in JAX code.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict

import yaml


class ConfigDict(dict):
    """A dict with attribute access, recursively wrapping nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return ConfigDict({k: ConfigDict.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(ConfigDict.wrap(v) for v in obj)
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(obj):
            if isinstance(obj, dict):
                return {k: unwrap(v) for k, v in obj.items()}
            if isinstance(obj, (list, tuple)):
                return type(obj)(unwrap(v) for v in obj)
            return obj

        return unwrap(self)

    def updated(self, other: Dict[str, Any]) -> "ConfigDict":
        """Return a deep copy with ``other`` overlaid (shallow per-key, like
        the reference's ``params['model'].update(params['controlnet'])``)."""
        new = copy.deepcopy(dict(self))
        new.update(copy.deepcopy(dict(other)))
        return ConfigDict.wrap(new)


def load_yaml_with_includes(yaml_file: str) -> ConfigDict:
    """Load a YAML file honoring ``!include sibling.yml`` tags.

    Include paths resolve relative to the including file's directory, matching
    the reference loader (``src/utils/utils.py:7-17``).
    """

    class _Loader(yaml.FullLoader):
        pass

    def _include(loader, node):
        path = os.path.join(os.path.dirname(yaml_file), loader.construct_scalar(node))
        with open(path, "r") as f:
            return yaml.load(f, Loader=_Loader)

    _Loader.add_constructor("!include", _include)
    with open(yaml_file, "r") as f:
        return ConfigDict.wrap(yaml.load(f, Loader=_Loader))


# Alias matching the reference public name.
load_config = load_yaml_with_includes


# ---------------------------------------------------------------------------
# Built-in model registry (mirrors reference api/ezaudio.py:20-28 /
# api/controlnet.py:20-27, minus the download URLs: checkpoints must be
# provided locally — this framework performs no network access).
# ---------------------------------------------------------------------------

_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
CONFIG_DIR = os.path.join(_PKG_DIR, "configs")

MODEL_REGISTRY: Dict[str, Dict[str, str]] = {
    "s3_xl": {
        "config": os.path.join(CONFIG_DIR, "ezaudio-xl.yml"),
        "ckpt": "ckpts/s3/ezaudio_s3_xl.pt",
    },
    "s3_l": {
        "config": os.path.join(CONFIG_DIR, "ezaudio-l.yml"),
        "ckpt": "ckpts/s3/ezaudio_s3_l.pt",
    },
    "energy": {
        "config": os.path.join(CONFIG_DIR, "energy_l.yml"),
        "ckpt": "ckpts/controlnet/s3_l_energy.pt",
    },
    "vae": {
        "config": os.path.join(CONFIG_DIR, "vae.json"),
        "ckpt": "ckpts/vae/1m.pt",
    },
}


def get_model_config(name: str) -> ConfigDict:
    return load_yaml_with_includes(MODEL_REGISTRY[name]["config"])
