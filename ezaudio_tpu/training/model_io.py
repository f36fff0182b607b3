"""Model bundle save/load with constructor metadata.

Equivalent of reference ``audiotools/ml/layers/base.py`` (BaseModel): a
checkpoint that carries both the weights and the constructor kwargs, so
``load_model`` can rebuild the module without external config
(base.py:66-328's weights-with-metadata mode; the ``torch.package`` mode is
a torch-specific serialization and has no JAX analog — orbax params +
a JSON metadata sidecar fill the role).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

_BUILDERS: Dict[str, Callable[..., Any]] = {}


def register_model(name: str):
    """Register a module factory so bundles can be rebuilt by name."""

    def deco(fn):
        _BUILDERS[name] = fn
        return fn

    return deco


# built-in factories
def _register_builtins():
    from ezaudio_tpu.codecs.dac import DAC
    from ezaudio_tpu.codecs.oobleck import AudioVAE
    from ezaudio_tpu.models.maskdit import maskdit_from_config

    _BUILDERS.setdefault("maskdit", lambda **kw: maskdit_from_config(kw["model"]))
    _BUILDERS.setdefault("audio_vae", lambda **kw: AudioVAE(**kw))
    _BUILDERS.setdefault("dac", lambda **kw: DAC(**kw))


def save_model(folder: str, kind: str, kwargs: dict, params,
               extra_metadata: Optional[dict] = None) -> str:
    """Write <folder>/{metadata.json, params.npz} (flattened param tree)."""
    os.makedirs(folder, exist_ok=True)
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(getattr(p, "key", str(p)) for p in path)
        flat[key] = np.asarray(leaf)
    np.savez(os.path.join(folder, "params.npz"), **flat)
    with open(os.path.join(folder, "metadata.json"), "w") as f:
        json.dump({"kind": kind, "kwargs": kwargs,
                   "metadata": extra_metadata or {}}, f, indent=2)
    return folder


def load_model(folder: str) -> Tuple[Any, dict, dict]:
    """Rebuild (module, params, metadata) from a bundle folder."""
    _register_builtins()
    with open(os.path.join(folder, "metadata.json")) as f:
        meta = json.load(f)
    module = _BUILDERS[meta["kind"]](**meta["kwargs"])
    flat = dict(np.load(os.path.join(folder, "params.npz")))
    params: dict = {}
    for key, value in flat.items():
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return module, params, meta["metadata"]
