"""Shared jit-compiled engine entry points for tests.

Tests must NOT call ``bstep.forward`` / ``bstep.step`` eagerly: in eager
mode every ``lax.while_loop`` inside the solve is dispatched as its own
primitive whose closed-over arrays (J, qM, efc_D, ...) are concrete and get
baked into the HLO as constants — so every new qpos recompiles the loop
from scratch (~100s per pose for the Newton solver on CPU, and the constant
storm has triggered XLA:CPU compiler crashes in long pytest processes).
Under ``jit`` those arrays are tracers, the loop compiles once per model,
and subsequent poses are sub-millisecond.

``jit_forward`` / ``jit_step`` memoize one compiled callable per Model
instance; ``build_cached`` additionally memoizes the MuJoCo compile +
spec conversion for XML-string models rebuilt inside pose loops.
"""

from __future__ import annotations

import jax

_BY_ID: dict = {}
_BY_XML: dict = {}


def _memo(model, kind: str):
    import brax_tracking_tpu.physics.step as bstep

    key = (id(model), kind)
    ent = _BY_ID.get(key)
    if ent is None or ent[0] is not model:
        fn = bstep.forward if kind == "forward" else bstep.step
        ent = (model, jax.jit(lambda dd, _fn=fn: _fn(model, dd)))
        _BY_ID[key] = ent
    return ent[1]


def jit_forward(model):
    """One jit-compiled ``forward(model, .)`` per Model instance."""
    return _memo(model, "forward")


def jit_step(model):
    """One jit-compiled ``step(model, .)`` per Model instance."""
    return _memo(model, "step")


def build_cached(xml: str, dtype=None):
    """(mj, model, jit_forward) for an XML string, memoized across calls."""
    import jax.numpy as jnp
    import mujoco

    import brax_tracking_tpu.physics.spec as bspec

    dtype = dtype or jnp.float64
    key = (xml, jnp.dtype(dtype).name)
    ent = _BY_XML.get(key)
    if ent is None:
        mj = mujoco.MjModel.from_xml_string(xml)
        model = bspec.model_from_mj(mj, dtype=dtype)
        ent = (mj, model, jit_forward(model))
        _BY_XML[key] = ent
    return ent
