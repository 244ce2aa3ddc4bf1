"""Parametric action distributions.

Re-provides the NormalTanhDistribution capability the reference's policy
head uses (via brax ppo_networks, /root/reference/main.py:106-110,
custom_ppo.py:228-231): a diagonal Gaussian in pre-activation space pushed
through tanh, with the change-of-variables log-det handled analytically.

Numerics notes (these shape the learning curve, so they are spelled out):
- scale = softplus(raw_scale) + min_std  (min_std = 1e-3);
- tanh log|det J| per dim = 2 * (log 2 - x - softplus(-2x)), the
  numerically-stable form of log(1 - tanh(x)^2);
- entropy is the single-sample estimator: Gaussian entropy plus the
  log-det evaluated at one sampled pre-activation point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softplus(x):
    return jnp.logaddexp(x, 0.0)


class NormalTanhDistribution:
    """tanh(Normal(loc, scale)) with diagonal scale.

    The network emits ``2 * event_size`` logits: [loc, raw_scale].
    """

    def __init__(self, event_size: int, min_std: float = 1e-3, var_scale: float = 1.0):
        self.event_size = event_size
        self._min_std = min_std
        self._var_scale = var_scale

    @property
    def param_size(self) -> int:
        return 2 * self.event_size

    def _loc_scale(self, logits: jax.Array):
        loc, raw = jnp.split(logits, 2, axis=-1)
        scale = _softplus(raw) * self._var_scale + self._min_std
        return loc, scale

    # pre-tanh sampling -------------------------------------------------
    def sample_no_postprocessing(self, logits: jax.Array, rng: jax.Array) -> jax.Array:
        loc, scale = self._loc_scale(logits)
        return loc + scale * jax.random.normal(rng, loc.shape, loc.dtype)

    def postprocess(self, pre_tanh: jax.Array) -> jax.Array:
        return jnp.tanh(pre_tanh)

    def sample(self, logits: jax.Array, rng: jax.Array) -> jax.Array:
        return self.postprocess(self.sample_no_postprocessing(logits, rng))

    def mode(self, logits: jax.Array) -> jax.Array:
        loc, _ = self._loc_scale(logits)
        return jnp.tanh(loc)

    # densities ----------------------------------------------------------
    def _normal_log_prob(self, loc, scale, x):
        z = (x - loc) / scale
        return -0.5 * z * z - 0.5 * jnp.log(2.0 * jnp.pi) - jnp.log(scale)

    def _tanh_log_det(self, x):
        # log|d tanh(x)/dx| = log(1 - tanh(x)^2), stable form.
        return 2.0 * (jnp.log(2.0) - x - _softplus(-2.0 * x))

    def log_prob(self, logits: jax.Array, pre_tanh: jax.Array) -> jax.Array:
        """Log density of tanh(pre_tanh) under the squashed distribution.

        Takes the *pre-tanh* sample (the raw_action the actor stores) so no
        atanh is ever needed.
        """
        loc, scale = self._loc_scale(logits)
        lp = self._normal_log_prob(loc, scale, pre_tanh) - self._tanh_log_det(pre_tanh)
        return jnp.sum(lp, axis=-1)

    def entropy(self, logits: jax.Array, rng: jax.Array) -> jax.Array:
        """Single-sample entropy estimate of the squashed distribution."""
        loc, scale = self._loc_scale(logits)
        x = loc + scale * jax.random.normal(rng, loc.shape, loc.dtype)
        ent = 0.5 + 0.5 * jnp.log(2.0 * jnp.pi) + jnp.log(scale)
        ent = ent + self._tanh_log_det(x)
        return jnp.sum(ent, axis=-1)
