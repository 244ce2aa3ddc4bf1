"""Training infrastructure: types, acting, gradients, running statistics.

TPU-native re-provision of the brax.training capability surface the
reference consumes (/root/reference/custom_brax/custom_ppo.py:14-20).
"""

from brax_tracking_tpu.training.types import Transition  # noqa: F401
