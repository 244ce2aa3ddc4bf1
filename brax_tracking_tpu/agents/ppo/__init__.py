"""On-device PPO: networks, losses, mesh-sharded trainer.

Capability parity with the reference trainer fork
(/root/reference/custom_brax/custom_ppo.py) and the brax.training modules
it composes, re-architected for TPU: one pjit/shard_map'd epoch function on
a device mesh instead of pmap.
"""

from brax_tracking_tpu.agents.ppo import losses as ppo_losses  # noqa: F401
from brax_tracking_tpu.agents.ppo import networks as ppo_networks  # noqa: F401
from brax_tracking_tpu.agents.ppo import train as _train  # noqa: F401

train_fn = _train.train
