"""TPU-native articulated rigid-body physics engine.

Replaces the MuJoCo-MJX capability the reference trains through
(/root/reference/envs/fruitfly.py:10-11 via brax's mjx pipeline): batched
forward dynamics with contacts, compiled by XLA for TPU.

Layout:
- ``model``      — frozen Model/Data pytrees (static structure + traced params).
- ``spec``       — offline MJCF compiler (MuJoCo C bindings, host-side only)
                   with spec transforms (free-joint strip, torque-actuator
                   rewrite, subtree rescale, fly stub meshes).
- ``kinematics`` — forward kinematics + com-frame quantities (cinert/cdof).
- ``dynamics``   — CRB mass matrix, factorization, RNE bias forces.
- ``passive``    — springs/dampers + inertia-box fluid drag.
- ``actuation``  — motor/filtered-affine actuators, joint+tendon transmission.
- ``collision``  — static-pair narrowphase (plane/sphere/capsule/ellipsoid).
- ``constraint`` — limit/contact constraint row assembly (pyramidal+elliptic).
- ``solver``     — CG / Newton constraint solvers with line search.
- ``sensor``     — accelerometer/velocimeter/gyro/touch/subtreelinvel sensors.
- ``step``       — fused forward() and step() entry points.
"""

from brax_tracking_tpu.physics.model import Data, Model, Option
from brax_tracking_tpu.physics.spec import build_model

__all__ = ["Data", "Model", "Option", "build_model"]
