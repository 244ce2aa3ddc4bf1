"""Reference-clip preprocessing: mocap qpos -> tracking features.

Capability parity with /root/reference/preprocessing/preprocess.py:23-230:
slice a stac qpos trajectory, run forward kinematics per frame to extract
body positions/quaternions, finite-difference velocities (quaternion-diff ->
axis-angle for the root angular rate), clip joint velocities.

TPU-first differences:
- FK runs through *our* engine's kinematics under one lax.scan (the
  reference scans MJX kinematics, preprocess.py:144-171).
- The per-frame Python loop the reference uses for angular velocities
  (preprocess.py:222-228) is a single batched quaternion op here.
- Multi-clip: stacking many clips into one leading axis is first-class
  (the reference's RodentMultiClip was an unimplemented stub, rodent.py:377).
"""

from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from brax_tracking_tpu import math as btm
from brax_tracking_tpu.physics import model as M
import brax_tracking_tpu.physics.kinematics as K
import brax_tracking_tpu.physics.step as pstep


@struct.dataclass
class ReferenceClip:
    """Per-frame tracking targets (leading axes: [clip,] frame).

    Field semantics follow the reference struct (preprocess.py:23-41).
    """

    # qpos split
    position: Optional[jax.Array] = None  # (T, 3) free-joint translation
    quaternion: Optional[jax.Array] = None  # (T, 4) free-joint orientation
    joints: Optional[jax.Array] = None  # (T, nq-7) or (T, nq) if tethered
    # world-frame features from FK
    body_positions: Optional[jax.Array] = None  # (T, nbody, 3)
    body_quaternions: Optional[jax.Array] = None  # (T, nbody, 4)
    # finite-difference velocities
    velocity: Optional[jax.Array] = None  # (T, 3)
    angular_velocity: Optional[jax.Array] = None  # (T, 3)
    joints_velocity: Optional[jax.Array] = None  # (T, nq-7)


def extract_features(m: M.Model, mocap_qpos: jax.Array) -> ReferenceClip:
    """FK over all frames, batched with vmap (the frames are independent, so
    a scan carry is pointless; one batched FK maps better onto the TPU)."""
    d0 = pstep.make_data(m, dtype=mocap_qpos.dtype)

    def f(qpos):
        d = d0.replace(qpos=qpos, qvel=jnp.zeros_like(d0.qvel))
        d = K.kinematics(m, d)
        return d.xpos, d.xquat

    xpos, xquat = jax.vmap(f)(mocap_qpos)
    free_root = m.njnt > 0 and m.jnt_type[0] == M.JNT_FREE
    if free_root:
        return ReferenceClip(
            position=mocap_qpos[:, :3],
            quaternion=mocap_qpos[:, 3:7],
            joints=mocap_qpos[:, 7:],
            body_positions=xpos,
            body_quaternions=xquat,
        )
    return ReferenceClip(
        position=None,
        quaternion=None,
        joints=mocap_qpos,
        body_positions=xpos,
        body_quaternions=xquat,
    )


def compute_velocity_from_kinematics(
    qpos_trajectory: jax.Array, dt: float
) -> jax.Array:
    """Finite-difference generalized velocities for a free-root trajectory.

    Matches preprocess.py:207-230 (batched: no per-frame Python loop).
    """
    qvel_translation = (qpos_trajectory[1:, :3] - qpos_trajectory[:-1, :3]) / dt
    diff = btm.quat_diff(qpos_trajectory[:-1, 3:7], qpos_trajectory[1:, 3:7])
    diff = diff / jnp.linalg.norm(diff, axis=-1, keepdims=True)
    qvel_gyro = btm.quat_to_axis_angle(diff) / dt
    qvel_joints = (qpos_trajectory[1:, 7:] - qpos_trajectory[:-1, 7:]) / dt
    return jnp.concatenate([qvel_translation, qvel_gyro, qvel_joints], axis=1)


def process_clip(
    m: M.Model,
    mocap_qpos: jax.Array,
    max_qvel: float = 20.0,
    dt: float = 0.02,
) -> ReferenceClip:
    """One clip: features + velocities (reference preprocess.py:99-141)."""
    clip = extract_features(m, mocap_qpos)
    # pad last frame so velocities have T entries
    mocap_qpos = jnp.concatenate([mocap_qpos, mocap_qpos[-1:]], axis=0)
    # tethered models get 6 zero root-velocity columns prepended
    if m.njnt == 0 or m.jnt_type[0] != M.JNT_FREE:
        mocap_qpos = jnp.concatenate(
            [jnp.zeros((mocap_qpos.shape[0], 7), mocap_qpos.dtype), mocap_qpos],
            axis=1,
        )
        # fake identity quaternion for the root diff
        mocap_qpos = mocap_qpos.at[:, 3].set(1.0)
    qvel = compute_velocity_from_kinematics(mocap_qpos, dt)
    joints_vel = jnp.clip(qvel[:, 6:], -max_qvel, max_qvel)
    return clip.replace(
        velocity=qvel[:, :3],
        angular_velocity=qvel[:, 3:6],
        joints_velocity=joints_vel,
    )


def _find_qpos(data, path="") -> list:
    """All (path, array) pairs whose key is ``qpos`` in a nested dict tree."""
    found = []
    if isinstance(data, dict):
        for k, v in data.items():
            p = f"{path}/{k}" if path else str(k)
            if str(k) == "qpos":
                found.append((p, v))
            else:
                found.extend(_find_qpos(v, p))
    elif isinstance(data, (list, tuple)):
        for i, v in enumerate(data):
            found.extend(_find_qpos(v, f"{path}[{i}]"))
    return found


def load_stac_qpos(stac_path: str, nq: int | None = None) -> np.ndarray:
    """Loads a stac mocap qpos array from .h5 or pickle.

    Accepted layouts (see data/STAC_SCHEMA.md; reference format:
    preprocessing/preprocess.py:66-74 + utils/io_dict_to_hdf5.py):
    - top-level ``qpos`` dataset — the reference's layout;
    - exactly one ``qpos`` anywhere in a nested group tree (wrapped
      exports, e.g. ``stac/qpos``);
    - several ``qpos`` datasets in sibling groups ("snips"): concatenated
      in sorted-key order along time, all widths equal.

    Validation (real lab exports fail in ways the reference ingested
    silently): result must be a 2-D float array; ``nq``, when given, pins
    the expected qpos width.
    """
    _, ext = os.path.splitext(stac_path)
    if ext in (".h5", ".hdf5"):
        from brax_tracking_tpu.data import h5io

        data = h5io.load(stac_path)
    else:
        with open(stac_path, "rb") as f:
            data = pickle.load(f)
    if not isinstance(data, dict):
        raise ValueError(
            f"{stac_path}: expected a dict-like stac export, got "
            f"{type(data).__name__}"
        )
    found = _find_qpos(data)
    if not found:
        top = sorted(data.keys())[:12]
        raise KeyError(
            f"{stac_path}: no 'qpos' dataset anywhere in the file "
            f"(top-level keys: {top}); see data/STAC_SCHEMA.md"
        )
    arrays = []
    for p, v in sorted(found, key=lambda kv: kv[0]):
        a = np.asarray(v)
        if a.ndim != 2 or not np.issubdtype(a.dtype, np.floating):
            raise ValueError(
                f"{stac_path}: '{p}' has shape {a.shape} dtype {a.dtype}; "
                "expected a (frames, nq) float array"
            )
        arrays.append(a)
    widths = {a.shape[1] for a in arrays}
    if len(widths) != 1:
        raise ValueError(
            f"{stac_path}: snip qpos widths disagree: {sorted(widths)} "
            f"(paths: {[p for p, _ in found]})"
        )
    qpos = arrays[0] if len(arrays) == 1 else np.concatenate(arrays, axis=0)
    if nq is not None and qpos.shape[1] != nq:
        raise ValueError(
            f"{stac_path}: qpos width {qpos.shape[1]} != model nq {nq} — "
            "wrong model/export pairing? (tethered models strip the free "
            "joint: nq differs by 7)"
        )
    return qpos


def clean_stac_qpos(
    qpos: np.ndarray,
    nan_policy: str = "error",
    max_nan_fraction: float = 0.1,
    quat_cols: Sequence[int] = (),
) -> np.ndarray:
    """NaN handling for real lab exports (dropped-marker frames).

    ``nan_policy``:
    - "error" (default): any non-finite value raises, with frame indices;
    - "interpolate": interior NaN frames are filled per-column by linear
      interpolation over time (quaternion columns renormalized after),
      leading/trailing NaN frames take the nearest valid frame; more than
      ``max_nan_fraction`` bad frames still raises.
    """
    bad = ~np.isfinite(qpos)
    if not bad.any():
        return qpos
    bad_frames = np.nonzero(bad.any(axis=1))[0]
    if nan_policy == "error":
        raise ValueError(
            f"stac qpos has non-finite values in {bad_frames.size} frames "
            f"(first few: {bad_frames[:8].tolist()}); pass "
            "nan_policy='interpolate' to repair dropped-marker frames"
        )
    if nan_policy != "interpolate":
        raise ValueError(f"unknown nan_policy {nan_policy!r}")
    if bad_frames.size > max_nan_fraction * qpos.shape[0]:
        raise ValueError(
            f"stac qpos has {bad_frames.size}/{qpos.shape[0]} non-finite "
            f"frames (> max_nan_fraction={max_nan_fraction}); refusing to "
            "interpolate — the export is likely corrupt"
        )
    out = qpos.copy()
    t = np.arange(qpos.shape[0])
    for c in range(qpos.shape[1]):
        col_bad = bad[:, c]
        if col_bad.any():
            good = ~col_bad
            out[col_bad, c] = np.interp(t[col_bad], t[good], qpos[good, c])
    for q0 in quat_cols:
        norms = np.linalg.norm(out[:, q0 : q0 + 4], axis=1, keepdims=True)
        out[:, q0 : q0 + 4] /= np.maximum(norms, 1e-12)
    return out


def process_clip_to_train(
    stac_path: str,
    m: M.Model,
    start_step: int = 0,
    clip_length: int = 250,
    max_qvel: float = 20.0,
    dt: float = 0.02,
    nan_policy: str = "error",
) -> ReferenceClip:
    """End-to-end: stac file -> ReferenceClip (preprocess.py:44-96).

    Unlike the reference, the compiled Model is passed in (the offline
    compile with rescaling already happened via physics.spec.build_model).
    Input validation and NaN handling: load_stac_qpos / clean_stac_qpos
    (data/STAC_SCHEMA.md documents the accepted export layouts).
    """
    full = load_stac_qpos(stac_path, nq=_expected_stac_nq(m))
    if start_step + clip_length > full.shape[0]:
        # the reference slices silently, producing a short clip whose
        # episode-length math is then wrong downstream — fail loudly
        raise ValueError(
            f"{stac_path}: clip [{start_step}, {start_step + clip_length}) "
            f"out of range — file has {full.shape[0]} frames "
            f"(clip_idx too large for this export?)"
        )
    has_free = bool(np.any(np.asarray(m.jnt_type) == M.JNT_FREE))
    mocap_qpos = clean_stac_qpos(
        full[start_step : start_step + clip_length],
        nan_policy=nan_policy,
        quat_cols=(3,) if has_free else (),
    )
    return process_clip(m, jnp.asarray(mocap_qpos), max_qvel=max_qvel, dt=dt)


def _expected_stac_nq(m: M.Model) -> int | None:
    """Stac exports are fitted on the free-root model; a tethered compile
    (free joint stripped) still ingests full-width exports in the
    reference (fly_freejnt vs fly dataset configs), so only pin nq when
    the model keeps its free root."""
    has_free = bool(np.any(np.asarray(m.jnt_type) == M.JNT_FREE))
    return int(m.nq) if has_free else None


def stack_clips(clips: Sequence[ReferenceClip]) -> ReferenceClip:
    """Stacks single clips into a multi-clip dataset (leading clip axis)."""

    def stack(*xs):
        return None if xs[0] is None else jnp.stack(xs)

    return jax.tree.map(stack, *clips, is_leaf=lambda x: x is None)


def save_clip(path: str, clip: ReferenceClip) -> None:
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(clip), f)


def load_clip(path: str) -> ReferenceClip:
    with open(path, "rb") as f:
        clip = pickle.load(f)
    # device_get at save time (and numpy-unpickling of jax arrays) leaves
    # numpy leaves, which a jitted env cannot index with tracers — rehydrate
    return jax.tree.map(
        lambda x: None if x is None else jnp.asarray(x),
        clip,
        is_leaf=lambda x: x is None,
    )
