"""Recursive dict <-> HDF5 IO plus ReferenceClip h5 storage.

Capability parity with /root/reference/utils/io_dict_to_hdf5.py:6-67 and the
clip save/load helpers at preprocessing/preprocess.py:233-293. Host-side IO
(h5py is C under the hood; nothing here touches the device).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Union

import numpy as np

try:
    import h5py

    HAVE_H5PY = True
except ImportError:  # pragma: no cover
    HAVE_H5PY = False


def _require_h5py():
    if not HAVE_H5PY:
        raise ImportError("h5py is required for HDF5 IO")


def save(filename: str, data: Dict[str, Any]) -> None:
    """Recursively saves a (possibly nested) dict of arrays/scalars."""
    _require_h5py()
    with h5py.File(filename, "w") as hf:
        _save_group(hf, data)


def _save_group(group, data: Dict[str, Any]) -> None:
    for key, value in data.items():
        key = str(key)
        if isinstance(value, dict):
            sub = group.create_group(key)
            _save_group(sub, value)
        elif isinstance(value, (list, tuple)):
            sub = group.create_group(key)
            sub.attrs["__list__"] = True
            _save_group(sub, {str(i): v for i, v in enumerate(value)})
        elif value is None:
            group.attrs[key] = "__none__"
        else:
            group.create_dataset(key, data=np.asarray(value))


def load(filename: str) -> Dict[str, Any]:
    """Recursively loads an HDF5 tree back into dicts/lists/arrays."""
    _require_h5py()
    with h5py.File(filename, "r") as hf:
        return _load_group(hf)


def _load_group(group):
    if group.attrs.get("__list__", False):
        items = sorted(group.items(), key=lambda kv: int(kv[0]))
        return [_load_item(v) for _, v in items]
    out = {}
    for key, value in group.items():
        out[key] = _load_item(value)
    for key, value in group.attrs.items():
        if value == "__none__":
            out[key] = None
    return out


def _load_item(value):
    if HAVE_H5PY and isinstance(value, h5py.Group):
        return _load_group(value)
    return value[()]


def save_reference_clip(
    filename: str, clip_names: Union[List[str], str], clip
) -> None:
    """ReferenceClip -> h5, single- or multi-clip (preprocess.py:233-258)."""
    _require_h5py()
    names = [clip_names] if isinstance(clip_names, str) else list(clip_names)
    single = isinstance(clip_names, str)
    with h5py.File(filename, "w") as hf:
        for i, name in enumerate(names):
            for attr, value in vars(clip).items():
                if value is None:
                    continue
                data = np.asarray(value) if single else np.asarray(value[i])
                hf.create_dataset(f"{name}/{attr}", data=data)


def load_reference_clip(filename: str, clip_names: Union[List[str], str]):
    """h5 -> ReferenceClip; multi-clip stacks a leading axis
    (preprocess.py:261-293)."""
    _require_h5py()
    from brax_tracking_tpu.data.clips import ReferenceClip
    import jax.numpy as jnp

    names = [clip_names] if isinstance(clip_names, str) else list(clip_names)
    single = isinstance(clip_names, str)
    aggregated = defaultdict(list)
    with h5py.File(filename, "r") as hf:
        for name in names:
            for attr in ReferenceClip.__dataclass_fields__:
                key = f"{name}/{attr}"
                if key in hf:
                    aggregated[attr].append(hf[key][:])
    stacked = {
        k: (jnp.asarray(v[0]) if single else jnp.stack([jnp.asarray(x) for x in v]))
        for k, v in aggregated.items()
    }
    return ReferenceClip(**stacked)
