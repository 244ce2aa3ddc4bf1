"""Crash-safe JAX compilation-cache handling.

History: a process killed mid-compile can leave a truncated entry in the
persistent compilation cache, and with some older jaxlibs *reading* such an
entry segfaulted — so rounds 2-4 wiped the whole cache whenever a previous
process died with it open (detected via PID markers). That cure was worse
than the disease on this image: the pair-scale Mosaic kernels take ~10
minutes to compile, a bench run killed by a harness timeout left a dead
marker, and the *next* run then threw those entries away and recompiled
from scratch — turning one timeout into a permanent timeout loop.

The current jaxlib fails *cleanly* on torn entries: the cache payload is a
zstd frame, truncation breaks the frame, and ``jax._src.compiler`` catches
the ZstdError, warns, and recompiles just that entry (verified in
tests/test_cache_guard.py::test_jax_recovers_from_truncated_entry). A torn
write cannot produce a *valid* frame with wrong contents, so corrupt
entries are self-healing and the guard no longer deletes anything.

``ensure_clean_cache`` still maintains the PID markers: they cost nothing,
make "did the last run exit cleanly?" greppable on disk, and keep the
API/meaning stable for callers. A dead marker is logged and removed; the
cache contents are left alone.
"""

from __future__ import annotations

import atexit
import logging
import os

_INUSE = ".inuse"
_logger = logging.getLogger(__name__)


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def ensure_clean_cache(cache_dir: str) -> str:
    """Registers this process on the cache and reaps dead-process markers.
    Returns the expanded path (pass it to
    ``jax.config.update('jax_compilation_cache_dir', ...)``).

    Cache entries are never deleted: this jaxlib recovers from truncated
    entries by recompiling them (see module docstring), and whole-cache
    wipes are exactly what made >10-minute-compile workloads impossible to
    benchmark under a harness timeout.
    """
    cache_dir = os.path.expanduser(cache_dir)
    marker_dir = os.path.join(cache_dir, _INUSE)
    os.makedirs(marker_dir, exist_ok=True)

    for name in os.listdir(marker_dir):
        try:
            pid = int(name)
        except ValueError:
            continue
        if not _alive(pid):
            _logger.info(
                "compile cache %s: previous process %d exited uncleanly; "
                "keeping its entries (torn entries self-heal on read)",
                cache_dir,
                pid,
            )
            try:
                os.unlink(os.path.join(marker_dir, name))
            except FileNotFoundError:
                pass

    marker = os.path.join(marker_dir, str(os.getpid()))
    with open(marker, "w"):
        pass

    def _release(path=marker):
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass

    atexit.register(_release)
    return cache_dir
