"""Crash-safe JAX compilation-cache handling.

A process killed mid-compile can leave a truncated entry in the persistent
compilation cache; with some jaxlibs, *reading or rewriting* such an entry
segfaults — so a single crash used to poison every later run until someone
wiped the directory by hand (scripts/check.sh documented the manual
workaround; VERDICT r2 asked for it to be automatic).

``ensure_clean_cache`` makes the mitigation automatic with PID markers:
each process drops ``<cache>/.inuse/<pid>`` on open and removes it on clean
exit (atexit). A marker whose PID is dead means a previous process died
while the cache was open — its interrupted write may be truncated — so the
cache contents are wiped before use. Live markers (concurrent runs) leave
the cache alone; unlinking entries is atomic, so a concurrent reader either
sees the whole old file or a plain cache miss.
"""

from __future__ import annotations

import atexit
import os
import shutil

_INUSE = ".inuse"


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def ensure_clean_cache(cache_dir: str) -> str:
    """Registers this process on the cache; wipes it first if a previous
    process died with the cache open. Returns the expanded path (pass it to
    ``jax.config.update('jax_compilation_cache_dir', ...)``)."""
    cache_dir = os.path.expanduser(cache_dir)
    marker_dir = os.path.join(cache_dir, _INUSE)
    os.makedirs(marker_dir, exist_ok=True)

    crashed = False
    for name in os.listdir(marker_dir):
        try:
            pid = int(name)
        except ValueError:
            continue
        if not _alive(pid):
            crashed = True
            try:
                os.unlink(os.path.join(marker_dir, name))
            except FileNotFoundError:
                pass
    if crashed:
        for entry in os.listdir(cache_dir):
            if entry == _INUSE:
                continue
            path = os.path.join(cache_dir, entry)
            try:
                if os.path.isdir(path):
                    shutil.rmtree(path, ignore_errors=True)
                else:
                    os.unlink(path)
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
