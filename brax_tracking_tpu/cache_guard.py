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
import signal

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

    # SIGTERM (e.g. `timeout` expiring on a bench/test run) skips atexit, so
    # without this every timed-out run would read as a crash and wipe the
    # whole cache. jax's LRUCache.put is a plain write_bytes (not
    # temp+rename), so the entry being written WHEN the signal lands can be
    # torn — the handler unlinks entries touched in the last few seconds
    # (an in-progress write keeps going into the unlinked inode, harmlessly)
    # and only then releases the marker. SIGKILL/SIGSEGV still (correctly)
    # leave the marker and trigger a full wipe on the next run.
    prev = signal.getsignal(signal.SIGTERM)
    if prev is signal.SIG_DFL:

        def _on_term(signum, frame, grace_s=10.0):
            import time

            cutoff = time.time() - grace_s
            try:
                for entry in os.listdir(cache_dir):
                    if entry == _INUSE:
                        continue
                    path = os.path.join(cache_dir, entry)
                    try:
                        if os.path.isfile(path) and os.path.getmtime(path) > cutoff:
                            os.unlink(path)
                    except OSError:
                        pass
            except OSError:
                pass
            _release()
            signal.signal(signal.SIGTERM, signal.SIG_DFL)
            os.kill(os.getpid(), signal.SIGTERM)

        try:
            signal.signal(signal.SIGTERM, _on_term)
        except ValueError:  # not the main thread; atexit still covers exits
            pass
    return cache_dir
