"""Crash-safe compilation-cache guard (VERDICT r2 weak #4 / next #7).

The scenario that used to require manual intervention: a pytest run killed
mid-compile leaves a truncated jax compile-cache entry, and the next bare
``pytest tests/`` segfaults reading it. ensure_clean_cache detects the
crashed run via its leftover PID marker and wipes the cache automatically.
"""

import os
import subprocess
import sys

from brax_tracking_tpu.cache_guard import ensure_clean_cache


def test_crashed_run_wipes_cache(tmp_path):
    cache = tmp_path / "cache"
    inuse = cache / ".inuse"
    inuse.mkdir(parents=True)
    (cache / "entry").write_bytes(b"truncated-garbage")
    # a dead PID's marker = that process crashed with the cache open
    (inuse / "999999").touch()
    ensure_clean_cache(str(cache))
    assert not (cache / "entry").exists()
    assert not (inuse / "999999").exists()
    assert (inuse / str(os.getpid())).exists()


def test_live_concurrent_run_preserves_cache(tmp_path):
    cache = tmp_path / "cache"
    inuse = cache / ".inuse"
    inuse.mkdir(parents=True)
    (cache / "entry").write_bytes(b"valid")
    (inuse / str(os.getpid())).touch()  # "another" live process
    ensure_clean_cache(str(cache))
    assert (cache / "entry").exists()


def test_clean_exit_releases_marker(tmp_path):
    cache = tmp_path / "cache"
    code = (
        "import sys; sys.path.insert(0, '/root/repo')\n"
        "from brax_tracking_tpu.cache_guard import ensure_clean_cache\n"
        f"ensure_clean_cache({str(cache)!r})\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True)
    assert os.listdir(cache / ".inuse") == []


def test_sigterm_releases_marker_and_drops_fresh_entries(tmp_path):
    """A timed-out (SIGTERM'd) run must NOT poison the cache for the next
    run: the handler unlinks possibly-torn just-written entries, releases
    the marker, and old entries survive."""
    import signal
    import time

    cache = tmp_path / "cache"
    code = (
        "import sys, os, time; sys.path.insert(0, '/root/repo')\n"
        "from brax_tracking_tpu.cache_guard import ensure_clean_cache\n"
        f"c = ensure_clean_cache({str(cache)!r})\n"
        "open(os.path.join(c, 'fresh-entry'), 'w').write('maybe-torn')\n"
        "print('ready', flush=True)\n"
        "time.sleep(60)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    assert proc.stdout.readline().strip() == "ready"
    old = cache / "old-entry"
    old.write_bytes(b"committed long ago")
    past = time.time() - 3600
    os.utime(old, (past, past))
    proc.send_signal(signal.SIGTERM)
    assert proc.wait() != 0
    assert not (cache / "fresh-entry").exists()  # possibly torn -> dropped
    assert old.exists()  # old entries survive
    assert os.listdir(cache / ".inuse") == []  # marker released
    ensure_clean_cache(str(cache))
    assert old.exists()  # next run does NOT read it as a crash


def test_killed_process_leaves_marker_then_next_run_heals(tmp_path):
    """End-to-end: SIGKILL a cache-holding process, then a fresh
    ensure_clean_cache call must wipe the poisoned entry."""
    cache = tmp_path / "cache"
    code = (
        "import sys, os, time; sys.path.insert(0, '/root/repo')\n"
        "from brax_tracking_tpu.cache_guard import ensure_clean_cache\n"
        f"ensure_clean_cache({str(cache)!r})\n"
        f"open(os.path.join({str(cache)!r}, 'half-written'), 'w').write('x')\n"
        "print('ready', flush=True)\n"
        "time.sleep(60)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    assert proc.stdout.readline().strip() == "ready"
    proc.kill()  # exact PID we started — simulates the mid-compile crash
    proc.wait()
    ensure_clean_cache(str(cache))
    assert not (cache / "half-written").exists()
