"""Compilation-cache guard (VERDICT r2 weak #4; rewritten round 5).

The guard used to wipe the whole cache after an unclean exit. That made
every harness-timeout on a long-compile workload (rodent_pair: ~10-minute
Mosaic kernel compiles) poison the NEXT run too — it recompiled from
scratch and timed out again. The load-bearing fact that lets us stop
wiping: this jaxlib recovers from truncated cache entries by warning and
recompiling just that entry (test_jax_recovers_from_truncated_entry).
"""

import glob
import os
import subprocess
import sys

from brax_tracking_tpu.cache_guard import ensure_clean_cache


def test_crashed_run_keeps_cache_and_reaps_marker(tmp_path):
    cache = tmp_path / "cache"
    inuse = cache / ".inuse"
    inuse.mkdir(parents=True)
    (cache / "entry").write_bytes(b"ten-minute kernel compile")
    # a dead PID's marker = that process exited uncleanly with the cache open
    (inuse / "999999").touch()
    ensure_clean_cache(str(cache))
    assert (cache / "entry").exists()  # entries survive an unclean exit
    assert not (inuse / "999999").exists()  # dead marker reaped
    assert (inuse / str(os.getpid())).exists()  # this process registered


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


def test_killed_run_then_next_run_reuses_entries(tmp_path):
    """End-to-end: SIGKILL a cache-holding process; the next run must keep
    its (possibly expensive) entries and register cleanly."""
    cache = tmp_path / "cache"
    code = (
        "import sys, os, time; sys.path.insert(0, '/root/repo')\n"
        "from brax_tracking_tpu.cache_guard import ensure_clean_cache\n"
        f"c = ensure_clean_cache({str(cache)!r})\n"
        "open(os.path.join(c, 'expensive-entry'), 'w').write('x')\n"
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
    assert (cache / "expensive-entry").exists()
    assert os.listdir(cache / ".inuse") == [str(os.getpid())]


def test_jax_recovers_from_truncated_entry(tmp_path):
    """The fact the no-wipe policy rests on: a truncated persistent-cache
    entry makes jax warn + recompile, not crash. Run in a subprocess so a
    regression (segfault on read) fails the test instead of killing pytest.
    """
    cache = str(tmp_path / "jc")
    prelude = (
        "import os\n"
        "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax, jax.numpy as jnp\n"
        f"jax.config.update('jax_compilation_cache_dir', {cache!r})\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)\n"
        "jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)\n"
        "f = jax.jit(lambda x: jnp.sin(x) @ x.T)\n"
        "print(float(f(jnp.ones((32, 32))).block_until_ready().sum()))\n"
    )
    env = {**os.environ, "XLA_FLAGS": ""}
    r1 = subprocess.run(
        [sys.executable, "-c", prelude], env=env, capture_output=True, text=True
    )
    assert r1.returncode == 0, r1.stderr
    entries = [p for p in glob.glob(cache + "/*") if os.path.isfile(p)]
    assert entries, "persistent cache wrote no entries"
    for p in entries:  # simulate a crash mid-write on every entry
        with open(p, "r+b") as fh:
            fh.truncate(max(os.path.getsize(p) // 2, 1))
    r2 = subprocess.run(
        [sys.executable, "-c", prelude], env=env, capture_output=True, text=True
    )
    assert r2.returncode == 0, r2.stderr
    assert r1.stdout == r2.stdout
