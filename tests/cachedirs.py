"""Machine-fingerprinted CPU compile-cache directories for the test suite.

Why: the home directory persists across (possibly heterogeneous) machines
in this environment, and jax's persistent-cache key does NOT include host
CPU features — an XLA:CPU executable cached on one machine can be loaded
on another and SIGILL ("Machine type used for XLA:CPU compilation doesn't
match the machine type for execution", observed crashing a multihost
worker in round 5). Keying the CPU cache dirs by a hash of the host's CPU
flags keeps cache hits machine-local while still sharing across runs on
the same machine. The TPU-session cache (~/.cache/jax_comp_cache, set by
ircolor_tpu/__init__.py) is unaffected: TPU executables don't depend on
host CPU features.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _machine_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo", "r", encoding="utf-8") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


def cpu_cache_dir(tag: str) -> str:
    """Per-machine persistent cache dir for CPU-pinned test processes."""
    return os.path.expanduser(
        f"~/.cache/jax_comp_cache_cpu_{tag}_{_machine_fingerprint()}"
    )
