"""Host-keyed persistent-compile-cache paths.

XLA's CPU backend serializes AOT executables specialized to the compiling
machine's CPU features; loading them on a different machine warns
"could lead to execution errors such as SIGILL" — and does exactly that.
The hosts running this repo ROTATE between rounds while ``/tmp`` cache
directories persist, so a bare ``/tmp/<name>`` cache eventually feeds a
new host another host's AOT code (observed: round-4 suite SIGILL, round-5
``cpu_aot_loader`` mismatch warnings on the CLI default cache).

:func:`host_keyed` appends a fingerprint of the host CPU to any cache
path, so each machine type gets its own directory and cross-host loads
become impossible. TPU executables are device-targeted (not host-CPU-
targeted), but a TPU-backed process still compiles host-side CPU
executables for small arrays — key those caches too.
"""

from __future__ import annotations

import hashlib
import os
import platform
from functools import lru_cache


@lru_cache(maxsize=1)
def host_fingerprint() -> str:
    """Stable 8-hex-char id of this machine's CPU feature set."""
    bits = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    bits.append(line.strip())
                    if len(bits) >= 3:
                        break
    except OSError:
        bits.append(platform.processor())
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:8]


def host_keyed(path: str) -> str:
    """``/tmp/foo`` -> ``/tmp/foo-<cpu fingerprint>``."""
    return f"{path.rstrip(os.sep)}-{host_fingerprint()}"
