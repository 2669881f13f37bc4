"""Pin the in-process BLAS to one thread (worker-side).

Every heavy numpy consumer here runs inside a Spark Python worker, N of
which already saturate the machine — an OpenBLAS pool per worker
oversubscribes cores and adds pool-synchronization jitter to every small
matmul (measured ~2x on the recognizer's per-image Hamming matmul).
Setting the env vars works only if done before numpy loads BLAS, which a
pyspark worker has already done by the time operator code runs — so this
pins at runtime through the loaded library's own control symbol.
"""

from __future__ import annotations

import ctypes
import os

_done = False


def pin_blas_single_thread() -> bool:
    """Best-effort: set the loaded OpenBLAS pool to 1 thread. Idempotent,
    never raises; returns True when a control symbol was found."""
    global _done
    if _done:
        return True
    try:
        paths = set()
        with open("/proc/self/maps", encoding="utf-8") as fh:
            for line in fh:
                part = line.split()[-1]
                if "openblas" in part.lower():
                    paths.add(part)
        for path in paths:
            lib = ctypes.CDLL(path)
            for sym in ("openblas_set_num_threads64_",
                        "openblas_set_num_threads"):
                if hasattr(lib, sym):
                    getattr(lib, sym)(1)
                    _done = True
                    return True
    except Exception:
        pass
    # fallback for a not-yet-loaded BLAS (harmless if already loaded)
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    return False
