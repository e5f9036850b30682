"""Worker-side runtime guards.

Every Spark python worker runs our Arrow/numpy kernels. PyArrow's
compute kernels use a PROCESS-GLOBAL thread pool sized to the machine
(hardware_concurrency). With 32 concurrent python workers that is
32 x 32 nested threads — measured ~2x end-to-end build slowdown at
local[32] vs local[8] purely from scheduler thrash. Spark tasks are
the parallelism unit; intra-kernel parallelism must be 1.

``limit_worker_threads()`` is called at the top of every kernel; it is
idempotent and costs nanoseconds after the first call per process.
"""

from __future__ import annotations

_done = False
_blas_done = False


def limit_blas_threads(n: int = 1) -> None:
    """Pin the numpy-bundled OpenBLAS pool to ``n`` threads. The
    default pool sizes itself to hardware_concurrency, and on a
    32-thread host a TRIVIAL (1250x128) matvec measures ~11 ms of
    thread-spawn/sync against 0.03 ms single-threaded — a 400x tax on
    every small kernel. Our parallelism units are Spark tasks (workers)
    and driver queries (tiny ops), so intra-BLAS parallelism must be 1
    everywhere, same reasoning as the pyarrow pool below. Uses the
    OpenBLAS C API via ctypes (threadpoolctl is not available in this
    environment); silently a no-op for other BLAS builds."""
    global _blas_done
    if _blas_done:
        return
    try:
        import ctypes
        import glob
        import os

        import numpy as np

        libs_dir = os.path.join(
            os.path.dirname(os.path.dirname(np.__file__)), "numpy.libs"
        )
        for so in glob.glob(os.path.join(libs_dir, "*openblas*.so*")):
            lib = ctypes.CDLL(so)
            for fn in ("openblas_set_num_threads64_",
                       "openblas_set_num_threads"):
                if hasattr(lib, fn):
                    getattr(lib, fn)(int(n))
                    _blas_done = True
                    return
    except Exception:
        pass
    _blas_done = True


def limit_worker_threads() -> None:
    global _done
    if _done:
        return
    import pyarrow as pa

    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(1)
    except Exception:
        pass
    limit_blas_threads(1)
    _done = True
