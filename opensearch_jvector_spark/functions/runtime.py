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
    _done = True
