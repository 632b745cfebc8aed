"""Stage helpers."""


def limit_worker_threads() -> None:
    """Cap pyarrow's per-process thread pools inside Ray worker processes.

    pyarrow defaults its compute/IO pools to os.cpu_count() *per process*;
    32 concurrent one-CPU Ray tasks each spawning 32 Arrow threads
    oversubscribes the box ~32x and was measured to slow the tokenize
    stage ~12x. Call from every stage constructor that runs in workers.
    """
    try:
        import ray

        w = ray._private.worker.global_worker
        if w.mode != ray._private.worker.WORKER_MODE:
            return  # driver process: leave Arrow parallel
    except Exception:
        return
    import pyarrow as pa

    try:
        if pa.cpu_count() > 2:
            pa.set_cpu_count(2)
        if pa.io_thread_count() > 2:
            pa.set_io_thread_count(2)
    except Exception:
        pass
