"""Serving throughput: CaptionServer (dynamic batcher) on one chip,
flagship geometry, synthetic preprocessed images.

Measures steady-state captions/s at a given request concurrency and the
p50/p95 request latency — the serving analogue of bench.py's offline
batch number.  Run: python benchmarks/bench_serving.py [batch_size]
"""

import sys
import threading
import time

import numpy as np


def main(batch_size=64, n_requests=512, window=None):
    """window = max requests outstanding (default 3x batch: enough to
    keep two batches in flight while the third fills)."""
    import jax
    from vitcap_tpu.models.config import ModelConfig
    from vitcap_tpu.models import vitcap as M
    from vitcap_tpu.serving import CaptionServer
    from vitcap_tpu.utils.common import enable_compilation_cache
    enable_compilation_cache()

    window = window or 3 * batch_size
    cfg = ModelConfig(dtype="bfloat16")
    params = M.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    # uint8 feed: raw resized RGB bytes, the production submit dtype
    # (normalization folds into patch_embed on device)
    imgs = [rng.randint(0, 256, (cfg.img_size, cfg.img_size, 3), np.uint8)
            for _ in range(32)]

    sem = threading.Semaphore(window)
    lat = []
    lock = threading.Lock()

    with CaptionServer(params, cfg, batch_size=batch_size,
                       max_delay_s=0.002) as server:
        server.caption(imgs[0])              # compile
        t0 = time.perf_counter()

        def record(t_sub):
            def cb(fut):
                with lock:
                    lat.append(time.perf_counter() - t_sub)
                sem.release()
            return cb

        for i in range(n_requests):
            sem.acquire()
            t = time.perf_counter()
            server.submit(imgs[i % len(imgs)]).add_done_callback(record(t))
        for _ in range(window):              # drain
            sem.acquire()
        dt = time.perf_counter() - t0
        stats = server.stats()

    lat = np.sort(np.array(lat))
    done = len(lat)
    print({
        "serving_caps_per_s": round(done / dt, 2),
        "p50_latency_ms": round(float(lat[done // 2]) * 1e3, 1),
        "p95_latency_ms": round(float(lat[int(done * 0.95)]) * 1e3, 1),
        "mean_fill": round(stats["mean_fill"], 1),
        "batch_size": batch_size,
        "window": window,
    })


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
