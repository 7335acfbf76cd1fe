"""Serving sustained-QPS study on the real TPU (manual; not driver bench).

PERF.md round 3 measured warm /predict latency and named cross-request
base-pass batching as the next lever if sustained QPS matters. This
drives `tools/serve.py`'s CPTService in-process (no HTTP overhead) with
a concurrent client pool and measures steady-state requests/s, with and
without `--base_batch` micro-batching.

Usage (run each mode in its OWN process — two resident X152 extractors
don't fit HBM):
    python bench_serve.py 1      # serial worker (round-3 baseline path)
    python bench_serve.py 4      # micro-batched base passes
"""
import concurrent.futures
import sys
import time

import numpy as np


def main():
    base_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    n_requests = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    concurrency = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from cpt_tpu.tools.serve import CPTService, build_args

    args = build_args().parse_args(
        ["--windowed", "--no_warmup"] +
        (["--base_batch", str(base_batch)] if base_batch > 1 else []))
    svc = CPTService(args)

    rng = np.random.RandomState(0)
    h, w = 480, 640
    # sort over axis 1 gives [[x0, y0], [x1, y1]] with x0<=x1, y0<=y1;
    # plain reshape is then valid xyxy
    dets = np.sort(rng.uniform(10, 300, (10, 2, 2)), axis=1)
    dets = dets.reshape(10, 4).tolist()

    def req(i):
        img = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        return svc.predict(img, f"the red object number {i}", dets)

    t0 = time.perf_counter()
    req(0)
    print(f"warmup (compile) {time.perf_counter() - t0:.1f}s")
    # one more warm serial request to confirm steady state
    t0 = time.perf_counter()
    req(1)
    print(f"warm serial request {time.perf_counter() - t0:.2f}s")
    # warm the BATCHED base shapes too (queue drains of 2..base_batch each
    # compile their own vmapped base program) — two concurrent rounds
    for _ in range(2):
        t0 = time.perf_counter()
        with concurrent.futures.ThreadPoolExecutor(concurrency) as ex:
            list(ex.map(req, range(concurrency)))
        print(f"concurrent warm round: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(concurrency) as ex:
        list(ex.map(req, range(n_requests)))
    dt = time.perf_counter() - t0
    print(f"base_batch={base_batch}: {n_requests} requests, "
          f"concurrency {concurrency}: {dt:.1f}s wall = "
          f"{n_requests / dt:.2f} req/s")
    if svc.batcher is not None:
        s = svc.batcher.stats
        print(f"drains: {s['drains']}")
        print("base_s:", [round(v, 2) for v in s["base_s"]])
        print("finish_s:", [round(v, 2) for v in s["finish_s"]])


if __name__ == "__main__":
    main()
