"""Online-serving benchmark: sustained requests/s + latency through the
real HTTP stack (`ucf_vit_tpu.serve`) on the shipped ViT-B classification
config shapes.

Measures the full serving path a deployment pays: npy-over-HTTP loopback ->
micro-batcher coalescing -> fixed-shape jitted forward -> response. Reports
throughput, latency percentiles, and mean batch fill — the fill is the
number that matters on an accelerator (occupancy == throughput).

Usage: python benchmarks/bench_serve.py [max_batch] [clients] [seconds] [depth]
       (defaults: 32 64 20 1; depth = MicroBatcher pipeline_depth)
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench_env  # noqa: E402
bench_env.normalize_jax_platforms()



def main():
    max_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    clients = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    seconds = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    depth = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from ucf_vit_tpu.config import load_config
    from ucf_vit_tpu.serve import make_server

    cfg = load_config("configs/imagenet/classification/base_config.yaml")
    t0 = time.perf_counter()
    server = make_server(cfg, host="127.0.0.1", port=0,
                         max_batch=max_batch, max_wait_ms=5.0,
                         pipeline_depth=depth)
    port = server.server_address[1]
    print(f"warmed in {time.perf_counter() - t0:.1f}s, serving on :{port}",
          flush=True)
    threading.Thread(target=server.serve_forever, daemon=True).start()

    nd = 2 if cfg.twoD else 3
    shape = (cfg.max_channels,) + tuple(cfg.tile_size[:nd])
    buf = io.BytesIO()
    np.save(buf, np.random.default_rng(0).normal(size=shape).astype(np.float32))
    body = buf.getvalue()
    url = f"http://127.0.0.1:{port}/v1/predict"

    latencies: list = []
    lat_lock = threading.Lock()
    stop = threading.Event()

    def client():
        mine = []
        while not stop.is_set():
            t = time.perf_counter()
            req = urllib.request.Request(url, data=body, method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                np.load(io.BytesIO(r.read()))
            mine.append(time.perf_counter() - t)
        with lat_lock:
            latencies.extend(mine)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(seconds)
    stop.set()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    stats = json.loads(urllib.request.urlopen(
        f"http://127.0.0.1:{port}/v1/stats", timeout=30).read())
    server.shutdown()
    server.server_close()

    lat = np.sort(np.asarray(latencies))
    out = {
        "metric": "served_requests_per_s",
        "value": round(len(lat) / wall, 1),
        "unit": "req/s",
        "max_batch": max_batch,
        "clients": clients,
        "pipeline_depth": depth,
        "mean_batch_fill": round(stats.get("mean_batch_fill", 0.0), 2),
        "latency_p50_ms": round(float(lat[len(lat) // 2]) * 1e3, 1),
        "latency_p95_ms": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 1),
        "requests": len(lat),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
