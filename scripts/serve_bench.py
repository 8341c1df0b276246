#!/usr/bin/env python
"""Serving-tier benchmark: latency + throughput of a live /generate server.

Stands up the real HTTP serving stack (fewshot/serve.py: warm jitted
sampler + request batcher + ThreadingHTTPServer) against the bench corpus
at the flagship model shape, then measures:

  * sequential single-request latency (num=1): p50 / p95 ms — dominated
    by the support prime + decode, all on device;
  * concurrent throughput: C parallel clients firing back-to-back
    requests — the batcher coalesces them into shared device calls, so
    this exercises the production path (SURVEY.md §4.3's per-token
    host round trip is the reference behavior this replaces).

Writes benchmarks/serve_bench.json and prints one JSON line.
Run on the real chip: `python scripts/serve_bench.py`.
Knobs: --tokens (default 64), --clients (4), --requests (24 per client).
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return json.loads(resp.read())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--tokens", type=int, default=64)
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--requests", type=int, default=24)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--corpus_dir", default=None,
                   help="serve from this packed corpus instead of the "
                        "small-vocab bench corpus (e.g. "
                        "data/scale_lyrics/plain for V=5000)")
    p.add_argument("--cache", action="store_true",
                   help="serve the flagship-quality model: full neural-"
                        "cache posterior stack (global backoff + count "
                        "calibration + freq slope + continuous cache)")
    p.add_argument("--tag", default=None,
                   help="artifact key (default: derived from corpus/cache)")
    args = p.parse_args(argv)

    from fewshot.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import ensure_corpus
    from fewshot import training
    from fewshot.config import Config
    from fewshot.serve import Generator, serve

    if args.corpus_dir:
        from fewshot.data.corpus import PackedCorpus
        corpus = PackedCorpus.load(Path(args.corpus_dir))
    else:
        corpus = ensure_corpus()
    cache_over = (dict(support_cache=True, cache_backoff="global",
                       cache_calib=True, cache_calib_freq=True,
                       cache_dynamic=True) if args.cache else {})
    cfg = Config(vocab_size=len(corpus.vocab), max_len=corpus.max_len,
                 embed_dim=256,
                 hidden_dim=512, num_layers=2, batch_size=32,
                 support_size=5, query_size=5, cell="pallas",
                 support_mode="mean_state", compute_dtype="bfloat16",
                 sample_tokens=args.tokens, data_parallel=False,
                 **cache_over)
    state = training.init_train_state(cfg, len(corpus.vocab))
    gen = Generator(cfg, corpus, state.params, batch_size=args.batch)
    srv = serve(gen, host="127.0.0.1", port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    print(f"server warm in {gen.warm_s:.1f}s; batch={gen.batch}",
          flush=True)

    # sequential single-request latency
    lats = []
    for i in range(30):
        t0 = time.perf_counter()
        post(url, {"num": 1, "split": "train", "episode_seed": i})
        lats.append(time.perf_counter() - t0)
    lats.sort()
    p50 = lats[len(lats) // 2] * 1e3
    p95 = lats[int(len(lats) * 0.95)] * 1e3
    print(f"sequential num=1: p50 {p50:.1f} ms, p95 {p95:.1f} ms",
          flush=True)

    # concurrent clients
    done = []
    lock = threading.Lock()

    def client(cid):
        for i in range(args.requests):
            t0 = time.perf_counter()
            post(url, {"num": 1, "split": "train",
                       "episode_seed": cid * 1000 + i})
            with lock:
                done.append(time.perf_counter() - t0)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,))
               for c in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    n = args.clients * args.requests
    done.sort()
    rec = {
        "metric": "serve_requests_per_sec",
        "value": round(n / wall, 2),
        "unit": (f"req/s ({args.clients} clients, num=1, "
                 f"{args.tokens} tokens, batch={gen.batch}, 1 chip)"),
        "vocab": len(corpus.vocab),
        "support_cache": bool(args.cache),
        "tokens_per_sec": round(n * args.tokens / wall, 1),
        "seq_p50_ms": round(p50, 1),
        "seq_p95_ms": round(p95, 1),
        "concurrent_p50_ms": round(done[len(done) // 2] * 1e3, 1),
        "concurrent_p95_ms": round(done[int(len(done) * 0.95)] * 1e3, 1),
        "warm_s": round(gen.warm_s, 1),
    }
    # keyed artifact: one entry per served shape (small-vocab flagship,
    # V=5000 full-cache, ...) so numbers for different shapes coexist
    tag = args.tag or (
        f"v{len(corpus.vocab)}" + ("_cache_full" if args.cache else ""))
    path = REPO / "benchmarks" / "serve_bench.json"
    book = {}
    if path.exists():
        book = json.loads(path.read_text())
        if "metric" in book:            # migrate the r3 single-record form
            book = {"v104": book}
    book[tag] = rec
    path.write_text(json.dumps(book, indent=1) + "\n")
    print(json.dumps({tag: rec}), flush=True)
    srv.shutdown()


if __name__ == "__main__":
    main()
