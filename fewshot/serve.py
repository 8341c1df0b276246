"""Serving tier: few-shot continuations over HTTP from a warm checkpoint.

The reference has no serving story (its sampler does one sess.run per token,
SURVEY.md §4.3); this module is the production-facing counterpart the north
star implies ("few-shot sampling executes fully on device").  One process
loads the corpus + checkpoint once, warms the jitted on-device sampler, and
serves:

    GET  /healthz                    -> {"status": "ok", ...}
    POST /generate                   -> {"continuations": [...]}
        {"artist": <name or id>,     # support drawn from this artist, or
         "episode_seed": 0,          #   a random split artist if omitted
         "num": 4,                   # continuations (padded to batch size)
         "split": "test"}

Requests are padded to the server's fixed batch size so every call replays
the same compiled program — no recompiles, no per-token host round-trips.
Device work is serialized with a lock (single chip); the HTTP layer is
stdlib ThreadingHTTPServer, so health checks never block behind generation.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import sampling as sampling_mod
from fewshot.data import episodes as eps
from fewshot.data import midi as midi_mod
from fewshot.data.lyrics import detokenize


class Generator:
    """Warm, lock-serialized wrapper around the jitted sampling program."""

    def __init__(self, cfg, corpus, params, batch_size: int | None = None):
        self.cfg = cfg
        self.corpus = corpus
        self.params = params
        self.batch = batch_size or max(4, cfg.batch_size)
        self.data = eps.put_corpus(corpus)
        self.splits = {k: jnp.asarray(v) for k, v in corpus.splits.items()}
        self.token_masks = None
        if cfg.dataset == "midi" and cfg.grammar_sampling and \
                not corpus.merges:
            self.token_masks = jnp.asarray(
                midi_mod.grammar_masks(corpus.vocab))
        self._lock = threading.Lock()
        self._artist_index = {name: i for i, name
                              in enumerate(corpus.artist_names)}
        self.warm_s = self._warmup()

    def _sample(self, key, split_ids, artist_id, temperature=None):
        if artist_id is None:
            ep = eps.sample_episode(key, self.data, split_ids, self.batch,
                                    k=self.cfg.support_size,
                                    q=self.cfg.query_size)
            support, support_len = ep.support, ep.support_len
            artists = np.asarray(ep.artist)
        else:
            one = jnp.asarray([artist_id], jnp.int32)
            ep = eps.sample_episode(key, self.data, one, self.batch,
                                    k=self.cfg.support_size,
                                    q=self.cfg.query_size)
            support, support_len = ep.support, ep.support_len
            artists = np.asarray(ep.artist)
        toks = sampling_mod.generate(self.params, support, support_len,
                                     jax.random.fold_in(key, 1), self.cfg,
                                     token_masks=self.token_masks,
                                     temperature=temperature)
        return np.asarray(jax.device_get(toks)), artists

    def _warmup(self) -> float:
        t0 = time.perf_counter()
        split = next(iter(self.splits.values()))
        out, _ = self._sample(jax.random.PRNGKey(0), split, None)
        out.sum()
        return time.perf_counter() - t0

    def generate(self, num: int, split: str = "test",
                 artist: str | int | None = None,
                 episode_seed: int = 0,
                 temperature: float | None = None) -> list[dict]:
        """temperature is a traced argument of the compiled sampler, so
        per-request values cost no recompile."""
        artist_id = None
        if artist is not None:
            if isinstance(artist, str) and not artist.isdigit():
                if artist not in self._artist_index:
                    raise KeyError(f"unknown artist {artist!r}")
                artist_id = self._artist_index[artist]
            else:
                artist_id = int(artist)
                if not 0 <= artist_id < self.corpus.num_artists:
                    raise KeyError(f"artist id {artist_id} out of range")
        if split not in self.splits:
            raise KeyError(f"unknown split {split!r}")
        num = max(1, min(num, self.batch))

        with self._lock:
            t0 = time.perf_counter()
            toks, artists = self._sample(
                jax.random.PRNGKey(episode_seed), self.splits[split],
                artist_id, temperature)
            dt = time.perf_counter() - t0

        out = []
        for i in range(num):
            ids = toks[i]
            if self.corpus.merges:
                from fewshot.data import bpe
                ids = bpe.expand(ids, self.corpus.merges)
            words = self.corpus.vocab.decode(ids)
            name = (self.corpus.artist_names[int(artists[i])]
                    if self.corpus.artist_names else str(int(artists[i])))
            rec = {"artist": name, "tokens": len(words),
                   "latency_s": round(dt, 4)}
            if self.cfg.dataset == "midi":
                rec["events"] = words
                rec["notes"] = len(midi_mod.events_to_notes(words))
            else:
                rec["text"] = detokenize(words)
            out.append(rec)
        return out


def make_handler(gen: Generator):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "model": gen.cfg.model,
                                  "dataset": gen.cfg.dataset,
                                  "batch": gen.batch,
                                  "warmup_s": round(gen.warm_s, 2)})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                temp = req.get("temperature")
                outs = gen.generate(
                    num=int(req.get("num", 1)),
                    split=req.get("split", "test"),
                    artist=req.get("artist"),
                    episode_seed=int(req.get("episode_seed", 0)),
                    temperature=float(temp) if temp is not None else None)
                self._reply(200, {"continuations": outs})
            except KeyError as e:
                self._reply(400, {"error": str(e)})
            except (ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"bad request: {e}"})

    return Handler


def serve(gen: Generator, host: str = "127.0.0.1", port: int = 8476
          ) -> ThreadingHTTPServer:
    server = ThreadingHTTPServer((host, port), make_handler(gen))
    return server


def serve_main(argv=None) -> None:
    from fewshot.cli import _setup
    from fewshot import training
    from fewshot.utils.ckpt import recover_or_init

    def flags(p):
        p.add_argument("--host", default="127.0.0.1")
        p.add_argument("--port", type=int, default=8476)
        p.add_argument("--serve_batch", type=int, default=None)
    args, cfg, corpus = _setup(argv, flags)
    state = training.init_train_state(cfg, len(corpus.vocab))
    vocab_hash = corpus.vocab.content_hash() if corpus.vocab else ""
    state, restored = recover_or_init(args.checkpt_dir, state, vocab_hash)
    if args.checkpt_dir and not restored:
        import sys
        sys.exit(f"no checkpoint found in {args.checkpt_dir}")
    gen = Generator(cfg, corpus, state.params, args.serve_batch)
    server = serve(gen, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(warmup {gen.warm_s:.1f}s, batch {gen.batch})", flush=True)
    server.serve_forever()
