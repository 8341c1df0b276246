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
Device work is serialized by the batching worker thread; the HTTP layer is
stdlib ThreadingHTTPServer, so health checks never block behind generation.

Multi-chip: pass a 1-D data mesh (cfg.data_parallel, the training mesh) and
the batched /generate call runs SPMD — per-row inputs (artists, keys,
temperatures) are sharded over the mesh, params/corpus are replicated, and
GSPMD shards the whole support-prime + decode program.  Row semantics are
unchanged (per-row PRNG keys), so outputs are bit-identical to the
single-chip program's; the batch is rounded up to a mesh multiple.
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


class _Request:
    """One /generate call waiting for its rows of a batched device call."""

    __slots__ = ("num", "artist_id", "split", "seed", "temperature",
                 "event", "toks", "artists", "latency", "error")

    def __init__(self, num, artist_id, split, seed, temperature):
        self.num = num
        self.artist_id = artist_id
        self.split = split
        self.seed = seed
        self.temperature = temperature
        self.event = threading.Event()
        self.toks = self.artists = self.latency = self.error = None


class Generator:
    """Warm wrapper around the jitted sampling program with request batching.

    Concurrent /generate calls are coalesced by a collector thread: the
    first request opens a window of `batch_deadline_ms`; whatever arrives in
    time shares ONE device call (rows are per-request artists/seeds/
    temperatures — all traced arguments, so mixing them costs nothing).
    Unused rows are padded with the first request's spec.
    """

    def __init__(self, cfg, corpus, params, batch_size: int | None = None,
                 batch_deadline_ms: float = 5.0, mesh=None):
        import queue
        self.cfg = cfg
        self.corpus = corpus
        self.batch = batch_size or max(4, cfg.batch_size)
        self.deadline = batch_deadline_ms / 1e3
        if mesh is not None and mesh.devices.size == 1:
            mesh = None                 # nothing to shard (see training.py)
        self.mesh = mesh
        self._row_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from fewshot.parallel.mesh import AXIS
            n = mesh.devices.size
            self.batch = -(-self.batch // n) * n        # mesh multiple
            self._row_sharding = NamedSharding(mesh, P(AXIS))
            rep = NamedSharding(mesh, P())
            params = jax.device_put(params, rep)
        self.params = params
        self.data = eps.put_corpus(corpus, mesh=mesh)
        self.splits = {k: np.asarray(v) for k, v in corpus.splits.items()}
        self.token_masks = None
        if cfg.dataset == "midi" and cfg.grammar_sampling and \
                not corpus.merges:
            self.token_masks = jnp.asarray(
                midi_mod.grammar_masks(corpus.vocab))
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                self.token_masks = jax.device_put(
                    self.token_masks, NamedSharding(mesh, P()))
        self._artist_index = {name: i for i, name
                              in enumerate(corpus.artist_names)}
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        self._carry: _Request | None = None
        self._worker = threading.Thread(target=self._batch_worker,
                                        daemon=True)
        self._worker.start()
        self.warm_s = self._warmup()

    # -- device call over fully per-row specs ---------------------------------

    def _run_batch(self, artists: np.ndarray, seeds: np.ndarray,
                   temps: np.ndarray):
        # Every key derives from the ROW's own seed (never its position in
        # the coalesced batch and never a neighbor's seed), so a request's
        # output is identical whether it ran alone or got batched.
        ep_keys = jnp.stack([
            jax.random.fold_in(jax.random.PRNGKey(int(s)), 0)
            for s in seeds])
        gen_keys = jnp.stack([
            jax.random.fold_in(jax.random.PRNGKey(int(s)), 1)
            for s in seeds])
        artist_ids = jnp.asarray(artists, jnp.int32)
        temps = jnp.asarray(temps, jnp.float32)
        if self._row_sharding is not None:
            # Shard the per-row inputs over the data mesh; GSPMD then runs
            # the whole episode-gather + support-prime + decode SPMD.
            ep_keys, gen_keys, artist_ids, temps = jax.device_put(
                (ep_keys, gen_keys, artist_ids, temps), self._row_sharding)
        ep = eps.sample_episode_for_artists(
            ep_keys, self.data, artist_ids,
            k=self.cfg.support_size, q=self.cfg.query_size)
        toks = sampling_mod.generate(
            self.params, ep.support, ep.support_len, gen_keys, self.cfg,
            token_masks=self.token_masks, temperature=temps)
        return np.asarray(jax.device_get(toks))

    def _row_specs(self, req: _Request, rng: np.random.RandomState):
        """Resolve one request into per-row (artist, seed, temp) arrays."""
        if req.artist_id is not None:
            artists = np.full(req.num, req.artist_id, np.int32)
        else:
            pool = self.splits[req.split]
            artists = rng.choice(pool, size=req.num).astype(np.int32)
        seeds = np.full(req.num, req.seed, np.int64) + np.arange(req.num)
        temp = (self.cfg.temperature if req.temperature is None
                else req.temperature)
        return artists, seeds, np.full(req.num, temp, np.float32)

    def _batch_worker(self) -> None:
        import queue as queue_mod
        import time as time_mod
        while True:
            first = self._carry or self._queue.get()
            self._carry = None
            reqs = [first]
            rows = first.num
            deadline = time_mod.perf_counter() + self.deadline
            while rows < self.batch:
                remain = deadline - time_mod.perf_counter()
                if remain <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=remain)
                except queue_mod.Empty:
                    break
                if rows + nxt.num > self.batch:
                    self._carry = nxt      # runs in the next batch
                    break
                reqs.append(nxt)
                rows += nxt.num
            try:
                specs = []
                for r in reqs:
                    rng = np.random.RandomState(r.seed & 0x7FFFFFFF)
                    specs.append(self._row_specs(r, rng))
                artists = np.concatenate([s[0] for s in specs])
                seeds = np.concatenate([s[1] for s in specs])
                temps = np.concatenate([s[2] for s in specs])
                pad = self.batch - len(artists)
                if pad > 0:
                    artists = np.concatenate([artists,
                                              np.repeat(artists[:1], pad)])
                    seeds = np.concatenate([seeds, seeds[:1] + 7777
                                            + np.arange(pad)])
                    temps = np.concatenate([temps,
                                            np.repeat(temps[:1], pad)])
                t0 = time_mod.perf_counter()
                toks = self._run_batch(artists, seeds, temps)
                dt = time_mod.perf_counter() - t0
                pos = 0
                for r in reqs:
                    r.toks = toks[pos:pos + r.num]
                    r.artists = artists[pos:pos + r.num]
                    r.latency = dt
                    pos += r.num
            except Exception as e:                        # noqa: BLE001
                for r in reqs:
                    r.error = e
            finally:
                for r in reqs:
                    r.event.set()

    def _warmup(self) -> float:
        t0 = time.perf_counter()
        split = next(iter(self.splits))
        self._submit(1, None, split, 0, None)
        return time.perf_counter() - t0

    def _submit(self, num, artist_id, split, seed, temperature):
        req = _Request(num, artist_id, split, seed, temperature)
        self._queue.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        return req

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

        req = self._submit(num, artist_id, split, episode_seed, temperature)
        toks, artists, dt = req.toks, req.artists, req.latency

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
            except (TypeError, ValueError, json.JSONDecodeError) as e:
                self._reply(400, {"error": f"bad request: {e}"})
            except Exception as e:                        # noqa: BLE001
                # malformed bodies / device-side failures must still get an
                # HTTP response, never a dropped connection
                self._reply(500, {"error": f"internal error: {e}"})

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
    if jax.process_count() > 1:
        # Multi-chip serving is single-process (one host's chips): with
        # multiple processes, each server's independent HTTP stream would
        # drive divergent cross-host collectives and hang.  Fail fast.
        import sys
        sys.exit("serve.py is single-process; launch it WITHOUT "
                 "FEWSHOT_COORDINATOR / FEWSHOT_NUM_PROCESSES (multi-chip "
                 "serving shards over the local chips only)")
    from fewshot.parallel.mesh import make_mesh
    mesh = make_mesh() if cfg.data_parallel else None
    gen = Generator(cfg, corpus, state.params, args.serve_batch, mesh=mesh)
    server = serve(gen, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(warmup {gen.warm_s:.1f}s, batch {gen.batch})", flush=True)
    server.serve_forever()
