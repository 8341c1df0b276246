"""Two-process (simulated multi-host) training over a global mesh.

Spawns two real processes, each with 2 virtual CPU devices, joined through
jax.distributed (Gloo) into one 4-device `data` mesh, and runs fused train
steps with the corpus replicated over the GLOBAL mesh.  Both processes must
observe identical psum'd losses — the actual multi-host code path
(FEWSHOT_* env vars), not a simulation of it.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from fewshot.parallel.distributed import maybe_initialize
assert maybe_initialize(), "FEWSHOT_* env vars not picked up"

import numpy as np
import jax.numpy as jnp
from fewshot import training
from fewshot.config import Config
from fewshot.data import episodes as eps
from fewshot.data.corpus import PackedCorpus
from fewshot.data.lyrics import tokenize_corpus
from fewshot.parallel.mesh import make_mesh

rng = np.random.RandomState(7)
words = [f"w{i}" for i in range(30)]
rows = []
for a in range(8):
    prefs = rng.dirichlet(np.ones(len(words)))
    for s in range(6):
        n = rng.randint(8, 20)
        rows.append((f"artist_{a}", f"song_{s}",
                     " ".join(rng.choice(words, size=n, p=prefs))))
vocab, items = tokenize_corpus(rows, vocab_size=64)
corpus = PackedCorpus.pack(items, vocab, max_len=24, seed=0)

cfg = Config(vocab_size=64, max_len=24, embed_dim=16, hidden_dim=24,
             num_layers=1, batch_size=8, support_size=2, query_size=2,
             lr=5e-3, data_parallel=True)
mesh = make_mesh()
assert mesh.devices.size == 4, mesh.devices
data = eps.put_corpus(corpus, mesh=mesh)
split = jnp.asarray(corpus.splits["train"])
step = training.make_train_step(cfg, data, split, mesh=mesh)
state = training.init_train_state(cfg, 64)
for _ in range(3):
    state, m = step(state)

# evaluate: sharded batches, psum'd (ce_sum, count) — identical on all hosts
nll = training.evaluate(cfg, state.params, data, split,
                        jax.random.PRNGKey(3), num_episodes=8, mesh=mesh)

# sample: replicated computation — identical tokens on all hosts
import hashlib
from fewshot import sampling as S
from fewshot.data.episodes import sample_episode
ep = sample_episode(jax.random.PRNGKey(5), data, split, 4, k=2, q=2)
toks = S.generate(state.params, ep.support, ep.support_len,
                  jax.random.PRNGKey(6), cfg, n_tokens=8)
digest = hashlib.md5(np.asarray(jax.device_get(toks)).tobytes()).hexdigest()
print(f"RESULT pid={jax.process_index()} loss={float(m['loss']):.6f} "
      f"eval={nll:.6f} sample={digest}", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training():
    port = _free_port()
    procs = []
    for pid in (0, 1):
        import os
        env = dict(os.environ)
        env.update(FEWSHOT_COORDINATOR=f"127.0.0.1:{port}",
                   FEWSHOT_NUM_PROCESSES="2",
                   FEWSHOT_PROCESS_ID=str(pid),
                   JAX_PLATFORMS="cpu")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    results = []
    for out in outs:
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert lines, out[-2000:]
        parts = dict(kv.split("=") for kv in lines[0].split()[1:])
        results.append(parts)
    losses = [float(r["loss"]) for r in results]
    evals = [float(r["eval"]) for r in results]
    assert np.isfinite(losses).all() and np.isfinite(evals).all()
    assert losses[0] == losses[1]   # psum'd loss identical on both hosts
    assert evals[0] == evals[1]     # sharded+psum'd eval NLL identical
    assert results[0]["sample"] == results[1]["sample"]  # same tokens
