"""Serving tier: HTTP round-trip against a live server (CPU backend)."""

import json
import threading
import urllib.request
import urllib.error

import pytest

from fewshot import training
from fewshot.config import Config
from fewshot.serve import Generator, serve

CFG = Config(vocab_size=64, max_len=24, embed_dim=16, hidden_dim=24,
             num_layers=1, batch_size=4, support_size=2, query_size=1,
             sample_tokens=12, data_parallel=False)


@pytest.fixture(scope="module")
def server(tiny_corpus):
    state = training.init_train_state(CFG, len(tiny_corpus.vocab))
    gen = Generator(CFG, tiny_corpus, state.params, batch_size=4)
    srv = serve(gen, host="127.0.0.1", port=0)   # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=30) as resp:
        body = json.loads(resp.read())
    assert resp.status == 200
    assert body["status"] == "ok" and body["model"] == "lstm"


def test_generate(server):
    status, body = _post(server, {"num": 2, "split": "train",
                                  "episode_seed": 1})
    assert status == 200
    outs = body["continuations"]
    assert len(outs) == 2
    for rec in outs:
        assert "text" in rec and isinstance(rec["text"], str)
        assert rec["artist"].startswith("artist_")


def test_generate_by_artist(server, tiny_corpus):
    name = tiny_corpus.artist_names[0]
    status, body = _post(server, {"num": 1, "artist": name})
    assert status == 200
    assert body["continuations"][0]["artist"] == name


def test_bad_requests(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"artist": "nobody_ever"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"split": "bogus"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(server + "/nope", timeout=30)
    assert e.value.code == 404
    # wrong TYPES must yield an HTTP 400, never a dropped connection
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"num": None})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server, {"num": [1]})
    assert e.value.code == 400


def test_concurrent_requests_batch(server):
    """Concurrent mixed requests (different artists/temps) all succeed."""
    import concurrent.futures as cf
    payloads = [
        {"num": 1, "split": "train", "episode_seed": i,
         "temperature": 0.5 + 0.2 * i} for i in range(4)
    ]
    with cf.ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(lambda p: _post(server, p), payloads))
    for status, body in results:
        assert status == 200
        assert len(body["continuations"]) == 1
        assert "text" in body["continuations"][0]


def test_num_clamped_to_batch(server):
    status, body = _post(server, {"num": 99, "split": "train"})
    assert status == 200
    assert len(body["continuations"]) == 4   # server batch is 4


def test_request_larger_than_window_carries(server):
    """Two batch-filling requests in quick succession both complete."""
    import concurrent.futures as cf
    with cf.ThreadPoolExecutor(max_workers=2) as ex:
        r1 = ex.submit(_post, server, {"num": 3, "split": "train"})
        r2 = ex.submit(_post, server, {"num": 3, "split": "train",
                                       "episode_seed": 5})
        for f in (r1, r2):
            status, body = f.result(timeout=120)
            assert status == 200
            assert len(body["continuations"]) == 3


def test_multichip_serving_matches_single(tiny_corpus):
    """Sharding /generate over the 8-device mesh changes NOTHING row-wise.

    Per-row PRNG keys make the program batch-layout invariant, so the GSPMD
    run must produce bit-identical continuations to the meshless one."""
    from fewshot.parallel.mesh import make_mesh
    state = training.init_train_state(CFG, len(tiny_corpus.vocab))
    plain = Generator(CFG, tiny_corpus, state.params, batch_size=8)
    mesh = make_mesh()
    assert mesh.devices.size == 8    # conftest forces the virtual mesh
    sharded = Generator(CFG, tiny_corpus, state.params, batch_size=8,
                        mesh=mesh)
    assert sharded.batch == 8
    assert sharded._row_sharding is not None
    for seed in (3, 11):
        a = plain.generate(num=8, split="train", episode_seed=seed)
        b = sharded.generate(num=8, split="train", episode_seed=seed)
        assert [r["text"] for r in a] == [r["text"] for r in b]
        assert [r["artist"] for r in a] == [r["artist"] for r in b]


def test_seed_reproducible_regardless_of_batching(server):
    """A request's output must not depend on what it was coalesced with."""
    import concurrent.futures as cf
    ref_status, ref = _post(server, {"num": 1, "split": "train",
                                     "episode_seed": 42})
    assert ref_status == 200
    # same request re-sent amid concurrent noise
    with cf.ThreadPoolExecutor(max_workers=3) as ex:
        noise1 = ex.submit(_post, server, {"num": 2, "split": "train",
                                           "episode_seed": 7})
        target = ex.submit(_post, server, {"num": 1, "split": "train",
                                           "episode_seed": 42})
        noise2 = ex.submit(_post, server, {"num": 1, "split": "train",
                                           "episode_seed": 9,
                                           "temperature": 0.4})
        for f in (noise1, noise2):
            f.result(timeout=120)
        status, got = target.result(timeout=120)
    assert status == 200
    assert got["continuations"][0]["text"] == ref["continuations"][0]["text"]
    assert got["continuations"][0]["artist"] == \
        ref["continuations"][0]["artist"]


def test_serve_cache_head_model(tiny_corpus):
    """The flagship quality config (full neural-cache posterior stack) is
    servable: the decode loop mixes the support posterior per step (static
    and continuous-cache forms) and still returns valid ids."""
    import dataclasses
    for dyn in (False, True):
        cfg = dataclasses.replace(
            CFG, support_cache=True, cache_backoff="global",
            cache_calib=True, cache_calib_freq=True, cache_dynamic=dyn)
        state = training.init_train_state(cfg, len(tiny_corpus.vocab))
        gen = Generator(cfg, tiny_corpus, state.params, batch_size=4)
        outs = gen.generate(num=2, split="train", episode_seed=3)
        assert len(outs) == 2
        for rec in outs:
            assert isinstance(rec["text"], str)
        # fixed seed -> reproducible under the cache head too
        again = gen.generate(num=2, split="train", episode_seed=3)
        assert [r["text"] for r in outs] == [r["text"] for r in again]
