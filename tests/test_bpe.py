"""BPE over token streams: learn/encode/expand round-trips + corpus wiring."""

import numpy as np

from fewshot.data import bpe
from fewshot.data.corpus import PackedCorpus, build_midi_corpus
from fewshot.data.synthetic import generate_midi_corpus
from fewshot.data.vocab import SPECIALS, Vocab


def _vocab(n=10):
    return Vocab(SPECIALS + [f"t{i}" for i in range(n)])


def test_learn_and_roundtrip():
    v = _vocab()
    base = len(SPECIALS)
    seqs = [[base, base + 1, base + 2, base, base + 1],
            [base, base + 1, base, base + 1, base + 3]]
    v2, merges = bpe.learn_bpe(seqs, v, num_merges=3)
    assert len(v2) > len(v)
    assert merges[0][:2] == (base, base + 1)   # most frequent pair first
    for s in seqs:
        enc = bpe.encode(s, merges)
        assert len(enc) < len(s)               # compression happened
        assert bpe.expand(enc, merges) == s    # lossless


def _learn_bpe_recount_oracle(sequences, vocab, num_merges, min_count=2):
    """Round-1 reference implementation: full recount + re-merge per round.
    Kept as the differential oracle for the heap-based learn_bpe."""
    from collections import Counter
    seqs = [list(s) for s in sequences]
    tokens = list(vocab.tokens)
    merges = []
    n_special = len(SPECIALS)
    for _ in range(num_merges):
        pairs = Counter()
        for s in seqs:
            for a, b in zip(s, s[1:]):
                if a >= n_special and b >= n_special:
                    pairs[(a, b)] += 1
        if not pairs:
            break
        (a, b), count = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))
        if count < min_count:
            break
        new_id = len(tokens)
        tokens.append(f"{tokens[a]}+{tokens[b]}")
        merges.append((a, b, new_id))
        for i, s in enumerate(seqs):
            seqs[i] = bpe._merge_pair(s, a, b, new_id)
    return Vocab(tokens), merges, seqs


def test_learn_bpe_matches_recount_oracle():
    """Heap-based learn_bpe must pick the SAME merges (incl. tie-breaks and
    overlapping runs like a,a,a) as the naive recount reference."""
    rng = np.random.RandomState(0)
    base = len(SPECIALS)
    for trial in range(8):
        n_types = rng.randint(3, 12)
        seqs = [
            [base + int(t) for t in rng.randint(0, n_types,
                                                rng.randint(2, 40))]
            for _ in range(rng.randint(1, 12))]
        # salt in specials and long runs to hit the edge cases
        seqs.append([1, base, base, base, base, 2])
        v = _vocab(n_types)
        n_merges = int(rng.randint(1, 25))
        v_fast, m_fast = bpe.learn_bpe(seqs, v, n_merges)
        v_ref, m_ref, seqs_ref = _learn_bpe_recount_oracle(seqs, v, n_merges)
        assert m_fast == m_ref, f"trial {trial}"
        assert v_fast.tokens == v_ref.tokens
        # encode must reproduce the oracle's fully-merged sequences
        for s, want in zip(seqs, seqs_ref):
            assert bpe.encode(s, m_fast) == want


def test_specials_never_merge():
    v = _vocab()
    seqs = [[1, 1, 1, 1], [2, 2, 2, 2]]        # BOS/EOS runs
    v2, merges = bpe.learn_bpe(seqs, v, num_merges=5)
    assert merges == []


def test_merge_names_readable():
    v = _vocab()
    base = len(SPECIALS)
    v2, merges = bpe.learn_bpe([[base, base + 1] * 4], v, 1)
    a, b, new_id = merges[0]
    assert v2.tokens[new_id] == "t0+t1"


def test_midi_corpus_with_bpe(tmp_path):
    generate_midi_corpus(tmp_path / "mid", num_artists=4,
                         songs_per_artist=4, seed=0)
    plain = build_midi_corpus(tmp_path / "mid", tmp_path / "plain",
                              max_len=128)
    packed = build_midi_corpus(tmp_path / "mid", tmp_path / "bpe",
                               max_len=128, bpe_merges=40)
    assert packed.merges and len(packed.vocab) > len(plain.vocab)
    # BPE shortens songs
    assert packed.song_len.sum() < plain.song_len.sum()

    # round-trip through save/load keeps the merge table
    loaded = PackedCorpus.load(tmp_path / "bpe")
    assert loaded.merges == packed.merges

    # every packed song expands to the plain encoding (content equality)
    for i in range(packed.songs.shape[0]):
        enc = [int(t) for t in
               packed.songs[i][1:int(packed.song_len[i]) - 1]]
        base_ids = bpe.expand(enc, packed.merges)
        base_names = [packed.vocab.tokens[t] for t in base_ids]
        want_ids = [int(t) for t in
                    plain.songs[i][1:int(plain.song_len[i]) - 1]]
        want_names = [plain.vocab.tokens[t] for t in want_ids]
        # plain songs may be truncated at max_len; compare the prefix
        assert base_names[:len(want_names)] == want_names or \
            want_names[:len(base_names)] == base_names


def test_sample_cli_expands_bpe(tmp_path, capsys):
    """sample.py on a BPE MIDI corpus writes .mid files that re-parse."""
    from fewshot.cli import sample_main
    from fewshot.data.midi import parse_midi
    generate_midi_corpus(tmp_path / "mid", num_artists=4,
                         songs_per_artist=4, seed=0)
    build_midi_corpus(tmp_path / "mid", tmp_path / "corpus", max_len=128,
                      bpe_merges=40)
    (tmp_path / "d.yaml").write_text(
        f"dataset: midi\ncorpus_dir: {tmp_path / 'corpus'}\n"
        "vocab_size: 400\nmax_len: 128\n")
    (tmp_path / "m.yaml").write_text(
        "model: lstm\nembed_dim: 16\nhidden_dim: 24\nnum_layers: 1\n"
        "sample_tokens: 24\n")
    (tmp_path / "t.yaml").write_text(
        "task: episodic\nbatch_size: 4\nsupport_size: 2\nquery_size: 1\n"
        "data_parallel: false\n")
    sample_main(["--data", str(tmp_path / "d.yaml"),
                 "--model", str(tmp_path / "m.yaml"),
                 "--task", str(tmp_path / "t.yaml"),
                 "--out", str(tmp_path / "samples"), "--num", "2"])
    mids = sorted((tmp_path / "samples").glob("*.mid"))
    assert len(mids) == 2
    for m in mids:
        parse_midi(m)   # must be valid SMF


def test_evaluate_reports_base_token_nll(tmp_path, capsys):
    from fewshot.cli import evaluate_main
    generate_midi_corpus(tmp_path / "mid", num_artists=6,
                         songs_per_artist=6, seed=0)
    build_midi_corpus(tmp_path / "mid", tmp_path / "corpus", max_len=0,
                      bpe_merges=40)
    (tmp_path / "d.yaml").write_text(
        f"dataset: midi\ncorpus_dir: {tmp_path / 'corpus'}\n"
        "vocab_size: 400\nmax_len: 128\n")
    (tmp_path / "t.yaml").write_text(
        "task: episodic\nbatch_size: 4\nsupport_size: 2\nquery_size: 1\n"
        "eval_episodes: 4\ndata_parallel: false\n")
    (tmp_path / "m.yaml").write_text(
        "model: lstm\nembed_dim: 16\nhidden_dim: 24\nnum_layers: 1\n")
    evaluate_main(["--data", str(tmp_path / "d.yaml"),
                   "--model", str(tmp_path / "m.yaml"),
                   "--task", str(tmp_path / "t.yaml"),
                   "--split", "train", "--episodes", "4"])
    out = capsys.readouterr().out
    assert "_nll_per_token=" in out
    assert "_nll_per_base_token=" in out
    lines = {l.split("=")[0]: l for l in out.splitlines() if "=" in l}
    nll = float(lines["train_nll_per_token"].split("=")[1])
    base_line = lines["train_nll_per_base_token"]
    base = float(base_line.split("=")[1].split()[0])
    ratio = float(base_line.split("ratio ")[1].rstrip(")"))
    assert ratio < 1.0                    # BPE compressed the stream
    # ratio printed at 3 decimals; recomputation tolerance accordingly
    assert abs(base - nll * ratio) < 5e-3


def test_base_token_ratio_set_vs_split(tmp_path):
    """base_token_ratio over explicit song_ids scores exactly those songs
    (the --eval_set rescale must use the set's own query songs, not the
    --split pool — r3 review finding)."""
    import numpy as np
    from fewshot.data import episodes as eps
    generate_midi_corpus(tmp_path / "mid", num_artists=6,
                         songs_per_artist=6, seed=0)
    corpus = build_midi_corpus(tmp_path / "mid", tmp_path / "corpus",
                               max_len=0, bpe_merges=40)
    pool = eps.split_song_pool(corpus, "train")
    full = eps.base_token_ratio(corpus, "train")
    assert full == eps.base_token_ratio(corpus, song_ids=pool)
    # a strict subset generally has a different ratio; verify against a
    # direct recount
    sub = pool[: max(2, len(pool) // 3)]
    got = eps.base_token_ratio(corpus, song_ids=sub)
    want = (np.maximum(corpus.song_len[sub] - 1, 0).sum()
            / np.maximum(corpus.base_song_len[sub] - 1, 0).sum())
    assert abs(got - float(want)) < 1e-12
    assert 0.0 < got < 1.0
