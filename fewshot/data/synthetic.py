"""Deterministic synthetic corpora for both modalities.

The sandbox has no network and no scraped data (SURVEY.md §9), so the L0
acquisition tier of the reference (lyrics + freemidi scrapers, SURVEY.md §2)
is replaced by a seeded generator producing the SAME artifacts the scrapers
would have: an (artist, song, lyrics) CSV and per-artist directories of real
`.mid` files.  Every artist gets a distinct generative "style" (signature
words / musical scale + register), so few-shot adaptation to an unseen
artist's support set measurably lowers query NLL — the corpus is a real
meta-learning task, not noise.
"""

from __future__ import annotations

import csv
from pathlib import Path

import numpy as np

from fewshot.data.midi import Note, write_midi

_COMMON = ("the a my your in on of and i you we it to for with night day "
           "heart time love never always gone away home road fire rain light "
           "dark dream run stay go know feel see hold take give").split()
_THEMES = [
    "river stone mountain echo wild silver cold north wind hollow".split(),
    "neon city subway velvet smoke midnight taxi skyline glass chrome".split(),
    "honey summer peach golden barefoot porch sweet clover meadow sun".split(),
    "ghost sorrow ashes winter grave pale mourning shadow bone frost".split(),
    "engine highway gasoline thunder steel whiskey dust leather crow".split(),
    "ocean salt sail horizon tide pearl drift harbor gull moon".split(),
]


def _artist_name(i: int) -> str:
    return f"artist_{i:03d}"


_SYLLABLES = ("ba be bi bo bu da de di do du ka ke ki ko ku la le li lo lu "
              "ma me mi mo mu na ne ni no nu ra re ri ro ru sa se si so su "
              "ta te ti to tu va ve vi vo vu za ze zi zo zu").split()


def _synth_words(n: int, rng) -> list[str]:
    """n distinct pronounceable fake words (vocab-scale corpora)."""
    words: list[str] = []
    seen = set(_COMMON)
    while len(words) < n:
        w = "".join(rng.choice(_SYLLABLES)
                    for _ in range(rng.randint(2, 5)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


class ArtistStyle:
    """The latent per-artist generative parameters (lyrics modality).

    Exposed so the oracle-entropy scorer (scripts/oracle_entropy.py) can
    compute the generator's exact token-level conditional distribution —
    the information-theoretic floor any model's test NLL is bounded by."""

    __slots__ = ("theme", "mix", "theme_w", "theme_rate", "pool_rate")

    def __init__(self, theme, mix, theme_w, theme_rate, pool_rate):
        self.theme = theme          # theme words (+12 pool signature words)
        self.mix = mix              # Dirichlet weights over _COMMON
        self.theme_w = theme_w      # Dirichlet weights over theme
        self.theme_rate = theme_rate
        self.pool_rate = pool_rate  # 0.35 when a pool exists, else 0.0


def make_pool(extra_vocab: int, rng) -> tuple[list[str], np.ndarray | None]:
    """The shared zipf-weighted synthetic word pool (vocab-scale corpora)."""
    if extra_vocab <= 0:
        return [], None
    pool = _synth_words(extra_vocab, rng)
    ranks = np.arange(1, len(pool) + 1, dtype=np.float64)
    pool_p = 1.0 / ranks ** 1.1
    pool_p /= pool_p.sum()
    return pool, pool_p


# Structural constants of the song process (shared with the oracle scorer):
# styled songs draw n_lines ~ U{6..11} with line lengths ~ U{4..8};
# generic filler draws n_lines ~ U{2..3} with line lengths ~ U{3..5}.
LINE_RANGE = (6, 12)
WORDS_RANGE = (4, 9)
GENERIC_LINE_RANGE = (2, 4)
GENERIC_WORDS_RANGE = (3, 6)


def _draw_style(rng, artist_idx: int, pool: list[str]) -> ArtistStyle:
    theme = list(_THEMES[artist_idx % len(_THEMES)])
    if pool:
        # artist signature words drawn from the big pool
        sig = rng.choice(len(pool), size=12, replace=False)
        theme = theme + [pool[i] for i in sig]
    mix = rng.dirichlet(np.ones(len(_COMMON)) * 2.0)
    theme_w = rng.dirichlet(np.ones(len(theme)) * 2.0)
    theme_rate = 0.35 + 0.2 * rng.rand()
    return ArtistStyle(theme, mix, theme_w, theme_rate,
                       0.35 if pool else 0.0)


def _draw_song(rng, style: ArtistStyle, pool: list[str],
               pool_p: np.ndarray | None, generic: bool) -> str:
    if generic:
        # style-free filler: short, global uniform common words
        n_lines = rng.randint(*GENERIC_LINE_RANGE)
        counts = rng.randint(*GENERIC_WORDS_RANGE, size=n_lines)
        n = int(counts.sum())
        w = rng.choice(len(_COMMON), size=n)
        words = [_COMMON[int(i)] for i in w]
    else:
        theme = style.theme
        n_lines = rng.randint(*LINE_RANGE)
        counts = rng.randint(*WORDS_RANGE, size=n_lines)
        n = int(counts.sum())
        # vectorized per-song draws (a per-word rng.choice over a
        # 6k-word pool would make vocab-scale generation O(minutes))
        u = rng.rand(n)
        w_theme = rng.choice(len(theme), size=n, p=style.theme_w)
        w_common = rng.choice(len(_COMMON), size=n, p=style.mix)
        words = [
            theme[w_theme[i]] if u[i] < style.theme_rate
            else _COMMON[w_common[i]]
            for i in range(n)]
        if pool:
            w_pool = rng.choice(len(pool), size=n, p=pool_p)
            hi = style.theme_rate + style.pool_rate
            words = [pool[w_pool[i]]
                     if style.theme_rate <= u[i] < hi else words[i]
                     for i in range(n)]
    lines = []
    pos = 0
    for c in counts:
        lines.append(" ".join(words[pos:pos + int(c)]))
        pos += int(c)
    return " / ".join(lines)


def lyrics_stream(num_artists: int, songs_per_artist: int, seed: int = 0,
                  extra_vocab: int = 0, generic_frac: float = 0.0):
    """Yield (artist_name, style, [(song_name, text, generic), ...]) with
    the EXACT RNG stream of generate_lyrics_csv (tests pin byte equality),
    exposing the latent ArtistStyle alongside the text."""
    rng = np.random.RandomState(seed)
    pool, pool_p = make_pool(extra_vocab, rng)
    for a in range(num_artists):
        style = _draw_style(rng, a, pool)
        n_generic = int(round(generic_frac * songs_per_artist))
        songs = []
        for s in range(songs_per_artist):
            generic = s < n_generic
            text = _draw_song(rng, style, pool, pool_p, generic)
            songs.append((f"song_{s:03d}", text, generic))
        yield _artist_name(a), style, songs


def generate_lyrics_csv(path: str | Path, num_artists: int = 24,
                        songs_per_artist: int = 16, seed: int = 0,
                        extra_vocab: int = 0,
                        generic_frac: float = 0.0) -> None:
    """Write an (artist, song, lyrics) CSV with per-artist word styles.

    extra_vocab > 0 appends that many synthetic words to the shared pool
    under a zipf-ish global frequency profile — the vocab-scale shape of a
    real scraped lyrics corpus (BASELINE.json:2 vocab ~5000) without
    network access.  Each artist additionally tilts onto a small signature
    subset of the pool, so episodes remain a real few-shot task.

    generic_frac > 0 makes that fraction of every artist's songs SHORT and
    style-free (drawn from one global distribution over the common pool,
    no theme/signature words) — a heterogeneous-support regime where
    uniform support pooling averages in uninformative songs; used by the
    attn_state decision study (benchmarks/attn_state_round2.json).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", newline="", encoding="utf-8") as f:
        writer = csv.writer(f)
        writer.writerow(["artist", "song", "lyrics"])
        for artist, _style, songs in lyrics_stream(
                num_artists, songs_per_artist, seed, extra_vocab,
                generic_frac):
            for song, text, _generic in songs:
                writer.writerow([artist, song, text])


_SCALES = {  # semitone offsets within an octave
    "major": [0, 2, 4, 5, 7, 9, 11],
    "minor": [0, 2, 3, 5, 7, 8, 10],
    "pent": [0, 3, 5, 7, 10],
}


def generate_midi_corpus(root: str | Path, num_artists: int = 24,
                         songs_per_artist: int = 16, seed: int = 0,
                         notes_range: tuple[int, int] = (24, 48)) -> None:
    """Write per-artist directories of `.mid` files with per-artist styles.

    notes_range: (lo, hi) notes per song — raise for long-event-stream
    corpora (each note expands to ~4 SHIFT/PITCH/DUR/VEL events)."""
    rng = np.random.RandomState(seed + 1)
    root = Path(root)
    scale_names = list(_SCALES)
    for a in range(num_artists):
        adir = root / _artist_name(a)
        adir.mkdir(parents=True, exist_ok=True)
        key = rng.randint(0, 12)
        scale = _SCALES[scale_names[a % len(scale_names)]]
        register = rng.randint(48, 68)          # artist's pitch center
        vel_center = rng.randint(40, 100)
        tempo_grid = rng.choice([0.125, 0.25, 0.375])  # note spacing (s)
        for s in range(songs_per_artist):
            n_notes = rng.randint(notes_range[0], notes_range[1])
            t = 0.0
            deg = rng.randint(0, len(scale))
            notes = []
            for _ in range(n_notes):
                deg = (deg + rng.randint(-2, 3)) % len(scale)
                octave = rng.choice([-12, 0, 0, 0, 12])
                pitch = int(np.clip(register + key + scale[deg] + octave,
                                    21, 108))
                dur = tempo_grid * rng.choice([1, 1, 2, 2, 4])
                vel = int(np.clip(vel_center + rng.randint(-12, 13), 1, 127))
                notes.append(Note(start=t, end=t + dur, pitch=pitch,
                                  velocity=vel))
                t += tempo_grid * rng.choice([1, 1, 1, 2])
            write_midi(notes, adir / f"song_{s:03d}.mid")
