"""Data tier: offline tokenizers (lyrics CSV, standard MIDI files), the packed
HBM-resident corpus format, and the jittable on-device episode sampler.

Reference equivalents (SURVEY.md §2 L1/L2): `data/loaders.py` (Loader,
LyricsLoader, MidiLoader) and `data/episode.py` (EpisodeSampler).  Unlike the
reference — which re-tokenizes and assembles episodes in Python every step —
tokenization here happens exactly once, offline, into `corpus.npz`; episode
assembly is a pure XLA gather (`fewshot.data.episodes`).
"""

from fewshot.data.vocab import Vocab, PAD, BOS, EOS, UNK
from fewshot.data.corpus import PackedCorpus
