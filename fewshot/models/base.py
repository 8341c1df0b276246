"""BaseModel facade: the reference's object contract over the functional core.

Reference equivalent (SURVEY.md §2 L3 "Model base"): `BaseModel` with
`train(episode)`, `eval(episode) -> nll`, `sample(support, n)`, `save(dir)`,
`recover_or_init(dir)`.  The TPU-native core is pure functions over param
pytrees (models/lm.py, training.py) — that is what jit/vmap/shard_map want —
but users coming from the reference get the same five-method surface here,
backed by those functions.  Everything this class does can be done (and is
tested) through the functional API; the facade holds the only mutable state
(TrainState) in one place.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from fewshot import sampling as sampling_mod
from fewshot import training
from fewshot.data import episodes as eps
from fewshot.data import midi as midi_mod
from fewshot.data.episodes import Episode
from fewshot.models import lm as lm_mod


class FewShotModel:
    """Stateful wrapper: one model + optimizer over one packed corpus."""

    def __init__(self, cfg, corpus, seed: int | None = None):
        self.cfg = cfg
        self.corpus = corpus
        self.data = eps.put_corpus(corpus)
        self.state = training.init_train_state(cfg, len(corpus.vocab),
                                               seed=seed)
        self._train_step = None
        self._eval_steps: dict[str, object] = {}
        self._token_masks = None
        if cfg.dataset == "midi" and cfg.grammar_sampling:
            self._token_masks = jnp.asarray(
                midi_mod.grammar_masks(corpus.vocab))

    # -- training -----------------------------------------------------------

    def _split(self, name: str):
        if self.cfg.task == "episodic":
            return jnp.asarray(self.corpus.splits[name])
        return jnp.asarray(eps.split_song_pool(self.corpus, name))

    def train(self, steps: int = 1) -> float:
        """Run fused train steps (sampling included); returns last loss."""
        if self._train_step is None:
            self._train_step = training.make_train_step(
                self.cfg, self.data, self._split("train"))
        loss = float("nan")
        for _ in range(steps):
            self.state, metrics = self._train_step(self.state)
            loss = metrics["loss"]
        return float(loss)

    @property
    def step(self) -> int:
        return int(self.state.step)

    # -- evaluation ---------------------------------------------------------

    def eval(self, episode: Episode | None = None, split: str = "val",
             num_episodes: int | None = None) -> float:
        """NLL/token: of one episode if given, else averaged over a split."""
        if episode is not None:
            total, count = lm_mod.episodic_nll_stats(self.state.params,
                                                     episode, self.cfg,
                                                     eval_mode=True)
            return float(total) / max(float(count), 1.0)
        if split not in self._eval_steps:
            self._eval_steps[split] = training.make_eval_step(
                self.cfg, self.data, self._split(split))
        return training.evaluate(self.cfg, self.state.params, self.data,
                                 self._split(split),
                                 jax.random.PRNGKey(self.cfg.seed),
                                 num_episodes=num_episodes,
                                 eval_step=self._eval_steps[split])

    # -- generation ---------------------------------------------------------

    def sample(self, support: jax.Array, support_len: jax.Array,
               n_tokens: int | None = None, seed: int = 0) -> np.ndarray:
        """Support-conditioned continuations -> token ids [B, n]."""
        toks = sampling_mod.generate(self.state.params, support, support_len,
                                     jax.random.PRNGKey(seed), self.cfg,
                                     n_tokens=n_tokens,
                                     token_masks=self._token_masks)
        return np.asarray(jax.device_get(toks))

    def sample_artist(self, split: str = "test", num: int = 1,
                      seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
        """Draw support sets from a split and continue; (tokens, artists)."""
        ep = eps.sample_episode(jax.random.PRNGKey(seed), self.data,
                                jnp.asarray(self.corpus.splits[split]), num,
                                k=self.cfg.support_size,
                                q=self.cfg.query_size)
        return self.sample(ep.support, ep.support_len,
                           seed=seed + 1), np.asarray(ep.artist)

    # -- persistence ---------------------------------------------------------

    def save(self, ckpt_dir: str | Path) -> None:
        from fewshot.utils.ckpt import save_checkpoint
        vh = self.corpus.vocab.content_hash() if self.corpus.vocab else ""
        save_checkpoint(ckpt_dir, self.state, vh)

    def recover_or_init(self, ckpt_dir: str | Path | None) -> bool:
        from fewshot.utils.ckpt import recover_or_init
        vh = self.corpus.vocab.content_hash() if self.corpus.vocab else ""
        self.state, restored = recover_or_init(ckpt_dir, self.state, vh)
        return restored
