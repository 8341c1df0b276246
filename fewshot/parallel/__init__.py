"""Parallelism tier: device mesh + shard_map episode data parallelism.

Reference equivalent: none — the reference is single-process/CPU
(SURVEY.md §3 "Parallelism strategies").  Scaling here follows the north star
(BASELINE.json:11): shard the episode meta-batch over the chips of a slice,
psum gradients and loss statistics over ICI.
"""

from fewshot.parallel.mesh import make_mesh, shard_step
