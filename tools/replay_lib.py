"""Shared torch-shuffle replay for the engine-parity harnesses.

All three engine-level parity tools (tools/engine_parity.py,
tools/video_engine_parity.py, tools/ssl_engine_parity.py) replay our
engines' one-np-permutation-per-epoch shuffle stream inside the
reference's own DataLoader(shuffle=True) loops by monkeypatching
torch.randperm. The draw-count mapping lives HERE, once, because it
encodes a measured property of the installed torch build that all three
must agree on:

MEASURED (this torch build; caught via tools/ssl_engine_parity.py, r5):
torch's RandomSampler consumes TWO randperm(n) draws per epoch — the
yielded shuffle plus an unconditional trailing draw whose slice
``tolist()[:num_samples % n]`` is EMPTY (num_samples == n) and is
discarded. Only even-indexed draws therefore map to the engines'
one-permutation-per-epoch np stream; odd draws pass through to the
original generator. Before this mapping the replays were offset by one
permutation from epoch 1 on, and the later-epoch drift r3-r4 attributed
to "accumulated f32 chaos" was largely mis-aligned batch composition
(engine_parity.py's divergence-profile note).

If a torch upgrade changes the sampler's draw pattern, fix it here and
every harness follows.
"""

from __future__ import annotations

import numpy as np


def make_replay_randperm(n: int, perm_rng: np.random.Generator,
                         orig_randperm):
    """Return a ``torch.randperm`` replacement mapping the sampler's
    even-indexed ``randperm(n)`` draws to ``perm_rng``'s permutation
    stream (see module docstring). Any other size passes through."""
    import torch

    state = {"i": 0}

    def randperm(num, *a, **k):
        if num == n:          # the sampler's epoch draws
            i, state["i"] = state["i"], state["i"] + 1
            if i % 2 == 0:    # the real epoch shuffle
                return torch.from_numpy(perm_rng.permutation(num))
        return orig_randperm(num, *a, **k)

    return randperm
