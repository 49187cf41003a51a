"""Beam search with patience, fully jitted (static buffers).

Placeholder module — implemented in the beam-search milestone.
"""

from __future__ import annotations


def run_beam_search(task, feats, cross_kv, initial):
    raise NotImplementedError("beam search lands in a later milestone")
